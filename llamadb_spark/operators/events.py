"""Event-stream operators in their batch form (SURVEY §2 e-rows).

The same logic runs under Structured Streaming in
llamadb_spark/streaming/ (readStream + watermark); batch form here
is what the DuckDB oracles check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit
from pyspark.sql.window import Window


def windowed_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window aggregate per event_type: count + value sum.

    Uses F.window (the streaming-compatible bucketing) — in batch it
    compiles to a plain date_trunc-style grouping, one shuffle on
    (window, event_type).

    Output: (window_start, event_type, n_events, total_value).
    """
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds `gap_minutes`.

    Batch form: lag + conditional cumsum over a per-user window —
    one shuffle on user_id, no UDF. (Streaming form:
    applyInPandasWithState in streaming/sessions.py.)

    Output: (user_id, session_seq, session_start, session_end,
    n_events, total_value).
    """
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = lit(gap_minutes * 60)
    with_flag = events.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("long") - F.lag(col("ts").cast("long")).over(order) > gap,
            1,
        )
        .otherwise(0)
        .cast("int"),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(
            order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return with_flag.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def cdc_apply(
    changelog: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str,
    delete_op: str,
) -> DataFrame:
    """Apply a change-data-capture log to produce the current
    snapshot: last-writer-wins per key by the sequence columns, keys
    whose final operation is the delete op are tombstoned out. The
    parquet-only stand-in for MERGE INTO / Delta CDF apply.

    Scale: ONE shuffle on the key (row_number window), filter, done.
    The alternative max-seq self-join costs the same shuffle twice.
    Ties on the full seq tuple are broken deterministically by the
    window's internal ordering only if the seq is unique — pass a
    tiebreaker column (e.g. a log offset) in ``seq_cols``.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[col(c).desc() for c in seq_cols]
    )
    return (
        changelog.withColumn("_rn", F.row_number().over(w))
        .filter(col("_rn") == 1)
        .filter(col(op_col) != delete_op)
        .drop("_rn")
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Sessionization via Spark's NATIVE session window
    (F.session_window) — the engine-managed merging-interval form of
    what ``sessionize`` builds from lag + cumsum. Kept alongside it
    because the two scale differently: session_window is the only
    form Structured Streaming can run incrementally with watermarked
    state eviction (see streaming/streams.py session twin), while the
    lag/cumsum form exposes the session_seq ordinal the reference
    pipelines key on.

    Boundary semantics: a session's end is last-event + gap and an
    event landing exactly at the previous window's end starts a NEW
    session (window intervals are half-open) — the oracle mirrors
    this with a >= gap test.

    Output: (user_id, session_start, session_end, n_events,
    total_value); session_end = max(ts) + gap.
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            col("sw.start").alias("session_start"),
            col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def top_users_per_type(events: DataFrame, k: int = 5) -> DataFrame:
    """Top-k users by total value within each event_type: partial
    agg → single shuffle on (event_type, user_id) → tiny window.

    Output: (event_type, user_id, total_value, rank).
    """
    totals = events.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 6).alias("total_value")
    )
    w = Window.partitionBy("event_type").orderBy(
        col("total_value").desc(), col("user_id")
    )
    return (
        totals.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select("event_type", "user_id", "total_value", "rank")
    )


def sliding_windowed_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window aggregate: each event lands in width/slide
    overlapping windows (F.window expands them JVM-side — a bounded
    explode, factor = width/slide, before the single grouping
    shuffle). The streaming twin is the same expression under
    readStream + watermark.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col, lit

    return (
        events.groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(
            F.count(lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running value totals over event time — one window
    partitioned on user_id (single shuffle, in-partition sort; at
    100 TB user_id cardinality spreads partitions, and a hot user is
    a bounded sort, not a cross-partition problem).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import col
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.sum("value").over(w), 6).alias("running_value"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .cast("long")
        .alias("event_seq"),
    )


def resample_ffill(events: DataFrame, value_col: str = "value") -> DataFrame:
    """Time-series resampling to an hourly grid with forward fill:
    per user, average the value per hour, generate the user's full
    hour range (sequence + explode — JVM-side, bounded by span), and
    carry the last observation forward across gap hours
    (last(ignorenulls) over an unbounded-preceding window).

    Scale: everything partitions by user_id — one shuffle for the
    per-hour agg, one for the span, one window sort; the grid explode
    multiplies rows only by the user's span (bounded, known), never
    by table size.

    Output: (user_id, hour, hourly_avg, filled_avg) — hourly_avg is
    NULL on gap hours, filled_avg carries forward (NULL only before a
    user's first observation).
    """
    hourly = events.groupBy(
        "user_id", F.date_trunc("hour", col("ts")).alias("hour")
    ).agg(F.round(F.avg(value_col), 6).alias("hourly_avg"))
    # Gap synthesis WITHOUT a span table or a grid join: each observed
    # hour owns the gap up to (not including) the user's next observed
    # hour, so lead() bounds an explode that emits the observation row
    # plus its trailing gap rows — the forward-fill value is, by
    # construction, the generating row's average. One agg shuffle, one
    # window sort on the (small) hourly table, zero joins; the old
    # span-agg + left-join formulation cost a second corpus scan and a
    # corpus-keyed join for the same output.
    w = Window.partitionBy("user_id").orderBy("hour")
    with_next = hourly.withColumn("_next", F.lead("hour").over(w))
    return with_next.select(
        "user_id",
        col("hourly_avg").alias("_obs"),
        col("hour").alias("_obs_hour"),
        F.explode(
            F.sequence(
                col("hour"),
                F.coalesce(
                    col("_next") - F.expr("interval 1 hour"), col("hour")
                ),
                F.expr("interval 1 hour"),
            )
        ).alias("hour"),
    ).select(
        "user_id",
        "hour",
        F.when(col("hour") == col("_obs_hour"), col("_obs")).alias("hourly_avg"),
        col("_obs").alias("filled_avg"),
    )

def enrich_events(
    events: DataFrame,
    dim: DataFrame,
    key_left: str = "user_id",
    key_right: str = "c_custkey",
) -> DataFrame:
    """Dimension enrichment: per-(segment, event_type) rollup of the
    event stream joined to a user dimension — the canonical
    stream-static join (streaming twin: enriched_counts_stream).

    Scale: the dimension is broadcast (users fit executor memory at
    any SF where a broadcast dim makes sense; beyond that, pre-bucket
    both sides). The join is map-side — the only shuffle is the tiny
    grouped rollup, partially aggregated before it moves.
    """
    return (
        events.join(F.broadcast(dim), col(key_left) == col(key_right))
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def event_rate_zscore(events: DataFrame, bucket: str = "minute") -> DataFrame:
    """Per-type event-rate anomaly signal: bucket counts per
    (event_type, minute), then z-score each bucket against its type's
    mean/stddev across all buckets.

    Scale: the raw pass is one map-side-combined groupBy down to
    (types × minutes) rows; the per-type stats run as a window over
    that already-tiny table (per-type partitions, no second scan of
    the events). Zero-variance types yield NULL z (nullif guard), not
    a division blowup.

    Output: (event_type, minute_start, n_events, z).
    """
    buckets = events.groupBy(
        "event_type", F.date_trunc(bucket, col("ts")).alias("minute_start")
    ).agg(F.count(lit(1)).alias("n_events"))
    w = Window.partitionBy("event_type")
    mean = F.avg("n_events").over(w)
    std = F.stddev_samp(col("n_events").cast("double")).over(w)
    return buckets.select(
        "event_type",
        "minute_start",
        "n_events",
        F.round((col("n_events") - mean) / F.nullif(std, lit(0.0)), 6).alias("z"),
    )


def cep_sequence_matches(
    events: DataFrame,
    trigger: str = "view",
    target: str = "purchase",
    negation: str = "error",
    within_seconds: int = 1800,
) -> DataFrame:
    """Complex-event-processing match: for each ``target`` event,
    emit a row iff the same user produced a ``trigger`` event within
    ``within_seconds`` BEFORE it, with no ``negation`` event between
    the two — the classic pattern-with-negation shape
    (``A → ¬N → B within T``) that plain funnels can't express
    (funnel counts first-touch stage entry; this matches EVERY
    qualifying B and enforces the absence constraint).

    One window pass per user (ordered by ts, event_id for a total
    order; ROWS frame excluding the current row): running max of
    trigger-ts and negation-ts answer both "was there a recent A"
    and "did an N land after that A" without self-joins — at 100 TB
    this is a single shuffle on user_id, versus the three joins the
    naive formulation costs. The streaming twin is an
    applyInPandasWithState keyed on user (streaming/).

    Output: (user_id, match_id = target's event_id, trigger_ts,
    target_ts, gap_us) — gap in exact integer microseconds.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_trig = F.max(F.when(col("event_type") == trigger, col("ts"))).over(w)
    last_neg = F.max(F.when(col("event_type") == negation, col("ts"))).over(w)
    gap = F.unix_micros(col("ts")) - F.unix_micros(col("_trig_ts"))
    return (
        events.select("user_id", "event_id", "event_type", "ts")
        .withColumn("_trig_ts", last_trig)
        .withColumn("_neg_ts", last_neg)
        .filter(
            (col("event_type") == target)
            & col("_trig_ts").isNotNull()
            & (
                F.unix_micros(col("ts")) - F.unix_micros(col("_trig_ts"))
                <= within_seconds * 1_000_000
            )
            & (col("_neg_ts").isNull() | (col("_neg_ts") < col("_trig_ts")))
        )
        .select(
            "user_id",
            col("event_id").alias("match_id"),
            col("_trig_ts").alias("trigger_ts"),
            col("ts").alias("target_ts"),
            gap.alias("gap_us"),
        )
    )


def funnel(events: DataFrame, stages: tuple[str, ...] = ("signup", "view", "purchase")) -> DataFrame:
    """Ordered funnel analysis: for each user, stage k counts only if
    its first qualifying event is at/after the user's stage k-1 entry
    time (first-touch semantics). Returns one row: per-stage user
    counts + conversion rate from stage 1.

    Scale: one filtered, map-side-combined min-ts aggregation per
    stage (each shuffles on user_id — AQE reuses the exchange
    partitioning), then left joins thread the stage times through.
    No windows over the raw stream, no UDFs; state is per-user-per-
    stage one timestamp.
    """
    assert len(stages) >= 2
    cur = (
        events.filter(col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    out = cur
    for i, stage in enumerate(stages[1:], start=1):
        nxt = (
            events.filter(col("event_type") == stage)
            .join(out.select("user_id", col(f"t{i-1}")), "user_id")
            .filter(col("ts") >= col(f"t{i-1}"))
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        out = out.join(nxt, "user_id", "left")
    aggs = [
        F.count(col(f"t{i}")).alias(f"n_{stage}")
        for i, stage in enumerate(stages)
    ]
    res = out.agg(*aggs)
    first, last = f"n_{stages[0]}", f"n_{stages[-1]}"
    return res.select(
        *[col(f"n_{s}") for s in stages],
        F.round(col(last) / col(first), 6).alias("conversion"),
    )
