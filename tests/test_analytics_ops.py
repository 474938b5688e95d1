"""Tests for the analytics additions: time-series resample+ffill,
TF-IDF ranking, label centroids, exact percentiles/stats."""

from __future__ import annotations

from datetime import datetime

import numpy as np

from llamadb_spark.operators import events as ev
from llamadb_spark.operators import similarity, textops


def test_resample_ffill_fills_gaps(spark):
    rows = [
        (1, 1, datetime(2024, 1, 1, 0, 10), 10.0),
        (2, 1, datetime(2024, 1, 1, 0, 50), 20.0),
        (3, 1, datetime(2024, 1, 1, 3, 5), 40.0),  # 2-hour gap before
        (4, 2, datetime(2024, 1, 1, 5, 0), 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    out = {(r.user_id, r.hour.hour): r for r in ev.resample_ffill(df).collect()}
    assert len(out) == 5  # user 1: hours 0..3 (4 rows); user 2: hour 5
    assert out[(1, 0)].hourly_avg == 15.0  # avg(10, 20)
    assert out[(1, 1)].hourly_avg is None and out[(1, 1)].filled_avg == 15.0
    assert out[(1, 2)].filled_avg == 15.0  # carried across the gap
    assert out[(1, 3)].hourly_avg == 40.0 and out[(1, 3)].filled_avg == 40.0
    assert out[(2, 5)].filled_avg == 7.0


def test_tfidf_ranks_planted_doc_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "data join stream filter data join data"),  # dense in query terms
            (2, "data and some other words entirely unrelated"),
            (3, "nothing relevant whatsoever in here"),
        ],
        "doc_id long, text string",
    )
    out = textops.tfidf_topk(docs, ["data", "join", "stream", "filter"], k=3).collect()
    assert out[0].doc_id == 1 and out[0].n_terms == 4
    assert [r.doc_id for r in out] == [1, 2]  # doc 3 has no hits -> absent
    assert out[0].score > out[1].score > 0


def test_label_centroids_match_numpy(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        (r.label, r.dim): r.centroid
        for r in similarity.label_centroids(emb).collect()
    }
    pdf = emb.toPandas()
    for label, grp in pdf.groupby("label"):
        mean = np.mean(np.stack(grp["embedding"].to_list()).astype("float64"), axis=0)
        for d in (0, 1, len(mean) - 1):
            assert abs(got[(label, d)] - round(float(mean[d]), 6)) < 1e-5


def test_percentiles_ordering(spark, sf_dir):
    from llamadb_spark.queries.olap import q31_percentiles

    for r in q31_percentiles(spark, sf_dir).collect():
        assert r.p25_price <= r.p90_price
        assert 0 <= r.med_disc <= 0.1


def test_mixture_sample_hits_targets(spark, sf_dir):
    from llamadb_spark.operators.sampling import mixture_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    before = {r.lang: r.n for r in docs.groupBy("lang").agg(
        __import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    out = mixture_sample(docs, target_counts={"en": 20, "zh": 10, "de": 10**6})
    after = {r.lang: r.n for r in out.groupBy("lang").agg(
        __import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    # capped strata shrink toward targets (Bernoulli ≈, generous 2x)
    assert after["en"] <= max(2 * 20, 40) and after["en"] < before["en"]
    assert after["zh"] < before["zh"]
    # target above availability → keep all; absent strata untouched
    assert after["de"] == before["de"]
    assert after["fr"] == before["fr"] and after["es"] == before["es"]
    # deterministic: same draw twice
    ids1 = {r.doc_id for r in out.collect()}
    ids2 = {
        r.doc_id
        for r in mixture_sample(
            docs, target_counts={"en": 20, "zh": 10, "de": 10**6}
        ).collect()
    }
    assert ids1 == ids2


def test_cdc_apply_last_writer_and_tombstone(spark):
    from llamadb_spark.operators.events import cdc_apply

    log = spark.createDataFrame(
        [
            (1, 1, "upsert", 10.0),
            (1, 2, "upsert", 11.0),   # latest for key 1 → survives
            (2, 1, "upsert", 20.0),
            (2, 3, "delete", 0.0),    # latest for key 2 → tombstoned
            (3, 5, "delete", 0.0),
            (3, 6, "upsert", 30.0),   # delete then re-insert → survives
        ],
        ["k", "seq", "op", "val"],
    )
    out = {
        (r.k, r.seq, r.val)
        for r in cdc_apply(log, ["k"], ["seq"], "op", "delete").collect()
    }
    assert out == {(1, 2, 11.0), (3, 6, 30.0)}


def test_gap_detection_finds_synthetic_gap(spark, tmp_path):
    """e13's oracle matches on zero rows at test SF (the synthetic
    stream is dense); prove the operator detects real gaps."""
    import datetime

    from llamadb_spark.queries.events import e13_gap_detection

    base = datetime.datetime(2024, 1, 1, 0, 30)
    rows = [
        (i, base + datetime.timedelta(hours=h), 1, "view", 1.0, "{}")
        for i, h in enumerate([0, 1, 2, 5, 6])  # hours 3-4 missing
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")
    got = [r.hour for r in e13_gap_detection(spark, sf_dir).collect()]
    assert got == [
        datetime.datetime(2024, 1, 1, 3, 0),
        datetime.datetime(2024, 1, 1, 4, 0),
    ]


def test_cep_negation_and_window(spark):
    """A->¬N->B within T: match iff a view precedes the purchase
    within the window AND no error landed between them."""
    import datetime

    from llamadb_spark.operators.events import cep_sequence_matches

    t0 = datetime.datetime(2024, 1, 1, 12, 0)

    def at(minutes):
        return t0 + datetime.timedelta(minutes=minutes)

    rows = [
        # user 1: view @0 -> purchase @10  => match (gap 600s)
        (10, at(0), 1, "view", 1.0, "{}"),
        (11, at(10), 1, "purchase", 1.0, "{}"),
        # user 2: view @0 -> error @5 -> purchase @10 => negated
        (20, at(0), 2, "view", 1.0, "{}"),
        (21, at(5), 2, "error", 1.0, "{}"),
        (22, at(10), 2, "purchase", 1.0, "{}"),
        # user 3: view @0 -> purchase @40 => outside 30-min window
        (30, at(0), 3, "view", 1.0, "{}"),
        (31, at(40), 3, "purchase", 1.0, "{}"),
        # user 4: error @0 -> view @5 -> purchase @10 => match
        #         (error BEFORE the trigger does not negate)
        (40, at(0), 4, "error", 1.0, "{}"),
        (41, at(5), 4, "view", 1.0, "{}"),
        (42, at(10), 4, "purchase", 1.0, "{}"),
        # user 5: purchase with no prior view => no match
        (50, at(10), 5, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    got = {
        (r.user_id, r.match_id, r.gap_us)
        for r in cep_sequence_matches(df, within_seconds=1800).collect()
    }
    assert got == {(1, 11, 600_000_000), (4, 42, 300_000_000)}


def test_weighted_sample_edge_weights(spark):
    """Zero-weight rows are never kept; a row carrying ~all the
    weight is always kept; membership is deterministic."""
    from llamadb_spark.operators.sampling import weighted_sample

    rows = [(i, 0) for i in range(50)] + [(100, 10_000)] + [
        (200 + i, 10) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    kept = {r.doc_id for r in weighted_sample(df, k=5, weight_col="w").collect()}
    assert 100 in kept                      # p = min(1, 5*10000/10500) = 1
    assert not any(d < 50 for d in kept)    # zero weight -> p = 0
    kept2 = {r.doc_id for r in weighted_sample(df, k=5, weight_col="w").collect()}
    assert kept == kept2                    # pure function of the data


def test_incremental_dedup_one_sided(spark):
    """Batch docs match corpus docs only: an exact copy inside the
    batch itself must NOT be reported, an exact copy in the corpus
    must match with jaccard 1.0 and the lowest-id corpus doc wins
    ties."""
    from llamadb_spark.operators.dedup import incremental_jaccard_matches

    text = "alpha beta gamma delta epsilon zeta eta theta"
    batch = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally different words here now ok yes")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(10, text), (11, text), (12, "unrelated corpus content entirely")],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.match_id, r.jaccard)
        for r in incremental_jaccard_matches(batch, corpus, threshold=0.5).collect()
    }
    assert got == {(1, 10, 1.0), (2, 10, 1.0)}


def test_bigram_logprob_scores_repetition_higher(spark):
    """A doc made of one repeated bigram is maximally predictable
    under the corpus bigram model; a doc of unique transitions scores
    strictly lower. Docs with < 2 tokens don't appear."""
    from llamadb_spark.operators.textops import bigram_logprob

    docs = spark.createDataFrame(
        [
            (1, "ping pong ping pong ping pong ping pong"),
            (2, "one two one three one four one five"),
            (3, "single"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.avg_logprob for r in bigram_logprob(docs).collect()}
    assert set(out) == {1, 2}
    assert all(v <= 0 for v in out.values())
    # doc 1's only transition is deterministic (p=1); doc 2's "one"
    # prefix fans out 4 ways (p=1/4 per continuation)
    assert out[1] > out[2]


def test_pagerank_star_center_ranks_highest(spark):
    """On a star graph the hub out-ranks every leaf; on a symmetric
    ring all ranks are equal; total rank mass stays ~n."""
    from llamadb_spark.operators.graph import pagerank

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "a_id long, b_id long"
    )
    ranks = {r.node: r.rank for r in pagerank(star).collect()}
    assert max(ranks, key=ranks.get) == 0
    assert all(abs(ranks[i] - ranks[1]) < 1e-9 for i in range(2, 6))
    assert abs(sum(ranks.values()) - len(ranks)) < 0.01

    ring = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "a_id long, b_id long"
    )
    rranks = {r.node: r.rank for r in pagerank(ring).collect()}
    assert all(abs(v - 1.0) < 1e-9 for v in rranks.values())


def test_distributed_row_number_matches_global_window(spark):
    """The two-pass rank (range-repartition + local row_number +
    partition offsets) must equal row_number() OVER (ORDER BY ...)
    exactly for a total order — including when the row count is
    smaller than the partition count and when keys are heavily
    skewed across the range."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from llamadb_spark.operators.ranking import distributed_row_number

    # skewed values: many ties on v, tie-broken by id (total order)
    rows = [(i, i % 7 if i % 3 else 0) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long")
    got = {
        r.id: r.i
        for r in distributed_row_number(df, ["v", "id"], "i").collect()
    }
    want = {
        r.id: r.i
        for r in df.withColumn(
            "i", F.row_number().over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want

    # tiny input (fewer rows than partitions)
    tiny = spark.createDataFrame([(3, 1), (1, 2), (2, 3)], "k long, id long")
    got_tiny = sorted(
        (r.k, r.i)
        for r in distributed_row_number(tiny, ["k"], "i").collect()
    )
    assert got_tiny == [(1, 1), (2, 2), (3, 3)]


def test_distributed_cumsum_matches_global_window(spark):
    """Two-pass distributed prefix sum must equal
    sum() OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING), including
    with a descending order expression and skewed values."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from llamadb_spark.operators.ranking import distributed_cumsum

    rows = [(i, float((i * 37) % 11 + 1), (i * 13) % 97) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, q double, w long")
    order = [F.col("q").desc(), F.col("id").asc()]
    got = {
        r.id: r.cum
        for r in distributed_cumsum(df, order, "w", "cum").collect()
    }
    want = {
        r.id: r.cum
        for r in df.withColumn(
            "cum",
            F.sum("w").over(
                Window.orderBy(*order).rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        ).collect()
    }
    assert got == want


def test_distributed_cumsum_observed_offsets_internals(spark):
    """r11: cumsum offsets are observed inside the checkpoint job and
    applied as an array literal — the output plan must carry NO
    broadcast join and NO aggregate (the former totals pass), and the
    literal path must handle double values and empty input."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from llamadb_spark.operators.ranking import distributed_cumsum

    rows = [(i, float((i * 19) % 7) + 0.25) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = distributed_cumsum(df, [F.col("id").asc()], "w", "cum")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan and "HashAggregate" not in plan
    got = {r.id: r.cum for r in out.collect()}
    want = {
        r.id: r.cum
        for r in df.withColumn(
            "cum",
            F.sum("w").over(
                Window.orderBy("id").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        ).collect()
    }
    assert got == want

    empty = spark.createDataFrame([], "id long, w long")
    assert distributed_cumsum(empty, ["id"], "w", "cum").count() == 0
