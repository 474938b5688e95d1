"""Deterministic sampling operators for training-data curation.

Spark's `df.sample()` is seed-dependent per partition layout, so a
re-run with different file splits samples different rows — useless
for reproducible corpus builds. These operators hash the row KEY
instead: the keep/drop decision is a pure function of the data, so
it's stable across cluster sizes, partition counts, and re-runs, and
it's expressible in any engine (the DuckDB oracles run the same
arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit

#: Knuth multiplicative hash constant (2^32 * golden ratio).
KNUTH = 2654435761

#: Modulus applied to the key BEFORE multiplying, keeping the product
#: far inside int64 (100003 is prime, so key % 100003 stays uniform).
PREMOD = 100003


def bucket_hash(key: Column, buckets: int = 1000) -> Column:
    """Deterministic uniform bucket in [0, buckets) from an integer
    key: multiplicative hashing (Knuth), overflow-free in int64."""
    return ((key % PREMOD) * lit(KNUTH)) % buckets


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    default_rate: float = 1.0,
) -> DataFrame:
    """Per-stratum Bernoulli sampling at exact, reproducible rates:
    keep a row iff hash(key) mod 1000 < rate*1000 for its stratum.
    The usual corpus-mixing move (downweight overrepresented
    languages/sources) as one codegen'd filter — no shuffle, no RNG,
    and the same rows survive on 1 executor or 1000.
    """
    thresh: Column | None = None
    for stratum, rate in rates.items():
        arm = (col(strata_col) == stratum, lit(int(rate * 1000)))
        thresh = F.when(*arm) if thresh is None else thresh.when(*arm)
    default = lit(int(default_rate * 1000))
    thresh = default if thresh is None else thresh.otherwise(default)
    return df.filter(bucket_hash(col(key_col)) < thresh)


def mixture_sample(
    df: DataFrame,
    target_counts: dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Rebalance a corpus toward per-stratum TARGET COUNTS — the
    corpus-mixing step of a training-data build ("cap English at 1M
    docs, keep all Basque"). Per stratum: keep rate =
    min(1, target/available), applied with the same deterministic
    key hash as stratified_sample, so the draw is reproducible and
    engine-portable.

    Fully distributed: the per-stratum thresholds come from one
    small count aggregate broadcast back onto the corpus — no
    driver-side rate math, no RNG, one corpus pass. Strata absent
    from ``target_counts`` pass through unchanged.

    Output: input rows surviving the draw (approximately the target
    count per stratum — Bernoulli, not exact-k).
    """
    targets = F.create_map(
        *[x for k, v in target_counts.items() for x in (lit(k), lit(int(v)))]
    )
    counts = df.groupBy(strata_col).agg(F.count(lit(1)).alias("_n"))
    thresholds = counts.select(
        strata_col,
        F.least(
            lit(1000),
            F.floor(lit(1000) * targets[col(strata_col)] / col("_n")),
        ).alias("_thresh"),
    )
    return (
        df.join(F.broadcast(thresholds), strata_col, "left")
        .filter(
            col("_thresh").isNull() | (bucket_hash(col(key_col)) < col("_thresh"))
        )
        .drop("_thresh")
    )


def exact_k_sample(
    df: DataFrame,
    k: int,
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """EXACT-k per-stratum sample (vs the Bernoulli operators above,
    which hit targets only in expectation): rank rows inside each
    stratum by the deterministic key hash (key as tiebreak) and keep
    rank ≤ k. Same reproducibility contract — the chosen set is a
    pure function of the data — at the cost of one window sort per
    stratum, which Bernoulli sampling avoids; use this when the
    budget is a hard cap (eval sets, human-review batches).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        bucket_hash(col(key_col), buckets=1_000_000_000), col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(col("_rk") <= k)
        .drop("_rk")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
) -> DataFrame:
    """Probability-proportional-to-size Poisson sampling: row i is
    kept with probability min(1, k·wᵢ/W) (W = Σw), so the expected
    sample size is ≤ k and long/heavy rows are preferentially kept —
    the standard move when token-budgeting a corpus (sampling docs
    uniformly under-represents tokens from long documents).

    Same reproducibility contract as the other samplers: the draw is
    the key's deterministic hash, so membership is a pure function of
    the data. The keep test is pure INTEGER arithmetic
    (h·W < k·wᵢ·10⁹, h uniform in [0,10⁹)) — no pow/ln, so any
    engine computes the identical sample bit-for-bit. The products
    run in DECIMAL(38,0): h·W reaches ~10⁹·Σw, which overflows int64
    once the corpus's total weight passes ~10¹⁰ (any real corpus) —
    38-digit decimals hold ~10³⁸ exactly (DuckDB side: HUGEINT).

    Scale: one aggregate for W (1-row broadcast join, no driver
    collect), then a codegen'd filter — zero extra shuffles beyond
    the scalar.

    Output: input rows kept, plus incl_prob (rounded 6dp).
    """
    total = df.agg(F.sum(weight_col).cast("decimal(38,0)").alias("_w_total"))
    h = bucket_hash(col(key_col), buckets=1_000_000_000).cast("decimal(38,0)")
    keep = (h * col("_w_total")) < (
        lit(k)
        * col(weight_col).cast("decimal(38,0)")
        * lit(1_000_000_000).cast("decimal(38,0)")
    )
    return (
        df.crossJoin(F.broadcast(total))
        .filter(keep)
        .withColumn(
            "incl_prob",
            F.round(
                F.least(
                    lit(1.0),
                    lit(k) * col(weight_col) / col("_w_total").cast("double"),
                ),
                6,
            ),
        )
        .drop("_w_total")
    )


def dataset_split(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
) -> DataFrame:
    """Deterministic train/val/test assignment: hash-bucket ranges
    over the same multiplicative hash as stratified_sample, so a
    document's split is a pure function of its key — stable across
    re-runs, cluster sizes, and engine (SQL-expressible), and a
    document can never leak between splits when the corpus regrows.

    Zero shuffle: one codegen'd CASE over the hash bucket.
    """
    assert abs(sum(weights) - 1.0) < 1e-9 and len(weights) == len(names)
    b = bucket_hash(col(key_col))
    expr = None
    acc = 0.0
    for name, wgt in zip(names[:-1], weights[:-1]):
        acc += wgt
        arm = (b < lit(int(round(acc * 1000))), lit(name))
        expr = F.when(*arm) if expr is None else expr.when(*arm)
    expr = lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return df.withColumn("split", expr)
