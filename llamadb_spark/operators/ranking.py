"""Distributed global ranking: row_number over a total order WITHOUT
funneling every row through one task.

``Window.orderBy(...)`` with no partition spec is the classic
100 TB-scale killer: Spark warns "No Partition Defined for Window
operation" and sorts the whole input in a single task (the canonical
executor OOM). The scalable construction here is the two-pass rank:

  1. range-repartition the input on the order columns (the same
     machinery a global sort uses — each partition holds a disjoint,
     ordered key range),
  2. row_number WITHIN each partition (partitioned window — parallel),
  3. add per-partition offsets: the counts table has exactly one row
     per partition (bounded by the shuffle-partition count, never by
     the data), so its running sum is scalar-sized work, and the
     offsets broadcast-join back onto the ranked rows.

The result is identical to ``row_number() OVER (ORDER BY ...)`` when
the order columns form a total order (unique per row); with ties the
tie-break is arbitrary in both forms.

Reference parity: llamadb has no window functions at all
(src/sqlsyntax/ — no OVER in the grammar); this operator exists for
the pipeline analytics surface (e20 Gini ranks and any future global
ranking) at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _exclusive_prefix(totals: list) -> list:
    """Exclusive prefix sums in partition-id order (offset of pid i =
    sum of totals[0..i-1]). Accumulation order matches the former
    offsets window (ORDER BY _pid ROWS UNBOUNDED PRECEDING, -1).
    The list is type-homogeneous (all int or all float) so F.lit
    builds a single-typed array literal."""
    as_float = any(isinstance(t, float) for t in totals)
    acc = 0.0 if as_float else 0
    offs = []
    for t in totals:
        offs.append(acc)
        acc += t
    return offs


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "i",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = global 1-based row_number ordered by
    ``order_cols`` (ascending), computed with per-partition windows +
    partition offsets instead of a single-task global window.

    Per-partition counts are OBSERVED aggregates computed inside the
    checkpoint job itself (one conditional count per partition — a
    cluster-config-bounded number of scalars, never data-sized), so
    the offsets become driver-side literals: no second pass over the
    checkpointed blocks and no broadcast join in the output plan
    (r11; guide §1.2 — the former counts side re-scanned every block
    to produce one row per partition).

    EAGER: the repartitioned+windowed subtree is localCheckpointed at
    call time (a Spark job runs even if the result is discarded) so
    that the output and the observed counts come from one execution
    of the upstream. The checkpoint blocks are released by the
    ContextCleaner when the returned DataFrame is garbage-collected.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = [F.col(c) for c in order_cols]
    obs = Observation()
    local = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lr",
            F.row_number().over(Window.partitionBy("_pid").orderBy(*cols)),
        )
        # one conditional count per partition, computed by the
        # checkpoint job — exact (long counts)
        .observe(
            obs,
            *[
                F.count(F.when(F.col("_pid") == i, 1)).alias(f"_c{i}")
                for i in range(num_partitions)
            ],
        )
        # Staged: the whole upstream (range repartition + window +
        # whatever feeds df) runs ONCE; everything downstream reads
        # the blocks (r10; guide §5 — materialize a reused
        # intermediate).
        .localCheckpoint()
    )
    row = obs.get
    offs = _exclusive_prefix(
        [int(row[f"_c{i}"] or 0) for i in range(num_partitions)]
    )
    return (
        local.withColumn(
            out_col,
            (
                F.col("_lr")
                + F.element_at(F.lit(offs), F.col("_pid") + 1)
            ).cast("long"),
        )
        .drop("_pid", "_lr")
    )


def distributed_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = running sum of ``value_col`` over the
    global order given by ``order_cols`` (strings or Column
    expressions, so ``F.col("q").desc()`` works) — the same two-pass
    construction as distributed_row_number: range-repartition on the
    order, per-partition window cumsum, then per-partition TOTALS
    (one row per partition) accumulated into offsets and
    broadcast-joined back. Identical to
    ``sum(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``
    without the single-task global sort.

    The canonical consumer is budget-cut selection: order by a score,
    keep rows while the running total fits the budget (p15).

    Per-partition totals are OBSERVED aggregates computed inside the
    checkpoint job (one conditional sum per partition), so the
    offsets are driver-side literals — no second pass over the
    checkpointed blocks, no broadcast join (r11; see
    distributed_row_number). Exactness: every production consumer
    sums LONG token/row counts, where conditional sums and prefix
    accumulation are exact in any order; for doubles the merge adds
    identity zeros to one partition's partial, which is exact too
    (modulo the -0.0 corner no consumer exercises).

    EAGER: localCheckpoints the windowed subtree at call time — see
    distributed_row_number's docstring for the contract.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    obs = Observation()
    local = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lc",
            F.sum(value_col).over(
                Window.partitionBy("_pid")
                .orderBy(*cols)
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        # one conditional total per partition, computed by the
        # checkpoint job (r11; the r10 totals side re-scanned every
        # checkpointed block — for p15/p19 the upstream is the
        # quality-scoring pipeline — to produce 32 total rows)
        .observe(
            obs,
            *[
                F.sum(
                    F.when(F.col("_pid") == i, F.col(value_col)).otherwise(
                        F.lit(0)
                    )
                ).alias(f"_t{i}")
                for i in range(num_partitions)
            ],
        )
        .localCheckpoint()
    )
    row = obs.get
    offs = _exclusive_prefix(
        [row[f"_t{i}"] or 0 for i in range(num_partitions)]
    )
    return (
        local.withColumn(
            out_col,
            F.col("_lc") + F.element_at(F.lit(offs), F.col("_pid") + 1),
        )
        .drop("_pid", "_lc")
    )
