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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "i",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = global 1-based row_number ordered by
    ``order_cols`` (ascending), computed with per-partition windows +
    partition offsets instead of a single-task global window.

    The one unpartitioned window in the plan runs over the
    per-partition COUNTS relation — one row per shuffle partition, a
    cluster-config-bounded number of scalars, never data-sized.

    EAGER: the repartitioned+windowed subtree is localCheckpointed at
    call time (a Spark job runs even if the result is discarded) so
    that the counts side and the output join read it once instead of
    re-executing the whole upstream twice. The checkpoint blocks are
    released by the ContextCleaner when the returned DataFrame is
    garbage-collected.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = [F.col(c) for c in order_cols]
    local = (
        df.repartitionByRange(num_partitions, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lr",
            F.row_number().over(Window.partitionBy("_pid").orderBy(*cols)),
        )
        # Staged: BOTH the counts side and the final join consume
        # this subtree — unstaged, the entire upstream (range
        # repartition + window + whatever feeds df) executed twice,
        # once for the broadcast offsets and once for the output
        # (r10; guide §5 — materialize a reused intermediate).
        .localCheckpoint()
    )
    # one row per partition — bounded by cluster config, not data
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    off_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_lr") + F.col("_off")).cast("long"))
        .drop("_pid", "_lr", "_off")
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

    EAGER: localCheckpoints the windowed subtree at call time — see
    distributed_row_number's docstring for the contract.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32")
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_cols]
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
        # Staged for the same reason as distributed_row_number (r10):
        # the totals side re-executed the whole upstream (for p15/p19
        # that upstream is the quality-scoring pipeline) to produce
        # 32 total rows.
        .localCheckpoint()
    )
    totals = local.groupBy("_pid").agg(F.sum(value_col).alias("_t"))
    off_w = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_t").over(off_w), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, F.col("_lc") + F.col("_off"))
        .drop("_pid", "_lc", "_off")
    )
