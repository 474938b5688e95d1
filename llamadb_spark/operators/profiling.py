"""Single-pass column profiling — the data-quality census every
pipeline runs before training: per-column null counts, exact
distinct cardinalities, and min/max, computed in ONE scan.

Reference grounding: llamadb exposes per-table schema via its
catalog (`/root/reference/src/tempdb/mod.rs` table metadata) but has
no profiling surface; at 100 TB a profile pass gates every
downstream job, so it's first-class here.

Scale notes: all metrics for all columns ride one aggregation
(Spark plans multiple DISTINCT aggregates with a single Expand —
one scan, `n_cols + 1` row multiplier into a map-side-combined
hash aggregate, never one job per column). The wide->long unpivot
is a zero-shuffle `stack` projection over the single 1-row result.
For 100 TB you'd swap `countDistinct` for `approx_count_distinct`
(HLL, no Expand) — the exact form is kept here because the DuckDB
oracle compares exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile `cols` of `df` in one scan.

    Returns long-form: (column_name, n_rows, n_null, n_distinct,
    min_val, max_val) with min/max computed on the native type and
    cast to string only for the uniform output schema.
    """
    aggs = [F.count(lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(col(c).isNull(), 1).otherwise(0)).alias(f"{c}__n_null"),
            F.countDistinct(col(c)).alias(f"{c}__n_distinct"),
            F.min(col(c)).cast("string").alias(f"{c}__min"),
            F.max(col(c)).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)

    stack_args: list = [lit(len(cols))]
    for c in cols:
        stack_args += [
            lit(c),
            col(f"{c}__n_null"),
            col(f"{c}__n_distinct"),
            col(f"{c}__min"),
            col(f"{c}__max"),
        ]
    return wide.select(
        F.stack(*stack_args).alias("column_name", "n_null", "n_distinct", "min_val", "max_val"),
        col("n_rows"),
    ).select("column_name", "n_rows", "n_null", "n_distinct", "min_val", "max_val")
