"""SparkSession factory and table catalog.

The reference engine (llamadb ``src/tempdb/mod.rs``) keeps tables in
memory and scans them row-at-a-time. Here tables are parquet files
read through Spark's vectorized columnar reader; predicate pushdown
and column pruning replace the reference's full-table scans.

Scale notes (100 TB design):
- AQE enabled: runtime shuffle-partition coalescing + skew-join
  splitting replace hand-tuned partition counts at large SF.
- ``spark.sql.shuffle.partitions`` defaults to cpu count locally;
  on a real cluster AQE coalesces upward from
  ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
- Arrow enabled for the few pandas-UDF paths (decode stubs).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic SF
#: (region=5 rows, nation=25 rows regardless of SF — TPC-H-style).
BROADCAST_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(app_name: str = "llamadb_spark", cpus: int | None = None) -> SparkSession:
    """Build a session tuned for local testing but configured the way
    a 1000-executor deployment would be (AQE, pushdown, Arrow)."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # InferFiltersFromGenerate turns explode(col) into a
        # `size(col)>0` filter that pushdown re-inlines below the
        # producing projection — re-evaluating expensive array
        # constructions (shingling) once per row per reference.
        # Our generates always run over non-null arrays, so the
        # inferred filter can only cost, never prune (measured 12×
        # on d02 at sf0.1).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert (see events loader).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # UI off for bench/test runs (allocs ~100 MB + a jetty
        # thread pool); SPARK_GRAFT_UI=1 turns it on for the
        # profiling tool (tools/profile_keys.py needs the REST API).
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
    )
    return builder.getOrCreate()


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load parquet tables from an sf directory.

    Columnar scans with pushdown; callers select only needed columns
    so ``ReadSchema`` stays pruned (checked in tests/bench).
    """
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load tables and register them as temp views for spark.sql()."""
    tables = load_tables(spark, sf_dir, names)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
