"""Sources & sinks.

The reference persists nothing (tempdb, in-memory B+Tree pages —
/root/reference/src/tempdb/); an analytics engine at 100 TB lives
and dies by its storage layout instead:

- **Partitioned parquet** (write_partitioned): partition pruning
  turns `WHERE dt = X` into directory pruning — zero I/O for
  non-matching partitions.
- **Bucketed tables** (write_bucketed_table): pre-shuffling both
  sides of a recurring join by the join key means the join runs
  with NO exchange at read time — the single biggest shuffle saver
  for repeated big-big joins (verified by plan assertion in
  tests/test_sources.py).
- CSV/JSON readers take explicit schemas: schema inference is a
  full extra pass over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession, path: str, schema: StructType | str, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader — columnar like parquet (self-describing schema,
    vectorized scan, predicate pushdown); the interchange format when
    upstream systems are Hive/ORC-based."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet: one directory per partition
    value; readers prune directories via partition filters."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist df as a bucketed (and optionally sorted) managed
    table. Joins/aggregations on the bucket key across two tables
    bucketed the same way run WITHOUT a shuffle."""
    spark = df.sparkSession
    if mode == "overwrite":
        # with the in-memory catalog, a previous session's managed-
        # table directory can outlive its catalog entry; clear both
        # or saveAsTable fails with LOCATION_ALREADY_EXISTS
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        stale = f"{warehouse}/{table_name.lower()}"
        import shutil

        shutil.rmtree(stale, ignore_errors=True)
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Raw text ingestion, one row per line, with file provenance and
    within-file line numbers — the first step of a corpus pipeline
    over crawl/log dumps.

    Provenance is computed with input_file_name() and a per-file
    window row_number; at 100 TB the window shuffles on file name —
    acceptable because line order within a file is only meaningful
    per file (one partition per file ≈ how the scan splits anyway).
    Callers that don't need line numbers should project them away
    (Catalyst then drops the window entirely).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("source_file").orderBy(F.monotonically_increasing_id())
    return (
        spark.read.text(path)
        .select(
            F.col("value").alias("line"),
            F.input_file_name().alias("source_file"),
        )
        .withColumn("line_no", F.row_number().over(w).cast("long"))
    )


def read_text_whole(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file text ingestion: one row per file (document = file).
    wholeTextFiles is the right tool for many-small-files corpora;
    for huge single files prefer read_text_lines + reassembly.
    """
    rdd = spark.sparkContext.wholeTextFiles(path)
    return rdd.toDF(["source_file", "text"])
