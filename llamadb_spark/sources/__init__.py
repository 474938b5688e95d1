"""Sources & sinks: parquet/CSV/JSON readers with explicit schemas,
partitioned + bucketed writers."""

from llamadb_spark.sources.catalog import (
    read_csv,
    read_json,
    write_bucketed_table,
    write_partitioned,
)

__all__ = ["read_csv", "read_json", "write_partitioned", "write_bucketed_table"]
