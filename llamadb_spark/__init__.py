"""llamadb_spark — a PySpark-native analytics engine with the query
surface of nukep/llamadb (reference: /root/reference), extended with
large-scale training-data pipeline operators.

Layout:
  session.py    SparkSession factory tuned for scale + table catalog
  sources/      parquet catalog / loaders
  functions/    scalar function surface (text, vector math)
  operators/    relational combinators, dedup, similarity, text, multimodal
  sql/          llamadb SQL dialect -> Spark SQL (LlamaSession)
  plans/        lisp-style EXPLAIN rendering (parity with Usage.md)
  streaming/    Structured Streaming ops over the events table
"""

from llamadb_spark.session import get_spark, load_tables, register_views


def connect(spark=None):
    """Convenience entry point: a LlamaSession (the llamadb-dialect
    front end — CREATE/INSERT/SELECT/UPDATE/DELETE/MERGE, prepared
    statements, recursive CTEs, EXPLAIN) over an existing or fresh
    SparkSession. Named ``connect`` (not ``session``) so the package
    attribute does not shadow the ``llamadb_spark.session``
    submodule."""
    from llamadb_spark.sql import LlamaSession

    return LlamaSession(spark or get_spark())


__all__ = ["connect", "get_spark", "load_tables", "register_views"]
