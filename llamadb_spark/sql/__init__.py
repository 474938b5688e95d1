"""llamadb SQL dialect on Spark: CREATE TABLE with llamadb types,
INSERT, SELECT, lisp-style EXPLAIN."""

from llamadb_spark.sql.dialect import LlamaSession, translate_type

__all__ = ["LlamaSession", "translate_type"]
