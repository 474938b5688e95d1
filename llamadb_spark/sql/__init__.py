"""llamadb SQL dialect on Spark: CREATE TABLE with llamadb types,
INSERT/UPDATE/DELETE, CTAS, DROP, constraints, prepared statements,
recursive CTEs, SELECT, lisp-style EXPLAIN."""

from llamadb_spark.sql.dialect import (
    LlamaSession,
    PreparedStatement,
    recursive_sql,
    translate_type,
)

__all__ = [
    "LlamaSession",
    "PreparedStatement",
    "recursive_sql",
    "translate_type",
]
