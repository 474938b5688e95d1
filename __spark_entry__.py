"""Driver contract for the spark-graft builder (PySpark target).

entry()      -> flagship query (revenue-by-nation, TPC-H Q5 shape)
queries()    -> full SURVEY.md §2 inventory (core SQL + pipeline ops)
oracle_sql() -> DuckDB-equivalent SQL for every SQL-expressible query
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from llamadb_spark.queries.core import q16_revenue_by_nation

    return q16_revenue_by_nation(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented capability from SURVEY.md §2."""
    from llamadb_spark.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; keys match queries(). Queries
    whose semantics aren't SQL-expressible (minhash/simhash/LSH) are
    intentionally absent → driver records rows-only checks."""
    from llamadb_spark.queries import all_oracles

    return all_oracles()
