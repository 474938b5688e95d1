"""Query inventory: each module exposes ``QUERIES`` (name ->
callable(spark, sf_dir) -> DataFrame) and ``ORACLES`` (name ->
DuckDB-runnable ANSI SQL). Keys match SURVEY.md §2."""

from __future__ import annotations

from llamadb_spark.queries import advanced, core, events, olap, pipeline, surface, tpch

_MODULES = (core, pipeline, events, olap, surface, advanced, tpch)


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    return out
