"""Query inventory: each module exposes ``QUERIES`` (name ->
callable(spark, sf_dir) -> DataFrame) and ``ORACLES`` (name ->
DuckDB-runnable ANSI SQL). Keys match SURVEY.md §2."""

from __future__ import annotations

from llamadb_spark.queries import core


def all_queries():
    out = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracles():
    out = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out


def _modules():
    mods = [core]
    try:
        from llamadb_spark.queries import pipeline

        mods.append(pipeline)
    except ImportError:
        pass
    try:
        from llamadb_spark.queries import events

        mods.append(events)
    except ImportError:
        pass
    return mods
