"""Surface-batch-2 tests: outer join / explode / JSON / regexp —
semantics spot-checks + plan-shape assertions (pruned scans, no
Python in the hot path, deterministic top-k)."""

from __future__ import annotations

import pyspark.sql.functions as F

from llamadb_spark.queries import surface


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_q33_full_outer_keeps_one_sided_rows(spark, sf_dir):
    df = surface.q33_full_outer_join(spark, sf_dir).cache()
    try:
        # full outer ⇒ customers appearing in only one status slice
        # survive with a zero on the other side
        assert df.filter(F.col("n_fulfilled") == 0).count() > 0
        assert df.filter(F.col("n_open") == 0).count() > 0
        assert df.filter((F.col("n_fulfilled") == 0) & (F.col("n_open") == 0)).count() == 0
        # pre-aggregated inputs: the join sees SortMergeJoin FullOuter
        # over aggregates, never raw orders rows
        assert "FullOuter" in plan(df)
    finally:
        df.unpersist()


def test_q34_explode_prunes_to_text_column(spark, sf_dir):
    df = surface.q34_explode_tokens(spark, sf_dir)
    p = plan(df)
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "text" in read_schema and "doc_id" not in read_schema
    rows = df.collect()
    assert 0 < len(rows) <= 20
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_q35_json_extract_stays_jvm_side(spark, sf_dir):
    df = surface.q35_json_extract(spark, sf_dir)
    p = plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    rows = {r.event_type: r for r in df.collect()}
    assert rows and all(r.n_events > 0 and r.max_k is not None for r in rows.values())


def test_q36_regexp_deterministic_topk(spark, sf_dir):
    rows1 = surface.q36_regexp_extract(spark, sf_dir).collect()
    rows2 = surface.q36_regexp_extract(spark, sf_dir).collect()
    assert rows1 == rows2 and 0 < len(rows1) <= 15
    assert all(r.next_word.isalpha() for r in rows1)
