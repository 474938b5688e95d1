"""Profiling / entropy / centroid-similarity tests: semantics plus
the single-scan and no-Python plan shapes these ops promise."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from llamadb_spark.operators.profiling import profile_columns
from llamadb_spark.operators.textops import token_entropy
from llamadb_spark.queries import pipeline


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_profile_single_scan_and_values(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = profile_columns(docs, ["lang", "source", "n_chars"])
    # one scan feeds all metrics for all columns
    assert plan(df).count("documents.parquet") == 1
    rows = {r.column_name: r for r in df.collect()}
    assert set(rows) == {"lang", "source", "n_chars"}
    n = docs.count()
    for r in rows.values():
        assert r.n_rows == n and r.n_null == 0
        assert 0 < r.n_distinct <= n
    assert rows["lang"].n_distinct <= 10
    # native-type min/max: numeric column is numerically ordered
    assert int(rows["n_chars"].min_val) <= int(rows["n_chars"].max_val)


def test_token_entropy_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ent = token_entropy(docs).cache()
    try:
        rows = ent.collect()
        assert len(rows) > 0
        for r in rows:
            # 0 <= H <= ln(n_tokens), within float tolerance
            assert -1e-9 <= r.entropy <= math.log(r.n_tokens) + 1e-9
        # a repeated-token doc has strictly lower entropy than ln(n)
        one = spark.createDataFrame(
            [(1, "a a a a b"), (2, "v w x y z")], ["doc_id", "text"]
        )
        h = {r.doc_id: r.entropy for r in token_entropy(one).collect()}
        assert h[1] < h[2] and abs(h[2] - math.log(5)) < 1e-9
    finally:
        ent.unpersist()


def test_centroid_sim_symmetric_range(spark, sf_dir):
    df = pipeline.s06_centroid_sim(spark, sf_dir)
    p = plan(df)
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    rows = df.collect()
    n_labels = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("label")
        .distinct()
        .count()
    )
    assert len(rows) == n_labels * (n_labels - 1) // 2
    assert all(-1.0 <= r.cos <= 1.0 for r in rows)
    assert all(r.label_a < r.label_b for r in rows)


def test_p05_tombstone_delete_removes_exactly_list(spark, sf_dir):
    import pyspark.sql.functions as FF

    from llamadb_spark.queries.pipeline import p05_tombstone_delete

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    surv = p05_tombstone_delete(spark, sf_dir)
    n_tomb = docs.filter((FF.col("doc_id") % 97) == 0).count()
    assert surv.count() == docs.count() - n_tomb
    assert surv.filter((FF.col("doc_id") % 97) == 0).count() == 0


def test_t11_confusion_shares_sum_to_one(spark, sf_dir):
    import pyspark.sql.functions as FF

    from llamadb_spark.queries.pipeline import t11_langid_confusion

    df = t11_langid_confusion(spark, sf_dir)
    # no join back to the source: single scan of documents
    p = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert p.count("documents.parquet") == 1
    sums = df.groupBy("lang").agg(FF.sum("share_of_actual").alias("s")).collect()
    assert sums and all(abs(r.s - 1.0) < 1e-4 for r in sums)
