"""Multimodal plumbing tests: binary envelope schema + the Arrow
mapInPandas decode-stub path (the part a real decoder would slot
into)."""

from __future__ import annotations

import hashlib

from pyspark.sql.types import BinaryType

from llamadb_spark.operators import multimodal


def test_attach_payload_schema(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
    env = multimodal.attach_payload(docs)
    assert isinstance(env.schema["payload"].dataType, BinaryType)
    row = env.filter("doc_id = 0").collect()[0]
    src = docs.filter("doc_id = 0").collect()[0].text
    assert bytes(row.payload) == src.encode("utf-8")
    assert row.meta.n_bytes == len(src.encode("utf-8"))
    assert row.meta.content_sha == hashlib.sha256(src.encode()).hexdigest()


def test_decode_media_stub(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    decoded = multimodal.decode_media(multimodal.attach_payload(docs))
    rows = decoded.collect()
    assert len(rows) == 20
    for r in rows:
        assert r.media_type == "text/plain"
        assert 1 <= r.width <= 1920 and 1 <= r.height <= 1080
        assert len(r.sha_prefix) == 16
    # determinism: second run produces identical dims
    again = {r.doc_id: (r.width, r.height) for r in decoded.collect()}
    assert all(again[r.doc_id] == (r.width, r.height) for r in rows)


def test_m03_frame_sample_bounded_and_python_free(spark, sf_dir):
    import pyspark.sql.functions as FF

    from llamadb_spark.operators.multimodal import sample_frames

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = sample_frames(docs, max_frames=16).cache()
    try:
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # the sampling plan itself is codegen-only (the real decoder
        # slots in as a later mapInPandas stage)
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
        # per-doc frame count == min(duration, cap), idx contiguous
        per = df.groupBy("doc_id", "duration_s", "n_frames").agg(
            FF.count(FF.lit(1)).alias("c"),
            FF.min("frame_idx").alias("mn"),
            FF.max("frame_idx").alias("mx"),
        )
        bad = per.filter(
            (FF.col("c") != FF.col("n_frames"))
            | (FF.col("n_frames") != FF.least(FF.col("duration_s"), FF.lit(16)))
            | (FF.col("mn") != 0)
            | (FF.col("mx") != FF.col("c") - 1)
        )
        assert bad.count() == 0
        assert df.select("frame_sha").distinct().count() == df.count()
    finally:
        df.unpersist()


def test_chunk_payload_reconstructs_exactly(spark):
    import hashlib

    from llamadb_spark.operators.multimodal import attach_payload, chunk_payload

    docs = spark.createDataFrame(
        [(1, "hello world this is a chunked payload"), (2, "xy"), (3, "")],
        ["doc_id", "text"],
    )
    out = chunk_payload(attach_payload(docs), chunk_bytes=8)
    rows = sorted(
        (r.doc_id, r.chunk_idx, bytes(r.chunk), r.chunk_len, r.chunk_sha)
        for r in out.collect()
    )
    # concatenation in chunk order reconstructs each non-empty payload
    for doc_id, text in [(1, "hello world this is a chunked payload"), (2, "xy")]:
        chunks = [c for d, i, c, ln, sh in rows if d == doc_id]
        assert b"".join(chunks) == text.encode()
    # empty payloads contribute zero chunks
    assert not any(d == 3 for d, *_ in rows)
    # every chunk's sha and length are self-consistent, full chunks
    # are exactly chunk_bytes
    for d, i, c, ln, sh in rows:
        assert ln == len(c) and sh == hashlib.sha256(c).hexdigest()
        assert ln == 8 or (d, i) == max((dd, ii) for dd, ii, *_ in rows if dd == d)


def test_embed_media_stub_deterministic_unit_norm(spark, sf_dir):
    """Stub media encoder: same payload → identical vector across
    runs; every vector unit-norm; distinct payloads diverge."""
    import math

    from llamadb_spark.operators.multimodal import (
        attach_payload,
        embed_media_stub,
    )
    from llamadb_spark.queries.pipeline import _docs

    media = attach_payload(_docs(spark, sf_dir)).filter(
        "doc_id IN (0, 1, 2)"
    )
    a = {r.id: r.media_vec for r in embed_media_stub(media).collect()}
    b = {r.id: r.media_vec for r in embed_media_stub(media).collect()}
    assert a == b and len(a) == 3
    for v in a.values():
        assert len(v) == 64
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-9
    assert a[0] != a[1]


def test_crossmodal_knn_shape_and_ranks(spark, sf_dir):
    """m07 plumbing at the OPERATOR level (the query key now emits
    the banded attestation summary): exactly k ranked neighbors per
    media query, cos non-increasing within each query, neighbors
    drawn from the embeddings corpus; and the query-level summary
    attests the same per query."""
    from pyspark.sql.functions import col

    from llamadb_spark.operators import multimodal
    from llamadb_spark.queries.pipeline import (
        M07_QUERY_DOCS,
        _docs,
        _emb,
        m07_crossmodal_knn,
    )

    media = multimodal.attach_payload(_docs(spark, sf_dir)).filter(
        col("doc_id").isin(M07_QUERY_DOCS)
    )
    vecs = multimodal.embed_media_stub(media)
    out = multimodal.crossmodal_knn(
        vecs, _emb(spark, sf_dir), M07_QUERY_DOCS, k=5
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.media_id, []).append(r)
    assert set(by_q) == set(M07_QUERY_DOCS)
    vec_ids = {
        r.vec_id for r in _emb(spark, sf_dir).select("vec_id").collect()
    }
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
        cs = [r.cos for r in rows]
        assert all(cs[i] >= cs[i + 1] for i in range(len(cs) - 1))
        assert all(r.neighbor_id in vec_ids for r in rows)

    summary = m07_crossmodal_knn(spark, sf_dir).collect()
    assert {r.media_id for r in summary} == set(M07_QUERY_DOCS)
    assert all(
        r.n_neighbors == 5 and r.neighbors_distinct and r.cos_bounded
        for r in summary
    )
