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
