"""Multimodal column plumbing (SURVEY §2 m-rows).

Images/audio/video are opaque `binary` payloads + a typed metadata
struct. The container has no decode libraries, so the decode step is
a clearly-marked deterministic STUB — but the Spark-side plumbing
(schema, Arrow batching via mapInPandas, partition shape) is real
and is what matters at 100 TB: payloads never pass through Python
row-at-a-time, only as Arrow record batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the decode stage — what a real image decoder
#: would emit (dims from the header, not a full pixel decode).
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sha_prefix", StringType()),
    ]
)


def attach_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Wrap each document in a multimodal envelope: binary payload
    (UTF-8 bytes of the text — the deterministic stand-in for real
    media bytes) + typed metadata. This is the ingest-side schema a
    media table would carry."""
    return docs.select(
        col(id_col),
        F.encode(col(text_col), "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            lit("text/plain").alias("mime"),
            F.octet_length(F.encode(col(text_col), "UTF-8")).alias("n_bytes"),
            F.sha2(col(text_col), 256).alias("content_sha"),
        ).alias("meta"),
    )


def chunk_payload(
    media: DataFrame, chunk_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """Split each binary payload into fixed-size byte windows — the
    REAL (no-codec) half of audio/video preprocessing: framing a PCM
    stream into windows, slicing a blob for ranged upload, sharding
    oversized payloads to per-chunk rows. Pure JVM expressions
    (sequence → transform → substring on BINARY → posexplode), so
    payload bytes never cross into Python; row growth is bounded by
    ceil(n_bytes / chunk_bytes) per payload.

    Output: (id, chunk_idx, chunk bytes, chunk_len, chunk_sha);
    concatenating chunks in chunk_idx order reconstructs the payload
    (asserted in tests).
    """
    n_chunks = F.ceil(F.octet_length(col("payload")) / F.lit(chunk_bytes))
    chunks = F.transform(
        F.sequence(lit(0), n_chunks.cast("int") - 1),
        lambda i: F.substring(col("payload"), i * chunk_bytes + 1, chunk_bytes),
    )
    return (
        media.filter(F.octet_length(col("payload")) > 0)
        .select(col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            col(id_col),
            col("chunk_idx").cast("long").alias("chunk_idx"),
            "chunk",
            F.octet_length("chunk").cast("long").alias("chunk_len"),
            F.sha2("chunk", 256).alias("chunk_sha"),
        )
    )


def dedup_media(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact media dedup: one sha2 over the raw payload BYTES (no
    text decode — works for any mime type), one groupBy on the
    digest. The binary twin of operators/dedup.exact_dedup: at
    100 TB the shuffle carries (64-byte digest, id, n_bytes) per
    payload, never the payloads themselves, and map-side partial
    aggregation collapses same-file copies within each partition
    before the exchange.

    Output: (payload_sha, keep_id = min id, n_copies, n_bytes).
    """
    return (
        media.select(
            F.sha2(col("payload"), 256).alias("payload_sha"),
            col(id_col),
            F.octet_length(col("payload")).alias("n_bytes"),
        )
        .groupBy("payload_sha")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.first("n_bytes").alias("n_bytes"),
        )
    )


def decode_media(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """'Decode' payloads via Arrow-batched mapInPandas.

    STUB: real decoders (PIL/ffmpeg) are not in this container, so
    width/height are derived deterministically from the payload hash
    — swap `_decode_batch`'s body for the real library call in
    production. The mapInPandas shape (schema, batch iteration,
    no driver collect) is the real, tested scale path.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            shas = [hashlib.sha256(bytes(p)).hexdigest() for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "media_type": pdf["meta"].map(lambda m: m["mime"]),
                    "n_bytes": payloads.map(len).astype("int64"),
                    # deterministic fake decode: dims from hash bytes
                    "width": [int(s[:4], 16) % 1920 + 1 for s in shas],
                    "height": [int(s[4:8], 16) % 1080 + 1 for s in shas],
                    "sha_prefix": [s[:16] for s in shas],
                }
            )

    return media.mapInPandas(_decode_batch, DECODED_SCHEMA)


def resize_media(decoded: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-fit resize planning over decoded media dims — pure
    JVM-side arithmetic (no UDF): the post-decode stages of a media
    pipeline stay declarative whenever they only transform metadata.
    A real pixel resize would be one more mapInPandas stage consuming
    (payload, out_w, out_h).

    Output: decoded columns + (out_w, out_h) with aspect preserved,
    longest side == target (min 1px).
    """
    scale = F.least(
        lit(float(target)) / col("width"), lit(float(target)) / col("height")
    )
    return decoded.select(
        "*",
        F.greatest(F.floor(col("width") * scale), lit(1))
        .cast("int")
        .alias("out_w"),
        F.greatest(F.floor(col("height") * scale), lit(1))
        .cast("int")
        .alias("out_h"),
    )


def media_metadata(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """SQL-expressible metadata extraction over the multimodal
    envelope (the oracle-checkable slice of the pipeline): byte
    length + content hash per payload.

    Output: (id, mime, n_bytes, content_sha).
    """
    env = attach_payload(docs, id_col, text_col)
    return env.select(
        col(id_col),
        col("meta.mime").alias("mime"),
        col("meta.n_bytes").alias("n_bytes"),
        col("meta.content_sha").alias("content_sha"),
    )


def sample_frames(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_frames: int = 16,
) -> DataFrame:
    """Video frame-sampling plumbing: derive a clip duration from the
    payload hash (STUB for ffprobe — deterministic so the oracle can
    replicate it), emit one row per sampled frame at 1 fps capped at
    `max_frames`, each with its timestamp and a per-frame content key.

    The row expansion is a bounded JVM-side sequence+explode (factor
    <= max_frames, known up front) — the exact shape a real frame
    sampler has, with the ffmpeg call swapped in as one more
    mapInPandas stage consuming (payload, frame_ts_ms). Per-frame
    keys are sha256(content_sha || ':' || idx) — pure codegen, so
    the whole sampling plan stays Python-free.

    Output: (id, duration_s, n_frames, frame_idx, frame_ts_ms,
    frame_sha).
    """
    sha = F.sha2(col(text_col), 256)
    duration = (F.conv(F.substring(sha, 9, 3), 16, 10).cast("int") % 120 + 1).alias(
        "duration_s"
    )
    env = docs.select(col(id_col), sha.alias("content_sha"), duration)
    n_frames = F.least(col("duration_s"), lit(max_frames))
    return (
        env.withColumn("n_frames", n_frames.cast("int"))
        .withColumn("frame_idx", F.explode(F.sequence(lit(0), col("n_frames") - 1)))
        .select(
            col(id_col),
            "duration_s",
            "n_frames",
            col("frame_idx").cast("int").alias("frame_idx"),
            (col("frame_idx") * 1000).cast("long").alias("frame_ts_ms"),
            F.sha2(
                F.concat(col("content_sha"), lit(":"), col("frame_idx").cast("string")),
                256,
            ).alias("frame_sha"),
        )
    )


def embed_media_stub(
    media: DataFrame, id_col: str = "doc_id", dim: int = 64
) -> DataFrame:
    """Deterministic STUB media encoder (the CLIP-image-tower stand-
    in this container can't run): payload bytes → unit-norm
    ``dim``-vector derived from chained sha256 digests, so the same
    payload always embeds identically on any executor/rerun. The
    Spark-side plumbing is the real contract: Arrow-batched
    mapInPandas over a pre-projected (id, payload) relation — payload
    bytes enter Python ONCE, as record batches, and only (id, vector)
    comes back; a real encoder drops into ``_embed`` unchanged.

    Output: (id, media_vec array<double>), unit L2 norm.
    """
    import hashlib

    import numpy as np

    n_blocks = (dim + 31) // 32  # sha256 = 32 bytes per block

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            vecs = []
            for payload in batch["payload"]:
                raw = bytes(payload)
                blocks = [
                    hashlib.sha256(raw + bytes([i])).digest()
                    for i in range(n_blocks)
                ]
                x = np.frombuffer(
                    b"".join(blocks)[:dim], dtype=np.uint8
                ).astype(np.float64)
                x -= 127.5
                x /= np.maximum(np.linalg.norm(x), 1e-12)
                vecs.append(x.tolist())
            yield pd.DataFrame(
                {"id": batch["id"], "media_vec": vecs}
            )

    src = media.select(
        col(id_col).alias("id"), col("payload")
    )
    return src.mapInPandas(_embed, "id long, media_vec array<double>")


def crossmodal_knn(
    media_vecs: DataFrame,
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
) -> DataFrame:
    """Cross-modal retrieval: for each (stub-)embedded media item in
    ``query_ids``, the top-k cosine neighbors from the TEXT embedding
    corpus — the image→text retrieval shape (CLIP-style shared
    space). Same scale contract as knn_bruteforce: the query set is
    caller-bounded → broadcast; the corpus streams once; the only
    shuffle is the per-query top-k window over ≤ k·|queries| rows.

    Output: (media_id, neighbor_id, cos, rank).
    """
    from pyspark.sql.window import Window

    from llamadb_spark.operators.similarity import as_double, cosine

    queries = media_vecs.filter(col("id").isin(query_ids)).select(
        col("id").alias("media_id"), col("media_vec").alias("q_v")
    )
    corpus = emb.select(
        col(emb_id_col).alias("neighbor_id"),
        as_double(col(emb_vec_col)).alias("c_v"),
    )
    scored = corpus.crossJoin(F.broadcast(queries)).withColumn(
        "cos", F.round(cosine(col("q_v"), col("c_v")), 6)
    )
    w = Window.partitionBy("media_id").orderBy(
        col("cos").desc(), col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select("media_id", "neighbor_id", "cos", "rank")
    )
