"""Streaming EMBEDDING ingest dedup: the vector-space twin of
streaming/ingest_dedup.py (#258) — each arriving micro-batch of
embeddings is probed against the EXISTING corpus for semantic
near-duplicates (cosine ≥ threshold), duplicates are gated out, and
accepted vectors append as the next corpus version so later batches
dedup against them too.

The 100 TB design point: the corpus is NEVER re-hashed. Hyperplane
bucket signatures (deterministic seeded planes — the same
operators/similarity._hyperplane_bucket_udf the batch LSH path uses)
are computed once per vector AT INGEST and PERSISTED with the corpus
version, so a micro-batch's probe cost is

    batch-hashing + (batch buckets ⋈ stored corpus buckets) + exact
    cosine verify on the candidates

— one-sided, bucket-bounded, independent of corpus pair count, with
the usual occupancy cap on hot corpus buckets. Exactly-once follows
ingest_dedup's discipline: per-table batch-id ledgers (vacuum-proof
via versioned's `_batches` file), matches committed before the
corpus append, and a replay after the half-committed crash window
probes the corpus as it was BEFORE the batch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from llamadb_spark.sources import versioned
from llamadb_spark.streaming.ivm import committed_batches, _commit_version

#: LSH-parameter stamp at the corpus root: persisted signatures are
#: only valid under the (num_planes, num_tables, seed family) that
#: wrote them — probing them with different parameters would silently
#: produce wrong candidates, so a mismatch must fail loudly instead.
_LSH_PARAMS_FILE = "_lsh_params"


def _check_lsh_params(
    corpus_path: str, num_planes: int, num_tables: int
) -> None:
    """Stamp or validate the LSH parameters the persisted corpus
    signatures were computed with. The stamp includes the plane-seed
    family (signatures from a different seed would collide-compare
    meaninglessly even at equal plane counts). While the corpus has
    NO committed versions the stamp is freely rewritten (ADVICE r07:
    a first run that failed before committing anything must not pin
    a still-empty corpus to its parameters); once a version exists
    the stamp is immutable and a mismatch fails loudly."""
    from llamadb_spark.operators.similarity import LSH_PLANE_SEED
    from llamadb_spark.sources.versioned import versions

    stamp = os.path.join(corpus_path, _LSH_PARAMS_FILE)
    want = {
        "num_planes": num_planes,
        "num_tables": num_tables,
        "plane_seed": LSH_PLANE_SEED,
    }
    if os.path.exists(stamp):
        with open(stamp) as fh:
            have = json.load(fh)
        if have != want:
            if not versions(corpus_path):
                # nothing committed yet — the stamp pins nothing
                with open(stamp, "w") as fh:
                    json.dump(want, fh)
                return
            raise ValueError(
                f"ingest_embed_dedup: corpus at {corpus_path} was "
                f"indexed with LSH params {have}, but this run uses "
                f"{want}; persisted bucket signatures are not "
                "comparable across parameterizations — reingest the "
                "corpus or match the stored parameters"
            )
    else:
        os.makedirs(corpus_path, exist_ok=True)
        with open(stamp, "w") as fh:
            json.dump(want, fh)


def _banded(vecs: DataFrame, num_planes: int, num_tables: int) -> DataFrame:
    """(vec_id, tbl, bucket) rows from the stored/computed signature
    array."""
    return vecs.select(
        "vec_id", F.posexplode("buckets").alias("tbl", "bucket")
    )


def _with_buckets(
    batch: DataFrame, num_planes: int, num_tables: int
) -> DataFrame:
    from llamadb_spark.functions.vector import as_double
    from llamadb_spark.operators.similarity import _hyperplane_bucket_udf

    udf = _hyperplane_bucket_udf(num_planes, num_tables)
    return batch.withColumn(
        "buckets", udf(as_double(col("embedding")))
    )


def ingest_embed_dedup_stream(
    vec_stream: DataFrame,
    corpus_path: str,
    matches_path: str,
    threshold: float = 0.9,
    num_planes: int = 6,
    num_tables: int = 40,
    max_bucket_size: int | None = 10_000,
    name: str = "ingest_embed_dedup",
    timeout_s: int = 120,
) -> tuple[DataFrame, DataFrame]:
    """Drain a finite embedding stream (availableNow); per batch:
    probe the stored-signature corpus index for cosine near-dups,
    drop matched vectors at the gate, append survivors (with their
    signatures) as the next corpus version. Returns (final corpus,
    all match rows (vec_id, match_id, cos))."""
    from llamadb_spark.functions.blocking import drop_hot_keys
    from llamadb_spark.functions.vector import as_double, cosine

    spark = vec_stream.sparkSession
    _check_lsh_params(corpus_path, num_planes, num_tables)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        corpus_ledger = committed_batches(corpus_path)
        corpus_done = batch_id in corpus_ledger
        matches_done = batch_id in committed_batches(matches_path)
        if corpus_done and matches_done:
            return
        batch = _with_buckets(
            batch_df, num_planes, num_tables
        ).localCheckpoint()
        if corpus_done:
            base_v = corpus_ledger[batch_id] - 1
            if base_v >= 0 and base_v not in versioned.versions(corpus_path):
                # replay-after-vacuum: the pre-batch snapshot this
                # half-committed batch must probe has been retention-
                # deleted — recomputing its matches is impossible, so
                # fail with the remedy instead of crashing in the
                # parquet reader
                raise RuntimeError(
                    f"ingest_embed_dedup: replay of batch {batch_id} "
                    f"needs corpus version {base_v} of {corpus_path}, "
                    "which has been vacuumed; raise vacuum keep_last "
                    "above the replay horizon, or bootstrap a fresh "
                    "corpus/matches path"
                )
            corpus = (
                batch.limit(0)
                if base_v < 0
                else versioned.read_version(spark, corpus_path, base_v)
            )
        else:
            lv = versioned.latest_version(corpus_path)
            corpus = (
                batch.limit(0)
                if lv is None
                else versioned.read_version(spark, corpus_path, lv)
            )
        c_banded = drop_hot_keys(
            _banded(corpus, num_planes, num_tables),
            ["tbl", "bucket"],
            max_bucket_size,
        )
        b_banded = _banded(batch, num_planes, num_tables)
        cand = (
            b_banded.join(
                c_banded.select(
                    col("vec_id").alias("match_id"), "tbl", "bucket"
                ),
                ["tbl", "bucket"],
            )
            .select("vec_id", "match_id")
            .distinct()
        )
        matches = (
            cand.join(
                batch.select(
                    "vec_id", as_double(col("embedding")).alias("b_v")
                ),
                "vec_id",
            )
            .join(
                corpus.select(
                    col("vec_id").alias("match_id"),
                    as_double(col("embedding")).alias("c_v"),
                ),
                "match_id",
            )
            .withColumn("cos", F.round(cosine(col("b_v"), col("c_v")), 6))
            .filter(col("cos") >= threshold)
            .select("vec_id", "match_id", "cos")
            .localCheckpoint()
        )
        # matches first (see ingest_dedup): a crash between the two
        # commits replays into identical matches (skip) + the
        # missing corpus append
        if not matches_done:
            _commit_version(matches, matches_path, batch_id)
        if not corpus_done:
            dup_ids = matches.select("vec_id").distinct()
            accepted = batch.join(dup_ids, "vec_id", "left_anti")
            _commit_version(
                corpus.unionByName(accepted), corpus_path, batch_id
            )

    q = (
        vec_stream.writeStream.foreachBatch(_apply)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    corpus = versioned.read_version(spark, corpus_path)
    vs = versioned.versions(matches_path)
    assert vs, "embedding stream produced no committed batches"
    all_matches = versioned.read_version(spark, matches_path, vs[0])
    for v in vs[1:]:
        all_matches = all_matches.unionByName(
            versioned.read_version(spark, matches_path, v)
        )
    return corpus, all_matches
