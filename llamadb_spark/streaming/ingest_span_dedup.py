"""Streaming SUBSTRING-SPAN ingest dedup: the span-granular member of
the ingest-dedup family (#258 lexical jaccard, #266 embedding cosine,
this: #271 shared-substring mass) — each arriving micro-batch of
documents is probed against the EXISTING corpus for long shared
character runs (operators/spans.py seed-and-chain semantics, Lee et
al. 2022), documents whose duplicated-char fraction exceeds the gate
are dropped, and accepted documents append as the next corpus version
WITH their position-gram hashes precomputed.

The 100 TB design point mirrors ingest_embed_dedup: the corpus text is
NEVER re-hashed at probe time. Each accepted doc persists its
``gram_hashes`` array (xxhash64 of every position's L-gram, computed
once at ingest), so a micro-batch probe is

    batch gram hashing + (batch grams ⋈ stored corpus gram postings)
    + diagonal-island chaining on the matches

— one-sided, postings-bounded, independent of corpus pair count, with
the standard hot-gram occupancy cap. 64-bit gram hashes make the probe
near-exact: a hash collision can fabricate one false seed (a spurious
length-L span); expected false spans ≈ positions²/2⁶⁴ — negligible
below ~10⁹ corpus positions and documented here rather than hidden.

Exactly-once follows the family discipline: per-table batch-id
ledgers (vacuum-proof), matches committed before the corpus append,
replay probes the corpus as it was BEFORE the batch, and the span
parameters are stamped with the corpus so a mismatched ``min_len``
fails loudly instead of mis-chaining stored postings.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit
from pyspark.sql.window import Window

from llamadb_spark.sources import versioned
from llamadb_spark.streaming.ivm import committed_batches, _commit_version

_SPAN_PARAMS_FILE = "_span_params"


def _check_span_params(corpus_path: str, min_len: int) -> None:
    """Stamp or validate the gram length + hash family the persisted
    postings were computed with — islands chained across mixed gram
    lengths would produce silently-wrong extents. While the corpus
    has NO committed versions the stamp is freely rewritten (ADVICE
    r07: a failed first run must not pin an empty corpus); once a
    version exists it is immutable."""
    stamp = os.path.join(corpus_path, _SPAN_PARAMS_FILE)
    want = {"min_len": min_len, "gram_hash": "xxhash64"}
    if os.path.exists(stamp):
        with open(stamp) as fh:
            have = json.load(fh)
        if have != want:
            if not versioned.versions(corpus_path):
                with open(stamp, "w") as fh:
                    json.dump(want, fh)
                return
            raise ValueError(
                f"ingest_span_dedup: corpus at {corpus_path} was "
                f"indexed with {have}, this run uses {want}; stored "
                "gram postings are not comparable — reingest or match "
                "the stored parameters"
            )
    else:
        os.makedirs(corpus_path, exist_ok=True)
        with open(stamp, "w") as fh:
            json.dump(want, fh)


def _with_gram_hashes(docs: DataFrame, min_len: int) -> DataFrame:
    """Append ``gram_hashes``: xxhash64 of every 1-based position's
    length-L gram, as one array column (empty for short docs)."""
    n = F.length(col("text")) - lit(min_len - 1)
    return docs.withColumn(
        "gram_hashes",
        F.when(
            n >= 1,
            F.transform(
                F.sequence(lit(1), n),
                lambda p: F.xxhash64(F.substring(col("text"), p, min_len)),
            ),
        ).otherwise(F.array().cast("array<bigint>")),
    )


def _postings(docs: DataFrame, id_alias: str, pos_alias: str) -> DataFrame:
    return docs.select(
        col("doc_id").alias(id_alias),
        F.posexplode("gram_hashes").alias(pos_alias + "0", "h"),
    ).select(
        id_alias, (col(pos_alias + "0") + 1).alias(pos_alias), "h"
    )


def ingest_span_dedup_stream(
    doc_stream: DataFrame,
    corpus_path: str,
    matches_path: str,
    min_len: int = 40,
    dup_permille_gate: int = 500,
    max_gram_occ: int | None = 10_000,
    name: str = "ingest_span_dedup",
    timeout_s: int = 120,
) -> tuple[DataFrame, DataFrame]:
    """Drain a finite document stream (availableNow); per batch: probe
    the stored gram postings for shared runs ≥ min_len, compute each
    batch doc's duplicated-char mass (merged interval union over ALL
    its corpus matches), gate docs at ≥ ``dup_permille_gate`` per-mille
    duplication, append survivors (with their gram hashes) as the next
    corpus version. Returns (final corpus, all match rows
    (doc_id, match_id, dup_chars, doc_len, dup_permille) — one row per
    gated doc per matching corpus doc)."""
    from llamadb_spark.functions.blocking import drop_hot_keys

    spark = doc_stream.sparkSession
    _check_span_params(corpus_path, min_len)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        corpus_ledger = committed_batches(corpus_path)
        corpus_done = batch_id in corpus_ledger
        matches_done = batch_id in committed_batches(matches_path)
        if corpus_done and matches_done:
            return
        batch = _with_gram_hashes(
            batch_df.select("doc_id", "text"), min_len
        ).localCheckpoint()
        if corpus_done:
            base_v = corpus_ledger[batch_id] - 1
            if base_v >= 0 and base_v not in versioned.versions(corpus_path):
                raise RuntimeError(
                    f"ingest_span_dedup: replay of batch {batch_id} "
                    f"needs corpus version {base_v} of {corpus_path}, "
                    "which has been vacuumed; raise vacuum keep_last "
                    "or bootstrap fresh paths"
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
        c_post = drop_hot_keys(
            _postings(corpus, "match_id", "c_pos"), ["h"], max_gram_occ
        )
        b_post = _postings(batch, "doc_id", "b_pos")
        m = b_post.join(c_post, "h").select(
            "doc_id", "match_id", "b_pos", "c_pos",
            (col("b_pos") - col("c_pos")).alias("diag"),
        )
        isl = Window.partitionBy("doc_id", "match_id", "diag").orderBy(
            "b_pos"
        )
        spans = (
            m.withColumn("grp", col("b_pos") - F.row_number().over(isl))
            .groupBy("doc_id", "match_id", "diag", "grp")
            .agg(
                F.min("b_pos").alias("s"),
                (F.min("b_pos") + F.count(lit(1)) + lit(min_len - 1)).alias(
                    "e"
                ),
            )
        )
        # duplicated mass per batch doc: merge [s, e) intervals ACROSS
        # all of the doc's corpus matches (union semantics — two
        # corpus docs covering the same bytes count once)
        by_start = Window.partitionBy("doc_id").orderBy("s", "e")
        run_max = (
            Window.partitionBy("doc_id")
            .orderBy("s", "e")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        dup_mass = (
            spans.select("doc_id", "s", "e")
            .withColumn("prev_max_e", F.max("e").over(run_max))
            .withColumn(
                "new_isl",
                F.when(
                    col("prev_max_e").isNull()
                    | (col("s") > col("prev_max_e")),
                    1,
                ).otherwise(0),
            )
            .withColumn("isl", F.sum("new_isl").over(by_start))
            .groupBy("doc_id", "isl")
            .agg(F.min("s").alias("s"), F.max("e").alias("e"))
            .groupBy("doc_id")
            .agg(F.sum(col("e") - col("s")).alias("dup_chars"))
        )
        gated = (
            dup_mass.join(
                batch.select(
                    "doc_id", F.length("text").cast("long").alias("doc_len")
                ),
                "doc_id",
            )
            .withColumn(
                # true integer division — floor-of-double drifts by 1
                # past ~2^43 chars
                "dup_permille",
                F.expr("(1000 * dup_chars) div doc_len"),
            )
            .filter(col("dup_permille") >= dup_permille_gate)
        )
        matches = (
            gated.join(spans.select("doc_id", "match_id").distinct(), "doc_id")
            .select(
                "doc_id", "match_id", "dup_chars", "doc_len", "dup_permille"
            )
            .localCheckpoint()
        )
        if not matches_done:
            _commit_version(matches, matches_path, batch_id)
        if not corpus_done:
            dup_ids = matches.select("doc_id").distinct()
            accepted = batch.join(dup_ids, "doc_id", "left_anti")
            _commit_version(
                corpus.unionByName(accepted), corpus_path, batch_id
            )

    q = (
        doc_stream.writeStream.foreachBatch(_apply)
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
    assert vs, "document stream produced no committed batches"
    all_matches = versioned.read_version(spark, matches_path, vs[0])
    for v in vs[1:]:
        all_matches = all_matches.unionByName(
            versioned.read_version(spark, matches_path, v)
        )
    return corpus, all_matches
