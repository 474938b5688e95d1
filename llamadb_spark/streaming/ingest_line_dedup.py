"""Streaming LINE ingest dedup: the line-granular member of the
ingest-dedup family (#258 lexical jaccard, #266 embedding cosine,
#271 substring spans — this one is d25's C4 keep-first semantics,
Raffel et al. 2020 §2.2, at ingest time). Per micro-batch of arriving
documents: every line of every doc is checked against the corpus's
persisted FIRST-OCCURRENCE line index; lines already seen (in any
earlier batch, or earlier within this batch by (doc_id, line_no))
are stripped, documents are reassembled from their surviving lines
and appended as the next corpus version, and the batch's new
first-occurrence line hashes append to the index — so the NEXT batch
dedups against them too.

The 100 TB design point mirrors the family: the corpus text is never
re-read at probe time — the index stores only ``xxhash64(line)``
(8 bytes per distinct line), so a micro-batch probe is one
hash-keyed anti-join against the index plus the batch's own
intra-batch keep-first, which is the d25 r09 shape — a map-side-
combinable ``groupBy(hash).min(struct(doc_id, line_no))`` + join-back
(AQE-skew-splittable), never a window partitioned by line content. A
64-bit hash collision falsely strips one innocent line; expected
collisions ≈ distinct-lines²/2⁶⁴ — negligible below ~10⁹ distinct
lines and documented here rather than hidden.

Exactly-once follows the family discipline: per-table batch-id
ledgers; the corpus (cleaned docs) commits BEFORE the index, and a
replay probes the index as it was before the batch, so the
half-committed window recomputes the identical cleaned docs and
lands only the missing commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from llamadb_spark.sources import versioned
from llamadb_spark.streaming.ivm import _commit_version, committed_batches

_INDEX_SCHEMA = "line_hash long"


def ingest_line_dedup_stream(
    doc_stream: DataFrame,
    corpus_path: str,
    index_path: str,
    name: str = "ingest_line_dedup",
    timeout_s: int = 120,
) -> tuple[DataFrame, DataFrame]:
    """Drain a finite document stream (availableNow); per micro-batch:

    1. explode docs into (doc_id, line_no, line) on newlines,
    2. intra-batch keep-first: the lexicographically-least
       (doc_id, line_no) per distinct line hash survives (d25's
       partial-agg shape),
    3. cross-batch: any line whose hash is already in the persisted
       index is stripped (keep-first is corpus-wide),
    4. append cleaned docs (doc_id, n_lines, n_removed, clean_text)
       as the next corpus version; append the batch's new
       first-occurrence hashes as the next index version.

    Returns (final cleaned-corpus DataFrame, final index DataFrame).
    Empty lines dedup like any other line (strict keep-first).
    """
    spark = doc_stream.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        index_ledger = committed_batches(index_path)
        index_done = batch_id in index_ledger
        corpus_done = batch_id in committed_batches(corpus_path)
        if index_done and corpus_done:
            return
        if index_done:
            # replaying the half-committed window: probe the index as
            # it was BEFORE this batch's append, or the batch's own
            # lines would gate themselves on replay
            base_v = index_ledger[batch_id] - 1
            index = (
                spark.createDataFrame([], _INDEX_SCHEMA)
                if base_v < 0
                else versioned.read_version(spark, index_path, base_v)
            )
        else:
            lv = versioned.latest_version(index_path)
            index = (
                spark.createDataFrame([], _INDEX_SCHEMA)
                if lv is None
                else versioned.read_version(spark, index_path, lv)
            )

        lines = batch_df.select(
            "doc_id",
            F.posexplode(F.split(col("text"), "\n", -1)).alias(
                "line_no", "line"
            ),
        ).withColumn("line_hash", F.xxhash64("line"))
        # intra-batch keep-first (the d25 shape: combinable partial
        # agg + skew-splittable join-back, no content window)
        first = (
            lines.groupBy("line_hash")
            .agg(F.min(F.struct("doc_id", "line_no")).alias("k"))
            .select(
                "line_hash",
                col("k.doc_id").alias("keep_doc"),
                col("k.line_no").alias("keep_line_no"),
            )
        )
        # cross-batch gate: a hash already indexed strips ALL of the
        # batch's occurrences, including its intra-batch first
        new_first = first.join(index, "line_hash", "left_anti")
        marked = lines.join(
            new_first, "line_hash", "left"
        ).withColumn(
            "is_first",
            (col("doc_id") == col("keep_doc"))
            & (col("line_no") == col("keep_line_no")),
        )
        cleaned = (
            marked.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_lines"),
                F.sum(
                    (~F.coalesce(col("is_first"), F.lit(False))).cast(
                        "long"
                    )
                ).alias("n_removed"),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.coalesce(
                                        col("is_first"), F.lit(False)
                                    ),
                                    F.struct("line_no", "line"),
                                )
                            )
                        ),
                        lambda x: x["line"],
                    ),
                    "\n",
                ).alias("clean_text"),
            )
            .localCheckpoint()
        )
        # corpus first: a crash between the commits replays against
        # the UNCHANGED index, recomputes identical cleaned docs,
        # skips the corpus commit, and lands the index append.
        if not corpus_done:
            lv = versioned.latest_version(corpus_path)
            prev = (
                cleaned.limit(0)
                if lv is None
                else versioned.read_version(spark, corpus_path, lv)
            )
            _commit_version(
                prev.unionByName(cleaned), corpus_path, batch_id
            )
        if not index_done:
            _commit_version(
                index.unionByName(new_first.select("line_hash")),
                index_path,
                batch_id,
            )

    q = (
        doc_stream.writeStream.foreachBatch(_apply)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        # no stateful timers — availableNow terminates on its own
        q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    corpus = versioned.read_version(spark, corpus_path)
    index = versioned.read_version(spark, index_path)
    return corpus, index
