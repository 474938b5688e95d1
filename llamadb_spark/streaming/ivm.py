"""Streaming incremental view maintenance: a live changelog stream
keeps a per-group aggregate ("materialized view") current without
ever rescanning the base table — the foreachBatch twin of
sources/versioned.py maintain_group_agg (SURVEY §2 #218), closing
the loop from batch IVM to continuous IVM.

Shape: each micro-batch of changelog rows (key cols + change +
`_old`/`_new` structs, the version_changelog contract) is applied to
the previous aggregate via retraction/addition deltas, and the new
aggregate is committed as the next VERSION of a versioned table —
so the MV itself gets time travel, version diffs, and atomic
reader-safe commits for free (readers of version v are untouched
while v+1 is being written; the manifest flips last).

Exactly-once: foreachBatch is at-least-once — a driver crash between
the sink commit and the stream checkpoint replays the batch — so the
batch id is recorded INSIDE the version directory before the
manifest flip. The directory is invisible to readers until the flip,
which makes {aggregate data + batch id} one atomic commit; a
replayed batch finds its id among committed versions and skips
(the standard idempotent-foreachBatch ledger, here with zero extra
commit phases). An orphaned v=N directory from a crash before the
flip is invisible to readers and cleared on the next commit attempt.

Scale: per-batch cost is |changes| + |MV| (the MV is group-
cardinality-sized — at 100 TB of facts a per-group rollup is
typically MBs, and the delta join is groups-touched-bounded). The
base table is never read.

Reference parity: llamadb has no materialized views (no CREATE VIEW
in sqlsyntax/ast.rs); this is pipeline infrastructure for the
analytics surface, same rationale as versioned tables.
"""

from __future__ import annotations

import os
import shutil
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from llamadb_spark.sources import versioned

#: name of the batch-id marker inside a version directory; the
#: leading underscore makes Spark's parquet reader ignore it (same
#: convention as _SUCCESS).
_BATCH_MARKER = "_ivm_batch"


def committed_batches(mv_path: str) -> dict[int, int]:
    """batch_id -> MV version for every committed batch: the union of
    in-directory markers (retained versions) and the append-only
    ``_batches`` ledger at the table root, into which
    versioned.vacuum copies a doomed version's marker before deleting
    the directory. The ledger survives retention, so a checkpoint-
    loss replay still skips batches whose snapshots were vacuumed
    (bounded by total commit count — one short line per batch).

    Replay caveat (documented contract): skip-on-replay assumes the
    replayed source produces the SAME batch boundaries and ids as the
    original run. availableNow file streams with a retained
    checkpoint satisfy this (the offset log pins file→batch
    assignment); after a LOST checkpoint, batch ids restart from 0,
    so the caller must pin boundaries externally — e.g. one file per
    trigger via maxFilesPerTrigger=1 with lexicographic file order,
    the configuration the checkpoint-loss test uses. Replays with
    different batching are NOT exactly-once and must bootstrap a
    fresh MV path instead."""
    out: dict[int, int] = {}
    ledger = os.path.join(mv_path, "_batches")
    if os.path.exists(ledger):
        with open(ledger) as fh:
            for lineno, line in enumerate(fh, 1):
                # per-line validation: a torn/malformed line (crash
                # mid-append) must skip ONLY itself — dropping every
                # subsequent entry would make a checkpoint-loss
                # replay re-apply already-committed batches, the
                # exact double-count the ledger exists to prevent
                parts = line.split()
                try:
                    if len(parts) == 2:
                        out[int(parts[0])] = int(parts[1])
                    elif line.strip():
                        raise ValueError("wrong field count")
                except ValueError:
                    warnings.warn(
                        f"ivm: skipping malformed ledger line "
                        f"{ledger}:{lineno}: {line.strip()!r}"
                    )
    for v in versioned.versions(mv_path):
        marker = os.path.join(mv_path, f"v={v}", _BATCH_MARKER)
        try:
            with open(marker) as fh:
                out[int(fh.read().strip())] = v
        except (OSError, ValueError):
            continue
    return out


def _commit_version(df: DataFrame, mv_path: str, batch_id: int) -> int:
    """write_version with the batch id stamped inside the version
    directory BEFORE the manifest flip — one atomic commit unit."""
    cur = versioned.latest_version(mv_path)
    nxt = 0 if cur is None else cur + 1
    vdir = os.path.join(mv_path, f"v={nxt}")
    if os.path.isdir(vdir):
        # orphan from a crash after the parquet write but before the
        # manifest flip: never visible to any reader, safe to clear
        shutil.rmtree(vdir)
    df.write.mode("overwrite").parquet(vdir)
    with open(os.path.join(vdir, _BATCH_MARKER), "w") as fh:
        fh.write(str(batch_id))
    tmp = os.path.join(mv_path, "_latest.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(nxt))
    os.replace(tmp, os.path.join(mv_path, "_latest"))
    return nxt


def apply_changelog_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    batch_id: int,
    mv_path: str,
    group_col: str,
    value_col: str,
) -> None:
    """One IVM step: skip if this batch already committed (replay),
    else delta-apply it to the latest MV version and commit."""
    if batch_id in committed_batches(mv_path):
        return
    lv = versioned.latest_version(mv_path)
    if lv is None:
        gtype = next(
            f.dataType
            for f in batch_df.schema["_new"].dataType.fields
            if f.name == group_col
        )
        prev = spark.createDataFrame(
            [],
            StructType(
                [
                    StructField(group_col, gtype),
                    StructField("n_rows", LongType()),
                    StructField("total", DoubleType()),
                ]
            ),
        )
    else:
        prev = versioned.read_version(spark, mv_path, lv)
    new_agg = versioned.maintain_group_agg(
        prev, batch_df, group_col, value_col
    )
    _commit_version(new_agg, mv_path, batch_id)


def ivm_group_agg_stream(
    changelog_stream: DataFrame,
    mv_path: str,
    group_col: str,
    value_col: str,
    name: str = "ivm_group_agg",
    timeout_s: int = 120,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Drain a finite changelog stream (availableNow), applying each
    micro-batch to the versioned MV at ``mv_path``. Returns the final
    MV DataFrame. Bootstrap = replaying the full insert changelog
    against an empty MV (schema derived from the `_new` struct).

    ``checkpoint_dir`` makes the drain RESUMABLE: a later invocation
    with the same checkpoint processes only changelog files that
    arrived since, and a LOST checkpoint (full source replay) is
    harmless — every replayed batch finds its id in the version
    ledger and skips (tested in tests/test_streaming.py)."""
    spark = changelog_stream.sparkSession

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        apply_changelog_batch(
            spark, batch_df, batch_id, mv_path, group_col, value_col
        )

    w = changelog_stream.writeStream.foreachBatch(_apply)
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.queryName(name).trigger(availableNow=True).start()
    try:
        # no stateful timers in this query — availableNow terminates
        # on its own once the source is drained
        q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    lv = versioned.latest_version(mv_path)
    assert lv is not None, "changelog stream produced no MV version"
    return versioned.read_version(spark, mv_path, lv)
