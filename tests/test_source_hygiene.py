"""Static source audit: the scale anti-patterns that the plan audit
can't see (they hide inside operator bodies, not plans) must never
grow silently. Every driver-side materialization in non-test source
is enumerated here WITH its boundedness argument; adding one means
adding an allowlist entry and a justification, same discipline as
the broadcast-hint and global-window audits in test_plan_audit.py.

Rules:
- `.toPandas()`, `.coalesce(1)`, `.repartition(1)`: forbidden
  outright in llamadb_spark/ (single-task materializations).
- `.collect()`: only at the allowlisted (file, count) sites below,
  each provably bounded.
- `.rdd` / `sparkContext.parallelize`: forbidden in queries/
  (the DataFrame-first contract); operators may touch the context
  only for broadcast variables.
"""

from __future__ import annotations

import glob
import os
import re

ROOT = os.path.join(os.path.dirname(__file__), "..", "llamadb_spark")

#: file (repo-relative) -> max allowed comment-stripped .collect()
#: occurrences, each justified:
#:   dialect.py:  constraint-violation check — one agg row of scalars
#:   dedup.py:    CC fixpoint round check — exactly 2 scalars/round
#:   similarity.py: (1) capped broadcast collect with explicit raise
#:     beyond max_broadcast_rows, (2) n_cells centroid seeds,
#:     (3) K·d per-cell means, (4) MMR pool collect ≤ pool rows,
#:     (5) PQ codebook seeds (n_codes rows), (6) PQ per-(sub, code)
#:     Lloyd means (m·k rows), (7) PQ query vectors for the ADC
#:     lookup tables (|query_ids| rows), (8) IVF-PQ query vectors
#:     for probe cells + ADC tables (|query_ids| rows, s17),
#:     (9) residual-PQ codebook seeds (n_codes rows) and
#:     (10) residual per-(sub, code) Lloyd means (m·k rows) — the
#:     IVFADC trainer's twins of (5)/(6)
#:   pipeline.py: s10's and s15's 1-row query-vector fetches
#:     (orderBy+limit(1) each)
#:   plans/explain.py: run_with_observation returns the caller's own
#:     materialized result — the collect IS the caller's action (the
#:     observe node rides along); boundedness is the caller's query,
#:     not a loop this helper introduces
_COLLECT_ALLOW = {
    "sql/dialect.py": 1,
    "operators/dedup.py": 1,
    "operators/similarity.py": 10,
    "queries/pipeline.py": 2,
    "plans/explain.py": 1,
    # 1-row max-timestamp scalar for the watermark sentinel staging
    "streaming/streams.py": 1,
    # persisted IVF-PQ index: model load (n_cells + m·n_codes small
    # rows) + the 1-row manifest and 1-row params reads of the
    # versioned store (round 10)
    "operators/ann_index.py": 3,
}

_FORBIDDEN = re.compile(r"\.toPandas\(\)|\.coalesce\(1\)|\.repartition\(1\)")
_COLLECT = re.compile(r"\.collect\(\)")
# .rdd.getNumPartitions() is exempt: a metadata-only partition-count
# probe (the loader's single-row-group rebalance check), no RDD
# compute path involved
_RDD = re.compile(
    r"\.rdd\b(?!\.getNumPartitions)|sparkContext\.parallelize"
)


def _code_lines(path: str):
    for line in open(path, encoding="utf-8").read().splitlines():
        yield line.split("#")[0]


def _sources():
    for f in glob.glob(os.path.join(ROOT, "**", "*.py"), recursive=True):
        yield os.path.relpath(f, ROOT).replace(os.sep, "/"), f


def test_no_single_task_materializations():
    hits = {}
    for rel, f in _sources():
        n = sum(len(_FORBIDDEN.findall(c)) for c in _code_lines(f))
        if n:
            hits[rel] = n
    assert not hits, f"single-task materializations: {hits}"


def test_collect_only_at_bounded_allowlisted_sites():
    over = {}
    for rel, f in _sources():
        n = sum(len(_COLLECT.findall(c)) for c in _code_lines(f))
        if n > _COLLECT_ALLOW.get(rel, 0):
            over[rel] = (n, _COLLECT_ALLOW.get(rel, 0))
    assert not over, (
        "unallowlisted driver-side collect (actual, allowed) — add a "
        f"boundedness justification above: {over}"
    )


def test_no_rdd_anywhere_in_package():
    """Round 10 (VERDICT r09 #7): the RDD ban extends from queries/
    to the ENTIRE package — .rdd forfeits Catalyst, codegen, and AQE,
    so any use must be a deliberate, listed exception. The only
    remaining exemption is the metadata-only
    .rdd.getNumPartitions() probe (built into _RDD), used by the
    loader's single-row-group rebalance check
    (queries/pipeline_common.py) — no RDD compute path involved.
    The last compute-path use (dialect.py's df.rdd.isEmpty(), which
    forced a Python->RDD conversion just to probe emptiness) now
    uses DataFrame.isEmpty(), which drives a limit(1) query plan."""
    hits = {}
    for rel, f in _sources():
        n = sum(len(_RDD.findall(c)) for c in _code_lines(f))
        if n:
            hits[rel] = n
    assert not hits, f"RDD usage in the DataFrame-first package: {hits}"
