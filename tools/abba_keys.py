"""Targeted fresh-process ABBA timing for a few keys (dev loop).

Usage: python tools/abba_keys.py <ref_commit> <sf_dir> key [key ...]

Runs 4 fresh processes in A(ref) B(head) B(head) A(ref) order, each
sweeping the listed keys twice (cold+warm) with the noop sink, and
prints per-key old-vs-new seconds. Complements tools/paired_bench.py
(the full-protocol closer) with a minutes-scale loop for development.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = r"""
import json, sys, time
tree, sf_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
keys = sys.argv[4:]
sys.path.insert(0, tree)
from llamadb_spark.queries import all_queries
from llamadb_spark.session import get_spark
spark = get_spark("abba-keys")
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
qs["q09_order_limit"](spark, sf_dir).write.format("noop").mode(
    "overwrite").save()
t = {}
for name in keys:
    runs = []
    for _ in range(2):
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        runs.append(round(time.time() - t0, 3))
    t[name] = runs
with open(out_path, "w") as fh:
    json.dump(t, fh)
"""


def _phase(tree: str, sf_dir: str, keys: list[str]) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        out_path = f.name
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(_RUNNER)
        runner = f.name
    subprocess.run(
        [sys.executable, runner, tree, sf_dir, out_path, *keys],
        check=True,
        cwd=tree,
        env={**os.environ, "PYTHONPATH": tree},
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(out_path) as fh:
        return json.load(fh)


def main() -> int:
    ref, sf_dir, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    worktree = os.path.join(tempfile.gettempdir(), f"abba_ref_{ref[:12]}")
    if not os.path.isdir(worktree):
        subprocess.run(
            ["git", "-C", REPO, "worktree", "add", "--detach", worktree, ref],
            check=True,
        )
    phases = []
    for tag, tree in [("A1", worktree), ("B1", REPO), ("B2", REPO), ("A2", worktree)]:
        print(f"phase {tag}...", flush=True)
        phases.append((tag, _phase(tree, sf_dir, keys)))
    for name in keys:
        cells = "  ".join(
            f"{tag}={'/'.join(str(x) for x in res[name])}" for tag, res in phases
        )
        amin = min(min(res[name]) for tag, res in phases if tag.startswith("A"))
        bmin = min(min(res[name]) for tag, res in phases if tag.startswith("B"))
        print(f"{name:28s} {cells}  ratio(new/old)={bmin/amin:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
