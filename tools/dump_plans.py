"""Dump .explain("formatted") for given query keys to files.

Usage: python tools/dump_plans.py <out_dir> <suffix> [sf_dir] key...
Writes <out_dir>/<key>_<suffix>.txt for each key.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    # DUMP_TREE lets a before-plan run import from a worktree pinned
    # at an older commit (r11).
    sys.path.insert(0, os.environ.get("DUMP_TREE", "/root/repo"))
    import __spark_entry__ as e
    from llamadb_spark.session import get_spark

    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3]
    keys = sys.argv[4:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    for name in keys:
        df = qs[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "->", len(txt), "chars")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
