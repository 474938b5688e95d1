"""Per-key wall-time attribution: build vs execute vs driver gaps.

Usage: python tools/profile_keys.py <sf_dir> key [key ...]

For each key (fresh Spark jobs, shared session):
- build_s: time in queries[name](spark, sf_dir) — python DataFrame
  construction, py4j round trips, eager localCheckpoints.
- exec_s:  time in the noop-sink write (guide §1.4).
- jobs:    per-job [duration, gap-before] from the status tracker, so
  driver-side gaps (planning, collect round trips) are visible.

Reads the same env contract as bench.py. Output: one JSON line/key.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from llamadb_spark.session import get_spark

    sf_dir = sys.argv[1]
    keys = sys.argv[2:]
    import os

    os.environ.setdefault("SPARK_GRAFT_UI", "1")
    spark = get_spark("profile-keys")
    spark.sparkContext.setLogLevel("ERROR")
    # Same warmup as bench.py: JVM + file listing.
    qs_warm = e.queries()
    qs_warm["q09_order_limit"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = e.queries()
    for name in keys:
        sc.setJobDescription(f"profile:{name}")
        jobs_before = set(tracker.getJobIdsForGroup() or [])
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        # Job timeline via the UI REST API (covers ALL jobs incl.
        # those run eagerly during build).
        jobs = []
        try:
            import urllib.request

            ui = sc.uiWebUrl
            app = sc.applicationId
            with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs") as r:
                data = json.load(r)
            for j in sorted(data, key=lambda j: j["jobId"]):
                if j["jobId"] in jobs_before:
                    continue
                sub = j.get("submissionTime")
                comp = j.get("completionTime")
                if not (sub and comp):
                    continue
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
                s = datetime.strptime(sub, fmt).timestamp()
                c = datetime.strptime(comp, fmt).timestamp()
                if s < t0 - 1:
                    continue
                jobs.append(
                    {
                        "id": j["jobId"],
                        "dur": round(c - s, 3),
                        "start_rel": round(s - t0, 3),
                        "desc": (j.get("description") or "")[:60],
                    }
                )
        except Exception as ex:  # UI may be disabled
            jobs = [{"err": str(ex)[:100]}]
        print(
            json.dumps(
                {
                    "key": name,
                    "build_s": round(t1 - t0, 3),
                    "exec_s": round(t2 - t1, 3),
                    "total_s": round(t2 - t0, 3),
                    "jobs": jobs,
                }
            ),
            flush=True,
        )
        sc.setJobDescription(None)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
