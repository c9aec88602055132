"""Per-query profile: wall seconds + exact Spark job/stage counts.

Usage: python tools/profile_queries.py [--sf DIR] [--runs N] [query ...]
       (no query args = every HEADLINE query)

Job/stage counts come from the DAGScheduler's monotone id counters, so
they are exact and independent of host load — the cheap way to find
queries paying for extra blocking actions (guide §1: measure first;
§5: no driver loops). Output: one line per query, sorted by seconds,
plus a JSON dump to /tmp/profile_queries.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 1
    names: list[str] = []
    while args:
        a = args.pop(0)
        if a == "--sf":
            sf_dir = args.pop(0)
        elif a == "--runs":
            runs = int(args.pop(0))
        else:
            names.append(a)

    from bench import HEADLINE
    from vptstools_spark.analytics import all_queries
    from vptstools_spark.session import get_spark

    spark = get_spark("profile_queries")
    sc = spark.sparkContext
    queries = all_queries()
    if not names:
        names = list(HEADLINE)

    def job_id() -> int:
        return int(sc._jsc.sc().dagScheduler().nextJobId())

    def stage_id() -> int:
        return int(sc._jsc.sc().dagScheduler().nextStageId())

    # warmup pass (JIT/codegen) at the smallest sf
    warm = "/root/testdata/sf0.001"
    for n in names:
        try:
            queries[n](spark, warm).count()
        except Exception:
            pass

    out: dict[str, dict] = {}
    for n in names:
        sc.setJobDescription(f"profile:{n}")
        # steady-state prewarm at the TARGET sf: memoized fixtures
        # (_TT_CACHE etc.) build on the first run per (query, sf); the
        # bench's median-of-5 discards that run, so job counts and times
        # here must too
        queries[n](spark, sf_dir).count()
        best = None
        j0, s0 = job_id(), stage_id()
        for _ in range(runs):
            t0 = time.perf_counter()
            queries[n](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        j1, s1 = job_id(), stage_id()
        out[n] = {
            "sec": round(best, 3),
            "jobs": (j1 - j0) // runs,
            "stages": (s1 - s0) // runs,
        }
        sc.setJobDescription(None)

    for n, r in sorted(out.items(), key=lambda kv: -kv[1]["sec"]):
        print(f"{r['sec']:8.3f}s  jobs={r['jobs']:3d} stages={r['stages']:3d}  {n}")
    tot = sum(r["sec"] for r in out.values())
    print(f"total {tot:.1f}s  jobs {sum(r['jobs'] for r in out.values())}  "
          f"stages {sum(r['stages'] for r in out.values())}")
    with open("/tmp/profile_queries.json", "w") as fh:
        json.dump(out, fh, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
