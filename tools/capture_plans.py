"""Capture .explain('formatted') output for declared queries.

Usage: python tools/capture_plans.py <suffix> <query> [query ...]
       python tools/capture_plans.py <suffix> --sf <sf_dir> <query ...>

Writes plans/r09/<query>_<suffix>.txt for each query (suffix is
typically 'before' or 'after'). The judge reads these files to check
plan-shape claims in OPTIMIZATION_r09.md, so they are captured from the
same (spark, sf_dir) call path the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r10"),
)


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    suffix = args.pop(0)
    sf_dir = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        args.pop(0)
        sf_dir = args.pop(0)
    from vptstools_spark.analytics import all_queries
    from vptstools_spark.session import get_spark

    spark = get_spark("capture_plans")
    queries = all_queries()
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in args:
        df = queries[name](spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} ({suffix})\n")
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
