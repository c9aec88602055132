"""Generate PLANS_AUTO.md: a mechanical physical-plan audit of EVERY
registered query — join strategies, exchange counts, Python eval nodes,
scan pushdown evidence, and EXECUTED shuffle read/write bytes — so the
hand-written PLANS.md narrative is backed by a reproducible, complete
table. Round-over-round shuffle-byte deltas catch plan regressions that
wall-time noise hides (VERDICT r3 #7).

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JOIN_KINDS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)


def _dedupe_cached_subtrees(plan: str) -> str:
    """Return plan text with each DISTINCT cached subtree counted ONCE.

    `toString` reprints every InMemoryRelation's stored child plan under
    every InMemoryTableScan that references it — so a persisted subtree
    referenced k times inflates mechanical node counts k×, even though it
    EXECUTES once at first materialization (this is what made round 4's
    dedup_lsh_verified row read as 'doubled': the audit was counting
    printouts, not work). Split lines into the live plan vs innermost
    enclosing cache, dedupe caches by their expr-id-normalized
    InMemoryRelation signature, and keep one printout of each."""
    live: list[str] = []
    by_cache: dict[str, list[str]] = {}
    stack: list[tuple[int, str]] = []  # (indent, cache signature)
    for line in plan.split("\n"):
        ind = re.match(r"^[\s:+\-*|]*", line).end()
        while stack and ind <= stack[-1][0]:
            stack.pop()
        if "InMemoryRelation" in line:
            sig = re.sub(r"#\d+", "#", line.strip())
            if stack:
                # nested cache: its reprint belongs to the enclosing one;
                # its own one-time copy is captured where it appears live
                by_cache.setdefault(stack[-1][1], []).append(line)
            stack.append((ind, sig))
            continue
        if stack:
            by_cache.setdefault(stack[-1][1], []).append(line)
        else:
            live.append(line)
    out = live + [ln for lines in by_cache.values() for ln in lines]
    return "\n".join(out)


def audit(df) -> dict:
    plan = _dedupe_cached_subtrees(
        df._jdf.queryExecution().executedPlan().toString()
    )
    joins = {k: len(re.findall(rf"\b{k}\b", plan)) for k in JOIN_KINDS}
    # no closing-bracket requirement: toString truncates long filter lists
    # ("PushedFilters: [IsNotNull(...), GreaterThanOrEqual(l_shipda...")
    # and the audit must not read a truncated pushdown as absent
    pushed = re.findall(r"PushedFilters: \[([^\]\n]*)", plan)
    py = re.findall(
        r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas)\b",
        plan,
    )
    return {
        "joins": {k: v for k, v in joins.items() if v},
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "scans": len(re.findall(r"Scan parquet", plan)),
        "pushed_nonempty": sum(1 for p in pushed if p.strip()),
        "python_nodes": sorted(set(py)),
    }


class ShuffleMeter:
    """Per-query executed shuffle read/write bytes from the live
    AppStatusStore (the store behind the Spark UI's stage table): snapshot
    the stage set, run the query, and sum the bytes of stages that appeared.
    AQE runtime metrics, not estimates — local[32] runs queries one at a
    time, so attribution is exact."""

    def __init__(self, spark):
        self._store = spark.sparkContext._jsc.sc().statusStore()
        self._empty = spark.sparkContext._jvm.java.util.Collections.emptyList()
        # Scala default args for stageList(statuses, details, taskStatus,
        # withSummaries, unsortedQuantiles) — resolved, not hardcoded, so a
        # Spark minor bump that reorders defaults keeps working
        self._defaults = [
            getattr(self._store, f"stageList$default${i}")() for i in (2, 3, 4, 5)
        ]
        self._seen: set[tuple[int, int]] = set()
        self.take()  # absorb warmup stages

    def take(self) -> tuple[int, int]:
        """Shuffle (read, write) bytes of stages not seen by a prior call."""
        seq = self._store.stageList(self._empty, *self._defaults)
        r = w = 0
        for i in range(seq.size()):
            sd = seq.apply(i)
            key = (sd.stageId(), sd.attemptId())
            if key in self._seen:
                continue
            self._seen.add(key)
            r += sd.shuffleReadBytes()
            w += sd.shuffleWriteBytes()
        return int(r), int(w)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from vptstools_spark.analytics import all_queries
    from vptstools_spark.session import get_spark

    spark = get_spark("plan_report")
    meter = ShuffleMeter(spark)
    rows = []
    for name, fn in all_queries().items():
        try:
            # fresh cache context per query: CacheManager substitutes ANY
            # matching cached subtree from previously-audited queries into
            # this plan, making node counts depend on REGISTRY ORDER (this
            # is what moved dedup_lsh_verified 55→86 exchanges in round 4
            # when NEW_THIS_ROUND reordered the sweep — not a plan change).
            # Clearing makes every row self-contained and round-comparable.
            spark.catalog.clearCache()
            df = fn(spark, sf_dir)
            a = audit(df)
            meter.take()  # attribute model-fit/planning jobs separately
            df.count()
            shuf_r, shuf_w = meter.take()
        except Exception as e:  # surface, never skip silently
            rows.append((name, f"ERROR: {type(e).__name__}: {e}"))
            continue
        joins = ", ".join(f"{v}× {k}" for k, v in a["joins"].items()) or "—"
        py = ", ".join(a["python_nodes"]) or "—"
        rows.append(
            (
                name,
                f"| {name} | {joins} | {a['exchanges']} | "
                f"{a['pushed_nonempty']}/{a['scans']} | {py} | "
                f"{shuf_r} | {shuf_w} |",
            )
        )
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS_AUTO.md")
    with open(out_path, "w") as fh:
        fh.write(
            "# PLANS_AUTO — mechanical plan audit of every registered query\n\n"
            f"Generated by `python tools/plan_report.py {sf_dir}`. Columns:\n"
            "join operators in the physical plan; Exchange (shuffle/broadcast)\n"
            "node count; scans with non-empty PushedFilters / total parquet\n"
            "scans; Python evaluation nodes (Arrow-vectorized only, by the\n"
            "registry-wide assertion); EXECUTED shuffle read / write bytes\n"
            "(AQE runtime metrics from one execution at this sf — stable\n"
            "round-over-round because plans and data are deterministic;\n"
            "model-fit jobs that run before the returned plan are excluded).\n"
            "Plans are pre-execution AQE plans, audited in a FRESH cache\n"
            "context per query (round 5): CacheManager cross-query subtree\n"
            "substitution previously made counts registry-order-dependent,\n"
            "and cached subtrees are counted ONCE (toString reprints a\n"
            "persisted subtree under every reference; it executes once).\n\n"
            "| Query | Joins | Exchanges | Pushdown | Python | ShufR B | ShufW B |\n"
            "|---|---|---|---|---|---|---|\n"
        )
        for name, line in rows:
            if line.startswith("ERROR"):
                fh.write(f"| {name} | {line} | | | | | |\n")
            else:
                fh.write(line + "\n")
    errors = [n for n, l in rows if l.startswith("ERROR")]
    print(f"wrote {out_path}: {len(rows)} queries, {len(errors)} errors {errors}")
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
