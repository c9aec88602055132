"""CORRECTNESS_FULL.json ↔ registry drift guard (VERDICT r8 #2): the
full-registry oracle artifact is machine-written by bench.py's
`correctness` tier; this test fails the suite whenever the committed
artifact is missing, stale against the query registry, or records any
oracle failure — so full-registry value-oracle evidence is committed
every round, not just the driver's ~50-query sample.

Regenerate with: SPARK_GRAFT_BENCH_TIERS=correctness python bench.py
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_correctness_full_matches_registry_and_is_green():
    path = os.path.join(REPO, "CORRECTNESS_FULL.json")
    assert os.path.exists(path), (
        "CORRECTNESS_FULL.json missing — run "
        "SPARK_GRAFT_BENCH_TIERS=correctness python bench.py"
    )
    with open(path) as fh:
        art = json.load(fh)

    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    registry = set(entrymod.queries())
    oracled = set(entrymod.oracle_sql())
    recorded = set(art["queries"])

    missing = sorted(registry - recorded)
    stale = sorted(recorded - registry)
    assert not missing, f"queries never oracle-swept: {missing} — regenerate"
    assert not stale, f"artifact records dropped queries: {stale} — regenerate"

    failures = sorted(
        n for n, r in art["queries"].items() if r["status"] == "FAIL"
    )
    assert failures == [], f"oracle failures committed: {failures}"

    # every query with an oracle must be value-checked (PASS), and only
    # the declared non-SQL-expressible ones may be rows_only
    wrongly_weak = sorted(
        n
        for n, r in art["queries"].items()
        if r["status"] == "rows_only" and n in oracled
    )
    assert wrongly_weak == [], (
        f"oracled queries recorded as rows-only: {wrongly_weak}"
    )
    assert art["n_queries"] == len(registry)
    assert art["failures"] == []
