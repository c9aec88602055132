"""PLANS.md ↔ bench_full.json staleness guard (VERDICT r6 #3): the
variance note's totals are machine-written by bench.py; this test fails
the suite whenever a hand edit or a stale artifact makes them drift."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plans_note_matches_committed_bench():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_compare import plans_check

    problems = plans_check(REPO)
    # the placeholder (fresh marker block before the round's first full
    # bench) is tolerated — drift between REAL numbers is not
    if problems and "placeholder" in problems[0]:
        return
    assert problems == [], "\n".join(problems)
