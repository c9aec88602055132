"""Skew-mitigation plan helpers.

AQE's skew-join splitting handles joins; for *aggregations* over heavily
skewed keys (a handful of keys owning most rows — e.g. event types, hot
radars), pre-salting spreads each hot key over N reducers and a second tiny
aggregation merges the partials. Semantics identical to a plain groupBy —
proven by the `salted_coverage` oracle query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    `aggs` maps output column → (input column, fn) where fn ∈
    {count, sum, min, max} (the re-aggregable functions; avg = sum/count).
    Phase 1 groups by (keys + random salt) — each hot key splits across
    `salt_buckets` reducers; phase 2 merges partials per key (tiny input:
    |keys| × salt_buckets rows).
    """
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count("*") if fn == "count" else getattr(F, fn)(col)).alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )
    phase2 = phase1.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (_col, fn) in aggs.items()
        ]
    )
    return phase2
