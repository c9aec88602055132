"""Query registry: every implemented operator exposed as a (spark, sf_dir) →
DataFrame callable plus a DuckDB-oracle SQL string for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vptstools_spark.analytics import (
    dedup_q,
    events_q,
    inventory_q,
    relational,
    similarity_q,
    stats_q,
    subqueries_q,
    text_q,
    vpts_q,
)

_MODULES = [
    relational,
    subqueries_q,
    events_q,
    inventory_q,
    text_q,
    dedup_q,
    similarity_q,
    stats_q,
    vpts_q,
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
