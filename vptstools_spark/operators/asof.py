"""As-of (backward) join — the canonical time-series operator Spark lacks.

Semantics: for each left row, attach the most recent right row with the same
key and right.ts <= left.ts (ties: the largest right.ts; among equal ts the
highest tie-break id). Matches DuckDB/pandas `ASOF JOIN` / `merge_asof`.

Implementation is the union-tag-window pattern, NOT a range join:
tag both sides, union, sort within key by (ts, side-priority), and carry the
last seen right payload forward with `last(..., ignorenulls)` over an
unbounded-preceding window. One shuffle on the key — same cost profile as a
single groupBy, immune to the O(n·m) blowup of naive range joins, and skew
behaves like any keyed window (salt the key if one user dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Backward as-of join of `left` to `right` on key `on` and time `ts_col`.

    Returns all left columns plus `<payload><suffix>` columns from the
    matched right row (NULL when no prior right row exists).
    """
    payload_cols = payload_cols or [
        c for c in right.columns if c not in (on, ts_col)
    ]
    lcols = left.columns

    # side ordering: right rows sort BEFORE left rows at equal ts, so a
    # same-timestamp right row is visible to the left row (<=, not <)
    l_tagged = left.select(
        F.col(on), F.col(ts_col), F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols if c not in (on, ts_col)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(on), F.col(ts_col), F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (on, ts_col)],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"__p_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"{c}{suffix}") for c in payload_cols],
    )
