"""Slowly-changing-dimension (SCD Type 2) derivation from an event log.

Warehouse-side change tracking: collapse a (key, ts, attribute) log into
validity intervals — one row per *run* of equal attribute values per key,
with `valid_from`/`valid_to` bounds and a version number. The result is
the standard SCD2 dimension shape that a point-in-time (as-of) join
consumes (`operators/asof.py`).

Scale shape: everything is per-key window functions — one hash exchange
on the key, no global window, no driver data. Runs are detected with
lag() (change-point flag) rather than a self-join, so the log is scanned
once.

Reference scope: engine extension (SURVEY §7.5); the reference's closest
shape is the inventory modified-window change detection
(`vptstools/s3.py:handle_manifest` analog, `operators/inventory.py:82`),
which tracks arrival changes but not attribute history.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def scd2_from_log(
    df: DataFrame,
    key: str,
    attr: str,
    ts: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse an event log into SCD2 rows.

    `order_cols` break ties for events sharing a timestamp (pass a unique
    id to make the history deterministic). Output:
    (key, attr, valid_from, valid_to, version) — `valid_to` is NULL on the
    current row, `version` counts runs per key from 1.

    Consecutive equal values collapse into one interval; a value that
    disappears and returns later starts a NEW version (true SCD2, not a
    distinct-values table).
    """
    order = [F.col(ts).asc(), *[F.col(c).asc() for c in (order_cols or [])]]
    w = Window.partitionBy(key).orderBy(*order)
    # null-safe change flag: runs of NULL attribute values collapse like any
    # other value; the explicit first-row test is required because a key
    # whose FIRST value is NULL would otherwise null-safe-equal the missing
    # lag and never open its run
    changed = (F.row_number().over(w) == 1) | ~F.lag(attr).over(w).eqNullSafe(
        F.col(attr)
    )
    starts = df.withColumn("__chg", changed).filter(F.col("__chg")).drop("__chg")
    w2 = Window.partitionBy(key).orderBy(*order)
    return starts.select(
        F.col(key),
        F.col(attr),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Keyed diff between two table snapshots: one row per differing key
    with `change` ∈ {'added', 'removed', 'changed'} — the audit primitive
    behind CDC validation, backfill verification, and "what did this
    pipeline run alter" reports (the read-side complement of
    `operators/merge.py:merge_upsert`).

    Each side is reduced to (keys, row fingerprint) BEFORE the join —
    md5 over the compared columns, each rendered as a tagged string
    ('\\x01' + value when present, bare '\\x00' when NULL) joined with a
    field separator, so NULL can't collide with any literal value
    (including the literal '\\x00' string) and ('a', NULL) can't collide
    with ('aNULL', …) — then a
    single full-outer join on the keys classifies every key; unchanged
    keys are dropped immediately. Scale shape: one hash exchange per side
    on the key columns and nothing else; the fingerprint collapses
    arbitrarily wide compare-column sets to one string before the
    shuffle, so wide tables diff at key+hash cost.
    """
    cols = compare_cols or [c for c in new.columns if c not in keys]

    def fp(df: DataFrame) -> Column:
        return F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.when(
                        F.col(c).isNull(), F.lit("\x00")
                    ).otherwise(
                        F.concat(F.lit("\x01"), F.col(c).cast("string"))
                    )
                    for c in cols
                ],
            )
        )

    o = old.select(*keys, fp(old).alias("_old_fp"))
    n = new.select(*keys, fp(new).alias("_new_fp"))
    j = o.join(n, keys, "full_outer")
    change = (
        F.when(F.col("_old_fp").isNull(), "added")
        .when(F.col("_new_fp").isNull(), "removed")
        .when(F.col("_old_fp") != F.col("_new_fp"), "changed")
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )
