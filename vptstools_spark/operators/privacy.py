"""Privacy-risk operators: k-anonymity, l-diversity, small-class
suppression.

A dataset is k-anonymous w.r.t. a set of QUASI-IDENTIFIER columns when
every combination of their values (an *equivalence class*) covers at
least k rows — the standard re-identification-risk measure (Sweeney
2002) a release gate runs before publishing a derived table. l-diversity
strengthens it: every class must also contain ≥ l distinct values of the
SENSITIVE column (a k-anonymous class with one sensitive value still
leaks it).

Everything here is two ordinary hash aggregations — no windows, no UDFs,
no driver-side data. At 100 TB: the first groupBy shuffles one row per
equivalence class (classes ≪ rows by construction of useful quasi sets),
the second reduces classes to a bounded report. `suppress_small_classes`
is the remediation half: drop rows of classes below k via a join on the
class key — exactly the shuffle the check already paid, and Catalyst
reuses the aggregate under AQE.

Reference scope: the reference pipeline has no privacy layer; this is
part of the training-data governance surface (SURVEY.md §2 north star) —
documents/user tables get release-gated the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "k_anonymity_classes",
    "k_anonymity_report",
    "l_diversity_classes",
    "suppress_small_classes",
]


def k_anonymity_classes(df: DataFrame, quasi_cols: list[str]) -> DataFrame:
    """One row per equivalence class: the quasi tuple + `class_size`."""
    return df.groupBy(*quasi_cols).agg(F.count("*").alias("class_size"))


def l_diversity_classes(
    df: DataFrame, quasi_cols: list[str], sensitive: str | Column
) -> DataFrame:
    """One row per class: `class_size` + `l_diversity` (distinct
    sensitive values). countDistinct keeps the partial/final shape —
    the shuffle carries (class, sensitive) pairs, never raw rows."""
    s = F.col(sensitive) if isinstance(sensitive, str) else sensitive
    return df.groupBy(*quasi_cols).agg(
        F.count("*").alias("class_size"),
        F.countDistinct(s).alias("l_diversity"),
    )


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int,
    sensitive: str | Column | None = None,
    l: int | None = None,
) -> DataFrame:
    """The release-gate summary as (metric, value) rows: class counts,
    rows at re-identification risk (in classes < k), the minimum class
    size, and — when `sensitive` is given — classes below the
    l-diversity floor. All metrics come from ONE class-level frame, so
    the fact table is scanned once."""
    classes = (
        l_diversity_classes(df, quasi_cols, sensitive)
        if sensitive is not None
        else k_anonymity_classes(df, quasi_cols)
    )
    aggs = [
        F.count("*").alias("n_classes"),
        F.sum((F.col("class_size") < k).cast("long")).alias(
            "n_violating_classes"
        ),
        F.sum(
            F.when(F.col("class_size") < k, F.col("class_size")).otherwise(0)
        ).alias("n_rows_at_risk"),
        F.min("class_size").alias("min_class_size"),
    ]
    if sensitive is not None:
        aggs.append(F.min("l_diversity").alias("min_l_diversity"))
        if l is not None:
            aggs.append(
                F.sum((F.col("l_diversity") < l).cast("long")).alias(
                    "n_low_diversity_classes"
                )
            )
    summary = classes.agg(*aggs)
    # unpivot to (metric, value) so the report shape is stable however
    # many metrics are enabled
    names = [f.name for f in summary.schema.fields]
    pairs = ", ".join(f"'{n}', cast(`{n}` as long)" for n in names)
    return summary.selectExpr(
        f"stack({len(names)}, {pairs}) as (metric, value)"
    )


def suppress_small_classes(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Drop every row whose equivalence class has fewer than k members —
    the suppression remediation. Implemented as an inner join against
    the surviving class keys (a grouped form of the check itself); the
    result is k-anonymous by construction."""
    keep = (
        k_anonymity_classes(df, quasi_cols)
        .filter(F.col("class_size") >= k)
        .select(*quasi_cols)
    )
    return df.join(keep, quasi_cols, "inner")
