"""Skyline operator semantics (operators/skyline.py) — the query is
value-oracled (`skyline_parts`); these pin dominance edge cases and the
two-phase distributed form's exactness."""

from pyspark.sql import functions as F

from vptstools_spark.operators.skyline import skyline


def _sky_keys(df, criteria):
    return sorted(r["k"] for r in skyline(df, criteria).collect())


def test_skyline_basic_and_duplicates(spark):
    # (1,1) dominated by (2,2); duplicates of a frontier point all survive
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 2.0, 2.0), (3, 2.0, 2.0), (4, 3.0, 1.0)],
        "k long, a double, b double",
    )
    assert _sky_keys(df, {"a": "max", "b": "max"}) == [2, 3, 4]


def test_skyline_min_max_mix(spark):
    # minimize a, maximize b: (1,9) and (2,10) frontier; (3,9) dominated
    df = spark.createDataFrame(
        [(1, 1.0, 9.0), (2, 2.0, 10.0), (3, 3.0, 9.0)],
        "k long, a double, b double",
    )
    assert _sky_keys(df, {"a": "min", "b": "max"}) == [1, 2]


def test_skyline_partitioning_invariant(spark):
    # the two-phase result must equal the single-partition result for
    # any partitioning of the input
    rows = [(i, float((i * 37) % 100), float((i * 61) % 100)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, a double, b double")
    wide = skyline(df.repartition(16), {"a": "max", "b": "max"})
    narrow = skyline(df.coalesce(1), {"a": "max", "b": "max"})
    assert sorted(map(tuple, wide.collect())) == sorted(
        map(tuple, narrow.collect())
    )


def test_skyline_anticorrelated_worst_case(spark):
    # perfectly anti-correlated: EVERY row is on the frontier
    df = spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("a"),
        (-F.col("id")).cast("double").alias("b"),
    )
    assert skyline(df, {"a": "max", "b": "max"}).count() == 500
