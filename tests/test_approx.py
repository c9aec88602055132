"""Approximate aggregates — engine extensions verified by error-bound
tests against exact answers (cross-engine value oracles don't apply: HLL++
and Greenwald-Khanna sketches are engine-specific by construction, so the
contract is a bound, not a hash match).

At 100 TB these are the map-side-combinable replacements for exact
COUNT(DISTINCT)/percentile: HLL state is a few KB per group regardless of
cardinality, and the GK sketch admits one-pass quantiles with bounded
relative error — both avoid the full shuffle of the exact forms.
"""

from pyspark.sql import functions as F


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def _lineitem(spark):
    return spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")


def test_approx_count_distinct_within_rsd(spark):
    d = _docs(spark).select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    )
    exact = d.select(F.countDistinct("w")).collect()[0][0]
    approx = d.select(F.approx_count_distinct("w", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.06, (exact, approx)


def test_approx_percentile_within_accuracy(spark):
    li = _lineitem(spark)
    exact = li.select(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p")
    ).collect()[0][0]
    approx = li.select(
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(1000)).alias("p")
    ).collect()[0][0]
    # GK bound: rank error <= n/accuracy; translate to a loose value bound
    assert abs(approx - exact) / exact < 0.02, (exact, approx)


def test_approx_count_distinct_is_map_side_combinable(spark):
    """The plan must show partial+final aggregation (the entire point of the
    sketch: per-partition partials merge without a distinct expand)."""
    d = _docs(spark).groupBy("source").agg(
        F.approx_count_distinct("text").alias("n")
    )
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2
    assert "Expand" not in plan
