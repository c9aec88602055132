"""Binned interval join: containment semantics (inclusive bounds, intervals
spanning multiple bins, per-key scoping), exactly-once matching, semi-join
mode, and the plan invariant that motivates the operator — an equi-join on
the bin id, never a BroadcastNestedLoopJoin."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vptstools_spark.operators.rangejoin import binned_interval_join


def _t(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def _fixtures(spark):
    points = spark.createDataFrame(
        [
            (1, _t(10, 0), 1.0),   # == start: inclusive
            (2, _t(11, 30), 2.0),  # inside, different bin than start
            (3, _t(12, 0), 3.0),   # == end: inclusive
            (4, _t(12, 1), 4.0),   # just outside
            (5, _t(10, 30), 5.0),  # other key — interval doesn't apply
        ],
        "event_id long, ts timestamp, value double",
    ).withColumn("user_id", F.when(F.col("event_id") == 5, 9).otherwise(1).cast("long"))
    intervals = spark.createDataFrame(
        [(1, _t(10, 0), _t(12, 0), "w1")],
        "user_id long, start_ts timestamp, end_ts timestamp, tag string",
    )
    return points, intervals


def test_containment_and_key_scoping(spark):
    points, intervals = _fixtures(spark)
    out = binned_interval_join(
        points, intervals, "ts", "start_ts", "end_ts", keys=["user_id"],
        bin_seconds=3600,
    )
    got = sorted((r.event_id, r.tag) for r in out.collect())
    # 1 (==start), 2 (mid, crosses bin), 3 (==end); 4 outside; 5 wrong key
    assert got == [(1, "w1"), (2, "w1"), (3, "w1")]


def test_exactly_once_even_when_interval_spans_many_bins(spark):
    points, intervals = _fixtures(spark)
    out = binned_interval_join(
        points, intervals, "ts", "start_ts", "end_ts", keys=["user_id"],
        bin_seconds=60,  # interval explodes to 121 bins
    )
    assert sorted(r.event_id for r in out.collect()) == [1, 2, 3]


def test_left_semi_mode(spark):
    points, intervals = _fixtures(spark)
    out = binned_interval_join(
        points, intervals, "ts", "start_ts", "end_ts", keys=["user_id"],
        bin_seconds=3600, how="left_semi",
    )
    assert sorted(r.event_id for r in out.collect()) == [1, 2, 3]
    assert sorted(out.columns) == sorted(points.columns)


def test_plan_is_equi_join_not_nested_loop(spark):
    points, intervals = _fixtures(spark)
    out = binned_interval_join(
        points, intervals, "ts", "start_ts", "end_ts", keys=["user_id"],
        bin_seconds=3600,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan


def test_unsupported_how_raises(spark):
    import pytest

    points, intervals = _fixtures(spark)
    with pytest.raises(ValueError, match="left_semi"):
        binned_interval_join(
            points, intervals, "ts", "start_ts", "end_ts", how="left"
        )
