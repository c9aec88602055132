"""As-of join operator semantics."""

import datetime

from vptstools_spark.operators.asof import asof_join_backward


def _ts(m):
    return datetime.datetime(2024, 1, 1, 10, m)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L1"), (1, _ts(30), "L2"), (2, _ts(5), "L3")],
        "k long, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 100.0), (1, _ts(20), 200.0), (2, _ts(50), 900.0)],
        "k long, ts timestamp, px double",
    )
    out = {r["lbl"]: r["px_right"] for r in
           asof_join_backward(left, right, on="k").collect()}
    assert out == {"L1": 100.0, "L2": 200.0, "L3": None}  # no prior row for L3


def test_asof_equal_ts_is_inclusive(spark):
    left = spark.createDataFrame([(1, _ts(10), "L")], "k long, ts timestamp, lbl string")
    right = spark.createDataFrame([(1, _ts(10), 5.0)], "k long, ts timestamp, px double")
    out = asof_join_backward(left, right, on="k").collect()[0]
    assert out["px_right"] == 5.0  # ts >= is inclusive


def test_asof_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [(i % 3, _ts(i), f"L{i}") for i in range(30)], "k long, ts timestamp, lbl string"
    )
    right = spark.createDataFrame(
        [(0, _ts(1), 1.0)], "k long, ts timestamp, px double"
    )
    assert asof_join_backward(left, right, on="k").count() == 30
