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


def test_pit_join_whole_row_semantics(spark):
    # feature row at t=2 has a NULL cell; a per-column carry would fill
    # it from the t=1 row — whole-row semantics must return the t=2
    # row's NULL, because that's what was knowable at prediction time
    from vptstools_spark.operators.asof import point_in_time_join

    labels = spark.createDataFrame(
        [(1, _ts(3), "L1")], "k long, ts timestamp, label string"
    )
    feats = spark.createDataFrame(
        [(1, _ts(1), 10.0, 100.0), (1, _ts(2), None, 200.0)],
        "k long, ts timestamp, a double, b double",
    )
    out = point_in_time_join(
        labels,
        [{"df": feats, "on": "k", "ts_col": "ts",
          "payload_cols": ["a", "b"], "prefix": "f_"}],
    ).collect()[0]
    assert out["f_a"] is None and out["f_b"] == 200.0


def test_pit_join_ttl_expires_whole_table(spark):
    from vptstools_spark.operators.asof import point_in_time_join

    base = datetime.datetime(2024, 1, 1)
    labels = spark.createDataFrame(
        [
            (1, base + datetime.timedelta(seconds=100), "in"),
            (1, base + datetime.timedelta(seconds=5000), "out"),
        ],
        "k long, ts timestamp, which string",
    )
    feats = spark.createDataFrame(
        [(1, base, 7.0, 70.0)], "k long, ts timestamp, a double, b double"
    )
    rows = {
        r["which"]: r
        for r in point_in_time_join(
            labels,
            [{"df": feats, "on": "k", "ts_col": "ts",
              "payload_cols": ["a", "b"], "prefix": "f_",
              "ttl_seconds": 1000}],
        ).collect()
    }
    assert rows["in"]["f_a"] == 7.0 and rows["in"]["f_b"] == 70.0
    assert rows["out"]["f_a"] is None and rows["out"]["f_b"] is None


def test_pit_join_multiple_tables_and_no_match(spark):
    from vptstools_spark.operators.asof import point_in_time_join

    labels = spark.createDataFrame(
        [(1, _ts(10)), (2, _ts(10))], "k long, ts timestamp"
    )
    f1 = spark.createDataFrame([(1, _ts(5), 1.5)], "k long, ts timestamp, x double")
    f2 = spark.createDataFrame([(1, _ts(7), 9)], "k long, ts timestamp, y long")
    rows = {
        r["k"]: r
        for r in point_in_time_join(
            labels,
            [
                {"df": f1, "on": "k", "ts_col": "ts", "payload_cols": ["x"], "prefix": "a_"},
                {"df": f2, "on": "k", "ts_col": "ts", "payload_cols": ["y"], "prefix": "b_"},
            ],
        ).collect()
    }
    assert rows[1]["a_x"] == 1.5 and rows[1]["b_y"] == 9
    assert rows[2]["a_x"] is None and rows[2]["b_y"] is None
