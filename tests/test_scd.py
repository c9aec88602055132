"""SCD2 derivation (operators/scd.py): run collapsing, reappearing values,
NULL handling, tie-breaking."""

import datetime

from vptstools_spark.operators.scd import scd2_from_log


def _log(spark, rows):
    data = [
        (k, a, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h), i)
        for i, (k, a, h) in enumerate(rows)
    ]
    return spark.createDataFrame(data, "k int, a string, ts timestamp, id long")


def _hist(df):
    return [
        (r["k"], r["a"], r["valid_from"].hour + (r["valid_from"].day - 1) * 24,
         None if r["valid_to"] is None else r["valid_to"].hour + (r["valid_to"].day - 1) * 24,
         r["version"])
        for r in df.orderBy("k", "version").collect()
    ]


def test_runs_collapse_and_value_can_return(spark):
    # x x y x → 3 versions: x returning later is a NEW version (true SCD2)
    log = _log(spark, [(1, "x", 0), (1, "x", 1), (1, "y", 2), (1, "x", 3)])
    out = _hist(scd2_from_log(log, "k", "a", "ts", ["id"]))
    assert out == [
        (1, "x", 0, 2, 1),
        (1, "y", 2, 3, 2),
        (1, "x", 3, None, 3),
    ]


def test_null_attribute_runs(spark):
    # NULL-first key: run must still open; NULL run collapses
    log = _log(spark, [(2, None, 0), (2, None, 1), (2, "z", 2)])
    out = _hist(scd2_from_log(log, "k", "a", "ts", ["id"]))
    assert out == [(2, None, 0, 2, 1), (2, "z", 2, None, 2)]


def test_keys_are_independent(spark):
    log = _log(spark, [(1, "a", 0), (2, "b", 0), (1, "b", 1)])
    out = _hist(scd2_from_log(log, "k", "a", "ts", ["id"]))
    assert out == [(1, "a", 0, 1, 1), (1, "b", 1, None, 2), (2, "b", 0, None, 1)]


def test_same_ts_ties_break_on_order_col(spark):
    # two events at the same hour: id order decides which value wins the run
    log = _log(spark, [(3, "p", 0), (3, "q", 0)])
    out = _hist(scd2_from_log(log, "k", "a", "ts", ["id"]))
    assert out == [(3, "p", 0, 0, 1), (3, "q", 0, None, 2)]


def test_snapshot_diff_classifies_and_drops_unchanged(spark):
    from vptstools_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0)],
        "k int, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, None, 40.0), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    out = {
        r["k"]: r["change"]
        for r in snapshot_diff(old, new, keys=["k"]).collect()
    }
    # k=1 unchanged (dropped), k=4 NULL attr unchanged (dropped)
    assert out == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_null_vs_sentinel_string_no_collision(spark):
    from vptstools_spark.operators.scd import snapshot_diff

    # a NULL column must not fingerprint-collide with the literal sentinel
    old = spark.createDataFrame([(1, None)], "k int, s string")
    new = spark.createDataFrame([(1, "\x00")], "k int, s string")
    out = snapshot_diff(old, new, keys=["k"]).collect()
    assert [(r["k"], r["change"]) for r in out] == [(1, "changed")]


def test_snapshot_diff_compare_cols_subset(spark):
    from vptstools_spark.operators.scd import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1.0)], "k int, s string, v double")
    new = spark.createDataFrame([(1, "a", 2.0)], "k int, s string, v double")
    # only compare s → the v change is invisible
    assert snapshot_diff(old, new, keys=["k"], compare_cols=["s"]).count() == 0


def test_segment_hashes_are_partition_order_independent(spark):
    from vptstools_spark.operators.scd import segment_sync_hashes

    rows = [(i, f"v{i}", float(i)) for i in range(100)]
    df = spark.createDataFrame(rows, "k long, s string, v double")
    a = {r["segment"]: (r["digest"], r["n_rows"])
         for r in segment_sync_hashes(df, ["k"], 16).collect()}
    b = {r["segment"]: (r["digest"], r["n_rows"])
         for r in segment_sync_hashes(df.repartition(7, "s"), ["k"], 16).collect()}
    assert a == b and sum(n for _, n in a.values()) == 100


def test_segment_hashes_localize_a_single_changed_row(spark):
    from vptstools_spark.operators.scd import segment_sync_hashes

    rows = [(i, f"v{i}", float(i)) for i in range(100)]
    df1 = spark.createDataFrame(rows, "k long, s string, v double")
    rows2 = [(k, s, v if k != 42 else v + 1) for k, s, v in rows]
    df2 = spark.createDataFrame(rows2, "k long, s string, v double")
    a = {r["segment"]: r["digest"] for r in segment_sync_hashes(df1, ["k"], 16).collect()}
    b = {r["segment"]: r["digest"] for r in segment_sync_hashes(df2, ["k"], 16).collect()}
    dirty = [s for s in a if a[s] != b.get(s)]
    assert len(dirty) == 1  # exactly the segment holding k=42


def test_segment_hashes_null_vs_sentinel_distinct(spark):
    from vptstools_spark.operators.scd import segment_sync_hashes

    df1 = spark.createDataFrame([(1, None)], "k long, s string")
    df2 = spark.createDataFrame([(1, "\x00")], "k long, s string")
    d1 = segment_sync_hashes(df1, ["k"], 4).collect()[0]["digest"]
    d2 = segment_sync_hashes(df2, ["k"], 4).collect()[0]["digest"]
    assert d1 != d2
