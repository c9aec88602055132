"""Table statistics + cost-based join planning (plans/stats.py):
single-pass ANALYZE correctness, sidecar roundtrip, version-pinned
staleness, System-R estimates, and — the point — the stats-driven
strategy actually materializing as the corresponding physical join."""

import pytest
from pyspark.sql import functions as F

from vptstools_spark.plans.hints import plan_string
from vptstools_spark.plans.stats import (
    TableStats,
    analyze_table,
    analyze_versioned_table,
    choose_join_strategy,
    estimate_equi_join,
    estimate_filter_selectivity,
    read_stats,
    scaled,
    stats_join,
    stats_stale,
    write_stats,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(i, i % 10, f"name_{i % 7}", None if i % 5 == 0 else float(i))
         for i in range(1000)],
        "id long, grp int, name string, val double",
    )


def test_analyze_exact(spark, df):
    s = analyze_table(df, exact=True)
    assert s.n_rows == 1000
    assert s.columns["id"].ndv == 1000
    assert s.columns["grp"].ndv == 10
    assert s.columns["name"].ndv == 7
    assert s.columns["val"].n_nonnull == 800
    assert s.null_count("val") == 200
    assert s.columns["id"].min == 0 and s.columns["id"].max == 999
    assert s.columns["name"].avg_len == pytest.approx(6.0)


def test_analyze_approx_close(spark, df):
    s = analyze_table(df)
    # HLL++ at rsd 5%: well within 15% on these cardinalities
    assert abs(s.columns["id"].ndv - 1000) <= 150
    assert abs(s.columns["grp"].ndv - 10) <= 2


def test_sidecar_roundtrip_and_staleness(spark, df, tmp_path):
    from vptstools_spark.plans.timetravel import commit_append, commit_initial

    path = str(tmp_path / "vt")
    commit_initial(df, path, [])
    s = analyze_versioned_table(spark, path, exact=True)
    assert s.version == 0
    back = read_stats(spark, path)
    assert back.n_rows == 1000 and back.version == 0
    assert back.columns["grp"].ndv == 10
    assert stats_stale(spark, path) is False
    commit_append(spark, path, df.limit(5))
    assert stats_stale(spark, path) is True


def test_join_estimate_formula():
    l = TableStats(
        n_rows=1000,
        columns={"k": _cs("k", 1000, 100)},
    )
    r = TableStats(n_rows=500, columns={"k": _cs("k", 500, 50)})
    # 1000*500 / max(100,50) = 5000
    assert estimate_equi_join(l, r, ["k"]) == pytest.approx(5000.0)


def _cs(name, nn, ndv, mn=None, mx=None, al=None):
    from vptstools_spark.plans.stats import ColumnStats

    return ColumnStats(name=name, n_nonnull=nn, ndv=ndv, min=mn, max=mx, avg_len=al)


def test_join_estimate_close_to_actual(spark):
    a = spark.range(0, 2000).select((F.col("id") % 40).alias("k"), "id")
    b = spark.range(0, 300).select((F.col("id") % 40).alias("k"))
    sa, sb = analyze_table(a, exact=True), analyze_table(b, exact=True)
    est = estimate_equi_join(sa, sb, ["k"])
    actual = a.join(b, "k").count()
    assert 0.5 * actual <= est <= 2.0 * actual


def test_filter_selectivity():
    s = TableStats(n_rows=100, columns={"x": _cs("x", 100, 20, 0, 100)})
    assert estimate_filter_selectivity(s, "x", "=", 5) == pytest.approx(0.05)
    assert estimate_filter_selectivity(s, "x", "<", 25) == pytest.approx(0.25)
    assert estimate_filter_selectivity(s, "x", ">", 25) == pytest.approx(0.75)
    # non-numeric bounds → Selinger default
    s2 = TableStats(n_rows=100, columns={"x": _cs("x", 100, 20, "a", "z")})
    assert estimate_filter_selectivity(s2, "x", "<", "m") == pytest.approx(1 / 3)
    sc = scaled(s, 0.05)
    assert sc.n_rows == 5 and sc.columns["x"].ndv == 5


def test_choose_strategy_thresholds():
    small = TableStats(n_rows=100, columns={"k": _cs("k", 100, 100)})
    big = TableStats(n_rows=10**9, columns={"k": _cs("k", 10**9, 10**6)})
    mid = TableStats(n_rows=10**7, columns={"k": _cs("k", 10**7, 10**6)})
    d = choose_join_strategy(big, small)
    assert d["strategy"] == "broadcast" and d["side"] == "right"
    d = choose_join_strategy(big, mid)
    assert d["strategy"] == "shuffle_hash"
    d = choose_join_strategy(big, big)
    assert d["strategy"] == "merge"


def test_stats_join_materializes_choice(spark):
    """With auto-broadcast disabled, the broadcast in the executed plan
    can only come from OUR stats-driven hint."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        big = spark.range(0, 50_000).select((F.col("id") % 97).alias("k"), "id")
        dim = spark.range(0, 97).select(F.col("id").alias("k"),
                                        (F.col("id") * 2).alias("v"))
        sb, sd = analyze_table(big, exact=True), analyze_table(dim, exact=True)
        df, decision = stats_join(big, dim, ["k"], sb, sd)
        assert decision["strategy"] == "broadcast" and decision["side"] == "right"
        assert "BroadcastHashJoin" in plan_string(df)
        assert df.count() == 50_000

        # both sides over the broadcast budget → no broadcast in the plan
        big2 = spark.range(0, 50_000).select((F.col("id") % 97).alias("k"))
        inflated = TableStats(
            n_rows=10**9, columns={"k": _cs("k", 10**9, 97)}
        )
        df2, d2 = stats_join(big, big2, ["k"], inflated, inflated)
        assert d2["strategy"] == "merge"
        assert "BroadcastHashJoin" not in plan_string(df2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_stats_join_left_side_small_flips_hint(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        dim = spark.range(0, 97).select(F.col("id").alias("k"),
                                        (F.col("id") * 2).alias("v"))
        big = spark.range(0, 50_000).select((F.col("id") % 97).alias("k"), "id")
        sd, sb = analyze_table(dim, exact=True), analyze_table(big, exact=True)
        df, decision = stats_join(dim, big, ["k"], sd, sb)
        assert decision["side"] == "left" and decision["strategy"] == "broadcast"
        assert "BroadcastHashJoin" in plan_string(df)
        # flip preserved the declared column order: on, left cols, right cols
        assert df.columns == ["k", "v", "id"]
        assert df.count() == 50_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
