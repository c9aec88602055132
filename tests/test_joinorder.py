"""Selinger join-order enumeration (plans/joinorder.py): C_out DP picks
the selective-dimension-first order, refuses cross products, and the
executed tree matches the naive join's values with stats-driven physical
strategies."""

import pytest

from vptstools_spark.plans.joinorder import (
    JoinEdge,
    enumerate_join_order,
    join_stats,
    ordered_join,
)
from vptstools_spark.plans.stats import ColumnStats, TableStats


def _ts(n, **ndvs):
    return TableStats(
        n_rows=n,
        columns={
            c: ColumnStats(name=c, n_nonnull=n, ndv=v) for c, v in ndvs.items()
        },
    )


def test_selective_dim_joins_first():
    """fact ⋈ small-selective-dim shrinks the intermediate 10×; the DP
    must schedule it before the non-selective big dim."""
    stats = {
        "fact": _ts(1_000_000, k1=100, k2=100_000),
        "dim_small": _ts(10, k1=10),  # covers 10 of fact's 100 k1 values
        "dim_big": _ts(100_000, k2=100_000),
    }
    edges = [
        JoinEdge("fact", "dim_small", ("k1",)),
        JoinEdge("fact", "dim_big", ("k2",)),
    ]
    plan = enumerate_join_order(stats, edges)
    order = plan["order"]
    assert order.index("dim_small") < order.index("dim_big")
    # C_out: (fact⋈small)=1e5, then ⋈big=1e5 -> 2e5; the other order is 2e6
    assert plan["cost"] == pytest.approx(200_000, rel=0.01)
    assert plan["rows_est"] == pytest.approx(100_000, rel=0.01)


def test_join_stats_composition_and_key_clamp():
    a, b = _ts(1000, k=100, x=500), _ts(50, k=10)
    st = join_stats(a, b, ["k"])
    assert st.n_rows == 1000 * 50 // 100
    assert st.columns["k"].ndv == 10  # matching-domain clamp to smaller side
    assert st.columns["x"].ndv <= st.n_rows


def test_cross_product_refused_and_relation_guard():
    stats = {"a": _ts(10, k=10), "b": _ts(10, j=10)}
    with pytest.raises(ValueError, match="disconnected|cross product"):
        enumerate_join_order(stats, [])
    many = {f"r{i}": _ts(10, k=10) for i in range(13)}
    edges = [JoinEdge(f"r{i}", f"r{i+1}", ("k",)) for i in range(12)]
    with pytest.raises(ValueError, match="exceeds"):
        enumerate_join_order(many, edges)


def test_ordered_join_matches_naive_and_records_strategy(spark):
    from vptstools_spark.plans.stats import analyze_table

    fact = spark.createDataFrame(
        [(i, i % 5, i % 3, float(i)) for i in range(200)],
        "fid long, k1 int, k2 int, v double",
    )
    d1 = spark.createDataFrame(
        [(i, f"a{i}") for i in range(2)], "k1 int, name1 string"
    )  # selective: keeps k1 in {0,1}
    d2 = spark.createDataFrame(
        [(i, f"b{i}") for i in range(3)], "k2 int, name2 string"
    )
    dfs = {"fact": fact, "d1": d1, "d2": d2}
    stats = {n: analyze_table(df, exact=True) for n, df in dfs.items()}
    edges = [JoinEdge("fact", "d1", ("k1",)), JoinEdge("fact", "d2", ("k2",))]
    got, rec = ordered_join(dfs, stats, edges)
    want = fact.join(d1, "k1").join(d2, "k2")
    assert sorted(
        (r["fid"], r["name1"], r["name2"]) for r in got.collect()
    ) == sorted((r["fid"], r["name1"], r["name2"]) for r in want.collect())
    assert rec["order"].index("d1") < rec["order"].index("d2")
    assert all(j["strategy"] == "broadcast" for j in rec["joins"])
    # the hint materialized: both dims broadcast in the physical plan
    from vptstools_spark.plans.hints import plan_string

    assert plan_string(got).count("BroadcastHashJoin") >= 2  # AQE prints initial+final plans
