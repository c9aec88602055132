"""Version-fingerprinted result cache (plans/result_cache.py)."""

import pytest

from pyspark.sql import functions as F

from vptstools_spark.plans.result_cache import (
    cache_entries,
    cached_result,
    evict_stale,
)
from vptstools_spark.plans.timetravel import (
    commit_append,
    commit_initial,
    read_version,
)


@pytest.fixture()
def versioned_orders(spark, tmp_path):
    path = str(tmp_path / "orders")
    commit_initial(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)], "k int, grp string, v double"
        ),
        path,
    )
    return path


def test_hit_miss_invalidate_and_evict(spark, tmp_path, versioned_orders):
    cache = str(tmp_path / "cache")
    calls = []

    def build(s):
        calls.append(1)
        return (
            read_version(s, versioned_orders)
            .groupBy("grp")
            .agg(F.sum("v").alias("total"))
        )

    deps = [(versioned_orders, None)]
    r1 = cached_result(spark, cache, "by_grp", deps, build)
    assert sorted(map(tuple, r1.collect())) == [("a", 10.0), ("b", 20.0)]
    assert len(calls) == 1

    # HIT: same versions -> no rebuild, same values
    r2 = cached_result(spark, cache, "by_grp", deps, build)
    assert len(calls) == 1
    assert sorted(map(tuple, r2.collect())) == [("a", 10.0), ("b", 20.0)]

    # dependency commits -> stale -> rebuild under a new fingerprint
    commit_append(
        spark,
        versioned_orders,
        spark.createDataFrame([(3, "a", 5.0)], "k int, grp string, v double"),
    )
    r3 = cached_result(spark, cache, "by_grp", deps, build)
    assert len(calls) == 2
    assert sorted(map(tuple, r3.collect())) == [("a", 15.0), ("b", 20.0)]
    assert len(cache_entries(spark, cache)) == 2  # old entry still present

    # pinned-version entry: build_fn reads the SAME pin it declares
    def build_v0(s):
        return (
            read_version(s, versioned_orders, 0)
            .groupBy("grp")
            .agg(F.sum("v").alias("total"))
        )

    rp = cached_result(
        spark, cache, "by_grp_v0", [(versioned_orders, 0)], build_v0
    )
    assert sorted(map(tuple, rp.collect())) == [("a", 10.0), ("b", 20.0)]

    # evict_stale removes the FLOATING entry whose dep moved — but NOT
    # the explicitly-pinned by_grp_v0 entry, which is still servable
    # (ADVICE r5: evicting it forces a pointless rebuild on the next
    # pinned call)
    evicted = evict_stale(spark, cache)
    assert len(evicted) == 1  # only by_grp's stale v0-era floating entry
    left = {e["key"]: e for e in cache_entries(spark, cache)}
    assert left["by_grp"]["deps"] == [[versioned_orders, 1]]
    assert left["by_grp_v0"]["deps"] == [[versioned_orders, 0]]
    # the pinned entry still serves from cache (no rebuild)
    n_before = len(cache_entries(spark, cache))
    rp2 = cached_result(
        spark, cache, "by_grp_v0", [(versioned_orders, 0)], build_v0
    )
    assert sorted(map(tuple, rp2.collect())) == [("a", 10.0), ("b", 20.0)]
    assert len(cache_entries(spark, cache)) == n_before

    # once the pinned version is EXPIRED out of history, the entry goes
    from vptstools_spark.plans.timetravel import expire_versions

    expire_versions(spark, versioned_orders, keep_last=1)
    evicted = evict_stale(spark, cache)
    assert any(e.startswith("by_grp_v0/") for e in evicted)
    assert [e["key"] for e in cache_entries(spark, cache)] == ["by_grp"]

    # unversioned dependency is refused
    with pytest.raises(ValueError):
        cached_result(
            spark, cache, "bad", [(str(tmp_path / "nope"), None)], build
        )
