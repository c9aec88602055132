"""Operator-level tests for the md5-derived sketches (operators/sketch.py).

The sketch *queries* are value-oracled against DuckDB (sketch_q); these
tests pin the operator semantics the oracle can't see: accuracy bounds,
the linear-counting branch, the CM one-sided-error guarantee, and the
bloom filter's no-false-negative + FP-residual-removal contract.
"""

import math

import pytest
from pyspark.sql import functions as F

from vptstools_spark.operators import sketch


@pytest.fixture(scope="module")
def keyed(spark):
    # 5000 distinct keys, with a skewed repeat pattern: key i appears
    # (i % 7) + 1 times — exercises dup-insensitivity of both sketches
    rows = [(i, (i * 37) % 3) for i in range(5000) for _ in range((i % 7) + 1)]
    return spark.createDataFrame(rows, "k int, g int")


def test_hll_within_error_bound(spark, keyed):
    regs = sketch.hll_registers(keyed, F.col("k"), ["g"])
    est = sketch.hll_estimate(regs, ["g"]).collect()
    exact = {
        r["g"]: r["n"]
        for r in keyed.groupBy("g").agg(F.countDistinct("k").alias("n")).collect()
    }
    # 256 registers → σ ≈ 1.04/√256 = 6.5%; assert within 4σ
    for r in est:
        rel = abs(r["hll_est"] - exact[r["g"]]) / exact[r["g"]]
        assert rel < 0.26, (r, exact[r["g"]])


def test_hll_linear_counting_small_cardinality(spark):
    # 30 distinct keys << 256 registers: most registers empty → the
    # linear-counting branch (m·ln(m/V)) must engage and be near-exact
    df = spark.createDataFrame([(i,) for i in range(30)], "k int")
    regs = sketch.hll_registers(df, F.col("k"), [])
    row = sketch.hll_estimate(regs, []).collect()[0]
    assert row["zero_registers"] > 200
    expected = 256.0 * math.log(256.0 / row["zero_registers"])
    assert row["hll_est"] == pytest.approx(round(expected, 3))
    assert abs(row["hll_est"] - 30) < 5


def test_hll_duplicate_insensitive(spark):
    once = spark.createDataFrame([(i,) for i in range(1000)], "k int")
    many = once.withColumn("x", F.explode(F.array(*[F.lit(j) for j in range(5)])))
    e1 = sketch.hll_estimate(sketch.hll_registers(once, F.col("k"), []), []).collect()
    e2 = sketch.hll_estimate(sketch.hll_registers(many, F.col("k"), []), []).collect()
    assert e1[0]["hll_est"] == e2[0]["hll_est"]


def test_cm_never_underestimates(spark, keyed):
    # CM guarantees est >= true count (collisions only add)
    sk = sketch.cm_sketch(keyed, F.col("k"), depth=3, width=128)
    cand = keyed.groupBy("k").agg(F.count("*").alias("true_cnt"))
    est = sketch.cm_estimate(sk, cand.select("k"), "k", depth=3, width=128)
    bad = (
        est.join(cand, "k")
        .filter(F.col("cm_est") < F.col("true_cnt"))
        .count()
    )
    assert bad == 0


def test_cm_exact_when_no_collisions(spark):
    # 10 keys in 1024 buckets: collisions are possible but the min over
    # 4 independent rows makes a collision in EVERY row astronomically
    # unlikely — estimates must equal the true counts
    df = spark.createDataFrame([(f"key{i}",) for i in range(10) for _ in range(i + 1)], "k string")
    sk = sketch.cm_sketch(df, F.col("k"), depth=4, width=1024)
    cand = df.distinct()
    est = {
        r["k"]: r["cm_est"]
        for r in sketch.cm_estimate(sk, cand, "k", depth=4, width=1024).collect()
    }
    for i in range(10):
        assert est[f"key{i}"] == i + 1


def test_bloom_no_false_negatives_and_prunes(spark):
    member = spark.createDataFrame([(i,) for i in range(0, 100)], "k int")
    probe = spark.createDataFrame([(i,) for i in range(0, 10000)], "k int")
    mask = sketch.bloom_build(member, F.col("k"), n_hashes=2, m_bits=1024)
    kept = probe.filter(sketch.bloom_might_contain(F.col("k"), mask, n_hashes=2))
    kept_keys = {r["k"] for r in kept.collect()}
    # every true member survives
    assert set(range(100)) <= kept_keys
    # and the filter actually prunes: FP rate for k=2, m=1024, n=100 is
    # (1-e^(-2*100/1024))^2 ≈ 3.1%; allow generous slack
    assert len(kept_keys) < 100 + 0.15 * 9900


def test_bloom_mask_is_model_sized(spark):
    member = spark.createDataFrame([(i,) for i in range(5000)], "k int")
    mask = sketch.bloom_build(member, F.col("k"), n_hashes=2, m_bits=1024)
    assert len(mask) == 1024 // 64  # bitmask longs, independent of |dim|


def test_hll_registers_merge_like_the_whole(spark):
    # sketch mergeability: registers built per shard and merged must equal
    # registers built over the full data — so per-partition sketch rollups
    # answer subset queries without rescanning
    df = spark.createDataFrame([(i,) for i in range(3000)], "k int")
    whole = sketch.hll_registers(df, F.col("k"), [])
    shard1 = sketch.hll_registers(df.filter("k % 2 = 0"), F.col("k"), [])
    shard2 = sketch.hll_registers(df.filter("k % 2 = 1"), F.col("k"), [])
    merged = sketch.hll_merge(shard1.unionByName(shard2), [])
    assert (
        merged.exceptAll(whole).count() == 0
        and whole.exceptAll(merged).count() == 0
    )
    e_whole = sketch.hll_estimate(whole, []).collect()[0]["hll_est"]
    e_merged = sketch.hll_estimate(merged, []).collect()[0]["hll_est"]
    assert e_whole == e_merged


def test_kmv_merge_equals_whole_and_accuracy(spark):
    from vptstools_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_merge,
        kmv_sketch,
    )

    df = spark.createDataFrame([(i,) for i in range(5000)], "k int")
    k = 128
    whole = kmv_sketch(df, F.col("k"), k)
    # mergeability: bottom-k of (bottom-k(A) ∪ bottom-k(B)) == bottom-k(A∪B)
    a = kmv_sketch(df.filter("k % 2 = 0"), F.col("k"), k)
    b = kmv_sketch(df.filter("k % 2 = 1"), F.col("k"), k)
    merged = kmv_merge(a.unionByName(b), k)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
    # accuracy: σ ≈ 1/√(k-2) ≈ 8.9%; assert within 4σ
    est = kmv_distinct_estimate(whole, k).collect()[0]["kmv_est"]
    assert abs(est - 5000) / 5000 < 0.36
    # under-full sketch is exact
    small = spark.createDataFrame([(i,) for i in range(40)], "k int")
    est_small = kmv_distinct_estimate(kmv_sketch(small, F.col("k"), k), k)
    assert est_small.collect()[0]["kmv_est"] == 40.0


def test_kmv_jaccard_estimates_overlap(spark):
    from vptstools_spark.operators.sketch import kmv_merge, kmv_sketch

    # |A∩B| / |A∪B| = 1000/3000 ≈ 0.333
    a = spark.range(0, 2000).selectExpr("CAST(id AS INT) k")
    b = spark.range(1000, 3000).selectExpr("CAST(id AS INT) k")
    k = 256
    ka = kmv_sketch(a, F.col("k"), k)
    kb = kmv_sketch(b, F.col("k"), k)
    ku = kmv_merge(ka.unionByName(kb), k)
    inter = ku.join(ka, "h", "left_semi").join(kb, "h", "left_semi").count()
    j = inter / ku.count()
    assert abs(j - 1.0 / 3.0) < 0.12


def test_qhist_bucket_roundtrip_and_error_bound(spark):
    # every value maps into a bucket whose [lower, next-lower) range
    # contains it, with relative width < 2^-sub_bits
    vals = list(range(0, 4096)) + [2**k + d for k in range(12, 40) for d in (0, 1, 2**(k - 1), 2**k - 1)]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    b = 4
    out = (
        df.select("x", sketch.qhist_bucket(F.col("x"), b).alias("i"))
        .select("x", "i", sketch.qhist_lower_bound(F.col("i"), b).alias("lb"))
        .collect()
    )
    for r in out:
        assert r["lb"] <= r["x"], r
        if r["x"] >= 32:  # coarse zone: one-sided relative error < 2^-b
            assert (r["x"] - r["lb"]) / r["x"] < 2.0**-b, r
        else:  # exact zone
            assert r["lb"] == r["x"], r


def test_qhist_bucket_is_monotone(spark):
    # order-preserving: x < y implies idx(x) <= idx(y) — required for
    # the cumulative-rank quantile rule to be valid
    df = spark.range(0, 100000).selectExpr("id * 7 AS x")
    rows = df.select(sketch.qhist_bucket(F.col("x"), 4).alias("i")).collect()
    idx = [r["i"] for r in rows]
    assert idx == sorted(idx)


def test_qhist_merge_equals_direct(spark):
    df = spark.range(1, 20001).selectExpr(
        "CAST(id % 5 AS INT) g",
        "CAST(id % 2 AS INT) h",
        "CAST((id * id) % 999983 AS LONG) x",
    )
    fine = sketch.qhist_sketch(df, "x", ["g", "h"], sub_bits=4)
    merged = sketch.qhist_quantiles(
        sketch.qhist_merge(fine, ["g"]), ["g"], [0.5, 0.9, 0.99], sub_bits=4
    )
    direct = sketch.qhist_quantiles(
        sketch.qhist_sketch(df, "x", ["g"], sub_bits=4),
        ["g"],
        [0.5, 0.9, 0.99],
        sub_bits=4,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_qhist_quantiles_near_exact_percentiles(spark):
    df = spark.range(1, 50001).selectExpr("CAST((id * 131) % 1000003 AS LONG) x")
    got = sketch.qhist_quantiles(
        sketch.qhist_sketch(df, "x", [], sub_bits=6), [], [0.5, 0.9], sub_bits=6
    ).collect()[0]
    exact = df.selectExpr("percentile(x, array(0.5, 0.9)) p").collect()[0]["p"]
    # lower-bound estimate: within 2^-6 ≈ 1.6% below the exact quantile
    assert got["q_5"] <= exact[0] and (exact[0] - got["q_5"]) / exact[0] < 0.025
    assert got["q_9"] <= exact[1] and (exact[1] - got["q_9"]) / exact[1] < 0.025


# ---------------------------------------------------------------------------
# exact-distinct bitmaps
# ---------------------------------------------------------------------------


def test_bitmap_rollup_is_exact(spark):
    from pyspark.sql import functions as F

    from vptstools_spark.operators import sketch

    df = spark.range(0, 60_000).select(
        (F.col("id") % 7919).alias("k"),
        (F.col("id") % 4).cast("int").alias("g"),
        (F.col("id") % 8).cast("int").alias("h"),
    )
    fine = sketch.bitmap_distinct_sketch(df, F.col("k"), ["g", "h"])
    merged = sketch.bitmap_merge(fine, ["g"])
    got = {
        r.g: r.n_distinct
        for r in sketch.bitmap_distinct_count(merged, ["g"]).collect()
    }
    want = {
        r.g: r.e
        for r in df.groupBy("g").agg(F.countDistinct("k").alias("e")).collect()
    }
    assert got == want


def test_bitmap_handles_negative_and_boundary_keys(spark):
    from pyspark.sql import functions as F

    from vptstools_spark.operators import sketch

    keys = [-32768, -1, 0, 1, 32767, 32768, 32769, 2**40]
    df = spark.createDataFrame([(k, 1) for k in keys] * 3, "k long, g int")
    out = sketch.bitmap_distinct_count(
        sketch.bitmap_distinct_sketch(df, F.col("k"), ["g"]), ["g"]
    ).collect()
    assert out[0].n_distinct == len(keys)


def test_bitmap_merge_of_disjoint_partitions_equals_whole(spark):
    """The persisted-MV property: sketch two halves separately, OR them,
    and the count equals sketching the union directly."""
    from pyspark.sql import functions as F

    from vptstools_spark.operators import sketch

    df = spark.range(0, 10_000).select(
        (F.col("id") % 997).alias("k"),
        F.lit(0).alias("g"),
        (F.col("id") < 5000).cast("int").alias("half"),
    )
    per_half = sketch.bitmap_distinct_sketch(df, F.col("k"), ["g", "half"])
    merged = sketch.bitmap_merge(per_half, ["g"])
    n = sketch.bitmap_distinct_count(merged, ["g"]).collect()[0].n_distinct
    assert n == 997
