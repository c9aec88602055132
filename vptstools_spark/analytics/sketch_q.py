"""Sketch-family queries: HLL distinct estimate, Count-Min heavy hitters,
Bloom-pruned join — each value-oracle-checkable because the sketches in
`operators/sketch.py` are md5-derived and exact-arithmetic (see module doc
there for the engine-portability argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vptstools_spark.io import table
from vptstools_spark.operators import sketch

# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


def q_sketch_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate COUNT(DISTINCT l_partkey) per returnflag from a 256-register
    HLL, next to the exact count for calibration. At 100 TB the exact form
    shuffles every distinct key; the sketch shuffles ≤ 256 rows per group
    (partial maxes combine map-side)."""
    l = table(spark, sf, "lineitem")
    regs = sketch.hll_registers(l, F.col("l_partkey"), ["l_returnflag"])
    est = sketch.hll_estimate(regs, ["l_returnflag"])
    exact = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_distinct")
    )
    return est.join(F.broadcast(exact), "l_returnflag").orderBy("l_returnflag")


def q_hll_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Sketch ROLLUP — the property that makes HLL a storable summary: build
    fine-grained (returnflag × linestatus) register states, then answer the
    coarser returnflag question by MERGING the 256-row states
    (`sketch.hll_merge`, max per bucket) without rescanning lineitem.
    Because register max-merge is associative, merge-then-estimate is
    EXACTLY the direct coarse estimate — the oracle computes the direct
    form, so the gate proves the rollup identity cross-engine. At 100 TB
    this is the persisted-sketch pattern: per-partition registers written
    once, any partition-subset distinct-count answered from |subset|·256
    rows."""
    l = table(spark, sf, "lineitem")
    fine = sketch.hll_registers(
        l, F.col("l_partkey"), ["l_returnflag", "l_linestatus"]
    )
    merged = sketch.hll_merge(fine, ["l_returnflag"])
    return sketch.hll_estimate(merged, ["l_returnflag"]).orderBy("l_returnflag")


_HLL_RHO_SQL = """
        CASE WHEN regexp_replace(tail, '^0+', '') = '' THEN 61
             ELSE (15 - length(regexp_replace(tail, '^0+', ''))) * 4
                  + CASE substring(regexp_replace(tail, '^0+', ''), 1, 1)
                      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
                      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1
                      WHEN '7' THEN 1 ELSE 0 END
                  + 1
        END
"""

# one final double division from exact-integer state → bit-identical estimate
_HLL_NUMERATOR = sketch.HLL_ALPHA * sketch.HLL_M * sketch.HLL_M * (2.0**61)

_HLL_ORACLE = f"""
WITH h AS (
    SELECT l_returnflag,
           CAST('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 2) AS BIGINT) AS bucket,
           substring(md5(CAST(l_partkey AS VARCHAR)), 3, 15) AS tail
    FROM lineitem
), r AS (
    SELECT l_returnflag, bucket, MAX({_HLL_RHO_SQL}) AS m
    FROM h GROUP BY 1, 2
), agg AS (
    SELECT l_returnflag,
           SUM(CAST(power(2, 61 - m) AS DECIMAL(38,0))) AS s,
           256 - COUNT(*) AS v
    FROM r GROUP BY 1
), est AS (
    SELECT l_returnflag, v,
           {_HLL_NUMERATOR!r} /
               CAST(s + CAST(v AS DECIMAL(38,0)) * CAST(power(2, 61) AS DECIMAL(38,0)) AS DOUBLE)
               AS raw
    FROM agg
)
SELECT e.l_returnflag,
       ROUND(CASE WHEN e.raw <= 640.0 AND e.v > 0
                  THEN 256.0 * ln(256.0 / e.v) ELSE e.raw END, 3) AS hll_est,
       CAST(e.v AS INT) AS zero_registers,
       x.exact_distinct
FROM est e
JOIN (SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_distinct
      FROM lineitem GROUP BY 1) x USING (l_returnflag)
ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def q_sketch_cm_tokens(spark: SparkSession, sf: str) -> DataFrame:
    """Heavy-hitter tokens: exact top-20 next to their Count-Min estimates
    (d=3 × w=128 counters). The sketch state is 384 counters total no matter
    the corpus size — the exact count here is the eval baseline, the sketch
    is the thing that still fits in memory at 100 TB."""
    d = table(spark, sf, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token"))
    sk = sketch.cm_sketch(toks, F.col("token"))
    exact = (
        toks.groupBy("token")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "token")
        .limit(20)
    )
    est = sketch.cm_estimate(sk, exact.select("token"), "token")
    return (
        exact.join(F.broadcast(est), "token")
        .select("token", "exact_cnt", "cm_est")
        .orderBy(F.col("exact_cnt").desc(), "token")
    )


_CM_ORACLE = """
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
), probes AS (
    SELECT token, j,
           CAST('0x' || substring(md5('cm' || j || ':' || token), 1, 8) AS BIGINT) % 128 AS bucket
    FROM toks, unnest([0, 1, 2]) AS t(j)
), cm AS (
    SELECT j, bucket, COUNT(*) AS cnt FROM probes GROUP BY 1, 2
), exact AS (
    SELECT token, COUNT(*) AS exact_cnt FROM toks
    GROUP BY 1 ORDER BY exact_cnt DESC, token LIMIT 20
), cand AS (
    SELECT e.token, j,
           CAST('0x' || substring(md5('cm' || j || ':' || e.token), 1, 8) AS BIGINT) % 128 AS bucket
    FROM exact e, unnest([0, 1, 2]) AS t(j)
), est AS (
    SELECT c.token, MIN(cm.cnt) AS cm_est
    FROM cand c JOIN cm ON c.j = cm.j AND c.bucket = cm.bucket
    GROUP BY 1
)
SELECT e.token, e.exact_cnt, est.cm_est
FROM exact e JOIN est USING (token)
ORDER BY e.exact_cnt DESC, e.token
"""


# ---------------------------------------------------------------------------
# Bloom-pruned join
# ---------------------------------------------------------------------------


def q_sketch_bloom_join(spark: SparkSession, sf: str) -> DataFrame:
    """Revenue per supplier of one nation, with the fact side pre-filtered by
    a 1024-bit Bloom filter built from the dimension keys before the exact
    (broadcast semi) join removes the false positives. Result is identical to
    the plain join — the oracle is the plain join — but at 100 TB the bloom
    probe runs inside the fact scan stage and drops ~24/25 of rows before
    any join machinery, the standard runtime-filter pattern Spark itself
    applies only when statistics let it."""
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
    dim = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey"
    )
    # r9: xxh64 family — the probe runs per fact row inside the scan
    # stage; two salted md5s measured ~0.9 s of the 1.2 s sf0.1 scan,
    # xxhash64 on the native long is codegen-cheap. Results are
    # hash-agnostic (the exact semi join removes false positives).
    mask = sketch.bloom_build(dim, F.col("s_suppkey"), family="xxh64")
    l = table(spark, sf, "lineitem")
    pruned = l.filter(
        sketch.bloom_might_contain(F.col("l_suppkey"), mask, family="xxh64")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)"))
    )
    return (
        pruned.join(F.broadcast(dim), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "suppkey")
        .limit(10)
    )


_BLOOM_ORACLE = """
SELECT l_suppkey AS suppkey,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))))
                  AS DOUBLE), 2) AS revenue
FROM lineitem
WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
)
GROUP BY 1
ORDER BY revenue DESC, suppkey
LIMIT 10
"""





# ---------------------------------------------------------------------------
# KMV set-overlap estimation
# ---------------------------------------------------------------------------

_KMV_K = 64


def q_kmv_order_overlap(spark: SparkSession, sf: str) -> DataFrame:
    """Customer retention by sketch: the Jaccard overlap between the
    1996 and 1997 ordering-customer sets estimated from two 64-value KMV
    sketches (`operators/sketch.py:kmv_sketch`) next to the exact overlap.
    This is the estimate HLL cannot give (intersections), from state that
    is 64 longs per side no matter how many customers exist — the
    dedup-planning primitive at 100 TB. Bottom-k of the union of bottom-ks
    equals bottom-k of the union, so the merged sketch is computed from
    the two sketches alone."""
    from vptstools_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_merge,
        kmv_sketch,
    )

    o = table(spark, sf, "orders")
    a = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    b = o.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    ka = kmv_sketch(a, F.col("o_custkey"), _KMV_K)
    kb = kmv_sketch(b, F.col("o_custkey"), _KMV_K)
    ku = kmv_merge(ka.unionByName(kb), _KMV_K)
    inter = ku.join(ka, "h", "left_semi").join(kb, "h", "left_semi")
    est_j = (
        inter.agg(F.count("*").alias("n_inter"))
        .crossJoin(ku.agg(F.count("*").alias("n_union")))
        .select(
            F.try_divide(
                F.col("n_inter").cast("double"), F.col("n_union").cast("double")
            ).alias("est_jaccard")
        )
    )
    ea = kmv_distinct_estimate(ka, _KMV_K).select(
        F.col("kmv_est").alias("est_1996")
    )
    eb = kmv_distinct_estimate(kb, _KMV_K).select(
        F.col("kmv_est").alias("est_1997")
    )
    exact = (
        a.distinct()
        .intersect(b.distinct())
        .agg(F.count("*").alias("n_i"))
        .crossJoin(a.unionByName(b).distinct().agg(F.count("*").alias("n_u")))
        .select(
            F.round(
                F.try_divide(
                    F.col("n_i").cast("double"), F.col("n_u").cast("double")
                ),
                6,
            ).alias("exact_jaccard")
        )
    )
    return (
        est_j.crossJoin(ea)
        .crossJoin(eb)
        .crossJoin(exact)
        .select(
            F.round("est_jaccard", 6).alias("est_jaccard"),
            "exact_jaccard",
            "est_1996",
            "est_1997",
        )
    )


_KMV_HASH = "CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 12) AS BIGINT)"

_KMV_ORACLE = f"""
WITH a AS (
    SELECT DISTINCT {_KMV_HASH} AS h FROM orders WHERE year(o_orderdate) = 1996
),
b AS (
    SELECT DISTINCT {_KMV_HASH} AS h FROM orders WHERE year(o_orderdate) = 1997
),
ka AS (SELECT h FROM a ORDER BY h LIMIT 64),
kb AS (SELECT h FROM b ORDER BY h LIMIT 64),
ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb) ORDER BY h LIMIT 64),
inter AS (
    SELECT ku.h FROM ku
    WHERE ku.h IN (SELECT h FROM ka) AND ku.h IN (SELECT h FROM kb)
),
est AS (
    SELECT ROUND((SELECT COUNT(*) FROM inter)::DOUBLE / (SELECT COUNT(*) FROM ku), 6) AS est_jaccard,
           CASE WHEN (SELECT COUNT(*) FROM ka) < 64 THEN ROUND((SELECT COUNT(*) FROM ka)::DOUBLE, 3)
                ELSE ROUND(CAST(63 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / (SELECT MAX(h) FROM ka), 3) END AS est_1996,
           CASE WHEN (SELECT COUNT(*) FROM kb) < 64 THEN ROUND((SELECT COUNT(*) FROM kb)::DOUBLE, 3)
                ELSE ROUND(CAST(63 AS DOUBLE) * CAST(281474976710656 AS DOUBLE) / (SELECT MAX(h) FROM kb), 3) END AS est_1997
),
exact AS (
    SELECT ROUND(
        (SELECT COUNT(*) FROM (
            SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
            INTERSECT
            SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        ))::DOUBLE
        / (SELECT COUNT(*) FROM (
            SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) IN (1996, 1997)
        )), 6) AS exact_jaccard
)
SELECT est.est_jaccard, exact.exact_jaccard, est.est_1996, est.est_1997
FROM est, exact
"""


def q_sketch_moments_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable moments sketch with the rollup identity under the value
    gate (`operators/sketch.py:moments_sketch` — Gan et al. VLDB 2018
    family): build per-(returnflag, linestatus) sketches of l_quantity
    (ONE hash aggregation: n/min/max/Σx..Σx⁴ in exact BIGINT), MERGE
    them down to returnflag (sums add — never re-reads the fact table),
    and derive mean/variance/skewness/kurtosis from the merged power
    sums. The oracle computes the power sums per returnflag DIRECTLY
    from raw rows with the identical fixed-association expression tree,
    so the gate proves merge-then-estimate ≡ direct — the property that
    makes the sketch a valid rollup/MV artifact at 100 TB (distribution
    shape per cell at O(k) state, any lattice level derivable without a
    fact-table re-scan)."""
    l = table(spark, sf, "lineitem")
    fine = sketch.moments_sketch(
        l, "l_quantity", ["l_returnflag", "l_linestatus"], k=4
    )
    merged = sketch.moments_merge(fine, ["l_returnflag"], k=4)
    return sketch.moments_stats(merged, ["l_returnflag"]).orderBy(
        "l_returnflag"
    )


_MOMENTS_ORACLE = """
WITH s AS (
    SELECT l_returnflag,
           COUNT(*) AS n,
           MIN(CAST(l_quantity AS BIGINT)) AS mn,
           MAX(CAST(l_quantity AS BIGINT)) AS mx,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
           CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2,
           CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s3,
           CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s4
    FROM lineitem GROUP BY 1
), d AS (
    SELECT l_returnflag, n, mn, mx,
           CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1d,
           CAST(s2 AS DOUBLE) AS s2d, CAST(s3 AS DOUBLE) AS s3d,
           CAST(s4 AS DOUBLE) AS s4d
    FROM s
), m AS (
    SELECT l_returnflag, n, mn, mx,
           s1d / nd AS m,
           s2d / nd - (s1d / nd) * (s1d / nd) AS m2,
           s3d / nd - 3.0 * (s1d / nd) * (s2d / nd)
               + 2.0 * (s1d / nd) * (s1d / nd) * (s1d / nd) AS m3,
           s4d / nd - 4.0 * (s1d / nd) * (s3d / nd)
               + 6.0 * (s1d / nd) * (s1d / nd) * (s2d / nd)
               - 3.0 * (s1d / nd) * (s1d / nd) * (s1d / nd) * (s1d / nd) AS m4
    FROM d
)
SELECT l_returnflag, n, mn, mx,
       ROUND(m, 6) AS mean,
       ROUND(m2, 6) AS variance,
       ROUND(m3 / power(m2, 1.5), 6) AS skewness,
       ROUND(m4 / (m2 * m2) - 3.0, 6) AS kurtosis_excess
FROM m ORDER BY l_returnflag
"""




def q_sketch_qhist_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Mergeable quantile histogram with the rollup identity under the
    value gate (`operators/sketch.py:qhist_sketch` — HdrHistogram /
    DDSketch family, integer-exact buckets): sketch l_extendedprice in
    CENTS per (returnflag, linestatus) — one hash aggregation of
    log-bucketed counts — MERGE the sketches down to returnflag (counts
    add; the fact table is never re-read), and answer p50/p90/p99 as the
    bucket lower bound at cumulative rank ceil(q*n). The oracle rebuilds
    the identical integer bucket algebra (bin-length exponent, shifts)
    DIRECTLY from raw rows at the coarse level, so the gate proves
    merge-then-estimate == direct AND that the bucketing is
    engine-portable — the property that lets a 100 TB deployment keep
    per-cell latency histograms in an MV and answer any-percentile
    queries at any rollup level without a fact scan, at < 2^-4 relative
    error."""
    l = table(spark, sf, "lineitem")
    cents = (F.col("l_extendedprice") * 100).cast("long")
    fine = sketch.qhist_sketch(
        l.select("l_returnflag", "l_linestatus", cents.alias("cents")),
        "cents",
        ["l_returnflag", "l_linestatus"],
        sub_bits=4,
    )
    merged = sketch.qhist_merge(fine, ["l_returnflag"])
    return sketch.qhist_quantiles(
        merged, ["l_returnflag"], [0.5, 0.9, 0.99], sub_bits=4
    ).orderBy("l_returnflag")


_QHIST_ORACLE = """
WITH x AS (
    SELECT l_returnflag, CAST(l_extendedprice * 100 AS BIGINT) AS v
    FROM lineitem
), b AS (
    SELECT l_returnflag,
           CASE WHEN v < 32 THEN v
                ELSE (length(bin(v)) - 1 - 4) * 16 + (v >> (length(bin(v)) - 1 - 4))
           END AS idx
    FROM x
), c AS (
    SELECT l_returnflag, idx, COUNT(*) AS cnt FROM b GROUP BY 1, 2
), cum AS (
    SELECT l_returnflag, idx,
           SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY idx) AS cum,
           SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
    FROM c
), pick AS (
    SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
           MIN(CASE WHEN cum >= CEIL(0.5 * n) THEN idx END) AS i50,
           MIN(CASE WHEN cum >= CEIL(0.9 * n) THEN idx END) AS i90,
           MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN idx END) AS i99
    FROM cum GROUP BY 1
)
SELECT l_returnflag, n,
       CASE WHEN i50 < 32 THEN i50 ELSE (i50 - (i50 // 16 - 1) * 16) << (i50 // 16 - 1) END AS q_5,
       CASE WHEN i90 < 32 THEN i90 ELSE (i90 - (i90 // 16 - 1) * 16) << (i90 // 16 - 1) END AS q_9,
       CASE WHEN i99 < 32 THEN i99 ELSE (i99 - (i99 // 16 - 1) * 16) << (i99 // 16 - 1) END AS q_99
FROM pick ORDER BY l_returnflag
"""


def q_bitmap_distinct_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT mergeable distinct-count via dense bitmaps (Spark's
    `bitmap_*` builtins): per (priority × status) bitmaps of o_custkey
    roll up to per-priority distinct customers by bit-OR — set union, so
    merge-then-count IS the direct count, loss-free (the HLL rollup's
    exact sibling). The oracle computes COUNT(DISTINCT) directly; the
    value match proves the bitmap algebra end-to-end. At 100 TB: the
    shuffle carries ≤ groups × occupied-buckets 4 KB rows instead of
    every distinct key, and persisted bitmaps answer any-rollup distinct
    questions without rescanning the fact (the BigQuery/Delta bitmap-MV
    pattern)."""
    o = table(spark, sf, "orders")
    fine = sketch.bitmap_distinct_sketch(
        o, F.col("o_custkey"), ["o_orderpriority", "o_orderstatus"]
    )
    merged = sketch.bitmap_merge(fine, ["o_orderpriority"])
    counted = sketch.bitmap_distinct_count(merged, ["o_orderpriority"]).select(
        "o_orderpriority",
        F.col("n_distinct").cast("long").alias("bitmap_distinct"),
    )
    exact = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("exact_distinct")
    )
    return counted.join(F.broadcast(exact), "o_orderpriority").orderBy(
        "o_orderpriority"
    )


_BITMAP_ORACLE = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS bitmap_distinct,
       COUNT(DISTINCT o_custkey) AS exact_distinct
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "bitmap_distinct_rollup": q_bitmap_distinct_rollup,
    "sketch_qhist_rollup": q_sketch_qhist_rollup,
    "sketch_moments_rollup": q_sketch_moments_rollup,
    "sketch_hll_distinct": q_sketch_hll_distinct,
    "hll_rollup": q_hll_rollup,
    "kmv_order_overlap": q_kmv_order_overlap,
    "sketch_cm_tokens": q_sketch_cm_tokens,
    "sketch_bloom_join": q_sketch_bloom_join,
}

_HLL_ROLLUP_ORACLE = f"""
WITH h AS (
    SELECT l_returnflag,
           CAST('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1, 2) AS BIGINT) AS bucket,
           substring(md5(CAST(l_partkey AS VARCHAR)), 3, 15) AS tail
    FROM lineitem
), r AS (
    SELECT l_returnflag, bucket, MAX({_HLL_RHO_SQL}) AS m
    FROM h GROUP BY 1, 2
), agg AS (
    SELECT l_returnflag,
           SUM(CAST(power(2, 61 - m) AS DECIMAL(38,0))) AS s,
           256 - COUNT(*) AS v
    FROM r GROUP BY 1
), est AS (
    SELECT l_returnflag, v,
           {_HLL_NUMERATOR!r} /
               CAST(s + CAST(v AS DECIMAL(38,0)) * CAST(power(2, 61) AS DECIMAL(38,0)) AS DOUBLE)
               AS raw
    FROM agg
)
SELECT l_returnflag,
       ROUND(CASE WHEN raw <= 640.0 AND v > 0
                  THEN 256.0 * ln(256.0 / v) ELSE raw END, 3) AS hll_est,
       CAST(v AS INT) AS zero_registers
FROM est
ORDER BY l_returnflag
"""

ORACLES = {
    "bitmap_distinct_rollup": _BITMAP_ORACLE,
    "sketch_qhist_rollup": _QHIST_ORACLE,
    "sketch_moments_rollup": _MOMENTS_ORACLE,
    "hll_rollup": _HLL_ROLLUP_ORACLE,
    "sketch_hll_distinct": _HLL_ORACLE,
    "kmv_order_overlap": _KMV_ORACLE,
    "sketch_cm_tokens": _CM_ORACLE,
    "sketch_bloom_join": _BLOOM_ORACLE,
}


def q_rolling_distinct_users(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT 7-day rolling distinct users from mergeable day-bitmaps:
    the fact table folds ONCE into per-(day, bucket) bitmaps; every
    window then bit-ORs <=7 day sketches instead of rescanning events -
    the window-over-distinct problem SQL engines can't express as a
    window function (COUNT(DISTINCT) OVER is unsupported everywhere).
    The day spine self-join is bounded by calendar days, not rows; the
    oracle recomputes each window's COUNT(DISTINCT) directly from the
    data - algorithm-independent agreement."""
    e = table(spark, sf, "events").withColumn("day", F.to_date("ts"))
    fine = sketch.bitmap_distinct_sketch(e, F.col("user_id"), ["day"])
    days = fine.select(F.col("day").alias("d")).distinct()
    window = days.join(
        fine,
        (F.datediff(F.col("d"), F.col("day")) >= 0)
        & (F.datediff(F.col("d"), F.col("day")) <= 6),
    )
    merged = sketch.bitmap_merge(window.drop("day"), ["d"])
    out = sketch.bitmap_distinct_count(merged, ["d"])
    return out.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n_distinct").cast("long").alias("n_users_7d"),
    )


ORACLES["rolling_distinct_users"] = """
    WITH e AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    days AS (SELECT DISTINCT day AS d FROM e)
    SELECT STRFTIME(d, '%Y-%m-%d') AS day,
           COUNT(DISTINCT user_id) AS n_users_7d
    FROM days JOIN e ON e.day BETWEEN d - 6 AND d
    GROUP BY d
"""

QUERIES["rolling_distinct_users"] = q_rolling_distinct_users
