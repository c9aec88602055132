"""Subquery decorrelation + extended relational surface (SURVEY §7.5).

The reference has no subqueries (its only join-shaped logic is semi/anti by
iteration, SURVEY §2.4); a complete engine must cover the standard SQL
subquery patterns. Each query here expresses one pattern the Spark-first way
— Catalyst decorrelates EXISTS/IN into semi/anti joins, scalar subqueries
into broadcast cross-joins — and is verified against the literal correlated
SQL on the DuckDB oracle.

Also: non-equi (range) broadcast join, deterministic hash sampling,
histogram bucketing, EXCEPT, UNPIVOT, RANGE-frame time windows, NTILE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vptstools_spark.io import table


def q_exists_late_shipment(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): orders having a lineitem shipped
    >60 days after the order date. Expressed as a left-semi join on
    (key, non-equi time predicate) — exactly what Catalyst decorrelates
    EXISTS into; the big-big semi join shuffles on orderkey at scale."""
    o = table(spark, sf, "orders")
    l = table(spark, sf, "lineitem")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_not_exists_idle_rich(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar subquery + NOT EXISTS (TPC-H Q22 shape): customers above the
    positive-balance average with no *open* orders. The scalar average
    becomes a 1-row broadcast cross-join; the filtered NOT EXISTS becomes a
    left-anti join against the pre-filtered orders side."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "O")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_pos_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_pos_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


def q_small_qty_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar aggregate subquery (TPC-H Q17 shape): revenue of
    lineitems below 20% of their part's average quantity. Decorrelated into
    a per-part aggregate joined back on partkey; the brand dimension filter
    is broadcast in front so the per-part aggregate only scans the filtered
    fact rows."""
    p = table(spark, sf, "part").filter(F.col("p_brand") == "Brand#23")
    l = table(spark, sf, "lineitem")
    brand_l = l.join(F.broadcast(p.select("p_partkey")),
                     F.col("l_partkey") == F.col("p_partkey"))
    thresh = brand_l.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("qty_thresh")
    )
    return (
        brand_l.join(thresh, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_TIERS = [
    ("negative", -1.0e9, 0.0),
    ("low", 0.0, 3000.0),
    ("mid", 3000.0, 7000.0),
    ("high", 7000.0, 1.0e9),
]


def q_acctbal_tiers(spark: SparkSession, sf: str) -> DataFrame:
    """Non-equi range join: bucket customers into balance tiers defined by a
    tiny (lo, hi) dimension. Broadcast nested-loop join — the correct plan
    when one side is a handful of rows; never shuffles the fact side."""
    c = table(spark, sf, "customer")
    tiers = spark.createDataFrame(_TIERS, "tier string, lo double, hi double")
    return (
        c.join(
            F.broadcast(tiers),
            (F.col("c_acctbal") >= F.col("lo")) & (F.col("c_acctbal") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


def q_histogram_price(spark: SparkSession, sf: str) -> DataFrame:
    """Fixed-width histogram of order totals (floor-bucketing). One scan, one
    partial→final count aggregation; no shuffle of raw rows."""
    o = table(spark, sf, "orders")
    return (
        o.select(
            F.floor(F.col("o_totalprice") / F.lit(25000.0)).cast("int").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n_orders"))
    )


def q_sample_md5(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 1/16 hash sample: first md5 nibble of the key == '0'.
    Reproducible across engines and runs (unlike TABLESAMPLE), stable under
    repartitioning — the right sampling primitive for dataset curation."""
    o = table(spark, sf, "orders")
    return (
        o.filter(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 1) == "0")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


def q_except_open_customers(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT (set difference): customers with orders, minus those with an
    open order — i.e. customers whose every order is settled."""
    o = table(spark, sf, "orders")
    all_c = o.select(F.col("o_custkey").alias("custkey"))
    open_c = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_c.subtract(open_c)


def q_unpivot_part_stats(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT (wide→long reshaping): per-brand averages melted into
    (brand, metric, value) rows — `DataFrame.unpivot`, the inverse of the
    pivot covered by `events_pivot`."""
    p = table(spark, sf, "part")
    agg = p.groupBy("p_brand").agg(
        F.round(F.avg("p_size"), 4).alias("avg_size"),
        F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
    )
    return agg.unpivot("p_brand", ["avg_size", "avg_price"], "metric", "value")


def q_moving_avg_range(spark: SparkSession, sf: str) -> DataFrame:
    """Time-based RANGE window frame: per-user trailing 1-hour average of
    event values, ordered by millisecond epoch. RANGE (not ROWS) so the frame
    is defined by time distance; one hash exchange on user_id, sort within
    partitions — no global sort."""
    e = table(spark, sf, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis(F.col("ts")))
        .rangeBetween(-3_600_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("avg_1h"),
    )


def q_ntile_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """NTILE decile summary of order totals. A global NTILE needs a total
    order (single-partition window) — acceptable for reporting-sized output;
    at 100 TB use approx quantiles (`quantiles_price`) instead. Tie-broken
    by key so the decile assignment is deterministic."""
    o = table(spark, sf, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select(F.ntile(10).over(w).alias("decile"), "o_totalprice")
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


QUERIES = {
    "exists_late_shipment": q_exists_late_shipment,
    "not_exists_idle_rich": q_not_exists_idle_rich,
    "small_qty_revenue": q_small_qty_revenue,
    "acctbal_tiers": q_acctbal_tiers,
    "histogram_price": q_histogram_price,
    "sample_md5": q_sample_md5,
    "except_open_customers": q_except_open_customers,
    "unpivot_part_stats": q_unpivot_part_stats,
    "moving_avg_range": q_moving_avg_range,
    "ntile_deciles": q_ntile_deciles,
}

ORACLES = {
    "exists_late_shipment": """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
        )
        GROUP BY o_orderpriority
    """,
    "not_exists_idle_rich": """
        SELECT c_mktsegment, COUNT(*) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'O')
        GROUP BY c_mktsegment
    """,
    "small_qty_revenue": """
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
    """,
    "acctbal_tiers": """
        WITH tiers(tier, lo, hi) AS (VALUES
            ('negative', -1e9, 0.0), ('low', 0.0, 3000.0),
            ('mid', 3000.0, 7000.0), ('high', 7000.0, 1e9))
        SELECT tier, COUNT(*) AS n_cust, ROUND(AVG(c_acctbal), 4) AS avg_bal
        FROM customer JOIN tiers ON c_acctbal >= lo AND c_acctbal < hi
        GROUP BY tier
    """,
    "histogram_price": """
        SELECT CAST(FLOOR(o_totalprice / 25000.0) AS INT) AS bucket,
               COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    """,
    "sample_md5": """
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
        GROUP BY o_orderstatus
    """,
    "except_open_customers": """
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "unpivot_part_stats": """
        WITH a AS (
            SELECT p_brand, ROUND(AVG(p_size), 4) AS avg_size,
                   ROUND(AVG(p_retailprice), 4) AS avg_price
            FROM part GROUP BY p_brand
        )
        SELECT p_brand, 'avg_size' AS metric, avg_size AS value FROM a
        UNION ALL
        SELECT p_brand, 'avg_price' AS metric, avg_price AS value FROM a
    """,
    "moving_avg_range": """
        SELECT event_id, user_id,
               ROUND(AVG(value) OVER (
                   PARTITION BY user_id ORDER BY epoch_ms(ts)
                   RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW), 4) AS avg_1h
        FROM events WHERE user_id < 20
    """,
    "ntile_deciles": """
        WITH d AS (
            SELECT NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile,
                   o_totalprice
            FROM orders
        )
        SELECT decile, COUNT(*) AS n_orders,
               ROUND(AVG(o_totalprice), 4) AS avg_price,
               ROUND(MAX(o_totalprice), 2) AS max_price
        FROM d GROUP BY decile
    """,
}
