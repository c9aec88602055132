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


def q_intersect_loyal_customers(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT (set intersection, dedup semantics): customers active in
    BOTH 1996 and 1997 — completes the set-operator family next to
    UNION (U1-U3) and EXCEPT. Spark plans intersect as a left-semi
    aggregate join; the aggregate proves value parity."""
    o = table(spark, sf, "orders")
    y96 = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    y97 = o.filter(F.year("o_orderdate") == 1997).select(
        F.col("o_custkey").alias("custkey")
    )
    both = y96.intersect(y97)
    return both.agg(
        F.count("*").alias("n_customers"),
        F.sum("custkey").cast("long").alias("key_sum"),
    )


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
    from vptstools_spark.functions.scalars import epoch_expr

    ts_ms = epoch_expr(dict(e.dtypes)["ts"], "ts", "MILLISECOND")
    w = Window.partitionBy("user_id").orderBy(ts_ms).rangeBetween(-3_600_000, 0)
    return e.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("avg_1h"),
    )


def q_ntile_deciles(spark: SparkSession, sf: str) -> DataFrame:
    """NTILE decile summary WITHOUT the single-partition global window:
    global row numbers come from `distributed_row_number` (range repartition
    on the sort keys → per-partition local ranking → prefix offsets), and
    `ntile_expr` applies SQL's exact NTILE bucket-size rule to (rn, n).
    Tie-broken by key so the decile assignment is deterministic; result is
    bit-identical to NTILE(10) OVER (ORDER BY ...) at any scale."""
    from vptstools_spark.plans.ranking import distributed_row_number, ntile_expr

    o = table(spark, sf, "orders").select("o_totalprice", "o_orderkey")
    ranked = distributed_row_number(o, ["o_totalprice", "o_orderkey"])
    n = ranked.count()  # served from the persisted census pass
    return (
        ranked.select(
            ntile_expr(F.col("_rn"), n, 10).alias("decile"), "o_totalprice"
        )
        .groupBy("decile")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
    )


def q_cheapest_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated scalar MIN + join-back (TPC-H Q2 shape): for each part, the
    supplier quoting the minimum unit price. The correlated
    `price = (SELECT MIN ...)` becomes a per-key aggregate joined back on
    (key, value); ties broken by MIN(suppkey) so the result is deterministic.
    Both sides shuffle once on l_partkey — co-partitioned, no broadcast of
    the fact."""
    l = table(spark, sf, "lineitem")
    unit = l.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    min_p = unit.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("unit_price").alias("min_price")
    )
    return (
        unit.join(
            min_p,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("min_price"))
        .agg(F.min("l_suppkey").alias("suppkey"))
        # no display rounding: price/qty lands on exact decimal midpoints where
        # Spark (HALF_UP on shortest repr) and the oracle (binary value) split;
        # the raw IEEE quotient is bit-identical across engines.
        .select("partkey", "suppkey", F.col("min_price").alias("min_unit_price"))
    )


def q_important_parts(spark: SparkSession, sf: str) -> DataFrame:
    """HAVING against an uncorrelated scalar subquery (TPC-H Q11 shape):
    parts whose lineitem value exceeds 1.5x the average part value. The
    scalar average is a 1-row re-aggregation of the same grouped result,
    broadcast cross-joined — the fact is scanned once, not twice."""
    l = table(spark, sf, "lineitem")
    val = l.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
    )
    total = val.agg(F.avg("value").alias("avg_value"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 1.5 * F.col("avg_value"))
        .select("l_partkey", F.round("value", 2).alias("part_value"))
    )


def q_top_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregate-of-aggregate selection (TPC-H Q15 shape): the supplier(s)
    with maximum 1996 revenue. `WHERE total = (SELECT MAX(total) ...)` over
    the revenue view becomes a 1-row broadcast of the max joined against the
    same cached aggregate — no second scan of lineitem."""
    l = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.round("total_revenue", 2).alias("total_revenue"))
    )


def q_supplier_cnt(spark: SparkSession, sf: str) -> DataFrame:
    """NOT IN + COUNT(DISTINCT) (TPC-H Q16 shape): distinct suppliers per
    (brand, size) over square sizes, excluding blacklisted suppliers
    (negative balance stands in for the comment filter). NOT IN over a
    non-null key column is a left-anti join on the tiny blacklist —
    broadcast, no shuffle added beyond the final distinct-agg."""
    l = table(spark, sf, "lineitem")
    p = table(spark, sf, "part")
    bad = (
        table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    psel = p.filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_size")
    return (
        l.join(F.broadcast(psel), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_lone_late_supplier(spark: SparkSession, sf: str) -> DataFrame:
    """Double-correlated EXISTS + NOT EXISTS (TPC-H Q21 shape): suppliers
    whose line was late (>60 days after order date) on a finished
    multi-supplier order where *no other* supplier was late.

    r9 rewrite (guide §2.3/§2.4 — one pass, one shuffle): the EXISTS /
    NOT EXISTS pair is, per order, just two distinct-supplier counts —
    a late line of supplier s qualifies iff its order has ≥ 2 distinct
    suppliers overall and exactly 1 distinct LATE supplier (necessarily
    s, since s's own line is late; the set-minus-self tests are implied).
    Both counts ride ONE window over the l⋈o join's existing orderkey
    partitioning — the per-order supplier sets are bounded by suppliers-
    per-order, never by data volume. The old form shuffled lineitem
    three times (full-pairs distinct, late-pairs distinct, semi/anti
    exchange) and AQE promoted the FULL distinct (orderkey, suppkey)
    pair set to a broadcast — fine at sf0.1, a guaranteed >8 GB
    broadcast failure at 100 TB. Oracle-verified identical at sf0.01
    and sf0.1."""
    o = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    l = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    li = l.select("l_orderkey", "l_suppkey", "l_shipdate").join(
        o.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 60 DAYS"
    )
    w = Window.partitionBy("l_orderkey")
    lone = (
        li.select(
            "l_orderkey",
            "l_suppkey",
            is_late.alias("__late"),
        )
        .withColumn(
            "__n_supp", F.size(F.collect_set("l_suppkey").over(w))
        )
        .withColumn(
            "__n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("__late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            F.col("__late")
            & (F.col("__n_supp") >= 2)
            & (F.col("__n_late_supp") == 1)
        )
    )
    return (
        lone.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q_idle_rich_by_prefix(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average balance and no URGENT
    orders,
    grouped by a name-suffix "country code" (last two key digits). The scalar average is a 1-row
    broadcast; the no-orders test is a broadcast anti join; the prefix
    grouping is a narrow substring — three relational idioms composed."""
    c = table(spark, sf, "customer")
    o = (
        table(spark, sf, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    pos = c.filter(F.col("c_acctbal") > 0.0)
    avg_bal = pos.agg(F.avg("c_acctbal").alias("ab"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.substring("c_name", 17, 2).alias("code"))
        .agg(
            F.count("*").alias("n_cust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double"), 2).alias(
                "total_bal"
            ),
        )
        .orderBy("code")
    )


QUERIES = {
    "intersect_loyal_customers": q_intersect_loyal_customers,
    "idle_rich_by_prefix": q_idle_rich_by_prefix,
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
    "cheapest_supplier": q_cheapest_supplier,
    "important_parts": q_important_parts,
    "top_supplier": q_top_supplier,
    "supplier_cnt": q_supplier_cnt,
    "lone_late_supplier": q_lone_late_supplier,
}

ORACLES = {
    "intersect_loyal_customers": """
        WITH both_years AS (
            SELECT o_custkey AS custkey FROM orders
            WHERE year(o_orderdate) = 1996
            INTERSECT
            SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        )
        SELECT COUNT(*) AS n_customers,
               CAST(SUM(custkey) AS BIGINT) AS key_sum
        FROM both_years
    """,
    "idle_rich_by_prefix": """
        WITH ab AS (SELECT AVG(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0.0)
        SELECT substring(c_name, 17, 2) AS code,
               COUNT(*) AS n_cust,
               ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_bal
        FROM customer, ab
        WHERE c_acctbal > ab.ab
          AND c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        GROUP BY 1 ORDER BY 1
    """,
    "cheapest_supplier": """
        WITH unit AS (
            SELECT l_partkey, l_suppkey,
                   l_extendedprice / l_quantity AS unit_price
            FROM lineitem
        )
        SELECT u.l_partkey AS partkey, MIN(u.l_suppkey) AS suppkey,
               u.unit_price AS min_unit_price
        FROM unit u
        WHERE u.unit_price = (SELECT MIN(u2.unit_price) FROM unit u2
                              WHERE u2.l_partkey = u.l_partkey)
        GROUP BY u.l_partkey, u.unit_price
    """,
    "important_parts": """
        WITH val AS (
            SELECT l_partkey,
                   SUM(l_extendedprice * (1 - l_discount)) AS value
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, ROUND(value, 2) AS part_value
        FROM val
        WHERE value > 1.5 * (SELECT AVG(value) FROM val)
    """,
    "top_supplier": """
        WITH rev AS (
            SELECT l_suppkey,
                   SUM(l_extendedprice * (1 - l_discount)) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1997-01-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, ROUND(total_revenue, 2) AS total_revenue
        FROM supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
    "supplier_cnt": """
        SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (1, 4, 9, 16, 25, 36, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_size
    """,
    "lone_late_supplier": """
        WITH li AS (
            SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderstatus = 'F'
        ),
        late AS (
            SELECT l_orderkey, l_suppkey FROM li
            WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        SELECT s_name, COUNT(*) AS numwait
        FROM late l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
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
