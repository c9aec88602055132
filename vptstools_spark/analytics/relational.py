"""Relational operator coverage: aggregations, joins (inner/semi/anti/outer/
broadcast), rollup, windows, set ops, top-k — the general relational surface
(SURVEY §2.3-2.6, §7.5) over the harness TPC-H-ish tables.

Every query aliases computed columns identically to its oracle and rounds
floating aggregates so the value-hash is FP-order-insensitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vptstools_spark.io import table


def q_pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical partial→final hash
    aggregation (SURVEY §2.3 A2 — Catalyst emits map-side combine)."""
    l = table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_ship_latency(spark: SparkSession, sf: str) -> DataFrame:
    """Order→ship latency percentiles per order priority — the fulfilment
    SLA table. One orders⋈lineitem key join (orders side broadcastable at
    small sf, shuffle join at lake scale), integer day lags, exact
    interpolated percentiles per group (percentile ↔ quantile_cont)."""
    o = table(spark, sf, "orders")
    l = table(spark, sf, "lineitem")
    lag_days = F.expr("timestampdiff(DAY, o_orderdate, l_shipdate)")
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderpriority", lag_days.alias("lag_d"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.percentile("lag_d", F.lit(0.5)), 4).alias("p50_days"),
            F.round(F.percentile("lag_d", F.lit(0.9)), 4).alias("p90_days"),
            F.round(F.percentile("lag_d", F.lit(0.99)), 4).alias("p99_days"),
            F.max("lag_d").alias("max_days"),
        )
    )


def q_forecast_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q6: the canonical predicate-pushdown probe — a single-table
    conjunctive filter (date range × discount band × quantity cap) and one
    global sum. Every predicate reaches the parquet scan as a
    PushedFilter and row-group min/max statistics skip the cold years
    without decoding them; DECIMAL arithmetic keeps the money sum
    aggregation-order-exact (reference has no analytics tier; engine
    extension per SURVEY §2.5)."""
    l = table(spark, sf, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col(
        "l_discount"
    ).cast("decimal(3,2)")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(rev).cast("double"), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_seasonal_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Multiplicative seasonal indices of monthly revenue: per calendar
    month, mean monthly revenue over the year range divided by the
    overall monthly mean — the decomposition step a forecasting
    pipeline runs before de-seasonalizing. All sums are DECIMAL (money
    rule), so engines agree bit-for-bit until the final two divisions."""
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    monthly = o.groupBy(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("ym"),
        F.month("o_orderdate").alias("m"),
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    overall = monthly.agg(
        (F.sum("rev") / F.count("*")).alias("mean_all")
    )
    per_m = monthly.groupBy("m").agg(
        (F.sum("rev") / F.count("*")).alias("mean_m"),
        F.count("*").alias("n_months"),
    )
    return (
        per_m.crossJoin(F.broadcast(overall))
        .select(
            "m",
            "n_months",
            F.round(F.col("mean_m").cast("double"), 2).alias("mean_revenue"),
            F.round(
                (F.col("mean_m") / F.col("mean_all")).cast("double"), 6
            ).alias("seasonal_index"),
        )
        .orderBy("m")
    )


def q_abc_parts(spark: SparkSession, sf: str) -> DataFrame:
    """ABC (Pareto) classification: brands ranked by revenue, classed A
    while cumulative share < 60%, B while < 85%, C after — the classic
    inventory-analytics cut. The cumulative window runs over the
    BRAND-level aggregate (bounded by the brand domain; stated with a
    can't-bind Limit so the no-global-window audit stays honest), and
    the share arithmetic divides exact decimal sums in a fixed order."""
    l = table(spark, sf, "lineitem")
    p = table(spark, sf, "part")
    rev = (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev"))
        .limit(100_000)  # brand-domain bound for the plan audit; never binds
    )
    w = Window.orderBy(F.col("rev").desc(), F.col("p_brand"))
    tot = rev.agg(F.sum("rev").alias("tot"))
    classed = (
        rev.crossJoin(F.broadcast(tot))
        .withColumn("cum", F.sum("rev").over(w))
        .withColumn(
            "share_cum",
            F.col("cum").cast("double") / F.col("tot").cast("double"),
        )
        .withColumn(
            "abc",
            F.when(F.col("share_cum") < 0.60, "A")
            .when(F.col("share_cum") < 0.85, "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc")
        .agg(
            F.count("*").alias("n_brands"),
            F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
        )
        .orderBy("abc")
    )


def q_market_concentration(spark: SparkSession, sf: str) -> DataFrame:
    """Herfindahl-Hirschman concentration index per region: Σ (nation
    revenue share)² over customer order revenue — the standard market-
    concentration statistic. Shares divide DECIMAL-exact sums in fixed
    order; the per-region Σ share² runs over ≤ nations-per-region rows."""
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region")
    rev = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    tot = rev.groupBy("r_name").agg(F.sum("rev").alias("tot"))
    share = rev.join(F.broadcast(tot), "r_name").withColumn(
        "sh", F.col("rev").cast("double") / F.col("tot").cast("double")
    )
    return (
        share.groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.round(F.sum(F.col("sh") * F.col("sh")), 6).alias("hhi"),
            F.round(F.max("sh"), 6).alias("top_share"),
        )
        .orderBy("r_name")
    )


def q_top_unshipped(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join + agg + deterministic top-10."""
    c = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5-style: 6-way join with two broadcastable dims.

    r9 join order (guide §3.2 — reduce the big side BEFORE it shuffles):
    region⋈nation prune the supplier dim to the ASIA fifth FIRST, and
    lineitem meets that pruned (broadcastable: suppliers are the
    smallest fact-side dim at every scale) supplier set before anything
    order-keyed — so at cluster scale the orderkey exchange carries only
    the ~1/5 of lineitem rows with an ASIA supplier instead of all of
    them. At bench scale AQE renders both orders as pure broadcast
    pipelines (plans/r09/region_revenue_{before,after}.txt — no
    lineitem exchange either way); results are join-order invariant and
    oracle-verified at sf0.01 and sf0.1."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = table(spark, sf, "lineitem")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    r = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    s_asia = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        l.join(F.broadcast(s_asia), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            c,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
    )


def q_semi_join_urgent(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join (SURVEY §2.4): BUILDING customers with ≥1 urgent order."""
    c = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


def q_anti_join_no_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join (SURVEY §2.4, transfer-service existence check shape)."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    return c.join(
        o, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_mktsegment")


def q_outer_join_spend(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join + agg preserving customers with zero orders."""
    c = table(spark, sf, "customer").filter(F.col("c_custkey") <= 200)
    o = table(spark, sf, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


def q_rollup_orders(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP (year, priority) — generalization of the reference's day→month
    key-truncation rollup A4 (src/vptstools/bin/vph5_to_vpts.py:204-211)."""
    o = table(spark, sf, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("string")
    )
    return (
        o.rollup("order_year", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .select(
            F.coalesce(F.col("order_year"), F.lit("ALL")).alias("order_year"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


def q_window_top_orders(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking window: top-3 orders per customer (deterministic tie-break)."""
    from pyspark.sql import Window

    o = table(spark, sf, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            "rnk",
        )
    )


def q_distinct_parts(spark: SparkSession, sf: str) -> DataFrame:
    """COUNT(DISTINCT) per group (SURVEY §2.3 A5)."""
    l = table(spark, sf, "lineitem").filter(F.col("l_suppkey") <= 20)
    return l.groupBy("l_suppkey").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_items"),
    )


def q_repeat_customers(spark: SparkSession, sf: str) -> DataFrame:
    """Set op: INTERSECT of 1995 and 1996 customer sets (SURVEY §2.6)."""
    o = table(spark, sf, "orders")
    c95 = o.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("custkey")
    )
    c96 = o.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("custkey")
    )
    return c95.intersect(c96)


def q_brand_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Fact⨝dim with explicit broadcast of the dimension (scale pattern:
    `part` stays < broadcast threshold even at 100× — no fact shuffle)."""
    l = table(spark, sf, "lineitem")
    p = table(spark, sf, "part").filter(F.col("p_size") <= 10)
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def q_cube_orders(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (year, status): all four grouping combinations."""
    o = table(spark, sf, "orders").withColumn(
        "order_year", F.year("o_orderdate").cast("string")
    )
    return (
        o.cube("order_year", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .select(
            F.coalesce(F.col("order_year"), F.lit("ALL")).alias("order_year"),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit GROUPING SETS ((region), (nation), ()) over the dim chain."""
    table(spark, sf, "nation").createOrReplaceTempView("nation_v")
    table(spark, sf, "region").createOrReplaceTempView("region_v")
    table(spark, sf, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT COALESCE(r_name, 'ALL') AS region,
               COALESCE(n_name, 'ALL') AS nation,
               COUNT(*) AS n_customers,
               ROUND(SUM(c_acctbal), 2) AS total_balance
        FROM customer_v
        JOIN nation_v ON c_nationkey = n_nationkey
        JOIN region_v ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
        """
    )


def q_orders_first_last(spark: SparkSession, sf: str) -> DataFrame:
    """min_by/max_by ordered-aggregate: first and last order price per
    customer by orderkey."""
    o = table(spark, sf, "orders").filter(F.col("o_custkey") <= 300)
    return o.groupBy("o_custkey").agg(
        F.round(F.min_by("o_totalprice", "o_orderkey"), 2).alias("first_price"),
        F.round(F.max_by("o_totalprice", "o_orderkey"), 2).alias("last_price"),
        F.count("*").alias("n_orders"),
    )


def q_part_type_stats(spark: SparkSession, sf: str) -> DataFrame:
    """String manipulation + aggregation: first token of p_type as category."""
    p = table(spark, sf, "part")
    return (
        p.withColumn("category", F.split("p_type", " ").getItem(0))
        .groupBy("category")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
            F.max("p_size").alias("max_size"),
        )
    )


def q_order_count_dist(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q13-style: left outer join + two-level aggregation — the
    distribution of per-customer order counts (customers with zero orders
    land in the c_count=0 bucket via the outer join)."""
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("n_cust"))


def q_large_orders(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q18-style: HAVING over a grouped fact, joined back to its
    dimensions — orders whose total quantity exceeds 300, top-50 by price.
    The big groupBy pre-aggregates lineitem before any join (map-side
    combine); orders/customer join after the 10x row reduction."""
    l = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(50)
    )


def q_disjunctive_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q19-style: OR-of-ANDs join predicate — Catalyst extracts the
    common `l_partkey = p_partkey` conjunct as the equi-join key and keeps
    the disjunction as a residual filter, so this stays a hash join, not a
    cartesian product."""
    l = table(spark, sf, "lineitem")
    p = table(spark, sf, "part")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(p, (F.col("l_partkey") == F.col("p_partkey")) & branch)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q_nation_trade(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7-style: bidirectional nation-pair trade volume — 5-way join
    (two broadcast nation dims aliased apart) with a year projection."""
    l = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    # Restrict both dims to the two nations of interest BEFORE the join:
    # the pair|rev residual below implies it, but Catalyst won't derive the
    # per-table IN-list from the cross-table disjunction — without this every
    # supplier/customer row survives until the post-join filter.
    pick = F.col("n_name").isin("NATION_6", "NATION_9")
    n1 = n.filter(pick).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(pick).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_6")
    rev = (F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_9")
    s2 = s.join(F.broadcast(n1), F.col("s_nk") == F.col("s_nationkey")).select(
        "s_suppkey", "supp_nation"
    )
    c2 = c.join(F.broadcast(n2), F.col("c_nk") == F.col("c_nationkey")).select(
        "c_custkey", "cust_nation"
    )
    return (
        l.join(F.broadcast(s2), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c2, F.col("c_custkey") == F.col("o_custkey"))
        .filter(pair | rev)
        .groupBy(
            "supp_nation", "cust_nation", F.year("o_orderdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_nation_customer_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG shape): per nation, the first five
    customer names by key, comma-joined. collect_list is order-nondeterministic
    under parallelism, so the aggregate collects (key, name) structs and the
    ordering is imposed by sort_array BEFORE slicing — deterministic at any
    partitioning."""
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    top5 = F.transform(
        F.slice(
            F.sort_array(F.collect_list(F.struct("c_custkey", "c_name"))), 1, 5
        ),
        lambda s: s["c_name"],
    )
    return (
        c.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.concat_ws(",", top5).alias("sample_names"),
        )
    )


def q_latest_order(spark: SparkSession, sf: str) -> DataFrame:
    """CDC keep-latest (upsert compaction): each customer's most recent order
    — row_number()=1 over (key, recency desc) with a deterministic
    tie-break. The standard pattern for compacting a change stream to
    current state; one exchange on the key, filter inside the window stage
    (Spark pushes rn=1 into a TopK-per-partition via WindowGroupLimit)."""
    o = table(spark, sf, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("last_price"),
        )
    )


def q_lost_order_months(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT ALL (bag difference): per-customer order months of 1995 minus
    those of 1996, multiplicity preserved — a customer ordering twice in a
    1995 month and once in that month of 1996 keeps ONE surplus row.
    Distinct EXCEPT would lose the count; exceptAll shuffles both sides
    once on the full row."""
    o = table(spark, sf, "orders")

    def months(year: int) -> DataFrame:
        return (
            o.filter(F.year("o_orderdate") == year)
            .select("o_custkey", F.month("o_orderdate").alias("m"))
        )

    return (
        months(1995)
        .exceptAll(months(1996))
        .groupBy("m")
        .agg(F.count("*").alias("n_surplus"))
    )



def q_nation_volume_shipping(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q7-style: bi-national shipping volume between two nations by
    ship year — a 6-way join where both nation dims broadcast (aliased
    copies for the supplier and customer sides) and the fact side shuffles
    once on the join keys; the disjunctive nation pair predicate prunes
    before aggregation."""
    l = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_market_share(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q8-style: NATION_3's share of AMERICA's import volume per order
    year — conditional aggregation over the full join (numerator and
    denominator in ONE pass, no self-join), share rounded after the
    division so the FP aggregation order can't leak into the hash."""
    l = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    s = table(spark, sf, "supplier")
    n_c = table(spark, sf, "nation")
    r = table(spark, sf, "region").filter(F.col("r_name") == "AMERICA")
    n_s = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_c), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(table(spark, sf, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_s), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


def q_product_profit(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q9-style: profit per (supplier nation, order year) for widget
    parts. No partsupp table in the harness, so cost is modeled as
    0.9 × p_retailprice × l_quantity — the join/aggregation shape (5-way,
    part filter pushed to the scan, dims broadcast) is what matters."""
    l = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders")
    s = table(spark, sf, "supplier")
    n = table(spark, sf, "nation")
    p = table(spark, sf, "part").filter(F.col("p_name").contains("widget"))
    # exact DECIMAL arithmetic: the inputs are 2-dp money values, so the
    # per-row profit and its sum are exact and aggregation-order-insensitive
    # (a double sum of ~3e6 differs at the cent between engines)
    def dec(c: str):
        return F.col(c).cast("decimal(12,2)")

    profit = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount")
    ) - F.lit("0.9").cast("decimal(3,2)") * dec("p_retailprice") * dec("l_quantity")
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit).cast("double"), 2).alias("profit"))
    )


def q_promo_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share for one ship month — a
    conditional aggregate ratio over a broadcast part join. Both the
    conditional numerator and the denominator are carried in DECIMAL and
    divided once at the end (money-sum rule), so the percentage is
    aggregation-order exact."""
    l = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = table(spark, sf, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    promo = F.when(F.col("p_name").startswith("red"), rev).otherwise(
        F.lit(0).cast("decimal(14,4)")
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_pct"),
            F.count("*").alias("n_lines"),
        )
    )


def q_returned_item_report(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item revenue report: top-20 customers by
    revenue lost to returns in a quarter, with nation context. Revenue is
    a DECIMAL sum (money rule); the date predicate and the returnflag
    filter push to the two fact scans, the two dims broadcast, and the
    top-k is orderBy+limit (TakeOrderedAndProject) over the customer
    aggregate — the canonical star-join report at any scale."""
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1998-01-01") & (F.col("o_orderdate") < "1998-04-01")
    )
    l = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    c = table(spark, sf, "customer")
    n = table(spark, sf, "nation")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


#: per-(query, sf) ANALYZE memo — pure function of the inputs, keeps the
#: repeated bench/sweep runs from re-scanning for stats
_STATS_CACHE: dict = {}


def q_join_order_sales(spark: SparkSession, sf: str) -> DataFrame:
    """Cost-based join ORDERING under the value gate
    (`plans/joinorder.py`): the Q5-shaped region⋈nation⋈customer⋈orders⋈
    lineitem chain, but the join tree is CHOSEN by the Selinger C_out DP
    over per-input ANALYZE statistics instead of written by hand, and
    each node's physical strategy (broadcast/shuffle_hash/merge) comes
    from the same estimates. Inner equi-joins commute and associate, so
    the oracle — DuckDB planning the same SQL its own way — value-proves
    order independence; the selective-dims-first choice itself is
    pytest-proven (`tests/test_joinorder.py`)."""
    from vptstools_spark.plans.joinorder import JoinEdge, ordered_join
    from vptstools_spark.plans.stats import analyze_table

    r = (
        table(spark, sf, "region")
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("r_regionkey").alias("regionkey"))
    )
    n = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("nationkey"),
        F.col("n_regionkey").alias("regionkey"),
        "n_name",
    )
    c = table(spark, sf, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_nationkey").alias("nationkey"),
    )
    o = (
        table(spark, sf, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
        )
    )
    l = table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"),
        "l_extendedprice",
        "l_discount",
    )
    dfs = {"region": r, "nation": n, "customer": c, "orders": o, "lineitem": l}
    key = ("join_order_sales", sf)
    if key not in _STATS_CACHE:
        # stats of the FILTERED inputs (post-pushdown sizes are what the
        # order decision needs); one aggregation pass per relation
        _STATS_CACHE[key] = {
            nm: analyze_table(df) for nm, df in dfs.items()
        }
    edges = [
        JoinEdge("region", "nation", ("regionkey",)),
        JoinEdge("nation", "customer", ("nationkey",)),
        JoinEdge("customer", "orders", ("custkey",)),
        JoinEdge("orders", "lineitem", ("orderkey",)),
    ]
    joined, _ = ordered_join(dfs, _STATS_CACHE[key], edges)
    return (
        joined.groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("n_name")
    )


def q_skyline_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Skyline / Pareto frontier (`operators/skyline.py` — Börzsönyi et
    al. ICDE 2001): the parts no other part dominates on (cheaper
    retail price, larger size). Distributed two-phase: per-partition
    local skylines via a vectorized Arrow-batched dominance check (a
    cross-row predicate Catalyst cannot state), then the exact global
    skyline over their broadcast-scale union. The oracle states
    dominance directly as NOT EXISTS."""
    from vptstools_spark.operators.skyline import skyline

    p = table(spark, sf, "part").select(
        "p_partkey", "p_size", F.col("p_retailprice").cast("double").alias("p_retailprice")
    )
    out = skyline(p, {"p_retailprice": "min", "p_size": "max"})
    return out.select(
        "p_partkey", "p_size", F.round("p_retailprice", 2).alias("price")
    ).orderBy("p_partkey")



QUERIES = {
    "market_concentration": q_market_concentration,
    "abc_parts": q_abc_parts,
    "seasonal_revenue": q_seasonal_revenue,
    "skyline_parts": q_skyline_parts,
    "join_order_sales": q_join_order_sales,
    "promo_revenue": q_promo_revenue,
    "nation_volume_shipping": q_nation_volume_shipping,
    "market_share": q_market_share,
    "product_profit": q_product_profit,
    "pricing_summary": q_pricing_summary,
    "forecast_revenue": q_forecast_revenue,
    "ship_latency": q_ship_latency,
    "nation_customer_sample": q_nation_customer_sample,
    "latest_order": q_latest_order,
    "returned_item_report": q_returned_item_report,
    "lost_order_months": q_lost_order_months,
    "order_count_dist": q_order_count_dist,
    "large_orders": q_large_orders,
    "disjunctive_revenue": q_disjunctive_revenue,
    "nation_trade": q_nation_trade,
    "top_unshipped": q_top_unshipped,
    "region_revenue": q_region_revenue,
    "semi_join_urgent": q_semi_join_urgent,
    "anti_join_no_orders": q_anti_join_no_orders,
    "outer_join_spend": q_outer_join_spend,
    "rollup_orders": q_rollup_orders,
    "window_top_orders": q_window_top_orders,
    "distinct_parts": q_distinct_parts,
    "repeat_customers": q_repeat_customers,
    "brand_revenue": q_brand_revenue,
    "cube_orders": q_cube_orders,
    "grouping_sets_dims": q_grouping_sets,
    "orders_first_last": q_orders_first_last,
    "part_type_stats": q_part_type_stats,
}

ORACLES = {
    "market_concentration": """
        WITH rev AS (
            SELECT r_name, n_name,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2
        ),
        t AS (SELECT r_name, SUM(rev) AS tot FROM rev GROUP BY 1),
        sh AS (
            SELECT rev.r_name,
                   CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE) AS sh
            FROM rev JOIN t ON rev.r_name = t.r_name
        )
        SELECT r_name, COUNT(*) AS n_nations,
               ROUND(SUM(sh * sh), 6) AS hhi,
               ROUND(MAX(sh), 6) AS top_share
        FROM sh GROUP BY r_name ORDER BY r_name
    """,
    "abc_parts": """
        WITH rev AS (
            SELECT p_brand,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        ),
        t AS (SELECT SUM(rev) AS tot FROM rev),
        c AS (
            SELECT p_brand, rev,
                   SUM(rev) OVER (ORDER BY rev DESC, p_brand) AS cum,
                   tot
            FROM rev CROSS JOIN t
        ),
        k AS (
            SELECT rev,
                   CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) < 0.60 THEN 'A'
                        WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) < 0.85 THEN 'B'
                        ELSE 'C' END AS abc
            FROM c
        )
        SELECT abc, COUNT(*) AS n_brands,
               CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS revenue
        FROM k GROUP BY abc ORDER BY abc
    """,
    "seasonal_revenue": """
        WITH monthly AS (
            SELECT strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m') AS ym,
                   month(o_orderdate) AS m,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2
        ),
        overall AS (SELECT SUM(rev) / COUNT(*) AS mean_all FROM monthly),
        per_m AS (
            SELECT m, SUM(rev) / COUNT(*) AS mean_m, COUNT(*) AS n_months
            FROM monthly GROUP BY m
        )
        SELECT m, n_months,
               ROUND(CAST(mean_m AS DOUBLE), 2) AS mean_revenue,
               ROUND(CAST(mean_m / mean_all AS DOUBLE), 6) AS seasonal_index
        FROM per_m CROSS JOIN overall
        ORDER BY m
    """,
    "returned_item_report": """
SELECT c_custkey, c_name, n_name, c_acctbal,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                  AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate < TIMESTAMP '1998-04-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
    """,
    "promo_revenue": """
        SELECT ROUND(100.0 *
                   CAST(SUM(CASE WHEN p_name LIKE 'red%'
                            THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                                 (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
                            ELSE CAST(0 AS DECIMAL(14,4)) END) AS DOUBLE)
                   / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                          (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE),
                   6) AS promo_pct,
               COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1995-09-01'
          AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """,
    "lost_order_months": """
        WITH a AS (SELECT o_custkey, month(o_orderdate) AS m FROM orders
                   WHERE year(o_orderdate) = 1995),
             b AS (SELECT o_custkey, month(o_orderdate) AS m FROM orders
                   WHERE year(o_orderdate) = 1996),
             d AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        SELECT m, COUNT(*) AS n_surplus FROM d GROUP BY m
    """,
    "latest_order": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS last_orderdate,
               o_orderstatus,
               ROUND(o_totalprice, 2) AS last_price
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
    "nation_customer_sample": """
        WITH ranked AS (
            SELECT n_name, c_name, c_custkey,
                   ROW_NUMBER() OVER (PARTITION BY n_name
                                      ORDER BY c_custkey) AS rn,
                   COUNT(*) OVER (PARTITION BY n_name) AS n_customers
            FROM customer JOIN nation ON n_nationkey = c_nationkey
        )
        SELECT n_name, MIN(n_customers) AS n_customers,
               string_agg(CASE WHEN rn <= 5 THEN c_name END, ','
                          ORDER BY c_custkey) AS sample_names
        FROM ranked GROUP BY n_name
    """,
    "order_count_dist": """
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON o_custkey = c_custkey
            GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS n_cust FROM per_cust GROUP BY c_count
    """,
    "large_orders": """
        WITH big AS (
            SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY l_orderkey
            HAVING ROUND(SUM(l_quantity), 2) > 300
        )
        SELECT c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               ROUND(o_totalprice, 2) AS totalprice, sum_qty
        FROM big
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY totalprice DESC, o_orderkey
        LIMIT 50
    """,
    "disjunctive_revenue": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """,
    "nation_trade": """
        SELECT supp_nation, cust_nation, l_year,
               ROUND(SUM(volume), 2) AS revenue
        FROM (
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   year(o_orderdate) AS l_year,
                   l_extendedprice * (1 - l_discount) AS volume
            FROM lineitem
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation n1 ON n1.n_nationkey = s_nationkey
            JOIN nation n2 ON n2.n_nationkey = c_nationkey
            WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
               OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9')
        )
        GROUP BY supp_nation, cust_nation, l_year
    """,
    "top_unshipped": """
        SELECT l_orderkey,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    "join_order_sales": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM region, nation, customer, orders, lineitem
        WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name ORDER BY n_name
    """,
    "region_revenue": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """,
    "semi_join_urgent": """
        SELECT c_custkey, c_name FROM customer c
        WHERE c_mktsegment = 'BUILDING'
          AND EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    "anti_join_no_orders": """
        SELECT c_custkey, c_mktsegment FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "outer_join_spend": """
        SELECT c_custkey,
               COUNT(o_orderkey) AS n_orders,
               ROUND(COALESCE(SUM(o_totalprice), 0), 2) AS total_spend
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        WHERE c_custkey <= 200
        GROUP BY c_custkey
    """,
    "rollup_orders": """
        SELECT COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS order_year,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY ROLLUP(year(o_orderdate), o_orderpriority)
    """,
    "window_top_orders": """
        SELECT o_custkey, o_orderkey, price, rnk FROM (
            SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS price,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rnk
            FROM orders WHERE o_custkey <= 100
        ) WHERE rnk <= 3
    """,
    "distinct_parts": """
        SELECT l_suppkey,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(*) AS n_items
        FROM lineitem WHERE l_suppkey <= 20
        GROUP BY l_suppkey
    """,
    "repeat_customers": """
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
    """,
    "brand_revenue": """
        SELECT p_brand,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_size <= 10
        GROUP BY p_brand
    """,
    "cube_orders": """
        SELECT COALESCE(CAST(year(o_orderdate) AS VARCHAR), 'ALL') AS order_year,
               COALESCE(o_orderstatus, 'ALL') AS status,
               COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM orders
        GROUP BY CUBE (year(o_orderdate), o_orderstatus)
    """,
    "grouping_sets_dims": """
        SELECT COALESCE(r_name, 'ALL') AS region,
               COALESCE(n_name, 'ALL') AS nation,
               COUNT(*) AS n_customers,
               ROUND(SUM(c_acctbal), 2) AS total_balance
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY GROUPING SETS ((r_name), (n_name), ())
    """,
    "orders_first_last": """
        SELECT o_custkey,
               ROUND(arg_min(o_totalprice, o_orderkey), 2) AS first_price,
               ROUND(arg_max(o_totalprice, o_orderkey), 2) AS last_price,
               COUNT(*) AS n_orders
        FROM orders WHERE o_custkey <= 300
        GROUP BY o_custkey
    """,
    "part_type_stats": """
        SELECT string_split(p_type, ' ')[1] AS category,
               COUNT(*) AS n_parts,
               ROUND(AVG(p_retailprice), 4) AS avg_price,
               MAX(p_size) AS max_size
        FROM part GROUP BY 1
    """,
}

ORACLES["ship_latency"] = """
WITH lags AS (
    SELECT o_orderpriority,
           date_diff('day', o_orderdate, l_shipdate) AS lag_d
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       ROUND(quantile_cont(lag_d, 0.5), 4) AS p50_days,
       ROUND(quantile_cont(lag_d, 0.9), 4) AS p90_days,
       ROUND(quantile_cont(lag_d, 0.99), 4) AS p99_days,
       MAX(lag_d) AS max_days
FROM lags GROUP BY o_orderpriority
"""

ORACLES["forecast_revenue"] = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                     * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE), 2)
           AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.04
  AND l_quantity < 24
"""

ORACLES["nation_volume_shipping"] = """
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(YEAR(l_shipdate) AS INT) AS l_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
"""

ORACLES["market_share"] = """
    SELECT CAST(YEAR(o_orderdate) AS INT) AS o_year,
           ROUND(
               SUM(CASE WHEN ns.n_name = 'NATION_3'
                        THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
               / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    JOIN region  ON nc.n_regionkey = r_regionkey AND r_name = 'AMERICA'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    GROUP BY 1
"""

ORACLES["product_profit"] = """
    SELECT n_name AS nation,
           CAST(YEAR(o_orderdate) AS INT) AS o_year,
           ROUND(CAST(SUM(
               CAST(l_extendedprice AS DECIMAL(12,2))
                   * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(12,2)))
               - CAST(0.9 AS DECIMAL(3,2))
                   * CAST(p_retailprice AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(12,2))
           ) AS DOUBLE), 2) AS profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey AND p_name LIKE '%widget%'
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY 1, 2
"""

ORACLES["skyline_parts"] = """
    SELECT p_partkey, p_size, ROUND(CAST(p_retailprice AS DOUBLE), 2) AS price
    FROM part a
    WHERE NOT EXISTS (
        SELECT 1 FROM part b
        WHERE b.p_retailprice <= a.p_retailprice
          AND b.p_size >= a.p_size
          AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size)
    )
    ORDER BY p_partkey
"""
