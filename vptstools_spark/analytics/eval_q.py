"""Round-9 analytics wave: model-evaluation and advanced-inference
queries — survival hazard (Nelson–Aalen), probabilistic-forecast
calibration (Murphy/Brier decomposition), inter-rater agreement
(Cohen's kappa), ranking quality (nDCG), frequent 3-itemsets, extreme
values (Gumbel block maxima), stylometry (Burrows' delta), blocked rank
tests (Friedman), randomization inference (permutation test), robust
location (Huber IRLS), variance-reduced experiment readout (CUPED),
and spatial hotspot detection.

Oracle-exactness techniques used throughout (see also SKILL.md notes):
- money/metric sums ride DECIMAL so aggregation order cannot move them;
- per-row double arithmetic (divisions, products) is identical-bits in
  any IEEE engine — only SUM order varies — so doubles are quantized to
  DECIMAL per row BEFORE the sum wherever a sum feeds a reported value;
- "random" labels/scores are multiplicative-hash integers (pure modular
  arithmetic), never engine RNG or xxhash (DuckDB lacks it);
- cumulative statistics over small derived tables use conditional
  self-joins, not global windows (registry convention); windows appear
  only partitioned by a provably non-degenerate key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vptstools_spark.io import table

_EULER_GAMMA = 0.5772156649015329
_PI = 3.141592653589793


# ---------------------------------------------------------------------------
# 1. Nelson–Aalen cumulative hazard
# ---------------------------------------------------------------------------

def q_nelson_aalen(spark: SparkSession, sf: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimate H(t) = Σ_{t_i<=t} d_i/n_i
    over the same user-tenure life table as `kaplan_meier`
    (inference_q.py): per-user tenure in whole hours, churn = last event
    >24h before the corpus horizon, at-risk counts by reverse cumulative
    sum. The hazard sum runs as a conditional self-join over the
    distinct-tenure table (bounded by the corpus span in hours)."""
    e = table(spark, sf, "events")
    horizon = e.agg(F.max("ts").alias("t_max"))
    users = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.expr("timestampdiff(HOUR, t0, t1)").alias("tenure"),
            (
                F.col("t1") < F.col("t_max") - F.expr("INTERVAL 24 HOURS")
            ).cast("int").alias("churned"),
        )
    )
    life = users.groupBy("tenure").agg(
        F.sum("churned").alias("d"), F.count("*").alias("c")
    )
    a, b = life.alias("a"), life.alias("b")
    risk = (
        a.join(b, F.col("b.tenure") >= F.col("a.tenure"))
        .groupBy(F.col("a.tenure").alias("tenure"), F.col("a.d").alias("d"))
        .agg(F.sum("b.c").alias("n_risk"))
        .filter(F.col("d") > 0)
    )
    x, y = risk.alias("x"), risk.alias("y")
    return (
        x.join(y, F.col("y.tenure") <= F.col("x.tenure"))
        .groupBy(
            F.col("x.tenure").alias("tenure"),
            F.col("x.d").alias("d"),
            F.col("x.n_risk").alias("n_risk"),
        )
        .agg(
            F.round(
                F.sum(F.col("y.d").cast("double") / F.col("y.n_risk")), 6
            ).alias("cum_hazard")
        )
    )


# ---------------------------------------------------------------------------
# 2. Brier score + Murphy decomposition
# ---------------------------------------------------------------------------

def q_brier_decomposition(spark: SparkSession, sf: str) -> DataFrame:
    """Murphy decomposition of the Brier score for a deterministic
    synthetic forecaster on orders: forecast p = ((o_orderkey *
    2654435761) mod 1000)/1000, outcome y = (o_orderstatus = 'F').
    BS = uncertainty − resolution + reliability, with the overall BS
    computed EXACTLY as an integer sum (Σ(k − 1000·y)² / (N·10⁶)) and
    the per-bin terms (10 deciles) from exact integer ratios — the only
    cross-engine float work is a 10-term sum."""
    o = table(spark, sf, "orders").select(
        ((F.col("o_orderkey") * F.lit(2654435761)) % 1000).alias("k"),
        (F.col("o_orderstatus") == "F").cast("long").alias("y"),
    )
    binned = o.groupBy((F.col("k") / 100).cast("int").alias("bin")).agg(
        F.count("*").alias("n_b"),
        F.sum("y").alias("sy_b"),
        F.sum("k").alias("sk_b"),
        F.sum((F.col("k") - 1000 * F.col("y")) * (F.col("k") - 1000 * F.col("y"))).alias("se_b"),
    )
    g = binned.agg(
        F.sum("n_b").alias("n"),
        F.sum("sy_b").alias("sy"),
        F.sum("se_b").alias("se"),
    )
    j = binned.crossJoin(F.broadcast(g))
    ybar = F.col("sy").cast("double") / F.col("n")
    pbar_b = F.col("sk_b").cast("double") / (1000.0 * F.col("n_b"))
    ybar_b = F.col("sy_b").cast("double") / F.col("n_b")
    return j.groupBy().agg(
        F.round(
            F.first(F.col("se").cast("double") / (F.col("n") * 1000000.0)), 6
        ).alias("brier"),
        F.round(
            F.sum(F.col("n_b") * (pbar_b - ybar_b) * (pbar_b - ybar_b))
            / F.first(F.col("n")),
            6,
        ).alias("reliability"),
        F.round(
            F.sum(F.col("n_b") * (ybar_b - ybar) * (ybar_b - ybar))
            / F.first(F.col("n")),
            6,
        ).alias("resolution"),
        F.round(F.first(ybar * (1.0 - ybar)), 6).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# 3. Cohen's kappa
# ---------------------------------------------------------------------------

def q_cohens_kappa(spark: SparkSession, sf: str) -> DataFrame:
    """Inter-rater agreement beyond chance between two deterministic
    binary raters on orders (a price rule vs a priority rule):
    κ = (p_o − p_e)/(1 − p_e) from one 2×2 integer contingency
    aggregate — a single scan, exact integers until the final ratio."""
    o = table(spark, sf, "orders").select(
        (F.col("o_totalprice") > 150000.0).cast("long").alias("ra"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long").alias("rb"),
    )
    c = o.agg(
        F.count("*").alias("n"),
        F.sum(F.col("ra") * F.col("rb")).alias("n11"),
        F.sum(F.col("ra") * (1 - F.col("rb"))).alias("n10"),
        F.sum((1 - F.col("ra")) * F.col("rb")).alias("n01"),
        F.sum((1 - F.col("ra")) * (1 - F.col("rb"))).alias("n00"),
    )
    po = (F.col("n11") + F.col("n00")).cast("double") / F.col("n")
    pe = (
        (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
        + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
    ).cast("double") / (F.col("n") * F.col("n"))
    return c.select(
        "n11", "n10", "n01", "n00",
        F.round(po, 6).alias("p_o"),
        F.round(pe, 6).alias("p_e"),
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# 4. nDCG ranking quality
# ---------------------------------------------------------------------------

_NDCG_TERMS = ["join", "hash", "scan"]
_NDCG_K = 10


def q_ndcg_retrieval(spark: SparkSession, sf: str) -> DataFrame:
    """nDCG@10 of a term-frequency ranker against graded relevance
    (relevance = the term's occurrence count in the doc). For each of 3
    fixed query terms the ranking is (tf DESC, doc_id ASC) and the ideal
    ranking is the same list re-sorted — both realized as row_number
    windows PARTITIONED BY term (3 non-degenerate partitions), with
    deterministic integer tie-breaks so both engines rank identically.
    DCG = Σ rel_i/log2(i+1) over the top 10."""
    d = table(spark, sf, "documents").select("doc_id", "text", "n_chars")
    terms = spark.createDataFrame([(t,) for t in _NDCG_TERMS], "term string")
    tf = (
        d.crossJoin(F.broadcast(terms))
        .select(
            "term",
            "doc_id",
            # token-exact occurrence count (no substring/overlap semantics
            # to disagree on across engines)
            F.size(
                F.filter(F.split("text", " "), lambda w: w == F.col("term"))
            ).alias("rel"),
            F.col("n_chars"),
        )
        .filter(F.col("rel") > 0)
        # the RANKER under evaluation: length-normalized tf (a ratio of
        # exact integers — identical bits in any IEEE engine); relevance
        # stays the raw count, so nDCG < 1 measures what normalization
        # loses against graded truth
        .withColumn(
            "score", F.col("rel").cast("double") / (F.col("n_chars") + 1.0)
        )
    )
    from pyspark.sql import Window

    w_sys = Window.partitionBy("term").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    w_ideal = Window.partitionBy("term").orderBy(
        F.col("rel").desc(), F.col("doc_id")
    )
    gain_at = lambda pos: F.col("rel").cast("double") / F.log2(pos + 1.0)  # noqa: E731
    ranked = tf.select(
        "term", "rel",
        F.row_number().over(w_sys).alias("pos_sys"),
        F.row_number().over(w_ideal).alias("pos_ideal"),
    )
    agg = ranked.groupBy("term").agg(
        F.sum(
            F.when(F.col("pos_sys") <= _NDCG_K, gain_at(F.col("pos_sys")))
            .otherwise(0.0)
        ).alias("dcg"),
        F.sum(
            F.when(F.col("pos_ideal") <= _NDCG_K, gain_at(F.col("pos_ideal")))
            .otherwise(0.0)
        ).alias("idcg"),
    )
    return agg.select(
        "term",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg"),
    )


# ---------------------------------------------------------------------------
# 5. frequent 3-itemsets
# ---------------------------------------------------------------------------

_ITEMSET_MIN_SUPPORT = 12


def q_itemset3_support(spark: SparkSession, sf: str) -> DataFrame:
    """Frequent unordered item TRIPLES across order baskets (items =
    l_partkey mod 40): the basket-bounded 3-way self-join — each join
    constrained i1 < i2 < i3 within the same order, so per-basket work
    is C(width,3) with width ≤ a few lineitems, never |items|³. The
    same frequent-pattern shape as `basket_lift`, one order up."""
    items = (
        table(spark, sf, "lineitem")
        .select(
            F.col("l_orderkey").alias("o"),
            (F.col("l_partkey") % 40).alias("i"),
        )
        .distinct()
    )
    # RELATIVE support floor (0.08% of baskets, never below the absolute
    # floor): an absolute threshold stops pruning at 10x the basket
    # count — the standard frequent-itemset contract is a fraction
    minsup = items.agg(
        F.greatest(
            F.lit(_ITEMSET_MIN_SUPPORT).cast("double"),
            F.count_distinct("o") * 0.0008,
        ).alias("minsup")
    )
    a, b, c = items.alias("a"), items.alias("b"), items.alias("c")
    triples = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.i") < F.col("b.i")))
        .join(c, (F.col("a.o") == F.col("c.o")) & (F.col("b.i") < F.col("c.i")))
        .groupBy(
            F.col("a.i").alias("i1"),
            F.col("b.i").alias("i2"),
            F.col("c.i").alias("i3"),
        )
        .agg(F.count("*").alias("support"))
        .crossJoin(F.broadcast(minsup))
        .filter(F.col("support") >= F.col("minsup"))
        .drop("minsup")
    )
    return triples


# ---------------------------------------------------------------------------
# 6. Gumbel block maxima
# ---------------------------------------------------------------------------

def q_gumbel_block_maxima(spark: SparkSession, sf: str) -> DataFrame:
    """Gumbel (EV-I) fit of monthly maxima of daily revenue by the
    method of moments: scale = s·√6/π, loc = mean − γ·scale. Daily
    revenue is an exact DECIMAL sum of per-row ROUND(price·(1−disc),2);
    monthly maxima of exact decimals are exact; the moment sums (Σx,
    Σx²) stay in DECIMAL so n≈84 maxima aggregate identically in any
    engine — doubles appear only in the final closed form."""
    li = table(spark, sf, "lineitem").select(
        F.date_trunc("DAY", "l_shipdate").alias("day"),
        # FLOOR'd integer cents: IEEE floor is identical in any engine,
        # unlike ROUND's half-mode (Spark HALF_UP vs DuckDB half-even)
        # AND unlike the double->bigint cast itself (Spark truncates,
        # DuckDB rounds)
        F.floor(F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0)
        .alias("rev_c"),
    )
    daily = li.groupBy("day").agg(F.sum("rev_c").alias("day_rev"))
    monthly = daily.groupBy(
        F.date_trunc("MONTH", "day").alias("month")
    ).agg(F.max("day_rev").alias("mx"))
    m = monthly.agg(
        F.count("*").alias("n"),
        F.sum("mx").alias("s1"),
        F.sum(F.col("mx").cast("decimal(38,0)") * F.col("mx")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n") / 100.0
    var = (
        F.col("s2").cast("double") / F.col("n")
        - (F.col("s1").cast("double") / F.col("n"))
        * (F.col("s1").cast("double") / F.col("n"))
    ) / 10000.0
    scale = F.sqrt(var * 6.0) / _PI
    return m.select(
        "n",
        F.round(mean, 4).alias("mean_max"),
        F.round(scale, 4).alias("gumbel_scale"),
        F.round(mean - _EULER_GAMMA * scale, 4).alias("gumbel_loc"),
    )


# ---------------------------------------------------------------------------
# 7. Burrows' delta stylometry
# ---------------------------------------------------------------------------

_DELTA_SOURCES = ["src0", "src1", "src2", "src3", "src4"]
_DELTA_TOP_WORDS = 20


def q_burrows_delta(spark: SparkSession, sf: str) -> DataFrame:
    """Burrows' delta authorship distance between document sources:
    relative frequencies of the corpus-wide top-20 words per source,
    z-scored across the 5 compared sources (population σ), delta(a,b) =
    mean |z_a − z_b|. Every frequency is an exact integer ratio and the
    vocabulary is capped, so the pairwise stage is a 100-row join —
    vocabulary-bounded like the other text statistics."""
    d = table(spark, sf, "documents").filter(
        F.col("source").isin(_DELTA_SOURCES)
    )
    words = d.select(
        "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "")
    top = (
        words.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(_DELTA_TOP_WORDS)
        .select("w")
    )
    totals = words.groupBy("source").agg(F.count("*").alias("tot"))
    cnt = (
        words.join(F.broadcast(top), "w")
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
        .join(F.broadcast(totals), "source")
        .select(
            "source", "w", (F.col("c").cast("double") / F.col("tot")).alias("f")
        )
    )
    # densify: a source missing a top word has f = 0 (outer join vs the
    # source×word frame)
    srcs = d.select("source").distinct()
    full = (
        srcs.crossJoin(F.broadcast(top))
        .join(cnt, ["source", "w"], "left")
        .select("source", "w", F.coalesce("f", F.lit(0.0)).alias("f"))
    )
    stats = full.groupBy("w").agg(
        F.avg("f").alias("mu"),
        F.sqrt(F.avg(F.col("f") * F.col("f")) - F.avg("f") * F.avg("f")).alias("sd"),
    )
    z = full.join(F.broadcast(stats), "w").select(
        "source", "w",
        F.when(F.col("sd") > 0, (F.col("f") - F.col("mu")) / F.col("sd"))
        .otherwise(0.0)
        .alias("z"),
    )
    za = z.select(F.col("source").alias("sa"), "w", F.col("z").alias("z_a"))
    zb = z.select(F.col("source").alias("sb"), "w", F.col("z").alias("z_b"))
    return (
        za.join(zb, "w")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.round(F.avg(F.abs(F.col("z_a") - F.col("z_b"))), 6).alias("delta"))
    )


# ---------------------------------------------------------------------------
# 8. Friedman blocked rank test
# ---------------------------------------------------------------------------

def q_friedman_regions(spark: SparkSession, sf: str) -> DataFrame:
    """Friedman test for region revenue differences with months as
    blocks: rank the 5 regions' EXACT (decimal) monthly revenues within
    each month (a rank window partitioned by month — non-degenerate by
    construction), then χ²_F = 12/(n·k·(k+1))·ΣR_j² − 3n(k+1). Rank
    sums are integers, so the statistic is an exact rational."""
    o = table(spark, sf, "orders")
    cust = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    rev = (
        o.join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy(
            F.date_trunc("MONTH", "o_orderdate").alias("month"),
            F.col("n_regionkey").alias("region"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("month").orderBy("rev")
    ranked = rev.withColumn("r", F.rank().over(w))
    # keep only complete blocks (months where all 5 regions traded)
    complete = (
        ranked.groupBy("month").agg(F.count("*").alias("k"))
        .filter(F.col("k") == 5)
        .select("month")
    )
    rsums = (
        ranked.join(F.broadcast(complete), "month")
        .groupBy("region")
        .agg(F.sum("r").alias("rsum"), F.count("*").alias("n_blocks"))
    )
    return rsums.groupBy().agg(
        F.first("n_blocks").alias("n_blocks"),
        F.round(
            12.0
            / (F.first("n_blocks") * 5.0 * 6.0)
            * F.sum(F.col("rsum") * F.col("rsum")).cast("double")
            - 3.0 * F.first("n_blocks") * 6.0,
            6,
        ).alias("friedman_chi2"),
        F.lit(4).alias("df"),
    )


# ---------------------------------------------------------------------------
# 9. permutation (randomization) test
# ---------------------------------------------------------------------------

_N_PERM = 64


def q_permutation_test_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Randomization test for the URGENT-vs-rest order-value gap: 64
    deterministic pseudo-random relabelings (multiplicative-hash parity
    per (order, b) — pure modular arithmetic, reproducible in any
    engine), each evaluated from EXACT decimal conditional sums in ONE
    pass over orders×64 (explode + conditional aggregation, map-side
    combinable). p = (1 + #{|Δ_b| ≥ |Δ_obs|}) / (B + 1)."""
    o = table(spark, sf, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("g"),
    )
    obs = o.groupBy().agg(
        (
            F.sum(F.when(F.col("g") == 1, F.col("x"))).cast("double")
            / F.sum(F.col("g"))
            - F.sum(F.when(F.col("g") == 0, F.col("x"))).cast("double")
            / F.sum(1 - F.col("g"))
        ).alias("d_obs")
    )
    perms = o.select(
        "x", F.explode(F.sequence(F.lit(1), F.lit(_N_PERM))).alias("b"),
        F.col("o_orderkey").alias("k"),
    ).select(
        "b", "x",
        (
            ((F.col("k") * F.lit(2654435761) + F.col("b") * F.lit(40503))
             % F.lit(1000000007)) % 2
        ).cast("int").alias("gp"),
    )
    diffs = perms.groupBy("b").agg(
        (
            F.sum(F.when(F.col("gp") == 1, F.col("x"))).cast("double")
            / F.sum(F.col("gp"))
            - F.sum(F.when(F.col("gp") == 0, F.col("x"))).cast("double")
            / F.sum(1 - F.col("gp"))
        ).alias("d_b")
    )
    j = diffs.crossJoin(F.broadcast(obs))
    return j.groupBy().agg(
        F.round(F.first("d_obs"), 4).alias("observed_diff"),
        F.count("*").alias("n_perm"),
        F.round(
            (1.0 + F.sum((F.abs(F.col("d_b")) >= F.abs(F.col("d_obs"))).cast("int")))
            / (F.count("*") + 1.0),
            6,
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# 10. Huber robust location (fixed-iteration IRLS)
# ---------------------------------------------------------------------------

_HUBER_ITERS = 3


def q_huber_location(spark: SparkSession, sf: str) -> DataFrame:
    """Huber M-estimate of order value by 3 fixed IRLS iterations.
    Cross-engine exactness: the start (mean) and scale (population σ)
    come from exact DECIMAL sums; each iteration's weights w =
    min(1, k·σ/|x−μ|) are identical-bits per row in any IEEE engine, and
    the weighted sums are quantized per row to DECIMAL(28,10) BEFORE
    aggregation — so the sum is order-independent and the per-iteration
    μ is bit-identical across engines. The whole loop is Catalyst
    expressions over one cached scan; no driver iteration state beyond
    the unrolled plan (the oracle unrolls the same 3 CTEs)."""
    o = table(spark, sf, "orders").select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("x")
    )
    base = o.groupBy().agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x").cast("decimal(38,4)") * F.col("x")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    params = base.select(
        mean.alias("mu0"), (F.sqrt(var) * 1.345).alias("ks")
    )
    cur = o.crossJoin(F.broadcast(params))
    mu_col = F.col("mu0")
    for i in range(_HUBER_ITERS):
        xd = F.col("x").cast("double")
        w = F.when(
            F.abs(xd - mu_col) <= F.col("ks"), F.lit(1.0)
        ).otherwise(F.col("ks") / F.abs(xd - mu_col))
        it = cur.groupBy().agg(
            F.sum((w * xd).cast("decimal(28,10)")).alias("swx"),
            F.sum(w.cast("decimal(28,10)")).alias("sw"),
            F.first("ks").alias("ks"),
            F.first("mu0").alias("mu0"),
        )
        mu_val = (F.col("swx").cast("double") / F.col("sw").cast("double"))
        if i < _HUBER_ITERS - 1:
            params = it.select(
                mu_val.alias("mu0"), F.col("ks")
            ).withColumnRenamed("mu0", "mu0")
            # rebind: next iteration re-scans orders against the new mu
            params = params.select(F.col("mu0"), F.col("ks"))
            cur = o.crossJoin(F.broadcast(params))
            mu_col = F.col("mu0")
        else:
            return it.select(
                F.round(F.col("mu0"), 3).alias("huber_mu_prev"),
                F.round(mu_val, 3).alias("huber_mu"),
                F.round(F.col("ks"), 3).alias("huber_k_scale"),
            )
    raise AssertionError("unreachable")


# ---------------------------------------------------------------------------
# 11. CUPED variance-reduced experiment readout
# ---------------------------------------------------------------------------

def q_cuped_adjusted(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED readout of a synthetic experiment on events: arm =
    user_id mod 2, covariate X = the user's pre-period value sum,
    outcome Y = post-period value sum (periods split at the corpus
    midpoint). θ = cov(X,Y)/var(X) pooled over all users; adjusted arm
    mean = Ȳ_arm − θ(X̄_arm − X̄). Per-event values are quantized to
    DECIMAL(18,6) so every user sum, cross-product sum, and arm sum is
    exact; θ and the means are final-step doubles only."""
    e = table(spark, sf, "events")
    span = e.agg(
        F.min("ts").alias("t0"), F.max("ts").alias("t1")
    ).select(
        F.expr("timestampadd(SECOND, CAST(timestampdiff(SECOND, t0, t1) / 2 AS BIGINT), t0)").alias("mid")
    )
    ev = e.crossJoin(F.broadcast(span)).select(
        "user_id",
        (F.col("user_id") % 2).cast("int").alias("arm"),
        F.when(F.col("ts") < F.col("mid"), F.round(F.col("value"), 6).cast("decimal(18,6)"))
        .otherwise(F.lit(0).cast("decimal(18,6)")).alias("xv"),
        F.when(F.col("ts") >= F.col("mid"), F.round(F.col("value"), 6).cast("decimal(18,6)"))
        .otherwise(F.lit(0).cast("decimal(18,6)")).alias("yv"),
    )
    users = ev.groupBy("user_id", "arm").agg(
        F.sum("xv").alias("ux"), F.sum("yv").alias("uy")
    )
    pooled = users.groupBy().agg(
        F.count("*").alias("n"),
        F.sum("ux").alias("sx"),
        F.sum("uy").alias("sy"),
        F.sum(F.col("ux").cast("decimal(38,12)") * F.col("uy")).alias("sxy"),
        F.sum(F.col("ux").cast("decimal(38,12)") * F.col("ux")).alias("sxx"),
    ).select(
        "n", "sx", "sy",
        (
            (F.col("sxy").cast("double") / F.col("n"))
            - (F.col("sx").cast("double") / F.col("n"))
            * (F.col("sy").cast("double") / F.col("n"))
        ).alias("cov_xy"),
        (
            (F.col("sxx").cast("double") / F.col("n"))
            - (F.col("sx").cast("double") / F.col("n"))
            * (F.col("sx").cast("double") / F.col("n"))
        ).alias("var_x"),
    ).select(
        (F.col("cov_xy") / F.col("var_x")).alias("theta"),
        (F.col("sx").cast("double") / F.col("n")).alias("xbar"),
    )
    arms = users.groupBy("arm").agg(
        F.count("*").alias("n_users"),
        F.sum("ux").alias("ax"),
        F.sum("uy").alias("ay"),
    )
    return (
        arms.crossJoin(F.broadcast(pooled))
        .select(
            "arm", "n_users",
            F.round(F.col("ay").cast("double") / F.col("n_users"), 6).alias("mean_y"),
            F.round(
                F.col("ay").cast("double") / F.col("n_users")
                - F.col("theta")
                * (F.col("ax").cast("double") / F.col("n_users") - F.col("xbar")),
                6,
            ).alias("mean_y_cuped"),
            F.round(F.col("theta"), 6).alias("theta"),
        )
    )


# ---------------------------------------------------------------------------
# 12. spatial hotspot z-scores
# ---------------------------------------------------------------------------

def q_hotspot_grid_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Spatial hotspot detection over the deterministic customer point
    cloud (spatial_q's multiplicative-hash coordinates): bin into a
    10×10 grid of 0.5° cells, z-score the cell counts (integer sums →
    exact mean/σ), return cells with z ≥ 1.5. The global pass is one
    integer aggregation over ≤100 cells — hotspot detection at any
    scale is grid-bounded, never point-pair work."""
    c = table(spark, sf, "customer").select("c_custkey")
    # base point cloud is hash-uniform; every 7th customer is pulled into
    # the [0,1)x[0,1) corner so the grid carries a REAL hotspot — a
    # uniform lattice would make the z>=1.5 answer vacuously empty
    lat0 = ((F.col("c_custkey") * F.lit(2654435761)) % 100000).cast(
        "double"
    ) / 100000.0 * 5.0
    lon0 = ((F.col("c_custkey") * F.lit(40503)) % 100000).cast(
        "double"
    ) / 100000.0 * 5.0
    clustered = (F.col("c_custkey") % 7) == 0
    pts = c.select(
        F.when(clustered, lat0 / 5.0).otherwise(lat0).alias("lat"),
        F.when(clustered, lon0 / 5.0).otherwise(lon0).alias("lon"),
    )
    cells = pts.groupBy(
        F.floor(F.col("lat") / 0.5).alias("cx"),
        F.floor(F.col("lon") / 0.5).alias("cy"),
    ).agg(F.count("*").alias("n"))
    g = cells.agg(
        F.count("*").alias("nc"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("nc")
    sd = F.sqrt(F.col("s2").cast("double") / F.col("nc") - mu * mu)
    return (
        cells.crossJoin(F.broadcast(g))
        .select(
            "cx", "cy", "n",
            F.round((F.col("n") - mu) / sd, 6).alias("z"),
        )
        .filter(F.col("z") >= 1.5)
    )


QUERIES = {
    "nelson_aalen": q_nelson_aalen,
    "brier_decomposition": q_brier_decomposition,
    "cohens_kappa": q_cohens_kappa,
    "ndcg_retrieval": q_ndcg_retrieval,
    "itemset3_support": q_itemset3_support,
    "gumbel_block_maxima": q_gumbel_block_maxima,
    "burrows_delta": q_burrows_delta,
    "friedman_regions": q_friedman_regions,
    "permutation_test_revenue": q_permutation_test_revenue,
    "huber_location": q_huber_location,
    "cuped_adjusted": q_cuped_adjusted,
    "hotspot_grid_zscore": q_hotspot_grid_zscore,
}

ORACLES = {
    "nelson_aalen": """
        WITH horizon AS (SELECT MAX(ts) AS t_max FROM events),
        users AS (
            SELECT
                CAST(FLOOR(DATE_DIFF('second', MIN(ts), MAX(ts)) / 3600.0)
                     AS BIGINT) AS tenure,
                CASE WHEN MAX(ts) < (SELECT t_max FROM horizon)
                                   - INTERVAL 24 HOUR
                     THEN 1 ELSE 0 END AS churned
            FROM events GROUP BY user_id
        ),
        life AS (
            SELECT tenure, CAST(SUM(churned) AS BIGINT) AS d, COUNT(*) AS c
            FROM users GROUP BY tenure
        ),
        risk AS (
            SELECT a.tenure, a.d, CAST(SUM(b.c) AS BIGINT) AS n_risk
            FROM life a JOIN life b ON b.tenure >= a.tenure
            GROUP BY a.tenure, a.d
            HAVING a.d > 0
        )
        SELECT x.tenure, x.d, x.n_risk,
               ROUND(SUM(CAST(y.d AS DOUBLE) / y.n_risk), 6) AS cum_hazard
        FROM risk x JOIN risk y ON y.tenure <= x.tenure
        GROUP BY x.tenure, x.d, x.n_risk
    """,
    "brier_decomposition": """
        WITH o AS (
            SELECT (o_orderkey * 2654435761) % 1000 AS k,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
            FROM orders
        ),
        b AS (
            SELECT CAST(k // 100 AS INT) AS bin, COUNT(*) AS n_b,
                   SUM(y) AS sy_b, SUM(k) AS sk_b,
                   SUM((k - 1000 * y) * (k - 1000 * y)) AS se_b
            FROM o GROUP BY 1
        ),
        g AS (SELECT SUM(n_b) AS n, SUM(sy_b) AS sy, SUM(se_b) AS se FROM b)
        SELECT
            ROUND(FIRST(CAST(se AS DOUBLE) / (n * 1000000.0)), 6) AS brier,
            ROUND(SUM(n_b * POWER(CAST(sk_b AS DOUBLE) / (1000.0 * n_b)
                                  - CAST(sy_b AS DOUBLE) / n_b, 2))
                  / FIRST(n), 6) AS reliability,
            ROUND(SUM(n_b * POWER(CAST(sy_b AS DOUBLE) / n_b
                                  - CAST(sy AS DOUBLE) / n, 2))
                  / FIRST(n), 6) AS resolution,
            ROUND(FIRST((CAST(sy AS DOUBLE) / n) * (1.0 - CAST(sy AS DOUBLE) / n)), 6)
                AS uncertainty
        FROM b CROSS JOIN g
    """,
    "cohens_kappa": """
        WITH o AS (
            SELECT CASE WHEN o_totalprice > 150000.0 THEN 1 ELSE 0 END AS ra,
                   CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END AS rb
            FROM orders
        ),
        c AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(ra * rb) AS BIGINT) AS n11,
                   CAST(SUM(ra * (1 - rb)) AS BIGINT) AS n10,
                   CAST(SUM((1 - ra) * rb) AS BIGINT) AS n01,
                   CAST(SUM((1 - ra) * (1 - rb)) AS BIGINT) AS n00
            FROM o
        )
        SELECT n11, n10, n01, n00,
               ROUND(CAST(n11 + n00 AS DOUBLE) / n, 6) AS p_o,
               ROUND(CAST((n11 + n10) * (n11 + n01)
                          + (n01 + n00) * (n10 + n00) AS DOUBLE) / (n * n), 6)
                   AS p_e,
               ROUND((CAST(n11 + n00 AS DOUBLE) / n
                      - CAST((n11 + n10) * (n11 + n01)
                             + (n01 + n00) * (n10 + n00) AS DOUBLE) / (n * n))
                     / (1.0 - CAST((n11 + n10) * (n11 + n01)
                                   + (n01 + n00) * (n10 + n00) AS DOUBLE)
                              / (n * n)), 6) AS kappa
        FROM c
    """,
    "ndcg_retrieval": """
        WITH terms AS (
            SELECT UNNEST(['join', 'hash', 'scan']) AS term
        ),
        rel AS (
            SELECT t.term, d.doc_id,
                   CAST(LENGTH(LIST_FILTER(STRING_SPLIT(d.text, ' '),
                                           w -> w = t.term)) AS BIGINT) AS rel,
                   d.n_chars
            FROM documents d CROSS JOIN terms t
        ),
        scored AS (
            SELECT term, doc_id, rel,
                   CAST(rel AS DOUBLE) / (n_chars + 1.0) AS score
            FROM rel WHERE rel > 0
        ),
        ranked AS (
            SELECT term, rel,
                   ROW_NUMBER() OVER (PARTITION BY term
                                      ORDER BY score DESC, doc_id) AS pos_sys,
                   ROW_NUMBER() OVER (PARTITION BY term
                                      ORDER BY rel DESC, doc_id) AS pos_ideal
            FROM scored
        ),
        agg AS (
            SELECT term,
                   SUM(CASE WHEN pos_sys <= 10
                            THEN CAST(rel AS DOUBLE) / LOG2(pos_sys + 1.0)
                            ELSE 0.0 END) AS dcg,
                   SUM(CASE WHEN pos_ideal <= 10
                            THEN CAST(rel AS DOUBLE) / LOG2(pos_ideal + 1.0)
                            ELSE 0.0 END) AS idcg
            FROM ranked GROUP BY term
        )
        SELECT term, ROUND(dcg, 6) AS dcg, ROUND(idcg, 6) AS idcg,
               ROUND(dcg / idcg, 6) AS ndcg
        FROM agg
    """,
    "itemset3_support": """
        WITH items AS (
            SELECT DISTINCT l_orderkey AS o, l_partkey % 40 AS i
            FROM lineitem
        )
        SELECT a.i AS i1, b.i AS i2, c.i AS i3,
               COUNT(*) AS support
        FROM items a
        JOIN items b ON a.o = b.o AND a.i < b.i
        JOIN items c ON a.o = c.o AND b.i < c.i
        GROUP BY 1, 2, 3
        HAVING COUNT(*) >= GREATEST(
            12.0, (SELECT COUNT(DISTINCT o) FROM items) * 0.0008)
    """,
    "gumbel_block_maxima": """
        WITH li AS (
            SELECT DATE_TRUNC('day', l_shipdate) AS day,
                   CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100.0)
                        AS BIGINT) AS rev_c
            FROM lineitem
        ),
        daily AS (SELECT day, SUM(rev_c) AS day_rev FROM li GROUP BY day),
        monthly AS (
            SELECT DATE_TRUNC('month', day) AS month, MAX(day_rev) AS mx
            FROM daily GROUP BY 1
        ),
        m AS (
            SELECT COUNT(*) AS n, SUM(mx) AS s1,
                   SUM(CAST(mx AS DECIMAL(38,0)) * mx) AS s2
            FROM monthly
        ),
        fit AS (
            SELECT n,
                   CAST(s1 AS DOUBLE) / n / 100.0 AS mean,
                   (CAST(s2 AS DOUBLE) / n
                    - POWER(CAST(s1 AS DOUBLE) / n, 2)) / 10000.0 AS var
            FROM m
        )
        SELECT n,
               ROUND(mean, 4) AS mean_max,
               ROUND(SQRT(var * 6.0) / 3.141592653589793, 4) AS gumbel_scale,
               ROUND(mean - 0.5772156649015329
                     * SQRT(var * 6.0) / 3.141592653589793, 4) AS gumbel_loc
        FROM fit
    """,
    "burrows_delta": """
        WITH d AS (
            SELECT source, text FROM documents
            WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')
        ),
        words AS (
            SELECT source, UNNEST(string_split(text, ' ')) AS w FROM d
        ),
        wf AS (SELECT source, w FROM words WHERE w <> ''),
        top AS (
            SELECT w FROM wf GROUP BY w
            ORDER BY COUNT(*) DESC, w LIMIT 20
        ),
        totals AS (SELECT source, COUNT(*) AS tot FROM wf GROUP BY source),
        cnt AS (
            SELECT wf.source, wf.w,
                   CAST(COUNT(*) AS DOUBLE) / ANY_VALUE(t.tot) AS f
            FROM wf JOIN top ON wf.w = top.w
            JOIN totals t ON wf.source = t.source
            GROUP BY wf.source, wf.w
        ),
        srcs AS (SELECT DISTINCT source FROM d),
        full_f AS (
            SELECT s.source, top.w, COALESCE(c.f, 0.0) AS f
            FROM srcs s CROSS JOIN top
            LEFT JOIN cnt c ON c.source = s.source AND c.w = top.w
        ),
        stats AS (
            SELECT w, AVG(f) AS mu,
                   SQRT(AVG(f * f) - AVG(f) * AVG(f)) AS sd
            FROM full_f GROUP BY w
        ),
        z AS (
            SELECT f.source, f.w,
                   CASE WHEN s.sd > 0 THEN (f.f - s.mu) / s.sd
                        ELSE 0.0 END AS z
            FROM full_f f JOIN stats s ON f.w = s.w
        )
        SELECT za.source AS sa, zb.source AS sb,
               ROUND(AVG(ABS(za.z - zb.z)), 6) AS delta
        FROM z za JOIN z zb ON za.w = zb.w AND za.source < zb.source
        GROUP BY 1, 2
    """,
    "friedman_regions": """
        WITH rev AS (
            SELECT DATE_TRUNC('month', o.o_orderdate) AS month,
                   n.n_regionkey AS region,
                   SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT month, region,
                   RANK() OVER (PARTITION BY month ORDER BY rev) AS r
            FROM rev
        ),
        complete AS (
            SELECT month FROM ranked GROUP BY month HAVING COUNT(*) = 5
        ),
        rsums AS (
            SELECT region, SUM(r) AS rsum, COUNT(*) AS n_blocks
            FROM ranked JOIN complete USING (month)
            GROUP BY region
        )
        SELECT FIRST(n_blocks) AS n_blocks,
               ROUND(12.0 / (FIRST(n_blocks) * 5.0 * 6.0)
                     * CAST(SUM(rsum * rsum) AS DOUBLE)
                     - 3.0 * FIRST(n_blocks) * 6.0, 6) AS friedman_chi2,
               4 AS df
        FROM rsums
    """,
    "permutation_test_revenue": """
        WITH o AS (
            SELECT o_orderkey AS k,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS x,
                   CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
            FROM orders
        ),
        obs AS (
            SELECT CAST(SUM(CASE WHEN g = 1 THEN x END) AS DOUBLE)
                   / SUM(g)
                   - CAST(SUM(CASE WHEN g = 0 THEN x END) AS DOUBLE)
                   / SUM(1 - g) AS d_obs
            FROM o
        ),
        perms AS (
            SELECT b.b, o.x,
                   CAST(((o.k * 2654435761 + b.b * 40503) % 1000000007) % 2
                        AS INT) AS gp
            FROM o CROSS JOIN (
                SELECT UNNEST(GENERATE_SERIES(1, 64)) AS b
            ) b
        ),
        diffs AS (
            SELECT b,
                   CAST(SUM(CASE WHEN gp = 1 THEN x END) AS DOUBLE) / SUM(gp)
                   - CAST(SUM(CASE WHEN gp = 0 THEN x END) AS DOUBLE)
                     / SUM(1 - gp) AS d_b
            FROM perms GROUP BY b
        )
        SELECT ROUND(FIRST(d_obs), 4) AS observed_diff,
               COUNT(*) AS n_perm,
               ROUND((1.0 + SUM(CASE WHEN ABS(d_b) >= ABS(d_obs)
                                     THEN 1 ELSE 0 END))
                     / (COUNT(*) + 1.0), 6) AS p_value
        FROM diffs CROSS JOIN obs
    """,
    "huber_location": """
        WITH o AS (
            SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS x FROM orders
        ),
        base AS (
            SELECT COUNT(*) AS n, SUM(x) AS s1,
                   SUM(CAST(x AS DECIMAL(38,4)) * x) AS s2
            FROM o
        ),
        p0 AS (
            SELECT CAST(s1 AS DOUBLE) / n AS mu,
                   SQRT(CAST(s2 AS DOUBLE) / n
                        - POWER(CAST(s1 AS DOUBLE) / n, 2)) * 1.345 AS ks
            FROM base
        ),
        i1 AS (
            SELECT CAST(SUM(CAST(
                       CASE WHEN ABS(CAST(x AS DOUBLE) - mu) <= ks THEN 1.0
                            ELSE ks / ABS(CAST(x AS DOUBLE) - mu) END
                       * CAST(x AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE)
                   / CAST(SUM(CAST(
                       CASE WHEN ABS(CAST(x AS DOUBLE) - mu) <= ks THEN 1.0
                            ELSE ks / ABS(CAST(x AS DOUBLE) - mu) END
                       AS DECIMAL(28,10))) AS DOUBLE) AS mu,
                   FIRST(ks) AS ks
            FROM o CROSS JOIN p0
        ),
        i2 AS (
            SELECT CAST(SUM(CAST(
                       CASE WHEN ABS(CAST(x AS DOUBLE) - mu) <= ks THEN 1.0
                            ELSE ks / ABS(CAST(x AS DOUBLE) - mu) END
                       * CAST(x AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE)
                   / CAST(SUM(CAST(
                       CASE WHEN ABS(CAST(x AS DOUBLE) - mu) <= ks THEN 1.0
                            ELSE ks / ABS(CAST(x AS DOUBLE) - mu) END
                       AS DECIMAL(28,10))) AS DOUBLE) AS mu,
                   FIRST(ks) AS ks
            FROM o CROSS JOIN i1
        ),
        i3 AS (
            SELECT FIRST(mu) AS mu_prev, FIRST(ks) AS ks,
                   CAST(SUM(CAST(
                       CASE WHEN ABS(CAST(x AS DOUBLE) - mu) <= ks THEN 1.0
                            ELSE ks / ABS(CAST(x AS DOUBLE) - mu) END
                       * CAST(x AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE)
                   / CAST(SUM(CAST(
                       CASE WHEN ABS(CAST(x AS DOUBLE) - mu) <= ks THEN 1.0
                            ELSE ks / ABS(CAST(x AS DOUBLE) - mu) END
                       AS DECIMAL(28,10))) AS DOUBLE) AS mu
            FROM o CROSS JOIN i2
        )
        SELECT ROUND(mu_prev, 3) AS huber_mu_prev,
               ROUND(mu, 3) AS huber_mu,
               ROUND(ks, 3) AS huber_k_scale
        FROM i3
    """,
    "cuped_adjusted": """
        WITH span AS (
            SELECT MIN(ts) + CAST(FLOOR(DATE_DIFF('second', MIN(ts), MAX(ts)) / 2)
                                  AS BIGINT) * INTERVAL 1 SECOND AS mid
            FROM events
        ),
        ev AS (
            SELECT user_id, CAST(user_id % 2 AS INT) AS arm,
                   CASE WHEN ts < (SELECT mid FROM span)
                        THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END AS xv,
                   CASE WHEN ts >= (SELECT mid FROM span)
                        THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                        ELSE CAST(0 AS DECIMAL(18,6)) END AS yv
            FROM events
        ),
        users AS (
            SELECT user_id, arm, SUM(xv) AS ux, SUM(yv) AS uy
            FROM ev GROUP BY user_id, arm
        ),
        pooled AS (
            SELECT
                ((CAST(SUM(CAST(ux AS DECIMAL(38,12)) * uy) AS DOUBLE) / COUNT(*))
                 - (CAST(SUM(ux) AS DOUBLE) / COUNT(*))
                   * (CAST(SUM(uy) AS DOUBLE) / COUNT(*)))
                / ((CAST(SUM(CAST(ux AS DECIMAL(38,12)) * ux) AS DOUBLE) / COUNT(*))
                   - POWER(CAST(SUM(ux) AS DOUBLE) / COUNT(*), 2)) AS theta,
                CAST(SUM(ux) AS DOUBLE) / COUNT(*) AS xbar
            FROM users
        ),
        arms AS (
            SELECT arm, COUNT(*) AS n_users, SUM(ux) AS ax, SUM(uy) AS ay
            FROM users GROUP BY arm
        )
        SELECT arm, n_users,
               ROUND(CAST(ay AS DOUBLE) / n_users, 6) AS mean_y,
               ROUND(CAST(ay AS DOUBLE) / n_users
                     - theta * (CAST(ax AS DOUBLE) / n_users - xbar), 6)
                   AS mean_y_cuped,
               ROUND(theta, 6) AS theta
        FROM arms CROSS JOIN pooled
    """,
    "hotspot_grid_zscore": """
        WITH raw AS (
            SELECT CAST((c_custkey * 2654435761) % 100000 AS DOUBLE)
                   / 100000.0 * 5.0 AS lat0,
                   CAST((c_custkey * 40503) % 100000 AS DOUBLE)
                   / 100000.0 * 5.0 AS lon0,
                   c_custkey % 7 = 0 AS clustered
            FROM customer
        ),
        pts AS (
            SELECT CASE WHEN clustered THEN lat0 / 5.0 ELSE lat0 END AS lat,
                   CASE WHEN clustered THEN lon0 / 5.0 ELSE lon0 END AS lon
            FROM raw
        ),
        cells AS (
            SELECT CAST(FLOOR(lat / 0.5) AS BIGINT) AS cx,
                   CAST(FLOOR(lon / 0.5) AS BIGINT) AS cy,
                   COUNT(*) AS n
            FROM pts GROUP BY 1, 2
        ),
        g AS (
            SELECT COUNT(*) AS nc, SUM(n) AS s1, SUM(n * n) AS s2 FROM cells
        )
        SELECT cx, cy, n,
               ROUND((n - CAST(s1 AS DOUBLE) / nc)
                     / SQRT(CAST(s2 AS DOUBLE) / nc
                            - POWER(CAST(s1 AS DOUBLE) / nc, 2)), 6) AS z
        FROM cells CROSS JOIN g
        WHERE (n - CAST(s1 AS DOUBLE) / nc)
              / SQRT(CAST(s2 AS DOUBLE) / nc
                     - POWER(CAST(s1 AS DOUBLE) / nc, 2)) >= 1.5
    """,
}


# ===========================================================================
# Round-9 second batch: changepoints, paired-comparison models, reliability,
# survey estimation, wavelets, dispersion, sequence rules, conformal
# coverage, linear Shapley, moment-form MMD.
# ===========================================================================


def _daily_rev_cents(spark: SparkSession, sf: str) -> DataFrame:
    """Exact FLOOR'd-cents daily revenue — shared base for the series
    queries (day count is sf-INDEPENDENT: the date span is fixed, so
    day-level self-joins stay ~2500² at any scale)."""
    return (
        table(spark, sf, "lineitem")
        .select(
            F.date_trunc("DAY", "l_shipdate").alias("day"),
            F.floor(
                F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
            ).alias("rev_c"),
        )
        .groupBy("day")
        .agg(F.sum("rev_c").alias("x"))
    )


def q_changepoint_binary_seg(spark: SparkSession, sf: str) -> DataFrame:
    """Single-changepoint binary segmentation over daily revenue: pick
    the split minimizing SSE_left + SSE_right (equivalently maximizing
    between-group variance reduction). Prefix moments per candidate via
    a conditional self-join on the day table (sf-independent ~2500
    rows); winner by min_by with an earliest-day tie-break. All moments
    are exact integers (cents and cents²-in-DECIMAL); SSE math is the
    only double step."""
    d = _daily_rev_cents(spark, sf)
    tot = d.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("q"),
    )
    a, b = d.alias("a"), d.alias("b")
    pre = (
        a.join(b, F.col("b.day") <= F.col("a.day"))
        .groupBy(F.col("a.day").alias("day"))
        .agg(
            F.count("*").alias("nl"),
            F.sum("b.x").alias("sl"),
            F.sum(F.col("b.x").cast("decimal(38,0)") * F.col("b.x")).alias("ql"),
        )
    )
    j = pre.crossJoin(F.broadcast(tot)).filter(
        (F.col("nl") >= 5) & (F.col("n") - F.col("nl") >= 5)
    )
    sl, ql, nl = (
        F.col("sl").cast("double"),
        F.col("ql").cast("double"),
        F.col("nl").cast("double"),
    )
    sr = (F.col("s") - F.col("sl")).cast("double")
    qr = (F.col("q") - F.col("ql")).cast("double")
    nr = (F.col("n") - F.col("nl")).cast("double")
    sse_split = (ql - sl * sl / nl) + (qr - sr * sr / nr)
    sse_all = F.col("q").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ).cast("double") / F.col("n")
    scored = j.select(
        "day",
        sse_split.alias("sse"),
        (sse_all - sse_split).alias("gain"),
    )
    best = scored.groupBy().agg(
        F.min_by(
            F.struct(F.col("day"), F.col("sse"), F.col("gain")),
            F.struct(F.col("sse"), F.col("day")),
        ).alias("b")
    )
    return best.select(
        F.col("b.day").alias("split_day"),
        F.round(F.col("b.sse") / 1.0e8, 4).alias("sse_dollars2"),
        F.round(F.col("b.gain") / 1.0e8, 4).alias("gain_dollars2"),
    )


def _monthly_region_rev(spark: SparkSession, sf: str) -> DataFrame:
    o = table(spark, sf, "orders")
    cust = table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    nat = table(spark, sf, "nation").select("n_nationkey", "n_regionkey")
    return (
        o.join(F.broadcast(cust), o["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy(
            F.date_trunc("MONTH", "o_orderdate").alias("month"),
            F.col("n_regionkey").alias("region"),
        )
        .agg(F.floor(F.sum(F.col("o_totalprice") * 100.0)).alias("rev_c"))
    )


def q_bradley_terry_regions(spark: SparkSession, sf: str) -> DataFrame:
    """Bradley–Terry strengths for the 5 regions from monthly pairwise
    revenue comparisons (region i beats j in a month iff its exact
    monthly revenue is higher; exact ties produce no game). Three
    unrolled MM iterations s_i ← W_i / Σ_j n_ij/(s_i+s_j) over the
    5×5 win matrix — every iteration is a 5-row join, the unrolled-CTE
    shape the oracle reproduces; the win counts are exact integers."""
    rev = _monthly_region_rev(spark, sf)
    a, b = rev.alias("a"), rev.alias("b")
    games = (
        a.join(
            b,
            (F.col("a.month") == F.col("b.month"))
            & (F.col("a.region") != F.col("b.region")),
        )
        .filter(F.col("a.rev_c") > F.col("b.rev_c"))
        .select(F.col("a.region").alias("wi"), F.col("b.region").alias("wj"))
    )
    # r9 (guide §8 — decide with small rows; same route family as
    # apsp_nations / pca_loadings / hits collect_bounded): the win
    # matrix is BOUNDED BY SCHEMA — 5 regions at every scale factor, so
    # ≤ 20 rows forever. One job collapses the fact tables to it; the
    # three unrolled MM iterations are then pure arithmetic over ≤ 5
    # strengths, run driver-side in sorted-key order (deterministic; the
    # engine↔oracle agreement after the final 6-dp round is the same FP
    # tolerance class the shuffle-ordered distributed sums relied on —
    # oracle re-verified at sf0.01 and sf0.1), re-entering the plan as
    # ONE SQL VALUES literal. Replaces 3 checkpointed 5-row shuffle
    # rounds (~45 jobs of pure scheduling overhead measured) with one
    # collect of a schema-bounded matrix. A >2048-row matrix (impossible
    # for regions; defensive for reuse) falls back to the distributed
    # MM loop.
    wins = games.groupBy("wi", "wj").agg(F.count("*").alias("w"))
    rows = wins.collect()
    if len(rows) <= 2048:
        w_ij = {(r["wi"], r["wj"]): int(r["w"]) for r in rows}
        keys = sorted({k[0] for k in w_ij} | {k[1] for k in w_ij})
        n_ij = {
            (i, j): w_ij.get((i, j), 0) + w_ij.get((j, i), 0)
            for i in keys
            for j in keys
            if i != j and (w_ij.get((i, j), 0) + w_ij.get((j, i), 0)) > 0
        }
        tot = {i: sum(w for (a, _), w in w_ij.items() if a == i) for i in keys}
        s_d = {i: 1.0 for i in keys}
        for _ in range(3):
            den = {}
            for i in keys:
                acc = 0.0
                for j in keys:
                    if (i, j) in n_ij:
                        acc += n_ij[(i, j)] / (s_d[i] + s_d[j])
                den[i] = acc
            s_d = {i: tot[i] / den[i] for i in keys if den[i] > 0.0}
        z = 0.0
        for i in sorted(s_d):
            z += s_d[i]
        def esc(x) -> str:
            return str(x).replace("'", "''")
        vals = ", ".join(
            f"('{esc(i)}', CAST('{(s_d[i] / z)!r}' AS DOUBLE))"
            for i in sorted(s_d)
        )
        return spark.sql(
            "SELECT region, ROUND(bt_strength, 6) AS bt_strength "
            f"FROM VALUES {vals} AS t(region, bt_strength)"
        )
    wins = wins.localCheckpoint()
    w1 = wins.select(F.col("wi").alias("i"), F.col("wj").alias("j"), "w")
    w2 = wins.select(
        F.col("wj").alias("i"), F.col("wi").alias("j"), F.col("w").alias("w_op")
    )
    pairs = (
        w1.join(w2, ["i", "j"], "full")
        .select(
            "i", "j",
            F.coalesce("w", F.lit(0)).alias("w_ij"),
            (F.coalesce("w", F.lit(0)) + F.coalesce("w_op", F.lit(0))).alias("n_ij"),
        )
    )
    tot_w = pairs.groupBy("i").agg(F.sum("w_ij").alias("W"))
    s = tot_w.select("i", F.lit(1.0).alias("s"))
    for _ in range(3):
        sj = s.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
        denom = (
            pairs.join(s, "i")
            .join(sj, "j")
            .groupBy("i")
            .agg(F.sum(F.col("n_ij") / (F.col("s") + F.col("s_j"))).alias("den"))
        )
        # checkpoint the 5-row strength vector: s appears TWICE per
        # iteration (s_i and s_j sides), so an un-truncated plan doubles
        # every round (~86 joins by iteration 3 in the plan audit)
        s = (
            tot_w.join(denom, "i")
            .select("i", (F.col("W") / F.col("den")).alias("s"))
            .localCheckpoint()
        )
    norm = s.agg(F.sum("s").alias("z"))
    return (
        s.crossJoin(F.broadcast(norm))
        .select(
            F.col("i").alias("region"),
            F.round(F.col("s") / F.col("z"), 6).alias("bt_strength"),
        )
    )


def q_krippendorff_alpha(spark: SparkSession, sf: str) -> DataFrame:
    """Krippendorff's alpha (nominal, binary, complete ratings) for
    THREE deterministic raters of order 'bigness' (price rule, priority
    rule, line-count rule): α = 1 − D_o/D_e with observed disagreement
    Σ_u c_u(m−c_u) / (n·C(m,2)) and expected disagreement N1·N0/C(M,2)
    from the pooled value counts — integer-exact throughout."""
    li_counts = (
        table(spark, sf, "lineitem")
        .groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.count("*").alias("n_lines"))
    )
    o = (
        table(spark, sf, "orders")
        .join(li_counts, "o_orderkey", "left")
        .select(
            (F.col("o_totalprice") > 150000.0).cast("long").alias("r1"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            .cast("long").alias("r2"),
            (F.coalesce("n_lines", F.lit(0)) >= 4).cast("long").alias("r3"),
        )
        .select((F.col("r1") + F.col("r2") + F.col("r3")).alias("c"))
    )
    agg = o.agg(
        F.count("*").alias("n"),
        F.sum(F.col("c") * (3 - F.col("c"))).alias("dis"),
        F.sum("c").alias("n1"),
    )
    m_tot = F.col("n") * 3
    do = F.col("dis").cast("double") / (F.col("n") * 3.0)  # n * C(3,2)
    de = (
        (F.col("n1") * (m_tot - F.col("n1"))).cast("double")
        / (m_tot * (m_tot - 1) / 2.0)
    )
    return agg.select(
        "n",
        F.round(do, 6).alias("d_observed"),
        F.round(de, 6).alias("d_expected"),
        F.round(1.0 - do / de, 6).alias("alpha"),
    )


def q_horvitz_thompson(spark: SparkSession, sf: str) -> DataFrame:
    """Horvitz–Thompson total estimator under deterministic unequal-
    probability sampling: URGENT orders sampled at π=1/2, the rest at
    π=1/10 (multiplicative-hash membership), estimate Σ y_i/π_i in
    exact cents vs the true total — the unbiased-weighting contract in
    one integer-exact pass."""
    o = table(spark, sf, "orders").select(
        F.floor(F.col("o_totalprice") * 100.0).alias("y_c"),
        (F.col("o_orderpriority") == "1-URGENT").alias("urgent"),
        ((F.col("o_orderkey") * F.lit(2654435761)) % 1000).alias("h"),
    )
    est = F.sum(
        F.when(F.col("urgent") & (F.col("h") < 500), F.col("y_c") * 2)
        .when(~F.col("urgent") & (F.col("h") < 100), F.col("y_c") * 10)
        .otherwise(F.lit(0))
    )
    agg = o.agg(
        est.alias("ht_c"),
        F.sum("y_c").alias("true_c"),
        F.sum(
            F.when(
                (F.col("urgent") & (F.col("h") < 500))
                | (~F.col("urgent") & (F.col("h") < 100)),
                1,
            ).otherwise(0)
        ).alias("n_sampled"),
        F.count("*").alias("n_total"),
    )
    return agg.select(
        "n_sampled", "n_total",
        F.round(F.col("ht_c").cast("double") / 100.0, 2).alias("ht_estimate"),
        F.round(F.col("true_c").cast("double") / 100.0, 2).alias("true_total"),
        F.round(
            (F.col("ht_c") - F.col("true_c")).cast("double")
            / F.col("true_c").cast("double"),
            6,
        ).alias("rel_error"),
    )


def q_haar_energy_monthly(spark: SparkSession, sf: str) -> DataFrame:
    """Unnormalized Haar wavelet detail energies (levels 1–3) of the
    monthly revenue series: at each level, adjacent block sums L,R pair
    up (orphan tails drop) and the detail energy is Σ(L−R)². The month
    index is exact integer arithmetic (year·12+month), block sums are
    exact cents, so every energy is integer-exact; one groupBy per
    level, 84→42→21 rows."""
    m = (
        table(spark, sf, "lineitem")
        .select(
            (
                F.year("l_shipdate") * 12 + (F.month("l_shipdate") - 1)
            ).alias("mi"),
            F.floor(
                F.col("l_extendedprice") * (1.0 - F.col("l_discount")) * 100.0
            ).alias("rev_c"),
        )
        .groupBy("mi")
        .agg(F.sum("rev_c").alias("x"))
    )
    base = m.crossJoin(
        F.broadcast(m.agg(F.min("mi").alias("mi0")))
    ).select((F.col("mi") - F.col("mi0")).alias("idx"), "x")
    rows = []
    cur = base
    for level in (1, 2, 3):
        paired = cur.groupBy((F.col("idx") / 2).cast("long").alias("idx")).agg(
            F.count("*").alias("cnt"),
            F.sum(F.when(F.col("idx") % 2 == 0, F.col("x"))).alias("l"),
            F.sum(F.when(F.col("idx") % 2 == 1, F.col("x"))).alias("r"),
        )
        complete = paired.filter(F.col("cnt") == 2)
        e = complete.agg(
            F.lit(level).alias("level"),
            F.count("*").alias("n_pairs"),
            F.round(
                F.sum(
                    (F.col("l") - F.col("r")).cast("decimal(38,0)")
                    * (F.col("l") - F.col("r"))
                ).cast("double")
                / 1.0e8,
                2,
            ).alias("detail_energy_dollars2"),
        )
        rows.append(e)
        cur = complete.select("idx", (F.col("l") + F.col("r")).alias("x"))
    out = rows[0]
    for e in rows[1:]:
        out = out.unionByName(e)
    return out


def q_overdispersion_daily(spark: SparkSession, sf: str) -> DataFrame:
    """Poisson overdispersion check on daily order counts: dispersion
    index var/mean from exact integer moments, plus the normal-approx
    z = (D−1)·√((n−1)/2). A single date-bounded aggregate — the
    day-count table is sf-independent."""
    d = (
        table(spark, sf, "orders")
        .groupBy(F.date_trunc("DAY", "o_orderdate").alias("day"))
        .agg(F.count("*").alias("c"))
    )
    agg = d.agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s1"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    disp = var / mean
    return agg.select(
        "n",
        F.round(mean, 6).alias("mean_daily"),
        F.round(disp, 6).alias("dispersion"),
        F.round(
            (disp - 1.0) * F.sqrt((F.col("n") - 1.0) / 2.0), 6
        ).alias("z_stat"),
    )


_SEQ_RULE_WINDOW_S = 1800
#: relative support floor — 0.2% of the event count (absolute floor 5):
#: an absolute threshold either empties the small-sf answer or stops
#: pruning at 10x the events
_SEQ_RULE_MIN_FRAC = 0.002


def q_seq_rule_mining(spark: SparkSession, sf: str) -> DataFrame:
    """Sequential association rules A→B over the event stream: support
    counts ordered event pairs of the same user within a 30-minute
    window (a per-user range join — pair volume bounded by per-user
    event density × window, never |E|²), confidence = support /
    antecedent occurrences, lift against the consequent's base rate.
    Integer-exact; rules below the support floor prune out."""
    e = table(spark, sf, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    a, b = e.alias("a"), e.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            # microsecond-exact window test: events carry sub-second
            # parts, and DuckDB's DATE_DIFF('second') counts BOUNDARY
            # crossings while Spark's timestampdiff truncates — at
            # microsecond granularity (the data's resolution) both are
            # the exact difference
            & (
                F.expr("timestampdiff(MICROSECOND, a.ts, b.ts)")
                <= _SEQ_RULE_WINDOW_S * 1000000
            ),
        )
        .groupBy(
            F.col("a.event_type").alias("antecedent"),
            F.col("b.event_type").alias("consequent"),
        )
        .agg(F.count("*").alias("support"))
    )
    totals = e.groupBy(F.col("event_type").alias("antecedent")).agg(
        F.count("*").alias("n_a")
    )
    g = e.agg(F.count("*").alias("n_all"))
    pairs = pairs.crossJoin(F.broadcast(g.select(
        F.greatest(F.lit(5.0), F.col("n_all") * _SEQ_RULE_MIN_FRAC).alias("minsup")
    ))).filter(F.col("support") >= F.col("minsup")).drop("minsup")
    cons = e.groupBy(F.col("event_type").alias("consequent")).agg(
        F.count("*").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(totals), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .crossJoin(F.broadcast(g))
        .select(
            "antecedent", "consequent", "support",
            F.round(F.col("support").cast("double") / F.col("n_a"), 6)
            .alias("confidence"),
            F.round(
                F.col("support").cast("double")
                / F.col("n_a")
                / (F.col("n_b").cast("double") / F.col("n_all")),
                6,
            ).alias("lift"),
        )
    )


def q_conformal_coverage(spark: SparkSession, sf: str) -> DataFrame:
    """Split-conformal prediction interval + its empirical test
    coverage: calibration/test split by hash parity, predictor = the
    calibration per-priority mean (exact ratio), nonconformity =
    |y−ŷ| bucketed to whole dollars at $100 granularity, conformal
    quantile = the smallest bucket whose cumulative count reaches
    ⌈0.9(n+1)⌉ (a conditional self-join over ≤ a few thousand distinct
    buckets — never an order statistic over raw rows), coverage = the
    fraction of test orders inside the CONSERVATIVE bucket upper edge.
    Integer-exact end to end."""
    o = table(spark, sf, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100.0).alias("y_c"),
        (((F.col("o_orderkey") * F.lit(2654435761)) % 1000) < 500).alias(
            "is_cal"
        ),
    )
    pred = (
        o.filter("is_cal")
        .groupBy("o_orderpriority")
        .agg(F.sum("y_c").alias("sy"), F.count("*").alias("ny"))
        .select(
            "o_orderpriority",
            (F.col("sy").cast("double") / F.col("ny")).alias("yhat_c"),
        )
    )
    scored = o.join(F.broadcast(pred), "o_orderpriority").select(
        "is_cal",
        F.floor(F.abs(F.col("y_c") - F.col("yhat_c")) / 10000.0).alias("bkt"),
    )
    cal = scored.filter("is_cal").groupBy("bkt").agg(F.count("*").alias("c"))
    ncal = cal.agg(F.sum("c").alias("n_cal"))
    x, y = cal.alias("x"), cal.alias("y")
    cum = (
        x.join(y, F.col("y.bkt") <= F.col("x.bkt"))
        .groupBy(F.col("x.bkt").alias("bkt"))
        .agg(F.sum("y.c").alias("cum"))
        .crossJoin(F.broadcast(ncal))
        .filter(F.col("cum") >= F.ceil((F.col("n_cal") + 1) * 0.9))
    )
    qb = cum.agg(F.min("bkt").alias("q_bucket"))
    test = scored.filter(~F.col("is_cal"))
    return (
        test.crossJoin(F.broadcast(qb))
        .agg(
            F.first("q_bucket").alias("q_bucket"),
            F.round(F.first("q_bucket") * 100.0 + 100.0, 2).alias(
                "interval_halfwidth_dollars"
            ),
            F.count("*").alias("n_test"),
            F.round(
                F.sum((F.col("bkt") <= F.col("q_bucket")).cast("int"))
                / F.count("*").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


def q_shapley_linear(spark: SparkSession, sf: str) -> DataFrame:
    """Exact Shapley attributions for a closed-form 2-feature OLS of
    extended price on (quantity, discount): for a linear model the
    Shapley value of feature j on a row is β_j(x_j − μ_j). β comes
    from the normal equations over EXACT decimal moments; per-row
    |φ_j| is quantized to DECIMAL before the global mean so the
    report is aggregation-order-independent."""
    li = table(spark, sf, "lineitem").select(
        F.col("l_quantity").cast("decimal(18,2)").alias("x1"),
        F.col("l_discount").cast("decimal(18,2)").alias("x2"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("y"),
    )
    mo = li.agg(
        F.count("*").alias("n"),
        F.sum("x1").alias("s1"), F.sum("x2").alias("s2"), F.sum("y").alias("sy"),
        F.sum(F.col("x1").cast("decimal(38,4)") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1").cast("decimal(38,4)") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2").cast("decimal(38,4)") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1").cast("decimal(38,4)") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2").cast("decimal(38,4)") * F.col("y")).alias("s2y"),
    )
    n = F.col("n").cast("double")
    c11 = F.col("s11").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double") / n
    c12 = F.col("s12").cast("double") - F.col("s1").cast("double") * F.col("s2").cast("double") / n
    c22 = F.col("s22").cast("double") - F.col("s2").cast("double") * F.col("s2").cast("double") / n
    c1y = F.col("s1y").cast("double") - F.col("s1").cast("double") * F.col("sy").cast("double") / n
    c2y = F.col("s2y").cast("double") - F.col("s2").cast("double") * F.col("sy").cast("double") / n
    det = c11 * c22 - c12 * c12
    betas = mo.select(
        ((c1y * c22 - c2y * c12) / det).alias("b1"),
        ((c2y * c11 - c1y * c12) / det).alias("b2"),
        (F.col("s1").cast("double") / n).alias("mu1"),
        (F.col("s2").cast("double") / n).alias("mu2"),
    )
    j = li.crossJoin(F.broadcast(betas))
    phi1 = F.abs(F.col("b1") * (F.col("x1").cast("double") - F.col("mu1")))
    phi2 = F.abs(F.col("b2") * (F.col("x2").cast("double") - F.col("mu2")))
    return j.agg(
        F.round(F.first("b1"), 6).alias("beta_quantity"),
        F.round(F.first("b2"), 6).alias("beta_discount"),
        F.round(
            F.sum(phi1.cast("decimal(28,10)")).cast("double") / F.count("*"),
            4,
        ).alias("mean_abs_shap_quantity"),
        F.round(
            F.sum(phi2.cast("decimal(28,10)")).cast("double") / F.count("*"),
            4,
        ).alias("mean_abs_shap_discount"),
    )


def q_mmd_poly(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample MMD² with the degree-2 polynomial kernel
    k(x,y) = (1 + xy/c)² between URGENT and non-urgent order values.
    The polynomial kernel decomposes into MOMENTS — E[k] over a pair of
    independent samples is a function of (μ, m₂) of each side — so the
    V-statistic MMD² costs ONE aggregate pass, not O(n²) pair work:
    the kernel trick at 100 TB. Moments ride exact cents."""
    c = 1.0e10  # ~ (price scale)², keeps kernel values O(1)
    o = table(spark, sf, "orders").select(
        F.floor(F.col("o_totalprice") * 100.0).alias("y_c"),
        (F.col("o_orderpriority") == "1-URGENT").alias("g"),
    )
    agg = o.agg(
        F.sum(F.when(F.col("g"), F.col("y_c"))).alias("sx"),
        F.sum(F.when(F.col("g"), F.col("y_c").cast("decimal(38,0)") * F.col("y_c"))).alias("qx"),
        F.sum(F.when(F.col("g"), 1)).alias("nx"),
        F.sum(F.when(~F.col("g"), F.col("y_c"))).alias("sy"),
        F.sum(F.when(~F.col("g"), F.col("y_c").cast("decimal(38,0)") * F.col("y_c"))).alias("qy"),
        F.sum(F.when(~F.col("g"), 1)).alias("ny"),
    )
    mux = F.col("sx").cast("double") / F.col("nx") / 100.0
    m2x = F.col("qx").cast("double") / F.col("nx") / 10000.0
    muy = F.col("sy").cast("double") / F.col("ny") / 100.0
    m2y = F.col("qy").cast("double") / F.col("ny") / 10000.0
    kxx = 1.0 + 2.0 * mux * mux / c + m2x * m2x / (c * c)
    kyy = 1.0 + 2.0 * muy * muy / c + m2y * m2y / (c * c)
    kxy = 1.0 + 2.0 * mux * muy / c + m2x * m2y / (c * c)
    return agg.select(
        F.col("nx").alias("n_urgent"),
        F.col("ny").alias("n_rest"),
        F.round(F.lit(1.0e6) * (kxx + kyy - 2.0 * kxy), 6).alias("mmd2_x1e6"),
    )


ORACLES.update({
    "changepoint_binary_seg": """
        WITH d AS (
            SELECT DATE_TRUNC('day', l_shipdate) AS day,
                   SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                  * 100.0) AS BIGINT)) AS x
            FROM lineitem GROUP BY 1
        ),
        tot AS (
            SELECT COUNT(*) AS n, SUM(x) AS s,
                   SUM(CAST(x AS DECIMAL(38,0)) * x) AS q
            FROM d
        ),
        pre AS (
            SELECT a.day, COUNT(*) AS nl, SUM(b.x) AS sl,
                   SUM(CAST(b.x AS DECIMAL(38,0)) * b.x) AS ql
            FROM d a JOIN d b ON b.day <= a.day
            GROUP BY a.day
        ),
        scored AS (
            SELECT day,
                   (CAST(ql AS DOUBLE)
                    - CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / nl)
                   + (CAST(q - ql AS DOUBLE)
                      - CAST(s - sl AS DOUBLE) * CAST(s - sl AS DOUBLE)
                        / (n - nl)) AS sse,
                   (CAST(q AS DOUBLE)
                    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) AS sse_all
            FROM pre CROSS JOIN tot
            WHERE nl >= 5 AND n - nl >= 5
        )
        SELECT day AS split_day,
               ROUND(sse / 1.0e8, 4) AS sse_dollars2,
               ROUND((sse_all - sse) / 1.0e8, 4) AS gain_dollars2
        FROM scored ORDER BY sse, split_day LIMIT 1
    """,
    "bradley_terry_regions": """
        WITH rev AS (
            SELECT DATE_TRUNC('month', o.o_orderdate) AS month,
                   n.n_regionkey AS region,
                   CAST(FLOOR(SUM(o.o_totalprice * 100.0)) AS BIGINT) AS rev_c
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        games AS (
            SELECT a.region AS wi, b.region AS wj
            FROM rev a JOIN rev b
              ON a.month = b.month AND a.region <> b.region
            WHERE a.rev_c > b.rev_c
        ),
        wins AS (SELECT wi, wj, COUNT(*) AS w FROM games GROUP BY 1, 2),
        pairs AS (
            SELECT COALESCE(w1.wi, w2.wj) AS i, COALESCE(w1.wj, w2.wi) AS j,
                   COALESCE(w1.w, 0) AS w_ij,
                   COALESCE(w1.w, 0) + COALESCE(w2.w, 0) AS n_ij
            FROM wins w1
            FULL JOIN wins w2 ON w1.wi = w2.wj AND w1.wj = w2.wi
        ),
        tot_w AS (SELECT i, SUM(w_ij) AS W FROM pairs GROUP BY i),
        s0 AS (SELECT i, 1.0 AS s FROM tot_w),
        s1 AS (
            SELECT t.i, t.W / d.den AS s
            FROM tot_w t JOIN (
                SELECT p.i, SUM(p.n_ij / (si.s + sj.s)) AS den
                FROM pairs p
                JOIN s0 si ON p.i = si.i
                JOIN s0 sj ON p.j = sj.i
                GROUP BY p.i
            ) d ON t.i = d.i
        ),
        s2 AS (
            SELECT t.i, t.W / d.den AS s
            FROM tot_w t JOIN (
                SELECT p.i, SUM(p.n_ij / (si.s + sj.s)) AS den
                FROM pairs p
                JOIN s1 si ON p.i = si.i
                JOIN s1 sj ON p.j = sj.i
                GROUP BY p.i
            ) d ON t.i = d.i
        ),
        s3 AS (
            SELECT t.i, t.W / d.den AS s
            FROM tot_w t JOIN (
                SELECT p.i, SUM(p.n_ij / (si.s + sj.s)) AS den
                FROM pairs p
                JOIN s2 si ON p.i = si.i
                JOIN s2 sj ON p.j = sj.i
                GROUP BY p.i
            ) d ON t.i = d.i
        ),
        z AS (SELECT SUM(s) AS z FROM s3)
        SELECT i AS region, ROUND(s / z, 6) AS bt_strength
        FROM s3 CROSS JOIN z
    """,
    "krippendorff_alpha": """
        WITH lc AS (
            SELECT l_orderkey AS o_orderkey, COUNT(*) AS n_lines
            FROM lineitem GROUP BY 1
        ),
        r AS (
            SELECT (CASE WHEN o.o_totalprice > 150000.0 THEN 1 ELSE 0 END
                    + CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END
                    + CASE WHEN COALESCE(lc.n_lines, 0) >= 4
                           THEN 1 ELSE 0 END) AS c
            FROM orders o LEFT JOIN lc USING (o_orderkey)
        ),
        agg AS (
            SELECT COUNT(*) AS n,
                   CAST(SUM(c * (3 - c)) AS BIGINT) AS dis,
                   CAST(SUM(c) AS BIGINT) AS n1
            FROM r
        )
        SELECT n,
               ROUND(CAST(dis AS DOUBLE) / (n * 3.0), 6) AS d_observed,
               ROUND(CAST(n1 * (n * 3 - n1) AS DOUBLE)
                     / (CAST(n AS BIGINT) * 3 * (CAST(n AS BIGINT) * 3 - 1)
                        / 2.0), 6) AS d_expected,
               ROUND(1.0 - (CAST(dis AS DOUBLE) / (n * 3.0))
                     / (CAST(n1 * (n * 3 - n1) AS DOUBLE)
                        / (CAST(n AS BIGINT) * 3
                           * (CAST(n AS BIGINT) * 3 - 1) / 2.0)), 6) AS alpha
        FROM agg
    """,
    "horvitz_thompson": """
        WITH o AS (
            SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS y_c,
                   o_orderpriority = '1-URGENT' AS urgent,
                   (o_orderkey * 2654435761) % 1000 AS h
            FROM orders
        ),
        agg AS (
            SELECT
                CAST(SUM(CASE WHEN urgent AND h < 500 THEN y_c * 2
                              WHEN NOT urgent AND h < 100 THEN y_c * 10
                              ELSE 0 END) AS BIGINT) AS ht_c,
                CAST(SUM(y_c) AS BIGINT) AS true_c,
                CAST(SUM(CASE WHEN (urgent AND h < 500)
                              OR (NOT urgent AND h < 100)
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
                COUNT(*) AS n_total
            FROM o
        )
        SELECT n_sampled, n_total,
               ROUND(CAST(ht_c AS DOUBLE) / 100.0, 2) AS ht_estimate,
               ROUND(CAST(true_c AS DOUBLE) / 100.0, 2) AS true_total,
               ROUND(CAST(ht_c - true_c AS DOUBLE)
                     / CAST(true_c AS DOUBLE), 6) AS rel_error
        FROM agg
    """,
    "haar_energy_monthly": """
        WITH m AS (
            SELECT EXTRACT(year FROM l_shipdate) * 12
                   + (EXTRACT(month FROM l_shipdate) - 1) AS mi,
                   SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount)
                                  * 100.0) AS BIGINT)) AS x
            FROM lineitem GROUP BY 1
        ),
        base AS (
            SELECT CAST(mi - (SELECT MIN(mi) FROM m) AS BIGINT) AS idx, x
            FROM m
        ),
        p1 AS (
            SELECT idx // 2 AS idx, COUNT(*) AS cnt,
                   SUM(CASE WHEN idx % 2 = 0 THEN x END) AS l,
                   SUM(CASE WHEN idx % 2 = 1 THEN x END) AS r
            FROM base GROUP BY idx // 2
        ),
        c1 AS (SELECT * FROM p1 WHERE cnt = 2),
        e1 AS (
            SELECT 1 AS level, COUNT(*) AS n_pairs,
                   ROUND(CAST(SUM(CAST(l - r AS DECIMAL(38,0)) * (l - r))
                              AS DOUBLE) / 1.0e8, 2) AS detail_energy_dollars2
            FROM c1
        ),
        b2 AS (SELECT idx, l + r AS x FROM c1),
        p2 AS (
            SELECT idx // 2 AS idx, COUNT(*) AS cnt,
                   SUM(CASE WHEN idx % 2 = 0 THEN x END) AS l,
                   SUM(CASE WHEN idx % 2 = 1 THEN x END) AS r
            FROM b2 GROUP BY idx // 2
        ),
        c2 AS (SELECT * FROM p2 WHERE cnt = 2),
        e2 AS (
            SELECT 2 AS level, COUNT(*) AS n_pairs,
                   ROUND(CAST(SUM(CAST(l - r AS DECIMAL(38,0)) * (l - r))
                              AS DOUBLE) / 1.0e8, 2) AS detail_energy_dollars2
            FROM c2
        ),
        b3 AS (SELECT idx, l + r AS x FROM c2),
        p3 AS (
            SELECT idx // 2 AS idx, COUNT(*) AS cnt,
                   SUM(CASE WHEN idx % 2 = 0 THEN x END) AS l,
                   SUM(CASE WHEN idx % 2 = 1 THEN x END) AS r
            FROM b3 GROUP BY idx // 2
        ),
        c3 AS (SELECT * FROM p3 WHERE cnt = 2),
        e3 AS (
            SELECT 3 AS level, COUNT(*) AS n_pairs,
                   ROUND(CAST(SUM(CAST(l - r AS DECIMAL(38,0)) * (l - r))
                              AS DOUBLE) / 1.0e8, 2) AS detail_energy_dollars2
            FROM c3
        )
        SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
    """,
    "overdispersion_daily": """
        WITH d AS (
            SELECT DATE_TRUNC('day', o_orderdate) AS day, COUNT(*) AS c
            FROM orders GROUP BY 1
        ),
        agg AS (
            SELECT COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s1,
                   CAST(SUM(c * c) AS BIGINT) AS s2
            FROM d
        )
        SELECT n,
               ROUND(CAST(s1 AS DOUBLE) / n, 6) AS mean_daily,
               ROUND((CAST(s2 AS DOUBLE) / n
                      - POWER(CAST(s1 AS DOUBLE) / n, 2))
                     / (CAST(s1 AS DOUBLE) / n), 6) AS dispersion,
               ROUND(((CAST(s2 AS DOUBLE) / n
                       - POWER(CAST(s1 AS DOUBLE) / n, 2))
                      / (CAST(s1 AS DOUBLE) / n) - 1.0)
                     * SQRT((n - 1.0) / 2.0), 6) AS z_stat
        FROM agg
    """,
    "seq_rule_mining": """
        WITH pairs AS (
            SELECT a.event_type AS antecedent, b.event_type AS consequent,
                   COUNT(*) AS support
            FROM events a JOIN events b
              ON a.user_id = b.user_id AND b.ts > a.ts
             AND DATE_DIFF('microsecond', a.ts, b.ts) <= 1800000000
            GROUP BY 1, 2
            HAVING COUNT(*) >= GREATEST(
                5.0, (SELECT COUNT(*) FROM events) * 0.002)
        ),
        totals AS (
            SELECT event_type AS antecedent, COUNT(*) AS n_a
            FROM events GROUP BY 1
        ),
        cons AS (
            SELECT event_type AS consequent, COUNT(*) AS n_b
            FROM events GROUP BY 1
        ),
        g AS (SELECT COUNT(*) AS n_all FROM events)
        SELECT p.antecedent, p.consequent, p.support,
               ROUND(CAST(p.support AS DOUBLE) / t.n_a, 6) AS confidence,
               ROUND(CAST(p.support AS DOUBLE) / t.n_a
                     / (CAST(c.n_b AS DOUBLE) / g.n_all), 6) AS lift
        FROM pairs p
        JOIN totals t USING (antecedent)
        JOIN cons c USING (consequent)
        CROSS JOIN g
    """,
    "conformal_coverage": """
        WITH o AS (
            SELECT o_orderpriority,
                   CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS y_c,
                   ((o_orderkey * 2654435761) % 1000) < 500 AS is_cal
            FROM orders
        ),
        pred AS (
            SELECT o_orderpriority,
                   CAST(SUM(y_c) AS DOUBLE) / COUNT(*) AS yhat_c
            FROM o WHERE is_cal GROUP BY 1
        ),
        scored AS (
            SELECT o.is_cal,
                   CAST(FLOOR(ABS(o.y_c - p.yhat_c) / 10000.0) AS BIGINT)
                       AS bkt
            FROM o JOIN pred p USING (o_orderpriority)
        ),
        cal AS (
            SELECT bkt, COUNT(*) AS c FROM scored WHERE is_cal GROUP BY bkt
        ),
        ncal AS (SELECT SUM(c) AS n_cal FROM cal),
        cum AS (
            SELECT x.bkt, SUM(y.c) AS cum
            FROM cal x JOIN cal y ON y.bkt <= x.bkt
            GROUP BY x.bkt
        ),
        qb AS (
            SELECT MIN(bkt) AS q_bucket
            FROM cum CROSS JOIN ncal
            WHERE cum >= CEIL((n_cal + 1) * 0.9)
        )
        SELECT FIRST(q_bucket) AS q_bucket,
               ROUND(FIRST(q_bucket) * 100.0 + 100.0, 2)
                   AS interval_halfwidth_dollars,
               COUNT(*) AS n_test,
               ROUND(SUM(CASE WHEN bkt <= q_bucket THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
        FROM scored CROSS JOIN qb WHERE NOT is_cal
    """,
    "shapley_linear": """
        WITH li AS (
            SELECT CAST(l_quantity AS DECIMAL(18,2)) AS x1,
                   CAST(l_discount AS DECIMAL(18,2)) AS x2,
                   CAST(l_extendedprice AS DECIMAL(18,2)) AS y
            FROM lineitem
        ),
        mo AS (
            SELECT COUNT(*) AS n,
                   SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
                   SUM(CAST(x1 AS DECIMAL(38,4)) * x1) AS s11,
                   SUM(CAST(x1 AS DECIMAL(38,4)) * x2) AS s12,
                   SUM(CAST(x2 AS DECIMAL(38,4)) * x2) AS s22,
                   SUM(CAST(x1 AS DECIMAL(38,4)) * y) AS s1y,
                   SUM(CAST(x2 AS DECIMAL(38,4)) * y) AS s2y
            FROM li
        ),
        b AS (
            SELECT
                ((CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                 * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
                 - (CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                 * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n))
                / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                   * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
                   - POWER(CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n, 2))
                    AS b1,
                ((CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                 * (CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                 - (CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) / n)
                 * (CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n))
                / ((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                   * (CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)
                   - POWER(CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n, 2))
                    AS b2,
                CAST(s1 AS DOUBLE) / n AS mu1,
                CAST(s2 AS DOUBLE) / n AS mu2
            FROM mo
        )
        SELECT ROUND(FIRST(b1), 6) AS beta_quantity,
               ROUND(FIRST(b2), 6) AS beta_discount,
               ROUND(CAST(SUM(CAST(ABS(b1 * (CAST(x1 AS DOUBLE) - mu1))
                                   AS DECIMAL(28,10))) AS DOUBLE)
                     / COUNT(*), 4) AS mean_abs_shap_quantity,
               ROUND(CAST(SUM(CAST(ABS(b2 * (CAST(x2 AS DOUBLE) - mu2))
                                   AS DECIMAL(28,10))) AS DOUBLE)
                     / COUNT(*), 4) AS mean_abs_shap_discount
        FROM li CROSS JOIN b
    """,
    "mmd_poly": """
        WITH o AS (
            SELECT CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS y_c,
                   o_orderpriority = '1-URGENT' AS g
            FROM orders
        ),
        agg AS (
            SELECT
                CAST(SUM(CASE WHEN g THEN y_c END) AS BIGINT) AS sx,
                SUM(CASE WHEN g THEN CAST(y_c AS DECIMAL(38,0)) * y_c END) AS qx,
                CAST(SUM(CASE WHEN g THEN 1 END) AS BIGINT) AS nx,
                CAST(SUM(CASE WHEN NOT g THEN y_c END) AS BIGINT) AS sy,
                SUM(CASE WHEN NOT g THEN CAST(y_c AS DECIMAL(38,0)) * y_c END) AS qy,
                CAST(SUM(CASE WHEN NOT g THEN 1 END) AS BIGINT) AS ny
            FROM o
        ),
        k AS (
            SELECT nx, ny,
                   CAST(sx AS DOUBLE) / nx / 100.0 AS mux,
                   CAST(qx AS DOUBLE) / nx / 10000.0 AS m2x,
                   CAST(sy AS DOUBLE) / ny / 100.0 AS muy,
                   CAST(qy AS DOUBLE) / ny / 10000.0 AS m2y
            FROM agg
        )
        SELECT nx AS n_urgent, ny AS n_rest,
               ROUND(1.0e6 * (
                   (1.0 + 2.0 * mux * mux / 1.0e10
                        + m2x * m2x / (1.0e10 * 1.0e10))
                 + (1.0 + 2.0 * muy * muy / 1.0e10
                        + m2y * m2y / (1.0e10 * 1.0e10))
                 - 2.0 * (1.0 + 2.0 * mux * muy / 1.0e10
                              + m2x * m2y / (1.0e10 * 1.0e10))
               ), 6) AS mmd2_x1e6
        FROM k
    """,
})

QUERIES.update({
    "changepoint_binary_seg": q_changepoint_binary_seg,
    "bradley_terry_regions": q_bradley_terry_regions,
    "krippendorff_alpha": q_krippendorff_alpha,
    "horvitz_thompson": q_horvitz_thompson,
    "haar_energy_monthly": q_haar_energy_monthly,
    "overdispersion_daily": q_overdispersion_daily,
    "seq_rule_mining": q_seq_rule_mining,
    "conformal_coverage": q_conformal_coverage,
    "shapley_linear": q_shapley_linear,
    "mmd_poly": q_mmd_poly,
})
