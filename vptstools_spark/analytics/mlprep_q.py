"""ML feature-prep / resampling queries: deterministic hash-Poisson
bootstrap confidence intervals, leave-one-out target encoding, per-group
OLS with residual-outlier counts, inter-source token-distribution KL
divergence, and a Zipf-law fit of the corpus vocabulary.

Determinism contract: anything "random" derives from md5 of row keys (the
repo-wide no-RNG rule — repartition-stable, engine-reproducible), and every
regression/divergence closed form is computed from the same aggregate
moments on both engines.

Scale notes: bootstrap explodes B=32 replicate ids per row but aggregates
map-side (each partition emits <=B partial rows); encodings/regressions are
one fact aggregate + one broadcast join back; KL and Zipf operate on the
vocabulary aggregate, never the corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vptstools_spark.io import table

#: number of bootstrap replicates
N_BOOT = 32

#: cumulative Poisson(1) thresholds for the inverse-CDF lookup: a hash
#: uniform below threshold k gets weight k. Written as exact double
#: literals so both engines compare against bit-identical constants.
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)


def _poisson_weight(u):
    """Inverse-CDF Poisson(1) draw from a uniform column (0..6)."""
    w = F.lit(6)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    return w


def _pois_case_sql(u: str) -> str:
    lines = [
        f"WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_POIS_CDF)
    ]
    return "CASE " + " ".join(lines) + " ELSE 6 END"


def q_bootstrap_ci_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """95% bootstrap confidence interval for the mean order total, by the
    Poisson(1) multiplier approximation of multinomial resampling
    (Chamandy et al., "Estimating Uncertainty for Massive Data Streams"):
    each (row, replicate) weight is an inverse-CDF Poisson draw from
    md5(orderkey, b) — deterministic, repartition-stable, no RNG. One
    scan explodes B=32 replicate ids; partial aggregation collapses each
    partition to <=B rows before the single shuffle, so the resampling
    never rewrites the data. The replicate means reduce to a percentile
    CI on a 32-row aggregate."""
    o = table(spark, sf, "orders")
    rows = o.select(
        F.col("o_orderkey"),
        F.col("o_totalprice").alias("x"),
        F.explode(F.sequence(F.lit(1), F.lit(N_BOOT))).alias("b"),
    )
    h = F.md5(
        F.concat(
            F.col("o_orderkey").cast("string"),
            F.lit("_"),
            F.col("b").cast("string"),
        )
    )
    u = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") / F.lit(65536.0)
    w = _poisson_weight(u).cast("double")
    reps = (
        rows.withColumn("w", w)
        .groupBy("b")
        .agg((F.sum(F.col("w") * F.col("x")) / F.sum("w")).alias("mean_b"))
    )
    point = o.agg(F.avg("o_totalprice").alias("mean"))
    ci = reps.agg(
        F.percentile("mean_b", F.lit(0.025)).alias("lo"),
        F.percentile("mean_b", F.lit(0.975)).alias("hi"),
        F.count("*").alias("n_resamples"),
    )
    return ci.crossJoin(F.broadcast(point)).select(
        "n_resamples",
        F.round("mean", 4).alias("mean"),
        F.round("lo", 4).alias("lo_95"),
        F.round("hi", 4).alias("hi_95"),
    )


_BOOT_ORACLE = f"""
    WITH rows AS (
        SELECT o_orderkey, o_totalprice AS x, b
        FROM orders, UNNEST(GENERATE_SERIES(1, {N_BOOT})) AS t(b)
    ),
    u AS (
        SELECT x, b,
               (
                 (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR) || '_'
                                   || CAST(b AS VARCHAR)), 1, 1)) - 1)
                     * 4096
               + (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR) || '_'
                                   || CAST(b AS VARCHAR)), 2, 1)) - 1)
                     * 256
               + (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR) || '_'
                                   || CAST(b AS VARCHAR)), 3, 1)) - 1)
                     * 16
               + (instr('0123456789abcdef',
                        substr(md5(CAST(o_orderkey AS VARCHAR) || '_'
                                   || CAST(b AS VARCHAR)), 4, 1)) - 1)
               ) / 65536.0 AS u
        FROM rows
    ),
    reps AS (
        SELECT b,
               SUM(CAST({_pois_case_sql('u')} AS DOUBLE) * x)
                   / SUM(CAST({_pois_case_sql('u')} AS DOUBLE)) AS mean_b
        FROM u GROUP BY b
    )
    SELECT
        (SELECT COUNT(*) FROM reps) AS n_resamples,
        ROUND((SELECT AVG(o_totalprice) FROM orders), 4) AS mean,
        ROUND(QUANTILE_CONT(mean_b, 0.025), 4) AS lo_95,
        ROUND(QUANTILE_CONT(mean_b, 0.975), 4) AS hi_95
    FROM reps
"""


def q_target_encoding(spark: SparkSession, sf: str) -> DataFrame:
    """Leave-one-out target encoding of order priority against order
    total — the feature-engineering staple whose naive form leaks the
    label: enc_i = (S_c - x_i) / (n_c - 1). One category aggregate
    broadcasts back onto the fact rows; the per-row encodings re-fold to
    a per-category audit (mean/min/max) so the result is verifiable
    without shipping the fact table."""
    o = table(spark, sf, "orders")
    cat = o.groupBy("o_orderpriority").agg(
        F.sum("o_totalprice").alias("s"), F.count("*").alias("n")
    )
    enc = (
        o.join(F.broadcast(cat), "o_orderpriority")
        .withColumn(
            "enc",
            (F.col("s") - F.col("o_totalprice")) / (F.col("n") - 1),
        )
    )
    return enc.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("enc"), 4).alias("enc_mean"),
        F.round(F.min("enc"), 4).alias("enc_min"),
        F.round(F.max("enc"), 4).alias("enc_max"),
    )


_TARGET_ENC_ORACLE = """
    WITH cat AS (
        SELECT o_orderpriority, SUM(o_totalprice) AS s, COUNT(*) AS n
        FROM orders GROUP BY 1
    ),
    enc AS (
        SELECT o.o_orderpriority,
               (c.s - o.o_totalprice) / (c.n - 1) AS enc
        FROM orders o JOIN cat c USING (o_orderpriority)
    )
    SELECT o_orderpriority AS priority,
           COUNT(*) AS n,
           ROUND(AVG(enc), 4) AS enc_mean,
           ROUND(MIN(enc), 4) AS enc_min,
           ROUND(MAX(enc), 4) AS enc_max
    FROM enc GROUP BY 1
"""


def q_regr_residual_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-brand OLS of extended price on quantity with residual-outlier
    counts: slope/intercept/r2 from one covariance aggregate (the
    closed-form moments, identical on both engines — not the engine's
    regr_* built-ins, whose internal FP order may differ), residual
    sigma from sigma_y*sqrt(1-r2) (no second moment pass), outliers =
    rows with |residual| > 2 sigma counted under a broadcast join of the
    25-row stats table back onto the fact."""
    li = table(spark, sf, "lineitem")
    p = table(spark, sf, "part").select("p_partkey", "p_brand")
    rows = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_brand",
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )
    stats = rows.groupBy("p_brand").agg(
        F.covar_pop("x", "y").alias("cxy"),
        F.var_pop("x").alias("vx"),
        F.var_pop("y").alias("vy"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.count("*").alias("n"),
    )
    stats = stats.select(
        "p_brand",
        "n",
        (F.col("cxy") / F.col("vx")).alias("slope"),
        (F.col("my") - F.col("cxy") / F.col("vx") * F.col("mx")).alias(
            "intercept"
        ),
        (F.col("cxy") * F.col("cxy") / (F.col("vx") * F.col("vy"))).alias(
            "r2"
        ),
        F.sqrt(
            F.col("vy")
            * (1.0 - F.col("cxy") * F.col("cxy") / (F.col("vx") * F.col("vy")))
        ).alias("sigma"),
    )
    out = (
        rows.join(F.broadcast(stats), "p_brand")
        .withColumn(
            "resid",
            F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x")),
        )
        .groupBy("p_brand")
        .agg(
            F.count(
                F.when(F.abs(F.col("resid")) > 2.0 * F.col("sigma"), 1)
            ).alias("n_outliers")
        )
    )
    return stats.join(out, "p_brand").select(
        F.col("p_brand").alias("brand"),
        "n",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 4).alias("intercept"),
        F.round("r2", 6).alias("r2"),
        "n_outliers",
    )


_REGR_ORACLE = """
    WITH rows AS (
        SELECT p_brand, l_quantity AS x, l_extendedprice AS y
        FROM lineitem JOIN part ON l_partkey = p_partkey
    ),
    stats AS (
        SELECT p_brand, COUNT(*) AS n,
               COVAR_POP(x, y) / VAR_POP(x) AS slope,
               AVG(y) - COVAR_POP(x, y) / VAR_POP(x) * AVG(x) AS intercept,
               COVAR_POP(x, y) * COVAR_POP(x, y)
                   / (VAR_POP(x) * VAR_POP(y)) AS r2,
               SQRT(VAR_POP(y) * (1.0 - COVAR_POP(x, y) * COVAR_POP(x, y)
                                  / (VAR_POP(x) * VAR_POP(y)))) AS sigma
        FROM rows GROUP BY 1
    ),
    outliers AS (
        SELECT r.p_brand,
               COUNT(*) FILTER (
                   ABS(r.y - (s.intercept + s.slope * r.x)) > 2.0 * s.sigma
               ) AS n_outliers
        FROM rows r JOIN stats s USING (p_brand)
        GROUP BY 1
    )
    SELECT s.p_brand AS brand, s.n,
           ROUND(s.slope, 6) AS slope,
           ROUND(s.intercept, 4) AS intercept,
           ROUND(s.r2, 6) AS r2,
           o.n_outliers
    FROM stats s JOIN outliers o USING (p_brand)
"""


def q_kl_sources(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram-distribution KL divergence between every pair of document
    sources — the data-mixing diagnostic for LLM corpus curation (which
    sources are interchangeable, which add novelty). Token counts fold
    per (source, word) in one pass; add-one smoothing over the union
    vocabulary keeps KL finite; the pair computation runs on the
    (sources x vocab)-sized aggregate, never the corpus."""
    d = table(spark, sf, "documents")
    words = d.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    counts = (
        words.groupBy("source", "w")
        .agg(F.count("*").alias("c"))
        # dist is consumed TWICE (as P and as Q): checkpoint the
        # vocabulary-sized aggregate so the corpus folds exactly once
        .localCheckpoint(eager=True)
    )
    vocab = counts.select("w").distinct()
    vocab_n = vocab.agg(F.count("*").cast("double").alias("vn"))
    totals = counts.groupBy("source").agg(F.sum("c").alias("tot"))
    # smoothed P(w|source) over the UNION vocabulary: missing words get
    # count 0 and still contribute via the +1 smoothing mass
    srcs = counts.select("source").distinct()
    grid = srcs.crossJoin(vocab)
    dist = (
        grid.join(counts, ["source", "w"], "left")
        .join(F.broadcast(totals), "source")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "source",
            "w",
            (
                (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                / (F.col("tot") + F.col("vn"))
            ).alias("p"),
        )
    )
    p = dist.select(
        F.col("source").alias("src_p"), "w", F.col("p").alias("pp")
    )
    q = dist.select(
        F.col("source").alias("src_q"), "w", F.col("p").alias("pq")
    )
    return (
        p.join(q, "w")
        .filter(F.col("src_p") != F.col("src_q"))
        .groupBy("src_p", "src_q")
        .agg(
            F.round(
                F.sum(F.col("pp") * F.log(F.col("pp") / F.col("pq"))), 6
            ).alias("kl")
        )
    )


_KL_ORACLE = """
    WITH words AS (
        SELECT source, UNNEST(string_split(text, ' ')) AS w
        FROM documents
    ),
    counts AS (
        SELECT source, w, COUNT(*) AS c FROM words GROUP BY 1, 2
    ),
    vocab AS (SELECT DISTINCT w FROM counts),
    vn AS (SELECT COUNT(*) AS n FROM vocab),
    totals AS (SELECT source, SUM(c) AS tot FROM counts GROUP BY 1),
    srcs AS (SELECT DISTINCT source FROM counts),
    dist AS (
        SELECT s.source, v.w,
               (COALESCE(c.c, 0) + 1.0)
                   / (t.tot + (SELECT CAST(n AS DOUBLE) FROM vn)) AS p
        FROM srcs s
        CROSS JOIN vocab v
        LEFT JOIN counts c ON c.source = s.source AND c.w = v.w
        JOIN totals t ON t.source = s.source
    )
    SELECT a.source AS src_p, b.source AS src_q,
           ROUND(SUM(a.p * LN(a.p / b.p)), 6) AS kl
    FROM dist a JOIN dist b ON a.w = b.w AND a.source <> b.source
    GROUP BY 1, 2
"""


def q_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf-law fit of the corpus vocabulary: OLS slope of log(freq) on
    log(rank) over the top-200 terms. The rank window runs AFTER a
    two-phase top-k (TakeOrderedAndProject bounds the input, so the
    global window is over provably <=200 rows); the regression is the
    same closed-form moment arithmetic as `regr_residual_outliers`.
    A healthy natural-language corpus fits slope ~ -1."""
    d = table(spark, sf, "documents")
    top = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(200)
    )
    ranked = top.withColumn(
        "r", F.row_number().over(Window.orderBy(F.col("c").desc(), "w"))
    ).select(F.log("r").alias("x"), F.log("c").alias("y"))
    return ranked.agg(
        F.count("*").alias("n_terms"),
        F.round(F.covar_pop("x", "y") / F.var_pop("x"), 6).alias("slope"),
        F.round(
            F.avg("y") - F.covar_pop("x", "y") / F.var_pop("x") * F.avg("x"),
            6,
        ).alias("intercept"),
        F.round(
            F.covar_pop("x", "y")
            * F.covar_pop("x", "y")
            / (F.var_pop("x") * F.var_pop("y")),
            6,
        ).alias("r2"),
    )


_ZIPF_ORACLE = """
    WITH counts AS (
        SELECT w, COUNT(*) AS c FROM (
            SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
        ) GROUP BY w
    ),
    top AS (
        SELECT w, c FROM counts ORDER BY c DESC, w LIMIT 200
    ),
    ranked AS (
        SELECT LN(ROW_NUMBER() OVER (ORDER BY c DESC, w)) AS x,
               LN(c) AS y
        FROM top
    )
    SELECT COUNT(*) AS n_terms,
           ROUND(COVAR_POP(x, y) / VAR_POP(x), 6) AS slope,
           ROUND(AVG(y) - COVAR_POP(x, y) / VAR_POP(x) * AVG(x), 6)
               AS intercept,
           ROUND(COVAR_POP(x, y) * COVAR_POP(x, y)
                 / (VAR_POP(x) * VAR_POP(y)), 6) AS r2
    FROM ranked
"""


QUERIES = {
    "bootstrap_ci_revenue": q_bootstrap_ci_revenue,
    "target_encoding": q_target_encoding,
    "regr_residual_outliers": q_regr_residual_outliers,
    "kl_sources": q_kl_sources,
    "zipf_fit": q_zipf_fit,
}

ORACLES = {
    "bootstrap_ci_revenue": _BOOT_ORACLE,
    "target_encoding": _TARGET_ENC_ORACLE,
    "regr_residual_outliers": _REGR_ORACLE,
    "kl_sources": _KL_ORACLE,
    "zipf_fit": _ZIPF_ORACLE,
}


def nb_train_score(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Multinomial Naive Bayes trained AND scored in-engine: word-given-
    class log-likelihoods with add-one smoothing over the train
    vocabulary, class log-priors, argmax per test document - the classic
    "train a classifier as a GROUP BY" (no RNG, no driver-side model).
    Returns (<label_col>, pred) per test document.

    Plan shape: training is two aggregates (class totals, (class, word)
    counts); scoring joins test tokens to the per-class likelihood table
    on the word key (AQE broadcasts it at vocabulary scale), sums
    log-scores per (doc, class), and takes the per-doc argmax with a
    rounded score + class-name tie-break so the decision is
    FP-order-independent across engines."""
    train = train.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("lang"),
        F.col(text_col).alias("text"),
    )
    test = test.select(
        F.col(id_col).alias("doc_id"),
        F.col(label_col).alias("lang"),
        F.col(text_col).alias("text"),
    )
    tr_words = train.select(
        "lang", F.explode(F.split("text", " ")).alias("w")
    )
    # r9 (guide §2.2 — scan once, derive from the partial aggregate): the
    # (class, word) count table is the ONLY consumer of the exploded
    # train tokens; class token totals and the vocabulary size are exact
    # algebraic rollups of it (Σc per lang == token count per lang;
    # distinct w == train vocabulary), so the corpus-sized explode runs
    # once instead of three times. wc is vocabulary×classes-sized —
    # lazily checkpointed so its four consumers (cls, vocab_n, the grid
    # join, and the distinct-w spine) share one materialization.
    wc = (
        tr_words.groupBy("lang", "w")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    # r9 (guide §1 — the model scalars are parameter-bounded): class token
    # totals, the vocabulary size, the class priors, and n(train) are
    # ≤ classes rows each, but as in-plan frames every one materialized
    # its own broadcast-exchange job (and the prior/n(train) subtrees each
    # re-scanned the train split). Three bounded collects — two over the
    # CACHED wc, one over train — re-enter them as local relations /
    # literals; every arithmetic expression keeps its exact shape (long
    # column + double literal, long/long division), so the scores are
    # bit-identical.
    import pandas as pd

    spark = train.sparkSession
    cls_rows = sorted(
        (r["lang"], r["tot"])
        for r in wc.groupBy("lang").agg(F.sum("c").alias("tot")).collect()
    )
    vn = float(wc.select("w").distinct().count())
    cls = spark.createDataFrame(
        pd.DataFrame(
            {
                "lang": [l for l, _ in cls_rows],
                "tot": pd.array([t for _, t in cls_rows], dtype="int64"),
            }
        ),
        schema="lang string, tot long",
    )
    # per-class smoothed log-likelihood for every (train-vocab word, class)
    grid = (
        wc.select("w").distinct()
        .crossJoin(cls)
        .join(wc, ["lang", "w"], "left")
        .select(
            "w",
            F.col("lang").alias("cand"),
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                / (F.col("tot") + F.lit(vn))
            ).alias("ll"),
        )
    )
    # unseen-word fallback per class: log(1 / (tot + V))
    fallback = cls.select(
        F.col("lang").alias("cand"),
        F.log(1.0 / (F.col("tot") + F.lit(vn))).alias("ll0"),
    )
    te_words = test.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    )
    scored = (
        te_words.crossJoin(F.broadcast(fallback.select("cand")))
        .join(grid, ["w", "cand"], "left")
        .join(F.broadcast(fallback), "cand")
        .groupBy("doc_id", "lang", "cand")
        .agg(F.sum(F.coalesce(F.col("ll"), F.col("ll0"))).alias("s"))
    )
    prior_rows = sorted(
        (r["lang"], r["n_docs"])
        for r in train.groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .collect()
    )
    n_all = sum(n for _, n in prior_rows)
    logprior = spark.createDataFrame(
        pd.DataFrame(
            {
                "cand": [l for l, _ in prior_rows],
                "n_docs": pd.array([n for _, n in prior_rows], dtype="int64"),
            }
        ),
        schema="cand string, n_docs long",
    ).select(
        "cand",
        F.log(F.col("n_docs") / F.lit(n_all).cast("long")).alias("lp"),
    )
    return (
        scored.join(F.broadcast(logprior), "cand")
        .select(
            "doc_id",
            "lang",
            "cand",
            F.round(F.col("s") + F.col("lp"), 6).alias("score"),
        )
        .groupBy("doc_id", "lang")
        .agg(
            F.max(
                F.struct(F.col("score"), F.col("cand").alias("pred"))
            ).alias("best")
        )
        .select(F.col("lang").alias(label_col), F.col("best.pred").alias("pred"))
    )


def q_nb_langid(spark: SparkSession, sf: str) -> DataFrame:
    """Confusion matrix of the in-engine Naive Bayes (`nb_train_score`)
    on the documents table, deterministic doc_id %% 5 held-out split.
    NOTE: the harness corpus draws text and lang independently, so the
    matrix here verifies the TRAINING/SCORING mechanics (the oracle
    replays every aggregate, smoothing term, and argmax in SQL);
    `tests/test_inference.py::test_nb_separable_corpus` proves accuracy
    on a corpus that actually carries signal."""
    d = table(spark, sf, "documents")
    train = d.filter(F.col("doc_id") % 5 != 0)
    test = d.filter(F.col("doc_id") % 5 == 0)
    pred = nb_train_score(train, test)
    return pred.groupBy("lang", "pred").agg(F.count("*").alias("n_docs"))


_NB_ORACLE = """
    WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
    test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
    tr_words AS (
        SELECT lang, UNNEST(string_split(text, ' ')) AS w FROM train
    ),
    cls AS (SELECT lang, COUNT(*) AS tot FROM tr_words GROUP BY 1),
    prior AS (SELECT lang, COUNT(*) AS n_docs FROM train GROUP BY 1),
    n_train AS (SELECT COUNT(*) AS n_all FROM train),
    vocab AS (SELECT DISTINCT w FROM tr_words),
    vn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS vn FROM vocab),
    wc AS (SELECT lang, w, COUNT(*) AS c FROM tr_words GROUP BY 1, 2),
    grid AS (
        SELECT v.w, c.lang AS cand,
               LN((COALESCE(wc.c, 0) + 1.0)
                  / (c.tot + (SELECT vn FROM vn))) AS ll
        FROM vocab v
        CROSS JOIN cls c
        LEFT JOIN wc ON wc.lang = c.lang AND wc.w = v.w
    ),
    fallback AS (
        SELECT lang AS cand,
               LN(1.0 / (tot + (SELECT vn FROM vn))) AS ll0
        FROM cls
    ),
    te_words AS (
        SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS w
        FROM test
    ),
    scored AS (
        SELECT t.doc_id, t.lang, f.cand,
               SUM(COALESCE(g.ll, f.ll0)) AS s
        FROM te_words t
        CROSS JOIN (SELECT cand, ll0 FROM fallback) f
        LEFT JOIN grid g ON g.w = t.w AND g.cand = f.cand
        GROUP BY 1, 2, 3
    ),
    logprior AS (
        SELECT p.lang AS cand,
               LN(CAST(p.n_docs AS DOUBLE) / (SELECT n_all FROM n_train))
                   AS lp
        FROM prior p
    ),
    pred AS (
        SELECT doc_id, lang, cand,
               ROUND(s + lp, 6) AS score
        FROM scored JOIN logprior USING (cand)
    ),
    best AS (
        SELECT lang, cand AS pred FROM (
            SELECT lang, cand,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, cand DESC) AS rk
            FROM pred
        ) WHERE rk = 1
    )
    SELECT lang, pred, COUNT(*) AS n_docs
    FROM best GROUP BY 1, 2
"""

QUERIES["nb_langid"] = q_nb_langid
ORACLES["nb_langid"] = _NB_ORACLE


#: ALS hyperparameters: 2 latent factors (closed-form 2x2 solves), one
#: U-then-V alternation, L2 regularization
_ALS_LAMBDA = 0.1


def _als_solve(joined: DataFrame, key: str, f1: str, f2: str) -> DataFrame:
    """One ALS half-step: per `key`, solve the regularized 2x2 normal
    equations (A + lambda*I) x = b in closed form from one aggregate.
    Factors are rounded to 6 dp so every downstream step sees identical
    values in any engine (the ts_cusum pre-rounding discipline)."""
    agg = joined.groupBy(key).agg(
        F.sum(F.col(f1) * F.col(f1)).alias("a11"),
        F.sum(F.col(f1) * F.col(f2)).alias("a12"),
        F.sum(F.col(f2) * F.col(f2)).alias("a22"),
        F.sum(F.col("r") * F.col(f1)).alias("b1"),
        F.sum(F.col("r") * F.col(f2)).alias("b2"),
    )
    lam = F.lit(_ALS_LAMBDA)
    det = (F.col("a11") + lam) * (F.col("a22") + lam) - F.col("a12") * F.col("a12")
    x1 = ((F.col("a22") + lam) * F.col("b1") - F.col("a12") * F.col("b2")) / det
    x2 = ((F.col("a11") + lam) * F.col("b2") - F.col("a12") * F.col("b1")) / det
    return agg.select(
        key, F.round(x1, 6).alias("f1"), F.round(x2, 6).alias("f2")
    )


def _als_fit(spark: SparkSession, sf: str):
    """Shared ALS pipeline: (ratings, user factors, item factors) after
    one alternation - used by the factor audit and the recommender."""
    li = table(spark, sf, "lineitem")
    p = table(spark, sf, "part").select("p_partkey", "p_brand")
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    # r9 (guide §2.3 — shuffle/aggregate on narrow keys): the fact-sized
    # partial aggregate and its exchange run on (cust, INT brand number)
    # instead of (cust, 'Brand#NN' string); the exact brand strings
    # re-attach from the 25-row dimension AFTER the aggregation, map-side
    # (broadcast), before the checkpoint — downstream plans see the
    # identical (cust, brand, r) frame. bnum↔brand is 1:1 by the harness
    # grammar ('Brand#<n>'); the brand_dim join restores the original
    # bytes (never re-synthesized by concat).
    bnum = F.regexp_extract(F.col("p_brand"), "#(\\d+)", 1).cast("int")
    brand_dim = p.select(bnum.alias("bnum"), F.col("p_brand").alias("brand")).distinct()
    ratings = (
        li.join(
            F.broadcast(p.select("p_partkey", bnum.alias("bnum"))),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_custkey").alias("cust"), F.col("bnum"))
        .agg(F.log(1.0 + F.count("*")).alias("r"))
        .join(F.broadcast(brand_dim), "bnum")
        .select("cust", "brand", "r")
        # referenced by the init, the user solve, and the item solve:
        # checkpoint so the fact joins run once, not three times
        .localCheckpoint(eager=True)
    )
    bnum = F.regexp_extract(F.col("brand"), "#(\\d+)", 1).cast("int")
    v0 = ratings.select("brand").distinct().select(
        "brand",
        F.lit(1.0).alias("f1"),
        ((bnum * 37 % 97) / F.lit(97.0)).alias("f2"),
    )
    users = _als_solve(
        ratings.join(F.broadcast(v0), "brand"), "cust", "f1", "f2"
    )
    items = _als_solve(
        ratings.join(
            users.select(
                "cust", F.col("f1").alias("u1"), F.col("f2").alias("u2")
            ),
            "cust",
        ),
        "brand",
        "u1",
        "u2",
    )
    return ratings, users, items


def q_als_factors(spark: SparkSession, sf: str) -> DataFrame:
    """One alternation of ALS matrix factorization (k=2) over the
    implicit customer x brand purchase matrix — the collaborative-
    filtering training step in-engine. Ratings r = ln(1 + purchase
    count); item factors init deterministically from the brand number;
    each half-step is ONE aggregate per entity + a closed-form 2x2 solve
    (no gradient loop, no RNG, no driver-side model), so an iteration
    costs two shuffles regardless of matrix size. Factors pre-round to
    6 dp per half-step, making the alternation engine-exact. Returns the
    per-brand factor table."""
    _ratings, _users, items = _als_fit(spark, sf)
    return items.select("brand", "f1", "f2")


_ALS_ORACLE = f"""
    WITH ratings AS (
        SELECT o_custkey AS cust, p_brand AS brand,
               LN(1.0 + COUNT(*)) AS r
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    v0 AS (
        SELECT DISTINCT brand, 1.0 AS f1,
               (CAST(regexp_extract(brand, '#(\\d+)', 1) AS INT) * 37 % 97)
                   / 97.0 AS f2
        FROM ratings
    ),
    uagg AS (
        SELECT cust,
               SUM(f1 * f1) AS a11, SUM(f1 * f2) AS a12,
               SUM(f2 * f2) AS a22,
               SUM(r * f1) AS b1, SUM(r * f2) AS b2
        FROM ratings JOIN v0 USING (brand)
        GROUP BY 1
    ),
    users AS (
        SELECT cust,
               ROUND(((a22 + {_ALS_LAMBDA}) * b1 - a12 * b2)
                     / ((a11 + {_ALS_LAMBDA}) * (a22 + {_ALS_LAMBDA})
                        - a12 * a12), 6) AS u1,
               ROUND(((a11 + {_ALS_LAMBDA}) * b2 - a12 * b1)
                     / ((a11 + {_ALS_LAMBDA}) * (a22 + {_ALS_LAMBDA})
                        - a12 * a12), 6) AS u2
        FROM uagg
    ),
    iagg AS (
        SELECT brand,
               SUM(u1 * u1) AS a11, SUM(u1 * u2) AS a12,
               SUM(u2 * u2) AS a22,
               SUM(r * u1) AS b1, SUM(r * u2) AS b2
        FROM ratings JOIN users USING (cust)
        GROUP BY 1
    )
    SELECT brand,
           ROUND(((a22 + {_ALS_LAMBDA}) * b1 - a12 * b2)
                 / ((a11 + {_ALS_LAMBDA}) * (a22 + {_ALS_LAMBDA})
                    - a12 * a12), 6) AS f1,
           ROUND(((a11 + {_ALS_LAMBDA}) * b2 - a12 * b1)
                 / ((a11 + {_ALS_LAMBDA}) * (a22 + {_ALS_LAMBDA})
                    - a12 * a12), 6) AS f2
    FROM iagg
"""

QUERIES["als_factors"] = q_als_factors
ORACLES["als_factors"] = _ALS_ORACLE


def q_info_gain_features(spark: SparkSession, sf: str) -> DataFrame:
    """Information gain of candidate categorical features against the
    order-status label - the aggregate-only feature-selection ranking:
    IG(Y; X) = H(Y) - sum_x p(x) H(Y|X=x). Each feature costs one
    (feature, label) count aggregate; entropies are closed forms over
    the count tables, so the fact is scanned once per feature and
    nothing leaves the plan."""
    o = table(spark, sf, "orders")
    feats = {
        "priority": F.col("o_orderpriority"),
        "year": F.year("o_orderdate").cast("string"),
        "price_band": (F.floor(F.col("o_totalprice") / 100000)).cast("string"),
    }
    # r9 (guide §2.2 — one corpus pass, derive the rest): the fact was
    # scanned once per feature plus once for n(all) plus once for the
    # label marginal — five scans for one ranking. One exploded
    # (feature, x, y) count aggregate now feeds everything: the label
    # marginal is any single feature's slice summed over x (every order
    # carries every feature), n(all) rides in-plan as a 1-row frame, and
    # the per-feature conditional entropies group the same table. Same
    # counts, same closed forms, same 3 output rows.
    ex = o.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("feature"),
                        expr.cast("string").alias("x"),
                    )
                    for name, expr in feats.items()
                ]
            )
        ).alias("f"),
        F.col("o_orderstatus").alias("y"),
    ).select("f.feature", "f.x", "y")
    # lazy checkpoint: fc is feature-domain-sized (dozens of rows) but has
    # four consumers (label marginal, n_all, tot, cond) — cache it so the
    # exploded fact scan runs once, not once per consumer
    fc = (
        ex.groupBy("feature", "x", "y")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)
    )
    label_counts = (
        fc.filter(F.col("feature") == "year")
        .groupBy("y")
        .agg(F.sum("c").alias("c"))
    )
    n_all_df = label_counts.agg(
        F.sum("c").cast("double").alias("n_all")
    )
    h_y = (
        label_counts.crossJoin(F.broadcast(n_all_df))
        .agg(
            (-F.sum(
                (F.col("c") / F.col("n_all"))
                * F.log(F.col("c") / F.col("n_all"))
            )).alias("h_y")
        )
    )
    tot = fc.groupBy("feature", "x").agg(F.sum("c").alias("t"))
    cond = (
        fc.join(tot, ["feature", "x"])
        .groupBy("feature", "x")
        .agg(
            (-F.sum(
                (F.col("c") / F.col("t")) * F.log(F.col("c") / F.col("t"))
            )).alias("h"),
            F.first("t").alias("t"),
        )
    )
    h_cond = (
        cond.crossJoin(F.broadcast(n_all_df))
        .groupBy("feature")
        .agg(F.sum(F.col("t") / F.col("n_all") * F.col("h")).alias("h_c"))
    )
    return h_cond.crossJoin(F.broadcast(h_y)).select(
        "feature",
        F.round(F.col("h_y") - F.col("h_c"), 6).alias("info_gain"),
        F.round("h_c", 6).alias("h_conditional"),
    )


_IG_ORACLE = """
    WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM orders),
    hy AS (
        SELECT -SUM((c / n.n) * LN(c / n.n)) AS h_y FROM (
            SELECT o_orderstatus, COUNT(*) AS c FROM orders GROUP BY 1
        ) CROSS JOIN n
    ),
    f AS (
        SELECT 'priority' AS feature, o_orderpriority AS x,
               o_orderstatus AS y
        FROM orders
        UNION ALL
        SELECT 'year', CAST(YEAR(o_orderdate) AS VARCHAR), o_orderstatus
        FROM orders
        UNION ALL
        SELECT 'price_band',
               CAST(CAST(FLOOR(o_totalprice / 100000) AS BIGINT) AS VARCHAR),
               o_orderstatus
        FROM orders
    ),
    fc AS (
        SELECT feature, x, y, COUNT(*) AS c FROM f GROUP BY 1, 2, 3
    ),
    tot AS (
        SELECT feature, x, SUM(c) AS t FROM fc GROUP BY 1, 2
    ),
    cond AS (
        SELECT fc.feature, fc.x,
               -SUM((fc.c / tot.t) * LN(fc.c / tot.t)) AS h,
               MIN(tot.t) AS t
        FROM fc JOIN tot ON fc.feature = tot.feature AND fc.x = tot.x
        GROUP BY 1, 2
    ),
    hc AS (
        SELECT feature, SUM(t / n.n * h) AS h_c
        FROM cond CROSS JOIN n GROUP BY feature, n.n
    )
    SELECT feature,
           ROUND(hy.h_y - hc.h_c, 6) AS info_gain,
           ROUND(hc.h_c, 6) AS h_conditional
    FROM hc CROSS JOIN hy
"""

QUERIES["info_gain_features"] = q_info_gain_features
ORACLES["info_gain_features"] = _IG_ORACLE


def q_negative_samples(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic negative sampling for contrastive/recsys training:
    for each customer (< 30, to bound the audit), the purchased brands
    are positives and the 2 md5-smallest non-purchased brands are
    negatives - hash-ranked, not RNG, so resampling is repartition- and
    rerun-stable. The candidate grid is customers x brand vocabulary
    (broadcast dimension), positives drop out via an anti-join shape
    (left join + null filter), and the per-customer rank window
    partitions by customer."""
    li = table(spark, sf, "lineitem")
    o = table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    p = table(spark, sf, "part").select("p_partkey", "p_brand")
    pos = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("o_custkey") < 30)
        .select(F.col("o_custkey").alias("cust"), F.col("p_brand").alias("brand"))
        .distinct()
        # lazy checkpoint (r9, guide §5): pos is bounded (≤30 customers ×
        # brand vocabulary) but has THREE consumers (the customer spine,
        # the anti-join, the final union) — uncached, each re-ran the
        # lineitem-scale join
        .localCheckpoint(eager=False)
    )
    custs = pos.select("cust").distinct()
    brands = p.select(F.col("p_brand").alias("brand")).distinct()
    grid = custs.crossJoin(F.broadcast(brands))
    neg_pool = grid.join(pos, ["cust", "brand"], "left_anti")
    w = Window.partitionBy("cust").orderBy(
        F.md5(F.concat(F.col("cust").cast("string"), F.lit("_"), F.col("brand"))),
        "brand",
    )
    negs = (
        neg_pool.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("cust", "brand", F.lit(0).alias("label"))
    )
    return pos.select("cust", "brand", F.lit(1).alias("label")).unionByName(
        negs
    )


_NEGSAMP_ORACLE = """
    WITH pos AS (
        SELECT DISTINCT o_custkey AS cust, p_brand AS brand
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey < 30
    ),
    custs AS (SELECT DISTINCT cust FROM pos),
    brands AS (SELECT DISTINCT p_brand AS brand FROM part),
    grid AS (SELECT cust, brand FROM custs CROSS JOIN brands),
    neg_pool AS (
        SELECT g.cust, g.brand FROM grid g
        ANTI JOIN pos USING (cust, brand)
    ),
    negs AS (
        SELECT cust, brand FROM (
            SELECT cust, brand,
                   ROW_NUMBER() OVER (
                       PARTITION BY cust
                       ORDER BY md5(CAST(cust AS VARCHAR) || '_' || brand),
                                brand
                   ) AS rk
            FROM neg_pool
        ) WHERE rk <= 2
    )
    SELECT cust, brand, 1 AS label FROM pos
    UNION ALL
    SELECT cust, brand, 0 AS label FROM negs
"""

QUERIES["negative_samples"] = q_negative_samples
ORACLES["negative_samples"] = _NEGSAMP_ORACLE


def q_als_recommend(spark: SparkSession, sf: str) -> DataFrame:
    """ALS top-3 recommendations for customers < 10: score every brand
    the customer has NOT purchased by u.v over the one-alternation
    factors and rank per customer - the serving step that closes the
    train->recommend loop. Scores pre-round to 6 dp with a brand
    tie-break, so the ranking is FP-order-independent; the candidate
    grid is (selected users) x (25-brand factor table, broadcast) minus
    the interaction anti-join."""
    ratings, users, items = _als_fit(spark, sf)
    u = users.filter(F.col("cust") < 10).select(
        "cust", F.col("f1").alias("u1"), F.col("f2").alias("u2")
    )
    cand = (
        u.crossJoin(
            F.broadcast(
                items.select("brand", F.col("f1").alias("v1"), F.col("f2").alias("v2"))
            )
        )
        .join(ratings.select("cust", "brand"), ["cust", "brand"], "left_anti")
        .select(
            "cust",
            "brand",
            F.round(
                F.col("u1") * F.col("v1") + F.col("u2") * F.col("v2"), 6
            ).alias("score"),
        )
    )
    w = Window.partitionBy("cust").orderBy(F.col("score").desc(), "brand")
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("cust", "brand", "score", "rank")
    )


_ALS_REC_ORACLE = f"""
    WITH ratings AS (
        SELECT o_custkey AS cust, p_brand AS brand,
               LN(1.0 + COUNT(*)) AS r
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1, 2
    ),
    v0 AS (
        SELECT DISTINCT brand, 1.0 AS f1,
               (CAST(regexp_extract(brand, '#(\\d+)', 1) AS INT) * 37 % 97)
                   / 97.0 AS f2
        FROM ratings
    ),
    uagg AS (
        SELECT cust,
               SUM(f1 * f1) AS a11, SUM(f1 * f2) AS a12,
               SUM(f2 * f2) AS a22,
               SUM(r * f1) AS b1, SUM(r * f2) AS b2
        FROM ratings JOIN v0 USING (brand)
        GROUP BY 1
    ),
    users AS (
        SELECT cust,
               ROUND(((a22 + {_ALS_LAMBDA}) * b1 - a12 * b2)
                     / ((a11 + {_ALS_LAMBDA}) * (a22 + {_ALS_LAMBDA})
                        - a12 * a12), 6) AS u1,
               ROUND(((a11 + {_ALS_LAMBDA}) * b2 - a12 * b1)
                     / ((a11 + {_ALS_LAMBDA}) * (a22 + {_ALS_LAMBDA})
                        - a12 * a12), 6) AS u2
        FROM uagg
    ),
    iagg AS (
        SELECT brand,
               SUM(u1 * u1) AS a11, SUM(u1 * u2) AS a12,
               SUM(u2 * u2) AS a22,
               SUM(r * u1) AS b1, SUM(r * u2) AS b2
        FROM ratings JOIN users USING (cust)
        GROUP BY 1
    ),
    items AS (
        SELECT brand,
               ROUND(((a22 + {_ALS_LAMBDA}) * b1 - a12 * b2)
                     / ((a11 + {_ALS_LAMBDA}) * (a22 + {_ALS_LAMBDA})
                        - a12 * a12), 6) AS v1,
               ROUND(((a11 + {_ALS_LAMBDA}) * b2 - a12 * b1)
                     / ((a11 + {_ALS_LAMBDA}) * (a22 + {_ALS_LAMBDA})
                        - a12 * a12), 6) AS v2
        FROM iagg
    ),
    cand AS (
        SELECT u.cust, i.brand,
               ROUND(u.u1 * i.v1 + u.u2 * i.v2, 6) AS score
        FROM users u CROSS JOIN items i
        ANTI JOIN ratings r2 ON r2.cust = u.cust AND r2.brand = i.brand
        WHERE u.cust < 10
    )
    SELECT cust, brand, score, rank FROM (
        SELECT cust, brand, score,
               ROW_NUMBER() OVER (PARTITION BY cust
                                  ORDER BY score DESC, brand) AS rank
        FROM cand
    ) WHERE rank <= 3
"""

QUERIES["als_recommend"] = q_als_recommend
ORACLES["als_recommend"] = _ALS_REC_ORACLE


def q_jackknife_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """Delete-one-month jackknife for the revenue-per-order ratio: the
    deterministic resampling family next to the hash-Poisson bootstrap.
    Leave-one-out estimates are closed forms over the monthly aggregate
    joined to its own 1-row total, so the whole procedure is two
    aggregates on the months table - no replicated data."""
    o = table(spark, sf, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("rev"),
        F.count("*").alias("cnt"),
    )
    tot = monthly.agg(
        F.sum("rev").alias("s_rev"),
        F.sum("cnt").alias("s_cnt"),
        F.count("*").alias("n_m"),
    )
    loo = monthly.crossJoin(F.broadcast(tot)).select(
        "n_m",
        (
            (F.col("s_rev") - F.col("rev"))
            / (F.col("s_cnt") - F.col("cnt"))
        ).alias("theta_i"),
        (F.col("s_rev") / F.col("s_cnt")).alias("theta"),
    )
    # centered two-stage variance: the uncentered sum-of-squares form
    # cancels catastrophically at theta ~ 2.5e5 (1e-3 absolute engine
    # disagreement); deviations are O(1) and round-stable
    tbar = loo.agg(F.round(F.avg("theta_i"), 10).alias("tbar"))
    return (
        loo.crossJoin(F.broadcast(tbar))
        .groupBy("n_m", "theta", "tbar")
        .agg(
            F.round(
                (F.max("n_m") - 1)
                / F.max("n_m")
                * F.sum(
                    (F.col("theta_i") - F.col("tbar"))
                    * (F.col("theta_i") - F.col("tbar"))
                ),
                6,
            ).alias("var_jack")
        )
        .select(
            "n_m",
            F.round("theta", 6).alias("ratio"),
            F.round("tbar", 6).alias("theta_jack"),
            "var_jack",
        )
    )


ORACLES["jackknife_ratio"] = """
    WITH monthly AS (
        SELECT DATE_TRUNC('month', o_orderdate) AS m,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS rev,
               COUNT(*) AS cnt
        FROM orders GROUP BY 1
    ),
    tot AS (
        SELECT SUM(rev) AS s_rev, SUM(cnt) AS s_cnt, COUNT(*) AS n_m
        FROM monthly
    ),
    loo AS (
        SELECT t.n_m,
               (t.s_rev - m.rev) / (t.s_cnt - m.cnt) AS theta_i,
               t.s_rev / t.s_cnt AS theta
        FROM monthly m CROSS JOIN tot t
    )
    , tbar AS (SELECT ROUND(AVG(theta_i), 10) AS tbar FROM loo)
    SELECT n_m, ROUND(theta, 6) AS ratio,
           ROUND(tbar, 6) AS theta_jack,
           ROUND((MAX(n_m) - 1.0) / MAX(n_m)
                 * SUM((theta_i - tbar) * (theta_i - tbar)), 6)
               AS var_jack
    FROM loo CROSS JOIN tbar
    GROUP BY n_m, theta, tbar
"""

QUERIES["jackknife_ratio"] = q_jackknife_ratio


def q_woe_iv(spark: SparkSession, sf: str) -> DataFrame:
    """Weight-of-Evidence / Information-Value table — the credit-scoring
    feature screen, here for quantity buckets vs the returned-item
    target: WoE_i = ln((bad_i/bad)/(good_i/good)), IV = Σ(pb−pg)·WoE.
    One fact fold to 5 integer buckets; totals broadcast back onto the
    bounded table; integer counts make the logs cross-engine exact."""
    l = table(spark, sf, "lineitem")
    b = l.select(
        (F.floor((F.col("l_quantity") - 1) / 10)).cast("int").alias("bucket"),
        (F.col("l_returnflag") == "R").alias("bad"),
    )
    cells = b.groupBy("bucket").agg(
        F.count(F.when(F.col("bad"), 1)).alias("nb"),
        F.count(F.when(~F.col("bad"), 1)).alias("ng"),
    )
    tot = cells.agg(
        F.sum("nb").alias("tb"), F.sum("ng").alias("tg")
    )
    j = cells.crossJoin(F.broadcast(tot))
    pb = F.col("nb") / F.col("tb")
    pg = F.col("ng") / F.col("tg")
    woe = F.log(pb / pg)
    return j.select(
        "bucket",
        F.col("nb").cast("long").alias("n_bad"),
        F.col("ng").cast("long").alias("n_good"),
        F.round(woe, 6).alias("woe"),
        F.round((pb - pg) * woe, 6).alias("iv_term"),
    ).orderBy("bucket")


ORACLES["woe_iv"] = """
    WITH cells AS (
        SELECT CAST(FLOOR((l_quantity - 1) / 10) AS INT) AS bucket,
               COUNT(*) FILTER (l_returnflag = 'R') AS nb,
               COUNT(*) FILTER (l_returnflag <> 'R') AS ng
        FROM lineitem GROUP BY 1
    ), t AS (SELECT SUM(nb) AS tb, SUM(ng) AS tg FROM cells)
    SELECT bucket,
           CAST(nb AS BIGINT) AS n_bad,
           CAST(ng AS BIGINT) AS n_good,
           ROUND(LN((nb * 1.0 / tb) / (ng * 1.0 / tg)), 6) AS woe,
           ROUND((nb * 1.0 / tb - ng * 1.0 / tg)
                 * LN((nb * 1.0 / tb) / (ng * 1.0 / tg)), 6) AS iv_term
    FROM cells, t
    ORDER BY bucket
"""
QUERIES["woe_iv"] = q_woe_iv


def q_pinball_loss(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile-forecast evaluation: fit global p25/p50/p75 of order
    totals on the TRAIN years (< 1998), score the 1998+ TEST split with
    the pinball (quantile) loss L_τ(y,q) = max(τ(y−q), (τ−1)(y−q)) —
    the metric that makes quantile regression honest. Exact interpolated
    percentiles (percentile ↔ quantile_cont, rounded 2dp before use so
    the literal is identical cross-engine); one test-scan aggregate per
    τ folded into a single pass."""
    o = table(spark, sf, "orders")
    train = o.filter(F.year("o_orderdate") < 1998)
    qs = train.agg(
        *[
            F.round(
                F.percentile("o_totalprice", F.lit(t)), 2
            ).alias(f"q{int(t*100)}")
            for t in (0.25, 0.5, 0.75)
        ]
    )
    test = o.filter(F.year("o_orderdate") >= 1998).crossJoin(
        F.broadcast(qs)
    )
    y = F.col("o_totalprice")

    def pin(tau: float, q):
        d = y - q
        return F.avg(
            F.greatest(F.lit(tau) * d, (F.lit(tau) - 1.0) * d)
        )

    agg = test.agg(
        F.count("*").alias("n_test"),
        F.first("q25").alias("q25"),
        F.first("q50").alias("q50"),
        F.first("q75").alias("q75"),
        pin(0.25, F.col("q25")).alias("l25"),
        pin(0.50, F.col("q50")).alias("l50"),
        pin(0.75, F.col("q75")).alias("l75"),
    )
    return agg.select(
        F.col("n_test").cast("long").alias("n_test"),
        "q25", "q50", "q75",
        F.round("l25", 4).alias("pinball_p25"),
        F.round("l50", 4).alias("pinball_p50"),
        F.round("l75", 4).alias("pinball_p75"),
    )


ORACLES["pinball_loss"] = """
    WITH q AS (
        SELECT ROUND(QUANTILE_CONT(o_totalprice, 0.25), 2) AS q25,
               ROUND(QUANTILE_CONT(o_totalprice, 0.50), 2) AS q50,
               ROUND(QUANTILE_CONT(o_totalprice, 0.75), 2) AS q75
        FROM orders WHERE YEAR(o_orderdate) < 1998
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
           ANY_VALUE(q25) AS q25, ANY_VALUE(q50) AS q50, ANY_VALUE(q75) AS q75,
           ROUND(AVG(GREATEST(0.25 * (o_totalprice - q25),
                              -0.75 * (o_totalprice - q25))), 4) AS pinball_p25,
           ROUND(AVG(GREATEST(0.50 * (o_totalprice - q50),
                              -0.50 * (o_totalprice - q50))), 4) AS pinball_p50,
           ROUND(AVG(GREATEST(0.75 * (o_totalprice - q75),
                              -0.25 * (o_totalprice - q75))), 4) AS pinball_p75
    FROM orders, q
    WHERE YEAR(o_orderdate) >= 1998
"""
QUERIES["pinball_loss"] = q_pinball_loss
