"""Pretraining-corpus preparation queries: sequence packing, stratified
sampling, per-domain caps, benchmark decontamination, semantic dedup,
bigram-LM perplexity scoring, and PII scanning.

These are the corpus-engineering operations an LLM training-data pipeline
runs after cleaning (analytics/text_q.py) and dedup (analytics/dedup_q.py):
every query is a declarative plan over the harness `documents`/`embeddings`
tables with a value-checked DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vptstools_spark.io import fan_out, table
from vptstools_spark.operators.dedup import shingles
from vptstools_spark.operators.pretrain import (
    PII_PATTERNS,
    bigram_nll,
    doc_bigrams,
    pack_bins,
    pii_counts,
    redact_pii,
)
from vptstools_spark.operators.similarity import anchor_buckets, with_norm

#: packing budget (tokens per training sequence)
PACK_BUDGET = 512
#: stratified-sample size per language stratum
STRATUM_K = 30
#: per-source document cap (Common-Crawl-style domain balancing)
DOMAIN_CAP = 50
#: decontamination shingle width
DECONTAM_K = 5
#: SemDeDup within-cell cosine threshold
SEM_TAU = 0.45


def q_pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Concat-then-chunk sequence packing into PACK_BUDGET-token bins per
    source shard: per-bin document and token counts. The running sum windows
    on the shard key (hash-partitioned exchange, no global window)."""
    d = table(spark, sf, "documents").select(
        "source", "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    packed = pack_bins(d, PACK_BUDGET)
    return packed.groupBy("source", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )


def q_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling: the STRATUM_K lowest md5(doc_id)
    hashes per language — reproducible across engines and runs (the property
    that makes a training-mix recipe auditable). Per-stratum top-k is a
    window partitioned by the stratum, never a global sort; at scale AQE
    turns it into a WindowGroupLimit with per-partition pre-filtering."""
    d = table(spark, sf, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRATUM_K)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_sampled"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


def q_sample_neyman(spark: SparkSession, sf: str) -> DataFrame:
    """Neyman-allocation stratified sampling: a 1000-row budget split
    across order-priority strata ∝ N_s·σ_s (variance-optimal for
    estimating mean revenue — the statistically-grounded upgrade over
    proportional allocation). Determinism end to end: σ_s comes from
    EXACT decimal Σx/Σx² (cast to double once, fixed op order — IEEE
    identical in any engine), allocation masses are floored to integer
    micro-units so the quota arithmetic is pure integer, and each
    stratum keeps its quota-smallest md5(orderkey) rows. The oracle
    replays every step."""
    o = table(spark, sf, "orders")
    pri = "o_orderpriority"
    x = F.col("o_totalprice")
    stats = o.groupBy(pri).agg(
        F.count("*").alias("n"),
        F.sum(x.cast("decimal(18,2)")).alias("sx"),
        F.sum((x.cast("decimal(18,2)") * x.cast("decimal(18,2)"))).alias("sxx"),
    )
    sx_d = F.col("sx").cast("double")
    sxx_d = F.col("sxx").cast("double")
    n_d = F.col("n").cast("double")
    var = (sxx_d - sx_d * sx_d / n_d) / (n_d - F.lit(1.0))
    mass = F.floor(F.col("n") * F.sqrt(var) * F.lit(1e6)).cast("long")
    alloc = stats.withColumn("mass", mass)
    total = alloc.agg(F.sum("mass").alias("tm"))
    quota = (
        alloc.crossJoin(F.broadcast(total))
        .withColumn(
            "n_target",
            F.expr("(1000 * mass) div tm").cast("long"),
        )
        .select(pri, "n_target")
    )
    w = Window.partitionBy(pri).orderBy(
        F.md5(F.col("o_orderkey").cast("string")).asc(), F.col("o_orderkey").asc()
    )
    picked = (
        o.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(quota), pri)
        .filter(F.col("rn") <= F.col("n_target"))
    )
    return (
        picked.groupBy(pri, "n_target")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("o_orderkey").cast("long").alias("key_sum"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .orderBy(pri)
    )


def q_domain_caps(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source document cap at DOMAIN_CAP by hash order (domain balancing:
    no source may dominate the mix). Reports survivor count and the kept
    subset's character mass — the kept-set stats depend on WHICH docs the
    hash order keeps, so the oracle checks the ordering, not just the cap."""
    d = table(spark, sf, "documents")
    w = Window.partitionBy("source").orderBy(F.md5("text").asc(), F.col("doc_id").asc())
    kept = F.col("rn") <= DOMAIN_CAP
    return (
        d.withColumn("rn", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.count_if(kept).alias("n_kept"),
            F.sum(F.when(kept, F.col("n_chars"))).alias("kept_chars"),
        )
    )


def q_split_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test split by content-independent hash:
    md5(doc_id) hex prefix buckets ~90/5/5. Hash-based assignment is the
    standard leakage-safe split (stable under re-runs, joins, and
    repartitioning — unlike randomSplit, whose assignment depends on
    partitioning). One scan, one final exchange on the split label; md5 is
    computed identically by Spark and the DuckDB oracle."""
    d = table(spark, sf, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    # first two hex chars -> 256 buckets: [0,230)=train, [230,243)=val, rest test
    b = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    split = (
        F.when(b < 230, "train").when(b < 243, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def q_decontam_ngrams(spark: SparkSession, sf: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    DECONTAM_K-gram with the held-out benchmark slice (doc_id % 97 == 0
    stands in for an eval suite). The benchmark shingle set is tiny relative
    to any real corpus → broadcast semi-join; the corpus side never
    shuffles. Per-source contamination counts."""
    d = fan_out(table(spark, sf, "documents"))
    sh = shingles(d, k=DECONTAM_K)
    is_bench = F.col("id") % 97 == 0
    bench_sh = sh.filter(is_bench).select("shingle").distinct()
    contam = (
        sh.filter(~is_bench)
        .join(F.broadcast(bench_sh), "shingle")
        .select("id")
        .distinct()
    )
    train = table(spark, sf, "documents").filter(F.col("doc_id") % 97 != 0)
    return (
        train.join(contam, train["doc_id"] == contam["id"], "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_train"),
            F.count("id").alias("n_contam"),
        )
    )


def q_dedup_semantic(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style semantic dedup: anchor-bucket the embeddings (narrow
    map over plan-literal anchors), then within each bucket drop the higher
    vec_id of every pair with cosine ≥ SEM_TAU. The bucket equi-join keeps
    the quadratic stage per-cell — the scale architecture next to the exact
    all-pairs `dedup_embedding` baseline. Per-bucket kept/removed counts."""
    from vptstools_spark.analytics.similarity_q import _anchors

    emb = fan_out(table(spark, sf, "embeddings"))
    bk = anchor_buckets(emb, _anchors(spark, sf))  # (id, bucket)
    v = (
        with_norm(emb)
        .select("vec_id", "_vec", "_norm")
        .join(bk, F.col("vec_id") == F.col("id"))
        .drop("id")
    )
    from vptstools_spark.operators.similarity import dot

    a = v.select(
        F.col("bucket"),
        F.col("vec_id").alias("va"),
        F.col("_vec").alias("xa"),
        F.col("_norm").alias("na"),
    )
    b = v.select(
        F.col("bucket"),
        F.col("vec_id").alias("vb"),
        F.col("_vec").alias("xb"),
        F.col("_norm").alias("nb"),
    )
    pairs = (
        a.repartition("bucket")
        .join(b, "bucket")
        .filter(F.col("va") < F.col("vb"))
        .withColumn("cos", F.round(dot(F.col("xa"), F.col("xb")) / (F.col("na") * F.col("nb")), 4))
    )
    removed = (
        pairs.filter(F.col("cos") >= SEM_TAU)
        .groupBy("bucket")
        .agg(F.countDistinct("vb").alias("n_removed"))
    )
    hist = v.groupBy("bucket").agg(F.count("*").alias("n_vectors"))
    return (
        hist.join(removed, "bucket", "left")
        .na.fill(0, ["n_removed"])
        .select("bucket", "n_vectors", "n_removed")
    )


def q_text_perplexity(spark: SparkSession, sf: str) -> DataFrame:
    """Bigram-LM cross-entropy per document (doc_id < 150) under the corpus
    count model — the perplexity-style quality filter of a pretraining
    pipeline. Count tables are vocabulary-sized and broadcast; the per-doc
    aggregation combines map-side."""
    d = table(spark, sf, "documents")
    bg = doc_bigrams(d)
    return bigram_nll(bg.filter(F.col("doc_id") < 150), bg)


def q_pii_scrub(spark: SparkSession, sf: str) -> DataFrame:
    """PII scan + redaction audit per source: match counts per pattern
    class, documents containing any PII, and the character mass after
    redaction. Pure JVM regexp (codegen-eligible) — the synthetic corpus is
    PII-free by construction, so the redaction invariant (redacted_chars ==
    original mass) doubles as a no-false-positive check; crafted-input
    behavior is pinned in tests/test_pretrain.py."""
    d = table(spark, sf, "documents")
    counts = pii_counts(F.col("text"))
    any_pii = sum(counts.values(), F.lit(0)) > 0
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(counts["email"]).alias("n_email"),
        F.sum(counts["ipv4"]).alias("n_ipv4"),
        F.sum(counts["phone"]).alias("n_phone"),
        F.count_if(any_pii).alias("n_docs_pii"),
        F.sum(F.length(redact_pii(F.col("text")))).alias("redacted_chars"),
    )



def q_doc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping fixed-size chunking of the document corpus
    (`operators/pretrain.py:chunk_documents` — sequence+posexplode+substr,
    an all-JVM narrow map): the RAG / pretraining chunk stage. Emits the
    chunk geometry plus an md5 content fingerprint per chunk."""
    from vptstools_spark.operators.pretrain import chunk_documents

    d = table(spark, sf, "documents")
    ch = chunk_documents(d, chunk_size=200, stride=150)
    return ch.select(
        "doc_id",
        "chunk_id",
        "chunk_start",
        F.length("chunk_text").cast("long").alias("chunk_len"),
        F.md5("chunk_text").alias("chunk_md5"),
    )


def q_url_host_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Web-corpus URL curation: parse host / path / query-param out of
    document URLs (deterministically constructed here — the harness corpus
    has no URL column) with Spark's built-in `parse_url`, then aggregate
    per host. The parse is a narrow JVM expression; the only exchange is
    the final per-host aggregation — at 100 TB this is the shape of
    domain-level corpus accounting (robots blocklists, per-domain caps)."""
    d = table(spark, sf, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/corpus/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref="),
        F.col("lang"),
        F.lit("&n="),
        F.col("n_chars").cast("string"),
    )
    u = d.withColumn("url", url).select(
        "doc_id",
        "n_chars",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("ref")).alias("ref"),
    )
    return (
        u.groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("ref").alias("n_langs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("path").alias("min_path"),
        )
    )


def q_sample_temperature(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-based source mix (alpha=0.5 — sqrt is the one exponent
    that is IEEE-exact cross-engine): per-source sampling share and
    per-document resampling weight (operators/pretrain.py:
    temperature_weights). One count aggregation + a 1-row broadcast
    normalizer; nothing else scales with the corpus."""
    from vptstools_spark.operators.pretrain import temperature_weights

    w = temperature_weights(table(spark, sf, "documents"), by="source", alpha=0.5)
    return w.select(
        "source",
        "n_docs",
        F.round("p_source", 6).alias("p_source"),
        F.round("w_doc", 8).alias("w_doc"),
    ).orderBy("source")


def q_mixture_materialize(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature mixture MATERIALIZED (`operators/pretrain.py:
    materialize_mixture`): draw a 10,000-instance training mix over the
    document sources at alpha = 0.5, upsampling tail sources past one
    epoch where their quota demands it, and report the per-source
    census — quota, drawn instances, distinct documents, deepest epoch
    copy. Quotas are fixed-point integer arithmetic (floor(sqrt(n)*1e6)
    masses, integer normalizer) and survivors are the smallest
    md5-ranked (doc, copy) pairs, so the oracle re-draws the IDENTICAL
    multiset in SQL — sampling with zero RNG, reproducible across
    engines and repartitionings."""
    from vptstools_spark.operators.pretrain import materialize_mixture

    d = table(spark, sf, "documents")
    mix = materialize_mixture(d, total_docs=10_000, by="source")
    return (
        mix.groupBy("source")
        .agg(
            F.count("*").alias("sampled"),
            F.count_distinct("doc_id").alias("distinct_docs"),
            F.max("copy_i").alias("max_copy"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("source")
    )


_MIX_ORACLE = """
WITH counts AS (
    SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY 1
), scored AS (
    SELECT source, n_docs,
           CAST(FLOOR(SQRT(n_docs) * 1000000) AS BIGINT) AS mass_fp
    FROM counts
), tot AS (
    SELECT SUM(mass_fp) AS t_fp FROM scored
), quotas AS (
    SELECT source, n_docs,
           GREATEST(1, CAST(mass_fp * 10000 // t_fp AS BIGINT)) AS k_s
    FROM scored, tot
), q2 AS (
    SELECT source, n_docs, k_s,
           (k_s + n_docs - 1) // n_docs AS copies
    FROM quotas
), ex AS (
    SELECT d.source, d.doc_id, q2.k_s, u.copy_i
    FROM documents d
    JOIN q2 USING (source),
    UNNEST(GENERATE_SERIES(1, q2.copies)) AS u(copy_i)
), ranked AS (
    SELECT source, doc_id, copy_i, k_s,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('mx#' || CAST(doc_id AS VARCHAR) || '#' || CAST(copy_i AS VARCHAR))
           ) AS rn
    FROM ex
)
SELECT source,
       COUNT(*) AS sampled,
       COUNT(DISTINCT doc_id) AS distinct_docs,
       CAST(MAX(copy_i) AS BIGINT) AS max_copy,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM ranked
WHERE rn <= k_s
GROUP BY source
ORDER BY source
"""



QUERIES = {
    "mixture_materialize": q_mixture_materialize,
    "doc_chunks": q_doc_chunks,
    "sample_temperature": q_sample_temperature,
    "url_host_stats": q_url_host_stats,
    "pack_sequences": q_pack_sequences,
    "split_assign": q_split_assign,
    "decontam_ngrams": q_decontam_ngrams,
    "pii_scrub": q_pii_scrub,
    "sample_stratified": q_sample_stratified,
    "sample_neyman": q_sample_neyman,
    "domain_caps": q_domain_caps,
    "dedup_semantic": q_dedup_semantic,
    "text_perplexity": q_text_perplexity,
}

_PII_SQL_COUNT = {
    name: f"len(regexp_extract_all(text, '{pat}'))" for name, pat in PII_PATTERNS.items()
}
_PII_SQL_REDACT = "text"
for _name, _pat in PII_PATTERNS.items():
    _PII_SQL_REDACT = (
        f"regexp_replace({_PII_SQL_REDACT}, '{_pat}', '[{_name.upper()}]', 'g')"
    )

ORACLES = {
    "sample_neyman": """
        WITH stats AS (
            SELECT o_orderpriority,
                   COUNT(*) AS n,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sx,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))
                       * CAST(o_totalprice AS DECIMAL(18,2))) AS sxx
            FROM orders GROUP BY 1
        ),
        alloc AS (
            SELECT o_orderpriority, n,
                   CAST(FLOOR(n * sqrt(
                       (CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                       / (CAST(n AS DOUBLE) - 1.0)
                   ) * 1e6) AS BIGINT) AS mass
            FROM stats
        ),
        quota AS (
            SELECT o_orderpriority,
                   CAST((1000 * mass) // (SELECT SUM(mass) FROM alloc) AS BIGINT)
                       AS n_target
            FROM alloc
        ),
        ranked AS (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
                   ) AS rn
            FROM orders
        )
        SELECT r.o_orderpriority, q.n_target,
               COUNT(*) AS n_sampled,
               CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                   AS revenue
        FROM ranked r JOIN quota q USING (o_orderpriority)
        WHERE rn <= q.n_target
        GROUP BY 1, 2 ORDER BY 1
    """,
    "mixture_materialize": _MIX_ORACLE,
    "sample_temperature": """
        WITH c AS (
            SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
        ), t AS (
            SELECT SUM(SQRT(CAST(n_docs AS DOUBLE))) AS t FROM c
        )
        SELECT source, n_docs,
               ROUND(SQRT(CAST(n_docs AS DOUBLE)) / t, 6) AS p_source,
               ROUND(SQRT(CAST(n_docs AS DOUBLE)) / t / n_docs, 8) AS w_doc
        FROM c, t ORDER BY source
    """,
    "url_host_stats": """
        WITH u AS (
            SELECT doc_id, n_chars,
                   'https://' || source || '.example.org/corpus/' || lang || '/'
                       || CAST(doc_id AS VARCHAR) || '?ref=' || lang || '&n='
                       || CAST(n_chars AS VARCHAR) AS url
            FROM documents
        ),
        p AS (
            SELECT doc_id, n_chars,
                   regexp_extract(url, 'https://([^/]+)', 1) AS host,
                   regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
                   regexp_extract(url, '[?&]ref=([^&]*)', 1) AS ref
            FROM u
        )
        SELECT host,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT ref) AS n_langs,
               ROUND(AVG(n_chars), 4) AS avg_chars,
               MIN(path) AS min_path
        FROM p GROUP BY host
    """,
    "split_assign": """
        SELECT CASE
                 WHEN CAST('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INT) < 230 THEN 'train'
                 WHEN CAST('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INT) < 243 THEN 'val'
                 ELSE 'test'
               END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
    """,
    "pack_sequences": f"""
        WITH t AS (
            SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
            FROM documents
        ),
        c AS (
            SELECT source, n_tok,
                   SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
            FROM t
        )
        SELECT source,
               CAST(FLOOR((cum - n_tok) / {float(PACK_BUDGET)}) AS BIGINT) AS bin,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        FROM c GROUP BY source, bin
    """,
    "sample_stratified": f"""
        SELECT lang, COUNT(*) AS n_sampled,
               ROUND(AVG(n_chars), 4) AS avg_chars
        FROM (
            SELECT lang, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
            FROM documents
        ) WHERE rn <= {STRATUM_K}
        GROUP BY lang
    """,
    "domain_caps": f"""
        SELECT source,
               COUNT(*) AS n_total,
               COUNT(*) FILTER (rn <= {DOMAIN_CAP}) AS n_kept,
               CAST(SUM(n_chars) FILTER (rn <= {DOMAIN_CAP}) AS BIGINT)
                   AS kept_chars
        FROM (
            SELECT source, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY md5(text), doc_id) AS rn
            FROM documents
        )
        GROUP BY source
    """,
    "decontam_ngrams": f"""
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS a FROM documents
        ),
        g AS (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(a) - {DECONTAM_K - 1}),
                       i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' ' ||
                            a[i+3] || ' ' || a[i+4])) AS sh
            FROM w
        ),
        bench AS (SELECT DISTINCT sh FROM g WHERE doc_id % 97 = 0),
        contam AS (
            SELECT DISTINCT g.doc_id FROM g JOIN bench USING (sh)
            WHERE g.doc_id % 97 <> 0
        )
        SELECT d.source,
               COUNT(*) AS n_train,
               COUNT(c.doc_id) AS n_contam
        FROM documents d LEFT JOIN contam c ON d.doc_id = c.doc_id
        WHERE d.doc_id % 97 <> 0
        GROUP BY d.source
    """,
    "dedup_semantic": f"""
        WITH e AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        anch AS (SELECT vec_id AS aid, i, v AS av FROM e WHERE vec_id < 4),
        dots AS (
            SELECT e.vec_id, anch.aid, SUM(e.v * anch.av) AS d
            FROM e JOIN anch ON e.i = anch.i GROUP BY 1, 2
        ),
        bkt AS (
            SELECT vec_id,
                   string_agg(CASE WHEN d > 0 THEN '1' ELSE '0' END, ''
                              ORDER BY aid) AS bucket
            FROM dots GROUP BY vec_id
        ),
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS n FROM e GROUP BY vec_id),
        pd AS (
            SELECT bx.bucket, x.vec_id AS va, y.vec_id AS vb,
                   SUM(x.v * y.v) AS d
            FROM e x JOIN e y ON x.i = y.i AND x.vec_id < y.vec_id
            JOIN bkt bx ON bx.vec_id = x.vec_id
            JOIN bkt byy ON byy.vec_id = y.vec_id AND byy.bucket = bx.bucket
            GROUP BY 1, 2, 3
        ),
        removed AS (
            SELECT bucket, COUNT(DISTINCT pd.vb) AS n_removed
            FROM pd
            JOIN nrm nx ON nx.vec_id = pd.va
            JOIN nrm ny ON ny.vec_id = pd.vb
            WHERE ROUND(pd.d / (nx.n * ny.n), 4) >= {SEM_TAU}
            GROUP BY bucket
        )
        SELECT h.bucket, h.n_vectors, COALESCE(r.n_removed, 0) AS n_removed
        FROM (SELECT bucket, COUNT(*) AS n_vectors FROM bkt GROUP BY bucket) h
        LEFT JOIN removed r USING (bucket)
    """,
    "text_perplexity": """
        WITH w AS (
            SELECT doc_id, string_split(text, ' ') AS a FROM documents
        ),
        g AS (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(a) - 1),
                          i -> a[i])) AS w1,
                   unnest(list_transform(generate_series(1, len(a) - 1),
                          i -> a[i] || ' ' || a[i+1])) AS bigram
            FROM w
        ),
        cb AS (SELECT bigram, COUNT(*) AS c2 FROM g GROUP BY bigram),
        c1 AS (SELECT w1, COUNT(*) AS c1 FROM g GROUP BY w1),
        scored AS (
            SELECT g.doc_id, -ln(cb.c2 / c1.c1) AS nll
            FROM g JOIN cb USING (bigram) JOIN c1 USING (w1)
            WHERE g.doc_id < 150
        )
        SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(nll), 4) AS avg_nll
        FROM scored GROUP BY doc_id
    """,
    "pii_scrub": f"""
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM({_PII_SQL_COUNT['email']}) AS BIGINT) AS n_email,
               CAST(SUM({_PII_SQL_COUNT['ipv4']}) AS BIGINT) AS n_ipv4,
               CAST(SUM({_PII_SQL_COUNT['phone']}) AS BIGINT) AS n_phone,
               COUNT(*) FILTER ({_PII_SQL_COUNT['email']}
                                + {_PII_SQL_COUNT['ipv4']}
                                + {_PII_SQL_COUNT['phone']} > 0) AS n_docs_pii,
               CAST(SUM(strlen({_PII_SQL_REDACT})) AS BIGINT) AS redacted_chars
        FROM documents GROUP BY source
    """,
}

ORACLES["doc_chunks"] = """
    WITH starts AS (
        SELECT doc_id, text,
               UNNEST(GENERATE_SERIES(1, GREATEST(LENGTH(text), 1), 150)) AS s
        FROM documents
    )
    SELECT doc_id,
           CAST((s - 1) / 150 AS INT) AS chunk_id,
           CAST(s AS INT) AS chunk_start,
           CAST(LENGTH(SUBSTR(text, s, 200)) AS BIGINT) AS chunk_len,
           MD5(SUBSTR(text, s, 200)) AS chunk_md5
    FROM starts
"""
