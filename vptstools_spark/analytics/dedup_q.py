"""Deduplication queries: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine — each verified against a DuckDB oracle built from the same
deterministic md5 hash family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vptstools_spark.io import fan_out, table
from vptstools_spark.operators.dedup import (
    duplicate_spans,
    exact_dedup_stats,
    jaccard_pairs,
    lsh_candidates,
    lsh_verified_dedup,
    minhash_signatures,
    shingles,
    simhash16,
)
from vptstools_spark.operators.graph import connected_components
from vptstools_spark.operators.simjoin import similarity_join
from vptstools_spark.operators.similarity import cosine_pairs_blocked

NUM_HASHES = 8
ROWS_PER_BAND = 2
SIMJOIN_T = 0.7


def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return exact_dedup_stats(table(spark, sf, "documents"))


def q_dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Exact 3-shingle Jaccard >= 0.8 pairs via `near_dup_pairs`: exact-
    text collapse BEFORE shingling (replica factor never reaches the
    Python kernel or the stats aggregate), then the routed exact core
    (operators/dedup.py:jaccard_pairs — bitmask when the shared-shingle
    domain is <= 63, per-shingle equi-join otherwise)."""
    from vptstools_spark.operators.dedup import near_dup_pairs

    return near_dup_pairs(
        fan_out(table(spark, sf, "documents")), k=3, threshold=0.8
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    sh = shingles(fan_out(table(spark, sf, "documents")), k=3)
    sigs = minhash_signatures(sh, NUM_HASHES)
    return lsh_candidates(sigs, NUM_HASHES, ROWS_PER_BAND)


def q_dedup_lsh_verified(spark: SparkSession, sf: str) -> DataFrame:
    """The corpus-scale near-dup default: MinHash-LSH candidate generation →
    exact Jaccard verification on the candidate pairs ONLY. The quadratic
    verify cost of `dedup_ngram_jaccard` shrinks to the LSH candidate count;
    recall is bounded by banding (pairs missed by every band are missed
    here — the measured scale/recall trade). The shared shingle subtree is
    persisted inside `lsh_verified_dedup` so it executes once, not once per
    consumer (VERDICT r4 #2)."""
    return lsh_verified_dedup(
        fan_out(table(spark, sf, "documents")),
        k=3,
        num_hashes=NUM_HASHES,
        rows_per_band=ROWS_PER_BAND,
        threshold=0.8,
    )


def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    d = table(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return simhash16(d)


def q_dedup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-granularity duplication census: exact duplicate 8-token
    spans across documents (rolling window → md5 → one groupBy)."""
    return duplicate_spans(fan_out(table(spark, sf, "documents")), k=8)


def q_dedup_embedding(spark: SparkSession, sf: str) -> DataFrame:
    return cosine_pairs_blocked(table(spark, sf, "embeddings"), threshold=0.45)


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """LSH candidate pairs → canonical duplicate clusters: distributed
    connected components (min-label propagation, `operators/graph.py`).
    cluster_id = min doc_id in the component."""
    sh = shingles(fan_out(table(spark, sf, "documents")), k=3)
    sigs = minhash_signatures(sh, NUM_HASHES)
    pairs = lsh_candidates(sigs, NUM_HASHES, ROWS_PER_BAND)
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    return cc.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def q_dedup_cluster_sizes(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-size census over the near-dup components — the number a
    curation run actually reports: keep-one-per-cluster drops
    Σ (size−1)·n_clusters documents, and the size histogram shows whether
    duplication is pairwise noise or boilerplate families. One extra
    two-level aggregate over the connected-components output."""
    sh = shingles(fan_out(table(spark, sf, "documents")), k=3)
    sigs = minhash_signatures(sh, NUM_HASHES)
    pairs = lsh_candidates(sigs, NUM_HASHES, ROWS_PER_BAND)
    cc = connected_components(pairs, src="doc_a", dst="doc_b")
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .withColumn(
            "docs_dropped",
            ((F.col("cluster_size") - 1) * F.col("n_clusters")).cast("long"),
        )
        .orderBy("cluster_size")
    )


_SHINGLE_SQL = """
        words AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
            FROM words, UNNEST(range(1, len(w) - 1)) AS t(i)
            WHERE len(w) >= 3
        )
"""


def _bands_cte_body() -> str:
    """Shared WITH-body: shingle → minhash → LSH bands (oracle mirror of
    `minhash_signatures` + `lsh_candidates`)."""
    mins = ", ".join(
        "MIN(substr(md5('0#' || shingle), {start}, 4)) AS h{i}".format(
            start=i * 4 + 1, i=i
        )
        for i in range(NUM_HASHES)
    )
    n_bands = NUM_HASHES // ROWS_PER_BAND
    band_rows = " UNION ALL ".join(
        "SELECT id, {b} AS band_id, md5(h{i} || h{j}) AS bh FROM mh".format(
            b=b, i=b * ROWS_PER_BAND, j=b * ROWS_PER_BAND + 1
        )
        for b in range(n_bands)
    )
    return f"""{_SHINGLE_SQL},
        mh AS (SELECT doc_id AS id, {mins} FROM sh GROUP BY doc_id),
        bands AS ({band_rows})"""


def _minhash_sql() -> str:
    return f"""
        WITH {_bands_cte_body()}
        SELECT a.id AS doc_a, b.id AS doc_b, COUNT(*) AS n_shared_bands
        FROM bands a
        JOIN bands b ON a.band_id = b.band_id AND a.bh = b.bh AND a.id < b.id
        GROUP BY 1, 2
    """


def _clusters_sql() -> str:
    """Transitive closure of the LSH pair graph via recursive CTE; per node
    the minimum reachable id = the Spark side's min-label component."""
    return f"""
        WITH RECURSIVE {_bands_cte_body()},
        pairs AS (
            SELECT a.id AS doc_a, b.id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id AND a.bh = b.bh AND a.id < b.id
            GROUP BY 1, 2
        ),
        edges AS (
            SELECT doc_a AS u, doc_b AS v FROM pairs
            UNION
            SELECT doc_b AS u, doc_a AS v FROM pairs
        ),
        reach(node, lab) AS (
            SELECT u, u FROM (SELECT DISTINCT u FROM edges)
            UNION
            SELECT e.v, r.lab FROM reach r JOIN edges e ON e.u = r.node
        )
        SELECT node AS doc_id, MIN(lab) AS cluster_id FROM reach GROUP BY node
    """


def _simhash_sql() -> str:
    dims = ",\n               ".join(
        f"SUM(strpos('0123456789abcdef', substr(hw, {d + 1}, 1)) - 8.5) AS d{d}"
        for d in range(16)
    )
    bits = ", ".join(
        f"CASE WHEN d{d} > 0 THEN '1' ELSE '0' END" for d in range(16)
    )
    return f"""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS w
            FROM documents WHERE doc_id < 100
        ),
        h AS (SELECT doc_id, md5(w) AS hw FROM tok),
        dims AS (
            SELECT doc_id,
               {dims}
            FROM h GROUP BY doc_id
        )
        SELECT doc_id AS id, concat({bits}) AS simhash16 FROM dims
    """


def q_dedup_canonical(spark: SparkSession, sf: str) -> DataFrame:
    """Survivor selection — the final stage of the dedup pipeline: per
    exact-duplicate group (normalized fingerprint), keep the longest doc
    (ties → lowest doc_id), and report kept/removed counts per source of
    the survivor. `max_by` over a struct gives single-pass argmax semantics
    with deterministic tie-breaking; one shuffle on the fingerprint."""
    from vptstools_spark.operators.text import fingerprint

    d = table(spark, sf, "documents")
    ranked = d.select(
        "doc_id",
        "source",
        "n_chars",
        fingerprint(F.col("text")).alias("fp"),
    )
    survivors = ranked.groupBy("fp").agg(
        F.count("*").alias("n_copies"),
        F.max_by(
            "source",
            F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg_id")),
        ).alias("source"),
    )
    return survivors.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.sum(F.col("n_copies") - 1).cast("long").alias("n_removed"),
    )


def q_simjoin_prefix(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-threshold set-similarity join via prefix filtering
    (operators/simjoin.py — PPJoin-lite): every doc pair with token-set
    Jaccard ≥ 0.7, summarized as a per-0.1-band pair histogram (the pair
    list itself is O(dup-density·n) — the histogram keeps the correctness
    artifact small while still pinning every pair's banded value)."""
    pairs = similarity_join(table(spark, sf, "documents"), threshold=SIMJOIN_T)
    return (
        pairs.groupBy(F.floor(F.col("jaccard") * 10).cast("int").alias("band"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("band")
    )


_SIMJOIN_ORACLE = f"""
WITH toks AS (
  SELECT DISTINCT doc_id AS id, w FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
), dfw AS (SELECT w, COUNT(*) AS df FROM toks GROUP BY 1),
ranked AS (
  SELECT id, w,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY df ASC, w ASC) AS pos,
         COUNT(*) OVER (PARTITION BY id) AS sz
  FROM toks JOIN dfw USING (w)
), prefix AS (
  -- -1e-9 before each CEIL: guard against t*sz double-rounding just above
  -- an exact integer (mirrors operators/simjoin.py _EPS)
  SELECT id, w, pos, sz FROM ranked
  WHERE pos <= sz - CEIL({SIMJOIN_T} * sz - 1e-9) + 1
), cand AS (
  SELECT DISTINCT a.id AS da, b.id AS db, a.sz AS sa, b.sz AS sb
  FROM prefix a JOIN prefix b ON a.w = b.w AND a.id < b.id
   AND LEAST(a.sz, b.sz) >= CEIL({SIMJOIN_T} * GREATEST(a.sz, b.sz) - 1e-9)
   -- PPJoin positional filter: achievable overlap from this matched token
   AND 1 + LEAST(a.sz - a.pos, b.sz - b.pos)
       >= CEIL({SIMJOIN_T} / (1 + {SIMJOIN_T}) * (a.sz + b.sz) - 1e-9)
), common AS (
  SELECT da, db, sa, sb, COUNT(*) AS c
  FROM cand
  JOIN toks ta ON ta.id = da
  JOIN toks tb ON tb.id = db AND tb.w = ta.w
  GROUP BY 1, 2, 3, 4
), pairs AS (
  SELECT ROUND(CAST(c AS DOUBLE) / CAST(sa + sb - c AS DOUBLE), 4) AS jaccard
  FROM common
  WHERE CAST(c AS DOUBLE) / CAST(sa + sb - c AS DOUBLE) >= {SIMJOIN_T}
)
SELECT CAST(FLOOR(jaccard * 10) AS INT) AS band, COUNT(*) AS n_pairs
FROM pairs GROUP BY 1 ORDER BY band
"""


def q_dedup_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-best exact dedup (`operators/dedup.py:dedup_keep_best`):
    duplicate groups keep the copy with the highest quality score
    (token count here), lowest-id on ties — the production selection
    rule (min-id dedup throws away the richer copy whenever ingest
    order is unlucky). Census over the kept set; the oracle re-derives
    the same argmax with a window in SQL."""
    from vptstools_spark.operators.dedup import dedup_keep_best

    d = table(spark, sf, "documents")
    score = F.size(F.filter(F.split("text", " "), lambda t: t != F.lit("")))
    kept = dedup_keep_best(d, score.cast("long"))
    return kept.agg(
        F.count("*").alias("n_kept"),
        F.sum("kept_id").cast("long").alias("kept_id_sum"),
        F.sum("kept_score").cast("long").alias("score_sum"),
        F.sum("n_copies").cast("long").alias("n_docs"),
    )





def q_dedup_containment(spark: SparkSession, sf: str) -> DataFrame:
    """Asymmetric near-SUBSET dedup
    (`operators/dedup.py:containment_pairs`): containment
    |A∩B|/min(|A|,|B|) ≥ 0.7 over 3-shingle sets — the web-corpus
    signal Jaccard misses when one document embeds another. Shares the
    exact-pair plan (replica collapse, df>1 pruning); the oracle
    recomputes the asymmetric score directly."""
    from vptstools_spark.operators.dedup import near_dup_pairs

    return near_dup_pairs(
        fan_out(table(spark, sf, "documents")),
        k=3,
        measure="containment",
        threshold=0.7,
    )


_ILSH_CACHE: dict = {}


def q_dedup_incremental_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-run NEAR-dup admission
    (`operators/dedup.py:incremental_lsh_dedup`): the corpus ingests in
    two id-ordered shards against a persistent LSH registry holding only
    derived state (band rows + 64-bit shingle hashes) for ADMITTED docs.
    Shard 2's probe joins the registry's band rows — admitted history is
    never re-shingled — and a doc is rejected iff exact-verified similar
    to a smaller-id doc in its shard or the registry (min-id dominance).
    The oracle replays both phases analytically, including the subtlety
    that a shard-2 doc similar ONLY to a shard-1 REJECT must be admitted
    (rejects leave no registry state). Per-run cost is O(batch +
    collisions), independent of corpus age — the production ingest-dedup
    shape at 100 TB."""
    import tempfile

    from vptstools_spark.operators.dedup import incremental_lsh_dedup

    key = ("ilsh", sf)
    if key not in _ILSH_CACHE:
        docs = table(spark, sf, "documents")
        reg = tempfile.mkdtemp(prefix="ilsh_reg_")
        a0, r0 = incremental_lsh_dedup(
            spark, reg, docs.filter(F.col("doc_id") < 300)
        )
        a1, r1 = incremental_lsh_dedup(
            spark, reg, docs.filter(F.col("doc_id") >= 300)
        )
        s0 = a0.agg(F.sum("doc_id")).collect()[0][0] or 0
        s1 = a1.agg(F.sum("doc_id")).collect()[0][0] or 0
        _ILSH_CACHE[key] = [
            ("b0_admitted", int(r0["n_admitted"])),
            ("b0_rejected", int(r0["n_rejected"])),
            ("b0_id_sum", int(s0)),
            ("b1_admitted", int(r1["n_admitted"])),
            ("b1_rejected", int(r1["n_rejected"])),
            ("b1_id_sum", int(s1)),
        ]
    return spark.createDataFrame(
        _ILSH_CACHE[key], "metric string, value long"
    ).orderBy("metric")


QUERIES = {
    "dedup_incremental_lsh": q_dedup_incremental_lsh,
    "dedup_containment": q_dedup_containment,
    "dedup_keep_best": q_dedup_keep_best,
    "dedup_exact": q_dedup_exact,
    "simjoin_prefix": q_simjoin_prefix,
    "dedup_canonical": q_dedup_canonical,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_lsh_verified": q_dedup_lsh_verified,
    "dedup_simhash": q_dedup_simhash,
    "dedup_spans": q_dedup_spans,
    "dedup_embedding": q_dedup_embedding,
    "dedup_clusters": q_dedup_clusters,
    "dedup_cluster_sizes": q_dedup_cluster_sizes,
}

ORACLES = {
    "dedup_containment": f"""
        WITH {_SHINGLE_SQL},
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               ROUND(CAST(c AS DOUBLE) / LEAST(x.n, y.n), 4) AS containment
        FROM pairs
        JOIN sz x ON x.doc_id = doc_a
        JOIN sz y ON y.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / LEAST(x.n, y.n) >= 0.7
    """,
    "dedup_incremental_lsh": f"""
        WITH {_bands_cte_body()},
        sz AS (SELECT doc_id AS id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        allpairs AS (
            SELECT a.id AS doc_a, b.id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id AND a.bh = b.bh
                        AND a.id < b.id
            GROUP BY 1, 2
        ),
        jac AS (
            SELECT p.doc_a, p.doc_b,
                   CAST(COUNT(*) AS DOUBLE)
                       / (x.n + y.n - COUNT(*)) AS j
            FROM allpairs p
            JOIN sh a ON a.doc_id = p.doc_a
            JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
            JOIN sz x ON x.id = p.doc_a
            JOIN sz y ON y.id = p.doc_b
            GROUP BY p.doc_a, p.doc_b, x.n, y.n
        ),
        ver AS (SELECT doc_a, doc_b FROM jac WHERE j >= 0.8),
        rej0 AS (
            SELECT DISTINCT doc_b AS id FROM ver
            WHERE doc_a < 300 AND doc_b < 300
        ),
        adm0 AS (
            SELECT doc_id AS id FROM documents
            WHERE doc_id < 300
              AND doc_id NOT IN (SELECT id FROM rej0)
        ),
        rej1 AS (
            SELECT DISTINCT doc_b AS id FROM ver
            WHERE doc_b >= 300
              AND (doc_a >= 300 OR doc_a IN (SELECT id FROM adm0))
        ),
        adm1 AS (
            SELECT doc_id AS id FROM documents
            WHERE doc_id >= 300
              AND doc_id NOT IN (SELECT id FROM rej1)
        )
        SELECT metric, value FROM (
            SELECT 'b0_admitted' AS metric,
                   CAST((SELECT COUNT(*) FROM adm0) AS BIGINT) AS value
            UNION ALL SELECT 'b0_rejected',
                   CAST((SELECT COUNT(*) FROM rej0) AS BIGINT)
            UNION ALL SELECT 'b0_id_sum',
                   CAST((SELECT COALESCE(SUM(id), 0) FROM adm0) AS BIGINT)
            UNION ALL SELECT 'b1_admitted',
                   CAST((SELECT COUNT(*) FROM adm1) AS BIGINT)
            UNION ALL SELECT 'b1_rejected',
                   CAST((SELECT COUNT(*) FROM rej1) AS BIGINT)
            UNION ALL SELECT 'b1_id_sum',
                   CAST((SELECT COALESCE(SUM(id), 0) FROM adm1) AS BIGINT)
        ) ORDER BY metric
    """,
    "simjoin_prefix": _SIMJOIN_ORACLE,
    "dedup_canonical": """
        WITH h AS (
            SELECT doc_id, source, n_chars,
                   md5(lower(trim(text))) AS fp
            FROM documents
        ),
        s AS (
            SELECT fp, source, n_copies FROM (
                SELECT fp, source,
                       COUNT(*) OVER (PARTITION BY fp) AS n_copies,
                       ROW_NUMBER() OVER (PARTITION BY fp
                                          ORDER BY n_chars DESC, doc_id) AS rn
                FROM h
            ) WHERE rn = 1
        )
        SELECT source,
               COUNT(*) AS n_kept,
               CAST(SUM(n_copies - 1) AS BIGINT) AS n_removed
        FROM s GROUP BY source
    """,
    "dedup_keep_best": """
        WITH h AS (
            SELECT doc_id, md5(lower(trim(text))) AS fp,
                   len(list_filter(string_split(text, ' '), x -> x <> '')) AS score
            FROM documents
        ), r AS (
            SELECT fp, doc_id, score,
                   ROW_NUMBER() OVER (
                       PARTITION BY fp ORDER BY score DESC, doc_id ASC
                   ) AS rn,
                   COUNT(*) OVER (PARTITION BY fp) AS nc
            FROM h
        )
        SELECT COUNT(*) AS n_kept,
               CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum,
               CAST(SUM(score) AS BIGINT) AS score_sum,
               CAST(SUM(nc) AS BIGINT) AS n_docs
        FROM r WHERE rn = 1
    """,
    "dedup_exact": """
        WITH h AS (SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents),
        g AS (SELECT fp, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
              FROM h GROUP BY fp)
        SELECT COUNT(*) AS n_groups,
               CAST(SUM(n_copies) AS BIGINT) AS n_docs,
               CAST(SUM(n_copies - 1) AS BIGINT) AS n_duplicates
        FROM g
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_SHINGLE_SQL},
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               ROUND(CAST(c AS DOUBLE) / (x.n + y.n - c), 4) AS jaccard
        FROM pairs
        JOIN sz x ON x.doc_id = doc_a
        JOIN sz y ON y.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (x.n + y.n - c) >= 0.8
    """,
    "dedup_minhash_lsh": _minhash_sql(),
    "dedup_lsh_verified": f"""
        WITH {_bands_cte_body()},
        cand AS (
            SELECT a.id AS doc_a, b.id AS doc_b
            FROM bands a
            JOIN bands b ON a.band_id = b.band_id AND a.bh = b.bh AND a.id < b.id
            GROUP BY 1, 2
        ),
        sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        common AS (
            SELECT c.doc_a, c.doc_b, COUNT(*) AS c
            FROM cand c
            JOIN sh a ON a.doc_id = c.doc_a
            JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
            GROUP BY 1, 2
        )
        SELECT doc_a, doc_b,
               ROUND(CAST(c AS DOUBLE) / (x.n + y.n - c), 4) AS jaccard
        FROM common
        JOIN sz x ON x.doc_id = doc_a
        JOIN sz y ON y.doc_id = doc_b
        WHERE CAST(c AS DOUBLE) / (x.n + y.n - c) >= 0.8
    """,
    "dedup_clusters": _clusters_sql(),
    "dedup_cluster_sizes": f"""
        WITH cc AS ({_clusters_sql()}),
        sizes AS (
            SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id
        )
        SELECT cluster_size,
               COUNT(*) AS n_clusters,
               CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS docs_dropped
        FROM sizes GROUP BY cluster_size ORDER BY cluster_size
    """,
    "dedup_simhash": _simhash_sql(),
    "dedup_spans": """
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        spans AS (
            SELECT DISTINCT doc_id,
                   md5(array_to_string(w[i:i+7], ' ')) AS span
            FROM w, UNNEST(range(1, len(w) - 8 + 2)) AS t(i)
            WHERE len(w) >= 8
        ),
        span_df AS (SELECT span, COUNT(*) AS n_docs FROM spans GROUP BY span),
        dup AS (SELECT span FROM span_df WHERE n_docs > 1)
        SELECT (SELECT COUNT(*) FROM span_df) AS n_distinct_spans,
               (SELECT COUNT(*) FROM dup) AS n_dup_spans,
               (SELECT COUNT(DISTINCT doc_id)
                FROM spans JOIN dup USING (span)) AS n_affected_docs
    """,
    "dedup_embedding": """
        WITH e AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS n FROM e GROUP BY vec_id),
        dots AS (
            SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.v * b.v) AS d
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2
        )
        SELECT vec_a, vec_b, ROUND(d / (x.n * y.n), 4) AS cosine
        FROM dots JOIN nrm x ON x.vec_id = vec_a JOIN nrm y ON y.vec_id = vec_b
        WHERE ROUND(d / (x.n * y.n), 4) >= 0.45
    """,
}


def q_dup_rate_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-duplicate census PER SOURCE — the corpus-QA breakdown of
    `dedup_exact`'s global number (which crawl/source ships the copies).
    One fingerprint fold keyed by (source, fp), then a source-sized
    rollup."""
    from vptstools_spark.operators.text import fingerprint

    d = table(spark, sf, "documents")
    g = d.select(
        "source", fingerprint(F.col("text")).alias("fp")
    ).groupBy("source", "fp").agg(F.count("*").alias("c"))
    return (
        g.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.count("*").alias("n_unique"),
            F.sum(F.col("c") - 1).cast("long").alias("n_duplicates"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            "n_duplicates",
            F.round(F.col("n_duplicates") / F.col("n_docs"), 6).alias(
                "dup_rate"
            ),
        )
        .orderBy("source")
    )


ORACLES["dup_rate_by_source"] = """
    WITH g AS (
        SELECT source,
               md5(lower(trim(text))) AS fp,
               COUNT(*) AS c
        FROM documents GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_docs,
           COUNT(*) AS n_unique,
           CAST(SUM(c - 1) AS BIGINT) AS n_duplicates,
           ROUND(SUM(c - 1) * 1.0 / SUM(c), 6) AS dup_rate
    FROM g GROUP BY source ORDER BY source
"""
QUERIES["dup_rate_by_source"] = q_dup_rate_by_source
