"""Similarity-search queries: exact brute-force cosine top-k baseline and the
anchor/LSH bucketing scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vptstools_spark.io import fan_out, table
from vptstools_spark.operators.similarity import (
    anchor_buckets,
    ivf_cells,
    kmeans_fit,
    knn_bruteforce,
    knn_ivf,
    knn_ivf_rerank,
    pq_encode,
    pq_fit,
)

N_QUERIES = 5
K = 5
N_ANCHORS = 4
COV_DIMS = 8


def q_emb_covariance(spark: SparkSession, sf: str) -> DataFrame:
    """Population covariance matrix of the first COV_DIMS embedding
    dimensions via the mergeable mapInPandas Gramian
    (operators/linalg.py): blocked numpy X^T X per Arrow batch ->
    constant-size moment rows -> one partial->final SUM -> closed form.
    The dimension slice is pushed INTO the kernel, so the full 64x64
    Gramian is never materialized."""
    from vptstools_spark.operators.linalg import covariance_matrix

    emb = table(spark, sf, "embeddings")
    out = covariance_matrix(emb, "embedding", dims=COV_DIMS)
    return out.select("i", "j", F.round("cov", 6).alias("cov"))


def q_pca_loadings(spark: SparkSession, sf: str) -> DataFrame:
    """Leading principal component of the first COV_DIMS embedding dims:
    power iteration (3 fixed rounds, e_1 init) over the mergeable
    covariance (`operators/linalg.py:pca_top_component`). One data pass;
    iterations run on the d x d matrix only."""
    from vptstools_spark.operators.linalg import pca_top_component

    emb = table(spark, sf, "embeddings")
    out = pca_top_component(emb, "embedding", dims=COV_DIMS, iters=3)
    return out.select("i", F.round("loading", 6).alias("loading"))


def q_knn_bruteforce(spark: SparkSession, sf: str) -> DataFrame:
    emb = table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return knn_bruteforce(emb, queries, k=K)


def q_ann_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Random-hyperplane LSH bucketing with data-derived anchors (vec_id<4):
    bucket histogram. The anchors are a driver-side constant (4×64 floats →
    plan literals), so bucketing is a narrow map at any corpus size."""
    emb = table(spark, sf, "embeddings")
    anchor_rows = (
        emb.filter(F.col("vec_id") < N_ANCHORS).orderBy("vec_id").collect()
    )
    anchors = [[float(x) for x in r["embedding"]] for r in anchor_rows]
    buckets = anchor_buckets(emb, anchors)
    return buckets.groupBy("bucket").agg(F.count("*").alias("n_vectors"))


def _anchors(spark: SparkSession, sf: str) -> list[list[float]]:
    emb = table(spark, sf, "embeddings")
    rows = emb.filter(F.col("vec_id") < N_ANCHORS).orderBy("vec_id").collect()
    return [[float(x) for x in r["embedding"]] for r in rows]


def q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN: nearest-centroid cell per corpus vector, queries probe
    their 2 nearest cells, exact cosine inside the probed subset — the
    equi-join-on-cell scale path next to `knn_bruteforce`'s cross product."""
    emb = table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return knn_ivf(fan_out(emb), queries, _anchor_vectors(spark, sf), k=K, nprobe=2)


def q_ann_filtered(spark: SparkSession, sf: str) -> DataFrame:
    """Filtered vector search — the vector-DB "metadata WHERE clause": IVF
    top-k over only the vectors whose document (vec_id ≡ doc_id) has
    lang='en'. PRE-filter semantics: the predicate restricts the index side
    BEFORE the cell equi-join, so all k results satisfy the filter and k is
    always reached from the eligible set (post-filtering the top-k would
    return < k under a selective predicate). Cell assignment is per-vector,
    so filtering commutes with indexing — the oracle pins that. The
    metadata semi-join is a plain equi-join (AQE broadcasts it when the
    filtered id set is small; shuffles when it is not)."""
    emb = table(spark, sf, "embeddings")
    en_ids = (
        table(spark, sf, "documents")
        .filter(F.col("lang") == "en")
        .select(F.col("doc_id").alias("vec_id"))
    )
    corpus = emb.join(en_ids, "vec_id", "left_semi")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return knn_ivf(
        fan_out(corpus), queries, _anchor_vectors(spark, sf), k=K, nprobe=2
    )


def q_ann_ivf_rerank(spark: SparkSession, sf: str) -> DataFrame:
    """Full approximate-search composition: IVF cell join → coarse top-1000
    shortlist → exact re-rank. Shortlist width exceeds any probed cell here,
    so the result must equal `ann_ivf` — which is exactly what the shared
    oracle asserts; shrinking `rerank` is the scale knob."""
    emb = table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return knn_ivf_rerank(
        fan_out(emb), queries, _anchor_vectors(spark, sf), k=K, nprobe=2, rerank=1000
    )


def q_ann_kmeans_cells(spark: SparkSession, sf: str) -> DataFrame:
    """Trained IVF index build: spherical k-means (k=8, 2 Lloyd rounds) over
    the corpus, then the cell histogram of the resulting inverted index.
    Deterministic (fixed first-k init + fixed round count), so it has a full
    value oracle: the Lloyd rounds unrolled as chained SQL CTEs; the
    operator is also unit-tested on known geometry
    (tests/test_similarity.py::test_kmeans_fit_separates_clusters)."""
    # r10 (guide §5): the fit makes 1 init collect + 2 Lloyd-round
    # collects and the histogram a 4th pass — each re-ran the scan and
    # fan_out's round-robin exchange. The lazy checkpoint materializes
    # the fanned-out vectors once (under the init collect) and every
    # later pass reads the cache; the model itself is still recomputed
    # from parquet on every query run (no cross-run state).
    emb = fan_out(table(spark, sf, "embeddings")).localCheckpoint(eager=False)
    cents = kmeans_fit(emb, k=8, iters=2)
    cells = ivf_cells(emb, cents, nprobe=1)
    return (
        cells.select(F.col("cells")[0].alias("cell"))
        .groupBy("cell")
        .agg(F.count("*").alias("n_vectors"))
    )


_PQ_M = 2
_PQ_K = 4
_PQ_ITERS = 2


#: session-scoped memo for deterministic trained models. Every entry is a
#: pure function of (sf_dir, hyperparams) — fixed first-k-by-id init, fixed
#: round count — so caching cannot change any query's result; it only stops
#: the sweep from re-running identical Lloyd iterations in every PQ query.
#: Keyed by sf_dir: a different dataset directory is a different model.
_MODEL_CACHE: dict[tuple, object] = {}


def _pq_books(spark: SparkSession, sf: str) -> list:
    key = ("pq", sf, _PQ_M, _PQ_K, _PQ_ITERS)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = pq_fit(
            fan_out(table(spark, sf, "embeddings")), m=_PQ_M, k=_PQ_K, iters=_PQ_ITERS
        )
    return _MODEL_CACHE[key]


def _anchor_vectors(spark: SparkSession, sf: str) -> list[list[float]]:
    key = ("anchors", sf)
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = _anchors(spark, sf)
    return _MODEL_CACHE[key]


def q_embedding_pq(spark: SparkSession, sf: str) -> DataFrame:
    """Product quantization (Jégou et al. 2011): train per-subspace L2
    codebooks (m=2 subspaces, k=4, 2 Lloyd rounds, deterministic first-k
    init), encode the corpus, and report the per-(subspace, code) histogram
    with mean quantization distortion. Training is model-to-driver only
    (m×k×dim/m floats); encoding is an all-JVM narrow map over plan-literal
    centroids. Deterministic end to end, so fully value-oracled — the Lloyd
    rounds unroll as chained SQL CTEs per subspace."""
    emb = fan_out(table(spark, sf, "embeddings"))
    books = _pq_books(spark, sf)
    enc = pq_encode(emb, books)
    rows = enc.select(
        F.posexplode("codes").alias("subspace", "code"),
        F.col("sqdists"),
    ).select("subspace", "code", F.col("sqdists")[F.col("subspace")].alias("sqdist"))
    return rows.groupBy("subspace", "code").agg(
        F.count("*").alias("n_vectors"),
        F.round(F.avg("sqdist"), 4).alias("avg_sqdist"),
    )


def q_knn_pq(spark: SparkSession, sf: str) -> DataFrame:
    """ADC search over PQ codes: exact per-subspace query→centroid lookup
    tables, corpus scored by m table lookups per vector (raw floats never
    read at query time). Deterministic (fixed-init codebooks + id
    tie-breaks), so fully value-oracled — codes and LUT distances re-derived
    in SQL from the same unrolled Lloyd CTEs."""
    from vptstools_spark.operators.similarity import knn_pq_adc

    emb = fan_out(table(spark, sf, "embeddings"))
    books = _pq_books(spark, sf)
    queries = table(spark, sf, "embeddings").filter(F.col("vec_id") < N_QUERIES)
    return knn_pq_adc(emb, queries, books, k=K)


def q_knn_ivfpq(spark: SparkSession, sf: str) -> DataFrame:
    """IVF+PQ composed: coarse cells restrict candidates (equi-join on the
    probed cell ids), ADC ranks them from codes alone — the architecture a
    billion-vector deployment runs, assembled from the engine's own coarse
    quantizer and codebooks. Deterministic throughout, fully value-oracled
    (ann_ivf's cell CTEs + knn_pq's Lloyd/LUT CTEs composed in SQL)."""
    from vptstools_spark.operators.similarity import knn_ivfpq

    emb = fan_out(table(spark, sf, "embeddings"))
    books = _pq_books(spark, sf)
    queries = table(spark, sf, "embeddings").filter(F.col("vec_id") < N_QUERIES)
    return knn_ivfpq(emb, queries, _anchor_vectors(spark, sf), books, k=K, nprobe=2)


def q_knn_ivfpq_persisted(spark: SparkSession, sf: str) -> DataFrame:
    """The persisted-index serving path (`operators/ann_index.py`): build
    the cell-partitioned codes table + model sidecar once, then search it
    with planning-time partition pruning. Same model, same ADC math, so the
    oracle is knn_ivfpq's — exact result equality between the in-memory and
    on-storage paths is itself the property under test."""
    import tempfile

    from vptstools_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )

    queries = table(spark, sf, "embeddings").filter(F.col("vec_id") < N_QUERIES)
    # the built index is a pure function of (sf, anchors, codebooks): build
    # it once per session (model-cache discipline, same as _pq_books) —
    # serving-path searches should pay search cost, not rebuild cost
    key = ("ivfpq_index", sf)
    if key not in _MODEL_CACHE:
        emb = fan_out(table(spark, sf, "embeddings"))
        path = tempfile.mkdtemp(prefix="ivfpq_index_")
        build_ivfpq_index(emb, path, _anchor_vectors(spark, sf), _pq_books(spark, sf))
        _MODEL_CACHE[key] = path
    return search_ivfpq_index(spark, _MODEL_CACHE[key], queries, k=K, nprobe=2)


def q_pq_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of the IVF+PQ path against exact brute force — the quality
    dial for the compressed index (how much the coarse cells + 8-byte codes
    give up vs full-precision cosine). Same shape as `ann_recall`; both
    sides are the engine's own operators and the oracle recomputes both
    rankings in SQL."""
    from vptstools_spark.operators.similarity import knn_ivfpq

    emb = table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    bf = knn_bruteforce(emb, queries, k=K).select("q_id", "n_id")
    books = _pq_books(spark, sf)
    apx = knn_ivfpq(
        fan_out(emb), queries, _anchor_vectors(spark, sf), books, k=K, nprobe=2
    ).select("q_id", "n_id")
    hits = bf.join(apx, ["q_id", "n_id"]).groupBy("q_id").agg(
        F.count("*").alias("n_hits")
    )
    return (
        bf.select("q_id")
        .distinct()
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(K), 4).alias("recall"),
        )
    )


def q_ann_recall(spark: SparkSession, sf: str) -> DataFrame:
    """Recall@k of the IVF approximate path against the exact brute-force
    top-k — the quality dial every ANN deployment must measure next to its
    speedup. Both sides are the engine's own operators; the join on
    (q_id, n_id) counts agreements per query. Scale shape: the exact side
    runs on a SAMPLE of queries in production — recall estimation never
    needs the full corpus."""
    emb = table(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    bf = knn_bruteforce(emb, queries, k=K).select("q_id", "n_id")
    ivf = knn_ivf(fan_out(emb), queries, _anchor_vectors(spark, sf), k=K, nprobe=2).select(
        "q_id", "n_id"
    )
    hits = bf.join(ivf, ["q_id", "n_id"]).groupBy("q_id").agg(
        F.count("*").alias("n_hits")
    )
    return (
        bf.select("q_id")
        .distinct()
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            F.round(F.coalesce("n_hits", F.lit(0)) / F.lit(K), 4).alias("recall"),
        )
    )


def q_embedding_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Vector-column profiling with higher-order array functions — size,
    L2 norm, max |x|, mean element — entirely JVM-side (transform /
    aggregate fold, deterministic summation order, no Python in the path)."""
    emb = table(spark, sf, "embeddings").filter(F.col("vec_id") < 100)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    sq = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    s = F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x)
    mx = F.array_max(F.transform(v, F.abs))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq), 4).alias("l2_norm"),
        F.round(mx, 4).alias("max_abs"),
        F.round(s / F.size("embedding"), 6).alias("mean_elem"),
    )


def q_embedding_quantize(spark: SparkSession, sf: str) -> DataFrame:
    """8-bit scalar-quantization error profile per dimension: min/max model,
    code = floor((x-mn)/(mx-mn)*255), reconstruction at the bin midpoint,
    mean |error|. One posexplode + a broadcast of the dim-sized stats table
    back onto the coordinates — the quantizer's quality dashboard."""
    emb = fan_out(table(spark, sf, "embeddings"))
    e = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("pos", "x"),
    )
    stats = e.groupBy("pos").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    code = F.floor((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255)
    recon = F.col("mn") + (code + 0.5) * (F.col("mx") - F.col("mn")) / 256
    return (
        e.join(F.broadcast(stats), "pos")
        .groupBy("pos")
        .agg(
            F.round(F.min("mn"), 4).alias("dim_min"),
            F.round(F.max("mx"), 4).alias("dim_max"),
            F.round(F.avg(F.abs(F.col("x") - recon)), 6).alias("mean_abs_err"),
        )
    )


# dict order = driver verification priority (analytics/__init__.all_queries
# round-robins one entry per family per round): newest capabilities first
# so they land inside any bounded checked prefix
QUERIES = {
    "knn_bruteforce": q_knn_bruteforce,
    "embedding_pq": q_embedding_pq,
    "knn_pq": q_knn_pq,
    "knn_ivfpq": q_knn_ivfpq,
    "knn_ivfpq_persisted": q_knn_ivfpq_persisted,
    "pq_recall": q_pq_recall,
    "ann_ivf": q_ann_ivf,
    "ann_filtered": q_ann_filtered,
    "embedding_quantize": q_embedding_quantize,
    "ann_buckets": q_ann_buckets,
    "ann_ivf_rerank": q_ann_ivf_rerank,
    "ann_kmeans_cells": q_ann_kmeans_cells,
    "ann_recall": q_ann_recall,
    "embedding_stats": q_embedding_stats,
    "emb_covariance": q_emb_covariance,
    "pca_loadings": q_pca_loadings,
}

ORACLES = {
    "embedding_quantize": """
        WITH e AS (
            SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS x
            FROM embeddings
        ),
        s AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM e GROUP BY pos),
        j AS (
            SELECT e.pos, e.x, s.mn, s.mx,
                   FLOOR((e.x - s.mn) / (s.mx - s.mn) * 255) AS code
            FROM e JOIN s ON e.pos = s.pos
        )
        SELECT pos,
               ROUND(MIN(mn), 4) AS dim_min,
               ROUND(MAX(mx), 4) AS dim_max,
               ROUND(AVG(ABS(x - (mn + (code + 0.5) * (mx - mn) / 256))), 6)
                   AS mean_abs_err
        FROM j GROUP BY pos
    """,
    "embedding_stats": """
        WITH e AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings WHERE vec_id < 100
        )
        SELECT vec_id,
               CAST(COUNT(*) AS INT) AS dim,
               ROUND(sqrt(SUM(v * v)), 4) AS l2_norm,
               ROUND(MAX(abs(v)), 4) AS max_abs,
               ROUND(SUM(v) / COUNT(*), 6) AS mean_elem
        FROM e GROUP BY vec_id
    """,
    "knn_bruteforce": f"""
        WITH e AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS n FROM e GROUP BY vec_id),
        q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
        dots AS (
            SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.v * e.v) AS d
            FROM q JOIN e ON q.i = e.i AND e.vec_id <> q.vec_id
            GROUP BY 1, 2
        ),
        cos AS (
            SELECT q_id, n_id, d / (a.n * b.n) AS c
            FROM dots JOIN nrm a ON a.vec_id = q_id JOIN nrm b ON b.vec_id = n_id
        ),
        r AS (
            SELECT q_id, n_id, ROUND(c, 4) AS cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rnk
            FROM cos
        )
        SELECT q_id, n_id, cosine, rnk FROM r WHERE rnk <= {K}
    """,
    "ann_buckets": f"""
        WITH e AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        a AS (SELECT vec_id AS aid, i, v AS av FROM e WHERE vec_id < {N_ANCHORS}),
        dots AS (
            SELECT e.vec_id, a.aid, SUM(e.v * a.av) AS d
            FROM e JOIN a ON e.i = a.i GROUP BY 1, 2
        ),
        b AS (
            SELECT vec_id,
                   string_agg(CASE WHEN d > 0 THEN '1' ELSE '0' END, '' ORDER BY aid) AS bucket
            FROM dots GROUP BY vec_id
        )
        SELECT bucket, COUNT(*) AS n_vectors FROM b GROUP BY bucket
    """,
    "ann_ivf": f"""
        WITH e AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS n FROM e GROUP BY vec_id),
        cdots AS (
            SELECT e.vec_id, c.vec_id AS j, SUM(e.v * c.v) AS d
            FROM e JOIN e c ON e.i = c.i AND c.vec_id < {N_ANCHORS}
            GROUP BY 1, 2
        ),
        ccos AS (
            SELECT cdots.vec_id, j, d / (a.n * b.n) AS c
            FROM cdots JOIN nrm a ON a.vec_id = cdots.vec_id
                       JOIN nrm b ON b.vec_id = j
        ),
        ranked AS (
            SELECT vec_id, j,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY c DESC, j DESC) AS rn
            FROM ccos
        ),
        cell AS (SELECT vec_id, j AS cell FROM ranked WHERE rn = 1),
        probe AS (SELECT vec_id AS q_id, j AS cell FROM ranked
                  WHERE rn <= 2 AND vec_id < {N_QUERIES}),
        cand AS (
            SELECT p.q_id, cl.vec_id AS n_id
            FROM probe p JOIN cell cl ON cl.cell = p.cell
            WHERE cl.vec_id <> p.q_id
        ),
        dots AS (
            SELECT q_id, n_id, SUM(a.v * b.v) AS d
            FROM cand JOIN e a ON a.vec_id = q_id
                      JOIN e b ON b.vec_id = n_id AND a.i = b.i
            GROUP BY 1, 2
        ),
        cos AS (
            SELECT q_id, n_id, d / (x.n * y.n) AS c
            FROM dots JOIN nrm x ON x.vec_id = q_id JOIN nrm y ON y.vec_id = n_id
        ),
        r AS (
            SELECT q_id, n_id, ROUND(c, 4) AS cosine,
                   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rnk
            FROM cos
        )
        SELECT q_id, n_id, cosine, rnk FROM r WHERE rnk <= {K}
    """,
}

# the re-rank composition with a full-width shortlist is defined to equal
# knn_ivf — assert that equality against the same SQL
ORACLES["ann_ivf_rerank"] = ORACLES["ann_ivf"]

# filtered search = the same IVF pipeline with the metadata predicate
# restricting the candidate (index) side — cell assignment is per-vector,
# so the oracle is ann_ivf's SQL with one extra join in `cand`
_CAND_CTE = """cand AS (
            SELECT p.q_id, cl.vec_id AS n_id
            FROM probe p JOIN cell cl ON cl.cell = p.cell
            WHERE cl.vec_id <> p.q_id
        ),"""
_CAND_FILTERED_CTE = """cand AS (
            SELECT p.q_id, cl.vec_id AS n_id
            FROM probe p JOIN cell cl ON cl.cell = p.cell
            JOIN documents dm ON dm.doc_id = cl.vec_id AND dm.lang = 'en'
            WHERE cl.vec_id <> p.q_id
        ),"""
assert _CAND_CTE in ORACLES["ann_ivf"], "ann_ivf oracle drifted from _CAND_CTE"
ORACLES["ann_filtered"] = ORACLES["ann_ivf"].replace(_CAND_CTE, _CAND_FILTERED_CTE)

# Lloyd's algorithm with FIXED init (first k vectors by vec_id) and a fixed
# round count is a deterministic function of the data, so even "iterative
# k-means" has a value oracle: each round is one assignment (argmax cosine,
# ties to the larger cell id — sort_array on (c, j) structs sorts both
# fields descending) + one per-dimension AVG, chained as CTEs. Empty cells
# keep their previous centroid (COALESCE against the prior round).
_KM_K = 8


def _km_assign(e: str, cents: str, out: str) -> str:
    """One Lloyd assignment round as SQL text: vectors `e` × centroids
    `cents` (j, i, cv) → `{out}` (vec_id, j) by argmax cosine."""
    return f"""
        {out}_cn AS (SELECT j, sqrt(SUM(cv * cv)) AS cn FROM {cents} GROUP BY j),
        {out}_d AS (
            SELECT e.vec_id, c.j, SUM(e.v * c.cv) AS d
            FROM {e} e JOIN {cents} c ON e.i = c.i
            GROUP BY 1, 2
        ),
        {out}_r AS (
            SELECT d.vec_id, d.j,
                   ROW_NUMBER() OVER (
                       PARTITION BY d.vec_id
                       ORDER BY d.d / (n.n * cn.cn) DESC, d.j DESC
                   ) AS rn
            FROM {out}_d d
            JOIN nrm n ON n.vec_id = d.vec_id
            JOIN {out}_cn cn ON cn.j = d.j
        ),
        {out} AS (SELECT vec_id, j FROM {out}_r WHERE rn = 1)
    """


def _km_update(e: str, assign: str, prev: str, out: str) -> str:
    """One Lloyd update round as SQL text: per-(cell, dim) mean of assigned
    vectors; cells with no members keep the `prev` centroid."""
    return f"""
        {out}_m AS (
            SELECT a.j, e.i, AVG(e.v) AS cv
            FROM {assign} a JOIN {e} e ON e.vec_id = a.vec_id
            GROUP BY 1, 2
        ),
        {out} AS (
            SELECT p.j, p.i, COALESCE(m.cv, p.cv) AS cv
            FROM {prev} p LEFT JOIN {out}_m m ON m.j = p.j AND m.i = p.i
        )
    """


# recall@k: both operator oracles composed as parenthesized subqueries
ORACLES["ann_recall"] = f"""
    WITH bf AS ({{bf}}),
    ivf AS ({{ivf}}),
    m AS (
        SELECT b.q_id, COUNT(*) AS n_hits
        FROM bf b JOIN ivf i ON b.q_id = i.q_id AND b.n_id = i.n_id
        GROUP BY 1
    )
    SELECT q.q_id,
           COALESCE(m.n_hits, 0) AS n_hits,
           ROUND(COALESCE(m.n_hits, 0) / {K}, 4) AS recall
    FROM (SELECT DISTINCT q_id FROM bf) q
    LEFT JOIN m USING (q_id)
""".format(bf=ORACLES["knn_bruteforce"], ivf=ORACLES["ann_ivf"])

ORACLES["ann_kmeans_cells"] = f"""
    WITH e AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS n FROM e GROUP BY vec_id),
    init_ids AS (
        SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j
        FROM (SELECT DISTINCT vec_id FROM e ORDER BY vec_id LIMIT {_KM_K})
    ),
    c0 AS (
        SELECT init_ids.j, e.i, e.v AS cv
        FROM init_ids JOIN e ON e.vec_id = init_ids.vec_id
    ),
    {_km_assign('e', 'c0', 'a1')},
    {_km_update('e', 'a1', 'c0', 'c1')},
    {_km_assign('e', 'c1', 'a2')},
    {_km_update('e', 'a2', 'c1', 'c2')},
    {_km_assign('e', 'c2', 'a3')}
    SELECT j AS cell, COUNT(*) AS n_vectors FROM a3 GROUP BY j
"""


def _pq_subspace_ctes(s: int, d: int, k: int) -> str:
    """CTE chain for one PQ subspace: slice dims, first-k init, 2 L2 Lloyd
    rounds (assign a1/update c1, assign a2/update c2), final encode a3
    keeping the squared distance. Mirrors pq_fit/pq_encode exactly
    (argmin L2, ties to the lowest code id)."""
    lo, hi = s * d + 1, (s + 1) * d

    def assign(e, cents, out, keep_d=False):
        cols = "vec_id, j" + (", d" if keep_d else "")
        return f"""
        {out}_d AS (
            SELECT e.vec_id, c.j, SUM((e.v - c.cv) * (e.v - c.cv)) AS d
            FROM {e} e JOIN {cents} c ON e.i = c.i
            GROUP BY 1, 2
        ),
        {out}_r AS (
            SELECT vec_id, j, d,
                   ROW_NUMBER() OVER (
                       PARTITION BY vec_id ORDER BY d ASC, j ASC
                   ) AS rn
            FROM {out}_d
        ),
        {out} AS (SELECT {cols} FROM {out}_r WHERE rn = 1)
        """

    def update(e, a, prev, out):
        return f"""
        {out}_m AS (
            SELECT a.j, e.i, AVG(e.v) AS cv
            FROM {a} a JOIN {e} e ON e.vec_id = a.vec_id
            GROUP BY 1, 2
        ),
        {out} AS (
            SELECT p.j, p.i, COALESCE(m.cv, p.cv) AS cv
            FROM {prev} p LEFT JOIN {out}_m m ON m.j = p.j AND m.i = p.i
        )
        """

    return f"""
        e{s} AS (SELECT vec_id, i, v FROM e WHERE i BETWEEN {lo} AND {hi}),
        init{s} AS (
            SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS j
            FROM (SELECT DISTINCT vec_id FROM e{s} ORDER BY vec_id LIMIT {k})
        ),
        c0_{s} AS (
            SELECT init{s}.j, e.i, e.v AS cv
            FROM init{s} JOIN e{s} e ON e.vec_id = init{s}.vec_id
        ),
        {assign(f'e{s}', f'c0_{s}', f'a1_{s}')},
        {update(f'e{s}', f'a1_{s}', f'c0_{s}', f'c1_{s}')},
        {assign(f'e{s}', f'c1_{s}', f'a2_{s}')},
        {update(f'e{s}', f'a2_{s}', f'c1_{s}', f'c2_{s}')},
        {assign(f'e{s}', f'c2_{s}', f'a3_{s}', keep_d=True)}
    """


_PQ_D = 64 // _PQ_M

ORACLES["embedding_pq"] = f"""
    WITH e AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    {",".join(_pq_subspace_ctes(s, _PQ_D, _PQ_K) for s in range(_PQ_M))}
    {" UNION ALL ".join(
        f"SELECT CAST({s} AS INT) AS subspace, CAST(j AS INT) AS code, "
        f"COUNT(*) AS n_vectors, ROUND(AVG(d), 4) AS avg_sqdist "
        f"FROM a3_{s} GROUP BY 2"
        for s in range(_PQ_M)
    )}
"""


ORACLES["knn_pq"] = f"""
    WITH e AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    {",".join(_pq_subspace_ctes(s, _PQ_D, _PQ_K) for s in range(_PQ_M))},
    {",".join(
        f'''qd_{s} AS (
            SELECT q.vec_id AS q_id, c.j, SUM((q.v - c.cv) * (q.v - c.cv)) AS d
            FROM e{s} q JOIN c2_{s} c ON q.i = c.i
            WHERE q.vec_id < {N_QUERIES}
            GROUP BY 1, 2
        )'''
        for s in range(_PQ_M)
    )},
    ad AS (
        SELECT qd_0.q_id, a3_0.vec_id AS n_id, qd_0.d + qd_1.d AS adist
        FROM a3_0
        JOIN a3_1 ON a3_1.vec_id = a3_0.vec_id
        JOIN qd_0 ON qd_0.j = a3_0.j
        JOIN qd_1 ON qd_1.j = a3_1.j AND qd_1.q_id = qd_0.q_id
        WHERE qd_0.q_id != a3_0.vec_id
    ),
    r AS (
        SELECT q_id, n_id, adist,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY adist ASC, n_id ASC
               ) AS rk
        FROM ad
    )
    SELECT q_id, n_id, ROUND(adist, 4) AS adist, CAST(rk AS INT) AS rank
    FROM r WHERE rk <= {K}
"""


ORACLES["knn_ivfpq"] = f"""
    WITH e AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS n FROM e GROUP BY vec_id),
    cdots AS (
        SELECT e.vec_id, c.vec_id AS j, SUM(e.v * c.v) AS d
        FROM e JOIN e c ON e.i = c.i AND c.vec_id < {N_ANCHORS}
        GROUP BY 1, 2
    ),
    ccos AS (
        SELECT cdots.vec_id, j, d / (a.n * b.n) AS c
        FROM cdots JOIN nrm a ON a.vec_id = cdots.vec_id
                   JOIN nrm b ON b.vec_id = j
    ),
    cranked AS (
        SELECT vec_id, j,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY c DESC, j DESC) AS rn
        FROM ccos
    ),
    cell AS (SELECT vec_id, j AS cell FROM cranked WHERE rn = 1),
    probe AS (SELECT vec_id AS q_id, j AS cell FROM cranked
              WHERE rn <= 2 AND vec_id < {N_QUERIES}),
    cand AS (
        SELECT p.q_id, cl.vec_id AS n_id
        FROM probe p JOIN cell cl ON cl.cell = p.cell
        WHERE cl.vec_id <> p.q_id
    ),
    {",".join(_pq_subspace_ctes(s, _PQ_D, _PQ_K) for s in range(_PQ_M))},
    {",".join(
        f'''qd_{s} AS (
            SELECT q.vec_id AS q_id, c.j, SUM((q.v - c.cv) * (q.v - c.cv)) AS d
            FROM e{s} q JOIN c2_{s} c ON q.i = c.i
            WHERE q.vec_id < {N_QUERIES}
            GROUP BY 1, 2
        )'''
        for s in range(_PQ_M)
    )},
    ad AS (
        SELECT cd.q_id, cd.n_id, qd_0.d + qd_1.d AS adist
        FROM cand cd
        JOIN a3_0 ON a3_0.vec_id = cd.n_id
        JOIN a3_1 ON a3_1.vec_id = cd.n_id
        JOIN qd_0 ON qd_0.j = a3_0.j AND qd_0.q_id = cd.q_id
        JOIN qd_1 ON qd_1.j = a3_1.j AND qd_1.q_id = cd.q_id
    ),
    r AS (
        SELECT q_id, n_id, adist,
               ROW_NUMBER() OVER (
                   PARTITION BY q_id ORDER BY adist ASC, n_id ASC
               ) AS rk
        FROM ad
    )
    SELECT q_id, n_id, ROUND(adist, 4) AS adist, CAST(rk AS INT) AS rank
    FROM r WHERE rk <= {K}
"""


ORACLES["pq_recall"] = f"""
    WITH e AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    nrm AS (SELECT vec_id, sqrt(SUM(v * v)) AS n FROM e GROUP BY vec_id),
    -- exact brute-force top-k
    q AS (SELECT * FROM e WHERE vec_id < {N_QUERIES}),
    bdots AS (
        SELECT q.vec_id AS q_id, e.vec_id AS n_id, SUM(q.v * e.v) AS d
        FROM q JOIN e ON q.i = e.i AND e.vec_id <> q.vec_id
        GROUP BY 1, 2
    ),
    bcos AS (
        SELECT q_id, n_id, d / (a.n * b.n) AS c
        FROM bdots JOIN nrm a ON a.vec_id = q_id JOIN nrm b ON b.vec_id = n_id
    ),
    bf AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY c DESC, n_id) AS rnk
            FROM bcos
        ) WHERE rnk <= {K}
    ),
    -- IVF cell assignment (cosine to the first-{N_ANCHORS} anchors)
    cdots AS (
        SELECT e.vec_id, c.vec_id AS j, SUM(e.v * c.v) AS d
        FROM e JOIN e c ON e.i = c.i AND c.vec_id < {N_ANCHORS}
        GROUP BY 1, 2
    ),
    ccos AS (
        SELECT cdots.vec_id, j, d / (a.n * b.n) AS c
        FROM cdots JOIN nrm a ON a.vec_id = cdots.vec_id
                   JOIN nrm b ON b.vec_id = j
    ),
    cranked AS (
        SELECT vec_id, j,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY c DESC, j DESC) AS rn
        FROM ccos
    ),
    cell AS (SELECT vec_id, j AS cell FROM cranked WHERE rn = 1),
    probe AS (SELECT vec_id AS q_id, j AS cell FROM cranked
              WHERE rn <= 2 AND vec_id < {N_QUERIES}),
    cand AS (
        SELECT p.q_id, cl.vec_id AS n_id
        FROM probe p JOIN cell cl ON cl.cell = p.cell
        WHERE cl.vec_id <> p.q_id
    ),
    -- PQ codes + per-query subspace LUTs
    {",".join(_pq_subspace_ctes(s, _PQ_D, _PQ_K) for s in range(_PQ_M))},
    {",".join(
        f'''qd_{s} AS (
            SELECT qq.vec_id AS q_id, c.j, SUM((qq.v - c.cv) * (qq.v - c.cv)) AS d
            FROM e{s} qq JOIN c2_{s} c ON qq.i = c.i
            WHERE qq.vec_id < {N_QUERIES}
            GROUP BY 1, 2
        )'''
        for s in range(_PQ_M)
    )},
    ad AS (
        SELECT cd.q_id, cd.n_id, qd_0.d + qd_1.d AS adist
        FROM cand cd
        JOIN a3_0 ON a3_0.vec_id = cd.n_id
        JOIN a3_1 ON a3_1.vec_id = cd.n_id
        JOIN qd_0 ON qd_0.j = a3_0.j AND qd_0.q_id = cd.q_id
        JOIN qd_1 ON qd_1.j = a3_1.j AND qd_1.q_id = cd.q_id
    ),
    apx AS (
        SELECT q_id, n_id FROM (
            SELECT q_id, n_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q_id ORDER BY adist ASC, n_id ASC
                   ) AS rk
            FROM ad
        ) WHERE rk <= {K}
    ),
    hits AS (
        SELECT bf.q_id, COUNT(*) AS n_hits
        FROM bf JOIN apx ON apx.q_id = bf.q_id AND apx.n_id = bf.n_id
        GROUP BY 1
    )
    SELECT DISTINCT bf.q_id,
           COALESCE(h.n_hits, 0) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0) / {K}.0, 4) AS recall
    FROM bf LEFT JOIN hits h ON h.q_id = bf.q_id
"""

# the persisted index must return exactly what the inline operator returns,
# so it shares knn_ivfpq's oracle verbatim
ORACLES["knn_ivfpq_persisted"] = ORACLES["knn_ivfpq"]

ORACLES["emb_covariance"] = f"""
    WITH x AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS xi
        FROM embeddings
    )
    SELECT a.i AS i, b.i AS j, ROUND(COVAR_POP(a.xi, b.xi), 6) AS cov
    FROM x a JOIN x b ON a.vec_id = b.vec_id
    WHERE a.i <= b.i AND b.i <= {COV_DIMS}
    GROUP BY 1, 2
"""

# power iteration unrolled: full covariance matrix, then 3 rounds of
# matrix-vector product + L2 normalization (sqrt is IEEE-exact)
ORACLES["pca_loadings"] = f"""
    WITH x AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS xi
        FROM embeddings
    ),
    cov AS (
        SELECT a.i AS i, b.i AS j, COVAR_POP(a.xi, b.xi) AS cov
        FROM x a JOIN x b ON a.vec_id = b.vec_id
        WHERE a.i <= {COV_DIMS} AND b.i <= {COV_DIMS}
        GROUP BY 1, 2
    ),
    v0 AS (
        SELECT DISTINCT i, CASE WHEN i = 1 THEN 1.0 ELSE 0.0 END AS v
        FROM cov
    ),
    w1 AS (
        SELECT c.i, SUM(c.cov * v0.v) AS w
        FROM cov c JOIN v0 ON v0.i = c.j GROUP BY c.i
    ),
    v1 AS (SELECT i, w / (SELECT SQRT(SUM(w * w)) FROM w1) AS v FROM w1),
    w2 AS (
        SELECT c.i, SUM(c.cov * v1.v) AS w
        FROM cov c JOIN v1 ON v1.i = c.j GROUP BY c.i
    ),
    v2 AS (SELECT i, w / (SELECT SQRT(SUM(w * w)) FROM w2) AS v FROM w2),
    w3 AS (
        SELECT c.i, SUM(c.cov * v2.v) AS w
        FROM cov c JOIN v2 ON v2.i = c.j GROUP BY c.i
    ),
    v3 AS (SELECT i, w / (SELECT SQRT(SUM(w * w)) FROM w3) AS v FROM w3)
    SELECT i, ROUND(v, 6) AS loading FROM v3
"""


def q_mahalanobis_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Multivariate outlier detection on the first two embedding dims:
    Mahalanobis distance under the moment-derived covariance
    (closed-form 2x2 inverse), counting vectors beyond the chi-square
    99% threshold (2 dof = 9.21034). The covariance comes from the same
    mergeable Gramian pass as `emb_covariance`; the stats broadcast back
    as a 1-row join, so scoring is a narrow map over the corpus."""
    from vptstools_spark.operators.linalg import covariance_matrix

    emb = table(spark, sf, "embeddings")
    cov = covariance_matrix(emb, "embedding", dims=2)
    # flatten the 2x2: c11=(1,1), c12=(1,2), c22=(2,2)
    flat = cov.agg(
        F.sum(F.when((F.col("i") == 1) & (F.col("j") == 1), F.col("cov"))).alias("c11"),
        F.sum(F.when((F.col("i") == 1) & (F.col("j") == 2), F.col("cov"))).alias("c12"),
        F.sum(F.when((F.col("i") == 2) & (F.col("j") == 2), F.col("cov"))).alias("c22"),
    )
    means = emb.agg(
        F.avg(F.element_at("embedding", 1).cast("double")).alias("m1"),
        F.avg(F.element_at("embedding", 2).cast("double")).alias("m2"),
    )
    scored = (
        emb.select(
            F.element_at("embedding", 1).cast("double").alias("x1"),
            F.element_at("embedding", 2).cast("double").alias("x2"),
        )
        .crossJoin(F.broadcast(flat))
        .crossJoin(F.broadcast(means))
        .select(
            (
                (
                    F.col("c22") * (F.col("x1") - F.col("m1")) ** 2
                    - 2.0 * F.col("c12") * (F.col("x1") - F.col("m1"))
                    * (F.col("x2") - F.col("m2"))
                    + F.col("c11") * (F.col("x2") - F.col("m2")) ** 2
                )
                / (F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12"))
            ).alias("d2")
        )
    )
    thr = 9.21034  # chi2.ppf(0.99, df=2)
    return scored.agg(
        F.count("*").alias("n_vectors"),
        F.sum((F.col("d2") > thr).cast("int")).alias("n_outliers"),
        F.round(F.max("d2"), 4).alias("max_d2"),
    )


ORACLES["mahalanobis_outliers"] = """
    WITH x AS (
        SELECT CAST(embedding[1] AS DOUBLE) AS x1,
               CAST(embedding[2] AS DOUBLE) AS x2
        FROM embeddings
    ),
    stats AS (
        SELECT COVAR_POP(x1, x1) AS c11, COVAR_POP(x1, x2) AS c12,
               COVAR_POP(x2, x2) AS c22,
               AVG(x1) AS m1, AVG(x2) AS m2
        FROM x
    ),
    scored AS (
        SELECT (c22 * (x1 - m1) * (x1 - m1)
                - 2.0 * c12 * (x1 - m1) * (x2 - m2)
                + c11 * (x2 - m2) * (x2 - m2))
               / (c11 * c22 - c12 * c12) AS d2
        FROM x CROSS JOIN stats
    )
    SELECT COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN d2 > 9.21034 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_outliers,
           ROUND(MAX(d2), 4) AS max_d2
    FROM scored
"""

QUERIES["mahalanobis_outliers"] = q_mahalanobis_outliers


# ---------------------------------------------------------------- round 7


def q_silhouette_labels(spark: SparkSession, sf: str) -> DataFrame:
    """Centroid-silhouette per label over the embeddings table: for each
    vector, a = distance to its own label centroid, b = min distance to
    any other centroid, s = (b - a)/max(a, b); report the per-label mean
    (the simplified silhouette used at scale — exact pairwise silhouette
    is O(n²) and buys little for cluster QA). Centroids are a
    (label x dim)-sized aggregate rebuilt into arrays; every join after
    the one embedding fold is label-count-bounded and broadcast."""
    e = table(spark, sf, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    dims = e.select(
        "label", F.posexplode("v").alias("i", "x")
    ).groupBy("label", "i").agg(F.avg("x").alias("m"))
    cents = dims.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))), lambda s: s.m
        ).alias("cent")
    )
    sq = F.sqrt(
        F.aggregate(
            F.zip_with("v", "cent", lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
    )
    own = e.join(F.broadcast(cents), "label").select(
        "vec_id", "label", sq.alias("a")
    )
    other = (
        e.join(
            F.broadcast(cents.withColumnsRenamed({"label": "label2"})),
            F.col("label") != F.col("label2"),
        )
        .select("vec_id", "label", sq.alias("d"))
        .groupBy("vec_id", "label")
        .agg(F.min("d").alias("b"))
    )
    s = (F.col("b") - F.col("a")) / F.greatest("a", "b")
    return (
        own.join(other, ["vec_id", "label"])
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(s), 4).alias("mean_silhouette"),
        )
        .orderBy("label")
    )


ORACLES["silhouette_labels"] = """
    WITH pt AS (
        -- parallel UNNESTs zip positionally in DuckDB (no WITH ORDINALITY)
        SELECT vec_id, label, UNNEST(embedding) AS x,
               UNNEST(GENERATE_SERIES(1, len(embedding))) AS i
        FROM embeddings
    ), cent AS (
        SELECT label AS clabel, i, AVG(CAST(x AS DOUBLE)) AS m
        FROM pt GROUP BY label, i
    ), dists AS (
        SELECT pt.vec_id, pt.label, cent.clabel,
               SQRT(SUM((CAST(pt.x AS DOUBLE) - cent.m)
                        * (CAST(pt.x AS DOUBLE) - cent.m))) AS d
        FROM pt JOIN cent ON cent.i = pt.i
        GROUP BY pt.vec_id, pt.label, cent.clabel
    ), ab AS (
        SELECT vec_id, label,
               MIN(CASE WHEN clabel = label THEN d END) AS a,
               MIN(CASE WHEN clabel <> label THEN d END) AS b
        FROM dists GROUP BY vec_id, label
    )
    SELECT label, COUNT(*) AS n,
           ROUND(AVG((b - a) / GREATEST(a, b)), 4) AS mean_silhouette
    FROM ab GROUP BY label ORDER BY label
"""
QUERIES["silhouette_labels"] = q_silhouette_labels


def q_knn_label_accuracy(spark: SparkSession, sf: str) -> DataFrame:
    """Leave-one-out 1-NN label accuracy on a fixed 100-vector probe set
    — the embedding-quality smoke number (a collapsed or shuffled
    embedding space scores at chance). Probe x corpus is a bounded
    nested-loop (100 rows broadcast against the fan-out corpus);
    distances are a JVM zip_with fold; the argmin is a struct-MIN with
    (rounded distance, vec_id) tiebreak so near-tie neighbors resolve
    identically cross-engine."""
    e = table(spark, sf, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    probes = e.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("q_label"),
        F.col("v").alias("q_v"),
    )
    d2 = F.aggregate(
        F.zip_with("q_v", "v", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    best = (
        fan_out(e)
        .join(F.broadcast(probes), F.col("q_id") != F.col("vec_id"))
        .groupBy("q_id", "q_label")
        .agg(
            F.min(
                F.struct(
                    F.round(d2, 6).alias("d"),
                    F.col("vec_id").alias("n_id"),
                    F.col("label").alias("n_label"),
                )
            ).alias("nn")
        )
    )
    return best.agg(
        F.count("*").alias("n_probes"),
        F.sum(
            (F.col("q_label") == F.col("nn.n_label")).cast("int")
        ).cast("long").alias("n_correct"),
        F.round(
            F.avg((F.col("q_label") == F.col("nn.n_label")).cast("double")),
            6,
        ).alias("accuracy"),
    )


ORACLES["knn_label_accuracy"] = """
    WITH e AS (
        SELECT vec_id, label,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ), probes AS (
        SELECT vec_id AS q_id, label AS q_label, v AS q_v
        FROM e WHERE vec_id < 100
    ), pairs AS (
        SELECT q_id, q_label, e.vec_id AS n_id, e.label AS n_label,
               ROUND(list_sum(list_transform(
                   list_zip(q_v, e.v),
                   t -> (t[1] - t[2]) * (t[1] - t[2]))), 6) AS d
        FROM probes JOIN e ON e.vec_id <> q_id
    ), best AS (
        SELECT q_id, q_label,
               MIN(struct_pack(d := d, n_id := n_id, n_label := n_label))
                   AS nn
        FROM pairs GROUP BY q_id, q_label
    )
    SELECT COUNT(*) AS n_probes,
           CAST(SUM(CASE WHEN q_label = nn.n_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           ROUND(AVG(CASE WHEN q_label = nn.n_label
                          THEN 1.0 ELSE 0.0 END), 6) AS accuracy
    FROM best
"""
QUERIES["knn_label_accuracy"] = q_knn_label_accuracy
