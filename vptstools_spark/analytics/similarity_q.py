"""Similarity-search queries: exact brute-force cosine top-k baseline and the
anchor/LSH bucketing scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vptstools_spark.io import table
from vptstools_spark.operators.similarity import anchor_buckets, knn_bruteforce

N_QUERIES = 5
K = 5
N_ANCHORS = 4


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


QUERIES = {
    "knn_bruteforce": q_knn_bruteforce,
    "ann_buckets": q_ann_buckets,
}

ORACLES = {
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
}
