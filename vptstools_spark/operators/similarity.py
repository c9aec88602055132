"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the exact baseline (scales as |Q|×|N| — fine when
the query side is small and broadcastable); LSH/anchor bucketing is the scale
path: assign vectors to buckets with a handful of anchor dot-products, then
search within buckets only.

Dot products are computed with `zip_with` + `aggregate` (sequential fold →
deterministic summation order) on double-cast elements, fully JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — deterministic FP order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = as_double(F.col(vec_col))
    return df.withColumn("_vec", v).withColumn("_norm", norm(F.col("_vec")))


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side against the vector
    corpus, rank per query. Returns (q_id, n_id, cosine, rnk).

    The corpus side never shuffles until the per-query top-k aggregation,
    which is a partial top-k under AQE (window over q_id after a repartition
    on q_id — bounded by |Q|×|N| rows pre-filter).
    """
    from pyspark.sql import Window

    v = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("n_id"), F.col("_vec").alias("n_vec"), F.col("_norm").alias("n_norm")
    )
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("q_id"), F.col("_vec").alias("q_vec"), F.col("_norm").alias("q_norm")
    )
    pairs = v.join(F.broadcast(q), F.col("q_id") != F.col("n_id")).withColumn(
        "cos", dot(F.col("q_vec"), F.col("n_vec")) / (F.col("q_norm") * F.col("n_norm"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "n_id", F.round("cos", 4).alias("cosine"), "rnk")
    )


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold (embedding near-dup detection).

    Exact O(n²) baseline — correct at any scale but quadratic; compose with
    `anchor_buckets` to restrict pairs to same-bucket candidates at corpus
    scale.
    """
    v = with_norm(vectors, vec_col).select(
        F.col(id_col).alias("id"), F.col("_vec").alias("vec"), F.col("_norm").alias("nrm")
    )
    a, b = v.alias("a"), v.alias("b")
    pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("vec_a"),
        F.col("b.id").alias("vec_b"),
        (dot(F.col("a.vec"), F.col("b.vec")) / (F.col("a.nrm") * F.col("b.nrm"))).alias("cos"),
    )
    return pairs.filter(F.round(F.col("cos"), 4) >= threshold).select(
        "vec_a", "vec_b", F.round("cos", 4).alias("cosine")
    )


def anchor_buckets(
    vectors: DataFrame,
    anchors: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-dot-product bucketing against fixed anchor vectors (random
    hyperplane LSH with data-derived hyperplanes): returns (id, bucket) where
    bucket is a bitstring, one bit per anchor.

    Anchors are plan-time literals (broadcast constants) → the whole operator
    is a narrow map, no shuffle; bucket histogram / bucket-join shuffles on
    the (tiny) bucket key only.
    """
    v = as_double(F.col(vec_col))
    bits = []
    for anchor in anchors:
        lit_vec = F.array(*[F.lit(float(x)) for x in anchor])
        bits.append(F.when(dot(v, lit_vec) > 0, F.lit("1")).otherwise(F.lit("0")))
    return vectors.select(F.col(id_col).alias("id"), F.concat(*bits).alias("bucket"))
