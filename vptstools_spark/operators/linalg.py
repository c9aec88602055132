"""Distributed dense linear algebra over embedding columns.

The pattern: per-Arrow-batch PARTIAL moments (numpy X^T X — the blocked-BLAS
hot loop Spark's built-ins can't express) emitted as mergeable rows, then a
plain partial->final Spark aggregate sums them and a closed-form JVM
expression finalizes. No driver-side data path: the only thing that ever
leaves an executor is d(d+1)/2 moment rows per batch, so a 100 TB embedding
table reduces through the same constant-size shuffle as the sf0.01 fixture.

This is the same map-side-combine shape as `operators/sketch.py`'s mergeable
sketches, specialized to second-order moments: Gramian, per-dimension sums,
and row count are each exactly mergeable by addition, and covariance /
correlation are functions of the merged triple (cov_ij = G_ij/n - m_i m_j).
"""

from __future__ import annotations

from collections.abc import Iterator
import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOMENT_SCHEMA = (
    "i int, j int, g double, si double, sj double, n long"
)


def gramian_moments(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int | None = None,
    pivot: "list[float] | None" = None,
) -> DataFrame:
    """Mergeable second-order moments of a vector column: one row per
    dimension pair i <= j (1-based) carrying the partial Gramian entry
    sum(x_i * x_j), the per-dimension sums, and the batch row count.

    `dims` truncates every vector to its first `dims` coordinates BEFORE
    the outer product — push the projection into the kernel, never
    compute a 4096-entry Gramian to keep 36 of its cells. Output volume
    is dims*(dims+1)/2 rows per Arrow batch regardless of input size.

    `pivot` (a global constant vector, same for EVERY batch so the SUM
    merge stays exact) is subtracted before the outer product. Moments of
    (x - pivot) feed the same covariance closed form — covariance is
    shift-invariant — but with |mean - pivot| ~ std the subtraction
    G_ij - S_i*S_j/n no longer cancels catastrophically when |mean| >>
    std. Raw (pivot=None) moments are kept for callers that need the
    true uncentered Gramian.
    """
    import numpy as np

    piv = None if pivot is None else np.asarray(pivot, dtype=np.float64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if dims is not None:
                x = x[:, :dims]
            if piv is not None:
                x = x - piv[: x.shape[1]]
            d = x.shape[1]
            g = x.T @ x
            s = x.sum(axis=0)
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": (iu + 1).astype("int32"),
                    "j": (ju + 1).astype("int32"),
                    "g": g[iu, ju],
                    "si": s[iu],
                    "sj": s[ju],
                    "n": np.full(len(iu), len(x), dtype="int64"),
                }
            )

    return df.select(vec_col).mapInPandas(kernel, _MOMENT_SCHEMA)


def covariance_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int | None = None,
    center: bool = True,
) -> DataFrame:
    """Population covariance matrix of a vector column as (i, j, cov)
    rows for i <= j (1-based), computed as one mapInPandas moment pass +
    one partial->final SUM aggregate + a JVM closed form. Mergeable end
    to end: the same moments also serve correlation or a PCA Gramian.

    With `center=True` (default) an arbitrary data row is fetched first
    (one limit-1 job, metadata-scale) and used as a global pivot: the
    moments are taken of (x - pivot), which covariance is invariant to,
    so the (G - S_i*S_j/n)/n finalize stays cancellation-free even when
    |mean| >> std — the shifted-data hazard where the uncentered closed
    form loses all significant digits while an oracle's COVAR_POP does
    not. Pass center=False to skip the extra job on data known to be
    near-zero-mean."""
    pivot = None
    if center:
        first = df.select(vec_col).limit(1).collect()
        if first and first[0][0] is not None:
            pivot = list(first[0][0])
    mom = gramian_moments(df, vec_col, dims, pivot=pivot)
    agg = mom.groupBy("i", "j").agg(
        F.sum("g").alias("g"),
        F.sum("si").alias("si"),
        F.sum("sj").alias("sj"),
        F.sum("n").alias("n"),
    )
    cov = (F.col("g") - F.col("si") * F.col("sj") / F.col("n")) / F.col("n")
    return agg.select("i", "j", cov.alias("cov"))


def pca_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    dims: int | None = None,
    iters: int = 3,
) -> DataFrame:
    """Leading principal component by fixed-iteration power iteration
    over the mergeable covariance: v_{k+1} = C v_k / ||C v_k||_2,
    starting from e_1. Returns (i, loading), 1-based.

    The data-scale work is ONE covariance pass (`covariance_matrix` —
    mapInPandas moments + one aggregate); every iteration after that is
    a join+aggregate over the d(d+1)/2-row matrix, so iteration cost is
    independent of row count. Fixed iterations + an L2 norm (sqrt is
    IEEE-exact, unlike pow) keep the result value-oracle-checkable by
    CTE unrolling. Deterministic: no randomized init."""
    # r9 optimization (guide §8: decide with small rows): the data-scale
    # work is the ONE covariance pass; the d×d matrix it reduces to is
    # PARAMETER-bounded (d(d+1)/2 rows — 36 at dims=8, ≤2080 at dims=64).
    # The old loop paid 5+ checkpointed shuffle rounds over that tiny
    # matrix; instead, collect the bounded matrix once and run the fixed
    # 3-round power iteration on the driver with the same float ops
    # (matvec partial sums accumulate in ascending-j order; cross-engine
    # FP tolerance is identical to what the DuckDB oracle already
    # absorbs, and the 6-dp output round is applied by the caller as
    # before — oracle re-verified). The result re-enters the plan as a
    # literal table. Matrices beyond 2080 rows (dims > 64 — nothing in
    # the engine produces one) keep the distributed loop.
    spark = df.sparkSession
    rows = covariance_matrix(df, vec_col, dims).collect()
    if len(rows) <= 2080:
        cmat: dict = {}
        for r in rows:
            cmat[(int(r["i"]), int(r["j"]))] = float(r["cov"])
            if r["i"] < r["j"]:
                cmat[(int(r["j"]), int(r["i"]))] = float(r["cov"])
        ids = sorted({i for i, _ in cmat})
        v = {i: (1.0 if i == 1 else 0.0) for i in ids}
        for _ in range(iters):
            w = {}
            for i in ids:
                acc = 0.0
                for j in ids:
                    c = cmat.get((i, j))
                    if c is not None:
                        acc += c * v[j]
                w[i] = acc
            nrm = 0.0
            for i in ids:
                nrm += w[i] * w[i]
            nrm = math.sqrt(nrm)  # IEEE-exact, matches F.sqrt bit-for-bit
            v = {i: w[i] / nrm for i in ids}
        lit = [
            F.struct(F.lit(i).alias("i"), F.lit(v[i]).alias("loading"))
            for i in ids
        ]
        return (
            spark.range(1)
            .select(F.explode(F.array(*lit)).alias("r"))
            .select("r.i", "r.loading")
        )
    # distributed fallback (pre-r9 shape) for parameter regimes where the
    # matrix itself is big
    upper = covariance_matrix(df, vec_col, dims).localCheckpoint(eager=True)
    full = upper.unionByName(
        upper.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "cov"
        )
    ).localCheckpoint(eager=True)
    v = full.select("i").distinct().select(
        "i", F.when(F.col("i") == 1, 1.0).otherwise(0.0).alias("v")
    )
    for _ in range(iters):
        w = (
            full.join(v.select(F.col("i").alias("j"), "v"), "j")
            .groupBy("i")
            .agg(F.sum(F.col("cov") * F.col("v")).alias("w"))
        )
        norm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
        v = (
            w.crossJoin(F.broadcast(norm))
            .select("i", (F.col("w") / F.col("nrm")).alias("v"))
            .localCheckpoint(eager=True)
        )
    return v.select("i", F.col("v").alias("loading"))
