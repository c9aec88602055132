"""Distributed connected components over candidate-pair graphs.

Engine extension beyond the reference (SURVEY.md §7.5): the reference's dedup
surface stops at candidate pairs; a 100 TB dedup pipeline must collapse the
pair list into canonical duplicate clusters without collecting to the driver.

Algorithm: iterative min-label propagation — every node repeatedly adopts the
minimum label in its closed neighborhood; converges in O(graph diameter)
rounds. Duplicate-cluster graphs are near-cliques (diameter ≤ 2-3), so the
round count is tiny and independent of data volume. Each round is one shuffle
join on the (symmetrized) edge list; lineage is truncated per round with
``localCheckpoint`` so the plan does not grow with iterations — on a real
cluster swap for ``checkpoint`` against a reliable store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    strict: bool = False,
) -> DataFrame:
    """Resolve connected components of an undirected graph.

    Parameters
    ----------
    edges : DataFrame with two integral id columns (``src``, ``dst``).
    max_iter : safety bound; propagation stops at the first fixpoint.
    strict : when True, raise if ``max_iter`` is exhausted before the
        fixpoint; when False, emit a ``RuntimeWarning`` and return the
        partial labels. Unconverged labels are WRONG clusters (a long chain
        longer than ``max_iter`` hops has not finished merging) — never
        consume them silently.

    Returns (node: long, component: long) where ``component`` is the minimum
    node id reachable from ``node``. Isolated nodes (no edges) are not
    emitted — callers union them back if singleton clusters matter.
    """
    import warnings
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    )
    # symmetrize once; reused by every round — checkpoint to cut re-read of
    # the (possibly expensive) candidate-pair lineage
    sym = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iter):
        # min label over each node's neighbors (shuffle on node id)
        nbr_min = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("u", "node")
        )
        merged = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)  # one job per round; truncates lineage
        )
        changed = merged.filter(F.col("label") != F.col("old_label")).count()
        labels = merged.select("node", "label")
        if changed == 0:
            break
    else:
        msg = (
            f"connected_components did not converge within max_iter={max_iter} "
            f"({changed} labels still changing); returned components are "
            "incomplete merges — raise max_iter (rounds needed ≈ graph diameter)"
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels.select("node", F.col("label").alias("component"))


def cluster_sizes(components: DataFrame) -> DataFrame:
    """(component, n_nodes) census of the resolved clusters."""
    return components.groupBy("component").agg(F.count("*").alias("n_nodes"))
