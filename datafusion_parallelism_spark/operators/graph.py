"""Iterative graph operators on DataFrames (dedup cluster resolution).

Near-dup detection emits PAIRS; a dedup pipeline must resolve them into
clusters and pick one canonical doc per cluster.  That is connected
components — an inherently iterative algorithm the reference's SQL surface
cannot express (and the class of computation its bounded-execution model
never covers).

Implementation: minimum-label propagation.  Each node starts labeled with
itself; every iteration takes the min of its own label and its neighbors'
labels; converged when the global label sum stops changing (it decreases
monotonically, so equality == fixpoint).  Iterations = graph diameter,
which for near-dup clusters is tiny (clusters are cliques or near-cliques
from LSH banding).

Scale posture: each iteration is one shuffled join edges⋈labels + one
aggregation — all distributed; the driver only compares two scalar sums
per iteration.  Lineage is truncated with localCheckpoint every iteration
so plans stay O(1) deep regardless of iteration count (the standard Spark
iterative-algorithm hygiene).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, max_iter: int = 20, checkpoint: bool = True
) -> DataFrame:
    """Connected components of an undirected graph.

    ``edges``: DataFrame with two columns (u, v) — one row per edge (either
    orientation).  Returns DataFrame (node, cluster) where cluster is the
    minimum node id in the component.  Nodes appear iff they occur in an
    edge (callers union isolated nodes if needed).
    """
    u, v = edges.columns[:2]
    und = edges.select(F.col(u).alias("src"), F.col(v).alias("dst")).union(
        edges.select(F.col(v).alias("src"), F.col(u).alias("dst"))
    ).distinct()
    if checkpoint:
        # The edge list is re-joined every iteration; without truncating its
        # lineage here, the WHOLE upstream pipeline that produced the edges
        # (e.g. MinHash-LSH candidate generation) re-executes per iteration.
        und = und.localCheckpoint(eager=True)

    labels = und.select(F.col("src").alias("node")).distinct().withColumn(
        "cluster", F.col("node")
    )
    if checkpoint:
        labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum("cluster")).collect()[0][0]

    converged = False
    # max_iter + 1: detecting convergence costs one extra (no-change)
    # iteration, so the usable propagation budget stays a full max_iter.
    for _ in range(max_iter + 1):
        neighbor_min = (
            und.join(labels, und["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("cluster").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["node"] == neighbor_min["src"], "left")
            .select(
                "node",
                F.least(F.col("cluster"), F.coalesce(F.col("nmin"), F.col("cluster"))).alias(
                    "cluster"
                ),
            )
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        new_sum = new_labels.agg(F.sum("cluster")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # Silent wrong labels are worse than failing: min-label propagation
        # moves the minimum one hop per iteration, so a component with
        # diameter > max_iter would return non-minimal cluster ids.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(component diameter exceeds max_iter); raise max_iter"
        )
    return labels
