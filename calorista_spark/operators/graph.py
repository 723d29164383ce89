"""Iterative graph operators: connected components for dedup
clustering (SURVEY §2.11 L2 "connected components keep-one").

Min-label propagation: every node repeatedly adopts the smallest
component id among itself and its neighbors until fixpoint. Each
iteration is one join + one aggregate; ``stage_checkpoint`` truncates
the growing lineage (the standard guard for iterative Spark jobs) —
executor-memory-resident on local[n], reliable (HDFS/S3) when the
session has ``setCheckpointDir`` configured, which is the cluster
deployment mode. Converges in O(diameter) rounds — near-dup clusters
are tiny and star-shaped, so 2-3 rounds in practice; ``max_iter``
bounds the pathological chain case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from calorista_spark.operators.checkpoint import stage_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(node, component) with component = min node id reachable.

    ``edges`` is undirected input (each pair once, either order).
    Isolated nodes don't appear — callers union them back if needed.
    """
    # symmetrize: propagate along both directions
    fwd = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    bwd = edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    # materialize the adjacency ONCE: every iteration plus every
    # fixpoint probe re-reads it, and without this the entire upstream
    # pipeline that produced the edges (e.g. minhash→LSH→jaccard)
    # would re-execute per round
    adj = stage_checkpoint(fwd.unionByName(bwd).distinct(), eager=True)

    labels = adj.select("node").distinct().withColumn("comp", F.col("node"))

    for i in range(max_iter):
        # candidate label for each node: min over neighbors' labels
        nbr_labels = (
            adj.join(labels.withColumnRenamed("node", "nbr"), "nbr")
            .groupBy("node")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_labels, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # label frames are cluster-count-sized (tiny next to the edge
        # pipeline), so materializing every round is cheap — and the
        # fixpoint probe below then joins two MATERIALIZED frames
        # instead of re-executing the iteration lineage (measured
        # 7.3s → 7.0s at sf0.1 vs checkpointing every 3rd round)
        if (i + 1) % checkpoint_every == 0:
            new_labels = stage_checkpoint(new_labels, eager=True)
        # fixpoint: converged when no node's label shrank this round
        converged = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") < F.col("o.comp"))
            .limit(1)
            .isEmpty()
        )
        labels = new_labels
        if converged:
            break
    return labels
