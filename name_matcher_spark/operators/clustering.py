"""Transitive clustering: connected components over the match-pair graph.

The reference stops at best-match argmax; BASELINE.json's north rule
adds transitive closure into entity clusters. Implemented as iterative
min-label propagation with DataFrame joins (the standard Spark CC
shape; GraphFrames is not available in this environment):

    label(v) <- min(label(v), min over neighbors u of label(u))

Linkage graphs are star-like around base records (small diameter), so
convergence takes a handful of iterations; each iteration is one
shuffle on the node id, and ``localCheckpoint`` truncates the lineage
so plans don't grow exponentially. For adversarially long chains the
alternating large-star/small-star variant would cut iteration count to
O(log^2 n); diameter here is bounded by duplicate-chain length, so
plain propagation is the right cost model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """edges(src: long, dst: long) -> (node: long, cluster_id: long)
    where cluster_id = min node id in the component. Isolated nodes
    (absent from edges) are the caller's concern."""
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    # Undirected: keep both directions once, dedup.
    bidir = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    bidir = bidir.localCheckpoint(eager=True)

    labels = (
        bidir.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("cluster_id", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # One aggregation computes both the new label and whether it
        # changed: self rows carry the old label flagged, neighbor rows
        # carry candidate labels; changed <=> min(all) < min(self).
        neighbor_labels = bidir.join(
            labels, bidir["dst"] == labels["node"], "inner"
        ).select(
            F.col("src").alias("node"),
            F.col("cluster_id"),
            F.lit(False).alias("is_self"),
        )
        merged = neighbor_labels.union(
            labels.select("node", "cluster_id", F.lit(True).alias("is_self"))
        )
        new_labels = (
            merged.groupBy("node")
            .agg(
                F.min("cluster_id").alias("cluster_id"),
                (
                    F.min("cluster_id")
                    < F.min(F.when(F.col("is_self"), F.col("cluster_id")))
                ).alias("_changed"),
            )
            .localCheckpoint(eager=True)
        )
        any_changed = (
            new_labels.filter(F.col("_changed")).limit(1).count() > 0
        )
        labels = new_labels.drop("_changed")
        if not any_changed:
            break
    return labels


def cluster_pairs(pairs: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Match pairs (id_1, id_2, confidence) -> (side, id, cluster_id).

    Node namespace: table-A ids map to 2*id, table-B ids to 2*id+1 so
    the two id spaces never collide; cluster_id is the min encoded node
    (stable, deterministic).
    """
    edges = pairs.filter(F.col("confidence") >= threshold).select(
        (F.col("id_1") * 2).alias("src"), (F.col("id_2") * 2 + 1).alias("dst")
    )
    comp = connected_components(edges)
    return comp.select(
        F.when(F.col("node") % 2 == 0, F.lit("a")).otherwise(F.lit("b")).alias("side"),
        F.floor(F.col("node") / 2).cast("long").alias("id"),
        F.col("cluster_id"),
    )
