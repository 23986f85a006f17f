"""Iterative graph algorithms over edge DataFrames.

The reference materializes a property graph but ships no graph
computation; connected components is the first algorithm any dedup
pipeline needs on top of near-dup PAIRS (pair-domination policies
under-merge chains: a~b, b~c puts a,c in one cluster only through
components).

Implementation: min-label propagation — each iteration joins labels
across edges and keeps the minimum seen; converges in O(diameter)
rounds. Driver-side loop with localCheckpoint per round to break
lineage (without it the plan doubles every iteration and analysis cost
explodes — the classic iterative-Spark trap). Each round is one shuffle
join + one aggregation; at cluster scale swap in the large-star/
small-star variant for skewed high-degree components.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label each vertex with the minimum vertex id reachable from it.

    Returns (id, component). Vertices are those appearing in edges;
    isolated vertices (no edges) are absent — union them in upstream
    if needed.
    """
    both = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = both.union(both.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint()

    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # candidate labels: own + min neighbor label
        neighbor_labels = (
            sym.join(labels, sym.a == labels.id)
            .select(F.col("b").alias("id"), "component")
        )
        new_labels = (
            labels.select("id", "component")
            .union(neighbor_labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()  # break lineage: plan would double per round
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
