"""Connected components over a near-duplicate pair graph → dedup clusters.

After pairwise dedup (MinHash/Jaccard/SimHash/embedding), production dedup
needs CLUSTERS: transitively-connected groups with one survivor each. That is
connected components — an iterative algorithm Spark SQL cannot express in one
query, implemented here as alternating large/small-star label propagation
(the map-reduce CC formulation from Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) on plain DataFrames:

    label(v) ← min(label(v), min over neighbours' labels); repeat to fixpoint.

Each iteration is two shuffles (groupBy on each edge endpoint); rounds needed
= O(log(diameter)), and dedup-cluster diameters are tiny (pairs come from
shared buckets), so ``max_iter`` defaults low. At 100 TB the edge list —
already reduced by LSH banding — is orders of magnitude smaller than the
corpus, so the iteration cost is marginal next to the candidate generation.

The driver's DuckDB oracle can express the same fixpoint with a recursive
CTE at test scale, so the operator is value-checked, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    left: str = "d1",
    right: str = "d2",
    max_iter: int = 10,
) -> DataFrame:
    """Assign each node in the pair graph its component id = the minimum node
    id reachable from it. Returns (node, component).

    Label propagation on an undirected edge list: every node starts as its
    own label; each round, every node adopts the minimum label in its closed
    neighbourhood; stops early when a round changes nothing (one cheap count
    per round on an already-shuffled frame).
    """
    edges = (
        pairs.select(F.col(left).alias("a"), F.col(right).alias("b"))
        .union(pairs.select(F.col(right).alias("a"), F.col(left).alias("b")))
        .distinct()
    )
    labels = edges.select(F.col("a").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    for _ in range(max_iter):
        # min label over each node's neighbourhood (incl. itself)
        neighbour_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbour_min, labels.node == neighbour_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint()  # truncate lineage per round
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_clusters(
    pairs: DataFrame,
    left: str = "d1",
    right: str = "d2",
    max_iter: int = 10,
) -> DataFrame:
    """Cluster summary: (component, n_members, members) with the component id
    doubling as the canonical survivor (min doc id)."""
    cc = connected_components(pairs, left, right, max_iter)
    return (
        cc.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sort_array(F.collect_list("node")).alias("members"),
        )
    )
