"""Iterative graph algorithms on DataFrames: fixed-point-integer PageRank.

Complements the connected-components operator (``operators/clusters.py``,
used by the dedup family) with the other canonical iterative graph workload.
The implementation choices are driven by two constraints:

1. **Cross-engine bit-stability.** PageRank in floating point is NOT
   reproducible across engines (or even across partitionings — doubles summed
   in different orders differ in the last bits). All mass here is integer
   micro-units (``SCALE = 10^12`` total mass), contributions are integer
   division ``rank div outdeg``, and damping is ``(15*base + 85*in) div 100``.
   Integer sums are associative, so the result is bit-identical regardless of
   partitioning, AQE decisions, or engine — the DuckDB oracle unrolls the
   same recurrence as plain CTEs (aggregation inside a recursive CTE term is
   not portable SQL; a fixed iteration count unrolls instead).
2. **Scale shape.** Each iteration is exactly two shuffles: ranks co-partition
   onto the edge partitioning for the contribution join (edges themselves are
   shuffled ONCE, then persisted pre-partitioned by ``src``), and the
   contribution sum shuffles on ``dst`` with map-side combine. Ranks are a
   node-sized frame (orders of magnitude smaller than edges); each iteration
   persists its result and unpersists the previous one so lineage stays flat
   — on very deep runs, checkpoint every ~10 iterations.

Dangling nodes are avoided structurally: callers pass a symmetrized edge set
(every node with an in-edge has an out-edge), so no mass-redistribution term
is needed and the integer recurrence stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # total PageRank mass, in integer micro-units


def symmetrize(edges: DataFrame) -> DataFrame:
    """Union each directed edge with its reverse (columns ``src``, ``dst``)."""
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pagerank_fixed_point(
    edges: DataFrame, iterations: int = 5, damping_pct: int = 85
) -> DataFrame:
    """PageRank over a symmetrized edge list, in exact integer arithmetic.

    Returns (node, rank) with ``sum(rank) <= SCALE`` (integer division sheds
    sub-unit remainders — deterministically, in both engines). ``edges`` must
    already be symmetric (see ``symmetrize``); every node is then its own
    out-degree witness, so no dangling-mass term exists.
    """
    sc_edges = edges.repartition("src").persist()
    deg = (
        sc_edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
        .withColumnRenamed("src", "node")
    )
    n = deg.count()  # one node-sized action; the standard PageRank init cost
    base = SCALE // n
    keep_pct = 100 - damping_pct

    ranks = deg.select("node", "outdeg", F.lit(base).cast("bigint").alias("rank"))
    ranks = ranks.persist()
    ranks.count()
    for _ in range(iterations):
        contribs = (
            sc_edges.join(ranks, sc_edges.src == ranks.node)
            .select("dst", F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        new_ranks = (
            deg.join(contribs, deg.node == contribs.dst, "left")
            .select(
                "node",
                "outdeg",
                F.expr(
                    f"({keep_pct} * {base}L + {damping_pct} * coalesce(in_sum, 0L)) div 100"
                ).alias("rank"),
            )
            .persist()
        )
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    sc_edges.unpersist()
    return ranks.select("node", "rank")
