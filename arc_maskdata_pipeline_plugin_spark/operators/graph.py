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
        .persist()  # every iteration's left join re-reads it; one aggregate, not 5
    )
    n = deg.count()  # one node-sized action; the standard PageRank init cost
    # (also materializes the deg cache)
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
    deg.unpersist()
    return ranks.select("node", "rank")


def kcore_peel(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """k-core decomposition by iterative peeling (Seidman 1983): repeatedly
    delete nodes of degree < k until none remain; the survivors form the
    k-core — the standard density filter before community detection and the
    spam-subgraph screen in link analysis.

    ``edges`` must be symmetric. Runs a FIXED number of peel rounds (the
    oracle unrolls the same count; peeling converges in O(diameter) rounds
    and the pytest asserts an extra round is a no-op at test scale). Each
    round is two co-partitioned semi-joins against the alive-node set plus
    one degree aggregate — the alive set only shrinks, so per-round cost is
    monotonically non-increasing; edges stay partitioned by src throughout
    (one shuffle up front, as in ``pagerank_fixed_point``).

    Returns (node, degree) of the surviving core with degrees measured on
    the final edge set.
    """
    # localCheckpoint (eager) per round: each peel references the previous
    # edge set THREE times (degree + two semi-joins), so an un-truncated
    # lineage grows ~3^rounds and OOMs the planner long before the data
    # does — checkpointing pins the materialized partitions and resets the
    # logical plan to a leaf (same reason iterative CC does it).
    cur = edges.repartition("src").localCheckpoint(eager=True)
    for _ in range(rounds):
        alive = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("src")
        )
        cur = (
            cur.join(alive, "src", "semi")
            .join(alive.withColumnRenamed("src", "dst"), "dst", "semi")
            .localCheckpoint(eager=True)
        )
    return (
        cur.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
        .withColumnRenamed("src", "node")
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Personalized PageRank: teleport mass restarts at the SEED set only
    (Haveliwala, WWW 2002) — ranks become 'importance relative to these
    nodes', the primitive behind related-item / similar-account surfaces.
    Same exact-integer discipline and two-shuffles-per-iteration shape as
    ``pagerank_fixed_point``; ``seeds`` is a (node) frame, broadcast into
    the degree frame once. Returns (node, rank, is_seed)."""
    sc_edges = edges.repartition("src").persist()
    seed_flag = seeds.select(F.col("node"), F.lit(1).alias("is_seed")).distinct()
    deg = (
        sc_edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
        .withColumnRenamed("src", "node")
        .join(F.broadcast(seed_flag), "node", "left")
        .withColumn("is_seed", F.coalesce("is_seed", F.lit(0)))
        .persist()
    )
    n_seeds = deg.filter(F.col("is_seed") == 1).count()  # O(1)-row driver probe
    if n_seeds == 0:
        raise ValueError("personalized_pagerank: no seed appears in the graph")
    base = SCALE // n_seeds
    keep_pct = 100 - damping_pct
    ranks = deg.select(
        "node",
        "outdeg",
        "is_seed",
        (F.col("is_seed") * base).cast("bigint").alias("rank"),
    ).persist()
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
                "is_seed",
                F.expr(
                    f"({keep_pct} * is_seed * {base}L"
                    f" + {damping_pct} * coalesce(in_sum, 0L)) div 100"
                ).alias("rank"),
            )
            .persist()
        )
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    sc_edges.unpersist()
    deg.unpersist()
    return ranks.select("node", "rank", "is_seed")
