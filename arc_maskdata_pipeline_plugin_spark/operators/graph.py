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
   node-sized frame (orders of magnitude smaller than edges). Each rank frame
   is consumed exactly ONCE (by the next iteration), so iterations chain
   LAZILY — lineage depth is linear in the iteration count (one join + one
   aggregate per level) and the whole recurrence executes as a single action,
   letting the scheduler pipeline the per-iteration stages instead of paying
   one serialized persist+count job per iteration (r12 optimization: 8.8s →
   measured-after at sf0.1; at cluster scale the same change removes
   ``iterations`` synchronization barriers). Only the genuinely multi-consumer
   frames persist: the edge list (one scan per iteration's join) and the
   degree frame (one scan per iteration's left join + the node-count probe).
   On very deep runs (>~15 iterations), add a ``localCheckpoint`` every ~10
   levels to bound planning time.

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
    from ..cache import persisted

    sc_edges = persisted(edges.repartition("src"))
    deg = persisted(
        sc_edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
        .withColumnRenamed("src", "node")
    )  # every iteration's left join re-reads it; one aggregate, not 5
    n = deg.count()  # one node-sized action; the standard PageRank init cost
    # (also materializes the edge + deg caches)
    base = SCALE // n
    keep_pct = 100 - damping_pct

    ranks = deg.select("node", "outdeg", F.lit(base).cast("bigint").alias("rank"))
    for _ in range(iterations):
        contribs = (
            sc_edges.join(ranks, sc_edges.src == ranks.node)
            .select("dst", F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        ranks = deg.join(contribs, deg.node == contribs.dst, "left").select(
            "node",
            "outdeg",
            F.expr(
                f"({keep_pct} * {base}L + {damping_pct} * coalesce(in_sum, 0L)) div 100"
            ).alias("rank"),
        )
    # ONE eager materialization of the whole recurrence (node-sized): without
    # it, a caller's `.count()` would let the optimizer ELIMINATE the
    # rank-preserving left joins (contribs keys are unique, so row count is
    # deg's) and "time" a query that computed nothing — the guide-§1.4
    # count-pruning trap, observed live in r12 (8.8s → a bogus 1.2s).
    out = ranks.localCheckpoint(eager=True).select("node", "rank")
    # the checkpoint is EAGER, so the returned plan is a materialized RDD
    # scan that no longer references the caches — release them here to keep
    # the operator cache-self-contained for library callers that never call
    # release_persisted() (ADVICE r12 #4)
    sc_edges.unpersist()
    deg.unpersist()
    return out


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
    # localCheckpoint per round: each peel references the previous edge set
    # THREE times (degree + two semi-joins), so an un-truncated lineage grows
    # ~3^rounds and OOMs the planner long before the data does — checkpointing
    # resets the logical plan to a leaf (same reason iterative CC does it).
    # LAZY (eager=False, r12 optimization): the logical plan is truncated at
    # plan-construction time either way, but the RDD materializes on the
    # CALLER's one action instead of one serialized driver-blocking job per
    # round — the peel chain executes as a single pipelined job (the
    # checkpoint blocks still pin each round's result, so the three consumers
    # of a round share one computation).
    cur = edges.repartition("src").localCheckpoint(eager=False)
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
            .localCheckpoint(eager=False)
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
    from ..cache import persisted

    sc_edges = persisted(edges.repartition("src"))
    seed_flag = seeds.select(F.col("node"), F.lit(1).alias("is_seed")).distinct()
    deg = persisted(
        sc_edges.groupBy("src")
        .agg(F.count(F.lit(1)).cast("bigint").alias("outdeg"))
        .withColumnRenamed("src", "node")
        .join(F.broadcast(seed_flag), "node", "left")
        .withColumn("is_seed", F.coalesce("is_seed", F.lit(0)))
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
    )
    # same lazy-chain shape as pagerank_fixed_point (each rank frame has ONE
    # consumer — the next iteration); only edges + deg persist
    for _ in range(iterations):
        contribs = (
            sc_edges.join(ranks, sc_edges.src == ranks.node)
            .select("dst", F.expr("rank div outdeg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        ranks = deg.join(contribs, deg.node == contribs.dst, "left").select(
            "node",
            "outdeg",
            "is_seed",
            F.expr(
                f"({keep_pct} * is_seed * {base}L"
                f" + {damping_pct} * coalesce(in_sum, 0L)) div 100"
            ).alias("rank"),
        )
    # final eager materialization: count-pruning guard + single pipelined
    # job (see pagerank_fixed_point)
    out = ranks.localCheckpoint(eager=True).select("node", "rank", "is_seed")
    # eager checkpoint done → caches are dead to the returned plan; release
    # in-function (ADVICE r12 #4, cache self-containment)
    sc_edges.unpersist()
    deg.unpersist()
    return out
