"""Connected components over a near-duplicate pair graph → dedup clusters.

After pairwise dedup (MinHash/Jaccard/SimHash/embedding), production dedup
needs CLUSTERS: transitively-connected groups with one survivor each. That is
connected components — an iterative algorithm Spark SQL cannot express in one
query, implemented here as the alternating **large-star / small-star**
map-reduce formulation (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14):

* large-star: every node links its strictly-larger neighbours to the minimum
  of its closed neighbourhood;
* small-star: every node links its smaller-or-equal neighbours (and itself)
  to its minimum neighbour.

Each round is two grouped shuffles over the EDGE list and provably converges
in O(log n) rounds (vs O(diameter) for naive min-label propagation — long
transitive near-dup chains are exactly where that difference bites). At
100 TB the edge list — already reduced by LSH banding — is orders of
magnitude smaller than the corpus, so the iteration cost is marginal next to
candidate generation.

The driver's DuckDB oracle can express the same fixpoint with a recursive
CTE at test scale, so the operator is value-checked, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame, dedup: bool = True) -> DataFrame:
    """(u,v) undirected edge list → for each node u, link every strictly
    larger neighbour to min(closed neighbourhood). Output is again an
    undirected edge list (larger endpoint first).

    ``dedup=False`` skips the trailing ``.distinct()`` — one full (u, v)
    shuffle per star round (r13, §2.4). Correct whenever the consumer is
    duplicate-insensitive: ``_small_star``'s min-aggregation is multiset-
    insensitive and its relink ends in its own ``.distinct()``, so the CC
    loop's LS→SS composition never needs the intermediate dedup. Duplicate
    volume is bounded by the symmetrized input (≤ 2|E| rows)."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    nbr_min = sym.groupBy("u").agg(F.min("v").alias("nbr_min"))
    out = (
        sym.join(nbr_min, "u")
        .filter(F.col("v") > F.col("u"))
        .select(
            F.col("v").alias("u"),
            F.least(F.col("u"), F.col("nbr_min")).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
    )
    return out.distinct() if dedup else out


def _small_star(edges: DataFrame, already_oriented: bool = False) -> DataFrame:
    """(u,v) edge list → orient each edge (max, min); every node links its
    ≤-neighbours and itself to its minimum neighbour.

    ``already_oriented=True`` skips the orientation distinct — correct
    exactly when the input is already (max, min)-oriented and
    self-loop-free, which ``_large_star``'s output is by construction (its
    emitted rows are (v, least(u, nbr_min)) with v > u ≥ least(...) and it
    filters u != v). Duplicates in the input are harmless here: ``nbr_min``
    is a min-aggregation (multiset-insensitive) and ``relinked`` ends in
    ``.distinct()``, so ``_large_star(dedup=False)`` composes exactly
    (r12 optimization; dedup-free LS in r13). Skipping removes one full
    (u, v) shuffle per star round."""
    oriented = (
        edges
        if already_oriented
        else edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    nbr_min = oriented.groupBy("u").agg(F.min("v").alias("nbr_min"))
    relinked = (
        oriented.join(nbr_min, "u")
        .select(F.col("v").alias("u"), F.col("nbr_min").alias("v"))
        .union(nbr_min.select("u", F.col("nbr_min").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    return relinked


def connected_components(
    pairs: DataFrame,
    left: str = "d1",
    right: str = "d2",
    max_iter: int = 20,
) -> DataFrame:
    """Assign each node in the pair graph its component id = the minimum node
    id reachable from it. Returns (node, component).

    Alternates large-star / small-star rounds until the edge set is stable.
    Stability is detected with an order-insensitive FINGERPRINT — one tiny
    aggregate (count + bit_xor of xxhash64(u,v)) per round — instead of a wide
    ``exceptAll`` diff: the fingerprint probe is a map+reduce over the
    already-checkpointed frame where the diff is two extra shuffled anti-join
    passes per round (wall-clock on the 1M-node stress is dominated by the
    star rounds themselves, so the probe choice is about not ADDING shuffles,
    ~even locally but strictly less work at cluster scale). A changed edge
    set escaping detection needs a 64-bit XOR collision in every round it
    differs — negligible next to the approximate nature of the upstream
    candidate generation. At fixpoint the edge list is a star forest
    (node → component-min).

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without convergence —
    a silently split cluster is a correctness bug, not a degraded answer.
    O(log n) rounds suffice in theory; 20 covers any realistic graph.
    """
    # The input pair subtree is consumed FOUR times (initial fingerprint,
    # round 1, and both sides of the isolated-node union) — for callers that
    # hand over an unpersisted candidate pipeline that meant four full
    # re-evaluations. One lazy checkpoint of the raw (u, v) projection pays
    # the subtree once (the initial fingerprint below is its materializer,
    # same pattern as the per-round checkpoints) (§2.4, §5).
    raw = pairs.select(
        F.col(left).alias("u"), F.col(right).alias("v")
    ).localCheckpoint(eager=False)
    edges = raw.filter(F.col("u") != F.col("v")).distinct()
    # isolated self-pairs (u == v in the input) still need a label
    all_nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .distinct()
    )

    def _fingerprint(df: DataFrame) -> tuple:
        # bit_xor: order-insensitive, overflow-free under ANSI mode; edge
        # lists are distinct so XOR self-cancellation cannot occur.
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        return (row.n, row.h)

    converged = False
    prev_fp = _fingerprint(edges)
    for _ in range(max_iter):
        # already_oriented: _large_star output is (max, min)-oriented and
        # distinct, so small-star's orientation shuffle is skipped. LAZY
        # localCheckpoint (r12 optimization): the convergence fingerprint is
        # an unavoidable per-round action anyway — letting ITS collect
        # materialize the checkpoint merges the former eager-checkpoint job
        # and the fingerprint job into one per round; the logical plan is
        # truncated at construction time either way.
        stars = _small_star(
            _large_star(edges, dedup=False), already_oriented=True
        ).localCheckpoint(eager=False)
        fp = _fingerprint(stars)
        edges = stars
        if fp == prev_fp:
            converged = True
            break
        prev_fp = fp
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (component structure requires more star rounds)"
        )

    # star forest: u → root(min). Roots appear only on the v side (or are
    # isolated nodes); they label themselves.
    labels = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = all_nodes.join(labels, "node", "left_anti").withColumn(
        "component", F.col("node")
    )
    return labels.union(roots)


def dedup_clusters(
    pairs: DataFrame,
    left: str = "d1",
    right: str = "d2",
    max_iter: int = 20,
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
