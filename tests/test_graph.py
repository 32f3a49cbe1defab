"""Fixed-point-integer PageRank: reference-implementation parity + invariants."""

from __future__ import annotations

import random

from arc_maskdata_pipeline_plugin_spark.operators.graph import (
    SCALE,
    pagerank_fixed_point,
    symmetrize,
)


def _ref_pagerank(edges: list[tuple[int, int]], iterations: int) -> dict[int, int]:
    """Pure-Python mirror of the integer recurrence (symmetric edge list)."""
    sym = edges + [(d, s) for s, d in edges]
    outdeg: dict[int, int] = {}
    for s, _ in sym:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(outdeg)
    base = SCALE // n
    rank = {v: base for v in outdeg}
    for _ in range(iterations):
        in_sum = {v: 0 for v in outdeg}
        for s, d in sym:
            in_sum[d] += rank[s] // outdeg[s]
        rank = {v: (15 * base + 85 * in_sum[v]) // 100 for v in outdeg}
    return rank


def _spark_pagerank(spark, edges, iterations=5):
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = pagerank_fixed_point(symmetrize(df), iterations=iterations).collect()
    return {r["node"]: r["rank"] for r in got}


def test_star_graph_center_dominates(spark):
    edges = [(1, 2), (1, 3), (1, 4), (1, 5)]
    got = _spark_pagerank(spark, edges)
    assert got == _ref_pagerank(edges, 5)
    assert got[1] > got[2] == got[3] == got[4] == got[5]


def test_random_graph_matches_reference_exactly(spark):
    rng = random.Random(7)
    nodes = list(range(30))
    edges = list(
        {
            (rng.choice(nodes), rng.choice(nodes))
            for _ in range(120)
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    got = _spark_pagerank(spark, edges, iterations=4)
    assert got == _ref_pagerank(edges, 4)


def test_mass_is_conserved_up_to_integer_shedding(spark):
    edges = [(i, i + 1) for i in range(10)]
    got = _spark_pagerank(spark, edges)
    total = sum(got.values())
    # integer division sheds < 1 unit per node per division; never creates mass
    assert total <= SCALE
    assert total > SCALE - SCALE // 100


def test_pagerank_query_runs(spark, sf_small):
    from arc_maskdata_pipeline_plugin_spark.plans.graph import q_pagerank_suppliers

    rows = q_pagerank_suppliers(spark, sf_small).collect()
    assert len(rows) > 10
    by_kind = {0: [], 1: []}
    for r in rows:
        by_kind[r["is_supplier"]].append(r["pr_mass"])
    # suppliers are hubs (many customers each) -> max supplier mass dominates
    assert max(by_kind[1]) > max(by_kind[0])
