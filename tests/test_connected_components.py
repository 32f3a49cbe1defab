"""Large-star/small-star connected components vs a pure-Python union-find.

The star algorithm converges in O(log n) rounds — the long-chain case is the
one naive min-label propagation (O(diameter) rounds) gets wrong under a small
iteration cap, so it's the headline fixture here.
"""

from __future__ import annotations

import random

from arc_maskdata_pipeline_plugin_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component id = min member, matching the operator's contract
    comp = {}
    for x in parent:
        comp[x] = find(x)
    return comp


def _check(spark, pairs):
    df = spark.createDataFrame(pairs, ["d1", "d2"])
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _union_find(pairs)


def test_long_chain_converges(spark):
    # path graph of 80 nodes: diameter 79 — naive propagation under a 10-round
    # cap would silently split this; star rounds close it in O(log n).
    pairs = [(i, i + 1) for i in range(79)]
    _check(spark, pairs)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    _check(spark, pairs)


def test_two_components_and_summary(spark):
    pairs = [(1, 2), (2, 3), (10, 11), (3, 1)]
    df = spark.createDataFrame(pairs, ["d1", "d2"])
    rows = {r.component: r for r in dedup_clusters(df).collect()}
    assert rows[1].members == [1, 2, 3]
    assert rows[10].members == [10, 11]
    assert rows[1].n_members == 3


def test_nonconvergence_raises(spark):
    import pytest

    pairs = [(i, i + 1) for i in range(40)]
    df = spark.createDataFrame(pairs, ["d1", "d2"])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=1)
