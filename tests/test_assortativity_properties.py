"""Property test: degree assortativity equals the brute-force Pearson
coefficient on random bipartite graphs.

The sqrt-free closed form (r = (M·Sxy − Sx²)/(M·Sx2 − Sx²)) relies on the
symmetrized edge list making both degree marginals identical; hypothesis
drives random customer→supplier edge sets (hubs, multi-edges collapsing
under DISTINCT, degenerate regular graphs) and checks the Spark result
against an exact-fraction Python computation of the same estimator.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_edges = st.sets(
    st.tuples(st.integers(0, 4), st.integers(0, 3)),  # (customer, supplier)
    min_size=1,
    max_size=12,
)


def _truth(pairs: set[tuple[int, int]]):
    """fp9-floored assortativity of the symmetrized graph, exact fractions."""
    e0 = {(2 * c, 2 * s + 1) for c, s in pairs}
    edges = list(e0) + [(b, a) for a, b in e0]
    deg: dict[int, int] = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    m = len(edges)
    sxy = sum(deg[a] * deg[b] for a, b in edges)
    sx = sum(deg[a] for a, _ in edges)
    sx2 = sum(deg[a] * deg[a] for a, _ in edges)
    den = m * sx2 - sx * sx
    if den == 0:
        return None
    r = Fraction(m * sxy - sx * sx, den)
    # the engines floor the DOUBLE ratio; replicate that rounding surface
    import math

    return math.floor(1e9 * (float(r.numerator) / float(r.denominator)))


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_edges)
def test_assortativity_matches_bruteforce(spark, tmp_path_factory, pairs):
    from arc_maskdata_pipeline_plugin_spark.plans.graph2 import (
        q_degree_assortativity,
    )

    tmp = tmp_path_factory.mktemp("assort")
    orders = [(i, c) for i, (c, _) in enumerate(sorted(pairs))]
    lineitem = [(i, s, 0) for i, (_, s) in enumerate(sorted(pairs))]
    spark.createDataFrame(orders, ["o_orderkey", "o_custkey"]).write.mode(
        "overwrite"
    ).parquet(str(tmp / "orders.parquet"))
    spark.createDataFrame(
        lineitem, ["l_orderkey", "l_suppkey", "l_partkey"]
    ).write.mode("overwrite").parquet(str(tmp / "lineitem.parquet"))

    r = q_degree_assortativity(spark, str(tmp)).collect()[0]
    expected = _truth(pairs)
    assert r.assortativity_fp9 == expected, (sorted(pairs), expected)
