"""Semantics of HITS and the local clustering coefficient on constructed
graphs with hand-computable structure."""

from __future__ import annotations


def _write_graph(spark, tmp_path, orders, lineitem):
    spark.createDataFrame(orders, ["o_orderkey", "o_custkey"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        lineitem, ["l_orderkey", "l_suppkey", "l_partkey"]
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def test_hits_authority_ordering_and_conservation(spark, tmp_path):
    """s10 has two buying customers, s11 one → s10's authority is strictly
    larger; each normalization conserves total mass up to integer-division
    truncation (≤ 1 per node)."""
    orders = [(1, 1), (2, 2), (3, 2)]
    lineitem = [(1, 10, 0), (2, 10, 0), (3, 11, 0)]
    _write_graph(spark, tmp_path, orders, lineitem)
    from arc_maskdata_pipeline_plugin_spark.plans.graph2 import (
        _HITS_SCALE,
        q_hits_authorities,
    )

    out = {r.s_suppkey: r for r in q_hits_authorities(spark, str(tmp_path)).collect()}
    assert set(out) == {10, 11}
    assert out[10].auth_mass > out[11].auth_mass
    assert out[10].rank == 1 and out[11].rank == 2
    total = out[10].auth_mass + out[11].auth_mass
    assert _HITS_SCALE - 2 <= total <= _HITS_SCALE


def test_hits_symmetric_star_equal_authorities(spark, tmp_path):
    """Two suppliers each bought by the same two customers: authorities
    must be exactly equal (bit-stable symmetry)."""
    orders = [(1, 1), (2, 1), (3, 2), (4, 2)]
    lineitem = [(1, 10, 0), (2, 11, 0), (3, 10, 0), (4, 11, 0)]
    _write_graph(spark, tmp_path, orders, lineitem)
    from arc_maskdata_pipeline_plugin_spark.plans.graph2 import q_hits_authorities

    out = {r.s_suppkey: r.auth_mass for r in q_hits_authorities(spark, str(tmp_path)).collect()}
    assert out[10] == out[11]


def test_clustering_coefficient_triangle_plus_tail(spark, tmp_path):
    """K3 on parts {1,2,3} plus pendant edge 3—4: cc(1)=cc(2)=1,
    cc(3)=1/3, cc(4)=0 (degree-1 guard)."""
    orders = [(1, 1), (2, 1)]
    lineitem = [
        (1, 0, 1),
        (1, 0, 2),
        (1, 0, 3),  # basket {1,2,3} → triangle
        (2, 0, 3),
        (2, 0, 4),  # basket {3,4} → pendant edge
    ]
    _write_graph(spark, tmp_path, orders, lineitem)
    from arc_maskdata_pipeline_plugin_spark.plans.graph2 import (
        q_clustering_coefficient,
    )

    out = {r.partkey: r for r in q_clustering_coefficient(spark, str(tmp_path)).collect()}
    assert out[3].deg == 3 and out[3].n_tri == 1 and out[3].cc_fp6 == 333_333
    assert out[1].deg == 2 and out[1].n_tri == 1 and out[1].cc_fp6 == 1_000_000
    assert out[2].cc_fp6 == 1_000_000
    assert out[4].deg == 1 and out[4].n_tri == 0 and out[4].cc_fp6 == 0
    assert out[3].rank == 1  # highest degree ranks first


def test_assortativity_star_is_minus_one(spark, tmp_path):
    """A perfect star (one customer buying from 3 suppliers) is maximally
    DISassortative: every edge pairs degree 3 with degree 1 -> r = -1,
    from the exact closed form (M*Sxy - Sx^2)/(M*Sx2 - Sx^2) =
    (6*18 - 144)/(6*30 - 144) = -1."""
    from arc_maskdata_pipeline_plugin_spark.plans.graph2 import (
        q_degree_assortativity,
    )

    _write_graph(
        spark,
        tmp_path,
        orders=[(100, 1)],
        lineitem=[(100, 1, 0), (100, 2, 0), (100, 3, 0)],
    )
    r = q_degree_assortativity(spark, str(tmp_path)).collect()[0]
    assert r.n_nodes == 4 and r.n_directed_edges == 6
    assert (r.sxy, r.sx, r.sx2) == (18, 12, 30)
    assert r.assortativity_fp9 == -1_000_000_000


def test_assortativity_regular_graph_is_null(spark, tmp_path):
    """A 2-regular 4-cycle (2 customers x 2 suppliers, all degrees 2) has
    zero degree variance — the coefficient is undefined and must emit
    NULL, not a division error."""
    from arc_maskdata_pipeline_plugin_spark.plans.graph2 import (
        q_degree_assortativity,
    )

    _write_graph(
        spark,
        tmp_path,
        orders=[(100, 1), (200, 2)],
        lineitem=[(100, 1, 0), (100, 2, 0), (200, 1, 0), (200, 2, 0)],
    )
    r = q_degree_assortativity(spark, str(tmp_path)).collect()[0]
    assert r.n_nodes == 4 and r.n_directed_edges == 8
    assert r.assortativity_fp9 is None
