"""Semantics: personalized PageRank and seasonal-strength measures."""

from __future__ import annotations

import datetime


def test_ppr_mass_concentrates_near_seeds(spark):
    """Seeded suppliers must carry more mass than any supplier outside the
    seed set's neighborhood; total mass stays <= SCALE (integer division
    sheds remainders, never creates mass)."""
    from arc_maskdata_pipeline_plugin_spark.operators.graph import SCALE
    from arc_maskdata_pipeline_plugin_spark.plans.graph2 import (
        q_personalized_pagerank,
    )

    rows = q_personalized_pagerank(spark, "/root/testdata/sf0.001").collect()
    assert rows
    total = sum(r.ppr_mass for r in rows)
    assert 0 < total <= SCALE
    seed_mass = {r.node: r.ppr_mass for r in rows if r.is_seed == 1}
    assert seed_mass, "seeds must appear in the graph"
    others = [r.ppr_mass for r in rows if r.is_seed == 0]
    # at least one seed outranks the MEDIAN non-seed (teleport concentrates)
    med = sorted(others)[len(others) // 2]
    assert max(seed_mass.values()) > med


def test_ppr_chain_graph_decays_with_distance(spark, tmp_path):
    """Hand-built path graph seeded at one end: replicate the exact integer
    recurrence in Python and compare every node's mass bit-for-bit (a path
    is bipartite, so mass OSCILLATES between odd/even levels — ordering
    assertions at a fixed iteration are not invariants; exact replication
    is)."""
    from arc_maskdata_pipeline_plugin_spark.operators.graph import (
        SCALE,
        personalized_pagerank,
        symmetrize,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], ["src", "dst"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    out = {
        r.node: r.rank
        for r in personalized_pagerank(symmetrize(edges), seeds, iterations=5).collect()
    }
    adj = {1: [2], 2: [1, 3], 3: [2, 4], 4: [3, 5], 5: [4]}
    base = SCALE  # one seed
    rank = {n: (base if n == 1 else 0) for n in adj}
    for _ in range(5):
        in_sum = {n: 0 for n in adj}
        for u, nbrs in adj.items():
            c = rank[u] // len(nbrs)
            for v in nbrs:
                in_sum[v] += c
        rank = {
            n: (15 * (base if n == 1 else 0) + 85 * in_sum[n]) // 100 for n in adj
        }
    assert out == rank


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_seasonal_strength_detects_pure_weekly_pattern(spark, tmp_path):
    """A value series that is a pure day-of-week function (no trend, no
    noise) must score seasonal strength near 1e9 (residual ~0); a constant
    series has zero variance everywhere → both strengths 0 by the
    degenerate-variance clamp."""
    from arc_maskdata_pipeline_plugin_spark.plans.timeseries import (
        q_seasonal_strength,
    )

    rows = []
    eid = 0
    for d in range(1, 29):
        ts = datetime.datetime(2024, 1, d, 10, 0, tzinfo=datetime.timezone.utc)
        dow_val = 10.0 * (ts.weekday() + 1)
        rows.append((eid, ts, 1, "purchase", dow_val, "{}"))
        eid += 1
        rows.append((eid, ts, 2, "view", 42.0, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    out = {r.event_type: r for r in q_seasonal_strength(spark, str(tmp_path)).collect()}
    assert out["purchase"].seasonal_strength_fp9 >= 900_000_000
    assert out["view"].trend_strength_fp9 == 0
    assert out["view"].seasonal_strength_fp9 == 0


def test_seasonal_strength_trend_dominates_on_ramp(spark, tmp_path):
    """A clean linear ramp: the moving-average trend absorbs nearly all
    variance → trend strength near 1e9 and above the seasonal strength."""
    from arc_maskdata_pipeline_plugin_spark.plans.timeseries import (
        q_seasonal_strength,
    )

    rows = []
    for d in range(1, 29):
        ts = datetime.datetime(2024, 1, d, 10, 0, tzinfo=datetime.timezone.utc)
        rows.append((d, ts, 1, "click", 10.0 * d, "{}"))
    _write_events(spark, tmp_path, rows)
    r = q_seasonal_strength(spark, str(tmp_path)).collect()[0]
    assert r.trend_strength_fp9 >= 900_000_000
    assert r.trend_strength_fp9 >= r.seasonal_strength_fp9
