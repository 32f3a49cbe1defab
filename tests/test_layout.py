"""Z-order layout: Morton-code correctness and multi-dimensional skipping."""

from __future__ import annotations

from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.operators.layout import (
    layout_extent_stats,
    zorder_col,
    zorder_layout,
)


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_code_matches_reference(spark):
    pts = [(x, y) for x in range(0, 40, 7) for y in range(0, 40, 11)] + [
        (5, 3),
        (1023, 1023),
        (0, 0),
    ]
    df = spark.createDataFrame(pts, ["x", "y"]).select(
        "x", "y", zorder_col("x", "y", 10).alias("z")
    )
    for r in df.collect():
        assert r["z"] == _morton_ref(r["x"], r["y"], 10), (r["x"], r["y"])


def test_morton_interleave_example(spark):
    # x=0b101, y=0b011 -> z bits (y2 x2 y1 x1 y0 x0) = 0 1 1 0 1 1 = 27
    df = spark.createDataFrame([(5, 3)], ["x", "y"]).select(
        zorder_col("x", "y", 3).alias("z")
    )
    assert df.collect()[0]["z"] == 27


def _match_fraction(extents: list[tuple], dim: str, probes: range) -> float:
    """Average fraction of partitions a point predicate on ``dim`` must read."""
    lo, hi = (f"{dim}_min", f"{dim}_max")
    hits = sum(
        sum(1 for e in extents if e[lo] <= p <= e[hi]) for p in probes
    )
    return hits / (len(probes) * len(extents))


def test_zorder_bounds_both_dimensions(spark):
    # uniform 256x256 grid: a 1-D sort bounds its own axis only; Z-order must
    # bound both axes well enough that point predicates skip most partitions
    pts = [(x, y) for x in range(256) for y in range(256)]
    df = spark.createDataFrame(pts, ["x", "y"])
    n_parts = 16

    zstats = [
        r.asDict()
        for r in layout_extent_stats(
            zorder_layout(df, "x", "y", 8, n_parts), "x", "y"
        ).collect()
    ]
    xsorted = df.repartitionByRange(n_parts, "x").sortWithinPartitions("x")
    xstats = [r.asDict() for r in layout_extent_stats(xsorted, "x", "y").collect()]

    probes = range(0, 256, 17)
    # the x-sort reads ~1/16 of partitions for x predicates but ALL for y
    assert _match_fraction(xstats, "y", probes) > 0.95
    # z-order prunes on BOTH axes (4x4 tiling -> ~1/4 of partitions each)
    assert _match_fraction(zstats, "x", probes) < 0.5
    assert _match_fraction(zstats, "y", probes) < 0.5
    # and no rows were lost or duplicated by the re-layout
    assert sum(e["n"] for e in zstats) == len(pts)


def test_zorder_query_runs(spark, sf_small):
    from arc_maskdata_pipeline_plugin_spark.plans.layout import q_zorder_layout

    rows = q_zorder_layout(spark, sf_small).collect()
    assert len(rows) > 1
    # every cluster extent is a genuine bound
    assert all(
        r["x_min"] <= r["x_max"] and r["y_min"] <= r["y_max"] for r in rows
    )
