"""Semantics: Hilbert index vs a reference xy2d walk, and PRF expansion
on constructed corpora."""

from __future__ import annotations

from pyspark.sql import functions as F


def _xy2d(order, x, y):
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        x &= s - 1
        y &= s - 1
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_df_matches_reference_exhaustively(spark):
    """All 256 cells of the 16×16 grid: the unrolled expression chain equals
    the sequential reference walk (which itself satisfies bijectivity and
    unit-step adjacency)."""
    from arc_maskdata_pipeline_plugin_spark.operators.layout import hilbert_df

    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(pts, ["x", "y"])
    got = {
        (r.x0, r.y0): r.hval
        for r in hilbert_df(
            df.withColumns({"x0": F.col("x"), "y0": F.col("y")}), "x", "y", 4
        ).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _xy2d(16, x, y), (x, y)
    assert sorted(got.values()) == list(range(256))  # bijective


def test_hilbert_layout_tighter_than_zorder(spark):
    """On the sf0.001 orders grid, Hilbert's mean cluster bounding-box area
    must not exceed Z-order's (the locality claim that justifies the
    operator) and the cluster count stays ≤ 64."""
    from arc_maskdata_pipeline_plugin_spark.plans.layout import (
        q_hilbert_layout,
        q_zorder_layout,
    )

    sf = "/root/testdata/sf0.001"

    def mean_area(rows):
        areas = [
            (r.x_max - r.x_min + 1) * (r.y_max - r.y_min + 1) * r.n for r in rows
        ]
        return sum(areas) / sum(r.n for r in rows)

    hz = q_hilbert_layout(spark, sf).collect()
    zz = q_zorder_layout(spark, sf).collect()
    assert len(hz) <= 64
    assert mean_area(hz) <= mean_area(zz)


def test_prf_expands_cooccurring_term_not_query_terms(spark, tmp_path):
    """Docs matching 'hash join' all also contain 'partitioned'; PRF must
    surface it as an expansion term and never echo a query term."""
    rows = []
    for i in range(8):
        rows.append((i, "hash join partitioned build probe", "en", "s"))
    for i in range(8, 40):
        rows.append((i, "completely unrelated filler words here", "en", "s"))
    spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.search2 import q_prf_expansion

    out = [r for r in q_prf_expansion(spark, str(tmp_path)).collect() if r.query_id == 1]
    terms = {r.term for r in out}
    assert "partitioned" in terms
    assert not ({"hash", "join"} & terms)  # query terms excluded
    # every expansion term came from all 8 feedback docs here
    for r in out:
        assert 1 <= r.r_fb <= 8
