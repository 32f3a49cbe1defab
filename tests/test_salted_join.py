"""salted_join must be result-identical to the plain join (inner/left)."""

from __future__ import annotations

from arc_maskdata_pipeline_plugin_spark.operators.joins import salted_join


def test_salted_join_equals_plain(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], ["k", "lv"]
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y"), (4, "Z")], ["rk", "rv"])
    plain = {(r.k, r.lv, r.rk, r.rv) for r in left.join(right, left.k == right.rk).collect()}
    salted = {
        (r.k, r.lv, r.rk, r.rv)
        for r in salted_join(left, right, "k", "rk", n_salts=4).collect()
    }
    assert salted == plain and len(plain) == 3


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, "a"), (9, "z")], ["k", "lv"])
    right = spark.createDataFrame([(1, "X")], ["rk", "rv"])
    rows = salted_join(left, right, "k", "rk", n_salts=4, how="left").collect()
    assert len(rows) == 2
    assert {r.rv for r in rows} == {"X", None}


def test_salted_join_rejects_right_and_full(spark):
    import pytest

    from arc_maskdata_pipeline_plugin_spark.operators.joins import salted_join

    l = spark.range(5).withColumnRenamed("id", "k")
    r = spark.range(5).withColumnRenamed("id", "rk")
    for how in ("right", "full", "left_semi"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(l, r, "k", "rk", how=how)
