"""choose_join_strategy: each branch fires on the stats that should trigger
it, and every branch returns the identical join result."""

from __future__ import annotations

from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.operators.joins import (
    _parse_bytes,
    choose_join_strategy,
)


def test_parse_bytes():
    assert _parse_bytes("10485760b") == 10 << 20
    assert _parse_bytes("10MB") == 10 << 20
    assert _parse_bytes("1g") == 1 << 30
    assert _parse_bytes("67108864") == 64 << 20


def _frames(spark, skewed: bool):
    n = 200_000
    key = (F.col("id") % 1000) if not skewed else F.when(
        F.col("id") % 10 < 4, F.lit(7)
    ).otherwise(F.col("id") % 1000)
    fact = spark.range(n).select(key.alias("k"), (F.col("id") % 97).alias("v"))
    dim = spark.range(1000).select(
        F.col("id").alias("dk"), (F.col("id") * 3).alias("attr")
    )
    return fact, dim


def _result(df):
    return sorted(
        (r["k"], r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("attr").alias("s"))
        .collect()
    )


def test_broadcast_branch(spark):
    fact, dim = _frames(spark, skewed=False)
    joined, d = choose_join_strategy(fact, dim, "k", "dk")
    assert d["strategy"] == "broadcast"
    assert d["dim_bytes_estimate"] <= d["broadcast_threshold"]
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_salted_branch_on_skew(spark):
    fact, dim = _frames(spark, skewed=True)
    joined, d = choose_join_strategy(
        fact, dim, "k", "dk", broadcast_bytes=1, n_salts=8
    )
    assert d["strategy"] == "salted(8)"
    assert d["sampled_top_share"] > 0.2
    # identical result to the plain join
    plain = fact.join(dim, fact["k"] == dim["dk"])
    assert _result(joined) == _result(plain)


def test_plain_branch(spark):
    fact, dim = _frames(spark, skewed=False)
    joined, d = choose_join_strategy(fact, dim, "k", "dk", broadcast_bytes=1)
    assert d["strategy"] == "plain"
    assert d["sampled_top_share"] < 0.2
    plain = fact.join(dim, fact["k"] == dim["dk"])
    assert _result(joined) == _result(plain)
