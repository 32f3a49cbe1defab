"""Round-11 cross-config determinism pins (VERDICT r10 #2).

The r10 ``q_bloom_skip_audit`` escape shipped because every local gate ran
under ``session.py``'s config (AQE on, 2×cores shuffle partitions) while
the driver runs stock ``spark.sql.shuffle.partitions=200`` — where the
unpersisted ``global_rank`` fan-out re-sampled range boundaries per
consumer and corrupted ranks. These tests pin the fixed behavior under
the exact configs that exposed it: stock 200 partitions, and AQE off
(no exchange-reuse masking). The full config-matrix sweep lives in
``tools/oracle_check.py --gate --stock / --no-aqe`` (round-close
checklist); this file is the fast in-suite regression."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.cache import release_persisted
from arc_maskdata_pipeline_plugin_spark.plans.twophase import (
    global_ntile,
    global_rank,
)


@contextlib.contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, str(v))
    try:
        yield
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
        spark.catalog.clearCache()
        release_persisted()


def _rank_frame(spark, n=15_000):
    return spark.range(n).select(
        F.md5(F.col("id").cast("string")).alias("k"),
        F.col("id").alias("tie"),
    )


def _assert_permutation(df, n):
    chk = df.agg(
        F.sum("rank").alias("s"),
        F.countDistinct("rank").alias("d"),
        F.min("rank").alias("lo"),
        F.max("rank").alias("hi"),
    ).first()
    assert chk["s"] == n * (n + 1) // 2, chk
    assert (chk["d"], chk["lo"], chk["hi"]) == (n, 1, n), chk


@pytest.mark.parametrize(
    "conf",
    [
        {"spark.sql.shuffle.partitions": "200"},
        {"spark.sql.adaptive.enabled": "false"},
        {
            "spark.sql.shuffle.partitions": "200",
            "spark.sql.adaptive.enabled": "false",
        },
    ],
    ids=["stock200", "no-aqe", "stock200+no-aqe"],
)
def test_global_rank_permutation_under_driver_configs(spark, conf):
    n = 15_000
    with _conf(spark, **conf):
        ranked = global_rank(_rank_frame(spark, n), ["k", "tie"], out="rank")
        # PERSISTED output — the exact configuration of the r10 bug:
        # q_bloom_skip_audit persisted the NTILE frame, which compiles the
        # cached plan with AQE constrained and defeats exchange reuse
        ranked = ranked.persist()
        try:
            _assert_permutation(ranked, n)
        finally:
            ranked.unpersist()


def test_global_ntile_bucket_sizes_under_stock_config(spark):
    # a true NTILE of n rows into b buckets yields sizes in
    # {n div b, n div b + 1} with exactly n % b large buckets — the r10
    # failure produced impossible sizes (201/211 for 15000/64)
    n, b = 15_000, 64
    with _conf(spark, **{"spark.sql.shuffle.partitions": "200"}):
        tiled = global_ntile(
            _rank_frame(spark, n), ["k", "tie"], buckets=b, out="tile"
        ).persist()
        try:
            sizes = {
                r["tile"]: r["c"]
                for r in tiled.groupBy("tile")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            }
            lo, big = n // b, n % b
            assert len(sizes) == b
            assert sum(1 for c in sizes.values() if c == lo + 1) == big
            assert all(c in (lo, lo + 1) for c in sizes.values()), sizes
        finally:
            tiled.unpersist()


def test_global_rank_base_is_persisted(spark):
    # freeze the fix itself: the rank plan must read the range-shuffled
    # base through the cache (InMemoryTableScan / InMemoryRelation), not
    # re-evaluate the repartitionByRange subtree per consumer
    ranked = global_rank(_rank_frame(spark, 1_000), ["k", "tie"], out="rank")
    plan = ranked._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan, (
        "global_rank no longer persists `base` — the offsets frame and "
        "the stream side can diverge on range boundaries (VERDICT r10 #1)"
    )
    spark.catalog.clearCache()
    release_persisted()
