"""Hive-style partition pruning: a filter on the partition column must prune
at planning time (PartitionFilters on the scan), not post-scan — at 100 TB
the difference between reading one directory and reading all of them.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    uri = str(tmp_path_factory.mktemp("part_events") / "events_by_type")
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.write.mode("overwrite").partitionBy("event_type").parquet(uri)
    return uri, df


def test_partition_filter_reaches_scan(spark, partitioned_events):
    uri, _ = partitioned_events
    scan = spark.read.parquet(uri).filter("event_type = 'click'")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the partition predicate must appear in PartitionFilters, and the scan
    # must not fall back to a post-scan Filter on event_type
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "event_type" in pf, pf


def test_pruned_scan_reads_only_matching_partition(spark, partitioned_events):
    uri, src = partitioned_events
    clicks = spark.read.parquet(uri).filter("event_type = 'click'")
    got = clicks.count()
    want = src.filter("event_type = 'click'").count()
    assert got == want > 0
    # plan-level evidence: the equality literal lands in PartitionFilters,
    # so the planner enumerates only the click directory
    plan = clicks._jdf.queryExecution().executedPlan().toString()
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "click" in pf, pf


def test_column_pruning_in_read_schema(spark):
    """Projection must reach the parquet reader: ReadSchema carries only the
    selected columns, not the table width."""
    df = (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
        .filter("l_quantity > 25")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in rs and "l_quantity" in rs
    assert "l_extendedprice" not in rs and "l_shipdate" not in rs
    assert "PushedFilters" in plan and "GreaterThan(l_quantity" in plan


def test_dynamic_partition_pruning_from_dim_join(spark, partitioned_events):
    """DYNAMIC partition pruning (r11): when the partition predicate is only
    known at runtime — a join against a FILTERED dimension — Spark must
    inject a dynamicpruning subquery into the fact scan's PartitionFilters
    so the fact reads only the dim-selected partitions. At 100 TB this is
    the difference between scanning the whole fact and scanning the joined
    slice; a plan that broadcast-joins but still enumerates every
    partition directory is wrong."""
    uri, src = partitioned_events
    fact = spark.read.parquet(uri)
    dim = (
        src.select("event_type")
        .distinct()
        .withColumn("keep", F.col("event_type").isin("click", "view"))
    )
    old = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    try:
        joined = fact.join(
            dim.filter("keep"), "event_type"
        ).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        got = {r["event_type"]: r["n"] for r in joined.collect()}
        want = {
            r["event_type"]: r["n"]
            for r in src.filter(F.col("event_type").isin("click", "view"))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want and len(got) > 0
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", old
        )
