"""Bucketed co-located join: the write-once-shuffle-never pattern.

Two tables bucketed identically on the join key must sort-merge-join with
ZERO Exchange in the physical plan — the shuffle happened at write time.
This is the scale-defining property: a 100 TB fact table joined on its
natural key by every downstream query pays the shuffle once, not per query.
"""

from __future__ import annotations

import pytest

from arc_maskdata_pipeline_plugin_spark.operators.joins import write_bucketed


@pytest.fixture()
def bucketed_tables(spark):
    left = spark.range(0, 1000).selectExpr("id AS key", "id * 2 AS lval")
    right = spark.range(0, 1000).selectExpr("id AS key", "id * 3 AS rval")
    write_bucketed(left, "bkt_left", ["key"], 4, sort_cols=["key"])
    write_bucketed(right, "bkt_right", ["key"], 4, sort_cols=["key"])
    yield "bkt_left", "bkt_right"
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(lt).join(spark.table(rt), "key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # correctness: every key matches exactly once
        assert joined.count() == 1000
        row = joined.filter("key = 7").collect()[0]
        assert (row.lval, row.rval) == (14, 21)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_unbucketed_join_does_exchange(spark):
    """Control: the same join without bucketing shuffles both sides."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(0, 1000).selectExpr("id AS key", "id * 2 AS lval")
        right = spark.range(0, 1000).selectExpr("id AS key", "id * 3 AS rval")
        plan = left.join(right, "key")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
