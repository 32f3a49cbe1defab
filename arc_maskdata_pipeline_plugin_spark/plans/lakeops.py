"""Lakehouse changelog operations: CDC apply (merge a change stream into a
snapshot).

The core table-maintenance primitive under every lakehouse MERGE / CDC sink:
given a base snapshot and an ordered stream of keyed change records
(upserts + deletes), produce the post-apply state. The reference's host
framework expresses this as a Delta/JDBC load stage; here it is the
engine-level plan: last-writer-wins per key via one keyed window, then a
single key-equi join against the base — the two shuffles share the key, so
AQE/bucketing co-locates them. No collect, no iteration.

The change stream is DERIVED deterministically from `orders` (each order is
an account-balance update for its customer; a deterministic slice of
'P'-status orders are tombstones), so both engines apply the identical
changelog.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, register


@register(
    "q_cdc_apply",
    oracle="""
WITH chg AS (
  SELECT o_custkey AS k, o_orderdate AS ts, o_orderkey AS seq,
         CASE WHEN o_orderstatus = 'P' AND o_orderkey % 7 = 0
              THEN 'D' ELSE 'U' END AS op,
         CAST(o_totalprice AS DECIMAL(18,2)) AS new_bal
  FROM orders
),
latest AS (
  SELECT k, op, new_bal FROM (
    SELECT k, op, new_bal,
           ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC, seq DESC)
             AS rn
    FROM chg
  ) WHERE rn = 1
),
applied AS (
  SELECT b.c_custkey AS k,
         l.op,
         CASE WHEN l.op = 'U' THEN l.new_bal
              ELSE CAST(b.c_acctbal AS DECIMAL(18,2)) END AS bal
  FROM customer b LEFT JOIN latest l ON b.c_custkey = l.k
)
SELECT CAST(SUM(CASE WHEN op IS NULL OR op = 'U' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_live,
       CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_deleted,
       CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_updated,
       CAST(SUM(CASE WHEN op IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_untouched,
       CAST(SUM(CASE WHEN op IS NULL OR op = 'U' THEN bal END) AS DOUBLE)
         AS live_balance
FROM applied
""",
)
def q_cdc_apply(spark, sf_dir):
    """Apply a keyed change stream (last-writer-wins upserts + tombstone
    deletes) to a base snapshot — the lakehouse CDC-merge primitive. Each
    order is an update to its customer's balance ordered by (orderdate,
    orderkey); a deterministic slice of pending orders are deletes. The
    winning change per key comes from ONE row_number window partitioned by
    the key (scales: state is per-key, the frame never sorts globally); the
    apply is a single left join base⋈latest on that same key. The output is
    the post-apply audit: live/deleted/updated/untouched row counts and the
    exact-decimal live balance."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
        F.when(
            (F.col("o_orderstatus") == "P") & (F.col("o_orderkey") % 7 == 0),
            F.lit("D"),
        )
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("new_bal"),
    )
    w = Window.partitionBy("k").orderBy(F.desc("ts"), F.desc("seq"))
    latest = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "op", "new_bal")
    )
    base = T(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("base_bal"),
    )
    applied = base.join(latest, "k", "left").select(
        "op",
        F.when(F.col("op") == "U", F.col("new_bal"))
        .otherwise(F.col("base_bal"))
        .alias("bal"),
    )
    live = F.col("op").isNull() | (F.col("op") == "U")
    return applied.agg(
        F.sum(live.cast("int")).cast("bigint").alias("n_live"),
        F.sum((F.col("op") == "D").cast("int")).cast("bigint").alias(
            "n_deleted"
        ),
        F.sum((F.col("op") == "U").cast("int")).cast("bigint").alias(
            "n_updated"
        ),
        F.sum(F.col("op").isNull().cast("int")).cast("bigint").alias(
            "n_untouched"
        ),
        F.sum(F.when(live, F.col("bal"))).cast("double").alias("live_balance"),
    )
