"""Relational query surface (SURVEY.md §2c).

The reference exposes arbitrary Spark SQL through its ``SQLTransform`` host
stage (reference: src/test/.../MaskDataPluginSuite.scala:52-66), so the new
engine's relational surface is the full DataFrame/SQL API. Each named query
here demonstrates one operator category over the driver's star schema, written
the way it should run at 100 TB:

* joins declare the small side explicitly broadcastable (dim tables), letting
  AQE pick broadcast-hash; fact-fact joins shuffle on their keys;
* aggregations are expressed so Catalyst plans partial (map-side) aggregation;
* filters are literal predicates on scan columns → parquet pushdown;
* numeric aggregates use exact decimal arithmetic (see plans.registry docs).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, as_double, dec, register

# ---------------------------------------------------------------------------
# Aggregation: TPC-H Q1-style pricing summary (groupBy + multi-agg)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(3,2)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount", 3, 2))
    charge = disc_price * (one + dec("l_tax", 3, 2))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            as_double(F.sum(dec("l_quantity"))).alias("sum_qty"),
            as_double(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            as_double(F.sum(disc_price)).alias("sum_disc_price"),
            as_double(F.sum(charge)).alias("sum_charge"),
            (as_double(F.sum(dec("l_quantity"))) / F.count(F.lit(1))).alias("avg_qty"),
            (as_double(F.sum(dec("l_extendedprice"))) / F.count(F.lit(1))).alias("avg_price"),
            (as_double(F.sum(dec("l_discount", 3, 2))) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-way join + agg + top-k: TPC-H Q3-style shipping priority
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle="""
SELECT
  o_orderkey,
  STRFTIME(o_orderdate, '%Y-%m-%d') AS order_date,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, STRFTIME(o_orderdate, '%Y-%m-%d')
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark, sf_dir):
    c = T(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = T(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    l = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    one = F.lit(1).cast("decimal(3,2)")
    # customer is ~1/7500 of lineitem → broadcast it; orders⋈lineitem shuffles
    # on the order key (their natural co-partitioning key at scale).
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"))
        .agg(
            as_double(
                F.sum(dec("l_extendedprice") * (one - dec("l_discount", 3, 2)))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# 6-way snowflake join: TPC-H Q5-style local supplier volume
# ---------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT
  n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def q5_local_supplier_volume(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem")
    s = T(spark, sf_dir, "supplier")
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    one = F.lit(1).cast("decimal(3,2)")
    # Dims (supplier/nation/region, and customer at this scale ratio) broadcast;
    # the only shuffle joins are the fact-fact orders⋈lineitem.
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            as_double(
                F.sum(dec("l_extendedprice") * (one - dec("l_discount", 3, 2)))
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Window functions: top-3 customers by account balance per nation
# ---------------------------------------------------------------------------


@register(
    "q_window_top_customers",
    oracle="""
SELECT n_name, c_name, c_acctbal, rn
FROM (
  SELECT n_name, c_name, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer JOIN nation ON c_nationkey = n_nationkey
) t
WHERE rn <= 3
""",
)
def q_window_top_customers(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("n_name", "c_name", "c_acctbal", "rn")
    )


# ---------------------------------------------------------------------------
# Rollup (grouping sets family)
# ---------------------------------------------------------------------------


@register(
    "q_rollup_sales",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price,
       COUNT(*) AS n_items
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def q_rollup_sales(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        as_double(F.sum(dec("l_extendedprice"))).alias("total_price"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q_cube_orders",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def q_cube_orders(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        as_double(F.sum(dec("o_totalprice", 14, 2))).alias("total"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "q_setops_active_rich_customers",
    oracle="""
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
UNION
SELECT c_custkey FROM customer WHERE c_acctbal < -500
""",
)
def q_setops_active_rich_customers(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    active = o.select(F.col("o_custkey").alias("c_custkey"))
    broke = c.filter(F.col("c_acctbal") < -500).select("c_custkey")
    return rich.intersect(active).union(broke).distinct()


# ---------------------------------------------------------------------------
# Semi / anti joins
# ---------------------------------------------------------------------------


@register(
    "q_anti_customers_without_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def q_anti_customers_without_orders(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_semi_parts_shipped",
    oracle="""
SELECT p_partkey, p_name FROM part p
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45
)
""",
)
def q_semi_parts_shipped(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return p.join(l, p.p_partkey == l.l_partkey, "left_semi").select("p_partkey", "p_name")


# ---------------------------------------------------------------------------
# Sort / limit / distinct
# ---------------------------------------------------------------------------


@register(
    "q_top_orders_by_price",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25
""",
)
def q_top_orders_by_price(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Scalar string / date functions (projection-only; pushdown-friendly)
# ---------------------------------------------------------------------------


@register(
    "q_scalar_functions",
    oracle="""
SELECT
  o_orderkey,
  UPPER(o_orderpriority) AS prio_upper,
  SUBSTRING(o_orderstatus, 1, 1) AS status_1,
  CONCAT(o_orderstatus, '-', o_orderpriority) AS status_prio,
  LENGTH(o_orderpriority) AS prio_len,
  CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
  CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
  STRFTIME(DATE_TRUNC('MONTH', o_orderdate), '%Y-%m-%d') AS order_month_start,
  CAST(ROUND(CAST(o_totalprice AS DECIMAL(14,2)) / 1000, 0) AS BIGINT) AS price_k
FROM orders
WHERE o_orderkey % 10 = 0
""",
)
def q_scalar_functions(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.upper("o_orderpriority").alias("prio_upper"),
        F.substring("o_orderstatus", 1, 1).alias("status_1"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").alias("prio_len"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_format(F.date_trunc("MONTH", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "order_month_start"
        ),
        F.round(dec("o_totalprice", 14, 2) / 1000, 0).cast("bigint").alias("price_k"),
    )


# ---------------------------------------------------------------------------
# Events: time-window aggregation + lag-based gap analysis (window functions)
# ---------------------------------------------------------------------------


@register(
    "q_events_hourly",
    oracle="""
SELECT
  CAST(DATE_TRUNC('HOUR', ts) AS TIMESTAMP) AS hour_start,
  event_type,
  COUNT(*) AS n_events,
  COUNT(DISTINCT user_id) AS n_users,
  CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def q_events_hourly(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("HOUR", F.col("ts")).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            as_double(F.sum(dec("value", 10, 2))).alias("total_value"),
        )
    )


@register(
    "q_events_user_gaps",
    oracle="""
SELECT user_id, event_id,
       EPOCH_US(ts) - EPOCH_US(prev_ts) AS gap_us
FROM (
  SELECT user_id, event_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
) t
WHERE prev_ts IS NOT NULL
""",
)
def q_events_user_gaps(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_ts", F.lag("ts").over(w))
        .filter(F.col("prev_ts").isNotNull())
        .select(
            "user_id",
            "event_id",
            (F.unix_micros("ts") - F.unix_micros("prev_ts")).alias("gap_us"),
        )
    )
