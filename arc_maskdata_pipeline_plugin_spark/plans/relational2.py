"""Relational coverage, part 2: subqueries, grouping sets, JSON, percentiles,
pivots, running windows, range / as-of joins (SURVEY.md §2c completion).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.joins import asof_join, range_join_pairs
from .registry import T, as_double, dec, register


def _views(spark, sf_dir, *names):
    for n in names:
        T(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# EXISTS / IN subqueries (TPC-H Q4-style)
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark, sf_dir):
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
          AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o_orderpriority
        """
    )


@register(
    "q6_revenue_forecast",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_revenue_forecast(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            as_double(F.sum(dec("l_extendedprice") * dec("l_discount", 3, 2))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q10_returned_customers",
    oracle="""
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_customers(spark, sf_dir):
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = T(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(3,2)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            as_double(
                F.sum(dec("l_extendedprice") * (one - dec("l_discount", 3, 2)))
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# GROUPING SETS + grouping_id
# ---------------------------------------------------------------------------


@register(
    "q_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS INTEGER) AS gid,
       COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def q_grouping_sets(spark, sf_dir):
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING_ID(l_returnflag, l_linestatus) AS INT) AS gid,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery + IN subquery
# ---------------------------------------------------------------------------


@register(
    "q_correlated_above_nation_avg",
    oracle="""
SELECT c_custkey, c_acctbal
FROM customer c
WHERE c_acctbal > (
  SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
)
""",
)
def q_correlated_above_nation_avg(spark, sf_dir):
    _views(spark, sf_dir, "customer")
    # AVG(double) per small nation group: both engines sum ≤ a few hundred
    # doubles sequentially within one group — Spark's partial aggregation over
    # a broadcast-size table lands in one partition per group here, and the
    # comparison (not the average) is the output, so boundary risk is nil.
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE c_acctbal > (
          SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@register(
    "q_in_subquery_big_spenders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_acctbal > 9000
)
""",
)
def q_in_subquery_big_spenders(spark, sf_dir):
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        """
    )


# ---------------------------------------------------------------------------
# JSON extraction (events.props is a JSON string)
# ---------------------------------------------------------------------------


@register(
    "q_json_events",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""",
)
def q_json_events(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# ---------------------------------------------------------------------------
# Exact percentiles (linear interpolation — bit-equal across engines)
# ---------------------------------------------------------------------------


@register(
    "q_percentiles_by_type",
    oracle="""
SELECT event_type,
       quantile_cont(value, 0.25) AS p25,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90
FROM events
GROUP BY event_type
""",
)
def q_percentiles_by_type(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25)").alias("p25"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
    )


# ---------------------------------------------------------------------------
# Pivot (conditional aggregation in the oracle)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@register(
    "q_pivot_user_events",
    oracle=f"""
SELECT user_id,
       {", ".join(f"COUNT(*) FILTER (event_type = '{t}') AS {t}" for t in _EVENT_TYPES)}
FROM events
GROUP BY user_id
""",
)
def q_pivot_user_events(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
    )


# ---------------------------------------------------------------------------
# Running windows (frame clauses)
# ---------------------------------------------------------------------------


@register(
    "q_running_customer_revenue",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS order_seq
FROM orders
""",
)
def q_running_customer_revenue(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        as_double(F.sum(dec("o_totalprice", 14, 2)).over(frame)).alias("running_total"),
        F.row_number().over(w).alias("order_seq"),
    )


# ---------------------------------------------------------------------------
# Range join + as-of join
# ---------------------------------------------------------------------------


@register(
    "q_range_join_event_pairs",
    oracle="""
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTES
GROUP BY a.user_id
""",
)
def q_range_join_event_pairs(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    pairs = range_join_pairs(e, key="user_id", ts="ts", max_gap_seconds=300, id_col="event_id")
    return pairs.groupBy(F.col("k").alias("user_id")).agg(F.count(F.lit(1)).alias("n_pairs"))


@register(
    "q_asof_purchase_view",
    oracle="""
SELECT p.event_id, p.user_id,
       EPOCH_US(p.ts) - EPOCH_US(v.ts) AS since_view_us
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
""",
)
def q_asof_purchase_view(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("view_ts")
    )
    joined = asof_join(
        purchases, views, key="user_id", left_ts="ts", right_ts="view_ts", right_cols=[]
    )
    return joined.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros("view_ts")).alias("since_view_us"),
    )


# ---------------------------------------------------------------------------
# String functions, part 2
# ---------------------------------------------------------------------------


@register(
    "q_string_functions2",
    oracle="""
SELECT p_partkey,
       CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_num,
       split_part(p_type, ' ', 1) AS type_head,
       lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded,
       replace(p_name, ' ', '_') AS name_snake,
       reverse(p_brand) AS brand_rev
FROM part
WHERE p_size >= 30
""",
)
def q_string_functions2(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    return p.filter(F.col("p_size") >= 30).select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_num"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        F.reverse("p_brand").alias("brand_rev"),
    )


# ---------------------------------------------------------------------------
# EXCEPT ALL / UNION ALL semantics
# ---------------------------------------------------------------------------


@register(
    "q_except_all_priorities",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_except_all_priorities(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    right = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return left.exceptAll(right)
