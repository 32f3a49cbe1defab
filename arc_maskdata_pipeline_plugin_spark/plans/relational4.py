"""Relational coverage pt4 — the remaining TPC-H query shapes (Q8, Q11, Q12,
Q15, Q16, Q17, Q19, Q20, Q21, Q22) adapted to the driver's star schema.

The testdata has no ``partsupp`` table and no ship-mode / receipt-date
columns, so the queries keep each TPC-H query's *shape* (the join topology,
subquery style, and aggregation pattern that exercise the engine) over the
columns that exist:

* Q8  → nation market share inside a region via an 8-table join + window.
* Q11 → value-concentration scalar-subquery HAVING (lineitem stands in for
  partsupp as the part-value source).
* Q12 → late-shipment two-class conditional counts (o_orderpriority stands
  in for l_shipmode; ``l_shipdate > o_orderdate + 60 days`` for the
  commit/receipt comparison).
* Q15 → top supplier by revenue view + MAX scalar subquery.
* Q16 → supplier-per-part-config distinct counts with NOT IN exclusion
  (lineitem is the part↔supplier link).
* Q17 → small-quantity revenue with a correlated per-part AVG subquery.
* Q19 → disjunctive brand/size/quantity predicate pushed into one join.
* Q20 → suppliers with excess shipped volume via nested grouped IN.
* Q21 → sole-returning-supplier on multi-supplier orders (EXISTS/NOT-EXISTS
  pair collapsed into one grouped pass + window, no self-joins).
* Q22 → idle rich customers: global-average scalar threshold + anti join.

All double aggregates go through exact decimal sums and are cast to DOUBLE
only at the end (see plans/registry.py docstring); shares/ratios divide the
already-double sums so both engines do the identical float ops.

Scale notes (100 TB stance): every dimension side (part, supplier, nation,
region, filtered customer) is explicitly ``F.broadcast``; the only shuffles
are the lineitem-side aggregations on their natural keys. Q21 deliberately
avoids TPC-H's triple self-join of lineitem: one grouped pass + one window
over ``l_orderkey`` computes the EXISTS and NOT-EXISTS predicates together,
so the 100 TB fact table is scanned once and shuffled once.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, as_double, dec, register

def _rev():
    one = F.lit(1).cast("decimal(3,2)")
    return dec("l_extendedprice") * (one - dec("l_discount", 3, 2))


# ---------------------------------------------------------------------------
# Q8: national market share within a region (8-table join + per-year window)
# ---------------------------------------------------------------------------


@register(
    "q8_market_share",
    oracle="""
WITH rev AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         ns.n_name AS supp_nation,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2))) AS rev
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation nc ON nc.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = nc.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ns ON ns.n_nationkey = s_nationkey
  WHERE p_type = 'PROMO' AND r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year, supp_nation,
       CAST(SUM(rev) AS DOUBLE) AS revenue,
       CAST(SUM(rev) AS DOUBLE)
         / CAST(SUM(SUM(rev)) OVER (PARTITION BY o_year) AS DOUBLE) AS mkt_share
FROM rev GROUP BY o_year, supp_nation
""",
)
def q8_market_share(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = T(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    n = T(spark, sf_dir, "nation")
    r = T(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    # customers restricted to the ASIA market, collapsed to a key set → broadcast
    cust_asia = (
        T(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    supp_nation = (
        T(spark, sf_dir, "supplier")
        .select("s_suppkey", "s_nationkey")
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    per = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_asia), o.o_custkey == cust_asia.c_custkey)
        .join(F.broadcast(supp_nation), l.l_suppkey == supp_nation.s_suppkey)
        .groupBy("o_year", "supp_nation")
        .agg(F.sum(_rev()).alias("rev_dec"))
    )
    w = Window.partitionBy("o_year")
    return per.select(
        "o_year",
        "supp_nation",
        as_double(F.col("rev_dec")).alias("revenue"),
        (as_double(F.col("rev_dec")) / as_double(F.sum("rev_dec").over(w))).alias(
            "mkt_share"
        ),
    )


# ---------------------------------------------------------------------------
# Q11: part value concentration (scalar-subquery threshold over an aggregate)
# ---------------------------------------------------------------------------


@register(
    "q11_part_value_concentration",
    oracle="""
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS val
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM pv
WHERE CAST(val AS DOUBLE) > (SELECT CAST(SUM(val) AS DOUBLE) FROM pv) * 0.0007
""",
)
def q11_part_value_concentration(spark, sf_dir):
    pv = (
        T(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_extendedprice", "l_discount")
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("val"))
    )
    total = pv.agg(as_double(F.sum("val")).alias("total"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(as_double(F.col("val")) > F.col("total") * F.lit(0.0007))
        .select("l_partkey", as_double(F.col("val")).alias("part_value"))
    )


# ---------------------------------------------------------------------------
# Q12: late shipments by line status, two-class priority counts
# ---------------------------------------------------------------------------


@register(
    "q12_late_shipments",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)
         AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
""",
)
def q12_late_shipments(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
    l = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q15: top supplier (aggregate view + MAX scalar subquery)
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
""",
)
def q15_top_supplier(spark, sf_dir):
    rev = (
        T(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(as_double(F.sum(_rev())).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q16: distinct suppliers per part config, NOT IN exclusion
# ---------------------------------------------------------------------------


@register(
    "q16_supplier_part_counts",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3' AND p_type NOT IN ('PROMO','ECONOMY')
  AND p_size IN (1,5,9,14,19,23,36,45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
""",
)
def q16_supplier_part_counts(spark, sf_dir):
    p = (
        T(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#3")
            & (~F.col("p_type").isin("PROMO", "ECONOMY"))
            & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = T(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    l = T(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q17: small-quantity revenue with correlated per-part AVG
# ---------------------------------------------------------------------------


@register(
    "q17_small_quantity_revenue",
    oracle="""
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
       AS DOUBLE) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#5' AND p_type = 'ECONOMY'
  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
)
def q17_small_quantity_revenue(spark, sf_dir):
    p = (
        T(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#5") & (F.col("p_type") == "ECONOMY"))
        .select("p_partkey")
    )
    # the correlated per-part AVG is a window over the partkey partition:
    # ONE lineitem scan and ONE shuffle (by l_partkey), instead of the
    # aggregate-then-rejoin plan that reads the 100 TB fact table twice
    li = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).join(F.broadcast(p), F.col("l_partkey") == p.p_partkey).drop("p_partkey")
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("half_avg", F.lit(0.5) * F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .agg(
            (as_double(F.sum(dec("l_extendedprice"))) / F.lit(7.0)).alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# Q19: disjunctive brand/size/quantity predicates over one join
# ---------------------------------------------------------------------------


@register(
    "q19_disjunctive_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
       * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
       AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
)
def q19_disjunctive_revenue(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = T(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15) & q.between(20, 30))
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(as_double(F.sum(_rev())).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20: suppliers with excess shipped volume (nested grouped IN → semi join)
# ---------------------------------------------------------------------------


@register(
    "q20_excess_volume_suppliers",
    oracle="""
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_type = 'PROMO'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 40
)
""",
)
def q20_excess_volume_suppliers(spark, sf_dir):
    p = T(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    keys = (
        T(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(keys, s.s_suppkey == keys.l_suppkey, "semi")


# ---------------------------------------------------------------------------
# Q21: sole returning supplier on multi-supplier orders
# (EXISTS + NOT EXISTS collapsed into one grouped pass + one window — the
# 100 TB lineitem table is scanned once and shuffled once, vs TPC-H's
# canonical triple self-join)
# ---------------------------------------------------------------------------


@register(
    "q21_sole_returning_supplier",
    oracle="""
WITH per AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
  FROM lineitem GROUP BY l_orderkey, l_suppkey
), flagged AS (
  SELECT l_suppkey, has_r,
         COUNT(*) OVER (PARTITION BY l_orderkey) AS n_supp,
         SUM(has_r) OVER (PARTITION BY l_orderkey) AS n_r
  FROM per
)
SELECT s_name, COUNT(*) AS numwait
FROM flagged JOIN supplier ON s_suppkey = l_suppkey
WHERE has_r = 1 AND n_supp > 1 AND n_r = 1
GROUP BY s_name
""",
)
def q21_sole_returning_supplier(spark, sf_dir):
    per = (
        T(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_returnflag")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = per.select(
        "l_suppkey",
        "has_r",
        F.count(F.lit(1)).over(w).alias("n_supp"),
        F.sum("has_r").over(w).alias("n_r"),
    ).filter((F.col("has_r") == 1) & (F.col("n_supp") > 1) & (F.col("n_r") == 1))
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        flagged.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22: idle rich customers (global-average scalar threshold + anti join)
# ---------------------------------------------------------------------------


@register(
    "q22_idle_rich_customers",
    oracle="""
WITH thr AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT n_name, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
WHERE c_acctbal > (SELECT avg_bal FROM thr)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY n_name
""",
)
def q22_idle_rich_customers(spark, sf_dir):
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        (as_double(F.sum(dec("c_acctbal"))) / F.count(F.lit(1))).alias("avg_bal")
    )
    urgent = (
        T(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rich = c.crossJoin(F.broadcast(thr)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    return (
        rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            as_double(F.sum(dec("c_acctbal"))).alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Custom UDAF surface: grouped applyInPandas (Arrow-batched per-group pandas)
# ---------------------------------------------------------------------------


@register(
    "q_udaf_group_quantiles",
    oracle="""
SELECT l_returnflag, l_linestatus,
       quantile_cont(l_quantity, 0.25) AS q25,
       quantile_cont(l_quantity, 0.50) AS median,
       quantile_cont(l_quantity, 0.75) AS q75,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
)
def q_udaf_group_quantiles(spark, sf_dir):
    """Custom UDAF via ``applyInPandas``: the engine's pattern for grouped
    aggregates Spark can't express natively (SURVEY.md §2c). This is the
    EXACT opt-in of ``operators.quantiles.grouped_quantiles`` — the default
    surface is the GK sketch; exact materializes each whole group on one
    executor, safe here because groups are bounded by flag×status
    cardinality = 6 (see the operator docstring for the skewed-group OOM
    bound).

    Interpolated quantiles over the integer-valued l_quantity are
    float-exact in both engines (frac * (b - a) on integers), so the oracle
    hash-matches bit-for-bit.
    """
    from ..operators.quantiles import grouped_quantiles

    l = T(spark, sf_dir, "lineitem")
    return grouped_quantiles(
        l,
        keys=["l_returnflag", "l_linestatus"],
        value_col="l_quantity",
        probabilities=[0.25, 0.50, 0.75],
        out_cols=["q25", "median", "q75"],
        exact=True,
    )


# ---------------------------------------------------------------------------
# Analytic window functions: ntile / percent_rank / cume_dist / lag / lead
# ---------------------------------------------------------------------------


@register(
    "q_window_analytics",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS price,
       ntile(4)      OVER w AS quartile,
       percent_rank() OVER w AS pr,
       cume_dist()   OVER w AS cd,
       lag(CAST(o_totalprice AS DOUBLE))  OVER w AS prev_price,
       lead(CAST(o_totalprice AS DOUBLE)) OVER w AS next_price
FROM orders
WHERE o_custkey < 50
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
""",
)
def q_window_analytics(spark, sf_dir):
    """Ranking/distribution analytics over a total order (price with orderkey
    tiebreak → deterministic across engines). percent_rank/cume_dist are pure
    rank arithmetic in double — identical in both engines; one shuffle on
    the partition key."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 50)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    price = as_double(F.col("o_totalprice"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        price.alias("price"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.lag(price).over(w).alias("prev_price"),
        F.lead(price).over(w).alias("next_price"),
    )


# ---------------------------------------------------------------------------
# Time-series resample with gap filling (dense hourly grid, zeros for holes)
# ---------------------------------------------------------------------------


@register(
    "q_time_resample",
    oracle="""
WITH bounds AS (
  SELECT time_bucket(INTERVAL '1 hour', MIN(ts)) AS lo,
         time_bucket(INTERVAL '1 hour', MAX(ts)) AS hi
  FROM events
), grid AS (
  SELECT g.h AS hour, t.event_type
  FROM bounds, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS g(h)
  CROSS JOIN (SELECT DISTINCT event_type FROM events) t
), counts AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS hour, event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT strftime(grid.hour, '%Y-%m-%d %H:%M:%S') AS hour, grid.event_type,
       COALESCE(counts.n, 0) AS n_events
FROM grid LEFT JOIN counts USING (hour, event_type)
""",
)
def q_time_resample(spark, sf_dir):
    """Dense hourly resample: build the full (hour × event_type) grid with
    sequence+explode, left-join the actual counts, zero-fill the holes —
    the gap-filling shape every monitoring/feature pipeline needs, with no
    driver-side loop (the grid is generated ON the cluster).

    Scale note: the grid is |hours| × |types| — tiny relative to events —
    and the only shuffle over the fact table is the counting aggregation;
    the grid join broadcasts."""
    e = T(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = e.agg(
        F.min(hour).alias("lo"), F.max(hour).alias("hi")
    )
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
    )
    types = e.select("event_type").distinct()
    grid = hours.crossJoin(types)
    counts = (
        e.select(hour.alias("hour"), "event_type")
        .groupBy("hour", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # broadcast the aggregated counts (bounded by |hours|×|types|, same as
    # the grid) — a left join can only broadcast its non-row-preserving side
    return (
        grid.join(F.broadcast(counts), ["hour", "event_type"], "left")
        .select(
            F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# Single-pass table profile (the data-quality summary every pipeline runs)
# ---------------------------------------------------------------------------


@register(
    "q_profile_orders",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(DISTINCT o_orderstatus) AS n_statuses,
       CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS null_priorities,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS min_price,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS max_price,
       strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_order,
       strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_order
FROM orders
""",
)
def q_profile_orders(spark, sf_dir):
    """One-pass profile: counts, distincts, null tallies, ranges — the
    pre-flight data-quality summary. All in a single aggregation (one
    shuffle); distinct counts are exact here, swap in
    ``approx_count_distinct`` when the key space is 100 TB-sized."""
    o = T(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("null_priorities"),
        as_double(F.min(dec("o_totalprice", 14, 2))).alias("min_price"),
        as_double(F.max(dec("o_totalprice", 14, 2))).alias("max_price"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_order"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_order"),
    )


# ---------------------------------------------------------------------------
# Window frames: first_value / last_value / nth_value with explicit bounds
# ---------------------------------------------------------------------------


@register(
    "q_window_frames",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS cheapest_so_far,
       CAST(last_value(o_totalprice)
            OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS DOUBLE) AS most_expensive,
       CAST(nth_value(o_totalprice, 2)
            OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS DOUBLE) AS second_cheapest
FROM orders
WHERE o_custkey < 30
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def q_window_frames(spark, sf_dir):
    """Explicit ROWS frames: running first_value vs whole-partition
    last/nth_value (the default frame trap — last_value over the default
    frame is just the current row; the full frame must be spelled out).
    Total order via (price, orderkey) tiebreak keeps both engines identical."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") < 30)
    base = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    full = base.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    price = F.col("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        as_double(F.first(price).over(running)).alias("cheapest_so_far"),
        as_double(F.last(price).over(full)).alias("most_expensive"),
        as_double(F.nth_value(price, 2).over(full)).alias("second_cheapest"),
    )


# ---------------------------------------------------------------------------
# Datetime scalar surface
# ---------------------------------------------------------------------------


@register(
    "q_datetime_functions",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS qtr,
       CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS mth,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT)
         AS days_since_epoch_start
FROM orders
WHERE o_orderkey % 97 = 0
""",
)
def q_datetime_functions(spark, sf_dir):
    """Datetime scalar parity: extract fields, quarter, day-of-week (Spark's
    dayofweek is 1=Sunday; DuckDB's is 0=Sunday — normalized explicitly),
    month-end, interval arithmetic, day difference. All JVM-side built-ins
    inside one codegen stage."""
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mth"),
        F.dayofweek(d).alias("dow_sun1"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(d + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
        F.datediff(d, F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
    )


# ---------------------------------------------------------------------------
# INTERSECT ALL
# ---------------------------------------------------------------------------


@register(
    "q_intersect_all_priorities",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
INTERSECT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
""",
)
def q_intersect_all_priorities(spark, sf_dir):
    """Multiset intersection (bag semantics — each value kept min(m, n)
    times), completing the set-op family with EXCEPT ALL and UNION."""
    o = T(spark, sf_dir, "orders")
    open_p = o.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    done_p = o.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return open_p.intersectAll(done_p)


# ---------------------------------------------------------------------------
# Sketch quantiles (approx_percentile — the scale path next to exact
# percentile_cont, as approx_count_distinct is to countDistinct)
# ---------------------------------------------------------------------------


def q_approx_quantiles_estimates(spark, sf_dir):
    """Raw GK-sketch grouped quantiles (rank-bracket-checked in
    tests/test_sketch_tolerance.py) — the production path emits THIS."""
    from ..operators.quantiles import grouped_quantiles

    e = T(spark, sf_dir, "events")
    return grouped_quantiles(
        e,
        keys=["event_type"],
        value_col="value",
        probabilities=[0.5, 0.95, 0.99],
        out_cols=["p50", "p95", "p99"],
    )


@register(
    "q_approx_quantiles",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(1 AS BIGINT) AS p50_in_bracket,
       CAST(1 AS BIGINT) AS p95_in_bracket,
       CAST(1 AS BIGINT) AS p99_in_bracket
FROM events GROUP BY event_type
""",
)
def q_approx_quantiles(spark, sf_dir):
    """DEFAULT grouped-quantile path (GK sketch: one pass, mergeable
    partials, memory bounded by 1/accuracy), emitted as a hash-oracled
    RANK-BRACKET audit. The guarantee GK actually makes is on RANK, not
    value (at near-ties the sketch returns a real element while
    interpolation blends), so each estimate is checked against the exact
    interpolated-quantile bracket [Q(p−δ), Q(p+δ)] with δ = 0.01 — 100×
    the configured 1e-4 rank error. Both the sketch AND the exact brackets
    are computed Spark-side (``percentile`` over each group), so the
    verdict never compares floats across engines; the oracle pins group
    counts exactly and the verdicts to 1. The exact twin
    ``q_percentiles_by_type`` stays fully value-oracled; raw estimates are
    bracket-checked numerically in tests/test_sketch_tolerance.py."""
    ests = q_approx_quantiles_estimates(spark, sf_dir)
    e = T(spark, sf_dir, "events")
    brackets = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        *[
            F.expr(f"percentile(value, {p})").alias(name)
            for p, name in [
                (0.49, "b50_lo"),
                (0.51, "b50_hi"),
                (0.94, "b95_lo"),
                (0.96, "b95_hi"),
                (0.98, "b99_lo"),
                (1.00, "b99_hi"),
            ]
        ],
    )
    j = ests.join(F.broadcast(brackets), "event_type")

    def in_bracket(est, lo, hi):
        return (
            F.when((F.col(lo) <= F.col(est)) & (F.col(est) <= F.col(hi)), 1)
            .otherwise(0)
            .cast("bigint")
        )

    return j.select(
        "event_type",
        F.col("n_exact").alias("n"),
        in_bracket("p50", "b50_lo", "b50_hi").alias("p50_in_bracket"),
        in_bracket("p95", "b95_lo", "b95_hi").alias("p95_in_bracket"),
        in_bracket("p99", "b99_lo", "b99_hi").alias("p99_in_bracket"),
    )
