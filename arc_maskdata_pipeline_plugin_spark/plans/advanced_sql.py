"""Spark 4 SQL-surface queries: Python UDTFs and recursive CTEs.

Completes the SURVEY.md §2c "UDF/UDAF/UDTF surface" row with a *real* Python
UDTF (``pyspark.sql.functions.udtf`` + ``LATERAL`` join, new in Spark 3.5/4.x)
— the reference exposes only scalar UDFs (``MaskDataPlugin.scala:60-65``), so
this is host-surface the new engine adds — and exercises Spark 4's
``WITH RECURSIVE`` (UNION ALL recursion; UNION-distinct recursion is not yet
supported by Spark, which rules out cyclic-graph fixpoints — those stay with
the iterative DataFrame implementation in ``operators/clusters.py``).

Scale notes:

* The term-frequency UDTF is a ROW-LOCAL aggregation: per-document term
  counts need no shuffle at all, whereas the equivalent
  ``explode → groupBy(doc_id, term)`` shuffles the entire exploded corpus.
  At 100 TB that is the difference between a map-only pass and the largest
  shuffle in the pipeline. (Python UDTFs are still the Python path — for a
  pure-JVM equivalent see the ``aggregate``/``map_from_entries`` expression
  route — but the *shape* is the scalable one, and Arrow batches the rows.)
* The recursive month spine is bounded by the calendar (~80 iterations over
  7 years of orders), each step a one-row frame — recursion depth stays far
  under ``spark.sql.cteRecursionLevelLimit`` (default 100) and the heavy
  side (the per-month aggregate) is a single map-side-combined pass.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from .registry import T, register, spread

# ---------------------------------------------------------------------------
# Python UDTF: per-document term frequencies (shuffle-free lateral expansion)
# ---------------------------------------------------------------------------

_TOKEN_SPLIT = re.compile(r"\s+")


class TermFreqs:
    """UDTF: (doc_id, text) -> rows of (doc_id, term, tf, first_pos).

    Stateless per input row; term order is normalized by the GROUP BY in the
    oracle and by the driver's order-insensitive hash, so iteration order of
    the dict does not matter for correctness.
    """

    def eval(self, doc_id, text):  # noqa: ANN001 — UDTF signature is positional
        if text is None:
            return
        counts: dict[str, list[int]] = {}
        for pos, term in enumerate(_TOKEN_SPLIT.split(text.strip(" "))):
            slot = counts.get(term)
            if slot is None:
                counts[term] = [1, pos]
            else:
                slot[0] += 1
        for term, (tf, first_pos) in counts.items():
            yield doc_id, term, tf, first_pos


_UDTF_SCHEMA = "doc_id bigint, term string, tf int, first_pos int"


@register(
    "q_udtf_term_freqs",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text, ' '), '\s+') AS tk FROM documents
),
e AS (
  SELECT doc_id, tk[s] AS term, s
  FROM t, UNNEST(generate_series(1, len(tk))) AS g(s)
)
SELECT doc_id, term,
       CAST(COUNT(*) AS INTEGER) AS tf,
       CAST(MIN(s) - 1 AS INTEGER) AS first_pos
FROM e
GROUP BY doc_id, term
""",
)
def q_udtf_term_freqs(spark, sf_dir):
    """Per-document term frequencies via a Python UDTF in a LATERAL join —
    the inverted-index build step, computed with ZERO shuffle because the
    aggregation key (doc_id) is row-local. The DuckDB oracle cross-checks it
    with the explode-then-group formulation.

    Surface demonstrated: ``spark.udtf.register`` + ``LATERAL udtf(...)``
    (Spark 4 table-function API; the reference has scalar UDFs only)."""
    from pyspark.sql.functions import udtf

    spark.udtf.register("term_freqs", udtf(TermFreqs, returnType=_UDTF_SCHEMA))
    spread(T(spark, sf_dir, "documents")).createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT s.doc_id, s.term, s.tf, s.first_pos
        FROM docs_udtf d, LATERAL term_freqs(d.doc_id, d.text) s
        """
    )


# ---------------------------------------------------------------------------
# Recursive CTE: gap-free month spine with zero-filled order stats
# ---------------------------------------------------------------------------


@register(
    "q_recursive_month_spine",
    oracle=r"""
WITH RECURSIVE spine(mon, max_mon) AS (
  SELECT date_trunc('month', MIN(o_orderdate)), date_trunc('month', MAX(o_orderdate))
  FROM orders
  UNION ALL
  SELECT mon + INTERVAL 1 MONTH, max_mon FROM spine WHERE mon < max_mon
),
agg AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT strftime(s.mon, '%Y-%m') AS month,
       CAST(COALESCE(a.n, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(a.rev, 0) AS DOUBLE) AS revenue
FROM spine s LEFT JOIN agg a ON s.mon = a.mon
""",
)
def q_recursive_month_spine(spark, sf_dir):
    """Gap-free monthly order series via Spark 4 ``WITH RECURSIVE``: the
    spine recursion generates every calendar month between the first and
    last order date (including months with no orders, which a plain
    GROUP BY silently drops), then left-joins the per-month aggregate,
    zero-filling the gaps.

    The recursion is acyclic and calendar-bounded (~80 steps of a one-row
    frame — well under ``spark.sql.cteRecursionLevelLimit``); the corpus-side
    cost is the single map-side-combined month aggregate, and the spine join
    is a broadcast of at most a few hundred rows."""
    T(spark, sf_dir, "orders").createOrReplaceTempView("orders_rcte")
    return spark.sql(
        """
        WITH RECURSIVE spine(mon, max_mon) AS (
          SELECT CAST(date_trunc('MONTH', MIN(o_orderdate)) AS DATE),
                 CAST(date_trunc('MONTH', MAX(o_orderdate)) AS DATE)
          FROM orders_rcte
          UNION ALL
          SELECT add_months(mon, 1), max_mon FROM spine WHERE mon < max_mon
        ),
        agg AS (
          SELECT CAST(date_trunc('MONTH', o_orderdate) AS DATE) AS mon,
                 COUNT(*) AS n, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders_rcte GROUP BY 1
        )
        SELECT date_format(s.mon, 'yyyy-MM') AS month,
               CAST(COALESCE(a.n, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(a.rev, 0) AS DOUBLE) AS revenue
        FROM spine s LEFT JOIN agg a ON s.mon = a.mon
        """
    )


# ---------------------------------------------------------------------------
# Spark 4 VARIANT: semi-structured ingestion without schema-on-write
# ---------------------------------------------------------------------------


@register(
    "q_variant_extract",
    oracle="""
SELECT event_type AS vtype,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(user_id) AS min_user,
       MAX(user_id) AS max_user
FROM events GROUP BY event_type
""",
)
def q_variant_extract(spark, sf_dir):
    """Spark 4 VARIANT round trip: serialize each event to JSON, ingest with
    ``parse_json`` into a VARIANT column (binary-encoded, field-pruned reads
    — the schema-on-read path for ragged telemetry at 100 TB), then
    ``variant_get`` typed paths back out and aggregate. The oracle checks the
    round trip is the identity: extract(parse(to_json(x))) == x, so the
    aggregate equals the plain relational aggregate."""
    ev = T(spark, sf_dir, "events")
    v = ev.select(
        F.parse_json(F.to_json(F.struct("event_id", "user_id", "event_type"))).alias(
            "v"
        )
    )
    return (
        v.select(
            F.expr("variant_get(v, '$.event_type', 'string')").alias("vtype"),
            F.expr("variant_get(v, '$.user_id', 'bigint')").alias("vuser"),
        )
        .groupBy("vtype")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("vuser").alias("min_user"),
            F.max("vuser").alias("max_user"),
        )
    )


# ---------------------------------------------------------------------------
# Distribution-rank window family: ntile / percent_rank / cume_dist
# ---------------------------------------------------------------------------


@register(
    "q_feature_binning",
    oracle="""
WITH b AS (
  SELECT event_type, event_id, value,
         NTILE(10) OVER w AS decile,
         PERCENT_RANK() OVER w AS pr,
         CUME_DIST() OVER w AS cd
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
)
SELECT event_type, CAST(decile AS INTEGER) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(value) AS lo, MAX(value) AS hi,
       MIN(pr) AS min_pct_rank, MAX(cd) AS max_cume_dist
FROM b GROUP BY event_type, decile
""",
)
def q_feature_binning(spark, sf_dir):
    """Equal-frequency feature binning (the ML-prep discretizer): NTILE
    deciles of ``value`` per event type, with percent_rank/cume_dist bounds
    per bin. Ordering includes event_id so the total order — and therefore
    every bin boundary — is engine-deterministic; percent_rank/cume_dist are
    exact integer ratios, bit-identical without rounding. One window shuffle
    on event_type, then a map-side-combined aggregate."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    binned = ev.select(
        "event_type",
        "value",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return binned.groupBy("event_type", "decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.min("pr").alias("min_pct_rank"),
        F.max("cd").alias("max_cume_dist"),
    )


@register(
    "q_python_datasource",
    oracle="""
WITH g AS (
  SELECT i AS event_id,
         list_extract(['click', 'view', 'purchase', 'signup', 'error'],
                      CAST(i % 5 AS INTEGER) + 1) AS event_type,
         (i * 7919 % 100000) / 100.0 AS value
  FROM range(100000) t(i)
  WHERE i >= 25000 AND i < 75000
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(event_id) AS BIGINT) AS min_id,
       CAST(MAX(event_id) AS BIGINT) AS max_id,
       CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
FROM g GROUP BY event_type
""",
)
def q_python_datasource(spark, sf_dir):
    """Custom connector through the Spark 4 Python DataSource API
    (sources/pydatasource.py): a pure-Python source planned like a native
    scan — 16 InputPartitions (real parallelism) and ``pushFilters`` range
    pushdown, so the id-range predicate narrows the partitions BEFORE any
    row is generated (the Python-source equivalent of parquet
    PushedFilters; pinned by tests/test_pydatasource.py). Every column is a
    closed-form function of event_id, so the DuckDB oracle regenerates the
    identical rows from ``range()`` — same generative-oracle pattern as the
    PNG perceptual hash. ``sf_dir`` is unused: the connector IS the data."""
    from ..sources.pydatasource import register as register_source

    try:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:  # noqa: BLE001 — conf may be fixed on shared sessions
        pass
    register_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n", "100000")
        .option("partitions", "16")
        .load()
    )
    return (
        df.filter((F.col("event_id") >= 25000) & (F.col("event_id") < 75000))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("event_id").cast("bigint").alias("min_id"),
            F.max("event_id").cast("bigint").alias("max_id"),
            F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# LATERAL correlated subquery: per-customer top-k without a window-over-all
# ---------------------------------------------------------------------------


@register(
    "q_lateral_top_orders",
    oracle="""
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
       CAST(CAST(t.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c.c_mktsegment = 'BUILDING'
""",
)
def q_lateral_top_orders(spark, sf_dir):
    """Per-customer top-2 orders via a correlated LATERAL subquery (SQL:99
    lateral derived table, Spark 3.5+/4) — the SQL-surface twin of the
    windowed top-k: Catalyst DECORRELATES the subquery into a join +
    per-key rank rather than executing it per outer row, so the segment
    filter prunes customers before any order is ranked. Exercises the one
    §2c relational construct (correlated table subquery) the window/join
    families don't."""
    T(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    T(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey,
               CAST(CAST(t.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        FROM customer_lat c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders_lat o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto-optimal set): price x recency per market segment
# ---------------------------------------------------------------------------


@register(
    "q_pareto_orders",
    oracle="""
WITH o AS (
  SELECT c.c_mktsegment AS seg, o_orderkey,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price,
         CAST(o_orderdate AS DATE) AS day
  FROM orders JOIN customer c ON o_custkey = c_custkey
),
lv AS (
  SELECT seg, price, MAX(day) AS best_day FROM o GROUP BY seg, price
),
lv2 AS (
  SELECT seg, price,
         MAX(best_day) OVER (PARTITION BY seg ORDER BY price DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS rm_prev
  FROM lv
)
SELECT o.seg, o.o_orderkey, CAST(o.price AS DOUBLE) AS price,
       strftime(o.day, '%Y-%m-%d') AS day
FROM o JOIN lv2 ON o.seg = lv2.seg AND o.price = lv2.price
WHERE lv2.rm_prev IS NULL OR o.day >= lv2.rm_prev
""",
)
def q_pareto_orders(spark, sf_dir):
    """Skyline query (Börzsönyi et al., ICDE 2001): per market segment, the
    Pareto-optimal orders under (maximize price, maximize recency) — an order
    is dominated iff another order in its segment has STRICTLY higher price
    AND a strictly later date.

    Scale shape: never the naive NOT-EXISTS self-join (quadratic). The
    dominance frontier is computable from the distinct-(segment, price)
    LEVEL frame: per level keep the latest date, then a running MAX over
    strictly-higher price levels gives, for every order, the latest date any
    higher-priced competitor achieves; the order survives iff its date is
    not strictly beaten. One fact shuffle on (seg, price), a level-frame
    window, and a co-partitioned join back — O(n log n), not O(n²)."""
    o = (
        T(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
    )
    lv = o.groupBy("seg", "price").agg(F.max("day").alias("best_day"))
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("seg")
        .orderBy(F.desc("price"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    lv2 = lv.select(
        "seg", "price", F.max("best_day").over(w).alias("rm_prev")
    )
    return (
        o.join(lv2, ["seg", "price"])
        .filter(F.col("rm_prev").isNull() | (F.col("day") >= F.col("rm_prev")))
        .select(
            "seg",
            "o_orderkey",
            F.col("price").cast("double").alias("price"),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
        )
    )
