"""Data-quality and anomaly queries: statistical outliers, key-skew
profiling, and a Deequ-style rule audit.

Bit-stability strategy (see ``plans/registry.py`` docstring): every aggregate
that feeds a float decision runs in EXACT decimal arithmetic (sums of
``DECIMAL`` are order-independent), is cast to double once, and all remaining
arithmetic is per-row scalar expressions evaluated identically by Spark and
DuckDB — so even threshold comparisons land on the same side in both engines.
Reported metrics are integers (counts, parts-per-million ratios).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import T, dec, register
from .registry import persisted as _persisted_quality

# ---------------------------------------------------------------------------
# Statistical outlier screen: 3-sigma z-score per market segment
# ---------------------------------------------------------------------------


@register(
    "q_outlier_customers",
    oracle="""
WITH spend AS (
  SELECT o.o_custkey, c.c_mktsegment,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_spend
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY o.o_custkey, c.c_mktsegment
),
stats AS (
  SELECT c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(total_spend) AS DOUBLE) AS s,
         CAST(SUM(total_spend * total_spend) AS DOUBLE) AS s2
  FROM spend GROUP BY c_mktsegment
)
SELECT sp.o_custkey AS c_custkey, sp.c_mktsegment,
       CAST(sp.total_spend AS DOUBLE) AS total_spend
FROM spend sp JOIN stats st ON sp.c_mktsegment = st.c_mktsegment
WHERE (CAST(sp.total_spend AS DOUBLE) - st.s / st.n)
      * (CAST(sp.total_spend AS DOUBLE) - st.s / st.n)
      > 9.0 * (st.s2 / st.n - (st.s / st.n) * (st.s / st.n))
""",
)
def q_outlier_customers(spark, sf_dir):
    """3-sigma anomaly screen: customers whose lifetime spend is more than
    three population standard deviations from their market segment's mean
    (summed uniform order prices have near-normal tails, so this finds real
    anomalies — a per-order screen on a uniform distribution finds none by
    construction). Both aggregation levels are EXACT decimal sums
    (order-independent); the moments are cast to double once and the z test
    is per-row scalar double arithmetic identical in DuckDB, so borderline
    customers classify the same way in both engines. Plan: one orders-
    customer key shuffle, a per-customer aggregate, a 5-row moment aggregate
    broadcast back onto the spend frame."""
    orders = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    spend = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.sum(dec("o_totalprice", 18, 2)).cast("decimal(18,2)").alias("total_spend"))
    )
    sp = dec("total_spend", 18, 2)
    stats = spend.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(sp).cast("double").alias("s"),
        F.sum(sp * sp).cast("double").alias("s2"),
    )
    jj = spend.join(F.broadcast(stats), spend.c_mktsegment == stats.seg)
    mean = F.col("s") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    d = F.col("total_spend").cast("double") - mean
    return jj.filter(d * d > F.lit(9.0) * var).select(
        "c_custkey",
        "c_mktsegment",
        F.col("total_spend").cast("double").alias("total_spend"),
    )


# ---------------------------------------------------------------------------
# Key-skew profile: the hottest join/shuffle keys and their traffic share
# ---------------------------------------------------------------------------


@register(
    "q_key_skew_profile",
    oracle="""
WITH counts AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY o_custkey
),
tot AS (SELECT SUM(n_orders) AS total FROM counts)
SELECT o_custkey, n_orders,
       CAST(n_orders * 1000000 // tot.total AS BIGINT) AS share_ppm
FROM counts CROSS JOIN tot
ORDER BY n_orders DESC, o_custkey ASC
LIMIT 20
""",
)
def q_key_skew_profile(spark, sf_dir):
    """Shuffle-skew diagnostic: the 20 hottest customer keys in orders with
    their integer-exact traffic share (parts per million). This is the
    measurement step that decides between a plain, salted, or broadcast join
    (``operators/joins.py``); share is integer division so the ranking and
    values are engine-exact, with key ascending as the deterministic
    tiebreak. One map-side-combined count, a scalar total broadcast back,
    and a top-k sort of the (already tiny) counts frame."""
    counts = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    )
    tot = counts.agg(F.sum("n_orders").alias("total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "o_custkey",
            "n_orders",
            F.expr("n_orders * 1000000 div total").cast("bigint").alias("share_ppm"),
        )
        .orderBy(F.desc("n_orders"), F.asc("o_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Deequ-style declarative quality audit: one pass, one row per rule
# ---------------------------------------------------------------------------

_PPM = 1_000_000


@register(
    "q_data_quality_audit",
    oracle=f"""
WITH m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_pk,
         CAST(COUNT(o_orderpriority) AS BIGINT) AS n_prio,
         CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1995-01-01'
                        AND o_orderdate < TIMESTAMP '2002-01-01'
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_dates
  FROM orders
),
fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans
  FROM orders o WHERE NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT 'row_count' AS check_name, n AS metric, n > 0 AS passed FROM m
UNION ALL
SELECT 'pk_unique_ppm', n_pk * {_PPM} // n, n_pk = n FROM m
UNION ALL
SELECT 'priority_complete_ppm', n_prio * {_PPM} // n, n_prio = n FROM m
UNION ALL
SELECT 'price_positive_ppm', n_pos * {_PPM} // n, n_pos = n FROM m
UNION ALL
SELECT 'date_in_range_ppm', n_dates * {_PPM} // n, n_dates = n FROM m
UNION ALL
SELECT 'fk_customer_orphans', n_orphans, n_orphans = 0 FROM fk
""",
)
def q_data_quality_audit(spark, sf_dir):
    """Declarative data-quality audit (the Deequ/expectations pattern): six
    rules over orders — row count, primary-key uniqueness, completeness,
    value-domain, date-range, and customer foreign-key integrity — reported
    as one row per rule with an integer metric (count or parts-per-million)
    and a pass flag. The five intra-table rules compute in ONE scan (a single
    multi-aggregate with map-side combine); the FK rule is a left-anti join
    that broadcasts nothing bigger than the customer key column. This is the
    release gate a masking pipeline runs before publishing a masked table."""
    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer").select("c_custkey")
    m = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("o_orderkey").cast("bigint").alias("n_pk"),
        F.count("o_orderpriority").cast("bigint").alias("n_prio"),
        F.sum(F.when(F.col("o_totalprice") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_pos"),
        F.sum(
            F.when(
                (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("2002-01-01").cast("timestamp")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_dates"),
    )
    orphans = (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
    )
    mm = m.crossJoin(orphans)
    rules = mm.select(
        F.expr(
            f"""stack(6,
  'row_count',             n,                       n > 0,
  'pk_unique_ppm',         n_pk * {_PPM} div n,     n_pk = n,
  'priority_complete_ppm', n_prio * {_PPM} div n,   n_prio = n,
  'price_positive_ppm',    n_pos * {_PPM} div n,    n_pos = n,
  'date_in_range_ppm',     n_dates * {_PPM} div n,  n_dates = n,
  'fk_customer_orphans',   n_orphans,               n_orphans = 0L
) AS (check_name, metric, passed)"""
        )
    )
    return rules


# ---------------------------------------------------------------------------
# Salted two-phase aggregation (hot-key group-by; round 4 cont.)
# ---------------------------------------------------------------------------


@register(
    "q_salted_aggregation",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders GROUP BY o_orderpriority
""",
)
def q_salted_aggregation(spark, sf_dir):
    """Hot-key aggregation via explicit two-phase salting: partial aggregate
    on (key, salt16) — 16 reducers share each hot key — then a final re-
    aggregate on the key alone over the tiny partial frame. The companion to
    ``q_salted_join_revenue``: Spark's map-side combine usually makes this
    unnecessary for algebraic aggregates, but when combine effectiveness
    collapses (high-cardinality map values, or a true hot key that still
    floods one reducer), the salt bounds any single task. Decomposable
    exact-decimal sums make the rewrite provably lossless — the oracle IS
    the plain one-phase group-by."""
    orders = T(spark, sf_dir, "orders")
    salt = F.expr(
        "CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % 16"
    )
    partial = (
        orders.groupBy("o_orderpriority", salt.alias("salt"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("pn"),
            F.sum(dec("o_totalprice", 18, 2)).alias("prev"),
        )
    )
    return (
        partial.groupBy("o_orderpriority")
        .agg(
            F.sum("pn").cast("bigint").alias("n_orders"),
            F.sum("prev").cast("double").alias("revenue"),
        )
    )


@register(
    "q_auto_join_revenue",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def q_auto_join_revenue(spark, sf_dir):
    """Measured-strategy join (operators/joins.py::choose_join_strategy):
    the plan picks plain / broadcast / salted from Catalyst's no-action dim
    size estimate plus ONE sampled fact-key histogram job, and returns the
    decision audit alongside the frame. At these SFs the customer dimension
    sits under the broadcast threshold → broadcast-hash join (asserted in
    tests/test_auto_join.py, along with the salted and plain branches on
    constructed skew). The oracle is strategy-independent: every branch
    produces the identical join result — that invariance IS the point."""
    from ..operators.joins import choose_join_strategy

    fact = T(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    dim = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined, _decision = choose_join_strategy(fact, dim, "o_custkey", "c_custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("total_revenue"),
    )


@register(
    "q_table_fingerprint",
    oracle="""
WITH rows_fp AS (
  SELECT o_orderstatus,
         CAST(('0x' || substr(md5(
             CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
             || '|' || o_orderstatus || '|'
             || strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
             || '|' || o_orderpriority), 1, 12)) AS BIGINT) AS fp48
  FROM orders
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(fp48) AS VARCHAR) AS checksum
FROM rows_fp GROUP BY o_orderstatus
""",
)
def q_table_fingerprint(spark, sf_dir):
    """Order-insensitive table checksum (anti-entropy fingerprint): each row
    canonicalizes to a delimited string, hashes to a 48-bit integer, and the
    per-partition-key SUM is the fingerprint. Two replicas (or a table before
    and after a migration/backfill) compare fingerprints per key instead of
    shipping data — the Merkle-less integrity check Cassandra-style repair
    and lakehouse migrations rely on, here as one map-side-combined hash
    aggregate over a single scan.

    SUM (not XOR) so duplicated-row corruption changes the value; 48-bit row
    hashes summed in DECIMAL(38,0) cannot overflow below ~1e25 rows; emitted
    as a string so both engines' wide-integer types compare exactly."""
    o = T(spark, sf_dir, "orders")
    canon = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd"),
        F.col("o_orderpriority"),
    )
    fp48 = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("decimal(38,0)")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(fp48).cast("decimal(38,0)").cast("string").alias("checksum"),
    )


# Benford first-digit expected frequencies, fp6 ppm = floor(log10(1+1/d)·1e6),
# generated once in Python and inlined into BOTH engines as literals.
_BENFORD_PPM = [301029, 176091, 124938, 96910, 79181, 66946, 57991, 51152, 45757]


@register(
    "q_benford_audit",
    oracle=f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                          AS VARCHAR), 1, 1) AS BIGINT) AS d
  FROM orders
  WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) > 0
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM digits),
obs AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM digits GROUP BY d)
SELECT obs.d,
       obs.cnt,
       CAST(floor(obs.cnt * 1000000.0 / n.total) AS BIGINT) AS observed_ppm,
       ([{", ".join(str(v) for v in _BENFORD_PPM)}])[obs.d] AS expected_ppm,
       abs(CAST(floor(obs.cnt * 1000000.0 / n.total) AS BIGINT)
           - ([{", ".join(str(v) for v in _BENFORD_PPM)}])[obs.d]) AS abs_dev_ppm
FROM obs CROSS JOIN n
""",
)
def q_benford_audit(spark, sf_dir):
    """Benford's-law first-digit audit of order amounts — the classic
    fabricated-data / ETL-corruption screen (a truncated feed, a unit-mixup
    backfill, or synthetic padding all bend the first-digit curve long
    before row counts move). First digit comes from the exact integer-cents
    STRING (no float log10), observed shares are floored ppm, and the
    expected Benford ppm are Python-precomputed literals inlined into both
    engines. One map-side-combined aggregate over one scan; the 9-row digit
    frame afterwards is free."""
    o = T(spark, sf_dir, "orders")
    cents = (dec("o_totalprice", 18, 2) * 100).cast("bigint")
    digits = o.select(
        F.substring(cents.cast("string"), 1, 1).cast("bigint").alias("d")
    ).filter(cents > 0)
    n = digits.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    exp_arr = F.array(*[F.lit(v) for v in _BENFORD_PPM])
    out = obs.crossJoin(F.broadcast(n)).select(
        "d",
        "cnt",
        F.floor(F.col("cnt") * 1_000_000.0 / F.col("total"))
        .cast("bigint")
        .alias("observed_ppm"),
        F.element_at(exp_arr, F.col("d").cast("int")).cast("bigint").alias("expected_ppm"),
    )
    return out.withColumn(
        "abs_dev_ppm", F.abs(F.col("observed_ppm") - F.col("expected_ppm"))
    )


@register(
    "q_sequence_gaps",
    oracle="""
SELECT CAST(floor(o_orderkey / 10000) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS present,
       CAST(MIN(o_orderkey) AS BIGINT) AS lo,
       CAST(MAX(o_orderkey) AS BIGINT) AS hi,
       CAST(MAX(o_orderkey) - MIN(o_orderkey) + 1 - COUNT(*) AS BIGINT)
         AS missing
FROM orders
GROUP BY 1
""",
)
def q_sequence_gaps(spark, sf_dir):
    """Sequence-completeness audit: per 10k-key bucket of the order-key
    space, how many keys inside the observed [min, max] span are MISSING —
    the CDC/ingestion completeness check (a dropped partition or a stalled
    consumer shows up as a bucket whose density collapses). Bucketing keeps
    it a single map-side-combined aggregate — no global sort, no LEAD window
    over the whole key space, and buckets parallelize perfectly at any
    scale. (TPC-H order keys are deliberately sparse — 8 of every 32 absent
    — so expected density is ~25%; the audit surfaces DEVIATIONS per
    bucket.)"""
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_orderkey") / 10000).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("present"),
            F.min("o_orderkey").cast("bigint").alias("lo"),
            F.max("o_orderkey").cast("bigint").alias("hi"),
        )
        .withColumn(
            "missing",
            (F.col("hi") - F.col("lo") + 1 - F.col("present")).cast("bigint"),
        )
    )


@register(
    "q_referential_integrity",
    oracle="""
SELECT rel, n_child, n_orphans FROM (
  SELECT 'orders.custkey->customer' AS rel,
         CAST(COUNT(*) AS BIGINT) AS n_child,
         CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_orphans, 1 AS ord
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  UNION ALL
  SELECT 'lineitem.orderkey->orders',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN ok.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), 2
  FROM lineitem l LEFT JOIN orders ok ON l.l_orderkey = ok.o_orderkey
  UNION ALL
  SELECT 'lineitem.partkey->part',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), 3
  FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
  UNION ALL
  SELECT 'lineitem.suppkey->supplier',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT), 4
  FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
) ORDER BY ord
""",
)
def q_referential_integrity(spark, sf_dir):
    """Referential-integrity audit across the star schema's four foreign-key
    relationships — the data-contract check an ingestion pipeline runs
    before anything joins: child rows counted once, orphans = children
    whose parent key is absent. Each relationship is ONE left join
    collapsing into a count/sum aggregate; the dimension sides (customer,
    part, supplier) broadcast, and the fact-fact relationship
    (lineitem→orders) co-partitions on the order key. At 100 TB the
    pattern is the same four joins — or their bloom-filter pre-screen
    (``q_bloom_dedup_screen``'s machinery) when even the anti-join's
    shuffle must be avoided."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )

    def rel(name, child, parent, ck, pk):
        return (
            child.join(parent, child[ck] == parent[pk], "left")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_child"),
                F.sum(F.when(parent[pk].isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_orphans"),
            )
            .select(F.lit(name).alias("rel"), "n_child", "n_orphans")
        )

    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    out = rel(
        "orders.custkey->customer",
        orders,
        T(spark, sf_dir, "customer").select("c_custkey"),
        "o_custkey",
        "c_custkey",
    )
    out = out.union(
        rel(
            "lineitem.orderkey->orders",
            li,
            orders.select("o_orderkey"),
            "l_orderkey",
            "o_orderkey",
        )
    )
    out = out.union(
        rel(
            "lineitem.partkey->part",
            li,
            T(spark, sf_dir, "part").select("p_partkey"),
            "l_partkey",
            "p_partkey",
        )
    )
    return out.union(
        rel(
            "lineitem.suppkey->supplier",
            li,
            T(spark, sf_dir, "supplier").select("s_suppkey"),
            "l_suppkey",
            "s_suppkey",
        )
    )


_SDRIFT_SPLIT = "2001-01-01"


@register(
    "q_schema_drift_audit",
    oracle=f"""
WITH long AS (
  SELECT CASE WHEN o_orderdate < TIMESTAMP '{_SDRIFT_SPLIT}'
              THEN 'old' ELSE 'new' END AS side,
         u.col, u.val
  FROM orders, LATERAL (VALUES
    ('o_orderstatus', o_orderstatus),
    ('o_orderpriority', o_orderpriority),
    ('o_custkey', CAST(o_custkey AS VARCHAR))
  ) AS u(col, val)
),
profile AS (
  SELECT col AS column_name,
         CAST(SUM(CASE WHEN side = 'old' THEN 1 ELSE 0 END) AS BIGINT)
           AS old_n,
         CAST(SUM(CASE WHEN side = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS new_n,
         CAST(SUM(CASE WHEN side = 'old' AND val IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS old_nulls,
         CAST(SUM(CASE WHEN side = 'new' AND val IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS new_nulls,
         CAST(COUNT(DISTINCT CASE WHEN side = 'old' THEN val END)
              AS BIGINT) AS old_distinct,
         CAST(COUNT(DISTINCT CASE WHEN side = 'new' THEN val END)
              AS BIGINT) AS new_distinct
  FROM long GROUP BY col
)
SELECT column_name, old_n, new_n, old_nulls, new_nulls,
       old_distinct, new_distinct,
       CAST(CASE WHEN new_distinct * 10 > old_distinct * 11
                   OR new_distinct * 10 < old_distinct * 9
                 THEN 1 ELSE 0 END AS BIGINT) AS distinct_drift_flag
FROM profile
""",
)
def q_schema_drift_audit(spark, sf_dir):
    """Column-profile drift between two snapshot eras of the same table
    (orders before vs after the split date) — the schema/contract monitor a
    data platform runs on every load: per column, row count, null count,
    and distinct cardinality on both sides, plus a ±10% distinct-drift flag
    in pure integer arithmetic. Complements q_snapshot_diff (row-level
    delta) and q_data_quality_audit (single-snapshot rules) with the
    era-over-era COLUMN view that catches upstream schema rot (an enum
    gaining values, a key collapsing, nulls appearing).

    Scale shape: ONE scan — the stack/unpivot is a projection and both
    eras profile in a single column-keyed aggregate via conditional
    old/new expressions (an old⋈new self-join would re-scan the table).
    The two conditional countDistincts ride the same shuffle through
    Spark's Expand; at 100 TB swap approx_count_distinct at the same seam
    if exactness is not contractual."""
    o = T(spark, sf_dir, "orders").select(
        F.when(
            F.col("o_orderdate") < F.lit(_SDRIFT_SPLIT).cast("timestamp"),
            F.lit("old"),
        )
        .otherwise(F.lit("new"))
        .alias("side"),
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_custkey").cast("string").alias("o_custkey_s"),
    )
    long = o.select(
        "side",
        F.expr(
            "stack(3, 'o_orderstatus', o_orderstatus, "
            "'o_orderpriority', o_orderpriority, "
            "'o_custkey', o_custkey_s) AS (col, val)"
        ),
    )
    is_old = F.col("side") == "old"
    is_new = F.col("side") == "new"
    prof = long.groupBy(F.col("col").alias("column_name")).agg(
        F.sum(is_old.cast("int")).cast("bigint").alias("old_n"),
        F.sum(is_new.cast("int")).cast("bigint").alias("new_n"),
        F.sum((is_old & F.col("val").isNull()).cast("int"))
        .cast("bigint")
        .alias("old_nulls"),
        F.sum((is_new & F.col("val").isNull()).cast("int"))
        .cast("bigint")
        .alias("new_nulls"),
        F.countDistinct(F.when(is_old, F.col("val")))
        .cast("bigint")
        .alias("old_distinct"),
        F.countDistinct(F.when(is_new, F.col("val")))
        .cast("bigint")
        .alias("new_distinct"),
    )
    return prof.select(
        "column_name",
        "old_n",
        "new_n",
        "old_nulls",
        "new_nulls",
        "old_distinct",
        "new_distinct",
        F.when(
            (F.col("new_distinct") * 10 > F.col("old_distinct") * 11)
            | (F.col("new_distinct") * 10 < F.col("old_distinct") * 9),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("distinct_drift_flag"),
    )


# ---------------------------------------------------------------------------
# Approximate functional-dependency audit (g3 error)
# ---------------------------------------------------------------------------

# (fd_name, table, lhs, rhs) — declared dependencies a contract would assert
_FDS = [
    ("orders:o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
    ("lineitem:l_orderkey->l_returnflag", "lineitem", "l_orderkey", "l_returnflag"),
    ("customer:c_custkey->c_mktsegment", "customer", "c_custkey", "c_mktsegment"),
    ("events:user_id->event_type", "events", "user_id", "event_type"),
]


def _fd_oracle_one(fd: str, table: str, lhs: str, rhs: str) -> str:
    return f"""
SELECT '{fd}' AS fd,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating_keys,
       CAST(SUM(n) - SUM(max_rhs) AS BIGINT) AS g3_rows,
       CAST(floor(1000000.0 * SUM(max_rhs) / SUM(n)) AS BIGINT)
         AS support_fp6
FROM (
  SELECT CAST(SUM(c) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS n_rhs,
         CAST(MAX(c) AS BIGINT) AS max_rhs
  FROM (
    SELECT {lhs}, {rhs}, COUNT(*) AS c FROM {table} GROUP BY 1, 2
  ) GROUP BY {lhs}
)"""


@register(
    "q_fd_violation_audit",
    oracle="\nUNION ALL\n".join(_fd_oracle_one(*fd) for fd in _FDS),
)
def q_fd_violation_audit(spark, sf_dir):
    """Approximate functional-dependency audit — the data-contract check
    "does X determine Y, and how badly is it violated?". For each declared
    FD X→Y it reports the key count, the keys carrying >1 distinct Y, the
    **g3 error** (minimum row deletions to make the FD hold exactly:
    ``Σn − Σ max_rhs_count`` — Kivinen & Mannila, TCS 1995), and the
    support share. Exact-key FDs (c_custkey→segment) report 0 violations;
    behavioral ones (user→event_type) quantify their non-determinism.

    Scale shape: each FD is two stacked key-grouped aggregates over its own
    table — (X, Y) counts, then per-X rollup — map-side combined, no joins;
    the audits union at |FDs| rows. At 100 TB each audit is the cheapest
    full-table statistic that can falsify the contract."""
    frames = []
    for fd, table, lhs, rhs in _FDS:
        xy = (
            T(spark, sf_dir, table)
            .groupBy(F.col(lhs).alias("x"), F.col(rhs).alias("y"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        )
        per_key = xy.groupBy("x").agg(
            F.sum("c").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("n_rhs"),
            F.max("c").cast("bigint").alias("max_rhs"),
        )
        frames.append(
            per_key.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating_keys"),
                (F.sum("n") - F.sum("max_rhs")).cast("bigint").alias("g3_rows"),
                F.floor(1_000_000.0 * F.sum("max_rhs") / F.sum("n"))
                .cast("bigint")
                .alias("support_fp6"),
            ).select(F.lit(fd).alias("fd"), "*")
        )
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out


# ---------------------------------------------------------------------------
# Benford first-digit audit (Newcomb 1881, Benford 1938) — the classic
# fabricated-data / unit-mix screen for financial-style columns
# ---------------------------------------------------------------------------

# log10(1 + 1/d) at fp9 — shared integer literals, so both engines do pure
# integer arithmetic from here on (no logs in-plan)
_BENFORD_FP9 = {
    1: 301029996, 2: 176091259, 3: 124938737, 4: 96910013, 5: 79181246,
    6: 66946790, 7: 57991947, 8: 51152522, 9: 45757491,
}
# chi-square critical value at df=8, alpha=0.05 (15.50731), fp6
_BENFORD_CRIT_FP6 = 15_507_310


_BENFORD_ORACLE = f"""
WITH cents AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
  FROM orders WHERE o_totalprice > 0
),
obs AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM cents GROUP BY 1
),
grid AS (
  SELECT d.digit, d.p_fp9, CAST(COALESCE(o.n_obs, 0) AS HUGEINT) AS n_obs
  FROM (VALUES {", ".join(f"({d}, {p})" for d, p in _BENFORD_FP9.items())})
       d(digit, p_fp9)
  LEFT JOIN obs o USING (digit)
),
tot AS (SELECT CAST(SUM(n_obs) AS HUGEINT) AS n FROM grid),
terms AS (
  SELECT g.digit, g.n_obs, g.p_fp9, t.n,
         CASE WHEN t.n = 0 THEN 0
              ELSE (g.n_obs * 1000000000 - t.n * g.p_fp9)
                   * (g.n_obs * 1000000000 - t.n * g.p_fp9)
                   * 1000000
                   // (t.n * g.p_fp9 * 1000000000) END AS term_fp6
  FROM grid g, tot t
),
chi AS (SELECT CAST(SUM(term_fp6) AS BIGINT) AS chi2_fp6 FROM terms)
SELECT CAST(t.digit AS BIGINT) AS digit,
       CAST(t.n_obs AS BIGINT) AS n_obs,
       CAST(t.p_fp9 AS BIGINT) AS p_fp9,
       CAST(t.term_fp6 AS BIGINT) AS chi2_term_fp6,
       CAST(t.n AS BIGINT) AS n_total,
       c.chi2_fp6,
       CAST(CASE WHEN c.chi2_fp6 <= {_BENFORD_CRIT_FP6} THEN 1 ELSE 0 END
            AS BIGINT) AS benford_ok
FROM terms t, chi c
ORDER BY digit
"""


@register("q_benford_digit_audit", oracle=_BENFORD_ORACLE)
def q_benford_digit_audit(spark, sf_dir):
    """Benford first-significant-digit audit over order totals: observed
    digit counts vs the Benford expectation, a chi-square statistic, and
    the df=8 5% verdict — the standard screen for fabricated values,
    unit mixing, or synthetic-generator artifacts in financial-style
    columns. Exactness: the nine log10(1+1/d) expectations are SHARED
    fp9 integer literals, so the whole test is integer multiply +
    truncating division in both engines (chi-square terms at fp6, no
    logs or floats in-plan). One fact aggregate; everything downstream
    runs on the 9-row digit grid (zero-filled, so the output schema is
    constant). Numeric bound (ADVICE r11 #3): the exact fp9 chi-square
    lane is WORST-CASE safe in DECIMAL(38,0)/HUGEINT up to N ≈ 10^7 rows
    — the binding term is all mass on one rare digit (digit 9:
    diff ≈ 0.954·N·10^9, squared and scaled by 10^6), and overflow past
    the bound fails DIVERGENTLY (Spark non-ANSI → NULL, DuckDB →
    raise), so the bound is a hard precondition, not a soft one. For
    near-Benford data the slack extends to N ≈ 3·10^7, but do not rely
    on it: past 10^7 rows, run the audit on a fixed-rate sample —
    Benford is a DISTRIBUTION test, so a uniform sample preserves the
    verdict while keeping the arithmetic exact."""
    o = T(spark, sf_dir, "orders")
    obs = (
        o.filter(F.col("o_totalprice") > 0)
        .select(
            F.expr(
                "CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))"
                " * 100 AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs"))
    )
    grid = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_FP9.items()], "digit bigint, p_fp9 bigint"
    )
    g = (
        grid.join(obs, "digit", "left")
        .select(
            "digit",
            "p_fp9",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("bigint").alias("n_obs"),
        )
        # 9-row grid; consumers: total + terms
        .transform(_persisted_quality)
    )
    tot = g.agg(F.sum("n_obs").cast("bigint").alias("n"))
    terms = g.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        "p_fp9",
        "n",
        F.expr(
            "CASE WHEN n = 0 THEN 0L ELSE "
            "CAST((CAST(n_obs AS DECIMAL(38,0)) * 1000000000 - CAST(n AS"
            " DECIMAL(38,0)) * p_fp9)"
            " * (CAST(n_obs AS DECIMAL(38,0)) * 1000000000 - CAST(n AS"
            " DECIMAL(38,0)) * p_fp9)"
            " * 1000000"
            " div (CAST(n AS DECIMAL(38,0)) * p_fp9 * 1000000000)"
            " AS BIGINT) END"
        ).alias("chi2_term_fp6"),
    )
    chi = terms.agg(F.sum("chi2_term_fp6").cast("bigint").alias("chi2_fp6"))
    return terms.crossJoin(F.broadcast(chi)).select(
        "digit",
        "n_obs",
        "p_fp9",
        "chi2_term_fp6",
        F.col("n").alias("n_total"),
        "chi2_fp6",
        F.when(F.col("chi2_fp6") <= _BENFORD_CRIT_FP6, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("benford_ok"),
    )
