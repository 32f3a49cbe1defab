"""Feature statistics: correlation matrix and equi-width histograms.

Both follow the registry's bit-stability contract: moments are EXACT decimal
sums (order-independent under any partitioning), cast to double once, with
the remaining scalar arithmetic written expression-for-expression identically
in the DuckDB oracle; published floats are floor(x*1e6) fixed-point.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, dec, register


@register(
    "q_feature_correlation",
    # Measures are scaled to exact integer hundredths (correlation is
    # scale-invariant) so every moment is integer arithmetic: per-row
    # products fit BIGINT, sums accumulate in DECIMAL(38,0) — exact in both
    # engines with no cross-engine decimal-multiplication width rules.
    oracle="""
WITH u AS (
  SELECT CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS p,
         CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS d
  FROM lineitem
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS DOUBLE) AS sq,
         CAST(SUM(p) AS DOUBLE) AS sp,
         CAST(SUM(d) AS DOUBLE) AS sd,
         CAST(SUM(CAST(q * q AS DECIMAL(38,0))) AS DOUBLE) AS sqq,
         CAST(SUM(CAST(p * p AS DECIMAL(38,0))) AS DOUBLE) AS spp,
         CAST(SUM(CAST(d * d AS DECIMAL(38,0))) AS DOUBLE) AS sdd,
         CAST(SUM(CAST(q * p AS DECIMAL(38,0))) AS DOUBLE) AS sqp,
         CAST(SUM(CAST(q * d AS DECIMAL(38,0))) AS DOUBLE) AS sqd,
         CAST(SUM(CAST(p * d AS DECIMAL(38,0))) AS DOUBLE) AS spd
  FROM u
)
SELECT pair,
       CAST(floor((n * sxy - sx * sy)
            / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1000000) AS BIGINT)
         AS corr_fp6
FROM (
  SELECT 'quantity~extendedprice' AS pair, n, sq AS sx, sp AS sy,
         sqq AS sxx, spp AS syy, sqp AS sxy FROM m
  UNION ALL
  SELECT 'quantity~discount', n, sq, sd, sqq, sdd, sqd FROM m
  UNION ALL
  SELECT 'extendedprice~discount', n, sp, sd, spp, sdd, spd FROM m
)
""",
)
def q_feature_correlation(spark, sf_dir):
    """Pearson correlation matrix over three lineitem measures in ONE scan:
    a single multi-aggregate computes every first and second moment as an
    exact decimal sum (map-side combined, order-independent), the 1-row
    moment frame is unpivoted to (pair, corr) rows, and the correlation
    formula runs in per-row double arithmetic identical to the oracle's.
    The one-pass moment shape is how feature stats are computed at 100 TB —
    never one pass per pair."""
    li = T(spark, sf_dir, "lineitem")
    u = li.select(
        *(
            (dec(c, 18, 2) * 100).cast("bigint").alias(a)
            for c, a in (
                ("l_quantity", "q"),
                ("l_extendedprice", "p"),
                ("l_discount", "d"),
            )
        )
    )
    q, p, d = F.col("q"), F.col("p"), F.col("d")

    def s2(x, y):
        return F.sum((x * y).cast("decimal(38,0)")).cast("double")

    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(q).cast("double").alias("sq"),
        F.sum(p).cast("double").alias("sp"),
        F.sum(d).cast("double").alias("sd"),
        s2(q, q).alias("sqq"),
        s2(p, p).alias("spp"),
        s2(d, d).alias("sdd"),
        s2(q, p).alias("sqp"),
        s2(q, d).alias("sqd"),
        s2(p, d).alias("spd"),
    )
    pairs = m.select(
        F.expr(
            """stack(3,
  'quantity~extendedprice', sq, sp, sqq, spp, sqp,
  'quantity~discount',      sq, sd, sqq, sdd, sqd,
  'extendedprice~discount', sp, sd, spp, sdd, spd
) AS (pair, sx, sy, sxx, syy, sxy)"""
        ),
        "n",
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return pairs.select(
        "pair", F.floor(corr * F.lit(1_000_000)).cast("bigint").alias("corr_fp6")
    )


@register(
    "q_winsorize_prices",
    # Thresholds come from an explicit cumulative rank over DISTINCT price
    # values (integer cents): engine-exact by construction, where interpolated
    # percentile implementations differ in float rounding across engines.
    oracle="""
WITH u AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
pc AS (
  SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM u GROUP BY cents
),
cum AS (
  SELECT cents, SUM(cnt) OVER (ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         (SELECT SUM(cnt) FROM pc) AS n
  FROM pc
),
th AS (
  SELECT MIN(CASE WHEN c >= CAST(ceil(0.01 * n) AS BIGINT) THEN cents END) AS lo,
         MIN(CASE WHEN c >= CAST(ceil(0.99 * n) AS BIGINT) THEN cents END) AS hi
  FROM cum
)
SELECT CAST(th.lo AS BIGINT) AS lo_cents,
       CAST(th.hi AS BIGINT) AS hi_cents,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN u.cents < th.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN u.cents > th.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
       CAST(SUM(GREATEST(th.lo, LEAST(th.hi, u.cents))) AS BIGINT) AS sum_clipped_cents
FROM u CROSS JOIN th
GROUP BY th.lo, th.hi
""",
)
def q_winsorize_prices(spark, sf_dir, mode="exact"):
    """Winsorization (tail clipping at the exact p1/p99): thresholds are the
    smallest values whose CUMULATIVE count reaches ceil(p*n) — computed by
    sorting only the DISTINCT price values with their counts (a frame
    thousands of times smaller than the fact table; the corpus itself is
    never globally sorted), then broadcast back for the clip pass. Exact
    integer cents end-to-end, so thresholds and clipped sums are
    engine-identical — interpolated-percentile clipping is not (float
    rounding differs across engines). The threshold seam is the shared
    ``operators/quantiles.quantile_thresholds`` helper; the registered
    query runs mode="exact" (oracle-checkable), and
    ``q_winsorize_prices_approx`` runs the same plan with the
    Greenwald-Khanna ``percentile_approx`` aggregate — the 100 TB path for
    near-unique value columns (no distinct-value frame, no window,
    mergeable O(accuracy) state)."""
    from ..operators.quantiles import quantile_thresholds

    orders = T(spark, sf_dir, "orders")
    u = orders.select(
        (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("cents")
    )
    th = quantile_thresholds(u, "cents", {"lo": 0.01, "hi": 0.99}, mode=mode)
    clipped = u.crossJoin(F.broadcast(th))
    return clipped.groupBy(
        F.col("lo").cast("bigint").alias("lo_cents"),
        F.col("hi").cast("bigint").alias("hi_cents"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("cents") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.sum(F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("cents"))))
        .cast("bigint")
        .alias("sum_clipped_cents"),
    )


_WINSORIZE_APPROX_ORACLE = """
WITH u AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
pc AS (
  SELECT cents, CAST(COUNT(*) AS BIGINT) AS cnt FROM u GROUP BY cents
),
cum AS (
  SELECT cents, SUM(cnt) OVER (ORDER BY cents
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         (SELECT SUM(cnt) FROM pc) AS n
  FROM pc
),
th AS (
  SELECT MIN(CASE WHEN c >= CAST(ceil(0.01 * n) AS BIGINT) THEN cents END) AS lo,
         MIN(CASE WHEN c >= CAST(ceil(0.99 * n) AS BIGINT) THEN cents END) AS hi,
         ANY_VALUE(n) AS n
  FROM cum
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(lo AS BIGINT) AS lo_exact_cents,
       CAST(hi AS BIGINT) AS hi_exact_cents,
       CAST(3 * ((n + 9999) // 10000) + 1 AS BIGINT) AS rank_err_budget,
       CAST(1 AS BIGINT) AS lo_rank_within_budget,
       CAST(1 AS BIGINT) AS hi_rank_within_budget
FROM th
"""


@register("q_winsorize_prices_approx", oracle=_WINSORIZE_APPROX_ORACLE)
def q_winsorize_prices_approx(spark, sf_dir):
    """The 100 TB winsorize mode, as a hash-oracled APPROXIMATION-ERROR
    AUDIT (VERDICT r07 #4, the ``q_minhash_estimate_error`` pattern): the
    p1/p99 thresholds come from ONE ``percentile_approx`` aggregate
    (mergeable Greenwald-Khanna partials, no window, no distinct-value
    frame — O(accuracy) state at any cardinality) through the same
    ``quantile_thresholds`` seam as the exact mode. The plan then measures
    each approx threshold's TRUE rank interval [count(<v)+1, count(<=v)]
    with one more scan-side aggregate and emits a deterministic verdict:
    the interval intersects [ceil(p·n) − B, ceil(p·n) + B] for the budget
    B = 3·ceil(n/accuracy) + 1 (3× the nominal n/accuracy GK guarantee —
    headroom for sketch-merge error across partitions). The emitted columns
    (n, exact thresholds, budget, verdicts) are all engine-deterministic,
    so DuckDB hash-checks them; the GK values themselves stay in-plan.
    ``tests/test_round7_ops.py`` pins the approx thresholds inside the
    exact thresholds' neighborhood on top of this."""
    from ..operators.quantiles import quantile_thresholds

    orders = T(spark, sf_dir, "orders")
    u = orders.select(
        (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("cents")
    )
    ap = quantile_thresholds(u, "cents", {"lo_a": 0.01, "hi_a": 0.99}, mode="approx")
    ex = quantile_thresholds(u, "cents", {"lo_e": 0.01, "hi_e": 0.99}, mode="exact")
    ranks = u.crossJoin(F.broadcast(ap)).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("cents") < F.col("lo_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("lt_lo"),
        F.sum(F.when(F.col("cents") <= F.col("lo_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("le_lo"),
        F.sum(F.when(F.col("cents") < F.col("hi_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("lt_hi"),
        F.sum(F.when(F.col("cents") <= F.col("hi_a"), 1).otherwise(0))
        .cast("bigint")
        .alias("le_hi"),
    )
    j = ranks.crossJoin(F.broadcast(ex))
    budget = F.expr("3 * ((n + 9999) div 10000) + 1")
    t_lo = F.expr("(n + 99) div 100")  # ceil(0.01·n), exact integer
    t_hi = F.expr("(99 * n + 99) div 100")  # ceil(0.99·n)
    lo_ok = (F.col("lt_lo") + 1 <= t_lo + budget) & (F.col("le_lo") >= t_lo - budget)
    hi_ok = (F.col("lt_hi") + 1 <= t_hi + budget) & (F.col("le_hi") >= t_hi - budget)
    return j.select(
        "n",
        F.col("lo_e").alias("lo_exact_cents"),
        F.col("hi_e").alias("hi_exact_cents"),
        budget.cast("bigint").alias("rank_err_budget"),
        F.when(lo_ok, 1).otherwise(0).cast("bigint").alias("lo_rank_within_budget"),
        F.when(hi_ok, 1).otherwise(0).cast("bigint").alias("hi_rank_within_budget"),
    )


@register(
    "q_value_histogram",
    oracle="""
WITH b AS (
  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       CAST(LEAST(CAST(floor((e.value - b.lo) / ((b.hi - b.lo) / 20.0)) AS INTEGER), 19)
            AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN b ON e.event_type = b.event_type
GROUP BY e.event_type, bucket
""",
)
def q_value_histogram(spark, sf_dir):
    """Equi-width 20-bucket histogram of ``value`` per event type — the
    profiling primitive behind skew detection and binned features. Min/max
    are exact selections (order-independent even for doubles); the bucket
    index is per-row scalar arithmetic identical in the oracle, with the
    max value clamped into the last bucket. Two map-side-combined
    aggregates; the 5-row bounds frame broadcasts back onto the scan."""
    e = T(spark, sf_dir, "events")
    b = e.groupBy(F.col("event_type").alias("et")).agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    j = e.join(F.broadcast(b), e.event_type == b.et)
    bucket = F.least(
        F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / F.lit(20.0))).cast("int"),
        F.lit(19),
    )
    return (
        j.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters (deterministic sketch -> exactly oracle-able)
# ---------------------------------------------------------------------------

_CMS_D = 4      # hash rows
_CMS_W = 256    # buckets per row
_TOPK = 20


def _cms_bucket_spark(j: int, col: str) -> str:
    return (
        f"(CAST(conv(substring(md5(concat('cms{j}:', CAST({col} AS STRING))), 1, 8), 16, 10) "
        f"AS BIGINT) % {_CMS_W})"
    )


def _cms_bucket_duck(j: int, col: str) -> str:
    return (
        f"(CAST(('0x' || substr(md5('cms{j}:' || CAST({col} AS VARCHAR)), 1, 8)) "
        f"AS BIGINT) % {_CMS_W})"
    )


@register(
    "q_heavy_hitters_cms",
    oracle=f"""
WITH cells AS (
  {" UNION ALL ".join(
      f"SELECT {j} AS j, {_cms_bucket_duck(j, 'user_id')} AS bucket, COUNT(*) AS c "
      f"FROM events GROUP BY bucket"
      for j in range(_CMS_D)
  )}
),
truth AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM events GROUP BY user_id
  ORDER BY true_n DESC, user_id ASC LIMIT {_TOPK}
)
SELECT t.user_id, t.true_n,
       CAST(MIN(c.c) AS BIGINT) AS cms_est
FROM truth t JOIN cells c
  ON c.bucket = CASE c.j
       {" ".join(f"WHEN {j} THEN {_cms_bucket_duck(j, 't.user_id')}" for j in range(_CMS_D))}
     END
GROUP BY t.user_id, t.true_n
""",
)
def q_heavy_hitters_cms(spark, sf_dir):
    """Heavy hitters through a count-min sketch whose hash rows are
    md5-derived — the sketch itself is deterministic, so unlike the usual
    rows-only sketch checks the ENTIRE mechanism (4x256 cell counts, min-over
    -rows estimation, the one-sided overestimate) is hash-matched against
    DuckDB. Emits the exact top-20 users with true counts next to the CMS
    estimate (est >= true always; equality when no bucket collisions). The
    sketch build is a 4x fan-out aggregate with map-side combine into 1024
    cells — constant memory however many distinct keys exist, which is the
    whole point at 100 TB; the tiny cell table broadcasts onto the top-k
    probe."""
    e = T(spark, sf_dir, "events")
    cells = None
    for j in range(_CMS_D):
        cj = (
            e.select(F.expr(_cms_bucket_spark(j, "user_id")).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit(j).alias("j"), "bucket", "c")
        )
        cells = cj if cells is None else cells.union(cj)
    truth = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
        .orderBy(F.desc("true_n"), F.asc("user_id"))
        .limit(_TOPK)
    )
    probe_bucket = "CASE j " + " ".join(
        f"WHEN {j} THEN {_cms_bucket_spark(j, 'user_id')}" for j in range(_CMS_D)
    ) + " END"
    return (
        truth.join(F.broadcast(cells), F.expr(f"bucket = {probe_bucket}"))
        .groupBy("user_id", "true_n")
        .agg(F.min("c").cast("bigint").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# UNPIVOT (wide -> long) via the native DataFrame surface
# ---------------------------------------------------------------------------


@register(
    "q_unpivot_measures",
    oracle="""
WITH long AS (
  SELECT 'l_quantity' AS measure, CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem
  UNION ALL
  SELECT 'l_extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
  UNION ALL
  SELECT 'l_discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
  UNION ALL
  SELECT 'l_tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
)
SELECT measure,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS DOUBLE) AS total,
       CAST(MIN(v) AS DOUBLE) AS lo,
       CAST(MAX(v) AS DOUBLE) AS hi
FROM long GROUP BY measure
""",
)
def q_unpivot_measures(spark, sf_dir):
    """Wide-to-long reshaping via Spark's NATIVE ``DataFrame.unpivot``
    (Spark 3.4+/4 melt surface — the inverse of the pivot the registry
    already covers), then per-measure summary stats. Unpivot is a
    partition-local 1-to-4 expansion (zero shuffle) feeding one map-side-
    combined aggregate; sums accumulate exact decimals cast to double
    once."""
    li = T(spark, sf_dir, "lineitem").select(
        *(dec(c, 18, 2).alias(c) for c in
          ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    )
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="v",
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("double").alias("total"),
        F.min("v").cast("double").alias("lo"),
        F.max("v").cast("double").alias("hi"),
    )


# ---------------------------------------------------------------------------
# Null-safe join semantics (<=> / IS NOT DISTINCT FROM)
# ---------------------------------------------------------------------------


@register(
    "q_null_safe_join",
    oracle="""
WITH l AS (
  SELECT event_id,
         CASE WHEN value < 1.0 THEN NULL
              ELSE CAST(floor(value) AS BIGINT) END AS k
  FROM events WHERE event_type = 'click'
),
r AS (
  SELECT CASE WHEN value < 1.0 THEN NULL
              ELSE CAST(floor(value) AS BIGINT) END AS k,
         CAST(COUNT(*) AS BIGINT) AS n_views
  FROM events WHERE event_type = 'view'
  GROUP BY 1
)
SELECT l.k, CAST(COUNT(*) AS BIGINT) AS n_clicks, MAX(r.n_views) AS n_views
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
GROUP BY l.k
""",
)
def q_null_safe_join(spark, sf_dir):
    """Null-safe equality join (Spark ``eqNullSafe`` / SQL ``<=>``, DuckDB
    ``IS NOT DISTINCT FROM``): NULL keys MATCH each other instead of
    silently dropping, the semantics every "unknown bucket" join needs
    (plain equality would discard the NULL group from both sides). The
    aggregated build side stays broadcast-sized; NULL<=>NULL hashes like any
    other key, so the plan is the ordinary broadcast-hash join."""
    e = T(spark, sf_dir, "events")
    key = F.when(F.col("value") < 1.0, F.lit(None).cast("bigint")).otherwise(
        F.floor("value").cast("bigint")
    )
    left = e.filter(F.col("event_type") == "click").select(
        "event_id", key.alias("k")
    )
    right = (
        e.filter(F.col("event_type") == "view")
        .select(key.alias("rk"))
        .groupBy("rk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_views"))
    )
    return (
        left.join(F.broadcast(right), left.k.eqNullSafe(right.rk))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
            F.max("n_views").alias("n_views"),
        )
    )


@register(
    "q_mode_per_group",
    oracle="""
WITH cnt AS (
  SELECT event_type, CAST(value AS DECIMAL(10,2)) AS v,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, v, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n DESC, v) AS rn
  FROM cnt
)
SELECT event_type, CAST(v AS DOUBLE) AS mode_value, n AS mode_count
FROM ranked WHERE rn = 1
""",
)
def q_mode_per_group(spark, sf_dir):
    """Deterministic per-group mode: most frequent value with the SMALLEST
    value winning ties. Spark's built-in ``mode()`` is tie-nondeterministic
    (and engines disagree on ties), so the engine-stable formulation is
    count + rank — one hash aggregate on (group, value) and a window over
    the distinct-value frame, exactly the two-step every deterministic mode
    needs at scale."""
    e = T(spark, sf_dir, "events")
    cnt = e.groupBy(
        "event_type", F.col("value").cast("decimal(10,2)").alias("v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy(F.desc("n"), "v")
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("v").cast("double").alias("mode_value"),
            F.col("n").alias("mode_count"),
        )
    )


@register(
    "q_percentile_disc_exact",
    oracle="""
WITH cents AS (
  SELECT event_type, CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS c
  FROM events
),
cnt AS (
  SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS n FROM cents GROUP BY 1, 2
),
cum AS (
  SELECT event_type, c, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY c
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
         SUM(n) OVER (PARTITION BY event_type) AS total
  FROM cnt
)
SELECT event_type,
       CAST(MIN(CASE WHEN r >= CAST(ceil(0.50 * total) AS BIGINT) THEN c END) AS BIGINT) AS p50_cents,
       CAST(MIN(CASE WHEN r >= CAST(ceil(0.95 * total) AS BIGINT) THEN c END) AS BIGINT) AS p95_cents,
       CAST(MIN(CASE WHEN r >= CAST(ceil(0.99 * total) AS BIGINT) THEN c END) AS BIGINT) AS p99_cents,
       CAST(MIN(total) AS BIGINT) AS n
FROM cum GROUP BY event_type
""",
)
def q_percentile_disc_exact(spark, sf_dir):
    """EXACT discrete percentiles (PERCENTILE_DISC semantics) per group via
    cumulative counts over the DISTINCT-value frame — the engine-portable
    exact-quantile shape (interpolating percentile_cont differs in float
    detail across engines; the discrete rank definition cannot). The corpus
    contributes one (group, value) hash aggregate; the cumulative window
    runs on the distinct-value frame (bounded by value cardinality, not row
    count) — same discipline as q_winsorize_prices. The GK-sketch path
    (q_approx_quantiles) remains the tolerance-checked scale alternative."""
    e = T(spark, sf_dir, "events")
    cents = e.select(
        "event_type",
        (F.col("value").cast("decimal(10,2)") * 100).cast("bigint").alias("c"),
    )
    cnt = cents.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    from pyspark.sql import Window as W

    wc = (
        W.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wt = W.partitionBy("event_type")
    cum = cnt.select(
        "event_type",
        "c",
        F.sum("n").over(wc).alias("r"),
        F.sum("n").over(wt).alias("total"),
    )

    def pick(p):
        thr = F.ceil(F.lit(p) * F.col("total")).cast("bigint")
        return F.min(F.when(F.col("r") >= thr, F.col("c"))).cast("bigint")

    return cum.groupBy("event_type").agg(
        pick(0.50).alias("p50_cents"),
        pick(0.95).alias("p95_cents"),
        pick(0.99).alias("p99_cents"),
        F.min("total").cast("bigint").alias("n"),
    )


_EQD_BUCKETS = 16


@register(
    "q_equidepth_histogram",
    oracle=f"""
WITH cents AS (
  SELECT event_type, CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS c
  FROM events
),
cnt AS (
  SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS n FROM cents GROUP BY 1, 2
),
cum AS (
  SELECT event_type, c, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY c
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
         SUM(n) OVER (PARTITION BY event_type) AS total
  FROM cnt
),
assigned AS (
  SELECT event_type, c, n,
         LEAST(CAST(floor((r - n) * {_EQD_BUCKETS} * 1.0 / total) AS BIGINT),
               {_EQD_BUCKETS - 1}) AS bucket
  FROM cum
)
SELECT event_type, bucket,
       CAST(MIN(c) AS BIGINT) AS lo_cents,
       CAST(MAX(c) AS BIGINT) AS hi_cents,
       CAST(SUM(n) AS BIGINT) AS n_rows
FROM assigned GROUP BY event_type, bucket
""",
)
def q_equidepth_histogram(spark, sf_dir):
    """Equi-DEPTH histogram (equal-count buckets) per group — the statistic
    real optimizers keep (equi-width q_value_histogram mis-sizes skewed
    data; equi-depth bounds every bucket's selectivity error). A distinct
    value lands in bucket floor(rank_before_it·B/total) — computed from
    cumulative counts over the distinct-VALUE frame, the same
    no-global-sort discipline as q_percentile_disc_exact; a value whose
    duplicates straddle a boundary stays whole in its first bucket (the
    standard end-biased convention), so bucket populations deviate only by
    duplicate mass, never by engine. At 100 TB (value cardinality approaching
    row count) swap the cumulative stage for B-1 approx bucket boundaries via
    ``operators/quantiles.quantile_thresholds(mode="approx")`` and assign by
    broadcast range probe — the seam q_winsorize_prices_approx exercises."""
    e = T(spark, sf_dir, "events")
    cents = e.select(
        "event_type",
        (F.col("value").cast("decimal(10,2)") * 100).cast("bigint").alias("c"),
    )
    cnt = cents.groupBy("event_type", "c").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    from pyspark.sql import Window as W

    wc = (
        W.partitionBy("event_type").orderBy("c").rowsBetween(W.unboundedPreceding, 0)
    )
    wt = W.partitionBy("event_type")
    cum = cnt.select(
        "event_type",
        "c",
        "n",
        F.sum("n").over(wc).alias("r"),
        F.sum("n").over(wt).alias("total"),
    )
    bucket = F.least(
        F.floor((F.col("r") - F.col("n")) * _EQD_BUCKETS * 1.0 / F.col("total"))
        .cast("bigint"),
        F.lit(_EQD_BUCKETS - 1).cast("bigint"),
    )
    return cum.withColumn("bucket", bucket).groupBy("event_type", "bucket").agg(
        F.min("c").cast("bigint").alias("lo_cents"),
        F.max("c").cast("bigint").alias("hi_cents"),
        F.sum("n").cast("bigint").alias("n_rows"),
    )


@register(
    "q_trimmed_mean",
    oracle="""
WITH cents AS (
  SELECT event_type, CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS c
  FROM events
),
vc AS (SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS cnt FROM cents GROUP BY 1, 2),
cum AS (
  SELECT event_type, c,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
         SUM(cnt) OVER (PARTITION BY event_type) AS tot
  FROM vc
),
cuts AS (
  SELECT event_type,
         MIN(CASE WHEN r >= CAST(ceil(0.10 * tot) AS BIGINT) THEN c END) AS lo,
         MIN(CASE WHEN r >= CAST(ceil(0.90 * tot) AS BIGINT) THEN c END) AS hi
  FROM cum GROUP BY event_type
)
SELECT x.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(CASE WHEN x.c >= k.lo AND x.c <= k.hi THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       CAST(floor(SUM(CASE WHEN x.c >= k.lo AND x.c <= k.hi THEN x.c ELSE 0 END)
            * 1.0 / SUM(CASE WHEN x.c >= k.lo AND x.c <= k.hi THEN 1 ELSE 0 END))
            AS BIGINT) AS trimmed_mean_cents
FROM cents x JOIN cuts k ON x.event_type = k.event_type
GROUP BY x.event_type
""",
)
def q_trimmed_mean(spark, sf_dir):
    """10%-trimmed mean per event type — the robust center the plain mean
    is not (one fat-finger value moves the mean arbitrarily; the trimmed
    mean discards everything outside the exact [p10, p90] value band).
    Cuts come from the shared GROUPED ``quantile_thresholds`` seam (exact
    rank over the distinct-value frame; GK-approx at unbounded
    cardinality), broadcast back for one conditional-sum pass — the
    winsorize shape with drop instead of clamp. Exact integer cents
    throughout; the published mean is floor-divided."""
    from ..operators.quantiles import quantile_thresholds

    e = T(spark, sf_dir, "events")
    cents = e.select(
        "event_type",
        (F.col("value").cast("decimal(10,2)") * 100).cast("bigint").alias("c"),
    )
    cuts = quantile_thresholds(
        cents, "c", {"lo": 0.10, "hi": 0.90}, group_cols=("event_type",)
    )
    kept = (F.col("c") >= F.col("lo")) & (F.col("c") <= F.col("hi"))
    return (
        cents.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.floor(
                F.sum(F.when(kept, F.col("c")).otherwise(0))
                * 1.0
                / F.sum(F.when(kept, 1).otherwise(0))
            )
            .cast("bigint")
            .alias("trimmed_mean_cents"),
        )
    )
