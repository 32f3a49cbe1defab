"""Distribution-shift and replication-variance statistics, round 12:

* **Two-sample Cramér-von Mises** (Anderson 1962, "On the distribution of
  the two-sample Cramér-von Mises criterion") — the quadratic-EDF
  companion to the KS/Mann-Whitney/Kruskal-Wallis family (plans/stats3):
  where KS reacts to the single worst ECDF gap, CvM integrates the squared
  gap over the whole distribution, so it catches broad mid-distribution
  drift KS under-weights. Computed EXACTLY on the distinct-value count
  frame with midranks: using DOUBLED ranks (ties stay integral, the
  plans/trend.py Hamed-Rao discipline) the rank-index deviations sum in
  closed form per tied group, carried at 6× SCALE so the whole plan is
  DIVISION-FREE (Spark's ``div`` narrows its result to LONG, and the
  un-scaled sum-of-squares helper t(t+1)(2t+1) div 6 overflows long past
  t ≈ 3·10⁶ under ANSI — caught by the 20M-row stress case):

      6·Σ_{i=lo..hi} (C − 2i)²
        = 6·a·C² − 12·C·a·(2c₀+a+1) + 4·(G(hi) − G(c₀)),
      G(t) = t(t+1)(2t+1)   (no division anywhere),

  with C the doubled midrank and c₀ the group's exclusive cumulative
  count — so U2_6 = 24U = n·ΣX₆ + m·ΣY₆ needs no per-row ranks and no
  integral division. The criterion is kept as the equal-ratio doubled
  pair 2·T_num = U2_6 − 4nm(4nm−1), 2·T_den = 24·n·m·N (same truncating
  quotient, same verdict as T_num/T_den); the fp6 report divides ONCE at
  the end — the quotient is T-sized, so the long result is safe — and
  the 5% verdict is the division-free inequality
  1000·(2T_num) > 461·(2T_den) (0.461 = asymptotic 5% critical value of
  the limiting ω² distribution). Numeric lane: DECIMAL(38,0)/HUGEINT;
  worst-case U2_6 ≤ 24·N⁴, so the exact lane holds to N ≈ 5·10⁷ pooled
  observations — past that, fixed-rate sample (distribution test; the
  plans/quality.py Benford discipline).

* **Delete-one-group jackknife** (Quenouille 1956, Tukey 1958; the
  standard error every ratio metric on correlated event data needs —
  per-observation variance formulas are wrong when days are the
  correlated sampling unit). Groups = calendar days: the daily frame is
  calendar-bounded, the delete-day estimates are ONE broadcast join of
  per-type totals back onto it, and the variance is the exact integer
  identity  (g−1)·(g·Σθ² − (Σθ)²) div g²  over fp6 thetas — no mean
  subtraction, no floats, engine-identical truncation.

Scale shape: both queries collapse the event fact in ONE map-side-combined
aggregate (distinct-value frame / daily frame); CvM's cumulative counts
run through the two-phase bucketed windows (plans/twophase.py — no
Exchange SinglePartition over a data-sized frame); the jackknife never
leaves the calendar-bounded frame.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import T, persisted, register
from .twophase import global_cumsums

_CVM_A, _CVM_B = "purchase", "view"
# 0.461: asymptotic two-sample CvM 5% critical value, scaled by 1000 in the
# exact verdict inequality
_CVM_CRIT_FP3 = 461


_CVM_ORACLE = f"""
WITH vc AS (
  SELECT CAST(value AS DECIMAL(18,6)) AS v,
         CAST(SUM(CASE WHEN event_type = '{_CVM_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN event_type = '{_CVM_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM events WHERE event_type IN ('{_CVM_A}', '{_CVM_B}')
  GROUP BY 1
),
cum AS (
  SELECT a, b, a + b AS t,
         COALESCE(SUM(a) OVER w, 0) AS ca0,
         COALESCE(SUM(b) OVER w, 0) AS cb0,
         COALESCE(SUM(a + b) OVER w, 0) AS c0
  FROM vc WINDOW w AS (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
contrib AS (
  SELECT a, b,
         -- doubled midrank of the tied group
         2 * c0 + t + 1 AS mr2,
         ca0, cb0
  FROM cum
),
terms AS (
  SELECT a, b,
         CASE WHEN a > 0 THEN
           6 * CAST(a AS HUGEINT) * mr2 * mr2
           - 12 * CAST(mr2 AS HUGEINT) * a * (2 * ca0 + a + 1)
           + 4 * ((ca0 + a) * (ca0 + a + 1)
                  * CAST(2 * (ca0 + a) + 1 AS HUGEINT)
                  - CAST(ca0 AS HUGEINT) * (ca0 + 1) * (2 * ca0 + 1))
         ELSE CAST(0 AS HUGEINT) END AS tx,
         CASE WHEN b > 0 THEN
           6 * CAST(b AS HUGEINT) * mr2 * mr2
           - 12 * CAST(mr2 AS HUGEINT) * b * (2 * cb0 + b + 1)
           + 4 * ((cb0 + b) * (cb0 + b + 1)
                  * CAST(2 * (cb0 + b) + 1 AS HUGEINT)
                  - CAST(cb0 AS HUGEINT) * (cb0 + 1) * (2 * cb0 + 1))
         ELSE CAST(0 AS HUGEINT) END AS ty
  FROM contrib
),
agg AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n, CAST(SUM(b) AS BIGINT) AS m,
         CAST(SUM(tx) AS HUGEINT) AS sx, CAST(SUM(ty) AS HUGEINT) AS sy
  FROM terms
),
crit AS (
  -- 2*T_num / 2*T_den: the 6x term scale absorbs the /6, leaving the
  -- equal-ratio doubled pair (same truncating quotient, same verdict)
  SELECT n, m,
         (CAST(n AS HUGEINT) * sx + CAST(m AS HUGEINT) * sy)
           - 4 * CAST(n AS HUGEINT) * m * (4 * CAST(n AS HUGEINT) * m - 1)
           AS t_num,
         24 * CAST(n AS HUGEINT) * m * (n + m) AS t_den
  FROM agg
)
SELECT n AS n_a, m AS n_b,
       CAST(t_num * 1000000 // t_den AS BIGINT) AS cvm_t_fp6,
       CAST(CASE WHEN 1000 * t_num > {_CVM_CRIT_FP3} * t_den
                 THEN 1 ELSE 0 END AS BIGINT) AS shift_detected
FROM crit
"""


@register("q_cramer_von_mises", oracle=_CVM_ORACLE)
def q_cramer_von_mises(spark, sf_dir):
    """Two-sample Cramér-von Mises criterion between the `value`
    distributions of two event types (module docstring: closed-form tied-
    group rank-deviation sums on the distinct-value frame, exact rational
    T, integer 5% verdict). Scale shape: one distinct-value shuffle; the
    exclusive cumulative counts run as two-phase bucketed windows."""
    e = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_CVM_A, _CVM_B))
        .select(
            F.col("value").cast("decimal(18,6)").alias("v"), "event_type"
        )
    )
    vc = (
        e.groupBy("v")
        .agg(
            F.sum(F.when(F.col("event_type") == _CVM_A, 1).otherwise(0))
            .cast("bigint")
            .alias("a"),
            F.sum(F.when(F.col("event_type") == _CVM_B, 1).otherwise(0))
            .cast("bigint")
            .alias("b"),
        )
        .withColumn("t", F.col("a") + F.col("b"))
        .transform(persisted)
    )
    cum = global_cumsums(
        vc,
        ["v"],
        {"ca0": ("a", "excl"), "cb0": ("b", "excl"), "c0": ("t", "excl")},
    )
    terms = cum.select(
        "a",
        "b",
        F.expr("2 * c0 + t + 1").alias("mr2"),
        "ca0",
        "cb0",
    ).select(
        "a",
        "b",
        F.expr(
            "CASE WHEN a > 0 THEN"
            " 6 * CAST(a AS DECIMAL(38,0)) * mr2 * mr2"
            " - 12 * CAST(mr2 AS DECIMAL(38,0)) * a * (2 * ca0 + a + 1)"
            " + 4 * (CAST(ca0 + a AS DECIMAL(38,0)) * (ca0 + a + 1)"
            "        * (2 * (ca0 + a) + 1)"
            "        - CAST(ca0 AS DECIMAL(38,0)) * (ca0 + 1)"
            "          * (2 * ca0 + 1))"
            " ELSE CAST(0 AS DECIMAL(38,0)) END"
        ).alias("tx"),
        F.expr(
            "CASE WHEN b > 0 THEN"
            " 6 * CAST(b AS DECIMAL(38,0)) * mr2 * mr2"
            " - 12 * CAST(mr2 AS DECIMAL(38,0)) * b * (2 * cb0 + b + 1)"
            " + 4 * (CAST(cb0 + b AS DECIMAL(38,0)) * (cb0 + b + 1)"
            "        * (2 * (cb0 + b) + 1)"
            "        - CAST(cb0 AS DECIMAL(38,0)) * (cb0 + 1)"
            "          * (2 * cb0 + 1))"
            " ELSE CAST(0 AS DECIMAL(38,0)) END"
        ).alias("ty"),
    )
    agg = terms.agg(
        F.sum("a").cast("bigint").alias("n"),
        F.sum("b").cast("bigint").alias("m"),
        F.sum("tx").cast("decimal(38,0)").alias("sx"),
        F.sum("ty").cast("decimal(38,0)").alias("sy"),
    )
    # T is undefined when either sample is empty (the oracle's WHERE)
    return agg.filter((F.col("n") > 0) & (F.col("m") > 0)).select(
        F.col("n").alias("n_a"),
        F.col("m").alias("n_b"),
        F.expr(
            "CAST(((CAST(n AS DECIMAL(38,0)) * sx"
            "       + CAST(m AS DECIMAL(38,0)) * sy)"
            "      - 4 * CAST(n AS DECIMAL(38,0)) * m"
            "        * (4 * CAST(n AS DECIMAL(38,0)) * m - 1)) * 1000000"
            " div (24 * CAST(n AS DECIMAL(38,0)) * m * (n + m)) AS BIGINT)"
        ).alias("cvm_t_fp6"),
        F.expr(
            "CAST(CASE WHEN 1000 * ((CAST(n AS DECIMAL(38,0)) * sx"
            "                        + CAST(m AS DECIMAL(38,0)) * sy)"
            "                       - 4 * CAST(n AS DECIMAL(38,0)) * m"
            "                         * (4 * CAST(n AS DECIMAL(38,0)) * m"
            "                            - 1))"
            f"           > {_CVM_CRIT_FP3}"
            "             * (24 * CAST(n AS DECIMAL(38,0)) * m * (n + m))"
            "      THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("shift_detected"),
    )


_JK_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS s_cents,
         CAST(COUNT(*) AS BIGINT) AS c_events
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type,
         CAST(SUM(s_cents) AS BIGINT) AS s,
         CAST(SUM(c_events) AS BIGINT) AS c,
         CAST(COUNT(*) AS BIGINT) AS g
  FROM daily GROUP BY 1
),
del AS (
  SELECT d.event_type,
         CAST((t.s - d.s_cents) * 1000000 // (t.c - d.c_events) AS BIGINT)
           AS theta_fp6
  FROM daily d JOIN tot t USING (event_type)
  WHERE t.c - d.c_events > 0
),
jk AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS g_valid,
         CAST(SUM(theta_fp6) AS HUGEINT) AS st,
         CAST(SUM(CAST(theta_fp6 AS HUGEINT) * theta_fp6) AS HUGEINT) AS st2
  FROM del GROUP BY 1
)
SELECT t.event_type,
       t.g,
       j.g_valid,
       CAST(t.s * 1000000 // t.c AS BIGINT) AS theta_all_fp6,
       CAST(CASE WHEN j.g_valid >= 2
                 THEN (j.g_valid - 1) * (j.g_valid * j.st2 - j.st * j.st)
                      // (j.g_valid * j.g_valid)
                 ELSE -1 END AS BIGINT) AS jk_var_fp12,
       CAST((SELECT COALESCE(MAX(ABS(dl.theta_fp6
                                     - t.s * 1000000 // t.c)), 0)
             FROM del dl WHERE dl.event_type = t.event_type) AS BIGINT)
         AS influence_max_fp6
FROM tot t JOIN jk j USING (event_type)
WHERE t.c > 0
ORDER BY t.event_type
"""


@register("q_jackknife_ratio_se", oracle=_JK_ORACLE)
def q_jackknife_ratio_se(spark, sf_dir):
    """Delete-one-DAY jackknife for the revenue-per-event ratio per
    event_type (module docstring): per-day leave-out estimates from one
    broadcast totals join onto the calendar-bounded daily frame, the
    variance from the exact integer identity (g−1)(g·Σθ² − (Σθ)²) div g²
    over fp6 thetas, and the max-|influence| column that flags the single
    day driving the estimate. Days with an empty complement are excluded
    (g_valid); types needing g_valid ≥ 2 otherwise report -1."""
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("d"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(10,2)")) * 100)
            .cast("bigint")
            .alias("s_cents"),
            F.count(F.lit(1)).cast("bigint").alias("c_events"),
        )
        # calendar-bounded; consumers: totals + delete-day join
        .transform(persisted)
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("s_cents").cast("bigint").alias("s"),
        F.sum("c_events").cast("bigint").alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("g"),
    )
    dl = (
        daily.join(F.broadcast(tot), "event_type")
        .filter(F.col("c") - F.col("c_events") > 0)
        .select(
            "event_type",
            F.expr(
                "CAST((s - s_cents) * 1000000L div (c - c_events) AS BIGINT)"
            ).alias("theta_fp6"),
            F.expr("CAST(s * 1000000L div c AS BIGINT)").alias("theta_all"),
        )
    )
    jk = dl.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("g_valid"),
        F.sum("theta_fp6").cast("decimal(38,0)").alias("st"),
        F.sum(
            F.col("theta_fp6").cast("decimal(38,0)") * F.col("theta_fp6")
        )
        .cast("decimal(38,0)")
        .alias("st2"),
        F.max(F.abs(F.col("theta_fp6") - F.col("theta_all")))
        .cast("bigint")
        .alias("influence_max_fp6"),
    )
    return (
        tot.filter(F.col("c") > 0)
        .join(jk, "event_type")
        .select(
            "event_type",
            "g",
            "g_valid",
            F.expr("CAST(s * 1000000L div c AS BIGINT)").alias(
                "theta_all_fp6"
            ),
            F.expr(
                "CAST(CASE WHEN g_valid >= 2"
                " THEN (g_valid - 1)"
                "      * (g_valid * st2 - st * st)"
                "      div (CAST(g_valid AS DECIMAL(38,0)) * g_valid)"
                " ELSE -1 END AS BIGINT)"
            ).alias("jk_var_fp12"),
            F.coalesce(F.col("influence_max_fp6"), F.lit(0)).alias(
                "influence_max_fp6"
            ),
        )
    )


# ---------------------------------------------------------------------------
# 1-D Wasserstein-1 (earth-mover) drift — the magnitude-aware member of
# the shift family: KS reacts to the worst ECDF gap, CvM to the
# rank-integrated gap, W1 = ∫|F_A − F_B| dx to the gap WEIGHTED BY VALUE
# DISTANCE, so a small probability mass moved a long way (the failure
# mode that actually moves a revenue metric) registers proportionally.
#
# Exactness: with value micros v (fp6 integers), exclusive cumulative
# counts ca₀/cb₀ and per-row previous distinct value pv,
#     W1_fp6 = Σ_i |ca₀_i·m − cb₀_i·n| · (v_i − pv_i)  div  (n·m)
# — every term is an exact integer (the i=1 term vanishes: both exclusive
# counts are 0), summed in DECIMAL(38,0)/HUGEINT.
#
# Scale shape: the corpus collapses to the distinct-value frame in one
# shuffle; cumulative counts AND the previous-value column come from ONE
# two-phase bucketed pass (sketch boundaries → one parallel hash
# exchange; per-bucket offset/previous-max frames are config-bounded, so
# the only unpartitioned windows run over ≤ partitions rows — the
# plans/twophase.py discipline, inlined here because the shared helper
# has no cross-row lag).
# ---------------------------------------------------------------------------

_W1_ORACLE = f"""
WITH vc AS (
  SELECT CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v,
         CAST(SUM(CASE WHEN event_type = '{_CVM_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN event_type = '{_CVM_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM events WHERE event_type IN ('{_CVM_A}', '{_CVM_B}')
  GROUP BY 1
),
cum AS (
  SELECT v, LAG(v) OVER (ORDER BY v) AS pv,
         COALESCE(SUM(a) OVER w, 0) AS ca0,
         COALESCE(SUM(b) OVER w, 0) AS cb0,
         SUM(a) OVER () AS n, SUM(b) OVER () AS m
  FROM vc WINDOW w AS (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT CAST(n AS BIGINT) AS n_a, CAST(m AS BIGINT) AS n_b,
       CAST(COALESCE(SUM(ABS(CAST(ca0 AS HUGEINT) * m
                             - CAST(cb0 AS HUGEINT) * n)
                         * (v - pv)), 0)
            // (CAST(n AS HUGEINT) * m) AS BIGINT) AS w1_fp6
FROM cum
WHERE n > 0 AND m > 0
GROUP BY n, m
"""


@register("q_wasserstein_drift", oracle=_W1_ORACLE)
def q_wasserstein_drift(spark, sf_dir):
    """1-D Wasserstein-1 distance between the `value` distributions of two
    event types (section docstring above: exact integer ∫|F_A − F_B|dx on
    the distinct-value frame; one two-phase bucketed pass provides both
    exclusive cumulative counts and the previous-value lag)."""
    e = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_CVM_A, _CVM_B))
        .select(
            F.expr(
                "CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT)"
            ).alias("v"),
            "event_type",
        )
    )
    vc = (
        e.groupBy("v")
        .agg(
            F.sum(F.when(F.col("event_type") == _CVM_A, 1).otherwise(0))
            .cast("bigint")
            .alias("a"),
            F.sum(F.when(F.col("event_type") == _CVM_B, 1).otherwise(0))
            .cast("bigint")
            .alias("b"),
        )
        # consumers: boundary sketch, bucketed windows, per-bucket offsets
        .transform(persisted)
    )
    from pyspark.sql import Window

    n_parts = int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    if n_parts >= 2:
        qs = [i / n_parts for i in range(1, n_parts)]
        row = vc.agg(
            F.percentile_approx("v", qs, 1000).alias("bs")
        ).first()
        bounds = sorted({x for x in (row["bs"] or []) if x is not None})
    else:
        bounds = []
    if bounds:
        barr = F.array(*[F.lit(int(x)) for x in bounds])
        bucket = F.size(F.filter(barr, lambda x: x <= F.col("v")))
    else:
        bucket = F.lit(0)
    bkt = vc.withColumn("_b", bucket)
    w = Window.partitionBy("_b").orderBy("v")
    wx = w.rowsBetween(Window.unboundedPreceding, -1)
    loc = bkt.select(
        "_b",
        "v",
        F.lag("v").over(w).alias("_pv_loc"),
        F.coalesce(F.sum("a").over(wx), F.lit(0)).alias("_ca_loc"),
        F.coalesce(F.sum("b").over(wx), F.lit(0)).alias("_cb_loc"),
    )
    # per-bucket totals/extremes: config-bounded (≤ partitions rows) — the
    # only unpartitioned windows below run over THIS frame
    tots = bkt.groupBy("_b").agg(
        F.sum("a").alias("_ta"),
        F.sum("b").alias("_tb"),
        F.max("v").alias("_vmax"),
    )
    woff = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offs = tots.select(
        "_b",
        F.coalesce(F.sum("_ta").over(woff), F.lit(0)).alias("_oa"),
        F.coalesce(F.sum("_tb").over(woff), F.lit(0)).alias("_ob"),
        F.max("_vmax").over(woff).alias("_pvmax"),
    )
    tot = vc.agg(
        F.sum("a").cast("bigint").alias("n"),
        F.sum("b").cast("bigint").alias("m"),
    )
    rows = (
        loc.join(F.broadcast(offs), "_b")
        .select(
            F.coalesce(F.col("_pv_loc"), F.col("_pvmax")).alias("pv"),
            "v",
            (F.col("_ca_loc") + F.col("_oa")).alias("ca0"),
            (F.col("_cb_loc") + F.col("_ob")).alias("cb0"),
        )
        .crossJoin(F.broadcast(tot))
    )
    return (
        rows.filter((F.col("n") > 0) & (F.col("m") > 0))
        .groupBy("n", "m")
        .agg(
            F.expr(
                "CAST(COALESCE(SUM(ABS(CAST(ca0 AS DECIMAL(38,0)) * m"
                "                      - CAST(cb0 AS DECIMAL(38,0)) * n)"
                "                  * (v - pv)), 0)"
                " div (CAST(n AS DECIMAL(38,0)) * m) AS BIGINT)"
            ).alias("w1_fp6")
        )
        .select(
            F.col("n").alias("n_a"), F.col("m").alias("n_b"), "w1_fp6"
        )
    )
