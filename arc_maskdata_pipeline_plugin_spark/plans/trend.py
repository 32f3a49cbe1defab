"""Nonparametric trend analytics: Mann-Kendall test + Theil-Sen slope —
the robust drift monitor for daily pipeline metrics (document volumes,
revenue, quality scores), exactly integer-arithmetic so both engines
agree bit-for-bit.

Mann-Kendall (Mann 1945, Kendall 1975): ``S = Σ_{i<j} sign(x_j - x_i)``
over the day-ordered series, with the ties-corrected variance
``Var(S) = [n(n-1)(2n+5) - Σ_t t(t-1)(2t+5)] / 18``. Everything stays in
integers: the query emits ``s_stat`` and ``var18 = 18·Var(S)``, and the
5%-two-sided normal-approximation verdict is decided by the exact
integer inequality

    10^4 · 18 · (|S| - 1)^2  >  38416 · var18      (38416 = 196^2, z=1.96)

so no square root or float ever enters the plan (|S| must exceed 1 and
var18 > 0 for significance; the continuity-corrected Z uses |S|-1).

Theil-Sen (Theil 1950, Sen 1968): the median of all pairwise slopes
``(x_j - x_i) / (d_j - d_i)``. Cross-engine exactness: each slope is
discretized to ``slope_fp6 = (Δcents·10^6) div Δdays`` — truncation
toward zero, which Spark ``div`` and DuckDB ``//`` share exactly (both
verified dividend-sign ``%`` and truncating integral division) — and the
reported value is the LOWER MEDIAN (rank ``(m+1) div 2`` ascending), an
order statistic that is a pure function of the multiset, so window
tie-order cannot affect it.

Scale shape: the daily frame is (event_type × calendar-days) — bounded
by the CALENDAR, not by event volume (one map-side-combined aggregate
reduces the event fact to it). The pairwise self-join runs per
event_type on that calendar-bounded frame (≤ days² pairs per type, e.g.
365² ≈ 133k at a year — a constant-bounded frame, never corpus-sized);
every window below partitions by event_type. One event-fact shuffle
total.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, persisted, register

_Z2_FP4 = 38416  # 1.96^2 * 10^4 — the 5% two-sided critical value, exact


_MK_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
n AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
),
pairs AS (
  SELECT a.event_type,
         CAST(CASE WHEN b.cents > a.cents THEN 1
                   WHEN b.cents < a.cents THEN -1 ELSE 0 END AS BIGINT) AS sg,
         (b.cents - a.cents) * 1000000 // (b.d - a.d) AS slope_fp6
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
s AS (
  SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s_stat,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1
),
ties AS (
  SELECT event_type,
         CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie18
  FROM (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
    FROM daily GROUP BY event_type, cents
  ) GROUP BY 1
),
med AS (
  SELECT event_type, slope_fp6 AS slope_fp6_med
  FROM (
    SELECT event_type, slope_fp6,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY slope_fp6) AS r,
           COUNT(*) OVER (PARTITION BY event_type) AS m
    FROM pairs
  ) WHERE r = (m + 1) // 2
),
v AS (
  SELECT n.event_type, n.n_days, s.s_stat, s.n_pairs,
         n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie18 AS var18
  FROM n JOIN s USING (event_type) JOIN ties t USING (event_type)
)
SELECT v.event_type, v.n_days, v.n_pairs, v.s_stat, v.var18,
       m.slope_fp6_med,
       CASE WHEN v.var18 > 0 AND ABS(v.s_stat) > 1
                 AND 180000 * (ABS(v.s_stat) - 1) * (ABS(v.s_stat) - 1)
                     > {z2} * v.var18
            THEN CASE WHEN v.s_stat > 0 THEN 'rising' ELSE 'falling' END
            ELSE 'none' END AS trend
FROM v JOIN med m USING (event_type)
ORDER BY v.event_type
""".format(z2=_Z2_FP4)


def _mk_base(daily):
    """The MK/Theil-Sen relational core over a PERSISTED (event_type, d,
    cents) daily frame: (event_type, n_days, n_pairs, s_stat, var18,
    slope_fp6_med) — shared by the batch query, the streaming store
    monitor, and the Hamed-Rao corrected test. ``daily`` must already be
    persisted (consumers: both pair sides + n + ties)."""
    a = daily.select(
        "event_type", F.col("d").alias("d1"), F.col("cents").alias("c1")
    )
    b = daily.select(
        "event_type", F.col("d").alias("d2"), F.col("cents").alias("c2")
    )
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "event_type",
            F.when(F.col("c2") > F.col("c1"), 1)
            .when(F.col("c2") < F.col("c1"), -1)
            .otherwise(0)
            .cast("bigint")
            .alias("sg"),
            F.expr("(c2 - c1) * 1000000L div (d2 - d1)").alias("slope_fp6"),
        )
        # days^2-bounded; consumers: S aggregate + median window
        .transform(persisted)
    )
    s = pairs.groupBy("event_type").agg(
        F.sum("sg").cast("bigint").alias("s_stat"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    n = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie18")
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope_fp6")
    med = (
        pairs.select(
            "event_type",
            "slope_fp6",
            F.row_number().over(w).alias("r"),
            F.count(F.lit(1))
            .over(Window.partitionBy("event_type"))
            .alias("m"),
        )
        .filter(F.col("r") == F.expr("(m + 1) div 2"))
        .select("event_type", F.col("slope_fp6").alias("slope_fp6_med"))
    )
    v = (
        n.join(s, "event_type")
        .join(ties, "event_type")
        .withColumn(
            "var18",
            F.col("n_days")
            * (F.col("n_days") - 1)
            * (2 * F.col("n_days") + 5)
            - F.col("tie18"),
        )
    )
    return v.join(med, "event_type").select(
        "event_type", "n_days", "n_pairs", "s_stat", "var18", "slope_fp6_med"
    )


def mk_outputs(daily):
    """Mann-Kendall + Theil-Sen with the plain 5% verdict (module
    docstring) — :func:`_mk_base` plus the exact-integer trend column."""
    return _mk_base(daily).select(
        "event_type",
        "n_days",
        "n_pairs",
        "s_stat",
        "var18",
        "slope_fp6_med",
        F.when(
            (F.col("var18") > 0)
            & (F.abs("s_stat") > 1)
            & (
                180000
                * (F.abs("s_stat") - 1)
                * (F.abs("s_stat") - 1)
                > _Z2_FP4 * F.col("var18")
            ),
            F.when(F.col("s_stat") > 0, "rising").otherwise("falling"),
        )
        .otherwise("none")
        .alias("trend"),
    )


def daily_cents(ev):
    """Reduce the event fact to the calendar-bounded (event_type, d,
    cents) daily frame — ONE map-side-combined aggregate."""
    return ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d"),
    ).agg(
        (F.sum(F.col("value").cast("decimal(10,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )


@register("q_mann_kendall_trend", oracle=_MK_ORACLE)
def q_mann_kendall_trend(spark, sf_dir):
    """Mann-Kendall trend test + Theil-Sen slope per event_type over the
    daily revenue series (module docstring: exact-integer S/var18/verdict,
    fp6 truncated slopes, lower-median order statistic). The event fact is
    reduced to the calendar-bounded daily frame in ONE aggregate; the
    pairwise self-join and every window run per event_type on that
    bounded frame (≤ days² pairs per type — calendar-bounded, never
    event-volume-bounded)."""
    # calendar-bounded; consumers: both pair sides + n + ties
    daily = daily_cents(T(spark, sf_dir, "events")).transform(persisted)
    return mk_outputs(daily)


_SMK_ORACLE = """
WITH daily AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         CAST(EXTRACT(dow FROM CAST(ts AS DATE)) AS BIGINT) AS season,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2, 3
),
pairs AS (
  SELECT a.event_type, a.season,
         CAST(CASE WHEN b.cents > a.cents THEN 1
                   WHEN b.cents < a.cents THEN -1 ELSE 0 END AS BIGINT) AS sg
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.season = b.season AND a.d < b.d
),
per_season AS (
  SELECT d.event_type, d.season,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         COALESCE(s.s_g, 0) AS s_g,
         COALESCE(s.n_pairs_g, 0) AS n_pairs_g,
         COUNT(*) * (COUNT(*) - 1) * (2 * COUNT(*) + 5) - t.tie18 AS var18_g
  FROM daily d
  LEFT JOIN (SELECT event_type, season, CAST(SUM(sg) AS BIGINT) AS s_g,
                    CAST(COUNT(*) AS BIGINT) AS n_pairs_g
             FROM pairs GROUP BY 1, 2) s
    ON d.event_type = s.event_type AND d.season = s.season
  JOIN (SELECT event_type, season,
               CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                 AS tie18
        FROM (SELECT event_type, season, CAST(COUNT(*) AS BIGINT) AS t
              FROM daily GROUP BY event_type, season, cents)
        GROUP BY 1, 2) t
    ON d.event_type = t.event_type AND d.season = t.season
  GROUP BY d.event_type, d.season, s.s_g, s.n_pairs_g, t.tie18
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_seasons,
       CAST(SUM(n_days) AS BIGINT) AS n_days,
       CAST(SUM(n_pairs_g) AS BIGINT) AS n_pairs,
       CAST(SUM(s_g) AS BIGINT) AS s_stat,
       CAST(SUM(var18_g) AS BIGINT) AS var18,
       CASE WHEN SUM(var18_g) > 0 AND ABS(SUM(s_g)) > 1
                 AND 180000 * (ABS(SUM(s_g)) - 1) * (ABS(SUM(s_g)) - 1)
                     > 38416 * SUM(var18_g)
            THEN CASE WHEN SUM(s_g) > 0 THEN 'rising' ELSE 'falling' END
            ELSE 'none' END AS trend
FROM per_season
GROUP BY event_type
ORDER BY event_type
"""


@register("q_seasonal_mann_kendall", oracle=_SMK_ORACLE)
def q_seasonal_mann_kendall(spark, sf_dir):
    """Seasonal Mann-Kendall (Hirsch & Slack 1984) per event_type with
    day-of-week seasons: the MK statistic runs WITHIN each season
    (Monday-to-Monday comparisons only), then S and var18 SUM across
    seasons — the trend test that stays valid when the series has a
    weekly cycle the plain MK would mistake for noise (or trend). Same
    exact-integer machinery as :func:`q_mann_kendall_trend` (ties-
    corrected var18, continuity-corrected 5% verdict, no float in-plan);
    the pairwise join gains a season equi-key, so pairs are ≤ (days/7)²·7
    per type — calendar-bounded and 7× fewer than the unsegmented test.
    Day-of-week convention: Sunday=0 (DuckDB ``EXTRACT(dow)``), mirrored
    in Spark as ``dayofweek(ts) - 1``."""
    ev = T(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("bigint")
            .alias("d"),
            (F.dayofweek(F.col("ts").cast("date")) - 1)
            .cast("bigint")
            .alias("season"),
        )
        .agg(
            (F.sum(F.col("value").cast("decimal(10,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        # calendar-bounded; consumers: both pair sides + n + ties
        .transform(persisted)
    )
    a = daily.select(
        "event_type", "season", F.col("d").alias("d1"),
        F.col("cents").alias("c1"),
    )
    b = daily.select(
        "event_type", "season", F.col("d").alias("d2"),
        F.col("cents").alias("c2"),
    )
    s = (
        a.join(b, ["event_type", "season"])
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("event_type", "season")
        .agg(
            F.sum(
                F.when(F.col("c2") > F.col("c1"), 1)
                .when(F.col("c2") < F.col("c1"), -1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("s_g"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs_g"),
        )
    )
    n = daily.groupBy("event_type", "season").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    ties = (
        daily.groupBy("event_type", "season", "cents")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type", "season")
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie18")
        )
    )
    per = (
        n.join(s, ["event_type", "season"], "left")
        .join(ties, ["event_type", "season"])
        .select(
            "event_type",
            "season",
            "n_days",
            F.coalesce(F.col("s_g"), F.lit(0)).alias("s_g"),
            F.coalesce(F.col("n_pairs_g"), F.lit(0)).alias("n_pairs_g"),
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.col("tie18")
            ).alias("var18_g"),
        )
    )
    agg = per.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_seasons"),
        F.sum("n_days").cast("bigint").alias("n_days"),
        F.sum("n_pairs_g").cast("bigint").alias("n_pairs"),
        F.sum("s_g").cast("bigint").alias("s_stat"),
        F.sum("var18_g").cast("bigint").alias("var18"),
    )
    return agg.select(
        "event_type",
        "n_seasons",
        "n_days",
        "n_pairs",
        "s_stat",
        "var18",
        F.when(
            (F.col("var18") > 0)
            & (F.abs("s_stat") > 1)
            & (
                180000 * (F.abs("s_stat") - 1) * (F.abs("s_stat") - 1)
                > _Z2_FP4 * F.col("var18")
            ),
            F.when(F.col("s_stat") > 0, "rising").otherwise("falling"),
        )
        .otherwise("none")
        .alias("trend"),
    )


# ---------------------------------------------------------------------------
# Hamed-Rao autocorrelation-corrected Mann-Kendall (VERDICT r11 #5).
# Daily pipeline metrics are serially correlated, and positive
# autocorrelation shrinks the effective sample size, so the plain MK test
# over-rejects. Hamed & Rao (1998): detrend by the Theil-Sen slope, rank
# the detrended series, compute the lag-k rank autocorrelations ρ_k, keep
# the ones individually significant at 5% (|ρ_k| > 1.96/√n), and scale
# Var(S) by  n/n*_s = 1 + 2/(n(n-1)(n-2)) Σ_k (n-k)(n-k-1)(n-k-2)·ρ_k.
#
# Cross-engine exactness — NO division ever happens: with integer rank
# deviations dev_i (doubled average ranks, so ties stay integral),
# ρ_k = num_k/den is kept as the exact integer pair
#   num_k = Σ dev_i·dev_{i+k},  den = Σ dev_i²,
# the per-lag significance test |ρ_k| > 1.96/√n becomes
#   num_k²·10⁴·n > 196²·den²,
# and the correction factor becomes the exact rational nc/dc with
#   dc = n(n-1)(n-2)·den,  nc = dc + 2·Σ_sig (n-k)(n-k-1)(n-k-2)·num_k,
# so the corrected 5% verdict is the integer inequality
#   180000·(|S|-1)²·dc > 196²·var18·nc        (requires nc > 0)
# — DECIMAL(38,0) lanes in Spark, HUGEINT in DuckDB, identical
# truncation-free semantics (lags with k > n-3 carry zero weight and are
# excluded from both the sum and the significant-lag count; den = 0 or
# n < 3 degrade to the uncorrected factor nc = dc = 1).
#
# Scale shape: everything beyond the daily aggregate runs on the
# calendar-bounded daily frame — ranks are two windows, the ACF is the
# same ≤ days² self-join as the MK pair frame, per event_type.
# ---------------------------------------------------------------------------

_HR_ORACLE = """
WITH daily AS MATERIALIZED (
  SELECT event_type,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
n AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
),
pairs AS MATERIALIZED (
  SELECT a.event_type,
         CAST(CASE WHEN b.cents > a.cents THEN 1
                   WHEN b.cents < a.cents THEN -1 ELSE 0 END AS BIGINT) AS sg,
         (b.cents - a.cents) * 1000000 // (b.d - a.d) AS slope_fp6
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
),
s AS (
  SELECT event_type, CAST(SUM(sg) AS BIGINT) AS s_stat,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM pairs GROUP BY 1
),
ties AS (
  SELECT event_type,
         CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie18
  FROM (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
    FROM daily GROUP BY event_type, cents
  ) GROUP BY 1
),
med AS (
  SELECT event_type, slope_fp6 AS slope_fp6_med
  FROM (
    SELECT event_type, slope_fp6,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY slope_fp6) AS r,
           COUNT(*) OVER (PARTITION BY event_type) AS m
    FROM pairs
  ) WHERE r = (m + 1) // 2
),
base AS MATERIALIZED (
  SELECT n.event_type, n.n_days, s.n_pairs, s.s_stat,
         n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie18 AS var18,
         m.slope_fp6_med
  FROM n JOIN s USING (event_type) JOIN ties t USING (event_type)
  JOIN med m USING (event_type)
),
dev AS MATERIALIZED (
  SELECT event_type, pos, CAST(avg2 - (n_days + 1) AS BIGINT) AS dev
  FROM (
    SELECT d.event_type, b.n_days,
           ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.d) AS pos,
           2 * RANK() OVER (PARTITION BY d.event_type ORDER BY
                            d.cents * 1000000 - b.slope_fp6_med * d.d)
             + COUNT(*) OVER (PARTITION BY d.event_type,
                              d.cents * 1000000 - b.slope_fp6_med * d.d) - 1
             AS avg2
    FROM daily d JOIN base b USING (event_type)
  )
),
den AS MATERIALIZED (
  SELECT event_type, CAST(SUM(dev * dev) AS BIGINT) AS den
  FROM dev GROUP BY 1
),
acf AS MATERIALIZED (
  SELECT a.event_type, CAST(b.pos - a.pos AS BIGINT) AS k,
         CAST(SUM(a.dev * b.dev) AS BIGINT) AS num
  FROM dev a JOIN dev b ON a.event_type = b.event_type AND a.pos < b.pos
  GROUP BY 1, 2
),
sig AS MATERIALIZED (
  SELECT f.event_type, CAST(COUNT(*) AS BIGINT) AS n_sig_lags,
         CAST(SUM(CAST(b.n_days - f.k AS HUGEINT) * (b.n_days - f.k - 1)
              * (b.n_days - f.k - 2) * f.num) AS HUGEINT) AS wsum
  FROM acf f JOIN base b USING (event_type) JOIN den d USING (event_type)
  WHERE f.k <= b.n_days - 3 AND d.den > 0
    AND CAST(f.num AS HUGEINT) * f.num * 10000 * b.n_days
        > 38416 * CAST(d.den AS HUGEINT) * d.den
  GROUP BY 1
),
fac AS MATERIALIZED (
  SELECT b.event_type, COALESCE(g.n_sig_lags, 0) AS n_sig_lags,
         CASE WHEN b.n_days >= 3 AND d.den > 0
              THEN CAST(b.n_days AS HUGEINT) * (b.n_days - 1)
                   * (b.n_days - 2) * d.den + 2 * COALESCE(g.wsum, 0)
              ELSE 1 END AS nc,
         CASE WHEN b.n_days >= 3 AND d.den > 0
              THEN CAST(b.n_days AS HUGEINT) * (b.n_days - 1)
                   * (b.n_days - 2) * d.den
              ELSE 1 END AS dc
  FROM base b JOIN den d USING (event_type)
  LEFT JOIN sig g USING (event_type)
)
SELECT b.event_type, b.n_days, b.s_stat, b.var18, b.slope_fp6_med,
       f.n_sig_lags,
       CAST(f.nc * 1000000 // f.dc AS BIGINT) AS corr_fp6,
       CASE WHEN b.var18 > 0 AND ABS(b.s_stat) > 1
                 AND 180000 * (ABS(b.s_stat) - 1) * (ABS(b.s_stat) - 1)
                     > 38416 * b.var18
            THEN CASE WHEN b.s_stat > 0 THEN 'rising' ELSE 'falling' END
            ELSE 'none' END AS trend_raw,
       CASE WHEN b.var18 > 0 AND f.nc > 0 AND ABS(b.s_stat) > 1
                 AND CAST(180000 AS HUGEINT) * (ABS(b.s_stat) - 1)
                     * (ABS(b.s_stat) - 1) * f.dc
                     > CAST(38416 AS HUGEINT) * b.var18 * f.nc
            THEN CASE WHEN b.s_stat > 0 THEN 'rising' ELSE 'falling' END
            ELSE 'none' END AS trend_hr
FROM base b JOIN fac f USING (event_type)
ORDER BY b.event_type
"""


@register("q_hamed_rao_trend", oracle=_HR_ORACLE)
def q_hamed_rao_trend(spark, sf_dir):
    """Hamed-Rao autocorrelation-corrected Mann-Kendall per event_type
    (section docstring above: rank ACF of the Theil-Sen-detrended daily
    series, per-lag 5% significance filter, exact-rational variance
    inflation, all integer in-plan). Emits both the plain and the
    corrected verdict so the over-rejection is visible."""
    daily = daily_cents(T(spark, sf_dir, "events")).transform(persisted)
    # type-cardinality-bounded; consumers: detrend join, sig join, final
    base = _mk_base(daily).transform(persisted)
    bs = F.broadcast(base.select("event_type", "n_days", "slope_fp6_med"))
    wpos = Window.partitionBy("event_type").orderBy("d")
    wrk = Window.partitionBy("event_type").orderBy("det")
    wtie = Window.partitionBy("event_type", "det")
    dev = (
        daily.join(bs, "event_type")
        .withColumn("det", F.expr("cents * 1000000L - slope_fp6_med * d"))
        .select(
            "event_type",
            "n_days",
            F.row_number().over(wpos).alias("pos"),
            (
                2 * F.rank().over(wrk)
                + F.count(F.lit(1)).over(wtie)
                - 1
                - (F.col("n_days") + 1)
            )
            .cast("bigint")
            .alias("dev"),
        )
        # calendar-bounded; consumers: den aggregate + both ACF sides
        .transform(persisted)
    )
    den = dev.groupBy("event_type").agg(
        F.sum(F.col("dev") * F.col("dev")).cast("bigint").alias("den")
    )
    a = dev.select("event_type", F.col("pos").alias("p1"), F.col("dev").alias("v1"))
    b = dev.select("event_type", F.col("pos").alias("p2"), F.col("dev").alias("v2"))
    acf = (
        a.join(b, "event_type")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("event_type", (F.col("p2") - F.col("p1")).cast("bigint").alias("k"))
        .agg(F.sum(F.col("v1") * F.col("v2")).cast("bigint").alias("num"))
    )
    sig = (
        acf.join(F.broadcast(base.select("event_type", "n_days")), "event_type")
        .join(F.broadcast(den), "event_type")
        .filter(
            (F.col("k") <= F.col("n_days") - 3)
            & (F.col("den") > 0)
            & F.expr(
                "CAST(num AS DECIMAL(38,0)) * num * 10000 * n_days"
                " > 38416 * CAST(den AS DECIMAL(38,0)) * den"
            )
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sig_lags"),
            F.expr(
                "CAST(SUM(CAST(n_days - k AS DECIMAL(38,0))"
                " * (n_days - k - 1) * (n_days - k - 2) * num)"
                " AS DECIMAL(38,0))"
            ).alias("wsum"),
        )
    )
    fac = (
        base.join(den, "event_type")
        .join(sig, "event_type", "left")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            "var18",
            "slope_fp6_med",
            F.coalesce(F.col("n_sig_lags"), F.lit(0))
            .cast("bigint")
            .alias("n_sig_lags"),
            F.expr(
                "CASE WHEN n_days >= 3 AND den > 0"
                " THEN CAST(n_days AS DECIMAL(38,0)) * (n_days - 1)"
                "      * (n_days - 2) * den"
                "      + 2 * COALESCE(wsum, CAST(0 AS DECIMAL(38,0)))"
                " ELSE CAST(1 AS DECIMAL(38,0)) END"
            ).alias("nc"),
            F.expr(
                "CASE WHEN n_days >= 3 AND den > 0"
                " THEN CAST(n_days AS DECIMAL(38,0)) * (n_days - 1)"
                "      * (n_days - 2) * den"
                " ELSE CAST(1 AS DECIMAL(38,0)) END"
            ).alias("dc"),
        )
    )
    return fac.select(
        "event_type",
        "n_days",
        "s_stat",
        "var18",
        "slope_fp6_med",
        "n_sig_lags",
        F.expr("CAST(nc * 1000000 div dc AS BIGINT)").alias("corr_fp6"),
        F.when(
            (F.col("var18") > 0)
            & (F.abs("s_stat") > 1)
            & (
                180000 * (F.abs("s_stat") - 1) * (F.abs("s_stat") - 1)
                > _Z2_FP4 * F.col("var18")
            ),
            F.when(F.col("s_stat") > 0, "rising").otherwise("falling"),
        )
        .otherwise("none")
        .alias("trend_raw"),
        F.when(
            (F.col("var18") > 0)
            & (F.col("nc") > 0)
            & (F.abs("s_stat") > 1)
            & F.expr(
                "CAST(180000 AS DECIMAL(38,0)) * (ABS(s_stat) - 1)"
                " * (ABS(s_stat) - 1) * dc"
                " > CAST(38416 AS DECIMAL(38,0)) * var18 * nc"
            ),
            F.when(F.col("s_stat") > 0, "rising").otherwise("falling"),
        )
        .otherwise("none")
        .alias("trend_hr"),
    )
