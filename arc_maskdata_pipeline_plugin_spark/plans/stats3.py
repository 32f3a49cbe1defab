"""Nonparametric / categorical statistics: two-sample KS, Mann-Whitney U,
chi-square + Cramér's V, categorical mutual information, and the KMV
distinct sketch with its daily-merge witness.

These are the distribution-comparison tests an experimentation or data-
quality platform runs continuously (did the metric distribution shift? are
two categorical features dependent?), expressed corpus-scale:

* KS and Mann-Whitney collapse the corpus to the DISTINCT-VALUE count frame
  in one shuffle (the same accepted seam as winsorize / quantile-normalize:
  the cumulative window runs over distinct metric values, not rows; the
  ``quantile_thresholds(mode="approx")`` GK seam is the documented swap when
  value cardinality is unbounded).
* chi-square / Cramér's V and mutual information reduce to the contingency-
  CELL frame (|X|·|Y| rows — dozens), so every per-cell double term floors
  to an integer BEFORE the sum (fp-floored-terms rule; a floating sum of
  cell terms is partition-order-dependent, an integer sum is not).

Bit-stability: all counts are exact BIGINT/DECIMAL(38,0); every double is
derived from exact integers with the IDENTICAL expression shape in the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, persisted, register
from .twophase import global_cumsums

_KS_A, _KS_B = "purchase", "view"


@register(
    "q_ks_test",
    oracle=f"""
WITH vc AS (
  SELECT CAST(value AS DECIMAL(18,6)) AS v,
         CAST(SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
  GROUP BY 1
),
cum AS (
  SELECT SUM(a) OVER w AS ca, SUM(b) OVER w AS cb,
         SUM(a) OVER () AS n, SUM(b) OVER () AS m
  FROM vc WINDOW w AS (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(n AS BIGINT) AS n_a, CAST(m AS BIGINT) AS n_b,
       CAST(floor(1000000000.0
                  * CAST(MAX(abs(CAST(ca AS DECIMAL(38,0)) * m
                                 - CAST(cb AS DECIMAL(38,0)) * n))
                         AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)))
            AS BIGINT) AS ks_fp9
FROM cum
GROUP BY n, m
""",
)
def q_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov distance between the `value`
    distributions of two event types — the canonical "did this metric's
    distribution shift?" test. D = max_v |F_A(v) − F_B(v)| is computed
    EXACTLY in integers: with cumulative counts ca, cb and totals n, m,
    |ca/n − cb/m| = |ca·m − cb·n| / (n·m), so the max runs over exact
    DECIMAL(38,0) products and only the final normalization touches doubles
    (identical expression in the oracle → bit-identical).

    Scale shape: one shuffle collapses the corpus to the distinct-value
    count frame (persisted — consumers: boundary sketch, bucketed windows,
    totals); the cumulative sums run as two-phase bucketed windows, so the
    distinct-value frame — which grows with the data — never passes
    through an Exchange SinglePartition."""
    e = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KS_A, _KS_B))
        .select(
            F.col("value").cast("decimal(18,6)").alias("v"),
            "event_type",
        )
    )
    vc = e.groupBy("v").agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
    ).transform(persisted)
    tots = vc.agg(F.sum("a").alias("n"), F.sum("b").alias("m"))
    cum = (
        global_cumsums(vc, ["v"], {"ca": ("a", "incl"), "cb": ("b", "incl")})
        .crossJoin(F.broadcast(tots))
        .select("ca", "cb", "n", "m")
    )
    return cum.groupBy("n", "m").agg(
        F.floor(
            1_000_000_000.0
            * F.max(
                F.abs(
                    F.col("ca").cast("decimal(38,0)") * F.col("m")
                    - F.col("cb").cast("decimal(38,0)") * F.col("n")
                )
            ).cast("double")
            / (F.col("n").cast("double") * F.col("m").cast("double"))
        )
        .cast("bigint")
        .alias("ks_fp9")
    ).select(
        F.col("n").cast("bigint").alias("n_a"),
        F.col("m").cast("bigint").alias("n_b"),
        "ks_fp9",
    )


@register(
    "q_mann_whitney",
    oracle=f"""
WITH vc AS (
  SELECT CAST(value AS DECIMAL(18,6)) AS v,
         CAST(SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS a,
         CAST(SUM(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
  GROUP BY 1
),
rk AS (
  SELECT a, b, a + b AS t,
         COALESCE(SUM(a + b) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
  FROM vc
),
agg AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n, CAST(SUM(b) AS BIGINT) AS m,
         CAST(SUM(CAST(a AS DECIMAL(38,0)) * (2 * c + t + 1))
              AS DECIMAL(38,0)) AS r2,
         CAST(SUM(CAST(t AS DECIMAL(38,0)) * t * t - t)
              AS DECIMAL(38,0)) AS ties
  FROM rk
)
SELECT n AS n_a, m AS n_b,
       CAST(r2 - CAST(n AS DECIMAL(38,0)) * (n + 1) AS BIGINT) AS u2,
       CAST(floor(1000000.0
             * (CAST(r2 - CAST(n AS DECIMAL(38,0)) * (n + 1) AS DOUBLE) / 2.0
                - CAST(n AS DOUBLE) * m / 2.0)
             / sqrt(CAST(n AS DOUBLE) * m / 12.0
                    * ((n + m + 1)
                       - CAST(ties AS DOUBLE)
                         / (CAST(n + m AS DOUBLE) * (n + m - 1)))))
            AS BIGINT) AS z_fp6
FROM agg
""",
)
def q_mann_whitney(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) between the same two event-type
    value distributions — the nonparametric A/B test for skewed metrics
    where Welch's t is wrong. Midranks over the pooled sample are computed
    on the distinct-value frame in DOUBLED units so ties stay integral:
    for a value with t pooled occurrences after c earlier ones, each
    occurrence's doubled midrank is 2c + t + 1, so the doubled rank-sum
    R2 = Σ a·(2c+t+1) and U2 = R2 − n(n+1) are exact DECIMAL(38,0).
    The tie-corrected normal approximation
    z = (U − nm/2) / sqrt(nm/12 · ((N+1) − Σ(t³−t)/(N(N−1))))
    is derived from those exact integers with the identical expression in
    the oracle. Same distinct-value-frame scale shape as q_ks_test."""
    e = (
        T(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KS_A, _KS_B))
        .select(
            F.col("value").cast("decimal(18,6)").alias("v"),
            "event_type",
        )
    )
    vc = e.groupBy("v").agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
    )
    # two-phase exclusive cumsum: the distinct-value frame grows with the
    # data, so the pooled-rank prefix runs as bucketed windows (persisted —
    # consumers: boundary sketch, windows, totals), not one reducer
    vc = vc.withColumn("t", F.col("a") + F.col("b")).transform(persisted)
    rk = global_cumsums(vc, ["v"], {"c": ("t", "excl")}).select(
        "a", "b", "t", "c"
    )
    agg = rk.agg(
        F.sum("a").cast("bigint").alias("n"),
        F.sum("b").cast("bigint").alias("m"),
        F.sum(
            F.col("a").cast("decimal(38,0)")
            * (2 * F.col("c") + F.col("t") + 1)
        )
        .cast("decimal(38,0)")
        .alias("r2"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
            - F.col("t")
        )
        .cast("decimal(38,0)")
        .alias("ties"),
    )
    n, m = F.col("n"), F.col("m")
    u2 = (F.col("r2") - n.cast("decimal(38,0)") * (n + 1)).alias("u2d")
    nn = n.cast("double")
    mm = m.cast("double")
    big_n = nn + mm
    z = (
        F.col("u2d").cast("double") / 2.0 - nn * mm / 2.0
    ) / F.sqrt(
        nn
        * mm
        / 12.0
        * (
            (big_n + 1)
            - F.col("ties").cast("double") / (big_n * (big_n - 1))
        )
    )
    return (
        agg.select("n", "m", u2, F.col("ties"))
        .select(
            n.alias("n_a"),
            m.alias("n_b"),
            F.col("u2d").cast("bigint").alias("u2"),
            F.floor(1_000_000.0 * z).cast("bigint").alias("z_fp6"),
        )
    )


@register(
    "q_chi_square_cramers_v",
    oracle="""
WITH obs AS (
  SELECT n.n_name AS x, o.o_orderpriority AS y,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
),
m AS (
  SELECT x, y, k,
         SUM(k) OVER (PARTITION BY x) AS rx,
         SUM(k) OVER (PARTITION BY y) AS cy,
         SUM(k) OVER () AS nn
  FROM obs
),
terms AS (
  SELECT x, y, nn,
         CAST(floor(1000000.0
               * (CAST(k AS DOUBLE)
                  - CAST(rx AS DOUBLE) * cy / nn)
               * (CAST(k AS DOUBLE)
                  - CAST(rx AS DOUBLE) * cy / nn)
               / (CAST(rx AS DOUBLE) * cy / nn)) AS BIGINT) AS t_fp6
  FROM m
)
SELECT CAST(MIN(nn) AS BIGINT) AS n,
       CAST((COUNT(DISTINCT x) - 1) * (COUNT(DISTINCT y) - 1) AS BIGINT)
         AS dof,
       CAST(SUM(t_fp6) AS BIGINT) AS chi2_fp6,
       CAST(floor(1000000.0
             * sqrt((CAST(SUM(t_fp6) AS DOUBLE) / 1000000.0)
                    / (CAST(MIN(nn) AS DOUBLE)
                       * least(COUNT(DISTINCT x) - 1,
                               COUNT(DISTINCT y) - 1))))
            AS BIGINT) AS cramers_v_fp6
FROM terms
""",
)
def q_chi_square_cramers_v(spark, sf_dir):
    """Chi-square test of independence + Cramér's V effect size between
    customer nation and order priority — the categorical-dependence screen
    a feature platform runs across column pairs. The corpus reduces to the
    contingency-cell frame (|nations|·|priorities| rows) in one shuffle;
    each cell's (obs − exp)²/exp floors to fp6 BEFORE the sum, and V is
    derived from the already-integral chi2 so both engines agree exactly.
    Marginals come from windows over the tiny cell frame, not re-scans."""
    o = T(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    obs = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("x"),
            F.col("o_orderpriority").alias("y"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    )
    # bounded cardinality: the contingency frame has |x-categories| ×
    # |y-categories| rows (categorical domains), never data-sized
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wall = Window.partitionBy()
    m = obs.select(
        "x",
        "y",
        "k",
        F.sum("k").over(wx).alias("rx"),
        F.sum("k").over(wy).alias("cy"),
        F.sum("k").over(wall).alias("nn"),
    )
    exp = F.col("rx").cast("double") * F.col("cy") / F.col("nn")
    # keep x/y through the term projection so the row/column cardinalities
    # come from THIS frame's final aggregate — a separate dims sub-aggregate
    # would duplicate the whole contingency subtree (and its scans) in the
    # plan
    terms = m.select(
        "x",
        "y",
        "nn",
        F.floor(
            1_000_000.0
            * (F.col("k").cast("double") - exp)
            * (F.col("k").cast("double") - exp)
            / exp
        )
        .cast("bigint")
        .alias("t_fp6"),
    )
    chi2 = F.sum("t_fp6").cast("bigint")
    r, c = F.countDistinct("x"), F.countDistinct("y")
    return terms.agg(
        F.min("nn").cast("bigint").alias("n"),
        ((r - 1) * (c - 1)).cast("bigint").alias("dof"),
        chi2.alias("chi2_fp6"),
        F.floor(
            1_000_000.0
            * F.sqrt(
                (chi2.cast("double") / 1_000_000.0)
                / (F.min("nn").cast("double") * F.least(r - 1, c - 1))
            )
        )
        .cast("bigint")
        .alias("cramers_v_fp6"),
    )


@register(
    "q_mutual_information",
    oracle="""
WITH obs AS (
  SELECT lang AS x, source AS y, CAST(COUNT(*) AS BIGINT) AS k
  FROM documents GROUP BY 1, 2
),
m AS (
  SELECT k,
         SUM(k) OVER (PARTITION BY x) AS rx,
         SUM(k) OVER (PARTITION BY y) AS cy,
         SUM(k) OVER () AS nn
  FROM obs
)
SELECT CAST(MIN(nn) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CAST(floor((CAST(k AS DOUBLE) / nn)
                 * ln(CAST(k AS DOUBLE) * nn
                      / (CAST(rx AS DOUBLE) * cy))
                 * 1000000000) AS BIGINT)) AS BIGINT) AS mi_fp9
FROM m
""",
)
def q_mutual_information(spark, sf_dir):
    """Mutual information between document language and source — the
    feature-dependence / leakage screen (is `source` secretly a language
    label?). I(X;Y) = Σ p(x,y)·ln(p(x,y)/(p(x)p(y))); each cell term is
    computed from exact counts as (k/N)·ln(k·N/(rx·cy)) and floored to fp9
    BEFORE the sum. Same contingency-cell scale shape as the chi-square:
    one shuffle to the cell frame, windows for marginals, integer sum."""
    d = T(spark, sf_dir, "documents").select("lang", "source")
    obs = d.groupBy(
        F.col("lang").alias("x"), F.col("source").alias("y")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    m = obs.select(
        "k",
        # bounded cardinality: contingency frame (|x|·|y| category cells)
        F.sum("k").over(Window.partitionBy("x")).alias("rx"),
        F.sum("k").over(Window.partitionBy("y")).alias("cy"),
        F.sum("k").over(Window.partitionBy()).alias("nn"),
    )
    term = F.floor(
        (F.col("k").cast("double") / F.col("nn"))
        * F.log(
            F.col("k").cast("double")
            * F.col("nn")
            / (F.col("rx").cast("double") * F.col("cy"))
        )
        * 1_000_000_000
    ).cast("bigint")
    return m.agg(
        F.min("nn").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(term).cast("bigint").alias("mi_fp9"),
    )


# KMV (K-minimum-values) sketch: k = 64; the estimate is
# (k−1)·2^48 / h_k where h_k is the k-th smallest 48-bit hash. The numerator
# literal is computed once in Python and inlined in BOTH engines.
_KMV_K = 64
_KMV_NUM = 17732923532771328  # (k-1) << 48


@register(
    "q_kmv_distinct_merge",
    oracle="""
WITH ud AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
h AS (
  SELECT day, user_id,
         CAST(('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 12))
              AS BIGINT) + 1 AS hv
  FROM ud
),
daily_sketch AS (
  SELECT day, hv FROM (
    SELECT day, hv,
           ROW_NUMBER() OVER (PARTITION BY day ORDER BY hv) AS rn
    FROM h
  ) WHERE rn <= 64
),
merged_k AS (
  SELECT hv FROM (SELECT DISTINCT hv FROM daily_sketch)
  ORDER BY hv LIMIT 64
),
direct_k AS (
  SELECT hv FROM (SELECT DISTINCT hv FROM h) ORDER BY hv LIMIT 64
),
exact AS (
  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
         CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
  FROM ud
),
est AS (
  SELECT (SELECT CASE WHEN COUNT(*) < 64 THEN COUNT(*)
                      ELSE 17732923532771328 // MAX(hv) END
          FROM merged_k) AS kmv_merged,
         (SELECT CASE WHEN COUNT(*) < 64 THEN COUNT(*)
                      ELSE 17732923532771328 // MAX(hv) END
          FROM direct_k) AS kmv_direct
)
SELECT e.n_days, e.exact_distinct,
       CAST(s.kmv_direct AS BIGINT) AS kmv_direct,
       CAST(s.kmv_merged AS BIGINT) AS kmv_merged,
       CAST(CASE WHEN s.kmv_direct = s.kmv_merged THEN 1 ELSE 0 END
            AS BIGINT) AS merge_agrees,
       CAST(floor(10000.0 * abs(s.kmv_direct - e.exact_distinct)
                  / e.exact_distinct) AS BIGINT) AS err_pct_fp4
FROM exact e, est s
""",
)
def q_kmv_distinct_merge(spark, sf_dir):
    """K-minimum-values distinct sketch with a MERGEABILITY witness — the
    exact-oracled companion to q_hll_merge_daily (HLL estimates are
    tolerance-gated; KMV's k smallest 48-bit hashes are deterministic
    integers, so the driver hashes the whole sketch path). Per day the
    sketch keeps the k smallest user-hashes; the year merges by unioning
    daily sketches and re-taking the k smallest — the union of per-day
    k-minima always contains the global k-minima, so the merged estimate
    must equal the direct one EXACTLY (merge_agrees pins it in-plan), and
    err_pct_fp4 witnesses estimator quality against the exact distinct.

    Scale shape: one (day, user) distinct shuffle; daily top-k via
    day-partitioned windows; everything after is (k · days)-sized. This is
    the incremental-distinct contract at 100 TB: daily sketch rows are
    kilobytes and raw events are scanned once, the day they land."""
    e = T(spark, sf_dir, "events")
    ud = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    hv = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    )
    h = ud.select("day", "user_id", hv.alias("hv"))
    wd = Window.partitionBy("day").orderBy("hv")
    daily_sketch = (
        h.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= _KMV_K)
        .select("day", "hv")
    )
    merged_k = (
        daily_sketch.select("hv").distinct().orderBy("hv").limit(_KMV_K)
    )
    direct_k = h.select("hv").distinct().orderBy("hv").limit(_KMV_K)
    exact = ud.agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_distinct"),
        F.countDistinct("day").cast("bigint").alias("n_days"),
    )
    # standard KMV semantics: a non-full sketch IS the exact distinct set
    est_expr = (
        f"CASE WHEN count(*) < {_KMV_K} THEN count(*) "
        f"ELSE {_KMV_NUM} div max(hv) END"
    )
    est_m = merged_k.agg(F.expr(est_expr).alias("kmv_merged"))
    est_d = direct_k.agg(F.expr(est_expr).alias("kmv_direct"))
    j = exact.crossJoin(F.broadcast(est_d)).crossJoin(F.broadcast(est_m))
    return j.select(
        "n_days",
        "exact_distinct",
        F.col("kmv_direct").cast("bigint").alias("kmv_direct"),
        F.col("kmv_merged").cast("bigint").alias("kmv_merged"),
        F.when(F.col("kmv_direct") == F.col("kmv_merged"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("merge_agrees"),
        F.floor(
            10000.0
            * F.abs(F.col("kmv_direct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
        )
        .cast("bigint")
        .alias("err_pct_fp4"),
    )


# Two-sided normal quantiles z_{0.025/m} for m = 1..10 comparisons,
# computed ONCE with Python's statistics.NormalDist().inv_cdf and inlined
# as full-precision literals in BOTH engines (the Poisson-CDF /
# nDCG-weight-table discipline: neither engine computes the quantile).
_BONF_Z = [
    1.959963984540054, 2.241402727604946, 2.39397979981851,
    2.497705474412374, 2.5758293035489, 2.638257273476751,
    2.690109527158866, 2.734368786533176, 2.772921294608662,
    2.807033768343811,
]


def _bonf_case_sql(m: str) -> str:
    branches = " ".join(
        f"WHEN {m} = {i + 1} THEN {z!r}" for i, z in enumerate(_BONF_Z[:-1])
    )
    return f"CASE {branches} ELSE {_BONF_Z[-1]!r} END"


@register(
    "q_bonferroni_ab_screen",
    oracle=f"""
WITH g AS (
  SELECT event_type, CAST(user_id % 2 AS BIGINT) AS cohort,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
              AS DECIMAL(38,12)) AS ss
  FROM events GROUP BY 1, 2
),
wide AS (
  SELECT event_type,
         MAX(CASE WHEN cohort = 0 THEN n END) AS n0,
         MAX(CASE WHEN cohort = 1 THEN n END) AS n1,
         MAX(CASE WHEN cohort = 0 THEN s END) AS s0,
         MAX(CASE WHEN cohort = 1 THEN s END) AS s1,
         MAX(CASE WHEN cohort = 0 THEN ss END) AS ss0,
         MAX(CASE WHEN cohort = 1 THEN ss END) AS ss1
  FROM g GROUP BY event_type
),
z AS (
  SELECT event_type, n0, n1,
         CASE WHEN se > 0
              THEN (CAST(s0 AS DOUBLE) / n0 - CAST(s1 AS DOUBLE) / n1) / se
         END AS zv,
         COUNT(*) OVER () AS m
  FROM (
    SELECT *,
           sqrt(((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0)
                 / (n0 - 1)) / n0
                + ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                   / (n1 - 1)) / n1) AS se
    FROM wide
  )
)
SELECT event_type, n0, n1,
       CAST(floor(1000000.0 * zv) AS BIGINT) AS z_fp6,
       CAST(m AS BIGINT) AS n_comparisons,
       CAST(CASE WHEN zv IS NOT NULL AND abs(zv) > {_BONF_Z[0]!r} THEN 1 ELSE 0 END AS BIGINT)
         AS sig_raw,
       CAST(CASE WHEN abs(zv) > ({_bonf_case_sql('least(m, 10)')})
                 THEN 1 ELSE 0 END AS BIGINT) AS sig_bonferroni
FROM z
""",
)
def q_bonferroni_ab_screen(spark, sf_dir):
    """Multi-metric A/B screen with multiple-testing correction — the
    experimentation-platform guard against p-hacking across metrics: a
    Welch z per event type between two deterministic user cohorts
    (user_id mod 2), flagged both at raw α=0.05 and at the
    Bonferroni-corrected α/m where m is the number of metrics actually
    tested (counted in-plan). Means and variances come from exact decimal
    Σv / Σv² partials (one shuffle to the (type, cohort) frame); z and the
    threshold compare are doubles derived from those exact decimals with
    identical expressions in both engines; the z-quantile table is
    full-precision Python literals inlined in both.

    Scale shape: ONE map-side-combined aggregate ends the corpus path;
    everything after is |metrics|-sized."""
    e = T(spark, sf_dir, "events").select(
        "event_type",
        (F.col("user_id") % 2).cast("bigint").alias("cohort"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    g = e.groupBy("event_type", "cohort").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v").cast("decimal(38,6)").alias("s"),
        F.sum(F.col("v") * F.col("v")).cast("decimal(38,12)").alias("ss"),
    )

    def pick(col, c):
        return F.max(F.when(F.col("cohort") == c, F.col(col)))

    wide = g.groupBy("event_type").agg(
        pick("n", 0).alias("n0"),
        pick("n", 1).alias("n1"),
        pick("s", 0).alias("s0"),
        pick("s", 1).alias("s1"),
        pick("ss", 0).alias("ss0"),
        pick("ss", 1).alias("ss1"),
    )
    mean = lambda s, n: F.col(s).cast("double") / F.col(n)  # noqa: E731
    var = lambda s, ss, n: (  # noqa: E731
        F.col(ss).cast("double")
        - F.col(s).cast("double") * F.col(s) / F.col(n)
    ) / (F.col(n) - 1)
    se = F.sqrt(
        var("s0", "ss0", "n0") / F.col("n0")
        + var("s1", "ss1", "n1") / F.col("n1")
    )
    # a degenerate metric (zero variance in both cohorts) has no z — emit
    # NULL and flag 0 rather than divide by zero (ANSI) / inf (DuckDB)
    zv = F.when(se > 0, (mean("s0", "n0") - mean("s1", "n1")) / se)
    z = wide.select(
        "event_type",
        "n0",
        "n1",
        zv.alias("zv"),
        # bounded cardinality: one row per event TYPE (small domain)
        F.count(F.lit(1)).over(Window.partitionBy()).alias("m"),
    )
    thr_arr = F.array(*[F.lit(t) for t in _BONF_Z])
    bonf_thr = F.element_at(thr_arr, F.least(F.col("m"), F.lit(10)).cast("int"))
    return z.select(
        "event_type",
        "n0",
        "n1",
        F.floor(1_000_000.0 * F.col("zv")).cast("bigint").alias("z_fp6"),
        F.col("m").cast("bigint").alias("n_comparisons"),
        (F.col("zv").isNotNull() & (F.abs("zv") > _BONF_Z[0]))
        .cast("bigint")
        .alias("sig_raw"),
        (F.col("zv").isNotNull() & (F.abs("zv") > bonf_thr))
        .cast("bigint")
        .alias("sig_bonferroni"),
    )
