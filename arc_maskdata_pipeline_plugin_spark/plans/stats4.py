"""Classical hypothesis testing, round 2: k-group tests and multiple-testing
control — Kruskal-Wallis, one-way ANOVA, grouped Spearman rank correlation,
Benjamini-Hochberg step-up FDR, and the Pettitt changepoint test.

These complete the experimentation-stack family started in ``stats3``
(KS / Mann-Whitney / chi-square): where stats3 compares TWO samples, this
module compares k samples (Kruskal-Wallis, ANOVA), correlates two ranked
metrics per group (Spearman), controls the false-discovery rate across a
metric battery (BH — the standard step up from the Bonferroni screen), and
locates WHERE a series shifted (Pettitt), not just whether it did.

Scale shapes (the rules that survive 100 TB):

* Kruskal-Wallis collapses the corpus to the DISTINCT-VALUE count frame in
  one shuffle — the same accepted seam as KS/Mann-Whitney/winsorize; rank
  algebra runs there, never on rows.
* ANOVA is ONE map-side-combined aggregate (n, Σv, Σv² per group); every
  post-aggregate step is |groups|-sized.
* Spearman's rank windows are PARTITIONED by the group key (nation), so no
  unpartitioned corpus sort exists at any cardinality.
* BH runs its step-up window over the |metrics|-sized frame (single
  partition of k rows — dozens, by construction).
* Pettitt windows are partitioned by series key over calendar-daily rows
  (≤366·|types| rows/year), downstream of one daily aggregate.

Bit-stability: counts/rank sums are exact BIGINT/DECIMAL(38,0); midranks are
carried DOUBLED (``m2 = 2·rank + t − 1``) so ties stay integral; every
double is derived from exact integers with the IDENTICAL expression shape in
the DuckDB oracle, and fp-floored per-group terms are summed as integers
(a floating sum of group terms would be partition-order-dependent).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, persisted, register

# ---------------------------------------------------------------------------
# Kruskal-Wallis H — k-group rank test over event values by type
# ---------------------------------------------------------------------------


@register(
    "q_kruskal_wallis",
    oracle="""
WITH vc AS (
  SELECT CAST(value AS DECIMAL(18,6)) AS v, event_type,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT event_type, cnt,
         SUM(cnt) OVER (PARTITION BY v) AS t,
         SUM(cnt) OVER (ORDER BY v
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_incl,
         ROW_NUMBER() OVER (PARTITION BY v ORDER BY event_type) AS rn
  FROM vc
),
grp AS (
  SELECT event_type,
         CAST(SUM(cnt) AS BIGINT) AS n_g,
         CAST(SUM(CAST(cnt AS DECIMAL(38,0)) * (2 * cum_incl - t + 1))
              AS DECIMAL(38,0)) AS r2,
         CAST(SUM(CASE WHEN rn = 1
                       THEN CAST(t AS DECIMAL(38,0)) * t * t - t
                       ELSE 0 END) AS DECIMAL(38,0)) AS ties
  FROM base GROUP BY event_type
),
g2 AS (
  -- NB: DuckDB's // on DECIMAL rounds the decimal division before
  -- flooring (Spark's div truncates exactly) — go through HUGEINT
  SELECT n_g, ties,
         CAST(CAST(r2 * r2 AS HUGEINT) // CAST(4 * n_g AS HUGEINT)
              AS BIGINT) AS qterm,
         CAST(floor(1000000000.0
                    * CAST(CAST(r2 * r2 AS HUGEINT) % CAST(4 * n_g AS HUGEINT)
                           AS DOUBLE)
                    / (4.0 * n_g)) AS BIGINT) AS frac_fp9
  FROM grp
)
SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
       CAST(SUM(n_g) AS BIGINT) AS n,
       CAST(CASE WHEN CAST(SUM(ties) AS DOUBLE)
                      < CAST(SUM(n_g) AS DOUBLE) * SUM(n_g) * SUM(n_g)
                        - SUM(n_g)
            THEN floor(1000000.0 *
              ((12.0 * (CAST(SUM(qterm) AS DOUBLE)
                        + CAST(SUM(frac_fp9) AS DOUBLE) / 1000000000.0)
                  / (CAST(SUM(n_g) AS DOUBLE) * (SUM(n_g) + 1))
                - 3.0 * (SUM(n_g) + 1))
               / (1.0 - CAST(SUM(ties) AS DOUBLE)
                    / (CAST(SUM(n_g) AS DOUBLE) * SUM(n_g) * SUM(n_g)
                       - SUM(n_g))))) END
            AS BIGINT) AS h_fp6
FROM g2
""",
)
def q_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H across ALL event types — "does at least one metric
    distribution differ?", the k-group generalization of Mann-Whitney. With
    midranks doubled (``m2 = 2·c_before + t + 1``), the per-group rank sum
    ``R2 = Σ cnt·m2`` stays integral under ties; the per-group H term
    ``R²/n = R2²/(4n)`` is split into an exact integer quotient plus an
    fp9-floored remainder fraction BEFORE the k-row sum (exact at small N,
    never a partition-order-dependent double sum), and the tie
    correction ``1 − Σ(t³−t)/(n³−n)`` uses exact tie cubes attributed once
    per distinct value (row_number = 1).

    Scale shape: one shuffle to the distinct-value count frame (the
    documented seam shared with q_ks_test); windows and rank algebra run
    there; the final aggregate sees |types| rows."""
    vc = (
        T(spark, sf_dir, "events")
        .select(F.col("value").cast("decimal(18,6)").alias("v"), "event_type")
        .groupBy("v", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    # the distinct-value frame grows with the data, so the pooled
    # cumulative counts run as a two-phase cumsum over the per-value
    # totals frame (v unique there, so ROWS == the original RANGE
    # semantics), joined back on v — never an Exchange SinglePartition;
    # the per-value frame also supplies `t`, replacing the wv window
    from .twophase import global_cumsums

    vc = vc.transform(persisted)  # consumers: per-value frame + rank join
    pv = vc.groupBy("v").agg(
        F.sum("cnt").cast("bigint").alias("t")
    ).transform(persisted)  # consumers: boundary sketch, windows, totals
    cumv = global_cumsums(pv, ["v"], {"cum_incl": ("t", "incl")})
    wrn = Window.partitionBy("v").orderBy("event_type")
    base = vc.join(cumv, "v").select(
        "event_type",
        "cnt",
        "t",
        "cum_incl",
        F.row_number().over(wrn).alias("rn"),
    )
    grp = base.groupBy("event_type").agg(
        F.sum("cnt").cast("bigint").alias("n_g"),
        F.sum(
            F.col("cnt").cast("decimal(38,0)")
            * (2 * F.col("cum_incl") - F.col("t") + 1)
        )
        .cast("decimal(38,0)")
        .alias("r2"),
        F.sum(
            F.when(
                F.col("rn") == 1,
                F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t")
                - F.col("t"),
            ).otherwise(F.lit(0))
        )
        .cast("decimal(38,0)")
        .alias("ties"),
    )
    # exact per-group R²/n as integer quotient + fp9 remainder fraction:
    # a straight per-group floor loses up to 1 per group (visible at small
    # N); a raw double sum is partition-order-dependent. q fits BIGINT
    # (R2² ≤ ~1e22 stays DECIMAL; q = R2²/(4n) ≤ ~1e17 at sf0.1).
    g2 = grp.select(
        "n_g",
        "ties",
        F.expr("(r2 * r2) div (4 * n_g)").cast("bigint").alias("qterm"),
        F.floor(
            1_000_000_000.0
            * F.expr("(r2 * r2) % (4 * n_g)").cast("double")
            / (4.0 * F.col("n_g"))
        )
        .cast("bigint")
        .alias("frac_fp9"),
    )
    n = F.sum("n_g")
    # a fully-tied corpus has no rank information: the tie-correction
    # denominator hits 0 exactly when Σ(t³−t) = n³−n → emit NULL, not ±inf
    return g2.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_groups"),
        n.cast("bigint").alias("n"),
        F.when(
            F.sum("ties").cast("double") < n.cast("double") * n * n - n,
            F.floor(
                1_000_000.0
                * (
                    (
                        12.0
                        * (
                            F.sum("qterm").cast("double")
                            + F.sum("frac_fp9").cast("double")
                            / 1_000_000_000.0
                        )
                        / (n.cast("double") * (n + 1))
                        - 3.0 * (n + 1)
                    )
                    / (
                        1.0
                        - F.sum("ties").cast("double")
                        / (n.cast("double") * n * n - n)
                    )
                )
            ),
        )
        .cast("bigint")
        .alias("h_fp6"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F — variance decomposition across event types
# ---------------------------------------------------------------------------


@register(
    "q_anova_f",
    oracle="""
WITH g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s,
         CAST(SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
              AS DECIMAL(38,12)) AS ss
  FROM events GROUP BY event_type
),
g2 AS (
  SELECT n_g, ss,
         CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_g) AS BIGINT)
           AS bterm,
         s
  FROM g
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(s) AS DECIMAL(38,6)) AS gs,
         CAST(SUM(ss) AS DECIMAL(38,12)) AS gss,
         CAST(SUM(bterm) AS DECIMAL(38,0)) AS b
  FROM g2
),
f AS (
  SELECT k, n,
         CAST(b AS DOUBLE)
           - CAST(gs AS DOUBLE) * CAST(gs AS DOUBLE) / n AS ssb,
         CAST(gss AS DOUBLE) - CAST(b AS DOUBLE) AS ssw
  FROM tot
)
SELECT k AS k_groups, n,
       CAST(floor(1000000.0 * (ssb / (k - 1)) / (ssw / (n - k))) AS BIGINT)
         AS f_fp6,
       CAST(floor(1000000.0 * ssb / (ssb + ssw)) AS BIGINT) AS eta2_fp6
FROM f
""",
)
def q_anova_f(spark, sf_dir):
    """One-way ANOVA F across event types — the parametric sibling of
    Kruskal-Wallis: SSB/SSW from exact per-group (n, Σv, Σv²) decimal
    partials, with the per-group between term ``s²/n`` fp-floored before
    the k-row sum. Also emits η² (effect size) from the same sums.

    Scale shape: ONE map-side-combined aggregate ends the corpus path —
    the canonical sufficient-statistics reduction; everything after is
    |types|-sized."""
    g = (
        T(spark, sf_dir, "events")
        .select("event_type", F.col("value").cast("decimal(18,6)").alias("v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_g"),
            F.sum("v").cast("decimal(38,6)").alias("s"),
            F.sum(F.col("v") * F.col("v")).cast("decimal(38,12)").alias("ss"),
        )
    )
    g2 = g.select(
        "n_g",
        "ss",
        F.floor(
            F.col("s").cast("double") * F.col("s").cast("double") / F.col("n_g")
        )
        .cast("bigint")
        .alias("bterm"),
        "s",
    )
    tot = g2.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s").cast("decimal(38,6)").alias("gs"),
        F.sum("ss").cast("decimal(38,12)").alias("gss"),
        F.sum("bterm").cast("decimal(38,0)").alias("b"),
    )
    f = tot.select(
        "k",
        "n",
        (
            F.col("b").cast("double")
            - F.col("gs").cast("double") * F.col("gs").cast("double") / F.col("n")
        ).alias("ssb"),
        (F.col("gss").cast("double") - F.col("b").cast("double")).alias("ssw"),
    )
    return f.select(
        F.col("k").alias("k_groups"),
        "n",
        F.floor(
            1_000_000.0
            * (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("n") - F.col("k")))
        )
        .cast("bigint")
        .alias("f_fp6"),
        F.floor(1_000_000.0 * F.col("ssb") / (F.col("ssb") + F.col("ssw")))
        .cast("bigint")
        .alias("eta2_fp6"),
    )


# ---------------------------------------------------------------------------
# Grouped Spearman rank correlation — acctbal vs. realized spend, per nation
# ---------------------------------------------------------------------------


@register(
    "q_spearman_corr",
    oracle="""
WITH sp AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS y
  FROM orders GROUP BY o_custkey
),
j AS (
  SELECT c_nationkey,
         CAST(c_acctbal AS DECIMAL(18,2)) AS x,
         COALESCE(sp.y, CAST(0 AS DECIMAL(38,2))) AS y
  FROM customer LEFT JOIN sp ON c_custkey = o_custkey
),
rk AS (
  SELECT c_nationkey,
         2 * RANK() OVER (PARTITION BY c_nationkey ORDER BY x)
           + COUNT(*) OVER (PARTITION BY c_nationkey, x) - 1 AS mx,
         2 * RANK() OVER (PARTITION BY c_nationkey ORDER BY y)
           + COUNT(*) OVER (PARTITION BY c_nationkey, y) - 1 AS my
  FROM j
),
agg AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
         CAST(SUM(mx) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(my) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(mx AS DECIMAL(38,0)) * my) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(mx AS DECIMAL(38,0)) * mx) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(my AS DECIMAL(38,0)) * my) AS DECIMAL(38,0)) AS syy
  FROM rk GROUP BY c_nationkey
)
SELECT c_nationkey, n_cust,
       CAST(floor(1000000.0
              * CAST(n_cust * sxy - sx * sy AS DOUBLE)
              / sqrt(CAST(n_cust * sxx - sx * sx AS DOUBLE)
                     * CAST(n_cust * syy - sy * sy AS DOUBLE)))
            AS BIGINT) AS rho_fp6
FROM agg
""",
)
def q_spearman_corr(spark, sf_dir):
    """Per-nation Spearman rank correlation between a customer's account
    balance and their realized order spend — the robust (monotone,
    outlier-insensitive) complement to the Pearson feature-correlation
    query. Midranks are doubled (``m = 2·rank + t − 1``) so ties stay
    integral, then rho is Pearson over exact integer rank moments; only the
    final ratio touches doubles.

    Scale shape: one aggregate collapses orders per customer, one join back
    to customers, and ALL rank windows are partitioned by nation — no
    unpartitioned corpus sort at any cardinality (contrast the documented
    distinct-value-frame seam queries, which deliberately collapse first)."""
    sp = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("y")
        )
    )
    j = (
        T(spark, sf_dir, "customer")
        .join(sp, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            "c_nationkey",
            F.col("c_acctbal").cast("decimal(18,2)").alias("x"),
            F.coalesce(F.col("y"), F.lit(0).cast("decimal(38,2)")).alias("y"),
        )
    )
    mx = (
        2 * F.rank().over(Window.partitionBy("c_nationkey").orderBy("x"))
        + F.count(F.lit(1)).over(Window.partitionBy("c_nationkey", "x"))
        - 1
    )
    my = (
        2 * F.rank().over(Window.partitionBy("c_nationkey").orderBy("y"))
        + F.count(F.lit(1)).over(Window.partitionBy("c_nationkey", "y"))
        - 1
    )
    rk = j.select("c_nationkey", mx.alias("mx"), my.alias("my"))
    agg = rk.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cust"),
        F.sum("mx").cast("decimal(38,0)").alias("sx"),
        F.sum("my").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("mx").cast("decimal(38,0)") * F.col("my"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("mx").cast("decimal(38,0)") * F.col("mx"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("my").cast("decimal(38,0)") * F.col("my"))
        .cast("decimal(38,0)")
        .alias("syy"),
    )
    return agg.select(
        "c_nationkey",
        "n_cust",
        F.floor(
            1_000_000.0
            * (F.col("n_cust") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
                "double"
            )
            / F.sqrt(
                (
                    F.col("n_cust") * F.col("sxx") - F.col("sx") * F.col("sx")
                ).cast("double")
                * (
                    F.col("n_cust") * F.col("syy") - F.col("sy") * F.col("sy")
                ).cast("double")
            )
        )
        .cast("bigint")
        .alias("rho_fp6"),
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg step-up FDR over the multi-metric A/B battery
# ---------------------------------------------------------------------------

# Abramowitz & Stegun 7.1.26 erf polynomial — inlined IDENTICALLY into both
# plans so the two-sided normal p derives from the same expression tree.
_AS_P = 0.3275911
_AS_C = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_BH_ALPHA_FP9 = 50_000_000  # floor(1e9 * 0.05)


def _erfc_sql(az: str) -> str:
    """DuckDB expression for erfc(az/sqrt(2)) via A&S 7.1.26 (two-sided
    normal p of a z-score)."""
    x = f"(abs({az}) / sqrt(2.0))"
    t = f"(1.0 / (1.0 + {_AS_P!r} * {x}))"
    poly = f"{_AS_C[4]!r}"
    for c in (_AS_C[3], _AS_C[2], _AS_C[1], _AS_C[0]):
        poly = f"({poly} * {t} + {c!r})"
    return f"({poly} * {t} * exp(-{x} * {x}))"


def _erfc_col(az):
    """Spark expression mirror of :func:`_erfc_sql`."""
    x = F.abs(az) / F.sqrt(F.lit(2.0))
    t = 1.0 / (1.0 + _AS_P * x)
    poly = F.lit(_AS_C[4])
    for c in (_AS_C[3], _AS_C[2], _AS_C[1], _AS_C[0]):
        poly = poly * t + F.lit(c)
    return poly * t * F.exp(-x * x)


@register(
    "q_bh_fdr_screen",
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
         (CAST(s0 AS DOUBLE) / n0 - CAST(s1 AS DOUBLE) / n1) / se AS zv
  FROM (
    SELECT *,
           sqrt(((CAST(ss0 AS DOUBLE) - CAST(s0 AS DOUBLE) * s0 / n0)
                 / (n0 - 1)) / n0
                + ((CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1)
                   / (n1 - 1)) / n1) AS se
    FROM wide
  ) WHERE se > 0
),
p AS (
  SELECT event_type, n0, n1,
         CAST(floor(1000000.0 * zv) AS BIGINT) AS z_fp6,
         CAST(floor(1000000000.0 * {_erfc_sql('zv')}) AS BIGINT) AS p_fp9
  FROM z
),
rk AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (ORDER BY p_fp9, event_type) AS BIGINT)
           AS p_rank,
         COUNT(*) OVER () AS m
  FROM p
),
ind AS (
  SELECT *,
         MAX(CASE WHEN p_fp9 <= CAST(floor({_BH_ALPHA_FP9}.0 * p_rank / m)
                                     AS BIGINT)
                  THEN p_rank ELSE 0 END) OVER () AS kstar
  FROM rk
)
SELECT event_type, n0, n1, z_fp6, p_fp9, p_rank,
       CAST(CASE WHEN p_fp9 <= {_BH_ALPHA_FP9} THEN 1 ELSE 0 END AS BIGINT)
         AS sig_raw,
       CAST(CASE WHEN p_rank <= kstar THEN 1 ELSE 0 END AS BIGINT) AS sig_bh
FROM ind
""",
)
def q_bh_fdr_screen(spark, sf_dir):
    """Benjamini-Hochberg step-up FDR over the same multi-metric Welch-z
    battery as ``q_bonferroni_ab_screen`` — the standard production upgrade
    from family-wise Bonferroni to false-discovery-rate control: find
    ``k* = max{{i : p_(i) ≤ i·α/m}}`` and reject the k* smallest p-values.
    Two-sided p comes from the A&S 7.1.26 erf polynomial inlined
    IDENTICALLY into both plans (pure arithmetic + exp), fp-floored to
    integers before any comparison, so the step-up decision is bit-stable
    cross-engine.

    Scale shape: ONE map-side-combined aggregate ends the corpus path; the
    ranking window and step-up max run over the |metrics|-sized frame
    (single partition of k rows — dozens by construction, like the BH
    procedure itself)."""
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
    var = lambda s, ss, n: (  # noqa: E731
        F.col(ss).cast("double")
        - F.col(s).cast("double") * F.col(s) / F.col(n)
    ) / (F.col(n) - 1)
    se = F.sqrt(
        var("s0", "ss0", "n0") / F.col("n0")
        + var("s1", "ss1", "n1") / F.col("n1")
    )
    z = (
        wide.withColumn("se", se)
        .filter(F.col("se") > 0)
        .select(
            "event_type",
            "n0",
            "n1",
            (
                (
                    F.col("s0").cast("double") / F.col("n0")
                    - F.col("s1").cast("double") / F.col("n1")
                )
                / F.col("se")
            ).alias("zv"),
        )
    )
    p = z.select(
        "event_type",
        "n0",
        "n1",
        F.floor(1_000_000.0 * F.col("zv")).cast("bigint").alias("z_fp6"),
        F.floor(1_000_000_000.0 * _erfc_col(F.col("zv")))
        .cast("bigint")
        .alias("p_fp9"),
    )
    # bounded cardinality: one row per event TYPE (small domain)
    wrank = Window.orderBy("p_fp9", "event_type")
    wall = Window.partitionBy()
    rk = p.select(
        "*",
        F.row_number().over(wrank).cast("bigint").alias("p_rank"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    kstar = F.max(
        F.when(
            F.col("p_fp9")
            <= F.floor(
                F.lit(float(_BH_ALPHA_FP9)) * F.col("p_rank") / F.col("m")
            ).cast("bigint"),
            F.col("p_rank"),
        ).otherwise(F.lit(0))
    ).over(wall)
    return rk.withColumn("kstar", kstar).select(
        "event_type",
        "n0",
        "n1",
        "z_fp6",
        "p_fp9",
        "p_rank",
        F.when(F.col("p_fp9") <= _BH_ALPHA_FP9, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("sig_raw"),
        F.when(F.col("p_rank") <= F.col("kstar"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("sig_bh"),
    )


# ---------------------------------------------------------------------------
# Pettitt changepoint — where did the daily series shift?
# ---------------------------------------------------------------------------


@register(
    "q_pettitt_changepoint",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s
  FROM events GROUP BY 1, 2
),
dm AS (
  SELECT event_type, day,
         CAST(floor(1000000000.0 * CAST(s AS DOUBLE) / n) AS BIGINT) AS v
  FROM daily
),
rk AS (
  SELECT event_type, day,
         2 * RANK() OVER (PARTITION BY event_type ORDER BY v)
           + COUNT(*) OVER (PARTITION BY event_type, v) - 1 AS m2,
         COUNT(*) OVER (PARTITION BY event_type) AS nd,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM dm
),
u AS (
  SELECT event_type, day, nd,
         abs(SUM(m2) OVER (PARTITION BY event_type ORDER BY day
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - t * (nd + 1)) AS abs_u
  FROM rk
),
k AS (
  SELECT event_type, day, nd, abs_u,
         MAX(abs_u) OVER (PARTITION BY event_type) AS kmax
  FROM u
)
SELECT event_type,
       CAST(MAX(nd) AS BIGINT) AS n_days,
       CAST(MAX(kmax) AS BIGINT) AS k_stat,
       MIN(CASE WHEN abs_u = kmax THEN strftime(day, '%Y-%m-%d') END)
         AS cp_day,
       CAST(floor(1000000000.0 *
              least(1.0, 2.0 * exp(-6.0 * CAST(MAX(kmax) AS DOUBLE) * MAX(kmax)
                / (CAST(MAX(nd) AS DOUBLE) * MAX(nd) * MAX(nd)
                   + CAST(MAX(nd) AS DOUBLE) * MAX(nd)))))
            AS BIGINT) AS p_fp9
FROM k GROUP BY event_type
""",
)
def q_pettitt_changepoint(spark, sf_dir):
    """Pettitt changepoint test per event type — WHERE the daily mean-value
    series most likely shifted (CUSUM finds drift; Pettitt is the
    rank-based, distribution-free location test). With doubled midranks,
    ``U_t = Σ_{i≤t} r_i·2/2 − t(n+1)`` stays integral; the statistic is
    ``K = max_t |U_t|``, the changepoint is the earliest argmax day, and
    the approximate significance ``p ≈ 2·exp(−6K²/(n³+n²))`` derives from
    exact integers.

    Scale shape: ONE map-side-combined daily aggregate ends the corpus
    path; all rank/cumulative windows are partitioned by event type over
    calendar-daily rows (≤366·|types| rows/year)."""
    daily = (
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("decimal(38,6)")
            .alias("s"),
        )
    )
    dm = daily.select(
        "event_type",
        "day",
        F.floor(1_000_000_000.0 * F.col("s").cast("double") / F.col("n"))
        .cast("bigint")
        .alias("v"),
    )
    wt = Window.partitionBy("event_type")
    rk = dm.select(
        "event_type",
        "day",
        (
            2 * F.rank().over(Window.partitionBy("event_type").orderBy("v"))
            + F.count(F.lit(1)).over(Window.partitionBy("event_type", "v"))
            - 1
        ).alias("m2"),
        F.count(F.lit(1)).over(wt).alias("nd"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("day"))
        .alias("t"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = rk.select(
        "event_type",
        "day",
        "nd",
        F.abs(F.sum("m2").over(wcum) - F.col("t") * (F.col("nd") + 1)).alias(
            "abs_u"
        ),
    )
    k = u.select(
        "event_type",
        "day",
        "nd",
        "abs_u",
        F.max("abs_u").over(wt).alias("kmax"),
    )
    kmax = F.max("kmax").cast("double")
    nd = F.max("nd").cast("double")
    return k.groupBy("event_type").agg(
        F.max("nd").cast("bigint").alias("n_days"),
        F.max("kmax").cast("bigint").alias("k_stat"),
        F.min(
            F.when(
                F.col("abs_u") == F.col("kmax"),
                F.date_format("day", "yyyy-MM-dd"),
            )
        ).alias("cp_day"),
        F.floor(
            1_000_000_000.0
            * F.least(
                F.lit(1.0),
                2.0
                * F.exp(
                    -6.0
                    * kmax
                    * F.max("kmax")
                    / (nd * F.max("nd") * F.max("nd") + nd * F.max("nd"))
                ),
            )
        )
        .cast("bigint")
        .alias("p_fp9"),
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard — the hazard-scale twin of Kaplan-Meier
# ---------------------------------------------------------------------------


@register(
    "q_nelson_aalen",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS start_day FROM events GROUP BY user_id
),
first_purchase AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS conv_day
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
horizon AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM events),
subj AS (
  SELECT f.user_id,
         CASE WHEN p.conv_day IS NULL
              THEN date_diff('day', f.start_day, horizon.h)
              ELSE date_diff('day', f.start_day, p.conv_day) END AS t,
         CASE WHEN p.conv_day IS NULL THEN 0 ELSE 1 END AS event
  FROM first_seen f LEFT JOIN first_purchase p USING (user_id)
  CROSS JOIN horizon
),
times AS (
  SELECT t,
         CAST(SUM(event) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS leaving
  FROM subj GROUP BY t
),
risk AS (
  SELECT t, d,
         SUM(leaving) OVER (ORDER BY t DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS n_at_risk
  FROM times
)
SELECT t, d, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(SUM(CAST(floor(1000000000.0 * d / n_at_risk) AS BIGINT))
            OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS hazard_fp9,
       CAST(SUM(CAST(floor(1000000000.0
                           * (CAST(d AS DOUBLE) * (n_at_risk - d))
                           / (CAST(n_at_risk AS DOUBLE) * n_at_risk * n_at_risk))
                    AS BIGINT))
            OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS var_fp9
FROM risk
WHERE d > 0
""",
)
def q_nelson_aalen(spark, sf_dir):
    """Nelson-Aalen cumulative-hazard estimator for the same
    time-to-first-purchase data as ``q_kaplan_meier`` — the hazard-scale
    twin: ``H(t) = Σ_{t_i ≤ t} d_i/n_i`` with the standard variance
    ``Σ d_i(n_i − d_i)/n_i³``. Each hazard and variance term is fp9-floored
    BEFORE the cumulative sum (exact integer accumulation — the same rule
    that keeps the KM log-product engine-stable), and the at-risk counts
    come from the same reverse cumulative sum.

    Scale shape: corpus collapses to one row per user, then one row per
    distinct duration; every window after the first user-keyed aggregate is
    duration-grain (cites q_kaplan_meier's shape; see plans/stats2.py)."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("start_day")
    )
    first_purchase = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("conv_day"))
    )
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h"))
    subj = (
        first_seen.join(first_purchase, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("conv_day").isNull(),
                F.datediff(F.col("h"), F.col("start_day")),
            )
            .otherwise(F.datediff(F.col("conv_day"), F.col("start_day")))
            .alias("t"),
            F.when(F.col("conv_day").isNull(), 0).otherwise(1).alias("event"),
        )
    )
    times = subj.groupBy("t").agg(
        F.sum("event").cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    # bounded cardinality: duration-grain frame — t is DAYS between two
    # dates inside the calendar span (~2.5k distinct values), not data-sized
    wrev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = times.select(
        "t",
        "d",
        F.sum("leaving").over(wrev).alias("n_at_risk"),
    )
    wfwd = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    hterm = F.floor(1_000_000_000.0 * F.col("d") / F.col("n_at_risk")).cast(
        "bigint"
    )
    vterm = F.floor(
        1_000_000_000.0
        * (F.col("d").cast("double") * (F.col("n_at_risk") - F.col("d")))
        / (
            F.col("n_at_risk").cast("double")
            * F.col("n_at_risk")
            * F.col("n_at_risk")
        )
    ).cast("bigint")
    return (
        risk.select(
            "t",
            "d",
            F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
            F.sum(hterm).over(wfwd).cast("bigint").alias("hazard_fp9"),
            F.sum(vterm).over(wfwd).cast("bigint").alias("var_fp9"),
        )
        .filter(F.col("d") > 0)
    )


# ---------------------------------------------------------------------------
# Daily autocorrelation function — lags 1..7 over per-type event counts
# ---------------------------------------------------------------------------

_ACF_MAX_LAG = 7


@register(
    "q_acf_daily",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS DECIMAL(38,0)) AS s,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS scc
  FROM daily GROUP BY event_type
),
pairs AS (
  SELECT a.event_type, lag,
         CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(a.c) AS DECIMAL(38,0)) AS sa,
         CAST(SUM(b.c) AS DECIMAL(38,0)) AS sb,
         CAST(SUM(CAST(a.c AS DECIMAL(38,0)) * b.c) AS DECIMAL(38,0)) AS sab
  FROM daily a, UNNEST(range(1, {_ACF_MAX_LAG} + 1)) AS l(lag)
  JOIN daily b ON b.event_type = a.event_type
              AND b.day = a.day + CAST(lag AS INTEGER)
  GROUP BY a.event_type, lag
)
SELECT p.event_type, CAST(p.lag AS BIGINT) AS lag, t.n AS n_days, p.m AS n_pairs,
       CAST(floor(1000000.0
              * CAST(CAST(t.n AS DECIMAL(38,0)) * t.n * p.sab
                     - t.n * t.s * (p.sa + p.sb) + p.m * t.s * t.s AS DOUBLE)
              / (CAST(p.m AS DOUBLE)
                 * CAST(t.n * t.scc - t.s * t.s AS DOUBLE)))
            AS BIGINT) AS acf_fp6
FROM pairs p JOIN tot t ON p.event_type = t.event_type
""",
)
def q_acf_daily(spark, sf_dir):
    """Sample autocorrelation of the daily event-count series per type at
    lags 1..{_ACF_MAX_LAG} — the seasonality fingerprint behind the
    forecast/anomaly monitors (a weekly cycle shows as an acf(7) spike).
    Gap-aware: lag pairs join on the CALENDAR day offset, never on row
    offsets, so missing days cannot misalign lags (the q_forecast_backtest
    calendar-join rule). The estimator is normalized per lag over the m
    matched pairs: r_L = (Σ(a−c̄)(b−c̄))/ (m/n · Σ(c−c̄)²), and the whole
    ratio is carried as exact integer products (multiply through by n²)
    with only the final division a double.

    Scale shape: ONE map-side-combined daily aggregate ends the corpus
    path; the lag self-join and totals run on the calendar-sized frame
    (≤366·|types| rows/year), with the |types|-row totals broadcast."""
    daily = persisted(
        T(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("scc"),
    )
    a = daily.select(
        "event_type",
        "day",
        "c",
        F.explode(F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG))).alias("lag"),
    )
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("day").alias("bday"),
        F.col("c").alias("bc"),
    )
    pairs = (
        a.join(
            b,
            (F.col("bt") == F.col("event_type"))
            & (F.col("bday") == F.date_add(F.col("day"), F.col("lag"))),
        )
        .groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("m"),
            F.sum("c").cast("decimal(38,0)").alias("sa"),
            F.sum("bc").cast("decimal(38,0)").alias("sb"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("bc"))
            .cast("decimal(38,0)")
            .alias("sab"),
        )
    )
    out = pairs.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n").alias("n_days"),
        F.col("m").alias("n_pairs"),
        F.floor(
            1_000_000.0
            * (
                F.col("n").cast("decimal(38,0)") * F.col("n") * F.col("sab")
                - F.col("n") * F.col("s") * (F.col("sa") + F.col("sb"))
                + F.col("m") * F.col("s") * F.col("s")
            ).cast("double")
            / (
                F.col("m").cast("double")
                * (F.col("n") * F.col("scc") - F.col("s") * F.col("s")).cast(
                    "double"
                )
            )
        )
        .cast("bigint")
        .alias("acf_fp6"),
    )
    return out
