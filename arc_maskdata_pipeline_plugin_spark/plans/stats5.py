"""Sequential, equivalence, and permutation testing (oracle-checked).

Completes the experimentation stack (stats2/stats4: Welch, CUPED,
Mann-Whitney, ANOVA, FDR...) with the three decision procedures a growth
team actually runs day-to-day:

* **Wald SPRT** (Wald 1945) on a daily Bernoulli conversion stream —
  the sequential test that lets an experiment STOP EARLY with controlled
  error: after n trials with k successes the log-likelihood ratio is
  ``k·ln(p1/p0) + (n−k)·ln(q1/q0)``; cross thresholds ``ln((1−β)/α)`` /
  ``ln(β/(1−α))`` and the test stops. The four log constants are computed
  ONCE in Python and inlined as identical double literals in both engines,
  so every per-day value is the same IEEE multiply-add in Spark and DuckDB
  — no engine-divergent transcendentals in the plan.
* **TOST equivalence** (Schuirmann 1987) — two one-sided tests against a
  ±δ margin: the procedure that demonstrates a treatment DOESN'T move a
  guardrail metric. Large-sample z boundaries inlined as literals; means
  and variances from exact integer-cent sums.
* **Permutation test** (Fisher) — deterministic "permutations": replicate
  r reassigns each user by bit r of md5(user), so 16 sign-flips compute in
  ONE pass as conditional sums (the q_poisson_bootstrap_ci pattern) and
  the p-value is exactly reproducible. The |Δmean| comparison is done in
  exact integer cross-multiplication — DECIMAL(38,0) on the Spark side,
  HUGEINT in the DuckDB oracle — no division, no doubles; exact while
  |Δ_cents|·n_a·n_b < 1e38 (Spark nulls, DuckDB errors past that).

Scale shape: each query is one scan plus one (or zero) keyed aggregate;
the SPRT cumulative is a 30-row window over the daily aggregate; the
permutation replicates are columns, not rows — corpus passes: exactly one.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, register

# --- SPRT constants (inlined identically in both engines) -----------------
_P0, _P1 = 0.18, 0.22
_ALPHA, _BETA = 0.05, 0.05
_C1 = repr(math.log(_P1 / _P0))          # per-success increment
_C2 = repr(math.log((1 - _P1) / (1 - _P0)))  # per-failure increment
_LN_A = repr(math.log((1 - _BETA) / _ALPHA))
_LN_B = repr(math.log(_BETA / (1 - _ALPHA)))

_SPRT_ORACLE = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         CAST(COUNT(*) AS BIGINT) AS n_day,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k_day
  FROM events GROUP BY 1
),
cum AS (
  SELECT strftime(d, '%Y-%m-%d') AS day,
         SUM(n_day) OVER (ORDER BY d) AS n_cum,
         SUM(k_day) OVER (ORDER BY d) AS k_cum
  FROM daily
),
scored AS (
  SELECT day, CAST(n_cum AS BIGINT) AS n_cum, CAST(k_cum AS BIGINT) AS k_cum,
         k_cum * ({_C1}) + (n_cum - k_cum) * ({_C2}) AS llr
  FROM cum
),
dec AS (
  SELECT day, n_cum, k_cum,
         CAST(floor(llr * 1000000) AS BIGINT) AS llr_fp6,
         CASE WHEN llr >= {_LN_A} THEN 'reject_h0'
              WHEN llr <= {_LN_B} THEN 'accept_h0'
              ELSE 'continue' END AS decision
  FROM scored
)
SELECT d.day, d.n_cum, d.k_cum, d.llr_fp6, d.decision,
       CAST(COALESCE((SELECT MIN(day) FROM dec WHERE decision <> 'continue'),
                     'none') AS VARCHAR) AS first_stop_day
FROM dec d
"""


@register("q_sprt_ab", oracle=_SPRT_ORACLE)
def q_sprt_ab(spark, sf_dir):
    """Wald SPRT on the daily purchase-rate stream: H0 p=0.18 vs H1 p=0.22,
    α=β=0.05 (module docstring). Per day: cumulative trials/successes, the
    fp6-floored log-likelihood ratio, the stop decision, and the first day
    the test would have stopped (the early-stopping value proposition)."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_day"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("k_day"),
    )
    # bounded cardinality: day-grid frame (calendar span, ~2.5k rows)
    w = Window.orderBy("d")
    cum = daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.sum("n_day").over(w).cast("bigint").alias("n_cum"),
        F.sum("k_day").over(w).cast("bigint").alias("k_cum"),
    )
    llr = F.col("k_cum") * F.lit(float(_C1)) + (
        F.col("n_cum") - F.col("k_cum")
    ) * F.lit(float(_C2))
    dec = cum.select(
        "day",
        "n_cum",
        "k_cum",
        F.floor(llr * 1_000_000).cast("bigint").alias("llr_fp6"),
        F.when(llr >= float(_LN_A), "reject_h0")
        .when(llr <= float(_LN_B), "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    )
    stop = dec.filter(F.col("decision") != "continue").agg(
        F.min("day").alias("first_stop_day")
    )
    return dec.crossJoin(F.broadcast(stop)).select(
        "day",
        "n_cum",
        "k_cum",
        "llr_fp6",
        "decision",
        F.coalesce("first_stop_day", F.lit("none")).alias("first_stop_day"),
    )


# --- TOST equivalence ------------------------------------------------------

_Z_CRIT = repr(1.6448536269514722)  # one-sided z at alpha = 0.05
_DELTA_CENTS = 2000  # +/- 20.00 equivalence margin on mean purchase value

_TOST_ORACLE = f"""
WITH x AS (
  SELECT user_id % 2 AS arm, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
s AS (
  SELECT arm,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS DECIMAL(38, 0)) AS s1,
         CAST(SUM(CAST(cents AS DECIMAL(38, 0)) * cents) AS DECIMAL(38, 0)) AS s2
  FROM x GROUP BY arm
),
m AS (
  SELECT
    (SELECT n FROM s WHERE arm = 0) AS n_a,
    (SELECT n FROM s WHERE arm = 1) AS n_b,
    (SELECT CAST(s1 AS DOUBLE) / n FROM s WHERE arm = 0) AS mean_a,
    (SELECT CAST(s1 AS DOUBLE) / n FROM s WHERE arm = 1) AS mean_b,
    (SELECT (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
            / (n - 1) FROM s WHERE arm = 0) AS var_a,
    (SELECT (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
            / (n - 1) FROM s WHERE arm = 1) AS var_b
),
t AS (
  SELECT n_a, n_b,
         mean_b - mean_a AS diff,
         sqrt(var_a / n_a + var_b / n_b) AS se
  FROM m
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(floor(diff * 1000000) AS BIGINT) AS mean_diff_cents_fp6,
       CAST(floor(se * 1000000) AS BIGINT) AS se_cents_fp6,
       CAST(floor((diff + {_DELTA_CENTS}) / se * 1000000) AS BIGINT)
         AS t_lower_fp6,
       CAST(floor((diff - {_DELTA_CENTS}) / se * 1000000) AS BIGINT)
         AS t_upper_fp6,
       CAST(CASE WHEN (diff + {_DELTA_CENTS}) / se >= {_Z_CRIT}
                  AND (diff - {_DELTA_CENTS}) / se <= -{_Z_CRIT}
                 THEN 1 ELSE 0 END AS BIGINT) AS equivalent
FROM t
"""


@register("q_tost_equivalence", oracle=_TOST_ORACLE)
def q_tost_equivalence(spark, sf_dir):
    """TOST equivalence on mean purchase value between arms (user % 2):
    equivalent iff BOTH one-sided z-tests reject at the ±20.00 margin —
    the guardrail-metric demonstration a launch review asks for. Sums and
    squared sums accumulate in DECIMAL(38,0) cents (order-independent
    exactness); the two t statistics derive from those scalars with
    identical double arithmetic in both engines."""
    e = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    x = e.select(
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    s = x.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("cents")).alias("s2"),
    )
    a = s.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"),
        (F.col("s1").cast("double") / F.col("n")).alias("mean_a"),
        (
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("var_a"),
    )
    b = s.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"),
        (F.col("s1").cast("double") / F.col("n")).alias("mean_b"),
        (
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
            )
            / (F.col("n") - 1)
        ).alias("var_b"),
    )
    j = a.crossJoin(F.broadcast(b))
    diff = F.col("mean_b") - F.col("mean_a")
    se = F.sqrt(F.col("var_a") / F.col("n_a") + F.col("var_b") / F.col("n_b"))
    t_lo = (diff + _DELTA_CENTS) / se
    t_hi = (diff - _DELTA_CENTS) / se
    return j.select(
        "n_a",
        "n_b",
        F.floor(diff * 1_000_000).cast("bigint").alias("mean_diff_cents_fp6"),
        F.floor(se * 1_000_000).cast("bigint").alias("se_cents_fp6"),
        F.floor(t_lo * 1_000_000).cast("bigint").alias("t_lower_fp6"),
        F.floor(t_hi * 1_000_000).cast("bigint").alias("t_upper_fp6"),
        F.when((t_lo >= float(_Z_CRIT)) & (t_hi <= -float(_Z_CRIT)), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("equivalent"),
    )


# --- deterministic permutation test ----------------------------------------

_N_PERM = 16  # md5 first-16-hex bits → 16 sign-flip replicates in one pass


def _perm_bit_duck(r: int) -> str:
    # bit r of the user's md5: hex digit r, low bit
    return (
        f"(strpos('0123456789abcdef', substr(md5('perm:' || CAST(user_id AS VARCHAR)), {r + 1}, 1)) - 1) % 2"
    )


def _perm_bit_spark(r: int) -> str:
    return (
        f"(locate(substring(md5(concat('perm:', cast(user_id as string))), {r + 1}, 1), '0123456789abcdef') - 1) % 2"
    )


def _perm_oracle() -> str:
    per_rep = []
    for r in range(_N_PERM):
        per_rep.append(
            f"CAST(SUM(CASE WHEN {_perm_bit_duck(r)} = 0 THEN cents ELSE 0 END) AS BIGINT) AS sa{r},\n"
            f"CAST(SUM(CASE WHEN {_perm_bit_duck(r)} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na{r},\n"
            f"CAST(SUM(CASE WHEN {_perm_bit_duck(r)} = 1 THEN cents ELSE 0 END) AS BIGINT) AS sb{r},\n"
            f"CAST(SUM(CASE WHEN {_perm_bit_duck(r)} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb{r}"
        )
    reps = ",\n".join(per_rep)
    # |diff_r| >= |diff_obs| via EXACT cross-multiplication (ADVICE r07 #1):
    # the products leave BIGINT range, so DuckDB evaluates them in HUGEINT
    # (128-bit, exact to ~1.7e38) while the Spark side uses DECIMAL(38,0)
    # (exact-or-null at the same 38-digit width) — integer-exact boundary
    # decisions in both engines, no doubles anywhere in the comparison.
    hits = " + ".join(
        f"CASE WHEN abs((CAST(sa{r} AS HUGEINT) * nb{r} - CAST(sb{r} AS HUGEINT) * na{r}) * (CAST(nao AS HUGEINT) * nbo))"
        f" >= abs((CAST(sao AS HUGEINT) * nbo - CAST(sbo AS HUGEINT) * nao) * (CAST(na{r} AS HUGEINT) * nb{r}))"
        " THEN 1 ELSE 0 END"
        for r in range(_N_PERM)
    )
    return f"""
WITH x AS (
  SELECT user_id, user_id % 2 AS arm,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS DECIMAL(38,0)) AS sao,
    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS nao,
    CAST(SUM(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS DECIMAL(38,0)) AS sbo,
    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS DECIMAL(38,0)) AS nbo,
    {reps}
  FROM x
)
SELECT CAST(nao AS BIGINT) AS n_a, CAST(nbo AS BIGINT) AS n_b,
       CAST(sao AS BIGINT) AS sum_a_cents, CAST(sbo AS BIGINT) AS sum_b_cents,
       CAST({hits} AS BIGINT) AS n_extreme,
       CAST({_N_PERM} AS BIGINT) AS n_replicates
FROM agg
"""


@register("q_permutation_test_ab", oracle=_perm_oracle())
def q_permutation_test_ab(spark, sf_dir):
    """Deterministic permutation test for the arm difference in mean
    purchase value: replicate r reassigns every user by bit r of
    md5('perm:'||user), all {n} replicates accumulate as conditional sums
    in ONE scan, and |Δmean_r| >= |Δmean_obs| is decided by DECIMAL(38,0)
    cross-multiplication (no division, no doubles, hash-exact). The
    permutation p-value is n_extreme / n_replicates.""".format(n=_N_PERM)
    e = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    x = e.select(
        "user_id",
        (F.col("user_id") % 2).alias("arm"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    aggs = [
        F.sum(F.when(F.col("arm") == 0, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("sao"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).cast("bigint").alias("nao"),
        F.sum(F.when(F.col("arm") == 1, F.col("cents")).otherwise(0))
        .cast("bigint")
        .alias("sbo"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).cast("bigint").alias("nbo"),
    ]
    for r in range(_N_PERM):
        bit = F.expr(_perm_bit_spark(r))
        aggs += [
            F.sum(F.when(bit == 0, F.col("cents")).otherwise(0)).cast("bigint").alias(f"sa{r}"),
            F.sum(F.when(bit == 0, 1).otherwise(0)).cast("bigint").alias(f"na{r}"),
            F.sum(F.when(bit == 1, F.col("cents")).otherwise(0)).cast("bigint").alias(f"sb{r}"),
            F.sum(F.when(bit == 1, 1).otherwise(0)).cast("bigint").alias(f"nb{r}"),
        ]
    agg = x.agg(*aggs)

    def _d(c):
        # DECIMAL(38,0) arithmetic: Spark computes decimal products exactly
        # in BigDecimal and only overflow-checks at 38 digits (scale stays 0,
        # so allowPrecisionLoss never rounds) — exact-or-null, mirroring the
        # oracle's HUGEINT. Both engines agree bit-for-bit while
        # |Δ_cents| · n_a · n_b < 1e38 (≫ any reachable corpus).
        return F.col(c).cast("decimal(38,0)")

    hit_terms = None
    for r in range(_N_PERM):
        c = F.when(
            F.abs(
                (_d(f"sa{r}") * F.col(f"nb{r}") - _d(f"sb{r}") * F.col(f"na{r}"))
                * (_d("nao") * F.col("nbo"))
            )
            >= F.abs(
                (_d("sao") * F.col("nbo") - _d("sbo") * F.col("nao"))
                * (_d(f"na{r}") * F.col(f"nb{r}"))
            ),
            1,
        ).otherwise(0)
        hit_terms = c if hit_terms is None else hit_terms + c
    return agg.select(
        F.col("nao").cast("bigint").alias("n_a"),
        F.col("nbo").cast("bigint").alias("n_b"),
        F.col("sao").cast("bigint").alias("sum_a_cents"),
        F.col("sbo").cast("bigint").alias("sum_b_cents"),
        hit_terms.cast("bigint").alias("n_extreme"),
        F.lit(_N_PERM).cast("bigint").alias("n_replicates"),
    )
