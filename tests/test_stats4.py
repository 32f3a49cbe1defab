"""Semantics of the stats4 family (Kruskal-Wallis, ANOVA, Spearman, BH-FDR,
Pettitt) on constructed inputs with hand-computed expected values — the
engine-parity oracle proves Spark == DuckDB; these prove both == the math.
"""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F

_BASE = datetime.datetime(2024, 1, 1, 12, 0, tzinfo=datetime.timezone.utc)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_kruskal_wallis_hand_value(spark, tmp_path):
    """Groups a=[1,2], b=[3,4]: ranks 1..4, R_a=3, R_b=7, no ties →
    H = 12/(4·5)·(9/2 + 49/2) − 3·5 = 2.4."""
    rows = [
        (0, _BASE, 1, "a", 1.0, "{}"),
        (1, _BASE, 1, "a", 2.0, "{}"),
        (2, _BASE, 1, "b", 3.0, "{}"),
        (3, _BASE, 1, "b", 4.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats4 import q_kruskal_wallis

    r = q_kruskal_wallis(spark, str(tmp_path)).collect()[0]
    assert r.k_groups == 2 and r.n == 4
    # mirror the engines' IEEE evaluation order: 12·29/20 − 15 lands one
    # ulp below 2.4, so the fp6 floor is 2399999, not 2400000
    expected = math.floor(1e6 * ((12.0 * 29.0 / (4.0 * 5.0) - 3.0 * 5.0) / 1.0))
    assert r.h_fp6 == expected
    assert abs(r.h_fp6 - 2_400_000) <= 1


def test_kruskal_wallis_all_ties_is_zero(spark, tmp_path):
    """Identical constant groups: every rank is the midrank, H = 0 (the tie
    correction must not blow up)."""
    rows = [
        (i, _BASE, 1, t, 5.0, "{}") for i, t in enumerate(["a", "a", "b", "b"])
    ]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats4 import q_kruskal_wallis

    r = q_kruskal_wallis(spark, str(tmp_path)).collect()[0]
    # ties = t^3 - t = 60 = n^3 - n → correction denominator 0 → NULL H;
    # a fully-tied corpus has no rank information. Guard: NULL, not crash.
    assert r.h_fp6 is None


def test_anova_f_hand_value(spark, tmp_path):
    """[1,2,3] vs [4,5,6]: SSB = 13.5, SSW = 4, F = 13.5/(4/4) = 13.5,
    η² = 13.5/17.5."""
    vals = [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)]
    rows = [(i, _BASE, 1, t, v, "{}") for i, (t, v) in enumerate(vals)]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats4 import q_anova_f

    r = q_anova_f(spark, str(tmp_path)).collect()[0]
    assert r.k_groups == 2 and r.n == 6
    assert r.f_fp6 == 13_500_000
    assert r.eta2_fp6 == math.floor(1e6 * 13.5 / 17.5)


def test_spearman_perfect_monotone_and_inverse(spark, tmp_path):
    """Spend strictly increasing with acctbal in nation 0 → ρ = +1;
    strictly decreasing in nation 1 → ρ = −1. A nonlinear but monotone
    map must still give exactly +1 (rank correlation, not Pearson)."""
    cust = [
        # nation 0: spend = acctbal^3 (monotone, nonlinear)
        *[(k, f"c{k}", 0, float(k), "SEG") for k in range(1, 6)],
        # nation 1: spend decreasing with acctbal
        *[(10 + k, f"d{k}", 1, float(k), "SEG") for k in range(1, 6)],
    ]
    spark.createDataFrame(
        cust, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    orders = []
    for k in range(1, 6):
        orders.append((k, k, "O", float(k**3), _BASE, "P"))  # nation 0
        orders.append((100 + k, 10 + k, "O", float(100 - k), _BASE, "P"))
    spark.createDataFrame(
        orders,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.stats4 import q_spearman_corr

    out = {r.c_nationkey: r for r in q_spearman_corr(spark, str(tmp_path)).collect()}
    assert out[0].rho_fp6 == 1_000_000
    assert out[1].rho_fp6 == -1_000_000


def test_bh_erfc_matches_normal_quantiles(spark):
    """The inlined A&S 7.1.26 two-sided p: p(0) = 1, p(1.96) ≈ 0.05,
    p(2.576) ≈ 0.01 (polynomial abs error ≤ 1.5e-7)."""
    from arc_maskdata_pipeline_plugin_spark.plans.stats4 import _erfc_col

    df = spark.createDataFrame([(0.0,), (1.959964,), (2.575829,)], ["z"])
    ps = [r.p for r in df.select(_erfc_col(F.col("z")).alias("p")).collect()]
    assert abs(ps[0] - 1.0) < 1e-6
    assert abs(ps[1] - 0.05) < 1e-5
    assert abs(ps[2] - 0.01) < 1e-5


def test_bh_stepup_rejects_prefix(spark, tmp_path):
    """BH rejections are a PREFIX of the p-ranking, every BH rejection
    satisfies p ≤ α·rank/m, and raw-significant ⊇ BH-significant (α equal,
    BH threshold is always ≤ α)."""
    # 4 metrics: two with a strong cohort shift (user_id%2 drives value),
    # two pure noise — deterministic construction, no RNG.
    rows = []
    for i in range(400):
        shift = 5.0 if i % 2 == 0 else 0.0  # user i%2 → cohort i%2
        rows.append((i, _BASE, i, "strong_a", 10.0 + (i % 7) * 0.1 + shift, "{}"))
        rows.append((i + 1000, _BASE, i, "strong_b", 5.0 + (i % 5) * 0.1 + shift, "{}"))
        rows.append((i + 2000, _BASE, i, "noise_a", 1.0 + (i % 3) * 0.1, "{}"))
        rows.append((i + 3000, _BASE, i, "noise_b", 2.0 + (i % 11) * 0.1, "{}"))
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats4 import q_bh_fdr_screen

    out = sorted(q_bh_fdr_screen(spark, str(tmp_path)).collect(), key=lambda r: r.p_rank)
    m = len(out)
    rejected = [r for r in out if r.sig_bh == 1]
    # prefix property
    assert [r.p_rank for r in rejected] == list(range(1, len(rejected) + 1))
    # the strong metrics are exactly the rejections; noise survives
    assert {r.event_type for r in rejected} == {"strong_a", "strong_b"}
    for r in out:
        if r.sig_bh:
            assert r.sig_raw == 1  # BH threshold ≤ raw α
    # boundary row satisfies the step-up inequality
    k = len(rejected)
    assert rejected[-1].p_fp9 <= 50_000_000 * k / m


def test_pettitt_finds_level_shift(spark, tmp_path):
    """10 daily means, low for days 1-5 and high for 6-10 (all distinct):
    U_t = t² − 10t, K = 25 at t=5 → changepoint day 5, p = 2e^(−150/1100)·…
    computed from the closed form."""
    rows = []
    for d in range(10):
        v = 1.0 + d * 0.5 if d < 5 else 10.0 + d * 0.5
        rows.append((d, _BASE + datetime.timedelta(days=d), 1, "x", v, "{}"))
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats4 import (
        q_pettitt_changepoint,
    )

    r = q_pettitt_changepoint(spark, str(tmp_path)).collect()[0]
    assert r.n_days == 10
    assert r.k_stat == 25
    assert r.cp_day == "2024-01-05"  # 5th day (t=5) = Jan 5
    expected_p = min(1.0, 2.0 * math.exp(-6.0 * 25 * 25 / (1000.0 + 100.0)))
    assert r.p_fp9 == math.floor(1e9 * expected_p)


def test_pettitt_constant_series_no_signal(spark, tmp_path):
    """A constant series: every U_t = 0 (midranks make Σr_i ≡ t(n+1)/2·2),
    K = 0 and p = 1 — no spurious changepoint."""
    rows = [
        (d, _BASE + datetime.timedelta(days=d), 1, "x", 3.0, "{}")
        for d in range(8)
    ]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats4 import (
        q_pettitt_changepoint,
    )

    r = q_pettitt_changepoint(spark, str(tmp_path)).collect()[0]
    assert r.k_stat == 0
    assert r.p_fp9 == 1_000_000_000


def test_nelson_aalen_hand_values(spark, tmp_path):
    """4 users from day 0: conversions at t=1, t=2; two censored at the
    day-3 horizon. H(1) = 1/4, H(2) = 1/4 + 1/3; var terms d(n−d)/n³."""
    rows = [
        (0, _BASE, 1, "view", 1.0, "{}"),
        (1, _BASE + datetime.timedelta(days=1), 1, "purchase", 1.0, "{}"),
        (2, _BASE, 2, "view", 1.0, "{}"),
        (3, _BASE + datetime.timedelta(days=2), 2, "purchase", 1.0, "{}"),
        (4, _BASE, 3, "view", 1.0, "{}"),
        (5, _BASE + datetime.timedelta(days=3), 3, "view", 1.0, "{}"),
        (6, _BASE, 4, "view", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats4 import q_nelson_aalen

    out = {r.t: r for r in q_nelson_aalen(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}
    assert out[1].n_at_risk == 4 and out[1].d == 1
    assert out[1].hazard_fp9 == 250_000_000
    assert out[1].var_fp9 == math.floor(1e9 * 3 / 64)
    assert out[2].n_at_risk == 3 and out[2].d == 1
    assert out[2].hazard_fp9 == 250_000_000 + math.floor(1e9 * 1 / 3)
    assert out[2].var_fp9 == math.floor(1e9 * 3 / 64) + math.floor(
        1e9 * (1.0 * 2) / 27.0
    )


def test_acf_weekly_pattern_peaks_at_lag7(spark, tmp_path):
    """An exact period-7 daily-count pattern over 3 weeks: acf(7) = 1
    (every lag-7 pair matches identically); shorter lags are strictly
    smaller."""
    pattern = [1, 2, 3, 4, 3, 2, 1]
    rows = []
    eid = 0
    for d in range(21):
        for _ in range(pattern[d % 7]):
            rows.append(
                (eid, _BASE + datetime.timedelta(days=d), 1, "x", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats4 import q_acf_daily

    out = {r.lag: r for r in q_acf_daily(spark, str(tmp_path)).collect()}
    assert out[7].n_pairs == 14 and out[7].n_days == 21
    assert out[7].acf_fp6 >= 999_999  # exactly 1 up to the fp6 floor
    for lag in range(1, 7):
        assert out[lag].acf_fp6 < out[7].acf_fp6
