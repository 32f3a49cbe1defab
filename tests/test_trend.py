"""Mann-Kendall + Theil-Sen (plans/trend.py) on constructed series: exact
S / ties-corrected var18 against a pure-Python reference, verdict
direction on monotone/constant/noisy series, lower-median slope, and
empty input."""

from __future__ import annotations

from datetime import datetime, timedelta

import arc_maskdata_pipeline_plugin_spark.plans.trend as tr

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(series):
    """series: {event_type: [daily_value, ...]} — one event per day."""
    rows, eid = [], 0
    for et, vals in series.items():
        for i, v in enumerate(vals):
            rows.append(
                (eid, datetime(2024, 1, 1) + timedelta(days=i), 1, et,
                 float(v), "{}")
            )
            eid += 1
    return rows


def _ref_mk(vals):
    cents = [round(v * 100) for v in vals]
    n = len(cents)
    s = sum(
        (cents[j] > cents[i]) - (cents[j] < cents[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(cents).values() if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - ties
    slopes = sorted(
        _trunc_div((cents[j] - cents[i]) * 10**6, j - i)
        for i in range(n)
        for j in range(i + 1, n)
    )
    med = slopes[(len(slopes) + 1) // 2 - 1]
    sig = var18 > 0 and abs(s) > 1 and 180000 * (abs(s) - 1) ** 2 > 38416 * var18
    trend = ("rising" if s > 0 else "falling") if sig else "none"
    return s, var18, med, trend


def _trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _run(spark, series):
    rows = _events(series)
    orig = tr.T
    try:
        tr.T = lambda sp, sf, name: sp.createDataFrame(rows, EV_SCHEMA)
        return {
            r["event_type"]: r
            for r in tr.q_mann_kendall_trend(spark, "x").collect()
        }
    finally:
        tr.T = orig


def test_matches_reference_and_verdicts(spark):
    series = {
        "up": [float(i) for i in range(20)],           # strictly rising
        "down": [float(40 - 2 * i) for i in range(20)],  # strictly falling
        "flat": [7.0] * 15,                             # all-tied: var18=0
        "noisy": [5.0, 5.1, 4.9, 5.05, 4.95, 5.0, 5.1, 4.9],  # no trend
    }
    got = _run(spark, series)
    for et, vals in series.items():
        s, var18, med, trend = _ref_mk(vals)
        r = got[et]
        assert r["s_stat"] == s, et
        assert r["var18"] == var18, et
        assert r["slope_fp6_med"] == med, et
        assert r["trend"] == trend, et
        assert r["n_days"] == len(vals)
        assert r["n_pairs"] == len(vals) * (len(vals) - 1) // 2
    assert got["up"]["trend"] == "rising"
    assert got["down"]["trend"] == "falling"
    assert got["flat"]["trend"] == "none" and got["flat"]["var18"] == 0
    assert got["noisy"]["trend"] == "none"
    # Theil-Sen on the clean series: exact slope in fp6
    assert got["up"]["slope_fp6_med"] == 100 * 10**6  # +1.00/day in cents
    assert got["down"]["slope_fp6_med"] == -200 * 10**6


def test_two_days_minimum(spark):
    got = _run(spark, {"two": [1.0, 2.0]})
    r = got["two"]
    # S=1: |S| <= 1 can never be significant (continuity correction)
    assert r["s_stat"] == 1 and r["trend"] == "none" and r["n_pairs"] == 1


def test_empty_input(spark):
    assert _run(spark, {}) == {}


def _ref_smk(vals):
    """Seasonal MK reference: within-season (dow) comparisons, summed."""
    from collections import Counter, defaultdict

    cents = [round(v * 100) for v in vals]
    # day i -> dow of (1970-01-01 + offset). Test events start 2024-01-01
    # (a Monday); Python weekday(): Mon=0..Sun=6; DuckDB dow: Sun=0..Sat=6
    from datetime import date, timedelta

    by_season = defaultdict(list)
    for i, c in enumerate(cents):
        d = date(2024, 1, 1) + timedelta(days=i)
        dow = (d.weekday() + 1) % 7  # DuckDB convention, Sunday=0
        by_season[dow].append(c)
    s = var18 = pairs = 0
    for season_vals in by_season.values():
        n = len(season_vals)
        s += sum(
            (season_vals[j] > season_vals[i]) - (season_vals[j] < season_vals[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        pairs += n * (n - 1) // 2
        ties = sum(
            t * (t - 1) * (2 * t + 5)
            for t in Counter(season_vals).values()
            if t > 1
        )
        var18 += n * (n - 1) * (2 * n + 5) - ties
    sig = var18 > 0 and abs(s) > 1 and 180000 * (abs(s) - 1) ** 2 > 38416 * var18
    return s, var18, pairs, ("rising" if s > 0 else "falling") if sig else "none"


def _run_smk(spark, series):
    rows = _events(series)
    orig = tr.T
    try:
        tr.T = lambda sp, sf, name: sp.createDataFrame(rows, EV_SCHEMA)
        return {
            r["event_type"]: r
            for r in tr.q_seasonal_mann_kendall(spark, "x").collect()
        }
    finally:
        tr.T = orig


def test_seasonal_mk_matches_reference_and_deseasonalizes(spark):
    # strong weekly cycle + genuine upward drift: plain-MK pairs across
    # weekdays are dominated by the cycle; the seasonal test compares
    # Mondays to Mondays and must find the drift
    cyc = [100.0, 10.0, 12.0, 11.0, 13.0, 10.5, 50.0]
    rising = [cyc[i % 7] + 2.0 * (i // 7) for i in range(35)]
    flat_cycle = [cyc[i % 7] for i in range(35)]
    got = _run_smk(spark, {"rise": rising, "cycle_only": flat_cycle})
    for et, vals in [("rise", rising), ("cycle_only", flat_cycle)]:
        s, var18, pairs, trend = _ref_smk(vals)
        r = got[et]
        assert r["s_stat"] == s, et
        assert r["var18"] == var18, et
        assert r["n_pairs"] == pairs, et
        assert r["trend"] == trend, et
    assert got["rise"]["trend"] == "rising"
    # pure cycle: every within-season series is constant -> S = 0
    assert got["cycle_only"]["s_stat"] == 0
    assert got["cycle_only"]["trend"] == "none"
    assert got["rise"]["n_seasons"] == 7


def test_stream_trend_monitor_contract(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.streaming_queries as sq

    # 21 rising days x 3 events/day; event_ids interleave so every day is
    # SPLIT ACROSS the 3 staged files -> per-batch partials for one
    # (type, day) must merge exactly
    rows = []
    eid = 0
    for day in range(21):
        for _ in range(3):
            rows.append(
                (eid, datetime(2024, 1, 1) + timedelta(days=day), 1,
                 "up", 10.0 + 2.0 * day, "{}")
            )
            eid += 1
    orig = sq.T
    try:
        sq.T = lambda sp, sf, name: sp.createDataFrame(rows, EV_SCHEMA)
        got = sq.q_stream_trend_monitor(spark, "x").collect()
    finally:
        sq.T = orig
    assert len(got) == 1
    r = got[0]
    assert r["input_accounting_ok"] == 1
    assert r["multi_batch_ok"] == 1
    assert r["no_engine_state_ok"] == 1
    assert r["merge_exact_ok"] == 1 and r["n_merge_mismatch"] == 0
    # the merged store must reproduce the batch MK verdict exactly
    s, var18, med, trend = _ref_mk([30.0 + 6.0 * d for d in range(21)])
    assert r["s_stat"] == s and r["var18"] == var18
    assert r["trend"] == "rising" and r["slope_fp6_med"] == med
