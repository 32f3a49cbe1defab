"""Hamed-Rao autocorrelation-corrected Mann-Kendall (plans/trend.py):
full integer pipeline vs a pure-Python reference, and the headline
behavioral witness — an AR(1)-like (slow-oscillation) series whose weak
drift the PLAIN MK calls significant but the corrected test rejects,
beside an independent-residual series where both verdicts agree."""

from __future__ import annotations

import bisect
import math
from collections import Counter
from datetime import datetime, timedelta

import arc_maskdata_pipeline_plugin_spark.plans.trend as tr

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

_D0 = 19723  # 2024-01-01 as days since 1970-01-01 (the harness start day)


def _trunc_div(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _ref_hr(vals):
    """Independent integer reference of the whole corrected test."""
    cents = [round(v * 100) for v in vals]
    n = len(cents)
    s = sum(
        (cents[j] > cents[i]) - (cents[j] < cents[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
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
    det = [cents[i] * 10**6 - med * (_D0 + i) for i in range(n)]
    srt = sorted(det)
    dev = []
    for v in det:
        lo = bisect.bisect_left(srt, v)
        hi = bisect.bisect_right(srt, v)
        dev.append(2 * (lo + 1) + (hi - lo) - 1 - (n + 1))
    den = sum(x * x for x in dev)
    nsig, wsum = 0, 0
    for k in range(1, max(n - 2, 1)):
        num = sum(dev[i] * dev[i + k] for i in range(n - k))
        if den > 0 and num * num * 10000 * n > 38416 * den * den:
            nsig += 1
            wsum += (n - k) * (n - k - 1) * (n - k - 2) * num
    if n >= 3 and den > 0:
        dc = n * (n - 1) * (n - 2) * den
        nc = dc + 2 * wsum
    else:
        nc = dc = 1
    raw = (
        var18 > 0 and abs(s) > 1
        and 180000 * (abs(s) - 1) ** 2 > 38416 * var18
    )
    hr = (
        var18 > 0 and nc > 0 and abs(s) > 1
        and 180000 * (abs(s) - 1) ** 2 * dc > 38416 * var18 * nc
    )
    return {
        "s_stat": s,
        "var18": var18,
        "slope_fp6_med": med,
        "n_sig_lags": nsig,
        "corr_fp6": _trunc_div(nc * 10**6, dc),
        "trend_raw": ("rising" if s > 0 else "falling") if raw else "none",
        "trend_hr": ("rising" if s > 0 else "falling") if hr else "none",
    }


def _run(spark, series):
    rows, eid = [], 0
    for et, vals in series.items():
        for i, v in enumerate(vals):
            rows.append(
                (eid, datetime(2024, 1, 1) + timedelta(days=i), 1, et,
                 float(v), "{}")
            )
            eid += 1
    orig = tr.T
    try:
        tr.T = lambda sp, sf, name: sp.createDataFrame(rows, EV_SCHEMA)
        return {
            r["event_type"]: r
            for r in tr.q_hamed_rao_trend(spark, "x").collect()
        }
    finally:
        tr.T = orig


N = 40
# AR(1)-like: slow sine oscillation (strong positive rank ACF) + weak
# upward drift — the case Hamed & Rao built the correction for
AR_SERIES = [
    round(10 * math.sin(i / 6.0) + 0.7 * i + 20, 2) for i in range(N)
]
# independent-ish residuals: a mod-17 permutation + the same drift scale
IND_SERIES = [
    round(((i * 17) % N) * 0.5 + 0.5 * i + 20, 2) for i in range(N)
]


def test_matches_python_reference(spark):
    got = _run(spark, {"ar": AR_SERIES, "ind": IND_SERIES})
    for name, series in (("ar", AR_SERIES), ("ind", IND_SERIES)):
        want = _ref_hr(series)
        row = got[name]
        for k, v in want.items():
            assert row[k] == v, (name, k, row[k], v)


def test_ar1_over_rejection_is_corrected(spark):
    got = _run(spark, {"ar": AR_SERIES, "ind": IND_SERIES})
    ar, ind = got["ar"], got["ind"]
    # plain MK is fooled by the autocorrelated oscillation; HR is not
    assert ar["trend_raw"] == "rising"
    assert ar["trend_hr"] == "none"
    assert ar["n_sig_lags"] > 0
    assert ar["corr_fp6"] > 10**6  # variance inflated
    # on (near-)independent residuals the two verdicts agree
    assert ind["trend_raw"] == "rising"
    assert ind["trend_hr"] == "rising"


def test_monotone_and_constant_and_empty(spark):
    got = _run(
        spark,
        {
            "mono": [float(i) for i in range(25)],
            "const": [5.0] * 25,
        },
    )
    # strictly monotone: S = n(n-1)/2, both verdicts rising (correction
    # cannot nullify a maximal S)
    assert got["mono"]["s_stat"] == 25 * 24 // 2
    assert got["mono"]["trend_raw"] == "rising"
    assert got["mono"]["trend_hr"] == "rising"
    # constant series: var18 = 0 -> both none; den = 0 -> factor 1
    assert got["const"]["var18"] == 0
    assert got["const"]["trend_raw"] == "none"
    assert got["const"]["trend_hr"] == "none"
    assert got["const"]["corr_fp6"] == 10**6
    assert _run(spark, {}) == {}
