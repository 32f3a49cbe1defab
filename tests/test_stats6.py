"""Round-12 statistics (plans/stats6.py): two-sample Cramér-von Mises
against a pure-Python midrank reference (shifted vs identical
distributions, heavy ties), and the delete-one-day jackknife against a
direct reference (outlier-day influence, single-day degenerate)."""

from __future__ import annotations

from datetime import datetime, timedelta

import arc_maskdata_pipeline_plugin_spark.plans.stats6 as s6

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(a_vals, b_vals, a_type="purchase", b_type="view"):
    rows, eid = [], 0
    for et, vals in ((a_type, a_vals), (b_type, b_vals)):
        for i, v in enumerate(vals):
            rows.append(
                (eid, datetime(2024, 1, 1) + timedelta(days=i % 10), 1, et,
                 float(v), "{}")
            )
            eid += 1
    return rows


def _run(spark, rows, fn):
    orig = s6.T
    try:
        s6.T = lambda sp, sf, name: sp.createDataFrame(rows, EV_SCHEMA)
        return fn(spark, "x").collect()
    finally:
        s6.T = orig


def _ref_cvm(xs, ys):
    """Pure-Python midrank CvM: per-observation doubled midranks."""
    import bisect

    pooled = sorted(xs + ys)
    n, m = len(xs), len(ys)

    def mr2(v):
        lo = bisect.bisect_left(pooled, v)
        hi = bisect.bisect_right(pooled, v)
        return 2 * (lo + 1) + (hi - lo) - 1

    u2 = n * sum(
        (mr2(v) - 2 * (i + 1)) ** 2 for i, v in enumerate(sorted(xs))
    ) + m * sum(
        (mr2(v) - 2 * (j + 1)) ** 2 for j, v in enumerate(sorted(ys))
    )
    t_num = 3 * u2 - 2 * n * m * (4 * n * m - 1)
    t_den = 12 * n * m * (n + m)
    q = abs(t_num) * 10**6 // t_den
    t_fp6 = q if t_num >= 0 else -q
    return t_fp6, 1 if 1000 * t_num > 461 * t_den else 0


def test_cvm_matches_reference_shifted_and_identical(spark):
    # identical discrete distributions (heavy ties) -> no shift
    xs = [float(i % 7) for i in range(140)]
    ys = [float(i % 7) for i in range(140)]
    row = _run(spark, _events(xs, ys), s6.q_cramer_von_mises)[0]
    want_t, want_sig = _ref_cvm([round(x, 6) for x in xs],
                                [round(y, 6) for y in ys])
    assert (row["cvm_t_fp6"], row["shift_detected"]) == (want_t, want_sig)
    assert row["shift_detected"] == 0
    # location-shifted -> detected
    ys2 = [v + 2.5 for v in ys]
    row2 = _run(spark, _events(xs, ys2), s6.q_cramer_von_mises)[0]
    want_t2, want_sig2 = _ref_cvm(xs, ys2)
    assert (row2["cvm_t_fp6"], row2["shift_detected"]) == (want_t2, want_sig2)
    assert row2["shift_detected"] == 1
    assert row2["cvm_t_fp6"] > row["cvm_t_fp6"]


def test_cvm_broad_mid_shift(spark):
    # variance-only difference (same median): CvM integrates the whole
    # ECDF gap — the case it exists for
    xs = [float(v) for v in range(-50, 51)]            # wide
    ys = [float(v) // 5 for v in range(-50, 51)]       # narrow
    row = _run(spark, _events(xs, ys), s6.q_cramer_von_mises)[0]
    want_t, want_sig = _ref_cvm(xs, [float(v) // 5 for v in range(-50, 51)])
    assert row["cvm_t_fp6"] == want_t
    assert row["shift_detected"] == want_sig
    assert row["n_a"] == row["n_b"] == 101


def test_cvm_empty_inputs(spark):
    assert _run(spark, [], s6.q_cramer_von_mises) == []
    # one side empty: T undefined -> no output row, not a crash
    assert _run(spark, _events([1.0, 2.0], []), s6.q_cramer_von_mises) == []


def _jk_events(series):
    """series: {event_type: {day: [values]}}"""
    rows, eid = [], 0
    for et, days in series.items():
        for d, vals in days.items():
            for v in vals:
                rows.append(
                    (eid, datetime(2024, 1, 1) + timedelta(days=d), 1, et,
                     float(v), "{}")
                )
                eid += 1
    return rows


def _ref_jk(days):
    cents = {d: sum(round(v * 100) for v in vs) for d, vs in days.items()}
    cnt = {d: len(vs) for d, vs in days.items()}
    s, c, g = sum(cents.values()), sum(cnt.values()), len(days)
    thetas = [
        (s - cents[d]) * 10**6 // (c - cnt[d])
        for d in days
        if c - cnt[d] > 0
    ]
    gv = len(thetas)
    theta_all = s * 10**6 // c
    if gv >= 2:
        var = (gv - 1) * (gv * sum(t * t for t in thetas)
                          - sum(thetas) ** 2) // (gv * gv)
    else:
        var = -1
    infl = max((abs(t - theta_all) for t in thetas), default=0)
    return g, gv, theta_all, var, infl


def test_jackknife_matches_reference(spark):
    series = {
        "purchase": {d: [10.0 + d, 20.0 + 2 * d] for d in range(8)},
        "view": {0: [5.0], 1: [5.5, 6.5], 2: [100.0]},  # day-2 outlier
    }
    got = {
        r["event_type"]: r
        for r in _run(spark, _jk_events(series), s6.q_jackknife_ratio_se)
    }
    for et in series:
        g, gv, theta, var, infl = _ref_jk(series[et])
        r = got[et]
        assert (r["g"], r["g_valid"]) == (g, gv)
        assert r["theta_all_fp6"] == theta
        assert r["jk_var_fp12"] == var
        assert r["influence_max_fp6"] == infl
    # outlier day dominates the view influence
    assert got["view"]["influence_max_fp6"] > got["purchase"]["influence_max_fp6"]


def test_jackknife_single_day_reports_sentinel(spark):
    series = {"purchase": {0: [10.0, 12.0]}}
    got = _run(spark, _jk_events(series), s6.q_jackknife_ratio_se)
    # the only day's complement is empty -> no valid delete-day estimates
    # -> the type drops out entirely (matches the oracle's inner join)
    assert got == []
    assert _run(spark, [], s6.q_jackknife_ratio_se) == []


def _ref_w1(xs, ys):
    """∫|F_A − F_B|dx via the pooled distinct-value decomposition."""
    import itertools

    vs = sorted(set(xs) | set(ys))
    n, m = len(xs), len(ys)
    w1 = 0
    for pv, v in itertools.pairwise(vs):
        ca = sum(1 for x in xs if x <= pv)
        cb = sum(1 for y in ys if y <= pv)
        w1 += abs(ca * m - cb * n) * round((v - pv) * 10**6)
    return w1 // (n * m)


def test_wasserstein_matches_reference(spark):
    xs = [float(v) for v in (1, 2, 2, 3, 5, 8, 13)]
    ys = [float(v) for v in (2, 3, 3, 4, 6, 9, 21)]
    row = _run(spark, _events(xs, ys), s6.q_wasserstein_drift)[0]
    assert row["w1_fp6"] == _ref_w1(xs, ys)
    # identical distributions -> 0
    row0 = _run(spark, _events(xs, list(xs)), s6.q_wasserstein_drift)[0]
    assert row0["w1_fp6"] == 0
    # pure location shift by delta with identical shapes -> W1 == delta
    delta = 2.5
    ys2 = [x + delta for x in xs]
    row2 = _run(spark, _events(xs, ys2), s6.q_wasserstein_drift)[0]
    assert row2["w1_fp6"] == round(delta * 10**6)


def test_wasserstein_magnitude_awareness(spark):
    # same KS distance (one point moved), very different W1: the moved
    # point travels 1 vs 100 units
    xs = [0.0] * 10
    near = [0.0] * 9 + [1.0]
    far = [0.0] * 9 + [100.0]
    w_near = _run(spark, _events(xs, near), s6.q_wasserstein_drift)[0]
    w_far = _run(spark, _events(xs, far), s6.q_wasserstein_drift)[0]
    assert w_far["w1_fp6"] == 100 * w_near["w1_fp6"]
    assert w_near["w1_fp6"] == _ref_w1(xs, near)


def test_wasserstein_empty(spark):
    assert _run(spark, [], s6.q_wasserstein_drift) == []
    assert _run(spark, _events([1.0], []), s6.q_wasserstein_drift) == []
