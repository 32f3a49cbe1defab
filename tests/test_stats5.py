"""Semantics of the sequential/equivalence/permutation tests on
constructed event streams."""

from __future__ import annotations

import datetime
import math


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _day(d):
    return datetime.datetime(2024, 1, d, 12, 0, tzinfo=datetime.timezone.utc)


def test_sprt_rejects_h0_on_high_conversion(spark, tmp_path):
    """60% purchases per day for 10 days: the LLR must climb and cross the
    reject boundary; the first stop day must match the hand-computed Wald
    crossing and llr_fp6 must equal the Python arithmetic exactly."""
    from arc_maskdata_pipeline_plugin_spark.plans.stats5 import (
        _C1,
        _C2,
        _LN_A,
        q_sprt_ab,
    )

    rows = []
    eid = 0
    for d in range(1, 11):
        for i in range(10):
            etype = "purchase" if i < 6 else "view"
            rows.append((eid, _day(d), i, etype, 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = sorted(q_sprt_ab(spark, str(tmp_path)).collect(), key=lambda r: r.day)
    c1, c2, ln_a = float(_C1), float(_C2), float(_LN_A)
    expect_stop = None
    for i, r in enumerate(out, start=1):
        n, k = 10 * i, 6 * i
        assert (r.n_cum, r.k_cum) == (n, k)
        llr = k * c1 + (n - k) * c2
        assert r.llr_fp6 == math.floor(llr * 1_000_000)
        if llr >= ln_a and expect_stop is None:
            expect_stop = r.day
        assert r.decision == ("reject_h0" if llr >= ln_a else "continue")
    assert expect_stop is not None
    assert all(r.first_stop_day == expect_stop for r in out)


def test_sprt_continue_when_rate_between_hypotheses(spark, tmp_path):
    """Exactly 20% purchases (between p0=0.18 and p1=0.22) on a short
    stream: no boundary is crossed, first_stop_day = 'none'."""
    from arc_maskdata_pipeline_plugin_spark.plans.stats5 import q_sprt_ab

    rows = []
    eid = 0
    for d in range(1, 4):
        for i in range(10):
            etype = "purchase" if i < 2 else "view"
            rows.append((eid, _day(d), i, etype, 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = q_sprt_ab(spark, str(tmp_path)).collect()
    assert all(r.decision == "continue" for r in out)
    assert all(r.first_stop_day == "none" for r in out)


def test_tost_identical_arms_equivalent(spark, tmp_path):
    """Both arms drawn from the same tight value set → |t_lower| and
    |t_upper| both far beyond z=1.645 → equivalent = 1; and the computed
    diff is exactly 0."""
    from arc_maskdata_pipeline_plugin_spark.plans.stats5 import q_tost_equivalence

    rows = []
    eid = 0
    for u in range(40):
        v = 50.0 + (u % 5)  # same distribution in both arms (u%2 alternates)
        rows.append((eid, _day(1 + u % 20), u, "purchase", v, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    r = q_tost_equivalence(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b) == (20, 20)
    assert r.mean_diff_cents_fp6 == 0
    assert r.equivalent == 1


def test_tost_large_gap_not_equivalent(spark, tmp_path):
    """Arm means 40.00 apart (margin is 20.00) → not equivalent."""
    from arc_maskdata_pipeline_plugin_spark.plans.stats5 import q_tost_equivalence

    rows = []
    eid = 0
    for u in range(40):
        v = 50.0 + (u % 5) + (40.0 if u % 2 else 0.0)
        rows.append((eid, _day(1 + u % 20), u, "purchase", v, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    r = q_tost_equivalence(spark, str(tmp_path)).collect()[0]
    assert r.equivalent == 0


def test_permutation_no_effect_high_pvalue(spark, tmp_path):
    """Identical arm distributions: most sign-flip replicates produce a
    |difference| at least as large as the observed (near-zero) one —
    permutation p-value must be large (> 0.5)."""
    from arc_maskdata_pipeline_plugin_spark.plans.stats5 import (
        q_permutation_test_ab,
    )

    rows = []
    eid = 0
    for u in range(60):
        rows.append((eid, _day(1 + u % 20), u, "purchase", 50.0 + (u % 7), "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    r = q_permutation_test_ab(spark, str(tmp_path)).collect()[0]
    assert r.n_replicates == 16
    assert r.n_extreme / r.n_replicates > 0.5


def test_permutation_strong_effect_low_pvalue(spark, tmp_path):
    """Arm 1 values 10x arm 0: almost no random reassignment reaches the
    observed gap — n_extreme must be small (p <= 2/16)."""
    from arc_maskdata_pipeline_plugin_spark.plans.stats5 import (
        q_permutation_test_ab,
    )

    rows = []
    eid = 0
    for u in range(60):
        v = 500.0 if u % 2 else 50.0
        rows.append((eid, _day(1 + u % 20), u, "purchase", v, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    r = q_permutation_test_ab(spark, str(tmp_path)).collect()[0]
    assert r.n_extreme <= 2
