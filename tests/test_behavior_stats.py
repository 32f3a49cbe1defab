"""Behavioral analytics + feature stats: semantic checks beyond the oracle."""

from __future__ import annotations

import datetime

import pytest

from arc_maskdata_pipeline_plugin_spark.plans import behavior as bh
from arc_maskdata_pipeline_plugin_spark.plans import stats as st


def _events(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )


def test_funnel_requires_strict_order(spark, monkeypatch):
    t = lambda h: datetime.datetime(2024, 1, 1, h)  # noqa: E731
    rows = [
        # user 1: full ordered funnel
        (1, t(1), 1, "view", 0.0, "{}"),
        (2, t(2), 1, "click", 0.0, "{}"),
        (3, t(3), 1, "purchase", 0.0, "{}"),
        # user 2: purchase BEFORE click -> reaches stage 2 only
        (4, t(1), 2, "view", 0.0, "{}"),
        (5, t(3), 2, "click", 0.0, "{}"),
        (6, t(2), 2, "purchase", 0.0, "{}"),
        # user 3: no view -> not in the funnel at all
        (7, t(1), 3, "click", 0.0, "{}"),
        (8, t(2), 3, "purchase", 0.0, "{}"),
    ]
    monkeypatch.setattr(bh, "T", lambda s, d, n: _events(spark, rows))
    got = {r["stage"]: r["n_users"] for r in bh.q_funnel_conversion(spark, "x").collect()}
    assert got == {"view": 2, "view>click": 2, "view>click>purchase": 1}


def test_cohort_retention_offsets(spark, monkeypatch):
    mon = datetime.datetime(2024, 1, 1)  # a Monday
    rows = [
        (1, mon, 1, "view", 0.0, "{}"),
        (2, mon + datetime.timedelta(days=7), 1, "view", 0.0, "{}"),
        (3, mon + datetime.timedelta(days=21), 1, "view", 0.0, "{}"),
        (4, mon + datetime.timedelta(days=7), 2, "view", 0.0, "{}"),
    ]
    monkeypatch.setattr(bh, "T", lambda s, d, n: _events(spark, rows))
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in bh.q_cohort_retention(spark, "x").collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,
    }


def test_correlation_bounds_and_known_signal(spark, sf_medium):
    rows = {r["pair"]: r["corr_fp6"] for r in st.q_feature_correlation(spark, sf_medium).collect()}
    assert set(rows) == {
        "quantity~extendedprice",
        "quantity~discount",
        "extendedprice~discount",
    }
    for v in rows.values():
        assert -1_000_000 <= v <= 1_000_000


def test_correlation_perfect_and_zero(spark, monkeypatch):
    """y = 2x must correlate at exactly 1.0 (fp6 floor -> 1_000_000 or
    999_999); a constant-free orthogonal pattern lands near zero."""
    rows = [(float(i), float(2 * i), float((-1) ** i)) for i in range(1, 101)]
    li = spark.createDataFrame(rows, ["l_quantity", "l_extendedprice", "l_discount"])
    monkeypatch.setattr(st, "T", lambda s, d, n: li)
    got = {r["pair"]: r["corr_fp6"] for r in st.q_feature_correlation(spark, "x").collect()}
    assert got["quantity~extendedprice"] in (999_999, 1_000_000)
    assert abs(got["quantity~discount"]) < 50_000


def test_histogram_counts_and_clamp(spark, sf_small):
    out = st.q_value_histogram(spark, sf_small).collect()
    assert all(0 <= r["bucket"] <= 19 for r in out)
    from arc_maskdata_pipeline_plugin_spark.plans.registry import T

    total = T(spark, sf_small, "events").count()
    assert sum(r["n_events"] for r in out) == total


def test_winsorize_clips_about_one_percent_each_side(spark, sf_medium):
    r = st.q_winsorize_prices(spark, sf_medium).collect()[0]
    assert r["lo_cents"] < r["hi_cents"]
    # ceil-rank thresholds clip at most ~1% per tail (never more than the
    # rank definition allows, never zero on 15k continuous-ish prices)
    assert 0 < r["n_clipped_low"] <= r["n"] * 0.01 + 1
    assert 0 < r["n_clipped_high"] <= r["n"] * 0.01 + 1


def test_incremental_rollup_equals_full_recompute(spark, sf_small):
    from pyspark.sql import functions as F

    from arc_maskdata_pipeline_plugin_spark.plans.registry import T, dec
    from arc_maskdata_pipeline_plugin_spark.plans.timeseries import (
        q_incremental_rollup,
    )

    inc = {
        r["month"]: (r["n_orders"], r["revenue"])
        for r in q_incremental_rollup(spark, sf_small).collect()
    }
    full = {
        r["month"]: (r["n_orders"], r["revenue"])
        for r in T(spark, sf_small, "orders")
        .groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("revenue"),
        )
        .collect()
    }
    assert inc == full


def test_cms_estimate_is_one_sided(spark, sf_medium):
    """The count-min guarantee: est >= true for every key, and with 4x256
    cells over ~500 users most top keys should estimate exactly."""
    rows = st.q_heavy_hitters_cms(spark, sf_medium).collect()
    assert len(rows) == 20
    assert all(r["cms_est"] >= r["true_n"] for r in rows)
    exact = sum(1 for r in rows if r["cms_est"] == r["true_n"])
    assert exact >= 10
