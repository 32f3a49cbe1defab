"""Linear gap-fill: hand-computed interpolation on a synthetic series."""

from __future__ import annotations

import datetime

from arc_maskdata_pipeline_plugin_spark.plans import timeseries as ts_mod


def test_interpolation_hand_example(spark, monkeypatch):
    """Series observed at hours 0 (v=10) and 3 (v=40) must interpolate 20, 30
    at hours 1, 2 — and a multi-observation hour must average exactly."""

    def mk(h, v):
        return (1000 + h, datetime.datetime(2024, 1, 1, h), 1, "a", v, "{}")

    rows = [mk(0, 10.0), mk(3, 40.0), mk(5, 5.0), mk(5, 10.0)]
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    monkeypatch.setattr(ts_mod, "T", lambda s, d, n: events)

    got = {
        r["hour"][11:13]: (r["src"], r["val_fp6"])
        for r in ts_mod.q_gap_fill_interpolate(spark, "unused").collect()
    }
    assert got["00"] == ("observed", 10_000_000)
    assert got["01"] == ("interpolated", 20_000_000)
    assert got["02"] == ("interpolated", 30_000_000)
    assert got["03"] == ("observed", 40_000_000)
    # hour 4 interpolates between 40 (h3) and avg(5,10)=7.5 (h5): 23.75
    assert got["04"] == ("interpolated", 23_750_000)
    assert got["05"] == ("observed", 7_500_000)
    assert len(got) == 6


def test_grid_is_dense_and_edges_observed(spark, sf_small):
    out = ts_mod.q_gap_fill_interpolate(spark, sf_small)
    pdf = out.toPandas()
    for etype, g in pdf.groupby("event_type"):
        hours = sorted(g["hour"])
        # dense: every hour between first and last present exactly once
        assert len(hours) == len(set(hours))
        first, last = (
            datetime.datetime.fromisoformat(hours[0]),
            datetime.datetime.fromisoformat(hours[-1]),
        )
        assert len(hours) == int((last - first).total_seconds()) // 3600 + 1
        # the grid spans the observed range, so both edges are observations
        by_hour = dict(zip(g["hour"], g["src"]))
        assert by_hour[hours[0]] == "observed"
        assert by_hour[hours[-1]] == "observed"
