"""grouped_quantiles operator: sketch default vs exact opt-in, no type-hint
warning from the applyInPandas path."""

from __future__ import annotations

import warnings

import pytest

from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.operators.quantiles import grouped_quantiles


def _df(spark):
    rows = [("a", float(v)) for v in range(1, 101)] + [("b", float(v)) for v in range(1, 11)]
    return spark.createDataFrame(rows, ["k", "v"])


def test_exact_matches_numpy(spark):
    import numpy as np

    got = {
        r.k: (r.q25, r.median, r.q75, r.n)
        for r in grouped_quantiles(
            _df(spark), ["k"], "v", [0.25, 0.5, 0.75],
            out_cols=["q25", "median", "q75"], exact=True,
        ).collect()
    }
    a = np.percentile(np.arange(1.0, 101.0), [25, 50, 75])
    assert got["a"] == (a[0], a[1], a[2], 100)
    assert got["b"][3] == 10


def test_sketch_default_close_to_exact(spark):
    got = {
        r.k: (r.q50, r.n)
        for r in grouped_quantiles(_df(spark), ["k"], "v", [0.5]).collect()
    }
    # GK with accuracy 10000 on 100 values is exact up to rank rounding
    assert abs(got["a"][0] - 50.0) <= 1.0
    assert got["a"][1] == 100


def test_exact_path_emits_no_type_hint_warning(spark):
    with warnings.catch_warnings():
        warnings.simplefilter("error", UserWarning)
        grouped_quantiles(
            _df(spark), ["k"], "v", [0.5], out_cols=["m"], exact=True
        ).collect()


def test_exact_path_skips_nulls_like_sketch_path(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0), ("b", None)], "k string, v double"
    )
    exact = {
        r.k: (r.q50, r.n)
        for r in grouped_quantiles(df, ["k"], "v", [0.5], exact=True).collect()
    }
    # NULLs skipped (not NaN-propagated); n still counts every row
    assert exact["a"] == (2.0, 3)
    assert exact["b"][0] is None and exact["b"][1] == 1
    sketch = {
        r.k: r.q50 for r in grouped_quantiles(df, ["k"], "v", [0.5]).collect()
    }
    assert sketch["a"] is not None and sketch["b"] is None


def test_default_names_carry_full_probability():
    from arc_maskdata_pipeline_plugin_spark.operators.quantiles import _default_name

    assert _default_name(0.5) == "q50"
    assert _default_name(0.975) == "q97_5"
    assert _default_name(0.97) == "q97"


def test_duplicate_out_cols_raise(spark):
    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="duplicate"):
        grouped_quantiles(df, ["k"], "v", [0.5, 0.5])
