"""Round-7 operator semantics: quantile-threshold modes and friends."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_quantile_thresholds_exact_matches_manual(spark):
    """Exact mode reproduces PERCENTILE_DISC by hand on a constructed frame:
    10 rows 1..10, p=0.3 -> ceil(3) -> value 3; p=1.0 -> 10."""
    from arc_maskdata_pipeline_plugin_spark.operators.quantiles import (
        quantile_thresholds,
    )

    df = spark.range(1, 11).select(F.col("id").cast("bigint").alias("v"))
    row = quantile_thresholds(df, "v", {"p30": 0.3, "p100": 1.0}).collect()[0]
    assert row.p30 == 3 and row.p100 == 10


def test_quantile_thresholds_exact_grouped_with_ties(spark):
    """Duplicate mass counts toward the cumulative rank: group a = [1,1,1,9]
    has p50 -> ceil(2) -> 1; group b = [2,4,6,8] p50 -> 4."""
    from arc_maskdata_pipeline_plugin_spark.operators.quantiles import (
        quantile_thresholds,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("a", 9), ("b", 2), ("b", 4), ("b", 6), ("b", 8)],
        ["g", "v"],
    )
    rows = {
        r.g: r.p50
        for r in quantile_thresholds(
            df, "v", {"p50": 0.5}, group_cols=("g",)
        ).collect()
    }
    assert rows == {"a": 1, "b": 4}


def test_winsorize_approx_thresholds_near_exact(spark):
    """The GK-sketch mode's thresholds must land inside the exact
    thresholds' neighborhood (rank error <= n/accuracy; at sf0.001 n≈1.5k
    and accuracy=10k, the sketch is rank-exact, so the clipped counts may
    differ only at the boundary value)."""
    from arc_maskdata_pipeline_plugin_spark.plans.stats import (
        q_winsorize_prices,
        q_winsorize_prices_approx,
    )

    exact = q_winsorize_prices(spark, SF).collect()[0]
    approx = q_winsorize_prices_approx(spark, SF).collect()[0]
    assert exact.n == approx.n
    # thresholds within 1% of the exact rank's VALUE neighborhood
    assert abs(approx.lo_cents - exact.lo_cents) <= max(2, exact.lo_cents * 0.02)
    assert abs(approx.hi_cents - exact.hi_cents) <= max(2, exact.hi_cents * 0.02)
    # clip fractions stay in the same ballpark (±1% of n absolute)
    assert abs(approx.n_clipped_low - exact.n_clipped_low) <= exact.n * 0.01 + 2
    assert abs(approx.n_clipped_high - exact.n_clipped_high) <= exact.n * 0.01 + 2
