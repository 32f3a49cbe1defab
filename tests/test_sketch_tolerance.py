"""Numeric tolerance checks on the raw sketch ESTIMATE frames.

The registered sketch queries became hash-oracled audits in r08 (exact
integers + Spark-side verdicts); the estimates themselves are pinned here
against DuckDB's exact answers through the same TOLERANCE_ORACLES specs the
local sweep used when the registered queries were rows-only — nothing got
weaker, the numeric layer just moved from the sweep into pytest."""

from __future__ import annotations

import pytest

from tools.oracle_check import TOLERANCE_ORACLES, compare_tolerance

SF = "/root/testdata/sf0.001"


def _frame(spark, name):
    if name == "q_approx_distinct_users_estimates":
        from arc_maskdata_pipeline_plugin_spark.plans.relational3 import (
            q_approx_distinct_users_estimates as fn,
        )
    elif name == "q_approx_quantiles_estimates":
        from arc_maskdata_pipeline_plugin_spark.plans.relational4 import (
            q_approx_quantiles_estimates as fn,
        )
    elif name == "q_hll_merge_daily_estimates":
        from arc_maskdata_pipeline_plugin_spark.plans.stats2 import (
            q_hll_merge_daily_estimates as fn,
        )
    else:
        from arc_maskdata_pipeline_plugin_spark.plans.stats2 import (
            q_hll_audience_overlap_estimates as fn,
        )
    return fn(spark, SF)


@pytest.mark.parametrize("name", sorted(TOLERANCE_ORACLES))
def test_sketch_estimates_within_tolerance(name, spark):
    spec = TOLERANCE_ORACLES[name]
    spdf = _frame(spark, name).toPandas()
    # the quantiles spec expects an `n` column in the estimate frame
    res = compare_tolerance(name, spdf, spec, SF)
    assert res["status"] == "TOLERANCE-MATCH", res


def test_registered_audit_verdicts_all_pass(spark):
    """The hash-oracled audit wrappers must emit all-1 verdicts on real
    data (the oracle pins them to 1 — this is the same assertion the
    driver gate makes, kept here for fast local signal)."""
    from arc_maskdata_pipeline_plugin_spark.plans.relational3 import (
        q_approx_distinct_users,
    )
    from arc_maskdata_pipeline_plugin_spark.plans.relational4 import (
        q_approx_quantiles,
    )
    from arc_maskdata_pipeline_plugin_spark.plans.stats2 import (
        q_hll_audience_overlap,
        q_hll_merge_daily,
    )

    for r in q_approx_distinct_users(spark, SF).collect():
        assert r.within_budget == 1, r
    for r in q_hll_merge_daily(spark, SF).collect():
        assert r.direct_within_budget == 1 and r.merged_within_budget == 1, r
    for r in q_hll_audience_overlap(spark, SF).collect():
        assert r.sides_within_5pct == 1 and r.overlap_within_budget == 1, r
    for r in q_approx_quantiles(spark, SF).collect():
        assert (r.p50_in_bracket, r.p95_in_bracket, r.p99_in_bracket) == (1, 1, 1), r
