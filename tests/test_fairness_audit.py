"""Group-fairness audit (plans/mleval.q_fairness_group_audit): hand-computed
rates on constructed groups, the degenerate-group guards, and the
disparate-impact/equalized-odds identities."""

from __future__ import annotations

import datetime as dt

import arc_maskdata_pipeline_plugin_spark.plans.mleval as me

ORD = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_orderdate timestamp, o_totalprice double, o_orderpriority string"
)


def _run(spark, rows):
    ts = dt.datetime(2024, 1, 1)
    data = [
        (i, 1, ("F" if y else "O"), ts, float(price), grp)
        for i, (grp, price, y) in enumerate(rows)
    ]
    orig = me.T
    try:
        me.T = lambda sp, sf, name: sp.createDataFrame(data, ORD)
        return {
            r["grp"]: r
            for r in me.q_fairness_group_audit(spark, "x").collect()
        }
    finally:
        me.T = orig


def test_hand_computed_rates_and_gaps(spark):
    # prices 0..100 -> threshold: (cents - 0)*2 >= 10000 i.e. price >= 50
    rows = (
        # group A: 4 rows, 3 predicted positive, labels [1,1,0,0]
        [("A", 80, 1), ("A", 60, 1), ("A", 70, 0), ("A", 10, 0)]
        # group B: 4 rows, 1 predicted positive, labels [1,0,1,0]
        + [("B", 90, 1), ("B", 20, 0), ("B", 30, 1), ("B", 0, 0)]
    )
    got = _run(spark, rows)
    a, b = got["A"], got["B"]
    assert a["selection_rate_fp6"] == 750000 and b["selection_rate_fp6"] == 250000
    # A: TP = rows with y=1 & yhat=1 -> prices 80,60 => 2/2
    assert a["tpr_fp6"] == 1_000_000
    # A: FP = y=0 & yhat=1 -> price 70 => 1/2
    assert a["fpr_fp6"] == 500000
    # B: TP -> price 90 only => 1/2 ; FP -> none of {20, 0} >= 50 => 0/2
    assert b["tpr_fp6"] == 500000 and b["fpr_fp6"] == 0
    # gaps are shared columns
    assert a["dp_gap_fp6"] == 500000 == b["dp_gap_fp6"]
    assert a["eq_odds_gap_fp6"] == 500000  # max(dTPR, dFPR) = 0.5
    # disparate impact: B vs max(A) = 0.25/0.75
    assert b["disparate_impact_fp6"] == 250000 * 1_000_000 // 750000
    assert a["disparate_impact_fp6"] == 1_000_000


def test_degenerate_groups_no_division_by_zero(spark):
    # group with no positives (TPR guard) and group with no negatives
    rows = [("NOPOS", 80, 0), ("NOPOS", 10, 0), ("ALLPOS", 80, 1), ("ALLPOS", 90, 1)]
    got = _run(spark, rows)
    assert got["NOPOS"]["tpr_fp6"] == 0
    assert got["ALLPOS"]["fpr_fp6"] == 0


def test_empty_input(spark):
    assert _run(spark, []) == {}
