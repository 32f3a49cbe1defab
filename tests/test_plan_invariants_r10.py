"""Round-10 plan invariants: no partition-less WindowExec over growing
frames (VERDICT r09 #1).

Every query converted to the two-phase rank/cumsum primitives
(plans/twophase.py) must have NO Window node with an empty partitionSpec
whose ordering references data-sized attributes. The only partition-less
windows allowed are the two-phase OFFSETS frames — ordered by `_tp_pid`
(per-partition counts, ≤ shuffle-partition-count rows) or `_tp_b`
(per-bucket totals, ≤ bucket-count rows) — which are bounded by session
CONFIG, not by data size. Detection walks the optimized logical plan's
JSON, so a refactor that silently reintroduces `Window.orderBy(...)` over
a doc/value/key frame fails here instead of shipping a single-reducer
bottleneck."""

from __future__ import annotations

import json

import pytest

import __spark_entry__ as entry_mod

QUERIES = entry_mod.queries()
SF = "/root/testdata/sf0.001"

# query -> attribute names a partition-less window may legitimately order
# by (all config-bounded offset frames from plans/twophase.py)
BOUNDED_OK = {"_tp_pid", "_tp_b"}

# per-query extra allowances, each a CONSTANT-bounded frame (not data-sized)
EXTRA_OK = {
    # `k` = equi-depth bucket index over spark.range(_SEL_B): exactly
    # _SEL_B rows by construction (lakeops3.py)
    "q_selectivity_estimate": {"k"},
}

CONVERTED = [
    "q_batch_leakage_audit",
    "q_negative_sampling_table",
    "q_ks_test",
    "q_mann_whitney",
    "q_selectivity_estimate",
    "q_partition_balance_planner",
    "q_quantile_normalize",
    "q_winsorize_prices",
    "q_bloom_skip_audit",
]


def _attr_names(expr_tree):
    """All AttributeReference names in one serialized expression tree."""
    return {
        n["name"]
        for n in expr_tree
        if isinstance(n, dict)
        and n.get("class", "").endswith("AttributeReference")
    }


def unpartitioned_window_order_attrs(df):
    """Order-attribute names of every Window node with an EMPTY
    partitionSpec anywhere in the optimized plan (including cached
    subtrees serialized into it)."""
    nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
    attrs = set()
    for node in nodes:
        if not node.get("class", "").endswith(".Window"):
            continue
        if node.get("partitionSpec"):
            continue
        for spec in node.get("orderSpec") or []:
            attrs |= _attr_names(spec)
    return attrs


@pytest.mark.parametrize("name", CONVERTED)
def test_no_global_window_over_growing_frames(spark, name):
    df = QUERIES[name](spark, SF)
    attrs = unpartitioned_window_order_attrs(df)
    ok = BOUNDED_OK | EXTRA_OK.get(name, set())
    assert attrs <= ok, (
        f"{name}: partition-less Window orders by data-sized attrs "
        f"{attrs - ok} — reintroduce the two-phase form"
    )


# top-k sites: row_number().over(orderBy) + filter(rank <= K). Catalyst
# rewrites the rank filter into TakeOrderedAndProject(limit=K) — a
# per-partition top-k heap with a K-sized merge — so the residual
# partition-less Window runs over ≤ K rows (K is a module constant), never
# the vocab/pair/degree frame. This test freezes that rewrite: if a
# refactor breaks the pattern (e.g. filters on a derived column), the
# Window goes back to swallowing the whole frame.
TOPK = [
    "q_term_burstiness",
    "q_rake_keywords",
    "q_hits_authorities",
    "q_clustering_coefficient",
    "q_user_journeys",
    "q_item_cooccurrence",
    "q_frequent_itemsets",
    "q_word_pmi",
    "q_corpus_drift_kl",
    "q_zipf_slope",
    "q_weighted_sample",
    "q_dsir_importance",
]


@pytest.mark.parametrize("name", TOPK)
def test_topk_windows_are_limit_bounded(spark, name):
    df = QUERIES[name](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject(limit=" in plan, (
        f"{name}: rank-filter top-k no longer rewrites to "
        "TakeOrderedAndProject — the global window swallows the frame"
    )


def test_twophase_rank_single_range_shuffle(spark):
    """q_batch_leakage_audit's doc rank: the doc frame passes through a
    parallel rangepartitioning exchange; the only SinglePartition exchange
    feeds the bounded offsets window."""
    df = QUERIES["q_batch_leakage_audit"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan
