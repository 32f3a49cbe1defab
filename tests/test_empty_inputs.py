"""Empty-input robustness: a partition with zero rows is routine at 1000
executors (empty files, all-filtered partitions, fresh tenants) — every core
operator must return an EMPTY result, not throw. Exercised via monkeypatched
``T`` feeding zero-row frames with the production schemas."""

from __future__ import annotations

import pytest


def _empty(spark, schema: str):
    return spark.createDataFrame([], schema)


DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
EVT_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
ORD_SCHEMA = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_orderdate timestamp, o_totalprice double, o_orderpriority string"
)
CUST_SCHEMA = (
    "c_custkey long, c_mktsegment string, c_nationkey long, c_acctbal double"
)
LI_SCHEMA = "l_orderkey long, l_partkey long, l_suppkey long"
EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _run_empty(spark, module_name, fn_name, tables):
    import importlib

    mod = importlib.import_module(
        f"arc_maskdata_pipeline_plugin_spark.plans.{module_name}"
    )
    orig = mod.T
    try:
        mod.T = lambda sp, sf, name: _empty(sp, tables[name])  # noqa: ARG005
        return getattr(mod, fn_name)(spark, "x").collect()
    finally:
        mod.T = orig


@pytest.mark.parametrize(
    ("module_name", "fn_name", "tables"),
    [
        ("dedup", "q_substring_span_dedup", {"documents": DOC_SCHEMA}),
        ("dedup", "dedup_containment_pairs", {"documents": DOC_SCHEMA}),
        ("dedup", "dedup_sorted_neighborhood", {"documents": DOC_SCHEMA}),
        ("search2", "q_corpus_drift_kl", {"documents": DOC_SCHEMA}),
        ("search2", "q_ngram_diversity", {"documents": DOC_SCHEMA}),
        ("behavior", "q_event_transitions", {"events": EVT_SCHEMA}),
        ("behavior", "q_user_journeys", {"events": EVT_SCHEMA}),
        ("behavior", "q_abandonment_detection", {"events": EVT_SCHEMA}),
        ("timeseries", "q_ewma_daily_value", {"events": EVT_SCHEMA}),
        ("timeseries", "q_cusum_changepoint", {"events": EVT_SCHEMA}),
        ("layout", "q_compaction_plan", {"documents": DOC_SCHEMA}),
        ("quality", "q_benford_audit", {"orders": ORD_SCHEMA}),
        ("quality", "q_sequence_gaps", {"orders": ORD_SCHEMA}),
        ("stats", "q_mode_per_group", {"events": EVT_SCHEMA}),
        ("stats", "q_percentile_disc_exact", {"events": EVT_SCHEMA}),
        ("stats", "q_equidepth_histogram", {"events": EVT_SCHEMA}),
        ("stats2", "q_user_entropy", {"events": EVT_SCHEMA}),
        ("training", "q_weighted_sample", {"documents": DOC_SCHEMA}),
        ("training", "q_quantile_normalize", {"documents": DOC_SCHEMA}),
        ("training", "q_nested_subsets", {"documents": DOC_SCHEMA}),
        (
            "graph",
            "q_kcore_suppliers",
            {"orders": ORD_SCHEMA, "lineitem": LI_SCHEMA},
        ),
        (
            "graph",
            "q_frequent_itemsets",
            {"lineitem": LI_SCHEMA},
        ),
        (
            "behavior",
            "q_revenue_concentration",
            {"orders": ORD_SCHEMA, "customer": CUST_SCHEMA},
        ),
        (
            "timeseries",
            "q_incremental_join_mv",
            {"orders": ORD_SCHEMA, "customer": CUST_SCHEMA},
        ),
        (
            "advanced_sql",
            "q_pareto_orders",
            {"orders": ORD_SCHEMA, "customer": CUST_SCHEMA},
        ),
        # round-9 second wave
        ("mleval", "q_roc_auc", {"orders": ORD_SCHEMA}),
        ("mleval", "q_pr_auc_best_f1", {"orders": ORD_SCHEMA}),
        ("mleval", "q_lift_gain_deciles", {"orders": ORD_SCHEMA}),
        ("mleval", "q_naive_bayes_langid", {"documents": DOC_SCHEMA}),
        ("vocab", "q_chao_coverage", {"documents": DOC_SCHEMA}),
        ("vocab", "q_heaps_law_curve", {"documents": DOC_SCHEMA}),
        ("vocab", "q_term_burstiness", {"documents": DOC_SCHEMA}),
        ("lm", "q_bigram_perplexity", {"documents": DOC_SCHEMA}),
        ("training2", "q_padding_waste", {"documents": DOC_SCHEMA}),
        ("heavyhitters", "q_misra_gries_topk", {"documents": DOC_SCHEMA}),
        ("lakeops3", "q_txn_log_replay", {"orders": ORD_SCHEMA}),
        (
            "lakeops3",
            "q_join_cardinality_estimate",
            {"orders": ORD_SCHEMA, "events": EVT_SCHEMA},
        ),
        (
            "graph2",
            "q_degree_powerlaw_alpha",
            {"orders": ORD_SCHEMA, "lineitem": LI_SCHEMA},
        ),
        ("privacy", "q_dp_topk_exponential", {"events": EVT_SCHEMA}),
        ("lakeops3", "q_partition_balance_planner", {"events": EVT_SCHEMA}),
        ("training2", "q_loo_source_influence", {"documents": DOC_SCHEMA}),
        ("lakeops3", "q_selectivity_estimate", {"orders": ORD_SCHEMA}),
        (
            "lakeops3",
            "q_encoding_advisor",
            {
                "lineitem": "l_orderkey long, l_linenumber int,"
                " l_quantity double, l_extendedprice double,"
                " l_returnflag string"
            },
        ),
        ("similarity", "q_reciprocal_best_match", {"embeddings": EMB_SCHEMA}),
        ("similarity", "q_jl_projection_audit", {"embeddings": EMB_SCHEMA}),
    ],
)
def test_operator_handles_empty_input(spark, module_name, fn_name, tables):
    assert _run_empty(spark, module_name, fn_name, tables) == []
