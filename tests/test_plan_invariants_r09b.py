"""Physical-plan invariants for the round-9 second/third/fourth-batch
additions (freeze the properties that matter at 100 TB).

Queries with internal ``persisted`` frames repeat their cache-build
subtree inside the plan STRING (see .claude/skills/verify: counters are
inflated there), so for those only string-count-proof properties are
pinned (Python-op absence, broadcast presence); scan/exchange counts are
pinned only for persist-free plans."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from arc_maskdata_pipeline_plugin_spark.cache import release_persisted
from tools.plan_audit import audit

QUERIES = entry_mod.queries()
SF = "/root/testdata/sf0.001"


def props(name, spark):
    a = audit(name, QUERIES[name], spark, SF)
    release_persisted()
    spark.catalog.clearCache()
    return a


def test_score_frame_family_single_scan_pruned(spark):
    """ROC AUC / AP+F1 / lift-gain all ride ONE orders scan pruned to the
    3 needed columns, group-partitioned windows only, all JVM-side."""
    for name in ("q_roc_auc", "q_pr_auc_best_f1", "q_lift_gain_deciles"):
        a = props(name, spark)
        assert a["scans"] == 1, (name, a)
        assert a["python_ops"] == 0, name
        assert a["sort_merge_joins"] == 0, name
        assert all(int(c.rstrip("+")) <= 3 for c in a["read_cols"]), (name, a)


def test_chao_single_scan_two_shuffles(spark):
    """Chao1/Good-Turing is one documents scan (2 columns) and at most the
    (source, term) + frequency-of-frequencies shuffles."""
    a = props("q_chao_coverage", spark)
    assert a["scans"] == 1
    assert a["exchanges"] <= 2, a
    assert a["python_ops"] == 0
    assert all(int(c.rstrip("+")) <= 2 for c in a["read_cols"])


def test_burstiness_vocab_topk_no_global_sort(spark):
    """Burstiness: corpus scan + zero-column count scan; top-k runs on the
    vocab frame; no Python, no sort-merge join."""
    a = props("q_term_burstiness", spark)
    assert a["scans"] == 2
    assert a["python_ops"] == 0
    assert a["sort_merge_joins"] == 0


def test_dp_topk_one_scan_one_shuffle(spark):
    """DP exponential top-k: one events scan pruned to event_type, one
    aggregate exchange; the Gumbel ranking runs on the |types| frame."""
    a = props("q_dp_topk_exponential", spark)
    assert a["scans"] == 1
    assert a["exchanges"] <= 1, a
    assert a["python_ops"] == 0
    assert all(int(c.rstrip("+")) <= 1 for c in a["read_cols"])


def test_rbm_broadcast_bounded_side_no_smj(spark):
    """Reciprocal best match: the bounded collection broadcasts (and so
    does the 1-row count frame); both argmax windows run on the one scored
    frame; never a sort-merge join, all JVM-side."""
    a = props("q_reciprocal_best_match", spark)
    assert a["broadcasts"] >= 2, a
    assert a["sort_merge_joins"] == 0
    assert a["python_ops"] == 0


def test_jl_pushdown_and_codegen_projection(spark):
    """JL audit: the modulus sample predicate reaches both parquet scans
    and the 16 signed-sum projections stay in codegen (no Python)."""
    a = props("q_jl_projection_audit", spark)
    assert a["scans"] == 2
    assert a["pushed_filters"] == 2, a
    assert a["python_ops"] == 0


def test_persisted_round9_queries_stay_jvm_side(spark):
    """The persisted-frame queries (counters/likelihood/per-doc counts):
    plan-string counters are inflated by cache-build subtrees, but Python
    operator absence and broadcast presence are string-count-proof."""
    for name, min_bcast in (
        ("q_misra_gries_topk", 1),
        ("q_naive_bayes_langid", 3),
        ("q_bigram_perplexity", 1),
        ("q_heaps_law_curve", 1),
        ("q_join_cardinality_estimate", 2),
        ("q_txn_log_replay", 1),
        ("q_padding_waste", 0),
        ("q_degree_powerlaw_alpha", 0),
        ("q_dataset_card_report", 2),
    ):
        a = props(name, spark)
        assert a["python_ops"] == 0, name
        assert a["broadcasts"] >= min_bcast, (name, a)
