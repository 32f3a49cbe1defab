"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query; ``queries()`` exposes every
implemented operator from SURVEY.md §2 as (spark, sf_dir) -> DataFrame;
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (omitted only for
genuinely non-SQL-expressible ops, e.g. KDF-backed masking).

Query implementations live in ``arc_maskdata_pipeline_plugin_spark.plans.*``;
this module is a thin adapter over the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Importing these modules populates the registry. Imports are deliberately
# UNGUARDED: a silent ``except ImportError`` here once dropped 35 queries from
# the driver's correctness gate without a trace (VERDICT r01 §Next-round #1).
# If a plans module fails to import, the whole entry module must fail loudly.
#
# Registration ORDER matters: the driver's correctness gate runs queries in
# dict-insertion order under a bounded budget (r01 recorded exactly the first
# 50 registered queries). The LLM-pipeline families (dedup / text / similarity
# / masking / multimodal / streaming) were absent from the r01 gate, so they
# register FIRST this round; the relational/TPC-H family (driver-verified in
# r01) registers after.
from arc_maskdata_pipeline_plugin_spark.plans import dedup  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import text  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import text2  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import similarity  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import embeddings  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import masking_queries  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import multimodal_queries  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import streaming_queries  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import training  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import relational  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import relational2  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import relational3  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import relational4  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import advanced_sql  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import search  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import search2  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import privacy  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import layout  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import graph  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import graph2  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import quality  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import timeseries  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import behavior  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import stats  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import stats2  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import rag  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import bpe  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import curation  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import stats3  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import stats4  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import mlprep  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import lakeops  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import geo  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import retrieval2  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import bpe2  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import dedup2  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import refresh  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import stats5  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import training2  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import lakeops2  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import mleval  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import vocab  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import lakeops3  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import heavyhitters  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import lm  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import card  # noqa: F401
from arc_maskdata_pipeline_plugin_spark.plans import unigram  # noqa: F401

from arc_maskdata_pipeline_plugin_spark.plans.registry import REGISTRY

# The driver's correctness gate records the FIRST 50 queries in dict order
# (its budget cap, observed r01-r03). Curate that window explicitly
# (VERDICT r02 next-round #2) each round: rotate in every query the driver
# has never witnessed plus everything added/changed this round, and fill the
# rest with green representatives of each family. Everything else follows in
# registry order and is exercised by tools/oracle_check.py + judge runs.
GATE_WINDOW = [
    # CURATION POLICY (VERDICT r02 #2): the driver's correctness gate
    # records the FIRST 50 registered queries, so every query added or
    # materially changed THIS round gets a slot; displaced queries are all
    # (a) green under tools/oracle_check.py's identical local gate,
    # (b) benched and/or pytest-pinned, and (c) witnessed by a prior
    # round's CORRECTNESS_r{N}.json.
    #
    # ROUND-9 WINDOW (VERDICT r08 next-round #1): witness debt was 0 after
    # the r08 gate (union r01..r08 = the whole 327-query registry), so the
    # window leads with everything BUILT or CHANGED in r09 — the 29 new
    # queries (batches 1-6: provenance/stores/advisors, eval metrics,
    # coverage estimators, lakehouse/CBO audits, heavy hitters, FPE,
    # valuation), the 12 streaming drains that gained in-plan
    # StreamingQueryProgress witnesses (new schemas), the 2 dedup queries
    # whose broadcast hints were dropped per ADVICE r08, and the advisor
    # that grew from 4 to 6 candidate layouts — then green
    # representatives. Every slot is hash-oracled; every displaced green
    # is driver-witnessed in r01..r08.
    #
    # --- r09-built (new queries, never witnessed) ---
    "q_source_copy_direction", "dedup_incremental_winnow",
    "q_bpe_artifact_roundtrip", "q_stream_session_window",
    "q_bloom_skip_audit", "q_margin_mining_pairs",
    "q_generalization_advisor",
    # r09 second batch: classifier-eval metrics, vocabulary-coverage
    # estimators, lakehouse txn-log replay, optimizer-stats validation,
    # Misra-Gries mergeable heavy hitters, padding-waste batching
    "q_roc_auc", "q_pr_auc_best_f1", "q_chao_coverage",
    "q_heaps_law_curve", "q_txn_log_replay",
    "q_join_cardinality_estimate", "q_misra_gries_topk",
    "q_padding_waste",
    # r09 third batch: lift/gain table, trained Naive Bayes lang-ID,
    # bigram LM perplexity, term burstiness, JL projection audit
    "q_lift_gain_deciles", "q_naive_bayes_langid", "q_bigram_perplexity",
    "q_term_burstiness", "q_jl_projection_audit",
    # r09 fourth batch: mutual-NN pair mining, degree power-law MLE,
    # DP exponential-mechanism top-k, dataset-card capstone
    "q_reciprocal_best_match", "q_degree_powerlaw_alpha",
    "q_dp_topk_exponential", "q_dataset_card_report",
    # r09 fifth batch: columnar-encoding advisor, partition-balance planner
    "q_encoding_advisor", "q_partition_balance_planner",
    # r09 sixth batch: invertible FPE masking, LOO data valuation,
    # range-selectivity estimation audit
    "q_mask_fpe_referential", "q_loo_source_influence",
    "q_selectivity_estimate", "q_lsh_band_sweep",
    #
    # --- r09-changed: streaming drains now emit witness columns (new
    #     schemas), ADVICE r08 broadcast fixes, 6-layout advisor ---
    "q_stream_event_counts", "q_stream_dedup_user_types",
    "q_stream_static_enrich", "q_stream_stream_join",
    "q_stream_dedup_within_watermark", "q_stream_cms_cells",
    "q_stream_stream_left_join", "q_stream_threshold_alert",
    "q_stream_fingerprint", "q_python_datasource_stream",
    "q_stream_funnel_tracker", "q_stream_hysteresis_alert",
    "dedup_minhash_pairs_fast", "q_dedup_recall_comparison",
    "q_layout_advisor",
    #
    # --- green representatives (all witnessed r01..r08), one+ per family:
    #     relational/TPC-H, lifecycle, masking/KDF, dedup, winnowing,
    #     similarity, sketches, contamination, BPE, capstone, multimodal,
    #     SQL surface, sessionization, lakeops/layout, graph, stats ---
    "q1_pricing_summary", "q_userdata_lifecycle", "q_mask_customers_pbkdf2",
    "q_decontaminate_spans",
    "q_multimodal_pixel_stats",
]
assert len(GATE_WINDOW) == 50, len(GATE_WINDOW)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return REGISTRY["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    missing = [n for n in GATE_WINDOW if n not in REGISTRY]
    if missing:  # fail loudly — a silent miss would shrink the gate window
        raise KeyError(f"GATE_WINDOW names not in registry: {missing}")
    ordered = list(GATE_WINDOW) + [n for n in REGISTRY if n not in set(GATE_WINDOW)]
    return {name: REGISTRY[name].fn for name in ordered}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
