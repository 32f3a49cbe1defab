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
    # round's CORRECTNESS_r{N}.json. Tolerance-checked sketch queries
    # (q_hll_*, q_approx_*) stay OUTSIDE the window — a rows-only driver
    # record would burn an oracled slot.
    #
    # ROUND-6 WINDOW (VERDICT r05 next-round #1): filled entirely from the
    # 60-query never-driver-witnessed backlog (union of CORRECTNESS_r01..r05
    # keys vs queries()). 54 of the 60 are hash-oracled; this window takes 50
    # of those (rows-only q_compression_quality / sim_ann_pq_trained /
    # q_winsorize_prices_approx / q_approx_quantiles / q_hll_* stay outside
    # per the policy above, and the 4 deferred oracled queries —
    # q_mode_per_group, q_unpivot_measures, q_value_histogram,
    # q_profile_orders, all simple ops with driver-witnessed family siblings
    # — rotate into r07 with any r06 additions). The two materially-CHANGED
    # queries this round (q_semdedup, q_multimodal_phash_dedup — viral-bucket
    # caps + in-plan precision floors per VERDICT r05 #2/#4) are in-window.
    #
    # --- scale-critical / weak-item fixes (VERDICT r05 named) ---
    "q_pca_top_component", "q_multimodal_phash_dedup", "q_semdedup",
    "q_label_propagation", "q_multimodal_phash",
    #
    # --- corpus curation family (r05 additions) ---
    "q_boilerplate_segments", "q_perplexity_filter", "q_dsir_importance",
    "q_ngram_novelty", "q_language_confusion", "q_curriculum_shards",
    "q_hard_negatives", "q_feature_hashing", "q_consistent_hash_shards",
    "q_epoch_shuffle",
    #
    # --- dedup / embeddings / ANN stragglers ---
    "dedup_simhash_idf_buckets", "q_bloom_dedup_screen",
    "q_embedding_truncate_mrl", "q_embedding_drift", "q_feature_correlation",
    "q_winsorize_prices",
    #
    # --- retrieval eval / tokenizer round-trip ---
    "q_search_ndcg", "q_bpe_roundtrip", "q_udtf_term_freqs",
    #
    # --- extensibility surface ---
    "q_python_datasource", "q_variant_extract", "q_recursive_month_spine",
    #
    # --- time series / forecast ---
    "q_time_resample", "q_rolling_revenue_7d", "q_gap_fill_interpolate",
    "q_theil_sen_trend", "q_forecast_backtest", "q_delivery_sla_monthly",
    "q_incremental_rollup", "q_pit_scd2_enrich",
    #
    # --- behavior / growth ---
    "q_rolling_retention_d7", "q_position_attribution", "q_churn_features",
    "q_growth_accounting", "q_auto_join_revenue",
    #
    # --- statistics / experimentation ---
    "q_logrank_test", "q_covariate_balance", "q_trimmed_mean",
    "q_feature_binning", "q_salted_aggregation", "q_referential_integrity",
    #
    # --- streaming / text utilities ---
    "q_stream_hysteresis_alert", "q_text_clean", "q_length_bucket_batches",
    "q_null_safe_join",
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
