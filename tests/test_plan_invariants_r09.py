"""Physical-plan invariants for the round-9 additions (freeze the
properties that matter at 100 TB — see tests/test_plan_invariants.py)."""

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


def test_copy_direction_agg_shaped_no_doc_pairs(spark):
    """Directed copy attribution must stay aggregation-shaped: per-span
    origin is a hash agg (min struct), never a doc-pair join — a viral
    boilerplate span costs one combiner, not a quadratic bucket; the
    |sources|-row totals broadcast; all JVM-side."""
    a = props("q_source_copy_direction", spark)
    assert a["python_ops"] == 0
    assert a["broadcasts"] >= 1
    # the fused per-span aggregation leaves ONE corpus-side shuffle (the
    # groupBy h); grid/tot/directed run on the |sources|²-row frame
    assert all(int(c) <= 3 for c in a["read_cols"])  # doc_id, text, source


def test_bloom_audit_metadata_sized_probe(spark):
    """The bloom index build is one fact scan + a (file, position) DISTINCT;
    key probes and file-grain counts ride broadcasts; all JVM-side (the key
    literal frame is a local scan, not a Python op)."""
    a = props("q_bloom_skip_audit", spark)
    assert a["python_ops"] == 0
    assert a["broadcasts"] >= 2


def test_margin_mining_broadcast_query_set(spark):
    """Margin mining keeps the knn_bruteforce shape: the bounded query set
    broadcasts against the corpus side, ranking + denominator run on the
    query-grain frame, no sort-merge join, all JVM-side."""
    a = props("q_margin_mining_pairs", spark)
    assert a["python_ops"] == 0
    assert a["broadcasts"] >= 2
    assert a["sort_merge_joins"] == 0


def test_generalization_advisor_one_stacked_scan(spark):
    """The 9-node lattice is evaluated from ONE stacked customer scan with
    a broadcast nation dim — never 9 table scans; class/rollup/rank stages
    are all JVM-side aggregates."""
    a = props("q_generalization_advisor", spark)
    assert a["python_ops"] == 0
    assert a["broadcasts"] >= 1
    assert a["scans"] == 2  # customer + nation, each exactly once
    assert a["sort_merge_joins"] == 0


def test_incremental_winnow_batch_local_probe(spark):
    """The winnowing store probe keeps the incremental shape: the
    corpus/batch doc_id bounds are PUSHED to the parquet scans (the store
    build never reads batch rows and vice versa), and the whole
    fingerprint-select + semi-probe is JVM-side."""
    a = props("dedup_incremental_winnow", spark)
    assert a["python_ops"] == 0
    assert a["pushed_filters"] >= 2  # doc_id < 400 and doc_id >= 400 sides
