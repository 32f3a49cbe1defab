"""Physical-plan invariants for the round-7 additions (freeze the
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


def test_permutation_test_single_pass_no_shuffle(spark):
    """All 16 replicates are conditional sums in ONE global aggregate:
    one scan, zero exchanges, predicate pushed to the parquet scan."""
    a = props("q_permutation_test_ab", spark)
    assert a["scans"] == 1
    assert a["exchanges"] == 0
    assert a["pushed_filters"] >= 1


def test_zonemap_single_fact_scan(spark):
    """Both layouts' zone maps come from one stacked aggregate — the fact
    table is scanned once, never per predicate; predicates join broadcast."""
    a = props("q_zonemap_skip_audit", spark)
    assert a["scans"] == 1
    assert a["sort_merge_joins"] == 0
    assert a["broadcasts"] >= 1


def test_partition_fingerprint_one_scan_one_shuffle(spark):
    """Both snapshots' checksums are conditional sums in one month-keyed
    aggregate: one scan, exactly one exchange."""
    a = props("q_partition_fingerprint_diff", spark)
    assert a["scans"] == 1
    assert a["exchanges"] == 1
    assert a["sort_merge_joins"] == 0


def test_sprt_and_tost_small_plans(spark):
    """Sequential/equivalence tests: <= 2 scans (a 1-row broadcast probe may
    re-scan), no sort-merge joins, everything JVM-side."""
    for name in ("q_sprt_ab", "q_tost_equivalence"):
        a = props(name, spark)
        assert a["scans"] <= 2, name
        assert a["sort_merge_joins"] == 0, name
        assert a["python_ops"] == 0, name


def test_waterfill_no_smj_and_bounded_scans(spark):
    """Water-filling: the corpus contributes one token aggregate; windows
    run on the |sources|-row frame; budget probe broadcast."""
    a = props("q_token_budget_waterfill", spark)
    assert a["sort_merge_joins"] == 0
    assert a["broadcasts"] >= 2
    assert a["python_ops"] == 0


def test_refresh_funnel_all_probes_broadcast_or_semi(spark):
    """The ingest funnel: every gate is a semi-join probe or broadcast —
    no sort-merge join anywhere, and filters reach the scans."""
    a = props("q_corpus_refresh_incremental", spark)
    assert a["sort_merge_joins"] == 0
    assert a["broadcasts"] >= 4
    assert a["pushed_filters"] >= 4


def test_minhash_error_no_sort_merge_join(spark):
    """The pair frame broadcasts into every corpus-sized side (sig, sizes,
    shingles) — a sort-merge join here would shuffle the corpus for a
    post-LSH pair set."""
    a = props("q_minhash_estimate_error", spark)
    assert a["sort_merge_joins"] == 0
    assert a["broadcasts"] >= 4


def test_pixel_stats_rides_the_scan(spark):
    """Decode+stats are partition-local Arrow batches: one scan, at most
    the spread() round-robin exchange, no joins."""
    a = props("q_multimodal_pixel_stats", spark)
    assert a["scans"] == 1
    assert a["exchanges"] <= 1
    assert a["python_ops"] >= 1
    assert a["sort_merge_joins"] == 0 and a["broadcasts"] == 0


def test_byte_bpe_encode_vocab_join_shapes(spark):
    """Encoding joins the corpus tokens against the vocabulary-sized
    word map; the audit frame broadcasts; no sort-merge join."""
    a = props("q_bpe_byte_encode", spark)
    assert a["sort_merge_joins"] == 0
    assert a["python_ops"] == 0
