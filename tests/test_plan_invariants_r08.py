"""Physical-plan invariants for the round-8 additions (freeze the
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


def test_decontaminate_spans_broadcast_probe_no_smj(spark):
    """Span evidence keeps the doc-level screen's scale shape: the bench
    gram index BROADCASTS into the train probe (never a sort-merge join
    against the corpus), the corpus contributes two pushed-down scans
    (train + bench sides), and the island windows run on collision-sized
    pair frames only — all JVM-side."""
    a = props("q_decontaminate_spans", spark)
    assert a["scans"] == 2
    assert a["sort_merge_joins"] == 0
    assert a["broadcasts"] >= 1
    assert a["python_ops"] == 0
    assert a["pushed_filters"] >= 1


def test_winsorize_approx_audit_no_window_no_smj(spark):
    """The GK audit path must stay sketch-shaped: the approx side adds no
    window over the corpus and no sort-merge join; thresholds and rank
    counts travel by broadcast."""
    a = props("q_winsorize_prices_approx", spark)
    assert a["sort_merge_joins"] == 0
    assert a["broadcasts"] >= 2
    assert a["python_ops"] == 0


def test_bpe_vocab_sweep_vocab_frame_only(spark):
    """The sweep prices every vocabulary prefix from ONE corpus scan (the
    trainer's word count); the checkpoint replays and token masses run on
    the distinct-word frame — no second corpus pass, no joins, no Python."""
    a = props("q_bpe_vocab_sweep", spark)
    assert a["scans"] == 1
    assert a["sort_merge_joins"] == 0
    assert a["python_ops"] == 0


def test_winnowing_doc_local_no_joins(spark):
    """Winnowing is doc-local by construction: one corpus scan, doc-keyed
    windows, no join of any kind (the fingerprint INDEX would be the join
    consumer downstream)."""
    a = props("q_winnowing_fingerprints", spark)
    assert a["scans"] == 1
    assert a["sort_merge_joins"] == 0
    assert a["broadcasts"] == 0
    assert a["python_ops"] == 0


def test_hubness_audit_sampled_and_pushed(spark):
    """The audit's O(|S|²) brute-force runs on the modulus-sampled frame
    only; the sample predicate reaches the scan, occurrence counts join
    back by broadcast, no Python ops."""
    a = props("q_hubness_audit", spark)
    assert a["sort_merge_joins"] == 0
    assert a["broadcasts"] >= 1
    assert a["python_ops"] == 0
    assert a["pushed_filters"] >= 1


def test_packing_sweep_one_scan_one_window(spark):
    """All four context lengths price off ONE cumulative window: one scan,
    the explode is a projection, one keyed aggregate after it."""
    a = props("q_packing_efficiency_sweep", spark)
    assert a["scans"] == 1
    assert a["sort_merge_joins"] == 0
    assert a["python_ops"] == 0


def test_repetition_period_doc_local(spark):
    """Period detection is doc-local: the min-period aggregate shuffles by
    doc_id only; no Python, no cross-doc join beyond the doc-keyed
    left join back onto the length frame."""
    a = props("q_repetition_period", spark)
    assert a["python_ops"] == 0
    assert a["pushed_filters"] >= 0 and a["scans"] <= 2


def test_soft_dedup_one_scan_no_joins(spark):
    """Soft dedup weighting: one scan, the fingerprint window is the only
    corpus shuffle (same key exact dedup shuffles on anyway), no joins."""
    a = props("q_dedup_soft_weights", spark)
    assert a["scans"] == 1
    assert a["sort_merge_joins"] == 0
    assert a["broadcasts"] == 0
    assert a["python_ops"] == 0


def test_doc_stitch_slim_edge_join(spark):
    """Stitch detection joins the slim (doc_id, head_h, tail_h) frame with
    itself on a hash key — never the text; the length filter is pushed to
    both scans; all JVM-side."""
    a = props("q_doc_stitch_pairs", spark)
    assert a["scans"] == 2
    assert a["python_ops"] == 0
    assert a["pushed_filters"] >= 1


def test_corpus_release_capstone_broadcast_flags(spark):
    """The release capstone composes four detectors; every flag frame
    (contaminated ids, stitched ids, per-source clean aggregates) joins
    back by BROADCAST — never a sort-merge join — and the whole funnel is
    JVM-side. Scan count is the sum of its stages' documented scans."""
    a = props("q_corpus_release_report", spark)
    assert a["sort_merge_joins"] == 0
    assert a["broadcasts"] >= 3
    assert a["python_ops"] == 0


def test_layout_advisor_zone_frame_evaluation(spark):
    """The advisor stacks the fact scan once per candidate layout and
    evaluates the whole workload on the file-grain zone frame — no joins
    of any kind, no Python."""
    a = props("q_layout_advisor", spark)
    assert a["sort_merge_joins"] == 0
    assert a["python_ops"] == 0
    assert a["scans"] <= 4


def test_winnowing_pairs_index_join_shape(spark):
    """The matcher joins the slim (doc, hash32) index with itself on the
    hash key; per-doc fingerprint counts join back by broadcast; no
    Python."""
    a = props("q_winnowing_dup_pairs", spark)
    assert a["python_ops"] == 0
    assert a["broadcasts"] >= 2


def test_recall_comparison_broadcast_pair_frames(spark):
    """The shoot-out's slim per-doc size frames broadcast into the truth
    filter; the candidate-pair frames carry NO broadcast hint (their size
    is data-dependent — AQE decides; r09, ADVICE r08 #2). The whole
    comparison is JVM-side."""
    a = props("q_dedup_recall_comparison", spark)
    assert a["python_ops"] == 0
    assert a["broadcasts"] >= 2


def test_trained_ann_audits_stay_broadcast_shaped(spark):
    """Recall audits: every join is on query-set-sized frames (broadcast);
    the corpus is never sort-merge joined."""
    for name in ("sim_ann_ivf_trained", "sim_ann_pq_trained"):
        a = props(name, spark)
        assert a["sort_merge_joins"] == 0, name
        assert a["broadcasts"] >= 1, name
