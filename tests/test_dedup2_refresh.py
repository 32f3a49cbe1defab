"""Semantics of the evidence-merge clusters and the incremental-refresh
funnel on constructed corpora."""

from __future__ import annotations


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_evidence_clusters_require_two_methods(spark, tmp_path):
    """Two identical long docs agree on ALL methods → one cluster whose
    survivor is the lower id (equal length); a pair seen by NO second
    method never clusters."""
    from arc_maskdata_pipeline_plugin_spark.plans.dedup2 import (
        q_dedup_evidence_clusters,
    )

    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    rows = [
        (1, dup, "en", "s", len(dup)),
        (2, dup, "en", "s", len(dup)),
        (3, "completely different words entirely here and more of them now", "en", "s", 62),
    ]
    _write_docs(spark, tmp_path, rows)
    out = q_dedup_evidence_clusters(spark, str(tmp_path)).collect()
    assert len(out) == 1
    c = out[0]
    assert c.n_members == 2 and c.members == "1,2"
    assert c.survivor_id == 1  # equal n_chars → min doc_id
    assert c.n_pairs_all3 == c.n_strong_pairs == 1  # identical docs: unanimous


def test_evidence_survivor_is_longest_member(spark, tmp_path):
    """A short doc fully contained in a longer near-identical doc: the
    LONGER doc must survive (containment + jaccard/minhash agree)."""
    from arc_maskdata_pipeline_plugin_spark.plans.dedup2 import (
        q_dedup_evidence_clusters,
    )

    base = "one two three four five six seven eight nine ten " * 4
    longer = base + "extra tail words here"
    rows = [
        (1, base.strip(), "en", "s", len(base.strip())),
        (2, longer, "en", "s", len(longer)),
    ]
    _write_docs(spark, tmp_path, rows)
    out = q_dedup_evidence_clusters(spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0].survivor_id == 2


def test_refresh_funnel_first_gate_attribution(spark, tmp_path):
    """doc 0 (batch) is an EXACT copy of doc 1 (base) → attributed to
    exact-dup even though near-dup would also fire; doc 5 is short →
    low-quality; doc 10 is clean → accepted."""
    from arc_maskdata_pipeline_plugin_spark.plans.refresh import (
        q_corpus_refresh_incremental,
    )

    long_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    clean = "fresh unique material with plenty of brand new tokens appearing here today"
    rows = [
        (0, long_a, "en", "s", len(long_a)),       # batch: exact dup of 1
        (1, long_a, "en", "s", len(long_a)),       # base
        (5, "too short", "en", "s", 9),            # batch: low quality
        (10, clean, "en", "s", len(clean)),        # batch: accepted
        (2, "some other base content that is long enough to stand alone fine", "en", "s", 64),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q_corpus_refresh_incremental(spark, str(tmp_path)).collect()}
    r = out["s"]
    assert r.n_batch == 3
    assert r.n_exact_dup == 1
    assert r.n_low_quality == 1
    assert r.n_accepted == 1
    assert r.n_near_dup == 0 and r.n_contaminated == 0
    assert r.n_shards_used == 1


def test_refresh_contamination_gate(spark, tmp_path):
    """A batch doc sharing >= 2 distinct 8-grams with the benchmark doc
    (doc_id % 50 == 1, base side) is dropped as contaminated — but only
    when it survives the dedup gates first."""
    from arc_maskdata_pipeline_plugin_spark.plans.refresh import (
        q_corpus_refresh_incremental,
    )

    bench = "the quick brown fox jumps over the lazy dog again and again today"
    # shares a long verbatim span with the benchmark but differs elsewhere
    leaked = "intro words " + bench + " trailing content that changes the hash"
    rows = [
        (1, bench, "en", "s", len(bench)),     # benchmark (1 % 50 == 1, base)
        (5, leaked, "en", "s", len(leaked)),   # batch: contaminated
        (2, "unrelated base document with sufficiently many words to pass easily", "en", "s", 68),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q_corpus_refresh_incremental(spark, str(tmp_path)).collect()}
    r = out["s"]
    assert r.n_batch == 1
    assert r.n_contaminated + r.n_near_dup == 1  # near-dup gate may fire first
    assert r.n_accepted == 0
