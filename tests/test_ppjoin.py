"""PPJoin prefix-filter exact Jaccard join — semantics on constructed sets.

The prefix-filter guarantee (Bayardo et al. All-Pairs WWW'07; Xiao et al.
PPJoin WWW'08): under any consistent global token order, two sets with
J >= tau share at least one token in their first ``m - ceil(tau*m) + 1``
tokens. These tests construct documents whose 3-word shingle sets are
known exactly and assert:

* the verified pair set equals the naive all-common-shingle join's
  (candidate COMPLETENESS — the whole point vs MinHash/SimHash);
* rare-first ordering actually prunes: a pair whose only shared shingle is
  FREQUENT (df high enough to fall outside both prefixes) never becomes a
  candidate, while a low-Jaccard pair sharing a rare token does (and is
  then killed by the exact verify, visible in ``precision_fp6``);
* the viral-token cap drops an oversized prefix bucket BEFORE enumeration
  and audits it in ``n_dropped_tokens``.
"""

from __future__ import annotations


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "s") for i, t in texts]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


# docs 0/1: identical (J=1).  doc 2: shares only the now-frequent shingle
# "w1 w2 w3" with 0/1 (J=1/5) — that shingle's df=3 pushes it out of doc 2's
# rare-first prefix, so (0,2)/(1,2) are never candidates.  docs 3/4: share
# 2 of 3 shingles (J=1/2, at the threshold).  docs 6/7: share one RARE
# shingle (both sets are size 2, so the whole set is the prefix) but
# J=1/3 — a candidate that the exact verify must reject.  doc 8: a
# sub-shingle-length doc (single truncated shingle), bucket of one.
_BASE = [
    (0, "w1 w2 w3 w4"),
    (1, "w1 w2 w3 w4"),
    (2, "w1 w2 w3 x1 x2 x3"),
    (3, "a b c d e"),
    (4, "a b c d f"),
    (6, "m1 m2 m3 m4"),
    (7, "m1 m2 m3 n4"),
    (8, "q1 q2"),
]


def test_ppjoin_matches_naive_join_and_scores_exactly(spark, tmp_path):
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import dedup_ppjoin_pairs

    _write_docs(spark, tmp_path, _BASE)
    out = dedup_ppjoin_pairs(spark, str(tmp_path)).collect()
    got = {(r.d1, r.d2): r for r in out}
    assert set(got) == {(0, 1), (3, 4)}
    assert got[(0, 1)].jaccard == 1.0 and got[(0, 1)].n_common == 2
    assert got[(3, 4)].jaccard == 0.5
    assert got[(3, 4)].n_common == 2 and got[(3, 4)].n_union == 4


def test_ppjoin_prefix_prunes_frequent_token_keeps_rare(spark, tmp_path):
    """Candidates = {(0,1), (3,4), (6,7)}: the (0,2) pair is pruned by the
    prefix (its only shared shingle has df=3, outside doc 2's prefix) while
    (6,7) survives to the verify and fails it — precision = floor(2e6/3)."""
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import dedup_ppjoin_pairs

    _write_docs(spark, tmp_path, _BASE)
    out = dedup_ppjoin_pairs(spark, str(tmp_path)).collect()
    r = out[0]
    assert r.n_candidate_pairs == 3
    assert r.n_dropped_tokens == 0
    assert r.precision_fp6 == 666_666


def test_ppjoin_completeness_vs_naive_operator(spark, tmp_path):
    """Prefix filtering loses NO pair the naive all-common-shingle join
    finds at the same threshold (exactness, not approximate recall)."""
    from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
        jaccard_pairs,
        word_shingles,
    )
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import dedup_ppjoin_pairs

    _write_docs(spark, tmp_path, _BASE)
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    naive = {
        (r.d1, r.d2)
        for r in jaccard_pairs(
            word_shingles(docs, distinct=False), threshold=0.5
        ).collect()
    }
    pp = {
        (r.d1, r.d2) for r in dedup_ppjoin_pairs(spark, str(tmp_path)).collect()
    }
    assert pp == naive


def test_ppjoin_viral_token_capped_and_audited(spark, tmp_path, monkeypatch):
    """Six boilerplate docs share one prefix shingle ('p q r'); with the cap
    below 6 that bucket contributes ZERO candidates and is audited, while
    the base corpus's pairs are untouched."""
    import arc_maskdata_pipeline_plugin_spark.plans.dedup as dd

    viral = _BASE + [(10 + i, f"p q r u{i}") for i in range(6)]
    _write_docs(spark, tmp_path, viral)
    monkeypatch.setattr(dd, "_PPJ_MAXBUCKET", 4)
    out = dd.dedup_ppjoin_pairs(spark, str(tmp_path)).collect()
    got = {(r.d1, r.d2) for r in out}
    assert got == {(0, 1), (3, 4)}
    r = out[0]
    assert r.n_dropped_tokens == 1
    assert r.n_candidate_pairs == 3  # the 15 viral pairs never enumerate


def test_ppjoin_cap_prunes_before_enumeration_and_stays_jvm(spark, tmp_path):
    """The cap is a filter on prefix-bucket size BEFORE pair enumeration
    (a viral token's array never reaches the explode task), and the whole
    pipeline is JVM expressions — no Python operators anywhere."""
    import arc_maskdata_pipeline_plugin_spark.plans.dedup as dd

    _write_docs(spark, tmp_path, _BASE)
    qe = dd.dedup_ppjoin_pairs(spark, str(tmp_path))._jdf.queryExecution()
    opt = qe.optimizedPlan().toString()
    assert f"<= {dd._PPJ_MAXBUCKET}" in opt
    phys = qe.executedPlan().toString()
    for op in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        assert op not in phys
    assert "SortMergeJoin" not in phys  # candidate/verify joins stay hash/broadcast at test SF


def test_ppjoin_dropped_tokens_names_the_viral_token(spark, tmp_path):
    """The library-level audit companion surfaces WHICH prefix token was
    capped (same contract as lsh_dropped_buckets)."""
    from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
        ppjoin_dropped_tokens,
        word_shingles,
    )

    viral = _BASE + [(10 + i, f"p q r u{i}") for i in range(6)]
    _write_docs(spark, tmp_path, viral)
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    out = ppjoin_dropped_tokens(
        word_shingles(docs), max_token_bucket=4
    ).collect()
    assert [(r.shingle, r.n_sets) for r in out] == [("p q r", 6)]
