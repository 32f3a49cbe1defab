"""Sampled-permutation Shapley coverage valuation
(plans/training2.q_shapley_source_coverage): engine parity against an
independent Python replication of the estimator, the Shapley efficiency
identity, and the LOO-vs-Shapley redundancy gap the query exists to
expose."""

from __future__ import annotations

import hashlib

import arc_maskdata_pipeline_plugin_spark.plans.training2 as t2

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _rank(p, source):
    return int(hashlib.md5(f"shap:{p}:{source}".encode()).hexdigest()[:12], 16)


def _ref(word_sources, n_perms):
    """Independent replication: per (perm, word) the holder with the
    minimum (md5 rank, source) wins."""
    wins = {}
    for p in range(1, n_perms + 1):
        for word, sources in word_sources.items():
            w = min(sources, key=lambda s: (_rank(p, s), s))
            wins[w] = wins.get(w, 0) + 1
    return wins


def _run(spark, docs):
    rows = [
        (i, text, "en", src, len(text)) for i, (src, text) in enumerate(docs)
    ]
    orig = t2.T
    try:
        t2.T = lambda sp, sf, name: sp.createDataFrame(rows, DOC_SCHEMA)
        return {
            r["source"]: r
            for r in t2.q_shapley_source_coverage(spark, "x").collect()
        }
    finally:
        t2.T = orig


def test_matches_independent_replication(spark):
    docs = [
        ("a", "apple banana cherry shared"),
        ("b", "banana cherry date shared"),
        ("c", "cherry elderberry shared onlyc"),
    ]
    got = _run(spark, docs)
    word_sources = {
        "apple": {"a"},
        "banana": {"a", "b"},
        "cherry": {"a", "b", "c"},
        "date": {"b"},
        "shared": {"a", "b", "c"},
        "elderberry": {"c"},
        "onlyc": {"c"},
    }
    wins = _ref(word_sources, t2._SHAP_P)
    for s in ["a", "b", "c"]:
        assert got[s]["wins_total"] == wins.get(s, 0)
        assert got[s]["shapley_words_fp6"] == (
            wins.get(s, 0) * 1_000_000 // t2._SHAP_P
        )
        assert got[s]["efficiency_ok"] == 1
    # efficiency: every (perm, word) has exactly one winner
    assert sum(r["wins_total"] for r in got.values()) == t2._SHAP_P * len(
        word_sources
    )


def test_loo_undercounts_redundant_sources(spark):
    # two sources with IDENTICAL vocab: LOO credits them 0 (removing
    # either loses nothing) while Shapley splits the coverage — the
    # redundancy distinction that motivates the query
    docs = [("a", "x y z"), ("b", "x y z")]
    got = _run(spark, docs)
    assert got["a"]["loo_unique_words"] == 0
    assert got["b"]["loo_unique_words"] == 0
    assert got["a"]["wins_total"] + got["b"]["wins_total"] == t2._SHAP_P * 3
    assert got["a"]["wins_total"] > 0 and got["b"]["wins_total"] > 0


def test_sole_holder_takes_every_permutation(spark):
    docs = [("a", "common"), ("b", "common rare1 rare2")]
    got = _run(spark, docs)
    # words held only by b win for b in ALL permutations
    assert got["b"]["wins_total"] >= 2 * t2._SHAP_P
    assert got["b"]["loo_unique_words"] == 2


def test_empty_input(spark):
    got = _run(spark, [])
    assert got == {}
