"""Tokenizer shoot-out capstone (plans/shootout.py): shared word
population across the three families, per-family counting conventions,
and degenerate inputs."""

from __future__ import annotations

import arc_maskdata_pipeline_plugin_spark.plans.bpe as bpe
import arc_maskdata_pipeline_plugin_spark.plans.shootout as so
import arc_maskdata_pipeline_plugin_spark.plans.unigram as un
import arc_maskdata_pipeline_plugin_spark.plans.wordpiece as wp

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

CORPUS = [
    "the winding wind winds through the window",
    "she sells sea shells by the sea shore",
    "liquid quick quiet quilt",
]


def _run(spark, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    # shootout has no direct T — it composes the three families' helpers,
    # each reading through its own module's T
    mods = [bpe, un, wp]
    origs = [m.T for m in mods]
    try:
        for m in mods:
            m.T = lambda sp, sf, name: sp.createDataFrame(rows, DOC_SCHEMA)
        for m in (un, bpe, wp):
            m._TRAIN_MEMO.clear()
        return {
            r["tokenizer"]: r
            for r in so.q_tokenizer_shootout(spark, "x").collect()
        }
    finally:
        for m, o in zip(mods, origs):
            m.T = o
        for m in (un, bpe, wp):
            m._TRAIN_MEMO.clear()


def test_shared_population_and_conventions(spark):
    got = _run(spark, CORPUS)
    assert set(got) == {"bpe", "unigram", "wordpiece"}
    n_words = {r["n_words"] for r in got.values()}
    assert len(n_words) == 1  # SAME word population across families
    nw = n_words.pop()
    assert nw > 0
    for r in got.values():
        assert r["n_tokens"] >= nw  # at least one token per word
        assert r["fertility_fp6"] == r["n_tokens"] * 10**6 // nw
    # BPE counts its </w> terminal, so with only 10 merges its fertility
    # strictly exceeds one-token-per-word
    assert got["bpe"]["fertility_fp6"] > 10**6


def test_empty_corpus(spark):
    got = _run(spark, [])
    assert {r["n_words"] for r in got.values()} == {0}
    assert {r["n_tokens"] for r in got.values()} == {0}
    assert {r["fertility_fp6"] for r in got.values()} == {0}
