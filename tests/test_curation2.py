"""Gopher quality + repetition rules (plans/curation2.py): constructed
documents hitting each rule boundary, cross-checked rule by rule."""

from __future__ import annotations

import arc_maskdata_pipeline_plugin_spark.plans.curation2 as c2

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _run(spark, docs):
    rows = [(i, t, "en", src, len(t)) for i, (src, t) in enumerate(docs)]
    orig = c2.T
    try:
        c2.T = lambda sp, sf, name: sp.createDataFrame(rows, DOC_SCHEMA)
        return {
            r["source"]: r
            for r in c2.q_gopher_quality_rules(spark, "x").collect()
        }
    finally:
        c2.T = orig


def _good_doc(n=60):
    # 60 distinct-ish words, mean length in [3,10], two stop words, no
    # dominating n-gram
    words = [f"word{i:02d}" for i in range(n - 2)] + ["the", "with"]
    return " ".join(words)


def test_good_doc_passes_all(spark):
    got = _run(spark, [("g", _good_doc())])
    r = got["g"]
    assert r["n_docs"] == 1
    for col in (
        "pass_word_count", "pass_mean_word_len", "pass_alpha_frac",
        "pass_stop_words", "pass_top2gram", "pass_top3gram",
        "pass_top4gram", "pass_all",
    ):
        assert r[col] == 1, col
    assert r["keep_rate_fp6"] == 10**6


def test_each_rule_fails_in_isolation(spark):
    base = _good_doc()
    docs = [
        ("short", "the with " + " ".join(f"w{i}" for i in range(10))),  # R1
        ("longwords", " ".join(["x" * 40] * 48) + " the with"
         + " " + " ".join(f"w{i}" for i in range(10))),                 # R2
        ("numeric", "the with " + " ".join(["12345"] * 58)),            # R3
        ("nostops", " ".join(f"word{i:02d}" for i in range(60))),       # R4
        ("repeat2", "the with " + " ".join(
            ["alpha beta"] * 30 + [f"w{i}" for i in range(10)])),       # R5
        ("good", base),
    ]
    got = _run(spark, docs)
    assert got["short"]["pass_word_count"] == 0
    assert got["longwords"]["pass_mean_word_len"] == 0
    assert got["numeric"]["pass_alpha_frac"] == 0
    assert got["nostops"]["pass_stop_words"] == 0
    assert got["repeat2"]["pass_top2gram"] == 0
    assert got["good"]["pass_all"] == 1
    # a failed rule fails the composite
    for s in ("short", "longwords", "numeric", "nostops", "repeat2"):
        assert got[s]["pass_all"] == 0, s


def test_top_gram_fraction_exact(spark):
    # doc: 'ab ab ab cd' -> top 2-gram 'ab ab' (count 2, 4 chars);
    # alpha chars = 8 -> f2 = 2*4/8 = 1.0 > 0.20 -> fail R5
    got = _run(spark, [("t", "ab ab ab cd " + "the with "
                        + " ".join(f"w{i}" for i in range(46)))])
    # with the 46 filler words + 2 stops + 4 'ab/cd' words the doc passes
    # R1 but the repeated head still dominates? chars now ~250, top 2-gram
    # 'ab ab' covers 8/alpha_chars -> passes. Use a tighter doc instead:
    got2 = _run(spark, [("u", " ".join(["ab"] * 30))])
    r = got2["u"]
    # 'ab ab' count 29, glen 4, chars 60 -> f2 = 29*4*1e6 div 60 > 0.2
    assert r["pass_top2gram"] == 0
    assert r["pass_word_count"] == 0  # 30 < 50 words


def test_empty_corpus(spark):
    assert _run(spark, []) == {}
