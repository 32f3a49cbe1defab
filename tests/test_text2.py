"""Semantics of readability scoring and RAKE keyword extraction on
constructed documents."""

from __future__ import annotations

import math


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))


def test_readability_hand_fre(spark, tmp_path):
    """'The cat sat.' → 3 words, 1 sentence, 3 vowel groups:
    FRE = 206.835 − 1.015·3 − 84.6·1 = 119.19 (easy). A polysyllabic doc
    scores far lower and is not easy."""
    _write_docs(
        spark,
        tmp_path,
        [
            (0, "The cat sat.", "en", "simple"),
            (1, "Incomprehensibility accelerating observational.", "en", "complex"),
        ],
    )
    from arc_maskdata_pipeline_plugin_spark.plans.text2 import (
        q_readability_scores,
    )

    out = {r.source: r for r in q_readability_scores(spark, str(tmp_path)).collect()}
    fre_simple = 206.835 - 1.015 * 3.0 - 84.6 * 1.0
    assert out["simple"].mean_fre_fp6 == math.floor(
        math.floor(1e6 * fre_simple) / 1
    )
    assert out["simple"].easy_share_fp6 == 1_000_000
    # complex: 3 words, 1 sentence, syllable groups:
    # incomprehensibility: i-o-e-e-i-i-i-y -> 8; accelerating: a-e-e-a-i -> 5;
    # observational: o-e-a-io-a -> 5  => 18 syllables
    fre_complex = 206.835 - 1.015 * 3.0 - 84.6 * (18.0 / 3.0)
    assert out["complex"].mean_fre_fp6 == math.floor(1e6 * fre_complex)
    assert out["complex"].easy_share_fp6 == 0


def test_rake_degree_vs_isolated(spark, tmp_path):
    """'deep learning' always appears as a 2-word phrase → deg = freq,
    score = 2.0; 'cat' always appears alone → deg = 0, score = 1.0."""
    phrase_doc = " the deep learning of the deep learning and it deep learning " * 3
    cat_doc = " the cat of a cat in a cat to a cat is a cat that cat "
    _write_docs(
        spark,
        tmp_path,
        [(0, phrase_doc, "en", "s"), (1, cat_doc, "en", "s")],
    )
    from arc_maskdata_pipeline_plugin_spark.plans.text2 import q_rake_keywords

    out = {r.word: r for r in q_rake_keywords(spark, str(tmp_path)).collect()}
    assert out["deep"].freq == 9 and out["deep"].degree == 9
    assert out["deep"].score_fp6 == 2_000_000
    assert out["learning"].score_fp6 == 2_000_000
    assert out["cat"].freq == 6 and out["cat"].degree == 0
    assert out["cat"].score_fp6 == 1_000_000
    # phrase members outrank the isolated word
    assert out["deep"].rank < out["cat"].rank
