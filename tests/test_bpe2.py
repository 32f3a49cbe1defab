"""Byte-level BPE semantics on constructed corpora + artifact witnesses."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_byte_train_first_merge_is_most_frequent_pair(spark, tmp_path):
    """Corpus 'ab ab ab cd' → byte pairs: (B32,B97)x3, (B97,B98)x3,
    (B32,B99)x1, (B99,B100)x1. Count ties (3 == 3) break lexicographically:
    'B32' < 'B97', so step 1 must merge (B32, B97)."""
    from arc_maskdata_pipeline_plugin_spark.plans.bpe2 import q_bpe_byte_train

    _write_docs(spark, tmp_path, ["ab ab ab cd"])
    rows = {r.step: r for r in q_bpe_byte_train(spark, str(tmp_path)).collect()}
    assert (rows[1].lhs, rows[1].rhs, rows[1].pair_count) == ("B32", "B97", 3)
    assert rows[1].merged == "B32B97"
    # step 2: remaining top pair is (B32B97, B98) x3
    assert (rows[2].lhs, rows[2].rhs) == ("B32B97", "B98")


def test_byte_encode_witnesses_zero_and_counts(spark, tmp_path):
    """Single-char words collapse to ONE symbol once (B32, byte) merges —
    the regression corpus for the descending-sequence crash; replay and
    decode witnesses must be 0 and token counts must reflect the merges."""
    from arc_maskdata_pipeline_plugin_spark.plans.bpe2 import q_bpe_byte_encode

    _write_docs(spark, tmp_path, ["a a a a a a b b c", "a b c a b"])
    rows = q_bpe_byte_encode(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.replay_lossy == 0 and r.decode_lossy == 0
    # 14 word occurrences; 'a' (8x) fully merges to 1 token within 8 rounds
    assert r.n_words == 14
    assert r.n_bytes == 2 * 14  # every word is 1 char + the space marker
    assert r.n_byte_tokens < 2 * 14  # merges must compress something


def test_byte_encode_real_corpus_witnesses_zero(spark):
    from arc_maskdata_pipeline_plugin_spark.plans.bpe2 import q_bpe_byte_encode

    rows = q_bpe_byte_encode(spark, SF).collect()
    assert rows, "per-source output expected"
    for r in rows:
        assert r.replay_lossy == 0, "artifact replay must reproduce training"
        assert r.decode_lossy == 0, "byte decode must reproduce ' '+word"
        assert r.n_byte_tokens <= r.n_bytes  # merges never expand
        assert r.byte_fertility_fp6 >= 1_000_000  # >= 1 token per word
