"""Unigram-LM tokenizer (plans/unigram.py): full-trainer parity against an
INDEPENDENT pure-Python reimplementation (seed → hard-EM prune rounds →
Viterbi) on constructed corpora, Viterbi determinism under score ties, and
the coverage rule."""

from __future__ import annotations

import math
import re
from collections import Counter

import arc_maskdata_pipeline_plugin_spark.plans.unigram as un

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _tokens(text):
    return [
        re.sub(r"[^a-z0-9]", "", t)
        for t in re.split(r"\s+", text.lower().strip())
        if re.sub(r"[^a-z0-9]", "", t) != ""
    ]


def _viterbi(w, s6):
    n = len(w)
    best = [None] * (n + 1)
    best[0] = (0, 0)
    for j in range(1, n + 1):
        cands = []
        for m in range(1, min(un._UM, j) + 1):
            i = j - m
            piece = w[i:j]
            if piece in s6 and best[i] is not None:
                # maximize value; tie -> smallest start (longest last piece)
                cands.append((best[i][0] + s6[piece], -i))
        best[j] = max(cands) if cands else None
    out = []
    j = n
    while j > 0:
        i = -best[j][1]
        out.append(w[i:j])
        j = i
    return list(reversed(out))


def _ref_train(texts):
    words = Counter()
    for t in texts:
        for w in _tokens(t):
            if 0 < len(w) <= un._LMAX:
                words[w] += 1
    subs = Counter()
    for w, n in words.items():
        for s in range(len(w)):
            for m in range(1, un._UM + 1):
                if s + m <= len(w):
                    subs[w[s : s + m]] += n
    chars = {p for p in subs if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in subs.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[: un._KSEED]
    vocab = {p: subs[p] for p in chars}
    vocab.update(dict(multi))
    for _r in range(un._ROUNDS):
        tot = sum(vocab.values())
        pen = math.floor(math.log(tot) * 1_000_000)
        s6 = {
            p: math.floor(math.log(c) * 1_000_000) - pen
            for p, c in vocab.items()
        }
        newc = Counter()
        for w, n in words.items():
            for p in _viterbi(w, s6):
                newc[p] += n
        vocab = {c: max(newc.get(c, 0), 1) for c in chars}
        vocab.update(
            dict(
                sorted(
                    ((p, c) for p, c in newc.items() if len(p) >= 2),
                    key=lambda x: (-x[1], x[0]),
                )[: un._KPRUNE]
            )
        )
    tot = sum(vocab.values())
    pen = math.floor(math.log(tot) * 1_000_000)
    s6 = {
        p: math.floor(math.log(c) * 1_000_000) - pen for p, c in vocab.items()
    }
    return words, vocab, s6


CORPUS = [
    "internationalization nation nationalize international",
    "the nation listened to international internet chatter",
    "internal internal nation nation nation antinational",
    "zebra quilt jumps over the international fence",
    "nationalize the internet the nation said",
]


def _run(spark, texts, fn):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    orig = un.T
    try:
        un.T = lambda sp, sf, name: sp.createDataFrame(rows, DOC_SCHEMA)
        # swapping the corpus under a fixed sf_dir violates the artifact
        # memo's immutable-data contract — invalidate it per run
        un._TRAIN_MEMO.clear()
        return fn(spark, "x").collect()
    finally:
        un.T = orig
        un._TRAIN_MEMO.clear()


def test_train_vocab_matches_reference(spark):
    _, vocab, _ = _ref_train(CORPUS)
    got = {
        r["piece"]: r["cnt"]
        for r in _run(spark, CORPUS, un.q_unigram_train_vocab)
    }
    assert got == vocab


def test_encode_matches_reference_viterbi(spark):
    words, vocab, s6 = _ref_train(CORPUS)
    got = {
        r["doc_id"]: (r["n_words"], r["n_unigram_tokens"])
        for r in _run(spark, CORPUS, un.q_unigram_encode)
    }
    want = {}
    for i, t in enumerate(CORPUS):
        toks = [w for w in _tokens(t) if 0 < len(w) <= un._LMAX]
        want[i] = (len(toks), sum(len(_viterbi(w, s6)) for w in toks))
    assert got == want


def test_coverage_every_word_segmentable(spark):
    # a rare word whose multi-char pieces never win a top-K slot must
    # still segment via the always-kept single characters: flood the
    # corpus with > KPRUNE high-count multi pieces so the rare word's own
    # substrings are pruned out
    frequent = " ".join(f"word{i:02d}" for i in range(30)) + " "
    texts = [frequent * 5, "xqzjv"]
    words, vocab, s6 = _ref_train(texts)
    assert all(c in vocab for c in "xqzjv")
    assert not any(p in vocab for p in ["xq", "qzjv", "xqzj", "zjv"])
    got = {
        r["doc_id"]: r["n_unigram_tokens"]
        for r in _run(spark, texts, un.q_unigram_encode)
    }
    assert got[1] == 5  # chars-only segmentation — encoded, not dropped
    assert len(_viterbi("xqzjv", s6)) == 5


def test_viterbi_tiebreak_prefers_longest_last_piece():
    # equal scores everywhere: 'abab' with pieces {a,b,ab,ba} all score 0
    s6 = {"a": 0, "b": 0, "ab": 0, "ba": 0, "abab": 0, "bab": 0}
    # value ties at every j; smallest start wins -> one piece 'abab'
    assert _viterbi("abab", s6) == ["abab"]


def test_artifact_roundtrip_and_tamper_control(spark, tmp_path):
    """Export → import reproduces the tokenizer; a TAMPERED artifact
    (dropped piece) flips import_replay_lossy — the negative control the
    in-plan witnesses rely on."""
    from arc_maskdata_pipeline_plugin_spark.plans.unigram import (
        export_unigram_artifact,
        import_unigram_artifact,
    )

    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(CORPUS)]
    orig = un.T
    try:
        un.T = lambda sp, sf, name: sp.createDataFrame(rows, DOC_SCHEMA)
        r = un.q_unigram_artifact_roundtrip(spark, "x").collect()[0]
        assert r["import_replay_lossy"] == 0
        assert r["oov_after_import"] == 0
        assert r["ids_contiguous_ok"] == 1
        _, vocab, _ = _ref_train(CORPUS)
        assert r["n_pieces_exported"] == len(vocab)

        # tamper: drop the highest-count multi-char piece and replay
        words, subs, vdf = un._train_unigram(spark, "x")
        vocab_rows = vdf.collect()
        d = str(tmp_path)
        export_unigram_artifact(vocab_rows, d)
        import json
        import os

        path = os.path.join(d, "unigram.json")
        payload = json.load(open(path))
        dropped = next(p for p in payload if len(p[0]) >= 2)
        payload = [p for p in payload if p != dropped]
        json.dump(payload, open(path, "w"))
        _ids, imported = import_unigram_artifact(d)
        import pyspark.sql.functions as F

        imp_df = spark.createDataFrame(imported, "piece string, cnt bigint")
        seg1 = un._viterbi_segments(words, vdf)
        seg2 = un._viterbi_segments(words, imp_df)

        def sig(s):
            return s.groupBy("word").agg(
                F.concat_ws(
                    " ", F.sort_array(F.collect_list("piece"))
                ).alias("sig")
            )

        diff = (
            sig(seg1)
            .join(sig(seg2).withColumnRenamed("sig", "sig2"), "word")
            .filter(F.col("sig") != F.col("sig2"))
            .count()
        )
        assert diff > 0  # the tamper is visible in the replay
    finally:
        un.T = orig
