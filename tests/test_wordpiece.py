"""WordPiece (plans/wordpiece.py): trainer parity against an INDEPENDENT
pure-Python reimplementation (## symbolization → likelihood-score merges)
on constructed corpora, the score-vs-count divergence case, greedy
longest-match encode parity, and empty/degenerate input handling."""

from __future__ import annotations

import re
from collections import Counter

import arc_maskdata_pipeline_plugin_spark.plans.wordpiece as wp

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _tokens(text):
    return [
        re.sub(r"[^a-z0-9]", "", t)
        for t in re.split(r"\s+", text.lower().strip())
        if re.sub(r"[^a-z0-9]", "", t) != ""
    ]


def _ref_train(texts, n_merges=wp.N_WP_MERGES):
    """Independent WordPiece trainer: word counts, ## symbol lists,
    argmax of floor(c_pair*1e18/(c_l*c_r)) with (score, c, lhs, rhs)
    tiebreak, greedy left-to-right merge."""
    words = Counter(w for t in texts for w in _tokens(t))
    segs = {
        w: [w[0]] + ["##" + ch for ch in w[1:]] for w in words
    }
    merges = []
    for step in range(1, n_merges + 1):
        pair_c: Counter = Counter()
        sym_c: Counter = Counter()
        for w, n in words.items():
            sy = segs[w]
            for s in sy:
                sym_c[s] += n
            for a, b in zip(sy, sy[1:]):
                pair_c[(a, b)] += n
        if not pair_c:
            break
        scored = [
            (n * 10**18 // (sym_c[a] * sym_c[b]), n, a, b)
            for (a, b), n in pair_c.items()
        ]
        # max score, then max count, then LEXICOGRAPHIC MIN (lhs, rhs)
        score, c, lhs, rhs = max(
            scored, key=lambda t: (t[0], t[1], _neg_str(t[2]), _neg_str(t[3]))
        )
        merged = lhs + (rhs[2:] if rhs.startswith("##") else rhs)
        merges.append((step, lhs, rhs, merged, c, score))
        for w in segs:
            sy = segs[w]
            out, i = [], 0
            while i < len(sy):
                if i + 1 < len(sy) and sy[i] == lhs and sy[i + 1] == rhs:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sy[i])
                    i += 1
            segs[w] = out
    alphabet = {
        s for w in words for s in ([w[0]] + ["##" + ch for ch in w[1:]])
    }
    vocab = alphabet | {m[3] for m in merges}
    return words, merges, vocab


class _neg_str(str):
    """Invert string ordering so max() picks the lexicographic MIN."""

    def __lt__(self, other):
        return str.__gt__(self, other)

    def __gt__(self, other):
        return str.__lt__(self, other)


def _ref_encode(word, vocab):
    """Greedy longest-match-first; whole word -> [UNK] on any miss."""
    pos, k = 0, 0
    while pos < len(word):
        j = min(len(word) - pos, wp._LMAX)
        while j > 0:
            cand = word[pos : pos + j] if pos == 0 else "##" + word[pos : pos + j]
            if cand in vocab:
                break
            j -= 1
        if j == 0:
            return 1, True  # [UNK]
        pos += j
        k += 1
    return k, False


def _run(spark, texts, fn):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    orig = wp.T
    try:
        wp.T = lambda sp, sf, name: sp.createDataFrame(rows, DOC_SCHEMA)
        # sf_dir "x" is reused across corpora — the session artifact memo
        # must not leak between tests
        wp._TRAIN_MEMO.clear()
        return fn(spark, "x").collect()
    finally:
        wp.T = orig
        wp._TRAIN_MEMO.clear()


CORPUS = [
    "the winding wind winds through the window",
    "she sells sea shells by the sea shore",
    "liquid quick quiet quilt",
    "finish the fish dish with relish",
]


def test_train_matches_reference():
    # pure-Python self-check first: reference trainer is internally sane
    words, merges, _ = _ref_train(CORPUS)
    assert len(merges) == wp.N_WP_MERGES
    assert all(m[5] <= 10**18 for m in merges)


def test_train_matches_reference_on_spark(spark):
    _, want, _ = _ref_train(CORPUS)
    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"],
         r["score_fp18"])
        for r in sorted(
            _run(spark, CORPUS, wp.q_wordpiece_train_merges),
            key=lambda r: r["step"],
        )
    ]
    assert got == want


def test_score_diverges_from_raw_count():
    # corpus engineered so the HIGHEST-COUNT pair is NOT the
    # highest-score pair: 'aa' dominates counts but 'a' is so frequent
    # that the rarer 'xy' pair wins the likelihood score — proving the
    # trainer implements WordPiece, not BPE
    texts = ["aa " * 50 + "xy " * 3 + "xz ab ba ax ya yb ay " * 2]
    words, merges, _ = _ref_train(texts, n_merges=1)
    pair_counts = Counter()
    for w, n in words.items():
        sy = [w[0]] + ["##" + c for c in w[1:]]
        for a, b in zip(sy, sy[1:]):
            pair_counts[(a, b)] += n
    top_by_count = max(pair_counts.items(), key=lambda kv: kv[1])[0]
    assert (merges[0][1], merges[0][2]) != top_by_count


def test_score_diverges_on_spark(spark):
    texts = ["aa " * 50 + "xy " * 3 + "xz ab ba ax ya yb ay " * 2]
    _, want, _ = _ref_train(texts)
    got = [
        (r["step"], r["lhs"], r["rhs"], r["merged"], r["pair_count"],
         r["score_fp18"])
        for r in sorted(
            _run(spark, texts, wp.q_wordpiece_train_merges),
            key=lambda r: r["step"],
        )
    ]
    assert got == want


def test_encode_matches_reference_greedy(spark):
    _, _, vocab = _ref_train(CORPUS)
    got = {
        r["doc_id"]: (r["n_words"], r["n_wp_tokens"], r["n_unk_words"])
        for r in _run(spark, CORPUS, wp.q_wordpiece_encode)
    }
    want = {}
    for i, t in enumerate(CORPUS):
        toks = [w for w in _tokens(t) if 0 < len(w) <= wp._LMAX]
        n_tok = n_unk = 0
        for w in toks:
            k, unk = _ref_encode(w, vocab)
            n_tok += k
            n_unk += int(unk)
        want[i] = (len(toks), n_tok, n_unk)
    assert got == want
    # in-corpus encode can never miss: the alphabet covers every position
    assert all(v[2] == 0 for v in got.values())


def test_single_char_and_repeated_words(spark):
    texts = ["a a a b ab ab abab"]
    _, want_merges, vocab = _ref_train(texts)
    got = sorted(
        _run(spark, texts, wp.q_wordpiece_train_merges),
        key=lambda r: r["step"],
    )
    assert [(r["lhs"], r["rhs"]) for r in got] == [
        (m[1], m[2]) for m in want_merges
    ]
    enc = _run(spark, texts, wp.q_wordpiece_encode)
    k, unk = _ref_encode("abab", vocab)
    assert not unk
    assert enc[0]["n_wp_tokens"] == sum(
        _ref_encode(w, vocab)[0] for w in _tokens(texts[0])
    )


def test_empty_corpus(spark):
    assert _run(spark, [], wp.q_wordpiece_train_merges) == []
    assert _run(spark, [], wp.q_wordpiece_encode) == []
    # all-punctuation corpus: zero words after normalization
    assert _run(spark, ["!!! ???"], wp.q_wordpiece_train_merges) == []
