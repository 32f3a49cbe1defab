"""Interpolated Kneser-Ney bigram LM (plans/lm.py q_kneser_ney_perplexity):
the defining identity Σ_w₂ p_KN(w₂|w₁) = 1 pinned with EXACT Fractions on a
constructed corpus, engine nll9 values re-derived independently in Python,
and the degenerate n₁=n₂=0 → MLE fallback."""

from __future__ import annotations

import math
from collections import Counter
from fractions import Fraction

import arc_maskdata_pipeline_plugin_spark.plans.lm as lm

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _kn_model(docs: list[str]):
    """Exact-Fraction KN bigram model from token lists."""
    bc = Counter()
    for d in docs:
        toks = d.split()
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] += 1
    cw = Counter()
    n1p = Counter()
    n1c = Counter()
    for (a, b), c in bc.items():
        cw[a] += c
        n1p[a] += 1
        n1c[b] += 1
    n1pp = len(bc)
    n1 = sum(1 for c in bc.values() if c == 1)
    n2 = sum(1 for c in bc.values() if c == 2)
    dd = max(n1 + 2 * n2, 1)
    d_frac = Fraction(n1, dd)

    def p(w1, w2):
        c = bc.get((w1, w2), 0)
        disc = max(Fraction(c) - d_frac, Fraction(0)) / Fraction(cw[w1])
        lam = d_frac * n1p[w1] / cw[w1]
        return disc + lam * Fraction(n1c.get(w2, 0), n1pp)

    return bc, cw, n1p, n1c, n1pp, n1, n2, dd, p


CORPUS = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "a cat and a dog",
    "the cat ate the fish",
    "fish and chips and fish",
]


def test_kn_distribution_sums_to_one_exactly():
    bc, cw, n1p, n1c, n1pp, n1, n2, dd, p = _kn_model(CORPUS)
    assert n1 > 0  # constructed corpus has singleton bigrams
    vocab = {w for (_, b) in bc for w in (b,)} | {a for (a, _) in bc}
    for w1 in {a for (a, _) in bc}:
        total = sum(p(w1, w2) for w2 in vocab)
        assert total == Fraction(1), (w1, total)


def test_engine_nll9_matches_independent_python(spark):
    rows = [
        (i, t, "en", "s%d" % (i % 2), len(t)) for i, t in enumerate(CORPUS)
    ]
    orig = lm.T
    try:
        lm.T = lambda sp, sf, name: sp.createDataFrame(rows, DOC_SCHEMA)
        out = {
            r["source"]: r
            for r in lm.q_kneser_ney_perplexity(spark, "x").collect()
        }
    finally:
        lm.T = orig
    bc, cw, n1p, n1c, n1pp, n1, n2, dd, p = _kn_model(CORPUS)
    # independent per-source expected values, reproducing the fp9-floored
    # per-TYPE nll discipline
    exp = {}
    for i, t in enumerate(CORPUS):
        src = "s%d" % (i % 2)
        toks = t.split()
        for a, b in zip(toks, toks[1:]):
            c = bc[(a, b)]
            num = max(c * dd - n1, 0) * n1pp + n1 * n1p[a] * n1c[b]
            den = cw[a] * dd * n1pp
            nll9 = math.floor((math.log(den) - math.log(num)) * 1e9)
            s, n = exp.get(src, (0, 0))
            exp[src] = (s + nll9, n + 1)
    for src, (s, n) in exp.items():
        want = (s * 1_000_000) // (n * 1_000_000_000)
        got = out[src]
        assert got["kn_nll_fp6"] == want, (src, got["kn_nll_fp6"], want)
        assert got["n_bigrams"] == n
        assert got["n1"] == n1 and got["n2"] == n2
        assert got["discount_fp9"] == (n1 * 1_000_000_000) // dd
        assert got["bigram_types"] == n1pp


def test_degenerate_no_singletons_reduces_to_mle(spark):
    # every bigram occurs exactly 3 times -> n1 = n2 = 0, D = 0, KN == MLE
    docs = ["x y z"] * 3
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)]
    orig = lm.T
    try:
        lm.T = lambda sp, sf, name: sp.createDataFrame(rows, DOC_SCHEMA)
        out = lm.q_kneser_ney_perplexity(spark, "x").collect()
    finally:
        lm.T = orig
    assert len(out) == 1
    r = out[0]
    assert r["n1"] == 0 and r["n2"] == 0 and r["discount_fp9"] == 0
    # MLE: p(y|x) = p(z|y) = 1 -> nll = 0 exactly
    assert r["kn_nll_fp6"] == 0
    # and the Fraction model agrees
    *_, p = _kn_model(docs)
    assert p("x", "y") == 1 and p("y", "z") == 1
