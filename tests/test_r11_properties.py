"""Property-based tests (hypothesis) for the round-11 surface: FF3/FF3-1
(roundtrip, format preservation, tweak/mode separation over arbitrary
domains), WordPiece greedy matching (reconstruction + maximality
invariants), the fixed-point Fellegi-Sunter EM (bounds, determinism,
degenerate counts), and Mann-Kendall's integer verdict algebra."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from arc_maskdata_pipeline_plugin_spark.functions.ff3 import (
    ff3_1_decrypt,
    ff3_1_encrypt,
    ff3_decrypt,
    ff3_encrypt,
)
from arc_maskdata_pipeline_plugin_spark.plans.linkage import (
    _FP,
    _em_fixed_point,
)

_KEY = bytes(range(16))
_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"


def _numeral_strings(radix, min_size, max_size):
    return st.text(
        alphabet=_DIGITS[:radix], min_size=min_size, max_size=max_size
    )


@settings(max_examples=150, deadline=None)
@given(
    radix=st.sampled_from([10, 16, 26, 36]),
    tweak=st.binary(min_size=7, max_size=7),
    data=st.data(),
)
def test_ff3_1_roundtrip_and_format(radix, tweak, data):
    # minlen: radix^n >= 10^6
    minlen = 1
    while radix**minlen < 10**6:
        minlen += 1
    x = data.draw(_numeral_strings(radix, minlen, minlen + 10))
    ct = ff3_1_encrypt(_KEY, tweak, x, radix)
    assert len(ct) == len(x)
    assert all(c in _DIGITS[:radix] for c in ct)
    assert ff3_1_decrypt(_KEY, tweak, ct, radix) == x


@settings(max_examples=100, deadline=None)
@given(
    tweak=st.binary(min_size=8, max_size=8),
    x=_numeral_strings(10, 6, 20),
)
def test_ff3_original_roundtrip_and_mode_separation(tweak, x):
    ct = ff3_encrypt(_KEY, tweak, x, 10)
    assert ff3_decrypt(_KEY, tweak, ct, 10) == x
    # FF3 (8-byte tweak) and FF3-1 (first 7 bytes) are different tweak
    # schedules — agreement only in the measure-zero case where the
    # dropped byte/shifted nibbles coincide; assert decryptability under
    # the SAME mode, not across modes
    ct31 = ff3_1_encrypt(_KEY, tweak[:7], x, 10)
    assert ff3_1_decrypt(_KEY, tweak[:7], ct31, 10) == x


@settings(max_examples=60, deadline=None)
@given(
    t1=st.binary(min_size=7, max_size=7),
    t2=st.binary(min_size=7, max_size=7),
    x=_numeral_strings(10, 8, 12),
)
def test_ff3_1_tweak_separation(t1, t2, x):
    c1 = ff3_1_encrypt(_KEY, t1, x)
    c2 = ff3_1_encrypt(_KEY, t2, x)
    if t1 == t2:
        assert c1 == c2
    # distinct tweaks *may* collide on a single plaintext only with
    # 2^-~60 probability; flag deterministic equality of the full maps
    # instead of asserting inequality on one point
    elif c1 == c2:
        x2 = "0" * len(x) if x != "0" * len(x) else "1" * len(x)
        assert ff3_1_encrypt(_KEY, t1, x2) != ff3_1_encrypt(_KEY, t2, x2)


# ---- WordPiece greedy invariants -----------------------------------------


def _greedy(word, vocab, lmax=12):
    pos, pieces = 0, []
    while pos < len(word):
        j = min(len(word) - pos, lmax)
        while j > 0:
            cand = word[pos : pos + j] if pos == 0 else "##" + word[pos : pos + j]
            if cand in vocab:
                break
            j -= 1
        if j == 0:
            return None  # [UNK]
        pieces.append(word[pos : pos + j])
        pos += j
    return pieces


@settings(max_examples=150, deadline=None)
@given(
    word=st.text(alphabet="abcd", min_size=1, max_size=12),
    extra=st.lists(
        st.text(alphabet="abcd", min_size=2, max_size=4), max_size=8
    ),
)
def test_wordpiece_greedy_reconstructs_and_is_maximal(word, extra):
    # vocab always contains the full alphabet (as the trainer guarantees
    # for in-corpus words) plus arbitrary multi-char pieces
    vocab = {c for c in "abcd"} | {"##" + c for c in "abcd"}
    for p in extra:
        vocab.add(p)
        vocab.add("##" + p)
    pieces = _greedy(word, vocab)
    assert pieces is not None
    # reconstruction: concatenation equals the word
    assert "".join(pieces) == word
    # maximality: at each step no LONGER vocab piece matched
    pos = 0
    for p in pieces:
        for j in range(len(p) + 1, min(len(word) - pos, 12) + 1):
            cand = (
                word[pos : pos + j] if pos == 0 else "##" + word[pos : pos + j]
            )
            assert cand not in vocab
        pos += len(p)


# ---- fixed-point EM bounds / determinism ---------------------------------


@settings(max_examples=100, deadline=None)
@given(
    counts=st.dictionaries(
        st.integers(min_value=0, max_value=15),
        st.integers(min_value=0, max_value=10**7),
        max_size=16,
    )
)
def test_em_bounds_and_determinism(counts):
    p1, m1, u1, w1 = _em_fixed_point(counts)
    p2, m2, u2, w2 = _em_fixed_point(dict(counts))
    assert (p1, m1, u1, w1) == (p2, m2, u2, w2)  # pure function
    assert 1 <= p1 <= _FP - 1
    for v in m1 + u1:
        assert 1 <= v <= _FP - 1
    for g, wv in w1.items():
        assert 0 <= wv <= _FP


def test_em_all_agree_vs_all_disagree_separation():
    # two clearly separated populations: EM must rank the all-agree
    # pattern above the all-disagree pattern
    counts = {15: 500, 0: 5000}
    _p, _m, _u, w = _em_fixed_point(counts)
    assert w[15] > w[0]


# ---- Mann-Kendall verdict algebra ----------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-10**6, max_value=10**6),
                min_size=2, max_size=40))
def test_mk_identities(cents):
    n = len(cents)
    s = sum(
        (cents[j] > cents[i]) - (cents[j] < cents[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(
        t * (t - 1) * (2 * t + 5) for t in Counter(cents).values() if t > 1
    )
    var18 = n * (n - 1) * (2 * n + 5) - ties
    # |S| can never exceed the number of pairs
    assert abs(s) <= n * (n - 1) // 2
    # ties only ever REDUCE the variance; all-distinct attains the max
    assert 0 <= var18 <= n * (n - 1) * (2 * n + 5)
    if len(set(cents)) == n:
        assert var18 == n * (n - 1) * (2 * n + 5)
    if len(set(cents)) == 1:
        assert s == 0 and var18 == 0


# ---- Benford audit on constructed distributions --------------------------


def test_benford_constructed(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.quality as q

    ORD_SCHEMA = "o_orderkey long, o_custkey long, o_totalprice double"

    def run(prices):
        rows = [(i, 1, p) for i, p in enumerate(prices)]
        orig = q.T
        try:
            q.T = lambda sp, sf, name: sp.createDataFrame(rows, ORD_SCHEMA)
            return {
                r["digit"]: r
                for r in q.q_benford_digit_audit(spark, "x").collect()
            }
        finally:
            q.T = orig

    # Benford-distributed magnitudes: p = 10^(u) for u uniform-ish grid —
    # first digits follow Benford closely -> chi2 small, verdict ok
    import math

    benford = [10 ** (3 + (i * 997 % 1000) / 1000.0) for i in range(2000)]
    got = run(benford)
    assert set(got) == set(range(1, 10))
    r = got[1]
    assert r["benford_ok"] == 1, r["chi2_fp6"]
    assert r["n_total"] == 2000
    # uniform prices in [1000, 9999]: every first digit equally likely —
    # grossly non-Benford -> verdict fails
    uniform = [1000.0 + i * 4.4995 for i in range(2000)]
    got_u = run(uniform)
    assert got_u[1]["benford_ok"] == 0
    assert got_u[1]["chi2_fp6"] > got[1]["chi2_fp6"]
    # zero/negative rows are excluded; empty input -> zero-filled grid
    got_e = run([-5.0, 0.0])
    assert all(got_e[d]["n_obs"] == 0 for d in range(1, 10))
    assert got_e[1]["n_total"] == 0 and got_e[1]["chi2_fp6"] == 0
