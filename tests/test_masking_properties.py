"""Property-based tests (hypothesis) for the masking core — the reference has
no property tests (SURVEY.md §5); these pin the invariants every mask function
must hold for ANY input, using the fast HMAC codec so thousands of examples
run in seconds.
"""

from __future__ import annotations

import datetime as dt
import string
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from arc_maskdata_pipeline_plugin_spark.codecs.hmac_sha512 import HmacSHA512
from arc_maskdata_pipeline_plugin_spark.functions.masking import (
    encode_as_string,
    mask_date_value,
    mask_decimal_value,
    mask_string_value,
)

PASS = b"q7VqMTbj7e5dUWESfc8UjZr2r7pyq5cHP8MVkUEjyv74cHsqUt734vg6qQmHaz7a"
CODEC = HmacSHA512()

text_values = st.text(min_size=0, max_size=200)
alphabets = st.text(
    alphabet=string.ascii_letters + string.digits, min_size=2, max_size=40
).filter(lambda a: len(set(a)) >= 2)


@settings(max_examples=200, deadline=None)
@given(text_values)
def test_mask_string_deterministic_and_stable(value):
    a = mask_string_value(CODEC, PASS, 16, string.ascii_letters, None, True, value)
    b = mask_string_value(CODEC, PASS, 16, string.ascii_letters, None, True, value)
    assert a == b
    assert len(a) == 16
    assert all(c in string.ascii_letters for c in a)


@settings(max_examples=100, deadline=None)
@given(text_values, alphabets, st.integers(min_value=1, max_value=64))
def test_mask_string_alphabet_and_length(value, alphabet, length):
    out = mask_string_value(CODEC, PASS, length, alphabet, None, True, value)
    assert len(out) == length
    assert all(c in alphabet for c in out)


@settings(max_examples=100, deadline=None)
@given(text_values)
def test_mask_string_nondeterministic_ignores_input(value):
    # non-deterministic mode draws SecureRandom bytes (reference
    # MaskDataPlugin.scala:143-146): two calls on the SAME input differ
    a = mask_string_value(CODEC, PASS, 16, string.ascii_letters, None, False, value)
    b = mask_string_value(CODEC, PASS, 16, string.ascii_letters, None, False, value)
    assert len(a) == len(b) == 16
    assert a != b  # 52^16 space — collision probability negligible


@settings(max_examples=200, deadline=None)
@given(
    st.dates(min_value=dt.date(1900, 1, 1), max_value=dt.date(2100, 1, 1)),
    st.integers(min_value=1, max_value=3650),
)
def test_mask_date_shift_bounded(value, range_):
    out = mask_date_value(CODEC, PASS, range_, True, value)
    shift = (out - value).days
    # signed Java remainder: shift ∈ (-(range-1), range-1)
    assert -range_ < shift < range_
    assert mask_date_value(CODEC, PASS, range_, True, value) == out


@settings(max_examples=200, deadline=None)
@given(
    st.decimals(
        min_value=Decimal("-1e12"),
        max_value=Decimal("1e12"),
        allow_nan=False,
        allow_infinity=False,
        places=4,
    ),
    st.decimals(
        min_value=Decimal("0.01"),
        max_value=Decimal("100000"),
        allow_nan=False,
        allow_infinity=False,
        places=2,
    ),
)
def test_mask_decimal_bounded_and_stable(value, range_):
    out = mask_decimal_value(CODEC, PASS, range_, True, value)
    assert out == mask_decimal_value(CODEC, PASS, range_, True, value)
    # remainder sign follows dividend → |perturbation| < range
    assert abs(out - value) < range_


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=64, max_size=64), alphabets)
def test_encode_as_string_total_and_in_alphabet(digest, alphabet):
    out = encode_as_string(digest, alphabet)
    assert len(out) == 64
    assert all(c in alphabet for c in out)


def test_nulls_are_null():
    assert mask_string_value(CODEC, PASS, 16, string.ascii_letters, None, True, None) is None
    assert mask_date_value(CODEC, PASS, 10, True, None) is None
    assert mask_decimal_value(CODEC, PASS, Decimal("10"), True, None) is None


# ---------------------------------------------------------------------------
# Text chunking vs a pure-Python reference on random documents
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcdefg", min_size=1, max_size=5),
            min_size=0,
            max_size=130,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=10, deadline=None)
def test_text_chunking_matches_python_reference(spark, docs_tokens):
    """Spark's sequence/slice chunking (operators/text.py::with_chunks) must
    equal the obvious Python chunker (50-token windows, stride 40) for any
    token count including 0."""
    from arc_maskdata_pipeline_plugin_spark.operators.text import with_chunks

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = sorted(
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_tokens)
        for r in with_chunks(df, chunk_size=50, stride=40).collect()
    )

    want = []
    for i, toks in enumerate(docs_tokens):
        # split(trim(x), \s+) on an empty/whitespace string yields [""]
        eff = " ".join(toks).strip().split() or [""]
        n = len(eff)
        for ci, s0 in enumerate(range(0, max(n, 1), 40)):
            window = eff[s0 : s0 + 50]
            want.append((i, ci, " ".join(window), len(window)))
    assert got == sorted(want)
