"""Property tests for the round-4 operator families."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from arc_maskdata_pipeline_plugin_spark.codecs.hmac_sha512 import HmacSHA512
from arc_maskdata_pipeline_plugin_spark.functions.masking import (
    luhn_valid,
    mask_credit_card_value,
)
from arc_maskdata_pipeline_plugin_spark.operators.layout import zorder_sql

PASSPHRASE = b"engine-test-passphrase-0123456789abcdefghijklmnopqrstuvwxyz-0123"
_CODEC = HmacSHA512()


@settings(max_examples=60, deadline=None)
@given(
    digits=st.text(alphabet="0123456789", min_size=8, max_size=19),
    sep=st.sampled_from(["", " ", "-"]),
)
def test_card_mask_properties(digits, sep):
    """For ANY valid-length digit string: masked output is Luhn-valid,
    BIN-preserving, layout-preserving, and deterministic."""
    value = sep.join([digits[i : i + 4] for i in range(0, len(digits), 4)])
    m = mask_credit_card_value(_CODEC, PASSPHRASE, True, value)
    md = "".join(c for c in m if c.isdigit())
    assert len(md) == len(digits)
    assert luhn_valid(md)
    assert md[:6] == digits[:6]
    # layout: non-digit positions unchanged
    assert [(i, c) for i, c in enumerate(m) if not c.isdigit()] == [
        (i, c) for i, c in enumerate(value) if not c.isdigit()
    ]
    assert m == mask_credit_card_value(_CODEC, PASSPHRASE, True, value)


@settings(max_examples=30, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 255), st.integers(0, 255)), min_size=1, max_size=50
    )
)
def test_morton_formula_matches_reference_bits(pts):
    """The generated Spark/DuckDB expressions encode the same Morton function
    as the bit-twiddling reference, for arbitrary points."""
    import duckdb

    expr = zorder_sql("x", "y", 8, "duckdb")
    con = duckdb.connect()
    rows = ", ".join(f"({x}, {y})" for x, y in pts)
    got = con.execute(
        f"SELECT {expr} FROM (VALUES {rows}) t(x, y)"
    ).fetchall()

    def ref(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert [g[0] for g in got] == [ref(x, y) for x, y in pts]


def test_suppression_guarantees_k_anonymity(spark):
    """After suppression at k, every RELEASED equivalence class (QI values
    not '*') has >= k members — the formal guarantee, on a randomized frame."""
    import random

    from arc_maskdata_pipeline_plugin_spark.operators.privacy import (
        suppress_small_classes,
    )

    rng = random.Random(11)
    rows = [
        (i, rng.randrange(6), rng.choice("abc"), rng.random())
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, ["id", "zip", "job", "score"])
    k = 10
    out = suppress_small_classes(df, ["zip", "job"], k=k).collect()
    released: dict[tuple, int] = {}
    for r in out:
        if r["is_released"]:
            key = (r["zip"], r["job"])
            assert "*" not in key
            released[key] = released.get(key, 0) + 1
    assert released, "randomized frame should release at least one class"
    assert all(n >= k for n in released.values())
