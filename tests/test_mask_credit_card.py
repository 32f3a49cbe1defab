"""Luhn-repaired format-preserving card masking: value-level invariants."""

from __future__ import annotations

import pytest

from arc_maskdata_pipeline_plugin_spark.codecs.pbkdf2 import PBKDF2WithHmacSHA512
from arc_maskdata_pipeline_plugin_spark.functions.masking import (
    luhn_check_digit,
    luhn_valid,
    mask_credit_card_value,
)

PASSPHRASE = b"q7VqMTbj7e5dUWESfc8UjZr2r7pyq5cHP8MVkUEjyv74cHsqUt734vg6qQmHaz7a"


@pytest.fixture(scope="module")
def codec():
    return PBKDF2WithHmacSHA512()


def test_luhn_known_numbers():
    # classic test PANs: 4111111111111111 and 79927398713 are Luhn-valid
    assert luhn_valid("4111111111111111")
    assert luhn_valid("79927398713")
    assert not luhn_valid("4111111111111112")
    assert luhn_check_digit("411111111111111") == "1"
    assert luhn_check_digit("7992739871") == "3"


def _mask(codec, v, det=True):
    return mask_credit_card_value(codec, PASSPHRASE, det, v)


def test_mask_preserves_bin_layout_and_luhn(codec):
    card = "4111 1111 1111 1111"
    m = _mask(codec, card)
    assert m is not None and m != card
    # separator layout intact
    assert [i for i, c in enumerate(m) if c == " "] == [4, 9, 14]
    # issuer BIN preserved
    assert m.replace(" ", "")[:6] == "411111"
    # masked number passes checksum validation
    assert luhn_valid(m.replace(" ", ""))


def test_mask_is_deterministic_and_layout_independent(codec):
    a = _mask(codec, "4111-1111-1111-1111")
    b = _mask(codec, "4111 1111 1111 1111")
    assert a == _mask(codec, "4111-1111-1111-1111")
    # same digits, different separators -> same masked digits
    assert a.replace("-", "") == b.replace(" ", "")
    assert "-" in a and " " in b


def test_mask_null_and_short_inputs(codec):
    assert _mask(codec, None) is None
    with pytest.raises(ValueError, match="8 digits"):
        _mask(codec, "1234567")


def test_nondeterministic_mode_still_luhn_valid(codec):
    m1 = _mask(codec, "5500 0000 0000 0004", det=False)
    m2 = _mask(codec, "5500 0000 0000 0004", det=False)
    assert m1 != m2  # SecureRandom path
    assert luhn_valid(m1.replace(" ", "")) and luhn_valid(m2.replace(" ", ""))
    assert m1.replace(" ", "")[:6] == "550000"


def test_matches_jvm_vectors(codec):
    """The whole path reproduces the JVM-generated literals (the oracle of
    q_mask_credit_cards) — here at the pure-function level, iterations=1000."""
    from arc_maskdata_pipeline_plugin_spark.plans._card_vectors import VECTORS

    c = PBKDF2WithHmacSHA512()
    c.iteration_count = 1000
    for _, card_in, card_masked in VECTORS[:5]:
        assert mask_credit_card_value(c, b"engine-test-passphrase-0123456789abcdefghijklmnopqrstuvwxyz-0123", True, card_in) == card_masked


def test_userdata_lifecycle_typing_semantics(spark):
    """Beyond the VALUES oracle: the lifecycle's TYPING layer must trim the
    name before masking (padded input == clean-input mask), null out the
    nullableValues row, and carry mask metadata through to the OUTPUT schema
    (MetadataUtils.setMetadata parity, MaskDataTransform.scala:153-154)."""
    from arc_maskdata_pipeline_plugin_spark.plans.masking_queries import (
        q_mask_customers_pbkdf2,
        q_userdata_lifecycle,
    )

    sf = "/root/testdata/sf0.001"
    life = q_userdata_lifecycle(spark, sf)
    rows = {r["c_custkey"]: r for r in life.collect()}
    ref = {r["c_custkey"]: r for r in q_mask_customers_pbkdf2(spark, sf).collect()}
    # trim-then-mask: padded '  Customer#...  ' masks identically to the
    # clean c_name the reference query hashes
    for k in (0, 5, 20):
        assert rows[k]["c_name"] == ref[k]["name_masked"]
    # nullableValues '' -> NULL decimal
    assert rows[20]["c_acctbal"] is None
    assert rows[5]["c_acctbal"] == "5.25"
    # masked columns keep their metadata on the pipeline OUTPUT view
    masked_schema = {f.name: f.metadata for f in spark.table("userdata_masked").schema}
    assert "mask" in masked_schema["c_name"]
    assert masked_schema["c_name"].get("pii") is True
