"""Format-preserving encryption (functions/fpe.py): bijectivity on a full
domain, exact invertibility, format preservation, determinism, tweak and
key separation — plus the registered referential audit's semantics on a
constructed star."""

from __future__ import annotations

import datetime

import pytest

from arc_maskdata_pipeline_plugin_spark.codecs.hmac_sha512 import HmacSHA512
from arc_maskdata_pipeline_plugin_spark.functions.fpe import (
    fpe_decrypt_digits,
    fpe_encrypt_digits,
    fpe_key,
)

_PASS = b"engine-test-passphrase-0123456789abcdefghijklmnopqrstuvwxyz-0123"
_KEY = fpe_key(HmacSHA512(), _PASS)


def test_bijective_on_full_two_digit_domain():
    outs = {fpe_encrypt_digits(_KEY, "t", f"{i:02d}") for i in range(100)}
    assert len(outs) == 100
    assert all(len(o) == 2 and o.isdigit() for o in outs)


def test_bijective_and_invertible_on_full_four_digit_domain():
    seen = set()
    for i in range(10_000):
        s = f"{i:04d}"
        e = fpe_encrypt_digits(_KEY, "t", s)
        assert len(e) == 4 and e.isdigit()
        assert fpe_decrypt_digits(_KEY, "t", e) == s
        seen.add(e)
    assert len(seen) == 10_000  # a permutation of the domain


def test_roundtrip_various_lengths():
    for s in ["0", "7", "42", "000", "999999", "12345678901234567890"]:
        e = fpe_encrypt_digits(_KEY, "col", s)
        assert len(e) == len(s) and e.isdigit()
        assert fpe_decrypt_digits(_KEY, "col", e) == s


def test_deterministic_and_tweak_separated():
    assert fpe_encrypt_digits(_KEY, "a", "12345678") == fpe_encrypt_digits(
        _KEY, "a", "12345678"
    )
    assert fpe_encrypt_digits(_KEY, "a", "12345678") != fpe_encrypt_digits(
        _KEY, "b", "12345678"
    )


def test_key_separation():
    other = fpe_key(HmacSHA512(), b"x" * 64)
    assert fpe_encrypt_digits(_KEY, "a", "12345678") != fpe_encrypt_digits(
        other, "a", "12345678"
    )


def test_none_passthrough_and_domain_check():
    assert fpe_encrypt_digits(_KEY, "a", None) is None
    assert fpe_decrypt_digits(_KEY, "a", None) is None
    with pytest.raises(ValueError):
        fpe_encrypt_digits(_KEY, "a", "12a4")


def test_non_ascii_digits_rejected():
    # str.isdigit() alone would accept these; int() would silently
    # normalize '٣٤'→34 (breaking decrypt(encrypt(x)) == x) and crash on
    # '²' — so the domain check must reject BEFORE any arithmetic.
    for bad in ["٣٤", "²", "１２", "4٤"]:
        with pytest.raises(ValueError):
            fpe_encrypt_digits(_KEY, "a", bad)
        with pytest.raises(ValueError):
            fpe_decrypt_digits(_KEY, "a", bad)


def test_single_digit_is_keyed_permutation_not_rotation():
    outs = [fpe_encrypt_digits(_KEY, "t", str(i)) for i in range(10)]
    assert sorted(outs) == [str(i) for i in range(10)]  # bijective
    for i in range(10):
        assert fpe_decrypt_digits(_KEY, "t", outs[i]) == str(i)
    # NOT an additive rotation: enc(v) - v mod 10 must not be constant
    shifts = {(int(outs[i]) - i) % 10 for i in range(10)}
    assert len(shifts) > 1
    # tweak separation holds on the degenerate path too
    outs_b = [fpe_encrypt_digits(_KEY, "u", str(i)) for i in range(10)]
    assert outs != outs_b


def test_referential_audit_on_constructed_star(spark, tmp_path):
    """3 customers, orders referencing them (and one dangling custkey):
    plain join = fpe join = 4 rows; all witnesses green."""
    cust = [(k, "SEG", 1, 10.0) for k in (1, 2, 3)]
    spark.createDataFrame(
        cust, "c_custkey bigint, c_mktsegment string, c_nationkey bigint,"
        " c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    orders = [
        (i + 1, k, "F", 1.0, datetime.datetime(1995, 1, 1), "1-URGENT")
        for i, k in enumerate([1, 1, 2, 3, 99])
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.masking_queries import (
        q_mask_fpe_referential,
    )

    [r] = q_mask_fpe_referential(spark, str(tmp_path)).collect()
    assert r["n_keys"] == 4  # custkeys 1, 2, 3, 99 in orders
    assert r["n_enc_distinct"] == 4
    assert r["format_bad"] == 0
    assert r["roundtrip_mismatch"] == 0
    assert r["plain_join_rows"] == 4 == r["fpe_join_rows"]
    assert r["referential_ok"] == 1


def test_loo_influence_hand_computed(spark, tmp_path):
    """Sources A (2 docs, 2+4=6 tokens) and B (1 doc, 12 tokens):
    overall mean 6, without A mean 12 (+6), without B mean 3 (−3)."""
    docs = [
        (1, "w w", "en", "A"),
        (2, "w w w w", "en", "A"),
        (3, " ".join(["w"] * 12), "en", "B"),
    ]
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.training2 import (
        q_loo_source_influence,
    )

    got = {
        r["source"]: (r["overall_mean_fp6"], r["loo_mean_fp6"], r["influence_fp6"])
        for r in q_loo_source_influence(spark, str(tmp_path)).collect()
    }
    assert got["A"] == (6_000_000, 12_000_000, 6_000_000), got
    assert got["B"] == (6_000_000, 3_000_000, -3_000_000), got
