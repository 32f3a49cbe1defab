"""NIST SP 800-38G FF1 (functions/ff1.py): the published NIST sample
vectors bit-exact for AES-128/192/256 at radix 10 and 36, plus domain
guards, bijectivity, tweak/key separation, and the registered Spark UDF
path."""

from __future__ import annotations

import pytest

from arc_maskdata_pipeline_plugin_spark.codecs.hmac_sha512 import HmacSHA512
from arc_maskdata_pipeline_plugin_spark.functions.ff1 import (
    ff1_decrypt,
    ff1_encrypt,
    ff1_key,
)

_K128 = bytes.fromhex("2B7E151628AED2A6ABF7158809CF4F3C")
_K192 = bytes.fromhex("2B7E151628AED2A6ABF7158809CF4F3CEF4359D8D580AA4F")
_K256 = bytes.fromhex(
    "2B7E151628AED2A6ABF7158809CF4F3CEF4359D8D580AA4F7F036D6F04FC6A94"
)
_T0 = b""
_T10 = bytes.fromhex("39383736353433323130")
_T11 = bytes.fromhex("3737373770717273373737")

# the nine published FF1 sample vectors (FF1samples.pdf, NIST examples
# page for SP 800-38G): (key, tweak, plaintext, radix, ciphertext)
NIST_VECTORS = [
    (_K128, _T0, "0123456789", 10, "2433477484"),
    (_K128, _T10, "0123456789", 10, "6124200773"),
    (_K128, _T11, "0123456789abcdefghi", 36, "a9tv40mll9kdu509eum"),
    (_K192, _T0, "0123456789", 10, "2830668132"),
    (_K192, _T10, "0123456789", 10, "2496655549"),
    (_K192, _T11, "0123456789abcdefghi", 36, "xbj3kv35jrawxv32ysr"),
    (_K256, _T0, "0123456789", 10, "6657667009"),
    (_K256, _T10, "0123456789", 10, "1001623463"),
    (_K256, _T11, "0123456789abcdefghi", 36, "xs8a0azh2avyalyzuwd"),
]


@pytest.mark.parametrize("key,tweak,pt,radix,ct", NIST_VECTORS)
def test_nist_sample_vectors_bit_exact(key, tweak, pt, radix, ct):
    assert ff1_encrypt(key, tweak, pt, radix) == ct
    assert ff1_decrypt(key, tweak, ct, radix) == pt


def test_minimum_domain_enforced():
    # SP 800-38G requires radix^n >= 10^6 and n >= 2
    for bad, radix in [("12345", 10), ("1", 10), ("abc", 36), ("", 10)]:
        with pytest.raises(ValueError):
            ff1_encrypt(_K128, b"", bad, radix)
        with pytest.raises(ValueError):
            ff1_decrypt(_K128, b"", bad, radix)
    # radix 2 needs n >= 20 (2^19 < 10^6 <= 2^20)
    with pytest.raises(ValueError):
        ff1_encrypt(_K128, b"", "1" * 19, 2)
    assert len(ff1_encrypt(_K128, b"", "1" * 20, 2)) == 20
    # 36^4 = 1_679_616 >= 10^6, so a 4-char base-36 string is legal
    assert len(ff1_encrypt(_K128, b"", "abcd", 36)) == 4


def test_alphabet_guard():
    with pytest.raises(ValueError):
        ff1_encrypt(_K128, b"", "12345a", 10)  # 'a' outside radix 10
    with pytest.raises(ValueError):
        ff1_encrypt(_K128, b"", "٣٤٣٤٣٤", 10)  # non-ASCII digits


def test_bijective_on_six_digit_slice():
    seen = set()
    for i in range(2000):
        s = f"{i:06d}"
        e = ff1_encrypt(_K128, b"t", s, 10)
        assert len(e) == 6 and e.isdigit() and e.isascii()
        assert ff1_decrypt(_K128, b"t", e, 10) == s
        seen.add(e)
    assert len(seen) == 2000


def test_tweak_and_key_separation():
    assert ff1_encrypt(_K128, b"a", "12345678", 10) != ff1_encrypt(
        _K128, b"b", "12345678", 10
    )
    assert ff1_encrypt(_K128, b"a", "12345678", 10) != ff1_encrypt(
        _K256, b"a", "12345678", 10
    )


def test_ff1_key_derivation_sizes():
    codec = HmacSHA512()
    pw = b"x" * 64
    for size in (16, 24, 32):
        k = ff1_key(codec, pw, size)
        assert len(k) == size
    with pytest.raises(ValueError):
        ff1_key(codec, pw, 20)
    # deterministic and prefix-consistent (same codec hash, truncated)
    assert ff1_key(codec, pw, 16) == ff1_key(codec, pw, 32)[:16]


def test_registered_udfs_roundtrip(spark):
    from arc_maskdata_pipeline_plugin_spark.functions.ff1 import (
        register_ff1_udfs,
    )

    register_ff1_udfs(
        spark, codec=HmacSHA512(), passphrase=b"p" * 64, prefix="t_"
    )
    df = spark.createDataFrame(
        [(f"{i:07d}",) for i in range(50)] + [(None,)], "v string"
    )
    df.createOrReplaceTempView("_ff1_t")
    out = spark.sql(
        """
        SELECT v, t_mask_ff1_encrypt('col', v) AS e,
               t_mask_ff1_decrypt('col', t_mask_ff1_encrypt('col', v)) AS d
        FROM _ff1_t
        """
    ).collect()
    for r in out:
        if r["v"] is None:
            assert r["e"] is None and r["d"] is None
        else:
            assert r["e"] != r["v"] and len(r["e"]) == 7
            assert r["d"] == r["v"]


def test_referential_audit_empty_input(spark):
    """Zero-row orders/customer (fresh tenant): the audit emits its single
    all-zero witness row — counts 0, no NULL poisoning, no throw."""
    import arc_maskdata_pipeline_plugin_spark.plans.masking_queries as mq

    orig = mq.T
    schemas = {
        "orders": (
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_orderdate timestamp, o_totalprice double, "
            "o_orderpriority string"
        ),
        "customer": (
            "c_custkey long, c_mktsegment string, c_nationkey long, "
            "c_acctbal double"
        ),
    }
    try:
        mq.T = lambda sp, sf, name: sp.createDataFrame([], schemas[name])
        rows = mq.q_mask_ff1_referential(spark, "x").collect()
    finally:
        mq.T = orig
    assert len(rows) == 1
    r = rows[0]
    assert r["n_keys"] == 0 and r["plain_join_rows"] == 0
    assert r["format_bad"] == 0 and r["roundtrip_mismatch"] == 0
