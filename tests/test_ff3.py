"""NIST SP 800-38G FF3 (functions/ff3.py): the fifteen published NIST
sample vectors bit-exact for AES-128/192/256 at radix 10 and 26, plus
FF3-1 tweak-split correctness, domain guards, bijectivity, and tweak/key
separation."""

from __future__ import annotations

import pytest

from arc_maskdata_pipeline_plugin_spark.codecs.hmac_sha512 import HmacSHA512
from arc_maskdata_pipeline_plugin_spark.functions.ff3 import (
    _split_tweak_ff3_1,
    ff3_1_decrypt,
    ff3_1_encrypt,
    ff3_decrypt,
    ff3_encrypt,
    ff3_key,
)

_K128 = bytes.fromhex("EF4359D8D580AA4F7F036D6F04FC6A94")
_K192 = bytes.fromhex("EF4359D8D580AA4F7F036D6F04FC6A942B7E151628AED2A6")
_K256 = bytes.fromhex(
    "EF4359D8D580AA4F7F036D6F04FC6A942B7E151628AED2A6ABF7158809CF4F3C"
)
_T1 = bytes.fromhex("D8E7920AFA330A73")
_T2 = bytes.fromhex("9A768A92F60E12D8")
_T0 = bytes.fromhex("0000000000000000")

# the fifteen published FF3 sample vectors (FF3samples.pdf, NIST examples
# page for SP 800-38G): (key, tweak, plaintext, radix, ciphertext)
NIST_VECTORS = [
    (_K128, _T1, "890121234567890000", 10, "750918814058654607"),
    (_K128, _T2, "890121234567890000", 10, "018989839189395384"),
    (_K128, _T1, "89012123456789000000789000000", 10,
     "48598367162252569629397416226"),
    (_K128, _T0, "89012123456789000000789000000", 10,
     "34695224821734535122613701434"),
    (_K128, _T2, "0123456789abcdefghi", 26, "g2pk40i992fn20cjakb"),
    (_K192, _T1, "890121234567890000", 10, "646965393875028755"),
    (_K192, _T2, "890121234567890000", 10, "961610514491424446"),
    (_K192, _T1, "89012123456789000000789000000", 10,
     "53048884065350204541786380807"),
    (_K192, _T0, "89012123456789000000789000000", 10,
     "98083802678820389295041483512"),
    (_K192, _T2, "0123456789abcdefghi", 26, "i0ihe2jfj7a9opf9p88"),
    (_K256, _T1, "890121234567890000", 10, "922011205562777495"),
    (_K256, _T2, "890121234567890000", 10, "504149865578056140"),
    (_K256, _T1, "89012123456789000000789000000", 10,
     "04344343235792599165734622699"),
    (_K256, _T0, "89012123456789000000789000000", 10,
     "30859239999374053872365555822"),
    (_K256, _T2, "0123456789abcdefghi", 26, "p0b2godfja9bhb7bk38"),
]


@pytest.mark.parametrize("key,tweak,pt,radix,ct", NIST_VECTORS)
def test_nist_sample_vectors_bit_exact(key, tweak, pt, radix, ct):
    assert ff3_encrypt(key, tweak, pt, radix) == ct
    assert ff3_decrypt(key, tweak, ct, radix) == pt


def test_ff3_1_tweak_split_bit_layout():
    # TL = T[0..27] || 0^4 ; TR = T[32..55] || T[28..31] || 0^4
    t = bytes.fromhex("ABCDEF12345678")
    tl, tr = _split_tweak_ff3_1(t)
    assert tl == bytes.fromhex("ABCDEF10")
    assert tr == bytes.fromhex("34567820")
    # an all-zero 56-bit tweak maps to the FF3 all-zero 64-bit halves, so
    # FF3-1(T=0) must equal FF3(T=0) — the round function is shared
    assert ff3_1_encrypt(_K128, bytes(7), "890121234567890000") == ff3_encrypt(
        _K128, _T0[:8], "890121234567890000"
    )


def test_ff3_1_roundtrip_and_separation():
    t_a = bytes.fromhex("00112233445566")
    t_b = bytes.fromhex("00112233445567")
    for pt in ["890121234567890000", "00000000", "99999999"]:
        ct = ff3_1_encrypt(_K128, t_a, pt)
        assert len(ct) == len(pt) and ct.isdigit()
        assert ff3_1_decrypt(_K128, t_a, ct) == pt
        # tweak separation: different tweak -> different ciphertext
        assert ff3_1_encrypt(_K128, t_b, pt) != ct
    # key separation
    assert ff3_1_encrypt(_K192, t_a, "890121234567890000") != ff3_1_encrypt(
        _K128, t_a, "890121234567890000"
    )


def test_bijectivity_small_domain():
    # radix 10, n=6 is the smallest legal domain (10^6); spot-check a
    # contiguous slice is injective and format-preserving
    t = bytes.fromhex("00000000000000")
    seen = set()
    for i in range(2000):
        ct = ff3_1_encrypt(_K128, t, f"{i:06d}")
        assert len(ct) == 6 and ct.isdigit()
        assert ct not in seen
        seen.add(ct)


def test_domain_guards():
    for bad, radix in [("12345", 10), ("1", 10), ("abc", 26), ("", 10)]:
        with pytest.raises(ValueError):
            ff3_1_encrypt(_K128, bytes(7), bad, radix)
    # maxlen: n > 2*floor(96/log2(radix)) rejected (radix 10 -> 56)
    with pytest.raises(ValueError):
        ff3_encrypt(_K128, _T0, "1" * 57, 10)
    assert len(ff3_encrypt(_K128, _T0, "1" * 56, 10)) == 56
    # tweak widths are mode-mandated
    with pytest.raises(ValueError):
        ff3_encrypt(_K128, bytes(7), "890121234567890000")
    with pytest.raises(ValueError):
        ff3_1_encrypt(_K128, bytes(8), "890121234567890000")


def test_key_derivation_separated_from_ff1():
    from arc_maskdata_pipeline_plugin_spark.functions.ff1 import ff1_key

    codec = HmacSHA512()
    pp = b"p" * 64
    assert ff3_key(codec, pp) != ff1_key(codec, pp)
    assert len(ff3_key(codec, pp, 32)) == 32
    with pytest.raises(ValueError):
        ff3_key(codec, pp, 20)


def test_registered_udfs_null_propagation(spark):
    from arc_maskdata_pipeline_plugin_spark.functions.ff3 import (
        register_ff3_udfs,
    )

    register_ff3_udfs(
        spark, codec=HmacSHA512(), passphrase=b"q" * 64, prefix="t_"
    )
    df = spark.createDataFrame(
        [("ctx", "12345678"), (None, "12345678"), ("ctx", None)],
        "t string, v string",
    )
    rows = df.selectExpr(
        "t_mask_ff3_encrypt(t, v) AS e",
        "t_mask_ff3_decrypt(t, t_mask_ff3_encrypt(t, v)) AS rt",
    ).collect()
    assert rows[0]["e"] is not None and rows[0]["rt"] == "12345678"
    assert rows[1]["e"] is None and rows[1]["rt"] is None
    assert rows[2]["e"] is None and rows[2]["rt"] is None
