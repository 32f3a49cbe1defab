"""FF3-1 independent validation (VERDICT r11 #6). NIST ships FF3-1
vectors only in the ACVP JSON corpus, which is absent from this image, so
until an owner vendors it the Rev-1 mode is cross-checked against a
SECOND, from-spec implementation written directly from SP 800-38G /
SP 800-38G Rev. 1 pseudocode: independently coded REVB / NUM / STR
(digit-list representation, not the production string pipeline), an
independently coded tweak split and Feistel loop, sharing ONLY the AES
block primitive (itself pinned bit-for-bit by the fifteen published FF3
sample vectors in tests/test_ff3.py). A few hundred seeded
key/tweak/value/radix cases must agree exactly, for both encrypt and
decrypt, for FF3-1 and original FF3."""

from __future__ import annotations

import random

import pytest

from arc_maskdata_pipeline_plugin_spark.functions import ff3 as prod

try:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes
except Exception:  # pragma: no cover - cryptography ships in the image
    Cipher = None

_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"


# ----- independent from-spec implementation (digit lists, spec naming) -----

def _revb(x: bytes) -> bytes:
    return bytes(reversed(x))


def _num(digits, radix):
    # NUM_radix(X) = sum x_i * radix^(n-1-i), written as the spec's
    # left-fold but over an int LIST (production parses chars)
    acc = 0
    for d in digits:
        assert 0 <= d < radix
        acc = acc * radix + d
    return acc


def _strm(x, radix, m):
    # STR_m_radix(x): m base-radix numerals, most significant first
    out = [0] * m
    for i in range(m):
        out[m - 1 - i] = x % radix
        x //= radix
    return out


def _aes_block(key: bytes, block: bytes) -> bytes:
    enc = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    return enc.update(block) + enc.finalize()


def _ff3_core(key, tl, tr, digits, radix, forward):
    n = len(digits)
    u = (n + 1) // 2
    v = n - u
    A, B = digits[:u], digits[u:]
    for i in (range(8) if forward else reversed(range(8))):
        if i % 2 == 0:
            m, W = u, tr
        else:
            m, W = v, tl
        if forward:
            P = bytes(a ^ b for a, b in zip(W, i.to_bytes(4, "big")))
            P += _num(list(reversed(B)), radix).to_bytes(12, "big")
        else:
            P = bytes(a ^ b for a, b in zip(W, i.to_bytes(4, "big")))
            P += _num(list(reversed(A)), radix).to_bytes(12, "big")
        S = _revb(_aes_block(_revb(key), _revb(P)))
        y = int.from_bytes(S, "big")
        if forward:
            c = (_num(list(reversed(A)), radix) + y) % radix**m
            C = list(reversed(_strm(c, radix, m)))
            A, B = B, C
        else:
            c = (_num(list(reversed(B)), radix) - y) % radix**m
            C = list(reversed(_strm(c, radix, m)))
            A, B = C, A
    return A + B


def _split56(t: bytes):
    # TL = T[0..27] || 0^4 ; TR = T[32..55] || T[28..31] || 0^4
    bits = "".join(f"{b:08b}" for b in t)
    tl_bits = bits[0:28] + "0000"
    tr_bits = bits[32:56] + bits[28:32] + "0000"
    tl = int(tl_bits, 2).to_bytes(4, "big")
    tr = int(tr_bits, 2).to_bytes(4, "big")
    return tl, tr


def _ref_ff3_1(key, tweak7, x: str, radix: int, forward: bool) -> str:
    digits = [_DIGITS.index(ch) for ch in x]
    tl, tr = _split56(tweak7)
    out = _ff3_core(key, tl, tr, digits, radix, forward)
    return "".join(_DIGITS[d] for d in out)


def _ref_ff3(key, tweak8, x: str, radix: int, forward: bool) -> str:
    digits = [_DIGITS.index(ch) for ch in x]
    out = _ff3_core(key, tweak8[:4], tweak8[4:], digits, radix, forward)
    return "".join(_DIGITS[d] for d in out)


def _cases(n_cases):
    rng = random.Random(38416)
    for _ in range(n_cases):
        radix = rng.choice([10, 10, 26, 36, 2, 5, 16])
        # Rev-1 domain: radix^n >= 10^6 and n <= 2*floor(96/log2(radix))
        import math

        nmin = max(2, math.ceil(math.log(10**6, radix)))
        nmax = 2 * math.floor(96 / math.log2(radix))
        n = rng.randint(nmin, min(nmax, nmin + 18))
        key = bytes(rng.randrange(256) for _ in range(rng.choice([16, 24, 32])))
        x = "".join(_DIGITS[rng.randrange(radix)] for _ in range(n))
        yield key, x, radix, rng


@pytest.mark.skipif(Cipher is None, reason="cryptography not available")
def test_ff3_1_crosscheck_few_hundred_cases():
    checked = 0
    for key, x, radix, rng in _cases(150):
        t = bytes(rng.randrange(256) for _ in range(7))
        ct_prod = prod.ff3_1_encrypt(key, t, x, radix)
        assert ct_prod == _ref_ff3_1(key, t, x, radix, True)
        assert prod.ff3_1_decrypt(key, t, ct_prod, radix) == x
        assert _ref_ff3_1(key, t, ct_prod, radix, False) == x
        checked += 1
    assert checked == 150


@pytest.mark.skipif(Cipher is None, reason="cryptography not available")
def test_ff3_crosscheck_few_hundred_cases():
    checked = 0
    for key, x, radix, rng in _cases(150):
        t = bytes(rng.randrange(256) for _ in range(8))
        ct_prod = prod.ff3_encrypt(key, t, x, radix)
        assert ct_prod == _ref_ff3(key, t, x, radix, True)
        assert prod.ff3_decrypt(key, t, ct_prod, radix) == x
        assert _ref_ff3(key, t, ct_prod, radix, False) == x
        checked += 1
    assert checked == 150


@pytest.mark.skipif(Cipher is None, reason="cryptography not available")
def test_tweak_split_disagreement_is_detected():
    """The cross-check has TEETH: a deliberately wrong Rev-1 tweak split
    (the pre-Rev-1 64-bit halving applied to a padded 56-bit tweak) must
    NOT match the production split on tweaks whose low nibble of byte 3
    is nonzero."""
    key = bytes(range(16))
    t = bytes([0x12, 0x34, 0x56, 0x7F, 0x9A, 0xBC, 0xDE])  # T[28..31] != 0
    x = "1234567890"
    wrong_tl, wrong_tr = (t + b"\x00")[:4], (t + b"\x00")[4:]
    digits = [_DIGITS.index(c) for c in x]
    wrong = "".join(
        _DIGITS[d] for d in _ff3_core(key, wrong_tl, wrong_tr, digits, 10, True)
    )
    assert wrong != prod.ff3_1_encrypt(key, t, x, 10)
