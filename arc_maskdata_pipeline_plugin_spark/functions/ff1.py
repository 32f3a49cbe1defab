"""NIST SP 800-38G FF1 — the standards-bit-exact rung of the FPE family.

``functions/fpe.py`` ships an HMAC-Feistel FPE that is FF1-SHAPED but
honestly documented as not NIST-bit-exact. This module is the real thing:
the FF1 mode of operation (AES-CBC-MAC PRF, NUM_radix byte packing, the
prescribed P/Q block layout and round constants), validated bit-for-bit
against the published NIST sample vectors for AES-128/192/256 in
``tests/test_ff1.py``.

Reference anchor: the masking-codec pluggability surface
(``MaskDataPlugin.scala:41-51``) — same config registry
(``ETL_CONF_MASK_DATA_*`` passphrase → key derivation), new codec. The
session key is the first 16/24/32 bytes of the configured codec's hash of
a fixed label, exactly like :func:`functions.fpe.fpe_key`.

Algorithm (SP 800-38G §5.1, Algorithm 7/8): split the numeral string into
halves A|B; ten Feistel rounds, each computing
``y = NUM(S)`` from ``S = PRF(P‖Q)`` expanded by AES-ECB counter blocks,
then ``C = (NUM_radix(A) ± y) mod radix^m``. Every round is a bijection,
so the cipher is a keyed permutation of the radix^n domain — format
preserving, deterministic, exactly invertible.

NIST requires ``radix^n >= 1_000_000`` (the minimum-domain rule this
module ENFORCES, unlike the Feistel module which only documents it) and
``n >= 2``.

Scale: one AES-CBC-MAC per round per value inside an Arrow ``pandas_udf``
with a per-batch cache — the identical hot-loop shape as the other mask
functions (SURVEY.md §4).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..codecs import Codec, get_codec, get_passphrase

_DIGITS = "0123456789abcdefghijklmnopqrstuvwxyz"
_REV = {c: i for i, c in enumerate(_DIGITS)}


_CIPHER_CACHE: dict[bytes, object] = {}


def _aes_ecb(key: bytes):
    # Cipher construction dominates short-input FF1 cost (10 MACs/value);
    # ECB keeps no state across encryptors, so one Cipher per key is safe
    # to reuse for every PRF/CIPH call in the executor process.
    c = _CIPHER_CACHE.get(key)
    if c is None:
        from cryptography.hazmat.primitives.ciphers import (
            Cipher,
            algorithms,
            modes,
        )

        c = Cipher(algorithms.AES(key), modes.ECB())
        _CIPHER_CACHE[key] = c
    return c


def _ciph(key: bytes, block: bytes) -> bytes:
    enc = _aes_ecb(key).encryptor()
    return enc.update(block) + enc.finalize()


def _prf(key: bytes, data: bytes) -> bytes:
    """AES-CBC-MAC with zero IV over a 16-byte-multiple input (§4.4)."""
    assert len(data) % 16 == 0
    enc = _aes_ecb(key).encryptor()
    y = bytes(16)
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(y, data[i : i + 16]))
        y = enc.update(blk)
    enc.finalize()
    return y


def _num_radix(s: str, radix: int) -> int:
    x = 0
    for ch in s:
        d = _REV.get(ch)
        if d is None or d >= radix:
            raise ValueError(f"character {ch!r} outside radix-{radix} alphabet")
        x = x * radix + d
    return x


def _str_radix(x: int, radix: int, m: int) -> str:
    out = []
    for _ in range(m):
        x, d = divmod(x, radix)
        out.append(_DIGITS[d])
    return "".join(reversed(out))


def _check_domain(n: int, radix: int) -> None:
    if not 2 <= radix <= 36:
        raise ValueError(f"radix must be in [2, 36], got {radix}")
    if n < 2 or radix**n < 1_000_000:
        raise ValueError(
            f"FF1 domain too small: radix^{n} < 10^6 (SP 800-38G minimum)"
        )


def ff1_encrypt(key: bytes, tweak: bytes, x: str, radix: int = 10) -> str:
    """FF1.Encrypt (SP 800-38G Algorithm 7). ``x`` uses the 0-9a-z
    alphabet (numeral i = _DIGITS[i]), matching the NIST sample vectors."""
    n = len(x)
    _check_domain(n, radix)
    t = len(tweak)
    u = n // 2
    v = n - u
    a, b = x[:u], x[u:]
    bb = (math.ceil(v * math.log2(radix)) + 7) // 8
    d = 4 * ((bb + 3) // 4) + 4
    p = (
        bytes([1, 2, 1])
        + radix.to_bytes(3, "big")
        + bytes([10, u % 256])
        + n.to_bytes(4, "big")
        + t.to_bytes(4, "big")
    )
    pad = (-t - bb - 1) % 16
    for i in range(10):
        q = tweak + bytes(pad) + bytes([i]) + _num_radix(b, radix).to_bytes(bb, "big")
        r = _prf(key, p + q)
        s = bytearray(r)
        j = 1
        while len(s) < d:
            blk = bytes(x1 ^ x2 for x1, x2 in zip(r, j.to_bytes(16, "big")))
            s += _ciph(key, blk)
            j += 1
        y = int.from_bytes(bytes(s[:d]), "big")
        m = u if i % 2 == 0 else v
        c = (_num_radix(a, radix) + y) % radix**m
        a, b = b, _str_radix(c, radix, m)
    return a + b


def ff1_decrypt(key: bytes, tweak: bytes, x: str, radix: int = 10) -> str:
    """FF1.Decrypt (SP 800-38G Algorithm 8) — exact inverse."""
    n = len(x)
    _check_domain(n, radix)
    t = len(tweak)
    u = n // 2
    v = n - u
    a, b = x[:u], x[u:]
    bb = (math.ceil(v * math.log2(radix)) + 7) // 8
    d = 4 * ((bb + 3) // 4) + 4
    p = (
        bytes([1, 2, 1])
        + radix.to_bytes(3, "big")
        + bytes([10, u % 256])
        + n.to_bytes(4, "big")
        + t.to_bytes(4, "big")
    )
    pad = (-t - bb - 1) % 16
    for i in reversed(range(10)):
        q = tweak + bytes(pad) + bytes([i]) + _num_radix(a, radix).to_bytes(bb, "big")
        r = _prf(key, p + q)
        s = bytearray(r)
        j = 1
        while len(s) < d:
            blk = bytes(x1 ^ x2 for x1, x2 in zip(r, j.to_bytes(16, "big")))
            s += _ciph(key, blk)
            j += 1
        y = int.from_bytes(bytes(s[:d]), "big")
        m = u if i % 2 == 0 else v
        c = (_num_radix(b, radix) - y) % radix**m
        a, b = _str_radix(c, radix, m), a
    return a + b


def ff1_key(codec: Codec, passphrase: bytes, size: int = 16) -> bytes:
    """AES key for the session: first ``size`` bytes (16/24/32) of the
    configured codec's deterministic hash of a fixed label — the same
    key-derivation surface as every mask codec (MaskDataPlugin.scala:31-51)."""
    if size not in (16, 24, 32):
        raise ValueError("AES key size must be 16, 24, or 32 bytes")
    return codec.hash("ff1:key:v1", True, passphrase)[:size]


def register_ff1_udfs(
    spark,
    codec: Codec | None = None,
    passphrase: bytes | None = None,
    radix: int = 10,
    prefix: str = "",
) -> None:
    """Register ``mask_ff1_encrypt(tweak, value)`` / ``mask_ff1_decrypt``
    on the session — tweak strings bind ciphertexts to a context exactly
    like the Feistel FPE UDFs."""
    codec = codec or get_codec()
    passphrase = passphrase or get_passphrase()
    key = ff1_key(codec, passphrase)

    def _batch(fn, tweaks: pd.Series, values: pd.Series) -> pd.Series:
        cache: dict[tuple, str | None] = {}
        out = []
        for t, v in zip(tweaks, values):
            k = (t, v)
            if k not in cache:
                # NULL tweak propagates NULL exactly like a NULL value
                # (ADVICE r10: str(None) used to silently encrypt rows
                # under the literal tweak b"None")
                cache[k] = (
                    None
                    if v is None or t is None
                    else fn(key, str(t).encode(), v, radix)
                )
            out.append(cache[k])
        return pd.Series(out, dtype="object")

    @pandas_udf(StringType())
    def mask_ff1_encrypt(tweak, value):
        return _batch(ff1_encrypt, tweak, value)

    @pandas_udf(StringType())
    def mask_ff1_decrypt(tweak, value):
        return _batch(ff1_decrypt, tweak, value)

    spark.udf.register(prefix + "mask_ff1_encrypt", mask_ff1_encrypt)
    spark.udf.register(prefix + "mask_ff1_decrypt", mask_ff1_decrypt)
