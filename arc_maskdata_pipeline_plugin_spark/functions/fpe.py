"""Format-preserving encryption over digit strings — the INVERTIBLE rung of
the masking family.

The reference's mask functions are one-way (KDF-hash → alphabet encode,
``MaskDataPlugin.scala:70-92``): referential integrity survives
(`q_pseudonymize_referential`) but nothing can ever be unmasked. Real
masking programs also need the reversible tier — NIST SP 800-38G's FF1 is
the standard — so this module adds a Feistel-network FPE over digit
strings:

* 10-round alternating Feistel on the (left, right) digit halves; each
  round adds an HMAC-SHA512 PRF of the other half (keyed by the codec
  hash of the session passphrase, the same ``ETL_CONF_MASK_DATA_*``
  config surface as every codec — ``MaskDataPlugin.scala:31-51``) modulo
  the half's domain — every round is a bijection, so the whole cipher is
  a PERMUTATION of the n-digit domain: format-preserving, deterministic,
  and exactly invertible by running the rounds backward.
* This is FF1-SHAPED, not NIST-FF1-bit-exact (FF1 prescribes AES-CBC-MAC
  PRF, byte-level NUM_radix packing, and variable round constants); the
  structural guarantees (bijectivity, format preservation, tweak
  separation) are the testable contract and are pinned by pytest +
  the in-plan audit of ``q_mask_fpe_referential``.

Tweaks bind a ciphertext to a context (column/table name) so equal values
in different contexts encrypt differently — the FF1 tweak semantics.

Scale: one HMAC per round per value inside an Arrow ``pandas_udf`` with a
per-batch cache for repeated values — the same hot-loop shape as the
reference mask functions (SURVEY.md §4).
"""

from __future__ import annotations

import hashlib
import hmac

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..codecs import Codec, get_codec, get_passphrase

_ROUNDS = 10


def fpe_key(codec: Codec, passphrase: bytes) -> bytes:
    """64-byte FPE key: the codec's deterministic hash of a fixed label —
    key derivation rides the configured codec/passphrase exactly like the
    mask functions (pepper/salt split included)."""
    return codec.hash("fpe:key:v1", True, passphrase)


def _prf(key: bytes, tweak: str, rnd: int, data: str) -> int:
    mac = hmac.new(
        key, f"{tweak}|{rnd}|{data}".encode(), hashlib.sha512
    ).digest()
    return int.from_bytes(mac[:8], "big")


def _check(value: str) -> None:
    # ASCII digits ONLY: str.isdigit() accepts Unicode digits ('٣٤', '²'),
    # which int() either silently normalizes (breaking exact invertibility:
    # decrypt(encrypt('٣٤')) would return '34') or rejects mid-UDF.
    if not (value.isascii() and value.isdigit()):
        raise ValueError(f"FPE domain is ASCII digit strings, got {value!r}")


def _digit_perm(key: bytes, tweak: str) -> list[int]:
    """PRF-keyed permutation of the 10-digit domain for the n==1 case.

    A Fisher-Yates shuffle driven by ``_prf`` — unlike an additive
    rotation (enc(v) = (v+c) mod 10), ciphertext differences carry no
    information about plaintext differences across the column.
    NIST SP 800-38G requires radix**len >= 10**6; strings shorter than
    6 digits are structurally weak permutations regardless — callers
    handling security-sensitive data should enforce a minimum length.
    """
    perm = list(range(10))
    for i in range(9, 0, -1):
        j = _prf(key, tweak, 100 + i, "perm") % (i + 1)
        perm[i], perm[j] = perm[j], perm[i]
    return perm


def fpe_encrypt_digits(key: bytes, tweak: str, value: str | None) -> str | None:
    """Encrypt a digit string to a digit string of the SAME length."""
    if value is None:
        return None
    _check(value)
    n = len(value)
    if n == 1:  # degenerate half: PRF-keyed permutation of the digit domain
        return str(_digit_perm(key, tweak)[int(value)])
    u = n // 2
    v = n - u
    a, b = int(value[:u]), int(value[u:])
    for i in range(_ROUNDS):
        if i % 2 == 0:
            a = (a + _prf(key, tweak, i, str(b).zfill(v))) % 10**u
        else:
            b = (b + _prf(key, tweak, i, str(a).zfill(u))) % 10**v
    return str(a).zfill(u) + str(b).zfill(v)


def fpe_decrypt_digits(key: bytes, tweak: str, value: str | None) -> str | None:
    """Exact inverse of :func:`fpe_encrypt_digits`."""
    if value is None:
        return None
    _check(value)
    n = len(value)
    if n == 1:
        return str(_digit_perm(key, tweak).index(int(value)))
    u = n // 2
    v = n - u
    a, b = int(value[:u]), int(value[u:])
    for i in reversed(range(_ROUNDS)):
        if i % 2 == 0:
            a = (a - _prf(key, tweak, i, str(b).zfill(v))) % 10**u
        else:
            b = (b - _prf(key, tweak, i, str(a).zfill(u))) % 10**v
    return str(a).zfill(u) + str(b).zfill(v)


def register_fpe_udfs(
    spark,
    codec: Codec | None = None,
    passphrase: bytes | None = None,
    prefix: str = "",
) -> None:
    """Register ``mask_fpe_encrypt(tweak, value)`` and
    ``mask_fpe_decrypt(tweak, value)`` (both deterministic) on the session."""
    codec = codec or get_codec()
    passphrase = passphrase or get_passphrase()
    key = fpe_key(codec, passphrase)

    def _batch(fn, tweaks: pd.Series, values: pd.Series) -> pd.Series:
        cache: dict[tuple, str | None] = {}
        out = []
        for t, v in zip(tweaks, values):
            k = (t, v)
            if k not in cache:
                cache[k] = fn(key, str(t), v)
            out.append(cache[k])
        return pd.Series(out, dtype="object")

    @pandas_udf(StringType())
    def mask_fpe_encrypt(tweak, value):
        return _batch(fpe_encrypt_digits, tweak, value)

    @pandas_udf(StringType())
    def mask_fpe_decrypt(tweak, value):
        return _batch(fpe_decrypt_digits, tweak, value)

    spark.udf.register(prefix + "mask_fpe_encrypt", mask_fpe_encrypt)
    spark.udf.register(prefix + "mask_fpe_decrypt", mask_fpe_decrypt)
