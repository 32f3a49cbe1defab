"""NIST SP 800-38G FF3 / FF3-1 — the second standards-bit-exact FPE mode.

Completes the SP 800-38G pair started by ``functions/ff1.py`` (r10): FF3
is the 8-round Feistel mode with byte-REVERSED AES (`REVB` on key, input,
and output) and REVERSED numeral strings in NUM/STR; FF3-1 (SP 800-38G
Rev. 1) is the same round function with a 56-bit tweak split
``TL = T[0..27] || 0^4``, ``TR = T[32..55] || T[28..31] || 0^4``.

Provenance and status:

* :func:`ff3_encrypt` / :func:`ff3_decrypt` implement ORIGINAL FF3
  (64-bit tweak, Algorithm 9/10) and are validated bit-for-bit against
  the fifteen published NIST FF3 sample vectors (AES-128/192/256, radix
  10 and 26) in ``tests/test_ff3.py``. NIST withdrew original FF3 for
  small domains after the Durak–Vaudenay attack; it is kept here as the
  vector-pinned reference implementation, and this module enforces the
  Rev-1 minimum domain (radix^n >= 10^6) for BOTH modes, which is the
  regime where FF3-1's security analysis applies.
* :func:`ff3_1_encrypt` / :func:`ff3_1_decrypt` are the CURRENT approved
  mode. NIST publishes FF3-1 vectors only inside the ACVP JSON corpus
  (not available in this environment), so FF3-1 is validated by
  construction: it reuses the byte-identical round function the FF3
  vectors pin, plus property tests (bijectivity, exact invertibility,
  tweak separation) in ``tests/test_ff3.py``.

Reference anchor: the masking-codec pluggability surface
(``MaskDataPlugin.scala:41-51``) — same config registry, same key
derivation as :func:`functions.ff1.ff1_key`.

Scale: one AES block op per round per DISTINCT value inside an Arrow
``pandas_udf`` with a per-batch cache — mask the key dictionary, never
the fact table (the q_mask_fpe_referential discipline).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ..codecs import Codec, get_codec, get_passphrase
from .ff1 import _ciph, _num_radix, _str_radix


def _check_domain(n: int, radix: int) -> None:
    if not 2 <= radix <= 36:
        raise ValueError(f"radix must be in [2, 36], got {radix}")
    if n < 2 or radix**n < 1_000_000:
        raise ValueError(
            f"FF3 domain too small: radix^{n} < 10^6 (SP 800-38G Rev. 1 minimum)"
        )
    # NUM_radix(REV(B)) must fit the 12-byte P suffix: radix^v <= 2^96
    if n > 2 * math.floor(96 / math.log2(radix)):
        raise ValueError(
            f"FF3 input too long: n={n} > 2*floor(96/log2(radix))"
        )


def _ff3_rounds(key: bytes, tl: bytes, tr: bytes, x: str, radix: int, enc: bool) -> str:
    """The shared FF3/FF3-1 Feistel core (SP 800-38G Algorithm 9/10).

    ``tl``/``tr`` are the 4-byte half-tweaks AFTER the mode's tweak split,
    so FF3 (64-bit tweak) and FF3-1 (56-bit tweak) differ only in how the
    caller derives them. REV semantics per the spec: numeral strings enter
    NUM/STR reversed, and CIPH runs with byte-reversed key, input, output.
    """
    n = len(x)
    u = (n + 1) // 2  # ceil(n/2)
    v = n - u
    a, b = x[:u], x[u:]
    krev = key[::-1]
    order = range(8) if enc else reversed(range(8))
    for i in order:
        m, w = (u, tr) if i % 2 == 0 else (v, tl)
        src = b if enc else a
        p = (
            bytes(wb ^ ib for wb, ib in zip(w, i.to_bytes(4, "big")))
            + _num_radix(src[::-1], radix).to_bytes(12, "big")
        )
        s = _ciph(krev, p[::-1])[::-1]
        y = int.from_bytes(s, "big")
        if enc:
            c = (_num_radix(a[::-1], radix) + y) % radix**m
            a, b = b, _str_radix(c, radix, m)[::-1]
        else:
            c = (_num_radix(b[::-1], radix) - y) % radix**m
            a, b = _str_radix(c, radix, m)[::-1], a
    return a + b


def _split_tweak_ff3(tweak: bytes) -> tuple[bytes, bytes]:
    if len(tweak) != 8:
        raise ValueError(f"FF3 tweak must be exactly 8 bytes, got {len(tweak)}")
    return tweak[:4], tweak[4:]


def _split_tweak_ff3_1(tweak: bytes) -> tuple[bytes, bytes]:
    """Rev. 1 tweak split: TL = T[0..27] || 0^4,
    TR = T[32..55] || T[28..31] || 0^4 (bit indices over the 56-bit T)."""
    if len(tweak) != 7:
        raise ValueError(
            f"FF3-1 tweak must be exactly 7 bytes (56 bits), got {len(tweak)}"
        )
    tl = tweak[:3] + bytes([tweak[3] & 0xF0])
    tr = tweak[4:7] + bytes([(tweak[3] & 0x0F) << 4])
    return tl, tr


def ff3_encrypt(key: bytes, tweak: bytes, x: str, radix: int = 10) -> str:
    """Original FF3.Encrypt (Algorithm 9; 64-bit tweak) — the mode the
    published NIST sample vectors exercise."""
    _check_domain(len(x), radix)
    tl, tr = _split_tweak_ff3(tweak)
    return _ff3_rounds(key, tl, tr, x, radix, enc=True)


def ff3_decrypt(key: bytes, tweak: bytes, x: str, radix: int = 10) -> str:
    """Original FF3.Decrypt (Algorithm 10) — exact inverse."""
    _check_domain(len(x), radix)
    tl, tr = _split_tweak_ff3(tweak)
    return _ff3_rounds(key, tl, tr, x, radix, enc=False)


def ff3_1_encrypt(key: bytes, tweak: bytes, x: str, radix: int = 10) -> str:
    """FF3-1.Encrypt (SP 800-38G Rev. 1; 56-bit tweak) — the currently
    approved mode."""
    _check_domain(len(x), radix)
    tl, tr = _split_tweak_ff3_1(tweak)
    return _ff3_rounds(key, tl, tr, x, radix, enc=True)


def ff3_1_decrypt(key: bytes, tweak: bytes, x: str, radix: int = 10) -> str:
    """FF3-1.Decrypt — exact inverse of :func:`ff3_1_encrypt`."""
    _check_domain(len(x), radix)
    tl, tr = _split_tweak_ff3_1(tweak)
    return _ff3_rounds(key, tl, tr, x, radix, enc=False)


def ff3_key(codec: Codec, passphrase: bytes, size: int = 16) -> bytes:
    """AES key for the session — same derivation surface as
    :func:`functions.ff1.ff1_key`, separate label so FF1 and FF3
    ciphertexts never share a key."""
    if size not in (16, 24, 32):
        raise ValueError("AES key size must be 16, 24, or 32 bytes")
    return codec.hash("ff3:key:v1", True, passphrase)[:size]


def _tweak56(t: str) -> bytes:
    """Derive a deterministic 56-bit FF3-1 tweak from an arbitrary context
    string: first 7 bytes of its UTF-8, zero-padded — the same
    context-binding role as FF1's free-length tweak, folded to the
    FF3-1-mandated width."""
    raw = t.encode()[:7]
    return raw + bytes(7 - len(raw))


def register_ff3_udfs(
    spark,
    codec: Codec | None = None,
    passphrase: bytes | None = None,
    radix: int = 10,
    prefix: str = "",
) -> None:
    """Register ``mask_ff3_encrypt(tweak, value)`` / ``mask_ff3_decrypt``
    on the session — FF3-1 under the hood (the approved mode), with the
    context string folded to a 56-bit tweak by :func:`_tweak56`. NULL
    tweak or NULL value propagates NULL (the ff1.py ADVICE r10 rule)."""
    codec = codec or get_codec()
    passphrase = passphrase or get_passphrase()
    key = ff3_key(codec, passphrase)

    def _batch(fn, tweaks: pd.Series, values: pd.Series) -> pd.Series:
        cache: dict[tuple, str | None] = {}
        out = []
        for t, v in zip(tweaks, values):
            k = (t, v)
            if k not in cache:
                cache[k] = (
                    None
                    if v is None or t is None
                    else fn(key, _tweak56(str(t)), v, radix)
                )
            out.append(cache[k])
        return pd.Series(out, dtype="object")

    @pandas_udf(StringType())
    def mask_ff3_encrypt(tweak, value):
        return _batch(ff3_1_encrypt, tweak, value)

    @pandas_udf(StringType())
    def mask_ff3_decrypt(tweak, value):
        return _batch(ff3_1_decrypt, tweak, value)

    spark.udf.register(prefix + "mask_ff3_encrypt", mask_ff3_encrypt)
    spark.udf.register(prefix + "mask_ff3_decrypt", mask_ff3_decrypt)
