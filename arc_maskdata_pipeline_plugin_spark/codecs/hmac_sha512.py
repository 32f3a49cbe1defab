"""HmacSHA512 codec — an ADDITIVE fast codec (not in the reference).

The reference's per-row Argon2id at production cost (64 MiB, t=4) is the
dominant masking cost (SURVEY.md §4). For 100 TB-scale masking where
per-value memory-hard KDFs are economically impossible, this codec performs
ONE memory-hard stretch of the passphrase (PBKDF2-SHA512, 262,144 iterations,
computed once per executor and cached) and then a single HMAC-SHA512 per
value. Security model: masking strength degrades from per-value KDF to
keyed-PRF under a KDF-stretched key — appropriate when the passphrase has
adequate entropy, which the 64-256 char requirement enforces.
"""

from __future__ import annotations

import hashlib
import hmac

from . import Codec, DEFAULT_HASH_LENGTH, _env_int, utf8_chars


class HmacSHA512(Codec):
    name = "HmacSHA512"
    DEFAULT_STRETCH_ITERATIONS = 262144

    def __init__(self):
        self.stretch_iterations = _env_int(
            "ETL_CONF_MASK_DATA_HMAC_STRETCH_ITERATIONS",
            self.DEFAULT_STRETCH_ITERATIONS,
        )
        self._key_cache: dict[bytes, bytes] = {}

    def params(self) -> str:
        return f"HmacSHA512(stretch={self.stretch_iterations})"

    def _stretched_key(self, salt: bytes) -> bytes:
        key = self._key_cache.get(salt)
        if key is None:
            key = hashlib.pbkdf2_hmac(
                "sha512", salt, salt, self.stretch_iterations, DEFAULT_HASH_LENGTH
            )
            self._key_cache[salt] = key
        return key

    def encrypt(self, value_chars: str, salt: bytes) -> bytes:
        return hmac.new(
            self._stretched_key(salt), utf8_chars(value_chars), hashlib.sha512
        ).digest()

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_key_cache"] = {}  # re-stretch per executor; cheap relative to task
        return state
