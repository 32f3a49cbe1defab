"""PBKDF2-HMAC-SHA512 codec.

Reference: src/main/scala/ai/tripl/arc/transform/codec/PBKDF2WithHmacSHA512.scala
(262,144 iterations default, 64-byte key; JCE PBEKeySpec encodes the password
chars as UTF-8).
"""

from __future__ import annotations

import hashlib

from . import Codec, DEFAULT_HASH_LENGTH, _env_int, utf8_chars


class PBKDF2WithHmacSHA512(Codec):
    name = "PBKDF2WithHmacSHA512"
    DEFAULT_ITERATIONS = 262144

    def __init__(self):
        self.iteration_count = _env_int(
            "ETL_CONF_MASK_DATA_PBKDF2_ITERATIONS", self.DEFAULT_ITERATIONS
        )
        self.key_length = _env_int(
            "ETL_CONF_MASK_DATA_PBKDF2_KEY_LENGTH", DEFAULT_HASH_LENGTH
        )

    def params(self) -> str:
        return f"PBKDF2WithHmacSHA512({self.iteration_count}, {self.key_length})"

    def encrypt(self, value_chars: str, salt: bytes) -> bytes:
        return hashlib.pbkdf2_hmac(
            "sha512", utf8_chars(value_chars), salt, self.iteration_count, self.key_length
        )
