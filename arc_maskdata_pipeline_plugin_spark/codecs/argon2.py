"""Argon2id codec (the reference's default).

Reference: src/main/scala/ai/tripl/arc/transform/codec/Argon2.scala
(Argon2id, parallelism=2, memory=65536 KB, iterations=4, 64-byte digest;
BouncyCastle's default char→byte converter is UTF-8).

``argon2-cffi`` is not guaranteed in this environment, so the implementation
is import-gated: constructing the codec works everywhere (for registry
listing), but ``encrypt`` raises a clear error when the library is absent.
Select ``PBKDF2WithHmacSHA512`` or ``SCrypt`` via ``ETL_CONF_MASK_DATA_CODEC``
in that case.
"""

from __future__ import annotations

from . import Codec, DEFAULT_HASH_LENGTH, MaskDataCodecError, _env_int, utf8_chars

try:
    from argon2.low_level import Type, hash_secret_raw

    _HAVE_ARGON2 = True
except ImportError:
    _HAVE_ARGON2 = False


class Argon2(Codec):
    name = "Argon2"
    DEFAULT_PARALLELISM = 2
    DEFAULT_MEMORY = 65536  # KB
    DEFAULT_ITERATIONS = 4

    def __init__(self):
        self.parallelism = _env_int(
            "ETL_CONF_MASK_DATA_ARGON2_PARALLELISM", self.DEFAULT_PARALLELISM
        )
        self.memory = _env_int("ETL_CONF_MASK_DATA_ARGON2_MEMORY", self.DEFAULT_MEMORY)
        self.iterations = _env_int(
            "ETL_CONF_MASK_DATA_ARGON2_ITERATIONS", self.DEFAULT_ITERATIONS
        )

    def params(self) -> str:
        return f"Argon2({self.parallelism}, {self.memory}, {self.iterations})"

    def encrypt(self, value_chars: str, salt: bytes) -> bytes:
        if not _HAVE_ARGON2:
            raise MaskDataCodecError(
                "Argon2 codec requires the 'argon2-cffi' package, which is not "
                "installed. Set ETL_CONF_MASK_DATA_CODEC=PBKDF2WithHmacSHA512 "
                "or SCrypt (both stdlib-backed), or install argon2-cffi."
            )
        return hash_secret_raw(
            secret=utf8_chars(value_chars),
            salt=salt,
            time_cost=self.iterations,
            memory_cost=self.memory,
            parallelism=self.parallelism,
            hash_len=DEFAULT_HASH_LENGTH,
            type=Type.ID,
        )
