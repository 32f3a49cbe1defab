"""Argon2id codec (the reference's default).

Reference: src/main/scala/ai/tripl/arc/transform/codec/Argon2.scala
(Argon2id, parallelism=2, memory=65536 KB, iterations=4, 64-byte digest;
BouncyCastle's default char→byte converter is UTF-8).

``argon2-cffi`` is used when importable (native speed); otherwise encryption
falls back to the pure-Python RFC 9106 implementation in ``_argon2_pure``
(bit-identical — both are checked against the RFC §5 test vectors). The
fallback makes the reference's DEFAULT codec path runnable everywhere; it is
~3 orders of magnitude slower than native at default cost, which
MASK_THROUGHPUT.md quantifies — production deployments should install
``argon2-cffi`` or select the stdlib-native ``SCrypt`` /
``PBKDF2WithHmacSHA512`` codecs.
"""

from __future__ import annotations

from . import Codec, DEFAULT_HASH_LENGTH, _env_int, utf8_chars
from ._argon2_pure import ARGON2ID, argon2_raw

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
        if _HAVE_ARGON2:
            return hash_secret_raw(
                secret=utf8_chars(value_chars),
                salt=salt,
                time_cost=self.iterations,
                memory_cost=self.memory,
                parallelism=self.parallelism,
                hash_len=DEFAULT_HASH_LENGTH,
                type=Type.ID,
            )
        return argon2_raw(
            password=utf8_chars(value_chars),
            salt=salt,
            time_cost=self.iterations,
            memory_cost=self.memory,
            parallelism=self.parallelism,
            hash_len=DEFAULT_HASH_LENGTH,
            type_=ARGON2ID,
        )
