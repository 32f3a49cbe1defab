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

import logging

from . import CODEC_ENV, Codec, DEFAULT_HASH_LENGTH, _env_int, utf8_chars
from ._argon2_pure import ARGON2ID, argon2_raw

try:
    from argon2.low_level import Type, hash_secret_raw

    _HAVE_ARGON2 = True
except ImportError:
    _HAVE_ARGON2 = False

logger = logging.getLogger(__name__)

# Production-grade cost (>= 64 MiB memory or >= 4 passes) on the pure-Python
# fallback runs at ~3.9 rows/s (MASK_THROUGHPUT.md) — ~5 orders of magnitude
# short of a 100 TB mask pass. Warn loudly once per cost configuration.
_PROD_MEMORY_KB = 65536
_PROD_ITERATIONS = 4
_warned_costs: set[tuple[int, int, int]] = set()


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
        self._warn_if_pure_python_at_production_cost()

    def _warn_if_pure_python_at_production_cost(self) -> None:
        if _HAVE_ARGON2:
            return
        if not (self.memory >= _PROD_MEMORY_KB or self.iterations >= _PROD_ITERATIONS):
            return  # test-grade cost: the fallback is fine there
        cost = (self.parallelism, self.memory, self.iterations)
        if cost in _warned_costs:
            return
        _warned_costs.add(cost)
        logger.warning(
            "Argon2 codec is running on the pure-Python RFC 9106 fallback at "
            "production cost (memory=%d KB, iterations=%d): expect ~3.9 rows/s "
            "per core (MASK_THROUGHPUT.md) — unusable for bulk masking. "
            "Install argon2-cffi for native speed, or select a stdlib-native "
            "codec via %s (SCrypt, PBKDF2WithHmacSHA512, or the amortized "
            "HmacSHA512 at ~282k rows/s).",
            self.memory,
            self.iterations,
            CODEC_ENV,
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
