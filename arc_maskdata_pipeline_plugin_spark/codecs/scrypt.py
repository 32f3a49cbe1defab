"""SCrypt codec.

Reference: src/main/scala/ai/tripl/arc/transform/codec/SCrypt.scala
(N=16384, r=8, p=1 defaults; BouncyCastle is fed ``value.map(_.toByte)`` —
chars truncated to their low byte, NOT UTF-8).
"""

from __future__ import annotations

import hashlib

from . import Codec, DEFAULT_HASH_LENGTH, _env_int, truncated_chars


class SCrypt(Codec):
    name = "SCrypt"
    DEFAULT_CPU = 16384  # N
    DEFAULT_MEMORY = 8  # r
    DEFAULT_PARALLELISM = 1  # p

    def __init__(self):
        self.cpu = _env_int("ETL_CONF_MASK_DATA_SCRYPT_CPU", self.DEFAULT_CPU)
        self.memory = _env_int("ETL_CONF_MASK_DATA_SCRYPT_MEMORY", self.DEFAULT_MEMORY)
        self.parallelism = _env_int(
            "ETL_CONF_MASK_DATA_SCRYPT_PARALLELISM", self.DEFAULT_PARALLELISM
        )

    def params(self) -> str:
        return f"SCrypt({self.cpu}, {self.memory}, {self.parallelism})"

    def encrypt(self, value_chars: str, salt: bytes) -> bytes:
        # OpenSSL's default maxmem (32 MiB) is below the reference test cost
        # (N=32768, r=16 → 64 MiB); size it to the actual requirement.
        maxmem = 128 * self.memory * (self.cpu + self.parallelism + 2) * 2
        return hashlib.scrypt(
            truncated_chars(value_chars),
            salt=salt,
            n=self.cpu,
            r=self.memory,
            p=self.parallelism,
            maxmem=max(maxmem, 64 * 1024 * 1024),
            dklen=DEFAULT_HASH_LENGTH,
        )
