"""Codec-layer unit tests (Spark-free).

Reference semantics under test: passphrase split, signed big-endian hashLong,
non-deterministic randomness, env validation (MaskDataPlugin.scala:126-154,
:31-38) and per-codec char→byte conversion.
"""

from __future__ import annotations

import hashlib

import pytest

from arc_maskdata_pipeline_plugin_spark.codecs import (
    MaskDataCodecError,
    available_codecs,
    get_codec,
    get_passphrase,
    truncated_chars,
    utf8_chars,
)
from arc_maskdata_pipeline_plugin_spark.codecs.hmac_sha512 import HmacSHA512
from arc_maskdata_pipeline_plugin_spark.codecs.pbkdf2 import PBKDF2WithHmacSHA512
from arc_maskdata_pipeline_plugin_spark.codecs.scrypt import SCrypt

PASSPHRASE = b"q7VqMTbj7e5dUWESfc8UjZr2r7pyq5cHP8MVkUEjyv74cHsqUt734vg6qQmHaz7a"


def test_registry_contains_reference_codecs():
    names = set(available_codecs())
    assert {"Argon2", "SCrypt", "PBKDF2WithHmacSHA512"} <= names


def test_unknown_codec_raises():
    with pytest.raises(MaskDataCodecError, match="not found"):
        get_codec("NoSuchCodec")


def test_passphrase_validation(monkeypatch):
    monkeypatch.setenv("ETL_CONF_MASK_DATA_PASSPHRASE", "short")
    with pytest.raises(MaskDataCodecError, match="64 and 256"):
        get_passphrase()
    monkeypatch.setenv("ETL_CONF_MASK_DATA_PASSPHRASE", "x" * 300)
    with pytest.raises(MaskDataCodecError):
        get_passphrase()
    monkeypatch.delenv("ETL_CONF_MASK_DATA_PASSPHRASE")
    with pytest.raises(MaskDataCodecError):
        get_passphrase()
    monkeypatch.setenv("ETL_CONF_MASK_DATA_PASSPHRASE", PASSPHRASE.decode())
    assert get_passphrase() == PASSPHRASE


def test_pbkdf2_matches_manual_derivation():
    """hash() must equal PBKDF2(value+pepper UTF-8, salt) with the passphrase
    split in half (pepper=first half feeds the password, salt=second half)."""
    codec = PBKDF2WithHmacSHA512()
    half = len(PASSPHRASE) // 2
    pepper, salt = PASSPHRASE[:half], PASSPHRASE[half:]
    expected = hashlib.pbkdf2_hmac(
        "sha512",
        ("important" + pepper.decode("latin-1")).encode("utf-8"),
        salt,
        codec.iteration_count,
        64,
    )
    assert codec.hash("important", True, PASSPHRASE) == expected
    assert len(expected) == 64


def test_deterministic_is_stable_nondeterministic_is_not():
    codec = PBKDF2WithHmacSHA512()
    a = codec.hash("value", True, PASSPHRASE)
    b = codec.hash("value", True, PASSPHRASE)
    assert a == b
    c = codec.hash("value", False, PASSPHRASE)
    d = codec.hash("value", False, PASSPHRASE)
    assert c != d  # SecureRandom path ignores the input entirely
    assert len(c) == 64


def test_hash_long_is_signed_big_endian():
    codec = HmacSHA512()

    class Fixed(HmacSHA512):
        def hash(self, value, deterministic, passphrase):
            return bytes([0xFF] * 8 + [0] * 56)

    assert Fixed().hash_long("x", True, PASSPHRASE) == -1
    # and a real digest round-trips through two calls identically
    assert codec.hash_long("v", True, PASSPHRASE) == codec.hash_long("v", True, PASSPHRASE)


def test_scrypt_truncated_char_conversion():
    # 'é' (U+00E9) must enter SCrypt as the single byte 0xE9, not UTF-8 0xC3A9
    assert truncated_chars("é") == b"\xe9"
    assert utf8_chars("é") == b"\xc3\xa9"
    # astral chars become their UTF-16 surrogate pair's low bytes on the JVM
    assert len(truncated_chars("𐍈")) == 2


def test_scrypt_reference_cost_params(monkeypatch):
    monkeypatch.setenv("ETL_CONF_MASK_DATA_SCRYPT_CPU", "32768")
    monkeypatch.setenv("ETL_CONF_MASK_DATA_SCRYPT_MEMORY", "16")
    monkeypatch.setenv("ETL_CONF_MASK_DATA_SCRYPT_PARALLELISM", "2")
    codec = SCrypt()
    digest = codec.hash("important", True, PASSPHRASE)
    assert len(digest) == 64
    assert digest == codec.hash("important", True, PASSPHRASE)


def test_hmac_codec_pickles_without_key_cache():
    import pickle

    codec = HmacSHA512()
    codec.hash("warm", True, PASSPHRASE)
    assert codec._key_cache
    clone = pickle.loads(pickle.dumps(codec))
    assert clone._key_cache == {}
    assert clone.hash("warm", True, PASSPHRASE) == codec.hash("warm", True, PASSPHRASE)
