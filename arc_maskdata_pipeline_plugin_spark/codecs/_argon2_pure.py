"""Pure-Python Argon2 (RFC 9106) — d / i / id variants, version 0x13.

The reference's DEFAULT codec is Argon2id via BouncyCastle
(src/main/scala/ai/tripl/arc/transform/codec/Argon2.scala:10-38, selected by
default at MaskDataPlugin.scala:47). ``argon2-cffi`` is absent in this
environment, so without a fallback the reference's default masking path
cannot execute at all. This module implements the full RFC 9106 function on
``hashlib.blake2b`` + numpy (the compression function G is vectorized across
the 8 parallel BLAKE2b-style permutations of a block), verified bit-exact
against the RFC 9106 §5.1–5.3 test vectors (which exercise secret key and
associated data too).

Throughput honesty: a software-Python KDF at the reference's default cost
(64 MiB, t=4) is orders of magnitude slower than native; this fallback makes
the default path *correct and runnable*, while MASK_THROUGHPUT.md records the
measured rate and recommends SCrypt/PBKDF2 (stdlib-native) or installing
``argon2-cffi`` for production rates. The Spark-side design is unchanged —
codecs execute inside Arrow-batched pandas UDFs with per-batch memoization.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

ARGON2D, ARGON2I, ARGON2ID = 0, 1, 2
_VERSION = 0x13
_BLOCK_WORDS = 128  # 1024 bytes
_SYNC_POINTS = 4
_M32 = np.uint64(0xFFFFFFFF)

# P permutation word groupings (column then diagonal), per RFC 9106 §3.6 /
# BLAKE2b: indices into a 16-word register file.
_COL = ([0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11], [12, 13, 14, 15])
_DIAG = ([0, 1, 2, 3], [5, 6, 7, 4], [10, 11, 8, 9], [15, 12, 13, 14])


def _h_prime(data: bytes, tag_len: int) -> bytes:
    """Variable-length hash H' (RFC 9106 §3.3)."""
    prefix = struct.pack("<I", tag_len)
    if tag_len <= 64:
        return hashlib.blake2b(prefix + data, digest_size=tag_len).digest()
    out = bytearray()
    v = hashlib.blake2b(prefix + data, digest_size=64).digest()
    out += v[:32]
    remaining = tag_len - 32
    while remaining > 64:
        v = hashlib.blake2b(v, digest_size=64).digest()
        out += v[:32]
        remaining -= 32
    out += hashlib.blake2b(v, digest_size=remaining).digest()
    return bytes(out)


def _rotr(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x >> r) | (x << (np.uint64(64) - r))


def _gb(v: np.ndarray, ia, ib, ic, id_) -> None:
    """Vectorized BLAKE2b-with-multiply quarter round over index groups.

    ``v`` has shape (8, 16) — the 8 parallel P permutations of one block —
    and each of ia..id_ selects 4 columns, so one call performs 32 scalar GB
    mixes."""
    a, b, c, d = v[:, ia], v[:, ib], v[:, ic], v[:, id_]
    two = np.uint64(2)
    a = a + b + two * (a & _M32) * (b & _M32)
    d = _rotr(d ^ a, 32)
    c = c + d + two * (c & _M32) * (d & _M32)
    b = _rotr(b ^ c, 24)
    a = a + b + two * (a & _M32) * (b & _M32)
    d = _rotr(d ^ a, 16)
    c = c + d + two * (c & _M32) * (d & _M32)
    b = _rotr(b ^ c, 63)
    v[:, ia], v[:, ib], v[:, ic], v[:, id_] = a, b, c, d


def _apply_p_rows(m: np.ndarray) -> None:
    """Apply the P permutation to each row of an (8, 16) word matrix."""
    _gb(m, *_COL)
    _gb(m, *_DIAG)


def _fill_block(prev: np.ndarray, ref: np.ndarray, old: np.ndarray | None) -> np.ndarray:
    """G compression (RFC 9106 §3.5): new = P-rounds(prev ^ ref) ^ (prev ^ ref)
    [^ old for version-0x13 second-pass overwrite]."""
    r = prev ^ ref
    q = r.reshape(8, 16).copy()
    _apply_p_rows(q)  # rowwise: words 16i..16i+15
    # columnwise: for i in 0..7 the 16 words are Q[16j + 2i + k]; reshape to
    # (j, i, k) and bring i to the front.
    q3 = q.reshape(8, 8, 2).transpose(1, 0, 2).reshape(8, 16).copy()
    _apply_p_rows(q3)
    z = q3.reshape(8, 8, 2).transpose(1, 0, 2).reshape(128)
    out = z ^ r
    if old is not None:
        out = out ^ old
    return out


_ZERO = np.zeros(_BLOCK_WORDS, dtype=np.uint64)


def _next_addresses(input_block: np.ndarray) -> np.ndarray:
    input_block[6] += np.uint64(1)
    addr = _fill_block(_ZERO, input_block, None)
    return _fill_block(_ZERO, addr, None)


def argon2_raw(
    password: bytes,
    salt: bytes,
    time_cost: int,
    memory_cost: int,
    parallelism: int,
    hash_len: int,
    type_: int = ARGON2ID,
    secret: bytes = b"",
    ad: bytes = b"",
) -> bytes:
    """RFC 9106 Argon2, returning the raw tag."""
    if parallelism < 1 or time_cost < 1:
        raise ValueError("time_cost and parallelism must be >= 1")
    if memory_cost < 8 * parallelism:
        raise ValueError("memory_cost must be >= 8 * parallelism")

    h0 = hashlib.blake2b(digest_size=64)
    h0.update(struct.pack("<IIIIII", parallelism, hash_len, memory_cost, time_cost, _VERSION, type_))
    h0.update(struct.pack("<I", len(password)) + password)
    h0.update(struct.pack("<I", len(salt)) + salt)
    h0.update(struct.pack("<I", len(secret)) + secret)
    h0.update(struct.pack("<I", len(ad)) + ad)
    h0 = h0.digest()

    m_prime = (memory_cost // (4 * parallelism)) * 4 * parallelism
    lane_length = m_prime // parallelism
    segment_length = lane_length // _SYNC_POINTS

    # B[lane][index] — one contiguous array per lane
    mem = [np.empty((lane_length, _BLOCK_WORDS), dtype=np.uint64) for _ in range(parallelism)]
    for lane in range(parallelism):
        for i in (0, 1):
            blk = _h_prime(h0 + struct.pack("<II", i, lane), 1024)
            mem[lane][i] = np.frombuffer(blk, dtype="<u8").astype(np.uint64)

    for pass_ in range(time_cost):
        for slice_ in range(_SYNC_POINTS):
            for lane in range(parallelism):
                _fill_segment(
                    mem, pass_, lane, slice_, type_, time_cost,
                    m_prime, lane_length, segment_length, parallelism,
                )

    final = mem[0][lane_length - 1].copy()
    for lane in range(1, parallelism):
        final ^= mem[lane][lane_length - 1]
    return _h_prime(final.astype("<u8").tobytes(), hash_len)


def _fill_segment(
    mem, pass_, lane, slice_, type_, passes,
    m_prime, lane_length, segment_length, parallelism,
) -> None:
    data_independent = type_ == ARGON2I or (
        type_ == ARGON2ID and pass_ == 0 and slice_ < _SYNC_POINTS // 2
    )
    address_block = None
    input_block = None
    if data_independent:
        input_block = np.zeros(_BLOCK_WORDS, dtype=np.uint64)
        input_block[0] = pass_
        input_block[1] = lane
        input_block[2] = slice_
        input_block[3] = m_prime
        input_block[4] = passes
        input_block[5] = type_

    starting_index = 0
    if pass_ == 0 and slice_ == 0:
        starting_index = 2
        if data_independent:
            address_block = _next_addresses(input_block)

    curr = lane_length * 0 + slice_ * segment_length + starting_index  # in-lane offset
    prev = curr - 1 if curr % lane_length != 0 else curr + lane_length - 1

    lane_mem = mem[lane]
    for i in range(starting_index, segment_length):
        if curr % lane_length == 1:
            prev = curr - 1
        if data_independent:
            if i % _BLOCK_WORDS == 0:
                address_block = _next_addresses(input_block)
            pseudo_rand = int(address_block[i % _BLOCK_WORDS])
        else:
            pseudo_rand = int(lane_mem[prev % lane_length][0])
        j1 = pseudo_rand & 0xFFFFFFFF
        j2 = pseudo_rand >> 32

        ref_lane = j2 % parallelism
        if pass_ == 0 and slice_ == 0:
            ref_lane = lane
        same_lane = ref_lane == lane

        # index_alpha (RFC 9106 §3.4.1.2)
        if pass_ == 0:
            if slice_ == 0:
                ref_area = i - 1
            elif same_lane:
                ref_area = slice_ * segment_length + i - 1
            else:
                ref_area = slice_ * segment_length + (-1 if i == 0 else 0)
        else:
            if same_lane:
                ref_area = lane_length - segment_length + i - 1
            else:
                ref_area = lane_length - segment_length + (-1 if i == 0 else 0)

        rel = (j1 * j1) >> 32
        rel = ref_area - 1 - ((ref_area * rel) >> 32)
        start_pos = 0
        if pass_ != 0 and slice_ != _SYNC_POINTS - 1:
            start_pos = (slice_ + 1) * segment_length
        ref_index = (start_pos + rel) % lane_length

        old = lane_mem[curr % lane_length] if pass_ > 0 else None
        lane_mem[curr % lane_length] = _fill_block(
            lane_mem[prev % lane_length], mem[ref_lane][ref_index], old
        )
        curr += 1
        prev += 1
