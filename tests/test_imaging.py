"""Stdlib image codecs (operators/imaging.py) + real-decode Spark path.

The PNG decoder handles all five filter types; since our encoder only emits
filter 0, filters 1-4 are exercised by hand-built streams."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from arc_maskdata_pipeline_plugin_spark.operators.imaging import (
    PNG_SIG,
    parse_image_header,
    png_decode,
    png_encode,
    png_resize_nearest,
)


def _gradient(h, w, c=None):
    yy, xx = np.mgrid[0:h, 0:w]
    g = ((xx * 17 + yy * 31) % 256).astype(np.uint8)
    if c is None:
        return g
    return np.stack([(g + i) % 256 for i in range(c)], axis=2).astype(np.uint8)


@pytest.mark.parametrize("shape", [(5, 7), (12, 16, 3), (3, 4, 4)])
def test_png_roundtrip(shape):
    arr = _gradient(*shape) if len(shape) == 2 else _gradient(shape[0], shape[1], shape[2])
    payload = png_encode(arr)
    got, mode = png_decode(payload)
    want_mode = {1: "L", 3: "RGB", 4: "RGBA"}[1 if arr.ndim == 2 else arr.shape[2]]
    assert mode == want_mode
    np.testing.assert_array_equal(got.reshape(arr.shape), arr)


def _png_with_filter(arr: np.ndarray, ftype: int) -> bytes:
    """Build a grayscale PNG whose rows use the given filter type."""
    h, w = arr.shape
    a32 = arr.astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w, dtype=np.int32)
    for y in range(h):
        cur = a32[y]
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = cur.copy()
            enc[1:] = (cur[1:] - cur[:-1]) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            enc = cur.copy()
            for x in range(w):
                left = int(cur[x - 1]) if x else 0
                enc[x] = (int(cur[x]) - ((left + int(prev[x])) >> 1)) % 256
        elif ftype == 4:
            enc = cur.copy()
            for x in range(w):
                a = int(cur[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (int(cur[x]) - pred) % 256
        raw.append(ftype)
        raw += enc.astype(np.uint8).tobytes()
        prev = cur

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_all_filter_types(ftype):
    arr = _gradient(6, 9)
    got, mode = png_decode(_png_with_filter(arr, ftype))
    assert mode == "L"
    np.testing.assert_array_equal(got[:, :, 0], arr)


def test_jpeg_header():
    # minimal JPEG: SOI + APP0 + SOF0 (h=480, w=640, 3 components)
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 480, 640, 3) + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"[:0]
    jpeg = b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof
    assert parse_image_header(jpeg) == (640, 480, "RGB")


def test_gif_header():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 5
    assert parse_image_header(gif) == (320, 200, "P")


def test_header_rejects_garbage():
    assert parse_image_header(b"not an image at all") is None


def test_resize_nearest_bounds():
    arr = _gradient(100, 300, 3)
    out = png_resize_nearest(arr, 64)
    assert max(out.shape[:2]) == 64 and out.shape[2] == 3
    assert png_resize_nearest(arr, 1000).shape == arr.shape  # no upscale


def test_spark_real_png_decode(spark):
    """The driver-facing query: real PNG render → real decode, end to end."""
    from arc_maskdata_pipeline_plugin_spark.plans.multimodal_queries import (
        q_multimodal_real_png,
    )

    got = {r.doc_id: (r.width, r.height, r.mode) for r in
           q_multimodal_real_png(spark, "/root/testdata/sf0.001").collect()}
    assert got, "no rows"
    for doc_id, (w, h, mode) in got.items():
        assert (w, h, mode) == (doc_id % 16 + 1, doc_id % 12 + 1, "L")


def test_decode_image_real_rejects_garbage():
    from arc_maskdata_pipeline_plugin_spark.operators.multimodal import decode_image_real

    with pytest.raises((ValueError, Exception)):
        decode_image_real(b"definitely not an image")
