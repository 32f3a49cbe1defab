"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Design (per the build brief): image/audio/video travel as ``binary`` columns
with a metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` transforms. The decode step is STUBBED in
this container (no PIL/ffmpeg): ``decode_image_features`` uses a
clearly-marked deterministic fake decoder; ``decode_image_real`` raises
``NotImplementedError`` unless PIL is importable. The Spark-side plumbing —
schema, batching, partition sizing — is real and tested.

Scale notes: binary payloads dominate row size, so feature extraction
projects the payload away as early as possible, and ``mapInPandas`` batch
size is bounded by bytes not rows (set
``spark.sql.execution.arrow.maxRecordsPerBatch`` down for multi-MB blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
    ]
)

_MODES = ["RGB", "RGBA", "L", "CMYK"]


def fake_decode(payload: bytes) -> tuple[int, int, int, str]:
    """DETERMINISTIC FAKE decoder (stub for PIL.Image.open): derives plausible
    image properties purely from the byte length so tests and oracles are
    reproducible. Replace with a real decoder where imaging libs exist."""
    n = len(payload)
    width = n % 640 + 1
    height = (n * 7) % 480 + 1
    mode = _MODES[n % len(_MODES)]
    return n, width, height, mode


def decode_image_real(payload: bytes) -> tuple[int, int, int, str]:
    """REAL image decode: PIL when importable (every format), else the
    stdlib codecs in ``operators.imaging`` — full pixel decode for PNG,
    header walk for JPEG/GIF. Raises ValueError on unrecognized payloads
    (this is the honest path: garbage bytes are an error, not a guess)."""
    payload = bytes(payload)
    try:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload))
        return len(payload), img.width, img.height, img.mode
    except ImportError:
        pass
    from .imaging import parse_image_header, png_decode

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        arr, mode = png_decode(payload)  # full decode — validates the stream
        return len(payload), arr.shape[1], arr.shape[0], mode
    header = parse_image_header(payload)
    if header is None:
        raise ValueError("unrecognized image payload (not PNG/JPEG/GIF)")
    w, h, mode = header
    return len(payload), w, h, mode


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo payload builder: UTF-8 bytes of a text column as the binary blob
    (stands in for real image bytes; the plumbing is payload-agnostic)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def attach_png_payload(
    df: DataFrame, id_col: str = "doc_id", dims: tuple[int, int] | None = None
) -> DataFrame:
    """Render a REAL grayscale PNG per row — width=(id%16)+1,
    height=(id%12)+1 (or the fixed ``dims=(w, h)`` when given — the aHash
    convention of hashing on a common grid), deterministic gradient pixels —
    via the stdlib encoder in ``operators.imaging``. Dimensions are pure id
    arithmetic, so a SQL oracle can verify what the real decoder reads back;
    the payload is a genuine zlib-compressed PNG stream, not a marker."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from .imaging import png_encode

    @pandas_udf(BinaryType())
    def render(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            w, h = dims if dims else (i % 16 + 1, i % 12 + 1)
            yy, xx = np.mgrid[0:h, 0:w]
            out.append(png_encode(((xx * 17 + yy * 31 + i) % 256).astype(np.uint8)))
        return pd.Series(out)

    return df.withColumn("payload", render(F.col(id_col)))


def attach_png_payload_grouped(
    df: DataFrame,
    id_col: str = "doc_id",
    dims: tuple[int, int] = (8, 8),
    group: int = 4,
) -> DataFrame:
    """Render real PNGs with PLANTED near-duplicate structure: ids in the
    same ``group``-sized block share a gradient pattern (odd multiplier
    ``2*(id//group)+1`` scrambles the pattern per block — a purely ADDITIVE
    id term would shift every pixel equally and leave the above-mean bits
    degenerate corpus-wide), while members differ by a tiny additive offset
    — near-identical hashes within a block, distinct across blocks. The
    formula is pure id arithmetic, so a SQL oracle reproduces every bit."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    from .imaging import png_encode

    w, h = dims

    @pandas_udf(BinaryType())
    def render(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            g = i // group
            # affine pattern class per block: ~128 odd multipliers × 256
            # offsets ≈ 32k distinct patterns — a single mod-256 multiplier
            # aliases every 128th block into the same image and turns every
            # LSH bucket viral at corpus scale (observed in the 200k stress)
            a = 2 * (g * 1103515245 % 128) + 1
            b = g * 40503 % 256
            yy, xx = np.mgrid[0:h, 0:w]
            px = ((xx * 17 + yy * 31) * a + b + i % group) % 256
            out.append(png_encode(px.astype(np.uint8)))
        return pd.Series(out)

    return df.withColumn("payload", render(F.col(id_col)))


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder=fake_decode,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decoder`` defaults to the deterministic fake (oracle-reproducible);
    pass ``decode_image_real`` for actual PNG/JPEG/GIF decoding."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decoder(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [f[0] for f in feats],
                    "width": [f[1] for f in feats],
                    "height": [f[2] for f in feats],
                    "mode": [f[3] for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", max_dim: int = 256
) -> DataFrame:
    """Resize over binary payloads: the real decode→resample→re-encode is
    STUBBED (no PIL in this container) with a deterministic byte-subsample
    that shrinks the payload proportionally to the dimension reduction — the
    Spark-side shape (binary in → binary out + new dims, Arrow-batched,
    partition-local, no shuffle) is exactly what the real kernel needs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads, ws, hs = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(p)
                _, w, h, _ = fake_decode(p)
                scale = min(max_dim / max(w, h), 1.0)
                nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                # proportional byte subsample stands in for re-encoding
                target_len = max(int(len(p) * scale * scale), 1)
                step = max(len(p) // target_len, 1)
                ids.append(doc_id)
                payloads.append(p[::step])
                ws.append(nw)
                hs.append(nh)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "payload": payloads,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZE_SCHEMA)


# backwards-compatible alias for the earlier placeholder name
def resize_stub(df: DataFrame, payload_col: str = "payload", max_dim: int = 256) -> DataFrame:
    return resize_images(df, payload_col=payload_col, max_dim=max_dim)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", IntegerType()),
        StructField("frame_len", IntegerType()),
    ]
)


def fake_video_meta(payload: bytes) -> tuple[int, int]:
    """DETERMINISTIC FAKE video header parse (stub for ffprobe): frame count
    and frame stride derived from byte length."""
    n = len(payload)
    n_frames = n % 30 + 1
    stride = max(n // n_frames, 1)
    return n_frames, stride


def sample_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_k: int = 5,
) -> DataFrame:
    """Frame sampling over binary video payloads: one input row → N output
    rows (every k-th frame), the canonical 1→many multimodal batch shape.
    Arrow-batched ``mapInPandas``; the per-frame byte ranges are computed from
    the stubbed header so the real decoder slots in without plan changes.

    Scale note: output rows ≈ input rows × frames/k, so the exploded frame
    set inherits the input partitioning — no shuffle; downstream per-frame
    feature extraction stays embarrassingly parallel."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, offs, lens = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                n_frames, stride = fake_video_meta(p)
                for f in range(0, n_frames, every_k):
                    ids.append(doc_id)
                    idxs.append(f)
                    offs.append(f * stride)
                    lens.append(stride)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_s", StringType()),  # formatted, engine-stable
    ]
)


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Audio feature stub (decode → duration/sample-rate): deterministic fake
    in place of a real codec; duration emitted as a formatted string so the
    oracle comparison is float-free."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = pdf[payload_col].map(len)
            sr = (n % 3).map({0: 16000, 1: 22050, 2: 44100}).astype("int32")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n.astype("int32"),
                    "sample_rate": sr,
                    "duration_s": [f"{v:.4f}" for v in (n * 256 / sr)],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AUDIO_SCHEMA)


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("phash_bits", StringType()),
        StructField("n_above_mean", IntegerType()),
    ]
)


def decode_pixels(payload: bytes):
    """Grayscale pixel matrix from a real image payload: PIL when importable,
    else the stdlib PNG codec."""
    import numpy as np

    payload = bytes(payload)
    try:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("L"))
    except ImportError:
        pass
    from .imaging import png_decode

    arr, _mode = png_decode(payload)
    if arr.ndim == 3:  # luminance of the first channel for gray-encoded RGB
        arr = arr[:, :, 0]
    return arr


def perceptual_hash_images(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Average-hash over REAL decoded pixels: bit i (row-major) is 1 iff
    pixel_i * n > sum(pixels) — the integer form of 'above the mean', exact
    regardless of float rounding. Returns the bitstring on the image's
    native grid (classic aHash resizes to 8×8 first; the resize is decode-
    side and orthogonal to the hash contract being tested).

    Arrow-batched ``mapInPandas``, partition-local, no shuffle: the 100 TB
    shape for media fingerprinting — decode and hash ride the scan, and only
    (id, 192-bit hash) rows move on."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "phash_bits": [], "n_above_mean": []}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                px = decode_pixels(p).astype("int64")
                h, w = px.shape
                n, total = h * w, int(px.sum())
                bits = (px * n > total).astype("uint8").flatten()  # row-major
                out["doc_id"].append(int(i))
                out["width"].append(w)
                out["height"].append(h)
                out["phash_bits"].append("".join("1" if b else "0" for b in bits))
                out["n_above_mean"].append(int(bits.sum()))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(batches, PHASH_SCHEMA)


LUMA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("luma", IntegerType()),
    ]
)


def frame_luma(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_k: int = 5,
) -> DataFrame:
    """Per-sampled-frame brightness proxy: REAL byte math over the binary
    payload — each frame's luma is the sum of its byte range mod 256 (the
    stand-in for a decoded frame's mean luminance; a real decoder changes
    only the arithmetic inside this function, not the plan). Same 1→N
    partition-local explode as ``sample_video_frames``; zero shuffle."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, lumas = [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(p)
                n_frames, stride = fake_video_meta(buf)
                for f in range(0, n_frames, every_k):
                    chunk = buf[f * stride : f * stride + stride]
                    ids.append(doc_id)
                    idxs.append(f)
                    lumas.append(sum(chunk) % 256)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "luma": pd.Series(lumas, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, LUMA_SCHEMA)


ENERGY_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk", LongType()),
        StructField("n_bytes", LongType()),
        StructField("mean_b", LongType()),
    ]
)


def chunk_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    chunk: int = 64,
) -> DataFrame:
    """Per-chunk mean amplitude over binary payloads (floored integer) —
    the PCM-energy stub behind silence detection; real decoders replace the
    byte mean with RMS over decoded samples at the same seam. Partition-
    local 1→N explode, Arrow-batched."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, chunks, nb, mb = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(p)
                for ci in range((len(buf) + chunk - 1) // chunk):
                    piece = buf[ci * chunk : (ci + 1) * chunk]
                    ids.append(doc_id)
                    chunks.append(ci)
                    nb.append(len(piece))
                    mb.append(sum(piece) // len(piece))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk": pd.Series(chunks, dtype="int64"),
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "mean_b": pd.Series(mb, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, ENERGY_SCHEMA)

PIXEL_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("px_min", LongType()),
        StructField("px_max", LongType()),
        StructField("px_sum", LongType()),
        StructField("n_distinct_vals", LongType()),
        StructField("mode_val", LongType()),
        StructField("mode_count", LongType()),
    ]
)


def pixel_stats_images(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Per-image pixel statistics over REAL decoded pixels (min/max/sum,
    distinct values, modal value with count — ties break to the SMALLEST
    value so the result is deterministic): the feature-extraction shape a
    media-quality pipeline runs — dark/blank-frame screens, exposure
    histograms, dominant-color bucketing all reduce to exactly this.

    Same 100 TB shape as ``perceptual_hash_images``: Arrow-batched
    ``mapInPandas`` riding the scan partition-local, no shuffle; only the
    fixed-width stats row moves on, never pixels."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k.name: [] for k in PIXEL_STATS_SCHEMA.fields}
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                px = decode_pixels(p).astype("int64")
                h, w = px.shape
                vals, counts = np.unique(px, return_counts=True)
                top = int(counts.max())
                mode_val = int(vals[counts == top].min())  # smallest tied value
                out["doc_id"].append(int(i))
                out["width"].append(w)
                out["height"].append(h)
                out["px_min"].append(int(px.min()))
                out["px_max"].append(int(px.max()))
                out["px_sum"].append(int(px.sum()))
                out["n_distinct_vals"].append(int(len(vals)))
                out["mode_val"].append(mode_val)
                out["mode_count"].append(top)
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(batches, PIXEL_STATS_SCHEMA)
