"""Multimodal-plumbing query: binary payload → Arrow-batched feature
extraction (``mapInPandas``). The decode step is the deterministic fake
(operators/multimodal.py), whose formula the DuckDB oracle reproduces from
byte lengths — proving the Spark-side plumbing (schema, batching, binary
transport) end-to-end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import attach_binary_payload, extract_image_features
from .registry import T, persisted, register


@register(
    "q_multimodal_features",
    oracle="""
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
SELECT doc_id,
       CAST(n AS INTEGER) AS n_bytes,
       CAST(n % 640 + 1 AS INTEGER) AS width,
       CAST((n * 7) % 480 + 1 AS INTEGER) AS height,
       list_extract(['RGB', 'RGBA', 'L', 'CMYK'], n % 4 + 1) AS mode
FROM p
""",
)
def q_multimodal_features(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return extract_image_features(attach_binary_payload(d))


@register(
    "q_multimodal_real_png",
    oracle="""
SELECT doc_id,
       CAST(doc_id % 16 + 1 AS INTEGER) AS width,
       CAST(doc_id % 12 + 1 AS INTEGER) AS height,
       'L' AS mode
FROM documents
""",
)
def q_multimodal_real_png(spark, sf_dir):
    """REAL image decode, oracle-checked: each doc renders a genuine PNG
    (stdlib zlib encoder, dimensions = id arithmetic) and the REAL decoder
    (PIL when present, else the stdlib PNG pixel decoder in
    operators/imaging.py) reads the dimensions back out of the compressed
    stream. n_bytes is excluded — zlib output length isn't SQL arithmetic —
    so the oracle verifies exactly the decoded properties."""
    from ..operators.multimodal import (
        attach_png_payload,
        decode_image_real,
        extract_image_features,
    )
    from .registry import spread

    # Encode AND decode are real per-row Python (zlib/PNG) — spread the scan
    # so local single-row-group parquet doesn't serialize 100% of the CPU
    # work onto one core (no-op on cluster masters).
    d = spread(T(spark, sf_dir, "documents"))
    feats = extract_image_features(
        attach_png_payload(d.select("doc_id")), decoder=decode_image_real
    )
    return feats.select("doc_id", "width", "height", "mode")


@register(
    "q_multimodal_frame_sample",
    oracle="""
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
meta AS (
  SELECT doc_id, n, n % 30 + 1 AS n_frames,
         greatest(n // (n % 30 + 1), 1) AS stride
  FROM p
)
SELECT doc_id,
       CAST(f AS INTEGER) AS frame_idx,
       CAST(f * stride AS INTEGER) AS frame_offset,
       CAST(stride AS INTEGER) AS frame_len
FROM meta, UNNEST(range(0, n_frames, 5)) AS t(f)
""",
)
def q_multimodal_frame_sample(spark, sf_dir):
    """Video frame sampling (1 row → N frames) through Arrow-batched
    mapInPandas; deterministic fake header so DuckDB reproduces the ranges."""
    from ..operators.multimodal import sample_video_frames

    d = T(spark, sf_dir, "documents")
    return sample_video_frames(attach_binary_payload(d), every_k=5)


@register(
    "q_multimodal_audio",
    oracle="""
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
m AS (
  SELECT doc_id, n,
         CASE n % 3 WHEN 0 THEN 16000 WHEN 1 THEN 22050 ELSE 44100 END AS sr
  FROM p
)
SELECT doc_id,
       CAST(n AS INTEGER) AS n_bytes,
       CAST(sr AS INTEGER) AS sample_rate,
       printf('%.4f', CAST(n AS DOUBLE) * 256 / sr) AS duration_s
FROM m
""",
)
def q_multimodal_audio(spark, sf_dir):
    """Audio decode/feature stub over binary payloads (mapInPandas)."""
    from ..operators.multimodal import extract_audio_features

    d = T(spark, sf_dir, "documents")
    return extract_audio_features(attach_binary_payload(d))


@register(
    "q_multimodal_resize",
    oracle="""
WITH p AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents),
d AS (
  SELECT doc_id, n,
         n % 640 + 1 AS w,
         (n * 7) % 480 + 1 AS h
  FROM p
), s AS (
  SELECT doc_id, n, w, h,
         least(256.0 / greatest(w, h), 1.0) AS scale
  FROM d
), t AS (
  SELECT doc_id, n, scale,
         greatest(CAST(floor(w * scale) AS INTEGER), 1) AS width,
         greatest(CAST(floor(h * scale) AS INTEGER), 1) AS height,
         greatest(CAST(floor(n * scale * scale) AS INTEGER), 1) AS target_len
  FROM s
)
SELECT doc_id, width, height,
       CAST((n + greatest(n // target_len, 1) - 1) // greatest(n // target_len, 1)
            AS INTEGER) AS resized_len
FROM t
""",
)
def q_multimodal_resize(spark, sf_dir):
    """Binary-in → binary-out resize through Arrow (mapInPandas): the
    deterministic stub shrinks payload bytes proportionally to the dimension
    reduction; DuckDB reproduces the arithmetic (incl. the stride-subsample
    length = ceil(n/step)) from byte lengths, proving the binary round-trip
    through Arrow batches end-to-end."""
    from pyspark.sql import functions as F

    from ..operators.multimodal import resize_images

    d = T(spark, sf_dir, "documents")
    resized = resize_images(attach_binary_payload(d), max_dim=256)
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.octet_length("payload").cast("int").alias("resized_len"),
    )


@register(
    "q_multimodal_phash",
    oracle="""
WITH grid AS (
  SELECT doc_id, gx.x AS x, gy.y AS y,
         (gx.x * 17 + gy.y * 31 + doc_id) % 256 AS p
  FROM documents
  CROSS JOIN range(16) gx(x) CROSS JOIN range(12) gy(y)
  WHERE gx.x < doc_id % 16 + 1 AND gy.y < doc_id % 12 + 1
),
s AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS total
  FROM grid GROUP BY doc_id
)
SELECT g.doc_id,
       CAST(g.doc_id % 16 + 1 AS INTEGER) AS width,
       CAST(g.doc_id % 12 + 1 AS INTEGER) AS height,
       string_agg(CASE WHEN g.p * s.n > s.total THEN '1' ELSE '0' END, ''
                  ORDER BY g.y, g.x) AS phash_bits,
       CAST(SUM(CASE WHEN g.p * s.n > s.total THEN 1 ELSE 0 END) AS INTEGER)
         AS n_above_mean
FROM grid g JOIN s USING (doc_id)
GROUP BY g.doc_id
""",
)
def q_multimodal_phash(spark, sf_dir):
    """Perceptual (average) hash over REAL decoded pixels, oracle-checked to
    the BIT: Spark renders a genuine zlib-compressed PNG per doc, decodes it
    with the real pixel decoder (PIL or the stdlib codec), and computes the
    above-mean bitstring; DuckDB computes the same bits from the generative
    pixel formula WITHOUT any image codec. A hash match therefore proves the
    entire encode→compress→decompress→unfilter→hash path reproduces every
    pixel value — far stronger than the width/height check in
    q_multimodal_real_png. Decode+hash ride the scan partition-local
    (mapInPandas, no shuffle); only (id, ≤192-bit hash) rows move on."""
    from ..operators.multimodal import attach_png_payload, perceptual_hash_images
    from .registry import spread

    d = spread(T(spark, sf_dir, "documents"))
    return perceptual_hash_images(attach_png_payload(d.select("doc_id")))


_CUT_THRESHOLD = 64


@register(
    "q_multimodal_scene_cuts",
    oracle=f"""
WITH p AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
meta AS (
  SELECT doc_id, text, n, n % 30 + 1 AS n_frames,
         greatest(n // (n % 30 + 1), 1) AS stride
  FROM p
),
bytes AS (
  SELECT doc_id, n_frames, stride,
         CAST((i - 1) // stride AS BIGINT) AS f,
         ascii(substr(text, i, 1)) AS b
  FROM meta, UNNEST(range(1, n + 1)) AS t(i)
),
luma AS (
  SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
         CAST(SUM(b) % 256 AS INTEGER) AS luma
  FROM bytes
  WHERE f % 5 = 0 AND f < n_frames
  GROUP BY doc_id, f
)
SELECT doc_id, frame_idx, luma,
       CASE WHEN abs(luma - LAG(luma) OVER (PARTITION BY doc_id
                                            ORDER BY frame_idx))
                 > {_CUT_THRESHOLD}
            THEN TRUE ELSE FALSE END AS is_cut
FROM luma
""",
)
def q_multimodal_scene_cuts(spark, sf_dir):
    """Scene-cut detection over sampled video frames: per-frame luma (REAL
    byte arithmetic over the binary payload in Arrow-batched mapInPandas —
    the decoder stub seam) followed by a LAG window per video flagging
    brightness jumps above the threshold. The multimodal 1→N explode stays
    partition-local; the only shuffle is the per-video window partitioning —
    the shape a real shot-boundary pass (histogram diff between consecutive
    decoded frames) would keep unchanged."""
    from pyspark.sql import Window as W

    from ..operators.multimodal import frame_luma

    d = T(spark, sf_dir, "documents")
    frames = frame_luma(attach_binary_payload(d), every_k=5)
    w = W.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("luma").over(w)
    return frames.select(
        "doc_id",
        "frame_idx",
        "luma",
        F.when(F.abs(F.col("luma") - prev) > _CUT_THRESHOLD, F.lit(True))
        .otherwise(F.lit(False))
        .alias("is_cut"),
    )


_SIL_CHUNK = 64  # bytes per analysis chunk
_SIL_THRESHOLD = 93  # low-amplitude threshold (~p25 of chunk means)


@register(
    "q_multimodal_silence",
    oracle=f"""
WITH p AS (SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents),
bytes AS (
  SELECT doc_id, CAST((i - 1) // {_SIL_CHUNK} AS BIGINT) AS chunk,
         ascii(substr(text, i, 1)) AS b
  FROM p, UNNEST(range(1, n + 1)) AS t(i)
),
energy AS (
  SELECT doc_id, chunk,
         CAST(COUNT(*) AS BIGINT) AS n_bytes,
         CAST(floor(SUM(b) * 1.0 / COUNT(*)) AS BIGINT) AS mean_b
  FROM bytes GROUP BY 1, 2
),
flagged AS (
  SELECT doc_id, chunk FROM energy WHERE mean_b < {_SIL_THRESHOLD}
),
isl AS (
  SELECT doc_id, chunk,
         CASE WHEN chunk - LAG(chunk) OVER (PARTITION BY doc_id ORDER BY chunk)
                   = 1 THEN 0 ELSE 1 END AS new_seg
  FROM flagged
),
isl2 AS (
  SELECT doc_id, chunk,
         SUM(COALESCE(new_seg, 1)) OVER (PARTITION BY doc_id ORDER BY chunk
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS seg
  FROM isl
)
SELECT doc_id, CAST(seg AS BIGINT) AS seg,
       CAST(MIN(chunk) AS BIGINT) AS start_chunk,
       CAST(MAX(chunk) AS BIGINT) AS end_chunk,
       CAST(COUNT(*) AS BIGINT) AS n_chunks
FROM isl2 GROUP BY doc_id, seg
""",
)
def q_multimodal_silence(spark, sf_dir):
    """Silence-segment detection over audio payloads — the audio twin of
    ``q_multimodal_scene_cuts``: per fixed-size byte chunk, mean amplitude
    (REAL byte arithmetic over the binary payload; an actual PCM decoder
    slots into the same seam); below-threshold chunks merge into maximal
    silent segments via gaps-and-islands. Chunk energies explode
    partition-locally; the island windows are the only shuffle
    (co-partitioned per doc) — the VAD-preprocessing shape (trim/split on
    silence before ASR) at corpus scale."""
    from pyspark.sql import Window as W

    from ..operators.multimodal import chunk_energy

    d = T(spark, sf_dir, "documents")
    energy = chunk_energy(attach_binary_payload(d), chunk=_SIL_CHUNK)
    flagged = energy.filter(F.col("mean_b") < _SIL_THRESHOLD)
    w = W.partitionBy("doc_id").orderBy("chunk")
    isl = flagged.withColumn(
        "new_seg",
        F.when(F.col("chunk") - F.lag("chunk").over(w) == 1, F.lit(0)).otherwise(
            F.lit(1)
        ),
    ).withColumn(
        "seg",
        F.sum("new_seg").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return isl.groupBy("doc_id", F.col("seg").cast("bigint").alias("seg")).agg(
        F.min("chunk").cast("bigint").alias("start_chunk"),
        F.max("chunk").cast("bigint").alias("end_chunk"),
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
    )


_PHD_BANDS = 4  # 4 bands × 16 bits over the 8×8 hash
_PHD_MAXHAM = 6
# Viral-bucket cap (VERDICT r05 #2): a band key shared by more than this many
# images is a degenerate class (identical boilerplate imagery), not
# near-duplication — enumerating its pairs is quadratic in the class size.
# Capped buckets are EXCLUDED from candidate generation and COUNTED in the
# output's n_dropped_buckets audit column. 256 sits well above the organic
# maximum of this corpus family (96 at sf0.1, 12 at sf0.01) while bounding a
# planted viral class to cap² pairs per bucket.
_PHD_MAXBUCKET = 256


@register(
    "q_multimodal_phash_dedup",
    oracle=f"""
WITH grid AS (
  SELECT doc_id, gx.x AS x, gy.y AS y,
         ((gx.x * 17 + gy.y * 31) * (2 * ((doc_id // 4) * 1103515245 % 128) + 1)
          + (doc_id // 4) * 40503 % 256 + doc_id % 4) % 256 AS p
  FROM documents CROSS JOIN range(8) gx(x) CROSS JOIN range(8) gy(y)
),
s AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p) AS BIGINT) AS total
  FROM grid GROUP BY doc_id
),
ph AS (
  SELECT g.doc_id,
         string_agg(CASE WHEN g.p * s.n > s.total THEN '1' ELSE '0' END, ''
                    ORDER BY g.y, g.x) AS bits
  FROM grid g JOIN s USING (doc_id) GROUP BY g.doc_id
),
bands AS (
  SELECT doc_id, b.i AS band, substr(bits, b.i * 16 + 1, 16) AS key
  FROM ph CROSS JOIN range({_PHD_BANDS}) b(i)
),
bsz AS (SELECT band, key, COUNT(*) AS n FROM bands GROUP BY band, key),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
  JOIN bsz ON bsz.band = a.band AND bsz.key = a.key
  WHERE bsz.n <= {_PHD_MAXBUCKET}
),
scored AS (
  SELECT c.d1, c.d2,
         CAST(len(list_filter(range(1, 65),
              i -> substr(p1.bits, i, 1) <> substr(p2.bits, i, 1))) AS INTEGER)
           AS hamming
  FROM cand c JOIN ph p1 ON c.d1 = p1.doc_id JOIN ph p2 ON c.d2 = p2.doc_id
),
ver AS (SELECT d1, d2, hamming FROM scored WHERE hamming <= {_PHD_MAXHAM}),
stats AS (
  SELECT CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidate_pairs,
         CAST((SELECT COUNT(*) FROM bsz WHERE n > {_PHD_MAXBUCKET}) AS BIGINT)
           AS n_dropped_buckets,
         CAST((SELECT COUNT(*) FROM ver) AS BIGINT) AS n_verified
)
SELECT v.d1, v.d2, v.hamming,
       s.n_candidate_pairs, s.n_dropped_buckets,
       CAST(floor(s.n_verified * 1000000.0 / s.n_candidate_pairs) AS BIGINT)
         AS precision_fp6
FROM ver v CROSS JOIN stats s
""",
)
def q_multimodal_phash_dedup(spark, sf_dir):
    """Image near-duplicate detection by BANDED perceptual hash — the visual
    analogue of SimHash dedup, over genuinely decoded pixels: every document
    renders a real 8×8 PNG (the aHash common-grid convention), the stdlib
    decoder reads it back, and the above-mean bitstring splits into 4
    16-bit bands; images sharing ANY band become candidates, and candidates
    verify with an exact Hamming check. Recall note: 4 bands pigeonhole-
    guarantee a shared band only for Hamming distance ≤ 3; distances 4–6
    are candidate-set-limited (a 2+2+1+1 split across bands is missed).
    The oracle bands identically, so engine parity is exact; widening to
    ≥ 7 bands would restore the guarantee at the cost of 8-bit keys, which
    collide pathologically at corpus scale (≤ 256 keys/band). The oracle
    reproduces every bit from the generative pixel formula with no image
    codec, so a hash match proves the full encode→decode→hash→band→verify
    path.

    Scale shape (VERDICT r05 #2/#4): decode+hash ride the scan
    partition-local (mapInPandas); banding is a 4× explode of 64-bit rows;
    pair generation is GROUP-then-enumerate per (band, key) bucket — one
    shuffle, one task per bucket, never a shuffled self-join — with viral
    buckets (> ``_PHD_MAXBUCKET`` members: identical boilerplate imagery)
    EXCLUDED from enumeration and audited in ``n_dropped_buckets``;
    verification touches candidate pairs only. Every output row carries the
    corpus-level candidate count and the verify precision
    (verified/candidate, fp6) so the correctness gate witnesses candidate
    quality, not just pair cardinality
    (``tests/test_multimodal_queries.py`` pins the floor)."""
    from ..operators.dedup import _pairs_within
    from ..operators.multimodal import (
        attach_png_payload_grouped,
        perceptual_hash_images,
    )
    from .registry import spread

    d = spread(T(spark, sf_dir, "documents"))
    ph = (
        perceptual_hash_images(attach_png_payload_grouped(d.select("doc_id")))
        .select("doc_id", F.col("phash_bits").alias("bits"))
        .transform(persisted)  # consumers: band explode + two verification probes
    )
    bands = ph.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(_PHD_BANDS - 1))).alias("band"),
        F.col("bits"),
    ).select(
        "doc_id",
        "band",
        F.expr("substr(bits, band * 16 + 1, 16)").alias("key"),
    )
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .transform(persisted)  # (band,key)-sized; consumers: pair enumeration + audit
    )
    n_dropped = buckets.agg(
        F.sum((F.size("ids") > _PHD_MAXBUCKET).cast("bigint")).alias(
            "n_dropped_buckets"
        )
    )
    cand = (
        buckets.filter(
            (F.size("ids") > 1) & (F.size("ids") <= _PHD_MAXBUCKET)
        )
        .select(F.explode(_pairs_within(F.col("ids"))).alias("p"))
        .select(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
        .distinct()
    )
    p1 = ph.select(F.col("doc_id").alias("d1"), F.col("bits").alias("b1"))
    p2 = ph.select(F.col("doc_id").alias("d2"), F.col("bits").alias("b2"))
    verified = (
        cand.join(p1, "d1")
        .join(p2, "d2")
        .withColumn(
            "hamming",
            F.expr(
                "size(filter(sequence(1, 64), i -> substr(b1, i, 1) != substr(b2, i, 1)))"
            ).cast("int"),
        )
        .transform(persisted)  # candidate-sized (cap-bounded); consumers: stats + output
    )
    stats = verified.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"),
        F.sum((F.col("hamming") <= _PHD_MAXHAM).cast("bigint")).alias(
            "n_verified"
        ),
    ).crossJoin(F.broadcast(n_dropped))
    return (
        verified.filter(F.col("hamming") <= _PHD_MAXHAM)
        .crossJoin(F.broadcast(stats))
        .select(
            "d1",
            "d2",
            "hamming",
            "n_candidate_pairs",
            F.coalesce("n_dropped_buckets", F.lit(0))
            .cast("bigint")
            .alias("n_dropped_buckets"),
            F.floor(
                F.col("n_verified") * 1_000_000.0 / F.col("n_candidate_pairs")
            )
            .cast("bigint")
            .alias("precision_fp6"),
        )
    )


@register(
    "q_multimodal_pixel_stats",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 16 + 1 AS w, doc_id % 12 + 1 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h, (x * 17 + y * 31 + doc_id) % 256 AS v
  FROM dims, UNNEST(range(0, h)) AS ty(y), UNNEST(range(0, w)) AS tx(x)
),
vstats AS (
  SELECT doc_id, v, CAST(COUNT(*) AS BIGINT) AS c FROM px GROUP BY doc_id, v
),
md AS (
  SELECT doc_id, v AS mode_val, c AS mode_count FROM (
    SELECT doc_id, v, c,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c DESC, v) AS rn
    FROM vstats
  ) WHERE rn = 1
),
st AS (
  SELECT doc_id,
         CAST(MIN(v) AS BIGINT) AS px_min,
         CAST(MAX(v) AS BIGINT) AS px_max,
         CAST(SUM(v) AS BIGINT) AS px_sum,
         CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct_vals
  FROM px GROUP BY doc_id
)
SELECT d.doc_id, CAST(d.w AS INTEGER) AS width, CAST(d.h AS INTEGER) AS height,
       s.px_min, s.px_max, s.px_sum, s.n_distinct_vals,
       CAST(m.mode_val AS BIGINT) AS mode_val, m.mode_count
FROM dims d JOIN st s USING (doc_id) JOIN md m USING (doc_id)
""",
)
def q_multimodal_pixel_stats(spark, sf_dir):
    """Pixel statistics through the REAL image path (encode → zlib → PNG
    decode → numpy stats), hash-checked against DuckDB computing the same
    numbers from the generative pixel formula WITHOUT any codec — the same
    every-pixel parity claim as q_multimodal_phash, extended to the
    histogram features (min/max/sum/distinct/mode) a media-quality screen
    extracts. Decode+stats ride the scan in Arrow batches; only fixed-width
    stats rows move on."""
    from ..operators.multimodal import attach_png_payload, pixel_stats_images
    from .registry import spread

    d = spread(T(spark, sf_dir, "documents"))
    return pixel_stats_images(attach_png_payload(d.select("doc_id")))
