"""Embedding-column utilities (oracle-checked): L2 normalization and int8
quantization — the standard pre-passes before ANN indexing / storage at
100 TB (normalized vectors make cosine = dot; int8 cuts the embedding store
4× and the shuffle bytes with it).

Engine-stability: norms use the ordered-fold dot product (see
operators/dedup.py), division is elementwise IEEE double (bit-stable in both
engines), and quantization floors to integers, so every value hash-matches
DuckDB exactly.

Output shape: array columns are emitted as comma-joined STRINGS (the driver's
correctness gate canonicalizes by sorting pandas object columns, which cannot
hash raw lists — CORRECTNESS_r02 recorded both queries as errors for exactly
this). Integer arrays join directly; the unit vector joins as fixed-point
``floor(x·1e9)`` bigints because raw double→string formatting is NOT portable
across engines (Spark's Java ``Double.toString`` vs DuckDB's formatter differ
on scientific-notation thresholds and rounding), while the doubles themselves
are IEEE-identical — so the floor is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import _dot
from .registry import T, register

_DOT_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, v) -> acc + v)"
)


@register(
    "q_embedding_normalize",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
)
SELECT vec_id,
       nrm AS l2_norm,
       array_to_string(list_transform(embedding,
         x -> CAST(FLOOR(CAST(x AS DOUBLE) / nrm * 1000000000.0) AS BIGINT)),
         ',') AS unit_fp9
FROM e
""",
)
def q_embedding_normalize(spark, sf_dir):
    """Unit-normalize embeddings (projection only — no shuffle; at ingest
    this runs once so every downstream cosine becomes a plain dot).
    ``unit_fp9`` is the unit vector as comma-joined fixed-point nanounits
    (see module docstring for why not raw doubles)."""
    e = T(spark, sf_dir, "embeddings")
    nrm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    return e.select(
        "vec_id",
        nrm.alias("l2_norm"),
        F.array_join(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") / nrm * F.lit(1000000000.0))
                .cast("bigint")
                .cast("string"),
            ),
            ",",
        ).alias("unit_fp9"),
    )


@register(
    "q_embedding_quantize_int8",
    oracle="""
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
  FROM embeddings
)
SELECT vec_id,
       mx AS max_abs,
       array_to_string(list_transform(embedding,
         x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / mx) AS INTEGER)), ',') AS q8
FROM m
""",
)
def q_embedding_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization (floor(x·127/max|x|)): 4×
    smaller at rest and on the wire; floor keeps both engines integer-exact.
    Projection only — the scale factor rides along for dequantization.
    ``q8`` joins as a comma string so the driver gate can canonicalize it."""
    e = T(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    return e.select(
        "vec_id",
        mx.alias("max_abs"),
        F.array_join(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * F.lit(127.0) / mx)
                .cast("int")
                .cast("string"),
            ),
            ",",
        ).alias("q8"),
    )


MRL_DIM = 16


@register(
    "q_embedding_truncate_mrl",
    oracle=f"""
WITH t AS (
  SELECT vec_id, list_slice(embedding, 1, {MRL_DIM}) AS sub FROM embeddings
),
n AS (
  SELECT vec_id, sub,
         sqrt({_DOT_SQL.format(a='sub', b='sub')}) AS nrm
  FROM t
)
SELECT vec_id,
       nrm AS sub_norm,
       array_to_string(list_transform(sub,
         x -> CAST(FLOOR(CAST(x AS DOUBLE) / nrm * 1000000000.0) AS BIGINT)),
         ',') AS unit_fp9
FROM n
""",
)
def q_embedding_truncate_mrl(spark, sf_dir):
    """Matryoshka-style truncation: keep the first {MRL_DIM} dims and
    re-normalize — the cheap-retrieval representation for coarse ANN stages
    (full-dim rescoring happens on the candidate set only). Pure projection,
    no shuffle; fixed-point stringified like the other embedding passes."""
    e = T(spark, sf_dir, "embeddings")
    sub = F.slice(F.col("embedding"), 1, MRL_DIM)
    nrm = F.sqrt(_dot(sub, sub))
    return e.select(
        "vec_id",
        nrm.alias("sub_norm"),
        F.array_join(
            F.transform(
                sub,
                lambda x: F.floor(x.cast("double") / nrm * F.lit(1000000000.0))
                .cast("bigint")
                .cast("string"),
            ),
            ",",
        ).alias("unit_fp9"),
    )
