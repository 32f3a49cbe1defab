"""Embedding-column utilities (oracle-checked): L2 normalization and int8
quantization — the standard pre-passes before ANN indexing / storage at
100 TB (normalized vectors make cosine = dot; int8 cuts the embedding store
4× and the shuffle bytes with it).

Engine-stability: norms use the ordered-fold dot product (see
operators/dedup.py), division is elementwise IEEE double (bit-stable in both
engines), and quantization floors to integers, so every value hash-matches
DuckDB exactly.
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
       list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS unit
FROM e
""",
)
def q_embedding_normalize(spark, sf_dir):
    """Unit-normalize embeddings (projection only — no shuffle; at ingest
    this runs once so every downstream cosine becomes a plain dot)."""
    e = T(spark, sf_dir, "embeddings")
    nrm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    return e.select(
        "vec_id",
        nrm.alias("l2_norm"),
        F.transform("embedding", lambda x: x.cast("double") / nrm).alias("unit"),
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
       list_transform(embedding,
         x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / mx) AS INTEGER)) AS q8
FROM m
""",
)
def q_embedding_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization (floor(x·127/max|x|)): 4×
    smaller at rest and on the wire; floor keeps both engines integer-exact.
    Projection only — the scale factor rides along for dequantization."""
    e = T(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    return e.select(
        "vec_id",
        mx.alias("max_abs"),
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * F.lit(127.0) / mx).cast("int"),
        ).alias("q8"),
    )
