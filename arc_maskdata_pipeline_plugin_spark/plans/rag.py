"""RAG ingest pipeline: chunk -> embed (stub) -> coarse ANN index, one lineage.

The retrieval-augmented-generation ingest shape end-to-end: context-window
chunking (``operators/text.py::with_chunks``, zero shuffle), a deterministic
hash-projection "embedding" standing in for the model call (the real encoder
is a Pandas-UDF batch at the same seam — hash projection keeps the whole
pipeline integer-exact and therefore oracle-checkable), and hyperplane-sign
coarse quantization into 16 index cells — the bucketed layout an ANN index
(`sim_ann_lsh` / `sim_ann_ivf`) probes at query time.

Scale shape: chunking and embedding are partition-local projections; the only
shuffle is the final per-cell aggregate (map-side combined). Building the
index for a 100 TB corpus is therefore scan-dominated, exactly as it should
be; the cell histogram this query emits is the skew audit for the index
(viral cells = the LSH bucket-cap discussion in ``operators/dedup.py``).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.text import with_chunks
from .registry import T, register

_DIMS = 8
# Fixed integer hyperplanes (4 planes x 8 dims, values in [-1000, 1000]) —
# literal constants so Spark and the oracle provably use the same planes.
_PLANES = [
    [433, -871, 209, 655, -118, -940, 512, 77],
    [-602, 318, 990, -245, 734, -66, -389, 841],
    [125, -503, -777, 368, 901, 254, -648, -92],
    [-958, 147, 286, -531, -20, 683, 415, -736],
]


def _dim_spark(i: int) -> str:
    return (
        f"(CAST(conv(substring(md5(concat(chunk_text, '#{i}')), 1, 8), 16, 10) "
        f"AS BIGINT) % 2001 - 1000)"
    )


def _dim_duck(i: int) -> str:
    return f"(CAST(('0x' || substr(md5(chunk_text || '#{i}'), 1, 8)) AS BIGINT) % 2001 - 1000)"


def _cell_expr(dim_fn) -> str:
    dots = []
    for plane in _PLANES:
        dots.append(
            "(" + " + ".join(f"({w}) * {dim_fn(i)}" for i, w in enumerate(plane)) + ")"
        )
    return " + ".join(
        f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)" for j, dot in enumerate(dots)
    )


@register(
    "q_rag_index_build",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
),
chunks AS (
  SELECT doc_id,
         array_to_string(list_slice(tk, s, s + 49), ' ') AS chunk_text
  FROM t, UNNEST(generate_series(1, greatest(len(tk), 1), 40)) AS g(s)
)
SELECT CAST({_cell_expr(_dim_duck)} AS INTEGER) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM chunks
GROUP BY cell
""",
)
def q_rag_index_build(spark, sf_dir):
    """Build the coarse ANN index for a RAG corpus in one lineage: 50-token
    chunks (stride 40), an 8-dim integer hash-projection embedding per chunk
    (the deterministic stand-in at the encoder's Pandas-UDF seam), and
    4-hyperplane sign quantization into 16 cells. Emits the per-cell
    (n_chunks, n_docs) histogram — the index's skew audit. Everything before
    the final map-side-combined aggregate is a partition-local projection;
    integer dot products make cell membership bit-exact in both engines."""
    d = T(spark, sf_dir, "documents")
    chunks = with_chunks(d, chunk_size=50, stride=40).select("doc_id", "chunk_text")
    return (
        chunks.select(
            "doc_id", F.expr(_cell_expr(_dim_spark)).cast("int").alias("cell")
        )
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
    )
