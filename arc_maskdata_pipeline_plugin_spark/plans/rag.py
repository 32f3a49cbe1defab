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
from .lm import _TOKENS as _RAG_TOKS
from .lm import _TOKS_SQL as _RAG_TOKS_SQL
from .registry import T, register, spread

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


# ---------------------------------------------------------------------------
# Greedy character-budget chunker — a REAL Python UDTF (round 12).
#
# ``with_chunks`` packs FIXED word windows (a pure projection, the fast
# path); real RAG ingest packs by a character/token BUDGET, and greedy
# budget packing is inherently sequential per document (each boundary
# depends on the previous one) — not expressible in Spark SQL without
# recursion. That makes it the honest use-case for the one API surface the
# engine had not yet exercised: a PySpark user-defined TABLE function
# (``pyspark.sql.functions.udtf``), lateral-joined per document. The loop
# is per-DOCUMENT Python (partition-local, zero shuffle; cost ∝ tokens,
# like every other scan projection) — acceptable precisely because the
# semantics rule out the JVM path, the module's stated bar for UDFs.
#
# Semantics (deterministic): tokens in order; a chunk accumulates words
# while packed cost (Σ len(word) + separators) stays ≤ _CHUNK_BUDGET; a
# word that would overflow closes the chunk and starts the next — unless
# the chunk is empty, in which case the oversized word becomes a chunk of
# its own (no word is ever dropped). The DuckDB oracle replays the same
# recursion as a RECURSIVE CTE over per-doc prefix-sum lists (depth =
# max chunks/doc; the monotone cost lets each boundary close in one
# list_filter count).
# ---------------------------------------------------------------------------

_CHUNK_BUDGET = 200

_CHUNK_E_EXPR = (
    "GREATEST(s, s - 1 + len(list_filter(range(s, n + 1), "
    "j -> cl[CAST(j + 1 AS INT)] - cl[CAST(s AS INT)] + (j - s) "
    f"<= {_CHUNK_BUDGET})))"
)

_CHUNK_ORACLE = f"""
WITH RECURSIVE tk AS (
  SELECT doc_id, {{toks}} AS toks FROM documents
),
base AS (
  SELECT doc_id, len(toks) AS n,
         list_transform(range(0, len(toks) + 1),
           k -> COALESCE(list_sum(list_transform(toks[1:CAST(k AS INT)],
                t -> len(t))), 0)) AS cl
  FROM tk WHERE len(toks) > 0
),
chunks AS (
  SELECT doc_id, n, cl, CAST(0 AS BIGINT) AS chunk_id, CAST(1 AS BIGINT) AS s
  FROM base
  UNION ALL
  SELECT doc_id, n, cl, chunk_id + 1, {_CHUNK_E_EXPR} + 1
  FROM chunks
  WHERE {_CHUNK_E_EXPR} < n
)
SELECT doc_id, chunk_id,
       CAST({_CHUNK_E_EXPR} - s + 1 AS BIGINT) AS n_words,
       CAST(cl[CAST({_CHUNK_E_EXPR} + 1 AS INT)] - cl[CAST(s AS INT)]
            + ({_CHUNK_E_EXPR} - s) AS BIGINT) AS n_chars_packed,
       CAST(s AS BIGINT) AS first_word_idx
FROM chunks
"""


def _register_chunker_udtf(spark):
    from pyspark.sql.functions import udtf

    budget = _CHUNK_BUDGET

    @udtf(
        returnType=(
            "chunk_id bigint, n_words bigint, n_chars_packed bigint, "
            "first_word_idx bigint"
        )
    )
    class GreedyChunker:
        def eval(self, toks):  # noqa: ANN001 — UDTF row signature
            if not toks:
                return
            chunk_id, start, words, chars = 0, 1, 0, 0
            for i, t in enumerate(toks, start=1):
                cost = len(t) if words == 0 else len(t) + 1
                if words > 0 and chars + cost > budget:
                    yield chunk_id, words, chars, start
                    chunk_id, start, words, chars = chunk_id + 1, i, 1, len(t)
                else:
                    words += 1
                    chars += cost
            yield chunk_id, words, chars, start

    spark.udtf.register("greedy_chunker", GreedyChunker)


@register(
    "q_greedy_chunk_udtf",
    oracle=_CHUNK_ORACLE.format(toks=_RAG_TOKS_SQL),
)
def q_greedy_chunk_udtf(spark, sf_dir):
    """Greedy character-budget document chunking via a Python UDTF
    (section docstring above: sequential per-doc packing, lateral join,
    partition-local, zero shuffle; the oracle replays the identical
    recursion as a DuckDB RECURSIVE CTE). Emits one row per chunk:
    (doc_id, chunk_id, n_words, n_chars_packed, first_word_idx)."""
    _register_chunker_udtf(spark)
    docs = spread(T(spark, sf_dir, "documents"))
    docs.selectExpr("doc_id", f"{_RAG_TOKS}" + " AS toks").createOrReplaceTempView(
        "_chunk_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.n_words, c.n_chars_packed,
               c.first_word_idx
        FROM _chunk_docs d, LATERAL greedy_chunker(d.toks) c
        """
    )
