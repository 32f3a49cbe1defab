"""Late-interaction retrieval (MaxSim) and binary-embedding Hamming search.

Two retrieval primitives a 100 TB training/RAG pipeline runs after the
first-stage candidate generators in ``plans/search.py`` / ``similarity.py``:

* **MaxSim late interaction** (Khattab & Zaharia, ColBERT, SIGIR 2020): a
  query scores a document as the SUM over query tokens of the MAX similarity
  against any document token. Token embeddings here are deterministic
  md5-derived pseudo-vectors (dim 8, byte components) so the whole scoring
  path is exact integer arithmetic and hash-oracled — the Spark shape is the
  real one: similarities are computed on the DISTINCT-WORD vocabulary frame
  (|V| x |Q-tokens| rows, NEVER corpus x tokens), and the corpus joins the
  scored vocabulary on the word key once.

* **Binary embedding search** (sign quantization, Hamming ranking): each
  64-dim float vector packs into two 32-bit words (sign bits); candidate
  ranking is two XOR+popcounts per pair — 16 bytes of state and ~64x less
  arithmetic than float cosine, which is why binary codes are the standard
  first stage before an exact rerank. An in-plan witness flags which
  Hamming top-k survive in the EXACT cosine top-k.

Cross-engine exactness: integer dot products, integer-division fp6 ratios
(Spark ``div`` == DuckDB ``//``), float sign tests (bit-identical parquet
floats), and ``bit_count``/xor — no accumulation-order-dependent floats
anywhere except the ordered-fold cosine reused from ``sim_knn_bruteforce``.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.search import _TOKENS
from ..operators.similarity import knn_bruteforce
from .registry import T, persisted, register, spread
from .search import _TOKS_SQL

# ---------------------------------------------------------------------------
# MaxSim late interaction
# ---------------------------------------------------------------------------

_MAXSIM_DIM = 8
_MAXSIM_TOPK = 10
# (qid, qpos, token) — the fixed evaluation query set, literal in BOTH engines
_MAXSIM_QUERIES = [
    (1, 1, "spark"), (1, 2, "partition"), (1, 3, "shuffle"),
    (2, 1, "hash"), (2, 2, "join"), (2, 3, "table"),
    (3, 1, "window"), (3, 2, "sort"), (3, 3, "merge"), (3, 4, "batch"),
    (4, 1, "scan"), (4, 2, "value"), (4, 3, "row"),
]


def _vec_spark(tok: str) -> str:
    """dim-8 pseudo-embedding: byte j of md5('emb:' || token), as BIGINT."""
    return (
        f"transform(sequence(1, {_MAXSIM_DIM}), j -> "
        f"cast(conv(substring(md5(concat('emb:', {tok})), 2*j - 1, 2), 16, 10)"
        " as bigint))"
    )


def _vec_duck(tok: str) -> str:
    return (
        f"list_transform(range(1, {_MAXSIM_DIM + 1}), j -> "
        f"CAST(('0x' || substr(md5('emb:' || {tok}), CAST(2*j - 1 AS INT), 2))"
        " AS BIGINT))"
    )


_DOT_SPARK = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v)"
_DOT_DUCK = "list_reduce(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]), (acc, v) -> acc + v)"

_MAXSIM_VALUES = ", ".join(f"({q}, {p}, '{t}')" for q, p, t in _MAXSIM_QUERIES)

_MAXSIM_ORACLE = f"""
WITH qt AS (
  SELECT qid, qpos, qtok, {_vec_duck('qtok')} AS qvec
  FROM (VALUES {_MAXSIM_VALUES}) AS v(qid, qpos, qtok)
),
qn AS (
  SELECT qid, qpos, qtok, qvec,
         {_DOT_DUCK.format(a='qvec', b='qvec')} + 1 AS qnorm
  FROM qt
),
vocab AS (
  SELECT DISTINCT unnest({_TOKS_SQL}) AS word FROM documents
),
vv AS (
  SELECT word, {_vec_duck('word')} AS dvec FROM vocab
),
vn AS (
  SELECT word, dvec,
         {_DOT_DUCK.format(a='dvec', b='dvec')} + 1 AS dnorm
  FROM vv
),
scored AS (
  SELECT v.word, q.qid, q.qpos,
         (d.dot * d.dot * 1000000) // (v.dnorm * q.qnorm) AS sim_fp6
  FROM vn v, qn q,
       LATERAL (SELECT {_DOT_DUCK.format(a='v.dvec', b='q.qvec')} AS dot) d
),
doc_words AS (
  SELECT DISTINCT doc_id, word FROM (
    SELECT doc_id, unnest({_TOKS_SQL}) AS word FROM documents
  )
),
per_tok AS (
  SELECT s.qid, s.qpos, w.doc_id, MAX(s.sim_fp6) AS best
  FROM doc_words w JOIN scored s USING (word)
  GROUP BY s.qid, s.qpos, w.doc_id
),
per_doc AS (
  SELECT qid, doc_id, CAST(SUM(best) AS BIGINT) AS maxsim_fp6
  FROM per_tok GROUP BY qid, doc_id
)
SELECT qid, rank, doc_id, maxsim_fp6 FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY qid ORDER BY maxsim_fp6 DESC, doc_id) AS INTEGER) AS rank
  FROM per_doc
) t WHERE rank <= {_MAXSIM_TOPK}
"""


@register("q_maxsim_late_interaction", oracle=_MAXSIM_ORACLE)
def q_maxsim_late_interaction(spark, sf_dir):
    """ColBERT-style MaxSim rerank: score(q, d) = Σ_{{q-token}} max_{{d-token}}
    sim(qt, dt); top-10 docs per query. Similarity = squared-cosine fp6 over
    deterministic md5 pseudo-embeddings (integer dot products; +1 on the
    self-dot denominators dodges an impossible-but-engine-divergent 0/0).

    Scale shape: the similarity matrix is computed ONCE on the distinct-word
    vocabulary crossed with the (broadcast, ~13-row) query-token frame —
    |V|·|Qtok| rows, independent of corpus size; the corpus contributes one
    tokenize→distinct pass and one word-keyed join against the scored vocab,
    then two keyed aggregates (max per query-token, sum per doc). Corpus
    token embeddings are NEVER materialized per occurrence — that is the
    difference between this plan and the naive corpus×query cross score."""
    docs = spread(T(spark, sf_dir, "documents"))
    qt = spark.createDataFrame(
        _MAXSIM_QUERIES, "qid int, qpos int, qtok string"
    ).selectExpr(
        "qid",
        "qpos",
        f"{_vec_spark('qtok')} AS qvec",
    ).selectExpr(
        "qid",
        "qpos",
        "qvec",
        f"{_DOT_SPARK.format(a='qvec', b='qvec')} + cast(1 as bigint) AS qnorm",
    )
    # ONE corpus scan + tokenize: the distinct (doc, word) frame is
    # persisted (tracked; harnesses release it) and feeds BOTH the vocab
    # derivation and the score join — without the persist Catalyst
    # collapses the vocab side's double-distinct into a second full scan
    # and the text column tokenizes twice
    doc_words = (
        docs.selectExpr("doc_id", f"explode({_TOKENS}) AS word")
        .distinct()
        .transform(persisted)
    )
    vocab = doc_words.select("word").distinct()
    vn = vocab.selectExpr(
        "word", f"{_vec_spark('word')} AS dvec"
    ).selectExpr(
        "word",
        "dvec",
        f"{_DOT_SPARK.format(a='dvec', b='dvec')} + cast(1 as bigint) AS dnorm",
    )
    scored = vn.crossJoin(F.broadcast(qt)).selectExpr(
        "word",
        "qid",
        "qpos",
        f"({_DOT_SPARK.format(a='dvec', b='qvec')} * "
        f"{_DOT_SPARK.format(a='dvec', b='qvec')} * cast(1000000 as bigint))"
        " div (dnorm * qnorm) AS sim_fp6",
    )
    per_tok = doc_words.join(scored, "word").groupBy("qid", "qpos", "doc_id").agg(
        F.max("sim_fp6").alias("best")
    )
    per_doc = per_tok.groupBy("qid", "doc_id").agg(
        F.sum("best").cast("bigint").alias("maxsim_fp6")
    )
    w = Window.partitionBy("qid").orderBy(F.desc("maxsim_fp6"), "doc_id")
    return (
        per_doc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _MAXSIM_TOPK)
        .select("qid", "rank", "doc_id", "maxsim_fp6")
    )


# ---------------------------------------------------------------------------
# Binary (sign-quantized) embeddings + Hamming top-k with exact-cosine witness
# ---------------------------------------------------------------------------

_HAM_K = 5
_HAM_QUERIES = 10  # query set = vec_id < 10, matching the sim_ann_* family

_PACK_SPARK = (
    "aggregate(sequence(0, 31), cast(0 as bigint), (acc, j) -> acc + "
    "CASE WHEN element_at(embedding, cast(j + {off} + 1 as int)) > 0 "
    "THEN shiftleft(cast(1 as bigint), cast(j as int)) ELSE cast(0 as bigint) END)"
)
_PACK_DUCK = (
    "CAST(list_sum(list_transform(range(0, 32), j -> "
    "CASE WHEN embedding[CAST(j + {off} + 1 AS INT)] > 0 "
    "THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
)

_ORDERED_DOT_DUCK = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, v) -> acc + v)"
)

_HAMMING_ORACLE = f"""
WITH packed AS (
  SELECT vec_id, embedding,
         {_PACK_DUCK.format(off=0)} AS w0,
         {_PACK_DUCK.format(off=32)} AS w1,
         sqrt({_ORDERED_DOT_DUCK.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
ham AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(bit_count(xor(q.w0, c.w0)) + bit_count(xor(q.w1, c.w1))
              AS BIGINT) AS hamming
  FROM packed q JOIN packed c
    ON q.vec_id < {_HAM_QUERIES} AND q.vec_id <> c.vec_id
),
topk AS (
  SELECT query_id, neighbor_id, hamming,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY hamming, neighbor_id) AS INTEGER) AS rank
  FROM ham
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
             {_ORDERED_DOT_DUCK.format(a='q.embedding', b='c.embedding')}
               / (q.nrm * c.nrm) DESC, c.vec_id) AS rk
    FROM packed q JOIN packed c
      ON q.vec_id < {_HAM_QUERIES} AND q.vec_id <> c.vec_id
  ) WHERE rk <= {_HAM_K}
)
SELECT t.query_id, t.rank, t.neighbor_id, t.hamming,
       CAST(CASE WHEN e.neighbor_id IS NULL THEN 0 ELSE 1 END AS BIGINT)
         AS in_exact_topk
FROM topk t LEFT JOIN exact e
  ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
WHERE t.rank <= {_HAM_K}
"""


@register("q_embedding_binarize_hamming", oracle=_HAMMING_ORACLE)
def q_embedding_binarize_hamming(spark, sf_dir):
    """Sign-binarized embeddings: 64 float dims → two 32-bit sign words;
    Hamming top-5 per query via XOR+popcount, each hit flagged with whether
    it also appears in the EXACT cosine top-5 (the retained-recall witness a
    team checks before swapping binary codes into the first stage).

    Scale shape: packing is a projection (16 bytes/vector of index state —
    a 4096x compression of a float64x64 vector); candidate scoring is two
    xor+bit_count per pair instead of a 64-term float dot (~64x less
    arithmetic, the reason binary first stages exist). The query set is a
    filtered broadcast; ties break on neighbor_id so ranking is exact. The
    cosine witness reuses the ordered-fold dot from sim_knn_bruteforce —
    engine-stable floats."""
    e = T(spark, sf_dir, "embeddings")
    packed = e.selectExpr(
        "vec_id",
        "embedding",
        f"{_PACK_SPARK.format(off=0)} AS w0",
        f"{_PACK_SPARK.format(off=32)} AS w1",
    )
    q = packed.filter(F.col("vec_id") < _HAM_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    ham = (
        packed.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .selectExpr(
            "query_id",
            "vec_id AS neighbor_id",
            "cast(bit_count(qw0 ^ w0) + bit_count(qw1 ^ w1) as bigint) AS hamming",
        )
    )
    w = Window.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    topk = (
        ham.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _HAM_K)
    )
    exact = knn_bruteforce(
        e, e.filter(F.col("vec_id") < _HAM_QUERIES), k=_HAM_K
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    return (
        topk.join(F.broadcast(exact), ["query_id", "neighbor_id"], "left")
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            "hamming",
            F.coalesce("hit", F.lit(0)).cast("bigint").alias("in_exact_topk"),
        )
    )
