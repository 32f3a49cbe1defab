"""Retrieval + corpus-LM queries over ``documents`` (oracle-checked), plus
the Bloom-filter dedup screen.

Engine-parity rules applied throughout (see plans/registry.py docstring):
* tokenization is the same normalize→split→strip pipeline in Spark SQL and
  DuckDB list ops;
* rankings order by integer keys or exact DECIMAL sums, never raw float
  aggregates; float *values* in the output are rounded;
* the Bloom filter's bit positions are md5-derived, so both engines compute
  the identical filter.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.bloom import DEFAULT_K, DEFAULT_M, bloom_screen
from ..operators.search import (
    bm25_search,
    inverted_index,
    tfidf_top_terms,
    unigram_logprob,
)
from .registry import T, register

# DuckDB mirror of operators.search._TOKENS
_TOKS_SQL = (
    r"list_filter(list_transform(string_split_regex(lower(trim(text)), '\s+'), "
    r"t -> regexp_replace(t, '[^a-z0-9]', '', 'g')), t -> t <> '')"
)

_BASE_CTES = f"""
tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
tok AS (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM tk),
post AS (
  SELECT term, doc_id, dl, CAST(COUNT(*) AS INTEGER) AS tf
  FROM tok GROUP BY term, doc_id, dl
)"""


@register(
    "q_inverted_index",
    oracle=f"""
WITH {_BASE_CTES},
ranked AS (
  SELECT term, doc_id, tf,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
  FROM post
)
SELECT p.term,
       CAST(COUNT(*) AS INTEGER) AS n_docs_with_term,
       CAST(SUM(p.tf) AS BIGINT) AS total_tf,
       MAX(CASE WHEN r.rn = 1 THEN r.doc_id END) AS top_doc_id,
       CAST(MAX(p.tf) AS INTEGER) AS top_tf
FROM post p
LEFT JOIN ranked r ON p.term = r.term AND p.doc_id = r.doc_id AND r.rn = 1
GROUP BY p.term
""",
)
def q_inverted_index(spark, sf_dir):
    """Postings-list summary per term (df, total tf, argmax doc)."""
    return inverted_index(T(spark, sf_dir, "documents"))


TOP_N = 3


@register(
    "q_tfidf_top_terms",
    oracle=f"""
WITH {_BASE_CTES},
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
stats AS (SELECT term, CAST(COUNT(*) AS INTEGER) AS n_docs_with_term FROM post GROUP BY term),
scored AS (
  SELECT p.doc_id, p.term, p.tf, s.n_docs_with_term,
         ROUND(p.tf * (ln((n.n_docs + 1.0) / (s.n_docs_with_term + 1.0)) + 1.0), 6) AS tfidf,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY p.doc_id
           ORDER BY p.tf DESC, s.n_docs_with_term ASC, p.term ASC) AS INTEGER) AS rank
  FROM post p JOIN stats s USING (term) CROSS JOIN nd n
)
SELECT doc_id, term, tf, n_docs_with_term, tfidf, rank
FROM scored WHERE rank <= {TOP_N}
""",
)
def q_tfidf_top_terms(spark, sf_dir):
    """Per-document top-{TOP_N} terms; integer ranking keys, rounded score."""
    return tfidf_top_terms(T(spark, sf_dir, "documents"), top_n=TOP_N)


# Fixed query workload for BM25 — literal in both engines.
BM25_QUERIES: list[tuple[int, str]] = [
    (1, "hash join"),
    (2, "window agg"),
    (3, "stream batch customer"),
    (4, "vector scan"),
    (5, "merge sort order"),
]
BM25_K = 10
_K1, _B = 1.2, 0.75


def _bm25_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, q in BM25_QUERIES for t in q.split()
    )
    # Arithmetic written with the same association order as the Spark
    # expression so IEEE doubles agree bit-for-bit before the decimal cast.
    contrib = (
        f"ln(1.0 + (n.n_docs - s.n_docs_with_term + 0.5) / (s.n_docs_with_term + 0.5))"
        f" * (p.tf * ({_K1!r} + 1.0) / (p.tf + {_K1!r} * (1.0 - {_B!r} + {_B!r} * p.dl / a.avgdl)))"
    )
    return f"""
WITH {_BASE_CTES},
qt(query_id, term) AS (VALUES {vals}),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
stats AS (SELECT term, CAST(COUNT(*) AS INTEGER) AS n_docs_with_term FROM post GROUP BY term),
a AS (SELECT CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl FROM tk),
scored AS (
  SELECT qt.query_id, p.doc_id,
         SUM(CAST({contrib} AS DECIMAL(20,9))) AS score_dec
  FROM post p
  JOIN qt USING (term)
  JOIN stats s USING (term)
  CROSS JOIN nd n CROSS JOIN a
  GROUP BY qt.query_id, p.doc_id
)
SELECT query_id, doc_id,
       ROUND(CAST(score_dec AS DOUBLE), 6) AS bm25, rank
FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score_dec DESC, doc_id) AS INTEGER) AS rank
  FROM scored
) t WHERE rank <= {BM25_K}
"""


@register("q_bm25_search", oracle=_bm25_oracle())
def q_bm25_search(spark, sf_dir):
    """BM25 top-{BM25_K} docs for a fixed 5-query workload."""
    docs = T(spark, sf_dir, "documents")
    qt = spark.createDataFrame(
        [(qid, t) for qid, q in BM25_QUERIES for t in q.split()],
        "query_id int, term string",
    )
    return bm25_search(docs, qt, k=BM25_K, k1=_K1, b=_B)


@register(
    "q_unigram_logprob",
    oracle=f"""
WITH {_BASE_CTES},
freq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY term),
tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total_toks FROM freq),
lp AS (
  SELECT t.doc_id, CAST(ln(f.cnt / tt.total_toks) AS DECIMAL(20,9)) AS lp
  FROM tok t JOIN freq f USING (term) CROSS JOIN tot tt
)
SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_tokens,
       ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_logprob
FROM lp GROUP BY doc_id
""",
)
def q_unigram_logprob(spark, sf_dir):
    """Average unigram log-probability per doc — perplexity proxy."""
    return unigram_logprob(T(spark, sf_dir, "documents"))


def _bloom_oracle() -> str:
    m, k = DEFAULT_M, DEFAULT_K
    return f"""
WITH h AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
  FROM documents
),
pos AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || h), 1, 15))::BIGINT % {m} AS pos
  FROM h CROSS JOIN range({k}) r(i)
),
filter_bits AS (SELECT DISTINCT pos FROM pos WHERE doc_id % 5 <> 0),
hits AS (
  SELECT p.doc_id, COUNT(fb.pos) AS n_set
  FROM pos p LEFT JOIN filter_bits fb USING (pos)
  GROUP BY p.doc_id
),
truth AS (
  SELECT DISTINCT a.doc_id FROM h a
  JOIN (SELECT h FROM h WHERE doc_id % 5 <> 0) c ON a.h = c.h
)
SELECT a.doc_id,
       (COALESCE(n_set, 0) = {k}) AS might_contain,
       (t.doc_id IS NOT NULL) AS actual_dup
FROM h a
LEFT JOIN hits USING (doc_id)
LEFT JOIN truth t ON a.doc_id = t.doc_id
"""


@register("q_bloom_dedup_screen", oracle=_bloom_oracle())
def q_bloom_dedup_screen(spark, sf_dir):
    """Bloom screen of all docs against a filter built from docs with
    doc_id % 5 != 0 — corpus members must all report might_contain (no false
    negatives); held-out docs exhibit the filter's false-positive rate,
    observable against the actual_dup ground-truth column."""
    docs = T(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    return bloom_screen(corpus, docs)


@register(
    "q_bigram_logprob",
    oracle=f"""
WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks)),
           i -> {{'w1': toks[CAST(i AS INT)], 'w2': toks[CAST(i + 1 AS INT)]}})) AS p
  FROM tk WHERE len(toks) >= 2
),
b AS (SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM bg),
pair_freq AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM b GROUP BY w1, w2),
head_freq AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM b GROUP BY w1),
vocab AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM head_freq),
lp AS (
  SELECT b.doc_id,
         CAST(ln((p.c12 + 1.0) / (h.c1 + vv.v)) AS DECIMAL(20,9)) AS lp
  FROM b JOIN pair_freq p USING (w1, w2) JOIN head_freq h USING (w1)
  CROSS JOIN vocab vv
)
SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bigrams,
       ROUND(CAST(SUM(lp) AS DOUBLE) / COUNT(*), 6) AS avg_bigram_logprob
FROM lp GROUP BY doc_id
""",
)
def q_bigram_logprob(spark, sf_dir):
    """Add-one-smoothed bigram LM score per doc (word-salad screen)."""
    from ..operators.search import bigram_logprob

    return bigram_logprob(T(spark, sf_dir, "documents"))


# nDCG@10 discount weights as exact integer literals (floor(1e9/log2(i+1)))
# computed ONCE in Python and embedded identically in both engines — the
# q_ewma_daily_value weight-table discipline: the discount table cannot
# diverge across engines because neither engine computes it.
import math as _math

_NDCG_W = [int(1_000_000_000 / _math.log2(i + 1)) for i in range(1, BM25_K + 1)]


def _ndcg_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, q in BM25_QUERIES for t in q.split()
    )
    wvals = ", ".join(f"({i + 1}, {w})" for i, w in enumerate(_NDCG_W))
    return f"""
WITH bm AS (
{_bm25_oracle()}
),
ndcg_qt AS (SELECT * FROM (VALUES {vals}) AS t(query_id, term)),
wt AS (SELECT * FROM (VALUES {wvals}) AS t(rnk, w)),
doc_terms AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
),
rels AS (
  SELECT q.query_id, p.doc_id, CAST(COUNT(*) AS BIGINT) AS rel
  FROM ndcg_qt q JOIN doc_terms p ON q.term = p.term
  GROUP BY q.query_id, p.doc_id
),
dcg AS (
  SELECT b.query_id,
         CAST(SUM(r.rel * wt.w) AS BIGINT) AS dcg,
         CAST(COUNT(*) AS BIGINT) AS n_ranked
  FROM bm b JOIN rels r ON b.query_id = r.query_id AND b.doc_id = r.doc_id
  JOIN wt ON b.rank = wt.rnk
  GROUP BY b.query_id
),
ideal AS (
  SELECT query_id, CAST(SUM(rel * wt.w) AS BIGINT) AS idcg
  FROM (
    SELECT query_id, rel,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, doc_id) AS rn
    FROM rels
  ) t JOIN wt ON t.rn = wt.rnk
  WHERE rn <= {BM25_K}
  GROUP BY query_id
)
SELECT d.query_id, d.n_ranked, d.dcg, i.idcg,
       CAST(floor(d.dcg * 1000000.0 / i.idcg) AS BIGINT) AS ndcg_fp6
FROM dcg d JOIN ideal i ON d.query_id = i.query_id
"""


@register("q_search_ndcg", oracle=_ndcg_oracle())
def q_search_ndcg(spark, sf_dir):
    """Retrieval-quality evaluation: nDCG@10 of the BM25 ranking against a
    term-frequency graded relevance (rel(q, d) = total query-term occurrences in d —
    the label-free proxy a pipeline uses to sanity-check a ranker before
    human judgments exist). Discount weights are exact fp9 integer LITERALS
    embedded identically in both engines, gains are integers, so DCG/IDCG
    are exact BIGINT sums and the score is a floored fp6 ratio.

    Scale shape: relevance comes from the same one-postings-shuffle join as
    BM25 itself (query terms broadcast); the ideal ranking needs only docs
    with rel ≥ 1 (the postings join's output), top-10 per query via a
    query-partitioned window over that bounded candidate frame."""
    from ..operators.search import _TOKENS, bm25_search

    docs = T(spark, sf_dir, "documents")
    qt = spark.createDataFrame(
        [(qid, t) for qid, q in BM25_QUERIES for t in q.split()],
        "query_id int, term string",
    )
    bm = bm25_search(docs, qt, k=BM25_K, k1=_K1, b=_B).select(
        "query_id", "doc_id", "rank"
    )
    tok = docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
    rels = (
        tok.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("rel"))
    )
    w_arr = F.array(*[F.lit(w) for w in _NDCG_W])
    dcg = (
        bm.join(rels, ["query_id", "doc_id"])
        .select(
            "query_id",
            (F.col("rel") * F.element_at(w_arr, F.col("rank"))).alias("g"),
        )
        .groupBy("query_id")
        .agg(
            F.sum("g").cast("bigint").alias("dcg"),
            F.count(F.lit(1)).cast("bigint").alias("n_ranked"),
        )
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("query_id").orderBy(F.desc("rel"), "doc_id")
    )
    ideal = (
        rels.withColumn("rn", rn)
        .filter(F.col("rn") <= BM25_K)
        .select(
            "query_id",
            (F.col("rel") * F.element_at(w_arr, F.col("rn"))).alias("g"),
        )
        .groupBy("query_id")
        .agg(F.sum("g").cast("bigint").alias("idcg"))
    )
    return dcg.join(ideal, "query_id").select(
        "query_id",
        "n_ranked",
        "dcg",
        "idcg",
        F.floor(F.col("dcg") * 1_000_000.0 / F.col("idcg"))
        .cast("bigint")
        .alias("ndcg_fp6"),
    )


# Relevance threshold for the binary MRR/recall labels: a doc is "relevant"
# to a query when its query-term occurrence count reaches this (rel >= 1
# would mark nearly every ranked doc relevant and saturate both metrics).
_REL_T = 2


def _mrr_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, q in BM25_QUERIES for t in q.split()
    )
    return f"""
WITH bm AS (
{_bm25_oracle()}
),
mrr_qt AS (SELECT * FROM (VALUES {vals}) AS t(query_id, term)),
doc_terms AS (
  SELECT doc_id, unnest({_TOKS_SQL}) AS term FROM documents
),
rels AS (
  SELECT q.query_id, p.doc_id
  FROM mrr_qt q JOIN doc_terms p ON q.term = p.term
  GROUP BY q.query_id, p.doc_id
  HAVING COUNT(*) >= {_REL_T}
),
nrel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM rels
         GROUP BY query_id),
hit AS (
  SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS hits,
         CAST(MIN(b.rank) AS BIGINT) AS mr
  FROM bm b JOIN rels r ON b.query_id = r.query_id AND b.doc_id = r.doc_id
  GROUP BY b.query_id
)
SELECT n.query_id, n.n_rel,
       CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits_at_k,
       CAST(COALESCE(CAST(floor(1000000000.0 / h.mr) AS BIGINT), 0)
            AS BIGINT) AS rr_fp9,
       CAST(floor(1000000.0 * COALESCE(h.hits, 0) / n.n_rel) AS BIGINT)
         AS recall_fp6
FROM nrel n LEFT JOIN hit h ON n.query_id = h.query_id
"""


@register("q_mrr_recall_eval", oracle=_mrr_oracle())
def q_mrr_recall_eval(spark, sf_dir):
    """Retrieval evaluation, binary-label tier: reciprocal rank of the first
    relevant hit (MRR@10 numerator) and recall@10 of the BM25 ranking
    against the same label-free relevance proxy as q_search_ndcg, binarized
    at rel >= _REL_T. Completes the eval suite (nDCG grades the whole
    ranking; RR grades the first hit; recall grades coverage of the
    relevant set). Exact integers throughout: rr is floor(1e9/rank),
    recall is floor(1e6·hits/n_rel).

    Scale shape: identical to q_search_ndcg — one postings shuffle with
    broadcast query terms; metrics aggregate per query over the bounded
    top-k frame."""
    from ..operators.search import _TOKENS, bm25_search

    docs = T(spark, sf_dir, "documents")
    qt = spark.createDataFrame(
        [(qid, t) for qid, q in BM25_QUERIES for t in q.split()],
        "query_id int, term string",
    )
    bm = bm25_search(docs, qt, k=BM25_K, k1=_K1, b=_B).select(
        "query_id", "doc_id", "rank"
    )
    tok = docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
    rels = (
        tok.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("rel"))
        .filter(F.col("rel") >= _REL_T)
        .select("query_id", "doc_id")
    )
    nrel = rels.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rel")
    )
    hit = (
        bm.join(rels, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("hits"),
            F.min("rank").cast("bigint").alias("mr"),
        )
    )
    return nrel.join(hit, "query_id", "left").select(
        "query_id",
        "n_rel",
        F.coalesce(F.col("hits"), F.lit(0)).cast("bigint").alias("hits_at_k"),
        F.coalesce(
            F.floor(1_000_000_000.0 / F.col("mr")).cast("bigint"), F.lit(0)
        )
        .cast("bigint")
        .alias("rr_fp9"),
        F.floor(1_000_000.0 * F.coalesce(F.col("hits"), F.lit(0)) / F.col("n_rel"))
        .cast("bigint")
        .alias("recall_fp6"),
    )
