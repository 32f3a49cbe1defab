"""Full-text retrieval operators over ``documents``: inverted index, TF-IDF,
BM25 ranking, and a unigram-LM log-probability score (perplexity proxy for
training-data quality filtering).

All tokenization and scoring is pure JVM expression work (split / transform /
groupBy / window) — no Python in the hot path. Scale shapes:

* postings/df build = one shuffle on ``term`` with map-side partial counts;
* query scoring joins the (tiny) query-term table broadcast against postings,
  so the only big shuffle is the per-(query, doc) aggregation;
* per-document score sums go through exact DECIMAL arithmetic so results are
  bit-identical across engines regardless of aggregation order (doubles
  summed in different orders are not; see plans/registry.py).

Reference parity note: the reference delegates all query processing to Spark
SQL via SQLTransform (arc-maskdata-pipeline-plugin
``MaskDataPluginSuite.scala:52-66``); retrieval operators are part of this
engine's large-scale training-pipeline surface, not reference ports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Normalized token list: lowercase, whitespace-split, alnum-only, non-empty.
# Mirrored verbatim in the DuckDB oracles (string_split_regex + list ops).
_TOKENS = (
    "filter(transform(split(lower(trim(text)), '\\\\s+'), "
    "t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
)


def doc_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, term) — one row per token occurrence, plus doc length ``dl``."""
    return (
        docs.select("doc_id", F.expr(_TOKENS).alias("toks"))
        .withColumn("dl", F.size("toks"))
        .select("doc_id", "dl", F.explode("toks").alias("term"))
    )


def postings(docs: DataFrame) -> DataFrame:
    """(term, doc_id, tf, dl) — the inverted-index postings list.

    One shuffle on (term, doc_id) with map-side combine; at 100 TB this lands
    bucketed by ``term`` (operators.joins.write_bucketed) so query-time term
    lookups are pruned scans instead of full passes.
    """
    return (
        doc_tokens(docs)
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
    )


def term_stats(post: DataFrame) -> DataFrame:
    """(term, n_docs_with_term, total_tf) — document frequency per term."""
    return post.groupBy("term").agg(
        F.count(F.lit(1)).cast("int").alias("n_docs_with_term"),
        F.sum("tf").cast("long").alias("total_tf"),
    )


def inverted_index(docs: DataFrame) -> DataFrame:
    """Postings summary per term: df, total tf, and the top document
    (highest tf, ties → lowest doc_id) — a max_by hash-aggregate, not a
    window, so only |vocab| rows reach the final shuffle."""
    post = postings(docs)
    return (
        post.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs_with_term"),
            F.sum("tf").cast("long").alias("total_tf"),
            F.expr("max_by(doc_id, struct(tf, -doc_id))").alias("top_doc_id"),
            F.max("tf").cast("int").alias("top_tf"),
        )
    )


def tfidf_top_terms(docs: DataFrame, top_n: int = 3) -> DataFrame:
    """Per-document top terms. Ranking uses integer keys only
    (tf desc, df asc, term asc) so it is engine-exact; the smoothed TF-IDF
    score (ln((N+1)/(df+1)) + 1, rounded) is emitted as a value column.
    """
    post = postings(docs)
    n_docs = docs.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    scored = (
        post.join(F.broadcast(term_stats(post).drop("total_tf")), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1.0) / (F.col("n_docs_with_term") + 1.0))
                    + 1.0
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("n_docs_with_term"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "term", "tf", "n_docs_with_term", "tfidf", "rank")
    )


def bm25_search(
    docs: DataFrame,
    query_terms: DataFrame,  # (query_id, term)
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k documents per query.

    Scale shape: ``query_terms`` is tiny → broadcast onto postings (the term
    join prunes the corpus to docs containing ≥1 query term); the only big
    shuffle is the (query_id, doc_id) score aggregation. Per-term
    contributions are rounded to DECIMAL(20,9) before summing, so the total
    is exact and order-independent — the ranking key is engine-stable.
    """
    post = postings(docs)
    stats = term_stats(post).drop("total_tf")
    n_docs = docs.select(F.count(F.lit(1)).cast("long").alias("n_docs"))
    # Per-DOC lengths (not the exploded token table — that would sum dl once
    # per token, i.e. Σdl²); zero-token docs count toward the average.
    avgdl = (
        docs.select(F.size(F.expr(_TOKENS)).alias("dl"))
        .groupBy()
        .agg((F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"))
    )
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("n_docs_with_term") + 0.5)
        / (F.col("n_docs_with_term") + 0.5)
    )
    contrib = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        post.join(F.broadcast(query_terms), "term")
        .join(F.broadcast(stats), "term")
        .crossJoin(F.broadcast(n_docs))
        .crossJoin(F.broadcast(avgdl))
        .select(
            "query_id",
            "doc_id",
            contrib.cast("decimal(20,9)").alias("contrib"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").alias("score_dec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_dec"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.round(F.col("score_dec").cast("double"), 6).alias("bm25"),
            "rank",
        )
    )


def unigram_logprob(docs: DataFrame) -> DataFrame:
    """Average unigram log-probability per document — the classic cheap
    perplexity proxy for corpus quality filtering (docs whose tokens are
    globally rare score low; boilerplate scores high).

    ``logprob(t) = ln(count(t) / total_tokens)`` from the corpus itself; the
    per-document mean goes through an exact DECIMAL sum. The frequency table
    is |vocab|-sized → broadcast; at web scale it becomes a shuffle join on
    ``term`` against a persisted frequency store.
    """
    toks = doc_tokens(docs)
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    totals = freq.groupBy().agg(F.sum("cnt").cast("double").alias("total_toks"))
    scored = (
        toks.join(F.broadcast(freq), "term")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            F.log(F.col("cnt") / F.col("total_toks"))
            .cast("decimal(20,9)")
            .alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            # Cast the exact decimal sum to double BEFORE dividing: decimal
            # division scale/rounding rules differ across engines; double
            # division is IEEE-identical everywhere.
            F.round(
                F.sum("lp").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
        )
    )


def bigram_logprob(docs: DataFrame) -> DataFrame:
    """Average add-one-smoothed bigram log-probability per document:
    ``lp(w1 w2) = ln((c(w1,w2) + 1) / (c(w1·) + V))`` where ``c(w1·)`` is
    w1's count as a bigram head and V the head vocabulary size. The classic
    next-step up from the unigram proxy — penalizes docs whose word PAIRS
    are improbable even when individual words are common (word salad).

    Shapes: bigram extraction is a projection (sequence over the token
    array); the frequency tables are |vocab²|-bounded aggregates joined back
    — broadcast here, shuffle joins on (w1, w2) against a persisted LM store
    at web scale. The per-doc mean is an exact DECIMAL sum.
    """
    bigrams = (
        docs.select("doc_id", F.expr(_TOKENS).alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(element_at(toks, i) as w1, element_at(toks, i + 1) as w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    pair_freq = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    head_freq = bigrams.groupBy("w1").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    vocab = head_freq.groupBy().agg(F.count(F.lit(1)).cast("long").alias("v"))
    scored = (
        bigrams.join(F.broadcast(pair_freq), ["w1", "w2"])
        .join(F.broadcast(head_freq), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("v")))
            .cast("decimal(20,9)")
            .alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.round(F.sum("lp").cast("double") / F.count(F.lit(1)), 6).alias(
            "avg_bigram_logprob"
        ),
    )
