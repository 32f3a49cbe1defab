"""Retrieval round 2: word co-occurrence PMI and hybrid (BM25 + vector)
reciprocal-rank-fusion search.

Engine-parity rules as in plans/search.py: shared tokenization pipeline,
integer/fixed-point ranking keys, ordered-fold vector math, and RRF scores
as exact integers (``floor(1e9 / (60 + rank))`` summed) so the fused
ordering is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.search import bm25_search
from ..operators.similarity import knn_bruteforce
from .registry import T, persisted, register, spread
from .search import _BASE_CTES, _TOKS_SQL, BM25_QUERIES, _B, _K1
from .similarity import _DOT

# ---------------------------------------------------------------------------
# Pointwise mutual information over co-occurring document words
# ---------------------------------------------------------------------------

_PMI_CAP = 64  # distinct words per doc entering pair enumeration
_PMI_MIN_PAIR = 5
_PMI_TOP = 100


@register(
    "q_word_pmi",
    oracle=f"""
WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
dw AS (
  SELECT DISTINCT doc_id, unnest(toks) AS word FROM tk
),
capped AS (
  SELECT doc_id, word FROM (
    SELECT doc_id, word,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY word) AS rn
    FROM dw WHERE length(word) >= 3
  ) WHERE rn <= {_PMI_CAP}
),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM capped),
freq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM capped GROUP BY word),
pairs AS (
  SELECT a.word AS w1, b.word AS w2, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM capped a JOIN capped b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY a.word, b.word
),
scored AS (
  SELECT p.w1, p.w2, p.c_xy,
         CAST(floor(ln((CAST(p.c_xy AS DOUBLE) * n.n_docs)
                       / (CAST(f1.df AS DOUBLE) * f2.df)) * 1000000) AS BIGINT)
           AS pmi_fp6
  FROM pairs p
  JOIN freq f1 ON p.w1 = f1.word
  JOIN freq f2 ON p.w2 = f2.word
  CROSS JOIN nd n
  WHERE p.c_xy >= {_PMI_MIN_PAIR}
)
SELECT w1, w2, c_xy, pmi_fp6, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY pmi_fp6 DESC, w1, w2) AS INTEGER) AS rank
  FROM scored
) t WHERE rank <= {_PMI_TOP}
""",
)
def q_word_pmi(spark, sf_dir):
    """Top co-occurring word pairs by pointwise mutual information.

    Scale shape: pair enumeration is the classic quadratic trap — it runs
    on the DISTINCT per-doc word set, alphabetically capped at {cap} words
    per doc (the group-then-enumerate cap from the Jaccard/LSH family), so
    a doc contributes at most {cap}·{capm1}/2 pairs regardless of length.
    The doc-word frame self-joins co-partitioned on doc_id (one key
    shuffle per side), pair counts map-side combine, and the word-frequency
    frame joins back on the word key. PMI itself is one log over exact
    integer counts; the top-{top} window runs on the ≥{minp}-support
    survivors, which is a vocabulary-bounded frame, not the corpus.
    """.format(cap=_PMI_CAP, capm1=_PMI_CAP - 1, top=_PMI_TOP, minp=_PMI_MIN_PAIR)
    from ..operators.search import _TOKENS

    docs = spread(T(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("word"))
    dw = tok.distinct().filter(F.length("word") >= 3)
    # The capped doc-word frame feeds FOUR consumers (both self-join sides,
    # the word-frequency aggregate, and the n_docs scalar). Persist it so the
    # scan + distinct + cap window run once — the at-scale plan materializes
    # this frame rather than re-deriving it per consumer.
    capped = (
        dw.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("word")),
        )
        .filter(F.col("rn") <= _PMI_CAP)
        .drop("rn")
        .transform(persisted)
    )
    nd = capped.agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs")
    )
    freq = capped.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(b, (F.col("a.doc_id") == F.col("b.doc_id")) & (F.col("a.word") < F.col("b.word")))
        .groupBy(F.col("a.word").alias("w1"), F.col("b.word").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_xy"))
        .filter(F.col("c_xy") >= _PMI_MIN_PAIR)
    )
    scored = (
        pairs.join(freq.withColumnRenamed("word", "w1").withColumnRenamed("df", "df1"), "w1")
        .join(freq.withColumnRenamed("word", "w2").withColumnRenamed("df", "df2"), "w2")
        .crossJoin(F.broadcast(nd))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.floor(
                F.log(
                    (F.col("c_xy").cast("double") * F.col("n_docs"))
                    / (F.col("df1").cast("double") * F.col("df2"))
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("pmi_fp6"),
        )
    )
    w = Window.orderBy(F.desc("pmi_fp6"), "w1", "w2")
    # r13 (guide §2.4): orderBy+limit plans as TakeOrderedAndProject
    # (per-partition top-K + K-row merge), so the rank window runs on K
    # rows instead of exchanging the whole scored pair frame into ONE
    # partition; the ordering is total (tie-break to (w1, w2) uniqueness),
    # so the selected rows and ranks are identical.
    return (
        scored.orderBy(F.desc("pmi_fp6"), "w1", "w2")
        .limit(_PMI_TOP)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _PMI_TOP)
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 ∪ vector cosine, fused with reciprocal rank fusion
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_DEPTH = 10  # per-ranker candidate depth
_RRF_TOP = 5


def _rrf_oracle() -> str:
    vals = ", ".join(f"({qid}, '{t}')" for qid, q in BM25_QUERIES for t in q.split())
    contrib = (
        f"ln(1.0 + (n.n_docs - s.n_docs_with_term + 0.5) / (s.n_docs_with_term + 0.5))"
        f" * (p.tf * ({_K1!r} + 1.0) / (p.tf + {_K1!r} * (1.0 - {_B!r} + {_B!r} * p.dl / a.avgdl)))"
    )
    n_q = len(BM25_QUERIES)
    return f"""
WITH {_BASE_CTES},
qt(query_id, term) AS (VALUES {vals}),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
stats AS (SELECT term, CAST(COUNT(*) AS INTEGER) AS n_docs_with_term FROM post GROUP BY term),
a AS (SELECT CAST(SUM(len(toks)) AS DOUBLE) / COUNT(*) AS avgdl FROM tk),
bm_scored AS (
  SELECT qt.query_id, p.doc_id,
         SUM(CAST({contrib} AS DECIMAL(20,9))) AS score_dec
  FROM post p JOIN qt USING (term) JOIN stats s USING (term)
  CROSS JOIN nd n CROSS JOIN a
  GROUP BY qt.query_id, p.doc_id
),
bm AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score_dec DESC, doc_id) AS INTEGER) AS rank
    FROM bm_scored
  ) t WHERE rank <= {_RRF_DEPTH}
),
e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
cos_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
         {_DOT.format(a='q.embedding', b='c.embedding')} / (q.nrm * c.nrm) AS cosine
  FROM e q JOIN e c ON q.vec_id BETWEEN 1 AND {n_q} AND q.vec_id <> c.vec_id
),
ann AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, doc_id) AS INTEGER) AS rank
    FROM cos_scored
  ) t WHERE rank <= {_RRF_DEPTH}
),
fused AS (
  SELECT COALESCE(bm.query_id, ann.query_id) AS query_id,
         COALESCE(bm.doc_id, ann.doc_id) AS doc_id,
         COALESCE(CAST(floor(1000000000.0 / ({_RRF_K} + bm.rank)) AS BIGINT), 0)
           + COALESCE(CAST(floor(1000000000.0 / ({_RRF_K} + ann.rank)) AS BIGINT), 0)
           AS rrf_fp9,
         (bm.doc_id IS NOT NULL) AS in_bm25,
         (ann.doc_id IS NOT NULL) AS in_ann
  FROM bm FULL OUTER JOIN ann
    ON bm.query_id = ann.query_id AND bm.doc_id = ann.doc_id
)
SELECT query_id, doc_id, rrf_fp9, in_bm25, in_ann, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY rrf_fp9 DESC, doc_id) AS INTEGER) AS rank
  FROM fused
) t WHERE rank <= {_RRF_TOP}
"""


@register("q_hybrid_rrf_search", oracle=_rrf_oracle())
def q_hybrid_rrf_search(spark, sf_dir):
    """Hybrid search: BM25 (lexical) and brute-force cosine (semantic)
    rankings over the same doc ids, fused per query with reciprocal rank
    fusion — score = Σ floor(1e9 / (60 + rank)) over the rankers that
    retrieved the doc. Integer RRF terms make the fused ordering exact in
    both engines; the full-outer join on (query, doc) implements fusion
    over the UNION of candidate lists, the standard RRF contract.

    Scale shape: each ranker's output is (queries × depth) rows — the fuse
    join and final top-k windows run on candidate-list-sized frames, never
    the corpus. The corpus is touched only inside each ranker, each in its
    own scale-correct shape (postings probe for BM25; the ANN family
    replaces brute-force cosine beyond demo scale)."""
    docs = T(spark, sf_dir, "documents")
    emb = T(spark, sf_dir, "embeddings")
    qt = spark.createDataFrame(
        [(qid, t) for qid, q in BM25_QUERIES for t in q.split()],
        "query_id int, term string",
    )
    bm = bm25_search(docs, qt, k=_RRF_DEPTH, k1=_K1, b=_B).select(
        "query_id", "doc_id", F.col("rank").alias("rank_bm")
    )
    n_q = len(BM25_QUERIES)
    queries = emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= n_q))
    ann = knn_bruteforce(emb, queries, k=_RRF_DEPTH).select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("rank_ann"),
    )
    fused = (
        bm.join(ann, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            (
                F.coalesce(
                    F.floor(F.lit(1_000_000_000.0) / (_RRF_K + F.col("rank_bm"))).cast("bigint"),
                    F.lit(0).cast("bigint"),
                )
                + F.coalesce(
                    F.floor(F.lit(1_000_000_000.0) / (_RRF_K + F.col("rank_ann"))).cast("bigint"),
                    F.lit(0).cast("bigint"),
                )
            ).alias("rrf_fp9"),
            F.col("rank_bm").isNotNull().alias("in_bm25"),
            F.col("rank_ann").isNotNull().alias("in_ann"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_fp9"), "doc_id")
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _RRF_TOP)
    )


# ---------------------------------------------------------------------------
# Corpus drift: per-source unigram KL divergence vs the whole corpus
# ---------------------------------------------------------------------------

_KL_VOCAB = 200  # global top-N terms entering the divergence


@register(
    "q_corpus_drift_kl",
    oracle=f"""
WITH tk AS (SELECT source, {_TOKS_SQL} AS toks FROM documents),
occ AS (SELECT source, unnest(toks) AS term FROM tk),
cnt AS (SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c_s
        FROM occ GROUP BY 1, 2),
gcnt AS (SELECT term, CAST(SUM(c_s) AS BIGINT) AS c_g FROM cnt GROUP BY term),
vocab AS (
  SELECT term, c_g FROM (
    SELECT term, c_g,
           ROW_NUMBER() OVER (ORDER BY c_g DESC, term) AS rn
    FROM gcnt
  ) WHERE rn <= {_KL_VOCAB}
),
ng AS (SELECT CAST(SUM(c_g) AS BIGINT) AS n_g,
              CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
ns AS (
  SELECT c.source, CAST(SUM(c.c_s) AS BIGINT) AS n_s
  FROM cnt c SEMI JOIN vocab v ON c.term = v.term
  GROUP BY c.source
),
grid AS (
  SELECT ns.source, ns.n_s, v.term, v.c_g, COALESCE(c.c_s, 0) AS c_s
  FROM ns CROSS JOIN vocab v
  LEFT JOIN cnt c ON c.source = ns.source AND c.term = v.term
),
contrib AS (
  SELECT source, n_s,
         CAST(floor(
           (CAST(c_s + 1 AS DOUBLE) / (n_s + ng.v))
           * ln((CAST(c_s + 1 AS DOUBLE) * (ng.n_g + ng.v))
                / (CAST(c_g + 1 AS DOUBLE) * (n_s + ng.v)))
           * 1000000000) AS BIGINT) AS kl_term_fp9
  FROM grid CROSS JOIN ng
)
SELECT source, CAST(n_s AS BIGINT) AS n_tokens,
       CAST(SUM(kl_term_fp9) AS BIGINT) AS kl_fp9
FROM contrib GROUP BY source, n_s
""",
)
def q_corpus_drift_kl(spark, sf_dir):
    """Per-source unigram KL(source ‖ corpus) over the global top-200 terms
    with add-one smoothing — the domain-shift monitor a training-data
    pipeline runs between corpus snapshots / across sources.

    Scale shape: the ONE corpus-wide shuffle is the (source, term) count
    with map-side combine; everything after operates on vocab-sized frames
    (|sources| x 200 grid). Engine parity: probabilities are ratios of exact
    integers, each term's p*ln(p/q) is floored to fp9 integer BEFORE the
    per-source sum, so aggregation order cannot perturb the result (same
    discipline as q_word_pmi's pmi_fp6)."""
    docs = spread(T(spark, sf_dir, "documents"))
    occ = docs.select(
        "source",
        F.explode(
            F.expr(
                "filter(transform(split(lower(trim(text)), '\\\\s+'), "
                "t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
            )
        ).alias("term"),
    )
    # cnt is consumed three times (global counts, per-source totals, the
    # grid join); it is vocab-of-corpus-sized after the ONE corpus shuffle,
    # so persist it rather than re-running the tokenize+count pipeline.
    cnt = occ.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_s")
    ).transform(persisted)
    glob = cnt.groupBy("term").agg(F.sum("c_s").cast("bigint").alias("c_g"))
    w = Window.orderBy(F.desc("c_g"), "term")
    vocab = (
        glob.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KL_VOCAB)
        .drop("rn")
    )
    ng = vocab.agg(
        F.sum("c_g").cast("bigint").alias("n_g"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    ns = (
        cnt.join(F.broadcast(vocab.select("term")), "term", "semi")
        .groupBy("source")
        .agg(F.sum("c_s").cast("bigint").alias("n_s"))
    )
    grid = (
        ns.crossJoin(F.broadcast(vocab))
        .join(cnt, ["source", "term"], "left")
        .withColumn("c_s", F.coalesce(F.col("c_s"), F.lit(0)))
        .crossJoin(F.broadcast(ng))
    )
    # smoothing constant = the ACTUAL vocab size (<= _KL_VOCAB cap): with a
    # literal cap the smoothed p/q would not sum to 1 when the corpus
    # vocabulary is smaller than the cap, and Gibbs' KL >= 0 would not hold.
    v = F.col("v")
    p = (F.col("c_s") + 1).cast("double") / (F.col("n_s") + v)
    ratio = ((F.col("c_s") + 1).cast("double") * (F.col("n_g") + v)) / (
        (F.col("c_g") + 1).cast("double") * (F.col("n_s") + v)
    )
    contrib = grid.select(
        "source",
        "n_s",
        F.floor(p * F.log(ratio) * 1_000_000_000).cast("bigint").alias(
            "kl_term_fp9"
        ),
    )
    return contrib.groupBy("source", "n_s").agg(
        F.sum("kl_term_fp9").cast("bigint").alias("kl_fp9")
    ).select(
        "source",
        F.col("n_s").alias("n_tokens"),
        "kl_fp9",
    )


# ---------------------------------------------------------------------------
# Corpus diversity: distinct-n ratios per source (self-repetition diagnostic)
# ---------------------------------------------------------------------------


@register(
    "q_ngram_diversity",
    oracle=f"""
WITH tk AS (SELECT source, {_TOKS_SQL} AS toks FROM documents),
bi AS (
  SELECT source,
         unnest(list_transform(range(1, greatest(len(toks) - 1, 0) + 1),
                i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM tk
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS total_bigrams,
       CAST(COUNT(DISTINCT bigram) AS BIGINT) AS distinct_bigrams,
       CAST(floor(COUNT(DISTINCT bigram) * 1000000.0 / COUNT(*)) AS BIGINT)
         AS distinct_ratio_fp6
FROM bi GROUP BY source
""",
)
def q_ngram_diversity(spark, sf_dir):
    """Distinct-2 diversity per source (the distinct-n metric of Li et al.
    2016, standard for detecting templated/self-repetitive corpora): distinct
    bigrams over total bigrams, fp6. A source whose ratio collapses is boiler-
    plate and should be downweighted before training.

    One corpus-wide aggregate on (source, bigram) with map-side combine (the
    COUNT DISTINCT's internal expand); bigram explode is partition-local."""
    docs = spread(T(spark, sf_dir, "documents"))
    toked = docs.select(
        "source",
        F.expr(
            "filter(transform(split(lower(trim(text)), '\\\\s+'), "
            "t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
        ).alias("toks"),
    )
    bi = toked.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(toks) - 1, 0)), "
                "i -> concat(toks[i - 1], ' ', toks[i]))"
            )
        ).alias("bigram"),
    )
    return bi.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_bigrams"),
        F.countDistinct("bigram").cast("bigint").alias("distinct_bigrams"),
        F.floor(
            F.countDistinct("bigram") * 1_000_000.0 / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("distinct_ratio_fp6"),
    )


# ---------------------------------------------------------------------------
# Zipf rank-frequency slope (corpus naturalness diagnostic)
# ---------------------------------------------------------------------------

_ZIPF_TOP = 100


@register(
    "q_zipf_slope",
    oracle=f"""
WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
occ AS (SELECT unnest(toks) AS term FROM tk),
freq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM occ GROUP BY term),
ranked AS (
  SELECT term, c,
         ROW_NUMBER() OVER (ORDER BY c DESC, term) AS rk
  FROM freq QUALIFY rk <= {_ZIPF_TOP}
),
pts AS (
  SELECT CAST(floor(ln(rk) * 1000000) AS BIGINT) AS x_fp6,
         CAST(floor(ln(c) * 1000000) AS BIGINT) AS y_fp6
  FROM ranked
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x_fp6) AS DECIMAL(38,0)) AS sx,
         CAST(SUM(y_fp6) AS DECIMAL(38,0)) AS sy,
         CAST(SUM(CAST(x_fp6 AS DECIMAL(38,0)) * x_fp6) AS DECIMAL(38,0)) AS sxx,
         CAST(SUM(CAST(x_fp6 AS DECIMAL(38,0)) * y_fp6) AS DECIMAL(38,0)) AS sxy
  FROM pts
)
SELECT n,
       CAST(floor(
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         * 1000000) AS BIGINT) AS slope_fp6
FROM m
""",
)
def q_zipf_slope(spark, sf_dir):
    """Zipf rank-frequency slope over the top-100 terms: natural language
    sits near slope −1 in log-log rank/frequency space (Zipf 1949); heavily
    templated, machine-generated, or boilerplate corpora flatten or steepen
    it — a one-number corpus-naturalness diagnostic next to
    `q_ngram_diversity`.

    Engine parity: the (rank, count) points floor their logs to fp6 INTEGERS
    first, the OLS moments accumulate those integers exactly in
    DECIMAL(38,0), and the slope is one double expression at the end — the
    regression result cannot depend on aggregation order. One corpus term
    count (the only data-sized shuffle) feeds a 100-row frame."""
    docs = spread(T(spark, sf_dir, "documents"))
    occ = docs.select(
        F.explode(
            F.expr(
                "filter(transform(split(lower(trim(text)), '\\\\s+'), "
                "t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
            )
        ).alias("term")
    )
    freq = occ.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wr = Window.orderBy(F.desc("c"), "term")
    ranked = (
        freq.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _ZIPF_TOP)
    )
    pts = ranked.select(
        F.floor(F.log(F.col("rk")) * 1_000_000).cast("bigint").alias("x_fp6"),
        F.floor(F.log(F.col("c")) * 1_000_000).cast("bigint").alias("y_fp6"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x_fp6").cast("decimal(38,0)").alias("sx"),
        F.sum("y_fp6").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x_fp6").cast("decimal(38,0)") * F.col("x_fp6"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("x_fp6").cast("decimal(38,0)") * F.col("y_fp6"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    slope = F.floor(
        (
            F.col("n").cast("double") * F.col("sxy").cast("double")
            - F.col("sx").cast("double") * F.col("sy").cast("double")
        )
        / (
            F.col("n").cast("double") * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * 1_000_000
    ).cast("bigint")
    return m.select("n", slope.alias("slope_fp6"))


# ---------------------------------------------------------------------------
# Phrase search over positional postings
# ---------------------------------------------------------------------------

_PHRASES = [
    (1, "table", "hash"),
    (2, "customer", "join"),
    (3, "big", "order"),
]
_PHRASE_TOP = 10


@register(
    "q_phrase_search",
    oracle=f"""
WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
post AS (
  SELECT doc_id, i AS pos, toks[i] AS term
  FROM tk, UNNEST(range(1, len(toks) + 1)) AS t(i)
),
q(query_id, w1, w2) AS (
  VALUES {", ".join(f"({i}, '{a}', '{b}')" for i, a, b in _PHRASES)}
),
hits AS (
  SELECT q.query_id, a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
  FROM q
  JOIN post a ON a.term = q.w1
  JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = q.w2
  GROUP BY 1, 2
)
SELECT query_id, doc_id, n_matches,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY n_matches DESC, doc_id) AS INTEGER)
         AS rank
FROM hits
QUALIFY rank <= {_PHRASE_TOP}
""",
)
def q_phrase_search(spark, sf_dir):
    """Exact phrase search ("w1 w2" adjacency) over POSITIONAL postings —
    the IR capability plain bag-of-words BM25 cannot express. Postings carry
    token positions (posexplode); a phrase hit is an equi-join of the two
    term's postings on (doc, pos+1) — co-partitioned by doc, never a scan of
    full documents per query. The (tiny) phrase table broadcasts onto the
    postings, so the corpus is tokenized once for all queries; at 100 TB the
    postings land bucketed by term (operators/joins.py::write_bucketed) and
    each phrase touches only its two term partitions."""
    docs = spread(T(spark, sf_dir, "documents"))
    toks = F.expr(
        "filter(transform(split(lower(trim(text)), '\\\\s+'), "
        "t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
    )
    post = docs.select("doc_id", F.posexplode(toks).alias("pos0", "term")).select(
        "doc_id", (F.col("pos0") + 1).alias("pos"), "term"
    ).transform(persisted)  # one tokenize pass serves both phrase sides
    q = spark.createDataFrame(_PHRASES, ["query_id", "w1", "w2"])
    a = post.alias("a").join(
        F.broadcast(q), F.col("a.term") == F.col("w1")
    )
    b = post.alias("b")
    hits = (
        a.join(
            b,
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1)
            & (F.col("b.term") == F.col("w2")),
        )
        .groupBy("query_id", F.col("a.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_matches"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("n_matches"), "doc_id")
    return (
        hits.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _PHRASE_TOP)
    )


# Truncated rank-biased overlap (Webber et al. 2010) between the two RRF
# input rankings, depth 10, persistence p=0.9. Per-depth weights
# (1-p)·p^(d-1)/d are exact fp9 integer LITERALS embedded identically in
# both engines (the q_search_ndcg discount-table discipline).
_RBO_P = 0.9
_RBO_W9 = [
    int(1_000_000_000 * (1 - _RBO_P) * _RBO_P ** (d - 1))
    for d in range(1, _RRF_DEPTH + 1)
]  # the /d of the A_d = X_d/d term stays IN the expression, floored per term


def _rbo_oracle() -> str:
    base = _rrf_oracle().split("fused AS (")[0].rstrip().rstrip(",")
    qids = ", ".join(f"({qid})" for qid, _ in BM25_QUERIES)
    depths = ", ".join(f"({d})" for d in range(1, _RRF_DEPTH + 1))
    wvals = ", ".join(f"({d + 1}, {w})" for d, w in enumerate(_RBO_W9))
    return f"""{base},
overlap_m AS (
  SELECT bm.query_id, greatest(bm.rank, ann.rank) AS m
  FROM bm JOIN ann ON bm.query_id = ann.query_id AND bm.doc_id = ann.doc_id
),
grid AS (
  SELECT q.query_id, d.d
  FROM (VALUES {qids}) q(query_id), (VALUES {depths}) d(d)
),
xd AS (
  SELECT g.query_id, g.d, CAST(COUNT(b.m) AS BIGINT) AS x
  FROM grid g LEFT JOIN overlap_m b
    ON g.query_id = b.query_id AND b.m <= g.d
  GROUP BY g.query_id, g.d
),
wt(d, w9) AS (VALUES {wvals})
SELECT x.query_id,
       CAST(MAX(CASE WHEN x.d = {_RRF_DEPTH} THEN x.x END) AS BIGINT)
         AS overlap_at_10,
       CAST(SUM(CAST(floor(x.x * wt.w9 * 1.0 / x.d) AS BIGINT)) AS BIGINT) AS rbo_fp9
FROM xd x JOIN wt ON x.d = wt.d
GROUP BY x.query_id
"""


@register("q_rank_biased_overlap", oracle=_rbo_oracle())
def q_rank_biased_overlap(spark, sf_dir):
    """Rank-biased overlap between the lexical (BM25) and semantic (cosine)
    rankings that q_hybrid_rrf_search fuses — the ranker-agreement metric
    that tells a search team whether two rankers are redundant (RBO → 1) or
    complementary (RBO → 0) BEFORE investing in fusion. Truncated RBO at
    depth 10, persistence 0.9: RBO = Σ_d (1−p)p^(d−1)·X_d/d, where X_d is
    the prefix-overlap |L1[:d] ∩ L2[:d]| — computed as the count of docs
    whose max(rank1, rank2) ≤ d, so overlap needs ONE inner join of the two
    top-k lists, no per-depth set intersection. Weights are exact fp9
    integer literals in both engines; X_d·w9/d keeps integer division
    deterministic.

    Scale shape: both rankers produce (queries × depth) candidate frames;
    everything after is literal-grid-sized (queries × depth rows). The
    corpus is touched only inside each ranker."""
    docs = T(spark, sf_dir, "documents")
    emb = T(spark, sf_dir, "embeddings")
    qt = spark.createDataFrame(
        [(qid, t) for qid, q in BM25_QUERIES for t in q.split()],
        "query_id int, term string",
    )
    bm = bm25_search(docs, qt, k=_RRF_DEPTH, k1=_K1, b=_B).select(
        "query_id", "doc_id", F.col("rank").alias("rank_bm")
    )
    n_q = len(BM25_QUERIES)
    queries = emb.filter((F.col("vec_id") >= 1) & (F.col("vec_id") <= n_q))
    ann = knn_bruteforce(emb, queries, k=_RRF_DEPTH).select(
        F.col("query_id").cast("int").alias("query_id"),
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("rank_ann"),
    )
    both = bm.join(ann, ["query_id", "doc_id"]).select(
        "query_id", F.greatest("rank_bm", "rank_ann").alias("m")
    )
    grid = spark.createDataFrame(
        [(qid, d) for qid, _ in BM25_QUERIES for d in range(1, _RRF_DEPTH + 1)],
        "query_id int, d int",
    )
    xd = (
        grid.join(
            F.broadcast(both),
            (grid.query_id == both.query_id) & (both.m <= grid.d),
            "left",
        )
        .groupBy(grid.query_id, "d")
        .agg(F.count("m").cast("bigint").alias("x"))
    )
    w_arr = F.array(*[F.lit(w) for w in _RBO_W9])
    return (
        xd.select(
            "query_id",
            "d",
            "x",
            F.floor(
                F.col("x") * F.element_at(w_arr, F.col("d")) / F.col("d")
            )
            .cast("bigint")
            .alias("term"),
        )
        .groupBy("query_id")
        .agg(
            F.max(
                F.when(F.col("d") == _RRF_DEPTH, F.col("x"))
            )
            .cast("bigint")
            .alias("overlap_at_10"),
            F.sum("term").cast("bigint").alias("rbo_fp9"),
        )
    )


# ---------------------------------------------------------------------------
# Pseudo-relevance-feedback query expansion
# ---------------------------------------------------------------------------

_PRF_FB = 10  # feedback depth: top-k BM25 docs per query
_PRF_TOP = 5  # expansion terms emitted per query
_PRF_MIN_LEN = 3


def _prf_oracle() -> str:
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, q in BM25_QUERIES for t in q.split()
    )
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
),
fb AS (
  SELECT query_id, doc_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score_dec DESC, doc_id) AS rnk
    FROM scored
  ) WHERE rnk <= {_PRF_FB}
),
cand AS (
  SELECT DISTINCT fb.query_id, p.term, p.doc_id
  FROM post p JOIN fb ON p.doc_id = fb.doc_id
  WHERE length(p.term) >= {_PRF_MIN_LEN}
    AND NOT EXISTS (SELECT 1 FROM qt q2
                    WHERE q2.query_id = fb.query_id AND q2.term = p.term)
),
exp_t AS (
  SELECT c.query_id, c.term,
         CAST(COUNT(*) AS BIGINT) AS r_fb,
         CAST(MAX(s.n_docs_with_term) AS BIGINT) AS df,
         CAST(floor(1000000.0 * COUNT(*)
                    * ln((CAST(n.n_docs AS DOUBLE) + 1.0)
                         / (MAX(s.n_docs_with_term) + 1.0))) AS BIGINT)
           AS score_fp6
  FROM cand c JOIN stats s USING (term) CROSS JOIN nd n
  GROUP BY c.query_id, c.term, n.n_docs
)
SELECT query_id, term, r_fb, df, score_fp6, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY score_fp6 DESC, term) AS INTEGER) AS rank
  FROM exp_t
) WHERE rank <= {_PRF_TOP}
"""


@register("q_prf_expansion", oracle=_prf_oracle())
def q_prf_expansion(spark, sf_dir):
    """Pseudo-relevance-feedback query expansion (Rocchio/RSJ lineage):
    run the fixed BM25 workload, take each query's top-{_PRF_FB} docs as a
    feedback set, and score candidate terms by ``r·ln((N+1)/(df+1))`` —
    feedback-document frequency times rare-term idf (the simplified
    Robertson offer weight). The query's own terms are excluded; top
    {_PRF_TOP} expansion terms per query.

    Scale shape: the feedback frame is |queries|·{_PRF_FB} rows — the
    postings probe against it broadcasts; term stats reuse the postings
    aggregate. Two corpus-scan lineages (BM25 + the postings re-probe),
    both ending in map-side-combined aggregates; the per-query top-k
    windows run on the |queries|·|candidate-terms| frame."""
    docs = T(spark, sf_dir, "documents")
    qt = spark.createDataFrame(
        [(qid, t) for qid, q in BM25_QUERIES for t in q.split()],
        "query_id int, term string",
    )
    from ..operators.search import doc_tokens

    fb = (
        bm25_search(docs, qt, k=_PRF_FB, k1=_K1, b=_B)
        .select("query_id", "doc_id")
    )
    tok = doc_tokens(docs)  # (doc_id, term, dl), one row per occurrence
    post = tok.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    stats = post.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    cand = (
        post.join(F.broadcast(fb), "doc_id")
        .filter(F.length("term") >= _PRF_MIN_LEN)
        .join(
            F.broadcast(qt.select(F.col("query_id").alias("q2"), F.col("term").alias("t2"))),
            (F.col("query_id") == F.col("q2")) & (F.col("term") == F.col("t2")),
            "left_anti",
        )
        .select("query_id", "term", "doc_id")
        .distinct()
    )
    exp_t = (
        cand.join(stats, "term")
        .crossJoin(F.broadcast(nd))
        .groupBy("query_id", "term", "n_docs")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("r_fb"),
            F.max("df").cast("bigint").alias("df"),
        )
        .select(
            "query_id",
            "term",
            "r_fb",
            "df",
            F.floor(
                1_000_000.0
                * F.col("r_fb")
                * F.log(
                    (F.col("n_docs").cast("double") + 1.0)
                    / (F.col("df") + 1.0)
                )
            )
            .cast("bigint")
            .alias("score_fp6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_fp6").desc(), F.col("term")
    )
    return (
        exp_t.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _PRF_TOP)
        .select(
            "query_id", "term", "r_fb", "df", "score_fp6",
            F.col("rank").cast("int").alias("rank"),
        )
    )
