"""Corpus-curation operators for LLM training-data pipelines (round 7).

Four curation stages that sit between raw ingestion and training-set prep,
each in its scale-correct shape:

* **Boilerplate segment dedup** (CCNet-style line dedup, applied to 10-token
  segments since the synthetic corpus has no newlines): segments whose
  document frequency ≥ 2 are boilerplate; the audit counts instance and
  token mass removed per source. One segment-hash shuffle; the boilerplate
  set is heavy-hitter-sized and broadcasts back.
* **Unigram perplexity filter** (the KenLM-filter stand-in every web-corpus
  pipeline runs): per-doc mean negative log-likelihood under the corpus's
  own add-1-smoothed unigram LM, flagging the worst quartile via the exact
  p75 rank cut. Vocab-sized LM broadcasts; corpus contributes one token
  count shuffle and one doc aggregate.
* **DSIR importance weights** (Xie et al. 2023, hashed-ngram importance
  resampling — unigram variant): per-doc Σ count·(ln p_target − ln p_bg)
  with target = English docs, background = the rest; the top-k frame is a
  TakeOrderedAndProject, never a global sort.
* **N-gram novelty curve** (dataset-curation diminishing-returns readout):
  fraction of each source's distinct 3-grams first seen in that source
  (first = lexicographic MIN(source) — deterministic), two ngram-keyed
  aggregates.

Float parity: every logarithm is floored to fp9 integer BEFORE any sum
(fp-floored-logs rule); all accumulations are exact BIGINT; published means
are floor-divided. Tokenization is the repo-wide ``\\s+`` split.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import T, persisted, register, spread

_SEG = 10  # tokens per pseudo-line segment
_TOP_DSIR = 50

_TOKS_CTE = r"""
toks AS (
  SELECT doc_id, source, lang, string_split_regex(trim(text), '\s+') AS tk
  FROM documents
)"""


@register(
    "q_boilerplate_segments",
    oracle=f"""
WITH {_TOKS_CTE},
segs AS (
  SELECT doc_id, source,
         unnest(list_transform(
           range(1, CAST(ceil(len(tk) / {_SEG}.0) AS BIGINT) + 1),
           i -> array_to_string(list_slice(tk, (i - 1) * {_SEG} + 1, i * {_SEG}), ' ')
         )) AS seg
  FROM toks
),
sized AS (
  SELECT doc_id, source, seg, CAST(len(string_split(seg, ' ')) AS BIGINT) AS n_tok
  FROM segs
),
freq AS (
  SELECT seg, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS dfreq
  FROM sized GROUP BY seg
)
SELECT s.source,
       CAST(COUNT(DISTINCT s.doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_seg_instances,
       CAST(SUM(CASE WHEN f.dfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boiler_instances,
       CAST(COUNT(DISTINCT CASE WHEN f.dfreq >= 2 THEN s.seg END) AS BIGINT)
         AS n_boiler_segs,
       CAST(SUM(CASE WHEN f.dfreq >= 2 THEN s.n_tok ELSE 0 END) AS BIGINT)
         AS tokens_removed
FROM sized s JOIN freq f ON s.seg = f.seg
GROUP BY s.source
""",
)
def q_boilerplate_segments(spark, sf_dir):
    """CCNet-style boilerplate removal audit at segment grain: a 10-token
    segment appearing in ≥ 2 distinct documents is boilerplate (headers,
    footers, nav chrome in real corpora; planted copies here). Per-source
    readout of instance and token mass removed.

    Scale shape: segments explode partition-locally (≤ n_tok/10 per doc);
    document frequency is ONE segment-keyed count shuffle; the boilerplate
    set (df ≥ 2) is heavy-hitter-sized and joins back as a broadcast — the
    corpus-sized segment frame is never shuffled a second time (same
    discipline as ``duplicated_spans``)."""
    d = spread(T(spark, sf_dir, "documents"))
    tk = F.split(F.trim(F.col("text")), r"\s+")
    segs = d.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(
                    F.lit(1), F.ceil(F.size(tk) / float(_SEG)).cast("bigint")
                ),
                lambda i: F.concat_ws(
                    " ", F.slice(tk, (i - 1) * _SEG + 1, _SEG)
                ),
            )
        ).alias("seg"),
    ).withColumn("n_tok", F.size(F.split(F.col("seg"), " ")).cast("bigint"))
    freq = segs.groupBy("seg").agg(
        F.countDistinct("doc_id").cast("bigint").alias("dfreq")
    )
    boiler = freq.filter(F.col("dfreq") >= 2).select(
        "seg", F.lit(1).alias("is_boiler")
    )
    flagged = segs.join(F.broadcast(boiler), "seg", "left").withColumn(
        "is_boiler", F.coalesce("is_boiler", F.lit(0))
    )
    return flagged.groupBy("source").agg(
        F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_seg_instances"),
        F.sum("is_boiler").cast("bigint").alias("n_boiler_instances"),
        F.countDistinct(F.when(F.col("is_boiler") == 1, F.col("seg")))
        .cast("bigint")
        .alias("n_boiler_segs"),
        F.sum(F.when(F.col("is_boiler") == 1, F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("tokens_removed"),
    )


@register(
    "q_perplexity_filter",
    oracle=f"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, source, unnest(tk) AS w FROM toks),
lm AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w
),
consts AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM lm
),
lp AS (
  SELECT w, CAST(floor(ln((c + 1.0) / (n + v)) * 1000000000) AS BIGINT) AS lp9
  FROM lm CROSS JOIN consts
),
docs_nll AS (
  SELECT t.doc_id, t.source,
         CAST(-SUM(lp.lp9) AS BIGINT) AS nll9_sum,
         CAST(COUNT(*) AS BIGINT) AS n_tok
  FROM tok t JOIN lp ON t.w = lp.w
  GROUP BY t.doc_id, t.source
),
scored AS (
  SELECT doc_id, source,
         CAST(floor(nll9_sum / (n_tok * 1000.0)) AS BIGINT) AS nll_fp6
  FROM docs_nll
),
vc AS (
  SELECT nll_fp6, CAST(COUNT(*) AS BIGINT) AS cnt FROM scored GROUP BY 1
),
cum AS (
  SELECT nll_fp6,
         SUM(cnt) OVER (ORDER BY nll_fp6
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
         (SELECT SUM(cnt) FROM vc) AS tot
  FROM vc
),
cut AS (
  SELECT MIN(CASE WHEN r >= CAST(ceil(0.75 * tot) AS BIGINT)
                  THEN nll_fp6 END) AS p75
  FROM cum
)
SELECT s.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN s.nll_fp6 > cut.p75 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       CAST(floor(SUM(s.nll_fp6) * 1.0 / COUNT(*)) AS BIGINT) AS mean_nll_fp6
FROM scored s CROSS JOIN cut
GROUP BY s.source
""",
)
def q_perplexity_filter(spark, sf_dir):
    """Unigram-perplexity quality filter (the KenLM-filter stand-in): score
    every document by its mean token NLL under the corpus's own
    add-1-smoothed unigram LM and flag docs ABOVE the exact p75 cut (the
    worst quartile — high perplexity ≈ word soup / OCR noise in real
    corpora). Per-word log-probabilities are floored to fp9 integers before
    any aggregation, so doc scores are exact BIGINT sums — engine-identical.

    Scale shape: the LM is vocab-sized and broadcasts onto the token stream;
    the corpus pays one token-count shuffle and one doc-grain aggregate; the
    p75 threshold reuses the exact-rank discipline (distinct fp6-score
    frame), with the ``quantile_thresholds(mode="approx")`` seam as the
    100 TB swap."""
    from ..operators.quantiles import quantile_thresholds

    d = spread(T(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    # vocab-sized persist: without it the consts/lp branches re-scan the
    # corpus (plan-audit: 9 document scans)
    lm = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .transform(persisted)
    )
    consts = lm.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    lp = (
        lm.crossJoin(F.broadcast(consts))
        .select(
            "w",
            F.floor(
                F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v")))
                * 1_000_000_000
            )
            .cast("bigint")
            .alias("lp9"),
        )
    )
    scored = (
        tok.join(F.broadcast(lp), "w")
        .groupBy("doc_id", "source")
        .agg(
            (-F.sum("lp9")).cast("bigint").alias("nll9_sum"),
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
        )
        .select(
            "doc_id",
            "source",
            F.floor(F.col("nll9_sum") / (F.col("n_tok") * 1000.0))
            .cast("bigint")
            .alias("nll_fp6"),
        )
    )
    cut = quantile_thresholds(scored, "nll_fp6", {"p75": 0.75})
    return (
        scored.crossJoin(F.broadcast(cut))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("nll_fp6") > F.col("p75"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            F.floor(F.sum("nll_fp6") * 1.0 / F.count(F.lit(1)))
            .cast("bigint")
            .alias("mean_nll_fp6"),
        )
    )


@register(
    "q_dsir_importance",
    oracle=f"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, source, lang, unnest(tk) AS w FROM toks),
tgt AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok WHERE lang = 'en' GROUP BY w
),
bg AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok WHERE lang <> 'en' GROUP BY w
),
vocab AS (
  SELECT w FROM tgt UNION SELECT w FROM bg
),
consts AS (
  SELECT (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM tgt) AS nt,
         (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) FROM bg) AS nb,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM vocab) AS v
),
lw AS (
  SELECT vocab.w,
         CAST(floor(ln((COALESCE(tgt.c, 0) + 1.0) / (consts.nt + consts.v))
                    * 1000000000) AS BIGINT)
         - CAST(floor(ln((COALESCE(bg.c, 0) + 1.0) / (consts.nb + consts.v))
                      * 1000000000) AS BIGINT) AS dw9
  FROM vocab LEFT JOIN tgt ON vocab.w = tgt.w
             LEFT JOIN bg ON vocab.w = bg.w
             CROSS JOIN consts
),
docw AS (
  SELECT t.doc_id, t.source, t.lang,
         CAST(SUM(lw.dw9) AS BIGINT) AS weight9
  FROM tok t JOIN lw ON t.w = lw.w
  GROUP BY t.doc_id, t.source, t.lang
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY weight9 DESC, doc_id) AS INTEGER)
         AS rank,
       doc_id, source, lang, weight9
FROM docw
QUALIFY rank <= {_TOP_DSIR}
""",
)
def q_dsir_importance(spark, sf_dir):
    """DSIR-style importance weights (Xie et al. 2023, unigram variant):
    score each document by Σ_w count_w · (ln p_target(w) − ln p_bg(w)) with
    target = English docs and background = everything else, both
    add-1-smoothed over the shared vocabulary; the top-k highest-weight docs
    are the ones importance resampling would keep. Per-word deltas are
    fp9-floored integers, so doc weights are exact BIGINT sums and the
    (weight DESC, doc_id) ranking is engine-total.

    Scale shape: both LMs are vocab-sized broadcasts; the corpus pays one
    token shuffle for each LM count and one doc-grain aggregate; the top-k
    is orderBy+limit → TakeOrderedAndProject (per-partition heaps, k-sized
    merge — no global sort)."""
    d = spread(T(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id",
        "source",
        "lang",
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w"),
    )
    # both LMs are VOCAB-sized: persist so vocab/consts/lw derive from the
    # caches instead of re-scanning the corpus per branch (plan-audit: the
    # un-persisted plan paid 9 document scans)
    tgt = (
        tok.filter(F.col("lang") == "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
        .transform(persisted)
    )
    bg = (
        tok.filter(F.col("lang") != "en")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cb"))
        .transform(persisted)
    )
    vocab = tgt.select("w").union(bg.select("w")).distinct()
    consts = (
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).cast("bigint").alias("nt"))
        .crossJoin(
            bg.agg(F.coalesce(F.sum("cb"), F.lit(0)).cast("bigint").alias("nb"))
        )
        .crossJoin(vocab.agg(F.count(F.lit(1)).cast("bigint").alias("v")))
    )
    lw = (
        vocab.join(tgt, "w", "left")
        .join(bg, "w", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "w",
            (
                F.floor(
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1.0)
                        / (F.col("nt") + F.col("v"))
                    )
                    * 1_000_000_000
                ).cast("bigint")
                - F.floor(
                    F.log(
                        (F.coalesce(F.col("cb"), F.lit(0)) + 1.0)
                        / (F.col("nb") + F.col("v"))
                    )
                    * 1_000_000_000
                ).cast("bigint")
            ).alias("dw9"),
        )
    )
    docw = (
        tok.join(F.broadcast(lw), "w")
        .groupBy("doc_id", "source", "lang")
        .agg(F.sum("dw9").cast("bigint").alias("weight9"))
    )
    top = docw.orderBy(F.desc("weight9"), "doc_id").limit(_TOP_DSIR)
    from pyspark.sql import Window

    return top.select(
        F.row_number()
        .over(Window.orderBy(F.desc("weight9"), "doc_id"))
        .cast("int")
        .alias("rank"),
        "doc_id",
        "source",
        "lang",
        "weight9",
    )


@register(
    "q_ngram_novelty",
    oracle=f"""
WITH {_TOKS_CTE},
grams AS (
  SELECT DISTINCT source,
         unnest(list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
                i -> array_to_string(list_slice(tk, i, i + 2), ' '))) AS g
  FROM toks
),
firsts AS (
  SELECT g, MIN(source) AS first_source FROM grams GROUP BY g
),
novel AS (
  SELECT first_source AS source, CAST(COUNT(*) AS BIGINT) AS n_novel
  FROM firsts GROUP BY 1
),
totals AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_distinct FROM grams GROUP BY 1
)
SELECT t.source, t.n_distinct,
       CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(floor(COALESCE(n.n_novel, 0) * 1000000.0 / t.n_distinct) AS BIGINT)
         AS novelty_fp6
FROM totals t LEFT JOIN novel n ON t.source = n.source
""",
)
def q_ngram_novelty(spark, sf_dir):
    """N-gram novelty curve per source (the diminishing-returns readout a
    curation pipeline uses to decide whether the next crawl batch still adds
    information): the fraction of each source's distinct 3-grams FIRST seen
    in that source, with "first" = lexicographic MIN(source) so the curve is
    deterministic without any ingestion-order column.

    Scale shape: distinct (source, 3-gram) pairs are one shuffle; the
    first-source attribution is a second ngram-keyed aggregate; everything
    downstream is source-cardinality-sized."""
    d = spread(T(spark, sf_dir, "documents"))
    tk = F.split(F.trim("text"), r"\s+")
    grams = (
        d.select(
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.size(tk) - 2, F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice(tk, i, 3)),
                )
            ).alias("g"),
        )
        .distinct()
    )
    firsts = grams.groupBy("g").agg(F.min("source").alias("first_source"))
    novel = firsts.groupBy(F.col("first_source").alias("source")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_novel")
    )
    totals = grams.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_distinct")
    )
    return totals.join(novel, "source", "left").select(
        "source",
        "n_distinct",
        F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        F.floor(
            F.coalesce("n_novel", F.lit(0)) * 1_000_000.0 / F.col("n_distinct")
        )
        .cast("bigint")
        .alias("novelty_fp6"),
    )


_SD_CELLS = 8
_SD_TAU = 0.4
# Viral-cell cap (VERDICT r05 #2): a quantizer cell holding more than this
# many vectors (collapsed/degenerate embeddings — a production web corpus's
# boilerplate class) makes the intra-cell pair join quadratic. Capped cells
# skip pair enumeration entirely (pruning a boilerplate class needs a
# streaming/sampling pass, not an all-pairs join) and surface in the output
# as capped=1 with n_candidate_pairs=0. 512 sits well above this corpus
# family's organic maximum (292 at sf0.1, 70 at sf0.01).
_SD_MAXCELL = 512
_SD_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, v) -> acc + v)"
)


@register(
    "q_semdedup",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_SD_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, embedding AS cvec, nrm AS cnrm FROM e
  WHERE vec_id < {_SD_CELLS}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cent_id AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_SD_DOT.format(a='e.embedding', b='c.cvec')} / (e.nrm * c.cnrm) DESC,
                      c.cent_id) AS rn
    FROM e JOIN cents c ON TRUE
  ) t WHERE rn = 1
),
members AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members FROM assign GROUP BY cell),
m AS (
  SELECT a.cell, e.vec_id, e.embedding, e.nrm
  FROM assign a JOIN e ON a.vec_id = e.vec_id
  JOIN members mem ON a.cell = mem.cell
  WHERE mem.n_members <= {_SD_MAXCELL}
),
pairs AS (
  SELECT x.cell, x.vec_id AS v1, y.vec_id AS v2
  FROM m x JOIN m y ON x.cell = y.cell AND x.vec_id < y.vec_id
  WHERE {_SD_DOT.format(a='x.embedding', b='y.embedding')} / (x.nrm * y.nrm)
        >= {_SD_TAU}
),
dropped AS (
  SELECT cell, COUNT(DISTINCT v2) AS n_dropped FROM pairs GROUP BY cell
),
np AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_dup_pairs FROM pairs GROUP BY cell)
SELECT mem.cell,
       mem.n_members,
       CAST(CASE WHEN mem.n_members > {_SD_MAXCELL} THEN 1 ELSE 0 END AS BIGINT)
         AS capped,
       CAST(CASE WHEN mem.n_members > {_SD_MAXCELL} THEN 0
                 ELSE mem.n_members * (mem.n_members - 1) / 2 END AS BIGINT)
         AS n_candidate_pairs,
       CAST(COALESCE(np.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
       CAST(CASE WHEN mem.n_members > {_SD_MAXCELL} OR mem.n_members < 2 THEN 0
                 ELSE floor(COALESCE(np.n_dup_pairs, 0) * 1000000.0
                            / (mem.n_members * (mem.n_members - 1) / 2)) END
            AS BIGINT) AS precision_fp6,
       CAST(COALESCE(d.n_dropped, 0) AS BIGINT) AS n_dropped,
       CAST(mem.n_members - COALESCE(d.n_dropped, 0) AS BIGINT) AS n_kept
FROM members mem
LEFT JOIN np ON mem.cell = np.cell
LEFT JOIN dropped d ON mem.cell = d.cell
""",
)
def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
    embeddings, then pruning near-identical vectors WITHIN each cluster —
    the economics that make embedding dedup tractable at scale (pairwise
    search inside cells instead of all-pairs over the corpus). Clusters
    come from the deterministic IVF quantizer (first-n seeds — same
    pluggable-training seam as ``sim_ann_ivf``; swap KMeans centroids in
    production, identical pruning machinery); within a cluster a vector is
    dropped when a SMALLER-id member sits above the cosine threshold (the
    deterministic keep-canonical-minimum rule standing in for the paper's
    keep-one-per-group sweep). Per-cluster audit: members, duplicate pairs,
    dropped, kept.

    Scale shape (VERDICT r05 #2/#4): assignment is one broadcast-centroid
    pass with a map-side ``max_by`` argmax; the intra-cell pair join is
    co-partitioned on the cell key and bounded by cell population, with
    VIRAL cells (> ``_SD_MAXCELL`` members — collapsed embeddings, the
    boilerplate class of a web corpus) excluded from pair enumeration via a
    broadcast eligible-cell filter and surfaced as ``capped=1`` audit rows
    rather than silently exploding the join. Each cell also reports its
    candidate-pair count (closed-form C(n,2)) and the duplicate-detection
    precision over those candidates (fp6), so the correctness gate
    witnesses pruning quality, not just cardinality
    (``tests/test_curation.py`` pins the viral-cell behavior)."""
    from ..operators.dedup import _dot, with_norm
    from ..operators.similarity import ivf_assignments, ivf_centroids

    e = T(spark, sf_dir, "embeddings")
    cents = ivf_centroids(e, n_cells=_SD_CELLS).transform(persisted)  # tiny
    assign = ivf_assignments(e, cents).select(
        F.col("m_vec_id").alias("vec_id"), "cell"
    )
    # the cell-keyed member frame feeds BOTH sides of the intra-cell pair
    # join plus the membership count: persist it (this is the
    # cluster-partitioned store a production SemDeDup writes once at
    # ingest) instead of re-running assignment per consumer — the
    # un-persisted plan paid 14 embedding scans (plan-audit finding)
    m = (
        with_norm(e.select("vec_id", "embedding"))
        .join(assign, "vec_id")
        .select("cell", "vec_id", "embedding", "_norm")
        .transform(persisted)
    )
    members = m.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    # viral-cell guard: the eligible-cell frame is at most n_cells rows —
    # broadcast it into both join sides so a capped cell's members never
    # reach the pair shuffle at all (the filter prunes BEFORE the join, so
    # the quadratic blowup is structurally impossible, not just post-hoc
    # filtered)
    eligible = F.broadcast(
        members.filter(F.col("n_members") <= _SD_MAXCELL).select("cell")
    )
    m_ok = m.join(eligible, "cell")
    x, y = m_ok.alias("x"), m_ok.alias("y")
    cos = _dot(F.col("x.embedding"), F.col("y.embedding")) / (
        F.col("x._norm") * F.col("y._norm")
    )
    pairs = (
        x.join(
            y,
            (F.col("x.cell") == F.col("y.cell"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .filter(cos >= _SD_TAU)
        .select(F.col("x.cell").alias("cell"), F.col("x.vec_id").alias("v1"), F.col("y.vec_id").alias("v2"))
        .transform(persisted)  # near-dup-sized; consumers: pair count + dropped count
    )
    np_ = pairs.groupBy("cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs")
    )
    dropped = pairs.groupBy("cell").agg(
        F.countDistinct("v2").cast("bigint").alias("n_dropped")
    )
    capped = (F.col("n_members") > _SD_MAXCELL).cast("bigint")
    n_cand = F.when(
        F.col("n_members") > _SD_MAXCELL, F.lit(0).cast("bigint")
    ).otherwise(
        (F.col("n_members") * (F.col("n_members") - 1) / 2).cast("bigint")
    )
    return (
        members.join(np_, "cell", "left")
        .join(dropped, "cell", "left")
        .select(
            "cell",
            "n_members",
            capped.alias("capped"),
            n_cand.alias("n_candidate_pairs"),
            F.coalesce("n_dup_pairs", F.lit(0)).cast("bigint").alias("n_dup_pairs"),
            F.when(
                (F.col("n_members") > _SD_MAXCELL) | (F.col("n_members") < 2),
                F.lit(0),
            )
            .otherwise(
                F.floor(
                    F.coalesce("n_dup_pairs", F.lit(0))
                    * 1_000_000.0
                    / (F.col("n_members") * (F.col("n_members") - 1) / 2)
                )
            )
            .cast("bigint")
            .alias("precision_fp6"),
            F.coalesce("n_dropped", F.lit(0)).cast("bigint").alias("n_dropped"),
            (F.col("n_members") - F.coalesce("n_dropped", F.lit(0)))
            .cast("bigint")
            .alias("n_kept"),
        )
    )


def _confusion_oracle() -> str:
    from .text import _lang_oracle

    return f"""
WITH scored AS ({_lang_oracle()}),
cells AS (
  SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
  FROM scored GROUP BY lang, lang_pred
),
tot AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang FROM cells GROUP BY lang)
SELECT c.lang, c.lang_pred, c.n, t.n_lang,
       CAST(floor(c.n * 1000000.0 / t.n_lang) AS BIGINT) AS share_fp6
FROM cells c JOIN tot t ON c.lang = t.lang
"""


@register("q_language_confusion", oracle=_confusion_oracle())
def q_language_confusion(spark, sf_dir):
    """Language-ID confusion matrix: the stopword-ratio classifier's
    predictions against the corpus's labeled ``lang`` column, with each
    cell's share of its true-language row — the quality readout that tells
    a curation pipeline whether its language filter is safe to trust before
    it routes 100 TB by predicted language (the diagonal share is per-class
    recall; off-diagonal mass shows which languages leak into which).

    Scale shape: scoring is pure JVM expressions per document (zero
    shuffle); the matrix is one (lang, lang_pred) count aggregate over at
    most |langs|² cells, and the per-language totals join is
    matrix-sized."""
    from ..operators.text import with_language_scores

    d = spread(T(spark, sf_dir, "documents"))
    cells = (
        with_language_scores(d)
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = cells.groupBy("lang").agg(F.sum("n").cast("bigint").alias("n_lang"))
    return cells.join(tot, "lang").select(
        "lang",
        "lang_pred",
        "n",
        "n_lang",
        F.floor(F.col("n") * 1_000_000.0 / F.col("n_lang"))
        .cast("bigint")
        .alias("share_fp6"),
    )


_NLL_CTE = f"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, source, unnest(tk) AS w FROM toks),
lm AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY w
),
consts AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM lm
),
lp AS (
  SELECT w, CAST(floor(ln((c + 1.0) / (n + v)) * 1000000000) AS BIGINT) AS lp9
  FROM lm CROSS JOIN consts
),
scored AS (
  SELECT t.doc_id, t.source,
         CAST(floor(-SUM(lp.lp9) / (COUNT(*) * 1000.0)) AS BIGINT) AS nll_fp6
  FROM tok t JOIN lp ON t.w = lp.w
  GROUP BY t.doc_id, t.source
)"""


def _doc_nll(spark, sf_dir):
    """Per-doc mean token NLL (fp6 BIGINT) under the corpus's add-1 unigram
    LM — the shared scoring stage of q_perplexity_filter and
    q_curriculum_shards. Vocab-sized LM broadcasts; one token shuffle, one
    doc aggregate."""
    d = spread(T(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
    )
    # the LM is VOCAB-sized: persist it so the consts aggregate and the
    # scoring join read the cache instead of re-scanning the corpus (the
    # un-persisted plan paid 9 document scans — plan-audit finding)
    lm = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .transform(persisted)
    )
    consts = lm.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    lp = lm.crossJoin(F.broadcast(consts)).select(
        "w",
        F.floor(
            F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v"))) * 1_000_000_000
        )
        .cast("bigint")
        .alias("lp9"),
    )
    return (
        tok.join(F.broadcast(lp), "w")
        .groupBy("doc_id", "source")
        .agg(
            F.floor(-F.sum("lp9") / (F.count(F.lit(1)) * 1000.0))
            .cast("bigint")
            .alias("nll_fp6"),
        )
    )


@register(
    "q_curriculum_shards",
    oracle=f"""{_NLL_CTE},
vc AS (SELECT nll_fp6, CAST(COUNT(*) AS BIGINT) AS cnt FROM scored GROUP BY 1),
cum AS (
  SELECT nll_fp6,
         SUM(cnt) OVER (ORDER BY nll_fp6
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
         (SELECT SUM(cnt) FROM vc) AS tot
  FROM vc
),
cuts AS (
  SELECT MIN(CASE WHEN r >= CAST(ceil(0.2 * tot) AS BIGINT) THEN nll_fp6 END) AS c1,
         MIN(CASE WHEN r >= CAST(ceil(0.4 * tot) AS BIGINT) THEN nll_fp6 END) AS c2,
         MIN(CASE WHEN r >= CAST(ceil(0.6 * tot) AS BIGINT) THEN nll_fp6 END) AS c3,
         MIN(CASE WHEN r >= CAST(ceil(0.8 * tot) AS BIGINT) THEN nll_fp6 END) AS c4
  FROM cum
),
binned AS (
  SELECT s.doc_id, s.nll_fp6,
         CASE WHEN s.nll_fp6 <= c.c1 THEN 0
              WHEN s.nll_fp6 <= c.c2 THEN 1
              WHEN s.nll_fp6 <= c.c3 THEN 2
              WHEN s.nll_fp6 <= c.c4 THEN 3
              ELSE 4 END AS stage
  FROM scored s CROSS JOIN cuts c
)
SELECT CAST(stage AS INTEGER) AS stage,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(nll_fp6) AS BIGINT) AS nll_min,
       CAST(MAX(nll_fp6) AS BIGINT) AS nll_max,
       CAST(MIN(doc_id) AS BIGINT) AS sample_doc
FROM binned GROUP BY stage
""",
)
def q_curriculum_shards(spark, sf_dir):
    """Curriculum sharding (easy→hard training order): documents bin into 5
    difficulty stages at the EXACT nll quintile cuts (easy = low perplexity
    first — the curriculum-learning convention), with per-stage population
    and score range. The cut points come from the shared
    ``quantile_thresholds`` seam (exact mode here, GK-approx at 100 TB),
    broadcast onto the scored frame for a CASE-bucketed assignment — the
    write path is then the same one-shuffle sharded write as
    ``q_training_shards``."""
    from ..operators.quantiles import quantile_thresholds

    scored = _doc_nll(spark, sf_dir)
    cuts = quantile_thresholds(
        scored, "nll_fp6", {"c1": 0.2, "c2": 0.4, "c3": 0.6, "c4": 0.8}
    )
    stage = (
        F.when(F.col("nll_fp6") <= F.col("c1"), 0)
        .when(F.col("nll_fp6") <= F.col("c2"), 1)
        .when(F.col("nll_fp6") <= F.col("c3"), 2)
        .when(F.col("nll_fp6") <= F.col("c4"), 3)
        .otherwise(4)
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .withColumn("stage", stage.cast("int"))
        .groupBy("stage")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("nll_fp6").cast("bigint").alias("nll_min"),
            F.max("nll_fp6").cast("bigint").alias("nll_max"),
            F.min("doc_id").cast("bigint").alias("sample_doc"),
        )
    )


_HN_ANCHORS = 20  # vec_id in [100, 120) — clear of the IVF centroid seeds


@register(
    "q_hard_negatives",
    oracle=f"""
WITH e AS (
  SELECT vec_id, label, embedding,
         sqrt({_SD_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
anchors AS (
  SELECT vec_id AS query_id, label AS q_label, embedding AS qvec, nrm AS qnrm
  FROM e WHERE vec_id >= 100 AND vec_id < 100 + {_HN_ANCHORS}
),
scored AS (
  SELECT a.query_id, a.q_label, e.vec_id, e.label,
         {_SD_DOT.format(a='a.qvec', b='e.embedding')} / (a.qnrm * e.nrm)
           AS cosine
  FROM anchors a JOIN e ON e.vec_id <> a.query_id
),
neg AS (
  SELECT query_id, vec_id AS hard_neg_id,
         CAST(floor(cosine * 1000000) AS BIGINT) AS neg_cos_fp6
  FROM (
    SELECT query_id, vec_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine DESC, vec_id) AS rn
    FROM scored WHERE label <> q_label
  ) WHERE rn = 1
),
pos AS (
  SELECT query_id, vec_id AS hard_pos_id,
         CAST(floor(cosine * 1000000) AS BIGINT) AS pos_cos_fp6
  FROM (
    SELECT query_id, vec_id, cosine,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cosine ASC, vec_id) AS rn
    FROM scored WHERE label = q_label
  ) WHERE rn = 1
)
SELECT a.query_id, a.q_label,
       n.hard_neg_id, n.neg_cos_fp6,
       p.hard_pos_id, p.pos_cos_fp6
FROM anchors a
JOIN neg n ON a.query_id = n.query_id
JOIN pos p ON a.query_id = p.query_id
""",
)
def q_hard_negatives(spark, sf_dir):
    """Hard-example mining for contrastive embedding training (the triplet /
    InfoNCE batch-construction step): for each anchor, the hardest NEGATIVE
    is the most-similar vector with a DIFFERENT label (the one the model
    most confuses) and the hardest POSITIVE the least-similar vector with
    the SAME label (the one it least recognizes). Deterministic (cosine,
    vec_id) tie-breaks keep both engines choosing identically.

    Scale shape: the anchor set broadcasts onto ONE corpus scan; both
    argmaxes are map-side ``max_by``/``min_by`` hash aggregates keyed by
    anchor (the ``ivf_assignments`` discipline — never a corpus×anchor
    sort). At 100 TB the exact scan swaps for the IVF/PQ candidate
    generation in ``operators/similarity.py`` with this same scoring."""
    from ..operators.dedup import _dot, with_norm

    e = with_norm(
        T(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    )
    anchors = e.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + _HN_ANCHORS)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("embedding").alias("qvec"),
        F.col("_norm").alias("qnrm"),
    )
    cos = _dot(F.col("qvec"), F.col("embedding")) / (F.col("qnrm") * F.col("_norm"))
    scored = (
        e.crossJoin(F.broadcast(anchors))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "q_label",
            "vec_id",
            "label",
            cos.alias("cosine"),
        )
    )
    neg = (
        scored.filter(F.col("label") != F.col("q_label"))
        .groupBy("query_id")
        .agg(
            F.expr("max_by(vec_id, struct(cosine, -vec_id))").alias("hard_neg_id"),
            F.floor(F.max(F.struct("cosine", (-F.col("vec_id")).alias("nid")))["cosine"] * 1_000_000)
            .cast("bigint")
            .alias("neg_cos_fp6"),
        )
    )
    pos = (
        scored.filter(F.col("label") == F.col("q_label"))
        .groupBy("query_id")
        .agg(
            F.expr("min_by(vec_id, struct(cosine, vec_id))").alias("hard_pos_id"),
            F.floor(F.min(F.struct("cosine", F.col("vec_id").alias("pid")))["cosine"] * 1_000_000)
            .cast("bigint")
            .alias("pos_cos_fp6"),
        )
    )
    return (
        anchors.select("query_id", "q_label")
        .join(neg, "query_id")
        .join(pos, "query_id")
        .select(
            "query_id", "q_label", "hard_neg_id", "neg_cos_fp6",
            "hard_pos_id", "pos_cos_fp6",
        )
    )


_FH_BUCKETS = 64


@register(
    "q_feature_hashing",
    oracle=f"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(tk) AS w FROM toks),
b AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % {_FH_BUCKETS}
           AS bucket
  FROM tok
)
SELECT doc_id, CAST(bucket AS INTEGER) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS tf
FROM b GROUP BY doc_id, bucket
""",
)
def q_feature_hashing(spark, sf_dir):
    """Hashing-trick featurization (Weinberger et al. 2009 — the fixed-width
    sparse text vectorizer quality classifiers train on at corpus scale,
    where a learned vocabulary index would itself be a 100 TB shuffle): each
    token hashes into one of 64 buckets (md5-prefix bucket — engine-portable
    where native hash families are not) and the per-(doc, bucket) term
    frequency is the sparse vector entry. Stateless, vocabulary-free, and
    identically computable on any future batch — the property that makes the
    trick production-safe for incremental corpora.

    Scale shape: tokenize + hash ride the scan; one map-side-combined
    (doc, bucket) aggregate is the only shuffle; output is bounded by
    docs × buckets."""
    d = spread(T(spark, sf_dir, "documents"))
    tok = d.select("doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("bigint")
        % _FH_BUCKETS
    )
    return (
        tok.select("doc_id", bucket.cast("int").alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )


_CH_SHARDS_A = 8
_CH_SHARDS_B = 9
_CH_VNODES = 16  # virtual nodes per shard


def _ring_sql(n_shards: int, alias: str) -> str:
    """Ring positions for n_shards × _CH_VNODES virtual nodes (md5 of
    'shard:vnode' → 48-bit position — engine-portable hex arithmetic)."""
    return f"""
{alias} AS (
  SELECT s.i AS shard, v.j AS vnode,
         CAST(('0x' || substr(md5(CAST(s.i AS VARCHAR) || ':' ||
               CAST(v.j AS VARCHAR)), 1, 12)) AS BIGINT) AS pos
  FROM range({n_shards}) s(i) CROSS JOIN range({_CH_VNODES}) v(j)
)"""


@register(
    "q_consistent_hash_shards",
    oracle=f"""
WITH docs_h AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)
           AS pos
  FROM documents
),
{_ring_sql(_CH_SHARDS_A, "ring_a")},
{_ring_sql(_CH_SHARDS_B, "ring_b")},
asg_a AS (
  SELECT doc_id, shard FROM (
    SELECT d.doc_id, r.shard,
           ROW_NUMBER() OVER (PARTITION BY d.doc_id
             ORDER BY (CASE WHEN r.pos >= d.pos THEN r.pos - d.pos
                            ELSE r.pos - d.pos + 281474976710656 END),
                      r.shard, r.vnode) AS rn
    FROM docs_h d CROSS JOIN ring_a r
  ) WHERE rn = 1
),
asg_b AS (
  SELECT doc_id, shard FROM (
    SELECT d.doc_id, r.shard,
           ROW_NUMBER() OVER (PARTITION BY d.doc_id
             ORDER BY (CASE WHEN r.pos >= d.pos THEN r.pos - d.pos
                            ELSE r.pos - d.pos + 281474976710656 END),
                      r.shard, r.vnode) AS rn
    FROM docs_h d CROSS JOIN ring_b r
  ) WHERE rn = 1
)
SELECT a.shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN a.shard <> b.shard THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved_on_grow
FROM asg_a a JOIN asg_b b ON a.doc_id = b.doc_id
GROUP BY a.shard
""",
)
def q_consistent_hash_shards(spark, sf_dir):
    """Consistent-hash shard assignment with a REBALANCE audit — the
    sharding scheme an incremental 100 TB corpus store needs: when the
    cluster grows 8→9 shards, only keys whose ring arc lands on the new
    shard's virtual nodes move (~1/9 of the corpus), where naive
    ``hash % n`` reassigns nearly everything. Ring positions are md5-prefix
    integers (engine-portable); each doc goes to the first virtual node
    clockwise from its own position (wraparound via modular distance), ties
    broken (shard, vnode) — fully deterministic. Output: per-shard
    population under 8 shards and how many of its docs the 9th shard would
    steal.

    Scale shape: both rings are tiny literal frames broadcast onto ONE
    corpus scan; the clockwise-successor argmin is a map-side ``min_by``
    per doc (never a corpus×ring sort); the audit is one shard-keyed
    aggregate."""
    d = spread(T(spark, sf_dir, "documents")).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("bigint")
        .alias("pos"),
    )

    def ring(n_shards):
        spark_ = d.sparkSession
        shards = spark_.range(n_shards).select(F.col("id").alias("shard"))
        vnodes = spark_.range(_CH_VNODES).select(F.col("id").alias("vnode"))
        return shards.crossJoin(vnodes).select(
            "shard",
            "vnode",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("shard").cast("string"),
                            F.col("vnode").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("rpos"),
        )

    def assign(ring_df, out_name):
        dist = F.when(
            F.col("rpos") >= F.col("pos"), F.col("rpos") - F.col("pos")
        ).otherwise(F.col("rpos") - F.col("pos") + (1 << 48))
        return (
            d.crossJoin(F.broadcast(ring_df))
            .select("doc_id", "shard", "vnode", dist.alias("dist"))
            .groupBy("doc_id")
            .agg(
                F.expr("min_by(shard, struct(dist, shard, vnode))").alias(out_name)
            )
        )

    a = assign(ring(_CH_SHARDS_A), "shard")
    b = assign(ring(_CH_SHARDS_B), "shard_b")
    return (
        a.join(b, "doc_id")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("shard") != F.col("shard_b"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_moved_on_grow"),
        )
    )


_EP_SHARDS = 64


@register(
    "q_epoch_shuffle",
    oracle=f"""
WITH asg AS (
  SELECT d.doc_id, e.i AS epoch,
         CAST(('0x' || substr(md5(CAST(e.i AS VARCHAR) || ':' ||
               CAST(d.doc_id AS VARCHAR)), 1, 12)) AS BIGINT) % {_EP_SHARDS}
           AS shard
  FROM documents d CROSS JOIN range(2) e(i)
),
sizes AS (
  SELECT epoch, shard, CAST(COUNT(*) AS BIGINT) AS n
  FROM asg GROUP BY epoch, shard
),
overlap AS (
  SELECT CAST(SUM(CASE WHEN a.shard = b.shard THEN 1 ELSE 0 END) AS BIGINT)
           AS n_same,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM asg a JOIN asg b ON a.doc_id = b.doc_id AND a.epoch = 0 AND b.epoch = 1
)
SELECT s.epoch,
       CAST(SUM(s.n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_shards_used,
       CAST(MIN(s.n) AS BIGINT) AS min_shard,
       CAST(MAX(s.n) AS BIGINT) AS max_shard,
       CAST(floor(o.n_same * 1000000.0 / o.n) AS BIGINT) AS same_shard_fp6
FROM sizes s CROSS JOIN overlap o
GROUP BY s.epoch, o.n_same, o.n
""",
)
def q_epoch_shuffle(spark, sf_dir):
    """Epoch-deterministic data reshuffling audit — multi-epoch training
    needs a DIFFERENT, reproducible order each epoch WITHOUT materializing
    new corpus copies: shard = md5(epoch, doc_id) % 64 is a pure projection,
    so epoch N's layout is one shuffle away from the stored corpus and
    bit-reproducible on any rerun. The audit shows (a) shard balance per
    epoch (min/max population) and (b) cross-epoch decorrelation — the
    fraction of docs landing in the same shard across epochs should sit
    near 1/64, i.e. the orders genuinely differ.

    Scale shape: assignment rides the scan (2× explode for the two audited
    epochs); one (epoch, shard) count aggregate plus a doc-keyed self-join
    that co-partitions on doc_id."""
    d = spread(T(spark, sf_dir, "documents")).select("doc_id")
    asg = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(1))).alias("epoch"),
    ).select(
        "doc_id",
        "epoch",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("epoch").cast("string"),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("bigint")
            % _EP_SHARDS
        ).alias("shard"),
    )
    sizes = asg.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = asg.filter(F.col("epoch") == 0).select("doc_id", F.col("shard").alias("s0"))
    b = asg.filter(F.col("epoch") == 1).select("doc_id", F.col("shard").alias("s1"))
    overlap = (
        a.join(b, "doc_id")
        .agg(
            F.sum(F.when(F.col("s0") == F.col("s1"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_same"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    return (
        sizes.groupBy("epoch")
        .agg(
            F.sum("n").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_shards_used"),
            F.min("n").cast("bigint").alias("min_shard"),
            F.max("n").cast("bigint").alias("max_shard"),
        )
        .crossJoin(F.broadcast(overlap))
        .select(
            "epoch",
            "n_docs",
            "n_shards_used",
            "min_shard",
            "max_shard",
            F.floor(F.col("n_same") * 1_000_000.0 / F.col("n"))
            .cast("bigint")
            .alias("same_shard_fp6"),
        )
    )
