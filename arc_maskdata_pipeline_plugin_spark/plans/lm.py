"""Bigram language-model scoring over the corpus (oracle-checked).

`q_perplexity_filter` (plans/curation.py) scores documents under the
corpus's add-1 UNIGRAM model; real quality gates (CCNet's KenLM) use
higher-order context. This module adds the order-2 rung:

* **q_bigram_perplexity** — per-source mean negative log-likelihood under
  the corpus's add-1 bigram model p(w₂|w₁) = (C(w₁w₂)+1)/(C(w₁)+V),
  emitted NEXT TO the unigram mean NLL from the same scan so the
  context-buys-predictability delta is visible per source (on training
  data the bigram MLE fits tighter; add-1 smoothing at tiny counts can
  locally invert that, so the delta is reported, not pinned).

Engine parity: every log term is ln of EXACT integers — nll9(w₁,w₂) =
floor(10⁹·(ln(C(w₁)+V) − ln(C(w₁w₂)+1))) — floored per bigram TYPE before
being multiplied by exact occurrence counts and summed (the fp9 discipline
of q_corpus_drift_kl); means are integer divisions at the end.

Scale shape: one (w₁,w₂) count shuffle with map-side combine builds the LM;
scoring joins the per-doc bigram frame to the LM CO-PARTITIONED on the
bigram key (the LM is vocab²-bounded — too big to assume broadcastable at
100 TB, unlike the unigram table); per-doc and per-source sums are two more
keyed aggregates. The corpus text is scanned once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import T, persisted, register

_TOKENS = (
    "filter(transform(split(lower(trim(text)), '\\\\s+'), "
    "t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
)
_TOKS_SQL = (
    r"list_filter(list_transform(string_split_regex(lower(trim(text)), '\s+'), "
    r"t -> regexp_replace(t, '[^a-z0-9]', '', 'g')), t -> t <> '')"
)


@register(
    "q_bigram_perplexity",
    oracle=f"""
WITH tk AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
uni AS (
  SELECT unnest(toks) AS w FROM tk
),
uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM uni GROUP BY w),
vv AS (SELECT CAST(COUNT(*) AS BIGINT) AS v,
              CAST(SUM(cw) AS BIGINT) AS n_tok FROM uc),
bg AS (
  SELECT doc_id, source,
         unnest(toks[1:len(toks) - 1]) AS w1,
         unnest(toks[2:len(toks)]) AS w2
  FROM tk WHERE len(toks) >= 2
),
dbg AS (
  SELECT doc_id, source, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM bg GROUP BY 1, 2, 3, 4
),
bc AS (SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS cb FROM dbg GROUP BY 1, 2),
blm AS (
  SELECT b.w1, b.w2,
         CAST(floor((ln(u.cw + vv.v) - ln(b.cb + 1)) * 1000000000)
              AS BIGINT) AS nll9
  FROM bc b JOIN uc u ON b.w1 = u.w, vv
),
ulm AS (
  SELECT u.w,
         CAST(floor((ln(vv.n_tok + vv.v) - ln(u.cw + 1)) * 1000000000)
              AS BIGINT) AS nll9
  FROM uc u, vv
),
dsc AS (
  SELECT d.doc_id, d.source,
         CAST(SUM(d.c) AS BIGINT) AS n_bg,
         CAST(SUM(d.c * l.nll9) AS DECIMAL(38,0)) AS s_bg
  FROM dbg d JOIN blm l ON d.w1 = l.w1 AND d.w2 = l.w2
  GROUP BY 1, 2
),
dsu AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_u,
         CAST(SUM(l.nll9) AS DECIMAL(38,0)) AS s_u
  FROM (SELECT doc_id, unnest(toks) AS w FROM tk) t
  JOIN ulm l ON t.w = l.w
  GROUP BY 1
)
SELECT b.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(b.n_bg) AS BIGINT) AS n_bigrams,
       CAST(MAX(vv.v) AS BIGINT) AS vocab,
       CAST(CAST(SUM(b.s_bg) AS HUGEINT) * 1000000
            // (CAST(SUM(b.n_bg) AS HUGEINT) * 1000000000)
            AS BIGINT) AS bigram_nll_fp6,
       CAST(CAST(SUM(u.s_u) AS HUGEINT) * 1000000
            // (CAST(SUM(u.n_u) AS HUGEINT) * 1000000000)
            AS BIGINT) AS unigram_nll_fp6
FROM dsc b JOIN dsu u ON b.doc_id = u.doc_id, vv
GROUP BY b.source
""",
)
def q_bigram_perplexity(spark, sf_dir):
    """Per-source mean NLL under the corpus add-1 bigram LM next to the
    add-1 unigram LM from the same scan (module docstring). Means divide
    exact fp9 sums by exact token counts in DECIMAL(38,0)/HUGEINT integer
    division, so the emitted fp6 values hash-match cross-engine."""
    tk = T(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_TOKENS).alias("toks")
    )
    uni = tk.select("doc_id", F.explode("toks").alias("w"))
    # per-(doc, word) counts: the postings-shaped frame both the unigram LM
    # (re-aggregate) and the per-doc unigram scoring derive from — persist
    # so the corpus tokenizes once for the whole unigram side
    dwc = (
        uni.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .transform(persisted)
    )
    uc = dwc.groupBy("w").agg(F.sum("n").cast("bigint").alias("cw"))
    vv = uc.agg(
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum("cw").cast("bigint").alias("n_tok"),
    )
    bg = (
        tk.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
                )
            ).alias("z"),
        )
        .select("doc_id", "source", F.col("z.w1"), F.col("z.w2"))
    )
    # per-(doc, bigram) counts: consumers = the bigram LM re-aggregate and
    # the per-doc scoring join — persist so the bigram explode runs once
    dbg = (
        bg.groupBy("doc_id", "source", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .transform(persisted)
    )
    bc = dbg.groupBy("w1", "w2").agg(F.sum("c").cast("bigint").alias("cb"))
    blm = (
        bc.join(uc.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(F.broadcast(vv))
        .select(
            "w1",
            "w2",
            F.floor(
                (F.log(F.col("cw") + F.col("v")) - F.log(F.col("cb") + 1))
                * 1_000_000_000
            )
            .cast("bigint")
            .alias("nll9"),
        )
    )
    ulm = uc.crossJoin(F.broadcast(vv)).select(
        "w",
        F.floor(
            (F.log(F.col("n_tok") + F.col("v")) - F.log(F.col("cw") + 1))
            * 1_000_000_000
        )
        .cast("bigint")
        .alias("nll9"),
    )
    dsc = (
        dbg.join(blm, ["w1", "w2"])
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("bigint").alias("n_bg"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("nll9"))
            .cast("decimal(38,0)")
            .alias("s_bg"),
        )
    )
    dsu = (
        dwc.join(ulm, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_u"),
            F.sum(F.col("n").cast("decimal(38,0)") * F.col("nll9"))
            .cast("decimal(38,0)")
            .alias("s_u"),
        )
    )
    return (
        dsc.join(dsu, "doc_id")
        .crossJoin(F.broadcast(vv))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bg").cast("bigint").alias("n_bigrams"),
            F.max("v").cast("bigint").alias("vocab"),
            F.expr(
                "CAST(SUM(s_bg) * 1000000 div (CAST(SUM(n_bg) AS"
                " DECIMAL(38,0)) * 1000000000) AS BIGINT)"
            ).alias("bigram_nll_fp6"),
            F.expr(
                "CAST(SUM(s_u) * 1000000 div (CAST(SUM(n_u) AS"
                " DECIMAL(38,0)) * 1000000000) AS BIGINT)"
            ).alias("unigram_nll_fp6"),
        )
    )


@register(
    "q_kneser_ney_perplexity",
    oracle=f"""
WITH tk AS (SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents),
bg AS (
  SELECT doc_id, source,
         unnest(toks[1:len(toks) - 1]) AS w1,
         unnest(toks[2:len(toks)]) AS w2
  FROM tk WHERE len(toks) >= 2
),
dbg AS (
  SELECT doc_id, source, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
  FROM bg GROUP BY 1, 2, 3, 4
),
bc AS (SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS cb FROM dbg GROUP BY 1, 2),
cw1 AS (
  SELECT w1, CAST(SUM(cb) AS BIGINT) AS cw,
         CAST(COUNT(*) AS BIGINT) AS n1p
  FROM bc GROUP BY w1
),
cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1c FROM bc GROUP BY w2),
gst AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n1pp,
         CAST(SUM(CASE WHEN cb = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN cb = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM bc
),
blm AS (
  SELECT b.w1, b.w2,
         CAST(floor((ln(CAST(c1.cw AS DECIMAL(38,0))
                        * GREATEST(g.n1 + 2 * g.n2, 1) * g.n1pp)
                     - ln(GREATEST(CAST(b.cb AS DECIMAL(38,0))
                                   * GREATEST(g.n1 + 2 * g.n2, 1) - g.n1,
                                   CAST(0 AS DECIMAL(38,0))) * g.n1pp
                          + CAST(g.n1 AS DECIMAL(38,0)) * c1.n1p * ct.n1c))
                    * 1000000000) AS BIGINT) AS nll9
  FROM bc b
  JOIN cw1 c1 ON b.w1 = c1.w1
  JOIN cont ct ON b.w2 = ct.w2
  CROSS JOIN gst g
),
dsc AS (
  SELECT d.doc_id, d.source,
         CAST(SUM(d.c) AS BIGINT) AS n_bg,
         CAST(SUM(d.c * l.nll9) AS DECIMAL(38,0)) AS s
  FROM dbg d JOIN blm l ON d.w1 = l.w1 AND d.w2 = l.w2
  GROUP BY 1, 2
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_bg) AS BIGINT) AS n_bigrams,
       CAST(MAX(g.n1pp) AS BIGINT) AS bigram_types,
       CAST(MAX(g.n1) AS BIGINT) AS n1,
       CAST(MAX(g.n2) AS BIGINT) AS n2,
       CAST(MAX(g.n1) * 1000000000 // GREATEST(MAX(g.n1) + 2 * MAX(g.n2), 1)
            AS BIGINT) AS discount_fp9,
       CAST(CAST(SUM(d.s) AS HUGEINT) * 1000000
            // (CAST(SUM(d.n_bg) AS HUGEINT) * 1000000000)
            AS BIGINT) AS kn_nll_fp6
FROM dsc d CROSS JOIN gst g
GROUP BY d.source
""",
)
def q_kneser_ney_perplexity(spark, sf_dir):
    """Per-source mean NLL under an INTERPOLATED KNESER-NEY bigram model —
    the smoothing a production perplexity filter actually uses (CCNet's
    KenLM default), upgrading q_bigram_perplexity's add-1 floor:

        p_KN(w₂|w₁) = max(C(w₁w₂) − D, 0)/C(w₁)
                      + D·N1+(w₁·)/C(w₁) · N1+(·w₂)/N1+(··)

    with the standard count-of-counts discount D = n₁/(n₁ + 2n₂)
    (Kneser-Ney 1995; Chen & Goodman 1999). ENGINE PARITY: D is kept as a
    RATIO of exact integers, so with dd = n₁ + 2n₂ every probability is a
    ratio of exact integers —

        p = [max(cb·dd − n₁, 0)·N1pp + n₁·N1p(w₁)·N1c(w₂)]
            / [C(w₁)·dd·N1pp]

    and nll9 = floor(10⁹·(ln den − ln num)) floors per bigram TYPE before
    the occurrence-weighted sum (the fp9 discipline of
    q_bigram_perplexity). DEGENERATE CORPUS: if no bigram type occurs
    exactly once or twice (n₁ = n₂ = 0 — true of the highly repetitive
    synthetic corpus at sf0.1), D = 0 and KN reduces to the bigram MLE;
    substituting dd := GREATEST(n₁+2n₂, 1) implements that limit EXACTLY
    (n₁ = 0 zeroes both discount and continuation mass) instead of
    dividing by zero — same substitution in both engines. Scoring the training corpus itself means every
    scored bigram has cb ≥ 1, so num ≥ 2n₂·N1pp + n₁·N1p·N1c > 0 whenever
    the corpus has any repeated-count mass (the GREATEST(·,0) guard is
    kept in both engines for structural parity). The defining KN identity
    Σ_w₂ p_KN(w₂|w₁) = 1 is pinned with exact Fractions on a constructed
    corpus in tests/test_kneser_ney.py.

    Scale shape: identical to q_bigram_perplexity — one (w₁,w₂) count
    shuffle with map-side combine builds the LM; the CONTINUATION counts
    N1+(w₁·), N1+(·w₂), n₁/n₂ are three keyed re-aggregates of the SAME
    persisted bigram-type frame (no second corpus pass, VERDICT r09 #4);
    scoring joins per-doc bigrams to the LM co-partitioned on the bigram
    key; the corpus text is scanned once."""
    tk = T(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr(_TOKENS).alias("toks")
    )
    bg = (
        tk.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1),"
                    " i -> struct(toks[i - 1] AS w1, toks[i] AS w2))"
                )
            ).alias("z"),
        )
        .select("doc_id", "source", F.col("z.w1"), F.col("z.w2"))
    )
    # persisted per-(doc, bigram) frame: consumers = LM re-aggregate +
    # scoring join (the q_bigram_perplexity seam)
    dbg = (
        bg.groupBy("doc_id", "source", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .transform(persisted)
    )
    # persisted bigram-TYPE frame: consumers = context counts, continuation
    # counts, count-of-counts, and the LM join — built once
    bc = (
        dbg.groupBy("w1", "w2")
        .agg(F.sum("c").cast("bigint").alias("cb"))
        .transform(persisted)
    )
    cw1 = bc.groupBy("w1").agg(
        F.sum("cb").cast("bigint").alias("cw"),
        F.count(F.lit(1)).cast("bigint").alias("n1p"),
    )
    cont = bc.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1c")
    )
    glob = bc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n1pp"),
        F.sum(F.when(F.col("cb") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("cb") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n2"),
    )
    blm = (
        bc.join(cw1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(glob))
        .select(
            "w1",
            "w2",
            F.floor(
                (
                    F.log(
                        F.col("cw").cast("decimal(38,0)")
                        * F.greatest(
                            F.col("n1") + 2 * F.col("n2"), F.lit(1)
                        )
                        * F.col("n1pp")
                    )
                    - F.log(
                        F.greatest(
                            F.col("cb").cast("decimal(38,0)")
                            * F.greatest(
                                F.col("n1") + 2 * F.col("n2"), F.lit(1)
                            )
                            - F.col("n1"),
                            F.lit(0).cast("decimal(38,0)"),
                        )
                        * F.col("n1pp")
                        + F.col("n1").cast("decimal(38,0)")
                        * F.col("n1p")
                        * F.col("n1c")
                    )
                )
                * 1_000_000_000
            )
            .cast("bigint")
            .alias("nll9"),
        )
    )
    dsc = (
        dbg.join(blm, ["w1", "w2"])
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("bigint").alias("n_bg"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("nll9"))
            .cast("decimal(38,0)")
            .alias("s"),
        )
    )
    return (
        dsc.crossJoin(F.broadcast(glob))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bg").cast("bigint").alias("n_bigrams"),
            F.max("n1pp").cast("bigint").alias("bigram_types"),
            F.max("n1").cast("bigint").alias("n1"),
            F.max("n2").cast("bigint").alias("n2"),
            F.expr(
                "CAST(MAX(n1) * 1000000000"
                " div GREATEST(MAX(n1) + 2 * MAX(n2), 1) AS BIGINT)"
            ).alias("discount_fp9"),
            F.expr(
                "CAST(SUM(s) * 1000000 div (CAST(SUM(n_bg) AS"
                " DECIMAL(38,0)) * 1000000000) AS BIGINT)"
            ).alias("kn_nll_fp6"),
        )
    )
