"""Vocabulary-coverage estimators over the documents corpus (oracle-checked).

Two classical "how much haven't we seen" diagnostics a corpus-curation team
runs before claiming a crawl is saturated, both exact rank/count statistics:

* **Chao1 species richness + Good-Turing missing mass**
  (Chao 1984; Good 1953): from the frequency-of-frequencies alone —
  singletons f1, doubletons f2, observed distinct d — the bias-corrected
  Chao1 lower bound on TRUE vocabulary size is d + f1(f1−1)/(2(f2+1)), and
  the Good-Turing estimate of the probability mass still unseen is f1/N.
  Both are pure integer arithmetic here (the Chao1 correction term and the
  missing mass go through DECIMAL(38,0) integer division), so the estimates
  hash-match cross-engine exactly.
* **Heaps-law vocabulary growth** (Heaps 1978): vocabulary size at 25/50/
  75/100% of each source's token stream, plus the fitted Heaps exponent β
  (V ≈ K·Nᵝ) via the fp6-floored log-log OLS discipline of q_zipf_slope.
  A source whose curve has flattened (β low) is mined out; a steep curve
  says more crawling still buys vocabulary.

Scale shape — the important trick is that NO token-level global sort exists:
the "position in the source's token stream" of a word's first occurrence
decomposes as doc_offset(doc) + first_pos_within(doc), where doc_offset is a
cumulative sum over the DOC-sized frame (ordered by doc_id — ingest order)
and first_pos_within comes from the same map-side-combined (doc, term)
aggregate every text query uses. So: one token shuffle to (source, doc,
term) minima, one doc-sized window, one vocab-sized aggregate — the corpus
is scanned once, and the only big exchange is the standard postings shuffle.
Chao1 is even cheaper: one (source, term) count shuffle plus a
frequency-of-frequencies aggregate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, persisted, register

# Normalized token list — identical to operators/search.py::_TOKENS and its
# DuckDB mirror (plans/search.py::_TOKS_SQL).
_TOKENS = (
    "filter(transform(split(lower(trim(text)), '\\\\s+'), "
    "t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
)
_TOKS_SQL = (
    r"list_filter(list_transform(string_split_regex(lower(trim(text)), '\s+'), "
    r"t -> regexp_replace(t, '[^a-z0-9]', '', 'g')), t -> t <> '')"
)


@register(
    "q_chao_coverage",
    oracle=f"""
WITH tk AS (SELECT source, {_TOKS_SQL} AS toks FROM documents),
occ AS (SELECT source, unnest(toks) AS term FROM tk),
freq AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM occ GROUP BY 1, 2
),
fof AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS d_distinct,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM freq GROUP BY source
)
SELECT source, n_tokens, d_distinct, f1, f2,
       CAST(d_distinct
            + CAST(f1 AS HUGEINT) * (f1 - 1) // (2 * (f2 + 1)) AS BIGINT)
         AS chao1_est,
       CAST(CAST(f1 AS HUGEINT) * 1000000000 // n_tokens AS BIGINT)
         AS gt_unseen_mass_fp9
FROM fof
""",
)
def q_chao_coverage(spark, sf_dir):
    """Chao1 richness lower bound + Good-Turing missing mass per source
    (module docstring). chao1_est = d + f1(f1−1) div (2(f2+1)) — the
    bias-corrected form is integral by construction; gt_unseen_mass_fp9 =
    (10⁹·f1) div N. One (source, term) shuffle with map-side combine, then
    a |sources|-row frequency-of-frequencies aggregate."""
    docs = T(spark, sf_dir, "documents")
    occ = docs.select(
        "source", F.explode(F.expr(_TOKENS)).alias("term")
    )
    freq = occ.groupBy("source", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    fof = freq.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("d_distinct"),
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
    )
    return fof.select(
        "source", "n_tokens", "d_distinct", "f1", "f2",
        F.expr(
            "CAST(d_distinct + CAST(f1 AS DECIMAL(38,0)) * (f1 - 1)"
            " div (2 * (f2 + 1)) AS BIGINT)"
        ).alias("chao1_est"),
        F.expr(
            "CAST(CAST(f1 AS DECIMAL(38,0)) * 1000000000 div n_tokens"
            " AS BIGINT)"
        ).alias("gt_unseen_mass_fp9"),
    )


@register(
    "q_heaps_law_curve",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents
),
dl AS (
  SELECT doc_id, source, len(toks) AS dl FROM tk WHERE len(toks) > 0
),
off AS (
  SELECT doc_id, source,
         COALESCE(SUM(dl) OVER (PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS doc_off
  FROM dl
),
pos AS (
  SELECT doc_id, source,
         unnest(toks) AS term,
         unnest(range(1, len(toks) + 1)) AS p
  FROM tk
),
dmin AS (
  SELECT source, doc_id, term, CAST(MIN(p) AS BIGINT) AS minp
  FROM pos GROUP BY 1, 2, 3
),
fs AS (
  SELECT d.source, d.term,
         CAST(MIN(o.doc_off + d.minp) AS BIGINT) AS first_seen
  FROM dmin d JOIN off o ON d.doc_id = o.doc_id
  GROUP BY 1, 2
),
tot AS (SELECT source, CAST(SUM(dl) AS BIGINT) AS n FROM dl GROUP BY source),
counts AS (
  SELECT f.source, MAX(t.n) AS n,
         CAST(SUM(CASE WHEN 4 * f.first_seen <= 1 * t.n THEN 1 ELSE 0 END)
              AS BIGINT) AS v1,
         CAST(SUM(CASE WHEN 4 * f.first_seen <= 2 * t.n THEN 1 ELSE 0 END)
              AS BIGINT) AS v2,
         CAST(SUM(CASE WHEN 4 * f.first_seen <= 3 * t.n THEN 1 ELSE 0 END)
              AS BIGINT) AS v3,
         CAST(COUNT(*) AS BIGINT) AS v4
  FROM fs f JOIN tot t ON f.source = t.source
  GROUP BY f.source
),
pts AS (
  SELECT source, q AS quarter,
         CAST(n * q // 4 AS BIGINT) AS tokens_at,
         CAST(CASE q WHEN 1 THEN v1 WHEN 2 THEN v2 WHEN 3 THEN v3
                     ELSE v4 END AS BIGINT) AS vocab_at
  FROM counts, (VALUES (1), (2), (3), (4)) AS qs(q)
),
lg AS (
  SELECT source, quarter, tokens_at, vocab_at,
         CAST(floor(ln(tokens_at) * 1000000) AS BIGINT) AS x6,
         CAST(floor(ln(vocab_at) * 1000000) AS BIGINT) AS y6
  FROM pts
),
mom AS (
  SELECT source, quarter, tokens_at, vocab_at,
         COUNT(*) OVER (PARTITION BY source) AS np,
         SUM(CAST(x6 AS HUGEINT)) OVER (PARTITION BY source) AS sx,
         SUM(CAST(y6 AS HUGEINT)) OVER (PARTITION BY source) AS sy,
         SUM(CAST(x6 AS HUGEINT) * x6) OVER (PARTITION BY source) AS sxx,
         SUM(CAST(x6 AS HUGEINT) * y6) OVER (PARTITION BY source) AS sxy
  FROM lg
)
SELECT source, CAST(quarter AS BIGINT) AS quarter, tokens_at, vocab_at,
       CAST(floor(
         (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
         * 1000000) AS BIGINT) AS beta_fp6
FROM mom
""",
)
def q_heaps_law_curve(spark, sf_dir):
    """Heaps-law vocabulary growth per source at 25/50/75/100% of the token
    stream, plus the fitted Heaps exponent β (module docstring). first_seen
    decomposes as doc_offset + within-doc first position, so the checkpoint
    counts need no token-level global sort; the checkpoint test
    4·first_seen ≤ q·N is the div-free form of first_seen ≤ (q·N) div 4.
    β comes from fp6-floored log-log OLS over the four points — the
    q_zipf_slope discipline, one double expression at the end."""
    docs = T(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", "source", F.expr(_TOKENS).alias("toks")
    )
    dl = (
        tk.select("doc_id", "source", F.size("toks").alias("dl"))
        .filter(F.col("dl") > 0)
        .transform(persisted)  # doc-sized; consumers: offsets + totals
    )
    woff = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = dl.select(
        "doc_id",
        "source",
        F.coalesce(F.sum("dl").over(woff), F.lit(0)).alias("doc_off"),
    )
    pos = tk.select(
        "doc_id", "source", F.posexplode("toks").alias("p0", "term")
    ).select("doc_id", "source", "term", (F.col("p0") + 1).alias("p"))
    dmin = pos.groupBy("source", "doc_id", "term").agg(
        F.min("p").cast("bigint").alias("minp")
    )
    fs = (
        dmin.join(off.select("doc_id", "doc_off"), "doc_id")
        .groupBy("source", "term")
        .agg(
            F.min(F.col("doc_off") + F.col("minp"))
            .cast("bigint")
            .alias("first_seen")
        )
    )
    tot = dl.groupBy("source").agg(F.sum("dl").cast("bigint").alias("n"))
    counts = (
        fs.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(
            F.max("n").alias("n"),
            F.sum(
                F.when(4 * F.col("first_seen") <= 1 * F.col("n"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("v1"),
            F.sum(
                F.when(4 * F.col("first_seen") <= 2 * F.col("n"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("v2"),
            F.sum(
                F.when(4 * F.col("first_seen") <= 3 * F.col("n"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("v3"),
            F.count(F.lit(1)).cast("bigint").alias("v4"),
        )
    )
    pts = counts.selectExpr(
        "source",
        "n",
        "stack(4, 1, v1, 2, v2, 3, v3, 4, v4) AS (quarter, vocab_at)",
    ).select(
        "source",
        F.col("quarter").cast("bigint").alias("quarter"),
        F.expr("CAST(n * quarter div 4 AS BIGINT)").alias("tokens_at"),
        "vocab_at",
    )
    lg = pts.select(
        "source", "quarter", "tokens_at", "vocab_at",
        F.floor(F.log("tokens_at") * 1_000_000).cast("bigint").alias("x6"),
        F.floor(F.log("vocab_at") * 1_000_000).cast("bigint").alias("y6"),
    )
    ws = Window.partitionBy("source")
    mom = lg.select(
        "source", "quarter", "tokens_at", "vocab_at",
        F.count(F.lit(1)).over(ws).alias("np"),
        F.sum(F.col("x6").cast("decimal(38,0)")).over(ws).alias("sx"),
        F.sum(F.col("y6").cast("decimal(38,0)")).over(ws).alias("sy"),
        F.sum(F.col("x6").cast("decimal(38,0)") * F.col("x6"))
        .over(ws)
        .alias("sxx"),
        F.sum(F.col("x6").cast("decimal(38,0)") * F.col("y6"))
        .over(ws)
        .alias("sxy"),
    )
    npd = F.col("np").cast("double")
    beta = F.floor(
        (npd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (npd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
        * 1_000_000
    ).cast("bigint")
    return mom.select(
        "source", "quarter", "tokens_at", "vocab_at", beta.alias("beta_fp6")
    )


_BURST_TOP = 100


@register(
    "q_term_burstiness",
    oracle=f"""
WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
occ AS (SELECT doc_id, unnest(toks) AS term FROM tk),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
stats AS (
  SELECT term,
         CAST(COUNT(*) AS BIGINT) AS cf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM occ GROUP BY term
),
top AS (
  SELECT term, cf, df,
         ROW_NUMBER() OVER (ORDER BY cf DESC, term) AS rk
  FROM stats QUALIFY rk <= {_BURST_TOP}
)
SELECT t.term, t.cf, t.df,
       CAST(CAST(t.cf AS HUGEINT) * 1000000 // t.df AS BIGINT)
         AS cf_per_df_fp6,
       CAST(floor(nd.n_docs * (1 - exp(-(t.cf * 1.0 / nd.n_docs)))
                  * 1000000) AS BIGINT) AS poisson_df_fp6,
       CAST(floor(nd.n_docs * (1 - exp(-(t.cf * 1.0 / nd.n_docs)))
                  * 1000000) AS BIGINT) // t.df AS burstiness_fp6
FROM top t, nd
""",
)
def q_term_burstiness(spark, sf_dir):
    """Church-Gale term burstiness for the top-{_BURST_TOP} terms by
    collection frequency: under a Poisson null a term with cf occurrences
    should touch n_docs·(1−e^(−cf/n_docs)) documents; bursty content terms
    concentrate in far fewer (burstiness ≫ 1), function words sit near 1.
    The screen that separates topical keywords from boilerplate glue when
    building stopword lists or keyword extractors (complements
    q_rake_keywords / q_ngram_diversity).

    Engine parity: cf/df are exact integers; the Poisson expectation is one
    double expression of exact integers floored to fp6 identically in both
    engines, and burstiness divides the two INTEGERS. One (term, doc)
    distinct-ish aggregate (count + count distinct in a single pass), then
    a vocab-frame top-k — TakeOrderedAndProject, never a global sort."""
    docs = T(spark, sf_dir, "documents")
    occ = docs.select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
    nd = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    stats = occ.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("cf"),
        F.countDistinct("doc_id").cast("bigint").alias("df"),
    )
    top = (
        stats.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("cf"), F.asc("term"))),
        )
        .filter(F.col("rk") <= _BURST_TOP)
        .drop("rk")
    )
    poisson = F.floor(
        F.col("n_docs")
        * (1 - F.exp(-(F.col("cf") * 1.0 / F.col("n_docs"))))
        * 1_000_000
    ).cast("bigint")
    return (
        top.crossJoin(F.broadcast(nd))
        .select(
            "term",
            "cf",
            "df",
            F.expr("CAST(CAST(cf AS DECIMAL(38,0)) * 1000000 div df AS BIGINT)")
            .alias("cf_per_df_fp6"),
            poisson.alias("poisson_df_fp6"),
            F.expr(
                "CAST(CAST(floor(n_docs * (1 - exp(-(cf * 1.0 / n_docs)))"
                " * 1000000) AS BIGINT) div df AS BIGINT)"
            ).alias("burstiness_fp6"),
        )
    )
