"""Published corpus-filter replication: the Gopher quality + repetition
rules (Rae et al. 2021, "Scaling Language Models: Methods, Analysis &
Insights from Training Gopher", Appendix A) — the rule set production
LLM-data pipelines cite by name. The rules applicable to a
single-field, newline-free corpus are implemented with their PUBLISHED
thresholds (line-based C4/Gopher rules need line structure this corpus
lacks and are documented out of scope):

* R1  word count in [50, 100 000]
* R2  mean word length in [3, 10] characters
* R3  ≥ 80% of words contain at least one alphabetic character
* R4  at least 2 distinct stop words from the published 8-word list
      (the, be, to, of, and, that, have, with)
* R5  most-frequent 2-gram covers ≤ 20% of characters
* R6  most-frequent 3-gram covers ≤ 18% of characters
* R7  most-frequent 4-gram covers ≤ 16% of characters

Cross-engine exactness: every fraction is an fp6 integer (truncating
division of exact counts); the top n-gram is argmax by (count DESC, gram
ASC) — a total order, so engines agree under ties; "characters covered"
= count·len(gram-without-spaces) over the doc's alphanumeric character
mass (the shared ``_TOKENS`` tokenization, plans/lm.py).

Scale shape: ONE corpus scan explodes the (doc, n, gram) frame for
n ∈ {2,3,4} (3× token volume, the q_ngram_novelty family's accepted
cost), map-side-combined counts shuffle on (doc, n, gram), the top-gram
argmax is a (doc, n)-partitioned window — never a global sort; per-doc
verdicts aggregate to the per-source report (source-cardinality rows).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .lm import _TOKENS, _TOKS_SQL
from .registry import T, persisted, register, spread

_STOPS = "('the', 'be', 'to', 'of', 'and', 'that', 'have', 'with')"
_NG_LIMITS = {2: 200_000, 3: 180_000, 4: 160_000}  # fp6 thresholds


_GOPHER_ORACLE = f"""
WITH tk AS MATERIALIZED (
  SELECT doc_id, source, {_TOKS_SQL} AS toks FROM documents
),
base AS MATERIALIZED (
  SELECT doc_id, source,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(COALESCE(list_sum(list_transform(toks, t -> len(t))), 0)
              AS BIGINT) AS n_alpha_chars,
         CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]')))
              AS BIGINT) AS n_alpha_words,
         CAST(len(list_distinct(list_filter(toks,
              t -> t IN {_STOPS}))) AS BIGINT) AS n_stops
  FROM tk
),
grams AS MATERIALIZED (
  SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(len(replace(gram, ' ', '')) AS BIGINT) AS glen
  FROM (
    SELECT doc_id, g.n,
           unnest(list_transform(range(1, len(toks) - g.n + 2),
                  i -> array_to_string(toks[CAST(i AS INT):CAST(i + g.n - 1 AS INT)], ' ')))
             AS gram
    FROM tk, (VALUES (2), (3), (4)) g(n)
    WHERE len(toks) >= g.n
  ) GROUP BY doc_id, n, gram
),
topg AS MATERIALIZED (
  SELECT doc_id, n, c, glen FROM (
    SELECT doc_id, n, c, glen,
           ROW_NUMBER() OVER (PARTITION BY doc_id, n
                              ORDER BY c DESC, gram) AS r
    FROM grams
  ) WHERE r = 1
),
fracs AS (
  SELECT b.doc_id, b.source, b.n_words, b.n_alpha_chars, b.n_alpha_words,
         b.n_stops,
         COALESCE(MAX(CASE WHEN t.n = 2 THEN t.c * t.glen * 1000000
                           // GREATEST(b.n_alpha_chars, 1) END), 0) AS f2,
         COALESCE(MAX(CASE WHEN t.n = 3 THEN t.c * t.glen * 1000000
                           // GREATEST(b.n_alpha_chars, 1) END), 0) AS f3,
         COALESCE(MAX(CASE WHEN t.n = 4 THEN t.c * t.glen * 1000000
                           // GREATEST(b.n_alpha_chars, 1) END), 0) AS f4
  FROM base b LEFT JOIN topg t USING (doc_id)
  GROUP BY 1, 2, 3, 4, 5, 6
),
verdicts AS (
  SELECT source,
    CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS r1,
    CASE WHEN n_words > 0
              AND n_alpha_chars * 1000000 // n_words BETWEEN 3000000
                  AND 10000000 THEN 1 ELSE 0 END AS r2,
    CASE WHEN n_words > 0
              AND n_alpha_words * 1000000 // n_words >= 800000
         THEN 1 ELSE 0 END AS r3,
    CASE WHEN n_stops >= 2 THEN 1 ELSE 0 END AS r4,
    CASE WHEN f2 <= {_NG_LIMITS[2]} THEN 1 ELSE 0 END AS r5,
    CASE WHEN f3 <= {_NG_LIMITS[3]} THEN 1 ELSE 0 END AS r6,
    CASE WHEN f4 <= {_NG_LIMITS[4]} THEN 1 ELSE 0 END AS r7
  FROM fracs
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(r1) AS BIGINT) AS pass_word_count,
       CAST(SUM(r2) AS BIGINT) AS pass_mean_word_len,
       CAST(SUM(r3) AS BIGINT) AS pass_alpha_frac,
       CAST(SUM(r4) AS BIGINT) AS pass_stop_words,
       CAST(SUM(r5) AS BIGINT) AS pass_top2gram,
       CAST(SUM(r6) AS BIGINT) AS pass_top3gram,
       CAST(SUM(r7) AS BIGINT) AS pass_top4gram,
       CAST(SUM(r1 * r2 * r3 * r4 * r5 * r6 * r7) AS BIGINT) AS pass_all,
       CAST(SUM(r1 * r2 * r3 * r4 * r5 * r6 * r7) * 1000000 // COUNT(*)
            AS BIGINT) AS keep_rate_fp6
FROM verdicts
GROUP BY source
ORDER BY source
"""


@register("q_gopher_quality_rules", oracle=_GOPHER_ORACLE)
def q_gopher_quality_rules(spark, sf_dir):
    """Gopher quality + repetition rule replication (module docstring:
    published thresholds R1-R7, fp6 exact fractions, total-order top-gram
    argmax) — per-source pass counts per rule, the all-rules document
    count, and the keep rate: the report a curation run ships before a
    training mix is cut."""
    docs = spread(T(spark, sf_dir, "documents"))
    tk = docs.select(
        "doc_id", "source", F.expr(_TOKENS).alias("toks")
    ).transform(persisted)  # consumers: base features + the gram explode
    base = tk.select(
        "doc_id",
        "source",
        F.size("toks").cast("bigint").alias("n_words"),
        F.expr(
            "CAST(COALESCE(aggregate(toks, 0L, (acc, t) -> acc + length(t)),"
            " 0) AS BIGINT)"
        ).alias("n_alpha_chars"),
        F.expr(
            "CAST(size(filter(toks, t -> t rlike '[a-z]')) AS BIGINT)"
        ).alias("n_alpha_words"),
        F.expr(
            f"CAST(size(array_distinct(filter(toks, t -> t IN {_STOPS})))"
            " AS BIGINT)"
        ).alias("n_stops"),
    )
    grams = (
        tk.select(
            "doc_id",
            F.explode(F.expr("array(2, 3, 4)")).alias("n"),
            "toks",
        )
        .filter(F.size("toks") >= F.col("n"))
        .select(
            "doc_id",
            "n",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - n + 1),"
                    " i -> array_join(slice(toks, i, n), ' '))"
                )
            ).alias("gram"),
        )
        .groupBy("doc_id", "n", "gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .withColumn(
            "glen",
            F.length(F.regexp_replace("gram", " ", "")).cast("bigint"),
        )
    )
    w = Window.partitionBy("doc_id", "n").orderBy(F.desc("c"), "gram")
    topg = (
        grams.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("doc_id", "n", "c", "glen")
    )
    fracs = (
        base.join(topg, "doc_id", "left")
        .groupBy(
            "doc_id",
            "source",
            "n_words",
            "n_alpha_chars",
            "n_alpha_words",
            "n_stops",
        )
        .agg(
            *[
                F.coalesce(
                    F.max(
                        F.when(
                            F.col("n") == k,
                            F.expr(
                                "c * glen * 1000000L"
                                " div GREATEST(n_alpha_chars, 1L)"
                            ),
                        )
                    ),
                    F.lit(0),
                ).alias(f"f{k}")
                for k in (2, 3, 4)
            ]
        )
    )
    v = fracs.select(
        "source",
        F.expr(
            "CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END"
        ).alias("r1"),
        F.expr(
            "CASE WHEN n_words > 0 AND n_alpha_chars * 1000000L div n_words"
            " BETWEEN 3000000 AND 10000000 THEN 1 ELSE 0 END"
        ).alias("r2"),
        F.expr(
            "CASE WHEN n_words > 0 AND n_alpha_words * 1000000L div n_words"
            " >= 800000 THEN 1 ELSE 0 END"
        ).alias("r3"),
        F.expr("CASE WHEN n_stops >= 2 THEN 1 ELSE 0 END").alias("r4"),
        F.expr(
            f"CASE WHEN f2 <= {_NG_LIMITS[2]} THEN 1 ELSE 0 END"
        ).alias("r5"),
        F.expr(
            f"CASE WHEN f3 <= {_NG_LIMITS[3]} THEN 1 ELSE 0 END"
        ).alias("r6"),
        F.expr(
            f"CASE WHEN f4 <= {_NG_LIMITS[4]} THEN 1 ELSE 0 END"
        ).alias("r7"),
    )
    return (
        v.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("r1").cast("bigint").alias("pass_word_count"),
            F.sum("r2").cast("bigint").alias("pass_mean_word_len"),
            F.sum("r3").cast("bigint").alias("pass_alpha_frac"),
            F.sum("r4").cast("bigint").alias("pass_stop_words"),
            F.sum("r5").cast("bigint").alias("pass_top2gram"),
            F.sum("r6").cast("bigint").alias("pass_top3gram"),
            F.sum("r7").cast("bigint").alias("pass_top4gram"),
            F.sum(
                F.col("r1") * F.col("r2") * F.col("r3") * F.col("r4")
                * F.col("r5") * F.col("r6") * F.col("r7")
            )
            .cast("bigint")
            .alias("pass_all"),
        )
        .withColumn(
            "keep_rate_fp6",
            F.expr("CAST(pass_all * 1000000L div n_docs AS BIGINT)"),
        )
    )
