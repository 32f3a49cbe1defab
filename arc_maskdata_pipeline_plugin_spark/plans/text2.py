"""Text analysis, round 2: Flesch readability scoring and RAKE keyword
extraction — the document-quality and topic-surface companions to the
language-ID / quality / token-stat family in ``plans/text.py``.

Both stay JVM-side (split / regexp_count / windows / aggregates — no Python
in the hot path) and end the corpus path in one map-side-combined aggregate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.text import STOPWORDS
from .registry import T, register
from .text import _sql_list

# Flesch reading ease bands: >= 60 is "plain English" (easy)
_FRE_EASY_FP6 = 60_000_000

# the shared alnum word split (mirror of operators/search._TOKENS, applied
# to readability word counts)
_WORDS = (
    "filter(transform(split(lower(trim(text)), '\\\\s+'), "
    "t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
)
_WORDS_SQL = (
    r"list_filter(list_transform(string_split_regex(lower(trim(text)), '\s+'), "
    r"t -> regexp_replace(t, '[^a-z0-9]', '', 'g')), t -> t <> '')"
)


@register(
    "q_readability_scores",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len({_WORDS_SQL}) AS BIGINT) AS w,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS s,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
              AS BIGINT) AS syl
  FROM documents
),
fre AS (
  SELECT source,
         CAST(floor(1000000.0 *
                (206.835 - 1.015 * (CAST(w AS DOUBLE) / s)
                 - 84.6 * (CAST(syl AS DOUBLE) / w)))
              AS BIGINT) AS fre_fp6
  FROM d WHERE w > 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(floor(CAST(SUM(fre_fp6) AS DOUBLE) / COUNT(*)) AS BIGINT)
         AS mean_fre_fp6,
       CAST(floor(1000000.0
              * SUM(CASE WHEN fre_fp6 >= {_FRE_EASY_FP6} THEN 1 ELSE 0 END)
              / COUNT(*)) AS BIGINT) AS easy_share_fp6
FROM fre GROUP BY source
""",
)
def q_readability_scores(spark, sf_dir):
    """Flesch reading ease per source — the classic readability screen a
    curation pipeline runs next to the Gopher quality rules:
    ``FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)``,
    with syllables approximated by vowel-group runs (``[aeiouy]+`` — the
    standard heuristic; vowel groups cannot span word boundaries so the
    whole-text count equals the per-word sum) and sentences by terminal-
    punctuation runs. Per-doc FRE is fp6-floored BEFORE the per-source
    aggregation (integer sums — never a partition-order-dependent double
    mean); emits the mean and the share of "plain English" (FRE ≥ 60) docs.

    Scale shape: pure per-row expressions (split + two regexp counts), one
    map-side-combined aggregate to the |sources| frame; zero joins, zero
    Python."""
    d = T(spark, sf_dir, "documents").select(
        "source",
        F.size(F.expr(_WORDS)).cast("bigint").alias("w"),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]+")), F.lit(1)
        )
        .cast("bigint")
        .alias("s"),
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+"))
        .cast("bigint")
        .alias("syl"),
    )
    fre = d.filter(F.col("w") > 0).select(
        "source",
        F.floor(
            1_000_000.0
            * (
                206.835
                - 1.015 * (F.col("w").cast("double") / F.col("s"))
                - 84.6 * (F.col("syl").cast("double") / F.col("w"))
            )
        )
        .cast("bigint")
        .alias("fre_fp6"),
    )
    return fre.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.floor(F.sum("fre_fp6").cast("double") / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_fre_fp6"),
        F.floor(
            1_000_000.0
            * F.sum(F.when(F.col("fre_fp6") >= _FRE_EASY_FP6, 1).otherwise(0))
            / F.count(F.lit(1))
        )
        .cast("bigint")
        .alias("easy_share_fp6"),
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction
# ---------------------------------------------------------------------------

_RAKE_MIN_FREQ = 5
_RAKE_MIN_LEN = 3
_RAKE_TOP = 50
_RAKE_STOPS = _sql_list(STOPWORDS["en"])


@register(
    "q_rake_keywords",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, string_split_regex(lower(text), '[^a-z0-9]+') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS tok,
         generate_subscripts(toks, 1) AS p
  FROM tk
),
nonstop AS (
  SELECT doc_id, tok, p,
         p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS run
  FROM pos
  WHERE tok <> '' AND tok NOT IN (SELECT unnest({_RAKE_STOPS}))
),
ph AS (
  SELECT doc_id, tok,
         COUNT(*) OVER (PARTITION BY doc_id, run) AS phrase_len
  FROM nonstop
),
ws AS (
  SELECT tok AS word,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(phrase_len - 1) AS BIGINT) AS degree
  FROM ph GROUP BY tok
),
scored AS (
  SELECT word, freq, degree,
         CAST(floor(1000000.0 * (degree + freq) / freq) AS BIGINT)
           AS score_fp6
  FROM ws
  WHERE freq >= {_RAKE_MIN_FREQ} AND length(word) >= {_RAKE_MIN_LEN}
)
SELECT word, freq, degree, score_fp6, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY score_fp6 DESC, word)
                 AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {_RAKE_TOP}
""",
)
def q_rake_keywords(spark, sf_dir):
    """RAKE keyword scores (Rose et al. 2010): split each document into
    candidate phrases at stopwords/punctuation (gaps-and-islands over token
    positions — ``run = pos − row_number`` per doc), then score each word
    by ``deg/freq + 1`` where freq counts occurrences and deg sums
    co-member counts (``phrase_len − 1``) over the phrases containing it.
    High scorers are words that live inside long multi-word phrases — the
    topic surface of the corpus. Top 50 with a min-frequency floor.

    Scale shape: posexplode keeps the token corpus linear; the phrase
    window is PARTITIONED by doc; one word-keyed shuffle builds the scores;
    the top-k is TakeOrderedAndProject. No joins back to the corpus —
    RAKE's word scores need only (freq, degree)."""
    # sorted, not set(): a set literal splats into the plan's IN (...) list
    # in hash-randomized order, so the SAME code produced a different
    # bench plan_sha per interpreter run (VERDICT r06 wrong-item #1)
    stops = sorted(set(STOPWORDS["en"]))
    tk = T(spark, sf_dir, "documents").select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), "[^a-z0-9]+")).alias(
            "p0", "tok"
        ),
    )
    nonstop = (
        tk.filter((F.col("tok") != "") & ~F.col("tok").isin(*stops))
        .select(
            "doc_id",
            "tok",
            # DuckDB's generate_subscripts is 1-based; posexplode is 0-based
            (F.col("p0") + 1).alias("p"),
        )
        .withColumn(
            "run",
            F.col("p")
            - F.row_number().over(Window.partitionBy("doc_id").orderBy("p")),
        )
    )
    ph = nonstop.select(
        "doc_id",
        "tok",
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id", "run"))
        .alias("phrase_len"),
    )
    ws = ph.groupBy(F.col("tok").alias("word")).agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum(F.col("phrase_len") - 1).cast("bigint").alias("degree"),
    )
    scored = ws.filter(
        (F.col("freq") >= _RAKE_MIN_FREQ)
        & (F.length("word") >= _RAKE_MIN_LEN)
    ).select(
        "word",
        "freq",
        "degree",
        F.floor(1_000_000.0 * (F.col("degree") + F.col("freq")) / F.col("freq"))
        .cast("bigint")
        .alias("score_fp6"),
    )
    w = Window.orderBy(F.col("score_fp6").desc(), F.col("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _RAKE_TOP)
        .select("word", "freq", "degree", "score_fp6", F.col("rank").cast("int").alias("rank"))
    )
