"""Text-analysis queries over ``documents`` (oracle-checked).

Each query pairs the Spark operator (operators/text.py) with equivalent
DuckDB SQL. Ratios are integer-count divisions cast to double — exact in both
engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.text import (
    STOPWORDS,
    with_chunks,
    with_fingerprint,
    with_language_scores,
    with_quality_score,
    with_token_stats,
)
from .registry import T, register, spread


@register(
    "text_token_stats",
    oracle=r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS n_tokens,
       CAST(CEIL(length(text) / 4.0) AS INTEGER) AS est_bpe_tokens,
       CAST(length(regexp_replace(trim(text), '\s+', '', 'g')) AS DOUBLE)
         / len(string_split_regex(trim(text), '\s+')) AS avg_token_len
FROM documents
""",
)
def text_token_stats(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return with_token_stats(d).select("doc_id", "n_tokens", "est_bpe_tokens", "avg_token_len")


def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_EN = _sql_list(STOPWORDS["en"])

_QUALITY_ORACLE = rf"""
WITH t AS (
  SELECT doc_id,
         length(text) AS nc,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS n_punct,
         string_split_regex(trim(text), '\s+') AS tk
  FROM documents
)
SELECT doc_id,
       len(tk) AS n_tokens,
       CAST(n_alpha AS DOUBLE) / nc AS alpha_ratio,
       CAST(n_punct AS DOUBLE) / nc AS punct_ratio,
       CAST(len(list_filter(tk, x -> list_contains({_EN}, x))) AS DOUBLE) / len(tk) AS stopword_ratio,
       CAST(n_alpha AS DOUBLE) / nc
         + LEAST(CAST(len(list_filter(tk, x -> list_contains({_EN}, x))) AS DOUBLE) / len(tk) * 2, 0.4)
         - CAST(n_punct AS DOUBLE) / nc AS quality_score
FROM t
"""


@register("text_quality_scores", oracle=_QUALITY_ORACLE)
def text_quality_scores(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return with_quality_score(d).select(
        "doc_id", "n_tokens", "alpha_ratio", "punct_ratio", "stopword_ratio", "quality_score"
    )


def _lang_oracle() -> str:
    score_exprs = []
    for lang, words in STOPWORDS.items():
        score_exprs.append(
            f"CAST(len(list_filter(tk, x -> list_contains({_sql_list(words)}, lower(x)))) AS DOUBLE)"
            f" / len(tk) AS score_{lang}"
        )
    langs = list(STOPWORDS)
    best = "GREATEST(" + ", ".join(f"score_{l}" for l in langs) + ")"
    case = "CASE " + " ".join(
        f"WHEN score_{l} = {best} THEN '{l}'" for l in langs
    ) + " ELSE 'und' END"
    return f"""
WITH t AS (SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS tk FROM documents),
s AS (SELECT doc_id, lang, {", ".join(score_exprs)} FROM t)
SELECT doc_id, lang, score_en, score_es, score_de, score_fr,
       CASE WHEN {best} > 0 THEN {case} ELSE 'und' END AS lang_pred
FROM s
"""


@register("text_language_scores", oracle=_lang_oracle())
def text_language_scores(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return with_language_scores(d).select(
        "doc_id", "lang", "score_en", "score_es", "score_de", "score_fr", "lang_pred"
    )


@register(
    "text_fingerprints",
    oracle=r"""
WITH n AS (
  SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp_md5
  FROM documents
)
SELECT doc_id, fp_md5,
       CAST(('0x' || substr(fp_md5, 1, 15)) AS BIGINT) AS fp_prefix64
FROM n
""",
)
def text_fingerprints(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return with_fingerprint(d).select("doc_id", "fp_md5", "fp_prefix64")


@register(
    "text_chunks",
    oracle=r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
)
SELECT doc_id,
       CAST((s - 1) // 40 AS INTEGER) AS chunk_idx,
       array_to_string(list_slice(tk, s, s + 49), ' ') AS chunk_text,
       CAST(len(list_slice(tk, s, s + 49)) AS INTEGER) AS n_tokens
FROM t, UNNEST(generate_series(1, greatest(len(tk), 1), 40)) AS g(s)
""",
)
def text_chunks(spark, sf_dir):
    """Context-window chunking: 50-token windows, 10-token overlap
    (operators/text.py::with_chunks); property-tested against a pure-Python
    reference chunker on random documents."""
    d = T(spark, sf_dir, "documents")
    return with_chunks(d, chunk_size=50, stride=40)


@register(
    "q_stratified_sample",
    oracle="""
SELECT event_id, user_id, event_type
FROM events
WHERE substr(md5(CAST(event_id AS VARCHAR)), 1, 4) <
      CASE event_type
        WHEN 'click'    THEN '1000'
        WHEN 'view'     THEN '2000'
        WHEN 'purchase' THEN '8000'
        ELSE '4000'
      END
""",
)
def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified sampling for training-data mixes: keep a row
    iff the md5 of its id falls below a per-stratum hex threshold
    ('1000'/16^4 ≈ 6.25%, '8000' = 50%, …). Hash-threshold sampling is the
    production form: reproducible across runs AND engines (no RNG state),
    stable under repartitioning, and joins/unions of samples stay consistent
    because membership is a pure function of the id. Fully pushed down —
    a filter on the scan, no shuffle."""
    from pyspark.sql import functions as F

    e = T(spark, sf_dir, "events")
    threshold = (
        F.when(F.col("event_type") == "click", "1000")
        .when(F.col("event_type") == "view", "2000")
        .when(F.col("event_type") == "purchase", "8000")
        .otherwise("4000")
    )
    bucket = F.substring(F.md5(F.col("event_id").cast("string")), 1, 4)
    return e.filter(bucket < threshold).select("event_id", "user_id", "event_type")


@register(
    "q_train_val_test_split",
    oracle="""
WITH assigned AS (
  SELECT doc_id,
         CASE
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '0ccd' THEN 'val'
           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999' THEN 'test'
           ELSE 'train'
         END AS split
  FROM documents
)
SELECT doc_id, split FROM assigned
""",
)
def q_train_val_test_split(spark, sf_dir):
    """Deterministic 3-way split (~5% val / ~5% test / 90% train) by hash
    threshold on the document id: reproducible across runs, engines, and
    repartitioning, with no RNG state to coordinate — membership is a pure
    function of the id, so a re-run or a late-arriving shard lands in the
    same split. Thresholds are hex prefixes of md5 ('0ccd'/16^4 ≈ 5%).
    Pure projection: no shuffle."""
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(bucket < "0ccd", "val")
        .when(bucket < "1999", "test")
        .otherwise("train")
    )
    return T(spark, sf_dir, "documents").select("doc_id", split.alias("split"))


# ---------------------------------------------------------------------------
# Round 2: PII scrubbing / repetition / quality filter
# ---------------------------------------------------------------------------

# The documents table is clean word-soup, so the PII query INJECTS a
# deterministic email/URL/IP/phone per doc (pure id arithmetic, identical
# SQL in both engines) and verifies the scrubber removes all of it.
_PII_TEXT_SPARK = (
    "concat('Contact u', CAST(doc_id AS STRING), '@mail', CAST(doc_id % 7 AS STRING), "
    "'.com or https://site', CAST(doc_id % 5 AS STRING), '.example/p?id=', "
    "CAST(doc_id AS STRING), ' from 10.0.', CAST(doc_id % 256 AS STRING), "
    "'.1 call +1 (555) 010-', CAST(doc_id % 10 AS STRING), CAST(doc_id % 10 AS STRING), "
    "CAST(doc_id % 10 AS STRING), CAST(doc_id % 10 AS STRING), ' ', text)"
)

_PII_TEXT_SQL = (
    "'Contact u' || doc_id || '@mail' || (doc_id % 7) || "
    "'.com or https://site' || (doc_id % 5) || '.example/p?id=' || doc_id || "
    "' from 10.0.' || (doc_id % 256) || '.1 call +1 (555) 010-' || (doc_id % 10) "
    "|| (doc_id % 10) || (doc_id % 10) || (doc_id % 10) || ' ' || text"
)


def _pii_oracle() -> str:
    from ..operators.text import PII_PATTERNS

    expr = _PII_TEXT_SQL
    for pat, repl in PII_PATTERNS:
        sql_pat = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{sql_pat}', '{repl}', 'g')"
    return f"SELECT doc_id, {expr} AS scrubbed FROM documents"


@register("q_pii_scrub", oracle=_pii_oracle())
def q_pii_scrub(spark, sf_dir):
    """PII redaction (emails/URLs/IPs/phones → typed tokens) as a chained
    regexp_replace projection — zero shuffle, codegen'd, RE2-compatible
    patterns so DuckDB replays the identical rewrite."""
    from pyspark.sql import functions as F

    from ..operators.text import scrub_pii

    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_TEXT_SPARK).alias("text")
    )
    return scrub_pii(d).select("doc_id", "scrubbed")


@register(
    "q_repetition_stats",
    oracle=r"""
WITH words AS (
  SELECT doc_id, w
  FROM documents, UNNEST(string_split_regex(trim(text), '\s+')) AS t(w)
), per_word AS (
  SELECT doc_id, w, COUNT(*) AS n FROM words GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(SUM(n) AS BIGINT) AS n_words,
       COUNT(*) AS n_distinct,
       CAST(COUNT(*) AS DOUBLE) / SUM(n) AS distinct_ratio,
       CAST(MAX(n) AS DOUBLE) / SUM(n) AS top_word_share
FROM per_word GROUP BY doc_id
""",
)
def q_repetition_stats(spark, sf_dir):
    """Boilerplate/spam screen: distinct-word ratio + top-word share per doc
    (explode → (doc,word) count → per-doc rollup; one shuffle + map-side
    combine)."""
    from ..operators.text import with_repetition_stats

    return with_repetition_stats(T(spark, sf_dir, "documents"))


@register(
    "q_quality_filter",
    oracle=rf"""
WITH t AS (
  SELECT doc_id,
         length(text) AS nc,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?''"()-]', '', 'g')) AS n_punct,
         string_split_regex(trim(text), '\s+') AS tk
  FROM documents
), f AS (
  SELECT doc_id,
         len(tk) AS n_tokens,
         CAST(n_alpha AS DOUBLE) / nc AS alpha_ratio,
         CAST(n_punct AS DOUBLE) / nc AS punct_ratio,
         CAST(len(list_filter(tk, x -> list_contains({_EN}, x))) AS DOUBLE) / len(tk) AS stopword_ratio
  FROM t
)
SELECT doc_id,
       n_tokens >= 5 AND n_tokens <= 100000 AS len_ok,
       stopword_ratio >= 0.05 AS stopword_ok,
       alpha_ratio >= 0.5 AS alpha_ok,
       punct_ratio <= 0.2 AS punct_ok,
       (n_tokens >= 5 AND n_tokens <= 100000) AND stopword_ratio >= 0.05
         AND alpha_ratio >= 0.5 AND punct_ratio <= 0.2 AS passes
FROM f
""",
)
def q_quality_filter(spark, sf_dir):
    """Gopher-style composite quality filter with per-rule audit flags."""
    from ..operators.text import quality_filter

    return quality_filter(
        T(spark, sf_dir, "documents"), min_stopword_ratio=0.05
    ).select(
        "doc_id", "len_ok", "stopword_ok", "alpha_ok", "punct_ok", "passes"
    )


@register(
    "q_scd2_customer_merge",
    oracle="""
WITH cur AS (
  SELECT c_custkey, c_name, c_acctbal, '2024-01-01' AS eff_date,
         TRUE AS _from_current
  FROM customer
), chg AS (
  SELECT c_custkey,
         'renamed ' || c_custkey AS c_name,
         c_acctbal + 10.0 AS c_acctbal,
         '2024-06-15' AS eff_date,
         FALSE AS _from_current
  FROM customer WHERE c_custkey % 3 = 0
), uni AS (
  SELECT c_custkey, c_name, c_acctbal, eff_date, _from_current FROM cur
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal, eff_date, _from_current FROM chg
), v AS (
  SELECT *,
         lead(eff_date) OVER (
           PARTITION BY c_custkey
           ORDER BY eff_date ASC, _from_current DESC) AS nxt
  FROM uni
)
SELECT c_custkey, c_name,
       CAST(c_acctbal AS DOUBLE) AS c_acctbal,
       eff_date,
       COALESCE(nxt, '9999-12-31') AS valid_to,
       nxt IS NULL AS is_current
FROM v
""",
)
def q_scd2_customer_merge(spark, sf_dir):
    """SCD type-2 merge (operators/scd.py): customer as the current
    dimension slice, a deterministic change batch (every 3rd key is renamed and
    gains 10.0 balance), full validity-interval history out. The oracle
    replays the same union/lead plan in ANSI SQL — note it skips the
    attribute-hash no-op screen because every generated change IS a real
    change (screen behavior is unit-tested separately, incl. replay
    idempotence)."""
    from pyspark.sql import functions as F

    from ..operators.scd import scd2_merge

    c = T(spark, sf_dir, "customer")
    current = c.select(
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        F.lit("2024-01-01").alias("eff_date"),
    )
    changes = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat(F.lit("renamed "), F.col("c_custkey").cast("string")).alias("c_name"),
        (F.col("c_acctbal").cast("double") + 10.0).alias("c_acctbal"),
        F.lit("2024-06-15").alias("eff_date"),
    )
    return scd2_merge(current, changes, "c_custkey", ["c_name", "c_acctbal"])


@register(
    "q_sequence_packing",
    oracle=r"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_before
  FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(COALESCE(cum_before, 0) // 2048 AS BIGINT) AS pack_id,
       CAST(COALESCE(cum_before, 0) % 2048 AS BIGINT) AS pack_offset
FROM c
""",
)
def q_sequence_packing(spark, sf_dir):
    """Greedy sequential sample packing (the concat-and-split training-data
    shape): docs are concatenated per source stream in doc_id order and cut
    into 2048-token packs; each doc gets (pack_id, pack_offset) from a
    running token total. One window per source stream — streams parallelize
    across the cluster; at 100 TB you key the stream by (source, shard) so
    no single window serializes, which changes nothing downstream because
    pack ids only need to be unique per stream."""
    from pyspark.sql import Window

    from ..operators.text import tokens_col

    BUDGET = 2048
    d = T(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens_col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(cum_before / BUDGET).alias("pack_id"),
        (cum_before % BUDGET).alias("pack_offset"),
    )


@register(
    "q_snapshot_diff",
    oracle="""
WITH a AS (
  SELECT c_custkey, c_name, c_acctbal FROM customer
), b AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0 THEN 'renamed ' || c_custkey ELSE c_name END AS c_name,
         c_acctbal
  FROM customer WHERE c_custkey % 7 <> 0
)
SELECT COALESCE(a.c_custkey, b.c_custkey) AS c_custkey,
       CASE
         WHEN a.c_custkey IS NULL THEN 'insert'
         WHEN b.c_custkey IS NULL THEN 'delete'
         ELSE 'update'
       END AS op,
       b.c_name AS new_name,
       a.c_name AS old_name
FROM a FULL OUTER JOIN b ON a.c_custkey = b.c_custkey
WHERE a.c_custkey IS NULL OR b.c_custkey IS NULL
   OR a.c_name <> b.c_name OR a.c_acctbal <> b.c_acctbal
""",
)
def q_snapshot_diff(spark, sf_dir):
    """Change-data-feed generation: diff two dimension snapshots into
    insert/update/delete ops (the inverse of the SCD2 sink — produces the
    change batches it consumes). One full-outer join hash-shuffled on the
    key, filtered to actual differences; the deterministic 'new' snapshot
    (every 5th renamed, every 7th dropped) lets DuckDB replay it exactly."""
    from pyspark.sql import functions as F

    c = T(spark, sf_dir, "customer")
    a = c.select("c_custkey", "c_name", "c_acctbal").alias("a")
    b = (
        c.filter(F.col("c_custkey") % 7 != 0)
        .select(
            "c_custkey",
            F.when(
                F.col("c_custkey") % 5 == 0,
                F.concat(F.lit("renamed "), F.col("c_custkey").cast("string")),
            )
            .otherwise(F.col("c_name"))
            .alias("c_name"),
            "c_acctbal",
        )
        .alias("b")
    )
    j = a.join(b, F.col("a.c_custkey") == F.col("b.c_custkey"), "full_outer")
    return j.filter(
        F.col("a.c_custkey").isNull()
        | F.col("b.c_custkey").isNull()
        | (F.col("a.c_name") != F.col("b.c_name"))
        | (F.col("a.c_acctbal") != F.col("b.c_acctbal"))
    ).select(
        F.coalesce(F.col("a.c_custkey"), F.col("b.c_custkey")).alias("c_custkey"),
        F.when(F.col("a.c_custkey").isNull(), "insert")
        .when(F.col("b.c_custkey").isNull(), "delete")
        .otherwise("update")
        .alias("op"),
        F.col("b.c_name").alias("new_name"),
        F.col("a.c_name").alias("old_name"),
    )


@register(
    "q_latest_event_per_user",
    oracle="""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(ts) AS last_ts,
       arg_max(event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S.%f') || '|' ||
               lpad(CAST(event_id AS VARCHAR), 12, '0')) AS last_type
FROM events
GROUP BY user_id
""",
)
def q_latest_event_per_user(spark, sf_dir):
    """Latest-record-per-key via max_by — ONE hash aggregate with map-side
    combine instead of the row_number-window idiom (which sort-shuffles the
    whole fact table). The ordering key is a sortable
    '<microsecond-ts>|<zero-padded event_id>' string so the winner is
    deterministic under timestamp ties AND identical in DuckDB (whose
    arg_max lacks struct ordering keys)."""
    from pyspark.sql import functions as F

    e = T(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_ts"),
        F.expr(
            "max_by(event_type, concat(date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS'), "
            "'|', lpad(CAST(event_id AS STRING), 12, '0')))"
        ).alias("last_type"),
    )


def _qgram_sql(col: str, q: int = 3) -> str:
    # identical tokenization to operators/fuzzy.py::_qgram_expr, DuckDB syntax
    return (
        f"list_transform(range(1, greatest(length(' ' || lower({col}) || ' ') - {q - 1}, 1) + 1), "
        f"i -> substring(' ' || lower({col}) || ' ', i, {q}))"
    )


@register(
    "q_fuzzy_name_match",
    oracle=f"""
WITH l AS (
  SELECT c_custkey AS _lid, c_name AS _lval, UNNEST(list_distinct({_qgram_sql('c_name')})) AS gram
  FROM customer WHERE c_custkey < 200
), r AS (
  SELECT s_suppkey AS _rid, s_name AS _rval, UNNEST(list_distinct({_qgram_sql('s_name')})) AS gram
  FROM supplier
), pairs AS (
  SELECT _lid, _rid, _lval, _rval, COUNT(*) AS n_common
  FROM l JOIN r USING (gram)
  GROUP BY 1, 2, 3, 4
  HAVING COUNT(*) >= 8
)
SELECT _lid AS c_custkey, _rid AS s_suppkey,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(levenshtein(_lval, _rval) AS INTEGER) AS edit_distance
FROM pairs
""",
)
def q_fuzzy_name_match(spark, sf_dir):
    """Entity resolution: match customer names to supplier names via the
    q-gram inverted-index join (equi-join on grams — never a cross join)
    with common-gram lower-bound pruning, then Levenshtein only on the
    filtered candidates. TPC-H names share the 'Customer#'/'Supplier#'
    prefixes, so min_common=8 keeps the deliberately-similar pairs — the
    same machinery fuzzy-joins address/vendor tables at 100 TB with a
    stop-gram cap (operators/fuzzy.py::dropped_grams audits it)."""
    from pyspark.sql import functions as F

    from ..operators.fuzzy import qgram_match

    c = T(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    s = T(spark, sf_dir, "supplier")
    return qgram_match(
        c, s, "c_custkey", "s_suppkey", "c_name", "s_name", min_common=8
    )


@register(
    "q_pit_scd2_enrich",
    oracle="""
WITH cur AS (
  SELECT c_custkey, c_name, c_acctbal, '2023-01-01' AS eff_date,
         TRUE AS _from_current
  FROM customer
), chg AS (
  SELECT c_custkey,
         'renamed ' || c_custkey AS c_name,
         c_acctbal + 10.0 AS c_acctbal,
         '2024-01-15' AS eff_date,
         FALSE AS _from_current
  FROM customer WHERE c_custkey % 3 = 0
), uni AS (
  SELECT c_custkey, c_name, c_acctbal, eff_date, _from_current FROM cur
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal, eff_date, _from_current FROM chg
), v AS (
  SELECT *,
         lead(eff_date) OVER (
           PARTITION BY c_custkey
           ORDER BY eff_date ASC, _from_current DESC) AS nxt
  FROM uni
), dim AS (
  SELECT c_custkey, eff_date, COALESCE(nxt, '9999-12-31') AS valid_to FROM v
)
SELECT d.eff_date AS version_from,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(e.value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
FROM events e
JOIN dim d ON e.user_id = d.c_custkey
          AND strftime(e.ts, '%Y-%m-%d') >= d.eff_date
          AND strftime(e.ts, '%Y-%m-%d') < d.valid_to
GROUP BY d.eff_date
""",
)
def q_pit_scd2_enrich(spark, sf_dir):
    """Point-in-time-correct enrichment (the feature-store join): each event
    picks the SCD2 dimension version VALID AT ITS EVENT TIME —
    ``valid_from <= ts < valid_to`` — never the current one, which is what
    prevents feature leakage when backfilling training data from history.
    ISO date STRINGS compare lexicographically, so interval membership is a
    plain string comparison, identical in both engines.

    Scale shape: the versioned dimension is customer-sized (a few versions
    per key), so it broadcasts and the interval predicate rides the events
    scan — one scan, no event shuffle before the final aggregate. When the
    dimension itself is too big to broadcast, the same semantics fall back
    to the union + last-non-null window shape of q_asof_purchase_view;
    this query pins the broadcast-range-join variant."""
    from pyspark.sql import functions as F

    from ..operators.scd import scd2_merge

    c = T(spark, sf_dir, "customer")
    current = c.select(
        "c_custkey",
        "c_name",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
        F.lit("2023-01-01").alias("eff_date"),
    )
    changes = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.concat(F.lit("renamed "), F.col("c_custkey").cast("string")).alias("c_name"),
        (F.col("c_acctbal").cast("double") + 10.0).alias("c_acctbal"),
        F.lit("2024-01-15").alias("eff_date"),
    )
    dim = scd2_merge(current, changes, "c_custkey", ["c_name", "c_acctbal"]).select(
        "c_custkey", "eff_date", "valid_to"
    )
    e = T(spark, sf_dir, "events").select(
        "user_id", "value", F.date_format("ts", "yyyy-MM-dd").alias("ev_date")
    )
    return (
        e.join(
            F.broadcast(dim),
            (e["user_id"] == dim["c_custkey"])
            & (F.col("ev_date") >= dim["eff_date"])
            & (F.col("ev_date") < dim["valid_to"]),
        )
        .groupBy(F.col("eff_date").alias("version_from"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("total_value"),
        )
    )


@register(
    "q_entity_resolution",
    oracle="""
WITH RECURSIVE pairs AS (
  SELECT a.c_custkey AS d1, b.c_custkey AS d2
  FROM customer a JOIN customer b
    ON a.c_custkey < b.c_custkey
   AND substr(a.c_name, 1, length(a.c_name) - 1)
     = substr(b.c_name, 1, length(b.c_name) - 1)
   AND levenshtein(a.c_name, b.c_name) <= 1
),
e AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
walk(node, comp) AS (
  SELECT DISTINCT a, a FROM e
  UNION
  SELECT e.a, w.comp FROM e JOIN walk w ON e.b = w.node
),
cc AS (SELECT node, MIN(comp) AS component FROM walk GROUP BY node),
ent AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal,
         COALESCE(cc.component, c.c_custkey) AS entity_id
  FROM customer c LEFT JOIN cc ON c.c_custkey = cc.node
)
SELECT entity_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MAX(CASE WHEN c_custkey = entity_id THEN c_name END) AS canonical_name,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM ent GROUP BY entity_id
""",
)
def q_entity_resolution(spark, sf_dir):
    """Entity resolution end-to-end: blocking → exact verification →
    transitive closure → survivorship, composed from the engine's own
    operators.

    The match rule (the oracle's SPEC): names equal up to a substitution in
    the FINAL character (the typo/householding model) — blocking key = the
    name stem (all but the last char), a wildcard-blocking key. Each record
    emits one key; block size is alphabet-bounded (≤10 members here), so
    candidate pairs are O(k²_alphabet) per block no matter the corpus size,
    and Levenshtein verifies exactly. The oracle states the truth as an
    all-pairs predicate; the plan never goes quadratic. (Generalization:
    matching ANY single-position substitution = one wildcard key per
    position, still alphabet-bounded blocks — on this corpus that closure
    correctly chains everything into one giant entity, the classic
    transitive-closure hazard, so the demo pins the bounded rule.)
    Components resolve with the same alternating-star CC operator as
    near-dup clustering (min-id canonical); survivorship keeps the
    canonical record's name and aggregates member balances."""
    from ..operators.clusters import connected_components

    c = T(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    keys = c.select(
        "c_custkey",
        "c_name",
        F.expr("substring(c_name, 1, length(c_name) - 1)").alias("bkey"),
    )
    a, b = keys.alias("a"), keys.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("d1"),
            F.col("b.c_custkey").alias("d2"),
            F.col("a.c_name").alias("n1"),
            F.col("b.c_name").alias("n2"),
        )
        .distinct()
        .filter(F.levenshtein("n1", "n2") <= 1)
        .select("d1", "d2")
    )
    cc = connected_components(pairs, "d1", "d2")
    ent = c.join(cc, c["c_custkey"] == cc["node"], "left").select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        F.coalesce(F.col("component"), F.col("c_custkey")).alias("entity_id"),
    )
    return ent.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.max(
            F.when(F.col("c_custkey") == F.col("entity_id"), F.col("c_name"))
        ).alias("canonical_name"),
        F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double").alias("total_acctbal"),
    )


def q_compression_quality_detail(spark, sf_dir):
    """Raw per-doc zlib signal (doc_id, raw_bytes, compressed_bytes,
    ratio_fp6) — exact values cross-computed against Python's zlib in
    tests/test_round6_ops.py. The registered query wraps this in a
    hash-oracled audit."""
    from ..operators.text import compression_quality

    return compression_quality(spread(T(spark, sf_dir, "documents")))


@register(
    "q_compression_quality",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT) AS raw_bytes,
       CAST(1 AS BIGINT) AS compressed_bounded,
       CAST(1 AS BIGINT) AS ratio_consistent
FROM documents
""",
)
def q_compression_quality(spark, sf_dir):
    """zlib compression-ratio filter signal (the CCNet/Gopher-style
    repetitiveness screen), emitted as a hash-oracled per-doc audit (r08):
    no SQL engine exposes DEFLATE, but the UTF-8 byte length IS
    independently computable (DuckDB ``octet_length``) and pins that the
    UDF saw every byte of every doc; two Spark-side verdicts pin the zlib
    output against its spec — ``compressed_bounded`` (1 ≤ compressed ≤
    raw + raw/100 + 64, the DEFLATE stored-block worst case with slack)
    and ``ratio_consistent`` (the emitted fixed-point ratio re-derives
    exactly as compressed·10⁶ div max(raw,1)). Raw per-doc values:
    ``q_compression_quality_detail``, cross-computed against Python zlib
    in tests/test_round6_ops.py."""
    d = q_compression_quality_detail(spark, sf_dir)
    return d.select(
        "doc_id",
        "raw_bytes",
        F.when(
            (F.col("compressed_bytes") >= 1)
            & (
                F.col("compressed_bytes")
                <= F.col("raw_bytes") + F.expr("raw_bytes div 100") + 64
            ),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("compressed_bounded"),
        F.when(
            F.col("ratio_fp6")
            == F.expr("compressed_bytes * 1000000 div greatest(raw_bytes, 1)"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("ratio_consistent"),
    )


# ---------------------------------------------------------------------------
# Context-length economics: packing efficiency swept over context lengths.
# ---------------------------------------------------------------------------

PACK_SWEEP_LENGTHS = [512, 1024, 2048, 4096]

_PACK_SWEEP_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
),
l AS (SELECT unnest([{", ".join(str(x) for x in PACK_SWEEP_LENGTHS)}]) AS context_len),
g AS (
  SELECT source, context_len,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         CAST(SUM(CASE WHEN cum_before % context_len + n_tokens > context_len
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
  FROM c CROSS JOIN l
  GROUP BY source, context_len
)
SELECT source, CAST(context_len AS BIGINT) AS context_len, n_docs, total_tokens,
       CAST((total_tokens + context_len - 1) // context_len AS BIGINT) AS n_packs,
       n_split_docs,
       CAST(total_tokens * 1000000
            // (((total_tokens + context_len - 1) // context_len) * context_len)
            AS BIGINT) AS fill_ppm
FROM g
"""


@register("q_packing_efficiency_sweep", oracle=_PACK_SWEEP_ORACLE)
def q_packing_efficiency_sweep(spark, sf_dir):
    """CONTEXT-LENGTH ECONOMICS for concat-and-split packing: for each
    candidate context length {lens}, how many packs each source stream
    produces, how many documents get split across a pack boundary (the
    attention-contamination cost of concat-split), and the fill rate
    (wasted padding only in the final pack). The numbers a context-window /
    batch-shape decision is priced from — the packing twin of
    ``q_bpe_vocab_sweep``'s vocabulary curve.

    Scale shape: the per-source running token total is computed ONCE (same
    window as ``q_sequence_packing``; at 100 TB key streams by (source,
    shard)); all four context lengths are then pure projections over that
    one cumulative frame (an explode + one keyed aggregate) — the sweep
    costs one corpus scan regardless of how many lengths it prices. All
    integer arithmetic; boundary-crossing is exact: a doc splits iff
    (cum_before mod L) + n_tokens > L.
    """.format(lens=PACK_SWEEP_LENGTHS)
    from pyspark.sql import Window

    from ..operators.text import tokens_col

    d = T(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens_col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = d.select(
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before"),
    )
    lens = F.explode(
        F.array(*[F.lit(x).cast("bigint") for x in PACK_SWEEP_LENGTHS])
    ).alias("context_len")
    g = (
        c.select("source", "n_tokens", "cum_before", lens)
        .groupBy("source", "context_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum(
                F.when(
                    F.col("cum_before") % F.col("context_len") + F.col("n_tokens")
                    > F.col("context_len"),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_split_docs"),
        )
    )
    n_packs = F.expr("(total_tokens + context_len - 1) div context_len")
    return g.select(
        "source",
        "context_len",
        "n_docs",
        "total_tokens",
        n_packs.cast("bigint").alias("n_packs"),
        "n_split_docs",
        F.expr(
            "total_tokens * 1000000 div "
            "(((total_tokens + context_len - 1) div context_len) * context_len)"
        )
        .cast("bigint")
        .alias("fill_ppm"),
    )


# ---------------------------------------------------------------------------
# Smallest repeating token period — degenerate-generation / template detector.
# ---------------------------------------------------------------------------

_PERIOD_ORACLE = r"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk,
         len(string_split_regex(trim(text), '\s+')) AS n
  FROM documents
),
cand AS (
  SELECT doc_id, n, p
  FROM t, UNNEST(generate_series(1, n - 1)) AS u(p)
  WHERE tk[1:n-p] = tk[p+1:n]
),
mp AS (SELECT doc_id, MIN(p) AS mp FROM cand GROUP BY doc_id)
SELECT t.doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(COALESCE(mp, n) AS BIGINT) AS min_period,
       CAST((n - COALESCE(mp, n)) * 1000000 // n AS BIGINT) AS tail_cover_fp6
FROM t LEFT JOIN mp USING (doc_id)
"""


@register("q_repetition_period", oracle=_PERIOD_ORACLE)
def q_repetition_period(spark, sf_dir):
    """Smallest repeating TOKEN PERIOD per document — the degenerate-
    generation / template-loop detector: a sequence has period p iff it
    equals itself shifted by p (``tokens[1..n−p] == tokens[p+1..n]``, the
    string-periodicity definition; min period = n − longest border). A doc
    of 'buy now buy now buy now …' has min_period 2 and tail_cover → 1;
    aperiodic text has min_period = n and tail_cover 0. Complements
    ``q_repetition_stats`` (n-gram repeat mass): the period finds EXACT
    whole-stream loops n-gram ratios only hint at.

    Scale shape: doc-local — one scan, a (n−1)-way period explode with two
    aligned array slices compared per candidate (O(n²) tokens per doc;
    corpus docs here are ≤100 tokens — at 100 TB cap the check to the
    first ~256 tokens per doc, which bounds the explode and still catches
    loops, since a generation loop repeats from early on). No joins, no
    Python."""
    t = spread(T(spark, sf_dir, "documents")).select(
        "doc_id",
        F.split(F.trim("text"), r"\s+").alias("tk"),
    ).select("doc_id", "tk", F.size("tk").alias("n"))
    cand = (
        t.filter(F.col("n") >= 2)  # sequence(1, 0) runs DESCENDING in Spark
        .select(
            "doc_id",
            "n",
            "tk",
            F.explode(F.expr("sequence(1, n - 1)")).alias("p"),
        )
        .filter(F.expr("slice(tk, 1, n - p) = slice(tk, p + 1, n - p)"))
    )
    mp = cand.groupBy("doc_id").agg(F.min("p").alias("mp"))
    return (
        t.join(mp, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n").cast("bigint").alias("n_tokens"),
            F.coalesce("mp", F.col("n")).cast("bigint").alias("min_period"),
            F.expr("(n - coalesce(mp, n)) * 1000000 div n")
            .cast("bigint")
            .alias("tail_cover_fp6"),
        )
    )
