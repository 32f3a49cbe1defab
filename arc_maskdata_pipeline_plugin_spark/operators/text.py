"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in Spark SQL expressions (JVM-side, whole-stage
codegen) — no Python UDFs: at 100 TB a per-row Python hop on `documents`
would dominate the job. Each op is a ``DataFrame → DataFrame`` transform.

Ops: tokenization stats, quality scoring (length/punct/stopword ratios),
language-scoring (stopword-list hits per language), document fingerprinting
(normalized md5 + hex-digit rolling fingerprint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small multilingual stopword lists (public, commonly-known function words).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "von"],
    "fr": ["le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"],
}


def tokens_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def with_token_stats(df: DataFrame, text: str = "text") -> DataFrame:
    """Token count + char stats. A BPE-ish proxy: word tokens plus a
    4-chars-per-token subword estimate (standard rule of thumb)."""
    tk = tokens_col(text)
    n_tokens = F.size(tk)
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "n_chars_actual": F.length(F.col(text)),
            "est_bpe_tokens": F.ceil(F.length(F.col(text)) / F.lit(4)).cast("int"),
            "avg_token_len": (
                F.length(F.regexp_replace(F.trim(F.col(text)), r"\s+", ""))
                .cast("double") / n_tokens
            ),
        }
    )


def _ratio(num: Column, den: Column) -> Column:
    return num.cast("double") / den.cast("double")


def with_quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Heuristic quality features + a composite score, all exact-arithmetic
    (integer counts, one final double division) so results are engine-stable."""
    c = F.col(text)
    n_chars = F.length(c)
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()-]", ""))
    n_space = F.length(F.regexp_replace(c, r"[^ ]", ""))
    tk = tokens_col(text)
    n_tokens = F.size(tk)
    n_stop = F.size(F.filter(tk, lambda t: t.isin(*STOPWORDS["en"])))
    return df.withColumns(
        {
            "n_tokens": n_tokens,
            "alpha_ratio": _ratio(n_alpha, n_chars),
            "punct_ratio": _ratio(n_punct, n_chars),
            "space_ratio": _ratio(n_space, n_chars),
            "stopword_ratio": _ratio(n_stop, n_tokens),
            "quality_score": (
                _ratio(n_alpha, n_chars)
                + F.least(_ratio(n_stop, n_tokens) * 2, F.lit(0.4))
                - _ratio(n_punct, n_chars)
            ),
        }
    )


def with_language_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Stopword-list language scoring: per language, the fraction of tokens in
    that language's stopword list; ``lang_pred`` = argmax (ties → 'und').
    N-gram-free heuristic chosen because it is expressible identically in the
    DuckDB oracle; swap in fastText/cld3 off-Spark when available."""
    tk = tokens_col(text)
    n_tokens = F.size(tk)
    out = df
    score_cols = []
    def _hits_in(words):
        return F.size(F.filter(tk, lambda t: F.lower(t).isin(*words)))

    for lang, words in STOPWORDS.items():
        col_name = f"score_{lang}"
        hits = _hits_in(words)
        out = out.withColumn(col_name, _ratio(hits, n_tokens))
        score_cols.append(col_name)
    best = F.greatest(*[F.col(c) for c in score_cols])
    pred = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return out.withColumn("lang_pred", F.when(best > 0, pred).otherwise(F.lit("und")))


def with_fingerprint(df: DataFrame, text: str = "text") -> DataFrame:
    """Deterministic document fingerprints:
    * ``fp_md5`` — md5 of whitespace-normalized lowercase text (exact-dup key);
    * ``fp_prefix64`` — first 16 hex chars as a BIGINT (cheap 64-bit handle
      for joins/sharding; hex→int is portable across engines)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text))), r"\s+", " ")
    fp = F.md5(norm)
    return df.withColumns(
        {
            "fp_md5": fp,
            "fp_prefix64": F.conv(F.substring(fp, 1, 15), 16, 10).cast("bigint"),
        }
    )


def with_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    chunk_size: int = 50,
    stride: int = 40,
) -> DataFrame:
    """Context-window chunking: one row per (doc, chunk) with
    ``chunk_size``-token windows every ``stride`` tokens (overlap =
    chunk_size - stride). Pure JVM array expressions — partition-local 1→N
    explode, zero shuffle; the training-prep step between cleaning and
    tokenization."""
    tokens = F.split(F.trim(F.col(text)), r"\s+")
    starts = F.sequence(F.lit(1), F.greatest(F.size(tokens), F.lit(1)), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            ((s - 1) / F.lit(stride)).cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(tokens, s, chunk_size)).alias("chunk_text"),
            F.size(F.slice(tokens, s, chunk_size)).cast("int").alias("n_tokens"),
        ),
    )
    return df.select(F.col(id_col), F.explode(chunks).alias("c")).select(
        id_col, "c.chunk_idx", "c.chunk_text", "c.n_tokens"
    )


# ---------------------------------------------------------------------------
# PII scrubbing, repetition detection, quality filtering (round 2) —
# standard training-data pipeline passes; all pure JVM expressions.
# ---------------------------------------------------------------------------

# Patterns deliberately restricted to syntax Java regex and RE2 (DuckDB)
# interpret identically: no backreferences, no lookaround.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"https?://[^\s]+", "<URL>"),                                # before email (@ in URLs)
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    (r"\+[0-9][0-9()\- ]{6,}[0-9]", "<PHONE>"),
]


def scrub_pii(df: DataFrame, text: str = "text", out_col: str = "scrubbed") -> DataFrame:
    """Redact emails/URLs/IPs/phones with typed placeholder tokens.

    A chained ``regexp_replace`` projection: zero shuffle, fully
    whole-stage-codegen, applied in pattern order (URL first so the email
    rule never fires inside a URL). At 100 TB this is a map-only pass that
    pipelines with any downstream filter."""
    c = F.col(text)
    for pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return df.withColumn(out_col, c)


def with_repetition_stats(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Per-document repetition features: distinct-word ratio and the share of
    the single most frequent word — the cheap screens for boilerplate/spam
    (a la Gopher's repetition rules).

    Shape: explode → two-level aggregate, ONE shuffle keyed on (doc, word)
    then a map-side-combinable per-doc rollup — no join back to the corpus,
    so it scales as a pure aggregation over total token count."""
    words = df.select(
        F.col(id_col), F.explode(tokens_col(text)).alias("w")
    )
    per_word = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("n"))
    return (
        per_word.groupBy(id_col)
        .agg(
            F.sum("n").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("n").alias("top_word_n"),
        )
        .select(
            id_col,
            "n_words",
            "n_distinct",
            _ratio(F.col("n_distinct"), F.col("n_words")).alias("distinct_ratio"),
            _ratio(F.col("top_word_n"), F.col("n_words")).alias("top_word_share"),
        )
    )


def quality_filter(
    df: DataFrame,
    text: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_stopword_ratio: float = 0.0,
    min_alpha_ratio: float = 0.5,
    max_punct_ratio: float = 0.2,
) -> DataFrame:
    """Gopher-style composite document filter: per-rule boolean flags plus the
    conjunction, built on ``with_quality_score``'s exact-arithmetic features.
    Emits flags rather than dropping rows so audits can count WHY documents
    fail — drop with ``.filter("passes")`` when materializing."""
    scored = with_quality_score(df, text)
    flags = {
        "len_ok": (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens),
        "stopword_ok": F.col("stopword_ratio") >= min_stopword_ratio,
        "alpha_ok": F.col("alpha_ratio") >= min_alpha_ratio,
        "punct_ok": F.col("punct_ratio") <= max_punct_ratio,
    }
    out = scored.withColumns(flags)
    passes = F.lit(True)
    for name in flags:
        passes = passes & F.col(name)
    return out.withColumn("passes", passes)


def compression_quality(
    df,
    id_col: str = "doc_id",
    text: str = "text",
    level: int = 6,
):
    """zlib compression-ratio quality signal (the CCNet/Gopher-style
    repetitiveness filter: highly compressible text is templated or
    self-repeating; near-incompressible text is noise/binary-ish — both
    tails get filtered before LLM training). Arrow-batched ``mapInPandas``
    over the stdlib zlib — deterministic for a fixed level and zlib build
    (pytest cross-computes the exact values); no SQL engine exposes
    DEFLATE, so the registered query is rows-only by design, like the KDF
    masking path.

    Scale: partition-local map (zero shuffle), ~50 MB/s/core for zlib-6 —
    at 100 TB this runs as a one-pass projection next to the other text
    scores and is CPU-bound, not shuffle-bound."""
    import zlib

    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("raw_bytes", LongType()),
            StructField("compressed_bytes", LongType()),
            StructField("ratio_fp6", LongType()),
        ]
    )

    def batches(it):
        for pdf in it:
            ids, raw, comp, ratio = [], [], [], []
            for doc_id, t in zip(pdf[id_col], pdf[text]):
                b = (t or "").encode("utf-8")
                c = len(zlib.compress(b, level))
                ids.append(doc_id)
                raw.append(len(b))
                comp.append(c)
                ratio.append(c * 1_000_000 // max(len(b), 1))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "raw_bytes": pd.Series(raw, dtype="int64"),
                    "compressed_bytes": pd.Series(comp, dtype="int64"),
                    "ratio_fp6": pd.Series(ratio, dtype="int64"),
                }
            )

    return df.select(id_col, text).mapInPandas(batches, schema)
