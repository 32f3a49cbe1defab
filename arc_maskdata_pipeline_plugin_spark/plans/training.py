"""Training-set preparation queries (oracle-checked): the pass between raw
corpus and tokenizer that a large-scale LLM data pipeline runs after dedup —
benchmark decontamination, data-driven domain rebalancing, percentile
quality gating, and deterministic shard assignment.

Scale shapes (the point of each query, beyond its answer):

* decontamination — the benchmark side (eval suites) is always tiny relative
  to the corpus, so its n-gram index BROADCASTS; the 100 TB train side never
  shuffles for the probe, and only matched pairs reach the one pair-count
  shuffle. Same index-probe shape as MinHash-LSH dedup, different index.
* rebalance / percentile gate — data-driven thresholds are computed by a
  tiny aggregate and re-joined as a broadcast (a scalar or a 20-row dim),
  so the corpus pass stays a pushed-down filter. No global sort, no window
  over everything.
* shard assignment — hash-mod sharding plus an in-shard position: exactly
  the ``repartition(shard).sortWithinPartitions`` write shape; the only
  shuffle is the one the shard write needs anyway.

All membership decisions are pure functions of ids via md5 (reproducible
across runs, engines, and repartitioning — no RNG state), and all threshold
comparisons are integer arithmetic, so every query hash-matches DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, persisted, register, spread

NGRAM = 8  # word n-gram width for decontamination
MIN_SHARED = 3  # contamination floor: pairs sharing fewer grams are noise
N_SHARDS = 8

# 32-bit hash of the doc id as an integer, identical in both engines
_HEX32_SQL = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"


def _hex32(col):
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")


@register(
    "q_decontaminate_ngrams",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents
),
g AS (
  SELECT DISTINCT doc_id, array_to_string(tk[s:s+{NGRAM - 1}], ' ') AS gram
  FROM t, UNNEST(generate_series(1, len(tk) - {NGRAM - 1})) AS u(s)
  WHERE len(tk) >= {NGRAM}
),
bench AS (SELECT doc_id, gram FROM g WHERE doc_id % 50 = 0),
train AS (SELECT doc_id, gram FROM g WHERE doc_id % 50 <> 0)
SELECT t.doc_id AS train_doc_id, b.doc_id AS bench_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM train t JOIN bench b USING (gram)
GROUP BY 1, 2
HAVING COUNT(*) >= {MIN_SHARED}
""",
)
def q_decontaminate_ngrams(spark, sf_dir):
    """Benchmark decontamination by exact word-{8}-gram overlap: find train
    documents sharing >= MIN_SHARED distinct n-grams with any benchmark
    document (docs with ``doc_id % 50 = 0`` stand in for the eval suite).

    The standard leakage screen before training (verbatim-span overlap, the
    n-gram variant of the suffix-array check). Scale shape: the benchmark
    n-gram index broadcasts (eval suites are MBs against a 100 TB corpus),
    the train side probes it without shuffling, and only collisions reach
    the pair-count aggregation."""
    # spread(): the testdata is single-row-group parquet — without a
    # round-robin repartition the whole gram explosion runs on one core
    d = spread(T(spark, sf_dir, "documents"))
    tk = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams = (
        d.filter(F.size(tk) >= NGRAM)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(tk) - F.lit(NGRAM - 1)),
                        lambda s: F.array_join(F.slice(tk, s, NGRAM), " "),
                    )
                )
            ).alias("gram"),
        )
    )
    bench = grams.filter(F.col("doc_id") % 50 == 0).withColumnRenamed(
        "doc_id", "bench_doc_id"
    )
    train = grams.filter(F.col("doc_id") % 50 != 0).withColumnRenamed(
        "doc_id", "train_doc_id"
    )
    return (
        train.join(F.broadcast(bench), "gram")
        .groupBy("train_doc_id", "bench_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= MIN_SHARED)
    )


@register(
    "q_decontaminate_spans",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk FROM documents
),
gpos AS (
  SELECT doc_id, s AS pos, array_to_string(tk[s:s+{NGRAM - 1}], ' ') AS gram
  FROM t, UNNEST(generate_series(1, len(tk) - {NGRAM - 1})) AS u(s)
  WHERE len(tk) >= {NGRAM}
),
bench AS (
  SELECT DISTINCT doc_id AS bench_doc_id, gram FROM gpos WHERE doc_id % 50 = 0
),
hits AS (
  SELECT g.doc_id AS train_doc_id, b.bench_doc_id, g.pos
  FROM gpos g JOIN bench b USING (gram)
  WHERE g.doc_id % 50 <> 0
),
qual AS (
  SELECT train_doc_id, bench_doc_id FROM hits
  GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_SHARED}
),
qhits AS (
  SELECT h.* FROM hits h JOIN qual q USING (train_doc_id, bench_doc_id)
),
isl AS (
  SELECT train_doc_id, bench_doc_id, pos,
         CASE WHEN pos - LAG(pos) OVER (
             PARTITION BY train_doc_id, bench_doc_id ORDER BY pos
         ) > {NGRAM} THEN 1 ELSE 0 END AS brk
  FROM qhits
),
grp AS (
  SELECT *, SUM(brk) OVER (PARTITION BY train_doc_id, bench_doc_id ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM isl
)
SELECT train_doc_id, bench_doc_id,
       CAST(MIN(pos) AS BIGINT) AS span_start,
       CAST(MAX(pos) + {NGRAM - 1} AS BIGINT) AS span_end,
       CAST(MAX(pos) + {NGRAM} - MIN(pos) AS BIGINT) AS span_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_windows
FROM grp GROUP BY train_doc_id, bench_doc_id, island
""",
)
def q_decontaminate_spans(spark, sf_dir):
    """Span-level contamination EVIDENCE (VERDICT r07 #5): extends
    ``q_decontaminate_ngrams``'s doc-level verdicts to the exact token
    spans that leak. For every (train doc, bench doc) pair with >=
    MIN_SHARED matched {NGRAM}-gram windows, overlapping/adjacent matched
    window positions (gap <= NGRAM) merge into MAXIMAL spans — the
    gaps-and-islands pattern — and each span reports its 1-based token
    range [span_start, span_end], width, and contributing window count.
    This is the artifact a curation team actually acts on (mask the span /
    drop the doc), not just a flag.

    Scale shape: identical probe to the doc-level screen — the benchmark
    gram index BROADCASTS, the corpus is never shuffled for the probe, and
    only matched positions (collision-sized, not corpus-sized) reach the
    pair-keyed island windows. Note the qualification counts matched
    POSITIONS, not distinct grams: a verbatim 10-token copy yields 3
    windows from 3 positions even when the grams repeat."""
    d = spread(T(spark, sf_dir, "documents"))
    tk = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    gpos = (
        d.filter(F.size(tk) >= NGRAM)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - F.lit(NGRAM - 1)),
                    lambda s: F.array_join(F.slice(tk, s, NGRAM), " "),
                )
            ).alias("pos0", "gram"),
        )
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    )
    bench = (
        gpos.filter(F.col("doc_id") % 50 == 0)
        .select(F.col("doc_id").alias("bench_doc_id"), "gram")
        .distinct()
    )
    hits = (
        gpos.filter(F.col("doc_id") % 50 != 0)
        .withColumnRenamed("doc_id", "train_doc_id")
        .join(F.broadcast(bench), "gram")
        .select("train_doc_id", "bench_doc_id", "pos")
    )
    pair_w = Window.partitionBy("train_doc_id", "bench_doc_id")
    qhits = (
        hits.withColumn("n_hits", F.count(F.lit(1)).over(pair_w))
        .filter(F.col("n_hits") >= MIN_SHARED)
        .drop("n_hits")
    )
    ordered = pair_w.orderBy("pos")
    isl = qhits.withColumn(
        "brk",
        F.when(F.col("pos") - F.lag("pos").over(ordered) > NGRAM, 1).otherwise(0),
    ).withColumn(
        "island",
        F.sum("brk").over(ordered.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        isl.groupBy("train_doc_id", "bench_doc_id", "island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + (NGRAM - 1)).cast("bigint").alias("span_end"),
            (F.max("pos") + NGRAM - F.min("pos")).cast("bigint").alias("span_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        )
        .drop("island")
    )


@register(
    "q_domain_mix_rebalance",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
per_src AS (SELECT source, SUM(n_tokens) AS src_tokens FROM tok GROUP BY source),
tgt AS (SELECT MIN(src_tokens) AS min_tokens FROM per_src)
SELECT t.doc_id, t.source, t.n_tokens
FROM tok t JOIN per_src p USING (source), tgt
WHERE {_HEX32_SQL.replace('doc_id', 't.doc_id')} * p.src_tokens
      < 4294967296 * tgt.min_tokens
""",
)
def q_domain_mix_rebalance(spark, sf_dir):
    """Equalize the domain mix by token budget: downsample every source to
    (approximately) the smallest source's token count, deterministically —
    keep a doc iff ``hash32(doc_id) / 2^32 < min_tokens / src_tokens``,
    cross-multiplied so the comparison is pure integer arithmetic.

    The data-driven cousin of ``q_stratified_sample``: the per-source rates
    come from the data (one tiny aggregate, broadcast back), not from
    config. At 100 TB the plan is one map-side-combined aggregate over the
    corpus plus a broadcast-join filter — no shuffle of the corpus itself,
    and membership is reproducible across runs/engines/repartitioning."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    per_src = tok.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    tgt = per_src.agg(F.min("src_tokens").alias("min_tokens"))
    return (
        tok.join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(tgt))
        .filter(
            _hex32(F.col("doc_id")) * F.col("src_tokens")
            < F.lit(4294967296) * F.col("min_tokens")
        )
        .select("doc_id", "source", "n_tokens")
    )


@register(
    "q_quality_percentile_filter",
    oracle=r"""
WITH tok AS (
  SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
thr AS (SELECT quantile_cont(n_tokens, 0.25) AS p25_tokens FROM tok)
SELECT doc_id, n_tokens, p25_tokens FROM tok, thr WHERE n_tokens > p25_tokens
""",
)
def q_quality_percentile_filter(spark, sf_dir):
    """Percentile quality gate: drop the shortest quartile of documents,
    where the threshold is the exact 25th percentile of the token count —
    computed by one aggregate and broadcast back as a scalar, NOT a global
    ``percent_rank`` window (which would sort the whole corpus into a
    single partition). The interpolated percentile is over integer token
    counts, so both engines agree bit-for-bit."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    thr = tok.agg(F.expr("percentile(n_tokens, 0.25)").alias("p25_tokens"))
    return (
        tok.crossJoin(F.broadcast(thr))
        .filter(F.col("n_tokens") > F.col("p25_tokens"))
        .select("doc_id", "n_tokens", "p25_tokens")
    )


PASSAGE = 50  # non-overlapping passage width (tokens) for passage dedup


@register(
    "q_passage_dedup_stats",
    oracle=rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
),
c AS (
  SELECT doc_id, md5(array_to_string(list_slice(tk, s, s + {PASSAGE - 1}), ' ')) AS h
  FROM t, UNNEST(generate_series(1, greatest(len(tk), 1), {PASSAGE})) AS g(s)
),
n AS (SELECT h, COUNT(*) AS cnt FROM c GROUP BY h)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_passages,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_passages,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_ratio
FROM c JOIN n USING (h)
GROUP BY doc_id
""",
)
def q_passage_dedup_stats(spark, sf_dir):
    """Passage-level duplication screen (the C4/RefinedWeb-style pass below
    document granularity): split every document into NON-overlapping
    {50}-token passages, hash each, and report per document how many of its
    passages occur more than once in the corpus (boilerplate headers,
    templated spans, in-doc repetition). Downstream either drops high
    ``dup_ratio`` docs or cuts the duplicated passages.

    Scale shape: reuses the zero-shuffle chunker (``with_chunks`` with
    stride == width), then one count aggregate on the passage hash and one
    co-partitioned join back on the same key — the join and the aggregate
    share partitioning, so this is two key-shuffles of (hash, count) pairs,
    never a self-join of text."""
    from ..operators.text import with_chunks

    d = spread(T(spark, sf_dir, "documents"))
    c = with_chunks(d, chunk_size=PASSAGE, stride=PASSAGE).select(
        "doc_id", F.md5(F.col("chunk_text")).alias("h")
    )
    n = c.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    dup = F.when(F.col("cnt") > 1, 1).otherwise(0)
    return (
        c.join(n, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(dup).cast("bigint").alias("n_dup_passages"),
            (F.sum(dup).cast("double") / F.count(F.lit(1))).alias("dup_ratio"),
        )
    )


@register(
    "q_training_shards",
    oracle=f"""
WITH s AS (
  SELECT doc_id,
         {_HEX32_SQL} % {N_SHARDS} AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INTEGER) AS pos
FROM s
""",
)
def q_training_shards(spark, sf_dir):
    """Deterministic global shuffle + shard assignment for training readers:
    shard = hash32(doc_id) % {N_SHARDS}, position = rank of the full hash
    within the shard. Together they define a reproducible random order with
    no RNG state — a re-run, another engine, or a late shard lands every doc
    in the same (shard, pos).

    This IS the write path at 100 TB: ``repartition(shard)`` then
    ``sortWithinPartitions(hash)`` — the one shuffle here is the one the
    sharded write needs anyway; the in-shard window sort is partition-local.
    """
    d = T(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    s = d.select(
        "doc_id",
        (_hex32(F.col("doc_id")) % N_SHARDS).alias("shard"),
        h.alias("h"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return s.withColumn("pos", F.row_number().over(w)).select("doc_id", "shard", "pos")


# Both engines share RE2-safe ASCII classes so the semantics are identical:
# Java regex and RE2 agree on these patterns (no lookaround, no unicode \s).
_CTRL = "[\\x00-\\x08\\x0b-\\x1f\\x7f]"  # C0 controls minus \t\n, plus DEL
_ZW = "[\\u200b\\u200c\\u200d\\ufeff]"  # zero-width space/joiners, BOM
_ZW_RE2 = "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]"  # DuckDB RE2 spelling


@register(
    "q_text_clean",
    oracle=rf"""
WITH c AS (
  SELECT doc_id,
         trim(regexp_replace(
             regexp_replace(regexp_replace(text, '{_ZW_RE2}', '', 'g'),
                            '{_CTRL}', ' ', 'g'),
             '[ \t\r\n]+', ' ', 'g')) AS clean_text
  FROM documents
)
SELECT c.doc_id, c.clean_text,
       CAST(c.clean_text <> d.text AS BOOLEAN) AS changed
FROM c JOIN documents d USING (doc_id)
""",
)
def q_text_clean(spark, sf_dir):
    """Unicode hygiene pass every web-scale corpus runs before tokenization:
    drop zero-width characters (ZWSP/ZWJ/ZWNJ/BOM), replace C0 control
    characters with spaces, collapse whitespace runs, and trim. All three
    rewrites are JVM-side ``regexp_replace`` — a pure projection with no
    shuffle, so at 100 TB this pass rides along with whatever scan feeds it.

    The character classes are ASCII/explicit-codepoint only, so Java regex
    (Spark) and RE2 (DuckDB) agree byte-for-byte."""
    d = T(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.regexp_replace(F.col("text"), _ZW, ""), _CTRL, " "),
            "[ \t\r\n]+",
            " ",
        )
    )
    return d.select(
        "doc_id",
        clean.alias("clean_text"),
        (clean != F.col("text")).alias("changed"),
    )


# Length-bucketed batching: pad-to-bucket widths and the token budget per batch
_BUCKETS = [64, 128, 256, 512, 1024, 2048]
_BATCH_TOKENS = 16384  # per-batch token budget (bucket_width × docs_per_batch)


def _bucket_case_sql(col: str) -> str:
    parts = [f"WHEN {col} <= {b} THEN {b}" for b in _BUCKETS]
    return "CASE " + " ".join(parts) + f" ELSE {2 * _BUCKETS[-1]} END"


@register(
    "q_length_bucket_batches",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (SELECT doc_id, n_tokens, {_bucket_case_sql('n_tokens')} AS bucket FROM tok)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(CEIL(CAST(COUNT(*) AS DOUBLE)
                 / greatest({_BATCH_TOKENS} // bucket, 1)) AS BIGINT) AS n_batches,
       CAST(SUM(bucket - n_tokens) AS DOUBLE)
         / (COUNT(*) * bucket) AS padding_waste
FROM b
GROUP BY bucket
""",
)
def q_length_bucket_batches(spark, sf_dir):
    """Length-bucketed batch planning (the padding-efficiency pass): assign
    every document to a power-of-two token bucket, then report per bucket how
    many fixed-token-budget batches it fills and the padding fraction wasted
    by rounding docs up to the bucket width. Trainers use exactly this to
    pick bucket boundaries that keep padding waste low.

    Scale shape: one map-side-combined aggregate over the corpus keyed by a
    handful of buckets — no window over everything, no global sort; the
    batch count is arithmetic on the aggregate, not a second pass."""
    d = T(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    bucket = F.lit(2 * _BUCKETS[-1])
    for b in reversed(_BUCKETS):
        bucket = F.when(n_tokens <= b, F.lit(b)).otherwise(bucket)
    tok = d.select("doc_id", n_tokens.alias("n_tokens"), bucket.alias("bucket"))
    docs_per_batch = F.greatest(
        (F.lit(_BATCH_TOKENS) / F.col("bucket")).cast("bigint"), F.lit(1)
    )
    return (
        tok.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "n_docs",
            "sum_tokens",
            F.ceil(F.col("n_docs").cast("double") / docs_per_batch)
            .cast("bigint")
            .alias("n_batches"),
            (
                (F.col("n_docs") * F.col("bucket") - F.col("sum_tokens")).cast("double")
                / (F.col("n_docs") * F.col("bucket"))
            ).alias("padding_waste"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-based mix sampling (round 4)
# ---------------------------------------------------------------------------


@register(
    "q_temperature_mix",
    oracle=rf"""
WITH tok AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM documents
),
per_src AS (
  SELECT source, SUM(n_tokens) AS src_tokens,
         CAST(floor(sqrt(CAST(SUM(n_tokens) AS DOUBLE))) AS BIGINT) AS w
  FROM tok GROUP BY source
),
tot AS (SELECT SUM(src_tokens) AS all_tokens, SUM(w) AS sum_w FROM per_src),
tgt AS (
  SELECT p.source, p.src_tokens,
         CAST((t.all_tokens // 2) * p.w // t.sum_w AS BIGINT) AS target_tokens
  FROM per_src p CROSS JOIN tot t
)
SELECT g.source,
       CAST(g.src_tokens AS BIGINT) AS src_tokens,
       g.target_tokens,
       CAST(COUNT(CASE WHEN {_HEX32_SQL.replace('doc_id', 't.doc_id')} * g.src_tokens
                        < 4294967296 * g.target_tokens THEN 1 END) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN {_HEX32_SQL.replace('doc_id', 't.doc_id')} * g.src_tokens
                        < 4294967296 * g.target_tokens THEN t.n_tokens END), 0) AS BIGINT)
         AS kept_tokens
FROM tok t JOIN tgt g USING (source)
GROUP BY g.source, g.src_tokens, g.target_tokens
""",
)
def q_temperature_mix(spark, sf_dir):
    """Temperature-flattened domain mix (the multilingual/multi-source
    sampling rule, tau = 0.5): per-source token budgets proportional to
    sqrt(source size) instead of size, so small sources are boosted without
    letting any source dominate. Weights use the INTEGER floor(sqrt(...)) so
    every downstream quantity (budget split, keep rates, membership) is pure
    integer arithmetic — a 5-double sum would already be order-dependent and
    engine-divergent. Membership is the cross-multiplied md5-threshold test
    (reproducible across runs, engines, repartitioning); the corpus itself
    never shuffles — one token aggregate, a 5-row target table broadcast
    back, and a map-side-combined per-source summary."""
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    per_src = tok.groupBy("source").agg(
        F.sum("n_tokens").alias("src_tokens"),
        F.floor(F.sqrt(F.sum("n_tokens").cast("double"))).cast("bigint").alias("w"),
    )
    tot = per_src.agg(
        F.sum("src_tokens").alias("all_tokens"), F.sum("w").alias("sum_w")
    )
    tgt = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "src_tokens",
        F.expr("(all_tokens div 2) * w div sum_w").cast("bigint").alias("target_tokens"),
    )
    kept = _hex32(F.col("doc_id")) * F.col("src_tokens") < F.lit(4294967296) * F.col(
        "target_tokens"
    )
    return (
        tok.join(F.broadcast(tgt), "source")
        .groupBy("source", "src_tokens", "target_tokens")
        .agg(
            F.count(F.when(kept, 1)).cast("bigint").alias("n_kept"),
            F.coalesce(F.sum(F.when(kept, F.col("n_tokens"))), F.lit(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .select("source", "src_tokens", "target_tokens", "n_kept", "kept_tokens")
    )


# ---------------------------------------------------------------------------
# Capstone: the full corpus-preparation pipeline in ONE lineage (round 4)
# ---------------------------------------------------------------------------

_E2E_MIN_TOKENS = 30
_E2E_SHARDS = 16


@register(
    "q_corpus_prepare_e2e",
    oracle=rf"""
WITH clean AS (
  SELECT doc_id, source,
         trim(regexp_replace(
             regexp_replace(regexp_replace(text, '{_ZW_RE2}', '', 'g'),
                            '{_CTRL}', ' ', 'g'),
             '[ \t\r\n]+', ' ', 'g')) AS clean_text
  FROM documents
),
tok AS (
  SELECT doc_id, source, clean_text,
         CAST(len(string_split_regex(clean_text, '\s+')) AS BIGINT) AS n_tokens
  FROM clean
),
quality AS (
  SELECT * FROM tok WHERE n_tokens >= {_E2E_MIN_TOKENS}
),
dedup AS (
  SELECT doc_id, source, n_tokens FROM quality q
  WHERE doc_id = (SELECT MIN(doc_id) FROM quality q2
                  WHERE md5(q2.clean_text) = md5(q.clean_text))
),
per_src AS (
  SELECT source, SUM(n_tokens) AS src_tokens,
         CAST(floor(sqrt(CAST(SUM(n_tokens) AS DOUBLE))) AS BIGINT) AS w
  FROM dedup GROUP BY source
),
tot AS (SELECT SUM(src_tokens) AS all_tokens, SUM(w) AS sum_w FROM per_src),
tgt AS (
  SELECT p.source, p.src_tokens,
         CAST((t.all_tokens // 2) * p.w // t.sum_w AS BIGINT) AS target_tokens
  FROM per_src p CROSS JOIN tot t
)
SELECT d.doc_id, d.source, d.n_tokens,
       CAST({_HEX32_SQL.replace('doc_id', 'd.doc_id')} % {_E2E_SHARDS} AS BIGINT) AS shard
FROM dedup d JOIN tgt g USING (source)
WHERE {_HEX32_SQL.replace('doc_id', 'd.doc_id')} * g.src_tokens
      < 4294967296 * g.target_tokens
""",
)
def q_corpus_prepare_e2e(spark, sf_dir):
    """The capstone composition: the training-corpus preparation pipeline as
    ONE DataFrame lineage — Unicode clean (projection), minimum-length
    quality gate (pushable filter), exact content dedup (min-doc_id winner
    per md5 of the CLEANED text, one key shuffle), temperature-flattened mix
    membership (tiny target table broadcast back), and shard assignment
    (projection; the write would add the one repartition shuffle). Every
    stage reuses the exact expression its standalone query is gate-checked
    with, and the composed oracle chains the same CTEs — so the gate
    asserts that the operators COMPOSE correctly, not just that each works
    alone. Corpus-sized shuffles in the whole pipeline: exactly one (the
    dedup key shuffle)."""
    from pyspark.sql import Window as W

    d = T(spark, sf_dir, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.regexp_replace(F.col("text"), _ZW, ""), _CTRL, " "),
            "[ \t\r\n]+",
            " ",
        )
    )
    tok = d.select(
        "doc_id",
        "source",
        clean.alias("clean_text"),
    ).select(
        "doc_id",
        "source",
        "clean_text",
        F.size(F.split(F.col("clean_text"), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    quality = tok.filter(F.col("n_tokens") >= _E2E_MIN_TOKENS)
    wmin = W.partitionBy(F.md5("clean_text"))
    dedup = (
        quality.withColumn("min_id", F.min("doc_id").over(wmin))
        .filter(F.col("doc_id") == F.col("min_id"))
        .select("doc_id", "source", "n_tokens")
    )
    per_src = dedup.groupBy("source").agg(
        F.sum("n_tokens").alias("src_tokens"),
        F.floor(F.sqrt(F.sum("n_tokens").cast("double"))).cast("bigint").alias("w"),
    )
    tot = per_src.agg(
        F.sum("src_tokens").alias("all_tokens"), F.sum("w").alias("sum_w")
    )
    tgt = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "src_tokens",
        F.expr("(all_tokens div 2) * w div sum_w").cast("bigint").alias("target_tokens"),
    )
    return (
        dedup.join(F.broadcast(tgt), "source")
        .filter(
            _hex32(F.col("doc_id")) * F.col("src_tokens")
            < F.lit(4294967296) * F.col("target_tokens")
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (_hex32(F.col("doc_id")) % _E2E_SHARDS).cast("bigint").alias("shard"),
        )
    )


@register(
    "q_exact_k_per_group",
    oracle=f"""
WITH ranked AS (
  SELECT event_id, event_type, user_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rk
  FROM events
)
SELECT event_id, event_type, user_id, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= 100
""",
)
def q_exact_k_per_group(spark, sf_dir):
    """Exactly-k-per-group sampling (eval-set construction: k docs per
    source, k events per type): rank within each group by the md5 of the
    row id — a deterministic, data-independent order, so membership is
    reproducible across runs, engines, and repartitionings AND exactly k
    (hash-threshold sampling is reproducible but only approximately sized).
    One window shuffle on the group key; the per-partition TopK optimization
    keeps state at k rows per group per task rather than sorting whole
    partitions."""
    from pyspark.sql import Window as W

    e = T(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), F.col("event_id")
    )
    return (
        e.select("event_id", "event_type", "user_id")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 100)
    )


_WS_K = 100  # weighted-sample size


@register(
    "q_weighted_sample",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         -ln((CAST(('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 12))
                   AS BIGINT) + 1) / 281474976710657.0) / n_chars AS k
  FROM documents
)
SELECT doc_id, n_chars,
       CAST(ROW_NUMBER() OVER (ORDER BY k, doc_id) AS INTEGER) AS rank
FROM keyed
QUALIFY rank <= {_WS_K}
""",
)
def q_weighted_sample(spark, sf_dir):
    """Weighted sampling WITHOUT replacement, k=100, weight = n_chars —
    Efraimidis-Spirakis A-ES (IPL 2006): each item draws u in (0,1] and the
    k items with the smallest -ln(u)/w win; inclusion probability is
    proportional to weight, and the draw distributes as a single pass with a
    per-partition top-k (Spark's row_number + filter pushes TopK into each
    partition before the single final merge — never a global sort of the
    corpus).

    Determinism: u derives from md5(doc_id) (seeded, reproducible, and
    engine-identical); the exponential key is one ln + one division on
    identical doubles, so ordering matches DuckDB bit-for-bit."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 12),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(281474976710657.0)  # 2^48 + 1 -> u in (0, 1]
    keyed = docs.withColumn("k", -F.log(u) / F.col("n_chars"))
    w = Window.orderBy("k", "doc_id")
    # filter on the RAW row_number (cast only afterwards): the optimizer
    # rewrites the rank filter to GlobalLimit/LocalLimit over the sort,
    # which executes as TakeOrderedAndProject — a per-partition top-k heap
    # with a k-sized merge; the residual Window then runs over 100 rows,
    # never the corpus (frozen in tests/test_plan_invariants.py).
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _WS_K)
        .select("doc_id", "n_chars", F.col("rank").cast("int").alias("rank"))
    )


@register(
    "q_quantile_normalize",
    oracle="""
WITH ranked AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n_s
  FROM documents
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_g FROM documents),
dv AS (
  SELECT n_chars AS val, CAST(COUNT(*) AS BIGINT) AS cnt FROM documents GROUP BY 1
),
cum AS (
  SELECT val, cnt,
         SUM(cnt) OVER (ORDER BY val
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM dv
),
pos AS (
  SELECT r.doc_id, r.source, r.n_chars,
         CASE WHEN r.n_s = 1
              THEN CAST(floor((n.n_g - 1) / 2.0) AS BIGINT) + 1
              ELSE CAST(floor((r.rk - 1) * (n.n_g - 1) / (r.n_s - 1))
                        AS BIGINT) + 1 END AS p
  FROM ranked r CROSS JOIN n
)
SELECT pos.doc_id, pos.source, pos.n_chars,
       CAST(cum.val AS BIGINT) AS norm_chars
FROM pos JOIN cum ON pos.p > cum.c - cum.cnt AND pos.p <= cum.c
""",
)
def q_quantile_normalize(spark, sf_dir):
    """Quantile normalization across sources (the microarray-normalization
    classic, Bolstad et al. 2003, applied to corpus quality scores): each
    doc's metric is replaced by the GLOBAL value at the same within-source
    rank quantile, so every source ends up with an identical score
    distribution — the calibration step before cross-source quality
    thresholds are comparable.

    Scale shape: NO global sort of the corpus. Within-source ranks are one
    co-partitioned window; the global empirical CDF lives on the
    distinct-VALUE frame (cumulative counts), which for integer-ish metrics
    is orders of magnitude smaller than the corpus and broadcasts; each doc
    range-probes it for the single value whose cumulative interval covers
    its target position. Everything is exact integer arithmetic
    (floor((rk-1)(N-1)/(n_s-1)) in bigints) — engine-stable with no doubles
    anywhere. At 100 TB (near-unique values) the distinct-value CDF stage
    swaps for sketched reference quantiles through the shared
    ``operators/quantiles.quantile_thresholds(mode="approx")`` seam — the
    trade q_winsorize_prices_approx demonstrates and tests bound."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    ws = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    ranked = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(ws).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("n_s"),
    )
    dv = docs.groupBy(F.col("n_chars").alias("val")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    ).transform(persisted)  # value-frame: feeds both the CDF and the global total
    n_g = dv.agg(F.sum("cnt").cast("bigint").alias("n_g"))
    # two-phase CDF: the distinct-value frame grows with the corpus, so the
    # cumulative counts run as bucketed windows, never one reducer
    from .twophase import global_cumsums

    cum = global_cumsums(dv, ["val"], {"c": ("cnt", "incl")}).select(
        "val", "cnt", "c"
    )
    pos = ranked.crossJoin(F.broadcast(n_g)).select(
        "doc_id",
        "source",
        "n_chars",
        # single-doc sources (n_s = 1) map to the global MEDIAN position —
        # the 0/0 rank ratio would otherwise go NaN and silently DROP the
        # doc at the join (pinned in tests)
        F.when(
            F.col("n_s") == 1,
            F.floor((F.col("n_g") - 1) / 2.0).cast("bigint") + 1,
        )
        .otherwise(
            F.floor(
                (F.col("rk") - 1) * (F.col("n_g") - 1) / (F.col("n_s") - 1)
            ).cast("bigint")
            + 1
        )
        .alias("p"),
    )
    return pos.join(
        F.broadcast(cum),
        (F.col("p") > F.col("c") - F.col("cnt")) & (F.col("p") <= F.col("c")),
    ).select(
        "doc_id",
        "source",
        "n_chars",
        F.col("val").cast("bigint").alias("norm_chars"),
    )


_NEYMAN_K = 500


@register(
    "q_neyman_sample",
    oracle=f"""
WITH cents AS (
  SELECT event_id, event_type,
         CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS c
  FROM events
),
moments AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS nh,
         CAST(SUM(CAST(c AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
         CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS s2
  FROM cents GROUP BY event_type
),
wt AS (
  SELECT event_type, nh,
         CAST(floor(sqrt(CAST(nh AS DOUBLE) * CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
              AS BIGINT) AS w
  FROM moments
),
alloc AS (
  SELECT event_type, nh, w,
         CAST(floor({_NEYMAN_K} * w * 1.0 / (SELECT SUM(w) FROM wt)) AS BIGINT)
           AS kh
  FROM wt
),
ranked AS (
  SELECT event_id, event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY md5('ns:' || CAST(event_id AS VARCHAR)),
                                          event_id) AS BIGINT) AS rk
  FROM cents
)
SELECT r.event_id, r.event_type, r.rk, a.kh
FROM ranked r JOIN alloc a ON r.event_type = a.event_type
WHERE r.rk <= a.kh
""",
)
def q_neyman_sample(spark, sf_dir):
    """Neyman-allocation stratified sampling (Neyman 1934): a fixed budget
    of _NEYMAN_K rows is split across strata proportional to N_h·sigma_h —
    the minimum-variance allocation for estimating the population mean —
    then drawn deterministically per stratum by md5 rank (reproducible AND
    exactly k_h, as in q_exact_k_per_group).

    Engine parity: N_h·sigma_h = sqrt(n·S2 − S1²) is ONE double sqrt of
    exact DECIMAL(38,0) moments, floored to an integer weight; the
    allocation floor(K·w_h/Σw) is integer arithmetic after that. Scale
    shape: one moments pass (map-side combined) + one per-stratum rank
    window co-partitioned on the stratum key; the allocation table is
    |strata|-sized and broadcasts onto the rank filter."""
    e = T(spark, sf_dir, "events").select("event_id", "event_type", "value")
    cents = e.select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(10,2)") * 100).cast("bigint").alias("c"),
    )
    moments = cents.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("nh"),
        F.sum(F.col("c").cast("decimal(38,0)")).cast("decimal(38,0)").alias("s1"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    wt = moments.select(
        "event_type",
        "nh",
        F.floor(
            F.sqrt(
                F.col("nh").cast("double") * F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double")
            )
        )
        .cast("bigint")
        .alias("w"),
    )
    total_w = wt.agg(F.sum("w").cast("bigint").alias("tw"))
    alloc = wt.crossJoin(F.broadcast(total_w)).select(
        "event_type",
        F.floor(F.lit(_NEYMAN_K) * F.col("w") * 1.0 / F.col("tw"))
        .cast("bigint")
        .alias("kh"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.md5(F.concat(F.lit("ns:"), F.col("event_id").cast("string"))),
        "event_id",
    )
    ranked = cents.select(
        "event_id",
        "event_type",
        F.row_number().over(wr).cast("bigint").alias("rk"),
    )
    return ranked.join(F.broadcast(alloc), "event_type").filter(
        F.col("rk") <= F.col("kh")
    ).select("event_id", "event_type", "rk", "kh")


_NEST_MAX_LEVEL = 6


@register(
    "q_nested_subsets",
    oracle=f"""
WITH u AS (
  SELECT doc_id,
         (CAST(('0x' || substr(md5('nest:' || CAST(doc_id AS VARCHAR)), 1, 12))
               AS BIGINT) + 1) / 281474976710657.0 AS u
  FROM documents
),
lv AS (
  SELECT doc_id,
         LEAST(CAST(floor(-ln(u) / ln(2)) AS BIGINT), {_NEST_MAX_LEVEL})
           AS level
  FROM u
)
SELECT level,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS min_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_id
FROM lv GROUP BY level
""",
)
def q_nested_subsets(spark, sf_dir):
    """Nested scaling-law subsets: each doc draws a deterministic md5
    uniform u and gets level = floor(-log2(u)) (capped) — "level ≥ k" is a
    ~2^-k sample AND the subsets are NESTED by construction
    (level ≥ k+1 ⊂ level ≥ k), which is what a scaling-law sweep needs:
    the 1% corpus is a strict subset of the 2% corpus, so loss differences
    between runs are attributable to size, not resampling noise. Pure
    projection + one 7-row aggregate; membership is reproducible from
    doc_id alone (no stored sample lists at 100 TB)."""
    docs = T(spark, sf_dir, "documents").select("doc_id")
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("nest:"), F.col("doc_id").cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(281474976710657.0)
    level = F.least(
        F.floor(-F.log(u) / F.log(F.lit(2.0))).cast("bigint"),
        F.lit(_NEST_MAX_LEVEL).cast("bigint"),
    )
    return docs.select("doc_id", level.alias("level")).groupBy("level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("min_id"),
        F.max("doc_id").cast("bigint").alias("max_id"),
    )
