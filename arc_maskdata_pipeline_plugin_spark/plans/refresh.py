"""Incremental corpus-refresh capstone: new crawl → dedup → decontaminate →
quality gate → reshard, as ONE auditable funnel.

This is the query a training-data platform runs every ingest cycle: a new
crawl batch (here: ``doc_id % 5 = 0`` stands in for today's crawl; the rest
of the corpus is the existing base) flows through the standing gates in
order, each document is attributed to the FIRST gate that rejects it, and
the per-source funnel is the artifact a data-quality dashboard renders:

1. **exact dup** — content hash already in the base corpus store;
2. **near dup** — any MinHash LSH band key collides with the base band
   store (the persisted-store incremental shape of ``dedup_incremental``:
   per-cycle cost ∝ batch, the base is never re-shingled);
3. **contaminated** — shares >= 2 distinct 8-grams with a benchmark doc
   (benchmark = base docs with ``doc_id % 50 = 1``, the eval-suite
   stand-in; the benchmark gram index broadcasts);
4. **low quality** — fewer than 8 tokens;
5. **accepted** — assigned a consistent-hash shard (md5 first-8-hex mod 8).

Scale shape: the batch is scanned once per representation (hash, shingles,
grams — all projections of one batch scan); every probe is a semi-join
against a store that is either persisted-incremental (bands, hashes) or
broadcast-tiny (benchmark grams); the funnel attribution is pure
expressions over the flag columns; ONE source-keyed aggregate ends it. The
base-side stores are rebuilt here because the testdata has no cross-round
persistence — in production they are standing tables updated per cycle
(exactly the ``incremental_dedup_new_docs`` contract).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import minhash_signatures, signature_bands, word_shingles
from .dedup import BAND_SIZE, NUM_HASHES, _SHINGLES_CTE
from .registry import T, register, spread

_GRAM_N = 8
_MIN_SHARED = 2
_N_SHARDS = 8
_MIN_TOKENS = 8


def _refresh_oracle() -> str:
    mins = ", ".join(
        f"MIN(md5('{i}:' || shingle)) AS h{i}" for i in range(NUM_HASHES)
    )
    n_bands = NUM_HASHES // BAND_SIZE
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
            b=b,
            key=" || ".join(f"h{b * BAND_SIZE + j}" for j in range(BAND_SIZE)),
        )
        for b in range(n_bands)
    )
    return rf"""
WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({band_rows}),
base_hash AS (
  SELECT DISTINCT md5(trim(text)) AS h FROM documents WHERE doc_id % 5 <> 0
),
t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(tk[s:s+{_GRAM_N - 1}], ' ') AS gram
  FROM t, UNNEST(generate_series(1, len(tk) - {_GRAM_N - 1})) AS u(s)
  WHERE len(tk) >= {_GRAM_N}
),
bench_grams AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 1 AND doc_id % 5 <> 0
),
contaminated AS (
  SELECT g.doc_id FROM grams g JOIN bench_grams b USING (gram)
  WHERE g.doc_id % 5 = 0
  GROUP BY g.doc_id HAVING COUNT(*) >= {_MIN_SHARED}
),
flags AS (
  SELECT d.doc_id, d.source,
         CASE WHEN md5(trim(d.text)) IN (SELECT h FROM base_hash)
              THEN 1 ELSE 0 END AS f_exact,
         CASE WHEN EXISTS (
             SELECT 1 FROM bands nb
             JOIN bands cb ON nb.band = cb.band AND nb.key = cb.key
                          AND cb.doc_id % 5 <> 0
             WHERE nb.doc_id = d.doc_id)
              THEN 1 ELSE 0 END AS f_near,
         CASE WHEN d.doc_id IN (SELECT doc_id FROM contaminated)
              THEN 1 ELSE 0 END AS f_cont,
         CASE WHEN len(string_split_regex(trim(d.text), '\s+')) < {_MIN_TOKENS}
              THEN 1 ELSE 0 END AS f_lowq,
         CAST(('0x' || substr(md5('shard:' || CAST(d.doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {_N_SHARDS} AS shard
  FROM documents d WHERE d.doc_id % 5 = 0
),
funnel AS (
  SELECT source, shard,
         f_exact AS drop_exact,
         CASE WHEN f_exact = 0 AND f_near = 1 THEN 1 ELSE 0 END AS drop_near,
         CASE WHEN f_exact = 0 AND f_near = 0 AND f_cont = 1
              THEN 1 ELSE 0 END AS drop_cont,
         CASE WHEN f_exact = 0 AND f_near = 0 AND f_cont = 0 AND f_lowq = 1
              THEN 1 ELSE 0 END AS drop_lowq,
         CASE WHEN f_exact = 0 AND f_near = 0 AND f_cont = 0 AND f_lowq = 0
              THEN 1 ELSE 0 END AS accepted
  FROM flags
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_batch,
       CAST(SUM(drop_exact) AS BIGINT) AS n_exact_dup,
       CAST(SUM(drop_near) AS BIGINT) AS n_near_dup,
       CAST(SUM(drop_cont) AS BIGINT) AS n_contaminated,
       CAST(SUM(drop_lowq) AS BIGINT) AS n_low_quality,
       CAST(SUM(accepted) AS BIGINT) AS n_accepted,
       CAST(COUNT(DISTINCT CASE WHEN accepted = 1 THEN shard END) AS BIGINT)
         AS n_shards_used
FROM funnel
GROUP BY source
"""


@register("q_corpus_refresh_incremental", oracle=_refresh_oracle())
def q_corpus_refresh_incremental(spark, sf_dir):
    """Per-source ingest funnel for the incremental corpus refresh (module
    docstring): every batch doc is attributed to the first gate that drops
    it; accepted docs get consistent-hash shards, and the audit reports how
    many shards each source actually lands in."""
    docs = spread(T(spark, sf_dir, "documents"))
    is_batch = F.pmod(F.col("doc_id"), 5) == 0
    base = docs.filter(~is_batch)
    batch = docs.filter(is_batch)

    # gate 1: exact content-hash store (base-side, persisted-incremental
    # in production)
    base_hash = base.select(F.md5(F.trim("text")).alias("h")).distinct()
    exact_ids = (
        batch.select("doc_id", F.md5(F.trim("text")).alias("h"))
        .join(base_hash, "h", "left_semi")
        .select("doc_id")
        .withColumn("f_exact", F.lit(1))
    )

    # gate 2: MinHash LSH band store (the dedup_incremental shape)
    base_bands = signature_bands(
        minhash_signatures(word_shingles(base, distinct=False), num_hashes=NUM_HASHES),
        num_hashes=NUM_HASHES,
        band_size=BAND_SIZE,
    )
    batch_bands = signature_bands(
        minhash_signatures(word_shingles(batch, distinct=False), num_hashes=NUM_HASHES),
        num_hashes=NUM_HASHES,
        band_size=BAND_SIZE,
    )
    near_ids = (
        batch_bands.join(base_bands, ["band", "key"], "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("f_near", F.lit(1))
    )

    # gate 3: benchmark 8-gram decontamination (bench index broadcasts)
    tk = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams = docs.filter(F.size(tk) >= _GRAM_N).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - F.lit(_GRAM_N - 1)),
                    lambda s: F.array_join(F.slice(tk, s, _GRAM_N), " "),
                )
            )
        ).alias("gram"),
    )
    bench_grams = (
        grams.filter((F.col("doc_id") % 50 == 1) & (F.col("doc_id") % 5 != 0))
        .select("gram")
        .distinct()
    )
    cont_ids = (
        grams.filter(F.col("doc_id") % 5 == 0)
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _MIN_SHARED)
        .select("doc_id")
        .withColumn("f_cont", F.lit(1))
    )

    shard = (
        F.conv(F.substring(F.md5(F.concat(F.lit("shard:"), F.col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("bigint")
        % _N_SHARDS
    )
    flags = (
        batch.select(
            "doc_id",
            "source",
            F.when(F.size(F.split(F.trim("text"), r"\s+")) < _MIN_TOKENS, 1)
            .otherwise(0)
            .alias("f_lowq"),
            shard.alias("shard"),
        )
        .join(F.broadcast(exact_ids), "doc_id", "left")
        .join(F.broadcast(near_ids), "doc_id", "left")
        .join(F.broadcast(cont_ids), "doc_id", "left")
        .fillna(0, ["f_exact", "f_near", "f_cont"])
    )
    ok = (F.col("f_exact") == 0) & (F.col("f_near") == 0) & (F.col("f_cont") == 0)
    funnel = flags.select(
        "source",
        "shard",
        F.col("f_exact").alias("drop_exact"),
        F.when((F.col("f_exact") == 0) & (F.col("f_near") == 1), 1)
        .otherwise(0)
        .alias("drop_near"),
        F.when(
            (F.col("f_exact") == 0) & (F.col("f_near") == 0) & (F.col("f_cont") == 1),
            1,
        )
        .otherwise(0)
        .alias("drop_cont"),
        F.when(ok & (F.col("f_lowq") == 1), 1).otherwise(0).alias("drop_lowq"),
        F.when(ok & (F.col("f_lowq") == 0), 1).otherwise(0).alias("accepted"),
    )
    return funnel.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batch"),
        F.sum("drop_exact").cast("bigint").alias("n_exact_dup"),
        F.sum("drop_near").cast("bigint").alias("n_near_dup"),
        F.sum("drop_cont").cast("bigint").alias("n_contaminated"),
        F.sum("drop_lowq").cast("bigint").alias("n_low_quality"),
        F.sum("accepted").cast("bigint").alias("n_accepted"),
        F.countDistinct(F.when(F.col("accepted") == 1, F.col("shard")))
        .cast("bigint")
        .alias("n_shards_used"),
    )


# ---------------------------------------------------------------------------
# Corpus-release report: the round-8 detectors chained into one per-source
# release sheet (stitch flags -> eval/contamination drops -> soft-dedup
# effective mass -> context-2048 packing economics).
# ---------------------------------------------------------------------------

_RELEASE_CTX = 2048

_RELEASE_ORACLE = rf"""
WITH t AS (
  SELECT doc_id, source,
         string_split_regex(trim(lower(text)), '\s+') AS ltk,
         string_split_regex(trim(text), '\s+') AS rtk,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents
),
gpos AS (
  SELECT doc_id, array_to_string(ltk[s:s+7], ' ') AS gram
  FROM t, UNNEST(generate_series(1, len(ltk) - 7)) AS u(s)
  WHERE len(ltk) >= 8
),
bench AS (SELECT DISTINCT doc_id AS b, gram FROM gpos WHERE doc_id % 50 = 0),
contaminated AS (
  SELECT g.doc_id FROM gpos g JOIN bench ON g.gram = bench.gram
  WHERE g.doc_id % 50 <> 0
  GROUP BY g.doc_id, bench.b HAVING COUNT(*) >= 3
),
cont AS (SELECT DISTINCT doc_id FROM contaminated),
edges AS (
  SELECT doc_id,
         md5(array_to_string(rtk[1:8], ' ')) AS head_h,
         md5(array_to_string(rtk[len(rtk)-7:len(rtk)], ' ')) AS tail_h
  FROM t WHERE len(rtk) >= 8
),
stitched AS (
  SELECT DISTINCT doc_id FROM (
    SELECT a.doc_id FROM edges a JOIN edges b
      ON a.tail_h = b.head_h AND a.doc_id <> b.doc_id
    UNION ALL
    SELECT b.doc_id FROM edges a JOIN edges b
      ON a.tail_h = b.head_h AND a.doc_id <> b.doc_id
  )
),
flags AS (
  SELECT t.doc_id, t.source, len(t.rtk) AS n_tokens, t.fp,
         CASE WHEN t.doc_id % 50 = 0 THEN 1 ELSE 0 END AS is_eval,
         CASE WHEN cont.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_cont,
         CASE WHEN st.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_stitch
  FROM t LEFT JOIN cont ON t.doc_id = cont.doc_id
         LEFT JOIN stitched st ON t.doc_id = st.doc_id
),
clean AS (
  SELECT f.*, COUNT(*) OVER (PARTITION BY fp) AS csize
  FROM (SELECT * FROM flags WHERE is_eval = 0 AND is_cont = 0) f
)
SELECT f.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_raw,
       CAST(SUM(f.is_stitch) AS BIGINT) AS n_stitch_flagged,
       CAST(SUM(f.is_cont) AS BIGINT) AS n_contaminated,
       CAST(SUM(f.is_eval) AS BIGINT) AS n_eval_held_out,
       CAST(COALESCE(c.n_clean, 0) AS BIGINT) AS n_clean_docs,
       CAST(COALESCE(c.clean_tokens, 0) AS BIGINT) AS clean_tokens,
       CAST(COALESCE(c.eff_fp6, 0) AS BIGINT) AS effective_tokens_fp6,
       CAST(COALESCE((c.clean_tokens + {_RELEASE_CTX} - 1) // {_RELEASE_CTX}, 0)
            AS BIGINT) AS n_packs,
       CAST(COALESCE(c.clean_tokens * 1000000
            // (((c.clean_tokens + {_RELEASE_CTX} - 1) // {_RELEASE_CTX})
                * {_RELEASE_CTX}), 0) AS BIGINT) AS fill_ppm
FROM flags f
LEFT JOIN (
  SELECT source, COUNT(*) AS n_clean, SUM(n_tokens) AS clean_tokens,
         SUM(n_tokens * (1000000 // csize)) AS eff_fp6
  FROM clean GROUP BY source
) c ON f.source = c.source
GROUP BY f.source, c.n_clean, c.clean_tokens, c.eff_fp6
"""


@register("q_corpus_release_report", oracle=_RELEASE_ORACLE)
def q_corpus_release_report(spark, sf_dir):
    """CORPUS-RELEASE capstone: the round-8 detectors chained into the one
    per-source sheet a data-release review reads. Pipeline: (1) flag
    crawl-fragment stitches (``q_doc_stitch_pairs`` logic — merge
    candidates, flagged not dropped); (2) hold out the eval subset
    (doc_id % 50 = 0) and DROP train docs with span-level benchmark
    contamination (``q_decontaminate_spans`` qualification: ≥3 matched
    8-gram positions); (3) on the clean set, soft-dedup effective token
    mass (``q_dedup_soft_weights``: Σ tokens·⌊10⁶/c⌋ over exact-content
    clusters); (4) price the release at context {ctx} (pack count + fill,
    ``q_packing_efficiency_sweep`` arithmetic). The oracle recomposes every
    stage's SQL verbatim — the evidence-cluster composition precedent.

    Scale shape: each stage keeps its own documented shape (broadcast gram
    probe, slim hash edge join, fingerprint window); the capstone adds only
    per-source aggregates. Flag frames (contaminated/stitched ids) are
    near-dup-sized and BROADCAST back onto the corpus frame.""".format(
        ctx=_RELEASE_CTX
    )
    from .dedup import q_doc_stitch_pairs
    from .training import q_decontaminate_spans

    d = spread(T(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("fp"),
    )
    cont = (
        q_decontaminate_spans(spark, sf_dir)
        .select(F.col("train_doc_id").alias("doc_id"))
        .distinct()
        .withColumn("is_cont", F.lit(1))
    )
    stitch_pairs = q_doc_stitch_pairs(spark, sf_dir)
    stitched = (
        stitch_pairs.select(F.col("left_doc").alias("doc_id"))
        .unionAll(stitch_pairs.select(F.col("right_doc").alias("doc_id")))
        .distinct()
        .withColumn("is_stitch", F.lit(1))
    )
    flags = (
        d.join(F.broadcast(cont), "doc_id", "left")
        .join(F.broadcast(stitched), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "fp",
            F.when(F.col("doc_id") % 50 == 0, 1).otherwise(0).alias("is_eval"),
            F.coalesce("is_cont", F.lit(0)).alias("is_cont"),
            F.coalesce("is_stitch", F.lit(0)).alias("is_stitch"),
        )
    )
    from pyspark.sql import Window

    clean = flags.filter((F.col("is_eval") == 0) & (F.col("is_cont") == 0)).withColumn(
        "csize", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    )
    clean_agg = clean.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clean"),
        F.sum("n_tokens").cast("bigint").alias("clean_tokens"),
        F.sum(F.expr("n_tokens * (1000000 div csize)"))
        .cast("bigint")
        .alias("eff_fp6"),
    )
    raw_agg = flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_raw"),
        F.sum("is_stitch").cast("bigint").alias("n_stitch_flagged"),
        F.sum("is_cont").cast("bigint").alias("n_contaminated"),
        F.sum("is_eval").cast("bigint").alias("n_eval_held_out"),
    )
    j = raw_agg.join(F.broadcast(clean_agg), "source", "left")
    n_packs = F.expr(
        f"(clean_tokens + {_RELEASE_CTX - 1}) div {_RELEASE_CTX}"
    )
    fill = F.expr(
        f"clean_tokens * 1000000 div "
        f"(((clean_tokens + {_RELEASE_CTX - 1}) div {_RELEASE_CTX}) * {_RELEASE_CTX})"
    )
    return j.select(
        "source",
        "n_docs_raw",
        "n_stitch_flagged",
        "n_contaminated",
        "n_eval_held_out",
        F.coalesce("n_clean", F.lit(0)).cast("bigint").alias("n_clean_docs"),
        F.coalesce("clean_tokens", F.lit(0)).cast("bigint").alias("clean_tokens"),
        F.coalesce("eff_fp6", F.lit(0)).cast("bigint").alias("effective_tokens_fp6"),
        F.coalesce(n_packs, F.lit(0)).cast("bigint").alias("n_packs"),
        F.coalesce(fill, F.lit(0)).cast("bigint").alias("fill_ppm"),
    )
