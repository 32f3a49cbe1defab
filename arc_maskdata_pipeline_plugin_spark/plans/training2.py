"""Training-set assembly round 2: contrastive-batch leakage, token-budget
water-filling, negative-sampling tables, and padding-waste batching
economics (oracle-checked).

* **Batch leakage** — contrastive/in-batch-negative training assumes the
  other items in a batch are true negatives; a near-duplicate pair landing
  in the SAME batch poisons the loss (its "negative" is a positive). The
  audit joins the MinHash-LSH near-dup pair set against hash-bucketed
  batch assignments at three batch sizes in one pass and reports the
  leaked share per scenario — the number that decides whether you need
  cluster-aware batching.

* **Token-budget water-filling** — the classic mix allocator: given a
  total token budget T and per-source available token mass (the cap),
  give every source an equal share except where its cap binds, raising
  the common level until the budget is exhausted. The breakpoint has a
  CLOSED FORM over the cap-ascending source frame (cap_i·slots_i ≤
  avail_i is monotone — once a source can't saturate, no larger-cap
  source can), so the allocation is windows over the |sources|-row frame,
  never an iterative loop; integer remainder distribution makes
  Σalloc = min(T, Σcap) exact, witnessed in-plan.

Scale shape: leakage = detector pairs (post-LSH tiny) joined to two
hash-bucket columns — corpus touched only by the detector; water-fill =
ONE corpus token-count aggregate, then |sources|-row windows.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .dedup2 import _detector_sql
from .dedup import dedup_minhash_pairs
from .registry import T, persisted, register

_BATCH_SIZES = (8, 32, 128)


def _leakage_oracle() -> str:
    mh = _detector_sql("dedup_minhash_pairs")
    per_b = []
    for b in _BATCH_SIZES:
        per_b.append(
            f"CAST(SUM(CASE WHEN b1 // {b} = b2 // {b} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS n_leaked_b{b}"
        )
    cols = ",\n       ".join(per_b)
    return f"""
WITH pairs AS (SELECT d1, d2 FROM ({mh})),
pos AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5('batch:' || CAST(doc_id AS VARCHAR)), 1, 12))
              AS BIGINT) AS hk
  FROM documents
),
ranked AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY hk, doc_id) - 1 AS pos FROM pos
),
j AS (
  SELECT p.d1, p.d2, r1.pos AS b1, r2.pos AS b2
  FROM pairs p
  JOIN ranked r1 ON p.d1 = r1.doc_id
  JOIN ranked r2 ON p.d2 = r2.doc_id
)
SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_dup_pairs,
       CAST((SELECT COUNT(*) FROM ranked) AS BIGINT) AS n_docs,
       {cols}
FROM j
"""


@register("q_batch_leakage_audit", oracle=_leakage_oracle())
def q_batch_leakage_audit(spark, sf_dir):
    """Near-dup pairs co-landing in one training batch, at batch sizes
    {sizes} (module docstring). Batches = consecutive runs of the
    md5-shuffled document order (an epoch shuffle), so batch membership is
    ``shuffle_rank div B`` — three scenario columns from ONE pair join.
    The global rank runs on the doc-id frame (ids + hash keys only) via
    two-phase ``global_rank`` — the doc frame GROWS with the corpus, so an
    unpartitioned window here would funnel every doc id through one
    reducer; the two-phase form keeps the rank shuffle parallel and its
    single-partition seam bounded by the shuffle-partition count.""".format(
        sizes=list(_BATCH_SIZES)
    )
    from .twophase import global_rank

    pairs = dedup_minhash_pairs(spark, sf_dir).select("d1", "d2")
    docs = T(spark, sf_dir, "documents").select("doc_id")
    hk = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("batch:"), F.col("doc_id").cast("string"))), 1, 12
        ),
        16,
        10,
    ).cast("bigint")
    # persisted: >1 consumer (r1 AND r2 sides of the pair join) — the
    # repo-wide rule; also avoids re-running the rank join per side.
    ranked = persisted(
        global_rank(
            docs.withColumn("_hk", hk), ["_hk", "doc_id"], out="_rk"
        ).select("doc_id", (F.col("_rk") - 1).alias("pos"))
    )
    r1 = ranked.select(F.col("doc_id").alias("d1"), F.col("pos").alias("b1"))
    r2 = ranked.select(F.col("doc_id").alias("d2"), F.col("pos").alias("b2"))
    j = pairs.join(r1, "d1").join(r2, "d2")
    aggs = []
    for b in _BATCH_SIZES:
        aggs.append(
            F.sum(
                F.when(
                    F.floor(F.col("b1") / b) == F.floor(F.col("b2") / b), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"n_leaked_b{b}")
        )
    totals = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_dup_pairs"))
    ndocs = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return (
        j.agg(*aggs)
        .crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(ndocs))
        .select(
            "n_dup_pairs",
            "n_docs",
            *[f"n_leaked_b{b}" for b in _BATCH_SIZES],
        )
    )


_WF_SHARE_NUM, _WF_SHARE_DEN = 3, 5  # budget T = 60% of total corpus tokens

_WATERFILL_ORACLE = rf"""
WITH tok AS (
  SELECT source,
         CAST(SUM(len(string_split_regex(trim(text), '\s+'))) AS BIGINT)
           AS cap_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(cap_tokens) * {_WF_SHARE_NUM} // {_WF_SHARE_DEN} AS BIGINT)
           AS budget,
         CAST(COUNT(*) AS BIGINT) AS n_src
  FROM tok
),
ordered AS (
  SELECT t.source, t.cap_tokens, x.budget, x.n_src,
         ROW_NUMBER() OVER (ORDER BY t.cap_tokens, t.source) AS i,
         COALESCE(SUM(t.cap_tokens) OVER (
           ORDER BY t.cap_tokens, t.source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
  FROM tok t CROSS JOIN tot x
),
flagged AS (
  SELECT *,
         CASE WHEN cap_tokens * (n_src - i + 1) <= budget - prefix
              THEN 1 ELSE 0 END AS saturated
  FROM ordered
),
k AS (
  SELECT CAST(COALESCE(SUM(saturated), 0) AS BIGINT) AS n_sat,
         CAST(COALESCE(SUM(CASE WHEN saturated = 1 THEN cap_tokens END), 0)
              AS BIGINT) AS sat_mass
  FROM flagged
),
alloc AS (
  SELECT f.source, f.cap_tokens, f.saturated, f.budget,
         CASE WHEN f.saturated = 1 THEN f.cap_tokens
              ELSE (f.budget - kk.sat_mass) // (f.n_src - kk.n_sat)
                   + CASE WHEN f.i - kk.n_sat
                               <= (f.budget - kk.sat_mass) % (f.n_src - kk.n_sat)
                          THEN 1 ELSE 0 END
         END AS alloc_tokens
  FROM flagged f CROSS JOIN k kk
)
SELECT source, cap_tokens,
       CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
       CAST(saturated AS BIGINT) AS capped,
       CAST(SUM(alloc_tokens) OVER () AS BIGINT) AS total_allocated,
       budget AS budget_tokens
FROM alloc
"""


@register("q_token_budget_waterfill", oracle=_WATERFILL_ORACLE)
def q_token_budget_waterfill(spark, sf_dir):
    """Closed-form water-filling of a token budget (60% of corpus mass)
    across sources (module docstring): capped sources keep their full
    mass, the rest share the remainder at one integer level with exact
    remainder distribution; Σalloc == budget witnessed in every row."""
    docs = T(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
        .cast("bigint")
        .alias("cap_tokens")
    )
    tot = tok.agg(
        # exact integer division (ADVICE r07 #2): `div` on bigint matches the
        # oracle's `//` at any scale; floor(x*3/5) would round through a
        # double once 3·Σcap exceeds 2^53
        F.expr(f"sum(cap_tokens) * {_WF_SHARE_NUM} div {_WF_SHARE_DEN}")
        .cast("bigint")
        .alias("budget"),
        F.count(F.lit(1)).cast("bigint").alias("n_src"),
    )
    # bounded cardinality: one row per SOURCE (|sources|, ~dozens) —
    # never data-sized, so the global window seam is safe here
    w = Window.orderBy("cap_tokens", "source")
    ordered = (
        tok.crossJoin(F.broadcast(tot))
        .withColumn("i", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "prefix",
            F.coalesce(
                F.sum("cap_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("bigint"),
        )
    )
    flagged = ordered.withColumn(
        "saturated",
        F.when(
            F.col("cap_tokens") * (F.col("n_src") - F.col("i") + 1)
            <= F.col("budget") - F.col("prefix"),
            1,
        ).otherwise(0),
    )
    k = flagged.agg(
        F.coalesce(F.sum("saturated"), F.lit(0)).cast("bigint").alias("n_sat"),
        F.coalesce(
            F.sum(F.when(F.col("saturated") == 1, F.col("cap_tokens"))), F.lit(0)
        )
        .cast("bigint")
        .alias("sat_mass"),
    )
    leftover = F.col("budget") - F.col("sat_mass")
    slots = F.col("n_src") - F.col("n_sat")
    alloc = flagged.crossJoin(F.broadcast(k)).withColumn(
        "alloc_tokens",
        F.when(F.col("saturated") == 1, F.col("cap_tokens")).otherwise(
            F.expr("(budget - sat_mass) div (n_src - n_sat)")
            + F.when(
                F.col("i") - F.col("n_sat") <= leftover % slots, 1
            ).otherwise(0)
        ),
    )
    return alloc.select(
        "source",
        "cap_tokens",
        F.col("alloc_tokens").cast("bigint").alias("alloc_tokens"),
        F.col("saturated").cast("bigint").alias("capped"),
        # bounded cardinality: per-source frame (|sources| rows)
        F.sum("alloc_tokens")
        .over(Window.partitionBy())
        .cast("bigint")
        .alias("total_allocated"),
        F.col("budget").alias("budget_tokens"),
    )


_NEG_POWER_NUM, _NEG_POWER_DEN = 3, 4  # unigram^0.75 (word2vec convention)
_NEG_DRAWS = 4096


def _neg_sampling_oracle() -> str:
    return rf"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
  FROM documents
),
freq AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM tok
  WHERE word <> '' GROUP BY word
),
w AS (
  SELECT word, n,
         CAST(floor(pow(CAST(n AS DOUBLE), {_NEG_POWER_NUM}.0 / {_NEG_POWER_DEN})
                    * 1000000) AS BIGINT) AS w6
  FROM freq
),
tot AS (SELECT CAST(SUM(w6) AS BIGINT) AS tw FROM w),
cum AS (
  SELECT word, n, w6,
         COALESCE(SUM(w6) OVER (ORDER BY word
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lo,
         SUM(w6) OVER (ORDER BY word
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi
  FROM w
),
draws AS (
  SELECT CAST(('0x' || substr(md5('neg:' || CAST(i AS VARCHAR)), 1, 12))
              AS BIGINT) % t.tw AS u
  FROM UNNEST(range(0, {_NEG_DRAWS})) AS g(i) CROSS JOIN tot t
),
hits AS (
  SELECT c.word, CAST(COUNT(*) AS BIGINT) AS n_drawn
  FROM draws d JOIN cum c ON d.u >= c.lo AND d.u < c.hi
  GROUP BY c.word
)
SELECT c.word, c.n, c.w6 AS weight_fp6,
       COALESCE(h.n_drawn, 0) AS n_drawn,
       CAST(floor(c.w6 * {_NEG_DRAWS} * 1.0 / t.tw) AS BIGINT) AS expected_draws
FROM cum c CROSS JOIN tot t
LEFT JOIN hits h ON c.word = h.word
"""


@register("q_negative_sampling_table", oracle=_neg_sampling_oracle())
def q_negative_sampling_table(spark, sf_dir):
    """word2vec-style negative-sampling table: per-word weight =
    unigram_count^0.75 (fp6-floored — pow on the same integer in both
    engines is a single identical double op), plus {n} DETERMINISTIC draws
    (md5 of the draw index, mod total weight) resolved against the
    cumulative-weight intervals — the table a skip-gram/contrastive trainer
    samples negatives from, with the empirical draw counts beside the
    expected counts as the fit witness.

    Scale shape: one corpus tokenize → one word-keyed count; everything
    after runs on the vocabulary frame (cumulative windows over |V| rows;
    the draw resolution is a range join of {n} broadcast draws against the
    |V| intervals — at production vocab sizes this is the binary-searchable
    cumulative table every implementation ships, and the draw side stays
    tiny).""".format(n=_NEG_DRAWS)
    docs = T(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    freq = tok.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w = freq.withColumn(
        "w6",
        F.floor(
            F.pow(F.col("n").cast("double"), _NEG_POWER_NUM / _NEG_POWER_DEN)
            * 1_000_000
        ).cast("bigint"),
    )
    tot = w.agg(F.sum("w6").cast("bigint").alias("tw"))
    # two-phase cumulative weights: the vocabulary frame grows with the
    # corpus, so the interval table is built with bucketed windows (one
    # parallel shuffle) instead of an Exchange SinglePartition; the string
    # key buckets on an order-preserving 56-bit UTF-8 prefix
    from .twophase import global_cumsums, utf8_prefix_key

    w = w.transform(persisted)  # consumers: boundary sketch + windows + totals
    cum = global_cumsums(
        w,
        ["word"],
        {"lo": ("w6", "excl"), "hi": ("w6", "incl")},
        lead_numeric=utf8_prefix_key("word"),
    ).select("word", "n", "w6", "lo", "hi")
    draws = (
        spark.range(_NEG_DRAWS)
        .crossJoin(F.broadcast(tot))
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("neg:"), F.col("id").cast("string"))),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("tw")
            ).alias("u")
        )
    )
    hits = (
        cum.join(
            F.broadcast(draws),
            (F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")),
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_drawn"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .join(F.broadcast(hits), "word", "left")
        .select(
            "word",
            "n",
            F.col("w6").alias("weight_fp6"),
            F.coalesce("n_drawn", F.lit(0)).alias("n_drawn"),
            F.floor(F.col("w6") * _NEG_DRAWS * 1.0 / F.col("tw"))
            .cast("bigint")
            .alias("expected_draws"),
        )
    )


_PAD_B = 16  # examples per training batch

_PAD_POLICY_SQL = """
  SELECT source, policy,
         CAST(COUNT(*) AS BIGINT) AS n_batches,
         CAST(SUM(nb * mx - sm) AS BIGINT) AS padding_tokens,
         CAST(SUM(nb * mx) AS BIGINT) AS padded_tokens,
         CAST(SUM(sm) AS BIGINT) AS real_tokens
  FROM (
    SELECT source, policy, batch,
           CAST(COUNT(*) AS BIGINT) AS nb,
           CAST(MAX(tok) AS BIGINT) AS mx,
           CAST(SUM(tok) AS BIGINT) AS sm
    FROM b GROUP BY 1, 2, 3
  ) g
  GROUP BY 1, 2
"""


@register(
    "q_padding_waste",
    oracle=f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              t -> t <> '')) AS BIGINT) AS tok
  FROM documents
),
b AS (
  SELECT source, tok, 'arrival' AS policy,
         (ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) - 1)
           // {_PAD_B} AS batch
  FROM d
  UNION ALL
  SELECT source, tok, 'length_sorted' AS policy,
         (ROW_NUMBER() OVER (PARTITION BY source ORDER BY tok, doc_id) - 1)
           // {_PAD_B} AS batch
  FROM d
),
agg AS ({_PAD_POLICY_SQL})
SELECT source, policy, n_batches, real_tokens, padded_tokens, padding_tokens,
       CAST(CAST(padding_tokens AS HUGEINT) * 1000000 // padded_tokens
            AS BIGINT) AS waste_share_fp6
FROM agg
""",
)
def q_padding_waste(spark, sf_dir):
    """Padding-waste economics of batch assembly: every example in a batch
    of B pads to the batch max length, so waste = Σ_batches (n·max − Σlen).
    Compares ARRIVAL-ORDER batching (doc_id order — what a naive loader
    does) against LENGTH-SORTED batching (the standard bucketing trick)
    per source; the delta is the compute a sorted loader saves. Exact
    integers end-to-end; waste share via integer cross-multiplication.

    Scale shape: the doc frame (doc_id, source, token count) is ONE corpus
    scan; each policy is a per-source window rank over that doc-sized frame
    (co-partitioned — both windows and the batch aggregate share the source
    key), then a |sources·batches| aggregate. At 100 TB the length-sorted
    rank is the same per-source sort any sorted-bucketing loader performs;
    nothing global, nothing quadratic."""
    d = (
        T(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "source",
            F.size(
                F.expr(
                    "filter(split(trim(text), '\\\\s+'), t -> t != '')"
                )
            )
            .cast("bigint")
            .alias("tok"),
        )
        # doc-sized (id, source, token count); consumers: both policy
        # rankings — persist so the corpus tokenizes once
        .transform(persisted)
    )
    wa = Window.partitionBy("source").orderBy("doc_id")
    wl = Window.partitionBy("source").orderBy("tok", "doc_id")
    b = (
        d.withColumn("rn", F.row_number().over(wa))
        .select(
            "source",
            "tok",
            F.lit("arrival").alias("policy"),
            F.expr(f"CAST(rn - 1 AS BIGINT) div {_PAD_B}").alias("batch"),
        )
        .unionByName(
            d.withColumn("rn", F.row_number().over(wl)).select(
                "source",
                "tok",
                F.lit("length_sorted").alias("policy"),
                F.expr(f"CAST(rn - 1 AS BIGINT) div {_PAD_B}").alias("batch"),
            )
        )
    )
    g = b.groupBy("source", "policy", "batch").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.max("tok").cast("bigint").alias("mx"),
        F.sum("tok").cast("bigint").alias("sm"),
    )
    agg = g.groupBy("source", "policy").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batches"),
        F.sum(F.col("nb") * F.col("mx") - F.col("sm"))
        .cast("bigint")
        .alias("padding_tokens"),
        F.sum(F.col("nb") * F.col("mx")).cast("bigint").alias("padded_tokens"),
        F.sum("sm").cast("bigint").alias("real_tokens"),
    )
    return agg.select(
        "source",
        "policy",
        "n_batches",
        "real_tokens",
        "padded_tokens",
        "padding_tokens",
        F.expr(
            "CAST(CAST(padding_tokens AS DECIMAL(38,0)) * 1000000"
            " div padded_tokens AS BIGINT)"
        ).alias("waste_share_fp6"),
    )


@register(
    "q_loo_source_influence",
    oracle="""
WITH d AS (
  SELECT source,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              t -> t <> '')) AS BIGINT) AS tok
  FROM documents
),
per_s AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(tok) AS BIGINT) AS n_tokens
  FROM d GROUP BY source
),
tot AS (
  SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
         CAST(SUM(n_tokens) AS BIGINT) AS tt
  FROM per_s
)
SELECT p.source, p.n_docs, p.n_tokens,
       CAST(CAST(tot.tt AS HUGEINT) * 1000000 // tot.nn AS BIGINT)
         AS overall_mean_fp6,
       CASE WHEN tot.nn - p.n_docs = 0 THEN NULL
            ELSE CAST(CAST(tot.tt - p.n_tokens AS HUGEINT) * 1000000
                      // (tot.nn - p.n_docs) AS BIGINT) END AS loo_mean_fp6,
       CASE WHEN tot.nn - p.n_docs = 0 THEN NULL
            ELSE CAST(CAST(tot.tt - p.n_tokens AS HUGEINT) * 1000000
                      // (tot.nn - p.n_docs)
                      - CAST(tot.tt AS HUGEINT) * 1000000 // tot.nn
                      AS BIGINT) END AS influence_fp6
FROM per_s p, tot
""",
)
def q_loo_source_influence(spark, sf_dir):
    """Leave-one-source-out data valuation via the decomposable-statistic
    trick (the q_target_encoding OOF identity applied to corpus metrics):
    the corpus mean tokens/doc WITHOUT source s is (T − t_s)/(N − n_s), so
    every source's counterfactual is computed from ONE per-source partial
    aggregate — no per-source re-scan, no retraining loop. influence_fp6 =
    loo_mean − overall_mean: a POSITIVE value means removing the source
    RAISES the corpus metric (the source drags it down) — the cheap
    first-pass of the Shapley-style mix attribution a curation team runs
    before ablation studies. All integer arithmetic; single-source corpora
    emit NULL counterfactuals rather than dividing by zero.

    Scale: one map-side-combined per-source aggregate ends the corpus
    path; the counterfactual algebra runs on the |sources|-row frame.
    The same identity extends to ANY decomposable metric (sums/counts/
    moments — mean NLL via q_perplexity_filter's sums, quality rates)."""
    d = T(spark, sf_dir, "documents").select(
        "source",
        F.size(
            F.expr("filter(split(trim(text), '\\\\s+'), t -> t != '')")
        )
        .cast("bigint")
        .alias("tok"),
    )
    per_s = (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tok").cast("bigint").alias("n_tokens"),
        )
        .transform(persisted)  # |sources| rows; consumers: totals + output
    )
    tot = per_s.agg(
        F.sum("n_docs").cast("bigint").alias("nn"),
        F.sum("n_tokens").cast("bigint").alias("tt"),
    )
    return per_s.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr(
            "CAST(CAST(tt AS DECIMAL(38,0)) * 1000000 div nn AS BIGINT)"
        ).alias("overall_mean_fp6"),
        F.when(F.col("nn") - F.col("n_docs") == 0, F.lit(None)).otherwise(
            F.expr(
                "CAST(CAST(tt - n_tokens AS DECIMAL(38,0)) * 1000000"
                " div (nn - n_docs) AS BIGINT)"
            )
        ).alias("loo_mean_fp6"),
        F.when(F.col("nn") - F.col("n_docs") == 0, F.lit(None)).otherwise(
            F.expr(
                "CAST(CAST(tt - n_tokens AS DECIMAL(38,0)) * 1000000"
                " div (nn - n_docs)"
                " - CAST(tt AS DECIMAL(38,0)) * 1000000 div nn AS BIGINT)"
            )
        ).alias("influence_fp6"),
    )


_SHAP_P = 16  # sampled permutations (md5-deterministic)


@register(
    "q_shapley_source_coverage",
    oracle=f"""
WITH tk AS (
  SELECT source,
         unnest(list_filter(list_transform(
           string_split_regex(lower(trim(text)), '\\s+'),
           t -> regexp_replace(t, '[^a-z0-9]', '', 'g')), t -> t <> ''))
           AS word
  FROM documents
),
ws AS (SELECT DISTINCT word, source FROM tk),
held AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_words_held FROM ws GROUP BY 1
),
holders AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_holders FROM ws GROUP BY 1),
uniq AS (
  SELECT w.source, CAST(COUNT(*) AS BIGINT) AS loo_unique_words
  FROM ws w JOIN holders h ON w.word = h.word
  WHERE h.n_holders = 1
  GROUP BY w.source
),
vocab AS (SELECT CAST(COUNT(DISTINCT word) AS BIGINT) AS v FROM ws),
ranked AS (
  SELECT p, word, source,
         ROW_NUMBER() OVER (
           PARTITION BY p, word
           ORDER BY CAST(('0x' || substr(md5('shap:' || CAST(p AS VARCHAR)
                          || ':' || source), 1, 12)) AS BIGINT), source
         ) AS rn
  FROM ws, UNNEST(generate_series(1, {_SHAP_P})) AS g(p)
),
wins AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS wins_total
  FROM ranked WHERE rn = 1 GROUP BY source
),
tot AS (SELECT CAST(SUM(wins_total) AS BIGINT) AS all_wins FROM wins)
SELECT h.source,
       h.n_words_held,
       COALESCE(u.loo_unique_words, 0) AS loo_unique_words,
       COALESCE(w.wins_total, 0) AS wins_total,
       CAST(COALESCE(w.wins_total, 0) * 1000000 // {_SHAP_P} AS BIGINT)
         AS shapley_words_fp6,
       CAST(CASE WHEN t.all_wins = {_SHAP_P} * v.v THEN 1 ELSE 0 END
            AS BIGINT) AS efficiency_ok
FROM held h
LEFT JOIN uniq u ON h.source = u.source
LEFT JOIN wins w ON h.source = w.source
CROSS JOIN tot t CROSS JOIN vocab v
""",
)
def q_shapley_source_coverage(spark, sf_dir):
    """Sampled-permutation SHAPLEY valuation of sources under the
    VOCABULARY-COVERAGE metric v(S) = |distinct words covered by S|
    (Castro 2009 sampling; Ghorbani & Zou 2019 data Shapley) — the
    submodular complement of ``q_loo_source_influence``: coverage overlaps
    make LOO (= words held ONLY by s) under-credit redundant sources,
    while Shapley splits shared words across their holders.

    For coverage the permutation-marginal has a CLOSED FORM: source s's
    marginal gain in permutation π is exactly the number of words whose
    FIRST holder in π order is s — so {p} deterministic permutations
    (per-(permutation, source) md5 ranks; winner per (π, word) = the
    holder with the minimum rank, source-tiebroken) reduce to {p} keyed
    argmin aggregates over the (word, source) frame. No retraining loop,
    no power-set enumeration. Shapley EFFICIENCY (Σ_s φ_s = v(all)) holds
    exactly per permutation — every word has exactly one winner — and is
    derived as the efficiency_ok column in both engines.

    Emitted side by side: n_words_held, loo_unique_words (the LOO
    marginal), wins_total, shapley_words_fp6 = wins·10⁶/{p} (exact
    integer division). Scale: ONE corpus tokenize → distinct
    (word, source) frame (vocab×sources-bounded, persisted); the {p}
    permutations are an explode + one windowed argmin over that frame;
    every downstream frame is |sources|-sized.""".format(p=_SHAP_P)
    docs = T(spark, sf_dir, "documents")
    tk = docs.select(
        "source",
        F.explode(
            F.expr(
                "filter(transform(split(lower(trim(text)), '\\\\s+'),"
                " t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
            )
        ).alias("word"),
    )
    ws = tk.distinct().transform(persisted)  # consumers: held/holders/
    # vocab/permutation ranks
    held = ws.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words_held")
    )
    holders = ws.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_holders")
    )
    uniq = (
        ws.join(holders, "word")
        .filter(F.col("n_holders") == 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("loo_unique_words"))
    )
    vocab = ws.agg(F.countDistinct("word").cast("bigint").alias("v"))
    from pyspark.sql import Window

    wperm = Window.partitionBy("p", "word").orderBy(
        F.expr(
            "cast(conv(substring(md5(concat('shap:', cast(p as string),"
            " ':', source)), 1, 12), 16, 10) as bigint)"
        ),
        "source",
    )
    ranked = ws.select(
        "word",
        "source",
        F.explode(F.expr(f"sequence(1, {_SHAP_P})")).alias("p"),
    ).withColumn("rn", F.row_number().over(wperm))
    wins = (
        ranked.filter(F.col("rn") == 1)
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wins_total"))
        .transform(persisted)  # |sources| rows; consumers: totals + output
    )
    tot = wins.agg(F.sum("wins_total").cast("bigint").alias("all_wins"))
    return (
        held.join(uniq, "source", "left")
        .join(wins, "source", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vocab))
        .select(
            "source",
            "n_words_held",
            F.coalesce("loo_unique_words", F.lit(0))
            .cast("bigint")
            .alias("loo_unique_words"),
            F.coalesce("wins_total", F.lit(0))
            .cast("bigint")
            .alias("wins_total"),
            F.expr(
                f"CAST(COALESCE(wins_total, 0) * 1000000 div {_SHAP_P}"
                " AS BIGINT)"
            ).alias("shapley_words_fp6"),
            F.expr(
                f"CAST(CASE WHEN all_wins = {_SHAP_P} * v THEN 1 ELSE 0 END"
                " AS BIGINT)"
            ).alias("efficiency_ok"),
        )
    )
