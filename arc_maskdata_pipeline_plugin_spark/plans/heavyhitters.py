"""Misra-Gries mergeable heavy-hitter summary with its theorem witnessed
in-plan (oracle-checked).

The deterministic counter-based counterpart of the CMS sketch family
(q_heavy_hitters_cms): Misra-Gries (1982) keeps k counters; Agarwal,
Cormode, Huang, Phillips, Wei, Yi ("Mergeable Summaries", PODS 2012) prove
the summaries MERGE without error growth — combine counters, subtract the
(k+1)-th largest value, drop non-positives — and the global underestimate
stays ≤ N/(k+1) no matter the merge tree, because every truncation that
subtracts d removes ≥ (k+1)·d total counter mass and total mass is ≤ N.

That mass argument makes the distributed form ORDER-FREE and exact-integer:

1. shard the token stream by doc_id mod P (arrival shards, NOT key shards —
   key-sharded counts would be trivially exact);
2. per shard, exact (term, count) via one map-side-combined aggregate, then
   ONE truncation: d_p = (k+1)-th largest count, keep c − d_p > 0 — this IS
   the Misra-Gries summary of the shard (any stream order reaches it);
3. merge: sum surviving estimates per term, truncate once more by the
   (k+1)-th largest merged value.

Witnesses pinned in-plan (every row, both engines re-derive them):
* 0 ≤ true_count − est ≤ N div (k+1) for every survivor (`bound_ok`);
* every term with true_count > N div (k+1) SURVIVES (`n_missed_heavy` = 0)
  — the guarantee that makes the summary a safe pre-filter for exact
  heavy-hitter verification at 100 TB.

Scale shape: one (shard, term) token shuffle with map-side combine, a
per-shard window on the counter frame, one term-keyed merge aggregate, and
a ≤ k-row output joined against the per-term exact counts (re-aggregated
from the same shard frame — the corpus is scanned once). State is k
counters per shard — constant, like the CMS cells.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, persisted, register

_K = 16  # counters kept per summary
_P = 8  # arrival shards

_TOKENS = (
    "filter(transform(split(lower(trim(text)), '\\\\s+'), "
    "t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
)
_TOKS_SQL = (
    r"list_filter(list_transform(string_split_regex(lower(trim(text)), '\s+'), "
    r"t -> regexp_replace(t, '[^a-z0-9]', '', 'g')), t -> t <> '')"
)


@register(
    "q_misra_gries_topk",
    oracle=f"""
WITH tk AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
occ AS (SELECT doc_id % {_P} AS shard, unnest(toks) AS term FROM tk),
l1 AS (
  SELECT shard, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM occ GROUP BY 1, 2
),
ranked AS (
  SELECT shard, term, c,
         ROW_NUMBER() OVER (PARTITION BY shard
                            ORDER BY c DESC, term) AS rn
  FROM l1
),
dp AS (
  SELECT shard,
         CAST(COALESCE(MAX(CASE WHEN rn = {_K + 1} THEN c END), 0) AS BIGINT)
           AS d_p
  FROM ranked GROUP BY shard
),
summ1 AS (
  SELECT r.term, r.c - d.d_p AS est1
  FROM ranked r JOIN dp d ON r.shard = d.shard
  WHERE r.c - d.d_p > 0
),
merged AS (
  SELECT term, CAST(SUM(est1) AS BIGINT) AS m FROM summ1 GROUP BY term
),
mr AS (
  SELECT term, m, ROW_NUMBER() OVER (ORDER BY m DESC, term) AS rn
  FROM merged
),
dfin AS (
  SELECT CAST(COALESCE(MAX(CASE WHEN rn = {_K + 1} THEN m END), 0) AS BIGINT)
    AS d
  FROM mr
),
surv AS (
  SELECT mr.term, mr.m - dfin.d AS est
  FROM mr, dfin WHERE mr.m - dfin.d > 0
),
truth AS (
  SELECT term, CAST(SUM(c) AS BIGINT) AS true_count FROM l1 GROUP BY term
),
ntot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM l1),
missed AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_missed_heavy
  FROM truth t, ntot
  WHERE t.true_count > ntot.n // {_K + 1}
    AND NOT EXISTS (SELECT 1 FROM surv s WHERE s.term = t.term)
)
SELECT s.term,
       CAST(s.est AS BIGINT) AS est,
       t.true_count,
       CAST(t.true_count - s.est AS BIGINT) AS deficit,
       CAST(ntot.n // {_K + 1} AS BIGINT) AS bound,
       CAST(CASE WHEN t.true_count - s.est BETWEEN 0 AND ntot.n // {_K + 1}
                 THEN 1 ELSE 0 END AS BIGINT) AS bound_ok,
       m.n_missed_heavy
FROM surv s
JOIN truth t ON s.term = t.term, ntot, missed m
""",
)
def q_misra_gries_topk(spark, sf_dir):
    """Two-level Misra-Gries heavy hitters over the corpus token stream
    with the mergeability theorem pinned per row (module docstring).
    `bound_ok` = the deficit bound 0 ≤ f − est ≤ N div (k+1);
    `n_missed_heavy` = 0 witnesses that no true heavy hitter was lost."""
    docs = T(spark, sf_dir, "documents")
    occ = docs.select(
        (F.col("doc_id") % _P).alias("shard"),
        F.explode(F.expr(_TOKENS)).alias("term"),
    )
    l1 = (
        occ.groupBy("shard", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        # counter frame (≤ vocab·P rows): consumers = per-shard ranking,
        # truth re-aggregate, N total — persist so the corpus token
        # shuffle runs ONCE, not per consumer
        .transform(persisted)
    )
    wsh = Window.partitionBy("shard").orderBy(F.desc("c"), F.asc("term"))
    ranked = l1.withColumn("rn", F.row_number().over(wsh))
    dp = ranked.groupBy("shard").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == _K + 1, F.col("c"))), F.lit(0)
        )
        .cast("bigint")
        .alias("d_p")
    )
    summ1 = (
        ranked.join(F.broadcast(dp), "shard")
        .select("term", (F.col("c") - F.col("d_p")).alias("est1"))
        .filter(F.col("est1") > 0)
    )
    merged = summ1.groupBy("term").agg(
        F.sum("est1").cast("bigint").alias("m")
    )
    mr = merged.withColumn(
        # bounded cardinality: merged counter frame ≤ k·shards rows
        "rn", F.row_number().over(Window.orderBy(F.desc("m"), F.asc("term")))
    )
    dfin = mr.agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == _K + 1, F.col("m"))), F.lit(0)
        )
        .cast("bigint")
        .alias("d")
    )
    surv = (
        mr.crossJoin(F.broadcast(dfin))
        .select("term", (F.col("m") - F.col("d")).alias("est"))
        .filter(F.col("est") > 0)
    )
    truth = l1.groupBy("term").agg(
        F.sum("c").cast("bigint").alias("true_count")
    )
    ntot = l1.agg(F.sum("c").cast("bigint").alias("n"))
    heavy_missed = (
        truth.crossJoin(F.broadcast(ntot))
        .filter(F.expr(f"true_count > n div {_K + 1}"))
        .join(surv.select("term"), "term", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_missed_heavy"))
    )
    return (
        surv.join(truth, "term")
        .crossJoin(F.broadcast(ntot))
        .crossJoin(F.broadcast(heavy_missed))
        .select(
            "term",
            F.col("est").cast("bigint").alias("est"),
            "true_count",
            (F.col("true_count") - F.col("est"))
            .cast("bigint")
            .alias("deficit"),
            F.expr(f"CAST(n div {_K + 1} AS BIGINT)").alias("bound"),
            F.when(
                (F.col("true_count") - F.col("est") >= 0)
                & (
                    F.col("true_count") - F.col("est")
                    <= F.expr(f"n div {_K + 1}")
                ),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("bound_ok"),
            "n_missed_heavy",
        )
    )
