"""Cross-method near-dup evidence merge → clusters → survivorship.

Production corpus dedup rarely trusts ONE detector: MinHash-LSH
(probabilistic recall), PPJoin (candidate-complete exact Jaccard) and
containment (doc-inside-doc) each catch pairs the others miss — and each
false-positives differently. The standard hardening is EVIDENCE MERGING:
union the pair sets, keep pairs confirmed by >= 2 independent methods,
cluster the surviving edges transitively, and elect one survivor per
cluster (here: longest text, then min doc_id — keep the most complete
copy). ``q_dedup_method_agreement`` (plans/dedup.py) reports how much the
methods overlap; this query is the decision layer built on top of it.

Scale shape: each detector keeps its own bucketed/capped candidate
discipline (no all-pairs anywhere); the evidence union and >=2-method vote
are ONE pair-keyed aggregate over post-detector (tiny) frames; connected
components run on the strong-edge graph (star-rounds, operators/clusters);
the survivor election is one component-keyed window over cluster members.
At 100 TB the three detectors would share one persisted shingle frame —
the operator signatures take the shingle frame directly; the composition
here calls the registered queries so the oracle text composes the same way.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..operators.clusters import connected_components
from . import dedup as _dedup_plans  # noqa: F401 — registers the detector
# queries _detector_sql composes (their oracle SQL is reused verbatim below)
from .registry import T, persisted, register


def _detector_sql(name: str) -> str:
    """Reuse the exact oracle text of a registered detector as a subquery
    (DuckDB scopes each subquery's WITH chain independently) — no drift
    between the detectors' standalone checks and this composition."""
    from .registry import REGISTRY

    return REGISTRY[name].oracle


def _evidence_oracle() -> str:
    mh = _detector_sql("dedup_minhash_pairs")
    pp = _detector_sql("dedup_ppjoin_pairs")
    ct = _detector_sql("dedup_containment_pairs")
    return f"""
WITH RECURSIVE
mh AS (SELECT d1, d2 FROM ({mh})),
pp AS (SELECT d1, d2 FROM ({pp})),
ct AS (SELECT d1, d2 FROM ({ct})),
ev AS (
  SELECT d1, d2, CAST(COUNT(*) AS BIGINT) AS n_methods
  FROM (
    SELECT d1, d2 FROM mh
    UNION ALL SELECT d1, d2 FROM pp
    UNION ALL SELECT d1, d2 FROM ct
  )
  GROUP BY d1, d2
),
strong AS (SELECT d1, d2, n_methods FROM ev WHERE n_methods >= 2),
e AS (SELECT d1 AS a, d2 AS b FROM strong UNION SELECT d2, d1 FROM strong),
walk(node, comp) AS (
  SELECT DISTINCT a, a FROM e
  UNION
  SELECT e.a, w.comp FROM e JOIN walk w ON e.b = w.node
),
cc AS (SELECT node, MIN(comp) AS component FROM walk GROUP BY node),
mem AS (
  SELECT cc.node, cc.component, d.n_chars
  FROM cc JOIN documents d ON d.doc_id = cc.node
),
surv AS (
  SELECT component, node AS survivor_id, n_chars AS survivor_chars FROM (
    SELECT component, node, n_chars,
           ROW_NUMBER() OVER (PARTITION BY component
                              ORDER BY n_chars DESC, node) AS rn
    FROM mem
  ) WHERE rn = 1
),
edge_stats AS (
  SELECT c.component,
         CAST(COUNT(*) AS BIGINT) AS n_strong_pairs,
         CAST(SUM(CASE WHEN s.n_methods = 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pairs_all3
  FROM strong s JOIN cc c ON s.d1 = c.node
  GROUP BY c.component
)
SELECT m.component,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MIN(s.survivor_id) AS survivor_id,
       MIN(s.survivor_chars) AS survivor_chars,
       array_to_string(list_sort(list(m.node)), ',') AS members,
       MIN(es.n_strong_pairs) AS n_strong_pairs,
       MIN(es.n_pairs_all3) AS n_pairs_all3
FROM mem m
JOIN surv s ON m.component = s.component
JOIN edge_stats es ON m.component = es.component
GROUP BY m.component
"""


@register("q_dedup_evidence_clusters", oracle=_evidence_oracle())
def q_dedup_evidence_clusters(spark, sf_dir):
    """Evidence-merged near-dup clusters with survivor election (module
    docstring). A pair enters the cluster graph only when >= 2 of
    {{MinHash-LSH, PPJoin, containment}} agree; clusters are the connected
    components of the strong-edge graph; the survivor is the longest member
    (ties → min doc_id). Per cluster: members, survivor, and how much of
    the internal edge evidence was unanimous (n_pairs_all3)."""
    # The three detectors all shingle the same corpus the same way — calling
    # the registered queries re-ran the scan→shingle pipeline once per
    # detector (plus ppjoin's private persist and its stats/audit broadcast
    # jobs the evidence merge never reads). Share ONE persisted distinct
    # shingle frame instead (§2.4 / the module docstring's 100 TB shape) and
    # call the operator layer directly with the registered queries' exact
    # parameters. Set-semantics equivalence: MinHash MIN-aggregation and
    # containment's collect_set are multiset-insensitive, and ppjoin already
    # used distinct shingles — each detector's pair SET is unchanged (the
    # oracle below still composes the registered queries' SQL verbatim).
    from ..operators.dedup import (
        _pairs_within,
        containment_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        ppjoin_prefix_buckets,
        word_shingles,
    )
    from .dedup import _PPJ_MAXBUCKET, BAND_SIZE, NUM_HASHES
    from .registry import spread

    sh = word_shingles(spread(T(spark, sf_dir, "documents"))).transform(
        persisted
    )  # consumers: signature agg, ppjoin df/rank + sets, containment
    mh = lsh_candidate_pairs(
        minhash_signatures(sh, num_hashes=NUM_HASHES),
        num_hashes=NUM_HASHES,
        band_size=BAND_SIZE,
    ).select("d1", "d2")
    # ppjoin pair SET (same prefix buckets, viral-token cap and integral
    # J >= 1/2 verify as dedup_ppjoin_pairs — minus its corpus-level stats
    # columns, which the evidence merge drops anyway)
    buckets = ppjoin_prefix_buckets(sh)
    cand = (
        buckets.filter((F.size("xs") > 1) & (F.size("xs") <= _PPJ_MAXBUCKET))
        .select(F.explode(_pairs_within(F.col("xs"))).alias("p"))
        .select(
            F.col("p.d1.id").alias("d1"),
            F.col("p.d1.m").alias("m1"),
            F.col("p.d2.id").alias("d2"),
            F.col("p.d2.m").alias("m2"),
        )
        .filter(2 * F.least("m1", "m2") >= F.greatest("m1", "m2"))
        .select("d1", "d2")
        .distinct()
    )
    sets = sh.groupBy("doc_id").agg(F.collect_set("shingle").alias("toks"))
    pp = (
        cand.join(
            sets.select(F.col("doc_id").alias("d1"), F.col("toks").alias("t1")),
            "d1",
        )
        .join(
            sets.select(F.col("doc_id").alias("d2"), F.col("toks").alias("t2")),
            "d2",
        )
        .filter(
            3 * F.size(F.array_intersect("t1", "t2"))
            >= F.size("t1") + F.size("t2")
        )
        .select("d1", "d2")
    )
    ct = containment_pairs(sh, threshold=0.8).select("d1", "d2")
    ev = (
        mh.unionByName(pp)
        .unionByName(ct)
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_methods"))
    )
    # persisted (tracked): connected_components evaluates its input for the
    # convergence fingerprint, the first star round AND the isolated-node
    # scan — without the persist the 3-detector pipeline would run 3x
    strong = ev.filter(F.col("n_methods") >= 2).transform(persisted)
    cc = connected_components(strong.select("d1", "d2"))
    docs = T(spark, sf_dir, "documents").select("doc_id", "n_chars")
    mem = cc.join(docs, cc["node"] == docs["doc_id"]).select(
        "node", "component", "n_chars"
    )
    w = Window.partitionBy("component").orderBy(F.desc("n_chars"), "node")
    surv = (
        mem.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("node").alias("survivor_id"),
            F.col("n_chars").alias("survivor_chars"),
        )
    )
    edge_stats = (
        strong.join(cc, strong["d1"] == cc["node"])
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_strong_pairs"),
            F.sum(F.when(F.col("n_methods") == 3, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pairs_all3"),
        )
    )
    return (
        mem.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("node")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("members"),
        )
        .join(F.broadcast(surv), "component")
        .join(F.broadcast(edge_stats), "component")
        .select(
            "component",
            "n_members",
            "survivor_id",
            "survivor_chars",
            "members",
            "n_strong_pairs",
            "n_pairs_all3",
        )
    )


def _minhash_error_oracle() -> str:
    from .dedup import _SHINGLES_CTE, BAND_SIZE, NUM_HASHES

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
    agree = " + ".join(
        f"CASE WHEN s1.h{i} = s2.h{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES)
    )
    return f"""
WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({band_rows}),
pairs AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT p.d1, p.d2, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM pairs p
  JOIN sh t1 ON t1.doc_id = p.d1
  JOIN sh t2 ON t2.doc_id = p.d2 AND t2.shingle = t1.shingle
  GROUP BY 1, 2
),
scored AS (
  SELECT p.d1, p.d2,
         CAST({agree} AS BIGINT) AS n_agree,
         CAST(floor(({agree}) * 1000000.0 / {NUM_HASHES}) AS BIGINT)
           AS est_jaccard_fp6,
         CAST(floor(COALESCE(i.n_common, 0) * 1000000.0
                    / (z1.n + z2.n - COALESCE(i.n_common, 0))) AS BIGINT)
           AS exact_jaccard_fp6
  FROM pairs p
  JOIN sig s1 ON p.d1 = s1.doc_id
  JOIN sig s2 ON p.d2 = s2.doc_id
  JOIN sizes z1 ON p.d1 = z1.doc_id
  JOIN sizes z2 ON p.d2 = z2.doc_id
  LEFT JOIN inter i ON p.d1 = i.d1 AND p.d2 = i.d2
)
SELECT d1, d2, n_agree, est_jaccard_fp6, exact_jaccard_fp6,
       CAST(abs(est_jaccard_fp6 - exact_jaccard_fp6) AS BIGINT) AS abs_err_fp6,
       CAST(floor(AVG(abs(est_jaccard_fp6 - exact_jaccard_fp6)) OVER ())
            AS BIGINT) AS mean_abs_err_fp6
FROM scored
"""


@register("q_minhash_estimate_error", oracle=_minhash_error_oracle())
def q_minhash_estimate_error(spark, sf_dir):
    """Estimator-quality witness for the MinHash family (the Jaccard analog
    of q_kmv_distinct_merge's err_pct): for every LSH candidate pair,
    signature agreement (matching min-hashes / 8) IS the MinHash Jaccard
    estimate — compare it against the exact shingle Jaccard and report the
    per-pair and mean absolute error, so the family's accuracy claim is
    measured in-plan, not assumed. One signature self-agreement projection
    on post-LSH pairs plus one shingle-intersection aggregate restricted to
    those pairs — the corpus never self-joins."""
    from pyspark.sql import Window as W

    from ..operators.dedup import minhash_signatures, word_shingles
    from .dedup import BAND_SIZE, NUM_HASHES, dedup_minhash_pairs
    from .registry import spread

    docs = spread(T(spark, sf_dir, "documents"))
    # The LSH pair frame is referenced by every downstream join side; left
    # lazy it INLINES the whole scan→shingle→sig→bands pipeline under each
    # broadcast (the r12 before-plan: 17 parquet scans / 66 aggregates /
    # 86 exchanges for ONE query). One eager localCheckpoint pays the LSH
    # pipeline exactly once — the pair list is tiny (post-LSH candidates) —
    # and every later reference scans the materialized blocks (§2.4, §5).
    pairs = (
        dedup_minhash_pairs(spark, sf_dir)
        .select("d1", "d2")
        .localCheckpoint(eager=True)
    )
    # Every downstream frame (signatures, shingle counts, intersections) is
    # only consumed for docs that appear in a candidate pair — so restrict
    # the DOCUMENTS scan to the (tiny) pair-doc set with a broadcast
    # semi-join BEFORE shingling. The corpus-sized distinct-shingle frame
    # of the old shape is never materialized at all: the only full-corpus
    # pass left is the one fused LSH pipeline above (§2.3 aggregate less /
    # §3.2 semi-join pre-filter / §8 decide-with-small-rows).
    pair_docs = (
        pairs.select(F.col("d1").alias("doc_id"))
        .union(pairs.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    sh = word_shingles(
        docs.join(F.broadcast(pair_docs), "doc_id", "left_semi"),
        distinct=True,
    ).transform(persisted)
    sig = minhash_signatures(sh, num_hashes=NUM_HASHES)
    s1 = sig.select(
        F.col("doc_id").alias("d1"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(NUM_HASHES)],
    )
    s2 = sig.select(
        F.col("doc_id").alias("d2"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(NUM_HASHES)],
    )
    agree = None
    for i in range(NUM_HASHES):
        t = F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        agree = t if agree is None else agree + t
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    sh1 = sh.select(F.col("doc_id").alias("d1"), "shingle")
    sh2 = sh.select(F.col("doc_id").alias("d2"), F.col("shingle"))
    inter = (
        sh1.join(F.broadcast(pairs), "d1")
        .join(sh2, ["d2", "shingle"], "left_semi")
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    scored = (
        s1.join(F.broadcast(pairs), "d1")
        .join(F.broadcast(s2), "d2")
        .select("d1", "d2", agree.cast("bigint").alias("n_agree"))
        .join(
            F.broadcast(
                sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed(
                    "n", "n1"
                )
            ),
            "d1",
        )
        .join(
            F.broadcast(
                sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed(
                    "n", "n2"
                )
            ),
            "d2",
        )
        .join(F.broadcast(inter), ["d1", "d2"], "left")
        .select(
            "d1",
            "d2",
            "n_agree",
            F.floor(F.col("n_agree") * 1_000_000.0 / NUM_HASHES)
            .cast("bigint")
            .alias("est_jaccard_fp6"),
            F.floor(
                F.coalesce("n_common", F.lit(0))
                * 1_000_000.0
                / (F.col("n1") + F.col("n2") - F.coalesce("n_common", F.lit(0)))
            )
            .cast("bigint")
            .alias("exact_jaccard_fp6"),
        )
    )
    werr = W.partitionBy()
    out = scored.select(
        "d1",
        "d2",
        "n_agree",
        "est_jaccard_fp6",
        "exact_jaccard_fp6",
        F.abs(F.col("est_jaccard_fp6") - F.col("exact_jaccard_fp6"))
        .cast("bigint")
        .alias("abs_err_fp6"),
        F.floor(
            F.avg(
                F.abs(F.col("est_jaccard_fp6") - F.col("exact_jaccard_fp6"))
            ).over(werr)
        )
        .cast("bigint")
        .alias("mean_abs_err_fp6"),
    )
    return out


# --- LSH banding-parameter sweep -------------------------------------------

_SWEEP_CONFIGS = (1, 2, 4, 8)  # band sizes r; bands b = 8 // r


def _band_sweep_oracle() -> str:
    from .dedup import _SHINGLES_CTE, NUM_HASHES

    mins = ", ".join(
        f"MIN(md5('{i}:' || shingle)) AS h{i}" for i in range(NUM_HASHES)
    )
    blocks = []
    rows = []
    for r in _SWEEP_CONFIGS:
        n_bands = NUM_HASHES // r
        band_rows = " UNION ALL ".join(
            "SELECT doc_id, {b} AS band, {key} AS key FROM sig".format(
                b=b,
                key=" || ".join(f"h{b * r + j}" for j in range(r)),
            )
            for b in range(n_bands)
        )
        blocks.append(
            f"""cand{r} AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM ({band_rows}) a JOIN ({band_rows}) b
  ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)"""
        )
        rows.append(
            f"""SELECT CAST({r} AS BIGINT) AS band_size,
       CAST({n_bands} AS BIGINT) AS n_bands,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand{r}) AS n_candidates,
       tt.n_truth,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t
        JOIN cand{r} c ON t.d1 = c.d1 AND t.d2 = c.d2) AS n_found,
       CASE WHEN tt.n_truth > 0 THEN
         CAST((SELECT COUNT(*) FROM truth t
               JOIN cand{r} c ON t.d1 = c.d1 AND t.d2 = c.d2)
              * 1000000 // tt.n_truth AS BIGINT) END AS recall_fp6,
       CASE WHEN (SELECT COUNT(*) FROM cand{r}) > 0 THEN
         CAST((SELECT COUNT(*) FROM truth t
               JOIN cand{r} c ON t.d1 = c.d1 AND t.d2 = c.d2)
              * 1000000 // (SELECT COUNT(*) FROM cand{r}) AS BIGINT)
       END AS precision_fp6
FROM tt"""
        )
    blocks_sql = ",\n".join(blocks)
    rows_sql = "\nUNION ALL\n".join(rows)
    return f"""
WITH {_SHINGLES_CTE},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(COUNT(*) AS BIGINT) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.d1, i.d2
  FROM inter i JOIN sizes s1 ON i.d1 = s1.doc_id
  JOIN sizes s2 ON i.d2 = s2.doc_id
  WHERE 3 * i.c >= s1.n + s2.n
),
tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM truth),
{blocks_sql}
{rows_sql}
"""


@register("q_lsh_band_sweep", oracle=_band_sweep_oracle())
def q_lsh_band_sweep(spark, sf_dir):
    """LSH banding-parameter sweep MEASURED on the corpus — the calibration
    a pipeline owner runs before fixing (bands, rows) for a 100 TB dedup:
    for every (b, r) with b·r = 8 — (8,1), (4,2), (2,4), (1,8) — the
    candidate-pair budget, recall, and precision against the EXACT
    J ≥ 1/2 truth set (the q_dedup_recall_comparison ground-truth
    machinery). The s-curve theory says small r catches low-similarity
    pairs (high recall, huge candidate budget) and large r the opposite;
    this query turns that theory into the measured frontier on the actual
    data, so the choice is a read-off, not a guess.

    Scale shape: ONE signature pipeline (persisted — the sweep re-bands
    the 8-hash signature, never re-hashes the corpus), one shared-shingle
    truth join (bounded by co-occurrence), and per-config banded
    group-then-enumerate candidate generation; all counts exact integers,
    ratios by integer division."""
    from pyspark.sql import functions as F

    from ..operators.dedup import lsh_candidate_pairs, minhash_signatures, word_shingles
    from .dedup import NUM_HASHES
    from .registry import T, persisted, spread

    sh = word_shingles(spread(T(spark, sf_dir, "documents")), distinct=True)
    sh = persisted(sh)  # consumers: signature agg + sizes + truth self-join
    sig = persisted(minhash_signatures(sh, num_hashes=NUM_HASHES))
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a, b = sh.alias("ta"), sh.alias("tb")
    inter = (
        a.join(
            b,
            (F.col("ta.shingle") == F.col("tb.shingle"))
            & (F.col("ta.doc_id") < F.col("tb.doc_id")),
        )
        .groupBy(F.col("ta.doc_id").alias("d1"), F.col("tb.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    truth = persisted(
        inter.join(F.broadcast(s1), "d1")
        .join(F.broadcast(s2), "d2")
        .filter(3 * F.col("c") >= F.col("n1") + F.col("n2"))
        .select("d1", "d2")
    )
    n_truth = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth")
    )
    out = None
    for r in _SWEEP_CONFIGS:
        cand = persisted(
            lsh_candidate_pairs(sig, num_hashes=NUM_HASHES, band_size=r)
        )
        n_cand = cand.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates")
        )
        n_found = truth.join(cand, ["d1", "d2"]).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_found")
        )
        row = (
            n_cand.crossJoin(F.broadcast(n_truth))
            .crossJoin(F.broadcast(n_found))
            .select(
                F.lit(r).cast("bigint").alias("band_size"),
                F.lit(NUM_HASHES // r).cast("bigint").alias("n_bands"),
                "n_candidates",
                "n_truth",
                "n_found",
                F.when(
                    F.col("n_truth") > 0,
                    F.expr("CAST(n_found * 1000000 div n_truth AS BIGINT)"),
                ).alias("recall_fp6"),
                F.when(
                    F.col("n_candidates") > 0,
                    F.expr(
                        "CAST(n_found * 1000000 div n_candidates AS BIGINT)"
                    ),
                ).alias("precision_fp6"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
