"""Similarity-search queries over ``embeddings`` (oracle-checked).

Brute-force exact kNN is the correctness baseline; hyperplane-LSH ANN is the
scale path. Both use ordered-fold dot products (engine-stable floats) and the
LSH planes are md5-derived literals shared between Spark and the oracle.
"""

from __future__ import annotations

from ..operators.similarity import ann_lsh, knn_bruteforce, plane_weights
from .registry import T, register

K = 5
N_QUERIES = 10  # query set = vec_id < 10
NUM_PLANES = 6
DIM = 64

_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, v) -> acc + v)"
)

_KNN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT.format(a='q.embedding', b='c.embedding')} / (q.nrm * c.nrm) AS cosine
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) t WHERE rank <= {K}
"""


@register("sim_knn_bruteforce", oracle=_KNN_ORACLE)
def sim_knn_bruteforce(spark, sf_dir):
    from pyspark.sql import functions as F

    e = T(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return knn_bruteforce(e, queries, k=K)


def _sql_weights(ws: list[float]) -> str:
    return "[" + ", ".join(repr(w) for w in ws) + "]"


def _ann_oracle() -> str:
    planes = plane_weights(NUM_PLANES, DIM)
    bits = " || ".join(
        "CASE WHEN "
        + _DOT.format(a="embedding", b=_sql_weights(ws))
        + " >= 0 THEN '1' ELSE '0' END"
        for ws in planes
    )
    return f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm,
         {bits} AS bucket
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_DOT.format(a='q.embedding', b='c.embedding')} / (q.nrm * c.nrm) AS cosine
  FROM e q JOIN e c ON q.bucket = c.bucket AND q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) t WHERE rank <= {K}
"""


@register("sim_ann_lsh", oracle=_ann_oracle())
def sim_ann_lsh(spark, sf_dir):
    from pyspark.sql import functions as F

    e = T(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return ann_lsh(e, queries, k=K, num_planes=NUM_PLANES, dim=DIM)


N_CELLS = 16
N_PROBES = 4


def _ivf_oracle() -> str:
    return f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cent_id, embedding AS cvec, nrm AS cnrm FROM e
  WHERE vec_id < {N_CELLS}
),
assign AS (
  SELECT vec_id AS m_vec_id, cent_id AS cell FROM (
    SELECT e.vec_id, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_DOT.format(a='e.embedding', b='c.cvec')} / (e.nrm * c.cnrm) DESC,
                      c.cent_id) AS rn
    FROM e JOIN cents c ON TRUE
  ) t WHERE rn = 1
),
probes AS (
  SELECT qid AS p_query_id, cent_id AS cell FROM (
    SELECT q.vec_id AS qid, c.cent_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_DOT.format(a='q.embedding', b='c.cvec')} / (q.nrm * c.cnrm) DESC,
                      c.cent_id) AS rn
    FROM e q JOIN cents c ON q.vec_id < {N_QUERIES}
  ) t WHERE rn <= {N_PROBES}
),
cand AS (
  SELECT p.p_query_id AS query_id, a.m_vec_id AS neighbor_id
  FROM probes p JOIN assign a ON p.cell = a.cell
  WHERE p.p_query_id <> a.m_vec_id
),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         {_DOT.format(a='q.embedding', b='c.embedding')} / (q.nrm * c.nrm) AS cosine
  FROM cand
  JOIN e q ON cand.query_id = q.vec_id
  JOIN e c ON cand.neighbor_id = c.vec_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
  FROM scored
) t WHERE rank <= {K}
"""


@register("sim_ann_ivf", oracle=_ivf_oracle())
def sim_ann_ivf(spark, sf_dir):
    from pyspark.sql import functions as F

    from ..operators.similarity import ann_ivf

    e = T(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return ann_ivf(e, queries, k=K, n_cells=N_CELLS, n_probes=N_PROBES)


def trained_recall_frame(ann, truth):
    """Per-query recall of an ANN result against brute-force ground truth:
    ``(query_id, hits, recall_at_k)``. Both inputs are query-set-sized
    (N_QUERIES·K rows), so every join here is broadcast-trivial at any
    corpus scale."""
    from pyspark.sql import functions as F

    hit_counts = (
        truth.select("query_id", "neighbor_id")
        .join(
            F.broadcast(ann.select("query_id", "neighbor_id")),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        truth.select("query_id")
        .distinct()
        .join(F.broadcast(hit_counts), "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("int").alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(K))
            .cast("double")
            .alias("recall_at_k"),
        )
    )


def _recall_audit_row(per_query, floor_x100: int):
    """Collapse the per-query recall frame into ONE engine-deterministic
    audit row (VERDICT r07 #4, the ``q_minhash_estimate_error`` pattern):
    the KMeans-trained recall values stay in-plan; what's EMITTED is the
    deterministic scaffolding (query count, k, truth-pair count) plus an
    exact-integer verdict ``Σhits·100 ≥ floor_x100·n_queries·K`` that the
    DuckDB oracle pins to 1. The floor is deliberately conservative (pytest
    keeps the tight per-SF thresholds) so seed-42 KMeans jitter across
    partitionings can never flip the gate."""
    from pyspark.sql import functions as F

    return per_query.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        F.lit(K).cast("bigint").alias("k"),
        (F.count(F.lit(1)) * K).cast("bigint").alias("truth_pairs"),
        F.lit(floor_x100).cast("bigint").alias("recall_floor_x100"),
        F.when(
            F.sum("hits") * 100 >= F.lit(floor_x100) * F.count(F.lit(1)) * K, 1
        )
        .otherwise(0)
        .cast("bigint")
        .alias("mean_recall_ge_floor"),
    )


def _recall_audit_oracle(floor_x100: int) -> str:
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST({K} AS BIGINT) AS k,
       CAST(COUNT(*) * {K} AS BIGINT) AS truth_pairs,
       CAST({floor_x100} AS BIGINT) AS recall_floor_x100,
       CAST(1 AS BIGINT) AS mean_recall_ge_floor
FROM embeddings WHERE vec_id < {N_QUERIES}
"""


IVF_TRAINED_FLOOR_X100 = 30  # observed mean recall 0.52–0.66 across sf0.001–0.1
PQ_TRAINED_FLOOR_X100 = 5  # observed mean recall 0.12–0.30 across sf0.001–0.1


def sim_ann_ivf_trained_per_query(spark, sf_dir):
    """Per-query recall detail for the trained-IVF path (pytest surface)."""
    from pyspark.sql import functions as F

    from ..operators.similarity import ann_ivf, ivf_centroids_kmeans

    e = T(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    cents = ivf_centroids_kmeans(e, n_cells=N_CELLS)
    ann = ann_ivf(e, queries, k=K, n_cells=N_CELLS, n_probes=N_PROBES, cents=cents)
    truth = knn_bruteforce(e, queries, k=K)
    return trained_recall_frame(ann, truth)


@register("sim_ann_ivf_trained", oracle=_recall_audit_oracle(IVF_TRAINED_FLOOR_X100))
def sim_ann_ivf_trained(spark, sf_dir):
    """IVF with KMeans-trained centroids — the production recall path. The
    quantizer isn't SQL-expressible (iterative Lloyd's), so instead of a
    rows-only record the query emits a HASH-ORACLED recall audit (VERDICT
    r07 #4): per-query recall@k against in-plan brute-force truth collapses
    to one deterministic row whose verdict pins mean recall ≥ 0.30 (actual:
    0.52–0.66). tests/test_similarity_recall.py keeps the tight per-SF
    floors on the per-query frame."""
    return _recall_audit_row(
        sim_ann_ivf_trained_per_query(spark, sf_dir), IVF_TRAINED_FLOOR_X100
    )


# ---------------------------------------------------------------------------
# Product quantization — the only fully ORACLE-CHECKED PQ path: deterministic
# codebooks (subvectors of the first PQ_KSUB unit vectors) make encode + ADC
# reproducible in DuckDB list algebra.
# ---------------------------------------------------------------------------

from ..operators.similarity import PQ_DSUB, PQ_KSUB, PQ_M, ann_pq  # noqa: E402


def _pq_oracle() -> str:
    sub_d = (
        "list_reduce(list_transform(range(mm.m*{ds}+1, mm.m*{ds}+{ds}+1), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (acc, x) -> acc + x)"
    )
    return f"""
WITH n AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
u AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE) / nrm) AS u
  FROM n
),
cents AS (SELECT vec_id AS cent_id, u AS cu FROM u WHERE vec_id < {PQ_KSUB}),
mm AS (SELECT unnest(range({PQ_M})) AS m),
enc_long AS (
  SELECT v.vec_id, c.cent_id, mm.m,
         {sub_d.format(ds=PQ_DSUB, a='v.u', b='c.cu')} AS d
  FROM u v CROSS JOIN cents c CROSS JOIN mm
),
codes AS (
  SELECT vec_id, list(code ORDER BY m) AS codes FROM (
    SELECT vec_id, m, cent_id AS code,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY d, cent_id) AS rn
    FROM enc_long
  ) t WHERE rn = 1 GROUP BY vec_id
),
qtab AS (
  SELECT vec_id AS query_id, list(d ORDER BY m, cent_id) AS tab
  FROM enc_long WHERE vec_id < {N_QUERIES} GROUP BY vec_id
),
scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         list_reduce(list_transform(range({PQ_M}),
           m -> q.tab[m * {PQ_KSUB} + v.codes[m + 1] + 1]),
           (acc, x) -> acc + x) AS approx_dist
  FROM codes v CROSS JOIN qtab q
  WHERE q.query_id <> v.vec_id
)
SELECT query_id, neighbor_id, approx_dist, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY approx_dist, neighbor_id) AS INTEGER) AS rank
  FROM scored
) t WHERE rank <= {K}
"""


@register("sim_ann_pq", oracle=_pq_oracle())
def sim_ann_pq(spark, sf_dir):
    """PQ-ADC top-{K}: 16× compressed codes scanned with per-query lookup
    tables. Deterministic codebooks → the whole encode/ADC path hash-matches
    the DuckDB oracle; per-subspace KMeans slots into the same seam for
    production recall (see operators.similarity.pq_codebooks)."""
    from pyspark.sql import functions as F

    e = T(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    return ann_pq(e, queries, k=K)


def sim_ann_pq_trained_per_query(spark, sf_dir):
    """Per-query recall detail for the trained-PQ path (pytest surface)."""
    from pyspark.sql import functions as F

    from ..operators.similarity import ann_pq, knn_bruteforce, pq_codebooks_kmeans

    e = T(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    ann = ann_pq(e, queries, k=K, cents=pq_codebooks_kmeans(e))
    truth = knn_bruteforce(e, queries, k=K)
    return trained_recall_frame(ann, truth)


@register("sim_ann_pq_trained", oracle=_recall_audit_oracle(PQ_TRAINED_FLOOR_X100))
def sim_ann_pq_trained(spark, sf_dir):
    """PQ-ADC with per-subspace KMeans codebooks — the production recall
    path. Like sim_ann_ivf_trained, now a HASH-ORACLED recall audit
    (VERDICT r07 #4): the emitted row pins mean recall@k ≥ 0.05 with exact
    integer arithmetic (actual: 0.12–0.30 — PQ trades recall for 16×
    compression, so the honest floor is modest). The per-query frame keeps
    the tight thresholds in tests/test_similarity_recall.py."""
    return _recall_audit_row(
        sim_ann_pq_trained_per_query(spark, sf_dir), PQ_TRAINED_FLOOR_X100
    )


# ---------------------------------------------------------------------------
# Hubness audit (Radovanović et al., JMLR 2010): the k-occurrence histogram.
# ---------------------------------------------------------------------------

_HUB_MOD = 4  # deterministic audit sample: vec_id % 4 == 0
_HUB_K = 5

_HUBNESS_ORACLE = f"""
WITH s AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings WHERE vec_id % {_HUB_MOD} = 0
),
topk AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_DOT.format(a='q.embedding', b='c.embedding')}
                      / (q.nrm * c.nrm) DESC, c.vec_id) AS rank
    FROM s q JOIN s c ON q.vec_id <> c.vec_id
  ) t WHERE rank <= {_HUB_K}
),
occ AS (
  SELECT s.vec_id, CAST(COALESCE(o.nk, 0) AS BIGINT) AS k_occurrences
  FROM s LEFT JOIN (
    SELECT neighbor_id, COUNT(*) AS nk FROM topk GROUP BY neighbor_id
  ) o ON s.vec_id = o.neighbor_id
)
SELECT k_occurrences, CAST(COUNT(*) AS BIGINT) AS n_points
FROM occ GROUP BY k_occurrences
"""


@register("q_hubness_audit", oracle=_HUBNESS_ORACLE)
def q_hubness_audit(spark, sf_dir):
    """Embedding-space HUBNESS audit (Radovanović et al., 'Hubs in Space',
    JMLR 2010): the k-occurrence histogram — for every audited vector x,
    N_k(x) = how many other audited vectors list x among their top-{k}
    cosine neighbors; the output is the distribution (k_occurrences →
    n_points). A healthy embedding space is near-binomial around k; heavy
    right tails (hubs: N_k >> k) and a mass at 0 (anti-hubs, unreachable
    by retrieval) are the standard symptom of degenerate/anisotropic
    embeddings and silently skew every kNN-based curation step (semdedup,
    hard-negative mining, ANN recall).

    Scale shape: the audit runs on a DETERMINISTIC sample (vec_id %
    {mod} = 0) — hubness is a distributional property, so a fixed-rate
    sample estimates it; the sample's brute-force top-k is |S|² dot
    products, the knob that keeps the audit O((N/{mod})²) instead of
    O(N²) at 100 TB (tighten the modulus as the corpus grows). Exact
    integer histogram — hash-oracled end to end."""
    from pyspark.sql import functions as F

    e = T(spark, sf_dir, "embeddings").filter(F.col("vec_id") % _HUB_MOD == 0)
    topk = knn_bruteforce(e, e, k=_HUB_K)
    occ = (
        topk.groupBy("neighbor_id")
        .agg(F.count(F.lit(1)).alias("nk"))
    )
    ids = e.select("vec_id")
    nk = ids.join(
        F.broadcast(occ), ids.vec_id == occ.neighbor_id, "left"
    ).select(F.coalesce(F.col("nk"), F.lit(0)).cast("bigint").alias("k_occurrences"))
    return nk.groupBy("k_occurrences").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )


# ---------------------------------------------------------------------------
# Margin-based pair mining (Artetxe & Schwenk, ACL 2019 — ratio margin).
# ---------------------------------------------------------------------------

_MARGIN_K = 4  # neighborhood size for the margin denominator
_MARGIN_T = 1.05  # accept threshold on the ratio margin
_MARGIN_NQ = 40  # query ids bounded below this (even ids only -> 20 queries)

_MARGIN_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
q AS (SELECT * FROM e WHERE vec_id % 2 = 0 AND vec_id < {_MARGIN_NQ}),
c AS (SELECT * FROM e WHERE vec_id % 2 = 1),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS matched_id,
         {_DOT.format(a='q.embedding', b='c.embedding')} / (q.nrm * c.nrm)
           AS cosine
  FROM q JOIN c ON TRUE
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, matched_id) AS INTEGER) AS rnk
  FROM scored
),
top AS (SELECT * FROM ranked WHERE rnk <= {_MARGIN_K}),
denom AS (
  SELECT query_id,
         list_reduce(list(cosine ORDER BY rnk), (a, b) -> a + b)
           / {_MARGIN_K} AS d
  FROM top GROUP BY query_id
)
SELECT b.query_id, b.matched_id, b.cosine,
       b.cosine / d.d AS margin,
       CAST(CASE WHEN b.cosine / d.d > {_MARGIN_T} THEN 1 ELSE 0 END AS BIGINT)
         AS accepted
FROM top b JOIN denom d ON b.query_id = d.query_id
WHERE b.rnk = 1
"""


@register("q_margin_mining_pairs", oracle=_MARGIN_ORACLE)
def q_margin_mining_pairs(spark, sf_dir):
    """Margin-based pair mining (Artetxe & Schwenk 2019, the bitext-mining
    criterion — r09): split the embedding table into two collections (even
    vs odd vec_id, standing in for two languages/sources) and, for each
    bounded-set query on side A, take its best cosine match on side B and
    score it by the RATIO MARGIN — best cosine divided by the mean of its
    top-{k} neighborhood. A raw-cosine threshold fires in dense hubs and
    misses in sparse regions; the margin normalizes by the local
    neighborhood density, which is why mining pipelines use it. Pairs with
    margin > {t} are accepted.

    Engine-exactness: cosines are ordered-fold dot products (bit-identical
    across engines, the sim_knn_bruteforce seam) and the denominator sums
    the top-{k} cosines IN RANK ORDER via an ordered fold — never a
    distributed AVG whose summation order could differ.

    Scale shape: identical to knn_bruteforce — the bounded query set
    broadcasts against the corpus side (production swaps the cross join
    for the IVF/LSH candidate join, same downstream margin machinery);
    ranking and the {k}-row-per-query denominator run on the query-grain
    frame.""".format(k=_MARGIN_K, t=_MARGIN_T)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.dedup import _dot, with_norm

    e = T(spark, sf_dir, "embeddings")
    q = with_norm(
        e.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < _MARGIN_NQ))
        .select("vec_id", "embedding")
    ).alias("q")
    c = with_norm(
        e.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    ).alias("c")
    cos = _dot(F.col("q.embedding"), F.col("c.embedding")) / (
        F.col("q._norm") * F.col("c._norm")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col("q.vec_id").alias("query_id"),
        F.col("c.vec_id").alias("matched_id"),
        cos.alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("matched_id")
    )
    top = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= _MARGIN_K
    )
    denom = top.groupBy("query_id").agg(
        (
            F.aggregate(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("rnk", "cosine"))
                    ),
                    lambda s: s.cosine,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / _MARGIN_K
        ).alias("d")
    )
    return (
        top.filter(F.col("rnk") == 1)
        .join(F.broadcast(denom), "query_id")
        .select(
            "query_id",
            "matched_id",
            "cosine",
            (F.col("cosine") / F.col("d")).alias("margin"),
            F.when(F.col("cosine") / F.col("d") > _MARGIN_T, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("accepted"),
        )
    )


# --- Johnson-Lindenstrauss projection audit --------------------------------

_JL_M = 16  # target dimensionality
_JL_MOD = 25  # deterministic pair sample: vec_id % 25 == 0


def _jl_signs() -> list[list[int]]:
    """±1 sign matrix s[j][i], deterministic from md5 — computed ONCE in
    Python and inlined as identical literal expressions into both engines
    (the EWMA weight-table discipline)."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"jl-{j}-{i}".encode()).hexdigest()[:8], 16) % 2
            == 0
            else -1
            for i in range(DIM)
        ]
        for j in range(_JL_M)
    ]


def _jl_proj_terms(signs, idx):
    """Signed-sum expression strings for Y_j; `idx` maps dim i to the
    engine's array subscript (Spark 0-based, DuckDB 1-based)."""
    exprs = []
    for j in range(_JL_M):
        terms = "".join(
            ("+" if s > 0 else "-") + f"x6[{idx(i)}]"
            for i, s in enumerate(signs[j])
        )
        exprs.append("(" + terms.lstrip("+") + ")")
    return exprs


_JL_SIGNS = _jl_signs()
_JL_Y_SPARK = _jl_proj_terms(_JL_SIGNS, lambda i: i)
_JL_Y_SQL = _jl_proj_terms(_JL_SIGNS, lambda i: i + 1)

_JL_ORACLE = f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding,
                        e -> CAST(floor(CAST(e AS DOUBLE) * 1000000)
                                  AS BIGINT)) AS x6
  FROM embeddings WHERE vec_id % {_JL_MOD} = 0
),
proj AS (
  SELECT vec_id, x6,
         [{", ".join(_JL_Y_SQL)}] AS y
  FROM base
),
pairs AS (
  SELECT a.vec_id AS v1, b.vec_id AS v2,
         CAST(list_reduce(list_transform(list_zip(a.x6, b.x6),
              p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, v) -> acc + v)
              AS BIGINT) AS d2x,
         CAST(list_reduce(list_transform(list_zip(a.y, b.y),
              p -> (p[1] - p[2]) * (p[1] - p[2])), (acc, v) -> acc + v)
              AS BIGINT) AS d2y
  FROM proj a JOIN proj b ON a.vec_id < b.vec_id
),
scored AS (
  SELECT v1, v2, d2x, d2y,
         CAST(CAST(d2y AS HUGEINT) * 1000000 // ({_JL_M} * CAST(d2x AS HUGEINT))
              AS BIGINT) AS ratio_fp6
  FROM pairs WHERE d2x > 0
)
SELECT v1, v2, d2x, d2y, ratio_fp6,
       CAST(SUM(ratio_fp6) OVER () // COUNT(*) OVER () AS BIGINT)
         AS mean_ratio_fp6
FROM scored
"""


@register("q_jl_projection_audit", oracle=_JL_ORACLE)
def q_jl_projection_audit(spark, sf_dir):
    """Johnson-Lindenstrauss distance preservation measured, not assumed:
    project the fp6 fixed-point embeddings 64 → 16 dims with a
    deterministic ±1 sign matrix (Achlioptas 2003 — database-friendly JL;
    E[‖Sx‖²] = m·‖x‖²) and emit, for every sampled pair, the squared-
    distance ratio ‖Sy−Sx‖²/(m·‖y−x‖²) plus the sample mean. The audit a
    team runs before swapping full-precision vectors for a cheap projected
    prefilter (the coarse stage next to q_embedding_truncate_mrl's MRL
    truncation and sim_ann_pq's product quantization). No envelope is
    pinned — at m = 16 the per-pair deviation is large by design
    (σ ≈ √(2/m) ≈ 0.35); the VALUES are the audit, hash-checked
    cross-engine since everything is exact integer arithmetic.

    Scale shape: the projection is a pure per-row expression (16 signed
    sums — codegen); the pair join runs on the DETERMINISTIC modulus
    sample (vec_id % {_JL_MOD} = 0), the q_hubness_audit bounding pattern —
    production would JL-project the full corpus (linear) and audit on the
    sample (quadratic only there)."""
    from pyspark.sql import functions as F

    e = T(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % _JL_MOD == 0
    )
    base = e.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " e -> CAST(floor(CAST(e AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("x6"),
    )
    proj = base.select(
        "vec_id", "x6", F.expr(f"array({', '.join(_JL_Y_SPARK)})").alias("y")
    )
    a, b = proj.alias("a"), proj.alias("b")
    d2 = (
        "CAST(aggregate(zip_with({l}, {r}, (p, q) -> (p - q) * (p - q)),"
        " 0L, (acc, v) -> acc + v) AS BIGINT)"
    )
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("v1"),
        F.col("b.vec_id").alias("v2"),
        F.expr(d2.format(l="a.x6", r="b.x6")).alias("d2x"),
        F.expr(d2.format(l="a.y", r="b.y")).alias("d2y"),
    )
    scored = pairs.filter(F.col("d2x") > 0).select(
        "v1",
        "v2",
        "d2x",
        "d2y",
        F.expr(
            f"CAST(CAST(d2y AS DECIMAL(38,0)) * 1000000"
            f" div ({_JL_M} * CAST(d2x AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("ratio_fp6"),
    )
    return scored.select(
        "*",
        F.expr(
            "CAST(SUM(ratio_fp6) OVER () div COUNT(*) OVER () AS BIGINT)"
        ).alias("mean_ratio_fp6"),
    )


# --- reciprocal best match (mutual nearest neighbors) -----------------------

_RBM_NA = 100  # collection A = even vec_ids below this bound


_RBM_ORACLE = f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
),
ca AS (SELECT * FROM e WHERE vec_id % 2 = 0 AND vec_id < {_RBM_NA}),
cb AS (SELECT * FROM e WHERE vec_id % 2 = 1),
scored AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         {_DOT.format(a='a.embedding', b='b.embedding')} / (a.nrm * b.nrm)
           AS cosine
  FROM ca a JOIN cb b ON TRUE
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY a_id
                            ORDER BY cosine DESC, b_id) AS rka,
         ROW_NUMBER() OVER (PARTITION BY b_id
                            ORDER BY cosine DESC, a_id) AS rkb
  FROM scored
),
mut AS (
  SELECT a_id, b_id, cosine FROM r WHERE rka = 1 AND rkb = 1
),
na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a FROM ca)
SELECT m.a_id, m.b_id, m.cosine,
       CAST(COUNT(*) OVER () AS BIGINT) AS n_mutual,
       CAST(COUNT(*) OVER () * 1000000 // MAX(na.n_a) OVER () AS BIGINT)
         AS mutual_share_fp6
FROM mut m, na
"""


@register("q_reciprocal_best_match", oracle=_RBM_ORACLE)
def q_reciprocal_best_match(spark, sf_dir):
    """Mutual-nearest-neighbor pair mining: split the embeddings into two
    collections (even ids < bound vs odd — standing in for two languages /
    two snapshots) and keep pairs where each side is the OTHER's cosine
    top-1. The classic high-precision bitext/alignment criterion (the
    conservative sibling of q_margin_mining_pairs' ratio margin — RBM
    rejects hubs structurally because a hub can be best-for-many but has
    only ONE best itself). Emits each mutual pair plus the mutual share of
    collection A — the alignment-quality one-number readout.

    Exactness: ordered-fold cosines (the sim_knn_bruteforce seam), both
    argmaxes deterministically tie-broken; the share is an integer
    division. Scale shape: ONE bounded cross join scores A × B; both
    directions' argmaxes are two windows over that same scored frame —
    nothing is computed twice; at scale the cross join swaps for the
    IVF/LSH candidate join (the q_margin_mining_pairs seam) and the
    windows are unchanged."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.dedup import _dot, with_norm

    e = T(spark, sf_dir, "embeddings")
    a = with_norm(
        e.filter((F.col("vec_id") % 2 == 0) & (F.col("vec_id") < _RBM_NA))
        .select("vec_id", "embedding")
    ).alias("a")
    b = with_norm(
        e.filter(F.col("vec_id") % 2 == 1).select("vec_id", "embedding")
    ).alias("b")
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a._norm") * F.col("b._norm")
    )
    scored = b.crossJoin(F.broadcast(a)).select(
        F.col("a.vec_id").alias("a_id"),
        F.col("b.vec_id").alias("b_id"),
        cos.alias("cosine"),
    )
    wa = Window.partitionBy("a_id").orderBy(F.desc("cosine"), F.asc("b_id"))
    wb = Window.partitionBy("b_id").orderBy(F.desc("cosine"), F.asc("a_id"))
    mut = (
        scored.withColumn("rka", F.row_number().over(wa))
        .withColumn("rkb", F.row_number().over(wb))
        .filter((F.col("rka") == 1) & (F.col("rkb") == 1))
        .select("a_id", "b_id", "cosine")
    )
    na = a.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("n_a"))
    return mut.crossJoin(F.broadcast(na)).select(
        "a_id",
        "b_id",
        "cosine",
        F.expr("CAST(COUNT(*) OVER () AS BIGINT)").alias("n_mutual"),
        F.expr(
            "CAST(COUNT(*) OVER () * 1000000 div MAX(n_a) OVER () AS BIGINT)"
        ).alias("mutual_share_fp6"),
    )
