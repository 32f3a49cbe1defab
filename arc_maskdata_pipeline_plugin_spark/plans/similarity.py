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


@register("sim_ann_ivf_trained", oracle=None)  # KMeans centroids ≠ SQL-reproducible
def sim_ann_ivf_trained(spark, sf_dir):
    """IVF with KMeans-trained centroids — the production recall path. The
    quantizer isn't SQL-expressible (iterative Lloyd's), so the driver
    records a rows-only check; to make that check witness QUALITY rather
    than just shape (VERDICT r02 #6), the query returns per-query
    ``(query_id, hits, recall_at_k)`` against in-plan brute-force ground
    truth instead of the raw neighbor list. A pytest threshold guards the
    recall floor (tests/test_similarity_recall.py)."""
    from pyspark.sql import functions as F

    from ..operators.similarity import ann_ivf, ivf_centroids_kmeans

    e = T(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    cents = ivf_centroids_kmeans(e, n_cells=N_CELLS)
    ann = ann_ivf(e, queries, k=K, n_cells=N_CELLS, n_probes=N_PROBES, cents=cents)
    truth = knn_bruteforce(e, queries, k=K)
    hit_counts = (
        truth.select("query_id", "neighbor_id")
        .join(ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        truth.select("query_id")
        .distinct()
        .join(hit_counts, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("int").alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(K))
            .cast("double")
            .alias("recall_at_k"),
        )
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


@register("sim_ann_pq_trained", oracle=None)  # per-subspace KMeans ≠ SQL-reproducible
def sim_ann_pq_trained(spark, sf_dir):
    """PQ-ADC with per-subspace KMeans codebooks — the production recall
    path. Like sim_ann_ivf_trained, the rows-only driver check witnesses
    QUALITY, not just shape: returns per-query (hits, recall_at_k) against
    in-plan brute-force truth; tests/test_similarity_recall.py pins the
    floor and that training beats the deterministic codebooks."""
    from pyspark.sql import functions as F

    from ..operators.similarity import ann_pq, knn_bruteforce, pq_codebooks_kmeans

    e = T(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_QUERIES)
    ann = ann_pq(e, queries, k=K, cents=pq_codebooks_kmeans(e))
    truth = knn_bruteforce(e, queries, k=K)
    hit_counts = (
        truth.select("query_id", "neighbor_id")
        .join(ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    return (
        truth.select("query_id")
        .distinct()
        .join(hit_counts, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("hits"), F.lit(0)).cast("int").alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) / F.lit(K))
            .cast("double")
            .alias("recall_at_k"),
        )
    )
