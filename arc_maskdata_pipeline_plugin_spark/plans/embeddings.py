"""Embedding-column utilities (oracle-checked): L2 normalization and int8
quantization — the standard pre-passes before ANN indexing / storage at
100 TB (normalized vectors make cosine = dot; int8 cuts the embedding store
4× and the shuffle bytes with it).

Engine-stability: norms use the ordered-fold dot product (see
operators/dedup.py), division is elementwise IEEE double (bit-stable in both
engines), and quantization floors to integers, so every value hash-matches
DuckDB exactly.

Output shape: array columns are emitted as comma-joined STRINGS (the driver's
correctness gate canonicalizes by sorting pandas object columns, which cannot
hash raw lists — CORRECTNESS_r02 recorded both queries as errors for exactly
this). Integer arrays join directly; the unit vector joins as fixed-point
``floor(x·1e9)`` bigints because raw double→string formatting is NOT portable
across engines (Spark's Java ``Double.toString`` vs DuckDB's formatter differ
on scientific-notation thresholds and rounding), while the doubles themselves
are IEEE-identical — so the floor is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import _dot
from .registry import T, register

_DOT_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, v) -> acc + v)"
)


@register(
    "q_embedding_normalize",
    oracle=f"""
WITH e AS (
  SELECT vec_id, embedding,
         sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS nrm
  FROM embeddings
)
SELECT vec_id,
       nrm AS l2_norm,
       array_to_string(list_transform(embedding,
         x -> CAST(FLOOR(CAST(x AS DOUBLE) / nrm * 1000000000.0) AS BIGINT)),
         ',') AS unit_fp9
FROM e
""",
)
def q_embedding_normalize(spark, sf_dir):
    """Unit-normalize embeddings (projection only — no shuffle; at ingest
    this runs once so every downstream cosine becomes a plain dot).
    ``unit_fp9`` is the unit vector as comma-joined fixed-point nanounits
    (see module docstring for why not raw doubles)."""
    e = T(spark, sf_dir, "embeddings")
    nrm = F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
    return e.select(
        "vec_id",
        nrm.alias("l2_norm"),
        F.array_join(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") / nrm * F.lit(1000000000.0))
                .cast("bigint")
                .cast("string"),
            ),
            ",",
        ).alias("unit_fp9"),
    )


@register(
    "q_embedding_quantize_int8",
    oracle="""
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
  FROM embeddings
)
SELECT vec_id,
       mx AS max_abs,
       array_to_string(list_transform(embedding,
         x -> CAST(FLOOR(CAST(x AS DOUBLE) * 127.0 / mx) AS INTEGER)), ',') AS q8
FROM m
""",
)
def q_embedding_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization (floor(x·127/max|x|)): 4×
    smaller at rest and on the wire; floor keeps both engines integer-exact.
    Projection only — the scale factor rides along for dequantization.
    ``q8`` joins as a comma string so the driver gate can canonicalize it."""
    e = T(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform("embedding", lambda x: F.abs(x.cast("double"))))
    return e.select(
        "vec_id",
        mx.alias("max_abs"),
        F.array_join(
            F.transform(
                "embedding",
                lambda x: F.floor(x.cast("double") * F.lit(127.0) / mx)
                .cast("int")
                .cast("string"),
            ),
            ",",
        ).alias("q8"),
    )


MRL_DIM = 16


@register(
    "q_embedding_truncate_mrl",
    oracle=f"""
WITH t AS (
  SELECT vec_id, list_slice(embedding, 1, {MRL_DIM}) AS sub FROM embeddings
),
n AS (
  SELECT vec_id, sub,
         sqrt({_DOT_SQL.format(a='sub', b='sub')}) AS nrm
  FROM t
)
SELECT vec_id,
       nrm AS sub_norm,
       array_to_string(list_transform(sub,
         x -> CAST(FLOOR(CAST(x AS DOUBLE) / nrm * 1000000000.0) AS BIGINT)),
         ',') AS unit_fp9
FROM n
""",
)
def q_embedding_truncate_mrl(spark, sf_dir):
    """Matryoshka-style truncation: keep the first {MRL_DIM} dims and
    re-normalize — the cheap-retrieval representation for coarse ANN stages
    (full-dim rescoring happens on the candidate set only). Pure projection,
    no shuffle; fixed-point stringified like the other embedding passes."""
    e = T(spark, sf_dir, "embeddings")
    sub = F.slice(F.col("embedding"), 1, MRL_DIM)
    nrm = F.sqrt(_dot(sub, sub))
    return e.select(
        "vec_id",
        nrm.alias("sub_norm"),
        F.array_join(
            F.transform(
                sub,
                lambda x: F.floor(x.cast("double") / nrm * F.lit(1000000000.0))
                .cast("bigint")
                .cast("string"),
            ),
            ",",
        ).alias("unit_fp9"),
    )


_PCA_K = 8       # leading dims (the covariance-query convention)
_PCA_ITERS = 10  # fixed power-iteration count, unrolled in both engines


def _pca_oracle() -> str:
    k, iters = _PCA_K, _PCA_ITERS
    dims = ", ".join(
        f"CAST(floor(CAST(embedding[{i + 1}] AS DOUBLE) * 1000000) AS BIGINT) AS u{i}"
        for i in range(k)
    )
    sums = ", ".join(
        [f"CAST(COUNT(*) AS BIGINT) AS n"]
        + [f"CAST(SUM(u{i}) AS DOUBLE) AS s{i}" for i in range(k)]
        + [
            f"CAST(SUM(CAST(u{i} * u{j} AS DECIMAL(38,0))) AS DOUBLE) AS p{i}_{j}"
            for i in range(k)
            for j in range(i, k)
        ]
    )
    def pcol(i, j):
        return f"p{min(i, j)}_{max(i, j)}"
    covs = ", ".join(
        f"CAST(floor(({pcol(i, j)} / n - (s{i} / n) * (s{j} / n)) / 1000000) AS BIGINT)"
        f" AS m{i}_{j}"
        for i in range(k)
        for j in range(k)
    )
    its = []
    prev = ["1000000"] * k
    for t in range(iters):
        raw = [
            " + ".join(f"m{i}_{j} * ({prev[j]})" for j in range(k))
            for i in range(k)
        ]
        its.append(
            ", ".join(f"CAST({raw[i]} AS BIGINT) AS w{t}_{i}" for i in range(k))
        )
        mx = "GREATEST(" + ", ".join(f"ABS(w{t}_{i})" for i in range(k)) + ")"
        its.append(
            ", ".join(
                f"CAST(floor(CAST(w{t}_{i} AS DOUBLE) * 1000000 / {mx}) AS BIGINT)"
                f" AS v{t}_{i}"
                for i in range(k)
            )
        )
        prev = [f"v{t}_{i}" for i in range(k)]
    chain = ""
    step = 0
    for t in range(iters):
        chain += f", it{step} AS (SELECT *, {its[2 * t]} FROM {'cov' if t == 0 else f'it{step - 1}'})"
        step += 1
        chain += f", it{step} AS (SELECT *, {its[2 * t + 1]} FROM it{step - 1})"
        step += 1
    last = iters - 1
    stack = " UNION ALL ".join(
        f"SELECT {i} AS dim, v{last}_{i} AS loading_fp6, n FROM it{step - 1}"
        for i in range(k)
    )
    return f"""
WITH u AS (SELECT {dims} FROM embeddings),
s AS (SELECT {sums} FROM u),
cov AS (SELECT *, {covs} FROM s)
{chain}
SELECT CAST(dim AS INTEGER) AS dim, CAST(loading_fp6 AS BIGINT) AS loading_fp6,
       CAST(n AS BIGINT) AS n
FROM ({stack})
"""


@register("q_pca_top_component", oracle=_pca_oracle())
def q_pca_top_component(spark, sf_dir):
    """Top principal axis of the leading-8-dim embedding covariance by
    POWER ITERATION, engine-exact: the covariance comes from the one-pass
    exact-moment aggregate (`q_embedding_covariance`'s discipline), its
    entries floor to integer fixed-point, and ten matrix-vector iterations
    renormalize by the max absolute component with floored double
    arithmetic — the identical integer sequence in every engine.

    The iteration itself runs on the DRIVER from the collected 1-row moment
    frame (the accepted O(1)-row probe pattern — same as the BPE argmax and
    CC convergence probes): an in-plan unrolled version is equivalent but
    pays ~6s of pure Catalyst analysis for 224 nested scalar columns, all
    planner time independent of data size; the DuckDB oracle still walks
    the full unrolled recurrence independently, so the Python integer loop
    is cross-checked step for step. ONE corpus scan ends the data-dependent
    work (44 exact decimal sums cross the shuffle); the eigenproblem is
    8×8 and lives outside the corpus path — exactly how a whitening/PCA
    step runs at 100 TB."""
    import math

    k, iters = _PCA_K, _PCA_ITERS
    emb = T(spark, sf_dir, "embeddings")
    u = emb.select(
        *(
            F.floor(F.element_at("embedding", i + 1).cast("double") * 1_000_000)
            .cast("bigint")
            .alias(f"u{i}")
            for i in range(k)
        )
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    aggs += [F.sum(F.col(f"u{i}")).cast("double").alias(f"s{i}") for i in range(k)]
    aggs += [
        F.sum((F.col(f"u{i}") * F.col(f"u{j}")).cast("decimal(38,0)"))
        .cast("double")
        .alias(f"p{i}_{j}")
        for i in range(k)
        for j in range(i, k)
    ]
    row = u.agg(*aggs).collect()[0]  # O(1)-row driver probe
    n = row["n"]
    cov = [
        [
            math.floor(
                (
                    row[f"p{min(i, j)}_{max(i, j)}"] / n
                    - (row[f"s{i}"] / n) * (row[f"s{j}"] / n)
                )
                / 1_000_000
            )
            for j in range(k)
        ]
        for i in range(k)
    ]
    v = [1_000_000] * k
    for _ in range(iters):
        w = [sum(cov[i][j] * v[j] for j in range(k)) for i in range(k)]
        mx = max(abs(x) for x in w)
        # float mul/div then floor — the same IEEE ops the SQL oracle runs
        v = [math.floor(float(x) * 1_000_000 / float(mx)) for x in w]
    return spark.createDataFrame(
        [(i, v[i], n) for i in range(k)], "dim int, loading_fp6 bigint, n bigint"
    )
