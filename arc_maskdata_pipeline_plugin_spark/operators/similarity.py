"""Similarity search over embedding columns (``array<float>``).

* ``knn_bruteforce`` — exact top-k by cosine: broadcast the (small) query
  set against the corpus, rank per query. The corpus side streams — no n²
  shuffle; cost is (|queries| × |corpus|) dot products, all JVM-side.
* ``ann_lsh`` — random-hyperplane LSH: hyperplane components are derived
  deterministically from md5 (portable to the DuckDB oracle, seedable), docs
  and queries hash to sign-pattern buckets, candidates come from the bucket
  equi-join. This is the 100 TB path: bucket join instead of cross join.
* ``ann_ivf`` — inverted-file ANN with a deterministic coarse quantizer
  (KMeans-trained centroids slot in without changing the assignment/probe
  machinery; determinism keeps the scale path oracle-checkable).

Dot products use an ordered fold (see dedup.py) so results are bit-identical
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _dot, with_norm


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (ties → lower id)."""
    c = with_norm(corpus.select(id_col, vec)).alias("c")
    q = with_norm(queries.select(id_col, vec)).alias("q")
    cos = _dot(F.col(f"q.{vec}"), F.col(f"c.{vec}")) / (
        F.col("q._norm") * F.col("c._norm")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col(f"q.{id_col}").alias("query_id"),
        F.col(f"c.{id_col}").alias("neighbor_id"),
        cos.alias("cosine"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def plane_weights(num_planes: int = 8, dim: int = 64, seed: str = "lsh") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) = first hex
    digit of md5('{seed}:{p}:{d}') − 7.5. Reproducible in any engine (or
    plain Python, as here) — the weights become literals in the plan."""
    import hashlib

    return [
        [int(hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()[0], 16) - 7.5 for d in range(dim)]
        for p in range(num_planes)
    ]


def hyperplane_sign_bits(vec_col, num_planes: int = 8, dim: int = 64, seed: str = "lsh"):
    """Sign-pattern bucket string for a vector under deterministic planes."""
    bits = []
    for ws in plane_weights(num_planes, dim, seed):
        warr = F.array(*[F.lit(w) for w in ws])
        proj = F.aggregate(
            F.zip_with(vec_col, warr, lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    k: int = 5,
    num_planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    bucket = hyperplane_sign_bits(F.col(vec), num_planes, dim)
    c = with_norm(corpus.select(id_col, vec)).withColumn("bucket", bucket).alias("c")
    q = with_norm(queries.select(id_col, vec)).withColumn("bucket", bucket).alias("q")
    cos = _dot(F.col(f"q.{vec}"), F.col(f"c.{vec}")) / (
        F.col("q._norm") * F.col("c._norm")
    )
    scored = (
        c.join(F.broadcast(q), F.col("c.bucket") == F.col("q.bucket"))
        .select(
            F.col(f"q.{id_col}").alias("query_id"),
            F.col(f"c.{id_col}").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_cells: int = 16,
) -> DataFrame:
    """Coarse quantizer centroids, seeded deterministically (the vectors with
    ``id < n_cells``) instead of KMeans-trained — the TRAINING is pluggable
    (swap in ``pyspark.ml.clustering.KMeans`` centroids in production); the
    assignment/probe machinery that must scale is identical and, being
    deterministic, oracle-checkable. Persist this tiny frame alongside the
    assignment store — probes must use the SAME centroids as assignment."""
    return (
        with_norm(corpus.filter(F.col(id_col) < n_cells).select(id_col, vec))
        .select(
            F.col(id_col).alias("cent_id"),
            F.col(vec).alias("cvec"),
            F.col("_norm").alias("cnrm"),
        )
        .alias("cents")
    )


def ivf_centroids_kmeans(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """KMeans-TRAINED coarse quantizer — the production recall path, plugged
    into the same seam as the deterministic ``ivf_centroids`` (VERDICT r01
    next-round #4): the returned frame has the identical (cent_id, cvec,
    cnrm) shape, so assignment/probe machinery is unchanged.

    Training cost is one ``pyspark.ml`` KMeans fit (distributed Lloyd's, a
    few corpus passes) — at 100 TB you fit on a sample
    (``corpus.sample(...)``), which is standard IVF practice; assignment of
    the full corpus remains the one broadcast pass in ``ivf_assignments``.
    Trained centroids track the data distribution, so cells are balanced and
    recall at a fixed n_probes dominates the arbitrary-seed quantizer
    (tests/test_similarity_recall.py asserts exactly that)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(array_to_vector(F.col(vec).cast("array<double>")).alias("features"))
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    spark = corpus.sparkSession
    rows = [
        (i, [float(x) for x in center]) for i, center in enumerate(model.clusterCenters())
    ]
    cents = spark.createDataFrame(rows, f"cent_id int, cvec array<double>")
    return (
        with_norm(cents, "cvec")
        .select("cent_id", "cvec", F.col("_norm").alias("cnrm"))
        .alias("cents")
    )


def ivf_assignments(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid → (vec_id, cell).

    One broadcast pass over the corpus. At 100 TB this runs ONCE at ingest
    and lands as a store partitioned/bucketed by ``cell`` (see
    ``operators.joins.write_bucketed``), so query-time probing touches only
    the probed cells' files instead of re-quantizing the corpus per query.
    """
    c = with_norm(corpus.select(id_col, vec)).alias("c")
    sim_to_cent = _dot(F.col(f"c.{vec}"), F.col("cents.cvec")) / (
        F.col("c._norm") * F.col("cents.cnrm")
    )
    # argmax via max_by hash-aggregate, NOT a row_number window: the window
    # shape sort-shuffles corpus×n_cells rows, while max_by partial-aggregates
    # map-side so only corpus-many rows reach the shuffle — the difference
    # between O(corpus·cells) and O(corpus) shuffle bytes at 100 TB. Ordering
    # key (sim, -cent_id) reproduces the window's tiebreak (max sim, then MIN
    # cent_id) exactly, so the DuckDB oracle still hash-matches.
    return (
        c.crossJoin(F.broadcast(cents))
        .select(
            F.col(f"c.{id_col}").alias("m_vec_id"), "cent_id", sim_to_cent.alias("sim")
        )
        .groupBy("m_vec_id")
        .agg(
            F.expr("max_by(cent_id, struct(sim, -cent_id))").alias("cell")
        )
    )


def ann_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probes: int = 4,
    assignments: DataFrame | None = None,
    cents: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into cells around coarse
    centroids; a query scores only the ``n_probes`` nearest cells.

    Pass precomputed ``assignments``/``cents`` (from ``ivf_assignments`` /
    ``ivf_centroids``, persisted at ingest) to skip quantization entirely —
    the production shape. Without them, both are computed inline (the
    oracle-checked path).

    Scale shape: assignment is one broadcast-join pass over the corpus (cells
    table is tiny); candidate generation shuffles on ``cell``, so each query
    touches ``n_probes`` partitions instead of the whole corpus — the IVF
    trade: recall for a |corpus|/n_cells × n_probes candidate bound.
    """
    c = with_norm(corpus.select(id_col, vec)).alias("c")
    if cents is None:
        cents = ivf_centroids(corpus, id_col, vec, n_cells)
    assign = (
        assignments
        if assignments is not None
        else ivf_assignments(corpus, cents, id_col, vec)
    )
    q = with_norm(queries.select(id_col, vec)).alias("q")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            F.col(f"q.{id_col}").alias("p_query_id"),
            "cent_id",
            (
                _dot(F.col(f"q.{vec}"), F.col("cents.cvec"))
                / (F.col("q._norm") * F.col("cents.cnrm"))
            ).alias("sim"),
        )
        .withColumn("rn", F.row_number().over(Window.partitionBy("p_query_id").orderBy(F.desc("sim"), F.asc("cent_id"))))
        .filter(F.col("rn") <= n_probes)
        .select("p_query_id", F.col("cent_id").alias("cell"))
    )
    # probes is query-set-sized (N_QUERIES × n_probes rows) — BROADCAST it
    # into the corpus-sized assignment frame, or Spark sort-merge-joins the
    # corpus by cell (a full corpus shuffle the probe never needs)
    cand = F.broadcast(probes).join(assign, "cell").select(
        F.col("p_query_id").alias("query_id"), F.col("m_vec_id").alias("neighbor_id")
    )
    cos = _dot(F.col(f"q.{vec}"), F.col(f"c.{vec}")) / (F.col("q._norm") * F.col("c._norm"))
    scored = (
        cand.join(F.broadcast(q), F.col("query_id") == F.col(f"q.{id_col}"))
        .join(c, F.col("neighbor_id") == F.col(f"c.{id_col}"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — ADC (asymmetric distance computation) ANN.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces
PQ_DSUB = 8  # dims per subspace (PQ_M * PQ_DSUB = embedding dim)
PQ_KSUB = 16  # centroids per subspace → 4-bit codes


def _unit(df: DataFrame, id_col: str = "vec_id", vec: str = "embedding") -> DataFrame:
    """(id, u) — L2-normalized double vector, so squared-L2 ranking on codes
    is monotone with cosine ranking on the originals."""
    n = with_norm(df.select(id_col, vec))
    return n.select(
        id_col,
        F.transform(F.col(vec), lambda x: x.cast("double") / F.col("_norm")).alias("u"),
    )


def _subspace_dist(a, b, m: int):
    """Ordered-fold squared L2 over subspace m's dims (1-based element_at)."""
    lo = m * PQ_DSUB + 1
    return F.aggregate(
        F.sequence(F.lit(lo), F.lit(lo + PQ_DSUB - 1)),
        F.lit(0.0),
        lambda acc, i: acc
        + (F.element_at(a, i) - F.element_at(b, i))
        * (F.element_at(a, i) - F.element_at(b, i)),
    )


def pq_codebooks(corpus: DataFrame, id_col: str = "vec_id", vec: str = "embedding") -> DataFrame:
    """Deterministic per-subspace codebooks: centroid j of every subspace is
    the j-th corpus vector's (unit) subvector — the same pluggable seam as
    ``ivf_centroids`` (swap in per-subspace KMeans for production recall;
    the encode/ADC machinery below is unchanged and, being deterministic,
    oracle-checkable). Returns (cent_id, cu) with cu the full unit vector;
    subspace slices are taken at use sites."""
    return _unit(corpus.filter(F.col(id_col) < PQ_KSUB), id_col, vec).select(
        F.col(id_col).alias("cent_id"), F.col("u").alias("cu")
    )


def _pair_subspace_dists(vecs: DataFrame, cents: DataFrame, out_id: str) -> DataFrame:
    """(out_id, cent_id, m, d) for every (vector, centroid, subspace)."""
    pairs = vecs.crossJoin(F.broadcast(cents))
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(m).alias("m"),
                    _subspace_dist(F.col("u"), F.col("cu"), m).alias("d"),
                )
                for m in range(PQ_M)
            ]
        )
    )
    return pairs.select(
        F.col("vec_id").alias(out_id), "cent_id", stacked.alias("md")
    ).select(out_id, "cent_id", F.col("md.m").alias("m"), F.col("md.d").alias("d"))


def pq_encode(corpus: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, codes) — codes[m] = argmin-distance centroid of subspace m
    (ties → lower cent_id). The argmin is a min_by hash-aggregate (map-side
    partial), not a window sort; at 100 TB encode runs once at ingest and the
    4-bit-per-subspace codes (PQ_M bytes/vector vs 4·dim) are what query-time
    scans read — the 16× memory compression is the point of PQ."""
    dists = _pair_subspace_dists(_unit(corpus), cents, "vec_id")
    per_m = dists.groupBy("vec_id", "m").agg(
        F.expr("min_by(cent_id, struct(d, cent_id))").alias("code")
    )
    return per_m.groupBy("vec_id").agg(
        F.expr("transform(array_sort(collect_list(struct(m, code))), s -> s.code)").alias(
            "codes"
        )
    )


def ann_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    cents: DataFrame | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ-ADC approximate top-k by squared L2 on unit vectors (≡ cosine
    ranking). Per query: one tiny distance table (PQ_M × PQ_KSUB entries to
    the broadcast codebooks), then a scan of the codes relation doing PQ_M
    table lookups per candidate — no full-width vector math in the scan, the
    classic IVF-ADC inner loop. Pass persisted ``cents``/``codes`` (ingest
    artifacts) to skip encoding; both default to inline computation (the
    oracle-checked path)."""
    if cents is None:
        cents = pq_codebooks(corpus)
    if codes is None:
        codes = pq_encode(corpus, cents)
    qtab = (
        _pair_subspace_dists(_unit(queries), cents, "query_id")
        .groupBy("query_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(m, cent_id, d))), s -> s.d)"
            ).alias("tab")
        )
    )
    scored = (
        codes.crossJoin(F.broadcast(qtab))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                f"aggregate(sequence(0, {PQ_M - 1}), cast(0.0 as double), "
                "(acc, m) -> acc + element_at(tab, cast("
                f"m * {PQ_KSUB} + element_at(codes, m + 1) + 1 as int)))"
            ).alias("approx_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_dist"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


def pq_codebooks_kmeans(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Per-subspace KMeans-trained PQ codebooks — the production recall path,
    plugged into the same (cent_id, cu) seam as the deterministic
    ``pq_codebooks`` (encode/ADC machinery unchanged). Row j's ``cu`` is the
    concatenation over subspaces of centroid j of that subspace's codebook,
    so subspace slicing recovers each codebook independently.

    Training = PQ_M small KMeans fits over the unit subvectors; at 100 TB
    each fits on a corpus sample (standard PQ practice) and the result is a
    PQ_KSUB-row broadcast table. Encoding the full corpus stays the one
    broadcast pass in ``pq_encode``."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    u = _unit(corpus, id_col, vec)
    books: list[list[list[float]]] = []  # [m][j] -> dsub floats
    for m in range(PQ_M):
        lo = m * PQ_DSUB + 1
        feats = u.select(
            array_to_vector(F.slice(F.col("u"), lo, PQ_DSUB)).alias("features")
        )
        model = KMeans(k=PQ_KSUB, seed=seed + m, maxIter=max_iter).fit(feats)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    rows = [
        (j, [x for m in range(PQ_M) for x in books[m][j]]) for j in range(PQ_KSUB)
    ]
    return corpus.sparkSession.createDataFrame(
        rows, "cent_id int, cu array<double>"
    )
