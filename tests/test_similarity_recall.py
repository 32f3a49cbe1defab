"""IVF recall: KMeans-trained centroids must not lose to the deterministic
first-n quantizer at the same (n_cells, n_probes) budget.

Ground truth = brute-force exact kNN. Recall@k is averaged over the query
set. The deterministic quantizer exists to keep the scale machinery
oracle-checkable; the trained quantizer is the production path and the whole
point of training is recall — so this is the regression gate for it."""

from __future__ import annotations

from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.operators.similarity import (
    ann_ivf,
    ivf_centroids,
    ivf_centroids_kmeans,
    knn_bruteforce,
)
from arc_maskdata_pipeline_plugin_spark.plans.registry import T

SF = "/root/testdata/sf0.001"
K, N_CELLS, N_PROBES = 5, 16, 4
# Query set DISJOINT from the deterministic quantizer's seed vectors
# (vec_id < n_cells): a query that IS a centroid pulls its true neighbors
# into its own cell, inflating the deterministic quantizer's recall — the
# comparison is only meaningful on queries neither quantizer has seen.
Q_LO, Q_HI = 100, 110


def _neighbor_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(got, truth):
    return sum(len(got.get(q, set()) & t) / len(t) for q, t in truth.items()) / len(truth)


def test_trained_ivf_recall_at_least_deterministic(spark):
    e = T(spark, SF, "embeddings").cache()
    queries = e.filter((F.col("vec_id") >= Q_LO) & (F.col("vec_id") < Q_HI))
    truth = _neighbor_sets(knn_bruteforce(e, queries, k=K))

    det = _neighbor_sets(
        ann_ivf(e, queries, k=K, n_cells=N_CELLS, n_probes=N_PROBES)
    )
    trained_cents = ivf_centroids_kmeans(e, n_cells=N_CELLS)
    trn = _neighbor_sets(
        ann_ivf(e, queries, k=K, n_cells=N_CELLS, n_probes=N_PROBES, cents=trained_cents)
    )
    e.unpersist()

    r_det, r_trn = _recall(det, truth), _recall(trn, truth)
    # the trained quantizer must be at least as good, and genuinely useful
    assert r_trn >= r_det, (r_trn, r_det)
    assert r_trn >= 0.5, r_trn


def test_trained_centroids_same_shape_as_deterministic(spark):
    e = T(spark, SF, "embeddings")
    det = ivf_centroids(e, n_cells=4)
    trn = ivf_centroids_kmeans(e, n_cells=4, max_iter=2)
    assert [f.name for f in det.schema.fields] == [f.name for f in trn.schema.fields]
    assert trn.count() == 4


def test_sim_ann_ivf_trained_query_reports_recall(spark):
    """The per-query frame keeps the tight floor (mean recall ≥ 0.4 here);
    the registered query collapses it to the hash-oracled audit row
    (VERDICT r07 #4) whose conservative verdict must read 1."""
    from arc_maskdata_pipeline_plugin_spark.plans.similarity import (
        K as QK,
        IVF_TRAINED_FLOOR_X100,
        sim_ann_ivf_trained,
        sim_ann_ivf_trained_per_query,
        sim_ann_pq_trained,
    )

    rows = sim_ann_ivf_trained_per_query(spark, SF).collect()
    assert sorted(r.query_id for r in rows) == list(range(10))
    for r in rows:
        assert 0 <= r.hits <= QK
        assert r.recall_at_k == r.hits / QK
    mean_recall = sum(r.recall_at_k for r in rows) / len(rows)
    assert mean_recall >= 0.4, mean_recall

    audit = sim_ann_ivf_trained(spark, SF).collect()
    assert len(audit) == 1 and audit[0].mean_recall_ge_floor == 1
    assert audit[0].n_queries == 10 and audit[0].truth_pairs == 10 * QK
    assert audit[0].recall_floor_x100 == IVF_TRAINED_FLOOR_X100
    # the conservative gate floor must sit strictly under the tight one
    assert IVF_TRAINED_FLOOR_X100 / 100 < 0.4

    pq_audit = sim_ann_pq_trained(spark, SF).collect()
    assert len(pq_audit) == 1 and pq_audit[0].mean_recall_ge_floor == 1


def test_trained_pq_recall_at_least_deterministic(spark):
    """PQ-ADC: per-subspace KMeans codebooks must beat the deterministic
    (first-PQ_KSUB subvector) codebooks on a disjoint query set. Absolute
    recall is intentionally modest — PQ trades recall for 16× compression
    (8 × 4-bit codes vs 64 × float32); the floor pins against regressions,
    the ordering pins that training the codebooks is worth it."""
    from arc_maskdata_pipeline_plugin_spark.operators.similarity import (
        ann_pq,
        pq_codebooks_kmeans,
    )

    e = T(spark, SF, "embeddings").cache()
    queries = e.filter((F.col("vec_id") >= Q_LO) & (F.col("vec_id") < Q_HI))
    truth = _neighbor_sets(knn_bruteforce(e, queries, k=K))

    det = _neighbor_sets(ann_pq(e, queries, k=K))
    trn = _neighbor_sets(ann_pq(e, queries, k=K, cents=pq_codebooks_kmeans(e)))
    e.unpersist()

    r_det, r_trn = _recall(det, truth), _recall(trn, truth)
    assert r_trn >= r_det, (r_trn, r_det)
    assert r_trn >= 0.15, r_trn


def test_minhash_fast_path_agreement_floor(spark):
    """The xxhash64 production MinHash path must largely agree with the
    md5 oracle path: candidate-set Jaccard between the two hash families,
    computed IN the plan (VERDICT r04 #5), stays above a pinned floor.
    Two random hash families band differently near the similarity
    threshold, so agreement < 1 by design — but the planted near-dup pairs
    must be found by both (observed 0.80 at sf0.001 / 0.76 at sf0.01)."""
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import (
        dedup_minhash_pairs_fast,
        dedup_minhash_pairs_fast_detail,
    )

    df = dedup_minhash_pairs_fast_detail(spark, SF)
    row = df.agg(
        F.min("agreement_fp6").alias("agree"),
        F.sum(F.col("in_fast") * F.col("in_md5")).alias("n_both"),
        F.count("*").alias("n"),
    ).collect()[0]
    assert row.n > 0
    assert row.n_both > 0
    assert row.agree >= 600_000, row.agree
    # the registered hash-oracled audit wraps this detail: the theorem
    # verdict (identical shingle sets → found by both families) must hold
    # and the md5 pair count must match the oracle path's own frame
    audit = dedup_minhash_pairs_fast(spark, SF).collect()[0]
    assert audit.identical_in_both == 1
    assert audit.n_identical_pairs >= 0
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import dedup_minhash_pairs

    assert audit.n_md5_pairs == dedup_minhash_pairs(spark, SF).count()
