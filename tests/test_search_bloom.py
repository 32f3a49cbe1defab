"""Retrieval-family invariants: BM25/TF-IDF ranking sanity, unigram LM
bounds, and the Bloom screen's defining guarantees (zero false negatives;
false positives bounded and observable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.plans.registry import REGISTRY
import arc_maskdata_pipeline_plugin_spark.plans.search  # noqa: F401 — registers


def _run(name, spark, sf):
    return REGISTRY[name].fn(spark, sf)


def test_bloom_no_false_negatives(spark, sf_small):
    out = _run("q_bloom_dedup_screen", spark, sf_small).cache()
    # Every actual duplicate (incl. all corpus members probing themselves)
    # MUST pass the filter — Bloom's one hard guarantee.
    fn = out.filter(F.col("actual_dup") & ~F.col("might_contain")).count()
    assert fn == 0
    # The deliberately small filter (m=2048, k=4, ~400 keys) must show its
    # false-positive behavior: some held-out docs pass, but nowhere near all.
    held_out = out.filter(~F.col("actual_dup"))
    n_held = held_out.count()
    n_fp = held_out.filter(F.col("might_contain")).count()
    assert n_held > 0
    assert 0 < n_fp < 0.5 * n_held, f"fp={n_fp}/{n_held}"
    out.unpersist()


def test_bm25_ranks_dense_and_scores_monotone(spark, sf_small):
    out = _run("q_bm25_search", spark, sf_small).cache()
    per_q = out.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("rank").alias("n_ranks"),
        F.min("rank").alias("lo"),
    )
    for r in per_q.collect():
        assert r.lo == 1 and r.n == r.n_ranks
    # scores non-increasing in rank within a query
    w_bad = out.alias("a").join(
        out.alias("b"),
        (F.col("a.query_id") == F.col("b.query_id"))
        & (F.col("a.rank") + 1 == F.col("b.rank"))
        & (F.col("a.bm25") < F.col("b.bm25")),
    )
    assert w_bad.count() == 0
    out.unpersist()


def test_tfidf_top_terms_ordered_by_tf(spark, sf_small):
    out = _run("q_tfidf_top_terms", spark, sf_small)
    bad = out.alias("a").join(
        out.alias("b"),
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.rank") + 1 == F.col("b.rank"))
        & (F.col("a.tf") < F.col("b.tf")),
    )
    assert bad.count() == 0


def test_unigram_logprob_bounds(spark, sf_small):
    out = _run("q_unigram_logprob", spark, sf_small)
    assert out.filter(F.col("avg_logprob") >= 0).count() == 0
    assert out.filter(F.col("n_tokens") <= 0).count() == 0


def test_inverted_index_df_consistency(spark, sf_small):
    inv = _run("q_inverted_index", spark, sf_small)
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").count()
    assert inv.filter(F.col("n_docs_with_term") > docs).count() == 0
    assert inv.filter(F.col("top_tf") <= 0).count() == 0
