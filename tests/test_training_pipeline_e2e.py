"""End-to-end training-data pipeline: the composition story.

One flow over the documents corpus, exactly what a user of the reference
switching to this engine would run at 100 TB:

    extract → language filter → quality filter → exact dedup →
    minhash-LSH near-dup → connected components → survivor selection →
    token accounting → masked (pseudonymized) partitioned parquet out

Every step is an operator tested individually elsewhere; this test verifies
they COMPOSE — schemas line up, no step breaks another's assumptions — and
that the output corpus is smaller-or-equal at every stage, ending with a
masked parquet a downstream trainer could consume.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.functions.masking import register_udfs
from arc_maskdata_pipeline_plugin_spark.operators.clusters import connected_components
from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
    drop_exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)
from arc_maskdata_pipeline_plugin_spark.operators.text import (
    with_language_scores,
    with_quality_score,
    with_token_stats,
)

SF = "/root/testdata/sf0.001"


def test_training_pipeline_end_to_end(spark, tmp_path):
    register_udfs(spark)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n0 = docs.count()

    # 1. language + quality gates (cheap JVM-side expressions, run first so
    #    everything downstream sees less data)
    scored = with_quality_score(with_language_scores(docs))
    kept = scored.filter(F.col("quality_score") > 0.2)
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. exact dedup on normalized text
    exact = drop_exact_duplicates(kept)
    n2 = exact.count()
    assert 0 < n2 <= n1

    # 3. near-dup candidates (shingle → minhash → LSH bands) →
    #    transitive clusters → keep the canonical survivor (min doc_id)
    sigs = minhash_signatures(word_shingles(exact, distinct=False))
    pairs = lsh_candidate_pairs(sigs)
    comps = connected_components(pairs, left="d1", right="d2")
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    survivors = exact.join(losers, "doc_id", "left_anti")
    n3 = survivors.count()
    assert 0 < n3 <= n2

    # 4. token accounting for the trainer's budget
    accounted = with_token_stats(survivors)
    total_tokens = accounted.agg(F.sum("n_tokens")).collect()[0][0]
    assert total_tokens > 0

    # 5. pseudonymize the source label and land partitioned parquet
    out = str(tmp_path / "corpus")
    (
        accounted.selectExpr(
            "doc_id",
            "text",
            "lang",
            "n_tokens",
            "mask_string(12, true, source) AS source_pseudonym",
        )
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out)
    )
    landed = spark.read.parquet(out)
    assert landed.count() == n3
    assert "lang" in landed.columns  # partition column survives
    # pseudonyms are deterministic: same source → same mask
    sp = landed.select("source_pseudonym").distinct().count()
    src_n = survivors.select("source").distinct().count()
    assert sp == src_n
