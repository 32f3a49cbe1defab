"""Viral-bucket / viral-cell cap semantics (VERDICT r05 #2/#4).

The two pair-generating dedups — banded pHash and SemDeDup — must stay
bounded when a degenerate class (identical boilerplate images, collapsed
embeddings) floods one bucket/cell. These tests plant exactly that shape
with the cap monkeypatched BELOW the planted class size and assert:

* capped buckets/cells contribute ZERO candidate pairs (the blowup is
  structurally pruned before the join/enumeration, not post-filtered);
* the exclusion is audited in-plan (``n_dropped_buckets`` / ``capped``),
  never silent;
* the new precision columns report verified/candidate exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_phash_viral_bucket_capped_and_audited(spark, tmp_path, monkeypatch):
    """Docs 0-3 render near-identical images sharing two size-4 band
    buckets; docs 8-9 share only size-2 buckets. With the cap at 3 the two
    size-4 buckets drop (audited), leaving exactly the pairs that coexist
    in a small bucket: (0,1), (2,3), (8,9) — and crucially NOT the
    cross-sub-block pairs (0,2)/(0,3)/(1,2)/(1,3) whose only shared
    buckets were the dropped viral ones."""
    import arc_maskdata_pipeline_plugin_spark.plans.multimodal_queries as mm

    rows = [(i, "t", "en", "s") for i in [0, 1, 2, 3, 8, 9]]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    monkeypatch.setattr(mm, "_PHD_MAXBUCKET", 3)
    out = mm.q_multimodal_phash_dedup(spark, str(tmp_path)).collect()
    pairs = {(r.d1, r.d2) for r in out}
    assert pairs == {(0, 1), (2, 3), (8, 9)}
    r = out[0]
    assert r.n_dropped_buckets == 2  # band-0 and band-2 size-4 buckets
    assert r.n_candidate_pairs == 3
    assert r.precision_fp6 == 1_000_000  # all three candidates verify


def test_phash_uncapped_keeps_full_block(spark, tmp_path):
    """Same corpus at the default cap (256 ≫ every bucket): the full
    within-block pair set surfaces and nothing is dropped."""
    from arc_maskdata_pipeline_plugin_spark.plans.multimodal_queries import (
        q_multimodal_phash_dedup,
    )

    rows = [(i, "t", "en", "s") for i in [0, 1, 2, 3, 8, 9]]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = q_multimodal_phash_dedup(spark, str(tmp_path)).collect()
    pairs = {(r.d1, r.d2) for r in out}
    for p in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (8, 9)]:
        assert p in pairs, p
    assert out[0].n_dropped_buckets == 0


def test_phash_cap_prunes_before_enumeration(spark, tmp_path):
    """The cap is a filter on bucket size BEFORE pair enumeration — the
    optimized plan carries the size(ids) <= cap predicate, so a viral
    bucket's array never reaches the pair-explode task."""
    import arc_maskdata_pipeline_plugin_spark.plans.multimodal_queries as mm

    rows = [(i, "t", "en", "s") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    plan = (
        mm.q_multimodal_phash_dedup(spark, str(tmp_path))
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert f"<= {mm._PHD_MAXBUCKET}" in plan


def test_semdedup_viral_cell_capped_and_audited(spark, tmp_path, monkeypatch):
    """A planted 8-member collapsed cell (identical vectors) with the cap
    at 5: the viral cell reports capped=1 / zero candidates / everything
    kept, while the healthy 3-member cell still dedups with exact
    candidate count and precision."""
    import arc_maskdata_pipeline_plugin_spark.plans.curation as cur

    rows = (
        # cell 0 (seed vec 0): 8 identical vectors -> viral
        [(0, [1.0, 0.0, 0.0, 0.0])]
        + [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(2, 9)]
        # cell 1 (seed vec 1): one exact twin + one below-threshold member
        + [
            (1, [0.0, 1.0, 0.0, 0.0]),
            (10, [0.0, 1.0, 0.0, 0.0]),  # cos=1 with vec 1 -> dropped
            (11, [0.0, 0.3, 0.954, 0.0]),  # cos=0.3 < tau=0.4 -> kept
        ]
    )
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    monkeypatch.setattr(cur, "_SD_CELLS", 2)
    monkeypatch.setattr(cur, "_SD_MAXCELL", 5)
    out = {r.cell: r for r in cur.q_semdedup(spark, str(tmp_path)).collect()}

    viral = out[0]
    assert viral.n_members == 8
    assert viral.capped == 1
    assert viral.n_candidate_pairs == 0 and viral.n_dup_pairs == 0
    assert viral.n_dropped == 0 and viral.n_kept == 8
    assert viral.precision_fp6 == 0

    ok = out[1]
    assert ok.n_members == 3 and ok.capped == 0
    assert ok.n_candidate_pairs == 3  # C(3,2)
    assert ok.n_dup_pairs == 1 and ok.n_dropped == 1 and ok.n_kept == 2
    assert ok.precision_fp6 == 333_333  # floor(1e6 / 3)


def test_semdedup_eligible_filter_is_broadcast(spark):
    """The eligible-cell frame (≤ n_cells rows) must reach the pair join as
    a broadcast, never a shuffled side."""
    import arc_maskdata_pipeline_plugin_spark.plans.curation as cur

    plan = (
        cur.q_semdedup(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
