"""Round-9 operator semantics on constructed inputs.

Each test writes a tiny documents/events parquet into tmp_path and runs the
registered query against it, asserting hand-computed expected values (the
semantics layer of the per-operator checklist; oracle parity is the
cross-engine layer)."""

from __future__ import annotations


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))


def test_copy_direction_planted_provenance(spark, tmp_path):
    """Planted provenance: span X originates in source A (doc 1, the
    minimum doc_id carrying it) and is copied by B (doc 5) and C (doc 9);
    span Y originates in B (doc 2) and is copied by A (doc 7); source D
    shares nothing. Each doc is exactly 8 tokens = exactly one span, so the
    directed counts and shares are hand-computable."""
    X = " ".join(f"x{i}" for i in range(8))
    Y = " ".join(f"y{i}" for i in range(8))
    U = " ".join(f"u{i}" for i in range(8))
    rows = [
        (1, X, "en", "A"),
        (2, Y, "en", "B"),
        (5, X, "en", "B"),
        (7, Y, "en", "A"),
        (9, X, "en", "C"),
        (11, U, "en", "D"),
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import (
        q_source_copy_direction,
    )

    got = {
        (r["origin_source"], r["copier_source"]): (
            r["n_copied_spans"],
            r["n_copier_spans"],
            r["copied_share_fp6"],
        )
        for r in q_source_copy_direction(spark, str(tmp_path)).collect()
    }
    assert got == {
        # A and B each hold 2 distinct spans; C holds 1
        ("A", "B"): (1, 2, 500_000),
        ("A", "C"): (1, 1, 1_000_000),
        ("B", "A"): (1, 2, 500_000),
    }, got
