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


def test_incremental_winnow_dedup_against_store(spark):
    """New batch vs persisted winnowing fingerprint store: a batch doc
    sharing a long token run with the corpus is dropped (locality: any
    shared k+w-1 = 7-token run yields a shared fingerprint; the 16-token
    copy yields >= min_shared of them), a fresh doc survives, and unioning
    the survivor fingerprints into the store dedups the next identical
    batch fully — per-increment cost stays batch-local (winnowing is
    doc-local, so the store extends by plain union)."""
    from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
        incremental_dedup_winnow,
        winnow_fingerprints,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india " \
        "juliet kilo lima mike november oscar papa"
    corpus = spark.createDataFrame(
        [
            (1, f"intro words then {shared} and a corpus tail here"),
            (2, "completely different content about distributed query engines"
                " running large analytical scans every night"),
        ],
        "doc_id LONG, text STRING",
    )
    store = winnow_fingerprints(corpus)

    batch = spark.createDataFrame(
        [
            # carries the corpus run, shifted to a new position
            (10, f"totally new preamble {shared} closing differently now"),
            # genuinely new
            (11, "a brand new article describing winnowing fingerprints at"
                 " scale with no overlap whatsoever in its token stream"),
        ],
        "doc_id LONG, text STRING",
    )
    survivors, survivor_fps = incremental_dedup_winnow(batch, store)
    assert [r.doc_id for r in survivors.collect()] == [11]
    assert {r.doc_id for r in survivor_fps.collect()} == {11}
    store2 = store.union(survivor_fps)
    survivors2, _ = incremental_dedup_winnow(batch, store2)
    assert survivors2.count() == 0
