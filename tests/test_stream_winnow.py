"""Streaming winnowing dedup (plans/streaming_queries.q_stream_dedup_winnow
+ the growing-store extension): multi-batch behavior pinned on constructed
input where the micro-batch boundary actually matters."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
    incremental_dedup_winnow,
    winnow_fingerprints,
)
from arc_maskdata_pipeline_plugin_spark.streaming.audit import (
    drain_foreach_with_metrics,
)

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)

# k=4, w=4 -> a shared run of k+w-1 = 7 tokens guarantees >= 1 shared
# selected fingerprint; these share a 14-token run -> >= 2 shared
_RUN = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike november"
CORPUS_DOC = f"intro words here {_RUN} closing words"
NEAR_COPY = f"totally different opening {_RUN} and another tail"
FRESH_DOC = (
    "unrelated content entirely about quantum chickens dancing on towers "
    "with seventeen umbrellas and no shared runs at all whatsoever here"
)


def _doc(i, text):
    return (i, text, "en", "s", len(text))


def _stage(spark, tmp_path, batches):
    src = str(tmp_path / "src")
    for i, rows in enumerate(batches):
        mode = "overwrite" if i == 0 else "append"
        spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.mode(
            mode
        ).parquet(src)
        if i + 1 < len(batches):
            time.sleep(1.1)
    schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_frozen_store_is_decomposition_invariant(spark, tmp_path):
    """Frozen-store mode (the registered query): a near-copy of a CORPUS
    doc is dropped in whichever batch it arrives; near-copies of other
    STREAMED docs are NOT dropped — the invariance that makes the query
    hash-oracleable."""
    corpus = spark.createDataFrame([_doc(1, CORPUS_DOC)], DOC_SCHEMA)
    store = winnow_fingerprints(corpus).persist()
    survived = []

    def probe(bdf, _bid):
        bdf = bdf.persist()
        try:
            surv, _ = incremental_dedup_winnow(bdf, store, min_shared=2)
            survived.extend(r["doc_id"] for r in surv.collect())
        finally:
            bdf.unpersist()

    stream = _stage(
        spark,
        tmp_path,
        [[_doc(10, NEAR_COPY), _doc(11, FRESH_DOC)], [_doc(12, NEAR_COPY)]],
    )
    m = drain_foreach_with_metrics(stream, probe)
    store.unpersist()
    # batch-1 near-copy AND batch-2 near-copy both dropped (both probe the
    # frozen corpus store); the fresh doc survives
    assert sorted(survived) == [11]
    assert m.n_data_batches == 2 and m.n_input == 3
    assert m.state_ops == []  # foreachBatch holds no engine state


def test_growing_store_drops_cross_batch_near_dup(spark, tmp_path):
    """Growing-store extension (documented, not oracled — the result
    depends on batch boundaries): batch 1's survivor fingerprints join the
    store, so batch 2's near-copy OF A STREAMED DOC is dropped."""
    corpus = spark.createDataFrame([_doc(1, CORPUS_DOC)], DOC_SCHEMA)
    state = {"store": winnow_fingerprints(corpus).localCheckpoint()}
    survived = []

    def probe(bdf, _bid):
        bdf = bdf.persist()
        try:
            surv, surv_fps = incremental_dedup_winnow(
                bdf, state["store"], min_shared=2
            )
            survived.extend(r["doc_id"] for r in surv.collect())
            # union the increment in; localCheckpoint cuts the growing
            # lineage (the per-round discipline of the iterative queries)
            state["store"] = (
                state["store"].unionByName(surv_fps).localCheckpoint()
            )
        finally:
            bdf.unpersist()

    fresh_copy = FRESH_DOC + " with a tiny suffix change"
    stream = _stage(
        spark,
        tmp_path,
        [[_doc(10, FRESH_DOC)], [_doc(12, fresh_copy), _doc(13, NEAR_COPY)]],
    )
    drain_foreach_with_metrics(stream, probe)
    # doc 10 survives (nothing like it in the corpus); doc 12 is a
    # near-copy of STREAMED doc 10 -> dropped ONLY because the store grew;
    # doc 13 is a corpus near-copy -> dropped by the original store
    assert sorted(survived) == [10]


def test_growing_store_same_batch_twins_both_survive(spark, tmp_path):
    """The boundary-dependence that makes growing-store mode un-oracleable:
    two near-identical docs in the SAME batch both survive (each probes the
    store as it stood BEFORE the batch), while split across batches the
    second is dropped — pinned explicitly so the limitation stays
    documented behavior, not a surprise."""
    corpus = spark.createDataFrame([_doc(1, CORPUS_DOC)], DOC_SCHEMA)

    def run(batches):
        state = {"store": winnow_fingerprints(corpus).localCheckpoint()}
        survived = []

        def probe(bdf, _bid):
            bdf = bdf.persist()
            try:
                surv, surv_fps = incremental_dedup_winnow(
                    bdf, state["store"], min_shared=2
                )
                survived.extend(r["doc_id"] for r in surv.collect())
                state["store"] = (
                    state["store"].unionByName(surv_fps).localCheckpoint()
                )
            finally:
                bdf.unpersist()

        import shutil

        shutil.rmtree(str(tmp_path / "src"), ignore_errors=True)
        drain_foreach_with_metrics(_stage(spark, tmp_path, batches), probe)
        return sorted(survived)

    twin = FRESH_DOC + " trailing marker"
    together = run([[_doc(10, FRESH_DOC), _doc(11, twin)]])
    split = run([[_doc(10, FRESH_DOC)], [_doc(11, twin)]])
    assert together == [10, 11]  # same batch: both probe the pre-batch store
    assert split == [10]  # across batches: the twin is dropped
