"""Streaming SCD2 sink: CDC change stream → versioned dimension store.

The canonical CDC landing pattern: each micro-batch of changes merges into
the dimension's history via ``operators.scd.scd2_merge`` inside
``foreachBatch`` (the sink pattern for batch-writer semantics on a stream).
State lives in the store, not in streaming state — so there is no watermark
to tune and a restart resumes from the checkpoint with at-least-once
delivery made safe by TWO replay screens: an anti-join of the incoming batch
against the full history on (key, eff_date) — a version that already exists
is a replay even if it has since been superseded (fresh-checkpoint replay,
or one batch carrying several versions of a key) — plus the merge's
attribute-hash no-op screen for changes identical to the key's current
attributes. A replayed batch therefore produces zero new versions. The
(key, eff_date) pair is the version identity: a "correction" re-sent with
the same effective date as a stored version is treated as a replay and
dropped, by design.

Store layout: one parquet dataset per snapshot generation (``gen=N``),
latest generation wins; each commit writes ``gen=latest+1`` — never the
generation it read, so the lazily-evaluated merge plan cannot delete its
own input files mid-write, and no reader ever sees a half-written store.
Replaying an already-applied batch writes a new generation with IDENTICAL
content (the no-op screen emits zero new versions) — idempotence is in the
content, not the numbering. Old generations are pruned down to a small
keep-window each commit.

At 100 TB dimension scale you would swap the store for a transactional
table format; the merge plan itself is unchanged — that is the point of
keeping the merge an ordinary DataFrame transformation.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..operators.scd import scd2_merge

_GEN = re.compile(r"^gen=(\d+)$")


def latest_generation(store_dir: str) -> int | None:
    if not os.path.isdir(store_dir):
        return None
    gens = [int(m.group(1)) for d in os.listdir(store_dir) if (m := _GEN.match(d))]
    return max(gens) if gens else None


def read_scd2_store(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """Latest full history snapshot, or None before the first commit."""
    gen = latest_generation(store_dir)
    if gen is None:
        return None
    return spark.read.parquet(os.path.join(store_dir, f"gen={gen}"))


def stream_scd2_to_store(
    changes: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    key: str,
    attrs: list[str],
    eff_col: str = "eff_date",
    keep_generations: int = 2,
) -> None:
    """Drain a change stream into an SCD2 store (``availableNow``)."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        gen = latest_generation(store_dir)
        history = read_scd2_store(spark, store_dir)
        if history is None:
            current = batch_df.sparkSession.createDataFrame(
                [], batch_df.select(key, *attrs, eff_col).schema
            )
            closed = None
        else:
            current = history.filter("is_current").select(key, *attrs, eff_col)
            closed = history.filter("NOT is_current")
            # replay screen: a (key, eff_date) already in history — current
            # OR closed — is an already-applied version; without this, a
            # superseded version re-delivered after a checkpoint reset would
            # re-insert and then duplicate its identical row in `closed`.
            batch_df = batch_df.join(
                history.select(key, eff_col), [key, eff_col], "left_anti"
            )
        merged = scd2_merge(current, batch_df, key, attrs, eff_col)
        if closed is not None:
            merged = merged.unionByName(closed)
        out = os.path.join(store_dir, f"gen={(gen or 0) + 1}")
        merged.write.mode("overwrite").parquet(out)
        # prune old generations, keeping a small undo window
        gens = sorted(
            int(m.group(1))
            for d in os.listdir(store_dir)
            if (m := _GEN.match(d))
        )
        for g in gens[:-keep_generations]:
            shutil.rmtree(os.path.join(store_dir, f"gen={g}"), ignore_errors=True)

    q = (
        changes.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
