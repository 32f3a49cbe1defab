"""Cross-micro-batch state carry for the stateful streaming funnel tracker
(streaming/funnel.py): stages arriving in DIFFERENT micro-batches must still
complete exactly once, and the drain must equal the batch-SQL funnel."""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.streaming.funnel import funnel_completions


def _write_batches(spark, tmpdir: str, batches):
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, schema).coalesce(1)
        df.write.mode("overwrite").parquet(os.path.join(tmpdir, f"b{i}"))
    # a directory of single-file batch dirs -> flatten into one stream dir
    stream_dir = os.path.join(tmpdir, "stream")
    os.makedirs(stream_dir, exist_ok=True)
    n = 0
    for i in range(len(batches)):
        for f in sorted(os.listdir(os.path.join(tmpdir, f"b{i}"))):
            if f.endswith(".parquet"):
                os.rename(
                    os.path.join(tmpdir, f"b{i}", f),
                    os.path.join(stream_dir, f"{i:04d}.parquet"),
                )
                n += 1
    assert n == len(batches)
    return stream_dir


def test_funnel_completes_across_micro_batches(spark):
    base = dt.datetime(2024, 1, 1)

    def t(m):
        return base + dt.timedelta(minutes=m)

    batches = [
        # batch 0: user 1 views; user 2 full journey out of order within
        # batch (sorted internally by ts)
        [
            (1, t(0), 1, "view"),
            (4, t(3), 2, "purchase"),
            (2, t(1), 2, "view"),
            (3, t(2), 2, "click"),
        ],
        # batch 1: user 1 clicks (state carries the view)
        [(5, t(10), 1, "click"), (6, t(11), 3, "click")],  # user 3: click w/o view
        # batch 2: user 1 purchases -> completes across three batches;
        # a second purchase must NOT emit again
        [(7, t(20), 1, "purchase"), (8, t(21), 1, "purchase")],
    ]
    with tempfile.TemporaryDirectory() as tmp:
        stream_dir = _write_batches(spark, tmp, batches)
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string"
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_dir)
        )
        name = f"funnel_t_{uuid.uuid4().hex[:6]}"
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                funnel_completions(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        rows = {r.user_id: r for r in spark.table(name).collect()}
    assert set(rows) == {1, 2}  # user 3 never completes
    assert rows[2].latency_s == 120  # within-batch completion, ts-sorted
    assert rows[1].latency_s == 20 * 60  # stages straddled three batches
    assert rows[1].view_ts == t(0) and rows[1].purchase_ts == t(20)
    # exactly-once: one row per completed user even with a second purchase
    assert spark.table(name).count() == 2


def test_funnel_strictness_same_timestamp(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "view"),
        (2, base, 1, "click"),  # same instant as view -> NOT strictly after
        (3, base + dt.timedelta(minutes=1), 1, "purchase"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        stream_dir = _write_batches(spark, tmp, [rows])
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, user_id long, event_type string"
            )
            .parquet(stream_dir)
        )
        name = f"funnel_s_{uuid.uuid4().hex[:6]}"
        with tempfile.TemporaryDirectory() as ckpt:
            q = (
                funnel_completions(stream)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        # click not strictly after view -> no completion
        assert spark.table(name).count() == 0
