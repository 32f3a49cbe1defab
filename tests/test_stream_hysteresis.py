"""Hysteresis (flap-damped) alert semantics: constructed flapping sequence
plus cross-micro-batch regime persistence."""

from __future__ import annotations

import tempfile
import time
import uuid

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from arc_maskdata_pipeline_plugin_spark.streaming.hysteresis import (
    hysteresis_alerts,
)

SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
    ]
)

LOW, HIGH = 2_000, 12_000  # cents


def _drain(spark, src, max_files=None):
    reader = spark.readStream.schema(SCHEMA)
    if max_files:
        reader = reader.option("maxFilesPerTrigger", str(max_files))
    stream = reader.parquet(src)
    out = hysteresis_alerts(stream, low_cents=LOW, high_cents=HIGH)
    name = f"hyst_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        n_batches = len(q.recentProgress)
    return spark.table(name).collect(), n_batches


def _rows(seq, user=1, t0=1_700_000_000):
    import datetime

    return [
        (
            user,
            i,
            datetime.datetime.fromtimestamp(t0 + i, datetime.timezone.utc),
            v / 100.0,
        )
        for i, v in enumerate(seq)
    ]


def test_flapping_sequence_fires_once_per_regime(spark, tmp_path):
    """Oscillation ABOVE the low threshold never re-arms: 130-50-140 fires
    once (50 is between the thresholds); only a dip below 20 re-arms."""
    seq = [
        13_000,  # quiet -> HIGH: alert (event 0)
        5_000,   # between thresholds: still high regime
        14_000,  # suppressed (flap damped)
        1_000,   # below low: re-armed
        12_500,  # alert (event 4)
        12_600,  # suppressed
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(_rows(seq), SCHEMA).coalesce(1).write.parquet(src)
    got, _ = _drain(spark, src)
    assert [(r.alert_event_id, r.value_cents) for r in sorted(got, key=lambda r: r.alert_event_id)] == [
        (0, 13_000),
        (4, 12_500),
    ]


def test_regime_survives_microbatch_boundary(spark, tmp_path):
    """High regime entered in batch 1 suppresses a spike early in batch 2;
    a dip inside batch 2 re-arms."""
    src = str(tmp_path / "src")
    first = [13_000, 5_000]        # alert at 0; regime high at the boundary
    second = [14_000, 500, 12_100]  # suppressed, re-arm, alert at event 4
    spark.createDataFrame(_rows(first), SCHEMA).coalesce(1).write.parquet(src)
    time.sleep(1.1)  # file source orders by modification time
    spark.createDataFrame(
        _rows(second, t0=1_700_000_100)[0:], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    # fix event ids of the second file to continue the sequence
    got, n_batches = _drain(spark, src, max_files=1)
    assert n_batches >= 2
    ids = sorted(r.alert_event_id for r in got)
    assert len(ids) == 2
    assert ids[0] == 0  # the batch-1 alert
    # the batch-2 alert must be the post-re-arm spike (12_100), not the
    # suppressed 14_000 spike
    vals = {r.alert_event_id: r.value_cents for r in got}
    assert vals[ids[1]] == 12_100
