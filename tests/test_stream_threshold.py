"""First-threshold-crossing stateful operator: cross-batch state carry and
the StatefulProcessor-v2 gate."""

from __future__ import annotations

import os
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.streaming.threshold import (
    HAS_TWS_V2,
    first_threshold_crossing,
    first_threshold_crossing_v2,
)

SF = "/root/testdata/sf0.001"
THRESHOLD = 30_000  # cents — crossings land mid-stream at sf0.001


def _batch_expected(spark):
    from pyspark.sql import Window

    e = spark.read.parquet(f"{SF}/events.parquet")
    if dict(e.dtypes).get("ts") == "timestamp_ntz":
        from arc_maskdata_pipeline_plugin_spark.plans.registry import (
            _NTZ_AS_UTC_INSTANT,
        )

        e = e.withColumn("ts", F.expr(_NTZ_AS_UTC_INSTANT))
    c = e.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value").cast("decimal(10,2)") * 100)
        .cast("bigint")
        .alias("vc"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    r = c.withColumn("cum", F.sum("vc").over(w)).filter(F.col("cum") > THRESHOLD)
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    first = r.withColumn("rn", F.row_number().over(w2)).filter("rn = 1")
    return {
        row["user_id"]: (row["event_id"], row["cum"])
        for row in first.collect()
    }


def test_state_carries_across_microbatches(spark, tmp_path):
    """Events split into two time-ordered files, drained one file per
    trigger: crossings that straddle the file boundary require the
    (cum, emitted) state to survive between micro-batches."""
    import time

    e = spark.read.parquet(f"{SF}/events.parquet")
    if dict(e.dtypes).get("ts") == "timestamp_ntz":
        from arc_maskdata_pipeline_plugin_spark.plans.registry import (
            _NTZ_AS_UTC_INSTANT,
        )

        e = e.withColumn("ts", F.expr(_NTZ_AS_UTC_INSTANT))
    mid = e.agg(F.expr("percentile(unix_micros(ts), 0.5)")).collect()[0][0]
    early = e.filter(F.unix_micros("ts") <= mid)
    late = e.filter(F.unix_micros("ts") > mid)
    src = str(tmp_path / "stream_src")
    early.coalesce(1).write.mode("overwrite").parquet(src)
    time.sleep(1.1)  # file source orders by modification time
    late.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .select("user_id", "event_id", "ts", "value")
    )
    out = first_threshold_crossing(stream, threshold_cents=THRESHOLD)
    name = f"thr_{uuid.uuid4().hex[:8]}"
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
        assert len(q.recentProgress) >= 2, "expected >= 2 micro-batches"
    got = {
        row["user_id"]: (row["crossing_event_id"], row["cum_cents"])
        for row in spark.table(name).collect()
    }
    assert got == _batch_expected(spark)


def test_v2_gate():
    if HAS_TWS_V2:
        pytest.skip("protobuf present — v2 executes; gate path not reachable")
    with pytest.raises(ImportError, match="protobuf"):
        first_threshold_crossing_v2(None)


@pytest.mark.skipif(not HAS_TWS_V2, reason="google.protobuf absent")
def test_v2_matches_v1(spark):
    from arc_maskdata_pipeline_plugin_spark.streaming.events import (
        read_events_stream,
        run_available_now,
    )

    stream = read_events_stream(spark, SF).select(
        "user_id", "event_id", "ts", "value"
    )
    out = run_available_now(
        first_threshold_crossing_v2(stream, THRESHOLD),
        f"thrv2_{uuid.uuid4().hex[:8]}",
        output_mode="append",
    )
    got = {
        row["user_id"]: (row["crossing_event_id"], row["cum_cents"])
        for row in out.collect()
    }
    assert got == _batch_expected(spark)
