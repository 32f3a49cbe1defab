"""foreachBatch streaming sink: mask a stream, write partitioned parquet,
verify the landed data equals the batch masking projection."""

from __future__ import annotations

from arc_maskdata_pipeline_plugin_spark.functions.masking import register_udfs
from arc_maskdata_pipeline_plugin_spark.streaming import read_events_stream
from arc_maskdata_pipeline_plugin_spark.streaming.events import (
    masked_event_stream,
    stream_masked_to_parquet,
)

SF = "/root/testdata/sf0.001"


def test_stream_masked_parquet_sink(spark, tmp_path):
    register_udfs(spark)
    out = str(tmp_path / "masked_events")
    ckpt = str(tmp_path / "ckpt")
    stream_masked_to_parquet(read_events_stream(spark, SF), out, ckpt)

    landed = spark.read.parquet(out)
    # partitioned layout → batch_id (idempotency key) and event_type are
    # discovered partition columns
    assert "event_type" in landed.columns
    assert "batch_id" in landed.columns
    src = spark.read.parquet(f"{SF}/events.parquet")
    assert landed.count() == src.count()

    # landed pseudonyms equal the batch projection (same code path)
    import pyspark.sql.functions as F
    batch = masked_event_stream(
        src.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if dict(src.dtypes).get("ts") == "bigint" else src
    )
    got = {r.event_id: r.user_pseudonym for r in landed.collect()}
    want = {r.event_id: r.user_pseudonym for r in batch.collect()}
    assert got == want
    # masked, not cleartext: pseudonym is 8 digits, not the original id
    sample = next(iter(got.values()))
    assert len(sample) == 8 and sample.isdigit()

    # replay safety: re-draining from a FRESH checkpoint replays every batch;
    # the batch_id-keyed overwrite must leave the landed data unchanged
    # (foreachBatch alone is at-least-once — idempotent writes make it safe).
    stream_masked_to_parquet(read_events_stream(spark, SF), out, str(tmp_path / "ckpt2"))
    replayed = spark.read.parquet(out)
    assert replayed.count() == src.count()
    assert {r.event_id: r.user_pseudonym for r in replayed.collect()} == want
