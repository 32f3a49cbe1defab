"""Streaming-semantics contracts behind the r09 audit witnesses
(VERDICT r08 next-round #2).

The 12 ``q_stream_*`` registry queries now carry in-plan witnesses built
from the drain's StreamingQueryProgress metrics (streaming/audit.py). These
tests pin the *semantics* those witnesses rely on, on CONSTRUCTED inputs
where the contract actually bites — multi-batch state carry, watermark
eviction + re-emission, session merge across a micro-batch boundary, and
outer-join withholding — plus the witness layer itself at sf0.001.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import Row
from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.streaming.audit import drain_with_metrics

SF = "/root/testdata/sf0.001"


def _ts(s: str):
    import datetime as dt

    return dt.datetime.fromisoformat(s)


def _write_files(spark, tmp_path, row_batches, schema):
    """Stage time-ordered parquet files so maxFilesPerTrigger=1 yields one
    micro-batch per file (file source orders by modification time)."""
    src = str(tmp_path / "stream_src")
    for i, rows in enumerate(row_batches):
        mode = "overwrite" if i == 0 else "append"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(mode).parquet(
            src
        )
        if i + 1 < len(row_batches):
            time.sleep(1.1)
    batch_schema = spark.read.parquet(src).schema
    return (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def _write_two_files(spark, tmp_path, rows1, rows2, schema):
    return _write_files(spark, tmp_path, [rows1, rows2], schema)


EVENT_SCHEMA = "user_id bigint, event_type string, ts timestamp, value double"


def test_drain_metrics_multibatch_dedup_accounting(spark, tmp_path):
    """numDroppedDuplicateRows is additive across micro-batches and final
    state rows == distinct keys — the exact integers the
    q_stream_dedup_user_types witnesses pin, here proven on a 2-batch drain
    (the sf drain is single-file/single-batch)."""
    rows1 = [
        Row(user_id=1, event_type="click", ts=_ts("2024-01-01T10:00:00"), value=1.0),
        Row(user_id=1, event_type="click", ts=_ts("2024-01-01T10:01:00"), value=1.0),
        Row(user_id=2, event_type="view", ts=_ts("2024-01-01T10:02:00"), value=1.0),
    ]
    rows2 = [
        # duplicate of a key first seen in batch 1 — only droppable if the
        # dedup state survived the batch boundary
        Row(user_id=1, event_type="click", ts=_ts("2024-01-01T11:00:00"), value=1.0),
        Row(user_id=3, event_type="buy", ts=_ts("2024-01-01T11:01:00"), value=1.0),
    ]
    stream = _write_two_files(spark, tmp_path, rows1, rows2, EVENT_SCHEMA)
    deduped = (
        stream.withWatermark("ts", "7 days")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    result, m = drain_with_metrics(
        deduped, f"aud_dedup_{uuid.uuid4().hex[:8]}", "append"
    )
    assert m.n_data_batches >= 2
    assert m.n_input == 5
    assert m.op().rows_total == 3  # distinct keys
    assert m.op().dropped_dup_sum == 2  # 5 rows - 3 keys, summed across batches
    assert result.count() == 3


def test_dedup_within_watermark_evicts_and_reemits(spark, tmp_path):
    """The EVICTION side of dropDuplicatesWithinWatermark (the sf-data
    witnesses can only show no_state_evicted_ok because the 3650-day horizon
    outlasts the data): with a 10-minute horizon, a key whose state expired
    before the watermark is evicted (numRowsRemoved > 0) and a recurrence of
    that key beyond the horizon is RE-EMITTED — the documented trade of
    bounding state for unbounded key spaces."""
    rows1 = [
        Row(user_id=1, event_type="click", ts=_ts("2024-01-01T10:00:00"), value=1.0),
        # drives the watermark to 11:50 after batch 1 — past key 1's
        # 10:10 expiry
        Row(user_id=99, event_type="view", ts=_ts("2024-01-01T12:00:00"), value=1.0),
    ]
    rows2 = [
        # state maintenance runs at END of batch, after input processing —
        # this middle batch is where key 1's expired state gets evicted
        Row(user_id=98, event_type="view", ts=_ts("2024-01-01T12:05:00"), value=1.0),
    ]
    rows3 = [
        # same key, 2.5 h later, arriving AFTER the eviction batch —
        # state is gone, row re-emitted
        Row(user_id=1, event_type="click", ts=_ts("2024-01-01T12:30:00"), value=1.0),
    ]
    stream = _write_files(spark, tmp_path, [rows1, rows2, rows3], EVENT_SCHEMA)
    deduped = (
        stream.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    result, m = drain_with_metrics(
        deduped, f"aud_ww_{uuid.uuid4().hex[:8]}", "append"
    )
    out = [(r["user_id"], r["event_type"]) for r in result.collect()]
    assert out.count((1, "click")) == 2, out  # re-emitted beyond the horizon
    assert m.op().removed_sum >= 1  # eviction actually happened
    assert m.n_data_batches >= 2


def test_session_window_merges_across_batches(spark, tmp_path):
    """Session-merge exactness for the session_window operator on STREAMING
    input whose session straddles a micro-batch boundary (q_session_window_
    native registers the batch expression; this pins that the streaming
    twin merges identically): user 1's 10:00/10:10 (batch 1) and 10:20
    (batch 2) events are within the 30-minute gap and must merge into ONE
    session; 11:30 starts a second. The batch session_window aggregation
    over the unioned input is the ground truth."""
    rows1 = [
        Row(user_id=1, event_type="e", ts=_ts("2024-01-01T10:00:00"), value=1.0),
        Row(user_id=1, event_type="e", ts=_ts("2024-01-01T10:10:00"), value=1.0),
    ]
    rows2 = [
        Row(user_id=1, event_type="e", ts=_ts("2024-01-01T10:20:00"), value=1.0),
        Row(user_id=1, event_type="e", ts=_ts("2024-01-01T11:30:00"), value=1.0),
        # sentinel user pushes the final watermark past every session end
        # so append mode flushes all of user 1's sessions
        Row(user_id=999, event_type="e", ts=_ts("2024-01-01T20:00:00"), value=1.0),
    ]
    stream = _write_two_files(spark, tmp_path, rows1, rows2, EVENT_SCHEMA)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", "sw.start", "sw.end", "n_events")
    )
    result, m = drain_with_metrics(
        agg, f"aud_sess_{uuid.uuid4().hex[:8]}", "append"
    )
    got = {
        (r["user_id"], r["start"], r["end"], r["n_events"])
        for r in result.filter("user_id = 1").collect()
    }
    batch = spark.read.parquet(str(tmp_path / "stream_src"))
    expected = {
        (r["user_id"], r["start"], r["end"], r["n_events"])
        for r in (
            batch.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", "sw.start", "sw.end", "n_events")
            .filter("user_id = 1")
        ).collect()
    }
    assert got == expected
    # the straddling session merged: 3 events in one session, 1 in the other
    assert sorted(n for (_, _, _, n) in got) == [1, 3]
    assert m.n_data_batches >= 2


def test_left_join_withholds_young_unmatched_clicks(spark, tmp_path):
    """The outer-join witness theorems on constructed input: an unmatched
    click OLDER than (watermark − join window) emits with NULL; an
    unmatched click YOUNGER than that horizon is WITHHELD in state (not
    emitted prematurely), and the final state-row count is at least the
    withheld count."""
    rows1 = [
        Row(user_id=1, event_type="click", ts=_ts("2024-01-01T10:00:00"), value=1.0),
        Row(user_id=3, event_type="click", ts=_ts("2024-01-01T11:00:00"), value=1.0),
    ]
    rows2 = [
        Row(user_id=3, event_type="purchase", ts=_ts("2024-01-01T11:30:00"), value=1.0),
        # young unmatched click — watermark can never prove it expired
        Row(user_id=2, event_type="click", ts=_ts("2024-01-01T13:59:00"), value=1.0),
    ]
    stream = _write_two_files(spark, tmp_path, rows1, rows2, EVENT_SCHEMA)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
        )
        .withWatermark("click_ts", "1 minute")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
        )
        .withWatermark("purchase_ts", "1 minute")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 60 MINUTES"
        ),
        "left_outer",
    ).select(F.col("c_user").alias("user_id"), "purchase_ts")
    result, m = drain_with_metrics(
        joined, f"aud_louter_{uuid.uuid4().hex[:8]}", "append"
    )
    rows = {(r["user_id"], r["purchase_ts"] is not None) for r in result.collect()}
    # W = min(max_click 13:59, max_purchase 11:30) - 1min = 11:29.
    # user 1: 10:00 + 60min = 11:00 < W -> expired, emits with NULL.
    # user 3: matched. user 2: 13:59 + 60min > W -> withheld, NOT emitted.
    assert rows == {(1, False), (3, True)}, rows
    n_withheld = 1  # user 2's click
    assert m.op().rows_total >= n_withheld


def test_registry_witnesses_all_pinned_at_sf0001(spark):
    """Representative q_stream_* queries: every *_ok witness column is 1 on
    the sf0.001 drain (one per contract family — dedup state, join state
    accounting, stateful exactly-once; the oracle sweep covers all 12)."""
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in (
        "q_stream_dedup_user_types",
        "q_stream_stream_join",
        "q_stream_threshold_alert",
        "q_stream_session_window",
    ):
        df = qs[name](spark, SF)
        ok_cols = [c for c in df.columns if c.endswith("_ok")]
        assert ok_cols, name
        row = df.select(
            *[F.min(c).alias(c) for c in ok_cols]
        ).collect()[0]
        assert all(row[c] == 1 for c in ok_cols), (name, row.asDict())
