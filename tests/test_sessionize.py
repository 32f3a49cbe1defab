"""Sessionization: batch (oracle-parity covers engine equivalence; here
semantics) and streaming-stateful (applyInPandasWithState) consistency."""

from __future__ import annotations

import datetime as dt

import pytest

from arc_maskdata_pipeline_plugin_spark.streaming.sessions import sessionize_batch


@pytest.fixture(scope="module")
def events(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: two sessions (40-min gap between event 2 and 3)
        (0, base, 1),
        (1, base + dt.timedelta(minutes=10), 1),
        (2, base + dt.timedelta(minutes=50), 1),
        (3, base + dt.timedelta(minutes=55), 1),
        # user 2: one session
        (4, base + dt.timedelta(minutes=5), 2),
        (5, base + dt.timedelta(minutes=20), 2),
    ]
    return spark.createDataFrame(rows, ["event_id", "ts", "user_id"])


def test_sessionize_batch_semantics(events):
    out = {
        (r.user_id, r.session_start): r
        for r in sessionize_batch(events, gap_minutes=30).collect()
    }
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    s1 = out[(1, base)]
    assert s1.n_events == 2 and s1.session_end == base + dt.timedelta(minutes=10)
    s2 = out[(1, base + dt.timedelta(minutes=50))]
    assert s2.n_events == 2
    s3 = out[(2, base + dt.timedelta(minutes=5))]
    assert s3.n_events == 2


def test_sessionize_stream_matches_batch(spark, events, tmp_path):
    """Run the stateful streaming sessionizer over the same data (availableNow)
    and compare CLOSED sessions with batch output. Sessions whose
    ``last_ts + gap`` is still ahead of the final watermark stay open, so
    compare the closed subset."""
    from arc_maskdata_pipeline_plugin_spark.streaming.sessions import sessionize_stream

    src = str(tmp_path / "events_src")
    events.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    sessions = sessionize_stream(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.table("t_sessions_stream").collect()
    }
    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(events, gap_minutes=30).collect()
    }
    # closed-by-gap sessions must appear identically in the stream output
    assert (1, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 0, 10), 2) in batch
    assert streamed <= batch
    assert (1, dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1, 0, 10), 2) in streamed


def test_sessionize_batch_without_event_id_column(spark):
    import datetime as dt

    from arc_maskdata_pipeline_plugin_spark.streaming.sessions import sessionize_batch

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0)),
        (1, dt.datetime(2024, 1, 1, 0, 10)),
        (1, dt.datetime(2024, 1, 1, 2, 0)),
    ]
    events = spark.createDataFrame(rows, ["user_id", "ts"])  # no event_id
    got = sessionize_batch(events, gap_minutes=30).collect()
    assert {(r.n_events) for r in got} == {2, 1}
