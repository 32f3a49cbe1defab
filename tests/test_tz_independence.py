"""Event-timestamp ingestion must not depend on spark.sql.session.timeZone.

ADVICE r03: the TIMESTAMP_NTZ → TIMESTAMP conversion in plans.registry.T was
only value-preserving because the session pins UTC; a plain cast under a
non-UTC session would silently shift every event instant. The conversion now
rebuilds the instant from wall-clock-micros-since-NTZ-epoch (TZ-free), so the
absolute epoch values must be identical under any session timezone.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.plans.registry import T


def _epoch_bounds(spark, sf_dir):
    row = (
        T(spark, sf_dir, "events")
        .select(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
        .first()
    )
    return row.lo, row.hi, row.n


@pytest.mark.parametrize("tz", ["Australia/Sydney", "America/New_York"])
def test_event_instants_invariant_under_session_tz(spark, sf_small, tz):
    baseline_tz = spark.conf.get("spark.sql.session.timeZone")
    assert baseline_tz == "UTC"  # session factory contract
    utc = _epoch_bounds(spark, sf_small)
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        shifted = _epoch_bounds(spark, sf_small)
    finally:
        spark.conf.set("spark.sql.session.timeZone", baseline_tz)
    assert shifted == utc


def test_streaming_reader_uses_same_conversion(spark, sf_small):
    """The streaming source's ts normalization must agree with the batch
    reader's (same absolute instants), since stream/batch parity tests compare
    their outputs value-for-value."""
    from arc_maskdata_pipeline_plugin_spark.streaming.events import read_events_stream

    stream = read_events_stream(spark, sf_small)
    assert dict(stream.dtypes)["ts"] == "timestamp"
