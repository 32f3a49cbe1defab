"""Streaming queries for the driver contract.

``q_stream_event_counts`` runs a REAL Structured Streaming job (file source →
watermark → tumbling window → memory sink, availableNow trigger) and returns
the materialized result. Because the windows are epoch-aligned and the
watermark outlasts the data, the result equals the batch group-by — which is
exactly what the DuckDB oracle computes (streaming/batch consistency check).
"""

from __future__ import annotations

import uuid

from ..streaming import read_events_stream, run_available_now, windowed_event_counts
from .registry import register


@register(
    "q_stream_event_counts",
    oracle="""
SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def q_stream_event_counts(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    counts = windowed_event_counts(stream, window="10 minutes", watermark="7 days")
    return run_available_now(counts, f"stream_counts_{uuid.uuid4().hex[:8]}")
