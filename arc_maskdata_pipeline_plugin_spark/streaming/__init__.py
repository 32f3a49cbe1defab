"""Structured Streaming surface.

The reference's mask stage is a pure projection and therefore works unchanged
on streaming DataFrames (it only guards batch instrumentation —
MaskDataTransform.scala:158). This package adds the stream-native pieces:
file-stream sources, watermarked windowed aggregation, and an availableNow
runner for batch-equivalent verification.
"""

from .events import (  # noqa: F401
    masked_event_stream,
    read_events_stream,
    run_available_now,
    windowed_event_counts,
)
