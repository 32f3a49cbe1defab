"""Sessionization: gap-based user sessions, batch AND streaming-stateful.

* ``sessionize_batch`` — the classic lag/cumsum window composition: a new
  session starts when the gap to the previous event exceeds the timeout.
  SQL-expressible → DuckDB-oracle-checked.
* ``sessionize_stream`` — the same semantics as a custom stateful streaming
  operator via ``applyInPandasWithState`` (GroupState + EVENT-time timeout):
  the pattern for operators Structured Streaming lacks natively. State per
  user = (session_start, last_ts, n_events); a session closes when a later
  event's gap exceeds the timeout (emitted in that batch) or when the
  watermark passes ``last_ts + gap`` (state timeout fires).

Event-time (not processing-time) timeouts on purpose: they are data-driven —
deterministic in tests, replayable in production, and an ``availableNow``
drain terminates instead of idling on wall-clock timers. Scale notes: batch
sessionization is one shuffle (window over user_id); streaming state size is
O(active users), bounded by the watermark — exactly what event-time timeout
exists for.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),  # micros
        StructField("last_ts", LongType()),
        StructField("n_events", IntegerType()),
    ]
)


def sessionize_batch(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    order_col: str | None = "event_id",
) -> DataFrame:
    """Batch sessionization via lag + cumulative session counter.

    ``order_col`` is the same-timestamp tiebreaker for the window ordering;
    it defaults to ``event_id`` but is only used when the frame actually has
    that column — pass an explicit column for other tiebreakers, or rely on
    ``ts_col`` alone when none exists.
    """
    if order_col is not None and order_col not in events.columns:
        order_col = None
    order_cols = [ts_col] if order_col is None else [ts_col, order_col]
    w = Window.partitionBy(user_col).orderBy(*order_cols)
    gap_us = gap_minutes * 60 * 1_000_000
    with_flag = events.select(
        user_col,
        ts_col,
        *([] if order_col is None else [order_col]),
        F.when(
            F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w)) > gap_us,
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    with_id = with_flag.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy(user_col, "session_seq")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).cast("int").alias("n_events"),
        )
        .select(user_col, "session_start", "session_end", "n_events")
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming-stateful sessionization (custom operator pattern).

    A session closes when the watermark (max event time − ``watermark_delay``)
    passes ``last_ts + gap`` — i.e. late data within the delay can still
    extend a session, and state for quiet users is evicted as soon as the
    stream's event time moves on.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                closed.append((user_id, start, last, n))
                state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
            ts_list.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start = last = n = None
            for t in ts_list:
                if start is None:
                    start, last, n = t, t, 1
                elif t - last > gap_us:
                    closed.append((user_id, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            if start is not None:
                state.update((start, last, n))
                # close when event time passes the end of the gap window
                state.setTimeoutTimestamp((last + gap_us) // 1000 + 1)
        yield pd.DataFrame(
            {
                "user_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
            }
        )

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
