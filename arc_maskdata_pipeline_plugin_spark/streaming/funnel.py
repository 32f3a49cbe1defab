"""Custom stateful streaming operator: ordered-funnel completion tracker —
emit one row per user the moment their strictly-ordered view → click →
purchase sequence completes, with the stage timestamps and latency.

Windowed aggregates cannot express this: the click must be STRICTLY AFTER
the user's first view and the purchase strictly after that click, the
emission must fire exactly once per user, and the answer depends on
event-time order of accumulation. Same surface and contract as
``streaming/threshold.py`` (``applyInPandasWithState``):

* rows process in event-time order (ts, event_id) WITHIN each micro-batch;
* state carries (first_view_us, first_click_after_view_us, emitted) across
  batches — three small integers per user, O(active keys);
* under in-order arrival across batches (trivially true for the
  single-batch availableNow drain the oracle checks; pinned across
  multiple batches in tests/test_stream_funnel.py) the emitted rows equal
  the batch SQL: v = MIN(view), c = MIN(click > v), p = MIN(purchase > c).

Reference note: the host framework's streaming surface is plain Spark
Structured Streaming (SURVEY §2b); stateful funnel tracking is part of this
engine's large-scale extension surface, not a reference port.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

FUNNEL_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("view_ts", TimestampType()),
        StructField("click_ts", TimestampType()),
        StructField("purchase_ts", TimestampType()),
        StructField("latency_s", LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("view_us", LongType()),
        StructField("click_us", LongType()),
        StructField("emitted", LongType()),
    ]
)

_STAGES = ("view", "click", "purchase")


def funnel_completions(events: DataFrame) -> DataFrame:
    """events(user_id, event_id, ts, event_type) → one completion row per
    user (streaming input — applyInPandasWithState requires a streaming
    DataFrame; drive batch comparisons through a single-file stream)."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # NoTimeout configured — defensive only
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in FUNNEL_OUT_SCHEMA.fields])
            return
        v_us, c_us, emitted = state.get if state.exists else (0, 0, 0)
        out = []
        if not emitted:
            batch = pd.concat(list(pdfs), ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
            for _, r in batch.iterrows():
                ts = r["ts"]
                us = int(ts.value // 1000)  # pandas ns → µs
                et = r["event_type"]
                if et == "view" and v_us == 0:
                    v_us = us
                elif et == "click" and c_us == 0 and v_us and us > v_us:
                    c_us = us
                elif et == "purchase" and c_us and us > c_us:
                    out.append(
                        {
                            "user_id": user_id,
                            "view_ts": pd.Timestamp(v_us * 1000),
                            "click_ts": pd.Timestamp(c_us * 1000),
                            "purchase_ts": ts,
                            "latency_s": (us - v_us) // 1_000_000,
                        }
                    )
                    emitted = 1
                    break
        state.update((v_us, c_us, emitted))
        yield (
            pd.DataFrame(out)
            if out
            else pd.DataFrame(columns=[f.name for f in FUNNEL_OUT_SCHEMA.fields])
        )

    return (
        events.select("user_id", "event_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=FUNNEL_OUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
