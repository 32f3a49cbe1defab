"""Flap-damped (hysteresis / Schmitt-trigger) streaming alerts.

A plain threshold alert flaps: a metric oscillating around the cut fires on
every crossing. Production monitors damp this with TWO thresholds — ALERT
when the value rises above ``high`` while the key's regime is low, and only
re-arm after the value falls below ``low``. The alert stream is therefore
one row per low→high regime transition, not per sample.

Statefulness: the regime is a per-key bit that persists across micro-batches
(``applyInPandasWithState``, same surface as sessionization/threshold);
rows are processed in (ts, event_id) order within each batch, so the
transition sequence is engine-deterministic wherever arrival order respects
event time across batches (trivially true under the single-batch
``availableNow`` drain the oracle checks — the residual every cumulative
streaming operator documents).

Batch equivalence (the DuckDB oracle): an event is an alert iff its value
exceeds ``high`` and the most recent REGIME-DEFINING event before it (value
above high or below low, per user in (ts, event_id) order) was a low — a
``last_value IGNORE NULLS`` carry-forward window, no recursion needed. In
between (low ≤ value ≤ high) events never touch the regime.

Scale: state is one small integer per active key; the batch twin's windows
partition by user.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

ALERT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("alert_event_id", LongType()),
        StructField("alert_ts", TimestampType()),
        StructField("value_cents", LongType()),
    ]
)

REGIME_SCHEMA = StructType([StructField("is_high", LongType())])


def hysteresis_alerts(
    events: DataFrame, low_cents: int, high_cents: int
) -> DataFrame:
    """events(user_id, event_id, ts, value) → one alert row per low→high
    regime transition (batch or streaming input)."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # NoTimeout configured — defensive only
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in ALERT_SCHEMA.fields])
            return
        (is_high,) = state.get if state.exists else (0,)
        rows = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        for _, r in batch.iterrows():
            v = int(r["value_cents"])
            if v > high_cents:
                if not is_high:
                    rows.append((int(user_id), int(r["event_id"]), r["ts"], v))
                    is_high = 1
            elif v < low_cents:
                is_high = 0
        state.update((is_high,))
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "alert_event_id": [r[1] for r in rows],
                "alert_ts": [r[2] for r in rows],
                "value_cents": [r[3] for r in rows],
            }
        )

    prepared = events.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value").cast("decimal(10,2)") * 100)
        .cast("bigint")
        .alias("value_cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ALERT_SCHEMA,
        stateStructType=REGIME_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
