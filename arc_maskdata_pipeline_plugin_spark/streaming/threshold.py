"""Custom stateful streaming operator: FIRST threshold crossing per user —
emit exactly once, carrying the crossing event's id/ts. An operator windowed
aggregates cannot express (the answer depends on the event-time ORDER of
accumulation, and must fire exactly once per key).

Primary implementation: ``applyInPandasWithState`` (GroupState), the same
proven surface as streaming sessionization. A second implementation against
Spark 4's StatefulProcessor v2 API (``transformWithStateInPandas`` — typed
state slots, TTL, timers) ships alongside but is GATED: the v2 runner needs
``google.protobuf`` in the Python env, absent in this container
(``HAS_TWS_V2`` is probed at import; the pytest exercises it when present
and pins the gate when not). Both share the same semantics contract:

* values accumulate as integer cents (exact compare in every engine);
* rows are processed in event-time order WITHIN each micro-batch;
* state carries (cum_cents, emitted) across batches, so the emitted
  crossing equals the batch-SQL answer whenever arrival order respects
  event time across batches — trivially true under the single-batch
  ``availableNow`` drain the oracle checks; cross-batch disorder is the
  documented residual every cumulative streaming operator carries.

Scale: state is two small integers per user (O(active keys)); with the v2
API the slot takes a TTL for unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("crossing_event_id", LongType()),
        StructField("crossing_ts", TimestampType()),
        StructField("cum_cents", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("cum_cents", LongType()),
        StructField("emitted", LongType()),
    ]
)


def _prepare(events: DataFrame) -> DataFrame:
    return events.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value").cast("decimal(10,2)") * 100)
        .cast("bigint")
        .alias("value_cents"),
    )


def first_threshold_crossing(
    events: DataFrame, threshold_cents: int = 100_000
) -> DataFrame:
    """events(user_id, event_id, ts, value) → first crossing per user
    (batch or streaming input)."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:  # NoTimeout configured — defensive only
            state.remove()
            yield pd.DataFrame(columns=[f.name for f in OUT_SCHEMA.fields])
            return
        cum, emitted = state.get if state.exists else (0, 0)
        rows = []
        if not emitted:
            batch = pd.concat(list(pdfs), ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
            for _, r in batch.iterrows():
                cum += int(r["value_cents"])
                if cum > threshold_cents:
                    rows.append(
                        (int(user_id), int(r["event_id"]), r["ts"], cum)
                    )
                    emitted = 1
                    break
        else:
            for _ in pdfs:  # drain the iterator contract
                pass
        state.update((cum, emitted))
        yield pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "crossing_event_id": [r[1] for r in rows],
                "crossing_ts": [r[2] for r in rows],
                "cum_cents": [r[3] for r in rows],
            }
        )

    return (
        _prepare(events)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- StatefulProcessor v2 variant (gated on protobuf availability) --------

try:  # the TWS runner imports google.protobuf at query start
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401

    HAS_TWS_V2 = True
except ImportError:
    HAS_TWS_V2 = False


def first_threshold_crossing_v2(
    events: DataFrame, threshold_cents: int = 100_000
) -> DataFrame:
    """Same operator on ``transformWithStateInPandas`` (StatefulProcessor:
    named ValueState slot; add ``ttlDurationMs`` for unbounded key spaces).
    Raises ImportError in environments without protobuf — see HAS_TWS_V2."""
    if not HAS_TWS_V2:
        raise ImportError(
            "transformWithStateInPandas needs google.protobuf in the Python "
            "env; use first_threshold_crossing (applyInPandasWithState) here"
        )
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    threshold = threshold_cents

    class ThresholdProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "cum", "cum_cents bigint, emitted bigint"
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: N802
            cum, emitted = self._state.get() if self._state.exists() else (0, 0)
            out = None
            for pdf in rows:
                if emitted:
                    continue
                pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
                for _, r in pdf.iterrows():
                    cum += int(r["value_cents"])
                    if cum > threshold:
                        out = pd.DataFrame(
                            {
                                "user_id": [int(key[0])],
                                "crossing_event_id": [int(r["event_id"])],
                                "crossing_ts": [r["ts"]],
                                "cum_cents": [cum],
                            }
                        )
                        emitted = 1
                        break
            self._state.update((cum, emitted))
            if out is not None:
                yield out

        def close(self) -> None:
            pass

    return (
        _prepare(events)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=ThresholdProcessor(),
            outputStructType=OUT_SCHEMA,
            outputMode="Append",
            timeMode="None",
        )
    )
