"""Custom connector via the Spark 4 Python DataSource API.

The reference's host framework contributes sources as plugins
(``DelimitedExtract`` etc. — SURVEY §2b); Spark 4's ``pyspark.sql.
datasource`` is the idiomatic PySpark seam for the same extension point:
a pure-Python connector that still gets planned like a native scan —
partitioned reads (one ``InputPartition`` per split → real parallelism)
and filter pushdown (``pushFilters`` narrows the id range BEFORE data is
generated/fetched, the Python-source equivalent of parquet's
PushedFilters).

``synthetic_events`` generates a deterministic event table from pure id
arithmetic — every column is a closed-form function of ``event_id``, so a
SQL oracle can reproduce the exact rows the connector serves (the same
generative-oracle trick as the PNG perceptual hash). At 100 TB the same
class shape fronts a real external system (object store, REST, kafka
snapshot): split planning and predicate pushdown are what keep such a
source from becoming a single-threaded full-fetch.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

_SCHEMA_DDL = "event_id bigint, user_id bigint, event_type string, value double"


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticEventsReader(DataSourceReader):
    """Deterministic generator with id-range filter pushdown.

    Row formula (the oracle's spec):
      user_id    = event_id % 1000
      event_type = EVENT_TYPES[event_id % 5]
      value      = (event_id * 7919 % 100000) / 100.0
    """

    def __init__(self, schema: StructType, options: dict):
        self.n = int(options.get("n", 100_000))
        self.num_partitions = int(options.get("partitions", 8))
        self.lo = 0
        self.hi = self.n

    def pushFilters(self, filters):  # noqa: N802 — Spark API name
        """Absorb event_id range predicates by narrowing [lo, hi); everything
        else is returned for Spark to re-apply. Supported shapes cover what
        Catalyst actually emits for `event_id >= a AND event_id < b`.

        The range RESETS on every call: Spark re-invokes pushFilters when the
        same relation is re-planned under a different predicate, and the
        narrowed range must not leak between plans. (Caveat pinned by the
        tests: an UNFILTERED re-scan of a DataFrame previously planned WITH
        filters never calls pushFilters, so it would see the stale range —
        create one DataFrame per logical read, which is the normal usage.)"""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        self.lo, self.hi = 0, self.n
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            if col != "event_id":
                yield f
                continue
            if isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f  # unsupported predicate on event_id → Spark applies

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        k = max(1, self.num_partitions)
        span = hi - lo
        step = max(1, -(-span // k)) if span else 1
        parts = []
        s = lo
        while s < hi:
            parts.append(_RangePartition(s, min(s + step, hi)))
            s += step
        return parts or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (
                i,
                i % 1000,
                EVENT_TYPES[i % 5],
                (i * 7919 % 100000) / 100.0,
            )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(schema, self.options)

    def streamReader(self, schema: StructType):  # noqa: N802 — Spark API name
        return SyntheticEventsStreamReader(schema, self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------------
# Streaming side of the same connector (Spark 4 DataSourceStreamReader)
# ---------------------------------------------------------------------------


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Offset-tracked STREAMING reader over the same generative row formula.

    The offset is the next unread ``event_id``: ``latestOffset`` exposes the
    bounded end ``n``, each micro-batch reads [committed, latest) and a
    checkpointed restart with a LARGER ``n`` reads exactly the delta — the
    incremental-ingestion contract, pinned in ``tests/test_pydatasource.py``.
    (Spark's Python micro-batch wrapper runs availableNow as a single-batch
    fallback, so the whole remaining range is one batch; parallelism comes
    from ``partitions(start, end)`` splitting that range into real
    InputPartitions.) Offsets are plain dicts — checkpointable JSON,
    replayable via partitions(start, end) on recovery. The same SQL
    generative oracle that checks the batch reader checks this path.
    """

    def __init__(self, schema, options: dict):
        self.n = int(options.get("n", 100_000))
        self.num_partitions = int(options.get("partitions", 8))

    def initialOffset(self):  # noqa: N802 — Spark API name
        return {"next_id": 0}

    def latestOffset(self):  # noqa: N802 — Spark API name
        return {"next_id": self.n}

    def partitions(self, start, end):
        lo, hi = int(start["next_id"]), int(end["next_id"])
        k = max(1, self.num_partitions)
        span = max(0, hi - lo)
        step = max(1, -(-span // k)) if span else 1
        parts = []
        s = lo
        while s < hi:
            parts.append(_RangePartition(s, min(s + step, hi)))
            s += step
        return parts or [_RangePartition(0, 0)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield (
                i,
                i % 1000,
                EVENT_TYPES[i % 5],
                (i * 7919 % 100000) / 100.0,
            )

    def commit(self, end):
        pass

    def stop(self):
        pass
