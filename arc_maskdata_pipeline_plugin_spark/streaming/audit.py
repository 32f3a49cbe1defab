"""Streaming-run witnesses (r09, VERDICT r08 next-round #2).

The 12 ``q_stream_*`` queries were previously hash-oracled only via
BATCH-EQUIVALENCE: drain the stream with ``availableNow`` and compare the
materialized rows against the batch SQL. That proves the *values* but not
the *streaming-specific contracts* — state bounds, watermark eviction,
exactly-once firing. Each drain now also captures the run's
``StreamingQueryProgress`` metrics and the query appends

(a) EXACT INTEGERS both engines derive independently (counts of events /
    distinct keys / groups / buffered rows — real cross-engine values), and
(b) Spark-side VERDICTS comparing the OBSERVED streaming metrics against
    those exact integers; the DuckDB oracle re-derives the exact integers
    and pins every verdict to ``CAST(1 AS BIGINT)``

— the r08 audit-conversion soundness rule (verdicts never compare floats
across engines, and only pin THEOREM-backed contracts). The theorems used
by call sites, with why they cannot flap at any SF or batch count:

* ``dropDuplicates`` / ``dropDuplicatesWithinWatermark`` store exactly one
  state row per distinct key seen within the horizon; with a horizon that
  outlasts the data's event-time span, final state rows == COUNT(DISTINCT
  keys) and evictions == 0, for ANY micro-batch decomposition.
* ``numDroppedDuplicateRows`` is additive across batches and every input
  row is either first-of-key or a dropped duplicate, so its run total ==
  n_rows − n_distinct_keys (plain ``dropDuplicates`` populates the metric).
* A streaming aggregation's state is one row per grouping key, so final
  ``numRowsTotal`` == the batch COUNT(DISTINCT group) — and for a sketch
  with a fixed cell space (CMS: d×w) it is bounded by that constant
  REGARDLESS of key cardinality or stream length.
* A stream-static join holds NO streaming state (the static side is
  re-resolved per micro-batch) — ``stateOperators`` has exactly one entry,
  the downstream aggregation.
* A stream-stream INNER join buffers every non-late input row in the
  symmetric hash join state, so buffered-rows accounting holds exactly:
  final numRowsTotal + Σ numRowsRemoved + Σ numRowsDroppedByWatermark ==
  rows arriving on both sides.
* For a stream-stream LEFT OUTER join, a click withheld at query end
  (young enough that a matching purchase could still arrive) MUST still be
  in state — so n_withheld ≤ final numRowsTotal ≤ rows on both sides.
  (Spark's outer-join state bookkeeping removes matched rows early, so
  the inner join's exact accounting identity does NOT hold here — measured
  r09 at sf0.001: total 3 + removed 200 ≠ 412 buffered; only the
  inequalities are theorem-backed.)
* ``applyInPandasWithState`` operators that ``state.update`` for every key
  they see hold exactly one state row per distinct key, and their
  ``emitted`` latches make the sink-row total across ALL batches equal the
  batch-twin's row count (exactly-once firing).
* ``numInputRows`` sums the rows the SOURCE served; a drain that scans the
  source once serves exactly the batch COUNT(*) (twice for a two-branch
  self-join) — the offset-accounting contract of the streaming source.

Observed metrics are integers produced by the engine's state-store
instrumentation; the comparisons run in-plan (``F.lit(observed) ==
exact_column``), so every verdict is a Spark-side integer comparison the
oracle pins — never a cross-engine float.
"""

from __future__ import annotations

import json
import tempfile
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class StateOpMetrics:
    """Final-batch snapshot + run totals for one stateful operator."""

    op: str
    rows_total: int  # numRowsTotal at the LAST progress (end-of-run state)
    removed_sum: int  # Σ numRowsRemoved over the run (evictions)
    dropped_wm_sum: int  # Σ numRowsDroppedByWatermark (late rows discarded)
    dropped_dup_sum: int  # Σ customMetrics.numDroppedDuplicateRows


@dataclass
class StreamRunMetrics:
    n_input: int = 0  # Σ numInputRows (rows the source served)
    n_data_batches: int = 0  # micro-batches with input rows
    sink_rows: int = 0  # Σ sink.numOutputRows (append mode: total emitted)
    state_ops: list[StateOpMetrics] = field(default_factory=list)
    watermark_final: str | None = None

    def op(self, i: int = 0) -> StateOpMetrics:
        return self.state_ops[i]


def drain_with_metrics(
    df: DataFrame, name: str, output_mode: str = "complete"
) -> tuple[DataFrame, StreamRunMetrics]:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; return (materialized result, progress-metric summary).

    ``sink_rows`` sums across batches — meaningful for append mode (total
    rows emitted over the run); complete-mode call sites must not use it
    (each batch rewrites the full snapshot)."""
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progs = [json.loads(p.json) for p in q.recentProgress]
    m = StreamRunMetrics(
        n_input=sum(p.get("numInputRows", 0) for p in progs),
        n_data_batches=sum(1 for p in progs if p.get("numInputRows", 0) > 0),
        sink_rows=sum(
            max(p.get("sink", {}).get("numOutputRows", 0), 0) for p in progs
        ),
        watermark_final=(
            progs[-1].get("eventTime", {}).get("watermark") if progs else None
        ),
    )
    last_ops = progs[-1].get("stateOperators", []) if progs else []
    for i, s in enumerate(last_ops):
        m.state_ops.append(
            StateOpMetrics(
                op=s.get("operatorName", ""),
                rows_total=s.get("numRowsTotal", 0),
                removed_sum=sum(
                    p["stateOperators"][i].get("numRowsRemoved", 0)
                    for p in progs
                    if len(p.get("stateOperators", [])) > i
                ),
                dropped_wm_sum=sum(
                    p["stateOperators"][i].get("numRowsDroppedByWatermark", 0)
                    for p in progs
                    if len(p.get("stateOperators", [])) > i
                ),
                dropped_dup_sum=sum(
                    p["stateOperators"][i]
                    .get("customMetrics", {})
                    .get("numDroppedDuplicateRows", 0)
                    for p in progs
                    if len(p.get("stateOperators", [])) > i
                ),
            )
        )
    return df.sparkSession.table(name), m


def witness(
    result: DataFrame, exact: DataFrame, verdicts: dict[str, Column]
) -> DataFrame:
    """Append a 1-row audit frame (exact integers + BIGINT 0/1 verdicts) to
    every result row. ``exact`` is a 1-row frame of exact BIGINTs the oracle
    re-derives; each verdict Column is a boolean over ``exact``'s columns
    and ``F.lit(observed_metric)`` literals, emitted as 1/0 and pinned to
    ``CAST(1 AS BIGINT)`` by the oracle."""
    audit = exact.select(
        "*",
        *(
            F.when(v, 1).otherwise(0).cast("bigint").alias(k)
            for k, v in verdicts.items()
        ),
    )
    return result.crossJoin(F.broadcast(audit))


def drain_foreach_with_metrics(df: DataFrame, fn) -> StreamRunMetrics:
    """Drain a streaming frame through ``foreachBatch`` (availableNow) and
    return the progress-metric summary.

    ``foreachBatch`` is the sanctioned Structured Streaming escape hatch
    for per-batch logic the engine can't express as stateful operators
    (here: windowed winnowing + a store probe). The ENGINE holds no
    streaming state for it — any cross-batch state lives in the caller's
    own store — so ``state_ops`` records whatever (usually nothing) the
    progress reports, and call sites pin that emptiness as a witness."""
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (
            df.writeStream.foreachBatch(fn)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progs = [json.loads(p.json) for p in q.recentProgress]
    m = StreamRunMetrics(
        n_input=sum(p.get("numInputRows", 0) for p in progs),
        n_data_batches=sum(1 for p in progs if p.get("numInputRows", 0) > 0),
        sink_rows=0,  # foreachBatch: the caller's sink, not the engine's
        watermark_final=(
            progs[-1].get("eventTime", {}).get("watermark") if progs else None
        ),
    )
    last_ops = progs[-1].get("stateOperators", []) if progs else []
    for i, s in enumerate(last_ops):
        m.state_ops.append(
            StateOpMetrics(
                op=s.get("operatorName", ""),
                rows_total=s.get("numRowsTotal", 0),
                removed_sum=sum(
                    p["stateOperators"][i].get("numRowsRemoved", 0)
                    for p in progs
                    if len(p.get("stateOperators", [])) > i
                ),
                dropped_wm_sum=sum(
                    p["stateOperators"][i].get("numRowsDroppedByWatermark", 0)
                    for p in progs
                    if len(p.get("stateOperators", [])) > i
                ),
                dropped_dup_sum=sum(
                    p["stateOperators"][i]
                    .get("customMetrics", {})
                    .get("numDroppedDuplicateRows", 0)
                    for p in progs
                    if len(p.get("stateOperators", [])) > i
                ),
            )
        )
    return m
