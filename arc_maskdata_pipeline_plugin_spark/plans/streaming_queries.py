"""Streaming queries for the driver contract.

``q_stream_event_counts`` runs a REAL Structured Streaming job (file source →
watermark → tumbling window → memory sink, availableNow trigger) and returns
the materialized result. Because the windows are epoch-aligned and the
watermark outlasts the data, the result equals the batch group-by — which is
exactly what the DuckDB oracle computes (streaming/batch consistency check).
"""

from __future__ import annotations

import uuid

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..streaming import read_events_stream, run_available_now, windowed_event_counts
from ..streaming.audit import drain_with_metrics, witness
from . import stats as _stats
from .registry import T, register


@register(
    "q_sessionize_events",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS INTEGER) AS n_events
FROM numbered
GROUP BY user_id, session_seq
""",
)
def q_sessionize_events(spark, sf_dir):
    from ..streaming.sessions import sessionize_batch

    e = T(spark, sf_dir, "events")
    return sessionize_batch(e, gap_minutes=30)


@register(
    "q_stream_event_counts",
    oracle="""
WITH res AS (
  SELECT strftime(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
  FROM events
  GROUP BY 1, 2
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events_exact,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM (
            SELECT DISTINCT time_bucket(INTERVAL '10 minutes', ts), event_type
            FROM events)) AS n_groups_exact,
         CAST(1 AS BIGINT) AS input_complete_ok,
         CAST(1 AS BIGINT) AS state_rows_eq_groups_ok,
         CAST(1 AS BIGINT) AS none_dropped_by_watermark_ok
) a
""",
)
def q_stream_event_counts(spark, sf_dir):
    """Watermarked tumbling-window streaming aggregation, PLUS streaming-run
    witnesses (r09, VERDICT r08 #2): the drain's StreamingQueryProgress
    metrics are compared in-plan against exact batch integers —
    ``numInputRows`` total == COUNT(*) of the source (the file source served
    every row exactly once), final aggregation state rows == the batch count
    of distinct (window, type) groups (streaming-agg state is one row per
    group), and zero rows were dropped by the watermark (the 7-day delay
    outlasts every micro-batch's lateness under this drain). The oracle
    re-derives both exact integers and pins the verdicts to 1."""
    stream = read_events_stream(spark, sf_dir)
    counts = windowed_event_counts(stream, window="10 minutes", watermark="7 days")
    result, m = drain_with_metrics(
        counts, f"stream_counts_{uuid.uuid4().hex[:8]}", "complete"
    )
    ev = T(spark, sf_dir, "events")
    exact = ev.select(
        F.window("ts", "10 minutes")["start"].alias("ws"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events_exact"),
        F.count_distinct("ws", "event_type").cast("bigint").alias("n_groups_exact"),
    )
    return witness(
        result,
        exact,
        {
            "input_complete_ok": F.lit(m.n_input) == F.col("n_events_exact"),
            "state_rows_eq_groups_ok": F.lit(m.op().rows_total)
            == F.col("n_groups_exact"),
            "none_dropped_by_watermark_ok": F.lit(m.op().dropped_wm_sum) == F.lit(0),
        },
    )


@register(
    "q_stream_dedup_user_types",
    oracle="""
WITH res AS (
  SELECT DISTINCT user_id, event_type FROM events
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events_exact,
         (SELECT CAST(COUNT(*) AS BIGINT)
          FROM (SELECT DISTINCT user_id, event_type FROM events))
           AS n_keys_exact,
         CAST(1 AS BIGINT) AS dedup_state_eq_keys_ok,
         CAST(1 AS BIGINT) AS dropped_dups_exact_ok,
         CAST(1 AS BIGINT) AS none_dropped_by_watermark_ok
) a
""",
)
def q_stream_dedup_user_types(spark, sf_dir):
    """Streaming deduplication (``dropDuplicates`` on a watermarked stream),
    PLUS streaming-run witnesses (r09, VERDICT r08 #2): the dedup operator
    stores exactly one state row per distinct key seen (keys without the
    event-time column are never evicted), so final state rows must equal the
    batch COUNT(DISTINCT user_id, event_type); and every input row is either
    first-of-key or counted in ``numDroppedDuplicateRows`` (additive across
    batches), so that run total must equal n_events − n_keys. Both exact
    integers are re-derived by the oracle, which pins the verdicts to 1."""
    stream = read_events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "7 days")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    result, m = drain_with_metrics(
        deduped, f"stream_dedup_{uuid.uuid4().hex[:8]}", "append"
    )
    ev = T(spark, sf_dir, "events")
    exact = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events_exact"),
        F.count_distinct("user_id", "event_type")
        .cast("bigint")
        .alias("n_keys_exact"),
    )
    return witness(
        result,
        exact,
        {
            "dedup_state_eq_keys_ok": F.lit(m.op().rows_total)
            == F.col("n_keys_exact"),
            "dropped_dups_exact_ok": F.lit(m.op().dropped_dup_sum)
            == F.col("n_events_exact") - F.col("n_keys_exact"),
            "none_dropped_by_watermark_ok": F.lit(m.op().dropped_wm_sum) == F.lit(0),
        },
    )


@register(
    "q_stream_static_enrich",
    oracle="""
WITH res AS (
  SELECT c_mktsegment,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
  FROM events JOIN customer ON user_id = c_custkey
  GROUP BY c_mktsegment
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events_exact,
         (SELECT CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT)
          FROM events JOIN customer ON user_id = c_custkey)
           AS n_groups_exact,
         CAST(1 AS BIGINT) AS input_complete_ok,
         CAST(1 AS BIGINT) AS join_is_stateless_ok,
         CAST(1 AS BIGINT) AS state_rows_eq_groups_ok
) a
""",
)
def q_stream_static_enrich(spark, sf_dir):
    """Stream-static join (broadcast dim, re-resolved per micro-batch) into
    a streaming aggregate, PLUS streaming-run witnesses (r09, VERDICT r08
    #2): a stream-static join holds NO streaming state — the run's
    ``stateOperators`` must have exactly ONE entry (the aggregation), which
    is the contract separating this plan from a stateful stream-stream join;
    the aggregation's final state rows must equal the batch count of
    distinct joined segments; and ``numInputRows`` counts only the STREAM
    side (the static dim is not source input), so it must equal the batch
    COUNT(*) of events. The oracle re-derives the exact integers and pins
    the verdicts to 1."""
    stream = read_events_stream(spark, sf_dir)
    from pyspark.sql import functions as F

    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = stream.join(F.broadcast(cust), stream.user_id == cust.c_custkey)
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("total_value"),
    )
    result, m = drain_with_metrics(
        agg, f"stream_enrich_{uuid.uuid4().hex[:8]}", "complete"
    )
    ev = T(spark, sf_dir, "events")
    joined = ev.join(F.broadcast(cust), ev.user_id == cust.c_custkey)
    exact = joined.agg(
        F.count_distinct("c_mktsegment").cast("bigint").alias("n_groups_exact")
    ).crossJoin(
        F.broadcast(ev.agg(F.count(F.lit(1)).cast("bigint").alias("n_events_exact")))
    )
    return witness(
        result,
        exact,
        {
            "input_complete_ok": F.lit(m.n_input) == F.col("n_events_exact"),
            "join_is_stateless_ok": F.lit(len(m.state_ops)) == F.lit(1),
            "state_rows_eq_groups_ok": F.lit(m.op().rows_total)
            == F.col("n_groups_exact"),
        },
    )


@register(
    "q_stream_stream_join",
    oracle="""
WITH res AS (
  SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
  FROM events a JOIN events b ON a.user_id = b.user_id
  WHERE a.event_type = 'click' AND b.event_type = 'purchase'
    AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 MINUTE
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events_exact,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM events
          WHERE event_type IN ('click', 'purchase')) AS n_sides_exact,
         CAST(1 AS BIGINT) AS input_complete_ok,
         CAST(1 AS BIGINT) AS state_accounting_ok,
         CAST(1 AS BIGINT) AS none_dropped_by_watermark_ok
) a
""",
)
def q_stream_stream_join(spark, sf_dir):
    """Stream-stream inner join with event-time range + watermarks on BOTH
    sides — the canonical Structured Streaming two-stream correlation
    (click → purchase attribution within an hour).

    State-size note (the 100 TB concern): the range condition plus the two
    watermarks bound the join state — each side buffers only rows younger
    than (watermark + join window), so state is O(arrival rate × window),
    not O(stream length). With ``availableNow`` and a watermark that
    outlasts the test data, every qualifying pair is emitted, which makes
    the result exactly the batch self-join the oracle runs.
    """
    from pyspark.sql import functions as F

    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "30 days")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "30 days")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            c_user = p_user AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + INTERVAL 60 MINUTES
            """
        ),
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")
    result, m = drain_with_metrics(
        joined, f"stream_ss_join_{uuid.uuid4().hex[:8]}", "append"
    )
    # Streaming-run witnesses (r09, VERDICT r08 #2). The symmetric hash join
    # buffers EVERY non-late row arriving on either side, so the run's state
    # accounting is exact: final numRowsTotal + Σ removed + Σ dropped-late ==
    # clicks + purchases (at the test SFs the 30-day watermark outlasts the
    # 29.99-day event span — verified at sf0.001/0.01/0.1 — so removed is 0
    # and state holds both sides in full). numInputRows counts SOURCE rows:
    # the two branches each scan the events source once (filters apply after
    # the source), so input == 2 × COUNT(*).
    ev = T(spark, sf_dir, "events")
    exact = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events_exact"),
        F.sum(F.col("event_type").isin("click", "purchase").cast("int"))
        .cast("bigint")
        .alias("n_sides_exact"),
    )
    return witness(
        result,
        exact,
        {
            "input_complete_ok": F.lit(m.n_input)
            == F.lit(2) * F.col("n_events_exact"),
            "state_accounting_ok": F.lit(
                m.op().rows_total + m.op().removed_sum + m.op().dropped_wm_sum
            )
            == F.col("n_sides_exact"),
            "none_dropped_by_watermark_ok": F.lit(m.op().dropped_wm_sum) == F.lit(0),
        },
    )


@register(
    "q_session_window_native",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) >= 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS seq
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
FROM numbered
GROUP BY user_id, seq
""",
)
def q_session_window_native(spark, sf_dir):
    """Native ``session_window`` aggregation (Spark's built-in gap-session
    operator, batch mode; the same expression works on a watermarked stream).
    Spark merges an event into the current session iff gap < 30 min, so the
    oracle's new-session predicate is ``diff >= gap``; session_end is
    last-event + gap by definition. One shuffle on (user_id) — the session
    merge happens inside the aggregation, no window-function second pass.
    """
    from pyspark.sql import functions as F

    e = T(spark, sf_dir, "events").select("user_id", "ts", "value")
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", fmt).alias("session_start"),
            F.date_format("sw.end", fmt).alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@register(
    "q_stream_dedup_within_watermark",
    oracle="""
WITH res AS (
  SELECT DISTINCT user_id, event_type FROM events
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT)
          FROM (SELECT DISTINCT user_id, event_type FROM events))
           AS n_keys_exact,
         CAST(1 AS BIGINT) AS dedup_state_eq_keys_ok,
         CAST(1 AS BIGINT) AS no_state_evicted_ok,
         CAST(1 AS BIGINT) AS none_dropped_by_watermark_ok
) a
""",
)
def q_stream_dedup_within_watermark(spark, sf_dir):
    """State-BOUNDED streaming dedup: ``dropDuplicatesWithinWatermark``
    (Spark 3.5+) deduplicates on the key columns alone while still evicting
    state by the event-time watermark — unlike plain ``dropDuplicates``,
    whose state is only evicted when the event-time column is part of the
    key. This is the 100 TB shape for unbounded key spaces: state ≈ keys
    seen within the watermark horizon, not keys ever seen. The delay here
    exceeds the dataset's event-time span so the result is exactly the
    batch DISTINCT, which the oracle checks; production uses an SLA-sized
    delay and accepts re-emission of keys recurring beyond it.

    Streaming-run witnesses (r09, VERDICT r08 #2): within the horizon the
    operator stores exactly one state row per distinct key, so final state
    rows == batch COUNT(DISTINCT keys) and — because the 3650-day horizon
    outlasts the 30-day event span (verified at sf0.001/0.01/0.1) — zero
    state rows were evicted over the run. The EVICTION side of the contract
    (keys ARE dropped once the watermark passes them, and re-emitted on
    recurrence) is pinned on constructed multi-batch input in
    tests/test_stream_audits.py, where a short horizon forces it."""
    stream = read_events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "3650 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    result, m = drain_with_metrics(
        deduped, f"stream_dedup_ww_{uuid.uuid4().hex[:8]}", "append"
    )
    exact = T(spark, sf_dir, "events").agg(
        F.count_distinct("user_id", "event_type")
        .cast("bigint")
        .alias("n_keys_exact")
    )
    return witness(
        result,
        exact,
        {
            "dedup_state_eq_keys_ok": F.lit(m.op().rows_total)
            == F.col("n_keys_exact"),
            "no_state_evicted_ok": F.lit(m.op().removed_sum) == F.lit(0),
            "none_dropped_by_watermark_ok": F.lit(m.op().dropped_wm_sum) == F.lit(0),
        },
    )


@register(
    "q_stream_cms_cells",
    oracle=f"""
WITH res AS (
{" UNION ALL ".join(
    f"SELECT {j} AS j, {_stats._cms_bucket_duck(j, 'user_id')} AS bucket, "
    f"CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY bucket"
    for j in range(_stats._CMS_D)
)}
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events_exact,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM res) AS n_cells_exact,
         CAST(1 AS BIGINT) AS input_complete_ok,
         CAST(1 AS BIGINT) AS state_rows_eq_cells_ok,
         CAST(1 AS BIGINT) AS state_bounded_ok
) a
""",
)
def q_stream_cms_cells(spark, sf_dir):
    """STREAMING sketch maintenance: the count-min cells of
    ``q_heavy_hitters_cms`` built by a streaming aggregation instead of a
    batch one — each event fans out to its 4 (hash-row, bucket) cells
    (partition-local explode), and the running cell counts are streaming
    state of CONSTANT size (4x256 cells, whatever the key cardinality or
    stream length — why sketches, not exact counts, monitor 100 TB/day
    telemetry). Drained with availableNow the final cells equal the batch
    sketch bit-for-bit, which the batch-SQL oracle asserts."""
    import uuid as _uuid

    from ..streaming.events import read_events_stream, run_available_now

    stream = read_events_stream(spark, sf_dir)
    fan = stream.select(
        F.explode(
            F.array(
                *(
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(_stats._cms_bucket_spark(j, "user_id")).alias("bucket"),
                    )
                    for j in range(_stats._CMS_D)
                )
            )
        ).alias("cell")
    ).select("cell.j", "cell.bucket")
    cells = fan.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    result, m = drain_with_metrics(
        cells, f"stream_cms_{_uuid.uuid4().hex[:8]}", "complete"
    )
    # Streaming-run witnesses (r09, VERDICT r08 #2): the constant-state
    # claim above, measured from the run's own metrics — final state rows ==
    # the batch count of NON-EMPTY cells (one state row per touched
    # (hash-row, bucket) cell), and ≤ d×w = 4×256 = 1024 regardless of key
    # cardinality or stream length (the sketch's fixed cell space).
    ev = T(spark, sf_dir, "events")
    batch_fan = ev.select(
        F.explode(
            F.array(
                *(
                    F.struct(
                        F.lit(j).alias("j"),
                        F.expr(_stats._cms_bucket_spark(j, "user_id")).alias(
                            "bucket"
                        ),
                    )
                    for j in range(_stats._CMS_D)
                )
            )
        ).alias("cell")
    ).select("cell.j", "cell.bucket")
    exact = batch_fan.agg(
        F.count_distinct("j", "bucket").cast("bigint").alias("n_cells_exact")
    ).crossJoin(
        F.broadcast(ev.agg(F.count(F.lit(1)).cast("bigint").alias("n_events_exact")))
    )
    return witness(
        result,
        exact,
        {
            "input_complete_ok": F.lit(m.n_input) == F.col("n_events_exact"),
            "state_rows_eq_cells_ok": F.lit(m.op().rows_total)
            == F.col("n_cells_exact"),
            "state_bounded_ok": F.lit(m.op().rows_total)
            <= F.lit(_stats._CMS_D * _stats._CMS_W),
        },
    )


@register(
    "q_stream_stream_left_join",
    oracle="""
WITH c AS (
  SELECT user_id AS c_user, event_id AS click_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id AS p_user, event_id AS purchase_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT LEAST((SELECT MAX(click_ts) FROM c), (SELECT MAX(purchase_ts) FROM p))
         - INTERVAL 1 MINUTE AS w
),
res AS (
  SELECT c.c_user AS user_id, c.click_id, p.purchase_id
  FROM c
  LEFT JOIN p ON c.c_user = p.p_user
             AND p.purchase_ts >= c.click_ts
             AND p.purchase_ts <= c.click_ts + INTERVAL 60 MINUTE
  CROSS JOIN wm
  WHERE p.purchase_id IS NOT NULL
     OR c.click_ts + INTERVAL 60 MINUTE < wm.w
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM c)
           + (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_sides_exact,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM c)
           - (SELECT CAST(COUNT(DISTINCT click_id) AS BIGINT) FROM res)
           AS n_withheld_exact,
         CAST(1 AS BIGINT) AS withheld_in_state_ok,
         CAST(1 AS BIGINT) AS state_le_buffered_ok
) a
""",
)
def q_stream_stream_left_join(spark, sf_dir):
    """Stream-stream LEFT OUTER join with event-time range + watermarks —
    clicks that never convert within the hour surface as (click, NULL) rows,
    the attribution-with-abandonment shape.

    The outer side exercises semantics the inner join doesn't: an unmatched
    click can only emit once the global watermark proves no qualifying
    purchase can still arrive (watermark > click_ts + join window); rows
    younger than that horizon are withheld in state at query end, NOT
    emitted with NULLs prematurely. The oracle encodes exactly that
    contract: a batch left join plus the eviction predicate against
    W = min(max event time per stream) − delay — so the gate verifies the
    watermark semantics themselves, not just the matched pairs.

    State is bounded exactly as in the inner join: each side buffers only
    rows younger than (watermark + window), O(arrival rate × window)."""
    from pyspark.sql import functions as F

    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 minute")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 minute")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            """
            c_user = p_user AND
            purchase_ts >= click_ts AND
            purchase_ts <= click_ts + INTERVAL 60 MINUTES
            """
        ),
        "left_outer",
    ).select(F.col("c_user").alias("user_id"), "click_id", "purchase_id")
    result, m = drain_with_metrics(
        joined, f"stream_ss_louter_{uuid.uuid4().hex[:8]}", "append"
    )
    # Streaming-run witnesses (r09, VERDICT r08 #2). Outer-join state
    # bookkeeping removes matched rows early, so the inner join's exact
    # buffered-rows identity does NOT hold (measured r09 at sf0.001: final 3
    # + removed 200 ≠ 412 buffered) — only the theorem-backed INEQUALITIES
    # are pinned: every click withheld at query end (young enough that a
    # qualifying purchase could still arrive) must still be in state, so
    # n_withheld ≤ final state rows ≤ rows arriving on both sides.
    # n_withheld is derived from the RESULT (clicks minus distinct emitted
    # click_ids), which the row-level hash has already proven equal to the
    # oracle's eviction-predicate replay.
    ev = T(spark, sf_dir, "events")
    sides = ev.agg(
        F.sum(F.col("event_type").isin("click", "purchase").cast("int"))
        .cast("bigint")
        .alias("n_sides_exact"),
        F.sum((F.col("event_type") == "click").cast("int"))
        .cast("bigint")
        .alias("n_clicks_exact"),
    )
    exact = (
        result.agg(
            F.count_distinct("click_id").cast("bigint").alias("n_emitted")
        )
        .crossJoin(F.broadcast(sides))
        .select(
            (F.col("n_clicks_exact") - F.col("n_emitted"))
            .cast("bigint")
            .alias("n_withheld_exact"),
            "n_sides_exact",
        )
    )
    return witness(
        result,
        exact,
        {
            "withheld_in_state_ok": F.col("n_withheld_exact")
            <= F.lit(m.op().rows_total),
            "state_le_buffered_ok": F.lit(m.op().rows_total)
            <= F.col("n_sides_exact"),
        },
    )


@register(
    "q_stream_threshold_alert",
    oracle="""
WITH c AS (
  SELECT user_id, event_id, ts,
         CAST(floor(CAST(value AS DECIMAL(10,2)) * 100) AS BIGINT) AS vc
  FROM events
),
r AS (
  SELECT *, SUM(vc) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM c
),
x AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM r WHERE cum > 300000
),
res AS (
  SELECT user_id, event_id AS crossing_event_id, ts AS crossing_ts,
         CAST(cum AS BIGINT) AS cum_cents
  FROM x WHERE rn = 1
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events_exact,
         (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
           AS n_users_exact,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM res) AS n_crossings_exact,
         CAST(1 AS BIGINT) AS input_complete_ok,
         CAST(1 AS BIGINT) AS state_keys_eq_users_ok,
         CAST(1 AS BIGINT) AS fired_exactly_once_ok
) a
""",
)
def q_stream_threshold_alert(spark, sf_dir):
    """Custom stateful streaming operator (streaming/threshold.py): the
    FIRST event at which a user's cumulative spend crosses $3000 — fires
    exactly once per user with the crossing event's identity. Expressible in
    batch as a running-sum window (the oracle); in streaming it needs
    arbitrary per-key state (cum, emitted), here via
    ``applyInPandasWithState`` with the StatefulProcessor-v2 twin gated on
    protobuf (see module docstring). Integer-cents accumulation makes the
    crossing engine-exact; (ts, event_id) ordering makes it tie-proof."""
    from ..streaming.threshold import first_threshold_crossing

    stream = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    out = first_threshold_crossing(stream, threshold_cents=300_000)
    result, m = drain_with_metrics(
        out, f"stream_threshold_{uuid.uuid4().hex[:8]}", "append"
    )
    # Streaming-run witnesses (r09, VERDICT r08 #2): the operator
    # state.update()s for EVERY user it sees, so final state rows == batch
    # COUNT(DISTINCT user_id); and the `emitted` latch means the sink-row
    # total across ALL batches equals the batch twin's crossing-user count
    # (exactly-once firing, measured from the run's own sink metrics — an
    # independent Spark-side running-sum window derivation, not the result).
    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value").cast("decimal(10,2)") * 100)
        .cast("bigint")
        .alias("vc"),
    ).withColumn("cum", F.sum("vc").over(w))
    exact = cum.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events_exact"),
        F.count_distinct("user_id").cast("bigint").alias("n_users_exact"),
        F.count_distinct(F.when(F.col("cum") > 300_000, F.col("user_id")))
        .cast("bigint")
        .alias("n_crossings_exact"),
    )
    return witness(
        result,
        exact,
        {
            "input_complete_ok": F.lit(m.n_input) == F.col("n_events_exact"),
            "state_keys_eq_users_ok": F.lit(m.op().rows_total)
            == F.col("n_users_exact"),
            "fired_exactly_once_ok": F.lit(m.sink_rows)
            == F.col("n_crossings_exact"),
        },
    )


@register(
    "q_stream_fingerprint",
    oracle="""
WITH rows_fp AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(
             CAST(event_id AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)
             || '|' || event_type), 1, 12)) AS BIGINT) AS fp48
  FROM events
),
res AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(fp48) AS VARCHAR) AS checksum
  FROM rows_fp GROUP BY event_type
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events_exact,
         (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM events)
           AS n_types_exact,
         CAST(1 AS BIGINT) AS input_complete_ok,
         CAST(1 AS BIGINT) AS state_rows_eq_types_ok
) a
""",
)
def q_stream_fingerprint(spark, sf_dir):
    """STREAMING anti-entropy fingerprint: the order-insensitive per-key
    checksum of ``q_table_fingerprint`` maintained as a streaming
    aggregation — state is one (count, sum) pair per partition key no matter
    the stream length, and because the fingerprint is a SUM of row hashes,
    micro-batch boundaries cannot affect it: the availableNow drain equals
    the batch checksum exactly (the batch-SQL oracle asserts it).

    Streaming-run witnesses (r09, VERDICT r08 #2): final aggregation state
    rows == batch COUNT(DISTINCT event_type) — the constant-state claim in
    the paragraph above, now measured from the run's own metrics instead of
    asserted; and ``numInputRows`` total == batch COUNT(*) (the source
    served every row exactly once). Oracle re-derives both, pins verdicts."""
    import uuid as _uuid

    from ..streaming.events import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    canon = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
    )
    fp48 = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("decimal(38,0)")
    agg = stream.select("event_type", fp48.alias("fp48")).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("fp48").cast("decimal(38,0)").cast("string").alias("checksum"),
    )
    result, m = drain_with_metrics(
        agg, f"stream_fp_{_uuid.uuid4().hex[:8]}", "complete"
    )
    exact = T(spark, sf_dir, "events").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events_exact"),
        F.count_distinct("event_type").cast("bigint").alias("n_types_exact"),
    )
    return witness(
        result,
        exact,
        {
            "input_complete_ok": F.lit(m.n_input) == F.col("n_events_exact"),
            "state_rows_eq_types_ok": F.lit(m.op().rows_total)
            == F.col("n_types_exact"),
        },
    )


@register(
    "q_python_datasource_stream",
    oracle="""
WITH gen AS (
  SELECT i AS event_id, i % 1000 AS user_id,
         (['click','view','purchase','signup','error'])[(i % 5) + 1]
           AS event_type,
         CAST((i * 7919 % 100000) / 100.0 AS DECIMAL(10,2)) AS v
  FROM range(0, 100000) t(i)
),
res AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS DOUBLE) AS total_value
  FROM gen GROUP BY event_type
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM gen) AS n_rows_exact,
         (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) FROM gen)
           AS n_types_exact,
         CAST(1 AS BIGINT) AS offsets_complete_ok,
         CAST(1 AS BIGINT) AS state_rows_eq_types_ok
) a
""",
)
def q_python_datasource_stream(spark, sf_dir):
    """STREAMING side of the Spark 4 Python DataSource connector
    (``sources/pydatasource.py::SyntheticEventsStreamReader``): the same
    generative row formula served through ``readStream`` with JSON-dict
    offsets, per-micro-batch InputPartition splits, and checkpointed
    incremental recovery (a restart with a larger bound reads exactly the
    delta — pinned in tests/test_pydatasource.py). The availableNow drain
    aggregates to the identical per-type totals the SQL generative oracle
    computes from ``range()`` — proving the streaming read path end to end,
    offsets included."""
    import uuid as _uuid

    from ..sources import pydatasource

    pydatasource.register(spark)
    stream = (
        spark.readStream.format("synthetic_events").option("n", 100_000).load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(10,2)"))
        .cast("double")
        .alias("total_value"),
    )
    result, m = drain_with_metrics(
        agg, f"pyds_stream_{_uuid.uuid4().hex[:8]}", "complete"
    )
    # Streaming-run witnesses (r09, VERDICT r08 #2): the streamed
    # numInputRows total must equal the BATCH read of the same connector —
    # the offset-accounting contract (every generated row served exactly
    # once across micro-batches, no gap, no double-read); and the
    # aggregation's final state rows == the connector's distinct type count.
    try:  # batch reader implements pushFilters — needs the pushdown conf
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:  # noqa: BLE001 — conf may be fixed on shared sessions
        pass
    batch = spark.read.format("synthetic_events").option("n", 100_000).load()
    exact = batch.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows_exact"),
        F.count_distinct("event_type").cast("bigint").alias("n_types_exact"),
    )
    return witness(
        result,
        exact,
        {
            "offsets_complete_ok": F.lit(m.n_input) == F.col("n_rows_exact"),
            "state_rows_eq_types_ok": F.lit(m.op().rows_total)
            == F.col("n_types_exact"),
        },
    )


@register(
    "q_stream_funnel_tracker",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS view_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.view_ts
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id
),
res AS (
  SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
         CAST(floor(epoch(p.purchase_ts) - epoch(v.view_ts)) AS BIGINT)
           AS latency_s
  FROM v JOIN c ON v.user_id = c.user_id JOIN p ON c.user_id = p.user_id
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events_exact,
         (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
           AS n_users_exact,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM res) AS n_completions_exact,
         CAST(1 AS BIGINT) AS input_complete_ok,
         CAST(1 AS BIGINT) AS state_keys_eq_users_ok,
         CAST(1 AS BIGINT) AS fired_exactly_once_ok
) a
""",
)
def q_stream_funnel_tracker(spark, sf_dir):
    """STATEFUL streaming ordered-funnel tracker
    (``streaming/funnel.py::funnel_completions``): one exactly-once
    completion row per user the moment view → click → purchase closes in
    strict event-time order, carried across micro-batches in three-integer
    state. The availableNow drain equals the batch SQL (v = MIN view,
    c = MIN click > v, p = MIN purchase > c); multi-batch state carry is
    pinned separately in tests/test_stream_funnel.py."""
    import uuid as _uuid

    from ..streaming.events import read_events_stream
    from ..streaming.funnel import funnel_completions

    stream = read_events_stream(spark, sf_dir)
    out = funnel_completions(stream)
    result, m = drain_with_metrics(
        out, f"funnel_{_uuid.uuid4().hex[:8]}", "append"
    )
    # Streaming-run witnesses (r09, VERDICT r08 #2): the tracker
    # state.update()s for EVERY user, so final state rows == batch
    # COUNT(DISTINCT user_id); the `emitted` latch means sink rows across
    # ALL batches == the batch twin's completion count (exactly-once) —
    # derived independently below via the v→c→p min-chain, not the result.
    ev = T(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    exact = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_completions_exact")
    ).crossJoin(
        F.broadcast(
            ev.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_events_exact"),
                F.count_distinct("user_id").cast("bigint").alias("n_users_exact"),
            )
        )
    )
    return witness(
        result,
        exact,
        {
            "input_complete_ok": F.lit(m.n_input) == F.col("n_events_exact"),
            "state_keys_eq_users_ok": F.lit(m.op().rows_total)
            == F.col("n_users_exact"),
            "fired_exactly_once_ok": F.lit(m.sink_rows)
            == F.col("n_completions_exact"),
        },
    )


_HYST_LOW = 2_000  # $20 — re-arm level
_HYST_HIGH = 12_000  # $120 — alert level


@register(
    "q_stream_hysteresis_alert",
    oracle=f"""
WITH c AS (
  SELECT user_id, event_id, ts,
         CAST(floor(CAST(value AS DECIMAL(10,2)) * 100) AS BIGINT) AS vc
  FROM events
),
marked AS (
  SELECT *, CASE WHEN vc > {_HYST_HIGH} THEN 1
                 WHEN vc < {_HYST_LOW} THEN 0 END AS regime
  FROM c
),
carried AS (
  SELECT *,
         last_value(regime IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_regime
  FROM marked
),
res AS (
  SELECT user_id, event_id AS alert_event_id, ts AS alert_ts,
         CAST(vc AS BIGINT) AS value_cents
  FROM carried
  WHERE vc > {_HYST_HIGH} AND COALESCE(prev_regime, 0) = 0
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events_exact,
         (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) FROM events)
           AS n_users_exact,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM res) AS n_alerts_exact,
         CAST(1 AS BIGINT) AS input_complete_ok,
         CAST(1 AS BIGINT) AS state_keys_eq_users_ok,
         CAST(1 AS BIGINT) AS fired_on_transitions_ok
) a
""",
)
def q_stream_hysteresis_alert(spark, sf_dir):
    """Flap-damped alerting (hysteresis / Schmitt trigger — the damping
    every production monitor applies so a metric oscillating around the cut
    doesn't page on every crossing): one alert per LOW→HIGH regime
    transition per user, re-armed only after the value falls below the low
    threshold. Streaming side is a per-key regime bit in
    ``applyInPandasWithState`` (streaming/hysteresis.py); the batch oracle
    is the non-recursive formulation — an event alerts iff it exceeds
    ``high`` and the most recent regime-defining event before it was a low
    (``last_value IGNORE NULLS`` carry-forward window per user)."""
    from ..streaming.hysteresis import hysteresis_alerts

    stream = read_events_stream(spark, sf_dir).select(
        "user_id", "event_id", "ts", "value"
    )
    out = hysteresis_alerts(stream, low_cents=_HYST_LOW, high_cents=_HYST_HIGH)
    result, m = drain_with_metrics(
        out, f"stream_hysteresis_{uuid.uuid4().hex[:8]}", "append"
    )
    # Streaming-run witnesses (r09, VERDICT r08 #2): the regime bit is
    # state.update()d for EVERY user, so final state rows == batch
    # COUNT(DISTINCT user_id); and sink rows across ALL batches == the batch
    # twin's alert count (one firing per LOW→HIGH transition, no flap) —
    # derived independently below via the carry-forward window, not from
    # the result rows.
    ev = T(spark, sf_dir, "events")
    vc = F.floor(F.col("value").cast("decimal(10,2)") * 100).cast("bigint")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts",
        vc.alias("vc"),
    ).withColumn(
        "regime",
        F.when(F.col("vc") > _HYST_HIGH, 1).when(F.col("vc") < _HYST_LOW, 0),
    )
    wprev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = marked.withColumn(
        "prev_regime", F.last("regime", ignorenulls=True).over(wprev)
    )
    exact = carried.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events_exact"),
        F.count_distinct("user_id").cast("bigint").alias("n_users_exact"),
        F.sum(
            (
                (F.col("vc") > _HYST_HIGH)
                & (F.coalesce(F.col("prev_regime"), F.lit(0)) == 0)
            ).cast("int")
        )
        .cast("bigint")
        .alias("n_alerts_exact"),
    )
    return witness(
        result,
        exact,
        {
            "input_complete_ok": F.lit(m.n_input) == F.col("n_events_exact"),
            "state_keys_eq_users_ok": F.lit(m.op().rows_total)
            == F.col("n_users_exact"),
            "fired_on_transitions_ok": F.lit(m.sink_rows)
            == F.col("n_alerts_exact"),
        },
    )


@register(
    "q_watermark_lateness_audit",
    oracle="""
WITH arr AS (
  SELECT event_type, ts,
         MAX(ts) OVER (PARTITION BY event_type ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
  FROM events
),
lat AS (
  SELECT event_type,
         CAST(date_diff('second', ts, run_max) AS BIGINT) AS late_s
  FROM arr
),
vc AS (
  SELECT event_type, late_s, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM lat GROUP BY 1, 2
),
cum AS (
  SELECT event_type, late_s,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY late_s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
         SUM(cnt) OVER (PARTITION BY event_type) AS tot
  FROM vc
)
SELECT event_type,
       CAST(MIN(tot) AS BIGINT) AS n_events,
       (SELECT CAST(SUM(CASE WHEN l.late_s > 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM lat l WHERE l.event_type = cum.event_type) AS n_late,
       CAST(MIN(CASE WHEN r >= CAST(ceil(0.5 * tot) AS BIGINT)
                THEN late_s END) AS BIGINT) AS p50_late_s,
       CAST(MIN(CASE WHEN r >= CAST(ceil(0.95 * tot) AS BIGINT)
                THEN late_s END) AS BIGINT) AS p95_late_s,
       CAST(MAX(late_s) AS BIGINT) AS max_late_s
FROM cum GROUP BY event_type
""",
)
def q_watermark_lateness_audit(spark, sf_dir):
    """Event-lateness distribution per type — the audit that SIZES a
    streaming watermark before anyone picks `withWatermark("ts", ???)`:
    replaying the log in arrival order (event_id is the synthetic arrival
    sequence), each event's lateness is how far the stream's high-water
    mark had already passed it: running max(ts) − ts. Exact p50/p95 per
    type via the shared grouped exact-rank seam
    (``operators/quantiles.quantile_thresholds``) plus the late count and
    worst case — read p95 as "a watermark delay of this many seconds
    keeps 95% of events inside the window state".

    Scale shape: the timeline reconstruction is one arrival-ordered
    window PER TYPE (the sessionize discipline: keyed sort, no global
    order); the percentile machinery runs on the (type, distinct-lateness)
    count frame."""
    from ..operators.quantiles import quantile_thresholds

    e = T(spark, sf_dir, "events").select("event_id", "event_type", "ts")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lat = e.withColumn("run_max", F.max("ts").over(w)).select(
        "event_type",
        F.expr("timestampdiff(SECOND, ts, run_max)")
        .cast("bigint")
        .alias("late_s"),
    )
    stats = lat.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum((F.col("late_s") > 0).cast("int")).cast("bigint").alias("n_late"),
        F.max("late_s").cast("bigint").alias("max_late_s"),
    )
    th = quantile_thresholds(
        lat,
        "late_s",
        {"p50_late_s": 0.5, "p95_late_s": 0.95},
        group_cols=("event_type",),
    )
    return stats.join(th, "event_type").select(
        "event_type", "n_events", "n_late", "p50_late_s", "p95_late_s",
        "max_late_s",
    )


@register(
    "q_stream_session_window",
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) >= 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS seq
  FROM flagged
), sessions AS (
  SELECT user_id,
         strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
         strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S.%f')
           AS session_end,
         MAX(ts) + INTERVAL 30 MINUTE AS end_ts,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
  FROM numbered
  GROUP BY user_id, seq
),
wm AS (SELECT MAX(ts) - INTERVAL 1 MINUTE AS w FROM events),
res AS (
  SELECT user_id, session_start, session_end, n_events, total_value
  FROM sessions CROSS JOIN wm
  WHERE end_ts <= wm.w
)
SELECT res.*, a.* FROM res CROSS JOIN (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events_exact,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM sessions) AS n_sessions_exact,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM sessions)
           - (SELECT CAST(COUNT(*) AS BIGINT) FROM res) AS n_withheld_exact,
         CAST(1 AS BIGINT) AS input_complete_ok,
         CAST(1 AS BIGINT) AS state_rows_eq_withheld_ok,
         CAST(1 AS BIGINT) AS evicted_eq_emitted_ok
) a
""",
)
def q_stream_session_window(spark, sf_dir):
    """STREAMING gap-session aggregation — ``session_window`` on a
    watermarked stream in append mode, the canonical streaming
    sessionization (the batch expression is ``q_session_window_native``;
    the cross-micro-batch MERGE of a straddling session is pinned on
    constructed input in tests/test_stream_audits.py). Append mode emits a
    session only once the watermark passes its end (measured r09: the
    predicate is ``session_end <= W``, tie → emitted; W = max event time −
    1 minute under this drain), so the youngest sessions are WITHHELD in
    state at query end — the oracle replays exactly that emission rule on
    the batch sessionizer.

    Streaming-run witnesses (r09): final state rows == the batch session
    count minus the emitted count (each withheld session is one state
    row); Σ numRowsRemoved == the emitted count (sessions leave state
    exactly when they emit); numInputRows == batch COUNT(*). All three
    exact integers are re-derived by the oracle, verdicts pinned to 1."""
    stream = read_events_stream(spark, sf_dir)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(10,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            "user_id",
            F.date_format("sw.start", fmt).alias("session_start"),
            F.date_format("sw.end", fmt).alias("session_end"),
            "n_events",
            "total_value",
        )
    )
    result, m = drain_with_metrics(
        agg, f"stream_sess_{uuid.uuid4().hex[:8]}", "append"
    )
    ev = T(spark, sf_dir, "events")
    batch_sessions = ev.groupBy(
        F.session_window("ts", "30 minutes").alias("sw"), "user_id"
    ).agg(F.count(F.lit(1)).alias("n"))
    exact = (
        result.agg(F.count(F.lit(1)).cast("bigint").alias("n_emitted"))
        .crossJoin(
            F.broadcast(
                batch_sessions.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_sessions_exact")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                ev.agg(F.count(F.lit(1)).cast("bigint").alias("n_events_exact"))
            )
        )
        .select(
            "n_events_exact",
            "n_sessions_exact",
            (F.col("n_sessions_exact") - F.col("n_emitted"))
            .cast("bigint")
            .alias("n_withheld_exact"),
            F.col("n_emitted"),
        )
    )
    return witness(
        result,
        exact,
        {
            "input_complete_ok": F.lit(m.n_input) == F.col("n_events_exact"),
            "state_rows_eq_withheld_ok": F.lit(m.op().rows_total)
            == F.col("n_withheld_exact"),
            "evicted_eq_emitted_ok": F.lit(m.op().removed_sum)
            == F.col("n_emitted"),
        },
    ).drop("n_emitted")


from .dedup import (  # noqa: E402  (winnow selection chain + params)
    _WIN_K as _SDW_K,
    _WIN_W as _SDW_W,
    _WINNOW_MIN_SHARED as _SDW_MIN,
    _WINNOW_SEL_CTES as _SDW_SEL,
)


@register(
    "q_stream_dedup_winnow",
    oracle="""
WITH {sel_ctes},
store AS (SELECT DISTINCT h FROM sel WHERE doc_id < 400),
hits AS (
  SELECT s.doc_id
  FROM sel s JOIN store st ON s.h = st.h
  WHERE s.doc_id >= 400
  GROUP BY s.doc_id
  HAVING COUNT(*) >= {min_shared}
),
surv AS (
  SELECT doc_id, n_chars FROM documents
  WHERE doc_id >= 400 AND doc_id NOT IN (SELECT doc_id FROM hits)
),
ex AS (
  SELECT CAST((SELECT COUNT(*) FROM documents WHERE doc_id >= 400)
              AS BIGINT) AS n_batch_docs,
         CAST((SELECT COUNT(DISTINCT doc_id % {nfiles})
               FROM documents WHERE doc_id >= 400) AS BIGINT)
           AS n_mod_classes,
         CAST((SELECT COUNT(*) FROM store) AS BIGINT) AS n_store_fps,
         CAST(1 AS BIGINT) AS input_accounting_ok,
         CAST(1 AS BIGINT) AS multi_batch_ok,
         CAST(1 AS BIGINT) AS no_engine_state_ok
)
SELECT surv.doc_id, surv.n_chars, ex.* FROM surv CROSS JOIN ex
""".format(sel_ctes=_SDW_SEL, min_shared=_SDW_MIN, nfiles=3),
)
def q_stream_dedup_winnow(spark, sf_dir):
    """STREAMING near-dup dedup against the persisted winnowing fingerprint
    store (VERDICT r09 #6 — the first streaming QUALITY operator, not just
    streaming relational ops): the corpus (doc_id < 400) builds the frozen
    (h) store once; the ingest batch (doc_id >= 400) is staged as THREE
    parquet files (doc_id mod 3) and streamed with maxFilesPerTrigger=1, so
    the drain genuinely exercises multiple micro-batches at the SF gate.
    Each micro-batch runs inside ``foreachBatch``: winnowing-fingerprint
    the batch ALONE (doc-local — per-batch cost ∝ batch, the corpus is
    never re-read), semi-probe the store on h, drop docs sharing ≥ 2
    selected fingerprints, append survivors to the sink.

    Every batch probes the FROZEN corpus store, so the result is
    micro-batch-decomposition INVARIANT (== the batch twin
    ``dedup_incremental_winnow``) — which is exactly what makes it
    hash-oracleable. HONESTY: intra-stream dedup (growing the store with
    each batch's survivors, `incremental_dedup_winnow`'s survivor_fps
    return) is the production extension, but its result depends on where
    micro-batch boundaries fall, so the oracled query deliberately ships
    the decomposition-invariant bootstrap mode; the growing-store semantics
    are pinned on constructed multi-batch input in
    tests/test_stream_winnow.py instead.

    Streaming-run witnesses (the r09 audit discipline — theorem-backed
    integers only): Σ numInputRows == staged batch-doc count (the file
    source serves each staged row exactly once); micro-batches with data ==
    COUNT(DISTINCT doc_id mod 3) (one file per non-empty residue class,
    maxFilesPerTrigger=1); the ENGINE holds zero streaming state
    (foreachBatch — the state IS the store, whose size n_store_fps both
    engines derive exactly)."""
    import shutil as _shutil
    import tempfile as _tempfile

    from ..operators.dedup import (
        incremental_dedup_winnow,
        winnow_fingerprints,
    )
    from ..streaming.audit import drain_foreach_with_metrics
    from .dedup import _WIN_K, _WIN_W, _WINNOW_MIN_SHARED
    from .registry import persisted as _persisted
    from .registry import spread as _spread

    nfiles = 3
    docs = _spread(T(spark, sf_dir, "documents"))
    corpus = docs.filter(F.col("doc_id") < 400)
    batch_docs = docs.filter(F.col("doc_id") >= 400)
    # frozen store, persisted: consumers = every micro-batch probe + the
    # exact witness count
    store = winnow_fingerprints(corpus, k=_WIN_K, w=_WIN_W).transform(
        _persisted
    )

    src = _tempfile.mkdtemp(prefix="winnow_stream_src_")
    for i in range(nfiles):
        batch_docs.filter((F.col("doc_id") % nfiles) == i).coalesce(
            1
        ).write.mode("append").parquet(src)
    out = _tempfile.mkdtemp(prefix="winnow_stream_out_")
    # pre-seed the sink schema so a zero-survivor run still reads cleanly
    batch_docs.select("doc_id", "n_chars").limit(0).write.mode(
        "overwrite"
    ).parquet(out)

    def _probe(bdf, _bid):
        # persist the micro-batch: the probe plan consumes it twice
        # (fingerprint branch + the survivors anti-join) — without the
        # cache the file source re-serves every row and numInputRows
        # double-counts (and at scale the batch is re-scanned)
        bdf = bdf.persist()
        try:
            surv, _fps = incremental_dedup_winnow(
                bdf, store, k=_WIN_K, w=_WIN_W, min_shared=_WINNOW_MIN_SHARED
            )
            surv.select("doc_id", "n_chars").write.mode("append").parquet(
                out
            )
        finally:
            bdf.unpersist()

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    m = drain_foreach_with_metrics(stream, _probe)
    # staging cleanup (ADVICE r10 #3): the drain is eager, so `src` is dead
    # now; `out` still backs the returned plan, so materialize the
    # survivors (bounded: ≤ one stream's batch rows) into block storage
    # with an eager localCheckpoint, then drop both dirs — repeated
    # gate/bench runs no longer accumulate /tmp parquet.
    result = spark.read.parquet(out).localCheckpoint(eager=True)
    _shutil.rmtree(src, ignore_errors=True)
    _shutil.rmtree(out, ignore_errors=True)
    exact = batch_docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batch_docs"),
        F.countDistinct(F.col("doc_id") % nfiles)
        .cast("bigint")
        .alias("n_mod_classes"),
    ).crossJoin(
        store.agg(F.countDistinct("h").cast("bigint").alias("n_store_fps"))
    )
    return witness(
        result,
        exact,
        {
            "input_accounting_ok": F.lit(m.n_input) == F.col("n_batch_docs"),
            "multi_batch_ok": F.lit(m.n_data_batches)
            == F.col("n_mod_classes"),
            "no_engine_state_ok": F.lit(len(m.state_ops)) == F.lit(0),
        },
    )


def _stream_trend_oracle() -> str:
    from .trend import _MK_ORACLE

    return f"""
SELECT mk.*,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events,
       (SELECT CAST(COUNT(DISTINCT event_id % 3) AS BIGINT) FROM events)
         AS n_splits,
       CAST(0 AS BIGINT) AS n_merge_mismatch,
       CAST(1 AS BIGINT) AS input_accounting_ok,
       CAST(1 AS BIGINT) AS multi_batch_ok,
       CAST(1 AS BIGINT) AS no_engine_state_ok,
       CAST(1 AS BIGINT) AS merge_exact_ok
FROM ({_MK_ORACLE}) mk
"""


@register("q_stream_trend_monitor", oracle=_stream_trend_oracle())
def q_stream_trend_monitor(spark, sf_dir):
    """STREAMING drift monitor over the Mann-Kendall family: micro-batches
    maintain the CALENDAR-bounded daily store (per-batch partial cents
    sums appended via ``foreachBatch`` — the natural 100 TB shape: the
    event firehose reduces to (event_type, day) partials incrementally,
    and the trend test runs on demand over the tiny store), then the
    drained store is merged and fed through the SAME exact-integer
    MK + Theil-Sen core as ``q_mann_kendall_trend``
    (``plans/trend.mk_outputs``). Witnesses, each pinned by the oracle:

    * ``input_accounting_ok`` — Σ numInputRows == the event count;
    * ``multi_batch_ok`` — one data batch per staged file (3 splits);
    * ``no_engine_state_ok`` — the store lives in parquet, not engine
      state (zero stateOperators);
    * ``merge_exact_ok`` — the stream-merged daily frame equals the
      batch-derived daily frame EXACTLY (full-outer mismatch count 0):
      per-batch partial integer sums are associative, so incremental
      maintenance loses nothing.

    Staging dirs are scope-bounded (ADVICE r10 #3): the merged daily
    store is localCheckpoint-ed (calendar-bounded rows) before both dirs
    are removed."""
    import shutil as _shutil
    import tempfile as _tempfile

    from ..streaming.audit import drain_foreach_with_metrics
    from .trend import daily_cents, mk_outputs
    from .registry import persisted as _persisted

    nfiles = 3
    ev = T(spark, sf_dir, "events")
    src = _tempfile.mkdtemp(prefix="trend_stream_src_")
    for i in range(nfiles):
        ev.filter((F.col("event_id") % nfiles) == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    store = _tempfile.mkdtemp(prefix="trend_stream_store_")
    # pre-seed the store schema so a zero-batch run still reads cleanly
    daily_cents(ev).withColumnRenamed("cents", "cents_part").limit(
        0
    ).write.mode("overwrite").parquet(store)

    def _probe(bdf, _bid):
        daily_cents(bdf).withColumnRenamed("cents", "cents_part").write.mode(
            "append"
        ).parquet(store)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    m = drain_foreach_with_metrics(stream, _probe)
    merged = (
        spark.read.parquet(store)
        .groupBy("event_type", "d")
        .agg(F.sum("cents_part").cast("bigint").alias("cents"))
        .localCheckpoint(eager=True)  # calendar-bounded; frees the dir
    )
    _shutil.rmtree(src, ignore_errors=True)
    _shutil.rmtree(store, ignore_errors=True)
    daily = merged.transform(_persisted)  # consumers: MK core + mismatch
    batch_daily = daily_cents(ev)
    mismatch = (
        daily.withColumnsRenamed({"cents": "c_s"})
        .join(
            batch_daily.withColumnsRenamed({"cents": "c_b"}),
            ["event_type", "d"],
            "full_outer",
        )
        .filter(
            ~F.col("c_s").eqNullSafe(F.col("c_b"))
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_merge_mismatch"))
    )
    exact = (
        ev.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct(F.col("event_id") % nfiles)
            .cast("bigint")
            .alias("n_splits"),
        )
        .crossJoin(F.broadcast(mismatch))
    )
    return witness(
        mk_outputs(daily),
        exact,
        {
            "input_accounting_ok": F.lit(m.n_input) == F.col("n_events"),
            "multi_batch_ok": F.lit(m.n_data_batches) == F.col("n_splits"),
            "no_engine_state_ok": F.lit(len(m.state_ops)) == F.lit(0),
            "merge_exact_ok": F.col("n_merge_mismatch") == 0,
        },
    )
