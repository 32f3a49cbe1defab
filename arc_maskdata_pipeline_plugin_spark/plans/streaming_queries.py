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


@register(
    "q_stream_dedup_user_types",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
)
def q_stream_dedup_user_types(spark, sf_dir):
    """Streaming deduplication: ``dropDuplicates`` on a watermarked stream
    keeps the first event per (user_id, event_type); projecting only the keys
    makes the result set order-free — exactly the batch DISTINCT, which the
    oracle checks. State note: dedup state is bounded by the watermark
    (``dropDuplicates`` with event-time column evicts keys older than it) —
    the 100 TB consideration for an unbounded key space."""
    stream = read_events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "7 days")
        .dropDuplicates(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    import tempfile

    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register(
    "q_stream_static_enrich",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
)
def q_stream_static_enrich(spark, sf_dir):
    """Stream-static join: enrich a live event stream with a broadcast dim
    table (the static side is re-resolved per micro-batch — Spark's native
    dimension-refresh pattern), then a streaming aggregate. Batch-equivalent
    because the aggregation is complete-mode over the whole drained stream."""
    import tempfile

    stream = read_events_stream(spark, sf_dir)
    from pyspark.sql import functions as F

    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = stream.join(F.broadcast(cust), stream.user_id == cust.c_custkey)
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("total_value"),
    )
    return run_available_now(agg, f"stream_enrich_{uuid.uuid4().hex[:8]}")


@register(
    "q_stream_stream_join",
    oracle="""
SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 MINUTE
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
    return run_available_now(
        joined, f"stream_ss_join_{uuid.uuid4().hex[:8]}", output_mode="append"
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
SELECT DISTINCT user_id, event_type FROM events
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
    delay and accepts re-emission of keys recurring beyond it."""
    import tempfile

    stream = read_events_stream(spark, sf_dir)
    deduped = (
        stream.withWatermark("ts", "3650 days")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = f"stream_dedup_ww_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (
            deduped.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


@register(
    "q_stream_cms_cells",
    oracle=f"""
{" UNION ALL ".join(
    f"SELECT {j} AS j, {_stats._cms_bucket_duck(j, 'user_id')} AS bucket, "
    f"CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY bucket"
    for j in range(_stats._CMS_D)
)}
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
    return run_available_now(cells, f"stream_cms_{_uuid.uuid4().hex[:8]}")


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
)
SELECT c.c_user AS user_id, c.click_id, p.purchase_id
FROM c
LEFT JOIN p ON c.c_user = p.p_user
           AND p.purchase_ts >= c.click_ts
           AND p.purchase_ts <= c.click_ts + INTERVAL 60 MINUTE
CROSS JOIN wm
WHERE p.purchase_id IS NOT NULL
   OR c.click_ts + INTERVAL 60 MINUTE < wm.w
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
    return run_available_now(
        joined, f"stream_ss_louter_{uuid.uuid4().hex[:8]}", output_mode="append"
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
)
SELECT user_id, event_id AS crossing_event_id, ts AS crossing_ts,
       CAST(cum AS BIGINT) AS cum_cents
FROM x WHERE rn = 1
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
    return run_available_now(
        out, f"stream_threshold_{uuid.uuid4().hex[:8]}", output_mode="append"
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
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(fp48) AS VARCHAR) AS checksum
FROM rows_fp GROUP BY event_type
""",
)
def q_stream_fingerprint(spark, sf_dir):
    """STREAMING anti-entropy fingerprint: the order-insensitive per-key
    checksum of ``q_table_fingerprint`` maintained as a streaming
    aggregation — state is one (count, sum) pair per partition key no matter
    the stream length, and because the fingerprint is a SUM of row hashes,
    micro-batch boundaries cannot affect it: the availableNow drain equals
    the batch checksum exactly (the batch-SQL oracle asserts it). This is
    the continuous-ingestion integrity monitor: a replica recomputing the
    batch checksum must match the streaming side's running value per key."""
    import uuid as _uuid

    from ..streaming.events import read_events_stream, run_available_now

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
    return run_available_now(agg, f"stream_fp_{_uuid.uuid4().hex[:8]}")


@register(
    "q_python_datasource_stream",
    oracle="""
WITH gen AS (
  SELECT i AS event_id, i % 1000 AS user_id,
         (['click','view','purchase','signup','error'])[(i % 5) + 1]
           AS event_type,
         CAST((i * 7919 % 100000) / 100.0 AS DECIMAL(10,2)) AS v
  FROM range(0, 100000) t(i)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS DOUBLE) AS total_value
FROM gen GROUP BY event_type
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
    from ..streaming.events import run_available_now

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
    return run_available_now(agg, f"pyds_stream_{_uuid.uuid4().hex[:8]}")


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
)
SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
       CAST(floor(epoch(p.purchase_ts) - epoch(v.view_ts)) AS BIGINT)
         AS latency_s
FROM v JOIN c ON v.user_id = c.user_id JOIN p ON c.user_id = p.user_id
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

    from ..streaming.events import read_events_stream, run_available_now
    from ..streaming.funnel import funnel_completions

    stream = read_events_stream(spark, sf_dir)
    out = funnel_completions(stream)
    return run_available_now(
        out, f"funnel_{_uuid.uuid4().hex[:8]}", output_mode="append"
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
)
SELECT user_id, event_id AS alert_event_id, ts AS alert_ts,
       CAST(vc AS BIGINT) AS value_cents
FROM carried
WHERE vc > {_HYST_HIGH} AND COALESCE(prev_regime, 0) = 0
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
    return run_available_now(
        out, f"stream_hysteresis_{uuid.uuid4().hex[:8]}", output_mode="append"
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
