"""Time-series repair: dense grid with LINEAR interpolation of missing hours.

Extends the zero-fill resample (``relational4.py::q_time_resample``) to the
shape feature pipelines actually need: holes filled from the neighboring
observations, not with zeros. The interpolation is the classic
prev + (next - prev) * elapsed/gap over the last/next non-null window pair
— one window shuffle per direction on the (tiny) dense grid, never on the
raw events.

Bit-stability: hourly averages divide an EXACT decimal sum by an integer
count; the interpolation itself is per-row scalar double arithmetic written
with the identical expression shape in the DuckDB oracle, and the result is
published as a floor(x*1e6) fixed-point BIGINT so the driver's exact hash
comparison is meaningful.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, dec, persisted, register


@register(
    "q_incremental_rollup",
    oracle="""
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
GROUP BY 1
""",
)
def q_incremental_rollup(spark, sf_dir):
    """Materialized-view maintenance invariant, driven through the gate:
    the monthly revenue rollup is maintained INCREMENTALLY — a partial
    aggregate over the historical partition (orders before 2001-01-01)
    merged with a partial aggregate over the new arrivals (2001+) by a
    re-aggregation of the two partials — and the oracle recomputes the
    rollup from scratch, so the gate asserts
    ``merge(partial(old), partial(new)) == full(old UNION new)`` exactly
    (counts and exact decimal sums are decomposable aggregates).
    At 100 TB this is the difference between touching one day of data and
    re-scanning the corpus; the merge input is two month-sized frames."""
    orders = T(spark, sf_dir, "orders")
    month = F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")
    split = F.lit("2001-01-01").cast("timestamp")

    def partial(df):
        return df.groupBy(month.alias("month")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(dec("o_totalprice", 18, 2)).alias("rev"),
        )

    base = partial(orders.filter(F.col("o_orderdate") < split))
    delta = partial(orders.filter(F.col("o_orderdate") >= split))
    return (
        base.union(delta)
        .groupBy("month")
        .agg(
            F.sum("n_orders").cast("bigint").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


@register(
    "q_rolling_revenue_7d",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(SUM(rev) OVER w AS DOUBLE) AS rev_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_days_in_window
FROM daily
WINDOW w AS (ORDER BY date_diff('day', DATE '1995-01-01', day)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def q_rolling_revenue_7d(spark, sf_dir):
    """Trailing 7-day revenue: a RANGE-frame window (6 preceding days by
    VALUE, so calendar gaps count) over the DAILY aggregate — the rolling
    window never touches the fact table, which contributes only one
    map-side-combined group-by. The rolling sum accumulates exact decimals
    (order-independent) and is cast to double once. The day frame is
    ~2.4k rows here; at 100 TB it is still calendar-sized, so the
    single-partition window is a non-issue by construction."""
    orders = T(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.sum(dec("o_totalprice", 18, 2)).alias("rev"))
        .withColumn(
            "day_num", F.datediff(F.col("day"), F.lit("1995-01-01").cast("date"))
        )
    )
    # bounded cardinality: day-grid frame (calendar span, ~2.5k rows)
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.sum("rev").over(w).cast("double").alias("rev_7d"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_days_in_window"),
    )


@register(
    "q_gap_fill_interpolate",
    oracle="""
WITH obs AS (
  SELECT event_type, time_bucket(INTERVAL '1 hour', ts) AS hour,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM events GROUP BY 1, 2
),
bounds AS (
  SELECT event_type, MIN(hour) AS lo, MAX(hour) AS hi FROM obs GROUP BY 1
),
grid AS (
  SELECT b.event_type, g.h AS hour
  FROM bounds b, UNNEST(generate_series(b.lo, b.hi, INTERVAL 1 HOUR)) AS g(h)
),
j AS (
  SELECT g.event_type, g.hour,
         CASE WHEN o.k IS NOT NULL THEN o.sv / o.k END AS v
  FROM grid g LEFT JOIN obs o
    ON g.event_type = o.event_type AND g.hour = o.hour
),
w AS (
  SELECT event_type, hour, v,
         last_value(v IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
           OVER wp AS ph,
         first_value(v IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN hour END IGNORE NULLS)
           OVER wf AS nh
  FROM j
  WINDOW
    wp AS (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY event_type ORDER BY hour
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
       event_type,
       CASE WHEN v IS NOT NULL THEN 'observed' ELSE 'interpolated' END AS src,
       CAST(floor(
         (CASE WHEN v IS NOT NULL THEN v
               ELSE pv + (nv - pv)
                    * (CAST(date_diff('hour', ph, hour) AS DOUBLE)
                       / CAST(date_diff('hour', ph, nh) AS DOUBLE)) END)
         * 1000000) AS BIGINT) AS val_fp6
FROM w
""",
)
def q_gap_fill_interpolate(spark, sf_dir):
    """Hourly mean value per event type on a dense per-type grid, with
    missing hours LINEARLY interpolated between the nearest observed hours
    (every grid hour has both neighbors because the grid spans exactly the
    observed range). The last/next-non-null window pair runs over the dense
    grid — |hours|x|types| rows, thousands of times smaller than events —
    so the only fact-table shuffle is the hourly aggregation itself."""
    e = T(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    obs = (
        e.select("event_type", hour.alias("hour"), "value")
        .groupBy("event_type", "hour")
        .agg(
            F.sum(dec("value", 18, 6)).cast("double").alias("sv"),
            F.count(F.lit(1)).cast("bigint").alias("k"),
        )
    )
    bounds = obs.groupBy("event_type").agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour"),
    )
    j = grid.join(F.broadcast(obs), ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.when(F.col("k").isNotNull(), F.col("sv") / F.col("k")).alias("v"),
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    w = j.select(
        "event_type",
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(wp).alias("ph"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_hour, ignorenulls=True).over(wf).alias("nh"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        F.expr("timestampdiff(HOUR, ph, hour)").cast("double")
        / F.expr("timestampdiff(HOUR, ph, nh)").cast("double")
    )
    return w.select(
        F.date_format("hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "event_type",
        F.when(F.col("v").isNotNull(), F.lit("observed"))
        .otherwise(F.lit("interpolated"))
        .alias("src"),
        F.floor(
            F.when(F.col("v").isNotNull(), F.col("v")).otherwise(interp)
            * F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("val_fp6"),
    )


# Gap-aware EWMA weights, fixed-point 1e12: W[k] = floor(a·(1-a)^k · 1e12),
# a = 0.3, truncated at 30 days (residual mass (1-a)^30 ≈ 2e-5). Generated
# ONCE in Python and inlined as the same integer literals into the Spark plan
# and the DuckDB oracle — the weight table cannot diverge across engines by
# construction (no cross-engine pow()).
_EWMA_ALPHA = 0.3
_EWMA_K = 30
_EWMA_W = [int(_EWMA_ALPHA * ((1 - _EWMA_ALPHA) ** k) * 1_000_000_000_000) for k in range(_EWMA_K)]


@register(
    "q_ewma_daily_value",
    oracle=f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
terms AS (
  SELECT t.event_type, t.day, t.cents,
         CAST(([{", ".join(str(w) for w in _EWMA_W)}])
              [date_diff('day', s.day, t.day) + 1] AS DECIMAL(38,0))
           * s.cents AS term
  FROM daily t
  JOIN daily s ON s.event_type = t.event_type
              AND s.day BETWEEN t.day - {_EWMA_K - 1} AND t.day
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cents,
       CAST(CAST(SUM(term) AS DOUBLE) / 100000000000000 AS DOUBLE) AS ewma
FROM terms GROUP BY event_type, day, cents
""",
)
def q_ewma_daily_value(spark, sf_dir):
    """Gap-aware exponentially-weighted moving average of daily event value
    per type — the smoothing pass behind anomaly/trend monitors. The weight
    for a day k calendar days back is a·(1-a)^k, so calendar gaps decay
    correctly (a row-recursive EWMA over observed rows would not).

    Scale shape: the fact table contributes ONE map-side-combined group-by to
    a calendar-sized daily frame; the trailing-30-day self-join and the
    weighted sum run entirely on that frame (≤366·|types| rows/year — plan
    cost independent of event volume). Engine parity: daily sums are exact
    DECIMAL cents, weights are fixed-point integers inlined from Python into
    BOTH plans, each term is DECIMAL(38,0)·BIGINT — the only double appears
    in the final single cast."""
    e = T(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(10,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    ).transform(persisted)  # both sides of the trailing-window self-join; calendar-sized
    t, s = daily.alias("t"), daily.alias("s")
    warr = F.array(*[F.lit(w) for w in _EWMA_W])
    k = F.datediff(F.col("t.day"), F.col("s.day"))
    terms = t.join(
        s,
        (F.col("s.event_type") == F.col("t.event_type"))
        & (F.col("s.day") >= F.date_sub(F.col("t.day"), _EWMA_K - 1))
        & (F.col("s.day") <= F.col("t.day")),
    ).select(
        F.col("t.event_type").alias("event_type"),
        F.col("t.day").alias("day"),
        F.col("t.cents").alias("cents"),
        (
            F.element_at(warr, k + 1).cast("decimal(38,0)") * F.col("s.cents")
        ).alias("term"),
    )
    return terms.groupBy("event_type", "day", "cents").agg(
        (F.sum("term").cast("double") / F.lit(100_000_000_000_000.0))
        .cast("double")
        .alias("ewma"),
    ).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "cents",
        "ewma",
    )


@register(
    "q_cusum_changepoint",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(cents) AS BIGINT) AS total
  FROM daily GROUP BY event_type
),
cusum AS (
  SELECT d.event_type, d.day, t.n_days,
         SUM(d.cents) OVER (PARTITION BY d.event_type ORDER BY d.day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           * t.n_days
         - ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day)
           * t.total AS s_scaled
  FROM daily d JOIN tot t ON d.event_type = t.event_type
),
ranked AS (
  SELECT event_type, day, n_days, s_scaled,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(s_scaled) DESC, day) AS rn
  FROM cusum
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS change_day,
       CAST(s_scaled AS BIGINT) AS cusum_scaled, CAST(n_days AS BIGINT) AS n_days
FROM ranked WHERE rn = 1
""",
)
def q_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint detection (Page 1954): per event type, the day
    where the cumulative deviation from the series mean peaks — the
    standard level-shift locator for revenue/throughput monitoring.

    Exactness trick: CUSUM_t = Σx_i − t·mean needs the fractional mean;
    scaling by n_days keeps it INTEGER — S'_t = n·Σx_i − t·Σx — so the
    argmax is exact in both engines with no double anywhere. Scale shape:
    the fact table collapses to the calendar-sized daily frame first; the
    prefix-sum and argmax windows run per type on that frame."""
    e = T(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(10,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("cents").cast("bigint").alias("total"),
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    cusum = daily.join(tot, "event_type").select(
        "event_type",
        "day",
        "n_days",
        (
            F.sum("cents").over(wd.rowsBetween(Window.unboundedPreceding, 0))
            * F.col("n_days")
            - F.row_number().over(wd).cast("bigint") * F.col("total")
        ).alias("s_scaled"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.desc(F.abs(F.col("s_scaled"))), "day"
    )
    return (
        cusum.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("change_day"),
            F.col("s_scaled").cast("bigint").alias("cusum_scaled"),
            "n_days",
        )
    )


@register(
    "q_seasonal_decompose",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
trend AS (
  SELECT event_type, day, cents,
         CAST(floor(SUM(cents) OVER w * 1000000.0 / COUNT(*) OVER w) AS BIGINT)
           AS trend_fp6,
         CAST(dayofweek(day) AS BIGINT) AS dow
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
dow_eff AS (
  SELECT event_type, dow,
         CAST(floor(SUM(cents) * 1000000.0 / COUNT(*)) AS BIGINT) AS dow_mean_fp6
  FROM trend GROUP BY 1, 2
),
overall AS (
  SELECT event_type,
         CAST(floor(SUM(cents) * 1000000.0 / COUNT(*)) AS BIGINT) AS mean_fp6
  FROM daily GROUP BY 1
)
SELECT t.event_type, strftime(t.day, '%Y-%m-%d') AS day, t.cents,
       t.trend_fp6,
       d.dow_mean_fp6 - o.mean_fp6 AS dow_effect_fp6,
       t.cents * 1000000 - t.trend_fp6 - (d.dow_mean_fp6 - o.mean_fp6)
         AS residual_fp6
FROM trend t
JOIN dow_eff d ON t.event_type = d.event_type AND t.dow = d.dow
JOIN overall o ON t.event_type = o.event_type
""",
)
def q_seasonal_decompose(spark, sf_dir):
    """Additive seasonal decomposition (STL-lite): daily value = centered
    7-day moving-average trend + day-of-week effect + residual — the
    weekly-seasonality monitor behind traffic anomaly detection.

    Every component is a floored fp6 integer derived from exact decimal
    cents (the trend's /count and the dow means floor BEFORE any
    subtraction), and the residual is the exact integer identity
    x·1e6 − trend − effect — so the decomposition reassembles bit-exactly
    in both engines. One fact pass to the calendar frame; every window and
    join after is calendar-sized."""
    e = T(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(10,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    ).transform(persisted)  # calendar-sized; feeds trend, dow means, and overall mean
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-3, 3)
    )
    trend = daily.select(
        "event_type",
        "day",
        "cents",
        F.floor(F.sum("cents").over(w) * 1_000_000.0 / F.count(F.lit(1)).over(w))
        .cast("bigint")
        .alias("trend_fp6"),
        F.dayofweek("day").cast("bigint").alias("dow"),
    )
    # exact bigint sums, ONE floored double division — a floating AVG
    # would sum doubles in partition order (not engine/partitioning-stable)
    dow_eff = trend.groupBy("event_type", "dow").agg(
        F.floor(F.sum("cents") * 1_000_000.0 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("dow_mean_fp6")
    )
    overall = daily.groupBy("event_type").agg(
        F.floor(F.sum("cents") * 1_000_000.0 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_fp6")
    )
    return (
        trend.join(dow_eff, ["event_type", "dow"])
        .join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cents",
            "trend_fp6",
            (F.col("dow_mean_fp6") - F.col("mean_fp6")).alias("dow_effect_fp6"),
            (
                F.col("cents") * 1_000_000
                - F.col("trend_fp6")
                - (F.col("dow_mean_fp6") - F.col("mean_fp6"))
            ).alias("residual_fp6"),
        )
    )


@register(
    "q_incremental_join_mv",
    oracle="""
SELECT c.c_mktsegment AS seg,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""",
)
def q_incremental_join_mv(spark, sf_dir):
    """JOIN-view incremental maintenance, driven through the gate: the
    revenue-per-segment JOIN view V = A ⋈ B is maintained by the delta
    algebra ΔV = ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB (both inputs change:
    late-arriving orders AND newly registered customers), merged with the
    old view by re-aggregation of decomposable partials. The oracle
    recomputes the join from scratch, so the gate asserts the full
    incremental-join contract — the identity behind every streaming join
    materialization and lakehouse MERGE pipeline.

    At 100 TB: the three delta joins touch |Δ|-sized fact slices (ΔA joins
    broadcast B_old partitions; A_old⋈ΔB is a semi-probe by the new-key
    set), never the historical corpus; the final merge is view-sized."""
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    # deterministic change sets: late orders = orderkey ≡ 0 (mod 7),
    # new customers = custkey ≡ 0 (mod 5)
    a_new = F.col("o_orderkey") % 7 == 0
    b_new = F.col("c_custkey") % 5 == 0
    a_old, da = orders.filter(~a_new), orders.filter(a_new)
    b_old, db = cust.filter(~b_new), cust.filter(b_new)

    def partial(o, c):
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy(F.col("c_mktsegment").alias("seg"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            )
        )

    v_old = partial(a_old, b_old)
    delta = (
        partial(da, b_old)
        .union(partial(a_old, db))
        .union(partial(da, db))
    )
    return (
        v_old.union(delta)
        .groupBy("seg")
        .agg(
            F.sum("n").cast("bigint").alias("n_orders"),
            F.sum("rev").cast("double").alias("revenue"),
        )
    )


_PSI_BUCKETS = 10


@register(
    "q_psi_drift",
    oracle=f"""
WITH cents AS (
  SELECT event_type,
         CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16' THEN 0 ELSE 1 END AS half,
         CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS c
  FROM events
),
refv AS (
  SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS n
  FROM cents WHERE half = 0 GROUP BY 1, 2
),
cum AS (
  SELECT event_type, c, n,
         SUM(n) OVER (PARTITION BY event_type ORDER BY c
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
         SUM(n) OVER (PARTITION BY event_type) AS total
  FROM refv
),
bounds AS (
  SELECT event_type,
         list_sort(list(cut)) AS bnds
  FROM (
    SELECT cum.event_type, k,
           MIN(CASE WHEN r >= CAST(ceil(k * total / {_PSI_BUCKETS}.0) AS BIGINT)
                    THEN c END) AS cut
    FROM cum, UNNEST(range(1, {_PSI_BUCKETS})) AS t(k)
    GROUP BY cum.event_type, k
  ) GROUP BY event_type
),
assigned AS (
  SELECT s.event_type, s.half,
         len(list_filter(b.bnds, x -> x < s.c)) AS bucket
  FROM cents s JOIN bounds b ON s.event_type = b.event_type
),
grid AS (
  SELECT b.event_type, t.k AS bucket
  FROM bounds b, UNNEST(range(0, {_PSI_BUCKETS})) AS t(k)
),
counts AS (
  SELECT g.event_type, g.bucket,
         CAST(COALESCE(SUM(CASE WHEN a.half = 0 THEN 1 END), 0) AS BIGINT) AS n_ref,
         CAST(COALESCE(SUM(CASE WHEN a.half = 1 THEN 1 END), 0) AS BIGINT) AS n_cur
  FROM grid g LEFT JOIN assigned a
    ON a.event_type = g.event_type AND a.bucket = g.bucket
  GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(SUM(n_ref) AS BIGINT) AS tr,
         CAST(SUM(n_cur) AS BIGINT) AS tc
  FROM counts GROUP BY event_type
)
SELECT c.event_type, t.tr AS n_ref, t.tc AS n_cur,
       CAST(SUM(CAST(floor(
         ((c.n_ref + 1.0) / (t.tr + {_PSI_BUCKETS}) - (c.n_cur + 1.0) / (t.tc + {_PSI_BUCKETS}))
         * ln(((c.n_ref + 1.0) * (t.tc + {_PSI_BUCKETS}))
              / ((c.n_cur + 1.0) * (t.tr + {_PSI_BUCKETS})))
         * 1000000000) AS BIGINT)) AS BIGINT) AS psi_fp9
FROM counts c JOIN tot t ON c.event_type = t.event_type
GROUP BY c.event_type, t.tr, t.tc
""",
)
def q_psi_drift(spark, sf_dir):
    """Population Stability Index (the production ML-monitoring drift
    metric): reference = first half of the window, current = second half;
    buckets are the REFERENCE's own deciles (equi-depth cuts from cumulative
    counts over the distinct-value frame — the standard PSI convention, so
    a stable distribution scores ~0 by construction), smoothed +1, each
    (p−q)·ln(p/q) term floored to fp9 BEFORE the sum.

    Scale shape: one pass buckets both halves against the broadcast
    per-type boundary arrays (9 values each); the decile computation reuses
    the distinct-value cumulative-count discipline — the corpus is never
    globally sorted. PSI > 0.2 is the conventional retrain alarm."""
    e = T(spark, sf_dir, "events").select("event_type", "ts", "value")
    cents = e.select(
        "event_type",
        F.when(F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), 0)
        .otherwise(1)
        .alias("half"),
        (F.col("value").cast("decimal(10,2)") * 100).cast("bigint").alias("c"),
    ).transform(persisted)  # both halves consumed twice (boundary build + assignment)
    refv = (
        cents.filter(F.col("half") == 0)
        .groupBy("event_type", "c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("c")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    cum = refv.select(
        "event_type",
        "c",
        F.sum("n").over(wc).alias("r"),
        F.sum("n").over(wt).alias("total"),
    )
    ks = F.explode(F.sequence(F.lit(1), F.lit(_PSI_BUCKETS - 1))).alias("k")
    cuts = (
        cum.select("event_type", "c", "r", "total")
        .select("event_type", "c", "r", "total", ks)
        .groupBy("event_type", "k")
        .agg(
            F.min(
                F.when(
                    F.col("r")
                    >= F.ceil(F.col("k") * F.col("total") / _PSI_BUCKETS).cast(
                        "bigint"
                    ),
                    F.col("c"),
                )
            ).alias("cut")
        )
    )
    bounds = cuts.groupBy("event_type").agg(
        F.array_sort(F.collect_list("cut")).alias("bnds")
    )
    assigned = cents.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "half",
        F.size(F.filter(F.col("bnds"), lambda x: x < F.col("c"))).alias("bucket"),
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(_PSI_BUCKETS - 1))).alias("bucket"),
    )
    # aggregate the fact-sized assignment FIRST (map-side combined), THEN
    # zero-fill against the grid — joining the 50-row grid to raw rows
    # would be a fact-sized sort-merge join (caught by the plan audit)
    raw_counts = assigned.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cur"),
    )
    counts = (
        grid.join(F.broadcast(raw_counts), ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce(F.col("n_ref"), F.lit(0)).cast("bigint").alias("n_ref"),
            F.coalesce(F.col("n_cur"), F.lit(0)).cast("bigint").alias("n_cur"),
        )
    )
    tot = counts.groupBy("event_type").agg(
        F.sum("n_ref").cast("bigint").alias("tr"),
        F.sum("n_cur").cast("bigint").alias("tc"),
    )
    b = F.lit(_PSI_BUCKETS)
    p = (F.col("n_ref") + 1.0) / (F.col("tr") + b)
    q = (F.col("n_cur") + 1.0) / (F.col("tc") + b)
    ratio = ((F.col("n_ref") + 1.0) * (F.col("tc") + b)) / (
        (F.col("n_cur") + 1.0) * (F.col("tr") + b)
    )
    term = F.floor((p - q) * F.log(ratio) * 1_000_000_000).cast("bigint")
    out = (
        counts.join(tot, "event_type")
        .select("event_type", "tr", "tc", term.alias("t"))
        .groupBy("event_type", "tr", "tc")
        .agg(F.sum("t").cast("bigint").alias("psi_fp9"))
        .select(
            "event_type",
            F.col("tr").alias("n_ref"),
            F.col("tc").alias("n_cur"),
            "psi_fp9",
        )
    )
    return out


@register(
    "q_seasonal_anomaly",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
trend AS (
  SELECT event_type, day, cents,
         CAST(floor(SUM(cents) OVER w * 1000000.0 / COUNT(*) OVER w) AS BIGINT)
           AS trend_fp6
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
resid AS (
  SELECT event_type, day, cents,
         cents * 1000000 - trend_fp6 AS r
  FROM trend
),
med AS (
  SELECT event_type,
         (list_sort(list(r)))[CAST(ceil(COUNT(*) / 2.0) AS BIGINT)] AS med_r
  FROM resid GROUP BY event_type
),
mad AS (
  SELECT r.event_type,
         (list_sort(list(abs(r.r - m.med_r))))
           [CAST(ceil(COUNT(*) / 2.0) AS BIGINT)] AS mad_r
  FROM resid r JOIN med m ON r.event_type = m.event_type
  GROUP BY r.event_type
)
SELECT r.event_type, strftime(r.day, '%Y-%m-%d') AS day,
       CAST(r.r AS BIGINT) AS residual_fp6,
       CAST(m.med_r AS BIGINT) AS med_fp6,
       CAST(d.mad_r AS BIGINT) AS mad_fp6
FROM resid r
JOIN med m ON r.event_type = m.event_type
JOIN mad d ON r.event_type = d.event_type
WHERE abs(r.r - m.med_r) * 10000 > 44478 * d.mad_r
""",
)
def q_seasonal_anomaly(spark, sf_dir):
    """Seasonal-adjusted anomaly days: detrend (7-day centered MA, as in
    q_seasonal_decompose), then flag days whose residual departs from the
    per-type median by more than 3·1.4826·MAD — the robust z-score over the
    detrended series, immune to the outliers it hunts (a mean/stddev screen
    is not). Exact integer discipline end-to-end: residuals are fp6
    integers, the median/MAD come from sorted-array element extraction on
    the CALENDAR-sized frame (both engines index the same sorted list), and
    the flag comparison is integer-scaled (4.4478 → 44478/10000) — no float
    threshold anywhere."""
    e = T(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(10,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    resid = daily.select(
        "event_type",
        "day",
        (
            F.col("cents") * 1_000_000
            - F.floor(
                F.sum("cents").over(w) * 1_000_000.0 / F.count(F.lit(1)).over(w)
            ).cast("bigint")
        ).alias("r"),
    ).transform(persisted)  # calendar-sized; feeds median, MAD, and the flag scan
    med = resid.groupBy("event_type").agg(
        F.element_at(
            F.array_sort(F.collect_list("r")),
            F.ceil(F.count(F.lit(1)) / 2.0).cast("int"),
        ).alias("med_r")
    )
    mad = (
        resid.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.element_at(
                F.array_sort(F.collect_list(F.abs(F.col("r") - F.col("med_r")))),
                F.ceil(F.count(F.lit(1)) / 2.0).cast("int"),
            ).alias("mad_r")
        )
    )
    return (
        resid.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter(
            F.abs(F.col("r") - F.col("med_r")) * 10_000
            > F.lit(44_478) * F.col("mad_r")
        )
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("r").cast("bigint").alias("residual_fp6"),
            F.col("med_r").cast("bigint").alias("med_fp6"),
            F.col("mad_r").cast("bigint").alias("mad_fp6"),
        )
    )


@register(
    "q_theil_sen_trend",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
idx AS (
  SELECT event_type, day, cents,
         date_diff('day', (SELECT MIN(CAST(ts AS DATE)) FROM events), day) AS x
  FROM daily
),
slopes AS (
  SELECT a.event_type,
         CAST(floor((b.cents - a.cents) * 1000000.0 / (b.x - a.x)) AS BIGINT)
           AS s6
  FROM idx a JOIN idx b
    ON a.event_type = b.event_type AND a.x < b.x
),
vc AS (
  SELECT event_type, s6, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM slopes GROUP BY 1, 2
),
cum AS (
  SELECT event_type, s6,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY s6
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
         SUM(cnt) OVER (PARTITION BY event_type) AS tot
  FROM vc
),
med AS (
  SELECT event_type,
         MIN(CASE WHEN r >= CAST(ceil(0.5 * tot) AS BIGINT) THEN s6 END)
           AS slope_fp6,
         CAST(MIN(tot) AS BIGINT) AS n_pairs
  FROM cum GROUP BY event_type
),
nd AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
)
SELECT m.event_type, nd.n_days, m.n_pairs, m.slope_fp6
FROM med m JOIN nd ON m.event_type = nd.event_type
""",
)
def q_theil_sen_trend(spark, sf_dir):
    """Theil–Sen robust trend (the median of all pairwise slopes — up to
    ~29% outlier contamination cannot move it, unlike the OLS slope in
    ``q_group_ols``): daily revenue per event type, every day-pair's slope
    as an exact fp6 integer (``floor((Δcents·10⁶)/Δdays)`` — integer
    arithmetic, engine-identical), median via the exact-rank discipline.

    Scale shape: the corpus collapses to the CALENDAR-grain daily frame in
    one shuffle; the O(days²) pair join and everything after run on
    calendar-bounded frames (a year of days = 66k pairs per type) — the
    classic trick that makes a quadratic estimator free at any corpus
    size. The median reuses the distinct-value cumulative-count rank cut
    partitioned by event type."""
    e = T(spark, sf_dir, "events")
    t0 = e.agg(F.min(F.col("ts").cast("date")).alias("d0"))
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(10,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .crossJoin(F.broadcast(t0))
        .select(
            "event_type",
            "day",
            "cents",
            F.datediff("day", "d0").cast("bigint").alias("x"),
        )
    )
    a, b = daily.alias("a"), daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.floor(
            (F.col("b.cents") - F.col("a.cents"))
            * 1_000_000.0
            / (F.col("b.x") - F.col("a.x"))
        )
        .cast("bigint")
        .alias("s6"),
    )
    vc = slopes.groupBy("event_type", "s6").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("s6")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type")
    cum = vc.select(
        "event_type",
        "s6",
        F.sum("cnt").over(wc).alias("r"),
        F.sum("cnt").over(wt).alias("tot"),
    )
    med = cum.groupBy("event_type").agg(
        F.min(
            F.when(
                F.col("r") >= F.ceil(0.5 * F.col("tot")).cast("bigint"),
                F.col("s6"),
            )
        ).alias("slope_fp6"),
        F.min("tot").cast("bigint").alias("n_pairs"),
    )
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return med.join(nd, "event_type").select(
        "event_type", "n_days", "n_pairs", "slope_fp6"
    )


@register(
    "q_delivery_sla_monthly",
    oracle="""
WITH lag_days AS (
  SELECT strftime(CAST(date_trunc('month', o.o_orderdate) AS DATE), '%Y-%m')
           AS month,
         CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS BIGINT) AS d
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
),
vc AS (SELECT month, d, CAST(COUNT(*) AS BIGINT) AS cnt FROM lag_days GROUP BY 1, 2),
cum AS (
  SELECT month, d,
         SUM(cnt) OVER (PARTITION BY month ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r,
         SUM(cnt) OVER (PARTITION BY month) AS tot
  FROM vc
)
SELECT month,
       CAST(MIN(tot) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN r >= CAST(ceil(0.5 * tot) AS BIGINT) THEN d END)
            AS BIGINT) AS p50_days,
       CAST(MIN(CASE WHEN r >= CAST(ceil(0.95 * tot) AS BIGINT) THEN d END)
            AS BIGINT) AS p95_days
FROM cum GROUP BY month
""",
)
def q_delivery_sla_monthly(spark, sf_dir):
    """Monthly order→ship SLA percentiles (the supply-chain health
    readout a fulfilment dashboard tracks): exact p50/p95 of the
    order-to-ship lag per order month, through the GROUPED path of the
    shared ``operators/quantiles.quantile_thresholds`` seam — the same
    exact-rank discipline as the global winsorize thresholds, partitioned
    by month over the distinct-LAG frame (lag cardinality is bounded by the
    shipping window, dozens of values, so the cumulative window is
    calendar×lag-sized at any corpus scale; the GK-approx mode remains the
    swap for unbounded-cardinality metrics).

    Scale shape: one orders⋈lineitem join on the order key (co-partitioned)
    collapses straight into the (month, lag) count aggregate — the corpus
    never sorts; everything after is month×lag-sized."""
    from ..operators.quantiles import quantile_thresholds

    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "month"
            ),
            F.datediff("l_shipdate", "o_orderdate").cast("bigint").alias("d"),
        )
    )
    counts = lag.groupBy("month").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    th = quantile_thresholds(
        lag, "d", {"p50_days": 0.5, "p95_days": 0.95}, group_cols=("month",)
    )
    return counts.join(th, "month").select("month", "n", "p50_days", "p95_days")


@register(
    "q_forecast_backtest",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
f AS (
  SELECT a.event_type, a.day, a.cents, b.cents AS fc
  FROM daily a LEFT JOIN daily b
    ON a.event_type = b.event_type AND b.day = a.day - 7
),
scored AS (
  SELECT event_type, ABS(cents - fc) AS ae,
         CAST(floor(2000000000.0 * ABS(cents - fc) / (ABS(cents) + ABS(fc)))
              AS BIGINT) AS smape9
  FROM f WHERE fc IS NOT NULL AND ABS(cents) + ABS(fc) > 0
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(floor(SUM(ae) * 1.0 / COUNT(*)) AS BIGINT) AS mae_cents,
       CAST(floor(SUM(smape9) * 1.0 / (COUNT(*) * 1000.0)) AS BIGINT)
         AS smape_fp6
FROM scored GROUP BY event_type
""",
)
def q_forecast_backtest(spark, sf_dir):
    """Seasonal-naive forecast backtest — the baseline every forecasting
    pipeline must beat, and the harness that scores any challenger:
    forecast(t) = actual(t−7) (same weekday last week), evaluated by MAE in
    exact integer cents and by sMAPE with each day's ratio floored to fp9
    BEFORE the mean (fp-floored-terms rule — a floating mean of ratios is
    partition-order-dependent; an integer sum is not).

    The seasonal baseline is a CALENDAR self-join on ``day − 7 days``, not a
    7-ROW lag: on a gapped daily series a row-offset LAG silently misaligns
    the weekday (ADVICE r05), whereas the join scores exactly the days whose
    same-weekday-last-week actual exists and skips the rest.

    Scale shape: the corpus collapses to the calendar-grain daily frame in
    one shuffle; the date-shifted self-join and the error aggregate run per
    event type on that tiny frame. Swapping a real model only changes the
    ``fc`` column — the backtest harness is model-agnostic."""
    e = T(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(10,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    fc = daily.select(
        "event_type",
        F.date_add("day", 7).alias("day"),
        F.col("cents").alias("fc"),
    )
    f = daily.join(fc, ["event_type", "day"], "left")
    ae = F.abs(F.col("cents") - F.col("fc"))
    scored = f.filter(
        F.col("fc").isNotNull() & ((F.abs("cents") + F.abs("fc")) > 0)
    ).select(
        "event_type",
        ae.alias("ae"),
        F.floor(2_000_000_000.0 * ae / (F.abs("cents") + F.abs("fc")))
        .cast("bigint")
        .alias("smape9"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.floor(F.sum("ae") * 1.0 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mae_cents"),
        F.floor(F.sum("smape9") * 1.0 / (F.count(F.lit(1)) * 1000.0))
        .cast("bigint")
        .alias("smape_fp6"),
    )


@register(
    "q_seasonal_strength",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
trend AS (
  SELECT event_type, day, cents,
         CAST(floor(SUM(cents) OVER w * 1000000.0 / COUNT(*) OVER w) AS BIGINT)
           AS trend_fp6,
         CAST(dayofweek(day) AS BIGINT) AS dow
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
dow_eff AS (
  SELECT event_type, dow,
         CAST(floor(SUM(cents) * 1000000.0 / COUNT(*)) AS BIGINT) AS dow_mean_fp6
  FROM trend GROUP BY 1, 2
),
overall AS (
  SELECT event_type,
         CAST(floor(SUM(cents) * 1000000.0 / COUNT(*)) AS BIGINT) AS mean_fp6
  FROM daily GROUP BY 1
),
comp AS (
  SELECT t.event_type,
         t.cents * 1000000 - t.trend_fp6 - (d.dow_mean_fp6 - o.mean_fp6) AS r,
         t.cents * 1000000 - (d.dow_mean_fp6 - o.mean_fp6) AS ys,
         t.cents * 1000000 - t.trend_fp6 AS yt
  FROM trend t
  JOIN dow_eff d ON t.event_type = d.event_type AND t.dow = d.dow
  JOIN overall o ON t.event_type = o.event_type
),
mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(CAST(r AS HUGEINT) * r) AS DOUBLE) AS sr2,
         CAST(SUM(r) AS DOUBLE) AS sr,
         CAST(SUM(CAST(ys AS HUGEINT) * ys) AS DOUBLE) AS sys2,
         CAST(SUM(ys) AS DOUBLE) AS sys,
         CAST(SUM(CAST(yt AS HUGEINT) * yt) AS DOUBLE) AS syt2,
         CAST(SUM(yt) AS DOUBLE) AS syt
  FROM comp GROUP BY event_type
),
v AS (
  SELECT event_type, n_days,
         n_days * sr2 - sr * sr AS vr,
         n_days * sys2 - sys * sys AS vys,
         n_days * syt2 - syt * syt AS vyt
  FROM mom
)
SELECT event_type, n_days,
       CAST(CASE WHEN vys <= 0 THEN 0
                 ELSE GREATEST(0, floor((vys - vr) * 1000000000.0 / vys)) END
            AS BIGINT) AS trend_strength_fp9,
       CAST(CASE WHEN vyt <= 0 THEN 0
                 ELSE GREATEST(0, floor((vyt - vr) * 1000000000.0 / vyt)) END
            AS BIGINT) AS seasonal_strength_fp9
FROM v
""",
)
def q_seasonal_strength(spark, sf_dir):
    """Wang-Hyndman decomposition-strength measures on the STL-lite
    components of q_seasonal_decompose: trend strength = max(0, 1 −
    Var(R)/Var(T+R)) (variance of the remainder against the DESEASONALIZED
    series) and seasonal strength = max(0, 1 − Var(R)/Var(S+R)) (against
    the DETRENDED series) — the two numbers a forecasting platform uses to
    route series to seasonal vs non-seasonal models.

    Exactness: components are the decompose query's exact fp6 integers;
    Σx and Σx² accumulate exactly (DECIMAL(38,0) in Spark, HUGEINT in
    DuckDB — x² ~1e24 overflows BIGINT); the scaled variances
    n·Σx² − (Σx)² and the final fp9 ratio are computed with IDENTICAL
    double expressions from those exact sums in both engines. One fact
    pass; everything after is calendar-sized."""
    e = T(spark, sf_dir, "events").select("event_type", "ts", "value")
    daily = e.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(10,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    trend = daily.select(
        "event_type",
        "day",
        "cents",
        F.floor(F.sum("cents").over(w) * 1_000_000.0 / F.count(F.lit(1)).over(w))
        .cast("bigint")
        .alias("trend_fp6"),
        F.dayofweek("day").cast("bigint").alias("dow"),
    )
    dow_eff = trend.groupBy("event_type", "dow").agg(
        F.floor(F.sum("cents") * 1_000_000.0 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("dow_mean_fp6")
    )
    overall = daily.groupBy("event_type").agg(
        F.floor(F.sum("cents") * 1_000_000.0 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("mean_fp6")
    )
    eff = F.col("dow_mean_fp6") - F.col("mean_fp6")
    comp = (
        trend.join(dow_eff, ["event_type", "dow"])
        .join(F.broadcast(overall), "event_type")
        .select(
            "event_type",
            (F.col("cents") * 1_000_000 - F.col("trend_fp6") - eff).alias("r"),
            (F.col("cents") * 1_000_000 - eff).alias("ys"),
            (F.col("cents") * 1_000_000 - F.col("trend_fp6")).alias("yt"),
        )
    )
    d38 = "decimal(38,0)"

    def _sq(c):
        return F.sum(F.col(c).cast(d38) * F.col(c)).cast("double")

    mom = comp.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        _sq("r").alias("sr2"),
        F.sum("r").cast("double").alias("sr"),
        _sq("ys").alias("sys2"),
        F.sum("ys").cast("double").alias("sys"),
        _sq("yt").alias("syt2"),
        F.sum("yt").cast("double").alias("syt"),
    )
    v = mom.select(
        "event_type",
        "n_days",
        (F.col("n_days") * F.col("sr2") - F.col("sr") * F.col("sr")).alias("vr"),
        (F.col("n_days") * F.col("sys2") - F.col("sys") * F.col("sys")).alias("vys"),
        (F.col("n_days") * F.col("syt2") - F.col("syt") * F.col("syt")).alias("vyt"),
    )

    def _strength(vbase):
        return (
            F.when(F.col(vbase) <= 0, F.lit(0))
            .otherwise(
                F.greatest(
                    F.lit(0),
                    F.floor(
                        (F.col(vbase) - F.col("vr")) * 1_000_000_000.0 / F.col(vbase)
                    ),
                )
            )
            .cast("bigint")
        )

    return v.select(
        "event_type",
        "n_days",
        _strength("vys").alias("trend_strength_fp9"),
        _strength("vyt").alias("seasonal_strength_fp9"),
    )
