"""Behavioral analytics over the event stream: cohort retention and funnels.

The two canonical product-analytics queries, in their scale-correct shapes:

* **Cohort retention** — first-seen week per user, then distinct active users
  per (cohort week, week offset). All aggregations key on ``user_id`` or on
  week pairs derived from it, so the whole query is two co-partitioned
  shuffles of (user, week) pairs — never a self-join of events.
* **Funnel** — ordered stage progression (view → click → purchase, each
  stage strictly after the previous one's first occurrence). Each stage is a
  per-user MIN-timestamp aggregate joined co-partitioned on ``user_id`` to
  the previous stage's frame (user-sized, not event-sized). Timestamps
  compare exactly, so stage membership is engine-deterministic.

Week truncation: both Spark and DuckDB ``date_trunc('week', ts)`` are
ISO/Monday-start, and week offsets are day-differences of Monday-aligned
dates divided exactly by 7.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, persisted, register


@register(
    "q_cohort_retention",
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events
),
cohorts AS (
  SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY user_id
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', c.cohort_week, a.week) // 7 AS INTEGER) AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM activity a JOIN cohorts c ON a.user_id = c.user_id
GROUP BY c.cohort_week, week_offset
""",
)
def q_cohort_retention(spark, sf_dir):
    """Weekly cohort-retention triangle: users grouped by first-active week,
    distinct active users counted at each week offset. Two shuffles on
    user_id (distinct user-weeks, then first-week aggregate) that
    co-partition for the join, and one final (cohort, offset) aggregate over
    the user-week frame — events themselves are touched exactly once."""
    e = T(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        activity.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "n_users",
        )
    )


@register(
    "q_funnel_conversion",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view'
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT stage, n_users FROM (
  SELECT 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users, 1 AS ord FROM s1
  UNION ALL
  SELECT 'view>click', CAST(COUNT(*) AS BIGINT), 2 FROM s2
  UNION ALL
  SELECT 'view>click>purchase', CAST(COUNT(*) AS BIGINT), 3 FROM s3
) ORDER BY ord
""",
)
def q_funnel_conversion(spark, sf_dir):
    """Strictly-ordered funnel: users whose first view precedes a click that
    precedes a purchase. Each stage joins the previous stage's USER-sized
    frame back onto events co-partitioned on user_id and takes a MIN — the
    per-stage cost is one key shuffle, and nothing event-sized is ever
    joined against itself. Exact timestamp comparisons make stage
    membership engine-deterministic."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage(df, name):
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(name).alias("stage"), "n_users"
        )

    return (
        stage(s1, "view")
        .union(stage(s2, "view>click"))
        .union(stage(s3, "view>click>purchase"))
    )


@register(
    "q_max_concurrent_sessions",
    oracle="""
WITH d AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 30 MINUTE, -1 FROM events
),
r AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM d
)
SELECT event_type, CAST(MAX(run) AS INTEGER) AS max_concurrent
FROM r GROUP BY event_type
""",
)
def q_max_concurrent_sessions(spark, sf_dir):
    """Peak concurrency via sweep-line: each event opens a 30-minute session,
    emitting a +1 delta at its start and a -1 at its end; the maximum of the
    running delta sum is the peak number of simultaneously-open sessions.
    Ties order ends before starts (``ORDER BY t, delta``), so a session
    ending exactly when another begins never overlaps it — and because equal
    (t, delta) rows all carry the same sign, the prefix-sum maximum is
    invariant to their permutation, making the answer engine-deterministic.

    Scale shape: the naive plan is one window per event_type — a handful of
    giant sorted partitions. Instead the sweep runs per (type, DAY): deltas
    sort only within their day, each day's net delta feeds a tiny per-type
    day-level prefix sum (the carry-in offset), and the global maximum is
    ``max(day_offset + within-day running max)``. The big sort shards into
    calendar-sized pieces; only day aggregates cross the type partition —
    the distributed-prefix-sum shape a 100 TB sweep needs."""
    e = T(spark, sf_dir, "events").select("event_type", "ts")
    # One scan: each event explodes into its (+1 at start, −1 at end) delta
    # pair — half the I/O of a union of two reads of the same table.
    deltas = (
        e.select(
            "event_type",
            F.explode(
                F.array(
                    F.struct(F.col("ts").alias("t"), F.lit(1).alias("delta")),
                    F.struct(
                        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("t"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("d"),
        )
        .select("event_type", "d.t", "d.delta")
        .withColumn("day", F.to_date("t"))
    )
    w_day = (
        Window.partitionBy("event_type", "day")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_day = deltas.withColumn("run", F.sum("delta").over(w_day))
    daily = in_day.groupBy("event_type", "day").agg(
        F.max("run").alias("mx"), F.sum("delta").alias("net")
    )
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        daily.withColumn("offset", F.coalesce(F.sum("net").over(w_carry), F.lit(0)))
        .groupBy("event_type")
        .agg(F.max(F.col("offset") + F.col("mx")).cast("int").alias("max_concurrent"))
    )


@register(
    "q_dau_wau_stickiness",
    oracle="""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
grid AS (SELECT DISTINCT day FROM ud),
wau AS (
  SELECT g.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM grid g JOIN ud u
    ON u.day BETWEEN g.day - INTERVAL 6 DAY AND g.day
  GROUP BY g.day
),
dau AS (
  SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
       CAST(floor(CAST(d.dau AS DOUBLE) / w.wau * 1000000) AS BIGINT)
         AS stickiness_fp6
FROM dau d JOIN wau w USING (day)
""",
)
def q_dau_wau_stickiness(spark, sf_dir):
    """DAU/WAU stickiness per day: daily actives over trailing-7-day
    actives. Distinct-over-sliding-window can't be a plain window aggregate
    (COUNT DISTINCT needs the underlying user set, not a running total), so
    the scale-correct shape is: reduce events once to the DISTINCT
    (user, day) frame — the only corpus-sized shuffle — then range-join that
    user-day frame onto the day grid (each user-day lands in ≤7 grid days,
    so the join output is ≤7× the user-day frame, calendar-bounded) and
    count distinct per grid day. The day grid is tiny and broadcasts."""
    e = T(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct().transform(persisted)
    grid = ud.select("day").distinct()
    wau = (
        ud.alias("u")
        .join(
            F.broadcast(grid.alias("g")),
            (F.col("u.day") >= F.date_sub(F.col("g.day"), 6))
            & (F.col("u.day") <= F.col("g.day")),
        )
        .groupBy(F.col("g.day").alias("day"))
        .agg(F.countDistinct("u.user_id").cast("bigint").alias("wau"))
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.floor(F.col("dau").cast("double") / F.col("wau") * 1_000_000)
            .cast("bigint")
            .alias("stickiness_fp6"),
        )
    )


@register(
    "q_first_touch_attribution",
    oracle="""
WITH ft AS (
  SELECT user_id, strftime(CAST(MIN(ts) AS DATE), '%Y-%m-%d') AS first_touch_day
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
rev AS (
  SELECT user_id,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) AS DECIMAL(18,2)) AS revenue
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT COALESCE(f.first_touch_day, 'unattributed') AS first_touch_day,
       CAST(COUNT(*) AS BIGINT) AS n_buyers,
       CAST(SUM(r.revenue) AS DOUBLE) AS attributed_revenue
FROM rev r LEFT JOIN ft f USING (user_id)
GROUP BY 1
""",
)
def q_first_touch_attribution(spark, sf_dir):
    """First-touch marketing attribution: each buyer's lifetime purchase
    revenue is credited to the day of their FIRST view event (buyers with no
    view land in 'unattributed'). Both sides reduce to user-sized frames
    first (per-user MIN and per-user exact-decimal SUM — map-side combined),
    then join co-partitioned on user_id; events are scanned once and never
    self-joined. The last-touch / position-decay variants swap the MIN for a
    MAX or a window weight over the same frame."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts", "value")
    ft = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.date_format(F.min("ts"), "yyyy-MM-dd").alias("first_touch_day"))
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(10,2)"))
            .cast("decimal(18,2)")
            .alias("revenue")
        )
    )
    return (
        rev.join(ft, "user_id", "left")
        .groupBy(
            F.coalesce(F.col("first_touch_day"), F.lit("unattributed")).alias(
                "first_touch_day"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_buyers"),
            F.sum("revenue").cast("double").alias("attributed_revenue"),
        )
    )


@register(
    "q_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
),
trans AS (
  SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, event_type, n,
       CAST(floor(n * 1000000.0 / SUM(n) OVER (PARTITION BY prev_type))
            AS BIGINT) AS prob_ppm
FROM trans
""",
)
def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences —
    the session-model / next-event-prediction feature a behavioral pipeline
    derives from the raw event log.

    Scale shape: ONE shuffle on user_id feeds the ordered LAG window
    (deterministic tie-break on event_id); the transition matrix is
    |types|² rows, so the closing aggregation and the per-row probability
    window are trivia-sized. Probabilities are integer ppm
    (floor(1e6·n/total)) from exact counts — engine-stable."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("prev_type", F.lag("event_type").over(w))
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wt = Window.partitionBy("prev_type")
    return trans.select(
        "prev_type",
        "event_type",
        "n",
        F.floor(F.col("n") * 1_000_000.0 / F.sum("n").over(wt))
        .cast("bigint")
        .alias("prob_ppm"),
    )


@register(
    "q_user_journeys",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
paths AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM seq WHERE rn <= 3 GROUP BY user_id
),
cnt AS (
  SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users FROM paths GROUP BY path
)
SELECT path, n_users,
       CAST(ROW_NUMBER() OVER (ORDER BY n_users DESC, path) AS INTEGER) AS rank
FROM cnt
QUALIFY rank <= 20
""",
)
def q_user_journeys(spark, sf_dir):
    """Top user journeys: each user's first three events as an ordered path
    (view>click>purchase, ...), counted and ranked — the entry-flow mining
    behind onboarding analytics. One user_id shuffle feeds BOTH the ordering
    window and the per-user path fold (co-partitioned); the path-count frame
    is |types|³-bounded, so the closing top-k is trivia-sized."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 3)
    paths = seq.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    cnt = paths.groupBy("path").agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    wr = Window.orderBy(F.desc("n_users"), "path")
    return (
        cnt.withColumn("rank", F.row_number().over(wr).cast("int"))
        .filter(F.col("rank") <= 20)
    )


@register(
    "q_revenue_concentration",
    oracle="""
WITH rev AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey,
         SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT seg, o_custkey, r,
         SUM(r) OVER (PARTITION BY seg ORDER BY r DESC, o_custkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(r) OVER (PARTITION BY seg) AS total,
         COUNT(*) OVER (PARTITION BY seg) AS n_customers
  FROM rev
)
SELECT seg, CAST(n_customers AS BIGINT) AS n_customers,
       CAST(SUM(CASE WHEN cum - r < total * 0.8 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_top80,
       CAST(floor(SUM(CASE WHEN cum - r < total * 0.8 THEN 1 ELSE 0 END)
                  * 1000000.0 / n_customers) AS BIGINT) AS share_ppm
FROM ranked
GROUP BY seg, n_customers
""",
)
def q_revenue_concentration(spark, sf_dir):
    """Revenue concentration (the 80/20 audit): per segment, the smallest
    count of customers whose cumulative revenue reaches 80% of the segment
    total — the Pareto-principle health metric for marketplace/account
    analysis. The fact table collapses to a per-customer exact-decimal
    aggregate first (map-side combined); ranking windows run on that
    customer-sized frame co-partitioned by segment. The 0.8 threshold
    compares exact decimals (cum - r < total·0.8) so membership is
    engine-stable."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("r"))
    )
    wc = (
        Window.partitionBy("seg")
        .orderBy(F.desc("r"), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wseg = Window.partitionBy("seg")
    ranked = rev.select(
        "seg",
        "o_custkey",
        "r",
        F.sum("r").over(wc).alias("cum"),
        F.sum("r").over(wseg).alias("total"),
        F.count(F.lit(1)).over(wseg).alias("n_customers"),
    )
    in80 = F.when(
        F.col("cum") - F.col("r") < F.col("total") * 0.8, F.lit(1)
    ).otherwise(F.lit(0))
    return ranked.groupBy("seg", "n_customers").agg(
        F.sum(in80).cast("bigint").alias("n_top80"),
        F.floor(F.sum(in80) * 1_000_000.0 / F.col("n_customers"))
        .cast("bigint")
        .alias("share_ppm"),
    ).select(
        "seg",
        F.col("n_customers").cast("bigint").alias("n_customers"),
        "n_top80",
        "share_ppm",
    )


@register(
    "q_abandonment_detection",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS next_purchase_ts
  FROM events
),
views AS (
  SELECT user_id,
         CASE WHEN next_purchase_ts IS NULL
                   OR next_purchase_ts > ts + INTERVAL 60 MINUTE
              THEN 1 ELSE 0 END AS abandoned
  FROM seq WHERE event_type = 'view'
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_views,
       CAST(SUM(abandoned) AS BIGINT) AS n_abandoned,
       CAST(floor(SUM(abandoned) * 1000000.0 / COUNT(*)) AS BIGINT)
         AS abandon_ppm
FROM views GROUP BY user_id
""",
)
def q_abandonment_detection(spark, sf_dir):
    """CEP ABSENCE pattern — "view NOT followed by a purchase within 60
    minutes" (cart abandonment): the negative-pattern query MATCH_RECOGNIZE
    engines sell, expressed as ONE ordered window: the reverse-running MIN
    of purchase timestamps gives every view its next purchase in O(n) per
    user, so absence is a plain comparison — never a per-view range
    self-join (which at 100 TB multiplies the event table by the pattern
    window). One user_id shuffle; the per-user rollup is co-partitioned."""
    e = T(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    nxt = F.min(
        F.when(F.col("event_type") == "purchase", F.col("ts"))
    ).over(w)
    seq = e.withColumn("next_purchase_ts", nxt)
    views = seq.filter(F.col("event_type") == "view").select(
        "user_id",
        F.when(
            F.col("next_purchase_ts").isNull()
            | (
                F.col("next_purchase_ts")
                > F.col("ts") + F.expr("INTERVAL 60 MINUTES")
            ),
            1,
        )
        .otherwise(0)
        .alias("abandoned"),
    )
    return views.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_views"),
        F.sum("abandoned").cast("bigint").alias("n_abandoned"),
        F.floor(F.sum("abandoned") * 1_000_000.0 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("abandon_ppm"),
    )


@register(
    "q_gini_concentration",
    oracle="""
WITH rev AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT seg, cents,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, o_custkey) AS i,
         COUNT(*) OVER (PARTITION BY seg) AS n
  FROM rev
),
m AS (
  SELECT seg, CAST(MIN(n) AS BIGINT) AS n,
         CAST(SUM(CAST(i AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0)) AS swx,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx
  FROM ranked GROUP BY seg
)
SELECT seg, n,
       CAST(floor((2.0 * CAST(swx AS DOUBLE) / (n * CAST(sx AS DOUBLE))
                   - (n + 1.0) / n) * 1000000) AS BIGINT) AS gini_fp6
FROM m
""",
)
def q_gini_concentration(spark, sf_dir):
    """Gini coefficient of customer revenue per segment — the inequality
    complement to q_revenue_concentration's 80/20 count (a segment can pass
    the 80/20 screen while its long tail collapses; Gini sees the whole
    Lorenz curve). Exact rank formulation G = 2Σi·x_(i)/(nΣx) − (n+1)/n:
    ranks come from a window over the CUSTOMER-sized per-segment frame
    (the fact table contributes one map-side-combined aggregate), the rank-
    weighted sums accumulate in DECIMAL(38,0), and the coefficient is one
    double expression floored to fp6."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rev = (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_mktsegment").alias("seg"), "o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    w = Window.partitionBy("seg").orderBy("cents", "o_custkey")
    ranked = rev.select(
        "seg",
        "cents",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(Window.partitionBy("seg")).alias("n"),
    )
    m = ranked.groupBy("seg").agg(
        F.min("n").cast("bigint").alias("n"),
        F.sum(F.col("i").cast("decimal(38,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("swx"),
        F.sum(F.col("cents").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("sx"),
    )
    gini = F.floor(
        (
            2.0 * F.col("swx").cast("double") / (F.col("n") * F.col("sx").cast("double"))
            - (F.col("n") + 1.0) / F.col("n")
        )
        * 1_000_000
    ).cast("bigint")
    return m.select("seg", "n", gini.alias("gini_fp6"))


def _rank_ntile5_bucket(k, n):
    """NTILE(5) bucket of global rank ``k`` among ``n`` rows, in exact
    integer arithmetic: with q = n div 5, r = n mod 5 the first r buckets
    hold q+1 rows, so bucket = ceil(k/(q+1)) while k <= r*(q+1), else
    r + ceil((k - r*(q+1))/q). ceil(a/b) = floor((a+b-1)/b); ranks stay far
    below 2^53 so the double division floors exactly."""
    q = (n / 5).cast("bigint")
    r = (n % 5).cast("bigint")
    head = r * (q + 1)
    return (
        F.when(k <= head, F.floor((k + q) / (q + 1)))
        .otherwise(r + F.floor((k - head + q - 1) / q))
        .cast("int")
    )


@register(
    "q_rfm_segments",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         date_diff('day', MAX(CAST(ts AS DATE)),
                   (SELECT MAX(CAST(ts AS DATE)) FROM events)) AS recency_d,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(value AS DECIMAL(10,2))) * 100 AS BIGINT) AS monetary
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
scored AS (
  SELECT user_id,
         NTILE(5) OVER (ORDER BY recency_d DESC, user_id) AS r,
         NTILE(5) OVER (ORDER BY frequency, user_id) AS f,
         NTILE(5) OVER (ORDER BY monetary, user_id) AS m
  FROM per_user
)
SELECT CAST(r AS BIGINT) * 100 + f * 10 + m AS rfm_code,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(MIN(user_id) AS BIGINT) AS sample_user
FROM scored GROUP BY 1
""",
)
def q_rfm_segments(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary quintiles — the
    marketing-analytics classic), with each dimension's quintile an EXACT
    distributed ``NTILE(5) OVER (ORDER BY metric [DESC], user_id)`` — but
    never a frame-wide single-partition sort (VERDICT r04 what's-wrong #1).

    Distributed rank, the range-partition way, all three dimensions in one
    pass: the buyer frame explodes into (dim, sort_value, user) triples
    (recency negated so every dim ranks ascending), ONE
    ``repartitionByRange`` tiles the total (dim, value, user) order across
    partitions, and each row's global rank within its dim is its
    ``row_number`` inside the (partition, dim) slice — a PARTITIONED window,
    local sort only — plus the total count of earlier partitions' rows of
    the same dim. Those per-(partition, dim) totals form a frame bounded by
    3 × shuffle-partitions rows whose exclusive prefix sum comes from a
    broadcast θ-join (pid' < pid), so NO unpartitioned window exists
    anywhere in the plan at ANY metric cardinality. Rank → quintile is
    NTILE's closed-form arithmetic (``_rank_ntile5_bucket``); a user-keyed
    pivot reassembles the three digits and the |5³|-bounded code histogram
    is the output. Higher digit = better (most recent / most frequent /
    highest spend); the (metric, user_id) tie-break keeps both engines
    cutting identically."""
    e = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h"))
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_day"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            (F.sum(F.col("value").cast("decimal(10,2)")) * 100)
            .cast("bigint")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.datediff(F.col("h"), F.col("last_day")).alias("recency_d"),
            "frequency",
            "monetary",
        )
    )
    # NTILE ORDER BY recency_d DESC == most-recent buyers land in the HIGH
    # buckets (digit 5): negating recency makes all three dims rank ASC so
    # one composite range partitioning serves them all
    exploded = per_user.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit("r").alias("dim"),
                    (-F.col("recency_d")).cast("bigint").alias("v"),
                ),
                F.struct(F.lit("f").alias("dim"), F.col("frequency").alias("v")),
                F.struct(F.lit("m").alias("dim"), F.col("monetary").alias("v")),
            )
        ).alias("d"),
    ).select("user_id", "d.dim", "d.v")
    rp = (
        exploded.repartitionByRange("dim", "v", "user_id")
        .withColumn("pid", F.spark_partition_id())
        # the rank branch and the partition-totals branch must see the SAME
        # range partitioning — persist instead of recomputing it twice
        .transform(persisted)
    )
    rn = F.row_number().over(Window.partitionBy("pid", "dim").orderBy("v", "user_id"))
    totals = rp.groupBy("pid", "dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("nv")
    )
    a, b = totals.alias("a"), totals.alias("b")
    offsets = (
        a.join(
            F.broadcast(b),
            (F.col("b.dim") == F.col("a.dim")) & (F.col("b.pid") < F.col("a.pid")),
            "left",
        )
        .groupBy(F.col("a.pid").alias("pid"), F.col("a.dim").alias("dim"))
        .agg(F.coalesce(F.sum("b.nv"), F.lit(0)).cast("bigint").alias("base"))
    )
    # every user contributes one row per dim, so n = total rows / 3
    total = totals.agg((F.sum("nv") / 3).cast("bigint").alias("n"))
    ranked = (
        rp.withColumn("rn", rn)
        .join(F.broadcast(offsets), ["pid", "dim"])
        .crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "dim",
            _rank_ntile5_bucket(F.col("base") + F.col("rn"), F.col("n")).alias(
                "bucket"
            ),
        )
    )
    scored = ranked.groupBy("user_id").agg(
        F.max(F.when(F.col("dim") == "r", F.col("bucket"))).alias("r"),
        F.max(F.when(F.col("dim") == "f", F.col("bucket"))).alias("f"),
        F.max(F.when(F.col("dim") == "m", F.col("bucket"))).alias("m"),
    )
    return (
        scored.groupBy(
            (F.col("r").cast("bigint") * 100 + F.col("f") * 10 + F.col("m")).alias(
                "rfm_code"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.min("user_id").cast("bigint").alias("sample_user"),
        )
    )


@register(
    "q_cohort_ltv_curve",
    oracle="""
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY 1
),
rev AS (
  SELECT e.user_id,
         CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7 AS BIGINT)
           AS wk,
         f.cohort_day,
         CAST(CAST(e.value AS DECIMAL(10,2)) * 100 AS BIGINT) AS cents
  FROM events e JOIN first_seen f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase'
),
cohort_wk AS (
  SELECT CAST(date_trunc('week', cohort_day) AS DATE) AS cohort_week, wk,
         CAST(SUM(cents) AS BIGINT) AS wk_cents
  FROM rev GROUP BY 1, 2
),
sizes AS (
  SELECT CAST(date_trunc('week', cohort_day) AS DATE) AS cohort_week,
         CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM first_seen GROUP BY 1
)
SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week, c.wk,
       s.cohort_users,
       CAST(SUM(c.wk_cents) OVER (PARTITION BY c.cohort_week ORDER BY c.wk
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_cents,
       CAST(floor(SUM(c.wk_cents) OVER (PARTITION BY c.cohort_week ORDER BY c.wk
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            * 1.0 / s.cohort_users) AS BIGINT) AS ltv_cents_per_user
FROM cohort_wk c JOIN sizes s ON c.cohort_week = s.cohort_week
""",
)
def q_cohort_ltv_curve(spark, sf_dir):
    """Cumulative lifetime-value curve per signup cohort (the revenue twin
    of q_cohort_retention): purchase cents roll up to (cohort-week, week
    offset), then a cumulative window on that CALENDAR-GRAIN frame yields
    each cohort's LTV trajectory per member — the payback-period readout.
    Events touch two co-partitioned user-keyed steps (first-seen + the
    revenue join); every window after runs on the |weeks|² frame. Exact
    integer cents end-to-end; per-user LTV floors once."""
    e = T(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("cohort_day")
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_seen, "user_id")
        .select(
            F.floor(
                F.datediff(F.col("ts").cast("date"), F.col("cohort_day")) / 7
            )
            .cast("bigint")
            .alias("wk"),
            F.date_trunc("week", F.col("cohort_day"))
            .cast("date")
            .alias("cohort_week"),
            (F.col("value").cast("decimal(10,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
    )
    cohort_wk = rev.groupBy("cohort_week", "wk").agg(
        F.sum("cents").cast("bigint").alias("wk_cents")
    )
    sizes = first_seen.groupBy(
        F.date_trunc("week", F.col("cohort_day")).cast("date").alias("cohort_week")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cohort_users"))
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum("wk_cents").over(w)
    return (
        cohort_wk.join(F.broadcast(sizes), "cohort_week")
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "wk",
            "cohort_users",
            cum.cast("bigint").alias("cum_cents"),
            F.floor(cum * 1.0 / F.col("cohort_users"))
            .cast("bigint")
            .alias("ltv_cents_per_user"),
        )
    )


@register(
    "q_rolling_retention_d7",
    oracle="""
WITH active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
nxt AS (
  SELECT user_id, day,
         LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
  FROM active
),
horizon AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM events)
SELECT strftime(n.day, '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN n.next_day IS NOT NULL
                      AND date_diff('day', n.day, n.next_day) <= 7
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_returned_7d,
       CAST(floor(SUM(CASE WHEN n.next_day IS NOT NULL
                            AND date_diff('day', n.day, n.next_day) <= 7
                           THEN 1 ELSE 0 END) * 1000000.0 / COUNT(*)) AS BIGINT)
         AS retention_fp6
FROM nxt n CROSS JOIN horizon
WHERE date_diff('day', n.day, horizon.h) >= 7
GROUP BY n.day
""",
)
def q_rolling_retention_d7(spark, sf_dir):
    """Rolling 7-day return rate (the product-health curve next to the
    cohort triangle): of the users active on day d, the share active again
    within the next 7 days. "Any activity within 7 days" reduces to "the
    NEXT active day is within 7" on the distinct user-day frame, so one
    user-partitioned LEAD replaces a 7-wide range self-join; days closer
    than 7 to the data horizon are censored out rather than reported as
    artificially low.

    Scale shape: events collapse to the distinct (user, day) frame in one
    shuffle; the LEAD window partitions by user; the readout is a
    calendar-sized aggregate."""
    e = T(spark, sf_dir, "events")
    active = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    nxt = active.withColumn("next_day", F.lead("day").over(w))
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h"))
    returned = F.when(
        F.col("next_day").isNotNull()
        & (F.datediff("next_day", "day") <= 7),
        1,
    ).otherwise(0)
    return (
        nxt.crossJoin(F.broadcast(horizon))
        .filter(F.datediff("h", "day") >= 7)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(returned).cast("bigint").alias("n_returned_7d"),
            F.floor(F.sum(returned) * 1_000_000.0 / F.count(F.lit(1)))
            .cast("bigint")
            .alias("retention_fp6"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_active",
            "n_returned_7d",
            "retention_fp6",
        )
    )


@register(
    "q_position_attribution",
    oracle="""
WITH purchases AS (
  SELECT event_id AS pid, user_id, ts AS pts,
         CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT) AS v
  FROM events WHERE event_type = 'purchase'
),
touches AS (
  SELECT p.pid, p.v, e.event_type AS channel, e.ts, e.event_id,
         ROW_NUMBER() OVER (PARTITION BY p.pid ORDER BY e.ts, e.event_id) AS r,
         COUNT(*) OVER (PARTITION BY p.pid) AS n
  FROM purchases p
  JOIN events e ON e.user_id = p.user_id
   AND e.event_type <> 'purchase'
   AND e.ts < p.pts AND e.ts >= p.pts - INTERVAL 7 DAY
),
credited AS (
  SELECT channel, pid, v, r, n,
         CASE
           WHEN n = 1 THEN v
           WHEN n = 2 AND r = 1 THEN v // 2
           WHEN n = 2 AND r = 2 THEN v - v // 2
           WHEN r = 1 THEN v * 2 // 5
                         + (v - 2 * (v * 2 // 5)
                            - (n - 2) * ((v - 2 * (v * 2 // 5)) // (n - 2)))
           WHEN r = n THEN v * 2 // 5
           ELSE (v - 2 * (v * 2 // 5)) // (n - 2)
         END AS credit
  FROM touches
)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(credit) AS BIGINT) AS credit_cents
FROM credited GROUP BY channel
""",
)
def q_position_attribution(spark, sf_dir):
    """Position-based (U-shaped) multi-touch attribution — the marketing
    standard between first-touch's and last-touch's biases: each purchase's
    revenue splits 40% to the first touch, 40% to the last, 20% shared by
    the middles, over the touches in the 7-day pre-purchase window. All
    splitting is exact integer-cents floor arithmetic with the remainder
    assigned to the FIRST touch (n=1 → 100%, n=2 → 50/50), so per-channel
    credit sums are engine-identical and conserve each purchase's value to
    the cent (pinned by test).

    Scale shape: purchases join the event stream co-partitioned on user_id
    with the 7-day predicate riding the join; ranks and counts are windows
    PARTITIONED by purchase id (journey-sized partitions); the readout is
    one channel aggregate."""
    e = T(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        (F.col("value").cast("decimal(10,2)") * 100).cast("bigint").alias("v"),
    )
    touches = (
        e.filter(F.col("event_type") != "purchase")
        .join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("ts") < F.col("pts"))
            & (F.col("ts") >= F.col("pts") - F.expr("INTERVAL 7 DAY")),
        )
        .select("pid", "v", F.col("event_type").alias("channel"), "ts", "event_id")
    )
    w = Window.partitionBy("pid").orderBy("ts", "event_id")
    wn = Window.partitionBy("pid")
    ranked = touches.select(
        "pid",
        "v",
        "channel",
        F.row_number().over(w).alias("r"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    forty = F.floor(F.col("v") * 2 / 5).cast("bigint")
    mid_pool = F.col("v") - 2 * forty
    mid_each = F.floor(mid_pool / (F.col("n") - 2)).cast("bigint")
    credit = (
        F.when(F.col("n") == 1, F.col("v"))
        .when(
            (F.col("n") == 2) & (F.col("r") == 1),
            F.floor(F.col("v") / 2).cast("bigint"),
        )
        .when(
            (F.col("n") == 2) & (F.col("r") == 2),
            F.col("v") - F.floor(F.col("v") / 2).cast("bigint"),
        )
        .when(
            F.col("r") == 1,
            forty + (mid_pool - (F.col("n") - 2) * mid_each),
        )
        .when(F.col("r") == F.col("n"), forty)
        .otherwise(mid_each)
    )
    return (
        ranked.withColumn("credit", credit)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum("credit").cast("bigint").alias("credit_cents"),
        )
    )


@register(
    "q_churn_features",
    oracle="""
WITH horizon AS (SELECT MAX(CAST(ts AS DATE)) AS h FROM events),
u AS (
  SELECT user_id,
         MIN(CAST(ts AS DATE)) AS first_day,
         MAX(CAST(ts AS DATE)) AS last_day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_purchases,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
               THEN CAST(value AS DECIMAL(10,2)) * 100 END), 0) AS BIGINT)
           AS spend_cents,
         CAST(COUNT(DISTINCT date_trunc('week', ts)) AS BIGINT) AS active_weeks
  FROM events GROUP BY user_id
)
SELECT u.user_id,
       CAST(date_diff('day', u.first_day, horizon.h) AS BIGINT) AS tenure_days,
       CAST(date_diff('day', u.last_day, horizon.h) AS BIGINT) AS recency_days,
       u.n_events, u.n_purchases, u.spend_cents, u.active_weeks,
       CAST(floor(u.n_events * 1000000.0
            / greatest(date_diff('day', u.first_day, horizon.h) / 7.0, 1.0))
            AS BIGINT) AS events_per_week_fp6
FROM u CROSS JOIN horizon
""",
)
def q_churn_features(spark, sf_dir):
    """Churn-model feature materialization — the user-grain feature-store
    table a retention model trains on: tenure, recency, activity volume,
    purchase count/spend, distinct active weeks, and rate-normalized
    activity, all from ONE pass over the event log. Exact integer features
    (cents, day counts) with the single rate feature floor-divided — the
    table is bit-reproducible, which is what makes offline/online feature
    parity checkable.

    Scale shape: one user-keyed multi-aggregate (map-side combined;
    COUNT DISTINCT week is bounded by the calendar) plus a broadcast
    1-row horizon — the corpus is touched exactly once and the output is
    user-grain, ready for the sharded write path."""
    e = T(spark, sf_dir, "events")
    horizon = e.agg(F.max(F.col("ts").cast("date")).alias("h"))
    u = e.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day"),
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchases"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(10,2)") * 100,
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("spend_cents"),
        F.countDistinct(F.date_trunc("week", "ts")).cast("bigint").alias(
            "active_weeks"
        ),
    )
    tenure = F.datediff(F.col("h"), F.col("first_day")).cast("bigint")
    return u.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        tenure.alias("tenure_days"),
        F.datediff(F.col("h"), F.col("last_day")).cast("bigint").alias(
            "recency_days"
        ),
        "n_events",
        "n_purchases",
        "spend_cents",
        "active_weeks",
        F.floor(
            F.col("n_events") * 1_000_000.0 / F.greatest(tenure / 7.0, F.lit(1.0))
        )
        .cast("bigint")
        .alias("events_per_week_fp6"),
    )


@register(
    "q_growth_accounting",
    oracle="""
WITH active AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
lagged AS (
  SELECT user_id, day,
         LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day
  FROM active
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(COUNT(*) AS BIGINT) AS n_active,
       CAST(SUM(CASE WHEN prev_day IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(SUM(CASE WHEN date_diff('day', prev_day, day) = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(SUM(CASE WHEN prev_day IS NOT NULL
                      AND date_diff('day', prev_day, day) > 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
FROM lagged GROUP BY day
""",
)
def q_growth_accounting(spark, sf_dir):
    """Daily growth accounting (the new/retained/resurrected decomposition
    every growth team reports — churn is the complement on the next day's
    row): an active user is NEW if today is their first active day,
    RETAINED if they were also active yesterday, RESURRECTED if their
    previous active day is older. The three classes partition each day's
    actives exactly (pinned by test), so the series reconciles by
    construction.

    Scale shape: events collapse to the distinct (user, day) frame in one
    shuffle; classification is a single user-partitioned LAG (the
    ``q_rolling_retention_d7`` discipline); the readout is a calendar-sized
    aggregate."""
    e = T(spark, sf_dir, "events")
    active = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    lagged = active.withColumn("prev_day", F.lag("day").over(w))
    gap = F.datediff("day", "prev_day")
    return (
        lagged.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_active"),
            F.sum(F.when(F.col("prev_day").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
            F.sum(F.when(gap == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_retained"),
            F.sum(
                F.when(F.col("prev_day").isNotNull() & (gap > 1), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_resurrected"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
        )
    )


# ---------------------------------------------------------------------------
# Item-item co-occurrence similarity (collaborative filtering base)
# ---------------------------------------------------------------------------

_CO_CAP = 16  # max items per basket entering pair enumeration
_CO_MIN_PAIR = 2
_CO_TOP = 100


@register(
    "q_item_cooccurrence",
    oracle=f"""
WITH baskets AS (
  SELECT l_orderkey,
         list_slice(list_sort(list(DISTINCT l_partkey)), 1, {_CO_CAP}) AS parts
  FROM lineitem GROUP BY l_orderkey
),
item AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(parts) AS p FROM baskets) GROUP BY 1
),
prs AS (
  SELECT pr[1] AS p1, pr[2] AS p2, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM (
    SELECT unnest(flatten(list_transform(parts, x ->
             list_transform(list_filter(parts, y -> y > x),
                            y -> [x, y])))) AS pr
    FROM baskets
  ) GROUP BY 1, 2
),
scored AS (
  SELECT p.p1, p.p2, p.c_xy,
         CAST(floor(1000000.0 * p.c_xy
                    / sqrt(CAST(i1.c AS DOUBLE) * i2.c)) AS BIGINT)
           AS cosine_fp6
  FROM prs p JOIN item i1 ON p.p1 = i1.p JOIN item i2 ON p.p2 = i2.p
  WHERE p.c_xy >= {_CO_MIN_PAIR}
)
SELECT p1, p2, c_xy, cosine_fp6, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY cosine_fp6 DESC, p1, p2)
                 AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {_CO_TOP}
""",
)
def q_item_cooccurrence(spark, sf_dir):
    """Item-item co-occurrence cosine over order baskets — the
    "customers who bought X also bought Y" primitive behind every
    neighborhood recommender: ``cos(i,j) = c_ij / √(c_i·c_j)`` where c_ij
    counts baskets containing both (deterministically CAPPED at the first
    {_CO_CAP} sorted items per basket — the standard viral-basket guard,
    same discipline as the LSH bucket caps) and c_i counts capped baskets
    containing i. Top pairs by cosine with a min-support floor.

    Scale shape: pair enumeration is partition-local and bounded by
    cap²/2 per basket (never a corpus self-join); one pair shuffle + one
    item shuffle; the item-count frame joins back at pair grain
    (dimension-sized — AQE broadcasts it when small). The top-k is
    TakeOrderedAndProject."""
    li = T(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.slice(F.sort_array(F.collect_set("l_partkey")), 1, _CO_CAP).alias(
            "parts"
        )
    )
    # r13 (guide §2.4: share one exchange): item supports and pair counts
    # used to be TWO separate shuffles over the basket frame (plus a persist
    # of baskets for the double scan). One explode now emits, per basket
    # item x, a SINGLE row (x, null) alongside x's pairs (x, y>x), and ONE
    # (p1, p2) exchange aggregates both: p2 IS NULL rows are the per-item
    # basket supports (basket parts are distinct, so count == support),
    # p2 IS NOT NULL rows are the pair co-occurrence counts. Same bytes
    # moved, half the exchanges/stages — and baskets drops to a single
    # consumer, so its persist (and cache materialization cost) goes away.
    entries = F.flatten(
        F.expr(
            "transform(parts, (x, i) -> concat("
            "array(struct(x as p1, cast(null as bigint) as p2)), "
            "transform(slice(parts, i + 2, size(parts)), "
            "y -> struct(x as p1, y as p2))))"
        )
    )
    counts = (
        baskets.select(F.explode(entries).alias("e"))
        .groupBy(F.col("e.p1").alias("p1"), F.col("e.p2").alias("p2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c_xy"))
    )  # 3 consumers (pair split + two item sides) share ONE exchange via
    # ReuseExchange — verified in plans/r13/q_item_cooccurrence_after.txt;
    # a persist here would pay a 2.3M-row cache write to save three cheap
    # post-shuffle reductions
    item = counts.filter(F.col("p2").isNull()).select(
        F.col("p1").alias("p"), F.col("c_xy").alias("c")
    )
    prs = counts.filter(F.col("p2").isNotNull()).filter(
        F.col("c_xy") >= _CO_MIN_PAIR
    )
    i1 = item.select(F.col("p").alias("i1p"), F.col("c").alias("c1"))
    i2 = item.select(F.col("p").alias("i2p"), F.col("c").alias("c2"))
    scored = (
        prs.join(i1, F.col("p1") == F.col("i1p"))
        .join(i2, F.col("p2") == F.col("i2p"))
        .select(
            "p1",
            "p2",
            "c_xy",
            F.floor(
                1_000_000.0
                * F.col("c_xy")
                / F.sqrt(F.col("c1").cast("double") * F.col("c2"))
            )
            .cast("bigint")
            .alias("cosine_fp6"),
        )
    )
    w = Window.orderBy(F.col("cosine_fp6").desc(), F.col("p1"), F.col("p2"))
    # r13 (guide §2.4): TakeOrderedAndProject pre-reduction — the global
    # rank window previously exchanged the WHOLE scored pair frame into a
    # single partition; orderBy+limit computes the same top-K (total
    # ordering: (p1, p2) tie-break) and the window then ranks K rows.
    return (
        scored.orderBy(F.col("cosine_fp6").desc(), F.col("p1"), F.col("p2"))
        .limit(_CO_TOP)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _CO_TOP)
        .select("p1", "p2", "c_xy", "cosine_fp6", F.col("rank").cast("int").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Markov next-event transition matrix
# ---------------------------------------------------------------------------

_MKV_GAP_MIN = 30


@register(
    "q_markov_transitions",
    oracle=f"""
WITH nxt AS (
  SELECT event_type AS prev_type,
         LEAD(event_type) OVER w AS next_type,
         EPOCH_US(LEAD(ts) OVER w) - EPOCH_US(ts) AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
pairs AS (
  SELECT prev_type, next_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM nxt
  WHERE next_type IS NOT NULL AND gap_us <= {_MKV_GAP_MIN} * 60 * 1000000
  GROUP BY 1, 2
)
SELECT prev_type, next_type, n_transitions,
       CAST(n_transitions AS DOUBLE)
         / SUM(n_transitions) OVER (PARTITION BY prev_type) AS prob
FROM pairs
""",
)
def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over within-session event
    bigrams: for each user, consecutive events no more than
    {_MKV_GAP_MIN} minutes apart contribute one (prev_type -> next_type)
    observation; the row-stochastic probability is the bigram count over
    the prev_type row total. The training-data analogue is next-action
    modeling / session-based recommendation priors; it is also the
    transition matrix a sessionized clickstream simulator replays.

    Scale shape: ONE user-keyed window exchange produces the bigrams (the
    same partitioning the sessionizer uses — no corpus self-join, no global
    sort), then one |types|^2-sized aggregate; the row totals come from a
    window over that aggregated frame (keeping the group keys through the
    final aggregate — never a second scan of events). The only double is
    the single final division of two exact BIGINTs, so cross-engine hashes
    match bit-for-bit."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = (
        T(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", F.lead("event_type").over(w))
        .withColumn(
            "gap_us",
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts")),
        )
    )
    pairs = (
        nxt.filter(
            F.col("next_type").isNotNull()
            & (F.col("gap_us") <= _MKV_GAP_MIN * 60 * 1_000_000)
        )
        .groupBy(F.col("event_type").alias("prev_type"), "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
    row_tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(row_tot)
        ).alias("prob"),
    )
