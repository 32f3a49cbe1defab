"""Lakehouse metadata-layer analytics: transaction-log replay and
optimizer-statistics validation (oracle-checked).

* **q_txn_log_replay** — the Delta/Iceberg mechanics every lakehouse sink in
  this repo ultimately rides on: an append-only log of ADD/REMOVE file
  actions is the table; any version's state is a pure fold over the prefix.
  The log here is derived deterministically from orders (version = month
  index; one base file per (customer-bucket, month); every complete group
  of 3 versions is compacted per bucket: its base files are REMOVEd and one
  compacted file ADDed). The query replays the log version by version —
  adds, removes, live file count, live rows, vacuum-eligible tombstones at
  a 2-version retention — and carries an in-plan conservation witness:
  live_rows at EVERY version must equal the cumulative source rows through
  that version (a log replay that loses or duplicates rows is corrupt).
  Everything runs on the file-grain frame (|buckets|·|months| rows): one
  shuffle to build it, windows after.
* **q_join_cardinality_estimate** — the System-R estimator audit: per
  key-range bucket, estimate |A ⋈ B| as n_A·n_B / max(d_A, d_B) (uniformity
  + containment assumptions, Selinger 1979) from per-bucket (rows, distinct
  keys) statistics, then compute the TRUE join size per bucket and the
  q-error (Moerkotte 2009) of the estimate. This is the statistics layer a
  cost-based optimizer keeps per column — validated against ground truth,
  which is the deliberate expensive part (one real co-partitioned join at
  per-key-count grain, never row×row). The estimator side is two
  metadata-sized aggregates.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, persisted, register

_NBUCKETS = 4  # customer-hash buckets (files per month)
_GROUP = 3  # compaction group size in versions
_RETENTION = 2  # versions a tombstone must age before vacuum


@register(
    "q_txn_log_replay",
    oracle=f"""
WITH base AS (
  SELECT CAST(o_custkey % {_NBUCKETS} AS BIGINT) AS b,
         CAST(EXTRACT(year FROM o_orderdate) * 12
              + EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS mk,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM orders GROUP BY 1, 2
),
vm AS (
  SELECT b, n_rows,
         CAST(DENSE_RANK() OVER (ORDER BY mk) - 1 AS BIGINT) AS v
  FROM base
),
mx AS (SELECT CAST(MAX(v) AS BIGINT) AS vmax FROM vm),
-- base-file actions: ADD (b, v) at version v; REMOVE at version
-- 3·(v div 3) + 2 when that compaction version exists in the log
acts AS (
  SELECT b, v, n_rows,
         CASE WHEN {_GROUP} * (v // {_GROUP}) + {_GROUP} - 1 <= mx.vmax
              THEN {_GROUP} * (v // {_GROUP}) + {_GROUP} - 1
              ELSE NULL END AS remove_v
  FROM vm, mx
),
-- per-version deltas: adds(base) at v; compaction at remove_v REMOVEs the
-- group's base files and ADDs one compacted file per bucket carrying the
-- group's rows — live rows are folded through the ACTIONS, then checked
-- against cumulative ingest (the conservation witness)
per_v AS (
  SELECT v,
         CAST(COUNT(*) AS BIGINT) AS add_base,
         CAST(SUM(n_rows) AS BIGINT) AS rows_added
  FROM acts GROUP BY v
),
comp AS (
  SELECT remove_v AS v,
         CAST(COUNT(*) AS BIGINT) AS removed_files,
         CAST(SUM(n_rows) AS BIGINT) AS removed_rows,
         CAST(COUNT(DISTINCT b) AS BIGINT) AS add_compact,
         CAST(SUM(n_rows) AS BIGINT) AS compact_rows
  FROM acts WHERE remove_v IS NOT NULL GROUP BY remove_v
),
tl AS (
  SELECT p.v,
         p.add_base + COALESCE(c.add_compact, 0) AS n_added,
         COALESCE(c.removed_files, 0) AS n_removed,
         p.rows_added,
         p.rows_added + COALESCE(c.compact_rows, 0)
           - COALESCE(c.removed_rows, 0) AS rows_delta
  FROM per_v p LEFT JOIN comp c ON p.v = c.v
),
run AS (
  SELECT v, n_added, n_removed,
         SUM(n_added - n_removed) OVER (ORDER BY v) AS live_files,
         SUM(rows_delta) OVER (ORDER BY v) AS live_rows,
         SUM(rows_added) OVER (ORDER BY v) AS cum_ingest,
         SUM(COALESCE(n_removed, 0))
           OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                 AND {_RETENTION} PRECEDING) AS vac
  FROM tl
)
SELECT CAST(v AS BIGINT) AS version,
       CAST(n_added AS BIGINT) AS n_added,
       CAST(n_removed AS BIGINT) AS n_removed,
       CAST(live_files AS BIGINT) AS live_files,
       CAST(live_rows AS BIGINT) AS live_rows,
       CAST(COALESCE(vac, 0) AS BIGINT) AS vacuum_eligible,
       CAST(CASE WHEN live_rows = cum_ingest THEN 1 ELSE 0 END AS BIGINT)
         AS conserved
FROM run
""",
)
def q_txn_log_replay(spark, sf_dir):
    """Replay a derived ADD/REMOVE transaction log version-by-version
    (module docstring). Compaction is row-conserving by construction — the
    compacted file re-adds exactly the rows its REMOVEd inputs held at the
    same version — so live_rows == cumulative source rows is a real
    conservation identity, emitted as the `conserved` verdict (the Spark
    side computes both sides and compares; the oracle pins 1). Windows run
    over the (buckets × months)-sized file frame only."""
    o = T(spark, sf_dir, "orders")
    base = o.groupBy(
        (F.col("o_custkey") % _NBUCKETS).cast("bigint").alias("b"),
        (
            F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1
        )
        .cast("bigint")
        .alias("mk"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    vm = base.select(
        "b",
        "n_rows",
        # bounded cardinality: mk is the MONTH index (calendar span ≤ ~84)
        (F.dense_rank().over(Window.orderBy("mk")) - 1)
        .cast("bigint")
        .alias("v"),
    ).transform(persisted)  # file-grain; consumers: vmax probe + actions
    mx = vm.agg(F.max("v").alias("vmax"))
    acts = vm.crossJoin(F.broadcast(mx)).select(
        "b",
        "v",
        "n_rows",
        F.when(
            F.expr(f"{_GROUP} * (v div {_GROUP}) + {_GROUP} - 1") <= F.col("vmax"),
            F.expr(f"{_GROUP} * (v div {_GROUP}) + {_GROUP} - 1"),
        ).alias("remove_v"),
    )
    per_v = acts.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("add_base"),
        F.sum("n_rows").cast("bigint").alias("rows_added"),
    )
    comp = (
        acts.filter(F.col("remove_v").isNotNull())
        .groupBy(F.col("remove_v").alias("v"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("removed_files"),
            F.sum("n_rows").cast("bigint").alias("removed_rows"),
            F.countDistinct("b").cast("bigint").alias("add_compact"),
            F.sum("n_rows").cast("bigint").alias("compact_rows"),
        )
    )
    tl = per_v.join(F.broadcast(comp), "v", "left").select(
        "v",
        (F.col("add_base") + F.coalesce(F.col("add_compact"), F.lit(0))).alias(
            "n_added"
        ),
        F.coalesce(F.col("removed_files"), F.lit(0)).alias("n_removed"),
        "rows_added",
        (
            F.col("rows_added")
            + F.coalesce(F.col("compact_rows"), F.lit(0))
            - F.coalesce(F.col("removed_rows"), F.lit(0))
        ).alias("rows_delta"),
    )
    # bounded cardinality: v is the VERSION (month grain, ≤ ~84 rows)
    wv = Window.orderBy("v")
    wvac = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, -_RETENTION
    )
    run = tl.select(
        "v",
        "n_added",
        "n_removed",
        F.sum(F.col("n_added") - F.col("n_removed")).over(wv).alias(
            "live_files"
        ),
        F.sum("rows_delta").over(wv).alias("live_rows"),
        F.sum("rows_added").over(wv).alias("cum_ingest"),
        F.coalesce(F.sum("n_removed").over(wvac), F.lit(0)).alias("vac"),
    )
    # Conservation witness: live rows folded through the ADD/REMOVE actions
    # must equal cumulative ingested rows at every version — a replay that
    # loses or duplicates rows through compaction breaks this identity.
    return run.select(
        F.col("v").cast("bigint").alias("version"),
        F.col("n_added").cast("bigint").alias("n_added"),
        F.col("n_removed").cast("bigint").alias("n_removed"),
        F.col("live_files").cast("bigint").alias("live_files"),
        F.col("live_rows").cast("bigint").alias("live_rows"),
        F.col("vac").cast("bigint").alias("vacuum_eligible"),
        F.when(F.col("live_rows") == F.col("cum_ingest"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("conserved"),
    )


_CARD_B = 16  # key-range buckets


@register(
    "q_join_cardinality_estimate",
    oracle=f"""
WITH km AS (
  SELECT CAST(GREATEST((SELECT MAX(user_id) FROM events),
                       (SELECT MAX(o_custkey) FROM orders)) AS BIGINT) AS kmax
),
ek AS (
  SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
ok AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
),
eb AS (
  SELECT e.k // (km.kmax // {_CARD_B} + 1) AS bucket,
         CAST(SUM(e.cnt) AS BIGINT) AS n1,
         CAST(COUNT(*) AS BIGINT) AS d1
  FROM ek e, km GROUP BY 1
),
ob AS (
  SELECT o.k // (km.kmax // {_CARD_B} + 1) AS bucket,
         CAST(SUM(o.cnt) AS BIGINT) AS n2,
         CAST(COUNT(*) AS BIGINT) AS d2
  FROM ok o, km GROUP BY 1
),
act AS (
  SELECT e.k // (km.kmax // {_CARD_B} + 1) AS bucket,
         CAST(SUM(e.cnt * o.cnt) AS BIGINT) AS actual_rows
  FROM ek e JOIN ok o ON e.k = o.k, km
  GROUP BY 1
),
est AS (
  SELECT COALESCE(e.bucket, o.bucket) AS bucket,
         COALESCE(e.n1, 0) AS n1, COALESCE(e.d1, 0) AS d1,
         COALESCE(o.n2, 0) AS n2, COALESCE(o.d2, 0) AS d2,
         CASE WHEN e.bucket IS NULL OR o.bucket IS NULL THEN 0
              ELSE CAST(CAST(e.n1 AS HUGEINT) * o.n2
                        // GREATEST(e.d1, o.d2) AS BIGINT) END AS est_rows
  FROM eb e FULL OUTER JOIN ob o ON e.bucket = o.bucket
)
SELECT CAST(s.bucket AS BIGINT) AS bucket,
       s.n1 AS n_events, s.d1 AS d_events,
       s.n2 AS n_orders, s.d2 AS d_orders,
       s.est_rows,
       CAST(COALESCE(a.actual_rows, 0) AS BIGINT) AS actual_rows,
       CASE WHEN s.est_rows > 0 AND COALESCE(a.actual_rows, 0) > 0
            THEN CAST(CAST(GREATEST(s.est_rows, a.actual_rows) AS HUGEINT)
                      * 1000 // LEAST(s.est_rows, a.actual_rows) AS BIGINT)
            ELSE NULL END AS qerr_fp3
FROM est s LEFT JOIN act a ON s.bucket = a.bucket
""",
)
def q_join_cardinality_estimate(spark, sf_dir):
    """Histogram-based join-size estimation vs ground truth (module
    docstring): per key-range bucket, est = n1·n2 div max(d1,d2) from the
    per-side (rows, distinct) statistics; actual from the per-key count
    join; q-error = max/min as fp3 integer division. The per-key count
    frames (ek/ok) are each ONE map-side-combined aggregate; the truth join
    runs at key grain (150/1500 keys here), never row×row."""
    ev = T(spark, sf_dir, "events")
    o = T(spark, sf_dir, "orders")
    # per-key count frames: consumers = key-max probe, bucket statistics,
    # and the ground-truth join — persist so each side aggregates once
    ek = (
        ev.groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .transform(persisted)
    )
    ok = (
        o.groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .transform(persisted)
    )
    km = (
        ek.select(F.max("k").alias("m1"))
        .crossJoin(ok.select(F.max("k").alias("m2")))
        .select(F.greatest("m1", "m2").cast("bigint").alias("kmax"))
    )
    wexpr = f"(kmax div {_CARD_B} + 1)"
    eb = (
        ek.crossJoin(F.broadcast(km))
        .groupBy(F.expr(f"k div {wexpr}").alias("bucket"))
        .agg(
            F.sum("cnt").cast("bigint").alias("n1"),
            F.count(F.lit(1)).cast("bigint").alias("d1"),
        )
    )
    ob = (
        ok.crossJoin(F.broadcast(km))
        .groupBy(F.expr(f"k div {wexpr}").alias("bucket"))
        .agg(
            F.sum("cnt").cast("bigint").alias("n2"),
            F.count(F.lit(1)).cast("bigint").alias("d2"),
        )
    )
    act = (
        ek.join(ok.select(F.col("k"), F.col("cnt").alias("ocnt")), "k")
        .crossJoin(F.broadcast(km))
        .groupBy(F.expr(f"k div {wexpr}").alias("bucket"))
        .agg(
            F.sum(F.col("cnt") * F.col("ocnt"))
            .cast("bigint")
            .alias("actual_rows")
        )
    )
    est = (
        eb.join(ob, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n1", F.lit(0)).alias("n1"),
            F.coalesce("d1", F.lit(0)).alias("d1"),
            F.coalesce("n2", F.lit(0)).alias("n2"),
            F.coalesce("d2", F.lit(0)).alias("d2"),
        )
        .withColumn(
            "est_rows",
            F.when(
                (F.col("d1") == 0) | (F.col("d2") == 0), F.lit(0)
            ).otherwise(
                F.expr(
                    "CAST(CAST(n1 AS DECIMAL(38,0)) * n2"
                    " div GREATEST(d1, d2) AS BIGINT)"
                )
            ),
        )
    )
    out = est.join(act, "bucket", "left").select(
        F.col("bucket").cast("bigint").alias("bucket"),
        F.col("n1").alias("n_events"),
        F.col("d1").alias("d_events"),
        F.col("n2").alias("n_orders"),
        F.col("d2").alias("d_orders"),
        "est_rows",
        F.coalesce("actual_rows", F.lit(0))
        .cast("bigint")
        .alias("actual_rows"),
    )
    return out.withColumn(
        "qerr_fp3",
        F.when(
            (F.col("est_rows") > 0) & (F.col("actual_rows") > 0),
            F.expr(
                "CAST(CAST(GREATEST(est_rows, actual_rows) AS DECIMAL(38,0))"
                " * 1000 div LEAST(est_rows, actual_rows) AS BIGINT)"
            ),
        ),
    )


_ENC_FILE_W = 512  # orders per simulated file (runs are per-file, parallel)


@register(
    "q_encoding_advisor",
    oracle=f"""
WITH src AS (
  SELECT l_orderkey, l_linenumber,
         l_returnflag AS v_flag,
         CAST(CAST(l_quantity AS BIGINT) AS VARCHAR) AS v_qty,
         CAST(CAST(floor(l_extendedprice * 100) AS BIGINT) AS VARCHAR) AS v_price,
         CAST(l_linenumber AS VARCHAR) AS v_line
  FROM lineitem
),
stacked AS (
  SELECT col, val, width, l_orderkey, l_linenumber FROM (
    SELECT 'l_returnflag' AS col, v_flag AS val,
           CAST(strlen(v_flag) AS BIGINT) AS width,
           l_orderkey, l_linenumber FROM src
    UNION ALL
    SELECT 'l_quantity', v_qty, 8, l_orderkey, l_linenumber FROM src
    UNION ALL
    SELECT 'l_extendedprice', v_price, 8, l_orderkey, l_linenumber FROM src
    UNION ALL
    SELECT 'l_linenumber', v_line, 4, l_orderkey, l_linenumber FROM src
  ) u
),
runs AS (
  SELECT col, val, width,
         -- (l_orderkey, l_linenumber) is not unique in the synthetic
         -- lineitem; appending val makes run counting order-deterministic
         -- (remaining ties have EQUAL values, so run starts are invariant)
         CASE WHEN val IS DISTINCT FROM
                   LAG(val) OVER (PARTITION BY col, l_orderkey // {_ENC_FILE_W}
                                  ORDER BY l_orderkey, l_linenumber, val)
              THEN 1 ELSE 0 END AS is_run_start
  FROM stacked
),
stats AS (
  SELECT col,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT val) AS BIGINT) AS d,
         CAST(SUM(width) AS BIGINT) AS plain_bytes,
         CAST(SUM(is_run_start) AS BIGINT) AS rle_runs,
         CAST(MAX(width) AS BIGINT) AS w_fixed
  FROM runs GROUP BY col
),
model AS (
  SELECT col, n, d, plain_bytes, rle_runs,
         -- dictionary: d values at fixed width + n indexes of
         -- ceil(bits/8) bytes (1 byte minimum). Index bits =
         -- ceil(log2(d+1)) = bit_length(d) = length(bin(d)) — EXACT
         -- integer in both engines (a double-precision ceil(ln/ln) can
         -- flip by 1 ulp at powers of two and change best_encoding).
         d * w_fixed + n * GREATEST(1, (CAST(length(bin(d)) AS BIGINT) + 7) // 8)
           AS dict_bytes,
         rle_runs * (w_fixed + 2) AS rle_bytes
  FROM stats
)
SELECT col, n, d, plain_bytes, dict_bytes, rle_bytes, rle_runs,
       CASE WHEN rle_bytes <= dict_bytes AND rle_bytes <= plain_bytes
            THEN 'rle'
            WHEN dict_bytes <= plain_bytes THEN 'dictionary'
            ELSE 'plain' END AS best_encoding
FROM model
""",
)
def q_encoding_advisor(spark, sf_dir):
    """Columnar-encoding advisor: for four lineitem columns, estimate the
    at-rest bytes under PLAIN (Σ widths), DICTIONARY (d·width + n
    bit-packed indexes, byte-rounded), and RLE (runs·(width+2)) from ONE
    stacked scan, and pick the cheapest — the decision a parquet writer
    makes per column chunk, exposed as a query so a layout job can see WHY
    (`l_returnflag` dictionary/RLE-encodes at ~1/8th plain; near-unique
    `l_extendedprice` doesn't). Run counting is PER SIMULATED FILE
    (orderkey div {w}) in writer order, so the window parallelizes per
    (column, file) exactly like the zone-map simulations; the cost model
    is first-order by design (no page headers/hybrid encoding), identical
    in both engines, all integer arithmetic.""".format(w=_ENC_FILE_W)
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").alias("v_flag"),
        F.col("l_quantity").cast("bigint").cast("string").alias("v_qty"),
        F.floor(F.col("l_extendedprice") * 100)
        .cast("bigint")
        .cast("string")
        .alias("v_price"),
        F.col("l_linenumber").cast("string").alias("v_line"),
    )
    stacked = li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(4,"
        " 'l_returnflag', v_flag, CAST(octet_length(v_flag) AS BIGINT),"
        " 'l_quantity', v_qty, CAST(8 AS BIGINT),"
        " 'l_extendedprice', v_price, CAST(8 AS BIGINT),"
        " 'l_linenumber', v_line, CAST(4 AS BIGINT)"
        ") AS (col, val, width)",
    )
    w = Window.partitionBy(
        "col", F.expr(f"l_orderkey div {_ENC_FILE_W}")
    ).orderBy("l_orderkey", "l_linenumber", "val")
    runs = stacked.select(
        "col",
        "val",
        "width",
        F.when(
            ~F.col("val").eqNullSafe(F.lag("val").over(w)), 1
        )
        .otherwise(0)
        .alias("is_run_start"),
    )
    stats = runs.groupBy("col").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("val").cast("bigint").alias("d"),
        F.sum("width").cast("bigint").alias("plain_bytes"),
        F.sum("is_run_start").cast("bigint").alias("rle_runs"),
        F.max("width").cast("bigint").alias("w_fixed"),
    )
    model = stats.select(
        "col",
        "n",
        "d",
        "plain_bytes",
        "rle_runs",
        F.expr(
            "d * w_fixed + n * GREATEST(1,"
            " (CAST(length(bin(d)) AS BIGINT) + 7) div 8)"
        ).alias("dict_bytes"),
        (F.col("rle_runs") * (F.col("w_fixed") + 2)).alias("rle_bytes"),
    )
    return model.select(
        "col",
        "n",
        "d",
        "plain_bytes",
        "dict_bytes",
        "rle_bytes",
        "rle_runs",
        F.when(
            (F.col("rle_bytes") <= F.col("dict_bytes"))
            & (F.col("rle_bytes") <= F.col("plain_bytes")),
            "rle",
        )
        .when(F.col("dict_bytes") <= F.col("plain_bytes"), "dictionary")
        .otherwise("plain")
        .alias("best_encoding"),
    )


_BAL_TASKS = 8


@register(
    "q_partition_balance_planner",
    oracle=f"""
WITH kw AS (
  SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS w
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS total FROM kw),
planned AS (
  SELECT k, w,
         -- range plan: task of a key = its cumulative-weight PREFIX
         -- bucket (contiguous keys, weight-balanced boundaries)
         CAST(LEAST({_BAL_TASKS} - 1,
              (SUM(w) OVER (ORDER BY k) - w) * {_BAL_TASKS} // tot.total)
              AS BIGINT) AS range_task,
         -- hash plan: weight-blind Knuth multiplicative hash
         CAST((k * 2654435761 % 4294967296) % {_BAL_TASKS} AS BIGINT)
           AS hash_task
  FROM kw, tot
),
loads AS (
  SELECT 'range' AS strategy, range_task AS task,
         CAST(SUM(w) AS BIGINT) AS load, CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM planned GROUP BY 2
  UNION ALL
  SELECT 'hash', hash_task, CAST(SUM(w) AS BIGINT), CAST(COUNT(*) AS BIGINT)
  FROM planned GROUP BY 2
)
SELECT l.strategy, l.task, l.load, l.n_keys,
       CAST(MAX(l.load) OVER (PARTITION BY l.strategy) * {_BAL_TASKS}
            * 1000000 // tot.total AS BIGINT) AS imbalance_fp6
FROM loads l, tot
""",
)
def q_partition_balance_planner(spark, sf_dir):
    """Weight-aware range-partition planning vs weight-blind hashing: from
    the per-key weight histogram, assign contiguous key ranges at
    cumulative-weight boundaries (what repartitionByRange's sampler
    approximates — here exact) and compare per-task loads against a
    multiplicative-hash assignment. `imbalance_fp6` = max task load over
    the perfect share — the number that predicts straggler tasks before a
    shuffle runs, feeding the plain/salted/broadcast decision the same way
    q_key_skew_profile feeds joins. One key-histogram aggregate; planning
    runs on the key frame (windows over |keys|)."""
    kw = (
        T(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
        .transform(persisted)  # key frame; consumers: totals + planning
    )
    tot = kw.agg(F.sum("w").cast("bigint").alias("total"))
    # two-phase prefix weights: the key frame grows with distinct users, so
    # the cumulative-weight boundary assignment runs as bucketed windows,
    # never an Exchange SinglePartition over the key frame
    from .twophase import global_cumsums

    cumw = global_cumsums(kw, ["k"], {"cw": ("w", "excl")})
    planned = cumw.crossJoin(F.broadcast(tot)).select(
        "k",
        "w",
        F.least(
            F.lit(_BAL_TASKS - 1).cast("bigint"),
            F.expr(f"cw * {_BAL_TASKS} div total").cast("bigint"),
        )
        .cast("bigint")
        .alias("range_task"),
        F.expr(
            f"CAST((k * 2654435761 % 4294967296) % {_BAL_TASKS} AS BIGINT)"
        ).alias("hash_task"),
    )
    loads = (
        planned.groupBy(F.col("range_task").alias("task"))
        .agg(
            F.sum("w").cast("bigint").alias("load"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        )
        .select(F.lit("range").alias("strategy"), "task", "load", "n_keys")
        .unionByName(
            planned.groupBy(F.col("hash_task").alias("task"))
            .agg(
                F.sum("w").cast("bigint").alias("load"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            )
            .select(F.lit("hash").alias("strategy"), "task", "load", "n_keys")
        )
    )
    ws = Window.partitionBy("strategy")
    return loads.crossJoin(F.broadcast(tot)).select(
        "strategy",
        "task",
        "load",
        "n_keys",
        F.expr(
            f"CAST(MAX(load) OVER (PARTITION BY strategy) * {_BAL_TASKS}"
            " * 1000000 div total AS BIGINT)"
        ).alias("imbalance_fp6"),
    )


_SEL_B = 16  # equi-depth histogram buckets
_SEL_QS = (1, 2, 3, 4, 5, 6, 7)  # predicate literals at q/8 of the range


@register(
    "q_selectivity_estimate",
    oracle=f"""
WITH vals AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1
),
cum AS (
  SELECT v, cnt, SUM(cnt) OVER (ORDER BY v) AS c
  FROM vals
),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(MIN(v) AS BIGINT) AS vmin,
         CAST(MAX(v) AS BIGINT) AS vmax
  FROM vals
),
-- equi-depth boundary of bucket k = smallest value whose cumulative count
-- reaches (k+1)·n/16 (exact rank cut on the distinct-value frame)
bounds AS (
  SELECT k,
         (SELECT MIN(v) FROM cum, tot WHERE c * {_SEL_B} >= (k + 1) * tot.n)
           AS hi
  FROM (SELECT unnest(range(0, {_SEL_B})) AS k)
),
buckets AS (
  SELECT k, hi,
         COALESCE(LAG(hi) OVER (ORDER BY k), (SELECT vmin - 1 FROM tot))
           AS lo,
         (SELECT MAX(c) FROM cum WHERE v <= hi) AS cum_hi
  FROM bounds
),
b2 AS (
  SELECT k, lo, hi, cum_hi,
         cum_hi - COALESCE(LAG(cum_hi) OVER (ORDER BY k), 0) AS n_b
  FROM buckets
),
preds AS (
  SELECT q, CAST(tot.vmin + (tot.vmax - tot.vmin) * q // 8 AS BIGINT) AS lit
  FROM (SELECT unnest(range(1, 8)) AS q), tot
),
est AS (
  SELECT p.q, p.lit,
         CAST(b.cum_hi - b.n_b
              + CAST(b.n_b AS HUGEINT) * (p.lit - b.lo) // (b.hi - b.lo)
              AS BIGINT) AS est_rows
  FROM preds p JOIN b2 b ON p.lit > b.lo AND p.lit <= b.hi
),
act AS (
  SELECT p.q, CAST(COALESCE(MAX(c.c), 0) AS BIGINT) AS actual_rows
  FROM preds p LEFT JOIN cum c ON c.v <= p.lit
  GROUP BY p.q
)
SELECT e.q AS pred_idx, e.lit AS lit_cents, e.est_rows, a.actual_rows,
       CASE WHEN e.est_rows > 0 AND a.actual_rows > 0
            THEN CAST(CAST(GREATEST(e.est_rows, a.actual_rows) AS HUGEINT)
                 * 1000 // LEAST(e.est_rows, a.actual_rows) AS BIGINT)
            ELSE NULL END AS qerr_fp3
FROM est e JOIN act a ON e.q = a.q
""",
)
def q_selectivity_estimate(spark, sf_dir):
    """Range-selectivity estimation audit — the scan-side companion of
    q_join_cardinality_estimate: build a {b}-bucket EQUI-DEPTH histogram
    on order price cents (exact rank cuts over the distinct-value frame,
    the q_equidepth_histogram seam), estimate sel(price ≤ c) for seven
    range literals by full-buckets + uniform interpolation inside the
    straddling bucket (the System-R assumption a CBO makes), and compare
    against the TRUE cumulative count from the same distinct-value frame
    — one corpus scan total serves histogram AND ground truth. q-error
    per predicate is the optimizer-quality readout; equi-depth bounds it
    by construction (each bucket holds ≤ n/{b} rows, so interpolation
    can't be off by more than a bucket).

    Exactness: boundaries, bucket counts, and actuals are integers from
    cumulative sums; interpolation is one HUGEINT/DECIMAL(38,0) integer
    cross-multiplication.""".format(b=_SEL_B)
    o = T(spark, sf_dir, "orders")
    vals = o.groupBy(
        F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    vals = vals.transform(persisted)  # distinct-value frame; consumers:
    # cumulative frame, totals, boundary probes, ground truth
    # two-phase cumulative histogram: the distinct-value frame grows with
    # the order count, so the CDF runs as bucketed windows (one parallel
    # shuffle), never an Exchange SinglePartition over the value frame
    from .twophase import global_cumsums

    cum = (
        global_cumsums(vals, ["v"], {"c": ("cnt", "incl")})
        .select("v", "cnt", "c")
        .transform(persisted)
    )
    tot = vals.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.min("v").cast("bigint").alias("vmin"),
        F.max("v").cast("bigint").alias("vmax"),
    )
    ks = spark.range(_SEL_B).select(F.col("id").cast("bigint").alias("k"))
    bounds = (
        ks.crossJoin(F.broadcast(tot))
        .join(
            cum.select(F.col("v").alias("hv"), F.col("c").alias("hc")),
            F.expr(f"hc * {_SEL_B} >= (k + 1) * n"),
        )
        .groupBy("k")
        .agg(F.min("hv").cast("bigint").alias("hi"))
    )
    # bounded cardinality: `k` indexes the equi-depth buckets — exactly
    # _SEL_B rows (a module constant), never data-sized
    wk = Window.orderBy("k")
    vmin_m1 = tot.select((F.col("vmin") - 1).alias("vm1"))
    buckets = (
        bounds.crossJoin(F.broadcast(vmin_m1))
        .select(
            "k",
            "hi",
            F.coalesce(F.lag("hi").over(wk), F.col("vm1")).alias("lo"),
        )
        .join(
            cum.select(F.col("v").alias("cv"), F.col("c").alias("cc")),
            F.col("cv") <= F.col("hi"),
        )
        .groupBy("k", "hi", "lo")
        .agg(F.max("cc").cast("bigint").alias("cum_hi"))
    )
    b2 = buckets.select(
        "k",
        "lo",
        "hi",
        "cum_hi",
        (
            F.col("cum_hi")
            - F.coalesce(F.lag("cum_hi").over(wk), F.lit(0))
        ).alias("n_b"),
    )
    qs = spark.range(1, 8).select(F.col("id").cast("bigint").alias("q"))
    preds = qs.crossJoin(F.broadcast(tot)).select(
        "q",
        F.expr("CAST(vmin + (vmax - vmin) * q div 8 AS BIGINT)").alias("lit"),
    )
    est = preds.join(
        F.broadcast(b2),
        (F.col("lit") > F.col("lo")) & (F.col("lit") <= F.col("hi")),
    ).select(
        "q",
        "lit",
        F.expr(
            "CAST(cum_hi - n_b + CAST(n_b AS DECIMAL(38,0)) * (lit - lo)"
            " div (hi - lo) AS BIGINT)"
        ).alias("est_rows"),
    )
    act = (
        preds.join(
            cum.select(F.col("v").alias("av"), F.col("c").alias("ac")),
            F.col("av") <= F.col("lit"),
            "left",
        )
        .groupBy("q")
        .agg(F.coalesce(F.max("ac"), F.lit(0)).cast("bigint").alias("actual_rows"))
    )
    return est.join(act, "q").select(
        F.col("q").alias("pred_idx"),
        F.col("lit").alias("lit_cents"),
        "est_rows",
        "actual_rows",
        F.when(
            (F.col("est_rows") > 0) & (F.col("actual_rows") > 0),
            F.expr(
                "CAST(CAST(GREATEST(est_rows, actual_rows) AS DECIMAL(38,0))"
                " * 1000 div LEAST(est_rows, actual_rows) AS BIGINT)"
            ),
        ).alias("qerr_fp3"),
    )


_JOA_SEG = "BUILDING"


@register(
    "q_join_order_advisor",
    oracle=f"""
WITH cf AS (
  SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS ccnt
  FROM customer WHERE c_mktsegment = '{_JOA_SEG}' GROUP BY 1
),
lk AS (
  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS lcnt
  FROM lineitem GROUP BY 1
),
ov AS (SELECT o_orderkey, o_custkey FROM orders),
so AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_o,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d_ock,
         CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS d_ook
  FROM ov
),
sc AS (SELECT CAST(COALESCE(SUM(ccnt), 0) AS BIGINT) AS n_c,
              CAST(COUNT(*) AS BIGINT) AS d_c FROM cf),
sl AS (SELECT CAST(COALESCE(SUM(lcnt), 0) AS BIGINT) AS n_l,
              CAST(COUNT(*) AS BIGINT) AS d_lok FROM lk),
aoc AS (
  SELECT CAST(COALESCE(SUM(oc.ocnt * cf.ccnt), 0) AS BIGINT) AS act_oc
  FROM (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS ocnt
        FROM ov GROUP BY 1) oc
  JOIN cf ON oc.k = cf.k
),
aol AS (
  SELECT CAST(COALESCE(SUM(lk.lcnt), 0) AS BIGINT) AS act_ol
  FROM ov JOIN lk ON ov.o_orderkey = lk.k
),
fin AS (
  SELECT CAST(COALESCE(SUM(cf.ccnt * lk.lcnt), 0) AS BIGINT) AS final_rows
  FROM ov JOIN lk ON ov.o_orderkey = lk.k
          JOIN cf ON ov.o_custkey = cf.k
),
est AS (
  -- product in HUGEINT (int128): n_o*n_l wraps int64 at ~sf1000, and
  -- DuckDB DECIMAL `//` ROUNDS — HUGEINT `//` truncates like Spark's
  -- decimal IntegralDivide (ADVICE r10 #4)
  SELECT CAST(so.n_o AS HUGEINT) * sc.n_c
           // GREATEST(GREATEST(so.d_ock, sc.d_c), 1) AS est_oc,
         CAST(so.n_o AS HUGEINT) * sl.n_l
           // GREATEST(GREATEST(so.d_ook, sl.d_lok), 1) AS est_ol,
         so.n_o, so.d_ock, so.d_ook, sc.n_c, sc.d_c, sl.n_l, sl.d_lok
  FROM so, sc, sl
)
SELECT e.n_o, e.n_c, e.n_l, e.d_ock, e.d_c, e.d_ook, e.d_lok,
       CAST(e.est_oc AS BIGINT) AS est_oc,
       a1.act_oc,
       CAST(GREATEST(e.est_oc, a1.act_oc) * 1000
            // GREATEST(LEAST(e.est_oc, a1.act_oc), 1) AS BIGINT)
         AS qerr_oc_fp3,
       CAST(e.est_ol AS BIGINT) AS est_ol,
       a2.act_ol,
       CAST(GREATEST(e.est_ol, a2.act_ol) * 1000
            // GREATEST(LEAST(e.est_ol, a2.act_ol), 1) AS BIGINT)
         AS qerr_ol_fp3,
       CASE WHEN e.est_oc <= e.est_ol THEN 'customer_first'
            ELSE 'lineitem_first' END AS chosen_order,
       CAST(CASE WHEN e.est_oc <= e.est_ol
                 THEN CASE WHEN a1.act_oc <= a2.act_ol THEN 1 ELSE 0 END
                 ELSE CASE WHEN a2.act_ol <= a1.act_oc THEN 1 ELSE 0 END
            END AS BIGINT) AS advisor_correct,
       f.final_rows
FROM est e, aoc a1, aol a2, fin f
""",
)
def q_join_order_advisor(spark, sf_dir):
    """CBO CLOSURE (VERDICT r09 #5): estimate → plan → audit, in one
    hash-oracled query. For the 3-table join σ(customer) ⋈ orders ⋈
    lineitem, the two left-deep orders differ in their FIRST intermediate:

    * customer_first: |orders ⋈ σ(customer)| — estimated n_o·n_c /
      max(d_ock, d_c) (Selinger 1979 uniformity + containment);
    * lineitem_first: |orders ⋈ lineitem| — estimated n_o·n_l /
      max(d_ook, d_lok).

    The advisor CHOOSES the order with the smaller estimated intermediate
    (the System-R criterion — intermediate size is the dominated cost),
    then EXECUTES BOTH intermediates to get true cardinalities and audits
    each estimate's q-error (Moerkotte 2009, max(est,act)/min(est,act) as
    fp3 integer division) plus `advisor_correct` = did the chosen order's
    ACTUAL intermediate come out smaller — a measured cross-engine value,
    not a pinned verdict. The final join result (identical under both
    orders) is executed along the chosen shape and emitted as final_rows.

    Scale shape: statistics are three metadata-sized aggregates over the
    persisted per-key count frames; the ground-truth joins run at KEY
    GRAIN (Σ n_a(k)·n_b(k) over per-key counts — the
    q_join_cardinality_estimate discipline), never row×row; the deliberate
    expensive part IS the validation, which a production CBO runs offline
    on samples. All estimates, actuals, and q-errors are exact integers."""
    c = T(spark, sf_dir, "customer")
    o = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    cf = (
        c.filter(F.col("c_mktsegment") == _JOA_SEG)
        .groupBy(F.col("c_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("ccnt"))
        .transform(persisted)  # consumers: stats, act_oc, final
    )
    lk = (
        li.groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("lcnt"))
        .transform(persisted)  # consumers: stats, act_ol, final
    )
    ov = o.select("o_orderkey", "o_custkey").transform(persisted)
    so = ov.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_o"),
        F.countDistinct("o_custkey").cast("bigint").alias("d_ock"),
        F.countDistinct("o_orderkey").cast("bigint").alias("d_ook"),
    )
    sc = cf.agg(
        F.coalesce(F.sum("ccnt"), F.lit(0)).cast("bigint").alias("n_c"),
        F.count(F.lit(1)).cast("bigint").alias("d_c"),
    )
    sl = lk.agg(
        F.coalesce(F.sum("lcnt"), F.lit(0)).cast("bigint").alias("n_l"),
        F.count(F.lit(1)).cast("bigint").alias("d_lok"),
    )
    aoc = (
        ov.groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("ocnt"))
        .join(cf, "k")
        .agg(
            F.coalesce(F.sum(F.col("ocnt") * F.col("ccnt")), F.lit(0))
            .cast("bigint")
            .alias("act_oc")
        )
    )
    ovl = ov.join(
        lk.withColumnRenamed("k", "o_orderkey"), "o_orderkey"
    ).transform(persisted)  # consumers: act_ol + final (chosen shape)
    aol = ovl.agg(
        F.coalesce(F.sum("lcnt"), F.lit(0)).cast("bigint").alias("act_ol")
    )
    fin = (
        ovl.join(cf.withColumnRenamed("k", "o_custkey"), "o_custkey")
        .agg(
            F.coalesce(F.sum(F.col("ccnt") * F.col("lcnt")), F.lit(0))
            .cast("bigint")
            .alias("final_rows")
        )
    )
    est = (
        so.crossJoin(F.broadcast(sc))
        .crossJoin(F.broadcast(sl))
        .selectExpr(
            "n_o", "d_ock", "d_ook", "n_c", "d_c", "n_l", "d_lok",
            # product computed in DECIMAL(38,0): at ~sf1000 n_o*n_l ≈ 9e18
            # exceeds int64, where Spark would wrap silently but DuckDB
            # raises (ADVICE r10 #4); IntegralDivide over decimals returns
            # BIGINT, so the quotient lands back in int64 range.
            "CAST(n_o AS DECIMAL(38,0)) * n_c"
            " div GREATEST(GREATEST(d_ock, d_c), 1) AS est_oc",
            "CAST(n_o AS DECIMAL(38,0)) * n_l"
            " div GREATEST(GREATEST(d_ook, d_lok), 1) AS est_ol",
        )
    )
    return (
        est.crossJoin(F.broadcast(aoc))
        .crossJoin(F.broadcast(aol))
        .crossJoin(F.broadcast(fin))
        .selectExpr(
            "n_o", "n_c", "n_l", "d_ock", "d_c", "d_ook", "d_lok",
            "CAST(est_oc AS BIGINT) AS est_oc",
            "act_oc",
            "CAST(GREATEST(est_oc, act_oc) * 1000"
            " div GREATEST(LEAST(est_oc, act_oc), 1) AS BIGINT)"
            " AS qerr_oc_fp3",
            "CAST(est_ol AS BIGINT) AS est_ol",
            "act_ol",
            "CAST(GREATEST(est_ol, act_ol) * 1000"
            " div GREATEST(LEAST(est_ol, act_ol), 1) AS BIGINT)"
            " AS qerr_ol_fp3",
            "CASE WHEN est_oc <= est_ol THEN 'customer_first'"
            " ELSE 'lineitem_first' END AS chosen_order",
            "CAST(CASE WHEN est_oc <= est_ol"
            " THEN CASE WHEN act_oc <= act_ol THEN 1 ELSE 0 END"
            " ELSE CASE WHEN act_ol <= act_oc THEN 1 ELSE 0 END"
            " END AS BIGINT) AS advisor_correct",
            "final_rows",
        )
    )
