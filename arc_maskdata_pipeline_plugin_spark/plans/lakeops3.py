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
