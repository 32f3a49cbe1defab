"""Zone-map (min/max) file-skipping audit: what a sort layout buys.

Every lakehouse format (Parquet row groups, Delta/Iceberg file stats) prunes
files whose [min, max] column range can't intersect the predicate. How much
pruning a layout delivers is THE question behind every OPTIMIZE/sort job —
this audit answers it from the data, before running the job: simulate the
file boundaries of two layouts (date-clustered vs arrival/hash order),
build each file's zone map, and for a spectrum of range predicates report
files skipped and the read amplification (rows in scanned files vs rows
actually matching).

Companions: q_zorder_layout / q_hilbert_layout audit MULTI-column
clustering quality; q_compaction_plan sizes the rewrite; this query
quantifies the SCAN-side payoff that justifies them.

Scale shape: ONE fact scan builds both layouts' per-file zone maps in a
single stacked aggregate (2 × n_files rows); every predicate evaluates
against the file-grain frame — the fact table is never re-scanned per
predicate. The simulated boundaries are deterministic (month buckets for
the sorted layout, md5 mod 64 for arrival) so the audit is hash-oracled.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import T, register

_N_ARRIVAL_FILES = 64
# (predicate_id, lo, hi) — inclusive date-range predicates on o_orderdate
_PREDICATES = [
    ("narrow_1mo", "1997-03-01", "1997-03-31"),
    ("medium_3mo", "1996-06-01", "1996-08-31"),
    ("wide_1yr", "1998-01-01", "1998-12-31"),
]


def _zonemap_oracle() -> str:
    match_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN d >= '{lo}' AND d <= '{hi}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS match_{pid}"
        for pid, lo, hi in _PREDICATES
    )
    pred_rows = " UNION ALL ".join(
        f"SELECT '{pid}' AS predicate, DATE '{lo}' AS lo, DATE '{hi}' AS hi"
        for pid, lo, hi in _PREDICATES
    )
    match_pick = " ".join(
        f"WHEN p.predicate = '{pid}' THEN z.match_{pid}" for pid, _, _ in _PREDICATES
    )
    return f"""
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 12
           + CAST(strftime(o_orderdate, '%m') AS BIGINT) AS file_sorted,
         CAST(('0x' || substr(md5('file:' || CAST(o_orderkey AS VARCHAR)), 1, 8))
              AS BIGINT) % {_N_ARRIVAL_FILES} AS file_arrival
  FROM orders
),
long AS (
  SELECT 'sorted' AS layout, file_sorted AS file_id, d FROM o
  UNION ALL
  SELECT 'arrival' AS layout, file_arrival AS file_id, d FROM o
),
zones AS (
  SELECT layout, file_id,
         MIN(d) AS zmin, MAX(d) AS zmax,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         {match_cols}
  FROM long GROUP BY layout, file_id
),
preds AS ({pred_rows}),
eval AS (
  SELECT z.layout, p.predicate, z.n_rows,
         CASE WHEN z.zmax < p.lo OR z.zmin > p.hi THEN 1 ELSE 0 END AS skipped,
         CASE {match_pick} END AS n_match
  FROM zones z CROSS JOIN preds p
)
SELECT layout, predicate,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(skipped) AS BIGINT) AS n_files_skipped,
       CAST(SUM(CASE WHEN skipped = 0 THEN n_rows ELSE 0 END) AS BIGINT)
         AS n_rows_scanned,
       CAST(SUM(n_match) AS BIGINT) AS n_rows_matching,
       CAST(floor(SUM(skipped) * 1000000.0 / COUNT(*)) AS BIGINT)
         AS skip_pct_fp6
FROM eval
GROUP BY layout, predicate
"""


@register("q_zonemap_skip_audit", oracle=_zonemap_oracle())
def q_zonemap_skip_audit(spark, sf_dir):
    """Per (layout, predicate): files skipped by the zone map and the rows
    the survivors force you to scan (module docstring). The date-clustered
    layout should skip nearly everything outside the range; the arrival
    layout's zone maps all straddle the predicate and skip ~nothing — the
    measured difference is the sort job's ROI."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"),
        (
            F.year("o_orderdate").cast("bigint") * 12
            + F.month("o_orderdate").cast("bigint")
        ).alias("file_sorted"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("file:"), F.col("o_orderkey").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % _N_ARRIVAL_FILES
        ).alias("file_arrival"),
    )
    long = o.selectExpr(
        "stack(2, 'sorted', file_sorted, 'arrival', file_arrival)"
        " AS (layout, file_id)",
        "d",
    )
    match_aggs = [
        F.sum(
            F.when(
                (F.col("d") >= F.lit(lo)) & (F.col("d") <= F.lit(hi)), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias(f"match_{pid}")
        for pid, lo, hi in _PREDICATES
    ]
    zones = long.groupBy("layout", "file_id").agg(
        F.min("d").alias("zmin"),
        F.max("d").alias("zmax"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *match_aggs,
    )
    preds = spark.createDataFrame(
        [(pid, lo, hi) for pid, lo, hi in _PREDICATES],
        "predicate string, lo string, hi string",
    ).select(
        "predicate", F.col("lo").cast("date").alias("lo"), F.col("hi").cast("date").alias("hi")
    )
    match_pick = F.lit(None)
    for pid, _, _ in _PREDICATES:
        match_pick = F.when(
            F.col("predicate") == pid, F.col(f"match_{pid}")
        ).otherwise(match_pick)
    ev = zones.crossJoin(F.broadcast(preds)).select(
        "layout",
        "predicate",
        "n_rows",
        F.when((F.col("zmax") < F.col("lo")) | (F.col("zmin") > F.col("hi")), 1)
        .otherwise(0)
        .alias("skipped"),
        match_pick.alias("n_match"),
    )
    return ev.groupBy("layout", "predicate").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("skipped").cast("bigint").alias("n_files_skipped"),
        F.sum(F.when(F.col("skipped") == 0, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_scanned"),
        F.sum("n_match").cast("bigint").alias("n_rows_matching"),
        F.floor(F.sum("skipped") * 1_000_000.0 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("skip_pct_fp6"),
    )


@register(
    "q_partition_fingerprint_diff",
    oracle="""
WITH base AS (
  SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) * 100
           + CAST(strftime(o_orderdate, '%m') AS BIGINT) AS part_month,
         o_orderkey, o_custkey, o_orderstatus,
         strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d,
         o_orderpriority,
         CASE WHEN o_orderkey % 7 = 0 THEN 'X-SIM' ELSE o_orderpriority END
           AS new_priority
  FROM orders
),
fp AS (
  SELECT part_month,
         CASE WHEN o_orderkey % 10 <> 0 THEN
           CAST(('0x' || substr(md5(
               CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
               || '|' || o_orderstatus || '|' || d || '|' || o_orderpriority),
               1, 12)) AS BIGINT)
         END AS fp_old,
         CAST(('0x' || substr(md5(
             CAST(o_orderkey AS VARCHAR) || '|' || CAST(o_custkey AS VARCHAR)
             || '|' || o_orderstatus || '|' || d || '|' || new_priority),
             1, 12)) AS BIGINT) AS fp_new
  FROM base
)
SELECT part_month,
       CAST(COUNT(fp_old) AS BIGINT) AS n_old,
       CAST(COUNT(fp_new) AS BIGINT) AS n_new,
       CAST(COALESCE(SUM(fp_old), 0) AS VARCHAR) AS checksum_old,
       CAST(COALESCE(SUM(fp_new), 0) AS VARCHAR) AS checksum_new,
       CAST(CASE WHEN COUNT(fp_old) <> COUNT(fp_new)
                   OR COALESCE(SUM(fp_old), 0) <> COALESCE(SUM(fp_new), 0)
                 THEN 1 ELSE 0 END AS BIGINT) AS changed
FROM fp
GROUP BY part_month
""",
)
def q_partition_fingerprint_diff(spark, sf_dir):
    """Partition-grain change detection between two table snapshots — the
    primitive that makes downstream ETL INCREMENTAL: re-process only
    partitions whose order-insensitive checksum moved. Old snapshot =
    orders minus every 10th key; new snapshot additionally rewrites the
    priority of every 7th key (simulated upsert batch). Both snapshots'
    fingerprints compute from ONE scan as conditional 48-bit row-hash sums
    per month partition (the q_table_fingerprint machinery at partition
    grain) — at 100 TB the old side is a standing per-partition checksum
    table and only the new batch is hashed."""
    o = T(spark, sf_dir, "orders")
    month = (
        F.year("o_orderdate").cast("bigint") * 100
        + F.month("o_orderdate").cast("bigint")
    ).alias("part_month")
    d = F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
    new_priority = F.when(
        F.col("o_orderkey") % 7 == 0, F.lit("X-SIM")
    ).otherwise(F.col("o_orderpriority"))

    def canon(prio):
        return F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            d,
            prio,
        )

    fp48 = lambda c: F.conv(F.substring(F.md5(c), 1, 12), 16, 10).cast(  # noqa: E731
        "decimal(38,0)"
    )
    fp = o.select(
        month,
        F.when(F.col("o_orderkey") % 10 != 0, fp48(canon(F.col("o_orderpriority"))))
        .alias("fp_old"),
        fp48(canon(new_priority)).alias("fp_new"),
    )
    return fp.groupBy("part_month").agg(
        F.count("fp_old").cast("bigint").alias("n_old"),
        F.count("fp_new").cast("bigint").alias("n_new"),
        F.coalesce(F.sum("fp_old"), F.lit(0)).cast("string").alias("checksum_old"),
        F.coalesce(F.sum("fp_new"), F.lit(0)).cast("string").alias("checksum_new"),
        F.when(
            (F.count("fp_old") != F.count("fp_new"))
            | (
                F.coalesce(F.sum("fp_old"), F.lit(0))
                != F.coalesce(F.sum("fp_new"), F.lit(0))
            ),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("changed"),
    )


# ---------------------------------------------------------------------------
# Layout ADVISOR: rank candidate sort keys over a mixed predicate workload.
# ---------------------------------------------------------------------------

_ADV_FILES = 64
# mixed workload: (predicate_id, column, lo, hi) — inclusive ranges; the
# priority predicate is an equality (lo == hi)
_ADV_PREDICATES = [
    ("date_q1_1994", "d", "'1994-01-01'", "'1994-03-31'"),
    ("date_h2_1996", "d", "'1996-07-01'", "'1996-12-31'"),
    ("price_top", "cents", "30000000", "99999999999"),
    ("prio_urgent", "prio", "'1-URGENT'", "'1-URGENT'"),
    ("cust_range", "ck", "100", "500"),
]
# r09 (VERDICT r08 next-round #4): the advisor's candidate set now includes
# a two-key COMPOSITE sort (date major, customer minor — packed into one
# bigint sort value: date << 30 | ck's low 30 bits) and the MORTON layout
# from q_zorder_layout (10-bit interleave of customer and days-since-1992,
# both masked to 1023 — the same engine-portable formula, including its
# documented day-mask wrap).
_ADV_LAYOUTS = ["bydate", "byprice", "bycust", "arrival", "datecust", "zorder"]

_ADV_Z_BITS = 10


def _advisor_oracle() -> str:
    from ..operators.layout import zorder_sql

    zx = "(ck & 1023)"
    zy = "(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) & 1023)"
    sort_val = {
        "bydate": "CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT)",
        "byprice": "cents",
        "bycust": "ck",
        "arrival": f"CAST(('0x' || substr(md5('adv:' || CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)",
        "datecust": "(CAST(strftime(o_orderdate, '%Y%m%d') AS BIGINT) << 30)"
        " + (ck & 1073741823)",
        "zorder": zorder_sql(zx, zy, _ADV_Z_BITS, "duckdb"),
    }
    long_rows = " UNION ALL ".join(
        f"SELECT '{lay}' AS layout, {sv} AS sort_val, o_orderkey, d, cents, prio, ck FROM o"
        for lay, sv in sort_val.items()
    )
    scanned = " + ".join(
        f"SUM(CASE WHEN NOT (zmax_{col} < {lo} OR zmin_{col} > {hi}) THEN n_rows ELSE 0 END)"
        for _, col, lo, hi in _ADV_PREDICATES
    )
    files_read = " + ".join(
        f"SUM(CASE WHEN NOT (zmax_{col} < {lo} OR zmin_{col} > {hi}) THEN 1 ELSE 0 END)"
        for _, col, lo, hi in _ADV_PREDICATES
    )
    return f"""
WITH o AS (
  SELECT o_orderkey,
         strftime(o_orderdate, '%Y-%m-%d') AS d,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         o_orderpriority AS prio,
         o_custkey AS ck,
         o_orderdate, o_totalprice
  FROM orders
),
long AS ({long_rows}),
filed AS (
  SELECT layout, d, cents, prio, ck,
         NTILE({_ADV_FILES}) OVER (PARTITION BY layout
                                   ORDER BY sort_val, o_orderkey) AS file_id
  FROM long
),
zones AS (
  SELECT layout, file_id,
         MIN(d) AS zmin_d, MAX(d) AS zmax_d,
         MIN(cents) AS zmin_cents, MAX(cents) AS zmax_cents,
         MIN(prio) AS zmin_prio, MAX(prio) AS zmax_prio,
         MIN(ck) AS zmin_ck, MAX(ck) AS zmax_ck,
         CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM filed GROUP BY layout, file_id
),
per_layout AS (
  SELECT layout,
         CAST(COUNT(*) AS BIGINT) AS n_files,
         CAST({len(_ADV_PREDICATES)} AS BIGINT) AS n_predicates,
         CAST({scanned} AS BIGINT) AS workload_rows_scanned,
         CAST({files_read} AS BIGINT) AS workload_files_read
  FROM zones GROUP BY layout
)
SELECT layout, n_files, n_predicates, workload_rows_scanned,
       workload_files_read,
       CAST(RANK() OVER (ORDER BY workload_rows_scanned, layout) AS BIGINT)
         AS advisor_rank
FROM per_layout
"""


@register("q_layout_advisor", oracle=_advisor_oracle())
def q_layout_advisor(spark, sf_dir):
    """Sort-key ADVISOR: which clustering layout minimizes scan work over a
    MIXED predicate workload (two date ranges, a price range, a priority
    equality, a customer range)? For each candidate layout the fact table
    is NTILE'd into {n} equal files on the sort key, every file's zone map
    records min/max of EVERY predicate column (exactly what Parquet/Delta/
    Iceberg file stats store — pruning works on any column, it's just only
    CORRELATED with the sort key), and each predicate keeps the files whose
    zone overlaps. ``advisor_rank`` orders layouts by total rows scanned
    across the workload — rank 1 is the OPTIMIZE job worth running. The
    decision the single-layout ``q_zonemap_skip_audit`` can't make: the
    best key depends on the workload MIX, and a date sort that wins date
    scans does nothing for the price or customer predicates.

    Scale shape: one fact scan stacked {k}× (once per candidate layout),
    one window per layout for file assignment (at 100 TB: a range
    partitioner / the sort job's own partitioning — the NTILE is the
    simulation stand-in), one file-grain aggregate; all predicate
    evaluation happens on the {k}·{n}-row zone frame. Dates travel as
    yyyy-MM-dd STRINGS end-to-end (lexicographic = chronological), so the
    zone comparisons are engine-exact.

    r09 (VERDICT r08 #4): the candidate set grew from four single-key
    layouts to six — a two-key composite sort (date major / customer
    minor, packed into one bigint) and the Morton layout from
    ``q_zorder_layout`` — so the advisor can recommend multi-column
    clustering where the workload mixes dimensions; the Z-order-wins-
    mixed-2D-workloads result is pinned on constructed data in
    tests/test_round9_ops.py.""".format(
        n=_ADV_FILES, k=len(_ADV_LAYOUTS)
    )
    from pyspark.sql import Window

    from ..operators.layout import zorder_sql
    from .registry import dec

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("cents"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_custkey").alias("ck"),
        F.date_format("o_orderdate", "yyyyMMdd").cast("bigint").alias("sv_bydate"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("adv:"), F.col("o_orderkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("sv_arrival"),
        (
            F.shiftleft(
                F.date_format("o_orderdate", "yyyyMMdd").cast("bigint"), 30
            )
            + F.col("o_custkey").bitwiseAND(F.lit(1073741823))
        ).alias("sv_datecust"),
        F.expr(
            zorder_sql(
                "(o_custkey & 1023)",
                "(datediff(cast(o_orderdate as date), date'1992-01-01') & 1023)",
                _ADV_Z_BITS,
                "spark",
            )
        )
        .cast("bigint")
        .alias("sv_zorder"),
    )
    long = o.selectExpr(
        "stack(6, 'bydate', sv_bydate, 'byprice', cents, 'bycust', ck, "
        "'arrival', sv_arrival, 'datecust', sv_datecust, 'zorder', sv_zorder) "
        "AS (layout, sort_val)",
        "o_orderkey",
        "d",
        "cents",
        "prio",
        "ck",
    )
    w = Window.partitionBy("layout").orderBy("sort_val", "o_orderkey")
    filed = long.withColumn("file_id", F.ntile(_ADV_FILES).over(w))
    zones = filed.groupBy("layout", "file_id").agg(
        F.min("d").alias("zmin_d"),
        F.max("d").alias("zmax_d"),
        F.min("cents").alias("zmin_cents"),
        F.max("cents").alias("zmax_cents"),
        F.min("prio").alias("zmin_prio"),
        F.max("prio").alias("zmax_prio"),
        F.min("ck").alias("zmin_ck"),
        F.max("ck").alias("zmax_ck"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    overlap = {
        pid: ~((F.col(f"zmax_{col}") < F.expr(lo)) | (F.col(f"zmin_{col}") > F.expr(hi)))
        for pid, col, lo, hi in _ADV_PREDICATES
    }
    scanned = None
    files_read = None
    for pid, _, _, _ in _ADV_PREDICATES:
        s = F.sum(F.when(overlap[pid], F.col("n_rows")).otherwise(0))
        fr = F.sum(F.when(overlap[pid], 1).otherwise(0))
        scanned = s if scanned is None else scanned + s
        files_read = fr if files_read is None else files_read + fr
    per_layout = zones.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.lit(len(_ADV_PREDICATES)).cast("bigint").alias("n_predicates"),
        scanned.cast("bigint").alias("workload_rows_scanned"),
        files_read.cast("bigint").alias("workload_files_read"),
    )
    rank_w = Window.orderBy("workload_rows_scanned", "layout")
    return per_layout.select(
        "layout",
        "n_files",
        "n_predicates",
        "workload_rows_scanned",
        "workload_files_read",
        F.rank().over(rank_w).cast("bigint").alias("advisor_rank"),
    )
