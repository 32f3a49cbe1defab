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
    # bounded cardinality: one row per candidate LAYOUT (a constant few)
    rank_w = Window.orderBy("workload_rows_scanned", "layout")
    return per_layout.select(
        "layout",
        "n_files",
        "n_predicates",
        "workload_rows_scanned",
        "workload_files_read",
        F.rank().over(rank_w).cast("bigint").alias("advisor_rank"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter file skipping: point lookups on an UNSORTED column.
# ---------------------------------------------------------------------------

_BLOOM_FILES = 64
_BLOOM_M = 1024  # bits per file
_BLOOM_H = 3  # hash functions
_BLOOM_KEYS = [3, 37, 74, 111, 148]  # inside [0, 150) at every SF


def _bloom_pos_spark(j: int, col: str) -> str:
    return (
        f"cast(conv(substring(md5(concat('bl:', '{j}', ':', "
        f"cast({col} as string))), 1, 8), 16, 10) as bigint) % {_BLOOM_M}"
    )


def _bloom_pos_duck(j: int, col: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('bl:' || '{j}' || ':' || "
        f"CAST({col} AS VARCHAR)), 1, 8)) AS BIGINT) % {_BLOOM_M}"
    )


def _bloom_oracle() -> str:
    pos_rows = " UNION ALL ".join(
        f"SELECT file_id, {_bloom_pos_duck(j, 'ck')} AS pos FROM filed"
        for j in range(_BLOOM_H)
    )
    key_rows = " UNION ALL ".join(
        " UNION ALL ".join(
            f"SELECT {k} AS k, {_bloom_pos_duck(j, str(k))} AS pos"
            for j in range(_BLOOM_H)
        )
        for k in _BLOOM_KEYS
    )
    return f"""
WITH o AS (
  SELECT o_orderkey, o_custkey AS ck,
         CAST(('0x' || substr(md5('bl-arr:' || CAST(o_orderkey AS VARCHAR)), 1, 8))
              AS BIGINT) AS arr
  FROM orders
),
filed AS (
  SELECT ck, NTILE({_BLOOM_FILES}) OVER (ORDER BY arr, o_orderkey) AS file_id
  FROM o
),
bloom AS (SELECT DISTINCT file_id, pos FROM ({pos_rows})),
zones AS (
  SELECT file_id, MIN(ck) AS zmin, MAX(ck) AS zmax FROM filed GROUP BY file_id
),
kp AS ({key_rows}),
kpd AS (SELECT DISTINCT k, pos FROM kp),
kcnt AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS c FROM kpd GROUP BY k),
bloom_pass AS (
  -- pass iff every DISTINCT position of the key is set (two of a key's
  -- hash positions may collide — requiring {_BLOOM_H} distinct matches
  -- would manufacture false negatives)
  SELECT kpd.k, bloom.file_id
  FROM kpd JOIN bloom ON kpd.pos = bloom.pos
  JOIN kcnt ON kcnt.k = kpd.k
  GROUP BY kpd.k, bloom.file_id
  HAVING COUNT(*) = MIN(kcnt.c)
),
truth AS (
  SELECT DISTINCT ck AS k, file_id FROM filed
  WHERE ck IN ({", ".join(str(k) for k in _BLOOM_KEYS)})
)
SELECT k.k AS lookup_key,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM zones z
        WHERE z.zmin <= k.k AND z.zmax >= k.k) AS n_files_zone_pass,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bloom_pass b WHERE b.k = k.k)
         AS n_files_bloom_pass,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM truth t WHERE t.k = k.k)
         AS n_files_true,
       CAST(1 AS BIGINT) AS bloom_no_false_negative_ok,
       CAST(1 AS BIGINT) AS zone_no_false_negative_ok
FROM (SELECT DISTINCT k FROM kp) k
"""


@register("q_bloom_skip_audit", oracle=_bloom_oracle())
def q_bloom_skip_audit(spark, sf_dir):
    """Bloom-filter FILE SKIPPING audit (r09) — the pruning structure zone
    maps can't provide: on an arrival-ordered (unsorted) layout every
    file's [min, max] customer extent spans nearly the whole key domain,
    so a point lookup zone-passes almost every file; a per-file Bloom
    filter ({m} bits, {h} md5-derived positions — exactly the parquet
    column bloom / Delta bloom index shape, engine-portable) passes only
    files whose bit set covers all {h} positions of the key. Per lookup
    key the audit emits files-passed under zones, under blooms, and the
    ground truth, plus two NO-FALSE-NEGATIVE verdicts — every file truly
    containing the key must bloom-pass (the theorem that makes bloom
    skipping safe: all positions of an inserted value are set) and must
    zone-pass (min/max brackets every contained value); both Spark-side
    comparisons the oracle pins. Bloom-pass is deliberately NOT pinned
    against zone-pass: a false positive can land in a file whose zone
    excludes the key (other values covering its bits), so real engines
    intersect the two prunes — the emitted counts quantify each side's
    contribution.

    Scale shape: the bloom build is one fan-out ({h}× row explode) +
    DISTINCT on (file, position) — a metadata-sized frame (≤ files × {m}
    rows) like every file-index structure; key probes are a {nk}×{h}-row
    broadcast joined against it; truth and zones are file-grain
    aggregates. The fact table is scanned once.""".format(
        m=_BLOOM_M, h=_BLOOM_H, nk=len(_BLOOM_KEYS)
    )
    from pyspark.sql import Window

    o = T(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("ck"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("bl-arr:"), F.col("o_orderkey").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("arr"),
    )
    # two-phase NTILE: the simulated-file assignment orders the whole
    # orders frame, so it runs as a parallel range shuffle + exact NTILE
    # arithmetic (plans/twophase.py), never one reducer
    from .twophase import global_ntile

    filed = global_ntile(
        o, ["arr", "o_orderkey"], _BLOOM_FILES, out="file_id"
    ).select("ck", "file_id")
    pos_structs = F.array(
        *(F.expr(_bloom_pos_spark(j, "ck")) for j in range(_BLOOM_H))
    )
    from ..cache import persisted

    filed = filed.transform(persisted)  # file-grain consumers: bloom/zones/truth
    bloom = filed.select(
        "file_id", F.explode(pos_structs).alias("pos")
    ).distinct()
    zones = filed.groupBy("file_id").agg(
        F.min("ck").alias("zmin"), F.max("ck").alias("zmax")
    )
    # the key probe set: positions computed by the SAME formula, on literals
    kpd = (
        spark.createDataFrame(
            [(k, j) for k in _BLOOM_KEYS for j in range(_BLOOM_H)],
            "k long, j int",
        )
        .select(
            "k",
            F.expr(
                "cast(conv(substring(md5(concat('bl:', cast(j as string), ':', "
                f"cast(k as string))), 1, 8), 16, 10) as bigint) % {_BLOOM_M}"
            ).alias("pos"),
        )
        .distinct()
    )
    kcnt = kpd.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    bloom_pass = (
        kpd.join(F.broadcast(kcnt), "k")
        .join(bloom, "pos")
        .groupBy("k", "file_id")
        .agg(F.count(F.lit(1)).alias("n_hit"), F.min("c").alias("c"))
        .filter(F.col("n_hit") == F.col("c"))
        .select("k", "file_id")
    )
    keys = kpd.select("k").distinct()
    truth = (
        filed.join(F.broadcast(keys.withColumnRenamed("k", "ck")), "ck", "semi")
        .select(F.col("ck").alias("k"), "file_id")
        .distinct()
    )
    zone_pass = keys.join(
        F.broadcast(zones),
        (F.col("zmin") <= F.col("k")) & (F.col("zmax") >= F.col("k")),
    ).select("k", "file_id")
    n_zone = zone_pass.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files_zone_pass")
    )
    n_bloom = bloom_pass.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files_bloom_pass")
    )
    n_true = truth.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files_true")
    )
    # no-false-negative witnesses: truth ⊆ bloom_pass and truth ⊆ zone_pass
    n_true_in_bloom = (
        truth.join(bloom_pass, ["k", "file_id"], "semi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tb"))
    )
    n_true_in_zone = (
        truth.join(zone_pass, ["k", "file_id"], "semi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_tz"))
    )
    out = (
        keys.join(n_zone, "k", "left")
        .join(n_bloom, "k", "left")
        .join(n_true, "k", "left")
        .join(n_true_in_bloom, "k", "left")
        .join(n_true_in_zone, "k", "left")
        .select(
            F.col("k").alias("lookup_key"),
            F.coalesce("n_files_zone_pass", F.lit(0))
            .cast("bigint")
            .alias("n_files_zone_pass"),
            F.coalesce("n_files_bloom_pass", F.lit(0))
            .cast("bigint")
            .alias("n_files_bloom_pass"),
            F.coalesce("n_files_true", F.lit(0))
            .cast("bigint")
            .alias("n_files_true"),
            F.when(
                F.coalesce("n_tb", F.lit(0)) == F.coalesce("n_files_true", F.lit(0)),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("bloom_no_false_negative_ok"),
            F.when(
                F.coalesce("n_tz", F.lit(0)) == F.coalesce("n_files_true", F.lit(0)),
                1,
            )
            .otherwise(0)
            .cast("bigint")
            .alias("zone_no_false_negative_ok"),
        )
    )
    return out
