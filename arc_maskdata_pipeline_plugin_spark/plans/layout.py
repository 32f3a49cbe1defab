"""Data-layout queries: Z-order clustering audit for multi-dimensional skipping."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.layout import zorder_col, zorder_sql
from .registry import T, register

_BITS = 10  # 10 bits per dimension -> 20-bit Morton codes
_CLUSTER_SHIFT = 2 * _BITS - 6  # keep the top 6 bits -> 64 clusters

_DUCK_X = "(o_custkey & 1023)"
_DUCK_Y = "(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) & 1023)"
_DUCK_Z = zorder_sql(_DUCK_X, _DUCK_Y, _BITS, "duckdb")


@register(
    "q_zorder_layout",
    oracle=f"""
WITH z AS (
  SELECT {_DUCK_X} AS x, {_DUCK_Y} AS y, ({_DUCK_Z} >> {_CLUSTER_SHIFT}) AS cluster_id
  FROM orders
)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
       CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max
FROM z
GROUP BY cluster_id
""",
)
def q_zorder_layout(spark, sf_dir):
    """Z-order (Morton) clustering audit of orders on the two scan dimensions
    a warehouse prunes by — customer and order day. Each row is one Z-cluster
    (top 6 Morton bits = the file a Z-ordered write would produce) with its
    extent on BOTH dimensions; tight extents on both axes are exactly what
    makes parquet min/max footers prune 2-D predicates, where a 1-D sort
    bounds only its own column. The Morton code is pure JVM bit arithmetic
    (``operators/layout.py::zorder_sql`` — the identical formula runs in the
    DuckDB oracle); the audit itself is one map-side-combined aggregate."""
    orders = T(spark, sf_dir, "orders").select(
        (F.col("o_custkey").bitwiseAND(F.lit(1023))).alias("x"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
        .bitwiseAND(F.lit(1023))
        .alias("y"),
    )
    z = orders.withColumn("zval", zorder_col("x", "y", _BITS))
    return (
        z.withColumn(
            "cluster_id", F.shiftright("zval", _CLUSTER_SHIFT).cast("bigint")
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("x").cast("bigint").alias("x_min"),
            F.max("x").cast("bigint").alias("x_max"),
            F.min("y").cast("bigint").alias("y_min"),
            F.max("y").cast("bigint").alias("y_max"),
        )
    )


# ---------------------------------------------------------------------------
# Small-file compaction planner (the OPTIMIZE/compact shape)
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 2000  # target output-file size (chars here; bytes in prod)


@register(
    "q_compaction_plan",
    oracle=f"""
WITH inv AS (
  SELECT source, doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM documents
),
assigned AS (
  SELECT source, doc_id, n_chars,
         CAST(floor((cum - n_chars) / {_COMPACT_TARGET}) AS BIGINT) AS bin_id
  FROM inv
)
SELECT source, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS bin_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS first_id,
       CAST(MAX(doc_id) AS BIGINT) AS last_id
FROM assigned GROUP BY source, bin_id
""",
)
def q_compaction_plan(spark, sf_dir):
    """Small-file compaction planner: pack an ordered file inventory into
    target-sized output groups (the OPTIMIZE/bin-packing compaction shape;
    ``documents`` stands in as the per-partition file listing, n_chars as
    file bytes). Greedy next-fit by running size: bin = floor(cumulative
    size BEFORE this file / target) — a pure window computation, no
    driver-side loop, deterministic given the (source, doc_id) order.

    Scale shape: compaction PLANNING runs over file-listing metadata (one
    row per file, millions of rows at 100 TB — not data-sized). One shuffle
    partitions the inventory by table-partition key (source); the cumsum
    window and the bin aggregate are co-partitioned on it. The plan's
    (source, bin_id, first_id..last_id) ranges then drive the actual
    rewrite job's input splits."""
    inv = T(spark, sf_dir, "documents").select("source", "doc_id", "n_chars")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    assigned = inv.withColumn(
        "bin_id",
        F.floor((F.sum("n_chars").over(w) - F.col("n_chars")) / _COMPACT_TARGET)
        .cast("bigint"),
    )
    return assigned.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("n_chars").cast("bigint").alias("bin_bytes"),
        F.min("doc_id").cast("bigint").alias("first_id"),
        F.max("doc_id").cast("bigint").alias("last_id"),
    )


# ---------------------------------------------------------------------------
# Hilbert-curve clustering audit — the locality upgrade over Z-order
# ---------------------------------------------------------------------------

from ..operators.layout import hilbert_df, hilbert_sql_ctes  # noqa: E402


@register(
    "q_hilbert_layout",
    oracle=f"""
WITH pts AS (
  SELECT {_DUCK_X} AS x0, {_DUCK_Y} AS y0 FROM orders
),
src AS (SELECT x0, y0 FROM pts),
{hilbert_sql_ctes("src", "x0", "y0", _BITS)}
SELECT CAST(hd >> {_CLUSTER_SHIFT} AS BIGINT) AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(x0) AS BIGINT) AS x_min, CAST(MAX(x0) AS BIGINT) AS x_max,
       CAST(MIN(y0) AS BIGINT) AS y_min, CAST(MAX(y0) AS BIGINT) AS y_max
FROM h{_BITS}
GROUP BY 1
""",
)
def q_hilbert_layout(spark, sf_dir):
    """Hilbert-curve clustering audit of orders on the same two pruning
    dimensions as ``q_zorder_layout`` — the locality upgrade Delta shipped
    as ``OPTIMIZE ... HILBERT``: the Hilbert walk is fully contiguous (no
    Morton seam-jumps), so the 64 equal-code-range clusters have tighter
    x/y extents and parquet min/max footers prune better per file. The
    xy2d walk unrolls one projection per bit level from a single Python
    loop into BOTH engines (chained ``withColumns`` — whole-stage codegen
    fuses them, zero Python — and a chained-CTE DuckDB mirror,
    ``operators/layout.py::hilbert_df``/``hilbert_sql_ctes``); the audit
    itself is one map-side-combined aggregate."""
    orders = T(spark, sf_dir, "orders").select(
        (F.col("o_custkey").bitwiseAND(F.lit(1023))).alias("x0"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
        .bitwiseAND(F.lit(1023))
        .alias("y0"),
    )
    h = hilbert_df(orders.withColumns({"x": F.col("x0"), "y": F.col("y0")}), "x", "y", _BITS)
    return (
        h.withColumn(
            "cluster_id", F.shiftright("hval", _CLUSTER_SHIFT).cast("bigint")
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("x0").cast("bigint").alias("x_min"),
            F.max("x0").cast("bigint").alias("x_max"),
            F.min("y0").cast("bigint").alias("y_min"),
            F.max("y0").cast("bigint").alias("y_max"),
        )
    )
