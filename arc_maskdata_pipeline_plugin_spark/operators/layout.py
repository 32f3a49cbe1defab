"""Multi-dimensional data layout: Z-order (Morton) clustering for data skipping.

At 100 TB the cheapest query is the one that never reads the file: parquet
row-group and file min/max statistics prune scans, but they only help on
columns the data is physically ordered by. Sorting by ONE column gives perfect
pruning on it and none on any other; interleaving the bits of two (or more)
columns into a Z-value and range-partitioning + sorting by it bounds EVERY
interleaved dimension within each file — the layout strategy behind Delta's
``OPTIMIZE ZORDER BY`` and Iceberg's sort orders.

Implementation notes:

* The interleave is pure integer bit arithmetic (shift/and/or), generated as
  an expression string — JVM whole-stage-codegen territory, zero Python in
  the hot path, and the same formula is emitted in DuckDB syntax so the
  oracle runs the identical computation.
* The write path is ``repartitionByRange(n, zval)`` (one sampling pass to
  pick range bounds + one shuffle) followed by ``sortWithinPartitions`` —
  exactly the shuffle a sorted write would pay anyway; Z-ordering changes the
  sort KEY, not the cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_sql(x: str, y: str, bits: int, dialect: str) -> str:
    """Expression string interleaving the low ``bits`` of ``x`` and ``y``
    into a Morton code: bit i of x lands at position 2i, bit i of y at 2i+1.

    Generated per dialect from the same term list so Spark and the DuckDB
    oracle compute bit-identical values. Terms are OR-free (distinct target
    bits, summed) to stay within ANSI integer arithmetic.
    """
    terms = []
    for i in range(bits):
        for col, pos in ((x, 2 * i), (y, 2 * i + 1)):
            if dialect == "spark":
                terms.append(f"shiftleft(shiftright({col}, {i}) & 1, {pos})")
            elif dialect == "duckdb":
                terms.append(f"((({col} >> {i}) & 1) << {pos})")
            else:  # pragma: no cover - caller bug
                raise ValueError(f"unknown dialect: {dialect}")
    return "(" + " + ".join(terms) + ")"


def zorder_col(x: str, y: str, bits: int) -> Column:
    """Morton code of two non-negative integer columns as a Spark column."""
    return F.expr(zorder_sql(x, y, bits, "spark")).cast("bigint")


def zorder_layout(df: DataFrame, x: str, y: str, bits: int, n_files: int) -> DataFrame:
    """Cluster ``df`` for a Z-ordered write: contiguous Z-ranges per output
    partition, rows sorted by Z within each. ``df.write.parquet`` on the
    result produces files whose min/max footer stats are tight on BOTH x and
    y — the multi-dimensional pruning layout."""
    zdf = df.withColumn("zval", zorder_col(x, y, bits))
    return zdf.repartitionByRange(n_files, "zval").sortWithinPartitions("zval")


def layout_extent_stats(df: DataFrame, x: str, y: str) -> DataFrame:
    """Per-physical-partition extent audit: min/max of both dimensions.

    Run after a layout operator to measure skipping potential — a point or
    range predicate prunes every partition whose [min,max] extent misses it.
    ``spark_partition_id()`` is evaluated post-shuffle, so the stats describe
    the actual files a write would produce.
    """
    return (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min(x).alias("x_min"),
            F.max(x).alias("x_max"),
            F.min(y).alias("y_min"),
            F.max(y).alias("y_max"),
        )
    )


# ---------------------------------------------------------------------------
# Hilbert-curve index — the locality upgrade over Morton
# ---------------------------------------------------------------------------
#
# A Z-order jump between adjacent codes can cross half the grid (the Morton
# "seam"); the Hilbert curve is fully contiguous, so equal-size code ranges
# have strictly tighter x/y extents — the reason Delta's OPTIMIZE grew a
# HILBERT option next to ZORDER. The xy2d walk is inherently sequential
# per level (each level rewrites the coordinates by the quadrant's
# symmetry), so it cannot be a single closed-form bit formula like Morton —
# instead the SAME Python loop unrolls one projection per level for BOTH
# engines: Spark gets chained ``withColumns`` (whole-stage codegen fuses
# them into one stage — still zero Python in the hot path), DuckDB gets a
# chained-CTE mirror. Expression strings are dialect-shared (CASE/&/+ parse
# identically in Spark SQL and DuckDB).


def _hilbert_level(s: int) -> dict[str, str]:
    """Expression strings for one xy2d level: quadrant digit from the s-bit
    of each coordinate, then reduce (x, y) to the sub-square with the
    quadrant's reflection/transposition. q = (3·rx) XOR ry, written
    arithmetically (3rx + ry − 2·rx·ry) to stay ANSI."""
    sm = s - 1
    rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
    return {
        "hd": f"hd + {s} * {s} * (3 * {rx} + {ry} - 2 * {rx} * {ry})",
        "hx2": (
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {sm} - (hy & {sm}) ELSE (hy & {sm}) END) "
            f"ELSE (hx & {sm}) END"
        ),
        "hy2": (
            f"CASE WHEN {ry} = 0 THEN "
            f"(CASE WHEN {rx} = 1 THEN {sm} - (hx & {sm}) ELSE (hx & {sm}) END) "
            f"ELSE (hy & {sm}) END"
        ),
    }


def hilbert_df(df: DataFrame, x: str, y: str, bits: int) -> DataFrame:
    """Add ``hval`` — the Hilbert index of non-negative integer columns
    (x, y) on the 2^bits × 2^bits grid — via one fused projection chain."""
    out = df.withColumns(
        {"hx": F.col(x), "hy": F.col(y), "hd": F.lit(0).cast("bigint")}
    )
    for i in range(bits - 1, -1, -1):
        e = _hilbert_level(1 << i)
        out = out.withColumns(
            {
                "hd": F.expr(e["hd"]).cast("bigint"),
                "hx2": F.expr(e["hx2"]),
                "hy2": F.expr(e["hy2"]),
            }
        ).withColumns({"hx": F.col("hx2"), "hy": F.col("hy2")}).drop("hx2", "hy2")
    return out.withColumn("hval", F.col("hd")).drop("hx", "hy", "hd")


def hilbert_sql_ctes(src: str, x_sql: str, y_sql: str, bits: int) -> str:
    """DuckDB chained-CTE mirror of :func:`hilbert_df`: ``h{bits}`` ends
    with columns (hx, hy, hd) plus whatever ``src`` carried (pass-through
    columns must be listed in ``src``'s projection as ``keep_*``)."""
    parts = [
        f"h AS (SELECT *, {x_sql} AS hx, {y_sql} AS hy, CAST(0 AS BIGINT) AS hd FROM {src})"
    ]
    prev = "h"
    for k, i in enumerate(range(bits - 1, -1, -1), start=1):
        e = _hilbert_level(1 << i)
        parts.append(
            f"h{k} AS (SELECT * EXCLUDE (hx, hy, hd), "
            f"CAST({e['hd']} AS BIGINT) AS hd, "
            f"{e['hx2']} AS hx, {e['hy2']} AS hy FROM {prev})"
        )
        prev = f"h{k}"
    return ",\n".join(parts)
