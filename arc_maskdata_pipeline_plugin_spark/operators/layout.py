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
