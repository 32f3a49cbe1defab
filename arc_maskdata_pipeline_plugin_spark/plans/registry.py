"""Named-query registry.

Every implemented operator from SURVEY.md §2 (and the large-scale extensions)
is exposed as a named query: a callable ``(spark, sf_dir) -> DataFrame`` plus,
when SQL-expressible, an ANSI-SQL oracle string DuckDB can run over the same
parquet tables. The driver hashes both results order-insensitively, so:

* every computed column is aliased IDENTICALLY in the Spark code and the SQL;
* float aggregates go through exact decimal arithmetic and are cast to DOUBLE
  at the end, so both engines produce bit-identical values regardless of
  aggregation order (doubles summed in different orders are NOT bit-stable).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class NamedQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check


REGISTRY: dict[str, NamedQuery] = {}

# TIMESTAMP_NTZ wall-clock → the same wall-clock as a UTC instant, regardless
# of spark.sql.session.timeZone: wall-clock micros since the NTZ epoch is a
# TZ-free quantity, and timestamp_micros() constructs from absolute epoch.
_NTZ_AS_UTC_INSTANT = (
    "timestamp_micros(timestampdiff(MICROSECOND, "
    "timestamp_ntz'1970-01-01 00:00:00', ts))"
)


from ..cache import persisted, release_persisted  # noqa: F401  (re-export:
# query modules reach tracked persists through the registry they already
# import; see cache.py for the unpersist-hygiene contract)


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame callable to the registry."""

    def deco(fn):
        # a silent overwrite once cost a registered query its slot (a
        # duplicate name in a second module shadowed mlprep's ECE) —
        # collisions are always bugs, so fail loudly at import
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name!r}")
        REGISTRY[name] = NamedQuery(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table. Parquet scan → Catalyst gets pushdown/pruning.

    ``events.parquet``'s timestamp physical type has varied across driver
    testdata generations: nanosecond (vectorized reader rejects it — read as
    long and truncate to micros, the same truncation DuckDB applies casting
    NS → US) or microsecond-naive (Spark 4 infers TIMESTAMP_NTZ). The NTZ
    wall-clock values are UTC instants, so the conversion takes the
    wall-clock diff against the NTZ epoch (``timestampdiff`` on two NTZ
    operands — session-TZ-independent) and rebuilds the instant from absolute
    epoch micros. A plain ``cast(ts as timestamp)`` would silently shift
    events under any non-UTC session TZ (ADVICE r03).
    """
    if name == "events":
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:  # noqa: BLE001 — conf may be unsettable on shared sessions
            pass
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.expr(_NTZ_AS_UTC_INSTANT))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure map-side parallelism for CPU-heavy expression pipelines.

    The driver's testdata files are single-row-group parquet, and Spark cannot
    split a parquet file below row-group granularity — so a scan feeding an
    expensive expression chain (shingling, md5 families, KDFs, vector math)
    would run on ONE core. A round-robin ``repartition`` costs one tiny
    shuffle (the raw column bytes) and unlocks every core for the expensive
    map work. Gated on the master URL, NOT a partition-count probe:
    ``df.rdd.getNumPartitions()`` forces a full plan→RDD conversion per call
    (duplicating partition planning on a huge scan — VERDICT r01 nit #2).
    ``local[*]`` masters are exactly the single-file-parquet case this exists
    for; on any real cluster master a 100 TB scan already has thousands of
    splits, so this returns the plan untouched without probing it.
    """
    sc = df.sparkSession.sparkContext
    if not sc.master.startswith("local"):
        return df
    target = min_parts or sc.defaultParallelism
    return df.repartition(target)


def dec(col: str | F.Column, p: int = 12, s: int = 2) -> F.Column:
    """Exact-decimal view of a 2-decimal double column (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({p},{s})")


def as_double(c: F.Column) -> F.Column:
    return c.cast("double")
