"""Spark 4 Python DataSource connector: planning, pushdown, correctness."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.sources.pydatasource import (
    EVENT_TYPES,
    SyntheticEventsReader,
    register,
)


@pytest.fixture(scope="module")
def source(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    register(spark)
    return spark


def _load(spark, n=50_000, partitions=8):
    return (
        spark.read.format("synthetic_events")
        .option("n", str(n))
        .option("partitions", str(partitions))
        .load()
    )


# --- reader unit tests (pure Python, no Spark) ----------------------------


def test_pushdown_narrows_partitions():
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

    r = SyntheticEventsReader(None, {"n": "100000", "partitions": "4"})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("event_id",), 25000),
                LessThan(("event_id",), 75000),
                EqualTo(("event_type",), "click"),  # unsupported → returned
            ]
        )
    )
    assert len(leftover) == 1 and isinstance(leftover[0], EqualTo)
    parts = r.partitions()
    assert parts[0].start == 25000 and parts[-1].end == 75000
    assert len(parts) == 4
    covered = sum(p.end - p.start for p in parts)
    assert covered == 50000


def test_pushdown_resets_between_plans():
    from pyspark.sql.datasource import LessThan

    r = SyntheticEventsReader(None, {"n": "1000", "partitions": "2"})
    list(r.pushFilters([LessThan(("event_id",), 10)]))
    assert sum(p.end - p.start for p in r.partitions()) == 10
    list(r.pushFilters([]))  # re-planned with no filters → full range again
    assert sum(p.end - p.start for p in r.partitions()) == 1000


def test_read_formula():
    r = SyntheticEventsReader(None, {"n": "10", "partitions": "1"})
    rows = [row for p in r.partitions() for row in r.read(p)]
    assert rows[7] == (7, 7, EVENT_TYPES[2], (7 * 7919 % 100000) / 100.0)


# --- end-to-end through Spark ---------------------------------------------


def test_full_scan_count_and_schema(source):
    df = _load(source)
    assert df.count() == 50_000
    assert [f.name for f in df.schema.fields] == [
        "event_id",
        "user_id",
        "event_type",
        "value",
    ]


def test_filtered_scan_matches_python(source):
    got = (
        _load(source)
        .filter("event_id >= 1000 and event_id < 2000")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(10,2)")).alias("s"),
        )
        .collect()[0]
    )
    from decimal import Decimal

    want = sum(Decimal(str((i * 7919 % 100000) / 100.0)) for i in range(1000, 2000))
    assert got["n"] == 1000
    assert got["s"] == want


def test_repeated_filtered_scans_same_dataframe(source):
    df = _load(source)
    assert df.filter("event_id >= 1000 and event_id < 2000").count() == 1000
    assert df.filter("event_id < 100").count() == 100  # re-plan resets range


def test_partition_parallelism(source):
    parts = _load(source, n=10_000, partitions=16).rdd.getNumPartitions()
    assert parts == 16


def test_stream_reader_incremental_recovery(spark, tmp_path):
    """Checkpointed restart with a LARGER bound reads exactly the delta —
    the incremental-ingestion contract of the streaming Python DataSource."""
    from arc_maskdata_pipeline_plugin_spark.sources import pydatasource

    pydatasource.register(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain(n):
        df = spark.readStream.format("synthetic_events").option("n", n).load()
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    r1 = drain(6000)
    assert r1.count() == 6000
    r2 = drain(10000)
    assert r2.count() == 10000  # only the [6000, 10000) delta was appended
    assert r2.agg({"event_id": "max"}).collect()[0][0] == 9999
    # replayed rows match the generative formula exactly
    import pyspark.sql.functions as F

    bad = r2.filter(
        (F.col("user_id") != F.col("event_id") % 1000)
        | (F.col("value") != (F.col("event_id") * 7919 % 100000) / 100.0)
    )
    assert bad.count() == 0
