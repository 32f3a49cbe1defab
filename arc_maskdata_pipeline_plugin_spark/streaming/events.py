"""Streaming operators over the ``events`` table.

Scale design: a production deployment points ``read_events_stream`` at a
growing directory (or Kafka via ``spark.readStream.format("kafka")``) — the
operators below are source-agnostic. Watermarks bound aggregation state (the
100 TB consideration: unbounded keys × unbounded windows = OOM); windows are
epoch-aligned tumbling so results equal the batch group-by, which is how the
tests verify streaming output against the DuckDB oracle.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _as_stream_dir(path: str) -> str:
    """Spark's file-stream source requires a *directory*; stage a symlink dir
    for a bare file path (read-only source data stays untouched)."""
    if os.path.isdir(path):
        return path
    key = hashlib.md5(path.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), "spark_graft_stream", key)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(path))
    if not os.path.exists(link):
        os.symlink(path, link)
    return d


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over events.parquet, normalizing ``ts`` to a
    TIMESTAMP exactly like the batch reader in plans.registry.T
    (nanos-as-long → truncate to micros; TIMESTAMP_NTZ → UTC-instant rebuild,
    session-TZ-independent — see registry._NTZ_AS_UTC_INSTANT)."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001
        pass
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(_as_stream_dir(f"{sf_dir}/events.parquet"))
    )
    ts_type = dict(stream.dtypes).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif ts_type == "timestamp_ntz":
        from arc_maskdata_pipeline_plugin_spark.plans.registry import _NTZ_AS_UTC_INSTANT

        stream = stream.withColumn("ts", F.expr(_NTZ_AS_UTC_INSTANT))
    return stream


def masked_event_stream(stream: DataFrame) -> DataFrame:
    """Stateless masking projection on a stream (mask UDFs must be registered
    on the session). Identical code path to batch — the point of the design."""
    return stream.selectExpr(
        "event_id",
        "ts",
        "mask_string_alphabet(8, '0123456789', true, CAST(user_id AS STRING)) AS user_pseudonym",
        "event_type",
        "value",
    )


def windowed_event_counts(
    stream: DataFrame,
    window: str = "10 minutes",
    watermark: str = "7 days",
) -> DataFrame:
    """Watermarked tumbling-window counts per event type."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_available_now(df: DataFrame, name: str, output_mode: str = "complete") -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; returns the materialized result table. ``complete`` suits
    aggregations; joins/projections need ``append``."""
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return df.sparkSession.table(name)


def stream_masked_to_parquet(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    partition_by: tuple[str, ...] = ("event_type",),
) -> None:
    """Production streaming sink: mask → ``foreachBatch`` → partitioned
    parquet, drained with ``availableNow``.

    ``foreachBatch`` is the pattern for sinks that need batch-writer features
    (dynamic partitioning, compaction, merge). foreachBatch alone is only
    at-least-once: a crash between the write and the checkpoint commit replays
    the batch. The write is therefore made IDEMPOTENT — each batch lands in a
    ``batch_id=N`` subdirectory with ``overwrite``, so a replayed batch
    replaces its own output instead of appending duplicates, and the
    replay-safe composition is effectively exactly-once. Readers see
    ``batch_id`` as an ordinary discovered partition column under
    ``output_dir``. The masking projection is the SAME code path as batch (a
    stateless selectExpr), which is the engine's core design claim: one
    masking definition, both execution modes.
    """
    masked = masked_event_stream(stream)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .partitionBy(*partition_by)
            .parquet(os.path.join(output_dir, f"batch_id={batch_id}"))
        )

    q = (
        masked.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
