"""Dataset.observe stage metrics — batch and streaming.

Pins the contract the operator claims: metrics are collected during the one
real action (no extra job), values equal an independent recount, and the
streaming variant surfaces per-batch metrics in query progress.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.operators.observe import (
    observe_stage,
    observe_stream,
)

SF = "/root/testdata/sf0.001"


def test_batch_observation_matches_recount(spark):
    df = spark.read.parquet(f"{SF}/customer.parquet")
    observed, obs = observe_stage(df, "cust_stage", columns=["c_name", "c_acctbal"])
    n = observed.count()  # the ONE action; metrics piggyback on it
    got = obs.get
    assert got["n_rows"] == n == df.count()
    assert got["nulls_c_name"] == df.filter(F.col("c_name").isNull()).count()
    assert got["nulls_c_acctbal"] == df.filter(F.col("c_acctbal").isNull()).count()


def test_batch_observation_custom_metrics(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    observed, obs = observe_stage(
        df,
        "orders_stage",
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_dec"),
        F.max("o_orderdate").alias("max_date"),
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("t"),
        F.max("o_orderdate").alias("m"),
    ).collect()[0]
    assert got["n_rows"] == row["n"]
    assert got["total_dec"] == row["t"]
    assert got["max_date"] == row["m"]


def test_stream_observation_in_progress(spark):
    from arc_maskdata_pipeline_plugin_spark.streaming.events import (
        read_events_stream,
    )

    stream = read_events_stream(spark, SF)
    observed = observe_stream(stream, "ingest", columns=["user_id", "value"])
    name = f"obs_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory(prefix="ckpt_") as ckpt:
        q = (
            observed.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progresses = [p for p in q.recentProgress if p.observedMetrics.get("ingest")]
    assert progresses, "no progress carried observed metrics"
    total = sum(p.observedMetrics["ingest"]["n_rows"] for p in progresses)
    batch_n = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total == batch_n
    assert spark.table(name).count() == batch_n
