"""One-off r09 probe: what does StreamingQueryProgress report for each
streaming query shape?  Run:  python tools/probe_stream_metrics.py [sf_dir]
"""

import json
import sys
import tempfile
import uuid

sys.path.insert(0, ".")

from arc_maskdata_pipeline_plugin_spark import get_spark  # noqa: E402
from arc_maskdata_pipeline_plugin_spark.streaming.events import (  # noqa: E402
    read_events_stream,
    windowed_event_counts,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def drain(df, output_mode="complete"):
    name = "probe_" + uuid.uuid4().hex[:8]
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progs = [json.loads(p.json) for p in q.recentProgress]
    summary = {
        "n_progresses": len(progs),
        "n_input": sum(p.get("numInputRows", 0) for p in progs),
        "n_data_batches": sum(1 for p in progs if p.get("numInputRows", 0) > 0),
        "sink_rows": sum(
            p.get("sink", {}).get("numOutputRows", 0)
            for p in progs
            if p.get("sink", {}).get("numOutputRows", -1) >= 0
        ),
        "state_final": [
            {
                "op": s.get("operatorName"),
                "rows_total": s.get("numRowsTotal"),
                "removed": s.get("numRowsRemoved"),
                "dropped_wm": s.get("numRowsDroppedByWatermark"),
                "dropped_dup": s.get("customMetrics", {}).get(
                    "numDroppedDuplicateRows"
                ),
            }
            for s in progs[-1].get("stateOperators", [])
        ]
        if progs
        else [],
        "removed_sum": [
            sum(
                p["stateOperators"][i].get("numRowsRemoved", 0)
                for p in progs
                if p.get("stateOperators")
            )
            for i in range(len(progs[-1].get("stateOperators", [])))
        ]
        if progs
        else [],
        "watermark_final": progs[-1].get("eventTime", {}).get("watermark")
        if progs
        else None,
    }
    return summary


def main():
    from pyspark.sql import functions as F

    spark = get_spark("probe")
    out = {}

    # 1. windowed agg (complete)
    s = read_events_stream(spark, SF)
    out["event_counts"] = drain(
        windowed_event_counts(s, "10 minutes", "7 days"), "complete"
    )

    # 4. stream-stream inner join
    clicks = (
        read_events_stream(spark, SF)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "30 days")
    )
    purchases = (
        read_events_stream(spark, SF)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "30 days")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "c_user = p_user AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 60 MINUTES"
        ),
    )
    out["ss_inner_join"] = drain(joined, "append")

    # 7. left outer, 1-minute watermark
    clicks2 = (
        read_events_stream(spark, SF)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 minute")
    )
    purchases2 = (
        read_events_stream(spark, SF)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 minute")
    )
    joined2 = clicks2.join(
        purchases2,
        F.expr(
            "c_user = p_user AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 60 MINUTES"
        ),
        "left_outer",
    )
    out["ss_left_join"] = drain(joined2, "append")

    # 8. applyInPandasWithState (threshold)
    from arc_maskdata_pipeline_plugin_spark.streaming.threshold import (
        first_threshold_crossing,
    )

    st = read_events_stream(spark, SF).select("user_id", "event_id", "ts", "value")
    out["threshold"] = drain(first_threshold_crossing(st, 300_000), "append")

    # 10. python datasource stream
    from arc_maskdata_pipeline_plugin_spark.sources import pydatasource

    pydatasource.register(spark)
    pys = spark.readStream.format("synthetic_events").option("n", 100_000).load()
    agg = pys.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    out["pyds"] = drain(agg, "complete")

    # batch facts for comparison
    ev = spark.read.parquet(f"{SF}/events.parquet")
    facts = {
        "n_events": ev.count(),
        "n_users": ev.select("user_id").distinct().count(),
        "n_user_type": ev.select("user_id", "event_type").distinct().count(),
        "n_clicks": ev.filter(F.col("event_type") == "click").count(),
        "n_purchases": ev.filter(F.col("event_type") == "purchase").count(),
    }
    print(json.dumps({"facts": facts, "probes": out}, indent=1))


if __name__ == "__main__":
    main()
