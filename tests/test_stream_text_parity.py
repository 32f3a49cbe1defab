"""One definition, both modes: the round-2 text passes (PII scrub, quality
filter) are stateless projections, so the SAME operator call must run
unchanged on a streaming DataFrame and produce the batch answer."""

from __future__ import annotations

from arc_maskdata_pipeline_plugin_spark.operators.text import quality_filter, scrub_pii

SF = "/root/testdata/sf0.001"


def _drain(df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def test_scrub_and_filter_run_on_streams(spark):
    import arc_maskdata_pipeline_plugin_spark.streaming.events as ev

    stream = (
        spark.readStream.schema(spark.read.parquet(f"{SF}/documents.parquet").schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(ev._as_stream_dir(f"{SF}/documents.parquet"))
    )
    batch = spark.read.parquet(f"{SF}/documents.parquet")

    streamed = _drain(
        quality_filter(scrub_pii(stream), text="scrubbed", min_stopword_ratio=0.05)
        .select("doc_id", "passes"),
        "t_stream_text_parity",
    )
    want = {
        (r.doc_id, r.passes)
        for r in quality_filter(
            scrub_pii(batch), text="scrubbed", min_stopword_ratio=0.05
        ).select("doc_id", "passes").collect()
    }
    got = {(r.doc_id, r.passes) for r in streamed.collect()}
    assert got == want and len(got) == batch.count()
