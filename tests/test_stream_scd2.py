"""Streaming SCD2 sink: CDC micro-batches build versioned history; replay of
an applied batch is a no-op (the at-least-once → effectively-once argument)."""

from __future__ import annotations

import pyspark.sql.functions as F

from arc_maskdata_pipeline_plugin_spark.streaming.scd import (
    read_scd2_store,
    stream_scd2_to_store,
)

SCHEMA = "k long, name string, bal double, eff_date string"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _changes_stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def test_cdc_stream_builds_history_and_replay_is_noop(spark, tmp_path):
    src = str(tmp_path / "changes")
    store = str(tmp_path / "store")

    _write_batch(spark, src, [(1, "a", 10.0, "2024-01-01"), (2, "b", 20.0, "2024-01-01")])
    _write_batch(spark, src, [(1, "a2", 11.0, "2024-06-15"), (3, "c", 30.0, "2024-06-15")])

    stream_scd2_to_store(
        _changes_stream(spark, src), store, str(tmp_path / "ckpt"),
        key="k", attrs=["name", "bal"],
    )
    hist = read_scd2_store(spark, store)
    rows = {(r.k, r.eff_date): r for r in hist.collect()}
    assert len(rows) == 4  # 2 initial + 1 new version + 1 new key
    assert rows[(1, "2024-01-01")].valid_to == "2024-06-15"
    assert not rows[(1, "2024-01-01")].is_current
    assert rows[(1, "2024-06-15")].is_current and rows[(1, "2024-06-15")].name == "a2"
    assert rows[(2, "2024-01-01")].is_current
    assert rows[(3, "2024-06-15")].is_current

    # materialize BEFORE the replay — pruning deletes the generation this
    # DataFrame reads from once newer generations land
    want = {(r.k, r.name, r.bal, r.eff_date, r.valid_to, r.is_current) for r in hist.collect()}

    # replay: a FRESH checkpoint re-delivers every batch; the no-op screen
    # must leave the history content-identical (no duplicate versions)
    stream_scd2_to_store(
        _changes_stream(spark, src), store, str(tmp_path / "ckpt2"),
        key="k", attrs=["name", "bal"],
    )
    hist2 = read_scd2_store(spark, store)
    got = {(r.k, r.name, r.bal, r.eff_date, r.valid_to, r.is_current) for r in hist2.collect()}
    assert got == want


def test_store_generations_pruned(spark, tmp_path):
    import os

    src = str(tmp_path / "changes")
    store = str(tmp_path / "store")
    for i in range(4):
        _write_batch(spark, src, [(i, f"n{i}", float(i), f"2024-0{i+1}-01")])
    stream_scd2_to_store(
        _changes_stream(spark, src), store, str(tmp_path / "ckpt"),
        key="k", attrs=["name", "bal"], keep_generations=2,
    )
    gens = sorted(d for d in os.listdir(store) if d.startswith("gen="))
    assert len(gens) == 2  # pruned to the keep window
    assert read_scd2_store(spark, store).count() == 4
