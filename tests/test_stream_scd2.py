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
    # DataFrame reads from once newer generations land. Sorted LISTS, not
    # sets: a replay that re-inserts a superseded version duplicates an
    # identical history row, which a set comparison silently forgives.
    want = sorted(
        (r.k, r.name, r.bal, r.eff_date, r.valid_to, r.is_current) for r in hist.collect()
    )

    # replay: a FRESH checkpoint re-delivers every batch; batch 1's (1, "a")
    # change is now SUPERSEDED by (1, "a2"), so the current-slice no-op
    # screen alone would re-insert it — the (key, eff_date) history
    # anti-join must drop it
    stream_scd2_to_store(
        _changes_stream(spark, src), store, str(tmp_path / "ckpt2"),
        key="k", attrs=["name", "bal"],
    )
    hist2 = read_scd2_store(spark, store)
    got = sorted(
        (r.k, r.name, r.bal, r.eff_date, r.valid_to, r.is_current) for r in hist2.collect()
    )
    assert got == want


def test_single_batch_multi_version_replay_is_noop(spark, tmp_path):
    """One batch carrying TWO versions of the same key, then a fresh-checkpoint
    replay: neither version may duplicate (the older one is superseded inside
    its own batch, so the current-slice screen never sees it)."""
    src = str(tmp_path / "changes")
    store = str(tmp_path / "store")
    _write_batch(
        spark, src,
        [(1, "a", 10.0, "2024-01-01"), (1, "a2", 11.0, "2024-06-15"), (2, "b", 20.0, "2024-01-01")],
    )
    kwargs = dict(key="k", attrs=["name", "bal"])
    stream_scd2_to_store(_changes_stream(spark, src), store, str(tmp_path / "ckpt"), **kwargs)
    want = sorted(map(tuple, read_scd2_store(spark, store).collect()))
    assert len(want) == 3
    stream_scd2_to_store(_changes_stream(spark, src), store, str(tmp_path / "ckpt2"), **kwargs)
    got = sorted(map(tuple, read_scd2_store(spark, store).collect()))
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


def test_concurrent_reader_survives_one_commit(spark, tmp_path):
    """``keep_generations=2`` pins the guarantee a concurrent reader relies
    on: the generation that was latest at the reader's open is still on disk
    after ONE subsequent commit (the commit writes gen N+1 and prunes to the
    last two, i.e. {N, N+1}) — so a plan opened last-commit still collects."""
    src = str(tmp_path / "changes")
    store = str(tmp_path / "store")
    kwargs = dict(key="k", attrs=["name", "bal"], keep_generations=2)

    _write_batch(spark, src, [(1, "a", 10.0, "2024-01-01")])
    stream_scd2_to_store(_changes_stream(spark, src), store, str(tmp_path / "c1"), **kwargs)

    # reader opens the store between commits; Spark plans are lazy — the
    # files are read at collect(), AFTER the next commit's prune ran
    reader = read_scd2_store(spark, store)

    # same checkpoint → only the NEW file is delivered → exactly one commit
    _write_batch(spark, src, [(2, "b", 20.0, "2024-02-01")])
    stream_scd2_to_store(_changes_stream(spark, src), store, str(tmp_path / "c1"), **kwargs)

    rows = reader.collect()  # must not hit deleted files
    assert [(r.k, r.name) for r in rows] == [(1, "a")]
