"""SCD2 merge: interval correctness, no-op screen, replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.operators.scd import HIGH_DATE, scd2_merge


def _cur(spark, rows):
    return spark.createDataFrame(rows, ["k", "name", "bal", "eff_date"])


def test_merge_builds_history(spark):
    current = _cur(spark, [(1, "a", 10.0, "2024-01-01"), (2, "b", 20.0, "2024-01-01")])
    changes = _cur(spark, [(1, "a2", 11.0, "2024-06-15")])
    out = {(r.k, r.eff_date): r for r in
           scd2_merge(current, changes, "k", ["name", "bal"]).collect()}
    closed = out[(1, "2024-01-01")]
    assert closed.valid_to == "2024-06-15" and not closed.is_current
    new = out[(1, "2024-06-15")]
    assert new.valid_to == HIGH_DATE and new.is_current and new.name == "a2"
    untouched = out[(2, "2024-01-01")]
    assert untouched.valid_to == HIGH_DATE and untouched.is_current


def test_noop_changes_dropped_and_replay_idempotent(spark):
    current = _cur(spark, [(1, "a", 10.0, "2024-01-01")])
    same = _cur(spark, [(1, "a", 10.0, "2024-06-15")])  # attributes unchanged
    out = scd2_merge(current, same, "k", ["name", "bal"]).collect()
    assert len(out) == 1 and out[0].is_current and out[0].valid_to == HIGH_DATE

    # replay: feeding the post-merge CURRENT slice the same batch again
    # changes nothing (the idempotence a replayed ingest needs)
    changes = _cur(spark, [(1, "a2", 11.0, "2024-06-15")])
    merged = scd2_merge(current, changes, "k", ["name", "bal"])
    cur2 = merged.filter("is_current").select("k", "name", "bal", "eff_date")
    replay = scd2_merge(cur2, changes, "k", ["name", "bal"]).collect()
    assert len(replay) == 1 and replay[0].eff_date == "2024-06-15"


def test_new_key_insert(spark):
    current = _cur(spark, [(1, "a", 10.0, "2024-01-01")])
    changes = _cur(spark, [(9, "new", 1.0, "2024-06-15")])
    out = {r.k: r for r in scd2_merge(current, changes, "k", ["name", "bal"]).collect()}
    assert out[9].is_current and out[9].valid_to == HIGH_DATE
    assert out[1].is_current
