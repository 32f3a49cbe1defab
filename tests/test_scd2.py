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


# ---------------------------------------------------------------------------
# Property: the declarative plan equals a pure-Python reference merge on
# randomized current/change sets.
# ---------------------------------------------------------------------------


def _py_scd2(current, changes):
    """Reference merge: per key, keep the current version plus real changes
    (attrs differ from current), order by (eff_date, from_current desc),
    chain validity."""
    cur_by_key = {}
    for k, name, bal, eff in current:
        cur_by_key[k] = (name, bal, eff)
    versions = {}
    for k, name, bal, eff in current:
        versions.setdefault(k, []).append((eff, True, name, bal))
    for k, name, bal, eff in changes:
        if k in cur_by_key and cur_by_key[k][:2] == (name, bal):
            continue
        versions.setdefault(k, []).append((eff, False, name, bal))
    out = set()
    for k, vs in versions.items():
        vs.sort(key=lambda v: (v[0], not v[1]))
        for i, (eff, _fc, name, bal) in enumerate(vs):
            nxt = vs[i + 1][0] if i + 1 < len(vs) else None
            out.add((k, name, bal, eff, nxt or "9999-12-31", nxt is None))
    return out


def test_scd2_matches_python_reference_randomized(spark):
    import random

    rng = random.Random(7)
    for trial in range(3):
        keys = list(range(12))
        current = [
            (k, f"n{rng.randrange(5)}", float(rng.randrange(3)), "2024-01-01")
            for k in keys
            if rng.random() < 0.8
        ]
        changes = [
            (k, f"n{rng.randrange(5)}", float(rng.randrange(3)), "2024-06-15")
            for k in rng.sample(keys, 8)
        ]
        cur_df = _cur(spark, current) if current else None
        chg_df = _cur(spark, changes)
        got = {
            (r.k, r.name, r.bal, r.eff_date, r.valid_to, r.is_current)
            for r in scd2_merge(cur_df, chg_df, "k", ["name", "bal"]).collect()
        }
        assert got == _py_scd2(current, changes), f"trial {trial}"
