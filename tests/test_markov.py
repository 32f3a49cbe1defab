"""Markov next-event transition matrix — semantics on constructed sessions.

Hand-built event streams where the expected bigram counts and row-stochastic
probabilities are known exactly, covering: the session gap cutoff (a pair
straddling > 30 min contributes nothing), per-user isolation (consecutive
rows from DIFFERENT users never pair), tie-stable ordering via event_id,
and row-stochasticity (each prev_type's probs sum to 1).
"""

from __future__ import annotations

import datetime

_B = datetime.datetime(2024, 1, 1, 12, 0, tzinfo=datetime.timezone.utc)


def _ev(i, minutes, user, typ):
    return (i, _B + datetime.timedelta(minutes=minutes), user, typ, 1.0, "{}")


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_markov_counts_gap_and_user_isolation(spark, tmp_path):
    from arc_maskdata_pipeline_plugin_spark.plans.behavior import (
        q_markov_transitions,
    )

    rows = [
        # user 1: view ->(5m) click ->(10m) view ->(45m GAP) purchase
        _ev(0, 0, 1, "view"),
        _ev(1, 5, 1, "click"),
        _ev(2, 15, 1, "view"),
        _ev(3, 60, 1, "purchase"),  # 45 min after previous: dropped
        # user 2: view ->(1m) view  (interleaved in time with user 1 —
        # cross-user adjacency must not pair)
        _ev(4, 2, 2, "view"),
        _ev(5, 3, 2, "view"),
        # user 3: single event — no bigram
        _ev(6, 0, 3, "click"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        (r.prev_type, r.next_type): r
        for r in q_markov_transitions(spark, str(tmp_path)).collect()
    }
    assert set(out) == {("view", "click"), ("click", "view"), ("view", "view")}
    # prev=view row: click once, view once -> 0.5 / 0.5
    assert out[("view", "click")].n_transitions == 1
    assert out[("view", "view")].n_transitions == 1
    assert out[("view", "click")].prob == 0.5
    assert out[("view", "view")].prob == 0.5
    assert out[("click", "view")].prob == 1.0


def test_markov_rows_are_stochastic_and_tie_ordered(spark, tmp_path):
    """Simultaneous timestamps order by event_id (deterministic bigrams),
    and every prev_type row sums to probability 1."""
    from arc_maskdata_pipeline_plugin_spark.plans.behavior import (
        q_markov_transitions,
    )

    rows = [
        _ev(10, 0, 7, "a"),
        (11, _B, 7, "b", 1.0, "{}"),  # same ts as event 10 -> orders after it
        _ev(12, 1, 7, "c"),
        _ev(13, 2, 7, "a"),
        _ev(14, 3, 7, "c"),
    ]
    _write_events(spark, tmp_path, rows)
    out = q_markov_transitions(spark, str(tmp_path)).collect()
    got = {(r.prev_type, r.next_type): r.n_transitions for r in out}
    assert got == {("a", "b"): 1, ("b", "c"): 1, ("c", "a"): 1, ("a", "c"): 1}
    sums: dict[str, float] = {}
    for r in out:
        sums[r.prev_type] = sums.get(r.prev_type, 0.0) + r.prob
    assert all(abs(s - 1.0) < 1e-12 for s in sums.values()), sums
