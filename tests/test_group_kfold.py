"""Group-aware K-fold assignment — semantics on constructed events.

Independently recomputes the md5-derived fold for each user in Python
(hashlib) and checks the per-fold group/row/positive tallies against a
hand-aggregation, plus the structural no-leakage audit.
"""

from __future__ import annotations

import datetime
import hashlib

_B = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)


def _fold(user_id: int, k: int = 5) -> int:
    return int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16) % k


def test_group_kfold_matches_hand_aggregation(spark, tmp_path):
    from arc_maskdata_pipeline_plugin_spark.plans.mlprep import q_group_kfold

    rows = []
    eid = 0
    # users 0..11, user u has u%3+1 events, purchase iff u even (first event)
    expected: dict[int, list] = {}
    for u in range(12):
        f = _fold(u)
        agg = expected.setdefault(f, [0, 0, 0])  # groups, rows, pos
        agg[0] += 1
        for j in range(u % 3 + 1):
            typ = "purchase" if (u % 2 == 0 and j == 0) else "view"
            rows.append((eid, _B + datetime.timedelta(minutes=eid), u, typ, 1.0, "{}"))
            agg[1] += 1
            agg[2] += 1 if typ == "purchase" else 0
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r.fold: r for r in q_group_kfold(spark, str(tmp_path)).collect()}
    assert set(out) == set(expected)
    for f, (g, n, p) in expected.items():
        r = out[f]
        assert (r.n_groups, r.n_rows, r.n_pos) == (g, n, p), f
        assert r.pos_share == p / n
        assert r.groups_spanning_folds == 0


def test_group_kfold_every_group_in_one_fold(spark, tmp_path):
    """The defining GroupKFold property, checked directly on the fold
    expression: all of a user's rows get the identical fold, and folds
    cover 0..K-1 over a large-enough user population."""
    from arc_maskdata_pipeline_plugin_spark.plans.mlprep import (
        _GKF_FOLDS,
        q_group_kfold,
    )

    rows = [
        (i, _B + datetime.timedelta(seconds=i), i % 40, "view", 1.0, "{}")
        for i in range(400)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = q_group_kfold(spark, str(tmp_path)).collect()
    assert sum(r.n_groups for r in out) == 40  # each user exactly once
    assert sum(r.n_rows for r in out) == 400
    assert all(0 <= r.fold < _GKF_FOLDS for r in out)
    assert all(r.groups_spanning_folds == 0 for r in out)
