"""Round-9 fifth-batch operator semantics: columnar-encoding advisor and
partition-balance planner on constructed inputs."""

from __future__ import annotations

import datetime


def _ts():
    return datetime.datetime(1995, 1, 1)


def test_encoding_advisor_picks_per_column(spark, tmp_path):
    """64 rows in one simulated file: constant-block flag → RLE; cycling
    linenumber → dictionary; unique price → plain. Hand-computed byte
    models for all three encodings."""
    rows = []
    for i in range(64):
        rows.append(
            (
                i + 1,  # orderkey (all < 512 → one file)
                1,
                1,
                (i % 8) + 1,  # linenumber cycles 1..8
                5.0,  # quantity constant
                float(100 + i),  # price unique
                0.0,
                0.0,
                "A" if i < 32 else "B",  # flag: two runs
                "O",
                _ts(),
            )
        )
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.lakeops3 import (
        q_encoding_advisor,
    )

    got = {r["col"]: r for r in q_encoding_advisor(spark, str(tmp_path)).collect()}
    # flag: w=1, d=2; ordering within (orderkey, linenumber) → 2 runs
    f = got["l_returnflag"]
    assert (f["n"], f["d"], f["plain_bytes"]) == (64, 2, 64)
    assert f["rle_runs"] == 2 and f["rle_bytes"] == 2 * 3
    assert f["dict_bytes"] == 2 * 1 + 64 * 1
    assert f["best_encoding"] == "rle"
    # quantity: constant → 1 run
    q = got["l_quantity"]
    assert q["d"] == 1 and q["rle_runs"] == 1
    assert q["rle_bytes"] == 10 and q["best_encoding"] == "rle"
    # price: unique → plain (dict = 64*8 + 64*1 = 576 > 512)
    p = got["l_extendedprice"]
    assert p["d"] == 64 and p["plain_bytes"] == 512
    assert p["dict_bytes"] == 576 and p["best_encoding"] == "plain"
    # linenumber: d=8, runs=64 (cycles) → dictionary (8*4 + 64 = 96 < 256)
    ln = got["l_linenumber"]
    assert ln["d"] == 8 and ln["plain_bytes"] == 256
    assert ln["dict_bytes"] == 96 and ln["best_encoding"] == "dictionary"


def test_partition_balance_range_beats_hash_on_skewed_weights(spark, tmp_path):
    """Keys 1..4 with weights 7/1/1/1 and T=8: the weight-aware range plan
    puts the hot key alone (imbalance 5.6) while hash may co-locate keys.
    Full python replica of both assignments."""
    rows = []
    eid = 0
    for k, w in [(1, 7), (2, 1), (3, 1), (4, 1)]:
        for _ in range(w):
            eid += 1
            rows.append((eid, _ts(), k, "view", 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.lakeops3 import (
        _BAL_TASKS,
        q_partition_balance_planner,
    )

    weights = {1: 7, 2: 1, 3: 1, 4: 1}
    total = sum(weights.values())
    # python replica
    cum = 0
    range_loads: dict[int, int] = {}
    for k in sorted(weights):
        task = min(_BAL_TASKS - 1, cum * _BAL_TASKS // total)
        range_loads[task] = range_loads.get(task, 0) + weights[k]
        cum += weights[k]
    hash_loads: dict[int, int] = {}
    for k, w in weights.items():
        task = (k * 2654435761 % 4294967296) % _BAL_TASKS
        hash_loads[task] = hash_loads.get(task, 0) + w

    out = q_partition_balance_planner(spark, str(tmp_path)).collect()
    got = {
        (r["strategy"], r["task"]): r["load"] for r in out
    }
    for t, load in range_loads.items():
        assert got[("range", t)] == load, (t, got)
    for t, load in hash_loads.items():
        assert got[("hash", t)] == load, (t, got)
    imb = {r["strategy"]: r["imbalance_fp6"] for r in out}
    assert imb["range"] == max(range_loads.values()) * _BAL_TASKS * 1_000_000 // total
    assert imb["hash"] == max(hash_loads.values()) * _BAL_TASKS * 1_000_000 // total


def test_selectivity_estimate_python_replica(spark, tmp_path):
    """Uniform 64-order price grid vs a full python replica of the
    equi-depth histogram + interpolation estimator: on uniform data the
    uniformity assumption is exact, so every q-error must be ~1.000 and
    the replica must match value-for-value."""
    rows = [
        (i + 1, 1, "F", float(i + 1), _ts(), "1-URGENT") for i in range(64)
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.lakeops3 import (
        _SEL_B,
        q_selectivity_estimate,
    )

    import math

    cents = sorted(math.floor((i + 1) * 100) for i in range(64))
    n = len(cents)
    # replica: equi-depth bounds + interpolation
    cumv = []
    c = 0
    for v in cents:
        c += 1
        cumv.append((v, c))
    his = []
    for k in range(_SEL_B):
        hi = min(v for v, cc in cumv if cc * _SEL_B >= (k + 1) * n)
        his.append(hi)
    vmin, vmax = cents[0], cents[-1]
    expect = {}
    for q in range(1, 8):
        lit = vmin + (vmax - vmin) * q // 8
        actual = max((cc for v, cc in cumv if v <= lit), default=0)
        for k in range(_SEL_B):
            lo = his[k - 1] if k > 0 else vmin - 1
            hi = his[k]
            if lo < lit <= hi:
                cum_hi = max(cc for v, cc in cumv if v <= hi)
                n_b = cum_hi - (
                    max(cc for v, cc in cumv if v <= lo) if k > 0 else 0
                )
                est = cum_hi - n_b + n_b * (lit - lo) // (hi - lo)
                expect[q] = (lit, est, actual)
                break
    got = {
        r["pred_idx"]: (r["lit_cents"], r["est_rows"], r["actual_rows"])
        for r in q_selectivity_estimate(spark, str(tmp_path)).collect()
    }
    assert got == expect, (got, expect)


def test_lsh_band_sweep_monotone_and_identical_caught(spark, tmp_path):
    """Nested-band theorem on planted data: a size-r' band match implies a
    size-r match for every r dividing r' (band boundaries align), so
    candidate counts and recall are NON-INCREASING in band_size; identical
    documents (J = 1) are caught at EVERY configuration."""
    import pyspark.sql.functions  # noqa: F401

    base = " ".join(f"w{i}" for i in range(30))
    near = " ".join(f"w{i}" for i in range(28)) + " x1 x2"  # high overlap
    docs = [
        (1, base, "en", "S"),
        (2, base, "en", "S"),  # identical pair (1,2)
        (3, near, "en", "S"),
        (4, "completely different tokens here now", "en", "S"),
        (5, "another unrelated document text body", "en", "S"),
    ]
    spark.createDataFrame(docs, ["doc_id", "text", "lang", "source"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.dedup2 import (
        q_lsh_band_sweep,
    )

    rows = sorted(
        q_lsh_band_sweep(spark, str(tmp_path)).collect(),
        key=lambda r: r["band_size"],
    )
    assert [r["band_size"] for r in rows] == [1, 2, 4, 8]
    cands = [r["n_candidates"] for r in rows]
    recalls = [r["recall_fp6"] for r in rows]
    assert cands == sorted(cands, reverse=True), cands
    assert recalls == sorted(recalls, reverse=True), recalls
    # identical docs share every minhash → found at every band size
    assert all(r["n_found"] >= 1 for r in rows), rows
    assert all(r["n_truth"] == rows[0]["n_truth"] for r in rows)
