"""Round-9 second-batch operator semantics on constructed inputs.

Hand-computed expected values for the classifier-evaluation metrics
(ROC AUC / AP / best-F1), vocabulary-coverage estimators (Chao1,
Good-Turing, Heaps curve), transaction-log replay, join-cardinality
estimation, Misra-Gries heavy hitters, and padding-waste batching — the
semantics layer of the per-operator checklist (oracle parity is the
cross-engine layer)."""

from __future__ import annotations

import datetime


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))


def _ts(y, m, d=1):
    return datetime.datetime(y, m, d)


def test_roc_auc_separable_and_tied(spark, tmp_path):
    """Group A: positives score strictly above negatives → AUC = 1.
    Group B: all four rows share one score → AUC = 0.5 by midranks."""
    rows = [
        (1, 1, "F", 40.0, _ts(1995, 1), "A"),
        (2, 1, "F", 30.0, _ts(1995, 1), "A"),
        (3, 1, "O", 20.0, _ts(1995, 1), "A"),
        (4, 1, "O", 10.0, _ts(1995, 1), "A"),
        (5, 1, "F", 10.0, _ts(1995, 1), "B"),
        (6, 1, "F", 10.0, _ts(1995, 1), "B"),
        (7, 1, "O", 10.0, _ts(1995, 1), "B"),
        (8, 1, "O", 10.0, _ts(1995, 1), "B"),
    ]
    _write_orders(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.mleval import q_roc_auc

    got = {
        r["grp"]: (r["n_pos"], r["n_neg"], r["auc_fp6"])
        for r in q_roc_auc(spark, str(tmp_path)).collect()
    }
    assert got == {"A": (2, 2, 1_000_000), "B": (2, 2, 500_000)}, got


def test_pr_auc_best_f1_hand_computed(spark, tmp_path):
    """Scores desc: 40(+), 30(−), 20(+), 10(−).
    AP = 1/2·(1/1) + 1/2·(2/3) = 5/6 → per-term fp9 floors:
    t=40: (1·1·1e9)//(2·1) = 500000000; t=20: (1·2·1e9)//(2·3)=333333333
    → ap_fp9 = 833333333. F1 by threshold: 40→2·1/(1+2)=2/3 (666666);
    30→2·1/(2+2)=1/2; 20→2·2/(3+2)=4/5 (800000); 10→2·2/(4+2)=2/3.
    Best = threshold 20, F1 fp6 800000, precision 2/3, recall 1."""
    rows = [
        (1, 1, "F", 40.0, _ts(1995, 1), "A"),
        (2, 1, "O", 30.0, _ts(1995, 1), "A"),
        (3, 1, "F", 20.0, _ts(1995, 1), "A"),
        (4, 1, "O", 10.0, _ts(1995, 1), "A"),
    ]
    _write_orders(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.mleval import (
        q_pr_auc_best_f1,
    )

    [r] = q_pr_auc_best_f1(spark, str(tmp_path)).collect()
    assert r["n_pos"] == 2 and r["n_neg"] == 2
    assert r["ap_fp9"] == 833_333_333, r["ap_fp9"]
    assert r["best_f1_fp6"] == 800_000
    assert r["best_threshold"] == 20.0
    assert r["best_precision_fp6"] == 666_666
    assert r["best_recall_fp6"] == 1_000_000


def test_chao_coverage_hand_computed(spark, tmp_path):
    """Tokens: a a a b c d d → d=4 distinct, f1={b,c}=2, f2={d}=1, N=7.
    chao1 = 4 + 2·1 div (2·(1+1)) = 4 + 0 = 4;
    gt_unseen = 2·1e9 div 7 = 285714285."""
    _write_docs(spark, tmp_path, [(1, "a a a b c d d", "en", "S")])
    from arc_maskdata_pipeline_plugin_spark.plans.vocab import q_chao_coverage

    [r] = q_chao_coverage(spark, str(tmp_path)).collect()
    assert (
        r["n_tokens"],
        r["d_distinct"],
        r["f1"],
        r["f2"],
        r["chao1_est"],
        r["gt_unseen_mass_fp9"],
    ) == (7, 4, 2, 1, 4, 285_714_285), r


def test_chao_singleton_rich_source(spark, tmp_path):
    """All singletons: f1=4, f2=0 → chao1 = 4 + 4·3 div 2 = 10;
    unseen mass = 4e9 div 4 = 1e9 (everything is unseen-rate evidence)."""
    _write_docs(spark, tmp_path, [(1, "w x y z", "en", "S")])
    from arc_maskdata_pipeline_plugin_spark.plans.vocab import q_chao_coverage

    [r] = q_chao_coverage(spark, str(tmp_path)).collect()
    assert (r["chao1_est"], r["gt_unseen_mass_fp9"]) == (10, 1_000_000_000), r


def test_heaps_curve_first_seen_positions(spark, tmp_path):
    """Doc 1 = 'a b a b' (offset 0), doc 2 = 'c a b c' (offset 4); N=8.
    first_seen: a→1, b→2, c→5. Checkpoints: 25%→2, 50%→4, 75%→6, 100%→8.
    vocab_at = 2, 2, 3, 3."""
    _write_docs(
        spark,
        tmp_path,
        [(1, "a b a b", "en", "S"), (2, "c a b c", "en", "S")],
    )
    from arc_maskdata_pipeline_plugin_spark.plans.vocab import (
        q_heaps_law_curve,
    )

    rows = q_heaps_law_curve(spark, str(tmp_path)).collect()
    got = {r["quarter"]: (r["tokens_at"], r["vocab_at"]) for r in rows}
    assert got == {1: (2, 2), 2: (4, 2), 3: (6, 3), 4: (8, 3)}, got
    # all four rows carry the same fitted beta
    assert len({r["beta_fp6"] for r in rows}) == 1


def test_txn_log_replay_python_replica(spark, tmp_path):
    """7 months × 2 customer buckets, 1 order each → replay vs a
    from-scratch Python fold of the same ADD/REMOVE log."""
    rows = []
    ok = 0
    for m in range(7):  # months 0..6 → versions 0..6, groups {0,1} complete
        for b in range(2):
            ok += 1
            rows.append(
                (ok, b, "F", 10.0, _ts(1995, 1 + m), "1-URGENT")
            )
    _write_orders(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.lakeops3 import (
        _GROUP,
        _NBUCKETS,
        _RETENTION,
        q_txn_log_replay,
    )

    # python replica over the same derived log
    vmax = 6
    buckets = sorted({b % _NBUCKETS for b in range(2)})
    per_v = {}
    for v in range(vmax + 1):
        adds = len(buckets)
        rows_added = len(buckets)  # 1 order per (bucket, month)
        removes = 0
        compact_adds = 0
        g = None
        # compaction at v if v == 3g+2 and complete
        if v % _GROUP == _GROUP - 1 and v <= vmax:
            g = v // _GROUP
            removes = len(buckets) * _GROUP
            compact_adds = len(buckets)
        per_v[v] = (adds + compact_adds, removes, rows_added)
    live_f = live_r = 0
    expect = {}
    removed_hist = []
    for v in range(vmax + 1):
        a, rm, ra = per_v[v]
        live_f += a - rm
        live_r += ra  # compaction is row-conserving
        removed_hist.append(rm)
        vac = sum(removed_hist[: max(0, v + 1 - _RETENTION)])
        expect[v] = (a, rm, live_f, live_r, vac, 1)

    got = {
        r["version"]: (
            r["n_added"],
            r["n_removed"],
            r["live_files"],
            r["live_rows"],
            r["vacuum_eligible"],
            r["conserved"],
        )
        for r in q_txn_log_replay(spark, str(tmp_path)).collect()
    }
    assert got == expect, (got, expect)


def test_join_cardinality_exact_when_uniform(spark, tmp_path):
    """One bucket, uniform keys: events 2 rows/key on keys {1,2}, orders
    3 rows/key on the same keys → est = 4·6 div 2 = 12 = actual
    (uniformity assumption exactly satisfied → q-error 1.000)."""
    ev = [(i, _ts(1995, 1), k, "view", 1.0, "{}") for i, k in enumerate([1, 1, 2, 2])]
    spark.createDataFrame(
        ev, "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    orows = [
        (i, k, "F", 1.0, _ts(1995, 1), "1-URGENT")
        for i, k in enumerate([1, 1, 1, 2, 2, 2])
    ]
    _write_orders(spark, tmp_path, orows)
    from arc_maskdata_pipeline_plugin_spark.plans.lakeops3 import (
        q_join_cardinality_estimate,
    )

    # kmax=2 → bucket width 1 → keys 1 and 2 land in their own buckets,
    # each with (n1=2, d1=1, n2=3, d2=1) → est = 2·3 div 1 = 6 = actual
    rows = q_join_cardinality_estimate(spark, str(tmp_path)).collect()
    assert len(rows) == 2, rows
    for r in rows:
        assert (r["n_events"], r["d_events"], r["n_orders"], r["d_orders"]) == (
            2, 1, 3, 1,
        ), r
        assert r["est_rows"] == 6 and r["actual_rows"] == 6
        assert r["qerr_fp3"] == 1000


def test_misra_gries_bounds_and_completeness(spark, tmp_path):
    """Zipf-ish constructed stream: 'hot' appears 40×, mid words 6×,
    60 singleton words → N=136, k=16 → bound = 136 div 17 = 8.
    'hot' (40 > 8) MUST survive; every survivor deficit ≤ 8."""
    docs = []
    did = 0
    for i in range(8):  # spread hot occurrences over shards
        did += 1
        docs.append((did, " ".join(["hot"] * 5), "en", "S"))
    for w in ["m1", "m2", "m3", "m4", "m5", "m6"]:
        did += 1
        docs.append((did, " ".join([w] * 6), "en", "S"))
    sing = [f"s{i}" for i in range(60)]
    for i in range(0, 60, 10):
        did += 1
        docs.append((did, " ".join(sing[i : i + 10]), "en", "S"))
    _write_docs(spark, tmp_path, docs)
    from arc_maskdata_pipeline_plugin_spark.plans.heavyhitters import (
        q_misra_gries_topk,
    )

    rows = q_misra_gries_topk(spark, str(tmp_path)).collect()
    assert rows, "summary must not be empty"
    by_term = {r["term"]: r for r in rows}
    assert "hot" in by_term, sorted(by_term)
    assert by_term["hot"]["true_count"] == 40
    for r in rows:
        assert r["bound_ok"] == 1, r
        assert 0 <= r["deficit"] <= r["bound"], r
        assert r["n_missed_heavy"] == 0, r


def test_padding_waste_sorted_beats_arrival(spark, tmp_path):
    """32 docs alternating 1-token / 100-token (B=16): arrival batches mix
    both lengths (each batch: 8×1 + 8×100 pad to 100 → waste 8·99 = 792);
    length-sorted separates them (waste 0). Exact totals asserted."""
    docs = []
    for i in range(32):
        n = 1 if i % 2 == 0 else 100
        docs.append((i + 1, " ".join(f"w{j}" for j in range(n)), "en", "S"))
    _write_docs(spark, tmp_path, docs)
    from arc_maskdata_pipeline_plugin_spark.plans.training2 import (
        q_padding_waste,
    )

    got = {
        r["policy"]: (
            r["n_batches"],
            r["real_tokens"],
            r["padded_tokens"],
            r["padding_tokens"],
            r["waste_share_fp6"],
        )
        for r in q_padding_waste(spark, str(tmp_path)).collect()
    }
    real = 16 * 1 + 16 * 100
    assert got["arrival"] == (2, real, 3200, 3200 - real, (3200 - real) * 1_000_000 // 3200)
    assert got["length_sorted"] == (2, real, real, 0, 0)
