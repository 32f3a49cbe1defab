"""Semantics tests for the round-6 operators (nonparametric stats, ML-prep,
lakehouse CDC, link prediction, retrieval eval) on constructed inputs with
hand-checked expectations — the oracle gate proves Spark/DuckDB parity;
these prove the shared semantics are the INTENDED ones.
"""

import datetime

from pyspark.sql import functions as F


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


_T0 = datetime.datetime(2024, 1, 1, 12, 0, tzinfo=datetime.timezone.utc)


def test_ks_disjoint_samples_is_one(spark, tmp_path):
    """Totally disjoint supports → D = 1 exactly (ks_fp9 = 1e9)."""
    rows = [(i, _T0, 1, "purchase", 1.0 + i, "{}") for i in range(5)]
    rows += [(10 + i, _T0, 1, "view", 100.0 + i, "{}") for i in range(7)]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats3 import q_ks_test

    r = q_ks_test(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b) == (5, 7)
    assert r.ks_fp9 == 1_000_000_000


def test_ks_identical_samples_is_zero(spark, tmp_path):
    rows = [(i, _T0, 1, "purchase", float(i % 3), "{}") for i in range(9)]
    rows += [(100 + i, _T0, 1, "view", float(i % 3), "{}") for i in range(9)]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats3 import q_ks_test

    r = q_ks_test(spark, str(tmp_path)).collect()[0]
    assert r.ks_fp9 == 0


def test_mann_whitney_hand_checked(spark, tmp_path):
    """A = {1,2,3}, B = {2,3,4}: pooled midranks 1, 2.5, 2.5, 4.5, 4.5, 6 →
    R_A = 1 + 2.5 + 4.5 = 8 → U = 8 − 3·4/2 = 2 → u2 = 4.
    Tie-corrected z = (2 − 4.5)/sqrt(nm/12·((N+1) − Σ(t³−t)/(N(N−1))))
      = −2.5/sqrt(0.75·(7 − 12/30)) = −1.1236664…
    """
    rows = [(i, _T0, 1, "purchase", float(v), "{}") for i, v in enumerate([1, 2, 3])]
    rows += [
        (10 + i, _T0, 1, "view", float(v), "{}") for i, v in enumerate([2, 3, 4])
    ]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats3 import q_mann_whitney

    r = q_mann_whitney(spark, str(tmp_path)).collect()[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.u2 == 4  # doubled U
    assert r.z_fp6 == -1123667  # floor(1e6 · −1.1236664…)


def test_chi_square_independent_is_zero(spark, tmp_path):
    """A perfectly independent 2×2 table → chi2 = 0, V = 0."""
    # 2 nations × 2 priorities, every cell = 3 orders → exp == obs
    nat = spark.createDataFrame(
        [(0, "A", 0, ""), (1, "B", 0, "")],
        ["n_nationkey", "n_name", "n_regionkey", "n_comment"],
    )
    nat.write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    cust = spark.createDataFrame(
        [(i, f"c{i}", i % 2) for i in range(4)],
        ["c_custkey", "c_name", "c_nationkey"],
    )
    cust.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    day = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (oid, oid % 4, "F", 10.0, day, ["P1", "P2"][(oid // 2) % 2])
            for oid in range(12)
        ],
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.stats3 import (
        q_chi_square_cramers_v,
    )

    r = q_chi_square_cramers_v(spark, str(tmp_path)).collect()[0]
    assert r.n == 12 and r.dof == 1
    assert r.chi2_fp6 == 0 and r.cramers_v_fp6 == 0


def test_mutual_information_independent_is_zero(spark, tmp_path):
    """lang ⟂ source (every combination equally frequent) → MI = 0 exactly
    (each cell's log argument is exactly 1, so every floored term is 0)."""
    rows = [
        (i, "text", ["en", "de"][i % 2], ["s1", "s2"][(i // 2) % 2], 4)
        for i in range(16)
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.stats3 import (
        q_mutual_information,
    )

    r = q_mutual_information(spark, str(tmp_path)).collect()[0]
    assert r.n_docs == 16 and r.n_cells == 4
    assert r.mi_fp9 == 0


def test_target_encoding_excludes_own_fold(spark, tmp_path):
    """cat X: fold 0 rows have value 10, fold 1 rows value 20 → the fold-0
    encoding must be 20 (it sees ONLY fold 1) and vice versa."""
    rows = [(0, _T0, 1, "X", 10.0, "{}"), (5, _T0, 1, "X", 10.0, "{}")]
    rows += [(1, _T0, 1, "X", 20.0, "{}"), (6, _T0, 1, "X", 20.0, "{}")]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.mlprep import (
        q_target_encoding,
    )

    out = {
        r.fold: r.oof_mean_fp6
        for r in q_target_encoding(spark, str(tmp_path)).collect()
    }
    assert out[0] == 20_000_000  # fold 0's encoding = mean of fold 1
    assert out[1] == 10_000_000


def test_woe_iv_symmetric_categories(spark, tmp_path):
    """Nation A: 30 good / 10 bad; nation B: 10 good / 30 bad →
    WoE_A = ln((30/40)/(10/40)) = ln 3, WoE_B = −ln 3, and the two IV
    contributions are equal: (0.75−0.25)·ln3 = 0.5493061…"""
    nat = spark.createDataFrame(
        [(0, "A", 0, ""), (1, "B", 0, "")],
        ["n_nationkey", "n_name", "n_regionkey", "n_comment"],
    )
    nat.write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    sup = spark.createDataFrame(
        [(0, "sA", 0), (1, "sB", 1)], ["s_suppkey", "s_name", "s_nationkey"]
    )
    sup.write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    rows = [(i, 0, 0, "N" if i < 30 else "R") for i in range(40)]
    rows += [(100 + i, 0, 1, "N" if i < 10 else "R") for i in range(40)]
    li = spark.createDataFrame(
        rows, ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag"]
    )
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.mlprep import q_woe_iv

    out = {
        r.supplier_nation: r
        for r in q_woe_iv(spark, str(tmp_path)).collect()
    }
    ln3_fp9 = 1_098_612_288  # floor(1e9 · ln 3)
    assert out["A"].woe_fp9 == ln3_fp9
    assert out["B"].woe_fp9 == -ln3_fp9 - 1  # floor of the negative
    assert out["A"].iv_term_fp9 == 549_306_144  # floor(0.5 · ln3 · 1e9)


def test_calibration_perfect_and_ece(spark, tmp_path):
    """Prices 0..99 (pred = p/99 after min-max), status F iff p >= 50:
    bins 0-4 have acc 0, bins 5-9 acc 1e6; ECE is the n-weighted mean of
    |acc − conf| over bins — verified against a direct recomputation."""
    day = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (i, 0, "F" if i >= 50 else "O", float(i), day, "P")
            for i in range(100)
        ],
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.mlprep import (
        q_calibration_ece,
    )

    rows = q_calibration_ece(spark, str(tmp_path)).collect()
    assert len(rows) == 10
    by_bin = {r.bin: r for r in rows}
    assert all(by_bin[b].acc_fp6 == 0 for b in range(5))
    assert all(by_bin[b].acc_fp6 == 1_000_000 for b in range(5, 10))
    expect_ece = sum(abs(r.acc_fp6 - r.conf_fp6) * r.n for r in rows) // 100
    assert rows[0].ece_fp6 == expect_ece


def test_url_canonicalization_clusters(spark, tmp_path):
    """Docs differing only in scheme case, default port, utm params,
    trailing slash, and fragment collapse to one canonical URL."""
    rows = [(i, "t", "en", "alpha", 1) for i in range(8)]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.mlprep import (
        q_url_canonical_dedup,
    )

    out = q_url_canonical_dedup(spark, str(tmp_path)).collect()
    # doc_ids 0..7 share source 'alpha' and path doc_id%40 = doc_id, so no
    # two share a path — EXCEPT canonical forms ignore scheme case/port/
    # fragment/utm, which differ within the same doc_id only. So no dupes
    # here; now force collisions on path by doc_id spacing of 40.
    assert out == []
    rows = [(40 * i, "t", "en", "alpha", 1) for i in range(4)]  # path '/Articles/0'
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = q_url_canonical_dedup(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_docs == 4 and r.canonical_doc_id == 0
    assert r.canonical_url == (
        "https://alpha.example.com/Articles/0?ref=rss"
    )


def test_cdc_apply_last_writer_and_tombstones(spark, tmp_path):
    """3 customers: #1 gets two updates (later one wins), #2 gets an update
    then a tombstone-eligible 'P' order with key%7==0 LAST (deleted),
    #3 untouched."""
    cust = spark.createDataFrame(
        [(1, "a", 100.0), (2, "b", 200.0), (3, "c", 300.0)],
        ["c_custkey", "c_name", "c_acctbal"],
    )
    cust.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    d1 = datetime.datetime(2024, 1, 1)
    d2 = datetime.datetime(2024, 2, 1)
    orders = spark.createDataFrame(
        [
            (10, 1, "F", 111.0, d1, "P"),
            (11, 1, "F", 999.0, d2, "P"),  # later → wins for #1
            (12, 2, "F", 555.0, d1, "P"),
            (14, 2, "P", 0.0, d2, "P"),  # 14 % 7 == 0, status P → delete #2
        ],
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.lakeops import q_cdc_apply

    r = q_cdc_apply(spark, str(tmp_path)).collect()[0]
    assert (r.n_live, r.n_deleted, r.n_updated, r.n_untouched) == (2, 1, 1, 1)
    assert r.live_balance == 999.0 + 300.0


def test_adamic_adar_hand_checked(spark, tmp_path):
    """Orders {s1,s2}, {s1,s2,s3}: pair (1,2) scores 1/ln2 + 1/ln3; pairs
    (1,3) and (2,3) score 1/ln3 each. Degree-1 orders contribute nothing."""
    rows = [(10, 0, 1), (10, 0, 2), (20, 0, 1), (20, 0, 2), (20, 0, 3), (30, 0, 9)]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey", "l_suppkey"])
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.graph import q_adamic_adar

    out = {(r.s1, r.s2): r for r in q_adamic_adar(spark, str(tmp_path)).collect()}
    w2 = 1_442_695_040  # floor(1e9 / ln 2)
    w3 = 910_239_226  # floor(1e9 / ln 3)
    assert out[(1, 2)].aa_fp9 == w2 + w3 and out[(1, 2)].n_common == 2
    assert out[(1, 3)].aa_fp9 == w3
    assert out[(2, 3)].aa_fp9 == w3
    assert all(r.dropped_orders == 0 for r in out.values())


def test_adamic_adar_degree_cap_drops_mega_order(spark, tmp_path):
    """An order with > _AA_MAX_DEG suppliers is excluded from pair
    enumeration and counted in the audit column."""
    from arc_maskdata_pipeline_plugin_spark.plans.graph import _AA_MAX_DEG

    rows = [(10, 0, s) for s in range(_AA_MAX_DEG + 5)]  # viral order
    rows += [(20, 0, 1), (20, 0, 2)]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey", "l_suppkey"])
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.graph import q_adamic_adar

    out = q_adamic_adar(spark, str(tmp_path)).collect()
    assert len(out) == 1  # only the (1,2) pair from order 20
    assert out[0].dropped_orders == 1


def test_mrr_first_hit_rank_one(spark, tmp_path):
    """A corpus where exactly one doc repeats a query's terms: that doc
    ranks first for the query and rr_fp9 = 1e9; docs without >= 2 term
    occurrences are not counted relevant."""
    rows = [
        (1, "hash join hash join hash join", "en", "s", 10),
        (2, "completely unrelated words here", "en", "s", 10),
        (3, "window agg window agg", "en", "s", 10),
        (4, "filler text filler filler", "en", "s", 10),
    ]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.search import (
        q_mrr_recall_eval,
    )

    out = {r.query_id: r for r in q_mrr_recall_eval(spark, str(tmp_path)).collect()}
    # query 1 = 'hash join' → doc 1 is the only relevant doc and ranks 1st
    assert out[1].n_rel == 1 and out[1].hits_at_k == 1
    assert out[1].rr_fp9 == 1_000_000_000
    assert out[1].recall_fp6 == 1_000_000
    # query 2 = 'window agg' → doc 3
    assert out[2].rr_fp9 == 1_000_000_000


def test_dp_quantile_lands_near_true_median(spark, tmp_path):
    """Uniform prices 0..6399 → true median 3199.5; Laplace(1) noise on
    64 uniform bins of 100 count each moves the noisy CDF crossing by at
    most a bin or two. The noise is deterministic (md5-seeded), so this is
    a stable assertion, not a flaky statistical one."""
    day = datetime.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(i, 0, "F", float(i), day, "P") for i in range(6400)],
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.privacy import q_dp_quantile

    r = q_dp_quantile(spark, str(tmp_path)).collect()[0]
    assert r.n == 6400
    assert 30 <= r.dp_median_bin <= 33  # true crossing is bin 31/32
    # released edge within 2 bin widths (200) of the true median
    assert abs(r.dp_median_hi_cents / 100.0 - 3199.5) <= 250


def test_schema_drift_flags_enum_growth(spark, tmp_path):
    """Old era: 2 statuses; new era: 4 statuses → o_orderstatus drift flag
    fires; o_orderpriority (constant cardinality) does not."""
    old_day = datetime.datetime(2000, 1, 1)
    new_day = datetime.datetime(2002, 1, 1)
    rows = [(i, i, ["A", "B"][i % 2], 1.0, old_day, "P1") for i in range(20)]
    rows += [
        (100 + i, i, ["A", "B", "C", "D"][i % 4], 1.0, new_day, "P1")
        for i in range(20)
    ]
    orders = spark.createDataFrame(
        rows,
        [
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        ],
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.quality import (
        q_schema_drift_audit,
    )

    out = {
        r.column_name: r
        for r in q_schema_drift_audit(spark, str(tmp_path)).collect()
    }
    assert out["o_orderstatus"].old_distinct == 2
    assert out["o_orderstatus"].new_distinct == 4
    assert out["o_orderstatus"].distinct_drift_flag == 1
    assert out["o_orderpriority"].distinct_drift_flag == 0
    assert out["o_orderstatus"].old_n == 20 and out["o_orderstatus"].new_n == 20


def test_rbo_weights_and_bounds():
    """The fp9 weight table sums to ~1e9·(1−p^10) (truncated RBO mass —
    the max score, reached by identical rankings: X_d = d makes each term
    floor(d·w9/d) = w9)."""
    from arc_maskdata_pipeline_plugin_spark.plans.search2 import (
        _RBO_P,
        _RBO_W9,
    )

    assert len(_RBO_W9) == 10
    total = sum(_RBO_W9)
    expect = 1_000_000_000 * (1 - _RBO_P**10)
    assert abs(total - expect) <= 10  # per-term floors lose < 1 each
    assert all(w > 0 for w in _RBO_W9)
    assert _RBO_W9 == sorted(_RBO_W9, reverse=True)  # top-weighted


def test_rbo_on_fixture_corpus(spark):
    """At sf0.001 both rankers run for all 5 queries: RBO is bounded by the
    full truncated mass and overlap_at_10 by the depth."""
    from arc_maskdata_pipeline_plugin_spark.plans.search2 import (
        _RBO_W9,
        q_rank_biased_overlap,
    )

    rows = q_rank_biased_overlap(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.overlap_at_10 <= 10
        assert 0 <= r.rbo_fp9 <= sum(_RBO_W9)


def test_kmv_exact_when_sketch_not_full(spark, tmp_path):
    """Fewer distinct users than k: the sketch IS the set → estimate exact,
    merge agrees, error 0."""
    rows = [(i, _T0 + datetime.timedelta(days=i % 3), i % 20, "view", 1.0, "{}")
            for i in range(200)]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats3 import (
        q_kmv_distinct_merge,
    )

    r = q_kmv_distinct_merge(spark, str(tmp_path)).collect()[0]
    assert r.exact_distinct == 20 and r.n_days == 3
    assert r.kmv_direct == 20 and r.kmv_merged == 20
    assert r.merge_agrees == 1 and r.err_pct_fp4 == 0


def test_kmv_estimates_and_merges_when_full(spark, tmp_path):
    """600 distinct users over 5 days: the k=64 sketch estimates within
    KMV's deterministic error (md5-seeded, so this is a stable value), and
    the merged-daily estimate equals the direct one exactly."""
    rows = [
        (i, _T0 + datetime.timedelta(days=i % 5), i % 600, "view", 1.0, "{}")
        for i in range(3000)
    ]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats3 import (
        q_kmv_distinct_merge,
    )

    r = q_kmv_distinct_merge(spark, str(tmp_path)).collect()[0]
    assert r.exact_distinct == 600 and r.n_days == 5
    assert r.merge_agrees == 1
    assert r.kmv_direct == r.kmv_merged
    # ~1/sqrt(64) relative error regime; generous deterministic bound
    assert r.err_pct_fp4 < 4000


def test_geo_candidates_match_python_brute_force(spark, tmp_path):
    """The candidate contract: n_within_radius equals the Python
    brute-force count of pairs within 100 km AND within the 3×3 cell
    neighborhood (the documented recall definition)."""
    import math

    cust = spark.createDataFrame(
        [(k, f"c{k}", 0) for k in range(1, 400)],
        ["c_custkey", "c_name", "c_nationkey"],
    )
    cust.write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    supp = spark.createDataFrame(
        [(k, f"s{k}", 0) for k in range(1, 80)],
        ["s_suppkey", "s_name", "s_nationkey"],
    )
    supp.write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))

    def cloc(k):
        return ((k * 2654435761) % 1700000) / 10000.0 - 85.0, (
            (k * 40503) % 3600000
        ) / 10000.0 - 180.0

    def sloc(k):
        return (((k * 97 + 13) * 2654435761) % 1700000) / 10000.0 - 85.0, (
            ((k * 97 + 13) * 40503) % 3600000
        ) / 10000.0 - 180.0

    def hav(a, b):
        (la1, lo1), (la2, lo2) = a, b
        r = 6371000.0
        h = (
            math.sin(math.radians(la2 - la1) / 2) ** 2
            + math.cos(math.radians(la1))
            * math.cos(math.radians(la2))
            * math.sin(math.radians(lo2 - lo1) / 2) ** 2
        )
        return 2 * r * math.asin(math.sqrt(h))

    expected = 0
    for ck in range(1, 400):
        for sk in range(1, 80):
            c, s = cloc(ck), sloc(sk)
            adj = (
                abs(math.floor(c[0]) - math.floor(s[0])) <= 1
                and abs(math.floor(c[1]) - math.floor(s[1])) <= 1
            )
            if adj and hav(c, s) <= 100_000:
                expected += 1

    from arc_maskdata_pipeline_plugin_spark.plans.geo import (
        q_geo_proximity_join,
    )

    r = q_geo_proximity_join(spark, str(tmp_path)).collect()[0]
    assert r.n_within_radius == expected
    assert r.n_candidates >= r.n_within_radius


def test_graph_jaccard_hand_checked(spark, tmp_path):
    """Orders {1,2}, {1,2,3}: N(1)={10,20}, N(2)={10,20}, N(3)={20}.
    J(1,2) = 2/(2+2-2) = 1.0; J(1,3) = 1/(2+1-1) = 0.5; J(2,3) = 0.5."""
    rows = [(10, 0, 1), (10, 0, 2), (20, 0, 1), (20, 0, 2), (20, 0, 3)]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey", "l_suppkey"])
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.graph import (
        q_graph_jaccard_similarity,
    )

    out = {
        (r.s1, r.s2): r
        for r in q_graph_jaccard_similarity(spark, str(tmp_path)).collect()
    }
    assert out[(1, 2)].jaccard_fp6 == 1_000_000
    assert out[(1, 2)].n_common == 2 and out[(1, 2)].n_union == 2
    assert out[(1, 3)].jaccard_fp6 == 500_000
    assert out[(2, 3)].jaccard_fp6 == 500_000


def test_bonferroni_screen_flags_only_real_effect(spark, tmp_path):
    """Type A has a large cohort effect, type B none: A is significant
    even at the Bonferroni-corrected threshold, B at neither."""
    rows = []
    eid = 0
    for i in range(60):
        u = i % 20  # even users -> cohort 0
        base = 1.0 if u % 2 == 0 else 2.0
        rows.append((eid, _T0, u, "A", base + 0.2 * ((i // 20) % 2), "{}"))
        eid += 1
    for i in range(60):
        u = i % 20
        rows.append((eid, _T0, u, "B", 5.0 + 0.4 * ((i // 20) % 2), "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats3 import (
        q_bonferroni_ab_screen,
    )

    out = {
        r.event_type: r
        for r in q_bonferroni_ab_screen(spark, str(tmp_path)).collect()
    }
    assert out["A"].n_comparisons == 2 and out["B"].n_comparisons == 2
    assert out["A"].sig_raw == 1 and out["A"].sig_bonferroni == 1
    assert out["B"].sig_raw == 0 and out["B"].sig_bonferroni == 0


def test_watermark_lateness_hand_checked(spark, tmp_path):
    """Arrival sequence t0, +10s, +5s, +20s, +15s: the two out-of-order
    events are each 5s late; p50 = 0, p95 = max = 5."""
    offs = [0, 10, 5, 20, 15]
    rows = [
        (i, _T0 + datetime.timedelta(seconds=s), 1, "buy", 1.0, "{}")
        for i, s in enumerate(offs)
    ]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.streaming_queries import (
        q_watermark_lateness_audit,
    )

    r = q_watermark_lateness_audit(spark, str(tmp_path)).collect()[0]
    assert r.n_events == 5 and r.n_late == 2
    assert r.p50_late_s == 0
    assert r.p95_late_s == 5 and r.max_late_s == 5


def test_bonferroni_degenerate_metric_is_null_not_error(spark, tmp_path):
    """Zero variance in both cohorts: no z exists — the screen emits NULL
    and flags 0 instead of ANSI divide-by-zero."""
    rows = [(i, _T0, i % 4, "C", 7.0, "{}") for i in range(40)]
    _write_events(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.stats3 import (
        q_bonferroni_ab_screen,
    )

    r = q_bonferroni_ab_screen(spark, str(tmp_path)).collect()[0]
    assert r.z_fp6 is None
    assert r.sig_raw == 0 and r.sig_bonferroni == 0
