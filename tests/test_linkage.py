"""Fellegi-Sunter EM linkage (plans/linkage.py): the fixed-point EM
against an independent FLOAT EM on separated constructed data (the fp9
discretization must track real EM), planted-duplicate recovery, and
degenerate inputs."""

from __future__ import annotations

import arc_maskdata_pipeline_plugin_spark.plans.linkage as lk

CUST_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey long, c_acctbal double, "
    "c_mktsegment string"
)


def _float_em(counts, iters=lk._ITERS, k=lk._K):
    """Independent float EM — same init, same schedule, real arithmetic."""
    m = [0.9] * k
    u = [0.1] * k
    p = 0.1
    bits = {g: [(g >> (3 - j)) & 1 for j in range(k)] for g in range(16)}

    def post(p, m, u):
        w = {}
        for g in range(16):
            pm = pu = 1.0
            for j in range(k):
                pm *= m[j] if bits[g][j] else 1 - m[j]
                pu *= u[j] if bits[g][j] else 1 - u[j]
            w[g] = p * pm / max(p * pm + (1 - p) * pu, 1e-300)
        return w

    for _ in range(iters):
        w = post(p, m, u)
        cw = sum(counts.get(g, 0) * w[g] for g in range(16))
        cl = sum(counts.get(g, 0) * (1 - w[g]) for g in range(16))
        tot = sum(counts.values()) or 1
        for j in range(k):
            m[j] = sum(
                counts.get(g, 0) * w[g] for g in range(16) if bits[g][j]
            ) / max(cw, 1e-300)
            u[j] = sum(
                counts.get(g, 0) * (1 - w[g]) for g in range(16) if bits[g][j]
            ) / max(cl, 1e-300)
        p = cw / tot
    return p, m, u, post(p, m, u)


def test_fixed_point_tracks_float_em():
    # well-separated mixture: 100 all-agree pairs (dup clusters) + 2000
    # pairs agreeing on ~1 random field
    counts = {15: 100, 0: 1200, 8: 220, 4: 200, 2: 190, 1: 190}
    p_i, m_i, u_i, w_i = lk._em_fixed_point(counts)
    p_f, m_f, u_f, w_f = _float_em(counts)
    assert abs(p_i / lk._FP - p_f) < 1e-3
    for a, b in zip(m_i, m_f):
        assert abs(a / lk._FP - b) < 1e-3
    for g in counts:
        assert abs(w_i[g] / lk._FP - w_f[g]) < 1e-3
    # the all-agree pattern is confidently matched; all-disagree is not
    assert w_i[15] > lk._FP * 9 // 10
    assert w_i[0] < lk._FP // 10


def _run(spark, rows):
    orig = lk.T
    try:
        lk.T = lambda sp, sf, name: sp.createDataFrame(rows, CUST_SCHEMA)
        return {
            r["pattern_id"]: r
            for r in lk.q_fellegi_sunter_linkage(spark, "x").collect()
        }
    finally:
        lk.T = orig


def test_planted_duplicates_recovered(spark):
    # 30 duplicate pairs (identical on all four fields, same nation) + 600
    # singletons with varied fields -> EM must assign the all-agree
    # pattern a high posterior and decide_match=1
    rows = []
    kid = 0
    for i in range(30):
        for _rep in range(2):  # a duplicate pair
            rows.append(
                (kid, f"Customer#x{i % 7}", 1, 100.0 * i + 0.07,
                 ["AUTOMOBILE", "BUILDING", "MACHINERY"][i % 3])
            )
            kid += 1
    for i in range(600):
        rows.append(
            (kid, f"Customer#y{i % 10}", 2, 17.23 * i + (i % 97) * 0.01,
             ["AUTOMOBILE", "BUILDING", "MACHINERY", "FURNITURE",
              "HOUSEHOLD"][i % 5])
        )
        kid += 1
    got = _run(spark, rows)
    assert set(got) == set(range(16))  # full grid, zero-filled
    assert got[15]["n_pairs"] >= 30
    assert got[15]["decide_match"] == 1
    assert got[0]["decide_match"] == 0
    assert 0 < got[15]["p_fp9"] < lk._FP


def test_empty_and_tiny_inputs(spark):
    got = _run(spark, [])
    assert set(got) == set(range(16))
    assert all(r["n_pairs"] == 0 for r in got.values())
    # single customer: no pairs, still a full deterministic grid
    got1 = _run(spark, [(1, "Customer#1", 1, 5.0, "AUTOMOBILE")])
    assert all(r["n_pairs"] == 0 for r in got1.values())


def _run_fn(spark, rows, fn):
    orig = lk.T
    try:
        lk.T = lambda sp, sf, name: sp.createDataFrame(rows, CUST_SCHEMA)
        return fn(spark, "x").collect()
    finally:
        lk.T = orig


def _planted_rows():
    rows = []
    kid = 0
    for i in range(30):
        for _rep in range(2):
            rows.append(
                (kid, f"Customer#x{i % 7}", 1, 100.0 * i + 0.07,
                 ["AUTOMOBILE", "BUILDING", "MACHINERY"][i % 3])
            )
            kid += 1
    for i in range(600):
        rows.append(
            (kid, f"Customer#y{i % 10}", 2, 17.23 * i + (i % 97) * 0.01,
             ["AUTOMOBILE", "BUILDING", "MACHINERY", "FURNITURE",
              "HOUSEHOLD"][i % 5])
        )
        kid += 1
    return rows


def test_decisions_recover_planted_duplicates(spark):
    # the 30 planted all-agree pairs must come out in the 'link' zone with
    # consecutive custkeys (kid, kid+1); random singleton pairs must not
    # all be links
    got = _run_fn(spark, _planted_rows(), lk.q_fs_linkage_decisions)
    links = [r for r in got if r["zone"] == "link"]
    link_keys = {(r["custkey_a"], r["custkey_b"]) for r in links}
    for i in range(30):
        assert (2 * i, 2 * i + 1) in link_keys
    assert all(
        r["zone"] in ("link", "possible", "nonlink") for r in got
    )
    # posterior consistent with zone
    for r in got:
        if r["zone"] == "link":
            assert r["posterior_fp9"] * 2 > lk._FP
        elif r["zone"] == "possible":
            assert r["posterior_fp9"] * 10 > lk._FP >= r["posterior_fp9"] * 2
        else:
            assert r["posterior_fp9"] * 10 <= lk._FP
    assert len(got) < len(_planted_rows()) ** 2  # blocked, not cross-joined


def test_decisions_empty_input(spark):
    assert _run_fn(spark, [], lk.q_fs_linkage_decisions) == []


def test_block_cap_drops_and_audits(spark, monkeypatch):
    # shrink the cap so the 600-row singleton block is dropped: the audit
    # columns must report it and its pairs must vanish from both outputs
    monkeypatch.setattr(lk, "_MAX_BLOCK_ROWS", 100)
    rows = _planted_rows()
    grid = {
        r["pattern_id"]: r
        for r in _run_fn(spark, rows, lk.q_fellegi_sunter_linkage)
    }
    assert all(r["n_dropped_blocks"] == 1 for r in grid.values())
    assert all(r["n_dropped_rows"] == 600 for r in grid.values())
    # only the 60-row duplicate block survives: 60*59/2 pairs
    assert sum(r["n_pairs"] for r in grid.values()) == 60 * 59 // 2
    dec = _run_fn(spark, rows, lk.q_fs_linkage_decisions)
    assert len(dec) == 60 * 59 // 2
    assert all(r["custkey_a"] < 60 and r["custkey_b"] < 60 for r in dec)


def test_no_drops_audit_is_zero(spark):
    grid = _run_fn(spark, _planted_rows(), lk.q_fellegi_sunter_linkage)
    assert all(r["n_dropped_blocks"] == 0 for r in grid)
    assert all(r["n_dropped_rows"] == 0 for r in grid)


def test_review_queue_cases(spark):
    # planted duplicates form 2-record cases (plus whatever the block's
    # cross-pairs link transitively); verify histogram consistency and
    # that totals are internally coherent
    rows = _planted_rows()
    got = _run_fn(spark, rows, lk.q_fs_review_queue)
    assert got, "expected a non-empty review queue on planted duplicates"
    n_cases = got[0]["n_cases"]
    n_records = got[0]["n_records"]
    assert all(r["n_cases"] == n_cases for r in got)
    assert sum(r["n_cases_of_size"] for r in got) == n_cases
    assert sum(r["case_size"] * r["n_cases_of_size"] for r in got) == n_records
    assert all(r["case_size"] >= 2 for r in got)  # every case has >= 1 pair
    assert got[0]["n_review_pairs"] >= 30  # the planted pairs review


def test_review_queue_empty_input(spark):
    assert _run_fn(spark, [], lk.q_fs_review_queue) == []
