"""Semantics tests for the round-4 additions: containment near-dup,
duplicated-span coverage (ExactSubstr shape), corpus-drift KL, event
transitions, gap-aware EWMA, and the compaction planner.

Engine parity for all six is proven by the oracle gate
(tools/oracle_check.py); these tests pin the SEMANTICS on constructed
inputs with hand-computable answers.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
    containment_pairs,
    duplicated_spans,
    word_shingles,
)


# ---------------------------------------------------------------------------
# containment (overlap coefficient)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def contain_docs(spark):
    small = "alpha beta gamma delta epsilon zeta"
    big = small + " eta theta iota kappa " + "filler " * 30
    return spark.createDataFrame(
        [
            (1, small),  # fully contained in 2
            (2, big),
            (3, "totally unrelated words about query engines and shuffles"),
        ],
        ["doc_id", "text"],
    )


def test_containment_catches_doc_inside_doc(contain_docs):
    sh = word_shingles(contain_docs, distinct=False)
    rows = containment_pairs(sh, threshold=0.9).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.d1, r.d2) == (1, 2)
    assert r.contained_id == 1  # the smaller side is the contained one
    assert r.containment == 1.0  # every shingle of 1 appears in 2


def test_jaccard_would_miss_the_same_pair(contain_docs):
    from arc_maskdata_pipeline_plugin_spark.operators.dedup import jaccard_pairs

    sh = word_shingles(contain_docs, distinct=False)
    assert jaccard_pairs(sh, threshold=0.5).count() == 0


# ---------------------------------------------------------------------------
# duplicated spans
# ---------------------------------------------------------------------------


def test_duplicated_spans_coverage_and_islands(spark):
    shared = "one two three four five six seven eight"  # 8 tokens, one span
    docs = spark.createDataFrame(
        [
            (1, f"{shared} filler9 filler10"),
            (2, f"prefix0 {shared}"),
            (3, "nothing in common with the others at all ok"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in duplicated_spans(docs, n=8).collect()}
    assert set(out) == {1, 2}
    assert out[1].dup_tokens == 8 and out[1].n_islands == 1
    assert out[2].dup_tokens == 8 and out[2].n_islands == 1
    assert out[1].n_tokens == 10
    assert out[1].dup_ppm == math.floor(8 * 1_000_000 / 10)


def test_duplicated_spans_merges_overlaps(spark):
    # 10 shared tokens -> three overlapping 8-spans in each doc; coverage
    # must count the UNION (10 tokens), not 3x8.
    shared = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    docs = spark.createDataFrame(
        [(1, shared + " x y z"), (2, "p q " + shared)],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in duplicated_spans(docs, n=8).collect()}
    assert out[1].dup_tokens == 10 and out[1].n_islands == 1
    assert out[2].dup_tokens == 10 and out[2].n_islands == 1


def test_duplicated_spans_two_islands(spark):
    s1 = "b1 b2 b3 b4 b5 b6 b7 b8"
    s2 = "c1 c2 c3 c4 c5 c6 c7 c8"
    gap = "g1 g2 g3 g4 g5"
    docs = spark.createDataFrame(
        [(1, f"{s1} {gap} {s2}"), (2, s1), (3, s2)],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in duplicated_spans(docs, n=8).collect()}
    assert out[1].n_islands == 2 and out[1].dup_tokens == 16
    # within-doc repetition alone must NOT flag (needs >=2 distinct docs)
    solo = spark.createDataFrame(
        [(1, f"{s1} {s1}"), (2, "unrelated " * 10)], ["doc_id", "text"]
    )
    assert duplicated_spans(solo, n=8).filter(F.col("doc_id") == 2).count() == 0


# ---------------------------------------------------------------------------
# corpus drift KL
# ---------------------------------------------------------------------------


def test_corpus_drift_kl_orders_sources_by_skew(spark, tmp_path, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.search2 import q_corpus_drift_kl

    rows = {r.source: r for r in q_corpus_drift_kl(spark, sf_medium).collect()}
    assert len(rows) == 20
    # KL >= 0 up to fp9 flooring (each term floored -> sum can dip slightly
    # below zero by at most one ulp per term; vocab=200 -> bound -200)
    assert all(r.kl_fp9 >= -200 for r in rows.values())
    assert all(r.n_tokens > 0 for r in rows.values())


def test_corpus_drift_kl_zero_for_identical_distribution(spark):
    # two sources with IDENTICAL token multisets -> smoothed distributions
    # still differ from the pooled corpus only via flooring; both KLs equal.
    docs = spark.createDataFrame(
        [(1, "x y z x", "s1"), (2, "x y z x", "s2")],
        ["doc_id", "text", "source"],
    )
    docs.createOrReplaceTempView("ignored")  # not used; direct call below
    from arc_maskdata_pipeline_plugin_spark.plans import search2

    # re-run the pipeline body on the tiny frame via a monkeypatched T
    import arc_maskdata_pipeline_plugin_spark.plans.registry as reg

    orig_t = reg.T
    try:
        reg.T = lambda sp, sf, name: docs  # noqa: ARG005
        search2.T = reg.T
        out = {r.source: r.kl_fp9 for r in search2.q_corpus_drift_kl(spark, "x").collect()}
    finally:
        reg.T = orig_t
        search2.T = orig_t
    assert out["s1"] == out["s2"]


# ---------------------------------------------------------------------------
# event transitions
# ---------------------------------------------------------------------------


def test_event_transitions_counts_and_ppm(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: a -> b -> a
        (1, base, 1, "a"),
        (2, base + dt.timedelta(minutes=1), 1, "b"),
        (3, base + dt.timedelta(minutes=2), 1, "a"),
        # user 2: a -> b
        (4, base, 2, "a"),
        (5, base + dt.timedelta(minutes=1), 2, "b"),
    ]
    events = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])

    import arc_maskdata_pipeline_plugin_spark.plans.registry as reg
    from arc_maskdata_pipeline_plugin_spark.plans import behavior

    orig_t = reg.T
    try:
        behavior.T = lambda sp, sf, name: events  # noqa: ARG005
        out = {
            (r.prev_type, r.event_type): (r.n, r.prob_ppm)
            for r in behavior.q_event_transitions(spark, "x").collect()
        }
    finally:
        behavior.T = orig_t
    assert out[("a", "b")] == (2, 1_000_000)  # a always goes to b
    assert out[("b", "a")] == (1, 1_000_000)
    assert ("a", "a") not in out


# ---------------------------------------------------------------------------
# EWMA
# ---------------------------------------------------------------------------


def test_ewma_decays_toward_recent_values(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.timeseries import (
        _EWMA_ALPHA,
        _EWMA_W,
        q_ewma_daily_value,
    )

    # weight table sanity: strictly decreasing, ~alpha at k=0, sums < 1e12
    assert _EWMA_W[0] == int(_EWMA_ALPHA * 1e12)
    assert all(a > b for a, b in zip(_EWMA_W, _EWMA_W[1:]))
    assert sum(_EWMA_W) < 1_000_000_000_000

    out = q_ewma_daily_value(spark, sf_medium)
    rows = out.filter(F.col("event_type") == "purchase").orderBy("day").collect()
    assert len(rows) == 30
    # first day: ewma = alpha * value (only one term in the window)
    first = rows[0]
    expected = _EWMA_W[0] * first.cents / 1e14
    assert abs(first.ewma - expected) < 1e-9
    # exact recomputation from the weight table (gap-aware by calendar day)
    import datetime as dt

    cents = {dt.date.fromisoformat(r.day): r.cents for r in rows}
    for r in rows:
        day = dt.date.fromisoformat(r.day)
        acc = sum(
            _EWMA_W[k] * cents.get(day - dt.timedelta(days=k), 0)
            for k in range(len(_EWMA_W))
        )
        assert r.ewma == acc / 1e14


# ---------------------------------------------------------------------------
# compaction planner
# ---------------------------------------------------------------------------


def test_compaction_bins_respect_target(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.layout import (
        _COMPACT_TARGET,
        q_compaction_plan,
    )

    plan = q_compaction_plan(spark, sf_medium).collect()
    docs_n = 500
    assert sum(r.n_files for r in plan) == docs_n  # every file assigned once
    for r in plan:
        # next-fit invariant: a bin only exceeds target by less than its
        # last file's size -> strictly less than target + max file size
        assert r.bin_bytes < _COMPACT_TARGET + 553 + 1
        assert r.first_id <= r.last_id
    # bins within a source are contiguous, non-overlapping id ranges
    by_src: dict[str, list] = {}
    for r in plan:
        by_src.setdefault(r.source, []).append(r)
    for src, bins in by_src.items():
        bins.sort(key=lambda r: r.bin_id)
        for a, b in zip(bins, bins[1:]):
            assert a.last_id < b.first_id


# ---------------------------------------------------------------------------
# t-closeness
# ---------------------------------------------------------------------------


def test_t_closeness_flags_skewed_class(spark):
    from arc_maskdata_pipeline_plugin_spark.operators.privacy import t_closeness_audit

    # global: 50/50 A,B.  class g1 mirrors it (tvd 0); class g2 is all-A
    # (tvd 0.5) -> fails t=0.3 even though it is k-anonymous and l-diverse
    # would pass l=1.
    rows = (
        [("g1", "A")] * 5 + [("g1", "B")] * 5 + [("g2", "A")] * 5 + [("g2", "B")] * 0
        + [("g3", "B")] * 5
    )
    df = spark.createDataFrame(rows, ["qi", "s"])
    out = {r.qi: r for r in t_closeness_audit(df, ["qi"], "s", 300_000_000).collect()}
    assert out["g1"].tvd_fp9 == 0 and out["g1"].is_t_close
    assert out["g2"].tvd_fp9 == 500_000_000 and not out["g2"].is_t_close
    assert out["g3"].tvd_fp9 == 500_000_000 and not out["g3"].is_t_close


# ---------------------------------------------------------------------------
# table fingerprint
# ---------------------------------------------------------------------------


def test_table_fingerprint_order_insensitive_and_sensitive_to_change(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.quality import q_table_fingerprint

    base = {r.o_orderstatus: r.checksum for r in q_table_fingerprint(spark, sf_medium).collect()}
    # recompute over a reshuffled scan -> identical checksums (SUM is
    # order-insensitive by construction)
    again = {r.o_orderstatus: r.checksum for r in q_table_fingerprint(spark, sf_medium).collect()}
    assert base == again and len(base) == 3

    # a single-row mutation must change exactly the touched partition's sum
    import arc_maskdata_pipeline_plugin_spark.plans.quality as qmod
    import arc_maskdata_pipeline_plugin_spark.plans.registry as reg

    orig_t = reg.T
    o = orig_t(spark, sf_medium, "orders")
    from pyspark.sql import functions as SF

    mutated = o.withColumn(
        "o_custkey",
        SF.when(SF.col("o_orderkey") == o.select(SF.min("o_orderkey")).collect()[0][0],
                SF.col("o_custkey") + 1).otherwise(SF.col("o_custkey")),
    )
    try:
        qmod.T = lambda sp, sf, name: mutated  # noqa: ARG005
        changed = {r.o_orderstatus: r.checksum for r in q_table_fingerprint(spark, "x").collect()}
    finally:
        qmod.T = orig_t
    assert sum(1 for k in base if base[k] != changed[k]) == 1


# ---------------------------------------------------------------------------
# n-gram diversity
# ---------------------------------------------------------------------------


def test_ngram_diversity_detects_repetition(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.search2 as s2

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam", "looped"),
            (2, "one two three four five six", "fresh"),
        ],
        ["doc_id", "text", "source"],
    )
    orig_t = s2.T
    try:
        s2.T = lambda sp, sf, name: docs  # noqa: ARG005
        out = {r.source: r for r in s2.q_ngram_diversity(spark, "x").collect()}
    finally:
        s2.T = orig_t
    assert out["looped"].total_bigrams == 5 and out["looped"].distinct_bigrams == 1
    assert out["looped"].distinct_ratio_fp6 == 200_000
    assert out["fresh"].distinct_ratio_fp6 == 1_000_000


# ---------------------------------------------------------------------------
# weighted sampling (A-ES)
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_reference_computation(spark, sf_medium):
    import hashlib

    from arc_maskdata_pipeline_plugin_spark.plans.training import (
        _WS_K,
        q_weighted_sample,
    )

    rows = q_weighted_sample(spark, sf_medium).collect()
    assert len(rows) == _WS_K
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(range(1, _WS_K + 1))

    # independent Python reimplementation of the A-ES key
    import duckdb

    inv = duckdb.connect().execute(
        "SELECT doc_id, n_chars FROM read_parquet(?)",
        [f"{sf_medium}/documents.parquet"],
    ).fetchall()
    import math

    def key(doc_id, n_chars):
        h = hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:12]
        u = (int(h, 16) + 1) / 281474976710657.0
        return -math.log(u) / n_chars

    expect = sorted(((key(d, n), d) for d, n in inv))[:_WS_K]
    got = sorted(((r.k if hasattr(r, "k") else key(r.doc_id, r.n_chars), r.doc_id) for r in rows))
    assert [d for _, d in expect] == [d for _, d in got]

    # heavier docs are overrepresented: sampled mean size > corpus mean size
    corpus_mean = sum(n for _, n in inv) / len(inv)
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean


# ---------------------------------------------------------------------------
# HLL audience overlap
# ---------------------------------------------------------------------------


def test_hll_overlap_exact_at_small_cardinality(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.stats2 as st2

    rows = [("a", u) for u in range(100)] + [("b", u) for u in range(50, 130)]
    df = spark.createDataFrame(rows, ["event_type", "user_id"])
    orig_t = st2.T
    try:
        st2.T = lambda sp, sf, name: df  # noqa: ARG005
        out = st2.q_hll_audience_overlap(spark, "x").collect()
    finally:
        st2.T = orig_t
    assert len(out) == 1
    r = out[0]
    # HLL runs in exact (coupon) mode at this cardinality
    assert (r.type_a, r.type_b) == ("a", "b")
    assert r.est_a == 100 and r.est_b == 80 and r.est_overlap == 50


# ---------------------------------------------------------------------------
# LATERAL top-k vs window top-k
# ---------------------------------------------------------------------------


def test_lateral_topk_equals_window_topk(spark, sf_small):
    from pyspark.sql import Window

    from arc_maskdata_pipeline_plugin_spark.plans.advanced_sql import (
        q_lateral_top_orders,
    )
    from arc_maskdata_pipeline_plugin_spark.plans.registry import T

    lat = {
        (r.c_custkey, r.o_orderkey)
        for r in q_lateral_top_orders(spark, sf_small).collect()
    }
    o = T(spark, sf_small, "orders")
    c = T(spark, sf_small, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    win = {
        (r.c_custkey, r.o_orderkey)
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .collect()
    }
    assert lat == win and len(lat) > 0


# ---------------------------------------------------------------------------
# Pareto skyline
# ---------------------------------------------------------------------------


def test_pareto_dominance_semantics(spark, sf_small):
    from arc_maskdata_pipeline_plugin_spark.plans.advanced_sql import q_pareto_orders
    from arc_maskdata_pipeline_plugin_spark.plans.registry import T

    sky = q_pareto_orders(spark, sf_small).collect()
    assert len(sky) > 0
    # brute-force verification on the small SF: nothing in the skyline is
    # strictly dominated, and nothing outside it is non-dominated
    o = (
        T(spark, sf_small, "orders")
        .join(
            T(spark, sf_small, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            F.col("o_orderdate").cast("date").alias("day"),
        )
        .collect()
    )
    by_seg: dict[str, list] = {}
    for r in o:
        by_seg.setdefault(r.seg, []).append(r)
    expected = set()
    for seg, rows in by_seg.items():
        for r in rows:
            dominated = any(
                x.price > r.price and x.day > r.day for x in rows
            )
            if not dominated:
                expected.add((seg, r.o_orderkey))
    assert {(r.seg, r.o_orderkey) for r in sky} == expected


# ---------------------------------------------------------------------------
# quantile normalization
# ---------------------------------------------------------------------------


def test_quantile_normalize_equalizes_distributions(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.training import q_quantile_normalize

    rows = q_quantile_normalize(spark, sf_medium).collect()
    assert len(rows) == 500
    by_src: dict[str, list[int]] = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r.norm_chars)
    dists = {s: tuple(sorted(v)) for s, v in by_src.items()}
    # the defining property: every source ends up with the IDENTICAL
    # normalized distribution (25 docs per source here)
    assert len(set(dists.values())) == 1
    # and normalization preserves within-source order (monotone map)
    for s, vals in by_src.items():
        pairs = sorted(
            ((r.n_chars, r.doc_id, r.norm_chars) for r in rows if r.source == s)
        )
        norms = [p[2] for p in pairs]
        assert norms == sorted(norms)


# ---------------------------------------------------------------------------
# streaming fingerprint == batch fingerprint
# ---------------------------------------------------------------------------


def test_stream_fingerprint_matches_batch(spark, sf_small):
    from arc_maskdata_pipeline_plugin_spark.plans.registry import T
    from arc_maskdata_pipeline_plugin_spark.plans.streaming_queries import (
        q_stream_fingerprint,
    )

    streamed = {
        r.event_type: (r.n, r.checksum)
        for r in q_stream_fingerprint(spark, sf_small).collect()
    }
    e = T(spark, sf_small, "events")
    canon = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("user_id").cast("string"),
        F.col("event_type"),
    )
    fp48 = F.conv(F.substring(F.md5(canon), 1, 12), 16, 10).cast("decimal(38,0)")
    batch = {
        r.event_type: (r.n, r.checksum)
        for r in e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(fp48).cast("decimal(38,0)").cast("string").alias("checksum"),
        )
        .collect()
    }
    assert streamed == batch


# ---------------------------------------------------------------------------
# Benford audit
# ---------------------------------------------------------------------------


def test_benford_structure_and_literals(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.quality import (
        _BENFORD_PPM,
        q_benford_audit,
    )

    assert sum(_BENFORD_PPM) in range(999_990, 1_000_001)  # floored shares
    rows = {r.d: r for r in q_benford_audit(spark, sf_medium).collect()}
    assert set(rows) <= set(range(1, 10))
    total_ppm = sum(r.observed_ppm for r in rows.values())
    assert 999_000 <= total_ppm <= 1_000_000
    for r in rows.values():
        assert r.abs_dev_ppm == abs(r.observed_ppm - r.expected_ppm)


# ---------------------------------------------------------------------------
# sequence gaps
# ---------------------------------------------------------------------------


def test_sequence_gaps_counts_missing_keys(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.quality as q

    keys = [1, 2, 3, 10, 10001, 10002, 10009]
    df = spark.createDataFrame([(k,) for k in keys], ["o_orderkey"])
    orig_t = q.T
    try:
        q.T = lambda sp, sf, name: df  # noqa: ARG005
        out = {r.bucket: r for r in q.q_sequence_gaps(spark, "x").collect()}
    finally:
        q.T = orig_t
    assert out[0].present == 4 and out[0].lo == 1 and out[0].hi == 10
    assert out[0].missing == 10 - 1 + 1 - 4
    assert out[1].present == 3 and out[1].missing == 9 - 1 + 1 - 3


# ---------------------------------------------------------------------------
# user journeys
# ---------------------------------------------------------------------------


def test_user_journeys_orders_and_truncates(spark):
    import datetime as dt

    import arc_maskdata_pipeline_plugin_spark.plans.behavior as beh

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(3):  # three users: view>click>purchase (+ extra ignored)
        for i, t in enumerate(["view", "click", "purchase", "error"]):
            rows.append((eid, base + dt.timedelta(minutes=i), u, t))
            eid += 1
    rows.append((eid, base, 99, "signup"))  # single-event user
    events = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    orig_t = beh.T
    try:
        beh.T = lambda sp, sf, name: events  # noqa: ARG005
        out = {r.path: r for r in beh.q_user_journeys(spark, "x").collect()}
    finally:
        beh.T = orig_t
    assert out["view>click>purchase"].n_users == 3
    assert out["view>click>purchase"].rank == 1
    assert out["signup"].n_users == 1  # short journeys kept, not padded


# ---------------------------------------------------------------------------
# revenue concentration
# ---------------------------------------------------------------------------


def test_revenue_concentration_whale(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.behavior as beh

    # customer 1 holds 90% of revenue -> n_top80 == 1
    orders = spark.createDataFrame(
        [(1, 1, 900.0)] + [(k, k, 10.0) for k in range(2, 12)],
        ["o_orderkey", "o_custkey", "o_totalprice"],
    )
    cust = spark.createDataFrame(
        [(k, "SEG") for k in range(1, 12)], ["c_custkey", "c_mktsegment"]
    )
    orig_t = beh.T
    try:
        beh.T = lambda sp, sf, name: orders if name == "orders" else cust  # noqa: ARG005
        out = beh.q_revenue_concentration(spark, "x").collect()
    finally:
        beh.T = orig_t
    assert len(out) == 1
    r = out[0]
    assert r.n_customers == 11 and r.n_top80 == 1
    assert r.share_ppm == 1_000_000 // 11


# ---------------------------------------------------------------------------
# Zipf slope
# ---------------------------------------------------------------------------


def test_zipf_slope_near_minus_one_on_ideal_corpus(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.search2 as s2

    # construct frequencies ~ 1/rank for 100 terms: term t_r appears
    # round(10000/r) times -> slope should come out near -1
    texts = []
    for r in range(1, 101):
        texts.extend([f"t{r:03d}"] * round(10000 / r))
    docs = spark.createDataFrame(
        [(1, " ".join(texts), "s")], ["doc_id", "text", "source"]
    )
    orig_t = s2.T
    try:
        s2.T = lambda sp, sf, name: docs  # noqa: ARG005
        out = s2.q_zipf_slope(spark, "x").collect()
    finally:
        s2.T = orig_t
    assert len(out) == 1
    slope = out[0].slope_fp6 / 1e6
    assert -1.05 < slope < -0.95
    assert out[0].n == 100


# ---------------------------------------------------------------------------
# frequent itemsets
# ---------------------------------------------------------------------------


def test_frequent_itemsets_scores(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.graph as g

    # 4 baskets: {1,2} x3, {1,3} x1 -> support(1,2)=3, conf(1->2)=3/4,
    # conf(2->1)=1, lift = 3*4/(4*3)=1
    rows = [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 2), (13, 1), (13, 3)]
    li = spark.createDataFrame(rows, ["l_orderkey", "l_partkey"])
    orig_t = g.T
    try:
        g.T = lambda sp, sf, name: li  # noqa: ARG005
        out = {(r.p1, r.p2): r for r in g.q_frequent_itemsets(spark, "x").collect()}
    finally:
        g.T = orig_t
    r = out[(1, 2)]
    assert r.sxy == 3
    assert r.conf12_fp6 == 750_000 and r.conf21_fp6 == 1_000_000
    assert r.lift_fp6 == 1_000_000
    assert (1, 3) not in out  # below min support


# ---------------------------------------------------------------------------
# Neyman sampling
# ---------------------------------------------------------------------------


def test_neyman_allocation_properties(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.training import (
        _NEYMAN_K,
        q_neyman_sample,
    )

    rows = q_neyman_sample(spark, sf_medium).collect()
    # exact k_h drawn per stratum, total within rounding of the budget
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        kh = rs[0].kh
        assert len(rs) == kh  # exactly k_h rows
        assert sorted(r.rk for r in rs) == list(range(1, kh + 1))
    total = sum(len(v) for v in by_type.values())
    assert _NEYMAN_K - len(by_type) <= total <= _NEYMAN_K  # floor rounding
    # determinism
    again = q_neyman_sample(spark, sf_medium).collect()
    assert {r.event_id for r in again} == {r.event_id for r in rows}


def test_neyman_higher_variance_gets_more(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.training as tr

    # stratum "wide" has 10x the spread of "narrow" at equal size -> gets
    # ~10/11 of the budget under Neyman allocation
    rows = []
    for i in range(200):
        rows.append((i, "narrow", 100.0 + (i % 2)))        # sigma ~ 0.5
        rows.append((1000 + i, "wide", 100.0 + (i % 2) * 50.0))  # sigma ~ 25
    events = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    orig_t = tr.T
    try:
        tr.T = lambda sp, sf, name: events  # noqa: ARG005
        out = tr.q_neyman_sample(spark, "x").collect()
    finally:
        tr.T = orig_t
    counts = {}
    for r in out:
        counts[r.event_type] = counts.get(r.event_type, 0) + 1
    assert counts["wide"] > 8 * counts["narrow"]


# ---------------------------------------------------------------------------
# CUSUM changepoint
# ---------------------------------------------------------------------------


def test_cusum_locates_level_shift(spark):
    import datetime as dt

    import arc_maskdata_pipeline_plugin_spark.plans.timeseries as ts

    rows = []
    eid = 0
    for d in range(20):
        v = 100.0 if d < 10 else 200.0  # level shift after day 10
        rows.append((eid, dt.datetime(2024, 1, 1 + d), 1, "x", v))
        eid += 1
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    orig_t = ts.T
    try:
        ts.T = lambda sp, sf, name: events  # noqa: ARG005
        out = ts.q_cusum_changepoint(spark, "x").collect()
    finally:
        ts.T = orig_t
    assert len(out) == 1
    r = out[0]
    assert r.change_day == "2024-01-10"  # last day of the low regime
    assert r.cusum_scaled == 20 * 100_000 - 10 * 300_000  # exact integer


# ---------------------------------------------------------------------------
# seasonal decomposition
# ---------------------------------------------------------------------------


def test_seasonal_decompose_identity_and_weekly_effect(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.timeseries import (
        q_seasonal_decompose,
    )

    rows = q_seasonal_decompose(spark, sf_medium).collect()
    assert len(rows) == 150
    for r in rows:
        # exact reassembly identity
        assert r.cents * 1_000_000 == r.trend_fp6 + r.dow_effect_fp6 + r.residual_fp6
    # per type, dow effects roughly centre on zero (floored means)
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.dow_effect_fp6)
    for t, effs in by_type.items():
        assert min(effs) < 0 < max(effs) or all(abs(x) < 10_000_000 for x in effs)


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------


def test_kcore_constructed_graph(spark):
    from arc_maskdata_pipeline_plugin_spark.operators.graph import (
        kcore_peel,
        symmetrize,
    )

    # K4 on {1,2,3,4} (each node degree 3) plus a tail 4-5-6: the tail must
    # peel away under k=3 INCLUDING node 4's tail edge, leaving exactly K4.
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    edges = spark.createDataFrame(k4 + [(4, 5), (5, 6)], ["src", "dst"])
    core = {r.node: r.degree for r in kcore_peel(symmetrize(edges), 3, 5).collect()}
    assert core == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_fixed_rounds_converged(spark, sf_medium):
    """An extra peel round after the registered 8 changes nothing at test
    scale — the fixed round count IS the fixed point here."""
    import arc_maskdata_pipeline_plugin_spark.plans.graph as g
    from pyspark.sql import functions as SF

    eight = g.q_kcore_suppliers(spark, sf_medium)
    survivors = {r.node for r in eight.collect()}
    # one more peel on the surviving subgraph: all degrees already >= k
    assert eight.filter(SF.col("degree") < g._KCORE_K).count() == 0
    assert len(survivors) > 0


# ---------------------------------------------------------------------------
# scene cuts
# ---------------------------------------------------------------------------


def test_scene_cuts_luma_and_flags(spark, sf_small):
    from arc_maskdata_pipeline_plugin_spark.plans.multimodal_queries import (
        _CUT_THRESHOLD,
        q_multimodal_scene_cuts,
    )

    rows = q_multimodal_scene_cuts(spark, sf_small).collect()
    assert len(rows) > 0
    assert all(0 <= r.luma <= 255 for r in rows)
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, frames in by_doc.items():
        frames.sort(key=lambda r: r.frame_idx)
        assert frames[0].is_cut is False  # no predecessor -> never a cut
        for prev, cur in zip(frames, frames[1:]):
            assert cur.is_cut == (abs(cur.luma - prev.luma) > _CUT_THRESHOLD)


# ---------------------------------------------------------------------------
# phrase search
# ---------------------------------------------------------------------------


def test_phrase_search_adjacency_semantics(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.search2 as s2

    docs = spark.createDataFrame(
        [
            (1, "the table hash join wins", "s"),
            (2, "hash table is reversed here", "s"),   # "table hash" absent
            (3, "table hash table hash again", "s"),   # two occurrences
        ],
        ["doc_id", "text", "source"],
    )
    orig_t = s2.T
    try:
        s2.T = lambda sp, sf, name: docs  # noqa: ARG005
        out = {
            (r.query_id, r.doc_id): r.n_matches
            for r in s2.q_phrase_search(spark, "x").collect()
        }
    finally:
        s2.T = orig_t
    assert out[(1, 1)] == 1
    assert out[(1, 3)] == 2
    assert (1, 2) not in out  # reversed order is not the phrase


# ---------------------------------------------------------------------------
# sorted neighborhood
# ---------------------------------------------------------------------------


def test_snm_candidate_budget_is_linear(spark, sf_small):
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import (
        _SNM_WINDOW,
        dedup_sorted_neighborhood,
    )
    from arc_maskdata_pipeline_plugin_spark.plans.registry import T

    n_docs = T(spark, sf_small, "documents").count()
    pairs = dedup_sorted_neighborhood(spark, sf_small).collect()
    # candidate budget is strictly linear: at most (W-1) * n pairs even
    # before the hamming filter
    assert len(pairs) <= (_SNM_WINDOW - 1) * n_docs
    assert all(r.d1 != r.d2 for r in pairs)
    assert all(0 <= r.hamming <= 4 for r in pairs)


# ---------------------------------------------------------------------------
# incremental join MV
# ---------------------------------------------------------------------------


def test_incremental_join_mv_delta_algebra(spark, sf_small):
    """The registered query IS merge(V_old, deltas); the oracle is the full
    recompute — here additionally pin that dropping the ΔA⋈ΔB cross term
    breaks the identity (i.e. the test would catch a wrong delta algebra)."""
    from arc_maskdata_pipeline_plugin_spark.plans.registry import T
    from arc_maskdata_pipeline_plugin_spark.plans.timeseries import (
        q_incremental_join_mv,
    )

    inc = {r.seg: (r.n_orders, r.revenue) for r in q_incremental_join_mv(spark, sf_small).collect()}
    o = T(spark, sf_small, "orders")
    c = T(spark, sf_small, "customer")
    full = {
        r.seg: (r.n_orders, r.revenue)
        for r in o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("seg"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .collect()
    }
    assert inc == full
    # the cross term is non-empty: orders with key%7==0 AND cust key%5==0
    cross = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        .join(
            c.filter(F.col("c_custkey") % 5 == 0),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .count()
    )
    assert cross > 0  # dropping ΔA⋈ΔB would under-count by this many rows


# ---------------------------------------------------------------------------
# Welch A/B test
# ---------------------------------------------------------------------------


def test_welch_t_matches_scipy_formula(spark, sf_medium):
    import math

    import duckdb

    from arc_maskdata_pipeline_plugin_spark.plans.stats2 import q_ab_test_welch

    got = {r.event_type: r for r in q_ab_test_welch(spark, sf_medium).collect()}
    raw = duckdb.connect().execute(
        "SELECT event_type, user_id % 2, CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)"
        f" FROM read_parquet('{sf_medium}/events.parquet')"
    ).fetchall()
    from collections import defaultdict

    groups: dict = defaultdict(list)
    for t, g, c in raw:
        groups[(t, g)].append(c)
    for t in got:
        a, b = groups[(t, 0)], groups[(t, 1)]
        na, nb = len(a), len(b)
        ma, mb = sum(a) / na, sum(b) / nb
        va = sum((x - ma) ** 2 for x in a) / (na - 1)
        vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
        tstat = (ma - mb) / math.sqrt(va / na + vb / nb)
        df = (va / na + vb / nb) ** 2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
        )
        assert abs(got[t].t_fp6 / 1e6 - tstat) < 1e-3
        assert abs(got[t].df_fp3 / 1e3 - df) < 1.0
        # A/B split by user hash on synthetic data: no real effect expected
        assert abs(got[t].t_fp6 / 1e6) < 5


# ---------------------------------------------------------------------------
# experimentation family
# ---------------------------------------------------------------------------


def test_cuped_on_correlated_construction(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.stats2 as st2
    import datetime as dt

    # construct users whose post value == 2 * pre value -> theta == 2 and
    # variance reduction == 100%
    rows = []
    eid = 0
    for u in range(40):
        pre = 10.0 + u
        rows.append((eid, dt.datetime(2024, 1, 5), u, "m", pre)); eid += 1
        rows.append((eid, dt.datetime(2024, 1, 20), u, "m", 2 * pre)); eid += 1
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    orig_t = st2.T
    try:
        st2.T = lambda sp, sf, name: events  # noqa: ARG005
        out = st2.q_cuped_adjustment(spark, "x").collect()
    finally:
        st2.T = orig_t
    r = out[0]
    assert r.theta_fp6 == 2_000_000 - 1 or r.theta_fp6 == 2_000_000  # floor
    assert r.var_reduction_fp6 >= 999_999


def test_kaplan_meier_survival_monotone(spark, sf_medium):
    import math

    from arc_maskdata_pipeline_plugin_spark.plans.stats2 import q_kaplan_meier

    rows = sorted(q_kaplan_meier(spark, sf_medium).collect(), key=lambda r: r.t)
    assert len(rows) > 0
    # survival is non-increasing, within (0, 1]
    prev = 0
    for r in rows:
        assert r.log_survival_fp9 <= prev
        prev = r.log_survival_fp9
        assert r.n_at_risk >= r.d > 0
    s_last = math.exp(rows[-1].log_survival_fp9 / 1e9)
    assert 0 <= s_last < 1


def test_user_entropy_bounds(spark, sf_medium):
    import math

    from arc_maskdata_pipeline_plugin_spark.plans.stats2 import q_user_entropy

    rows = q_user_entropy(spark, sf_medium).collect()
    assert len(rows) == 150
    hmax = math.log(5) * 1e9  # 5 event types
    for r in rows:
        assert -5 <= r.entropy_fp9 <= hmax + 5  # fp9 floor slack


def test_nested_subsets_are_nested_and_halving(spark, sf_medium):
    import hashlib
    import math

    from arc_maskdata_pipeline_plugin_spark.plans.training import (
        _NEST_MAX_LEVEL,
        q_nested_subsets,
    )

    rows = {r.level: r.n_docs for r in q_nested_subsets(spark, sf_medium).collect()}
    assert sum(rows.values()) == 500
    # cumulative "level >= k" counts roughly halve per level
    cum = [sum(n for lv, n in rows.items() if lv >= k) for k in range(_NEST_MAX_LEVEL)]
    assert cum[0] == 500
    for a, b in zip(cum, cum[1:]):
        assert b <= a  # nested by construction

    # independent Python recompute of the level assignment
    def level(doc_id):
        h = hashlib.md5(f"nest:{doc_id}".encode()).hexdigest()[:12]
        u = (int(h, 16) + 1) / 281474976710657.0
        return min(int(math.floor(-math.log(u) / math.log(2.0))), _NEST_MAX_LEVEL)

    expect: dict[int, int] = {}
    for d in range(500):
        expect[level(d)] = expect.get(level(d), 0) + 1
    assert rows == expect


def test_poisson_bootstrap_ci_brackets_mean(spark, sf_medium):
    import math

    import duckdb

    from arc_maskdata_pipeline_plugin_spark.plans.stats2 import (
        q_poisson_bootstrap_ci,
    )

    rows = {r.event_type: r for r in q_poisson_bootstrap_ci(spark, sf_medium).collect()}
    raw = duckdb.connect().execute(
        "SELECT event_type, AVG(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)),"
        " STDDEV_SAMP(CAST(CAST(value AS DECIMAL(10,2)) * 100 AS BIGINT)), COUNT(*)"
        f" FROM read_parquet('{sf_medium}/events.parquet') GROUP BY 1"
    ).fetchall()
    for t, mean, sd, n in raw:
        r = rows[t]
        assert r.ci_lo_fp4 <= r.mean_fp4 <= r.ci_hi_fp4
        # CI width should be within a factor ~3 of the CLT 2*1.86*se band
        se = sd / math.sqrt(n)
        width = (r.ci_hi_fp4 - r.ci_lo_fp4) / 1e4
        assert 0.5 * se < width < 12 * se


def test_silence_segments_are_maximal_runs(spark, sf_small):
    from arc_maskdata_pipeline_plugin_spark.plans.multimodal_queries import (
        q_multimodal_silence,
    )

    segs = q_multimodal_silence(spark, sf_small).collect()
    assert len(segs) > 0
    by_doc: dict[int, list] = {}
    for r in segs:
        assert r.n_chunks == r.end_chunk - r.start_chunk + 1  # contiguous
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.start_chunk)
        for a, b in zip(rs, rs[1:]):
            assert b.start_chunk > a.end_chunk + 1  # maximal (gap between)


def test_dedup_method_agreement_recall_structure(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import (
        q_dedup_method_agreement,
    )

    rows = {(r.method_a, r.method_b): r for r in q_dedup_method_agreement(spark, sf_medium).collect()}
    assert set(rows) == {("mh", "jc"), ("mh", "ct"), ("jc", "ct")}
    for r in rows.values():
        assert 0 <= r.n_common <= min(r.n_a, r.n_b)
        assert 0 <= r.agreement_fp6 <= 1_000_000
    # LSH at these band settings recalls most exact-Jaccard(>=0.5) pairs
    mh_jc = rows[("mh", "jc")]
    assert mh_jc.n_common >= 0.8 * mh_jc.n_b


def test_equidepth_histogram_properties(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.stats import (
        _EQD_BUCKETS,
        q_equidepth_histogram,
    )

    rows = q_equidepth_histogram(spark, sf_medium).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for t, bs in by_type.items():
        bs.sort(key=lambda r: r.bucket)
        total = sum(r.n_rows for r in bs)
        target = total / _EQD_BUCKETS
        for r in bs:
            assert r.lo_cents <= r.hi_cents
            # equal-depth up to duplicate mass (values here are near-unique)
            assert 0.5 * target <= r.n_rows <= 2 * target
        for a, b in zip(bs, bs[1:]):
            assert a.hi_cents < b.lo_cents  # disjoint, ordered ranges


def test_bpe_fertility_bounds(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.bpe import q_bpe_fertility

    rows = q_bpe_fertility(spark, sf_medium).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.n_bpe_tokens >= r.n_words  # >= 1 symbol per word
        assert 0 <= r.n_single_token <= r.n_words
        assert r.fertility_fp6 >= 1_000_000
        # fertility consistent with its components
        assert r.fertility_fp6 == r.n_bpe_tokens * 1_000_000 // r.n_words


def test_quantile_normalize_single_doc_source_not_dropped(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.training as tr

    docs = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 999)],
        ["doc_id", "source", "n_chars"],
    )
    orig_t = tr.T
    try:
        tr.T = lambda sp, sf, name: docs  # noqa: ARG005
        out = {r.doc_id: r for r in tr.q_quantile_normalize(spark, "x").collect()}
    finally:
        tr.T = orig_t
    assert set(out) == {1, 2, 3, 4}  # the singleton source must NOT vanish
    # singleton maps to the global median position (2nd of 4 sorted values)
    assert out[4].norm_chars == 20


def test_abandonment_absence_pattern(spark):
    import datetime as dt

    import arc_maskdata_pipeline_plugin_spark.plans.behavior as beh

    base = dt.datetime(2024, 1, 1)

    def t(m):
        return base + dt.timedelta(minutes=m)

    rows = [
        (1, t(0), 1, "view"),       # converted at +30 -> not abandoned
        (2, t(30), 1, "purchase"),
        (3, t(100), 1, "view"),     # no later purchase -> abandoned
        (4, t(0), 2, "view"),       # purchase at +61 -> outside window
        (5, t(61), 2, "purchase"),
        (6, t(120), 2, "view"),     # purchase exists but EARLIER -> abandoned
    ]
    events = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    orig_t = beh.T
    try:
        beh.T = lambda sp, sf, name: events  # noqa: ARG005
        out = {r.user_id: r for r in beh.q_abandonment_detection(spark, "x").collect()}
    finally:
        beh.T = orig_t
    assert out[1].n_views == 2 and out[1].n_abandoned == 1
    assert out[2].n_views == 2 and out[2].n_abandoned == 2
    assert out[2].abandon_ppm == 1_000_000


def test_psi_zero_for_identical_and_large_for_shifted(spark):
    import datetime as dt

    import arc_maskdata_pipeline_plugin_spark.plans.timeseries as ts

    rows = []
    eid = 0
    # metric "same": identical distribution in both halves -> PSI ~ 0
    # metric "shift": values double in the second half -> large PSI
    for d in range(30):
        half_day = dt.datetime(2024, 1, 1 + d)
        for i in range(20):
            v = 10.0 + (i % 10)
            rows.append((eid, half_day, i, "same", v)); eid += 1
            rows.append((eid, half_day, i, "shift", v if d < 15 else v * 2)); eid += 1
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    orig_t = ts.T
    try:
        ts.T = lambda sp, sf, name: events  # noqa: ARG005
        out = {r.event_type: r for r in ts.q_psi_drift(spark, "x").collect()}
    finally:
        ts.T = orig_t
    assert abs(out["same"].psi_fp9) < 20_000_000  # ~0.02: stable
    assert out["shift"].psi_fp9 > 200_000_000  # > 0.2: the retrain alarm
    assert out["same"].n_ref == out["same"].n_cur == 300


def test_seasonal_anomaly_flags_planted_spike(spark):
    import datetime as dt

    import arc_maskdata_pipeline_plugin_spark.plans.timeseries as ts

    rows = []
    eid = 0
    for d in range(30):
        v = 100.0 if d != 14 else 1000.0  # planted 10x spike on day 15
        rows.append((eid, dt.datetime(2024, 1, 1 + d), 1, "x", v))
        eid += 1
    events = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )
    orig_t = ts.T
    try:
        ts.T = lambda sp, sf, name: events  # noqa: ARG005
        out = ts.q_seasonal_anomaly(spark, "x").collect()
    finally:
        ts.T = orig_t
    days = {r.day for r in out}
    assert "2024-01-15" in days  # the spike is flagged
    # neighbours inside the spike's MA window may co-flag; far days must not
    assert "2024-01-05" not in days and "2024-01-25" not in days


def test_gini_extremes(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.behavior as beh

    # equal revenues -> Gini ~ 0; one whale -> Gini -> (n-1)/n
    orders_eq = [(k, k, 100.0) for k in range(1, 11)]
    orders_whale = [(1, 1, 1000.0)] + [(k, k, 0.01) for k in range(2, 11)]
    cust = [(k, "S") for k in range(1, 11)]

    def run(orders):
        o = spark.createDataFrame(orders, ["o_orderkey", "o_custkey", "o_totalprice"])
        c = spark.createDataFrame(cust, ["c_custkey", "c_mktsegment"])
        orig_t = beh.T
        try:
            beh.T = lambda sp, sf, name: o if name == "orders" else c  # noqa: ARG005
            return beh.q_gini_concentration(spark, "x").collect()[0]
        finally:
            beh.T = orig_t

    assert abs(run(orders_eq).gini_fp6) <= 1
    assert run(orders_whale).gini_fp6 > 850_000  # near (n-1)/n = 0.9


def test_rfm_codes_within_range(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.behavior import q_rfm_segments

    rows = q_rfm_segments(spark, sf_medium).collect()
    total = sum(r.n_users for r in rows)
    assert total == 150  # every buyer coded exactly once
    for r in rows:
        d1, d2, d3 = r.rfm_code // 100, r.rfm_code // 10 % 10, r.rfm_code % 10
        assert 1 <= d1 <= 5 and 1 <= d2 <= 5 and 1 <= d3 <= 5


def test_power_analysis_shrinks_with_n(spark):
    import arc_maskdata_pipeline_plugin_spark.plans.stats2 as st2

    # same distribution, 4x the rows -> MDE halves (1/sqrt(n))
    # sizes divisible by 7 so both arms see the identical distribution
    small = [(i, "a", 10.0 + (i % 7)) for i in range(210)]
    big = [(i, "b", 10.0 + (i % 7)) for i in range(840)]
    events = spark.createDataFrame(small + big, ["event_id", "event_type", "value"])
    orig_t = st2.T
    try:
        st2.T = lambda sp, sf, name: events  # noqa: ARG005
        out = {r.event_type: r for r in st2.q_power_analysis(spark, "x").collect()}
    finally:
        st2.T = orig_t
    ratio = out["a"].mde_cents_fp4 / out["b"].mde_cents_fp4
    assert 1.9 < ratio < 2.1


def test_compression_quality_matches_python_zlib(spark, sf_small):
    import zlib

    import duckdb

    from arc_maskdata_pipeline_plugin_spark.plans.text import q_compression_quality

    got = {r.doc_id: r for r in q_compression_quality(spark, sf_small).collect()}
    raw = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_small}/documents.parquet')"
    ).fetchall()
    assert len(got) == len(raw)
    for doc_id, text in raw:
        b = text.encode("utf-8")
        c = len(zlib.compress(b, 6))
        r = got[doc_id]
        assert (r.raw_bytes, r.compressed_bytes) == (len(b), c)
        assert r.ratio_fp6 == c * 1_000_000 // max(len(b), 1)
    # repetitive text compresses better than the corpus norm
    rep = spark.createDataFrame(
        [(1, "spam " * 100, "s")], ["doc_id", "text", "source"]
    )
    from arc_maskdata_pipeline_plugin_spark.operators.text import (
        compression_quality,
    )

    rr = compression_quality(rep).collect()[0]
    assert rr.ratio_fp6 < min(r.ratio_fp6 for r in got.values())
