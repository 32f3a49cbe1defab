"""Round-9 fourth-batch operator semantics on constructed inputs:
reciprocal best match, degree power-law alpha, DP exponential top-k,
dataset-card composition."""

from __future__ import annotations

import datetime
import hashlib
import math


def _ts():
    return datetime.datetime(1995, 1, 1)


def test_reciprocal_best_match_mutual_pairs(spark, tmp_path):
    """A = {0, 2}, B = {1, 3}; a0↔b1 and a2↔b3 are mutual by construction
    → 2 mutual pairs, share = 2/2."""
    vecs = {
        0: [1.0, 0.0],
        1: [0.9, 0.1],
        2: [0.0, 1.0],
        3: [0.1, 0.9],
    }
    rows = [
        (vid, [float(x) for x in v] + [0.0] * 62, 0)
        for vid, v in vecs.items()
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.similarity import (
        q_reciprocal_best_match,
    )

    out = q_reciprocal_best_match(spark, str(tmp_path)).collect()
    pairs = {(r["a_id"], r["b_id"]) for r in out}
    assert pairs == {(0, 1), (2, 3)}, pairs
    assert all(r["n_mutual"] == 2 for r in out)
    assert all(r["mutual_share_fp6"] == 1_000_000 for r in out)


def test_reciprocal_best_match_hub_rejected(spark, tmp_path):
    """b1 is the hub: best match FOR both a0 and a2, but b1's own best is
    a0 (tie broken by a_id) — so (a2, b1) must NOT appear even though b1
    is a2's top-1. a2 pairs with nothing (its best isn't reciprocated):
    only (0, 1) survives, share = 1/2."""
    rows = [
        (0, [1.0, 0.0] + [0.0] * 62, 0),
        (2, [0.0, 1.0] + [0.0] * 62, 0),
        (1, [0.7071, 0.7071] + [0.0] * 62, 0),  # equidistant hub
        (3, [-1.0, 0.0] + [0.0] * 62, 0),  # far from everything
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.similarity import (
        q_reciprocal_best_match,
    )

    out = q_reciprocal_best_match(spark, str(tmp_path)).collect()
    pairs = {(r["a_id"], r["b_id"]) for r in out}
    assert pairs == {(0, 1)}, pairs
    assert all(r["mutual_share_fp6"] == 500_000 for r in out)


def _write_graph(spark, tmp_path, cust_supp):
    """cust_supp: list of (custkey, suppkey) purchase edges."""
    orders = [
        (i + 1, c, "F", 1.0, _ts(), "1-URGENT")
        for i, (c, _s) in enumerate(cust_supp)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    li = [
        (i + 1, 1, s, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _ts())
        for i, (_c, s) in enumerate(cust_supp)
    ]
    spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def test_powerlaw_alpha_hand_computed(spark, tmp_path):
    """Degrees: customers c1=1, c2=1, c3=2; suppliers s1=3, s2=1.
    alpha = 1 + n / Σ ln(2d) with fp9-floored per-degree terms."""
    _write_graph(spark, tmp_path, [(1, 1), (2, 1), (3, 1), (3, 2)])
    from arc_maskdata_pipeline_plugin_spark.plans.graph2 import (
        q_degree_powerlaw_alpha,
    )

    got = {
        r["node_type"]: r
        for r in q_degree_powerlaw_alpha(spark, str(tmp_path)).collect()
    }

    def expect(degree_counts):
        n = sum(degree_counts.values())
        s9 = sum(
            nd * math.floor(math.log(2 * d) * 1e9)
            for d, nd in degree_counts.items()
        )
        return n, math.floor((1.0 + n * 1e9 / s9) * 1e6)

    n_c, a_c = expect({1: 2, 2: 1})
    n_s, a_s = expect({3: 1, 1: 1})
    assert got["customer"]["n_nodes"] == n_c
    assert got["customer"]["alpha_fp6"] == a_c
    assert got["supplier"]["n_nodes"] == n_s
    assert got["supplier"]["d_max"] == 3
    assert got["supplier"]["alpha_fp6"] == a_s


def test_dp_topk_python_replica(spark, tmp_path):
    """The whole mechanism (md5 uniform → Gumbel → fp6 ranking) replicated
    from scratch in Python must produce the same ranks and selections."""
    counts = {"view": 40, "click": 25, "purchase": 10, "error": 5}
    rows = []
    eid = 0
    for t, n in counts.items():
        for _ in range(n):
            eid += 1
            rows.append((eid, _ts(), 1, t, 1.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.privacy import (
        _DP_EPS,
        _DP_TOPK,
        q_dp_topk_exponential,
    )

    def noisy(t, n):
        u = (
            int(hashlib.md5(f"dptopk:{t}".encode()).hexdigest()[:8], 16) + 0.5
        ) / 4294967296.0
        return math.floor((_DP_EPS * n / 2.0 - math.log(-math.log(u))) * 1e6)

    exp = sorted(
        ((noisy(t, n), t, n) for t, n in counts.items()),
        key=lambda x: (-x[0], x[1]),
    )
    got = {
        r["event_type"]: (r["noisy_score_fp6"], r["rank"], r["selected"])
        for r in q_dp_topk_exponential(spark, str(tmp_path)).collect()
    }
    for rank, (score, t, _n) in enumerate(exp, start=1):
        assert got[t] == (score, rank, 1 if rank <= _DP_TOPK else 0), (t, got)


def test_dataset_card_matches_components(spark, tmp_path):
    """Card columns equal the component queries' own outputs (the join
    introduces nothing)."""
    docs = [
        (1, "a b a b c d", "en", "S1"),
        (2, "c a b c x y", "en", "S1"),
        (3, "p q r s p q", "en", "S2"),
        (4, "r p q r s s", "en", "S2"),
    ]
    spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source"]
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.card import (
        q_dataset_card_report,
    )
    from arc_maskdata_pipeline_plugin_spark.plans.lm import (
        q_bigram_perplexity,
    )
    from arc_maskdata_pipeline_plugin_spark.plans.vocab import (
        q_chao_coverage,
    )

    card = {
        r["source"]: r for r in q_dataset_card_report(spark, str(tmp_path)).collect()
    }
    cov = {r["source"]: r for r in q_chao_coverage(spark, str(tmp_path)).collect()}
    lm = {
        r["source"]: r for r in q_bigram_perplexity(spark, str(tmp_path)).collect()
    }
    assert set(card) == {"S1", "S2"}
    for s in card:
        assert card[s]["n_tokens"] == cov[s]["n_tokens"]
        assert card[s]["vocab_observed"] == cov[s]["d_distinct"]
        assert card[s]["chao1_est"] == cov[s]["chao1_est"]
        assert card[s]["bigram_nll_fp6"] == lm[s]["bigram_nll_fp6"]
        assert card[s]["unigram_nll_fp6"] == lm[s]["unigram_nll_fp6"]
        assert card[s]["n_batches"] == 1  # 2 docs < one batch of 16
