"""Round-9 third-batch operator semantics on constructed inputs:
lift/gain deciles, trained Naive Bayes lang-ID (with a real signal),
bigram LM perplexity, term burstiness, JL projection audit."""

from __future__ import annotations

import datetime
import math


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


def _ts():
    return datetime.datetime(1995, 1, 1)


def test_lift_gain_two_deciles(spark, tmp_path):
    """20 rows, scores 20..1 descending, all 4 positives in the top
    quarter: decile 0 (top 2 rows) and beyond. With n=20 each decile is 2
    rows; positives at scores 20, 19, 18, 17 → deciles 0 and 1 capture all
    4 → cum gain hits 1.0 at decile 1; lift in decile 0 = (2/2)/(4/20)=5."""
    rows = [
        (i, 1, "F" if i > 16 else "O", float(i), _ts(), "A")
        for i in range(1, 21)
    ]
    _write_orders(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.mleval import (
        q_lift_gain_deciles,
    )

    got = {
        r["decile"]: (r["n_rows"], r["n_pos_in"], r["cum_gain_fp6"], r["lift_fp6"])
        for r in q_lift_gain_deciles(spark, str(tmp_path)).collect()
    }
    assert got[0] == (2, 2, 500_000, 5_000_000), got
    assert got[1] == (2, 2, 1_000_000, 5_000_000), got
    for d in range(2, 10):
        assert got[d] == (2, 0, 1_000_000, 0), (d, got)


def test_naive_bayes_learns_disjoint_vocab(spark, tmp_path):
    """Languages with DISJOINT vocabularies (a real signal, unlike the
    driver corpus): NB trained on even doc_ids classifies every odd doc
    correctly → accuracy 1.0 > majority baseline 0.5."""
    rows = []
    did = 0
    for _ in range(8):
        did += 2  # even = train
        rows.append((did, "aaa bbb aaa ccc", "en", "S"))
        rows.append((did + 101, "aaa bbb ccc aaa", "en", "S"))  # odd = test
        did += 2
        rows.append((did, "xxx yyy zzz xxx", "de", "S"))
        rows.append((did + 101, "yyy xxx zzz zzz", "de", "S"))
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.mleval import (
        q_naive_bayes_langid,
    )

    out = q_naive_bayes_langid(spark, str(tmp_path)).collect()
    conf = {(r["true_lang"], r["pred_lang"]): r["n"] for r in out}
    assert all(t == p for (t, p) in conf), conf  # diagonal only
    assert out[0]["accuracy_fp6"] == 1_000_000
    assert out[0]["majority_baseline_fp6"] == 500_000


def test_bigram_beats_unigram_on_predictable_text(spark, tmp_path):
    """'a b a b ...' is perfectly predictable at order 2 but uniform at
    order 1 — bigram NLL must come out far below unigram NLL. Exact
    values: V=2, C(a)=C(b)=8, C(ab)=8, C(ba)=7 (one doc of 16 tokens):
    p(b|a) = (8+1)/(8+2) = 9/10, p(a|b) = (7+1)/(8+2) = 8/10;
    unigram p(a) = 9/18 = 1/2."""
    _write_docs(spark, tmp_path, [(1, "a b " * 8, "en", "S")])
    from arc_maskdata_pipeline_plugin_spark.plans.lm import (
        q_bigram_perplexity,
    )

    [r] = q_bigram_perplexity(spark, str(tmp_path)).collect()
    assert r["vocab"] == 2 and r["n_bigrams"] == 15
    # bigram mean NLL: (8·ln(10/9) + 7·ln(10/8)) / 15
    bg = (8 * math.log(10 / 9) + 7 * math.log(10 / 8)) / 15
    un = math.log(2)  # (16·ln(18/9))/16
    assert abs(r["bigram_nll_fp6"] / 1e6 - bg) < 2e-6, r
    assert abs(r["unigram_nll_fp6"] / 1e6 - un) < 2e-6, r
    assert r["bigram_nll_fp6"] < r["unigram_nll_fp6"]


def test_burstiness_separates_bursty_from_spread(spark, tmp_path):
    """'glue' appears once in each of 10 docs (df = 10, Poisson-expected
    ≈ 9.56 → burstiness ≈ 0.95); 'burst' appears 10 times in ONE doc
    (df = 1, burstiness ≈ 9.56)."""
    docs = [(i, "glue filler%d" % i, "en", "S") for i in range(1, 10)]
    docs.append((10, "glue " + " ".join(["burst"] * 10), "en", "S"))
    _write_docs(spark, tmp_path, docs)
    from arc_maskdata_pipeline_plugin_spark.plans.vocab import (
        q_term_burstiness,
    )

    got = {r["term"]: r for r in q_term_burstiness(spark, str(tmp_path)).collect()}
    n_docs = 10
    exp_df = n_docs * (1 - math.exp(-10 / n_docs))  # ≈ 6.32 for cf=10
    assert got["burst"]["cf"] == 10 and got["burst"]["df"] == 1
    assert got["burst"]["burstiness_fp6"] == int(
        math.floor(exp_df * 1e6)
    ) // 1, got["burst"]
    assert got["glue"]["cf"] == 10 and got["glue"]["df"] == 10
    assert got["glue"]["burstiness_fp6"] == int(math.floor(exp_df * 1e6)) // 10
    assert got["burst"]["burstiness_fp6"] > 5 * got["glue"]["burstiness_fp6"]


def test_jl_projection_matches_python_replica(spark, tmp_path):
    """Tiny embeddings table (vec_ids 0, 25, 50 → all sampled): the Spark
    ratios must equal a from-scratch Python computation using the same
    inlined sign matrix."""
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = {vid: rng.randn(64).astype("float32") * 0.3 for vid in (0, 25, 50)}
    spark.createDataFrame(
        [(vid, [float(x) for x in v], 0) for vid, v in vecs.items()],
        "vec_id bigint, embedding array<float>, label int",
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.similarity import (
        _JL_M,
        _JL_SIGNS,
        q_jl_projection_audit,
    )

    x6 = {
        vid: [math.floor(float(x) * 1_000_000) for x in v]
        for vid, v in vecs.items()
    }
    y = {
        vid: [
            sum(s * xi for s, xi in zip(_JL_SIGNS[j], xv))
            for j in range(_JL_M)
        ]
        for vid, xv in x6.items()
    }
    expect = {}
    ids = sorted(vecs)
    for i, u in enumerate(ids):
        for v in ids[i + 1 :]:
            d2x = sum((a - b) ** 2 for a, b in zip(x6[u], x6[v]))
            d2y = sum((a - b) ** 2 for a, b in zip(y[u], y[v]))
            expect[(u, v)] = (d2x, d2y, d2y * 1_000_000 // (_JL_M * d2x))
    got = {
        (r["v1"], r["v2"]): (r["d2x"], r["d2y"], r["ratio_fp6"])
        for r in q_jl_projection_audit(spark, str(tmp_path)).collect()
    }
    assert got == expect, (got, expect)
