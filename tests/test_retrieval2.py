"""Semantics of plans/retrieval2.py on constructed inputs + plan invariants."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

import __spark_entry__ as entry_mod
from tools.plan_audit import audit

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))


def test_maxsim_exact_token_doc_wins(spark, tmp_path):
    """A doc containing EXACTLY query 1's tokens ('spark partition shuffle')
    must rank 1 for query 1: each query token's best match is itself —
    sim(t, t) = (d*d*1e6) div ((d+1)(d+1)) which strictly dominates any
    other token's squared cosine against t."""
    from arc_maskdata_pipeline_plugin_spark.plans.retrieval2 import (
        q_maxsim_late_interaction,
    )

    _write_docs(
        spark,
        tmp_path,
        [
            (1, "spark partition shuffle", "en", "s", 23),
            (2, "completely unrelated words here now", "en", "s", 35),
            (3, "spark only once", "en", "s", 15),
        ],
    )
    rows = q_maxsim_late_interaction(spark, str(tmp_path)).collect()
    q1 = sorted([r for r in rows if r.qid == 1], key=lambda r: r.rank)
    assert q1[0].doc_id == 1
    # the all-tokens doc strictly beats the one-token doc
    scores = {r.doc_id: r.maxsim_fp6 for r in q1}
    assert scores[1] > scores[3]


def test_maxsim_score_is_sum_of_per_token_maxima(spark, tmp_path):
    """One doc, one-token queries: the doc's score for a 3-token query must
    equal the sum of the three per-token best sims — verified by computing
    the expected integer arithmetic in Python over the same md5 bytes."""
    import hashlib

    from arc_maskdata_pipeline_plugin_spark.plans.retrieval2 import (
        _MAXSIM_QUERIES,
        q_maxsim_late_interaction,
    )

    words = ["spark", "partition", "alpha"]
    _write_docs(spark, tmp_path, [(1, " ".join(words), "en", "s", 21)])

    def vec(t):
        h = hashlib.md5(f"emb:{t}".encode()).hexdigest()
        return [int(h[2 * j : 2 * j + 2], 16) for j in range(8)]

    def sim(a, b):
        dot = sum(x * y for x, y in zip(vec(a), vec(b)))
        na = sum(x * x for x in vec(a)) + 1
        nb = sum(x * x for x in vec(b)) + 1
        return (dot * dot * 1_000_000) // (na * nb)

    qtoks = [t for q, _, t in _MAXSIM_QUERIES if q == 1]
    expected = sum(max(sim(w, qt) for w in words) for qt in qtoks)
    rows = q_maxsim_late_interaction(spark, str(tmp_path)).collect()
    got = {r.qid: r.maxsim_fp6 for r in rows if r.doc_id == 1}
    assert got[1] == expected


def test_hamming_identical_signs_rank_first(spark, tmp_path):
    """A candidate with the same sign pattern as the query has Hamming 0 and
    must rank 1; a fully sign-flipped candidate has Hamming 64 and ranks
    last. The identical-direction vector is also the exact-cosine top hit,
    so its witness flag is 1."""
    from arc_maskdata_pipeline_plugin_spark.plans.retrieval2 import (
        q_embedding_binarize_hamming,
    )

    base = [1.0 if j % 3 else -1.0 for j in range(64)]
    same = [x * 2.0 for x in base]          # same signs, same direction
    flipped = [-x for x in base]            # Hamming 64
    near = list(base)
    near[0] = -near[0]                      # Hamming 1
    _write_embeddings(
        spark,
        tmp_path,
        [(0, base, 0), (50, same, 0), (51, flipped, 0), (52, near, 0)],
    )
    rows = [r for r in q_embedding_binarize_hamming(spark, str(tmp_path)).collect() if r.query_id == 0]
    byrank = {r.rank: r for r in rows}
    assert byrank[1].neighbor_id == 50 and byrank[1].hamming == 0
    assert byrank[1].in_exact_topk == 1
    hams = {r.neighbor_id: r.hamming for r in rows}
    assert hams[52] == 1 and hams[51] == 64


def test_maxsim_single_corpus_scan_runtime(spark):
    """The persisted (doc, word) frame feeds both vocab and the score join:
    runtime reads the parquet once (two InMemoryTableScans in the executed
    plan; plan-STRING FileScan counts are inflated by the cache's build
    subtree and are not asserted)."""
    from arc_maskdata_pipeline_plugin_spark.cache import release_persisted

    df = entry_mod.queries()["q_maxsim_late_interaction"](spark, SF)
    df.count()
    s = df._jdf.queryExecution().executedPlan().toString()
    release_persisted()
    assert s.count("InMemoryTableScan") >= 2


def test_hamming_plan_no_sort_merge_join(spark):
    """Query set and exact-witness joins stay broadcast; candidate scoring
    is a broadcast nested loop over the packed frame, never a shuffle join."""
    a = audit(
        "q_embedding_binarize_hamming",
        entry_mod.queries()["q_embedding_binarize_hamming"],
        spark,
        SF,
    )
    assert a["sort_merge_joins"] == 0
    assert a["broadcasts"] >= 2
    assert a["python_ops"] == 0  # all JVM-side: no pandas UDFs in this path
