"""Greedy char-budget UDTF chunker (plans/rag.py): packing invariants on
constructed docs — budget respected, no word dropped, oversized word gets
its own chunk, boundaries match a pure-Python reference."""

from __future__ import annotations

import arc_maskdata_pipeline_plugin_spark.plans.rag as rag

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _run(spark, texts):
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    orig = rag.T
    try:
        rag.T = lambda sp, sf, name: sp.createDataFrame(rows, DOC_SCHEMA)
        return sorted(
            (
                (r["doc_id"], r["chunk_id"], r["n_words"],
                 r["n_chars_packed"], r["first_word_idx"])
                for r in rag.q_greedy_chunk_udtf(spark, "x").collect()
            )
        )
    finally:
        rag.T = orig


def _ref(texts, budget=rag._CHUNK_BUDGET):
    import re

    out = []
    for doc_id, t in enumerate(texts):
        toks = [
            re.sub(r"[^a-z0-9]", "", w)
            for w in t.lower().strip().split()
        ]
        toks = [w for w in toks if w]
        if not toks:
            continue
        cid, start, words, chars = 0, 1, 0, 0
        for i, w in enumerate(toks, start=1):
            cost = len(w) if words == 0 else len(w) + 1
            if words > 0 and chars + cost > budget:
                out.append((doc_id, cid, words, chars, start))
                cid, start, words, chars = cid + 1, i, 1, len(w)
            else:
                words, chars = words + 1, chars + cost
        out.append((doc_id, cid, words, chars, start))
    return sorted(out)


def test_matches_reference_and_invariants(spark):
    texts = [
        " ".join(f"word{i:03d}" for i in range(120)),   # many chunks
        "single",                                        # one tiny chunk
        "x" * 500,                                       # oversized word
        " ".join(["abcdefghij"] * 40),                   # exact-fit packing
        "",                                              # empty -> no rows
        "!!! ???",                                       # tokens vanish
    ]
    got = _run(spark, texts)
    assert got == _ref(texts)
    for _doc, _cid, words, chars, _s in got:
        assert words >= 1
        # budget respected unless the chunk is a single oversized word
        assert chars <= rag._CHUNK_BUDGET or words == 1
    # no word dropped: per doc, Σ n_words == token count
    from collections import Counter

    per_doc = Counter()
    for doc, _cid, words, _chars, _s in got:
        per_doc[doc] += words
    assert per_doc[0] == 120
    assert per_doc[1] == 1
    assert per_doc[2] == 1
    assert per_doc[3] == 40
    assert 4 not in per_doc and 5 not in per_doc


def test_empty_corpus(spark):
    assert _run(spark, []) == []
