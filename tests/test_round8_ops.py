"""Round-8 operator semantics on constructed inputs.

Each test writes a tiny documents/embeddings parquet into tmp_path and runs
the registered query against it, asserting hand-computed expected values —
the semantics layer of the per-operator checklist (oracle parity is the
cross-engine layer; these pin the MEANING)."""

from __future__ import annotations

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def _write_docs(spark, tmp_path, rows):
    _docs(spark, rows).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )


def test_decontaminate_spans_merges_contiguous_windows(spark, tmp_path):
    """A 15-token verbatim copy at train positions 6..20 yields matched
    8-gram windows at positions 6..13 that merge into ONE maximal span
    [6, 20]; a 9-token copy (2 windows) stays under MIN_SHARED=3; two
    far-apart 10-token copies yield TWO islands of 3 windows each."""
    bench_toks = [f"b{i}" for i in range(30)]
    copy15 = bench_toks[5:20]
    copy9 = bench_toks[0:9]
    copy10a = bench_toks[0:10]
    copy10b = bench_toks[15:25]
    rows = [
        (0, " ".join(bench_toks), "en", "eval"),  # doc_id % 50 == 0 → bench
        (1, " ".join([f"j{i}" for i in range(5)] + copy15 + [f"k{i}" for i in range(5)]), "en", "train"),
        (2, " ".join([f"m{i}" for i in range(5)] + copy9 + [f"n{i}" for i in range(5)]), "en", "train"),
        (3, " ".join(copy10a + [f"z{i}" for i in range(12)] + copy10b), "en", "train"),
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.training import (
        q_decontaminate_spans,
    )

    out = q_decontaminate_spans(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.train_doc_id, []).append(r)

    # doc 1: one merged span covering the whole copied segment
    (s1,) = by_doc[1]
    assert (s1.bench_doc_id, s1.span_start, s1.span_end) == (0, 6, 20)
    assert s1.span_tokens == 15 and s1.n_windows == 8

    # doc 2: only 2 matched windows < MIN_SHARED → no evidence rows
    assert 2 not in by_doc

    # doc 3: two disjoint copies → two islands, 3 windows / 10 tokens each
    spans3 = sorted(by_doc[3], key=lambda r: r.span_start)
    assert len(spans3) == 2
    assert (spans3[0].span_start, spans3[0].span_end) == (1, 10)
    assert (spans3[1].span_start, spans3[1].span_end) == (23, 32)
    for s in spans3:
        assert s.span_tokens == 10 and s.n_windows == 3


def test_decontaminate_spans_consistent_with_doc_level_screen(spark, tmp_path):
    """Every span-evidence pair must also be flagged by the doc-level
    screen when the shared grams are distinct (the doc screen counts
    DISTINCT grams, spans count positions — identical on non-repeating
    text)."""
    bench_toks = [f"b{i}" for i in range(20)]
    rows = [
        (0, " ".join(bench_toks), "en", "eval"),
        (7, " ".join(bench_toks[2:16]) + " x1 x2 x3", "en", "train"),
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.training import (
        q_decontaminate_ngrams,
        q_decontaminate_spans,
    )

    span_pairs = {
        (r.train_doc_id, r.bench_doc_id)
        for r in q_decontaminate_spans(spark, str(tmp_path)).collect()
    }
    doc_pairs = {
        (r.train_doc_id, r.bench_doc_id)
        for r in q_decontaminate_ngrams(spark, str(tmp_path)).collect()
    }
    assert span_pairs == doc_pairs == {(7, 0)}


def test_bpe_vocab_sweep_monotone_and_replay_exact(spark, tmp_path):
    """One training run prices every vocabulary prefix: token mass is
    non-increasing in merge count, checkpoint 0 is the raw byte+marker
    mass, saved_vs_prev telescopes, and the full-prefix replay reproduces
    the trained segmentation (replay_lossy == 0)."""
    rows = [
        (0, "aaab aaab aaab banana banana", "en", "s1"),
        (1, "aaab cacao", "en", "s2"),
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.bpe2 import (
        N_BYTE_MERGES,
        SWEEP_CHECKPOINTS,
        q_bpe_vocab_sweep,
    )

    out = sorted(
        q_bpe_vocab_sweep(spark, str(tmp_path)).collect(),
        key=lambda r: r.n_merges,
    )
    assert [r.n_merges for r in out] == SWEEP_CHECKPOINTS
    # checkpoint 0: every occurrence costs len(word)+1 byte symbols
    # (the B32 space marker + one symbol per byte)
    words = "aaab aaab aaab banana banana aaab cacao".split()
    assert out[0].n_words == len(words)
    assert out[0].n_bytes == sum(len(w) + 1 for w in words)
    assert out[0].n_byte_tokens == out[0].n_bytes
    assert out[0].saved_vs_prev_tokens == 0
    # merges only ever shrink the token mass, and the savings telescope
    for prev, cur in zip(out, out[1:]):
        assert cur.n_byte_tokens <= prev.n_byte_tokens
        assert cur.saved_vs_prev_tokens == prev.n_byte_tokens - cur.n_byte_tokens
        assert cur.n_words == out[0].n_words and cur.n_bytes == out[0].n_bytes
    # the full checkpoint replays the shipped artifact losslessly
    full = [r for r in out if r.n_merges == N_BYTE_MERGES]
    assert full and full[0].replay_lossy == 0
    # 8 merges on this corpus genuinely compress (aaab appears 4×)
    assert out[-1].n_byte_tokens < out[0].n_byte_tokens


def _winnow_reference(tokens, k=4, w=4):
    """Pure-Python robust winnowing (rightmost-min per window) mirroring the
    query's md5-derived 32-bit hashes — the independent recurrence replica
    (the house pattern for testing order-sensitive algorithms)."""
    import hashlib

    n_pos = len(tokens) - k + 1
    h = [
        int(hashlib.md5(" ".join(tokens[p : p + k]).encode()).hexdigest()[:8], 16)
        for p in range(n_pos)
    ]
    sel = set()
    for j in range(n_pos - w + 1):
        window = h[j : j + w]
        m = min(window)
        # rightmost occurrence of the minimum
        p = j + max(i for i, v in enumerate(window) if v == m)
        sel.add(p)
    positions = sorted(sel)
    gaps = [b - a for a, b in zip(positions, positions[1:])]
    return {
        "n_kgrams": n_pos,
        "n_fingerprints": len(positions),
        "max_gap": max(gaps) if gaps else 0,
        "fp_checksum": sum(h[p] for p in positions),
    }


def test_winnowing_matches_python_reference(spark, tmp_path):
    """The Spark winnowing selection must equal an independent pure-Python
    implementation hash-for-hash (checksum pins the selected SET), and the
    winnowing guarantee max_gap <= w must hold."""
    texts = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "pack my box with five dozen liquor jugs said the sphinx of quartz",
        "one two three four five six seven eight nine ten eleven twelve",
        "repeat repeat repeat repeat repeat repeat repeat repeat repeat repeat",
    ]
    rows = [(i, t, "en", "s") for i, t in enumerate(texts)]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import (
        _WIN_K,
        _WIN_W,
        q_winnowing_fingerprints,
    )

    out = {r.doc_id: r for r in q_winnowing_fingerprints(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 1, 2, 3}
    for i, t in enumerate(texts):
        ref = _winnow_reference(t.split(), k=_WIN_K, w=_WIN_W)
        r = out[i]
        assert r.n_kgrams == ref["n_kgrams"], i
        assert r.n_fingerprints == ref["n_fingerprints"], i
        assert r.max_gap == ref["max_gap"], i
        assert r.fp_checksum == ref["fp_checksum"], i
        assert r.max_gap <= _WIN_W  # the winnowing coverage guarantee


def test_dedup_recall_comparison_planted_truth(spark, tmp_path):
    """An exact duplicate pair (J = 1: caught by BOTH detectors, each by
    its own theorem — identical signatures band together; identical
    fingerprint sets share everything) plus a sub-threshold pair (J < 1/2,
    excluded from truth) and a loner: truth = 1 pair, both recalls 100%."""
    dup_toks = [f"w{i}" for i in range(20)]
    weak = dup_toks[:7] + [f"v{i}" for i in range(13)]  # small overlap, J<0.5
    rows = [
        (0, " ".join(dup_toks), "en", "s"),
        (1, " ".join(dup_toks), "en", "s"),
        (2, " ".join(weak), "en", "s"),
        (3, " ".join(f"z{i}" for i in range(20)), "en", "s"),
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import (
        q_dedup_recall_comparison,
    )

    (r,) = q_dedup_recall_comparison(spark, str(tmp_path)).collect()
    assert r.n_truth_pairs == 1
    assert r.n_minhash_found == 1 and r.n_winnow_found == 1
    assert r.n_found_by_both == 1
    assert r.minhash_recall_fp6 == r.winnow_recall_fp6 == 1_000_000


def test_winnowing_dup_pairs_locality_guarantee(spark, tmp_path):
    """Winnowing's locality theorem: two docs sharing a run of k+w−1 = 7
    tokens ANYWHERE must share at least one selected fingerprint. Plant a
    12-token shared run inside otherwise-distinct docs → the pair appears
    with n_shared_fps ≥ 2; a doc with no overlap appears in no pair."""
    shared = [f"s{i}" for i in range(12)]
    rows = [
        (0, " ".join([f"a{i}" for i in range(6)] + shared + [f"b{i}" for i in range(6)]), "en", "x"),
        (1, " ".join([f"c{i}" for i in range(9)] + shared + [f"e{i}" for i in range(3)]), "en", "x"),
        (2, " ".join([f"z{i}" for i in range(20)]), "en", "x"),
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import (
        q_winnowing_dup_pairs,
    )

    out = q_winnowing_dup_pairs(spark, str(tmp_path)).collect()
    pairs = {(r.d1, r.d2): r for r in out}
    assert set(pairs) == {(0, 1)}
    r = pairs[(0, 1)]
    assert r.n_shared_fps >= 2
    assert 0 < r.fp_jaccard_fp6 < 1_000_000


def test_layout_advisor_matches_python_replica(spark, tmp_path):
    """Replicate the whole advisor in pure Python on a constructed 128-row
    orders table (NTILE(64) = exactly 2 rows per file): per-layout zone
    maps, workload evaluation, and ranking must match row-for-row — the
    winnowing-reference pattern applied to the layout simulation."""
    import hashlib
    from datetime import date, timedelta

    rows = []
    for i in range(128):
        d = date(1994, 1, 1) + timedelta(days=i)
        rows.append(
            (
                i,                      # o_orderkey
                200 + (i * 37) % 128,   # o_custkey (all inside [100,500])
                d.strftime("%Y-%m-%d"), # o_orderdate (string → Spark casts)
                50.0 + (i * 73) % 128,  # o_totalprice (max cents ≪ price pred)
                "5-LOW",                # o_orderpriority (never 1-URGENT)
            )
        )
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate string, "
        "o_totalprice double, o_orderpriority string",
    ).selectExpr(
        "o_orderkey",
        "o_custkey",
        "cast(o_orderdate as timestamp) as o_orderdate",
        "o_totalprice",
        "o_orderpriority",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    from arc_maskdata_pipeline_plugin_spark.plans.lakeops2 import (
        _ADV_FILES,
        _ADV_PREDICATES,
        q_layout_advisor,
    )

    recs = [
        {
            "okey": i,
            "d": (date(1994, 1, 1) + timedelta(days=i)).strftime("%Y-%m-%d"),
            "cents": round((50.0 + (i * 73) % 128) * 100),
            "prio": "5-LOW",
            "ck": 200 + (i * 37) % 128,
        }
        for i in range(128)
    ]
    def _morton(x, y, bits=10):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    _Z_BASE = date(1992, 1, 1)
    sort_vals = {
        "bydate": lambda r: int(r["d"].replace("-", "")),
        "byprice": lambda r: r["cents"],
        "bycust": lambda r: r["ck"],
        "arrival": lambda r: int(
            hashlib.md5(f"adv:{r['okey']}".encode()).hexdigest()[:8], 16
        ),
        # r09 candidates: composite (date << 30 | ck low 30 bits) + Morton
        "datecust": lambda r: (int(r["d"].replace("-", "")) << 30)
        + (r["ck"] & 1073741823),
        "zorder": lambda r: _morton(
            r["ck"] & 1023, (date.fromisoformat(r["d"]) - _Z_BASE).days & 1023
        ),
    }
    expected = {}
    for lay, sv in sort_vals.items():
        ordered = sorted(recs, key=lambda r: (sv(r), r["okey"]))
        files = [ordered[k * 2 : k * 2 + 2] for k in range(_ADV_FILES)]
        scanned = files_read = 0
        for _, col, lo, hi in _ADV_PREDICATES:
            lo, hi = lo.strip("'"), hi.strip("'")
            for f in files:
                vals = [r[{"d": "d", "cents": "cents", "prio": "prio", "ck": "ck"}[col]] for r in f]
                zmin, zmax = min(vals), max(vals)
                lo_c = int(lo) if col in ("cents", "ck") else lo
                hi_c = int(hi) if col in ("cents", "ck") else hi
                if not (zmax < lo_c or zmin > hi_c):
                    scanned += len(f)
                    files_read += 1
        expected[lay] = (scanned, files_read)
    ranks = {
        lay: 1 + sum(
            1
            for o, v in expected.items()
            if (v[0], o) < (expected[lay][0], lay)
        )
        for lay in expected
    }

    out = {r.layout: r for r in q_layout_advisor(spark, str(tmp_path)).collect()}
    assert set(out) == set(expected)
    for lay, (scanned, files_read) in expected.items():
        assert out[lay].workload_rows_scanned == scanned, lay
        assert out[lay].workload_files_read == files_read, lay
        assert out[lay].advisor_rank == ranks[lay], lay
        assert out[lay].n_files == _ADV_FILES
    # the date predicates dominate this workload → bydate must win
    assert out["bydate"].advisor_rank == 1


def test_corpus_release_report_full_funnel(spark, tmp_path):
    """One source exercising every release stage: an eval doc (id%50==0),
    a train doc contaminated by it (verbatim 15-token copy), a stitch pair
    (flagged, kept), and an exact duplicate pair (soft-weighted ×1/2).
    Every emitted column is hand-derivable."""
    ev = [f"e{i}" for i in range(20)]
    bridge = [f"b{i}" for i in range(8)]
    # distinct tokens: an all-same-token duplicate would legitimately
    # self-stitch (its tail 8-gram equals its twin's head 8-gram)
    dup = " ".join(f"d{i}" for i in range(10))
    rows = [
        (0, " ".join(ev), "en", "s"),                                  # eval
        (1, " ".join(ev[2:17]) + " j1 j2 j3", "en", "s"),              # contaminated (15-token copy)
        (2, " ".join([f"x{i}" for i in range(10)] + bridge), "en", "s"),  # stitch left
        (3, " ".join(bridge + [f"y{i}" for i in range(10)]), "en", "s"),  # stitch right
        (4, dup, "en", "s"),                                           # dup A
        (5, dup, "en", "s"),                                           # dup B
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.refresh import (
        _RELEASE_CTX,
        q_corpus_release_report,
    )

    (r,) = q_corpus_release_report(spark, str(tmp_path)).collect()
    assert r.source == "s"
    assert r.n_docs_raw == 6
    assert r.n_eval_held_out == 1
    assert r.n_contaminated == 1          # doc 1 only
    assert r.n_stitch_flagged == 2        # docs 2 and 3 (flagged, NOT dropped)
    assert r.n_clean_docs == 4            # docs 2, 3, 4, 5
    clean_tokens = 18 + 18 + 10 + 10
    assert r.clean_tokens == clean_tokens
    # docs 4/5 are an exact-dup cluster of size 2 → half weight each
    assert r.effective_tokens_fp6 == (18 + 18) * 1_000_000 + 2 * 10 * (1_000_000 // 2)
    assert r.n_packs == 1 and _RELEASE_CTX >= clean_tokens
    assert r.fill_ppm == clean_tokens * 1_000_000 // _RELEASE_CTX


def test_doc_stitch_pairs_planted_fragments(spark, tmp_path):
    """Doc 1's tail 8-gram equals doc 2's head 8-gram (a split page) →
    exactly the ordered pair (1, 2); an 8-gram shared mid-document must
    NOT match (stitching is strictly tail-to-head); short docs (< 8
    tokens) are excluded."""
    bridge = [f"b{i}" for i in range(8)]
    rows = [
        (1, " ".join([f"x{i}" for i in range(10)] + bridge), "en", "s"),
        (2, " ".join(bridge + [f"y{i}" for i in range(10)]), "en", "s"),
        # shares the bridge INSIDE the text only — not a stitch
        (3, " ".join([f"z{i}" for i in range(3)] + bridge + ["tail1", "tail2"]), "en", "s"),
        (4, "too short doc", "en", "s"),
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import q_doc_stitch_pairs

    out = q_doc_stitch_pairs(spark, str(tmp_path)).collect()
    pairs = {(r.left_doc, r.right_doc) for r in out}
    assert pairs == {(1, 2)}
    (r,) = out
    assert (r.left_tokens, r.right_tokens) == (18, 18)


def test_soft_dedup_weights_hand_computed(spark, tmp_path):
    """Three identical 10-token docs (two in source a, one in b) + one
    unique 5-token doc in a: cluster size 3 spans sources, so source a's
    effective mass is 2·10·⌊1e6/3⌋ + 5·1e6 and b's is 10·⌊1e6/3⌋."""
    dup = " ".join(["d"] * 10)
    rows = [
        (0, dup, "en", "a"),
        (1, dup, "en", "a"),
        (2, dup, "en", "b"),
        (3, "u1 u2 u3 u4 u5", "en", "a"),
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import q_dedup_soft_weights

    out = {r.source: r for r in q_dedup_soft_weights(spark, str(tmp_path)).collect()}
    w3 = 1_000_000 // 3
    a, b = out["a"], out["b"]
    assert (a.n_docs, a.n_clusters, a.raw_tokens) == (3, 2, 25)
    assert a.effective_tokens_fp6 == 2 * 10 * w3 + 5 * 1_000_000
    assert a.n_duplicated_docs == 2
    assert (b.n_docs, b.n_clusters, b.raw_tokens) == (1, 1, 10)
    assert b.effective_tokens_fp6 == 10 * w3
    assert b.n_duplicated_docs == 1


def test_repetition_period_known_loops(spark, tmp_path):
    """Hand-checkable periods: a pure 2-token loop → period 2; a 3-token
    loop with a ragged tail → period 3 (periods need not divide n); an
    all-same-token doc → period 1; aperiodic text → period n; a single
    token → period 1 = n."""
    rows = [
        (0, "buy now buy now buy now buy now", "en", "s"),          # n=8, p=2
        (1, "a b c a b c a b", "en", "s"),                           # n=8, p=3
        (2, "x x x x x", "en", "s"),                                 # n=5, p=1
        (3, "one two three four five six seven", "en", "s"),         # n=7, p=7
        (4, "solo", "en", "s"),                                      # n=1, p=1
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.text import q_repetition_period

    out = {r.doc_id: r for r in q_repetition_period(spark, str(tmp_path)).collect()}
    assert (out[0].n_tokens, out[0].min_period) == (8, 2)
    assert (out[1].n_tokens, out[1].min_period) == (8, 3)
    assert (out[2].n_tokens, out[2].min_period) == (5, 1)
    assert (out[3].n_tokens, out[3].min_period) == (7, 7)
    assert (out[4].n_tokens, out[4].min_period) == (1, 1)
    assert out[0].tail_cover_fp6 == (8 - 2) * 1_000_000 // 8
    assert out[3].tail_cover_fp6 == 0
    assert out[2].tail_cover_fp6 == (5 - 1) * 1_000_000 // 5


def test_packing_efficiency_sweep_hand_computed(spark, tmp_path):
    """Three docs of 300/300/500 tokens in one source: boundary-crossing
    counts, pack counts, and fill rates must match hand-derived values for
    every swept context length."""
    rows = [
        (0, " ".join(["w"] * 300), "en", "s"),
        (1, " ".join(["w"] * 300), "en", "s"),
        (2, " ".join(["w"] * 500), "en", "s"),
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.text import (
        PACK_SWEEP_LENGTHS,
        q_packing_efficiency_sweep,
    )

    out = {r.context_len: r for r in q_packing_efficiency_sweep(spark, str(tmp_path)).collect()}
    assert sorted(out) == PACK_SWEEP_LENGTHS
    total = 1100
    # cum_before per doc (doc_id order): 0, 300, 600
    expected_splits = {512: 2, 1024: 1, 2048: 0, 4096: 0}
    for L, r in out.items():
        assert r.n_docs == 3 and r.total_tokens == total
        n_packs = -(-total // L)
        assert r.n_packs == n_packs, L
        assert r.n_split_docs == expected_splits[L], L
        assert r.fill_ppm == total * 1_000_000 // (n_packs * L), L
    # fill monotonically benefits from shorter contexts when totals are
    # fixed by last-pack padding only
    assert out[512].fill_ppm > out[4096].fill_ppm


def test_hubness_audit_planted_hub_and_antihub(spark, tmp_path):
    """9 identical cluster vectors + 1 orthogonal loner (all ids ≡ 0 mod 4
    so the audit sample keeps them): tie-break-by-id routes every top-5
    slot to the five lowest cluster ids — histogram must be exactly
    {9: 5 points, 5: 1 point, 0: 4 points} (the loner and the three
    highest-id cluster members are anti-hubs), and mass must conserve
    (Σ k·n = n_queries·k)."""
    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    rows = [(i * 4, e1, 0) for i in range(9)] + [(36, e2, 1)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.similarity import (
        _HUB_K,
        q_hubness_audit,
    )

    hist = {
        r.k_occurrences: r.n_points
        for r in q_hubness_audit(spark, str(tmp_path)).collect()
    }
    assert hist == {9: 5, 5: 1, 0: 4}
    assert sum(k * n for k, n in hist.items()) == 10 * _HUB_K
    assert sum(hist.values()) == 10
