"""Dedup-operator behavior on synthetic data with KNOWN duplicates (the
oracle-parity suite proves engine equivalence; this proves the semantics)."""

from __future__ import annotations

import pytest

from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
    drop_exact_duplicates,
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    word_shingles,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "The quick  brown fox jumps over the lazy dog"),  # exact after norm
        (3, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
        (4, "completely different content about spark engines and shuffles"),
        (5, "completely different content about spark engines and shuffles"),  # exact
        (6, "unrelated short text"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_duplicates(docs):
    groups = {r.keep_id: r.n_copies for r in exact_duplicates(docs).collect()}
    assert groups == {1: 2, 4: 2}  # (1,2) normalize equal; (4,5) identical


def test_drop_exact_duplicates_keeps_min_id(docs):
    kept = sorted(r.doc_id for r in drop_exact_duplicates(docs).collect())
    assert kept == [1, 3, 4, 6]


def test_minhash_lsh_finds_near_dups(docs):
    sh = word_shingles(docs)
    sig = minhash_signatures(sh, num_hashes=8)
    pairs = {(r.d1, r.d2) for r in lsh_candidate_pairs(sig, num_hashes=8).collect()}
    assert (4, 5) in pairs  # identical shingle sets always collide
    # shingling is case-sensitive (normalization is the caller's choice, like
    # exact_duplicates' norm) — 1 vs 2 differ only in "The"/"the" and should
    # still band together with high probability at jaccard 0.75
    assert (1, 2) in pairs
    assert (1, 6) not in pairs


def test_jaccard_exactness(docs):
    sh = word_shingles(docs)
    pairs = {(r.d1, r.d2): r.jaccard for r in jaccard_pairs(sh, threshold=0.1).collect()}
    assert pairs[(4, 5)] == 1.0
    # docs 1/2: 7 shingles each, 6 shared ("The quick brown" ≠ "the quick brown")
    assert pairs[(1, 2)] == pytest.approx(6 / 8)
    # docs 1/3: only the final shingle contains the changed last word → 6/8
    assert pairs[(1, 3)] == pytest.approx(6 / 8)
    assert (1, 6) not in pairs


def test_streaming_mask_projection(spark, sf_small):
    from arc_maskdata_pipeline_plugin_spark.codecs.hmac_sha512 import HmacSHA512
    from arc_maskdata_pipeline_plugin_spark.functions.masking import register_udfs
    from arc_maskdata_pipeline_plugin_spark.streaming import (
        masked_event_stream,
        read_events_stream,
        run_available_now,
    )

    register_udfs(spark, codec=HmacSHA512(), passphrase=b"x" * 64)
    stream = read_events_stream(spark, sf_small)
    assert stream.isStreaming
    masked = masked_event_stream(stream)
    out = run_available_now(masked.groupBy("user_pseudonym").count(), "t_masked_stream")
    rows = out.collect()
    assert len(rows) > 0
    assert all(len(r.user_pseudonym) == 8 and r.user_pseudonym.isdigit() for r in rows)


def test_lsh_viral_bucket_cap(spark):
    """max_bucket_size drops viral buckets from pair generation, and the
    audit companion reports exactly what was dropped."""
    import pandas as pd
    from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_dropped_buckets,
        minhash_signatures,
        word_shingles,
    )

    # 20 copies of identical boilerplate (one viral bucket family) + 2 near-dups
    rows = [(i, "the same boilerplate text repeated again and again") for i in range(20)]
    rows += [(100, "a unique document about spark engines"),
             (101, "a unique document about spark engines!")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    sigs = minhash_signatures(word_shingles(df, distinct=False))

    uncapped = lsh_candidate_pairs(sigs)
    capped = lsh_candidate_pairs(sigs, max_bucket_size=5)
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_cap < n_un  # the 20-doc clique's 190 pairs are gone
    # the small near-dup pair survives the cap
    assert capped.filter("d1 = 100 AND d2 = 101").count() == 1

    dropped = lsh_dropped_buckets(sigs, max_bucket_size=5)
    assert dropped.count() > 0
    assert dropped.agg({"n_docs": "max"}).collect()[0][0] == 20


def test_incremental_dedup_against_corpus(spark):
    """New batch vs persisted corpus band store: near-dups of corpus docs are
    dropped, fresh docs survive, and the returned survivor bands extend the
    store so the next increment sees them."""
    from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
        incremental_dedup_new_docs,
        minhash_signatures,
        signature_bands,
        word_shingles,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river"),
            (2, "completely different content about distributed query engines"),
        ],
        "doc_id LONG, text STRING",
    )
    store = signature_bands(
        minhash_signatures(word_shingles(corpus, distinct=False))
    )

    batch = spark.createDataFrame(
        [
            # near-dup of corpus doc 1 (shares most shingles)
            (10, "the quick brown fox jumps over the lazy dog near the river!"),
            # genuinely new
            (11, "a brand new article describing minhash banding at scale"),
        ],
        "doc_id LONG, text STRING",
    )
    survivors, survivor_bands = incremental_dedup_new_docs(batch, store)
    ids = [r.doc_id for r in survivors.collect()]
    assert ids == [11]
    # survivor bands cover exactly the surviving doc
    assert {r.doc_id for r in survivor_bands.collect()} == {11}
    # appending them makes the next identical batch fully deduped
    store2 = store.union(survivor_bands)
    survivors2, _ = incremental_dedup_new_docs(batch, store2)
    assert survivors2.count() == 0


def test_ivf_precomputed_store_matches_inline(spark, tmp_path):
    """IVF with a persisted assignment store (the at-ingest production shape)
    returns exactly the inline-quantized result."""
    from arc_maskdata_pipeline_plugin_spark.operators.similarity import (
        ann_ivf,
        ivf_assignments,
        ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter("vec_id % 37 = 0")

    inline = ann_ivf(emb, queries, k=3, n_cells=8, n_probes=3)

    cents = ivf_centroids(emb, n_cells=8)
    store_path = str(tmp_path / "ivf_assign")
    ivf_assignments(emb, cents).write.partitionBy("cell").parquet(store_path)
    store = spark.read.parquet(store_path)
    from_store = ann_ivf(
        emb, queries, k=3, n_cells=8, n_probes=3, assignments=store, cents=cents
    )

    def rows(df):
        return sorted(
            (r.query_id, r.neighbor_id, r.rank, round(r.cosine, 12))
            for r in df.collect()
        )

    assert rows(inline) == rows(from_store)
    assert len(rows(inline)) > 0


def test_scrub_pii_tokens(spark):
    from arc_maskdata_pipeline_plugin_spark.operators.text import scrub_pii

    rows = [
        (1, "mail me at jane.doe+x@sub.example.co.uk today"),
        (2, "see https://a.example/path?q=1&u=bob@x.com for info"),
        (3, "server 192.168.0.1 phone +61 (2) 9999-1234 end"),
        (4, "clean text stays untouched"),
    ]
    got = {r.doc_id: r.scrubbed for r in
           scrub_pii(spark.createDataFrame(rows, ["doc_id", "text"])).collect()}
    assert got[1] == "mail me at <EMAIL> today"
    # URL rule runs first, so the embedded email never fires separately
    assert got[2] == "see <URL> for info"
    assert got[3] == "server <IP> phone <PHONE> end"
    assert got[4] == "clean text stays untouched"


def test_quality_filter_flags(spark):
    from arc_maskdata_pipeline_plugin_spark.operators.text import quality_filter

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "x"),                                  # too short
        (3, "!!! ??? ;;; ,,, ... !!! ??? ;;;"),    # punctuation soup
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r for r in quality_filter(df, min_stopword_ratio=0.05).collect()}
    assert got[1].passes
    assert not got[2].len_ok and not got[2].passes
    assert not got[3].alpha_ok and not got[3].punct_ok and not got[3].passes


def test_repetition_stats_values(spark):
    from arc_maskdata_pipeline_plugin_spark.operators.text import with_repetition_stats

    df = spark.createDataFrame([(1, "a a a b"), (2, "w x y z")], ["doc_id", "text"])
    got = {r.doc_id: r for r in with_repetition_stats(df).collect()}
    assert got[1].n_words == 4 and got[1].n_distinct == 2
    assert got[1].top_word_share == 0.75 and got[1].distinct_ratio == 0.5
    assert got[2].top_word_share == 0.25 and got[2].distinct_ratio == 1.0


def test_qgram_match_finds_near_names(spark):
    from arc_maskdata_pipeline_plugin_spark.operators.fuzzy import qgram_match

    l = spark.createDataFrame(
        [(1, "Acme Corporation"), (2, "Globex Industries"), (3, "zzz")],
        ["lid", "name"],
    )
    r = spark.createDataFrame(
        [(10, "ACME Corp."), (20, "Globex Industies"), (30, "Unrelated Pty")],
        ["rid", "name"],
    )
    got = {(x.lid, x.rid): x for x in
           qgram_match(l, r, "lid", "rid", "name", "name",
                       min_common=3, max_edit_distance=12).collect()}
    assert (1, 10) in got            # case/punct variant
    assert (2, 20) in got            # one-char typo
    assert got[(2, 20)].edit_distance == 1
    assert all(k[0] != 3 for k in got)  # no grams in common -> never a candidate


def test_qgram_stop_gram_cap(spark):
    from arc_maskdata_pipeline_plugin_spark.operators.fuzzy import (
        dropped_grams,
        qgram_match,
    )

    # every left row shares the viral ' x ' gram with every right row
    # (single-digit ids: no secondary digit-gram overlap muddies the cap)
    l = spark.createDataFrame([(i, f"x aaa{i}") for i in range(10)], ["lid", "name"])
    r = spark.createDataFrame([(i, f"x bbb{i}") for i in range(10)], ["rid", "name"])
    uncapped = qgram_match(l, r, "lid", "rid", "name", "name", min_common=1)
    capped = qgram_match(
        l, r, "lid", "rid", "name", "name", min_common=1, max_gram_freq=5
    )
    assert uncapped.count() >= 100          # quadratic blow-up
    assert capped.count() == 0              # viral grams dropped
    audit = dropped_grams(l, r, "name", "name", max_gram_freq=5)
    assert audit.count() > 0                # and the drop is audited
