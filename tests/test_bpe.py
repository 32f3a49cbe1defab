"""BPE trainer correctness against an independent pure-Python reference.

Two layers:
* the space-padded ``str.replace`` merge trick is proven equivalent to the
  canonical symbol-list greedy merge on adversarial overlap cases and
  random words (hypothesis);
* the full Spark trainer's merge table equals a from-scratch Python BPE
  (collections.Counter over the same parquet corpus) at sf0.001.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from arc_maskdata_pipeline_plugin_spark.plans.bpe import N_MERGES, _train_bpe

SF_DIR = "/root/testdata/sf0.001"


# --- canonical reference implementations ---------------------------------


def merge_symbols(symbols: list[str], pair: tuple[str, str]) -> list[str]:
    """Greedy left-to-right single-pair merge on a symbol list (the textbook
    BPE inner loop)."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if i + 1 < len(symbols) and (symbols[i], symbols[i + 1]) == pair:
            out.append(symbols[i] + symbols[i + 1])
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def merge_via_replace(symbols: list[str], pair: tuple[str, str]) -> list[str]:
    """The engine's trick: double-space joins, plain str.replace, resplit.
    Each match consumes half of each outer separator, so consecutive
    occurrences don't steal each other's boundary space."""
    seq = "  " + "  ".join(symbols) + "  "
    seq = seq.replace(f" {pair[0]}  {pair[1]} ", f" {pair[0]}{pair[1]} ")
    return seq.split()


def python_bpe(words: dict[str, int], n_merges: int):
    """From-scratch reference trainer (Counter-based, no Spark)."""
    from collections import Counter

    seqs = {w: [*w, "</w>"] for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for w, n in words.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += n
        # count DESC, then lexicographic pair ASC — the engine's tiebreak
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((step, a, b, a + b, c))
        seqs = {w: merge_symbols(s, (a, b)) for w, s in seqs.items()}
    return merges, seqs


# --- merge-trick equivalence ----------------------------------------------


@pytest.mark.parametrize(
    "symbols,pair",
    [
        (["a", "a", "a"], ("a", "a")),  # overlapping run: greedy takes 1st
        (["a", "a", "a", "a"], ("a", "a")),  # even run: two merges
        (["x", "a", "b", "a", "b", "x"], ("a", "b")),  # back-to-back pairs
        (["a", "b", "a", "b", "a"], ("a", "b")),
        (["a", "b"], ("a", "b")),
        (["a"], ("a", "a")),
        (["ab", "a", "b"], ("a", "b")),  # merged symbol ≠ its concat parts
    ],
)
def test_replace_trick_matches_symbol_merge(symbols, pair):
    assert merge_via_replace(symbols, pair) == merge_symbols(symbols, pair)


@given(
    st.lists(st.sampled_from(["a", "b", "ab", "c", "</w>"]), min_size=1, max_size=12),
    st.tuples(st.sampled_from(["a", "b", "ab", "c"]), st.sampled_from(["a", "b", "ab", "c"])),
)
@settings(max_examples=200, deadline=None)
def test_replace_trick_property(symbols, pair):
    assert merge_via_replace(symbols, pair) == merge_symbols(symbols, pair)


# --- full trainer vs from-scratch Python over the real corpus -------------


def _corpus_words() -> dict[str, int]:
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        rf"""
        SELECT word, COUNT(*) AS n FROM (
          SELECT unnest(list_filter(list_transform(
            string_split_regex(lower(trim(text)), '\s+'),
            t -> regexp_replace(t, '[^a-z0-9]', '', 'g')), t -> t <> '')) AS word
          FROM read_parquet('{SF_DIR}/documents.parquet')
        ) GROUP BY word
        """
    ).fetchall()
    return dict(rows)


def test_spark_trainer_matches_python_reference(spark):
    merges, final = _train_bpe(spark, SF_DIR, N_MERGES)
    final.unpersist()
    ref_merges, _ = python_bpe(_corpus_words(), N_MERGES)
    assert merges == ref_merges


def test_encode_counts_match_python_reference(spark):
    from pyspark.sql import functions as F

    words = _corpus_words()
    ref_merges, ref_seqs = python_bpe(words, N_MERGES)
    _, final = _train_bpe(spark, SF_DIR, N_MERGES)
    got = {
        r["word"]: r["n_sym"]
        for r in final.select(
            "word", F.size(F.split(F.trim("seq"), " +")).alias("n_sym")
        ).collect()
    }
    final.unpersist()
    want = {w: len(s) for w, s in ref_seqs.items()}
    assert got == want
