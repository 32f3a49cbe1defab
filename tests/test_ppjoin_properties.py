"""Property test: PPJoin candidate generation is COMPLETE on arbitrary
small corpora.

The prefix-filter guarantee is combinatorial (any two sets with J >= tau
share a token in their rare-first prefixes), so it is exactly the kind of
claim a constructed-example test under-covers: completeness failures hide
in tie-breaks (equal document frequencies), duplicate sets, singleton
tokens, and sets of size 1. Hypothesis drives the SPARK operator over
random corpora drawn from a deliberately tiny alphabet (maximizing shared
frequent tokens — the regime where prefixes prune hardest) and checks the
candidate set against the brute-force truth computed in Python.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ALPHABET = [f"w{i}" for i in range(6)]

_corpora = st.lists(
    st.sets(st.sampled_from(_ALPHABET), min_size=1, max_size=6),
    min_size=2,
    max_size=7,
)


def _true_pairs(sets: list[set]) -> set[tuple[int, int]]:
    out = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            if 2 * inter >= len(sets[i] | sets[j]):  # J >= 1/2
                out.add((i, j))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_corpora)
def test_ppjoin_candidates_superset_of_true_pairs(spark, corpora):
    from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
        ppjoin_candidate_pairs,
    )

    rows = [(i, t) for i, s in enumerate(corpora) for t in s]
    tok = spark.createDataFrame(rows, ["doc_id", "shingle"])
    cand = {
        (r.d1, r.d2)
        for r in ppjoin_candidate_pairs(tok, max_token_bucket=None).collect()
    }
    truth = _true_pairs(corpora)
    missing = truth - cand
    assert not missing, (corpora, sorted(missing), sorted(cand))
