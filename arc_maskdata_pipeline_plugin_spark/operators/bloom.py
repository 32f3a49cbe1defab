"""Bloom-filter membership screen for incremental deduplication.

The 100 TB problem: before paying a full shuffle-join of a new batch against
a multi-billion-row corpus hash store, screen the batch against a compact
Bloom filter of corpus content hashes — false positives go on to the exact
join, true negatives (the overwhelming majority of fresh data) skip it.

The bit positions are md5-derived (``k`` independent positions per key via
``md5(i || ':' || key)``), so the filter is engine-portable and the whole
screen is oracle-checkable in DuckDB. The set-of-positions representation
used here IS the Bloom semantics (identical false-positive behavior); a
production deployment folds the same positions into an ``m``-bit bitmap
(array<long> via bit_or aggregation, broadcast to executors) — the positions
contract, and therefore the results, are unchanged.

Bloom guarantees pinned by tests: zero false negatives (every corpus member
reports might_contain = true); false positives occur at roughly
``load_factor^k`` and are flagged against ground truth in the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Deliberately small default filter (m bits) so the driver-gate dataset
# exhibits a measurable false-positive rate — the screen's accounting
# (might_contain vs actual_dup) is the thing under test. Production sizing:
# m ≈ -n·ln(p)/(ln2)², k ≈ (m/n)·ln2.
DEFAULT_M = 2048
DEFAULT_K = 4

def content_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, h) — whitespace-normalized content hash (same normalization
    as dedup_exact, operators/dedup.py)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return docs.select("doc_id", F.md5(norm).alias("h"))


def bloom_positions(df: DataFrame, m: int = DEFAULT_M, k: int = DEFAULT_K) -> DataFrame:
    """Explode each key into its ``k`` bit positions in [0, m)."""
    pos_exprs = [
        f"cast(conv(substring(md5('{i}:' || h), 1, 15), 16, 10) as bigint) % {m}"
        for i in range(k)
    ]
    return df.select(
        "doc_id", "h", F.explode(F.array(*[F.expr(e) for e in pos_exprs])).alias("pos")
    )


def bloom_screen(
    corpus: DataFrame,
    probes: DataFrame,
    m: int = DEFAULT_M,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Screen ``probes`` against a Bloom filter built from ``corpus``.

    Returns (doc_id, might_contain, actual_dup): ``might_contain`` is the
    filter's verdict (all k positions set); ``actual_dup`` is ground truth
    (exact hash membership), so false positives are directly observable and
    false negatives are provably absent.
    """
    corpus_h = content_hashes(corpus)
    probe_h = content_hashes(probes)
    # The "filter": distinct set bit positions. |set| ≤ min(k·n, m) ≤ m rows —
    # broadcast-sized by construction (m is the filter's memory budget).
    filter_bits = (
        bloom_positions(corpus_h, m, k).select("pos").distinct()
    )
    probe_pos = bloom_positions(probe_h, m, k)
    hits = (
        probe_pos.join(F.broadcast(filter_bits), "pos", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_set"))
    )
    truth = probe_h.join(
        corpus_h.select("h").distinct(), "h", "left_semi"
    ).select("doc_id", F.lit(True).alias("actual_dup"))
    return (
        probe_h.select("doc_id")
        .join(hits, "doc_id", "left")
        .join(truth, "doc_id", "left")
        .select(
            "doc_id",
            (F.coalesce(F.col("n_set"), F.lit(0)) == k).alias("might_contain"),
            F.coalesce(F.col("actual_dup"), F.lit(False)).alias("actual_dup"),
        )
    )
