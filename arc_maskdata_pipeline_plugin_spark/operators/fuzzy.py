"""Fuzzy string matching / entity resolution: q-gram candidate join +
edit-distance rescoring.

The all-pairs edit-distance join is quadratic; the standard scale shape is
the same as MinHash-LSH dedup: build an inverted index of character q-grams,
generate candidates from gram collisions (equi-join — shuffles on the gram
key, never cross-joins), count common grams per pair, and only THEN pay
Levenshtein on the filtered candidates.

Pruning semantics (be precise — ADVICE r02): the classical q-gram lower
bound (strings within edit distance k share ≥ max(|a|,|b|) − q + 1 − k·q
grams) is a MULTISET statement. This implementation counts DISTINCT shared
grams (``array_distinct`` before the join — one posting per (id, gram)
keeps the inverted index and the join output linear in text size), which
is ≤ the multiset count for strings with repeated grams. ``min_common`` is
therefore a deliberately STRICTER heuristic filter, not an implementation
of the bound: a pair guaranteed as a candidate by the multiset bound can
be pruned when its overlap rides on repeated grams (e.g. ``aaaa`` vs
``aaab``). That trade is standard for entity resolution on names/titles
(few repeated grams, and the index stays small); callers needing the exact
bound should set ``min_common=1`` and filter on ``edit_distance``.
Strings are padded with a single space on each side (not the conventional
q−1) — shared verbatim with the DuckDB oracle, so both engines tokenize
identically.

Skew note: stop-grams (e.g. ``'ing'``) behave exactly like viral LSH
buckets; ``max_gram_freq`` drops grams whose posting lists exceed the cap —
audited via ``dropped_grams``, never silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _qgram_expr(colname: str, q: int) -> str:
    """SQL expression for the q-gram array (shared verbatim with the DuckDB
    oracle so both engines tokenize identically)."""
    return (
        f"transform(sequence(1, greatest(length(' ' || lower({colname}) || ' ') - {q - 1}, 1)), "
        f"i -> substring(' ' || lower({colname}) || ' ', i, {q}))"
    )


def qgram_match(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_col: str,
    right_col: str,
    q: int = 3,
    min_common: int = 2,
    max_edit_distance: int | None = None,
    max_gram_freq: int | None = None,
) -> DataFrame:
    """Candidate pairs (left_id, right_id, n_common, edit_distance).

    ``max_gram_freq`` drops stop-grams with oversized posting lists before
    the candidate join (the quadratic hazard)."""
    lg = left.select(
        F.col(left_id).alias("_lid"),
        F.col(left_col).alias("_lval"),
        F.explode(F.array_distinct(F.expr(_qgram_expr(left_col, q)))).alias("gram"),
    )
    rg = right.select(
        F.col(right_id).alias("_rid"),
        F.col(right_col).alias("_rval"),
        F.explode(F.array_distinct(F.expr(_qgram_expr(right_col, q)))).alias("gram"),
    )
    if max_gram_freq is not None:
        freq = (
            lg.groupBy("gram").agg(F.count(F.lit(1)).alias("_n_l"))
            .join(rg.groupBy("gram").agg(F.count(F.lit(1)).alias("_n_r")), "gram")
            .filter((F.col("_n_l") <= max_gram_freq) & (F.col("_n_r") <= max_gram_freq))
            .select("gram")
        )
        lg = lg.join(F.broadcast(freq), "gram")
        rg = rg.join(F.broadcast(freq), "gram")

    pairs = (
        lg.join(rg, "gram")
        .groupBy("_lid", "_rid", "_lval", "_rval")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    scored = pairs.select(
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(right_id),
        "n_common",
        F.levenshtein("_lval", "_rval").alias("edit_distance"),
    )
    if max_edit_distance is not None:
        scored = scored.filter(F.col("edit_distance") <= max_edit_distance)
    return scored


def dropped_grams(
    left: DataFrame, right: DataFrame, left_col: str, right_col: str,
    q: int = 3, max_gram_freq: int = 1000,
) -> DataFrame:
    """Audit: the stop-grams the cap would exclude, with their frequencies."""
    lg = left.select(F.explode(F.array_distinct(F.expr(_qgram_expr(left_col, q)))).alias("gram"))
    rg = right.select(F.explode(F.array_distinct(F.expr(_qgram_expr(right_col, q)))).alias("gram"))
    return (
        lg.groupBy("gram").agg(F.count(F.lit(1)).alias("n_left"))
        .join(rg.groupBy("gram").agg(F.count(F.lit(1)).alias("n_right")), "gram")
        .filter((F.col("n_left") > max_gram_freq) | (F.col("n_right") > max_gram_freq))
    )
