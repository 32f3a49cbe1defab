"""Semantics: batch-leakage audit, water-filling allocator, zone-map audit."""

from __future__ import annotations

import datetime


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_batch_leakage_monotone_in_batch_size(spark):
    """On the real corpus: a bigger batch can only capture MORE pairs
    (batches are nested unions of smaller ones under div-bucketing), and
    every leaked count is bounded by the pair total."""
    from arc_maskdata_pipeline_plugin_spark.plans.training2 import (
        q_batch_leakage_audit,
    )

    r = q_batch_leakage_audit(spark, "/root/testdata/sf0.001").collect()[0]
    assert 0 <= r.n_leaked_b8 <= r.n_leaked_b32 <= r.n_leaked_b128 <= r.n_dup_pairs


def test_waterfill_budget_exhausted_and_caps_respected(spark, tmp_path):
    """3 sources with caps 10/20/1000 tokens, budget = 60% of 1030 = 618:
    small sources saturate (10, 20), the big one takes the rest (588)."""
    from arc_maskdata_pipeline_plugin_spark.plans.training2 import (
        q_token_budget_waterfill,
    )

    rows = [
        (1, " ".join(["w"] * 10), "en", "tiny", 10),
        (2, " ".join(["w"] * 20), "en", "small", 20),
        (3, " ".join(["w"] * 1000), "en", "big", 1000),
    ]
    _write_docs(spark, tmp_path, rows)
    out = {r.source: r for r in q_token_budget_waterfill(spark, str(tmp_path)).collect()}
    assert out["tiny"].alloc_tokens == 10 and out["tiny"].capped == 1
    assert out["small"].alloc_tokens == 20 and out["small"].capped == 1
    assert out["big"].alloc_tokens == 588 and out["big"].capped == 0
    for r in out.values():
        assert r.alloc_tokens <= r.cap_tokens
        assert r.total_allocated == r.budget_tokens == 618


def test_waterfill_equal_split_with_remainder(spark, tmp_path):
    """3 equal big caps, budget 618 = 3*206: exact equal split; remainder
    distribution kicks in when budget % slots != 0 — checked via sum."""
    from arc_maskdata_pipeline_plugin_spark.plans.training2 import (
        q_token_budget_waterfill,
    )

    rows = [(i, " ".join(["w"] * 343), "en", f"s{i}", 343) for i in range(3)]
    _write_docs(spark, tmp_path, rows)
    out = q_token_budget_waterfill(spark, str(tmp_path)).collect()
    total = 3 * 343
    budget = total * 3 // 5
    allocs = sorted(r.alloc_tokens for r in out)
    assert sum(allocs) == budget
    assert max(allocs) - min(allocs) <= 1  # water level ±1 token
    assert all(r.capped == 0 for r in out)


def test_zonemap_sorted_layout_skips_arrival_does_not(spark):
    """Real orders: the month-clustered layout must skip >= 80% of files on
    the 1-month predicate; the hash-arrival layout skips none (every file's
    range straddles the whole span). Scanned rows must always cover the
    matching rows."""
    from arc_maskdata_pipeline_plugin_spark.plans.lakeops2 import (
        q_zonemap_skip_audit,
    )

    rows = q_zonemap_skip_audit(spark, "/root/testdata/sf0.001").collect()
    by = {(r.layout, r.predicate): r for r in rows}
    s = by[("sorted", "narrow_1mo")]
    a = by[("arrival", "narrow_1mo")]
    assert s.skip_pct_fp6 >= 800_000
    assert a.n_files_skipped == 0
    for r in rows:
        assert r.n_rows_scanned >= r.n_rows_matching
        # both layouts must agree on how many rows actually match
    for pid in ("narrow_1mo", "medium_3mo", "wide_1yr"):
        assert (
            by[("sorted", pid)].n_rows_matching
            == by[("arrival", pid)].n_rows_matching
        )


def test_negative_sampling_weights_and_draw_conservation(spark, tmp_path):
    """Constructed corpus with known counts: weight = floor(n^0.75 * 1e6),
    draws sum to exactly 4096, and a word with 16x the count of another
    gets 8x its weight (16^0.75 = 8)."""
    from arc_maskdata_pipeline_plugin_spark.plans.training2 import (
        q_negative_sampling_table,
    )

    text = " ".join(["common"] * 16 + ["rare"] * 1)
    _write_docs(spark, tmp_path, [(1, text, "en", "s", len(text))])
    out = {r.word: r for r in q_negative_sampling_table(spark, str(tmp_path)).collect()}
    assert out["common"].weight_fp6 == 8 * out["rare"].weight_fp6 == 8_000_000
    assert sum(r.n_drawn for r in out.values()) == 4096
    # the heavy word dominates the draws roughly by its weight share (8/9)
    assert out["common"].n_drawn > 3000
    assert abs(out["common"].n_drawn - out["common"].expected_draws) < 410  # ~10%
