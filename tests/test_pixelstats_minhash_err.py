"""Semantics: real-decoder pixel stats and the MinHash error witness."""

from __future__ import annotations

import numpy as np


def test_pixel_stats_match_numpy_on_generative_formula(spark):
    """The Spark path decodes REAL PNGs; recompute each stat from the
    generative pixel formula in numpy and compare row-for-row."""
    from arc_maskdata_pipeline_plugin_spark.plans.multimodal_queries import (
        q_multimodal_pixel_stats,
    )

    rows = q_multimodal_pixel_stats(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows[:25]:
        i = r.doc_id
        w, h = i % 16 + 1, i % 12 + 1
        yy, xx = np.mgrid[0:h, 0:w]
        px = (xx * 17 + yy * 31 + i) % 256
        vals, counts = np.unique(px, return_counts=True)
        top = int(counts.max())
        assert (r.width, r.height) == (w, h)
        assert r.px_min == int(px.min()) and r.px_max == int(px.max())
        assert r.px_sum == int(px.sum())
        assert r.n_distinct_vals == len(vals)
        assert r.mode_val == int(vals[counts == top].min())
        assert r.mode_count == top


def test_minhash_error_zero_for_identical_docs(spark, tmp_path):
    """Two identical docs: all 8 min-hashes agree (est = 1.0) and the exact
    Jaccard is 1.0 → abs error 0."""
    from arc_maskdata_pipeline_plugin_spark.plans.dedup2 import (
        q_minhash_estimate_error,
    )

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 2
    rows = [
        (1, text, "en", "s", len(text)),
        (2, text, "en", "s", len(text)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = q_minhash_estimate_error(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_agree == 8
    assert r.est_jaccard_fp6 == 1_000_000 == r.exact_jaccard_fp6
    assert r.abs_err_fp6 == 0 == r.mean_abs_err_fp6


def test_minhash_error_estimates_bounded(spark):
    """Real corpus: estimates are multiples of 1/8 in fp6, exact values are
    in [0, 1e6], and the mean column equals the mean of the per-pair
    errors (floored)."""
    from arc_maskdata_pipeline_plugin_spark.plans.dedup2 import (
        q_minhash_estimate_error,
    )

    rows = q_minhash_estimate_error(spark, "/root/testdata/sf0.001").collect()
    assert rows
    errs = [r.abs_err_fp6 for r in rows]
    expected_mean = int(sum(errs) / len(errs))
    for r in rows:
        assert r.n_agree >= 1  # an LSH candidate shares at least one band
        assert 0 <= r.exact_jaccard_fp6 <= 1_000_000
        assert r.est_jaccard_fp6 == r.n_agree * 1_000_000 // 8
        assert r.mean_abs_err_fp6 == expected_mean
