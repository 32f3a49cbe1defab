"""Round-12 cross-config determinism pins: the new drift statistics ride
the two-phase bucketed-window machinery (CvM through global_cumsums, W1
through its inlined lag pass), whose ONLY config-sensitive knob is the
bucket count derived from ``spark.sql.shuffle.partitions``. Results must
be bit-identical at the session default, at a tiny prime bucket count
(boundary-heavy), and at 1 (the no-bounds degenerate branch). The full
cross-engine edge-config run is part of the round-close checklist; this
file is the fast in-suite regression."""

from __future__ import annotations

import contextlib

from arc_maskdata_pipeline_plugin_spark.cache import release_persisted
from arc_maskdata_pipeline_plugin_spark.plans.stats6 import (
    q_cramer_von_mises,
    q_jackknife_ratio_se,
    q_wasserstein_drift,
)

SF = "/root/testdata/sf0.01"


@contextlib.contextmanager
def _parts(spark, n):
    k = "spark.sql.shuffle.partitions"
    old = spark.conf.get(k)
    spark.conf.set(k, str(n))
    try:
        yield
    finally:
        spark.conf.set(k, old)
        spark.catalog.clearCache()
        release_persisted()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cvm_partition_count_invariant(spark):
    base = _rows(q_cramer_von_mises(spark, SF))
    assert base  # non-degenerate witness
    for n in (5, 1):
        with _parts(spark, n):
            assert _rows(q_cramer_von_mises(spark, SF)) == base, n


def test_wasserstein_partition_count_invariant(spark):
    base = _rows(q_wasserstein_drift(spark, SF))
    assert base and base[0][2] >= 0
    for n in (5, 1):
        with _parts(spark, n):
            assert _rows(q_wasserstein_drift(spark, SF)) == base, n


def test_jackknife_partition_count_invariant(spark):
    base = _rows(q_jackknife_ratio_se(spark, SF))
    assert len(base) == 5
    with _parts(spark, 5):
        assert _rows(q_jackknife_ratio_se(spark, SF)) == base
