"""Semantics: partition-fingerprint change detection."""

from __future__ import annotations

import datetime


def test_changed_iff_partition_contains_simulated_upsert(spark, tmp_path):
    """Construct orders where exactly one month contains a key divisible by
    7 (update) or 10 (insert): only that month flags changed."""
    from arc_maskdata_pipeline_plugin_spark.plans.lakeops2 import (
        q_partition_fingerprint_diff,
    )

    def ts(m, d):
        return datetime.datetime(1997, m, d, tzinfo=datetime.timezone.utc)

    # month 1: untouched keys only (no %7==0, no %10==0)
    # month 2: key 14 (%7==0 → priority rewritten in the new snapshot)
    # month 3: key 20 (%10==0 → insert-only row, absent from old snapshot)
    rows = [
        (1, 1, "O", 100.0, ts(1, 5), "1-URGENT", "c", 0, "x"),
        (2, 2, "F", 100.0, ts(1, 6), "2-HIGH", "c", 0, "x"),
        (3, 3, "O", 100.0, ts(1, 7), "3-MEDIUM", "c", 0, "x"),
        (14, 4, "O", 100.0, ts(2, 5), "1-URGENT", "c", 0, "x"),
        (11, 5, "F", 100.0, ts(2, 6), "2-HIGH", "c", 0, "x"),
        (20, 6, "O", 100.0, ts(3, 5), "1-URGENT", "c", 0, "x"),
        (23, 7, "F", 100.0, ts(3, 6), "2-HIGH", "c", 0, "x"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string, "
        "o_clerk string, o_shippriority int, o_comment string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r.part_month: r for r in q_partition_fingerprint_diff(spark, str(tmp_path)).collect()}
    assert out[199701].changed == 0
    assert out[199701].checksum_old == out[199701].checksum_new
    assert out[199702].changed == 1  # priority rewrite moves the checksum
    assert out[199702].n_old == out[199702].n_new == 2
    assert out[199703].changed == 1  # insert: row counts differ
    assert (out[199703].n_old, out[199703].n_new) == (1, 2)
