"""Semantics of class-balance downsampling, the FD-violation audit, and
item co-occurrence on constructed inputs."""

from __future__ import annotations

import datetime

_BASE = datetime.datetime(2024, 1, 1, 12, 0, tzinfo=datetime.timezone.utc)


def test_class_downsample_keeps_all_positives_bounds_negatives(spark, tmp_path):
    """50 positives, 1000 negatives, ratio 2 → all positives kept;
    negatives land near 100 (hash-threshold is Bernoulli-like, not
    exact-k — assert the band)."""
    rows = []
    for i in range(50):
        rows.append((i, _BASE, i, "purchase", 1.0, "{}"))
    for i in range(1000):
        rows.append((1000 + i, _BASE, i, "view", 1.0, "{}"))
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.mlprep import q_class_downsample

    out = {r.label: r for r in q_class_downsample(spark, str(tmp_path)).collect()}
    assert out[1].n_before == 50 and out[1].n_after == 50
    assert out[0].n_before == 1000
    assert 60 <= out[0].n_after <= 140  # ±4σ of Binomial(1000, 0.1)


def test_class_downsample_no_op_when_already_balanced(spark, tmp_path):
    """More positives than RATIO·negatives would allow → rate clamps to 1,
    every negative survives (least(n_neg, R·n_pos) = n_neg)."""
    rows = [(i, _BASE, i, "purchase", 1.0, "{}") for i in range(40)]
    rows += [(100 + i, _BASE, i, "view", 1.0, "{}") for i in range(20)]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.mlprep import q_class_downsample

    out = {r.label: r for r in q_class_downsample(spark, str(tmp_path)).collect()}
    assert out[0].n_before == 20 and out[0].n_after == 20


def test_fd_audit_exact_vs_violated(spark, tmp_path):
    """customer key→segment holds exactly (g3 = 0, support = 1); an
    injected duplicate key with two segments yields g3 = 1 and one
    violating key."""
    cust = [
        (1, "a", 0, 1.0, "AUTO"),
        (2, "b", 0, 1.0, "AUTO"),
        (3, "c", 0, 1.0, "HOUSE"),
    ]
    spark.createDataFrame(
        cust, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    # orders: customer 1 has two priorities (violates), customer 2 is clean
    orders = [
        (1, 1, "O", 1.0, _BASE, "HIGH"),
        (2, 1, "O", 1.0, _BASE, "LOW"),
        (3, 1, "O", 1.0, _BASE, "HIGH"),
        (4, 2, "O", 1.0, _BASE, "LOW"),
    ]
    spark.createDataFrame(
        orders,
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"],
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    li = [(1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", _BASE)]
    spark.createDataFrame(
        li,
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
         "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"],
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(0, _BASE, 1, "view", 1.0, "{}")],
        ["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.quality import (
        q_fd_violation_audit,
    )

    out = {r.fd: r for r in q_fd_violation_audit(spark, str(tmp_path)).collect()}
    cu = out["customer:c_custkey->c_mktsegment"]
    assert cu.n_violating_keys == 0 and cu.g3_rows == 0
    assert cu.support_fp6 == 1_000_000
    od = out["orders:o_custkey->o_orderpriority"]
    # customer 1: 3 rows, max single priority = 2 → delete 1 row
    assert od.n_keys == 2 and od.n_violating_keys == 1 and od.g3_rows == 1
    assert od.support_fp6 == 750_000  # 3 of 4 rows consistent


def test_item_cooccurrence_cosine_hand_values(spark, tmp_path):
    """Parts 1,2 co-occur in both baskets (cos = 2/√(2·2) = 1); parts 1,3
    co-occur once with c3 = 1 (cos = 1/√2)."""
    li = []
    for ok, parts in [(1, [1, 2, 3]), (2, [1, 2])]:
        for p in parts:
            li.append((ok, p, 0, 0, 1.0, 1.0, 0.0, 0.0, "N", "O", _BASE))
    spark.createDataFrame(
        li,
        ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
         "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"],
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    import arc_maskdata_pipeline_plugin_spark.plans.behavior as bh

    old = bh._CO_MIN_PAIR
    bh._CO_MIN_PAIR = 1  # module constant feeds only the Spark side here
    try:
        out = {(r.p1, r.p2): r for r in bh.q_item_cooccurrence(spark, str(tmp_path)).collect()}
    finally:
        bh._CO_MIN_PAIR = old
    assert out[(1, 2)].c_xy == 2 and out[(1, 2)].cosine_fp6 == 1_000_000
    assert out[(1, 3)].c_xy == 1
    import math

    assert out[(1, 3)].cosine_fp6 == math.floor(1e6 * 1 / math.sqrt(2.0))
    assert out[(1, 2)].rank == 1
