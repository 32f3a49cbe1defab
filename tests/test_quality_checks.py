"""Data-quality family: invariants the oracle comparison can't express."""

from __future__ import annotations


def test_outlier_screen_is_nonempty_and_extreme(spark, sf_medium):
    from arc_maskdata_pipeline_plugin_spark.plans.quality import q_outlier_customers
    from arc_maskdata_pipeline_plugin_spark.plans.registry import T

    out = q_outlier_customers(spark, sf_medium).collect()
    assert len(out) > 0
    # every flagged customer is a genuine extreme: further from the global
    # mean spend than at least 2x the global average deviation
    from pyspark.sql import functions as F

    orders = T(spark, sf_medium, "orders")
    spend = [
        float(r["s"])
        for r in orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
        .collect()
    ]
    mean = sum(spend) / len(spend)
    avg_dev = sum(abs(x - mean) for x in spend) / len(spend)
    for r in out:
        assert abs(float(r["total_spend"]) - mean) > 2 * avg_dev


def test_skew_profile_orders_by_traffic(spark, sf_small):
    from arc_maskdata_pipeline_plugin_spark.plans.quality import q_key_skew_profile

    rows = q_key_skew_profile(spark, sf_small).collect()
    assert len(rows) == 20
    counts = [r["n_orders"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(0 < r["share_ppm"] < 1_000_000 for r in rows)


def test_quality_audit_passes_on_clean_data_and_catches_seeded_issues(spark, sf_small):
    from arc_maskdata_pipeline_plugin_spark.plans.quality import q_data_quality_audit

    rows = {r["check_name"]: r for r in q_data_quality_audit(spark, sf_small).collect()}
    assert set(rows) == {
        "row_count",
        "pk_unique_ppm",
        "priority_complete_ppm",
        "price_positive_ppm",
        "date_in_range_ppm",
        "fk_customer_orphans",
    }
    # the driver's synthetic tables are clean: every rule passes
    assert all(r["passed"] for r in rows.values())
    assert rows["pk_unique_ppm"]["metric"] == 1_000_000
    assert rows["fk_customer_orphans"]["metric"] == 0


def test_quality_audit_flags_dirty_frame(spark, tmp_path):
    """Seed violations into a copy of orders and confirm each rule trips."""
    import datetime

    from pyspark.sql import Row

    from arc_maskdata_pipeline_plugin_spark.plans.quality import q_data_quality_audit

    ts = datetime.datetime(2030, 1, 1)  # outside [1995, 2002)
    dirty = spark.createDataFrame(
        [
            Row(o_orderkey=1, o_custkey=10**9, o_orderstatus="O",
                o_totalprice=-5.0, o_orderdate=ts, o_orderpriority=None),
            Row(o_orderkey=1, o_custkey=10**9, o_orderstatus="O",
                o_totalprice=10.0, o_orderdate=ts, o_orderpriority="1-URGENT"),
        ]
    )
    cust = spark.createDataFrame([Row(c_custkey=1)])
    import arc_maskdata_pipeline_plugin_spark.plans.quality as q
    import arc_maskdata_pipeline_plugin_spark.plans.registry as reg

    orig = reg.__dict__["T"]

    def fake_T(spark_, sf_dir_, name):
        return {"orders": dirty, "customer": cust}[name]

    # route the query at the dirty frames without touching testdata
    q.T, saved = fake_T, q.T
    try:
        rows = {r["check_name"]: r for r in q_data_quality_audit(spark, "unused").collect()}
    finally:
        q.T = saved
        assert reg.__dict__["T"] is orig
    assert not rows["pk_unique_ppm"]["passed"]          # duplicate key
    assert not rows["priority_complete_ppm"]["passed"]  # NULL priority
    assert not rows["price_positive_ppm"]["passed"]     # negative price
    assert not rows["date_in_range_ppm"]["passed"]      # 2030 date
    assert not rows["fk_customer_orphans"]["passed"]    # unknown custkey
    assert rows["row_count"]["passed"]
