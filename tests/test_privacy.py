"""k-anonymity / l-diversity operators: hand-computed small-frame checks."""

from __future__ import annotations

import pytest

from arc_maskdata_pipeline_plugin_spark.operators.privacy import (
    band,
    k_anonymity_audit,
    l_diversity_audit,
    suppress_small_classes,
)


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        # (id, zip_band, job, disease) — class A: 3 members, homogeneous
        (1, 10, "eng", "flu"),
        (2, 10, "eng", "flu"),
        (3, 10, "eng", "flu"),
        # class B: 2 members, diverse
        (4, 10, "doc", "flu"),
        (5, 10, "doc", "cold"),
        # class C: singleton
        (6, 20, "eng", "asthma"),
    ]
    return spark.createDataFrame(rows, ["id", "zip_band", "job", "disease"])


def test_k_anonymity_audit_sizes_and_flags(people):
    got = {
        (r["zip_band"], r["job"]): (r["n"], r["is_k_anonymous"])
        for r in k_anonymity_audit(people, ["zip_band", "job"], k=2).collect()
    }
    assert got == {
        (10, "eng"): (3, True),
        (10, "doc"): (2, True),
        (20, "eng"): (1, False),
    }


def test_l_diversity_flags_homogeneous_class(people):
    got = {
        (r["zip_band"], r["job"]): (r["n_sensitive"], r["is_l_diverse"])
        for r in l_diversity_audit(
            people, ["zip_band", "job"], "disease", l=2
        ).collect()
    }
    # class A is 3-anonymous but NOT 2-diverse (all flu); class B is both
    assert got[(10, "eng")] == (1, False)
    assert got[(10, "doc")] == (2, True)
    assert got[(20, "eng")] == (1, False)


def test_suppression_masks_only_small_classes(people):
    out = suppress_small_classes(people, ["zip_band", "job"], k=2)
    rows = {r["id"]: r for r in out.collect()}
    # released records keep stringified QI values
    assert rows[1]["zip_band"] == "10" and rows[1]["job"] == "eng"
    assert rows[1]["is_released"] is True
    # the singleton is fully QI-suppressed but keeps non-QI columns
    assert rows[6]["zip_band"] == "*" and rows[6]["job"] == "*"
    assert rows[6]["is_released"] is False
    assert rows[6]["disease"] == "asthma"
    # suppression never drops records
    assert out.count() == people.count()


def test_band_floor_semantics(spark):
    df = spark.createDataFrame(
        [(3456.78,), (-12.5,), (0.0,), (999.99,)], ["x"]
    ).select(band("x", 1000).alias("b"))
    assert [r["b"] for r in df.collect()] == [3, -1, 0, 0]


def test_privacy_queries_run_on_testdata(spark, sf_small):
    sf_dir = sf_small
    from arc_maskdata_pipeline_plugin_spark.plans.privacy import (
        q_k_anonymity_audit,
        q_k_anonymity_suppress,
        q_l_diversity_audit,
    )

    audit = q_k_anonymity_audit(spark, sf_dir)
    assert audit.count() > 0
    # suppression partitions records exactly by the audit's class sizes
    sup = q_k_anonymity_suppress(spark, sf_dir).collect()
    n_suppressed = sum(1 for r in sup if not r["is_released"])
    assert all((r["c_nationkey"] == "*") == (not r["is_released"]) for r in sup)
    assert 0 < n_suppressed < len(sup)
    div = q_l_diversity_audit(spark, sf_dir)
    assert div.filter("is_l_diverse").count() > 0


def test_pseudonymization_preserves_referential_analytics(spark, sf_small):
    """Revenue per segment through the pseudonym join must equal the
    plaintext-key join, and pseudonyms must be collision-free (bijection)."""
    from pyspark.sql import functions as F

    from arc_maskdata_pipeline_plugin_spark.plans.privacy import (
        q_pseudonymize_referential,
    )
    from arc_maskdata_pipeline_plugin_spark.plans.registry import T, dec

    got = {
        r["c_mktsegment"]: (r["n_pseudonyms"], r["n_orders"], r["revenue"])
        for r in q_pseudonymize_referential(spark, sf_small).collect()
    }
    cust = T(spark, sf_small, "customer")
    orders = T(spark, sf_small, "orders")
    plain = {
        r["c_mktsegment"]: (r["n_cust"], r["n_orders"], r["revenue"])
        for r in cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_cust"),
            F.count("o_totalprice").cast("bigint").alias("n_orders"),
            F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("revenue"),
        )
        .collect()
    }
    assert got == plain


def test_dp_noise_is_laplace_shaped(spark, sf_small):
    """Seeded noise: reproducible, zero-centered-ish, bounded tails for b=1."""
    from arc_maskdata_pipeline_plugin_spark.plans.privacy import q_dp_noisy_counts

    rows = q_dp_noisy_counts(spark, sf_small).collect()
    noises = [r["noisy_n_fp6"] / 1e6 - r["true_n"] for r in rows]
    assert rows == q_dp_noisy_counts(spark, sf_small).collect()  # deterministic
    assert any(n > 0 for n in noises) and any(n < 0 for n in noises)
    # Laplace(b=1): |noise| rarely exceeds ~ln(2*25) ≈ 3.9 for 25 draws
    assert all(abs(n) < 12 for n in noises)


def test_ldp_frequency_mechanism_invariants(spark, tmp_path):
    """k-ary randomized response on a constructed 3-type corpus: the
    estimator-shares sum to exactly 1 (floor loss < k ppm), the keep rate
    matches 3/(k+2), and each estimate tracks its true share within the
    mechanism's sampling envelope for n = 3000."""
    import datetime

    from arc_maskdata_pipeline_plugin_spark.plans.privacy import q_ldp_frequency

    t0 = datetime.datetime(2024, 3, 1, tzinfo=datetime.timezone.utc)
    shares = {"view": 0.5, "click": 0.3, "buy": 0.2}
    rows = []
    for i in range(3000):
        et = "view" if i % 10 < 5 else ("click" if i % 10 < 8 else "buy")
        rows.append((i, t0, i % 97, et, 0.0, "{}"))
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r.event_type: r for r in q_ldp_frequency(spark, str(tmp_path)).collect()}
    assert set(out) == set(shares)
    n = sum(r.n_true for r in out.values())
    assert n == 3000
    # estimates partition unity: sum over types of (obs*(k+2)-n)/(2n) == 1
    s = sum(r.est_share_fp6 for r in out.values())
    assert 1_000_000 - len(out) <= s <= 1_000_000
    # per-type estimate within the RR sampling envelope (~3 sigma ≈ 0.08)
    for et, r in out.items():
        assert abs(r.est_share_fp6 / 1e6 - shares[et]) < 0.08, (et, r)
        assert r.true_share_fp6 == int(shares[et] * 1_000_000)


def test_ldp_frequency_k2_is_warner_flip(spark, tmp_path):
    """k = 2 degenerates to Warner's original coin: reports keep the truth
    with p = 3/4 and flip to THE other value otherwise — no report may be a
    third value, and the keep rate lands near 0.75."""
    import datetime

    from arc_maskdata_pipeline_plugin_spark.plans.privacy import q_ldp_frequency

    t0 = datetime.datetime(2024, 3, 1, tzinfo=datetime.timezone.utc)
    rows = [
        (i, t0, i % 7, "a" if i % 4 < 3 else "b", 0.0, "{}") for i in range(2000)
    ]
    spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    out = {r.event_type: r for r in q_ldp_frequency(spark, str(tmp_path)).collect()}
    assert set(out) == {"a", "b"}
    # total reports conserved and only the two true values ever reported
    assert sum(r.n_reported for r in out.values()) == 2000
    # keep-rate audit: reported 'a' count = kept a's + flipped b's;
    # solve the 2x2 system -> est shares near 0.75/0.25
    assert abs(out["a"].est_share_fp6 / 1e6 - 0.75) < 0.06
    assert abs(out["b"].est_share_fp6 / 1e6 - 0.25) < 0.06
