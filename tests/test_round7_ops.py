"""Round-7 operator semantics: quantile-threshold modes and friends."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_quantile_thresholds_exact_matches_manual(spark):
    """Exact mode reproduces PERCENTILE_DISC by hand on a constructed frame:
    10 rows 1..10, p=0.3 -> ceil(3) -> value 3; p=1.0 -> 10."""
    from arc_maskdata_pipeline_plugin_spark.operators.quantiles import (
        quantile_thresholds,
    )

    df = spark.range(1, 11).select(F.col("id").cast("bigint").alias("v"))
    row = quantile_thresholds(df, "v", {"p30": 0.3, "p100": 1.0}).collect()[0]
    assert row.p30 == 3 and row.p100 == 10


def test_quantile_thresholds_exact_grouped_with_ties(spark):
    """Duplicate mass counts toward the cumulative rank: group a = [1,1,1,9]
    has p50 -> ceil(2) -> 1; group b = [2,4,6,8] p50 -> 4."""
    from arc_maskdata_pipeline_plugin_spark.operators.quantiles import (
        quantile_thresholds,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 1), ("a", 9), ("b", 2), ("b", 4), ("b", 6), ("b", 8)],
        ["g", "v"],
    )
    rows = {
        r.g: r.p50
        for r in quantile_thresholds(
            df, "v", {"p50": 0.5}, group_cols=("g",)
        ).collect()
    }
    assert rows == {"a": 1, "b": 4}


def test_winsorize_approx_thresholds_near_exact(spark):
    """The GK-sketch mode's thresholds must land inside the exact
    thresholds' neighborhood (rank error <= n/accuracy; at sf0.001 n≈1.5k
    and accuracy=10k, the sketch is rank-exact, so the clipped counts may
    differ only at the boundary value)."""
    from arc_maskdata_pipeline_plugin_spark.plans.stats import (
        q_winsorize_prices,
        q_winsorize_prices_approx,
    )

    exact = q_winsorize_prices(spark, SF).collect()[0]
    approx = q_winsorize_prices(spark, SF, mode="approx").collect()[0]
    assert exact.n == approx.n
    # thresholds within 1% of the exact rank's VALUE neighborhood
    assert abs(approx.lo_cents - exact.lo_cents) <= max(2, exact.lo_cents * 0.02)
    assert abs(approx.hi_cents - exact.hi_cents) <= max(2, exact.hi_cents * 0.02)
    # clip fractions stay in the same ballpark (±1% of n absolute)
    assert abs(approx.n_clipped_low - exact.n_clipped_low) <= exact.n * 0.01 + 2
    assert abs(approx.n_clipped_high - exact.n_clipped_high) <= exact.n * 0.01 + 2
    # the hash-oracled audit variant (VERDICT r07 #4): rank-error verdicts
    # must hold, and the exact thresholds it emits must equal the exact mode's
    audit = q_winsorize_prices_approx(spark, SF).collect()[0]
    assert audit.n == exact.n
    assert audit.lo_exact_cents == exact.lo_cents
    assert audit.hi_exact_cents == exact.hi_cents
    assert audit.lo_rank_within_budget == 1
    assert audit.hi_rank_within_budget == 1
    assert audit.rank_err_budget == 3 * ((exact.n + 9999) // 10000) + 1


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_boilerplate_segments_flags_shared_segment(spark, tmp_path):
    """Two docs sharing their first 10-token segment -> that segment is
    boilerplate; the unique tails are not."""
    seg = " ".join(f"w{i}" for i in range(10))
    rows = [
        (0, seg + " unique0 tail0", "en", "a"),
        (1, seg + " unique1 tail1", "en", "b"),
        (2, "completely different words here now ok fine yes no maybe", "en", "a"),
    ]
    d = _docs(spark, rows)
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.curation import (
        q_boilerplate_segments,
    )

    out = {r.source: r for r in q_boilerplate_segments(spark, str(tmp_path)).collect()}
    assert out["a"].n_boiler_instances == 1 and out["b"].n_boiler_instances == 1
    assert out["a"].tokens_removed == 10
    # doc 2's segments are unique -> only doc 0 contributes boilerplate to 'a'
    assert out["a"].n_boiler_segs == 1


def test_perplexity_filter_flags_rare_word_soup(spark, tmp_path):
    """Docs made of hapax words score higher NLL than docs of common words;
    the worst quartile lands in n_flagged."""
    common = " ".join(["the"] * 20)
    rows = [(i, common, "en", "common") for i in range(6)] + [
        (10 + j, " ".join(f"rare{10 + j}_{k}" for k in range(20)), "en", "soup")
        for j in range(2)
    ]
    d = _docs(spark, rows)
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.curation import (
        q_perplexity_filter,
    )

    out = {r.source: r for r in q_perplexity_filter(spark, str(tmp_path)).collect()}
    assert out["soup"].n_flagged == out["soup"].n_docs  # all word-soup docs flagged
    assert out["common"].n_flagged == 0
    assert out["soup"].mean_nll_fp6 > out["common"].mean_nll_fp6


def test_dsir_importance_prefers_target_like_docs(spark, tmp_path):
    """Docs wordier in the target (en) vocabulary outrank background-like
    docs; ranking is (weight DESC, doc_id)."""
    rows = (
        [(i, "alpha beta gamma delta", "en", "t") for i in range(3)]
        + [(10 + i, "omega psi chi phi", "de", "b") for i in range(3)]
        + [(20, "alpha beta gamma delta", "de", "mixed")]  # en-like text, bg lang
    )
    d = _docs(spark, rows)
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.curation import (
        q_dsir_importance,
    )

    out = q_dsir_importance(spark, str(tmp_path)).collect()
    ranks = {r.doc_id: r.rank for r in out}
    weights = {r.doc_id: r.weight9 for r in out}
    # the en-like doc written in 'de' still scores like the target docs
    assert weights[20] == weights[0]
    # background-vocab docs score strictly lower
    assert weights[10] < weights[0]
    # deterministic tie-break by doc_id among equal weights
    tied = sorted([d_ for d_, w in weights.items() if w == weights[0]])
    assert [ranks[d_] for d_ in tied] == sorted(ranks[d_] for d_ in tied)


def test_ngram_novelty_attributes_first_source(spark, tmp_path):
    """A trigram shared by sources a and b counts as novel only for a
    (lexicographic first); b's unique trigrams stay its own."""
    rows = [
        (0, "x y z q r s", "en", "a"),   # trigrams: xyz yzq zqr qrs
        (1, "x y z u v w", "en", "b"),   # xyz (seen in a) + yzu zuv uvw
    ]
    d = _docs(spark, rows)
    d.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.curation import (
        q_ngram_novelty,
    )

    out = {r.source: r for r in q_ngram_novelty(spark, str(tmp_path)).collect()}
    assert out["a"].n_distinct == 4 and out["a"].n_novel == 4
    assert out["b"].n_distinct == 4 and out["b"].n_novel == 3
    assert out["b"].novelty_fp6 == 750_000


def test_semdedup_drops_higher_id_twin(spark, tmp_path):
    """Two identical vectors land in the same cluster; the higher id is
    dropped, the lower kept. An orthogonal vector survives."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # centroid seed 0
        (1, [0.0, 1.0, 0.0, 0.0], 0),   # centroid seed 1
        (2, [1.0, 0.0, 0.0, 0.0], 0),   # twin of 0 -> dropped
        (3, [0.0, 0.0, 1.0, 0.0], 0),   # near-orthogonal: kept
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        "label",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    import arc_maskdata_pipeline_plugin_spark.plans.curation as cur

    orig_cells = cur._SD_CELLS
    cur._SD_CELLS = 2
    try:
        out = {r.cell: r for r in cur.q_semdedup(spark, str(tmp_path)).collect()}
    finally:
        cur._SD_CELLS = orig_cells
    # cell 0 holds vecs {0, 2, 3}: the identical pair (0,2) drops vec 2 only
    assert out[0].n_members == 3
    assert out[0].n_dup_pairs == 1 and out[0].n_dropped == 1 and out[0].n_kept == 2
    assert out[1].n_members == 1 and out[1].n_dropped == 0


def test_phash_dedup_finds_planted_quads(spark, tmp_path):
    """Ids in the same 4-block render near-identical images -> all three
    within-block pairs of block 0 surface with small hamming; the pair
    (3, 4) straddles blocks with different gradient patterns and must NOT
    appear at hamming <= 6."""
    rows = [(i, "t", "en", "s") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.multimodal_queries import (
        q_multimodal_phash_dedup,
    )

    pairs = {(r.d1, r.d2): r.hamming for r in q_multimodal_phash_dedup(
        spark, str(tmp_path)
    ).collect()}
    for a, b in [(0, 1), (0, 2), (1, 2), (4, 5), (5, 6)]:
        assert (a, b) in pairs, (a, b)
        assert pairs[(a, b)] <= 6
    assert (3, 4) not in pairs


def test_bpe_roundtrip_lossless(spark):
    """Every trained segmentation must reassemble to its word exactly."""
    from arc_maskdata_pipeline_plugin_spark.plans.bpe import q_bpe_roundtrip

    row = q_bpe_roundtrip(spark, SF).collect()[0]
    assert row.n_words > 0
    assert row.n_lossy == 0
    assert row.n_lossless == row.n_words
    # BPE can't produce more tokens than characters (merging only shrinks
    # below chars+terminal); sanity-bound the compression readout
    assert 0 < row.tokens_per_char_fp6 <= 2_000_000


def test_curriculum_stages_ordered_and_partition(spark):
    """Stages tile the nll range in order and partition the corpus."""
    from arc_maskdata_pipeline_plugin_spark.plans.curation import (
        q_curriculum_shards,
    )

    rows = sorted(q_curriculum_shards(spark, SF).collect(), key=lambda r: r.stage)
    assert [r.stage for r in rows] == list(range(len(rows)))
    for a, b in zip(rows, rows[1:]):
        assert a.nll_max <= b.nll_min
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == n_docs


def test_hard_negatives_semantics(spark, tmp_path):
    """Constructed geometry: anchor 100 (label 0) sits nearest to vec 1
    (label 1 -> hard negative) and shares label 0 with the near-orthogonal
    vec 2 (-> hard positive)."""
    rows = [
        (1, [0.9, 0.1, 0.0], 1),    # closest to the anchor, other label
        (2, [0.1, 0.0, 0.9], 0),    # same label, far away
        (3, [0.8, 0.2, 0.0], 0),    # same label, close (NOT the hard positive)
        (100, [1.0, 0.0, 0.0], 0),  # anchor
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.curation import q_hard_negatives

    out = q_hard_negatives(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.query_id == 100 and r.hard_neg_id == 1 and r.hard_pos_id == 2
    assert r.neg_cos_fp6 > r.pos_cos_fp6


def test_theil_sen_ignores_outlier_day(spark, tmp_path):
    """A perfect slope-100 line with one wild outlier day: the pairwise-
    slope median stays exactly 100 cents/day (OLS would not)."""
    import datetime

    base = datetime.datetime(2024, 1, 1, 12, 0, tzinfo=datetime.timezone.utc)
    rows = []
    for d in range(9):
        v = 100.0 + d * 1.0 if d != 4 else 10_000.0  # day 4 is the outlier
        rows.append((d, base + datetime.timedelta(days=d), 1, "purchase", v, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.timeseries import (
        q_theil_sen_trend,
    )

    out = {r.event_type: r for r in q_theil_sen_trend(spark, str(tmp_path)).collect()}
    r = out["purchase"]
    assert r.n_days == 9 and r.n_pairs == 36
    # line slope = 1.00/day = 100 cents/day = 100_000_000 fp6... (cents*1e6)
    assert r.slope_fp6 == 100 * 1_000_000


def test_feature_hashing_deterministic_and_complete(spark, tmp_path):
    """Same token always lands in the same bucket; per-doc tf masses sum to
    the doc's token count (nothing dropped by the trick)."""
    rows = [
        (0, "a b a c", "en", "s"),
        (1, "a d", "en", "s"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.curation import (
        q_feature_hashing,
    )

    out = q_feature_hashing(spark, str(tmp_path)).collect()
    mass = {}
    buckets_for_a = set()
    for r in out:
        mass[r.doc_id] = mass.get(r.doc_id, 0) + r.tf
    assert mass == {0: 4, 1: 2}
    # 'a' appears in both docs: the bucket holding tf>=2 in doc 0 must also
    # exist in doc 1 (same hash -> same bucket across docs)
    d0 = {r.bucket: r.tf for r in out if r.doc_id == 0}
    d1 = {r.bucket: r.tf for r in out if r.doc_id == 1}
    a_bucket = [b for b, tf in d0.items() if tf == 2]
    assert len(a_bucket) == 1 and a_bucket[0] in d1


def test_consistent_hash_minimal_movement(spark, tmp_path):
    """Growing 8 -> 9 shards moves roughly 1/9 of keys (the consistent-
    hashing guarantee); naive hash%n would move ~8/9. Allow generous slack
    for the 16-vnode ring's variance."""
    rows = [(i, "t", "en", "s") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.curation import (
        q_consistent_hash_shards,
    )

    out = q_consistent_hash_shards(spark, str(tmp_path)).collect()
    n = sum(r.n_docs for r in out)
    moved = sum(r.n_moved_on_grow for r in out)
    assert n == 2000
    frac = moved / n
    assert 0.02 < frac < 0.35, frac  # ~1/9 expected; far below hash%n's ~8/9


def test_label_propagation_two_components(spark, tmp_path):
    """Two disjoint customer-supplier cliques converge to two communities
    that never mix."""
    # component A: customers 1,2 x supplier 1; component B: customer 10 x
    # suppliers 10, 11
    orders = spark.createDataFrame(
        [(100, 1), (101, 2), (200, 10), (201, 10)],
        ["o_orderkey", "o_custkey"],
    )
    li = spark.createDataFrame(
        [(100, 1), (101, 1), (200, 10), (201, 11)],
        ["l_orderkey", "l_suppkey"],
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.graph import (
        q_label_propagation,
    )

    rows = q_label_propagation(spark, str(tmp_path)).collect()
    # nodes: A = {2, 4, 3}; B = {20, 21, 23} (2c / 2s+1 encoding)
    a_nodes, b_nodes = {2, 4, 3}, {20, 21, 23}
    total = sum(r.n_members for r in rows)
    assert total == 6
    # every community's min_member stays within one side
    for r in rows:
        assert (r.min_member in a_nodes) != (r.min_member in b_nodes)
    # membership mass never crosses: communities rooted in A hold exactly
    # A's population
    a_mass = sum(r.n_members for r in rows if r.min_member in a_nodes)
    assert a_mass == 3


def test_search_ndcg_bounds_and_perfect_case(spark):
    """nDCG is in (0, 1]; dcg <= idcg always; all 5 workload queries rank
    exactly 10 docs at sf0.001."""
    from arc_maskdata_pipeline_plugin_spark.plans.search import q_search_ndcg

    rows = q_search_ndcg(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 < r.ndcg_fp6 <= 1_000_000
        assert r.dcg <= r.idcg
        assert r.n_ranked == 10


def test_embedding_drift_detects_shifted_half(spark, tmp_path):
    """Label 0: both halves share a direction -> cosine ~= 1. Label 1: the
    odd half is rotated to an orthogonal direction -> cosine ~= 0."""
    import random

    rng = random.Random(7)

    def vec(base, jitter=0.05):
        return [b + rng.uniform(-jitter, jitter) for b in base]

    e0 = [1.0] + [0.0] * 63
    e1 = [0.0, 1.0] + [0.0] * 62
    rows = []
    for i in range(40):
        rows.append((i * 2, vec(e0), 0))        # label 0, even half
        rows.append((i * 2 + 1, vec(e0), 0))    # label 0, odd half: same dir
    for i in range(40):
        rows.append((1000 + i * 2, vec(e0), 1))      # label 1 even: e0
        rows.append((1000 + i * 2 + 1, vec(e1), 1))  # label 1 odd: e1 (drift)
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.stats2 import q_embedding_drift

    out = {r.label: r for r in q_embedding_drift(spark, str(tmp_path)).collect()}
    assert out[0].centroid_cos_fp6 > 990_000
    assert abs(out[1].centroid_cos_fp6) < 200_000


def test_rolling_retention_censoring_and_rate(spark, tmp_path):
    """User A returns on day+3 (retained), user B never returns, user C is
    active only inside the censored tail; the horizon-adjacent days are
    excluded."""
    import datetime

    base = datetime.datetime(2024, 3, 1, 10, 0, tzinfo=datetime.timezone.utc)

    def ev(i, user, day):
        return (i, base + datetime.timedelta(days=day), user, "view", 1.0, "{}")

    rows = [
        ev(0, 1, 0), ev(1, 1, 3),      # A: day0 retained via day3
        ev(2, 2, 0),                   # B: day0 never returns
        ev(3, 3, 9),                   # C: active only in the censored tail
        ev(4, 9, 10),                  # horizon anchor (day 10)
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.behavior import (
        q_rolling_retention_d7,
    )

    out = {r.day: r for r in q_rolling_retention_d7(spark, str(tmp_path)).collect()}
    assert "2024-03-01" in out and len(out) <= 2  # day3 reported too (<=h-7)
    d0 = out["2024-03-01"]
    assert d0.n_active == 2 and d0.n_returned_7d == 1
    assert d0.retention_fp6 == 500_000
    assert "2024-03-10" not in out  # censored horizon day


def test_epoch_shuffle_decorrelates(spark, tmp_path):
    """Epoch layouts are permutations of the same corpus (equal doc counts)
    and decorrelate across epochs: same-shard fraction sits near 1/64."""
    rows = [(i, "t", "en", "s") for i in range(4000)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.curation import q_epoch_shuffle

    out = {r.epoch: r for r in q_epoch_shuffle(spark, str(tmp_path)).collect()}
    assert out[0].n_docs == out[1].n_docs == 4000
    assert out[0].n_shards_used == 64
    # 1/64 = 15625 fp6; allow binomial slack around it
    assert 5_000 < out[0].same_shard_fp6 < 40_000
    assert out[0].same_shard_fp6 == out[1].same_shard_fp6


def test_delivery_sla_grouped_percentiles(spark, tmp_path):
    """Constructed month with lags [1..10]: p50 -> 5, p95 -> 10 under
    PERCENTILE_DISC semantics (smallest value with cum count >= ceil(p*n))."""
    import datetime

    od = datetime.date(2024, 5, 1)
    orders = spark.createDataFrame(
        [(i, od) for i in range(10)], ["o_orderkey", "o_orderdate"]
    )
    li = spark.createDataFrame(
        [(i, od + datetime.timedelta(days=i + 1)) for i in range(10)],
        ["l_orderkey", "l_shipdate"],
    )
    orders.write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    li.write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.timeseries import (
        q_delivery_sla_monthly,
    )

    out = q_delivery_sla_monthly(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.month == "2024-05" and r.n == 10
    assert r.p50_days == 5 and r.p95_days == 10


def test_referential_integrity_counts_orphans(spark, tmp_path):
    """A planted orphan custkey and orphan partkey are each counted once;
    intact relationships report zero."""
    import datetime

    d = datetime.date(2024, 1, 1)
    spark.createDataFrame([(1,), (2,)], ["c_custkey"]).write.parquet(
        str(tmp_path / "customer.parquet")
    )
    spark.createDataFrame(
        [(10, 1, d), (11, 99, d)], ["o_orderkey", "o_custkey", "o_orderdate"]
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame([(5,)], ["p_partkey"]).write.parquet(
        str(tmp_path / "part.parquet")
    )
    spark.createDataFrame([(7,)], ["s_suppkey"]).write.parquet(
        str(tmp_path / "supplier.parquet")
    )
    spark.createDataFrame(
        [(10, 5, 7), (11, 999, 7)], ["l_orderkey", "l_partkey", "l_suppkey"]
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.quality import (
        q_referential_integrity,
    )

    out = {r.rel: r for r in q_referential_integrity(spark, str(tmp_path)).collect()}
    assert out["orders.custkey->customer"].n_orphans == 1
    assert out["lineitem.orderkey->orders"].n_orphans == 0
    assert out["lineitem.partkey->part"].n_orphans == 1
    assert out["lineitem.suppkey->supplier"].n_orphans == 0
    assert out["lineitem.partkey->part"].n_child == 2


def test_position_attribution_conserves_value(spark, tmp_path):
    """A 3-touch journey splits 40/20/40 with the floor remainder on the
    first touch; credit conserves the purchase value to the cent."""
    import datetime

    t0 = datetime.datetime(2024, 6, 1, 12, 0, tzinfo=datetime.timezone.utc)

    def ev(i, mins, typ, v=0.0):
        return (i, t0 + datetime.timedelta(minutes=mins), 1, typ, v, "{}")

    rows = [
        ev(0, 0, "view"),
        ev(1, 10, "click"),
        ev(2, 20, "view"),
        ev(3, 30, "purchase", 1.01),  # 101 cents: first 40, middle 21, last 40
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.behavior import (
        q_position_attribution,
    )

    out = {r.channel: r for r in q_position_attribution(spark, str(tmp_path)).collect()}
    # first touch (view, 40) + last touch (view, 40) = 80; the middle pool
    # (101 - 80 = 21, remainder included) goes to the single middle click
    assert out["view"].credit_cents + out["click"].credit_cents == 101
    assert out["click"].credit_cents == 21
    assert out["view"].n_touches == 2 and out["click"].n_touches == 1


def test_logrank_null_and_shifted_hazards(spark, tmp_path):
    """Identical group hazards -> z ~= 0; making group 1 convert much later
    pushes z strongly positive (group 0 converts faster than expected)."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 9, 0, tzinfo=datetime.timezone.utc)
    rows = []
    eid = 0

    def add(user, day, typ, v=1.0):
        nonlocal eid
        rows.append(
            (eid, t0 + datetime.timedelta(days=day), user, typ, v, "{}")
        )
        eid += 1

    # 20 users both groups seen day 0; group 0 (even) converts day u%5+1,
    # group 1 (odd) converts day u%5+20 (much slower)
    for u in range(40):
        add(u, 0, "view")
        add(u, (u % 5 + 1) if u % 2 == 0 else (u % 5 + 20), "purchase")
    add(999, 40, "view")  # horizon anchor
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.stats2 import q_logrank_test

    r = q_logrank_test(spark, str(tmp_path)).collect()[0]
    assert r.n0_subjects + r.n1_subjects == 41
    # group 0 converts systematically earlier -> observed-minus-expected
    # for group 0 is positive and large relative to the variance
    assert r.z_fp6 > 2_000_000  # z > 2 (clear separation)


def test_trimmed_mean_robust_to_outlier(spark, tmp_path):
    """Values 1..10 dollars plus a wild $10000 outlier: the exact [p10,p90]
    band drops the outlier (and the low tail cut keeps >= ceil semantics);
    the plain mean would be ~10x larger."""
    import datetime

    t = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    rows = [(i, t, 1, "buy", float(i + 1), "{}") for i in range(10)]
    rows.append((99, t, 1, "buy", 10_000.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.stats import q_trimmed_mean

    r = q_trimmed_mean(spark, str(tmp_path)).collect()[0]
    assert r.n_total == 11
    # p10 cut (ceil(0.1*11)=2nd value = 200c), p90 (ceil(9.9)=10th = 1000c):
    # kept = 2..10 dollars -> mean = 600c
    assert r.n_kept == 9
    assert r.trimmed_mean_cents == 600


def test_simhash_idf_ignores_boilerplate(spark, tmp_path):
    """Two docs sharing ONLY a long boilerplate phrase but with different
    rare content: unweighted SimHash tends to co-bucket them (the shared
    high-df tokens dominate the majority vote); the idf-weighted signature
    separates them because boilerplate idf ~= 0. Twin docs sharing rare
    content DO co-bucket."""
    boiler = " ".join(["the quick brown fox jumps over lazy dogs again today"] * 3)
    rows = [
        (0, boiler + " zeta11 zeta12 zeta13", "en", "s"),
        (1, boiler + " omega21 omega22 omega23", "en", "s"),
        (2, "alpha1 alpha2 alpha3 alpha4 alpha5 alpha6", "en", "s"),
        (3, "alpha1 alpha2 alpha3 alpha4 alpha5 alpha6", "en", "s"),  # twin of 2
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import (
        dedup_simhash_idf_buckets,
    )

    out = dedup_simhash_idf_buckets(spark, str(tmp_path)).collect()
    grouped = {tuple(sorted(map(int, r.doc_ids.split(",")))) for r in out}
    # exact twins co-bucket
    assert any({2, 3} <= set(g) for g in grouped)
    # the boilerplate-only pair must NOT co-bucket
    assert not any({0, 1} <= set(g) for g in grouped)


def test_covariate_balance_detects_imbalance(spark, tmp_path):
    """A split where odd users are twice as active shows |SMD| >> 0.1 on
    n_events; a balanced constant covariate scores 0."""
    import datetime

    t = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    rows, eid = [], 0
    for u in range(40):
        k = 2 if u % 2 == 0 else 5  # odd arm more active
        for j in range(k + (u % 3 == 0)):  # jitter so variance > 0
            rows.append((eid, t + datetime.timedelta(hours=eid), u, "view", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.stats2 import (
        q_covariate_balance,
    )

    out = {r.covariate: r.smd_fp6 for r in q_covariate_balance(spark, str(tmp_path)).collect()}
    assert out["n_events"] > 100_000  # heavily imbalanced (SMD >> 0.1)
    # n_types is constant 1 in both arms -> perfectly balanced
    assert out["n_types"] == 0


def test_forecast_backtest_perfect_weekly_pattern(spark, tmp_path):
    """A perfectly weekly-periodic series backtests to MAE 0 / sMAPE 0;
    the first 7 days (no lag-7 actual) are excluded."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 12, 0, tzinfo=datetime.timezone.utc)
    rows = []
    for d in range(21):
        v = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0][d % 7]
        rows.append((d, t0 + datetime.timedelta(days=d), 1, "buy", v, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.timeseries import (
        q_forecast_backtest,
    )

    r = q_forecast_backtest(spark, str(tmp_path)).collect()[0]
    assert r.n_days == 14  # 21 days minus the 7-day warmup
    assert r.mae_cents == 0 and r.smape_fp6 == 0


def test_forecast_backtest_gapped_calendar_stays_aligned(spark, tmp_path):
    """Drop one day from a perfectly weekly series: the calendar self-join
    keeps the seasonal baseline aligned (MAE stays 0) and simply skips the
    missing day and its +7 dependent. A 7-ROW lag would have misaligned
    every day after the gap (ADVICE r05)."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 12, 0, tzinfo=datetime.timezone.utc)
    rows = []
    for d in range(21):
        if d == 10:  # the gap
            continue
        v = [10.0, 20.0, 30.0, 40.0, 50.0, 60.0, 70.0][d % 7]
        rows.append((d, t0 + datetime.timedelta(days=d), 1, "buy", v, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.timeseries import (
        q_forecast_backtest,
    )

    r = q_forecast_backtest(spark, str(tmp_path)).collect()[0]
    # days 7..20 minus day 10 (absent) minus day 17 (its day-10 actual is
    # missing, so fc is NULL and the row is excluded)
    assert r.n_days == 12
    assert r.mae_cents == 0 and r.smape_fp6 == 0


def test_churn_features_one_user(spark, tmp_path):
    """Hand-checked feature vector: 3 events across 2 weeks, 1 purchase."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1, 10, 0, tzinfo=datetime.timezone.utc)
    rows = [
        (0, t0, 1, "view", 0.0, "{}"),
        (1, t0 + datetime.timedelta(days=8), 1, "purchase", 2.5, "{}"),
        (2, t0 + datetime.timedelta(days=14), 1, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.behavior import q_churn_features

    r = q_churn_features(spark, str(tmp_path)).collect()[0]
    assert r.tenure_days == 14 and r.recency_days == 0
    assert r.n_events == 3 and r.n_purchases == 1 and r.spend_cents == 250
    assert r.active_weeks == 3  # Mon Jan 1, Tue Jan 9, Mon Jan 15 span 3 ISO weeks
    assert r.events_per_week_fp6 == 1_500_000  # 3 events / 2 weeks


def test_pca_top_component_finds_dominant_axis(spark, tmp_path):
    """Variance concentrated on dim 2: the converged loading vector is
    (up to sign) the e2 axis — its |loading| is the 1e6 max and every
    other dim's loading is comparatively tiny."""
    import random

    rng = random.Random(11)
    rows = []
    for i in range(300):
        v = [rng.uniform(-0.05, 0.05) for _ in range(64)]
        v[2] += rng.choice([-1.0, 1.0])  # dominant spread on dim 2
        rows.append((i, v, 0))
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"), "label"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.embeddings import (
        q_pca_top_component,
    )

    out = {r.dim: r.loading_fp6 for r in q_pca_top_component(spark, str(tmp_path)).collect()}
    assert len(out) == 8
    # the dominant axis carries the max norm (double rounding in
    # w*1e6/max can floor the self-normalized component to 999999 —
    # identically in both engines)
    assert abs(out[2]) >= 999_998
    for d, v in out.items():
        if d != 2:
            assert abs(v) < 150_000, (d, v)


def test_growth_accounting_partitions_actives(spark, tmp_path):
    """User A active d0,d1 (retained on d1); B active d0,d3 (resurrected on
    d3); C first appears d3 (new). Classes partition each day's actives."""
    import datetime

    t0 = datetime.datetime(2024, 2, 1, 8, 0, tzinfo=datetime.timezone.utc)
    rows = [
        (0, t0, 1, "view", 0.0, "{}"),
        (1, t0 + datetime.timedelta(days=1), 1, "view", 0.0, "{}"),
        (2, t0, 2, "view", 0.0, "{}"),
        (3, t0 + datetime.timedelta(days=3), 2, "view", 0.0, "{}"),
        (4, t0 + datetime.timedelta(days=3), 3, "view", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.behavior import (
        q_growth_accounting,
    )

    out = {r.day: r for r in q_growth_accounting(spark, str(tmp_path)).collect()}
    d0, d1, d3 = out["2024-02-01"], out["2024-02-02"], out["2024-02-04"]
    assert (d0.n_new, d0.n_retained, d0.n_resurrected) == (2, 0, 0)
    assert (d1.n_new, d1.n_retained, d1.n_resurrected) == (0, 1, 0)
    assert (d3.n_new, d3.n_retained, d3.n_resurrected) == (1, 0, 1)
    for r in out.values():
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected
