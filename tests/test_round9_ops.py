"""Round-9 operator semantics on constructed inputs.

Each test writes a tiny documents/events parquet into tmp_path and runs the
registered query against it, asserting hand-computed expected values (the
semantics layer of the per-operator checklist; oracle parity is the
cross-engine layer)."""

from __future__ import annotations


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))


def test_copy_direction_planted_provenance(spark, tmp_path):
    """Planted provenance: span X originates in source A (doc 1, the
    minimum doc_id carrying it) and is copied by B (doc 5) and C (doc 9);
    span Y originates in B (doc 2) and is copied by A (doc 7); source D
    shares nothing. Each doc is exactly 8 tokens = exactly one span, so the
    directed counts and shares are hand-computable."""
    X = " ".join(f"x{i}" for i in range(8))
    Y = " ".join(f"y{i}" for i in range(8))
    U = " ".join(f"u{i}" for i in range(8))
    rows = [
        (1, X, "en", "A"),
        (2, Y, "en", "B"),
        (5, X, "en", "B"),
        (7, Y, "en", "A"),
        (9, X, "en", "C"),
        (11, U, "en", "D"),
    ]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.dedup import (
        q_source_copy_direction,
    )

    got = {
        (r["origin_source"], r["copier_source"]): (
            r["n_copied_spans"],
            r["n_copier_spans"],
            r["copied_share_fp6"],
        )
        for r in q_source_copy_direction(spark, str(tmp_path)).collect()
    }
    assert got == {
        # A and B each hold 2 distinct spans; C holds 1
        ("A", "B"): (1, 2, 500_000),
        ("A", "C"): (1, 1, 1_000_000),
        ("B", "A"): (1, 2, 500_000),
    }, got


def test_incremental_winnow_dedup_against_store(spark):
    """New batch vs persisted winnowing fingerprint store: a batch doc
    sharing a long token run with the corpus is dropped (locality: any
    shared k+w-1 = 7-token run yields a shared fingerprint; the 16-token
    copy yields >= min_shared of them), a fresh doc survives, and unioning
    the survivor fingerprints into the store dedups the next identical
    batch fully — per-increment cost stays batch-local (winnowing is
    doc-local, so the store extends by plain union)."""
    from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
        incremental_dedup_winnow,
        winnow_fingerprints,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india " \
        "juliet kilo lima mike november oscar papa"
    corpus = spark.createDataFrame(
        [
            (1, f"intro words then {shared} and a corpus tail here"),
            (2, "completely different content about distributed query engines"
                " running large analytical scans every night"),
        ],
        "doc_id LONG, text STRING",
    )
    store = winnow_fingerprints(corpus)

    batch = spark.createDataFrame(
        [
            # carries the corpus run, shifted to a new position
            (10, f"totally new preamble {shared} closing differently now"),
            # genuinely new
            (11, "a brand new article describing winnowing fingerprints at"
                 " scale with no overlap whatsoever in its token stream"),
        ],
        "doc_id LONG, text STRING",
    )
    survivors, survivor_fps = incremental_dedup_winnow(batch, store)
    assert [r.doc_id for r in survivors.collect()] == [11]
    assert {r.doc_id for r in survivor_fps.collect()} == {11}
    store2 = store.union(survivor_fps)
    survivors2, _ = incremental_dedup_winnow(batch, store2)
    assert survivors2.count() == 0


def test_layout_advisor_zorder_wins_mixed_2d_workload(spark, tmp_path):
    """The known result the r09 advisor extension exists for: on a workload
    mixing a selective DATE range with a selective CUSTOMER range over data
    where the two dimensions are independent, Z-order beats every
    single-key sort (a date sort wins date scans but reads everything for
    the customer predicate, and vice versa; Morton bounds BOTH axes per
    file). 1024 rows on a 256-day x 1024-customer grid (no day-mask wrap),
    price/priority predicates matching nothing; the full Python replica is
    the ground truth and zorder must rank 1 STRICTLY."""
    import hashlib
    from datetime import date, timedelta

    rows = []
    for i in range(1024):
        d = date(1994, 1, 1) + timedelta(days=(i * 997) % 256)
        rows.append((i, (i * 331) % 1024, d.strftime("%Y-%m-%d"), 1.0 + i / 100.0, "5-LOW"))
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate string, "
        "o_totalprice double, o_orderpriority string",
    ).selectExpr(
        "o_orderkey",
        "o_custkey",
        "cast(o_orderdate as timestamp) as o_orderdate",
        "o_totalprice",
        "o_orderpriority",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    from arc_maskdata_pipeline_plugin_spark.plans.lakeops2 import (
        _ADV_FILES,
        _ADV_PREDICATES,
        q_layout_advisor,
    )

    def morton(x, y, bits=10):
        z = 0
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    base = date(1992, 1, 1)
    recs = [
        {
            "okey": i,
            "d": (date(1994, 1, 1) + timedelta(days=(i * 997) % 256)).strftime(
                "%Y-%m-%d"
            ),
            "cents": round((1.0 + i / 100.0) * 100),
            "prio": "5-LOW",
            "ck": (i * 331) % 1024,
        }
        for i in range(1024)
    ]
    sort_vals = {
        "bydate": lambda r: int(r["d"].replace("-", "")),
        "byprice": lambda r: r["cents"],
        "bycust": lambda r: r["ck"],
        "arrival": lambda r: int(
            hashlib.md5(f"adv:{r['okey']}".encode()).hexdigest()[:8], 16
        ),
        "datecust": lambda r: (int(r["d"].replace("-", "")) << 30)
        + (r["ck"] & 1073741823),
        "zorder": lambda r: morton(
            r["ck"] & 1023, (date.fromisoformat(r["d"]) - base).days & 1023
        ),
    }
    per = 1024 // _ADV_FILES
    expected = {}
    for lay, sv in sort_vals.items():
        ordered = sorted(recs, key=lambda r: (sv(r), r["okey"]))
        files = [ordered[k * per : (k + 1) * per] for k in range(_ADV_FILES)]
        scanned = files_read = 0
        for _, col, lo, hi in _ADV_PREDICATES:
            lo, hi = lo.strip("'"), hi.strip("'")
            lo_c = int(lo) if col in ("cents", "ck") else lo
            hi_c = int(hi) if col in ("cents", "ck") else hi
            for f in files:
                vals = [r[col] for r in f]
                if not (max(vals) < lo_c or min(vals) > hi_c):
                    scanned += len(f)
                    files_read += 1
        expected[lay] = (scanned, files_read)

    out = {r.layout: r for r in q_layout_advisor(spark, str(tmp_path)).collect()}
    assert set(out) == set(expected)
    for lay, (scanned, files_read) in expected.items():
        assert out[lay].workload_rows_scanned == scanned, lay
        assert out[lay].workload_files_read == files_read, lay
    # zorder wins STRICTLY on the mixed 2-D workload
    assert out["zorder"].advisor_rank == 1
    others = min(
        v.workload_rows_scanned for k, v in out.items() if k != "zorder"
    )
    assert out["zorder"].workload_rows_scanned < others


def test_layout_advisor_prediction_matches_written_files(spark, tmp_path):
    """Advisor-vs-REALITY closure (r09, VERDICT r08 next-round #7): the
    advisor predicts scan work from SIMULATED zone maps — here the
    top-ranked layout is physically WRITTEN (one parquet file per NTILE
    file), the REAL footer statistics are read back from the files on
    disk, and the workload is evaluated against those real min/max stats.
    Files-read and rows-scanned must equal the advisor's prediction
    exactly, and Spark must push the workload predicates into the scan —
    turning the advisor from a simulation into a validated cost model."""
    from datetime import date, timedelta

    import pyarrow.parquet as pq
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = []
    for i in range(1024):
        d = date(1994, 1, 1) + timedelta(days=(i * 997) % 256)
        rows.append((i, (i * 331) % 1024, d.strftime("%Y-%m-%d"), 1.0 + i / 100.0, "5-LOW"))
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate string, "
        "o_totalprice double, o_orderpriority string",
    ).selectExpr(
        "o_orderkey",
        "o_custkey",
        "cast(o_orderdate as timestamp) as o_orderdate",
        "o_totalprice",
        "o_orderpriority",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    from arc_maskdata_pipeline_plugin_spark.operators.layout import zorder_sql
    from arc_maskdata_pipeline_plugin_spark.plans.lakeops2 import (
        _ADV_FILES,
        _ADV_PREDICATES,
        _ADV_Z_BITS,
        q_layout_advisor,
    )
    from arc_maskdata_pipeline_plugin_spark.plans.registry import dec

    adv = {r.layout: r for r in q_layout_advisor(spark, str(tmp_path)).collect()}
    top = min(adv.values(), key=lambda r: r.advisor_rank)
    assert top.layout == "zorder"  # the mixed 2-D construction

    # physically write the winning layout: ntile file assignment -> one
    # parquet file per simulated file
    o = spark.read.parquet(str(tmp_path / "orders.parquet")).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        (dec("o_totalprice", 18, 2) * 100).cast("bigint").alias("cents"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_custkey").alias("ck"),
        F.expr(
            zorder_sql(
                "(o_custkey & 1023)",
                "(datediff(cast(o_orderdate as date), date'1992-01-01') & 1023)",
                _ADV_Z_BITS,
                "spark",
            )
        )
        .cast("bigint")
        .alias("sv"),
    )
    w = Window.orderBy("sv", "o_orderkey")
    filed = o.withColumn("file_id", F.ntile(_ADV_FILES).over(w))
    out_dir = str(tmp_path / "layout_out")
    filed.repartition(_ADV_FILES, "file_id").write.partitionBy("file_id").mode(
        "overwrite"
    ).parquet(out_dir)

    # read the REAL footer stats of every written file
    import glob as _glob

    zones = []
    for fdir in _glob.glob(f"{out_dir}/file_id=*"):
        parts = _glob.glob(f"{fdir}/*.parquet")
        assert len(parts) == 1, fdir  # one physical file per simulated file
        md = pq.ParquetFile(parts[0]).metadata
        stats = {}
        n_rows = 0
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            n_rows += g.num_rows
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                s = col.statistics
                assert s is not None and s.has_min_max, (name, parts[0])
                mn, mx = s.min, s.max
                if isinstance(mn, bytes):
                    mn, mx = mn.decode(), mx.decode()
                if name in stats:
                    stats[name] = (min(stats[name][0], mn), max(stats[name][1], mx))
                else:
                    stats[name] = (mn, mx)
        zones.append((stats, n_rows))
    assert len(zones) == _ADV_FILES
    assert sum(n for _, n in zones) == 1024

    real_scanned = real_files = 0
    for _, col, lo, hi in _ADV_PREDICATES:
        lo, hi = lo.strip("'"), hi.strip("'")
        lo_c = int(lo) if col in ("cents", "ck") else lo
        hi_c = int(hi) if col in ("cents", "ck") else hi
        for stats, n_rows in zones:
            zmin, zmax = stats[col]
            if not (zmax < lo_c or zmin > hi_c):
                real_scanned += n_rows
                real_files += 1
    assert real_scanned == top.workload_rows_scanned
    assert real_files == top.workload_files_read

    # and the engine actually pushes the workload predicates to this scan
    back = spark.read.parquet(out_dir)
    plan = (
        back.filter("d >= '1994-01-01' AND d <= '1994-03-31'")
        .filter("ck >= 100 AND ck <= 500")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # (Spark truncates long plan fields, so check the untruncated prefix)
    assert "PushedFilters" in plan, plan
    assert "GreaterThanOrEqual(d,1994-01-01)" in plan, plan


def test_bpe_artifact_tamper_flips_witnesses(spark, tmp_path):
    """Negative control for the artifact round-trip witnesses: exporting a
    trained artifact round-trips losslessly, but a TAMPERED artifact (last
    merge line dropped) must produce a differing re-encoding for at least
    one vocabulary word — proving import_replay_lossy is a real check, not
    vacuous. And a vocab missing a merged symbol must surface as OOV."""
    rows = [
        (i, "the quick brown fox jumps over the lazy dog " * 3, "en", "A")
        for i in range(8)
    ] + [(100 + i, f"unique filler text number {i} here", "en", "B") for i in range(8)]
    _write_docs(spark, tmp_path, rows)
    from arc_maskdata_pipeline_plugin_spark.plans.bpe2 import (
        _W0_SPARK_BYTE,
        _train_byte_bpe,
        apply_merge_list,
        export_bpe_artifact,
        import_bpe_artifact,
        q_bpe_artifact_roundtrip,
    )
    from pyspark.sql import functions as F

    # the registered query on constructed input: lossless round-trip
    r = q_bpe_artifact_roundtrip(spark, str(tmp_path)).collect()[0]
    assert r.import_replay_lossy == 0
    assert r.oov_after_import == 0
    assert r.ids_contiguous_ok == 1
    assert r.n_merges_exported == 8

    # tamper: drop the LAST merge line -> some word's re-encoding differs
    merges, final = _train_byte_bpe(spark, str(tmp_path))
    art = str(tmp_path / "artifact")
    export_bpe_artifact(merges, art)
    imported, _vocab = import_bpe_artifact(art)
    tampered = imported[:-1]
    replayed = final.withColumn("seq_i", F.expr(_W0_SPARK_BYTE))
    replayed = apply_merge_list(replayed, tampered, "seq_i")
    n_bad = replayed.filter(F.col("seq_i") != F.col("seq")).count()
    final.unpersist()
    assert n_bad >= 1, "dropping a merge must change at least one encoding"


def test_bloom_skip_audit_semantics(spark, tmp_path):
    """Constructed orders: custkeys are only EVEN values 0..198, so lookup
    keys 74 and 148 exist (in several files) while 3, 37, 111 do not. The
    no-false-negative verdicts must hold for every key; absent keys have
    zero true files; and on this arrival-scrambled layout the bloom prunes
    strictly harder than the zone maps for every key (each file's [min,max]
    spans nearly the whole domain while its bloom holds only ~48 of 1024
    bits)."""
    rows = [(i, (i * 2) % 200, "1995-06-%02d" % (1 + i % 28), 10.0, "5-LOW")
            for i in range(1024)]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderdate string, "
        "o_totalprice double, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey",
        "cast(o_orderdate as timestamp) as o_orderdate",
        "o_totalprice", "o_orderpriority",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    from arc_maskdata_pipeline_plugin_spark.plans.lakeops2 import (
        q_bloom_skip_audit,
    )

    out = {r.lookup_key: r for r in q_bloom_skip_audit(spark, str(tmp_path)).collect()}
    assert set(out) == {3, 37, 74, 111, 148}
    for k, r in out.items():
        assert r.bloom_no_false_negative_ok == 1, k
        assert r.zone_no_false_negative_ok == 1, k
        assert r.n_files_bloom_pass >= r.n_files_true, k
        assert r.n_files_bloom_pass < r.n_files_zone_pass, k
    for k in (3, 37, 111):  # odd keys absent from the even-only domain
        assert out[k].n_files_true == 0, k
    for k in (74, 148):
        assert out[k].n_files_true >= 1, k


def test_margin_mining_hub_rejected_isolated_accepted(spark, tmp_path):
    """The reason mining uses the ratio margin instead of a raw cosine cut:
    query 0 sits in a dense HUB (four side-B vectors at cosine .93-.995),
    so its best match carries no information — margin ~1.03, rejected;
    query 2 has one isolated exact match among near-orthogonal vectors —
    margin ~2.16, accepted, even though both queries' best raw cosines are
    high."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # query in the hub
        (2, [0.0, 1.0, 0.0, 0.0], 0),   # query with the isolated match
        (1, [1.0, 0.1, 0.0, 0.0], 1),   # hub members (odd ids = side B)
        (3, [1.0, 0.2, 0.0, 0.0], 1),
        (5, [1.0, 0.3, 0.0, 0.0], 1),
        (7, [1.0, 0.4, 0.0, 0.0], 1),
        (9, [0.0, 1.0, 0.0, 0.0], 1),   # isolated exact match for query 2
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from arc_maskdata_pipeline_plugin_spark.plans.similarity import (
        q_margin_mining_pairs,
    )

    out = {r.query_id: r for r in q_margin_mining_pairs(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 2}
    hub = out[0]
    assert hub.matched_id == 1  # the closest hub member
    assert hub.cosine > 0.99
    assert hub.accepted == 0 and hub.margin < 1.05  # dense hub -> no signal
    iso = out[2]
    assert iso.matched_id == 9
    assert abs(iso.margin - 2.156) < 0.01
    assert iso.accepted == 1


def test_generalization_advisor_matches_python_replica(spark, tmp_path):
    """Full pure-Python replica of the 9-node generalization lattice on a
    constructed customer/nation table: per-node class stats, suppression
    counts, budget flags, and ranks must match row-for-row, and the rank-1
    node must be a minimal-height node within the suppression budget."""
    import math

    nat = [(0, 0), (1, 0), (2, 1), (3, 1)]
    cust = [
        (i, i % 4, "S", float((i % 8) * 1000 + 500 + (i % 3)))
        for i in range(40)
    ]
    spark.createDataFrame(
        nat, "n_nationkey bigint, n_regionkey bigint"
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        cust, "c_custkey bigint, c_nationkey bigint, c_mktsegment string, "
        "c_acctbal double"
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    from arc_maskdata_pipeline_plugin_spark.plans.privacy import (
        _GEN_K,
        _GEN_SUPP_PCT,
        q_generalization_advisor,
    )

    region = dict(nat)
    geo_fns = {0: lambda n: str(n), 1: lambda n: str(region[n]), 2: lambda n: "*"}
    bal_fns = {
        0: lambda b: str(math.floor(b / 1000)),
        1: lambda b: str(math.floor(b / 5000)),
        2: lambda b: "*",
    }
    stats = {}
    for g, gf in geo_fns.items():
        for b, bf in bal_fns.items():
            cls = {}
            for _, nk, seg, bal in cust:
                key = (gf(nk), seg, bf(bal))
                cls[key] = cls.get(key, 0) + 1
            n_viol = sum(1 for v in cls.values() if v < _GEN_K)
            n_supp = sum(v for v in cls.values() if v < _GEN_K)
            over = 0 if n_supp * 100 <= len(cust) * _GEN_SUPP_PCT else 1
            stats[(g, b)] = (len(cls), n_viol, n_supp, over)
    order = sorted(
        stats,
        key=lambda gb: (stats[gb][3], gb[0] + gb[1], stats[gb][2], gb[0], gb[1]),
    )
    ranks = {}
    for i, gb in enumerate(order):
        key = (stats[gb][3], gb[0] + gb[1], stats[gb][2], gb[0], gb[1])
        prev = (stats[order[i - 1]][3], order[i - 1][0] + order[i - 1][1],
                stats[order[i - 1]][2], order[i - 1][0], order[i - 1][1]) if i else None
        ranks[gb] = ranks[order[i - 1]] if key == prev else i + 1

    out = {
        (r.geo_level, r.bal_level): r
        for r in q_generalization_advisor(spark, str(tmp_path)).collect()
    }
    assert set(out) == set(stats)
    for gb, (n_cls, n_viol, n_supp, over) in stats.items():
        r = out[gb]
        assert r.n_classes == n_cls, gb
        assert r.n_violating_classes == n_viol, gb
        assert r.n_suppressed_rows == n_supp, gb
        assert r.within_suppression_budget == (1 - over), gb
        assert r.advisor_rank == ranks[gb], gb
    winner = min(out.values(), key=lambda r: r.advisor_rank)
    if any(v[3] == 0 for v in stats.values()):
        assert winner.within_suppression_budget == 1
        min_height = min(g + b for (g, b), v in stats.items() if v[3] == 0)
        assert winner.geo_level + winner.bal_level == min_height
