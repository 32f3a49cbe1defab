"""Scale stress harness: synthesize inputs ~100× the sf0.1 fixtures ON the
cluster (spark.range — no driver materialization) and measure the operators
whose design is scale-critical. Writes STRESS.md.

This is the evidence the small-SF bench can't give: behavior when the data
no longer fits one task — skewed keys actually skew, window state actually
spills, the broadcast/shuffle choice actually matters.

Run:  python tools/stress.py            (~3-5 min on local[32])
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

RESULTS: list[tuple[str, int, float, str]] = []


def timed(label: str, rows: int, fn, note: str = ""):
    # local-iteration escape hatch: run only cases whose label contains the
    # given substring (full sweeps regenerate STRESS.md; filtered runs only
    # print)
    only = os.environ.get("STRESS_ONLY")
    if only and only.lower() not in label.lower():
        return None
    t0 = time.perf_counter()
    out = fn()
    el = time.perf_counter() - t0
    RESULTS.append((label, rows, el, note))
    print(f"# {label}: {el:.2f}s ({rows:,} rows, {rows/el:,.0f} rows/s)", file=sys.stderr)
    return out


def main():
    from arc_maskdata_pipeline_plugin_spark import get_spark

    spark = get_spark("stress")
    sc = spark.sparkContext

    # ---- synthetic events: 20M rows, 1M users, 30 days -------------------
    n_events = 20_000_000
    events = (
        spark.range(0, n_events, 1, sc.defaultParallelism * 4)
        .select(
            F.col("id").alias("event_id"),
            (F.col("id") % 1_000_000).alias("user_id"),
            F.timestamp_seconds(
                F.lit(1700000000) + (F.col("id") * 2654435761 % (30 * 86400))
            ).alias("ts"),
            (F.col("id") % 5).cast("int").alias("etype"),
            (F.col("id") % 997).cast("double").alias("value"),
        )
    )

    timed(
        "windowed hourly aggregation",
        n_events,
        lambda: events.groupBy(F.date_trunc("hour", "ts"), "etype")
        .agg(F.count(F.lit(1)), F.sum("value"))
        .write.format("noop").mode("overwrite").save(),
        "1 shuffle, map-side partial agg",
    )

    timed(
        "sessionize (30-min gap, 1M users)",
        n_events,
        lambda: __import__(
            "arc_maskdata_pipeline_plugin_spark.streaming.sessions",
            fromlist=["sessionize_batch"],
        ).sessionize_batch(
            events.select("user_id", "ts", F.col("event_id")), gap_minutes=30
        ).write.format("noop").mode("overwrite").save(),
        "window over user_id: state ∝ partition, not stream",
    )

    timed(
        "exact distinct users per type",
        n_events,
        lambda: events.groupBy("etype")
        .agg(F.countDistinct("user_id"))
        .write.format("noop").mode("overwrite").save(),
        "2-phase distinct",
    )
    timed(
        "HLL distinct users per type",
        n_events,
        lambda: events.groupBy("etype")
        .agg(F.approx_count_distinct("user_id"))
        .write.format("noop").mode("overwrite").save(),
        "sketch path — no per-key shuffle",
    )

    # ---- broadcast join: 20M fact × 100k dim -----------------------------
    dim = spark.range(0, 100_000).select(
        F.col("id").alias("user_id"), (F.col("id") % 50).alias("segment")
    )
    timed(
        "fact × 100k-dim broadcast join + agg",
        n_events,
        lambda: events.join(F.broadcast(dim), "user_id")
        .groupBy("segment")
        .agg(F.sum("value"))
        .write.format("noop").mode("overwrite").save(),
        "zero fact shuffle before agg",
    )

    # ---- skew: 10M rows, 30% on ONE key ----------------------------------
    n_skew = 10_000_000
    skewed = spark.range(0, n_skew, 1, sc.defaultParallelism * 4).select(
        F.when(F.col("id") % 10 < 3, F.lit(7)).otherwise(F.col("id") % 100_000).alias("k"),
        F.col("id").alias("v"),
    )
    sdim = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("attr")
    )
    from arc_maskdata_pipeline_plugin_spark.operators.joins import salted_join

    timed(
        "skewed join (30% one key), plain + AQE",
        n_skew,
        lambda: skewed.join(sdim, "k").groupBy("attr").count()
        .write.format("noop").mode("overwrite").save(),
        "AQE skew-join splitting",
    )
    timed(
        "skewed join, salted (16 salts)",
        n_skew,
        lambda: salted_join(
            skewed, sdim.withColumnRenamed("k", "rk"),
            left_key="k", right_key="rk", n_salts=16,
        )
        .groupBy("attr").count()
        .write.format("noop").mode("overwrite").save(),
        "explicit salting path",
    )

    # ---- minhash signatures over 200k synthetic docs ---------------------
    n_docs = 200_000
    words = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda i: F.concat(F.lit("w"), ((F.col("id") * 31 + i * 7) % 5000).cast("string")),
    )
    docs = spark.range(0, n_docs, 1, sc.defaultParallelism * 2).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", words).alias("text")
    )
    from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
        minhash_signatures,
        word_shingles,
    )

    timed(
        "minhash signatures (200k docs × 28 shingles, md5)",
        n_docs,
        lambda: minhash_signatures(word_shingles(docs, distinct=False))
        .write.format("noop").mode("overwrite").save(),
        "1 scan, 1 shuffle (map-side MIN); oracle-reproducible path",
    )
    timed(
        "minhash signatures (200k docs, xxhash64 fast path)",
        n_docs,
        lambda: minhash_signatures(
            word_shingles(docs, distinct=False), hash_fn="xxhash64"
        )
        .write.format("noop").mode("overwrite").save(),
        "production hash: same banding, cheaper per shingle",
    )

    # ---- connected components: star rounds vs worst-case chains ----------
    # 1M-node edge list = 10k chains of length 100 (diameter 99 — the shape
    # that breaks O(diameter) label propagation) plus 100k random pairs.
    from arc_maskdata_pipeline_plugin_spark.operators.clusters import (
        connected_components,
    )

    n_edges = 1_090_000
    chains = (
        spark.range(0, 990_000, 1, sc.defaultParallelism)
        .filter((F.col("id") % 100) != 99)  # break between chains
        .select(F.col("id").alias("d1"), (F.col("id") + 1).alias("d2"))
    )
    rand = spark.range(0, 100_000, 1, sc.defaultParallelism).select(
        (F.xxhash64("id") % 1_000_000).alias("d1"),
        (F.xxhash64("id", F.lit(1)) % 1_000_000).alias("d2"),
    )
    timed(
        "connected components (1M nodes, 100-hop chains + random)",
        n_edges,
        lambda: connected_components(chains.union(rand))
        .write.format("noop").mode("overwrite").save(),
        "large/small-star rounds: O(log n) fixpoint incl. diameter-99 chains",
    )

    # ---- training-set prep at scale (round 3): 1M synthetic docs ---------
    # ~60-token docs from a 30-word vocab, built JVM-side (no driver data);
    # every doc with id % 1000 == 0 is duplicated wholesale into a neighbor
    # so the passage/decontamination screens have real positives to find.
    n_docs2 = 1_000_000
    vocab = F.array(*[F.lit(f"w{i}") for i in range(30)])
    base_text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(60)),
            lambda i: F.element_at(
                vocab, ((F.xxhash64(F.col("id"), i) % 30 + 30) % 30 + 1).cast("int")
            ),
        ),
    )
    docs2 = (
        spark.range(0, n_docs2, 1, sc.defaultParallelism * 2)
        .select(
            F.col("id").alias("doc_id"),
            # dup plant: id%1000==1 copies the text of id-1
            F.when(
                F.col("id") % 1000 == 1,
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(60)),
                        lambda i: F.element_at(
                            vocab,
                            ((F.xxhash64(F.col("id") - 1, i) % 30 + 30) % 30 + 1).cast("int"),
                        ),
                    ),
                ),
            ).otherwise(base_text).alias("text"),
            F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias("source"),
        )
    )

    from arc_maskdata_pipeline_plugin_spark.operators.text import with_chunks

    def passage_stats():
        c = with_chunks(docs2, chunk_size=50, stride=50).select(
            "doc_id", F.md5(F.col("chunk_text")).alias("h")
        )
        n = c.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
        dup = F.when(F.col("cnt") > 1, 1).otherwise(0)
        (
            c.join(n, "h")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_passages"), F.sum(dup).alias("n_dup"))
            .write.format("noop").mode("overwrite").save()
        )

    timed(
        "passage dedup stats (1M docs × 60 tokens)",
        n_docs2,
        passage_stats,
        "chunk → hash-count → co-partitioned join back",
    )

    def decontaminate():
        tk = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        grams = docs2.filter(F.size(tk) >= 8).select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), F.size(tk) - F.lit(7)),
                        lambda s: F.array_join(F.slice(tk, s, 8), " "),
                    )
                )
            ).alias("gram"),
        )
        bench = grams.filter(F.col("doc_id") % 1000 == 0).withColumnRenamed(
            "doc_id", "bench_doc_id"
        )
        train = grams.filter(F.col("doc_id") % 1000 != 0).withColumnRenamed(
            "doc_id", "train_doc_id"
        )
        (
            train.join(F.broadcast(bench), "gram")
            .groupBy("train_doc_id", "bench_doc_id")
            .agg(F.count(F.lit(1)).alias("n_shared"))
            .filter(F.col("n_shared") >= 3)
            .write.format("noop").mode("overwrite").save()
        )

    timed(
        "decontamination probe (1M train docs vs 1k bench docs)",
        n_docs2,
        decontaminate,
        "bench 8-gram index broadcast; train side never shuffles for the probe",
    )

    timed(
        "shard assignment + in-shard order (1M docs, 64 shards)",
        n_docs2,
        lambda: docs2.select(
            "doc_id",
            (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
             .cast("bigint") % 64).alias("shard"),
            F.md5(F.col("doc_id").cast("string")).alias("h"),
        )
        .repartition(64, "shard")
        .sortWithinPartitions("h")
        .write.format("noop").mode("overwrite").save(),
        "the sharded-write shape: one shuffle, partition-local sort",
    )

    def pagerank_stress():
        from arc_maskdata_pipeline_plugin_spark.operators.graph import (
            pagerank_fixed_point,
            symmetrize,
        )

        # 4M directed edges over ~500k nodes (power-law-ish via modulo mixing)
        e = spark.range(4_000_000).select(
            (F.col("id") % 500_000).alias("src"),
            ((F.col("id") * 48271 + 11) % 500_000).alias("dst"),
        ).filter("src != dst")
        pagerank_fixed_point(symmetrize(e), iterations=5).write.format(
            "noop"
        ).mode("overwrite").save()

    timed(
        "PageRank 5 iterations (8M symmetric edges, 500k nodes)",
        8_000_000,
        pagerank_stress,
        "2 shuffles/iter; edges shuffled once, persisted src-partitioned",
    )

    def zorder_stress():
        from arc_maskdata_pipeline_plugin_spark.operators.layout import zorder_layout

        df = spark.range(20_000_000).select(
            (F.col("id") % 16384).alias("x"),
            ((F.col("id") * 2654435761) % 16384).alias("y"),
        )
        zorder_layout(df, "x", "y", 14, 64).write.format("noop").mode(
            "overwrite"
        ).save()

    timed(
        "Z-order layout write shape (20M rows, 28-bit Morton, 64 files)",
        20_000_000,
        zorder_stress,
        "range-partition sample + ONE shuffle + in-partition sort",
    )

    def bpe_round_stress():
        # 2M distinct synthetic words (base-26 digit strings, len 5-9) with
        # skewed counts: ONE trainer round = pair aggregation + global argmax
        # — the unit the 10-round trainer repeats over the vocabulary.
        words = spark.range(2_000_000).select(
            F.expr(
                "conv(cast(id + 100000 as string), 10, 26)"
            ).alias("word"),
            (F.col("id") % 997 + 1).cast("bigint").alias("n"),
        ).select(
            "n",
            F.concat(
                F.lit("  "),
                F.trim(F.regexp_replace(F.lower("word"), "(.)", "$1  ")),
                F.lit("  </w>  "),
            ).alias("seq"),
        )
        pairs = (
            words.select("n", F.split(F.trim("seq"), " +").alias("sy"))
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(sy) - 1), "
                        "i -> struct(element_at(sy, i) AS l, element_at(sy, i + 1) AS r))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs"))
            .agg(F.sum("n").cast("bigint").alias("c"))
        )
        pairs.orderBy(F.desc("c"), "lhs", "rhs").limit(1).write.format(
            "noop"
        ).mode("overwrite").save()

    timed(
        "BPE trainer round (2M-word vocab, pair agg + argmax)",
        2_000_000,
        bpe_round_stress,
        "per-round unit cost: map-side-combined pair partials over the vocab",
    )

    def triangle_stress():
        # ~3M random edges over 200k nodes PLUS a 150k-neighbor hub at node
        # 0 — the skewed-degree shape that kills id-orientation (hub id 0
        # would own 150k out-edges → ~1.1e10 wedges at one vertex). Degree
        # orientation gives the hub out-degree ~0, so the plan stays flat.
        # Mirrors the q_triangle_count edge-iterator: degree-oriented
        # adjacency arrays + per-edge array_intersect.
        rnd = spark.range(3_000_000).select(
            (F.col("id") % 200_000).alias("p1"),
            ((F.col("id") * 48271 + 7) % 200_000).alias("p2"),
        )
        hub = spark.range(1, 150_001).select(
            F.lit(0).alias("p1"), (F.col("id")).alias("p2")
        )
        und = (
            rnd.union(hub)
            .filter("p1 < p2")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("p1").alias("v"), F.col("p2").alias("u")),
                        F.struct(F.col("p2").alias("v"), F.col("p1").alias("u")),
                    )
                ).alias("x")
            )
            .select("x.v", "x.u")
        )
        adj_full = (
            und.groupBy("v")
            .agg(F.collect_set("u").alias("nbrs"))
            .withColumn("deg", F.size("nbrs"))
            .persist()
        )
        deg = adj_full.select(F.col("v").alias("u2"), F.col("deg").alias("deg_u"))
        adj_or = (
            adj_full.select("v", "deg", F.explode("nbrs").alias("u"))
            .join(deg, F.col("u") == F.col("u2"))
            .filter(
                (F.col("deg") < F.col("deg_u"))
                | ((F.col("deg") == F.col("deg_u")) & (F.col("v") < F.col("u")))
            )
            .groupBy("v")
            .agg(F.collect_list("u").alias("nbrs"))
            .persist()
        )
        eo = adj_or.select(F.col("v").alias("ev"), F.explode("nbrs").alias("eu"))
        au, av = adj_or.alias("au"), adj_or.alias("av")
        (
            eo.join(au, F.col("ev") == F.col("au.v"))
            .join(av, F.col("eu") == F.col("av.v"))
            .agg(
                F.sum(
                    F.size(F.array_intersect(F.col("au.nbrs"), F.col("av.nbrs")))
                ).alias("n_triangles")
            )
            .write.format("noop").mode("overwrite").save()
        )
        spark.catalog.clearCache()

    timed(
        "triangle count (3.15M edges, 200k nodes, 150k-degree hub)",
        3_150_000,
        triangle_stress,
        "degree-oriented adjacency intersect; hub out-degree ~0 after orientation",
    )

    def sweepline_stress():
        # 20M events -> 40M deltas, per-(type, day) prefix sums + carry.
        from pyspark.sql import Window

        e = spark.range(20_000_000).select(
            (F.col("id") % 5).cast("string").alias("event_type"),
            F.timestamp_micros(
                (F.col("id") * 7919 % 2_592_000) * 1_000_000
            ).alias("ts"),
        )
        deltas = (
            e.select(
                "event_type",
                F.explode(
                    F.array(
                        F.struct(F.col("ts").alias("t"), F.lit(1).alias("delta")),
                        F.struct(
                            (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("t"),
                            F.lit(-1).alias("delta"),
                        ),
                    )
                ).alias("d"),
            )
            .select("event_type", "d.t", "d.delta")
            .withColumn("day", F.to_date("t"))
        )
        w_day = (
            Window.partitionBy("event_type", "day")
            .orderBy("t", "delta")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        daily = deltas.withColumn("run", F.sum("delta").over(w_day)).groupBy(
            "event_type", "day"
        ).agg(F.max("run").alias("mx"), F.sum("delta").alias("net"))
        w_carry = (
            Window.partitionBy("event_type")
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        (
            daily.withColumn(
                "offset", F.coalesce(F.sum("net").over(w_carry), F.lit(0))
            )
            .groupBy("event_type")
            .agg(F.max(F.col("offset") + F.col("mx")).alias("max_concurrent"))
            .write.format("noop").mode("overwrite").save()
        )

    timed(
        "sweep-line peak concurrency (20M events, day-sharded windows)",
        20_000_000,
        sweepline_stress,
        "40M deltas sort within (type, day) shards; only day aggregates cross",
    )

    def span_dedup_stress():
        from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
            duplicated_spans,
        )

        out = duplicated_spans(docs2, n=8)
        out.write.format("noop").mode("overwrite").save()
        # duplicated_spans persists the span frame internally; drop it so the
        # 1M-doc cache doesn't stay pinned and skew later stress timings
        spark.catalog.clearCache()

    timed(
        "substring span dedup (1M docs × 60 tokens, 8-gram spans)",
        n_docs2,
        span_dedup_stress,
        "53 spans/doc explode; ONE corpus shuffle on span hash; dup set broadcast back",
    )

    def weighted_sample_stress():
        (
            spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4)
            .select(
                F.col("id").alias("doc_id"),
                (F.xxhash64("id") % 500 + 550).alias("w"),
            )
            .withColumn(
                "k",
                -F.log(
                    (
                        F.conv(
                            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12),
                            16,
                            10,
                        ).cast("bigint")
                        + 1
                    )
                    / F.lit(281474976710657.0)
                )
                / F.col("w"),
            )
            .orderBy("k")
            .limit(1000)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    timed(
        "A-ES weighted top-1k sample (20M rows)",
        20_000_000,
        weighted_sample_stress,
        "TakeOrderedAndProject: per-partition heap, k-sized merge — no global sort",
    )

    def fingerprint_stress():
        canon = F.concat_ws(
            "|",
            F.col("event_id").cast("string"),
            F.col("user_id").cast("string"),
            F.col("etype").cast("string"),
        )
        (
            events.select(
                "etype",
                F.conv(F.substring(F.md5(canon), 1, 12), 16, 10)
                .cast("decimal(38,0)")
                .alias("fp"),
            )
            .groupBy("etype")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("fp").alias("checksum"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    timed(
        "anti-entropy table fingerprint (20M rows, md5 row hash)",
        20_000_000,
        fingerprint_stress,
        "one map-side-combined aggregate; md5 is the cost — swap xxhash64 in prod for ~3×",
    )

    def bootstrap_stress():
        from pyspark.sql import functions as SF

        cdf = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
               0.9810118431238463, 0.9963401531726563, 0.9994058151824183]
        base = events.select(
            "etype", (F.xxhash64("event_id") % 10000).alias("c")
        )

        def u(b):
            return (
                (F.xxhash64(F.concat(F.lit(f"pb:{b}:"), F.col("c").cast("string")))
                 % 1_000_000_003 + 1_000_000_003) % 1_000_000_003
            ) / 1_000_000_003.0

        def w(b):
            expr = F.lit(6)
            for k in range(len(cdf) - 1, -1, -1):
                expr = F.when(u(b) < F.lit(cdf[k]), F.lit(k)).otherwise(expr)
            return expr

        aggs = []
        for b in range(32):
            aggs.append(F.sum(w(b) * F.col("c")).alias(f"s{b}"))
        (
            base.groupBy("etype").agg(*aggs)
            .write.format("noop").mode("overwrite").save()
        )

    timed(
        "Poisson bootstrap, 32 replicates (20M rows, xxhash64 weights)",
        20_000_000,
        bootstrap_stress,
        "64 conditional sums in ONE aggregate; md5→xxhash64 swap is the prod path",
    )

    # ---- round-7 monitor shapes (VERDICT r04 #8) -------------------------

    def psi_stress():
        # PSI core: reference-half decile cuts from distinct-value cumulative
        # counts, then ONE pass bucketing both halves against the broadcast
        # 9-value boundary arrays (mirrors plans/timeseries.q_psi_drift).
        from pyspark.sql import Window as W

        cents = events.select(
            "etype",
            (F.col("event_id") % 2).alias("half"),
            (F.col("value") * 100).cast("bigint").alias("c"),
        )
        refv = (
            cents.filter(F.col("half") == 0)
            .groupBy("etype", "c")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        )
        wc = W.partitionBy("etype").orderBy("c").rowsBetween(W.unboundedPreceding, 0)
        wt = W.partitionBy("etype")
        cum = refv.select(
            "etype", "c", F.sum("n").over(wc).alias("r"), F.sum("n").over(wt).alias("t")
        )
        cuts = (
            cum.select(
                "etype",
                "c",
                "r",
                "t",
                F.explode(F.sequence(F.lit(1), F.lit(9))).alias("k"),
            )
            .filter(F.col("r") >= F.ceil(F.col("k") * F.col("t") / 10).cast("bigint"))
            .groupBy("etype", "k")
            .agg(F.min("c").alias("cut"))
            .groupBy("etype")
            .agg(F.sort_array(F.collect_list("cut")).alias("cuts"))
        )
        bucketed = (
            cents.join(F.broadcast(cuts), "etype")
            .select(
                "etype",
                "half",
                F.aggregate(
                    "cuts",
                    F.lit(0),
                    lambda acc, cut: acc + F.when(F.col("c") >= cut, 1).otherwise(0),
                ).alias("bucket"),
            )
            .groupBy("etype", "half", "bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        bucketed.write.format("noop").mode("overwrite").save()

    timed(
        "PSI drift monitor (20M events, per-type reference deciles)",
        20_000_000,
        psi_stress,
        "decile cuts on the distinct-value frame; one bucketing pass, broadcast cuts",
    )

    def seasonal_anomaly_stress():
        # Seasonal-adjusted anomaly core: daily aggregate -> day-of-week
        # median detrend -> MAD z-score (mirrors q_seasonal_anomaly: all
        # windows run on the CALENDAR-sized daily frame).
        from pyspark.sql import Window as W

        daily = (
            events.groupBy("etype", F.to_date("ts").alias("day"))
            .agg(F.sum((F.col("value") * 100).cast("bigint")).alias("cents"))
        )
        wdow = W.partitionBy("etype", F.dayofweek("day"))
        med = daily.withColumn(
            "dow_med", F.expr("percentile(cents, 0.5)").over(wdow)
        ).withColumn("resid", F.col("cents") - F.col("dow_med"))
        wt = W.partitionBy("etype")
        mad = med.withColumn(
            "mad", F.expr("percentile(abs(resid), 0.5)").over(wt)
        ).select(
            "etype",
            "day",
            (F.col("resid") / (F.lit(1.4826) * F.col("mad"))).alias("z"),
        )
        mad.filter(F.abs("z") > 3).write.format("noop").mode("overwrite").save()

    timed(
        "seasonal-adjusted anomaly monitor (20M events -> daily MAD z)",
        20_000_000,
        seasonal_anomaly_stress,
        "one daily aggregate crosses the shuffle; all windows on the calendar frame",
    )

    def ltv_stress():
        # Cohort LTV curve core: first-seen day per user, weekly cohort
        # revenue, cumulative over week offsets (mirrors q_cohort_ltv_curve:
        # two user-keyed shuffles + windows on the cohort-week frame).
        from pyspark.sql import Window as W

        first = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("c0"))
        rev = (
            events.join(first, "user_id")
            .select(
                F.date_trunc("week", "c0").cast("date").alias("cw"),
                (F.datediff(F.to_date("ts"), F.col("c0")) / 7)
                .cast("bigint")
                .alias("wk"),
                (F.col("value") * 100).cast("bigint").alias("cents"),
            )
            .groupBy("cw", "wk")
            .agg(F.sum("cents").alias("wk_cents"))
        )
        wcum = W.partitionBy("cw").orderBy("wk").rowsBetween(W.unboundedPreceding, 0)
        rev.withColumn("cum", F.sum("wk_cents").over(wcum)).write.format(
            "noop"
        ).mode("overwrite").save()

    timed(
        "cohort LTV curves (20M events, 1M users)",
        20_000_000,
        ltv_stress,
        "two user-keyed shuffles; cumulative windows on the cohort-week frame",
    )

    def copy_matrix_stress():
        # Cross-source copy matrix core: 8-gram shingle -> (source-pair)
        # overlap counts via group-then-enumerate on the shingle bucket
        # (mirrors q_source_copy_matrix: never a doc-pair self-join).
        sh = docs2.select(
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, 53), "
                    "i -> xxhash64(concat_ws(' ', slice(split(text, ' '), i, 8))))"
                )
            ).alias("h"),
        )
        per_src = sh.groupBy("h").agg(
            F.collect_set("source").alias("srcs")
        )
        pairs = per_src.select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (a, i) -> "
                    "transform(slice(srcs, i + 2, size(srcs)), b -> struct(a, b))))"
                )
            ).alias("p")
        ).groupBy("p.a", "p.b").agg(F.count(F.lit(1)).alias("shared"))
        pairs.write.format("noop").mode("overwrite").save()

    timed(
        "cross-source copy matrix (1M docs, 20 sources, 8-gram shingles)",
        n_docs2,
        copy_matrix_stress,
        "one shingle shuffle; pair enumeration bounded by sources-per-shingle",
    )

    def boilerplate_stress():
        # CCNet-style segment dedup core: 10-token segments, df>=2 segment
        # set broadcast back (mirrors plans/curation.q_boilerplate_segments)
        tk = F.split(F.trim("text"), r"\s+")
        segs = docs2.select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.ceil(F.size(tk) / 10.0).cast("bigint")),
                    lambda i: F.xxhash64(
                        F.concat_ws(" ", F.slice(tk, (i - 1) * 10 + 1, 10))
                    ),
                )
            ).alias("seg"),
        )
        freq = segs.groupBy("seg").agg(
            F.countDistinct("doc_id").cast("bigint").alias("dfreq")
        )
        boiler = freq.filter(F.col("dfreq") >= 2).select("seg")
        (
            segs.join(F.broadcast(boiler), "seg", "semi")
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_boiler_instances"))
            .write.format("noop").mode("overwrite").save()
        )

    timed(
        "boilerplate segment dedup (1M docs x 6 segments)",
        n_docs2,
        boilerplate_stress,
        "one segment-hash shuffle; df>=2 heavy-hitter set broadcast back",
    )

    def phash_dedup_stress():
        # banded-pHash image near-dup at 200k REAL PNG encode+decode round
        # trips (mirrors q_multimodal_phash_dedup: Arrow-batched stdlib
        # codec, 4×16-bit bands, capped group-then-enumerate, exact Hamming
        # verify)
        from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
            _pairs_within,
        )
        from arc_maskdata_pipeline_plugin_spark.operators.multimodal import (
            attach_png_payload_grouped,
            perceptual_hash_images,
        )

        ids = spark.range(0, 200_000, 1, sc.defaultParallelism * 2).select(
            F.col("id").alias("doc_id")
        )
        ph = (
            perceptual_hash_images(attach_png_payload_grouped(ids))
            .select("doc_id", F.col("phash_bits").alias("bits"))
            .persist()
        )
        bands = ph.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
            "bits",
        ).select(
            "doc_id", "band", F.expr("substr(bits, band * 16 + 1, 16)").alias("key")
        )
        cand = (
            bands.groupBy("band", "key")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter((F.size("ids") > 1) & (F.size("ids") <= 256))
            .select(F.explode(_pairs_within(F.col("ids"))).alias("p"))
            .select(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
            .distinct()
        )
        p1 = ph.select(F.col("doc_id").alias("d1"), F.col("bits").alias("b1"))
        p2 = ph.select(F.col("doc_id").alias("d2"), F.col("bits").alias("b2"))
        (
            cand.join(p1, "d1")
            .join(p2, "d2")
            .withColumn(
                "hamming",
                F.expr(
                    "size(filter(sequence(1, 64), i -> substr(b1, i, 1) != substr(b2, i, 1)))"
                ),
            )
            .filter(F.col("hamming") <= 6)
            .agg(F.count(F.lit(1)))
            .write.format("noop").mode("overwrite").save()
        )
        spark.catalog.clearCache()

    timed(
        "banded-pHash image near-dup (200k real PNG decode round trips)",
        200_000,
        phash_dedup_stress,
        "decode+hash ride the scan; capped bucket enumeration; exact Hamming verify",
    )

    def phash_viral_stress():
        # ADVERSARIAL corpus for the q_multimodal_phash_dedup cap (VERDICT
        # r05 #2): 1.2M hashes where a 400k-member class is bit-identical
        # (the boilerplate-image shape that produced the 78M-pair/463s
        # blowup in r05's generator incident). Uncapped, its four band
        # buckets alone enumerate 4×C(400k,2) ≈ 3.2e11 pairs; with the
        # production cap (256) they are dropped-and-audited and the run is
        # bounded by the organic buckets. PNG decode is skipped — this row
        # isolates the JOIN hazard, the decode cost is the row above.
        from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
            _pairs_within,
        )

        n = 1_200_000
        ids = spark.range(0, n, 1, sc.defaultParallelism * 2)
        bits = F.when(
            F.col("id") % 3 == F.lit(0), F.lit("0" * 64)  # viral class
        ).otherwise(
            F.expr("lpad(bin(abs(xxhash64(cast(id as string)))), 64, '0')")
        )
        ph = ids.select(F.col("id").alias("doc_id"), bits.alias("bits")).persist()
        bands = ph.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
            "bits",
        ).select(
            "doc_id", "band", F.expr("substr(bits, band * 16 + 1, 16)").alias("key")
        )
        cand = (
            bands.groupBy("band", "key")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter((F.size("ids") > 1) & (F.size("ids") <= 256))
            .select(F.explode(_pairs_within(F.col("ids"))).alias("p"))
            .select(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
            .distinct()
        )
        p1 = ph.select(F.col("doc_id").alias("d1"), F.col("bits").alias("b1"))
        p2 = ph.select(F.col("doc_id").alias("d2"), F.col("bits").alias("b2"))
        (
            cand.join(p1, "d1")
            .join(p2, "d2")
            .withColumn(
                "hamming",
                F.expr(
                    "size(filter(sequence(1, 64), i -> substr(b1, i, 1) != substr(b2, i, 1)))"
                ),
            )
            .filter(F.col("hamming") <= 6)
            .agg(F.count(F.lit(1)))
            .write.format("noop").mode("overwrite").save()
        )
        spark.catalog.clearCache()

    timed(
        "banded-pHash VIRAL class (1.2M hashes, 400k bit-identical, cap=256)",
        1_200_000,
        phash_viral_stress,
        "uncapped would enumerate ~3.2e11 pairs; cap drops+audits the 4 viral buckets",
    )

    def semdedup_viral_stress():
        # ADVERSARIAL corpus for the q_semdedup cap: 1.12M vectors, 600k of
        # them COLLAPSED (identical embeddings in one cell — the degenerate
        # class of a web corpus) plus 2048 healthy ~256-member cells.
        # Uncapped, the collapsed cell alone is C(600k,2) ≈ 1.8e11 cosine
        # pairs; the broadcast eligible-cell filter prunes it BEFORE the
        # join, so wall-time is bounded by the ~67M healthy-cell pairs.
        from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
            _dot,
            with_norm,
        )

        n_healthy, n_viral, n_cells, cap = 524_288, 600_000, 2048, 512
        healthy = spark.range(
            0, n_healthy, 1, sc.defaultParallelism * 2
        ).select(
            F.col("id").alias("vec_id"),
            (F.col("id") % n_cells).alias("cell"),
            F.array(
                *[
                    (
                        F.pmod(
                            F.xxhash64(F.col("id").cast("string"), F.lit(i)),
                            F.lit(1000),
                        )
                        / 1000.0
                    ).cast("float")
                    for i in range(8)
                ]
            ).alias("embedding"),
        )
        viral = spark.range(
            n_healthy, n_healthy + n_viral, 1, sc.defaultParallelism * 2
        ).select(
            F.col("id").alias("vec_id"),
            F.lit(-1).cast("bigint").alias("cell"),
            F.array(*[F.lit(0.5).cast("float")] * 8).alias("embedding"),
        )
        m = with_norm(healthy.unionByName(viral)).persist()
        members = m.groupBy("cell").agg(F.count(F.lit(1)).alias("n_members"))
        eligible = F.broadcast(
            members.filter(F.col("n_members") <= cap).select("cell")
        )
        m_ok = m.join(eligible, "cell")
        x, y = m_ok.alias("x"), m_ok.alias("y")
        cos = _dot(F.col("x.embedding"), F.col("y.embedding")) / (
            F.col("x._norm") * F.col("y._norm")
        )
        (
            x.join(
                y,
                (F.col("x.cell") == F.col("y.cell"))
                & (F.col("x.vec_id") < F.col("y.vec_id")),
            )
            .filter(cos >= 0.98)
            .agg(F.count(F.lit(1)))
            .write.format("noop").mode("overwrite").save()
        )
        spark.catalog.clearCache()

    timed(
        "SemDeDup VIRAL cell (1.12M vecs, 600k collapsed, cap=512)",
        1_124_288,
        semdedup_viral_stress,
        "uncapped collapsed cell = 1.8e11 pairs; broadcast eligible filter prunes pre-join",
    )

    def lpa_stress():
        # synchronous label propagation (mirrors q_label_propagation):
        # 8M symmetric edges / 500k nodes, 4 rounds of co-partitioned join
        # + (node,label) count + map-side max_by argmax, localCheckpoint
        # per round
        n_half, n_nodes = 4_000_000, 500_000
        raw = (
            spark.range(0, n_half, 1, sc.defaultParallelism * 2)
            .select(
                (F.col("id") % n_nodes).alias("src"),
                F.pmod(F.xxhash64(F.col("id").cast("string")), F.lit(n_nodes)).alias(
                    "dst"
                ),
            )
            .filter(F.col("src") != F.col("dst"))
        )
        edges = (
            raw.union(raw.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
            .repartition("src")
            .persist()
        )
        labels = (
            edges.select(F.col("src").alias("node"))
            .distinct()
            .select("node", F.col("node").alias("lbl"))
        )
        for _ in range(4):
            counts = (
                edges.join(labels, edges.src == labels.node)
                .groupBy(F.col("dst").alias("n2"), "lbl")
                .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            )
            labels = (
                counts.groupBy(F.col("n2").alias("node"))
                .agg(F.expr("max_by(lbl, struct(c, -lbl))").alias("lbl"))
                .localCheckpoint(eager=False)
            )
        (
            labels.groupBy("lbl")
            .agg(F.count(F.lit(1)))
            .agg(F.count(F.lit(1)))
            .write.format("noop").mode("overwrite").save()
        )
        spark.catalog.clearCache()

    timed(
        "label propagation, 4 sync rounds (8M edges, 500k nodes)",
        8_000_000,
        lpa_stress,
        "edges shuffled once + persisted; 2 shuffles/round; max_by argmax",
    )

    def consistent_hash_stress():
        # consistent-hash shard assignment + 8->9 rebalance audit (mirrors
        # q_consistent_hash_shards) at 5M docs: both rings are 128/144-row
        # broadcast literals; the clockwise argmin is a map-side min_by
        d5 = spark.range(0, 5_000_000, 1, sc.defaultParallelism * 2).select(
            F.col("id").alias("doc_id"),
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 12), 16, 10)
            .cast("bigint")
            .alias("pos"),
        )

        def ring(n_shards):
            return (
                spark.range(n_shards)
                .select(F.col("id").alias("shard"))
                .crossJoin(spark.range(16).select(F.col("id").alias("vnode")))
                .select(
                    "shard",
                    "vnode",
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":",
                                    F.col("shard").cast("string"),
                                    F.col("vnode").cast("string"),
                                )
                            ),
                            1,
                            12,
                        ),
                        16,
                        10,
                    )
                    .cast("bigint")
                    .alias("rpos"),
                )
            )

        def assign(ring_df, out_name):
            dist = F.when(
                F.col("rpos") >= F.col("pos"), F.col("rpos") - F.col("pos")
            ).otherwise(F.col("rpos") - F.col("pos") + (1 << 48))
            return (
                d5.crossJoin(F.broadcast(ring_df))
                .select("doc_id", "shard", "vnode", dist.alias("dist"))
                .groupBy("doc_id")
                .agg(
                    F.expr("min_by(shard, struct(dist, shard, vnode))").alias(
                        out_name
                    )
                )
            )

        a = assign(ring(8), "shard")
        b = assign(ring(9), "shard_b")
        (
            a.join(b, "doc_id")
            .groupBy("shard")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(
                    F.when(F.col("shard") != F.col("shard_b"), 1).otherwise(0)
                ).alias("n_moved"),
            )
            .write.format("noop").mode("overwrite").save()
        )

    timed(
        "consistent-hash shards + 8->9 rebalance audit (5M docs)",
        5_000_000,
        consistent_hash_stress,
        "two broadcast rings on one scan; map-side min_by; one doc-keyed join",
    )

    def epoch_shuffle_stress():
        # epoch-deterministic reshuffle audit (mirrors q_epoch_shuffle) at
        # 20M docs: md5(epoch, doc_id) shard is a pure projection; one
        # (epoch, shard) aggregate + one co-partitioned doc self-join
        d20 = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            F.col("id").alias("doc_id")
        )
        asg = d20.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(1))).alias("epoch"),
        ).select(
            "doc_id",
            "epoch",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("epoch").cast("string"),
                                F.col("doc_id").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % 64
            ).alias("shard"),
        )
        sizes = asg.groupBy("epoch", "shard").agg(F.count(F.lit(1)).alias("n"))
        a = asg.filter(F.col("epoch") == 0).select(
            "doc_id", F.col("shard").alias("s0")
        )
        b = asg.filter(F.col("epoch") == 1).select(
            "doc_id", F.col("shard").alias("s1")
        )
        overlap = a.join(b, "doc_id").agg(
            F.sum(F.when(F.col("s0") == F.col("s1"), 1).otherwise(0)).alias(
                "n_same"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        sizes.crossJoin(F.broadcast(overlap)).write.format("noop").mode(
            "overwrite"
        ).save()

    timed(
        "epoch-deterministic reshuffle audit (20M docs, 2 epochs, 64 shards)",
        20_000_000,
        epoch_shuffle_stress,
        "shard is a pure md5 projection; one agg + one doc-keyed self-join",
    )

    def perplexity_stress():
        # unigram-LM scoring core (mirrors q_perplexity_filter): 60M token
        # explode -> vocab count -> broadcast LM -> doc-grain NLL aggregate
        tok = docs2.select(
            "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("w")
        )
        lm = (
            tok.groupBy("w")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .persist()
        )
        consts = lm.agg(
            F.sum("c").cast("bigint").alias("n"),
            F.count(F.lit(1)).cast("bigint").alias("v"),
        )
        lp = lm.crossJoin(F.broadcast(consts)).select(
            "w",
            F.floor(
                F.log((F.col("c") + 1.0) / (F.col("n") + F.col("v")))
                * 1_000_000_000
            )
            .cast("bigint")
            .alias("lp9"),
        )
        (
            tok.join(F.broadcast(lp), "w")
            .groupBy("doc_id")
            .agg(
                F.floor(-F.sum("lp9") / (F.count(F.lit(1)) * 1000.0))
                .cast("bigint")
                .alias("nll_fp6")
            )
            .write.format("noop").mode("overwrite").save()
        )
        spark.catalog.clearCache()

    timed(
        "unigram perplexity scoring (1M docs, 60M tokens)",
        n_docs2,
        perplexity_stress,
        "vocab-sized LM broadcast; one token shuffle + one doc aggregate",
    )

    def ks_stress():
        # two-sample KS core (mirrors q_ks_test): 20M rows, 100k distinct
        # values -> distinct-value count frame -> cumulative + total windows
        vals = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            ((F.col("id") * 2654435761) % 100_000).alias("v"),
            (F.col("id") % 2).alias("grp"),
            # group-1 values shifted: a real distribution difference
            (((F.col("id") * 2654435761) + (F.col("id") % 2) * 7919) % 100_000
             ).alias("v2"),
        )
        vc = vals.select(
            F.when(F.col("grp") == 0, F.col("v")).otherwise(F.col("v2")).alias("v"),
            "grp",
        ).groupBy("v").agg(
            F.sum(F.when(F.col("grp") == 0, 1).otherwise(0)).alias("a"),
            F.sum(F.when(F.col("grp") == 1, 1).otherwise(0)).alias("b"),
        )
        from pyspark.sql import Window as W

        w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
        wall = W.partitionBy()
        cum = vc.select(
            F.sum("a").over(w).alias("ca"),
            F.sum("b").over(w).alias("cb"),
            F.sum("a").over(wall).alias("n"),
            F.sum("b").over(wall).alias("m"),
        )
        cum.groupBy("n", "m").agg(
            F.max(
                F.abs(
                    F.col("ca").cast("decimal(38,0)") * F.col("m")
                    - F.col("cb").cast("decimal(38,0)") * F.col("n")
                )
            ).alias("d")
        ).write.format("noop").mode("overwrite").save()

    timed(
        "two-sample KS test (20M rows, 100k distinct values)",
        20_000_000,
        ks_stress,
        "corpus collapses to the 100k-value frame in ONE shuffle; windows run there",
    )

    def cdc_stress():
        # CDC changelog apply core (mirrors q_cdc_apply): 20M changes over a
        # 5M-key base; last-writer window + keyed join, both on the key
        base = spark.range(0, 5_000_000, 1, sc.defaultParallelism * 4).select(
            F.col("id").alias("k"), (F.col("id") % 997).cast("double").alias("bal")
        )
        chg = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            (F.col("id") % 5_000_000).alias("k"),
            F.col("id").alias("seq"),
            F.when((F.col("id") % 31) == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
            (F.col("id") % 1009).cast("double").alias("new_bal"),
        )
        from pyspark.sql import Window as W

        latest = (
            chg.withColumn(
                "rn", F.row_number().over(W.partitionBy("k").orderBy(F.desc("seq")))
            )
            .filter(F.col("rn") == 1)
            .select("k", "op", "new_bal")
        )
        base.join(latest, "k", "left").agg(
            F.sum((F.col("op") == "D").cast("int")).alias("n_del"),
            F.sum(
                F.when(F.col("op").isNull() | (F.col("op") == "U"), 1)
            ).alias("n_live"),
        ).write.format("noop").mode("overwrite").save()

    timed(
        "CDC changelog apply (20M changes -> 5M-key base)",
        20_000_000,
        cdc_stress,
        "last-writer row_number + apply join share the key; per-key state only",
    )

    def url_stress():
        # URL canonicalization dedup core (mirrors q_url_canonical_dedup):
        # 20M messy URLs -> regex canonical form -> one group-by
        urls = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            F.col("id"),
            F.concat(
                F.when(F.col("id") % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
                F.lit("://Host"),
                (F.col("id") % 4096).cast("string"),
                F.lit(".Example.COM"),
                F.when(F.col("id") % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
                F.lit("/p/"),
                (F.col("id") % 65536).cast("string"),
                F.when(F.col("id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
                F.when(
                    F.col("id") % 2 == 0, F.lit("?utm_source=feed&ref=rss")
                ).otherwise(F.lit("")),
                F.when(F.col("id") % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
            ).alias("u"),
        )
        scheme = F.lower(F.regexp_extract("u", r"^([A-Za-z]+)://", 1))
        host = F.regexp_replace(
            F.lower(F.regexp_extract("u", r"^[A-Za-z]+://([^/?#]+)", 1)),
            r":443$",
            "",
        )
        path = F.regexp_replace(
            F.regexp_extract("u", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1), r"/$", ""
        )
        q = F.regexp_replace(
            F.regexp_replace(
                F.regexp_extract("u", r"\?([^#]*)", 1), r"utm_[^&]*&?", ""
            ),
            r"&$",
            "",
        )
        urls.select(
            F.concat(
                scheme, F.lit("://"), host, path,
                F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
            ).alias("c")
        ).groupBy("c").agg(F.count(F.lit(1)).alias("n")).filter(
            F.col("n") > 1
        ).write.format("noop").mode("overwrite").save()

    timed(
        "URL canonicalization dedup (20M messy URLs)",
        20_000_000,
        url_stress,
        "pure regex projection + one canonical-key group-by; no join, no window",
    )

    def adamic_adar_viral_stress():
        # ADVERSARIAL: one mega-order with 50k suppliers would enumerate
        # C(50k,2) = 1.25e9 pairs uncapped; the degree cap drops it before
        # the explode and the audit column reports it. Organic orders (2M x
        # <=3 suppliers) flow through: ~4M pairs.
        li = spark.range(0, 6_000_000, 1, sc.defaultParallelism * 4).select(
            F.when(F.col("id") < 50_000, F.lit(0))
            .otherwise((F.col("id") % 2_000_000) + 1)
            .alias("o"),
            F.when(F.col("id") < 50_000, F.col("id"))
            .otherwise(F.col("id") % 4096)
            .alias("s"),
        ).distinct()
        grp = li.groupBy("o").agg(F.sort_array(F.collect_set("s")).alias("a"))
        dropped = grp.agg(
            F.sum((F.size("a") > 32).cast("int")).alias("dropped_orders")
        )
        pairs_expr = (
            "flatten(transform(sequence(1, size(a) - 1), i -> "
            "transform(sequence(i + 1, size(a)), j -> "
            "struct(element_at(a, CAST(i AS INT)) AS s1, "
            "element_at(a, CAST(j AS INT)) AS s2))))"
        )
        w = F.floor(1_000_000_000.0 / F.log(F.size("a").cast("double")))
        p = (
            grp.filter((F.size("a") >= 2) & (F.size("a") <= 32))
            .select(w.alias("w"), F.explode(F.expr(pairs_expr)).alias("pr"))
            .select("w", F.col("pr.s1").alias("s1"), F.col("pr.s2").alias("s2"))
        )
        p.groupBy("s1", "s2").agg(
            F.count(F.lit(1)).alias("n_common"), F.sum("w").alias("aa")
        ).crossJoin(F.broadcast(dropped)).orderBy(
            F.desc("aa"), "s1", "s2"
        ).limit(20).write.format("noop").mode("overwrite").save()

    timed(
        "Adamic-Adar VIRAL mega-order (6M edge rows, one 50k-supplier order, cap=32)",
        6_000_000,
        adamic_adar_viral_stress,
        "ADVERSARIAL: uncapped = 1.25e9 pairs from one order; degree cap drops+audits it; organic pairs array-local, no self-join",
    )

    def geo_stress():
        # grid-cell proximity join core (mirrors q_geo_proximity_join):
        # 20M points vs 100k points, 1-degree cells, 3x3 neighborhood on
        # the smaller side, exact haversine verify on candidates
        big = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            F.col("id").alias("cid"),
            (((F.col("id") * 2654435761) % 1700000) / 10000.0 - 85.0).alias("lat"),
            (((F.col("id") * 40503) % 3600000) / 10000.0 - 180.0).alias("lon"),
        ).withColumn("cell_lat", F.floor("lat")).withColumn(
            "cell_lon", F.floor("lon")
        )
        small = spark.range(0, 100_000, 1, sc.defaultParallelism).select(
            F.col("id").alias("sid"),
            ((((F.col("id") * 97 + 13) * 2654435761) % 1700000) / 10000.0 - 85.0
             ).alias("slat"),
            ((((F.col("id") * 97 + 13) * 40503) % 3600000) / 10000.0 - 180.0
             ).alias("slon"),
        )
        s9 = small.select(
            "sid", "slat", "slon",
            F.explode(F.expr(
                "flatten(transform(sequence(-1, 1), i -> "
                "transform(sequence(-1, 1), j -> "
                "struct(CAST(floor(slat) + i AS BIGINT) AS cell_lat, "
                "CAST(floor(slon) + j AS BIGINT) AS cell_lon))))"
            )).alias("cell"),
        ).select("sid", "slat", "slon", "cell.cell_lat", "cell.cell_lon")
        hav = (
            "2.0 * 6371000.0 * asin(sqrt("
            "pow(sin(radians(slat - lat) / 2), 2)"
            " + cos(radians(lat)) * cos(radians(slat))"
            " * pow(sin(radians(slon - lon) / 2), 2)))"
        )
        (
            big.join(s9, ["cell_lat", "cell_lon"])
            .selectExpr(f"{hav} AS dist_m")
            .agg(
                F.count(F.lit(1)).alias("n_cand"),
                F.sum((F.col("dist_m") <= 100_000).cast("int")).alias("n_in"),
            )
            .write.format("noop").mode("overwrite").save()
        )

    timed(
        "geo proximity join (20M x 100k points, 1-degree cells)",
        20_000_000,
        geo_stress,
        "cell-bucketed spatial join; 9x replication on the 100k side; haversine verify per candidate",
    )

    def kmv_stress():
        # KMV sketch + merge witness core (mirrors q_kmv_distinct_merge):
        # 20M events, 5M distinct users, 30 days; k=64 per-day sketches
        from pyspark.sql import Window as W

        ud = events.select(
            F.to_date("ts").alias("day"), "user_id"
        ).distinct()
        hv = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))),
                    1, 12,
                ), 16, 10,
            ).cast("bigint") + 1
        )
        h = ud.select("day", hv.alias("hv"))
        daily = (
            h.withColumn("rn", F.row_number().over(W.partitionBy("day").orderBy("hv")))
            .filter(F.col("rn") <= 64)
            .select("hv")
        )
        (
            daily.distinct().orderBy("hv").limit(64)
            .agg(F.expr("17732923532771328 div max(hv)").alias("est"))
            .write.format("noop").mode("overwrite").save()
        )

    timed(
        "KMV distinct sketch, daily merge (20M events, 5M users)",
        20_000_000,
        kmv_stress,
        "one (day,user) distinct shuffle; day-partitioned top-k windows; merge is (k*days)-sized",
    )

    def rake_stress():
        # RAKE core (mirrors q_rake_keywords): 40M-token stream over 1M
        # docs, every 5th position a stopword boundary -> islands ->
        # doc-partitioned phrase window -> one word shuffle
        tok = spark.range(0, 40_000_000, 1, sc.defaultParallelism * 4).select(
            (F.col("id") % 1_000_000).alias("doc_id"),
            F.expr("id div 1000000").alias("p"),
            F.concat(F.lit("w"), ((F.col("id") * 2654435761) % 5000).cast("string")).alias("tok"),
            ((F.col("id") % 5) == 0).alias("is_stop"),
        )
        from pyspark.sql import Window as W

        nonstop = tok.filter(~F.col("is_stop")).withColumn(
            "run",
            F.col("p") - F.row_number().over(W.partitionBy("doc_id").orderBy("p")),
        )
        ph = nonstop.select(
            "doc_id",
            "tok",
            F.count(F.lit(1)).over(W.partitionBy("doc_id", "run")).alias("phrase_len"),
        )
        ph.groupBy("tok").agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.col("phrase_len") - 1).alias("degree"),
        ).write.format("noop").mode("overwrite").save()

    timed(
        "RAKE keyword scores (1M docs, 40M tokens)",
        40_000_000,
        rake_stress,
        "islands window partitioned by doc; one word shuffle; no corpus joins",
    )

    def cooccur_viral_stress():
        # ADVERSARIAL item co-occurrence (mirrors q_item_cooccurrence): 5M
        # organic 4-item baskets PLUS one 50k-item viral basket. Uncapped,
        # the viral basket alone enumerates 1.25e9 pairs; the slice cap
        # bounds every basket at C(16,2)=120 pairs.
        organic = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            (F.col("id") % 5_000_000).alias("ok"),
            ((F.col("id") * 2654435761) % 200_000).alias("pk"),
        )
        viral = spark.range(0, 50_000, 1, 8).select(
            F.lit(9_999_999).alias("ok"), (F.col("id") + 500_000).alias("pk")
        )
        baskets = (
            organic.unionByName(viral)
            .groupBy("ok")
            .agg(F.slice(F.sort_array(F.collect_set("pk")), 1, 16).alias("parts"))
        )
        pairs = F.flatten(
            F.expr(
                "transform(parts, (x, i) -> "
                "transform(slice(parts, i + 2, size(parts)), y -> struct(x as p1, y as p2)))"
            )
        )
        baskets.select(F.explode(pairs).alias("pr")).groupBy(
            F.col("pr.p1"), F.col("pr.p2")
        ).count().write.format("noop").mode("overwrite").save()

    timed(
        "item co-occurrence VIRAL basket (20M lines, 5M baskets + one 50k-item basket, cap=16)",
        20_050_000,
        cooccur_viral_stress,
        "ADVERSARIAL: uncapped viral basket = 1.25e9 pairs; slice cap bounds every basket at 120 pairs, pair explode stays partition-local",
    )

    def hits_stress():
        # HITS core (mirrors q_hits_authorities): 8M distinct edges,
        # 500k hubs x 100k authorities, 4 normalized integer rounds
        edges = (
            spark.range(0, 8_000_000, 1, sc.defaultParallelism * 4)
            .select(
                ((F.col("id") * 2654435761) % 500_000).alias("c"),
                ((F.col("id") * 40503) % 100_000).alias("s"),
            )
            .distinct()
            .persist()
        )
        h = edges.select("c").distinct().select(
            "c", F.lit(1_000_000).cast("decimal(38,0)").alias("h")
        )
        a = None
        for _ in range(4):
            # checkpoint the RAW aggregate (q_hits_authorities discipline):
            # total + normalization both consume it, so checkpointing after
            # normalization would run the join+agg twice per half-step
            ar = edges.join(h, "c").groupBy("s").agg(
                F.sum("h").cast("decimal(38,0)").alias("a")
            ).localCheckpoint(eager=True)
            at = ar.agg(F.sum("a").cast("decimal(38,0)").alias("t"))
            a = ar.crossJoin(F.broadcast(at)).select(
                "s", F.expr("(a * 1000000) div t").cast("decimal(38,0)").alias("a")
            )
            hr = edges.join(a, "s").groupBy("c").agg(
                F.sum("a").cast("decimal(38,0)").alias("h")
            ).localCheckpoint(eager=True)
            ht = hr.agg(F.sum("h").cast("decimal(38,0)").alias("t"))
            h = hr.crossJoin(F.broadcast(ht)).select(
                "c", F.expr("(h * 1000000) div t").cast("decimal(38,0)").alias("h")
            )
        a.write.format("noop").mode("overwrite").save()
        edges.unpersist()

    timed(
        "HITS, 4 normalized integer rounds (8M edges, 600k nodes)",
        8_000_000,
        hits_stress,
        "edges shuffled once + persisted; 2 keyed aggregates + 2 scalar broadcasts per round; localCheckpoint bounds lineage",
    )

    def hilbert_stress():
        # Hilbert index (mirrors q_hilbert_layout): 20M points through the
        # 10-level unrolled projection chain + cluster aggregate
        from arc_maskdata_pipeline_plugin_spark.operators.layout import hilbert_df

        pts = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            ((F.col("id") * 2654435761) % 1024).alias("x"),
            ((F.col("id") * 40503) % 1024).alias("y"),
        )
        hilbert_df(pts, "x", "y", 10).groupBy(
            F.shiftright("hval", 14).alias("cluster_id")
        ).count().write.format("noop").mode("overwrite").save()

    timed(
        "Hilbert index, 10 unrolled levels (20M points)",
        20_000_000,
        hilbert_stress,
        "codegen-fused projection chain; one cluster aggregate; zero Python",
    )

    def ppjoin_viral_stress():
        # PPJoin prefix-filter dedup (mirrors dedup_ppjoin_pairs) with a
        # planted 50k-doc BOILERPLATE class: those docs are built from a
        # 6-token hot vocabulary (df ~58k) plus one shared 'boiler' token
        # (df 50k, the class's RAREST token -> guaranteed into every
        # prefix). Uncapped, the boiler bucket alone enumerates ~1.25e9
        # pairs; with the cap every template-class bucket drops (audited),
        # and the organic 50k twin pairs still surface through df<=2
        # buckets and verify at J=1.
        from pyspark.sql import Window  # noqa: F401 (operator pulls it)

        from arc_maskdata_pipeline_plugin_spark.operators.dedup import (
            ppjoin_candidate_pairs,
        )

        n_docs = 1_000_000
        docs = spark.range(0, n_docs, 1, sc.defaultParallelism * 4)
        base = F.when(
            F.col("id") % 20 == 1, F.col("id") - 1
        ).otherwise(F.col("id"))  # 50k identical organic twins (20i, 20i+1)
        is_viral = (F.col("id") % 20) == 2  # 50k template docs
        hot = [
            F.concat(F.lit("h"), ((base * 7 + j) % 6).cast("string"))
            for j in range(7)
        ]
        organic = [
            F.concat(
                F.lit("t"),
                ((base * 2654435761 + j * 40503) % 5_000_000).cast("string"),
            )
            for j in range(8)
        ]
        tokens = F.when(is_viral, F.array(F.lit("boiler"), *hot)).otherwise(
            F.array(*organic)
        )
        tok = docs.select(
            F.col("id").alias("doc_id"), F.explode(tokens).alias("shingle")
        ).distinct()
        cand = ppjoin_candidate_pairs(tok, max_token_bucket=64)
        sets = tok.groupBy("doc_id").agg(
            F.sort_array(F.collect_set("shingle")).alias("toks")
        )
        verified = (
            cand.join(
                sets.select(F.col("doc_id").alias("d1"), F.col("toks").alias("t1")),
                "d1",
            )
            .join(
                sets.select(F.col("doc_id").alias("d2"), F.col("toks").alias("t2")),
                "d2",
            )
            .filter(
                3 * F.size(F.array_intersect("t1", "t2"))
                >= F.size("t1") + F.size("t2")
            )
        )
        verified.write.format("noop").mode("overwrite").save()

    timed(
        "PPJoin VIRAL boilerplate class (1M docs, 50k-doc template, cap=64)",
        1_000_000,
        ppjoin_viral_stress,
        "ADVERSARIAL: uncapped boiler-token bucket = 1.25e9 candidate pairs; the cap drops every template bucket (audited) and the 50k organic twins verify exactly",
    )

    def markov_stress():
        # Markov transition matrix (mirrors q_markov_transitions): one
        # user-keyed window over 20M events, then the |types|^2 aggregate
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        nxt = (
            events.select("user_id", "ts", "event_id", "etype")
            .withColumn("next_type", F.lead("etype").over(w))
            .withColumn(
                "gap_us",
                F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts")),
            )
        )
        pairs = (
            nxt.filter(
                F.col("next_type").isNotNull()
                & (F.col("gap_us") <= 30 * 60 * 1_000_000)
            )
            .groupBy(F.col("etype").alias("prev_type"), "next_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        tot = Window.partitionBy("prev_type")
        pairs.select(
            "prev_type",
            "next_type",
            (F.col("n").cast("double") / F.sum("n").over(tot)).alias("prob"),
        ).write.format("noop").mode("overwrite").save()

    timed(
        "Markov transition matrix (20M events, 1M users)",
        n_events,
        markov_stress,
        "one user-keyed window shuffle; row totals from a window over the types^2 aggregate",
    )

    def kfold_stress():
        # Group-aware K-fold (mirrors q_group_kfold): one user-keyed
        # aggregate + user-sized audit, fold from the md5 uniform
        fold = (
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
            ).cast("bigint")
            % 5
        )
        uf = (
            events.select("user_id", (F.col("etype") == 4).cast("int").alias("label"))
            .withColumn("fold", fold)
            .groupBy("user_id", "fold")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("label").alias("npos"))
        )
        uf.groupBy("fold").agg(
            F.count(F.lit(1)), F.sum("n"), F.sum("npos")
        ).write.format("noop").mode("overwrite").save()

    timed(
        "group-aware K-fold split (20M events, 1M users)",
        n_events,
        kfold_stress,
        "md5 fold is a pure projection; one user-keyed map-side-combined aggregate",
    )

    def assortativity_stress():
        # degree assortativity (mirrors q_degree_assortativity) over an
        # 8M-edge graph with a planted hub (5% of edges on one node):
        # decorating joins key on node ids, so the hub is one heavy key in
        # a co-partitioned join, not a cross product
        e0 = (
            spark.range(0, 4_000_000, 1, sc.defaultParallelism * 4)
            .select(
                F.when(F.col("id") % 20 == 0, F.lit(7))
                .otherwise(F.col("id") % 500_000)
                .alias("src"),
                ((F.col("id") * 2654435761) % 500_000 + 500_000).alias("dst"),
            )
            .distinct()
        )
        edges = e0.unionAll(
            e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).persist()
        deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("d")
        )
        j = (
            edges.join(
                deg.select(F.col("node").alias("src"), F.col("d").alias("dx")), "src"
            )
            .join(
                deg.select(F.col("node").alias("dst"), F.col("d").alias("dy")), "dst"
            )
        )
        j.agg(
            F.count(F.lit(1)),
            F.sum(F.col("dx").cast("decimal(38,0)") * F.col("dy")),
            F.sum(F.col("dx").cast("decimal(38,0)")),
            F.sum(F.col("dx").cast("decimal(38,0)") * F.col("dx")),
        ).write.format("noop").mode("overwrite").save()
        edges.unpersist()

    timed(
        "degree assortativity (8M directed edges, 5%-hub skew)",
        8_000_000,
        assortativity_stress,
        "one degree aggregate + two node-keyed decorating joins + one moment aggregate; hub is a heavy join key, never a pair explosion",
    )

    def hamming_stress():
        # binary-embedding search (mirrors q_embedding_binarize_hamming):
        # pack 2M synthetic 64-dim vectors into two 32-bit sign words, rank
        # all of them against 16 broadcast queries by xor+popcount
        vecs = spark.range(0, 2_000_000, 1, sc.defaultParallelism * 4).select(
            F.col("id").alias("vec_id"),
            ((F.col("id") * 2654435761) % 4294967296).alias("w0"),
            ((F.col("id") * 40503 + 7) % 4294967296).alias("w1"),
        )
        q = vecs.filter(F.col("vec_id") < 16).select(
            F.col("vec_id").alias("query_id"),
            F.col("w0").alias("qw0"),
            F.col("w1").alias("qw1"),
        )
        from pyspark.sql import Window as W

        ham = (
            vecs.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != F.col("query_id"))
            .selectExpr(
                "query_id",
                "vec_id",
                "cast(bit_count(qw0 ^ w0) + bit_count(qw1 ^ w1) as bigint) AS h",
            )
        )
        w = W.partitionBy("query_id").orderBy("h", "vec_id")
        ham.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= 5
        ).write.format("noop").mode("overwrite").save()

    timed(
        "binary Hamming top-5, 16 queries x 2M packed vectors",
        32_000_000,
        hamming_stress,
        "16 B index state/vector; 2 xor+popcounts per candidate (vs a 64-term float dot); queries broadcast, scan never shuffles before the per-query top-k",
    )

    def maxsim_stress():
        # MaxSim late interaction (mirrors q_maxsim_late_interaction):
        # 500k-word vocab scored against 13 broadcast query tokens, then a
        # 20M-row (doc, word) frame joins the scored vocab and aggregates
        vocab = spark.range(0, 500_000, 1, sc.defaultParallelism * 4).select(
            F.col("id").alias("w"),
            ((F.col("id") * 2654435761) % 1_000_000).alias("sim_seed"),
        )
        qt = spark.range(0, 13).select(F.col("id").alias("qt"))
        scored = vocab.crossJoin(F.broadcast(qt)).select(
            "w", "qt", ((F.col("sim_seed") + F.col("qt") * 7919) % 1_000_000).alias("sim")
        )
        doc_words = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            (F.col("id") % 2_000_000).alias("doc_id"),
            ((F.col("id") * 40503) % 500_000).alias("w"),
        )
        per_tok = doc_words.join(scored, "w").groupBy("doc_id", "qt").agg(
            F.max("sim").alias("best")
        )
        per_tok.groupBy("doc_id").agg(F.sum("best").alias("maxsim")).write.format(
            "noop"
        ).mode("overwrite").save()

    timed(
        "MaxSim late interaction (20M doc-words, 500k vocab x 13 q-tokens)",
        20_000_000,
        maxsim_stress,
        "similarity matrix is vocab-sized (never corpus x tokens); corpus contributes one word-keyed join + two keyed aggregates",
    )

    def winnowing_stress():
        # mirrors q_winnowing_fingerprints: 200k docs x 100 k-gram hashes
        # (20M positions), w=4 window explode (80M window rows), rightmost-
        # min selection + per-doc gap/density aggregate — all doc-local
        from pyspark.sql import Window

        W_ = 4
        gpos = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            (F.col("id") % 200_000).alias("doc_id"),
            (F.expr("id div 200000") + 1).alias("p"),
            ((F.col("id") * 2654435761) % 4_294_967_296).alias("h"),
        )
        n_pos = 100
        win = gpos.select(
            "doc_id",
            "p",
            "h",
            F.explode(
                F.expr(
                    f"sequence(greatest(1, p - {W_ - 1}), least(p, {n_pos} - {W_ - 1}))"
                )
            ).alias("j"),
        )
        rm = Window.partitionBy("doc_id", "j").orderBy(F.asc("h"), F.desc("p"))
        sel = (
            win.withColumn("rn", F.row_number().over(rm))
            .filter(F.col("rn") == 1)
            .select("doc_id", "p", "h")
            .distinct()
        )
        sel.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_fp"), F.sum("h").alias("checksum")
        ).write.format("noop").mode("overwrite").save()

    timed(
        "winnowing fingerprints (200k docs x 100 grams, w=4 -> 80M window rows)",
        80_000_000,
        winnowing_stress,
        "doc-local: the w-way explode and rightmost-min windows shuffle by (doc, window) only; zero joins at any corpus size",
    )

    def stitch_stress():
        # mirrors q_doc_stitch_pairs: 20M slim (head_h, tail_h) edge rows,
        # hash-keyed self-join; ~200k planted stitches (1% of docs)
        edges = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("head_h"),
            F.when(
                F.col("id") % 100 == 0, F.md5((F.col("id") + 1).cast("string"))
            )
            .otherwise(F.md5((F.col("id") * 31 + 7_000_000_019).cast("string")))
            .alias("tail_h"),
        )
        a, b = edges.alias("ea"), edges.alias("eb")
        a.join(
            b,
            (F.col("ea.tail_h") == F.col("eb.head_h"))
            & (F.col("ea.doc_id") != F.col("eb.doc_id")),
        ).select(
            F.col("ea.doc_id").alias("l"), F.col("eb.doc_id").alias("r")
        ).write.format("noop").mode("overwrite").save()

    timed(
        "doc-stitch detection (20M edge rows self-joined on hash, ~200k hits)",
        20_000_000,
        stitch_stress,
        "shuffle bytes are O(docs x 32B hash rows), never the text; match rate controlled by the planted 1% boundary overlap",
    )

    # ---- round 9 cases ----------------------------------------------------

    # winnowing incremental store probe: the store is PREBUILT and persisted
    # (that's the design — per-increment cost ∝ batch); the timed section is
    # one increment: batch fingerprints -> semi probe -> >=2-hit drop.
    _winnow_label = (
        "winnowing incremental probe "
        "(100k-doc batch x 15 fps vs 30M-fp persisted store)"
    )
    _only = os.environ.get("STRESS_ONLY", "")
    _winnow_on = not _only or _only.lower() in _winnow_label.lower()
    winnow_store = None
    if _winnow_on:  # don't leave a stray 30M-row cache in filtered runs
        winnow_store = (
            spark.range(0, 30_000_000, 1, sc.defaultParallelism * 4)
            .select(((F.col("id") * 2654435761) % 4_294_967_296).alias("h"))
            .distinct()
            .persist()
        )
        winnow_store.count()

    def winnow_probe_stress():
        batch_fps = spark.range(
            0, 1_500_000, 1, sc.defaultParallelism * 2
        ).select(
            (F.col("id") % 100_000).alias("doc_id"),
            # every 5th fingerprint collides with the store's hash space;
            # the rest land in a disjoint range (fresh content)
            F.when(
                F.col("id") % 5 == 0,
                (F.col("id") * 2654435761) % 4_294_967_296,
            )
            .otherwise(F.lit(2**33) + F.col("id"))
            .alias("h"),
        )
        dup_ids = (
            batch_fps.join(winnow_store, "h", "semi")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
            .filter(F.col("n_hits") >= 2)
            .select("doc_id")
        )
        batch_fps.join(dup_ids, "doc_id", "left_anti").write.format(
            "noop"
        ).mode("overwrite").save()

    timed(
        _winnow_label,
        1_500_000,
        winnow_probe_stress,
        "per-increment cost ∝ batch: batch-only fingerprinting, hash-keyed semi probe of the store, anti join back",
    )
    if winnow_store is not None:
        winnow_store.unpersist()

    def bloom_index_stress():
        # mirrors q_bloom_skip_audit: 20M rows -> 64 files -> 3-position
        # bloom fan-out (60M rows) -> DISTINCT to the <=64x1024 bit frame;
        # 8 point-lookup keys probe it
        filed = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            (F.col("id") % 5_000_000).alias("ck"),
            F.expr("id div 312500").alias("file_id"),  # 64 equal files
        )
        fan = filed.select(
            "file_id",
            F.explode(
                F.array(
                    *(
                        ((F.xxhash64(F.lit(j), F.col("ck")) % 1024 + 1024) % 1024)
                        for j in range(3)
                    )
                )
            ).alias("pos"),
        )
        bloom = fan.distinct()
        keys = spark.range(0, 8).select(
            (F.col("id") * 991).alias("k")
        )
        kp = keys.select(
            "k",
            F.explode(
                F.array(
                    *(
                        ((F.xxhash64(F.lit(j), F.col("k")) % 1024 + 1024) % 1024)
                        for j in range(3)
                    )
                )
            ).alias("pos"),
        ).distinct()
        kcnt = kp.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        (
            kp.join(F.broadcast(kcnt), "k")
            .join(bloom, "pos")
            .groupBy("k", "file_id")
            .agg(F.count(F.lit(1)).alias("n_hit"), F.min("c").alias("c"))
            .filter(F.col("n_hit") == F.col("c"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n_files_pass"))
        ).write.format("noop").mode("overwrite").save()

    timed(
        "bloom file-skip index build + 8-key probe (20M rows, 64 files x 1024 bits)",
        20_000_000,
        bloom_index_stress,
        "one fact scan; the index collapses to a <=65k-row (file, bit) frame; probes broadcast",
    )

    def copy_direction_stress():
        # mirrors q_source_copy_direction on docs2: per-span min(doc, source)
        # origin is a hash AGG on the shingle bucket (viral spans cost one
        # combiner, never a pair join), then a source-grain directed rollup
        sh = docs2.select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(1, 53), "
                    "i -> xxhash64(concat_ws(' ', slice(split(text, ' '), i, 8))))"
                )
            ).alias("h"),
        )
        per_h = sh.groupBy("h").agg(
            F.min(F.struct("doc_id", "source")).alias("o"),
            F.collect_set("source").alias("srcs"),
        )
        (
            per_h.select(
                F.col("o.source").alias("origin"),
                F.explode("srcs").alias("source"),
            )
            .filter(F.col("source") != F.col("origin"))
            .groupBy("origin", "source")
            .agg(F.count(F.lit(1)).alias("n_copied"))
        ).write.format("noop").mode("overwrite").save()

    timed(
        "directed copy attribution (1M docs, 20 sources, 8-gram spans)",
        n_docs2,
        copy_direction_stress,
        "ONE shingle shuffle: fused per-span (origin, source-set) aggregate; directed rollup on the sources²-bounded grid",
    )

    def margin_mining_stress():
        # mirrors q_margin_mining_pairs: 32 queries x 1M corpus vectors x
        # 32 dims, ordered-fold cosines, rank-ordered margin denominator
        from pyspark.sql import Window

        dim = 32
        vec = F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (F.xxhash64(F.col("id"), i) % 1000).cast("double") / 1000.0,
        )
        corpus = spark.range(0, 1_000_000, 1, sc.defaultParallelism * 4).select(
            F.col("id").alias("vec_id"), vec.alias("v")
        )
        queries = spark.range(0, 32).select(
            (F.col("id") + 5_000_000).alias("qid"), vec.alias("qv")
        )
        dot = F.aggregate(
            F.zip_with(F.col("v"), F.col("qv"), lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored = corpus.crossJoin(F.broadcast(queries)).select(
            "qid", "vec_id", dot.alias("cos")
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
        top = scored.withColumn("rnk", F.row_number().over(w)).filter(
            F.col("rnk") <= 4
        )
        denom = top.groupBy("qid").agg(
            (
                F.aggregate(
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("rnk", "cos"))),
                        lambda s: s.cos,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / 4
            ).alias("d")
        )
        (
            top.filter("rnk = 1")
            .join(F.broadcast(denom), "qid")
            .select("qid", "vec_id", (F.col("cos") / F.col("d")).alias("margin"))
        ).write.format("noop").mode("overwrite").save()

    timed(
        "margin-based mining (32 queries x 1M vectors x 32 dims)",
        32_000_000,
        margin_mining_stress,
        "broadcast query set; corpus never shuffles before the per-query top-k; denominator folds in rank order",
    )

    def gen_lattice_stress():
        # mirrors q_generalization_advisor: 20M rows stacked across the
        # 9-node lattice (180M agg inputs) in ONE scan
        cust = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            (F.col("id") % 25).alias("nat"),
            (F.col("id") % 5).alias("reg"),
            (F.col("id") % 7).alias("seg"),
            ((F.col("id") * 7919) % 20000).cast("double").alias("bal"),
        )
        stack_args = ", ".join(
            f"{g}, {b}, {ge}, {be}"
            for g, ge in enumerate(
                ["cast(nat as string)", "cast(reg as string)", "'*'"]
            )
            for b, be in enumerate(
                [
                    "cast(cast(floor(bal / 1000) as bigint) as string)",
                    "cast(cast(floor(bal / 5000) as bigint) as string)",
                    "'*'",
                ]
            )
        )
        nodes = cust.selectExpr(
            f"stack(9, {stack_args}) AS (g, b, geo, bal_s)", "seg"
        )
        classes = nodes.groupBy("g", "b", "geo", "seg", "bal_s").agg(
            F.count(F.lit(1)).alias("n")
        )
        (
            classes.groupBy("g", "b").agg(
                F.count(F.lit(1)).alias("n_classes"),
                F.sum(F.when(F.col("n") < 5, F.col("n")).otherwise(0)).alias(
                    "suppressed"
                ),
            )
        ).write.format("noop").mode("overwrite").save()

    timed(
        "generalization lattice, 9 nodes (20M rows -> 180M stacked agg inputs)",
        20_000_000,
        gen_lattice_stress,
        "one scan, one class-grain map-side-combined aggregate for the WHOLE lattice — not 9 table scans",
    )

    # ---- Misra-Gries on a Zipf-ish 60M-token stream ----------------------
    # keys = floor(2^(id mod 26)) buckets give a heavy-tailed frequency
    # profile; two-level MG (8 arrival shards, k=16) vs exact truth.
    def mg_stress():
        from pyspark.sql import Window as W

        n = 60_000_000
        occ = spark.range(0, n, 1, sc.defaultParallelism * 4).select(
            (F.col("id") % 8).alias("shard"),
            # Zipf-ish: term t appears ~n/2^t times
            F.floor(F.log2(F.col("id") % 33_554_432 + 1)).alias("term"),
        )
        l1 = occ.groupBy("shard", "term").agg(
            F.count(F.lit(1)).alias("c")
        ).persist()
        wsh = W.partitionBy("shard").orderBy(F.desc("c"), F.asc("term"))
        ranked = l1.withColumn("rn", F.row_number().over(wsh))
        dp = ranked.groupBy("shard").agg(
            F.coalesce(F.max(F.when(F.col("rn") == 17, F.col("c"))), F.lit(0)).alias("d_p")
        )
        merged = (
            ranked.join(F.broadcast(dp), "shard")
            .select("term", (F.col("c") - F.col("d_p")).alias("e"))
            .filter(F.col("e") > 0)
            .groupBy("term")
            .agg(F.sum("e").alias("m"))
        )
        merged.write.format("noop").mode("overwrite").save()
        l1.unpersist()

    timed(
        "Misra-Gries heavy hitters (60M tokens, Zipf keys, 8 shards, k=16)",
        60_000_000,
        mg_stress,
        "one token shuffle to constant per-shard counters; truncation + merge on the counter frame",
    )

    # ---- Heaps first-seen decomposition at 1M docs -----------------------
    # the claim under stress: vocabulary-growth checkpoints WITHOUT a
    # token-level global sort — doc-offset cumsum (doc frame) + min-pos
    # aggregate (token shuffle) only.
    def heaps_stress():
        from pyspark.sql import Window as W

        n_docs = 1_000_000
        docs = spark.range(0, n_docs, 1, sc.defaultParallelism * 4).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 20).alias("src"),
            F.lit(60).alias("dl"),
        )
        pos = docs.select(
            "doc_id",
            "src",
            F.explode(F.sequence(F.lit(1), F.lit(60))).alias("p"),
        ).select(
            "doc_id",
            "src",
            "p",
            # word id: power-law-ish first occurrences spread over docs
            ((F.col("doc_id") * 60 + F.col("p")) % 500_000).alias("w"),
        )
        dmin = pos.groupBy("src", "doc_id", "w").agg(F.min("p").alias("mp"))
        woff = (
            W.partitionBy("src")
            .orderBy("doc_id")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        off = docs.select(
            "doc_id", F.coalesce(F.sum("dl").over(woff), F.lit(0)).alias("o")
        )
        # windowed frames have no size estimate → Spark would try to
        # broadcast the 1M-row offset frame and OOM the driver build;
        # at this scale the co-partitioned shuffle join IS the right plan
        fs = (
            dmin.join(off.hint("shuffle_hash"), "doc_id")
            .groupBy("src", "w")
            .agg(F.min(F.col("o") + F.col("mp")).alias("first_seen"))
        )
        fs.groupBy("src").agg(
            F.count(F.lit(1)), F.min("first_seen"), F.max("first_seen")
        ).write.format("noop").mode("overwrite").save()

    timed(
        "Heaps first-seen decomposition (1M docs x 60 tokens, 500k vocab)",
        60_000_000,
        heaps_stress,
        "doc-offset cumsum on the DOC frame + one (src, word) min aggregate — no token-level global sort",
    )

    # ---- padding-waste batch windows at 20M docs -------------------------
    def padding_stress():
        from pyspark.sql import Window as W

        n = 20_000_000
        d = spark.range(0, n, 1, sc.defaultParallelism * 4).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 64).alias("src"),
            (F.col("id") * 2654435761 % 2048 + 1).alias("tok"),
        )
        wl = W.partitionBy("src").orderBy("tok", "doc_id")
        b = d.withColumn("rn", F.row_number().over(wl)).select(
            "src", "tok", F.expr("CAST(rn - 1 AS BIGINT) div 16").alias("batch")
        )
        b.groupBy("src", "batch").agg(
            F.count(F.lit(1)).alias("nb"),
            F.max("tok").alias("mx"),
            F.sum("tok").alias("sm"),
        ).groupBy("src").agg(
            F.sum(F.col("nb") * F.col("mx") - F.col("sm")).alias("waste")
        ).write.format("noop").mode("overwrite").save()

    timed(
        "padding-waste audit, length-sorted policy (20M docs, 64 sources)",
        20_000_000,
        padding_stress,
        "per-source length sort (the same sort a bucketing loader performs) + two keyed aggregates",
    )

    # ---- two-phase global rank, persisted base (VERDICT r10 #6) ---------
    # The r10 STRESS row validated Σrank on the UNPERSISTED path — exactly
    # the configuration that hid the q_bloom_skip_audit double-evaluation
    # bug (offsets and stream each re-sampling range boundaries). These
    # rows run the SHIPPED path (global_rank persists `base`) and verify
    # the full permutation identity — Σrank = n(n+1)/2, n distinct ranks,
    # min 1 / max n — under both the session's partition count and the
    # stock 200-partition config the driver runs.
    def rank_persisted_stress(n_rows=20_000_000, parts_conf=None):
        from arc_maskdata_pipeline_plugin_spark.cache import release_persisted
        from arc_maskdata_pipeline_plugin_spark.plans.twophase import (
            global_rank,
        )

        old = spark.conf.get("spark.sql.shuffle.partitions")
        if parts_conf is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts_conf))
        try:
            d = spark.range(0, n_rows, 1, sc.defaultParallelism * 4).select(
                F.md5(F.col("id").cast("string")).alias("k"),
                F.col("id").alias("tie"),
            )
            r = global_rank(d, ["k", "tie"], out="rank")
            chk = r.agg(
                F.sum("rank").alias("s"),
                F.countDistinct("rank").alias("d"),
                F.min("rank").alias("lo"),
                F.max("rank").alias("hi"),
            ).first()
            assert chk["s"] == n_rows * (n_rows + 1) // 2, chk
            assert chk["d"] == n_rows and chk["lo"] == 1, chk
            assert chk["hi"] == n_rows, chk
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
            spark.catalog.clearCache()
            release_persisted()

    timed(
        "two-phase global rank, persisted base (20M rows, md5 key + tiebreak)",
        20_000_000,
        rank_persisted_stress,
        "ONE materialized range shuffle shared by offsets + stream; permutation identity (Σ, distinct, min, max) verified in-run",
    )
    timed(
        "two-phase global rank, persisted base @ stock 200 shuffle partitions (20M rows)",
        20_000_000,
        lambda: rank_persisted_stress(parts_conf=200),
        "the driver's stock partition count — the config that exposed the r10 unpersisted double-evaluation bug; same identity verified",
    )

    # ---- WordPiece greedy longest-match encode at vocab scale ------------
    # The encode DP (plans/wordpiece.py) runs on the DISTINCT-WORD frame:
    # per level, active words explode ≤ 12 candidate lengths and equi-join
    # a broadcast vocabulary. This case scales the WORD frame to 500k
    # synthetic words (md5-hex 12-char: alphabet 0-9a-f) against a
    # realistic vocab (all 1-2-char hex pieces + ##-variants) and verifies
    # total pieces reconstruct total chars (every piece consumes its
    # length; no [UNK] by construction).
    def wordpiece_encode_stress():
        from arc_maskdata_pipeline_plugin_spark.plans.wordpiece import _LMAX

        words = (
            spark.range(0, 500_000, 1, sc.defaultParallelism * 2)
            .select(
                F.substring(F.md5(F.col("id").cast("string")), 1, 12).alias(
                    "word"
                )
            )
            .distinct()
        )
        hexd = "0123456789abcdef"
        pieces = (
            [c for c in hexd]
            + ["##" + c for c in hexd]
            + [a + b for a in hexd for b in hexd]
            + ["##" + a + b for a in hexd for b in hexd]
        )
        vocab = spark.createDataFrame([(p,) for p in pieces], "piece string")
        state = words.select(
            "word",
            F.lit(0).alias("pos"),
            F.lit(0).alias("k"),
            F.lit(False).alias("unk"),
            (F.length("word") == 0).alias("done"),
        ).localCheckpoint(eager=True)
        finished = []  # the shipped shrinking-active shape (r12)
        for _ in range(_LMAX):
            active = state.filter(~F.col("done"))
            finished.append(state.filter(F.col("done")))
            cand = active.select(
                "word",
                "pos",
                F.explode(
                    F.expr(f"sequence(1, least({_LMAX}, length(word) - pos))")
                ).alias("j"),
            ).withColumn(
                "cand",
                F.when(F.col("pos") == 0, F.expr("substring(word, 1, j)"))
                .otherwise(
                    F.concat(
                        F.lit("##"), F.expr("substring(word, pos + 1, j)")
                    )
                ),
            )
            m = (
                cand.join(F.broadcast(vocab), cand["cand"] == vocab["piece"])
                .groupBy("word")
                .agg(F.max("j").cast("int").alias("adv"))
            )
            stepped = active.join(m, "word", "left").select(
                "word",
                (F.col("pos") + F.coalesce(F.col("adv"), F.lit(0))).alias(
                    "pos"
                ),
                (F.col("k") + F.when(F.col("adv").isNull(), 0).otherwise(1))
                .alias("k"),
                F.col("adv").isNull().alias("unk"),
                (
                    F.col("adv").isNull()
                    | (F.col("pos") + F.col("adv") >= F.length("word"))
                ).alias("done"),
            )
            state = stepped.localCheckpoint(eager=True)
            if state.isEmpty():
                break
        for f in finished:
            state = state.unionByName(f)
        chk = state.agg(
            F.sum(F.when(F.col("unk"), 1).otherwise(0)).alias("unks"),
            F.sum("pos").alias("chars"),
            F.count(F.lit(1)).alias("nw"),
        ).first()
        total_chars = words.agg(F.sum(F.length("word"))).first()[0]
        assert chk["unks"] == 0, chk
        assert chk["chars"] == total_chars, (chk, total_chars)

    timed(
        "WordPiece greedy longest-match encode (500k distinct 12-char words, 545-piece vocab)",
        500_000,
        wordpiece_encode_stress,
        "12 localCheckpoint levels on the word frame; broadcast vocab equi-join per level; consumed-chars identity verified in-run",
    )

    def fs_blocking_stress():
        import arc_maskdata_pipeline_plugin_spark.plans.linkage as lk

        segs = ["AUTOMOBILE", "BUILDING", "MACHINERY", "FURNITURE", "HOUSEHOLD"]
        organic = spark.range(0, 900_000, 1, sc.defaultParallelism * 2).select(
            F.col("id").alias("c_custkey"),
            F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
            # hash-spread nation so the (nation, name-tens-digit) compound
            # key really factors into ~2000 blocks (id % 200 alone would
            # determine the tens digit and collapse the key)
            (F.col("id") * 2654435761 % 200).alias("c_nationkey"),
            ((F.col("id") % 999_999) / 100.0).alias("c_acctbal"),
            F.element_at(
                F.array(*[F.lit(s) for s in segs]),
                (F.col("id") % 5 + 1).cast("int"),
            ).alias("c_mktsegment"),
        )
        # ADVERSARIAL viral block: 100k extra customers whose names all end
        # in tens-digit 0 under nation 0 — uncapped, that single block
        # alone is C(100k, 2) ≈ 5e9 candidate pairs
        viral = spark.range(0, 100_000, 1, sc.defaultParallelism).select(
            (F.col("id") + 10_000_000).alias("c_custkey"),
            F.format_string(
                "Customer#%09d", (F.col("id") + 10_000_000) * 100
            ).alias("c_name"),
            F.lit(0).cast("long").alias("c_nationkey"),
            ((F.col("id") % 999_999) / 100.0).alias("c_acctbal"),
            F.element_at(
                F.array(*[F.lit(s) for s in segs]),
                (F.col("id") % 5 + 1).cast("int"),
            ).alias("c_mktsegment"),
        )
        cust = organic.unionByName(viral)
        orig = lk.T
        try:
            lk.T = lambda sp, sf, name: cust
            pairs, sizes = lk._blocked_pairs(spark, "stress")
            nd_blocks, nd_rows = lk._dropped_audit(sizes)
            # every block over the 10k cap is dropped AND audited; the
            # viral block swallows the organic (0, '0') rows too
            assert nd_blocks == 1, nd_blocks
            assert nd_rows >= 100_000, nd_rows
            expected_pairs = sizes.filter(
                F.col("bsz") <= lk._MAX_BLOCK_ROWS
            ).agg(
                F.sum(F.col("bsz") * (F.col("bsz") - 1) / 2).cast("bigint")
            ).first()[0]
            counts, (p, m, u, w) = lk._fit_em(pairs)
            sizes.unpersist()
            # pair count == Σ C(|kept block|, 2): the cap is the bound
            assert sum(counts.values()) == expected_pairs, (
                sum(counts.values()),
                expected_pairs,
            )
            assert len(w) == 16 and 0 < p < 10**9  # O(1) EM on the grid
        finally:
            lk.T = orig

    timed(
        "Fellegi-Sunter capped blocking VIRAL (1M customers + 100k-row viral block, cap=10k)",
        1_000_000,
        fs_blocking_stress,
        "ADVERSARIAL: uncapped viral block = 5e9 pairs; cap drops+audits it; ~2000 compound blocks -> ~2e8 in-cap pairs through ONE 16-row map-side-combined pattern agg; EM on the collected grid is O(1)",
    )

    def cumsum_stress():
        # two-phase global running sum on a 5M distinct-value frame
        # (the plans/twophase.py primitive the KS/CvM/winsorize family
        # rides) — permutation identity max(cum) == Σw verified in-run
        from arc_maskdata_pipeline_plugin_spark.cache import persisted as _p
        from arc_maskdata_pipeline_plugin_spark.plans.twophase import (
            global_cumsums,
        )

        vals = _p(
            spark.range(0, 5_000_000, 1, sc.defaultParallelism * 4).select(
                ((F.col("id") * 2654435761) % (1 << 40)).alias("v"),
                (F.col("id") % 997 + 1).alias("w"),
            )
        )
        cum = global_cumsums(vals, ["v"], {"cw": ("w", "incl")})
        row = cum.agg(
            F.max("cw").alias("mx"), F.count(F.lit(1)).alias("n")
        ).first()
        tot = vals.agg(F.sum("w").alias("s")).first()
        assert row["mx"] == tot["s"], (row, tot)
        vals.unpersist()

    timed(
        "two-phase global cumsum (5M distinct-value frame)",
        5_000_000,
        cumsum_stress,
        "sketch-bucketed windows (one parallel hash shuffle); per-bucket prefix totals broadcast; max(cum) == Σw verified in-run",
    )

    def drift_family_stress():
        # the SHIPPED q_cramer_von_mises / q_wasserstein_drift paths (two-
        # phase cumsums + the W1 inlined lag pass) on 20M rows, 100k
        # distinct values, group B shifted by a constant
        import arc_maskdata_pipeline_plugin_spark.plans.stats6 as s6

        ev = spark.range(0, 20_000_000, 1, sc.defaultParallelism * 4).select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(F.lit(1700000000)).alias("ts"),
            F.lit(1).alias("user_id"),
            F.when(F.col("id") % 2 == 0, "purchase")
            .otherwise("view")
            .alias("event_type"),
            (
                ((F.col("id") * 2654435761) % 100_000)
                + (F.col("id") % 2) * 5_000
            ).cast("double").alias("value"),
            F.lit("{}").alias("props"),
        )
        orig = s6.T
        try:
            s6.T = lambda sp, sf, name: ev
            cvm = s6.q_cramer_von_mises(spark, "stress").first()
            assert cvm["shift_detected"] == 1, cvm
            w1 = s6.q_wasserstein_drift(spark, "stress").first()
            # group B is group A location-shifted by +5000 -> W1 ~ 5000
            assert 4_500 * 10**6 < w1["w1_fp6"] < 5_500 * 10**6, w1
            assert w1["n_a"] == w1["n_b"] == 10_000_000
        finally:
            s6.T = orig

    timed(
        "CvM + Wasserstein drift, shipped two-phase paths (20M rows, ~105k distinct values)",
        20_000_000,
        drift_family_stress,
        "corpus collapses to the distinct-value frame in ONE shuffle each; closed-form tied-group CvM terms; W1 lag+cumsums in one bucketed pass; shift verdict + W1~5000 location-shift identity verified in-run",
    )

    # ---- report ----------------------------------------------------------
    lines = [
        "# STRESS — synthetic ~100× scale-up measurements (local[32])",
        "",
        "Inputs generated on-cluster with `spark.range` (no driver data); all",
        "sinks are `noop` so timings measure compute+shuffle, not disk. Run",
        "`python tools/stress.py` to regenerate.",
        "",
        "| operation | input rows | sec | rows/s | note |",
        "|---|---|---|---|---|",
    ]
    for label, rows, el, note in RESULTS:
        lines.append(f"| {label} | {rows:,} | {el:.2f} | {rows/el:,.0f} | {note} |")
    lines += [
        "",
        "Reading the skew pair: AQE's runtime skew-split and the explicit",
        "salted join should land in the same range — the salted path exists",
        "for engines/configs where AQE is unavailable and as the deterministic",
        "fallback when a single key exceeds what one task can hold.",
    ]
    if os.environ.get("STRESS_ONLY"):  # filtered run: print, don't clobber
        print("\n".join(lines))
        return
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "STRESS.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
