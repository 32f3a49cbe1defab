"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (the whole point of these ops is 100 TB dedup):

* Everything is built-in-expression based — shingling, hashing, banding all
  happen JVM-side; no Python in the hot path.
* MinHash: signatures are one ``groupBy(doc)`` with K min-aggregates (one
  shuffle); LSH banding turns the O(n²) pair space into an equi-join on band
  keys — the canonical scale path. Band-bucket skew (a viral shingle) is
  handled by AQE skew-join splitting (enabled in the session factory).
* Hash family: ``md5(seed || shingle)`` with lexicographic MIN — identical
  strings in any engine, so the DuckDB oracle can reproduce it bit-for-bit.
  (xxhash64 would be ~3× faster but is Spark-private; swap via ``hash_fn``
  when oracle parity isn't needed.)
* SimHash here is a hex-digit variant: per md5 hex position, take the
  majority digit value over tokens → 32-symbol signature ≈ 128-bit simhash
  at 4-bit granularity. Hamming-near docs collide on prefix bands.
* Embedding near-dup: dot products via an ordered fold (``aggregate`` over
  ``zip_with``) so floating-point summation order is deterministic and
  engine-identical — a parallel SUM over unnested elements would not be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..cache import persisted

# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------


def word_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    k: int = 3,
    distinct: bool = True,
) -> DataFrame:
    """k-word shingles per document (one row per (doc, shingle)).

    ``distinct=False`` skips the dedup shuffle — correct whenever the consumer
    is multiset-insensitive (MIN-aggregation for MinHash signatures), which
    lets the downstream groupBy be the ONLY shuffle, with map-side partial
    aggregation collapsing each partition to one row per doc."""
    tokens = F.split(F.trim(F.col(text)), r"\s+")
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(tokens, i, k)),
    )
    out = df.select(F.col(id_col), F.explode(shingles).alias("shingle"))
    return out.distinct() if distinct else out


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Group by content hash; keep groups of size > 1 with the canonical
    (min-id) survivor. At scale: one shuffle on a 128-bit key."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text))), r"\s+", " ")
    return (
        df.select(F.col(id_col), F.md5(norm).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("n_copies") > 1)
    )


def drop_exact_duplicates(df: DataFrame, id_col: str = "doc_id", text: str = "text") -> DataFrame:
    """Survivor set: one row per distinct content, deterministic keeper."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text))), r"\s+", " ")
    w = df.select("*", F.md5(norm).alias("_ch"))
    keep = w.groupBy("_ch").agg(F.min(id_col).alias(id_col))
    return w.join(keep, [id_col, "_ch"], "inner").drop("_ch")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    shingled: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    hash_fn: str = "md5",
) -> DataFrame:
    """K min-hashes per doc in ONE aggregation (K min() columns, map-side
    partial agg) — not K passes. Feed it NON-distinct shingles
    (``word_shingles(..., distinct=False)``): MIN is multiset-insensitive, so
    the dedup shuffle is pure waste here.

    ``hash_fn``: "md5" is the DuckDB-reproducible default (the oracle
    checks it); "xxhash64" is the production fast path — same banding
    machinery, ~3× cheaper per shingle at 100 TB (see STRESS.md)."""
    if hash_fn == "xxhash64":
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("shingle"))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    return shingled.groupBy(id_col).agg(*aggs)


def _pairs_within(ids) -> F.Column:
    """All ordered pairs (d1 < d2) from a SORTED id array, as struct array —
    pure JVM expression, no Python."""
    n = F.size(ids)
    return F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), n - i - 1),
                lambda y: F.struct(x.alias("d1"), y.alias("d2")),
            ),
        )
    )


def signature_bands(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
) -> DataFrame:
    """Explode a minhash signature into its LSH band rows
    (id, band, key) — the shared banding step for batch pair generation
    (``lsh_candidate_pairs``) and incremental dedup against a persisted
    band store (``incremental_dedup_new_docs``)."""
    n_bands = num_hashes // band_size
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat(
                    *[F.col(f"h{b * band_size + j}") for j in range(band_size)]
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    return signatures.select(
        F.col(id_col), F.explode(band_entries).alias("bk")
    ).select(id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signature, bucket by (band_index, band_key), enumerate pairs
    within each bucket. Group-then-enumerate instead of a self-join: a
    self-join would evaluate the whole upstream signature pipeline (scan →
    shingle → K×md5 → agg) once PER SIDE — this shape computes it once and
    adds a single (band,key) shuffle. Distinct output (a pair can collide in
    several bands). A viral bucket is quadratic in either shape — that's the
    LSH candidate semantics — but here its pairs are generated in one task
    from one array instead of through a shuffled join."""
    bands = signature_bands(signatures, id_col, num_hashes, band_size)
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket_size is not None:
        # Viral-bucket guard for skewed corpora: boilerplate text puts ~every
        # doc in one bucket → quadratic pair explosion AND a single straggler
        # task holding the whole bucket array. A band key shared by millions
        # of docs is boilerplate, not near-duplication, so production dedup
        # drops those buckets. Not silent: use ``lsh_dropped_buckets`` with
        # the same arguments to audit what was excluded.
        buckets = buckets.filter(F.size("ids") <= max_bucket_size)
    return (
        buckets.select(F.explode(_pairs_within(F.col("ids"))).alias("p"))
        .select(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
        .distinct()
    )


def lsh_dropped_buckets(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    band_size: int = 2,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Audit companion to ``lsh_candidate_pairs(max_bucket_size=...)``:
    the (band, key, n_docs) rows that the cap excluded, so a cap is never a
    silent coverage hole."""
    bands = signature_bands(signatures, id_col, num_hashes, band_size)
    return (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > max_bucket_size)
    )


def incremental_dedup_new_docs(
    new_docs: DataFrame,
    corpus_bands: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    num_hashes: int = 8,
    band_size: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Daily-ingest dedup: drop new documents that near-duplicate the EXISTING
    corpus, without touching the corpus itself.

    ``corpus_bands`` is the persisted band store (id, band, key) built once
    by ``signature_bands`` over the historical corpus (and ideally bucketed
    on (band, key) at rest — see ``operators.joins.write_bucketed``). Each
    increment then:

      1. shingles + signs ONLY the new batch (cost ∝ batch, not corpus);
      2. semi-joins its band rows against the store on (band, key) — with a
         bucketed store this is a co-located probe, and the new batch is the
         small broadcastable side;
      3. returns (survivors, survivor_bands) — append survivor_bands to the
         store to complete the increment.

    Within-batch duplicates are NOT handled here (run the batch operators on
    the survivors if needed); this isolates the corpus-vs-batch concern that
    dominates at 100 TB.
    """
    sigs = minhash_signatures(
        word_shingles(new_docs, id_col=id_col, text=text, distinct=False),
        id_col=id_col,
        num_hashes=num_hashes,
    )
    new_bands = signature_bands(sigs, id_col, num_hashes, band_size)
    dup_ids = (
        new_bands.join(corpus_bands.select("band", "key"), ["band", "key"], "semi")
        .select(id_col)
        .distinct()
    )
    survivors = new_docs.join(dup_ids, id_col, "left_anti")
    survivor_bands = new_bands.join(dup_ids, id_col, "left_anti")
    return survivors, survivor_bands


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer-Wilkerson-Aiken) — operator form
# ---------------------------------------------------------------------------


def winnow_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    k: int = 4,
    w: int = 4,
) -> DataFrame:
    """Distinct winnowing-selected fingerprints per document: hash every
    word ``k``-gram (md5 first-8-hex → int32-range bigint, engine-portable),
    slide a window of ``w`` consecutive hashes, keep the RIGHTMOST MINIMUM
    of each window (robust winnowing, SIGMOD 2003). Returns (id, h) rows —
    the store an incremental fingerprint index persists (bucket by ``h`` at
    rest).

    Winnowing is DOC-LOCAL: fingerprints computed per batch equal those the
    full-corpus computation would select, so a persisted store extends by
    plain union — the property that makes it an incremental-dedup store.
    Density/locality audits of this selection are hash-oracled in
    ``plans/dedup.py`` (q_winnowing_fingerprints / q_winnowing_dup_pairs)."""
    toks = (
        f"filter(transform(split(lower(trim({text})), '\\\\s+'), "
        "t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
    )
    d = docs.select(F.col(id_col), F.expr(toks).alias("tk"))
    sized = d.filter(F.size("tk") >= k + w - 1).select(
        id_col, "tk", (F.size("tk") - (k - 1)).alias("n_pos")
    )
    # r13 rewrite (guide §2.4/§4.1): winnowing is DOC-LOCAL, so the whole
    # selection runs inside higher-order functions over the token array —
    # the old shape exploded every position w ways and shuffled the blown-up
    # frame through a (doc, window) row_number sort plus a global distinct
    # (two full exchanges of w×|positions| rows). Only the hash VALUE is
    # emitted here, and the rightmost-minimum of a window has the same hash
    # value as the plain minimum (ties tie ON h), so the per-window selection
    # is exactly ``array_min(slice(hs, j, w))``; ``array_distinct`` gives the
    # per-document distinct the old global ``.distinct()`` provided (doc ids
    # are the row key). md5 is still computed once per k-gram position.
    hs = (
        f"transform(sequence(1, n_pos), p -> "
        f"cast(conv(substring(md5(array_join(slice(tk, p, {k}), ' ')), "
        f"1, 8), 16, 10) as bigint))"
    )
    sel = (
        f"array_distinct(transform(sequence(1, n_pos - {w - 1}), "
        f"j -> array_min(slice(hs, j, {w}))))"
    )
    return sized.withColumn("hs", F.expr(hs)).select(
        F.col(id_col), F.explode(F.expr(sel)).alias("h")
    )


def incremental_dedup_winnow(
    new_docs: DataFrame,
    corpus_fps: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    k: int = 4,
    w: int = 4,
    min_shared: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """Daily-ingest dedup against a persisted WINNOWING fingerprint store
    (r09, VERDICT r08 next-round #5 — the winnowing twin of
    ``incremental_dedup_new_docs``): a new document is dropped iff at least
    ``min_shared`` of its selected fingerprints already exist in the store.
    Winnowing's locality guarantee makes the probe sensitive to any shared
    run of k+w−1 tokens wherever it sits — the substring sensitivity the
    MinHash band store trades away.

    Each increment: (1) fingerprints ONLY the new batch (winnowing is
    doc-local, cost ∝ batch); (2) semi-probes the store on ``h`` (bucketed
    store → co-located probe); (3) returns (survivors, survivor_fps) —
    union survivor_fps into the store to complete the increment."""
    fps = winnow_fingerprints(new_docs, id_col=id_col, text=text, k=k, w=w)
    dup_ids = (
        fps.join(corpus_fps.select("h"), "h", "semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_shared)
        .select(id_col)
    )
    survivors = new_docs.join(dup_ids, id_col, "left_anti")
    survivor_fps = fps.join(dup_ids, id_col, "left_anti")
    return survivors, survivor_fps


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


def _copair_counts(shingled: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(d1, n1, d2, n2, n_common) for every doc pair sharing ≥1 shingle.

    ONE linear lineage, zero joins, one scan: per-doc shingle SET + size in
    one aggregation → re-explode carrying (doc, n) → bucket per shingle →
    enumerate pairs WITH both sizes attached → count co-occurrences. A
    formulation with a shingle self-join (or size-lookup joins) evaluates the
    shingling pipeline once per use — 3 scans and 11 shuffles at last audit
    vs 3 shuffles here; at 100 TB the rescans are the bill. Shingle buckets
    bound the pair space (docs sharing nothing never meet); counts are exact
    integers → downstream threshold comparisons are engine-stable.

    Accepts NON-distinct shingles (set semantics from ``collect_set``).
    Shared machinery for :func:`jaccard_pairs` and :func:`containment_pairs`.
    """
    doc_sets = shingled.groupBy(id_col).agg(F.collect_set("shingle").alias("shs"))
    doc_sized = doc_sets.select(
        F.col(id_col), F.size("shs").alias("n"), F.explode("shs").alias("shingle")
    )
    buckets = (
        doc_sized.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(F.struct(id_col, "n"))).alias("ms"))
        .filter(F.size("ms") > 1)
    )
    sz = F.size(F.col("ms"))
    pairs = F.flatten(
        F.transform(
            F.col("ms"),
            lambda x, i: F.transform(
                F.slice(F.col("ms"), i + F.lit(2), sz - i - 1),
                lambda y: F.struct(
                    x[id_col].alias("d1"),
                    x["n"].alias("n1"),
                    y[id_col].alias("d2"),
                    y["n"].alias("n2"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.d1").alias("d1"),
            F.col("p.n1").alias("n1"),
            F.col("p.d2").alias("d2"),
            F.col("p.n2").alias("n2"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


def jaccard_pairs(
    shingled: DataFrame, id_col: str = "doc_id", threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard over shingle sets for pairs sharing ≥1 shingle.

    Jaccard from the exact (n1, n2, n_common) integers of
    :func:`_copair_counts` — a single double division per surviving pair, so
    the threshold comparison is engine-stable.

    Scale note: this fans out on EVERY shared shingle (candidate volume =
    sum-of-df² over the vocabulary). For large corpora prefer
    :func:`ppjoin_candidate_pairs` — same exact pair set at the same
    threshold, but candidates fan out only on rare-first PREFIX tokens with
    a capped viral-token guard (3× faster at sf0.1, and the gap widens with
    corpus size)."""
    inter = _copair_counts(shingled, id_col)
    jac = (
        F.col("n_common").cast("double")
        / (F.col("n1") + F.col("n2") - F.col("n_common")).cast("double")
    )
    return inter.select("d1", "d2", jac.alias("jaccard")).filter(
        F.col("jaccard") >= threshold
    )


def containment_pairs(
    shingled: DataFrame, id_col: str = "doc_id", threshold: float = 0.8
) -> DataFrame:
    """Asymmetric near-dup: overlap coefficient |A∩B| / min(|A|, |B|).

    Jaccard misses the doc-inside-doc case — a paragraph fully quoted inside
    a 100× longer page scores |A∩B|/|A∪B| ≈ 1%, yet for training-data dedup
    the smaller doc is pure duplication. The overlap coefficient (containment
    of the SMALLER side) is the standard screen for it (Broder's containment,
    "On the resemblance and containment of documents", 1997). Same
    single-lineage pair machinery as :func:`jaccard_pairs` — exact integer
    counts, one double division at the end; emits which side is contained so
    survivorship can keep the superset doc."""
    inter = _copair_counts(shingled, id_col)
    cont = F.col("n_common").cast("double") / F.least(
        F.col("n1"), F.col("n2")
    ).cast("double")
    contained = F.when(F.col("n1") <= F.col("n2"), F.col("d1")).otherwise(
        F.col("d2")
    )
    return (
        inter.select(
            "d1",
            "d2",
            cont.alias("containment"),
            contained.alias("contained_id"),
        )
        .filter(F.col("containment") >= threshold)
    )


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-doc exact duplicated-substring coverage (ExactSubstr shape).

    Lee et al., "Deduplicating Training Data Makes Language Models Better"
    (ACL 2022) remove exact token spans (≥50 tokens) that repeat anywhere in
    the corpus, via a suffix array. A suffix array is a single-machine
    construct; the distributed re-expression is fixed-length span hashing:
    every n-token window → hash → a span is duplicated iff its hash occurs in
    ≥2 distinct docs (any repeat of a ≥n-token substring implies its n-token
    windows repeat, so coverage of flagged windows ⊇ coverage of Lee et al.'s
    spans at L=n).

    Plan shape, in scale order: (1) spans explode partition-locally (no
    shuffle); (2) ONE corpus-wide shuffle — groupBy(span hash) with map-side
    combine, emitting the duplicated-hash set, which is duplicated-material-
    sized (small); (3) flagged spans rejoin on the hash (AQE broadcasts the
    dup set in practice) and merge into maximal islands with two windows
    co-partitioned on doc_id — one partition-sized step per doc, never a
    global sort. Output: one row per doc that contains duplicated material,
    with exact integer token coverage (union of overlapping spans via
    gaps-and-islands over a running-max of span ends).
    """
    tokens = F.split(F.trim(F.col(text)), r"\s+")
    # spans feed BOTH the dup-hash aggregate and the rejoin: persist so the
    # corpus is scanned (and the md5 span hashing paid) exactly once.
    spans = (
        docs.select(F.col(id_col), tokens.alias("tk"))
        .filter(F.size("tk") >= n)
        .select(
            F.col(id_col),
            F.size("tk").alias("n_tokens"),
            F.explode(
                F.sequence(F.lit(1), F.size(F.col("tk")) - (n - 1))
            ).alias("start"),
            F.col("tk"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            "start",
            (F.col("start") + (n - 1)).alias("end"),
            F.md5(F.concat_ws(" ", F.slice(F.col("tk"), F.col("start"), n))).alias(
                "h"
            ),
        )
        .transform(persisted)
    )
    dup_hashes = (
        spans.groupBy("h")
        .agg(F.countDistinct(id_col).alias("nd"))
        .filter(F.col("nd") > 1)
        .select("h")
    )
    flagged = spans.join(dup_hashes, "h", "semi")
    w_order = Window.partitionBy(id_col).orderBy("start")
    prev_max_end = F.max("end").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = flagged.withColumn(
        "new_island",
        F.when(
            prev_max_end.isNull() | (F.col("start") > prev_max_end), F.lit(1)
        ).otherwise(F.lit(0)),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    cover = islands.groupBy(id_col, "n_tokens", "island").agg(
        (F.max("end") - F.min("start") + 1).alias("cover")
    )
    return cover.groupBy(id_col, "n_tokens").agg(
        F.sum("cover").cast("bigint").alias("dup_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.floor(F.sum("cover") * 1_000_000 / F.col("n_tokens"))
        .cast("bigint")
        .alias("dup_ppm"),
    )


# ---------------------------------------------------------------------------
# SimHash (hex-digit majority variant)
# ---------------------------------------------------------------------------


def simhash(
    df: DataFrame, id_col: str = "doc_id", text: str = "text", positions: int = 16
) -> DataFrame:
    """Per md5-hex position p, the per-doc mean digit value over tokens;
    signature symbol = 1 if mean ≥ 7.5 else 0 → ``positions``-bit signature
    string. Docs with small Hamming distance share band prefixes."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text)), r"\s+")).alias("tok"),
    ).withColumn("th", F.md5(F.col("tok")))
    aggs = []
    for p in range(1, positions + 1):
        dv = F.expr(f"locate(substring(th, {p}, 1), '0123456789abcdef') - 1")
        aggs.append(F.avg(dv.cast("double")).alias(f"m{p}"))
    means = toks.groupBy(id_col).agg(*aggs)
    bits = F.concat(
        *[
            F.when(F.col(f"m{p}") >= 7.5, F.lit("1")).otherwise(F.lit("0"))
            for p in range(1, positions + 1)
        ]
    )
    return means.select(F.col(id_col), bits.alias("simhash"))


def simhash_buckets(sim: DataFrame, id_col: str = "doc_id", prefix: int = 8) -> DataFrame:
    """Group docs by signature prefix → near-dup candidate buckets."""
    return (
        sim.groupBy(F.substring("simhash", 1, prefix).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sort_array(F.collect_list(id_col)).alias("doc_ids"))
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def with_norm(df: DataFrame, vec: str = "embedding") -> DataFrame:
    v = F.col(vec)
    return df.withColumn("_norm", F.sqrt(_dot(v, v)))


def cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """All-pairs cosine ≥ threshold. Brute-force (n² dot products) — correct
    baseline; use LSH bucketing (similarity.py) as the scale path."""
    a = with_norm(df.select(id_col, vec)).alias("a")
    b = with_norm(df.select(id_col, vec)).alias("b")
    cos = _dot(F.col(f"a.{vec}"), F.col(f"b.{vec}")) / (F.col("a._norm") * F.col("b._norm"))
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("v1"),
            F.col(f"b.{id_col}").alias("v2"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# PPJoin / All-Pairs: prefix-filtered EXACT set-similarity join
# ---------------------------------------------------------------------------


def ppjoin_prefix_buckets(
    shingles: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "shingle",
    tau_num: int = 1,
    tau_den: int = 2,
) -> DataFrame:
    """Prefix-token buckets for an exact Jaccard-threshold self-join
    (Chaudhuri/Ganti/Kaushik SSJoin 2006; Bayardo/Ma/Srikant All-Pairs
    WWW'07; Xiao et al. PPJoin WWW'08). Input: DISTINCT (id, token) rows.

    Tokens are ordered globally by (document frequency ASC, token ASC);
    each set of size m keeps only its first ``m - ceil(tau*m) + 1`` tokens
    (the PREFIX). Two sets with Jaccard >= tau MUST share a prefix token
    under any consistent global order (pigeonhole on the complement), so
    bucketing by prefix token is candidate-COMPLETE — unlike MinHash-LSH
    (probabilistic recall) or SimHash (radius-limited), this is the exact
    third leg of the set-similarity-join family. Rare-first ordering makes
    prefix buckets the SMALLEST possible ones, which is the entire
    scalability argument: the join fans out on rare tokens only.

    Shape: one token-keyed df aggregate (map-side combined), one token-keyed
    join, one id-partitioned window pair (single exchange), one token-keyed
    bucket aggregate. No corpus self-join anywhere.
    """
    w_pos = Window.partitionBy(id_col).orderBy("df", token_col)
    w_doc = Window.partitionBy(id_col)
    df_tok = shingles.groupBy(token_col).agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        shingles.join(df_tok, token_col)
        .withColumn("pos", F.row_number().over(w_pos))
        .withColumn("m", F.count(F.lit(1)).over(w_doc))
    )
    # prefix length m - ceil(tau*m) + 1, kept integral: ceil(n*m/d) = (n*m+d-1) div d
    keep = F.col("pos") <= (
        F.col("m")
        - F.expr(f"({tau_num} * m + {tau_den} - 1) div {tau_den}")
        + F.lit(1)
    )
    return (
        ranked.filter(keep)
        .groupBy(token_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), F.col("m").alias("m"))
                )
            ).alias("xs")
        )
    )


def ppjoin_candidate_pairs(
    shingles: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "shingle",
    tau_num: int = 1,
    tau_den: int = 2,
    max_token_bucket: int | None = None,
) -> DataFrame:
    """Distinct candidate pairs from the prefix buckets, group-then-enumerate
    (same discipline as ``lsh_candidate_pairs``: one task per bucket, never a
    shuffled self-join). Applies the LENGTH filter in-bucket — J(a,b) >= tau
    forces tau <= |a|/|b| <= 1/tau, i.e. ``tau_den*min >= tau_num*max`` —
    before any pair leaves the bucket. ``max_token_bucket`` is the
    viral-token guard (a prefix token shared by k sets yields O(k^2)
    candidates; a token that frequent is boilerplate, not similarity signal);
    audit the exclusions with ``ppjoin_dropped_tokens``."""
    buckets = ppjoin_prefix_buckets(shingles, id_col, token_col, tau_num, tau_den)
    buckets = buckets.filter(F.size("xs") > 1)
    if max_token_bucket is not None:
        buckets = buckets.filter(F.size("xs") <= max_token_bucket)
    return (
        buckets.select(F.explode(_pairs_within(F.col("xs"))).alias("p"))
        .select(
            F.col("p.d1.id").alias("d1"),
            F.col("p.d1.m").alias("m1"),
            F.col("p.d2.id").alias("d2"),
            F.col("p.d2.m").alias("m2"),
        )
        .filter(
            F.lit(tau_den) * F.least("m1", "m2")
            >= F.lit(tau_num) * F.greatest("m1", "m2")
        )
        .select("d1", "d2")
        .distinct()
    )


def ppjoin_dropped_tokens(
    shingles: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "shingle",
    tau_num: int = 1,
    tau_den: int = 2,
    max_token_bucket: int = 64,
) -> DataFrame:
    """Audit companion to ``ppjoin_candidate_pairs(max_token_bucket=...)``:
    the (token, n_sets) prefix buckets the cap excluded — same contract as
    ``lsh_dropped_buckets``, so a cap is never a silent coverage hole."""
    buckets = ppjoin_prefix_buckets(shingles, id_col, token_col, tau_num, tau_den)
    return (
        buckets.select(token_col, F.size("xs").alias("n_sets"))
        .filter(F.col("n_sets") > max_token_bucket)
    )
