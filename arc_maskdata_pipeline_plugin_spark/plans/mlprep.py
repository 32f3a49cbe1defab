"""Feature-engineering / evaluation prep: leakage-safe target encoding,
weight-of-evidence + information value, calibration (reliability bins +
ECE), and URL canonicalization dedup.

The tabular-ML counterpart of the corpus-curation family: the transforms a
training platform applies between raw tables and a feature store, each with
the exact-arithmetic discipline the oracle gate demands (counts/sums exact,
every double derived from exact integers with the identical expression in
DuckDB, per-cell/per-bin terms fp-floored BEFORE any sum).

Scale shapes: target encoding and WoE are one keyed shuffle to a
(category[, fold])-sized frame; calibration is one shuffle to a 10-row bin
frame after a broadcast min/max; URL dedup is a projection plus one
canonical-key group-by — no self-joins anywhere.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, persisted, register

_TE_FOLDS = 5


@register(
    "q_target_encoding",
    oracle=f"""
WITH pf AS (
  SELECT event_type, CAST(event_id % {_TE_FOLDS} AS BIGINT) AS fold,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS s
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT event_type, fold, cnt, s,
         SUM(cnt) OVER (PARTITION BY event_type) AS tot_cnt,
         SUM(s) OVER (PARTITION BY event_type) AS tot_s
  FROM pf
)
SELECT event_type, fold, cnt AS n_in_fold,
       CAST(floor(1000000.0 * CAST(tot_s - s AS DOUBLE)
                  / CAST(tot_cnt - cnt AS DOUBLE)) AS BIGINT)
         AS oof_mean_fp6
FROM m
""",
)
def q_target_encoding(spark, sf_dir):
    """K-fold OUT-OF-FOLD target encoding of event_type against `value` —
    the leakage-safe categorical encoder (each row's encoding is the target
    mean computed WITHOUT its own fold, so the feature never sees its own
    label). Folds are deterministic (event_id mod K). The decomposable
    trick: oof_mean(cat, fold) = (tot_sum(cat) − sum(cat, fold)) /
    (tot_cnt(cat) − cnt(cat, fold)), so ONE partial aggregate to the
    (category, fold) frame plus windows over that tiny frame yields every
    fold's encoding — the corpus is never re-scanned per fold."""
    e = T(spark, sf_dir, "events").select(
        "event_type",
        (F.col("event_id") % _TE_FOLDS).cast("bigint").alias("fold"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    pf = e.groupBy("event_type", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("v").cast("decimal(38,6)").alias("s"),
    )
    wc = Window.partitionBy("event_type")
    m = pf.select(
        "event_type",
        "fold",
        "cnt",
        "s",
        F.sum("cnt").over(wc).alias("tot_cnt"),
        F.sum("s").over(wc).alias("tot_s"),
    )
    return m.select(
        "event_type",
        "fold",
        F.col("cnt").alias("n_in_fold"),
        F.floor(
            1_000_000.0
            * (F.col("tot_s") - F.col("s")).cast("double")
            / (F.col("tot_cnt") - F.col("cnt")).cast("double")
        )
        .cast("bigint")
        .alias("oof_mean_fp6"),
    )


@register(
    "q_woe_iv",
    oracle="""
WITH cat AS (
  SELECT n.n_name AS supplier_nation,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 0 ELSE 1 END)
              AS BIGINT) AS g,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
              AS BIGINT) AS b
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1
),
m AS (
  SELECT supplier_nation, g, b,
         SUM(g) OVER () AS gg, SUM(b) OVER () AS bb
  FROM cat
)
SELECT supplier_nation, g AS n_good, b AS n_bad,
       CAST(floor(1000000000.0
             * ln((CAST(g AS DOUBLE) * bb) / (CAST(b AS DOUBLE) * gg)))
            AS BIGINT) AS woe_fp9,
       CAST(floor(1000000000.0
             * (CAST(g AS DOUBLE) / gg - CAST(b AS DOUBLE) / bb)
             * ln((CAST(g AS DOUBLE) * bb) / (CAST(b AS DOUBLE) * gg)))
            AS BIGINT) AS iv_term_fp9
FROM m
""",
)
def q_woe_iv(spark, sf_dir):
    """Weight of evidence + information value of supplier nation against
    the return flag — the credit-scoring-style predictive-power screen for
    a categorical feature. WoE(cat) = ln((g/G)/(b/B)) computed as
    ln(g·B / (b·G)) from exact counts; the IV contribution
    (g/G − b/B)·WoE floors to fp9 per category (the category frame is the
    only frame after one shuffle, so the final IV is an integer sum any
    consumer can take). Every double comes from exact BIGINTs with the
    identical expression in the oracle; the supplier/nation dims ride in on
    broadcast joins."""
    li = T(spark, sf_dir, "lineitem").select("l_suppkey", "l_returnflag")
    s = T(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    lin = li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey).join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    )
    bad = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    cat = lin.groupBy(F.col("n_name").alias("supplier_nation")).agg(
        F.sum(1 - bad).cast("bigint").alias("g"),
        F.sum(bad).cast("bigint").alias("b"),
    )
    # bounded cardinality: one row per supplier NATION (25)
    wall = Window.partitionBy()
    m = cat.select(
        "supplier_nation",
        "g",
        "b",
        F.sum("g").over(wall).alias("gg"),
        F.sum("b").over(wall).alias("bb"),
    )
    ratio = (F.col("g").cast("double") * F.col("bb")) / (
        F.col("b").cast("double") * F.col("gg")
    )
    return m.select(
        "supplier_nation",
        F.col("g").alias("n_good"),
        F.col("b").alias("n_bad"),
        F.floor(1_000_000_000.0 * F.log(ratio)).cast("bigint").alias("woe_fp9"),
        F.floor(
            1_000_000_000.0
            * (
                F.col("g").cast("double") / F.col("gg")
                - F.col("b").cast("double") / F.col("bb")
            )
            * F.log(ratio)
        )
        .cast("bigint")
        .alias("iv_term_fp9"),
    )


@register(
    "q_calibration_ece",
    oracle="""
WITH mm AS (
  SELECT MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS lo,
         MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS hi
  FROM orders
),
scored AS (
  SELECT CAST(least(floor(CAST(CAST(o_totalprice AS DECIMAL(18,2)) - m.lo
                               AS DOUBLE)
                          / CAST(m.hi - m.lo AS DOUBLE) * 10), 9) AS BIGINT)
           AS bin,
         CAST(o_totalprice AS DECIMAL(18,2)) - m.lo AS dp,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
         CAST(m.hi - m.lo AS DOUBLE) AS rng
  FROM orders, mm m
),
bins AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS pos,
         CAST(SUM(CAST(dp AS DECIMAL(38,2))) AS DECIMAL(38,2)) AS sdp,
         MIN(rng) AS rng
  FROM scored GROUP BY bin
),
fp AS (
  SELECT bin, n, pos,
         CAST(floor(1000000.0 * pos / n) AS BIGINT) AS acc_fp6,
         CAST(floor(1000000.0 * CAST(sdp AS DOUBLE) / (n * rng))
              AS BIGINT) AS conf_fp6,
         SUM(n) OVER () AS nn
  FROM bins
)
SELECT bin, n, acc_fp6, conf_fp6,
       CAST(floor(CAST(SUM(abs(acc_fp6 - conf_fp6) * n) OVER ()
                       AS DOUBLE) / nn) AS BIGINT) AS ece_fp6
FROM fp
""",
)
def q_calibration_ece(spark, sf_dir):
    """Reliability diagram + expected calibration error for a score against
    a binary outcome — the model-evaluation readout every deployed
    classifier needs. The "score" is the min-max-normalized order price and
    the outcome is fulfilment status; rows land in 10 fixed-width bins, and
    per bin the outcome rate (acc) and mean score (conf) are derived from
    exact sums and floored to fp6; ECE = Σ n_b·|acc_b − conf_b| / N is then
    pure integer arithmetic over the 10-row bin frame (published on every
    row, so the grain stays per-bin). One broadcast min/max probe + one
    shuffle to the bin frame — the corpus is scanned twice and sorted
    never."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
    )
    mm = o.agg(F.min("p").alias("lo"), F.max("p").alias("hi"))
    s = o.crossJoin(F.broadcast(mm)).select(  # 1-row min/max frame
        F.least(
            F.floor(
                (F.col("p") - F.col("lo")).cast("double")
                / (F.col("hi") - F.col("lo")).cast("double")
                * 10
            ),
            F.lit(9),
        )
        .cast("bigint")
        .alias("bin"),
        (F.col("p") - F.col("lo")).alias("dp"),
        "y",
        (F.col("hi") - F.col("lo")).cast("double").alias("rng"),
    )
    bins = s.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
        F.sum(F.col("dp").cast("decimal(38,2)"))
        .cast("decimal(38,2)")
        .alias("sdp"),
        F.min("rng").alias("rng"),
    )
    # bounded cardinality: fixed histogram-bin frame (constant bins)
    wall = Window.partitionBy()
    fp = bins.select(
        "bin",
        "n",
        "pos",
        F.floor(1_000_000.0 * F.col("pos") / F.col("n"))
        .cast("bigint")
        .alias("acc_fp6"),
        F.floor(
            1_000_000.0
            * F.col("sdp").cast("double")
            / (F.col("n") * F.col("rng"))
        )
        .cast("bigint")
        .alias("conf_fp6"),
        F.sum("n").over(wall).alias("nn"),
    )
    return fp.select(
        "bin",
        "n",
        "acc_fp6",
        "conf_fp6",
        F.floor(
            F.sum(
                F.abs(F.col("acc_fp6") - F.col("conf_fp6")) * F.col("n")
            )
            .over(wall)
            .cast("double")
            / F.col("nn")
        )
        .cast("bigint")
        .alias("ece_fp6"),
    )


# Messy-URL construction (deterministic from doc_id/source) — the point is
# the CANONICALIZATION contract, independently implemented in both engines:
# lowercase scheme+host, strip the default :443, drop the fragment, remove
# utm_* tracking params, strip a trailing slash. Spark and DuckDB each parse
# with their own regex engine, so a hash match is a genuine cross-engine
# check of the spec, not a shared-code tautology.
_URL_SPARK = (
    "concat(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END, '://', "
    "CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END, "
    "'.Example.COM', CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END, "
    "'/Articles/', CAST(doc_id % 40 AS STRING), "
    "CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END, "
    "CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&ref=rss' "
    "     WHEN doc_id % 3 = 0 THEN '?ref=rss&utm_campaign=x' ELSE '' END, "
    "CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)"
)
_URL_DUCK = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END || '://' || "
    "CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END || "
    "'.Example.COM' || CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END || "
    "'/Articles/' || CAST(doc_id % 40 AS VARCHAR) || "
    "CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END || "
    "CASE WHEN doc_id % 2 = 0 THEN '?utm_source=feed&ref=rss' "
    "     WHEN doc_id % 3 = 0 THEN '?ref=rss&utm_campaign=x' ELSE '' END || "
    "CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)"
)


@register(
    "q_url_canonical_dedup",
    oracle=f"""
WITH raw AS (SELECT doc_id, {_URL_DUCK} AS u FROM documents),
parts AS (
  SELECT doc_id,
         lower(regexp_extract(u, '^([A-Za-z]+)://', 1)) AS scheme,
         regexp_replace(lower(regexp_extract(u, '^[A-Za-z]+://([^/?#]+)', 1)),
                        ':443$', '') AS host,
         regexp_replace(regexp_extract(u, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1),
                        '/$', '') AS path,
         regexp_replace(regexp_replace(
             regexp_extract(u, '\\?([^#]*)', 1),
             'utm_[^&]*&?', '', 'g'), '&$', '') AS q
  FROM raw
),
canon AS (
  SELECT doc_id,
         scheme || '://' || host || path
           || CASE WHEN q <> '' THEN '?' || q ELSE '' END AS canonical_url
  FROM parts
)
SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(doc_id) AS BIGINT) AS canonical_doc_id
FROM canon GROUP BY 1 HAVING COUNT(*) > 1
""",
)
def q_url_canonical_dedup(spark, sf_dir):
    """URL canonicalization + exact dedup — the first pass of every web-
    corpus pipeline (RefinedWeb/CCNet run exactly this before any content
    dedup): case-fold scheme and host, strip the default https port, drop
    the fragment, remove utm_* tracking parameters, strip a trailing slash;
    then group on the canonical form and keep the smallest doc_id as the
    cluster representative. Pure per-row expressions + one group-by on the
    canonical key: no join, no window, embarrassingly scalable. The messy
    input URLs are constructed deterministically from (doc_id, source) so
    both engines canonicalize the SAME strings with their OWN regex
    engines."""
    d = T(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_URL_SPARK).alias("u")
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
    canon = d.select(
        "doc_id",
        F.concat(
            scheme,
            F.lit("://"),
            host,
            path,
            F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        ).alias("canonical_url"),
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ---------------------------------------------------------------------------
# Class-balance downsampling — deterministic majority-class thinning
# ---------------------------------------------------------------------------

_CB_RATIO = 2  # keep at most RATIO negatives per positive


@register(
    "q_class_downsample",
    oracle=f"""
WITH e AS (
  SELECT event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
),
cls AS (
  SELECT CAST(SUM(label) AS BIGINT) AS n_pos,
         CAST(SUM(1 - label) AS BIGINT) AS n_neg
  FROM e
),
keep AS (
  SELECT label,
         CASE WHEN label = 1 THEN 1
              WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                        AS BIGINT) * n_neg
                   < 4294967296 * least(n_neg, {_CB_RATIO} * n_pos)
              THEN 1 ELSE 0 END AS kept
  FROM e CROSS JOIN cls
)
SELECT CAST(label AS BIGINT) AS label,
       CAST(COUNT(*) AS BIGINT) AS n_before,
       CAST(SUM(kept) AS BIGINT) AS n_after
FROM keep GROUP BY label
""",
)
def q_class_downsample(spark, sf_dir):
    """Deterministic majority-class downsampling to a bounded
    negative:positive ratio — the class-imbalance fix applied before
    training a rare-event model. Every positive survives; negatives pass a
    cross-multiplied md5-threshold test with a DATA-DRIVEN rate
    ``min(n_neg, RATIO·n_pos)/n_neg`` (the q_temperature_mix membership
    idiom: reproducible across runs, engines, and repartitioning — no RNG,
    no global sort, no exact-k shuffle). Emits the per-class before/after
    audit.

    Scale shape: one map-side-combined class-count aggregate broadcasts
    into a second linear pass — the corpus never shuffles (same accepted
    2-scan shape as the percentile gate / calibration probes)."""
    e = T(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    cls = e.agg(
        F.sum("label").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("label")).cast("bigint").alias("n_neg"),
    )
    u32 = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    kept = F.when(F.col("label") == 1, 1).otherwise(
        F.when(
            u32 * F.col("n_neg")
            < F.lit(4294967296)
            * F.least(F.col("n_neg"), F.lit(_CB_RATIO) * F.col("n_pos")),
            1,
        ).otherwise(0)
    )
    return (
        e.crossJoin(F.broadcast(cls))
        .select("label", kept.alias("kept"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_before"),
            F.sum("kept").cast("bigint").alias("n_after"),
        )
        .select(F.col("label").cast("bigint").alias("label"), "n_before", "n_after")
    )


# ---------------------------------------------------------------------------
# Group-aware K-fold assignment with leakage audit
# ---------------------------------------------------------------------------

_GKF_FOLDS = 5


@register(
    "q_group_kfold",
    oracle=f"""
WITH e AS (
  SELECT user_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
  FROM events
),
uf AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
              AS BIGINT) % {_GKF_FOLDS} AS fold,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(label) AS BIGINT) AS npos
  FROM e GROUP BY 1, 2
),
aud AS (
  SELECT CAST(COALESCE(SUM(CASE WHEN nf > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS groups_spanning_folds
  FROM (SELECT user_id, COUNT(*) AS nf FROM uf GROUP BY user_id)
)
SELECT CAST(uf.fold AS BIGINT) AS fold,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(uf.n) AS BIGINT) AS n_rows,
       CAST(SUM(uf.npos) AS BIGINT) AS n_pos,
       CAST(SUM(uf.npos) AS DOUBLE) / SUM(uf.n) AS pos_share,
       aud.groups_spanning_folds
FROM uf CROSS JOIN aud
GROUP BY uf.fold, aud.groups_spanning_folds
""",
)
def q_group_kfold(spark, sf_dir):
    """Group-aware K-fold split (sklearn's GroupKFold contract, made
    deterministic): every row of a group (user) lands in the SAME fold, so
    cross-validation never trains on one of a user's events and validates
    on another — the standard leakage trap for per-user features. Fold =
    md5(user_id) first-8-hex mod {_GKF_FOLDS} (the established engine-
    portable uniform — no RNG, stable across runs/partitionings), and the
    no-leakage property is AUDITED from the data, not assumed:
    ``groups_spanning_folds`` counts users observed in more than one fold
    (structurally 0 here, but the audit catches a future non-functional
    fold source). Per-fold balance (rows, groups, positive share) is the
    witness that hash folding is approximately stratified.

    Scale shape: one user-keyed map-side-combined aggregate collapses the
    corpus to the (user, fold) frame; the spanning audit and the per-fold
    rollup both run on that user-sized frame (the audit broadcasts back as
    a 1-row constant). No corpus self-join, no window over rows, and the
    only double is the final pos_share division of two exact BIGINTs."""
    e = T(spark, sf_dir, "events").select(
        "user_id",
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("label"),
    )
    fold = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % _GKF_FOLDS
    )
    uf = (
        e.withColumn("fold", fold)
        .groupBy("user_id", "fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("label").cast("bigint").alias("npos"),
        )
        .transform(persisted)  # user-sized; consumers: fold rollup + audit
    )
    aud = (
        uf.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("nf"))
        .agg(
            F.coalesce(F.sum((F.col("nf") > 1).cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias("groups_spanning_folds")
        )
    )
    return (
        uf.groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum("npos").cast("bigint").alias("n_pos"),
        )
        .crossJoin(F.broadcast(aud))
        .select(
            F.col("fold").cast("bigint").alias("fold"),
            "n_groups",
            "n_rows",
            "n_pos",
            (F.col("n_pos").cast("double") / F.col("n_rows")).alias("pos_share"),
            "groups_spanning_folds",
        )
    )
