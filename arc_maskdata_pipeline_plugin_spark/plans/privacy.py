"""Privacy-risk queries: k-anonymity / l-diversity audits + enforcement.

Ties the masking engine's column-level treatments (``MaskDataPlugin.scala``)
to table-level re-identification risk: after masking/generalizing, is the
released table actually safe to publish? QI choice below mirrors the classic
census-style setup — a geography (nation), a category (market segment), and
a banded numeric (account balance).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..cache import persisted
from ..operators.privacy import (
    band,
    k_anonymity_audit,
    l_diversity_audit,
    suppress_small_classes,
    t_closeness_audit,
)
from .registry import T, dec, register

_K = 5
_L = 3


@register(
    "q_k_anonymity_audit",
    oracle=f"""
SELECT c_nationkey,
       c_mktsegment,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       COUNT(*) >= {_K} AS is_k_anonymous
FROM customer
GROUP BY c_nationkey, c_mktsegment, floor(c_acctbal / 1000)
""",
)
def q_k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit of the customer table under the QI tuple
    (nation, market segment, account-balance band): one row per equivalence
    class with its size and releasability at k=5. Exactly one map-side-
    combined hash aggregate — the cheapest possible full-table risk
    statistic, no joins or windows (see ``operators/privacy.py``)."""
    cust = T(spark, sf_dir, "customer").withColumn(
        "bal_band", band("c_acctbal", 1000)
    )
    return k_anonymity_audit(
        cust.select("c_nationkey", "c_mktsegment", "bal_band"),
        ["c_nationkey", "c_mktsegment", "bal_band"],
        _K,
    )


@register(
    "q_l_diversity_audit",
    oracle=f"""
SELECT c_nationkey,
       CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive,
       COUNT(DISTINCT c_mktsegment) >= {_L} AS is_l_diverse
FROM customer
GROUP BY c_nationkey, floor(c_acctbal / 1000)
""",
)
def q_l_diversity_audit(spark, sf_dir):
    """Distinct l-diversity audit with market segment as the sensitive
    attribute and (nation, balance band) as the QI: a class that is
    k-anonymous but single-segment still leaks every member's segment (the
    homogeneity attack). One hash aggregate with an exact COUNT(DISTINCT)."""
    cust = T(spark, sf_dir, "customer").withColumn(
        "bal_band", band("c_acctbal", 1000)
    )
    return l_diversity_audit(
        cust.select("c_nationkey", "bal_band", "c_mktsegment"),
        ["c_nationkey", "bal_band"],
        "c_mktsegment",
        _L,
    )


@register(
    "q_k_anonymity_suppress",
    oracle=f"""
WITH sized AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS class_n
  FROM customer
)
SELECT c_custkey,
       CASE WHEN class_n >= {_K} THEN CAST(c_nationkey AS VARCHAR) ELSE '*' END
         AS c_nationkey,
       CASE WHEN class_n >= {_K} THEN c_mktsegment ELSE '*' END
         AS c_mktsegment,
       class_n >= {_K} AS is_released
FROM sized
""",
)
def q_k_anonymity_suppress(spark, sf_dir):
    """k-anonymity ENFORCEMENT: records whose (nation, segment) equivalence
    class has fewer than k=5 members get their QI columns suppressed to '*';
    all other records release their QI values unchanged. One co-partitioned
    window shuffle with no sort (unordered COUNT frame) — policy application
    costs the same single shuffle as the audit."""
    cust = T(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    out = suppress_small_classes(cust, ["c_nationkey", "c_mktsegment"], _K)
    return out.select("c_custkey", "c_nationkey", "c_mktsegment", "is_released")


# ---------------------------------------------------------------------------
# Referential-integrity-preserving pseudonymization (round 4, cont.)
# ---------------------------------------------------------------------------

_PSEUDO_SQL = "CAST(('0x' || substr(md5('cust:' || CAST({col} AS VARCHAR)), 1, 12)) AS BIGINT)"


def _pseudo_spark(col: str):
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("cust:"), F.col(col).cast("string"))), 1, 12), 16, 10)
        .cast("bigint")
    )


@register(
    "q_pseudonymize_referential",
    oracle=f"""
WITH pc AS (
  SELECT {_PSEUDO_SQL.format(col='c_custkey')} AS pseudo_id, c_mktsegment
  FROM customer
),
po AS (
  SELECT {_PSEUDO_SQL.format(col='o_custkey')} AS pseudo_id,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
)
SELECT pc.c_mktsegment,
       CAST(COUNT(DISTINCT pc.pseudo_id) AS BIGINT) AS n_pseudonyms,
       CAST(COUNT(po.pseudo_id) AS BIGINT) AS n_orders,
       CAST(SUM(po.price) AS DOUBLE) AS revenue
FROM pc LEFT JOIN po ON pc.pseudo_id = po.pseudo_id
GROUP BY pc.c_mktsegment
""",
)
def q_pseudonymize_referential(spark, sf_dir):
    """Referential-integrity-preserving pseudonymization: the SAME
    deterministic pseudonym function (48-bit md5 tag — at 100 TB key scales
    swap in the KDF-backed hashLong at the identical seam) applied to
    ``customer.c_custkey`` AND ``orders.o_custkey``, after which the tables
    still JOIN — the property that makes a masked warehouse analytically
    useful. The query audits exactly that: per-segment order counts and
    revenue through the PSEUDONYM join equal the plaintext-key numbers, and
    ``n_pseudonyms`` equals the segment's customer count (collision
    witness). One key shuffle, as the plaintext join would pay."""
    cust = T(spark, sf_dir, "customer").select(
        _pseudo_spark("c_custkey").alias("pseudo_id"), "c_mktsegment"
    )
    orders = T(spark, sf_dir, "orders").select(
        _pseudo_spark("o_custkey").alias("pseudo_id"),
        dec("o_totalprice", 18, 2).alias("price"),
    )
    from pyspark.sql import functions as _F

    return (
        cust.join(orders, "pseudo_id", "left")
        .groupBy("c_mktsegment")
        .agg(
            _F.countDistinct("pseudo_id").cast("bigint").alias("n_pseudonyms"),
            _F.count("price").cast("bigint").alias("n_orders"),
            _F.sum("price").cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Laplace-mechanism noisy counts (seeded/test-mode)
# ---------------------------------------------------------------------------


@register(
    "q_dp_noisy_counts",
    oracle="""
WITH g AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS true_n FROM customer
  GROUP BY c_nationkey
),
u AS (
  SELECT c_nationkey, true_n,
         (CAST(('0x' || substr(md5('dp:' || CAST(c_nationkey AS VARCHAR)), 1, 8)) AS BIGINT)
          + 0.5) / 4294967296.0 AS uni
  FROM g
)
SELECT c_nationkey, true_n,
       CAST(floor((true_n + (CASE WHEN uni < 0.5 THEN 1.0 ELSE -1.0 END)
            * ln(1.0 - 2.0 * abs(uni - 0.5))) * 1000000) AS BIGINT) AS noisy_n_fp6
FROM u
""",
)
def q_dp_noisy_counts(spark, sf_dir):
    """Laplace-mechanism noisy counts (epsilon = 1, sensitivity 1): per-nation
    customer counts plus Laplace(1) noise drawn by inverse-CDF from a
    DETERMINISTIC md5-seeded uniform — this is the TEST-MODE of the
    mechanism (reproducible, so the gate can hash-match the entire noise
    path cross-engine); production differential privacy swaps the seeded
    uniform for ``SecureRandom`` at the same expression seam, exactly as the
    mask functions swap deterministic for SecureRandom digests. The noise
    injection is a per-row scalar on the AGGREGATED frame — one
    map-side-combined count, zero extra shuffles."""
    g = (
        T(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
    )
    uni = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dp:"), F.col("c_nationkey").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    noise = F.when(uni < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0)) * F.log(
        F.lit(1.0) - F.lit(2.0) * F.abs(uni - F.lit(0.5))
    )
    return g.select(
        "c_nationkey",
        "true_n",
        F.floor((F.col("true_n") + noise) * F.lit(1_000_000))
        .cast("bigint")
        .alias("noisy_n_fp6"),
    )


@register(
    "q_gdpr_erasure_audit",
    oracle="""
WITH requesters AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'signup' AND value < 0.5
),
a AS (
  SELECT 'events' AS tbl,
         CAST(COUNT(*) AS BIGINT) AS rows_before,
         CAST(COUNT(*) FILTER (WHERE user_id NOT IN (SELECT user_id FROM requesters)) AS BIGINT) AS rows_after
  FROM events
  UNION ALL
  SELECT 'orders',
         CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE o_custkey NOT IN (SELECT user_id FROM requesters)) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'customer',
         CAST(COUNT(*) AS BIGINT),
         CAST(COUNT(*) FILTER (WHERE c_custkey NOT IN (SELECT user_id FROM requesters)) AS BIGINT)
  FROM customer
)
SELECT tbl, rows_before, rows_after,
       rows_before - rows_after AS rows_erased,
       CAST(0 AS BIGINT) AS remaining_linked
FROM a
""",
)
def q_gdpr_erasure_audit(spark, sf_dir):
    """Right-to-be-forgotten propagation: a deletion-request set (derived
    deterministically from the data — users whose signup carried a
    sub-threshold value) is erased from every table it links to, and the
    audit proves it: per-table before/after/erased counts plus a
    ``remaining_linked`` recount over the RETAINED rows, which must be 0.

    Scale shape: the requester set is user-sized (tiny vs the fact tables),
    so every erasure is a broadcast LEFT ANTI join — each fact table is
    scanned exactly once, never shuffled on the key, and the audit counts
    ride the same scan as single-row aggregates. This is the GDPR-pass plan
    that works when `events` is 100 TB: deletion cost is proportional to
    the data read, with no join shuffle and no second pass per table."""
    e = T(spark, sf_dir, "events")
    requesters = (
        e.filter((F.col("event_type") == "signup") & (F.col("value") < 0.5))
        .select("user_id")
        .distinct()
    )

    def erase(df, tbl, key):
        kept = df.join(
            F.broadcast(requesters), df[key] == requesters["user_id"], "left_anti"
        )
        leaked = kept.join(
            F.broadcast(requesters), kept[key] == requesters["user_id"], "left_semi"
        )
        return (
            df.agg(F.count(F.lit(1)).cast("bigint").alias("rows_before"))
            .crossJoin(
                kept.agg(F.count(F.lit(1)).cast("bigint").alias("rows_after"))
            )
            .crossJoin(
                leaked.agg(
                    F.count(F.lit(1)).cast("bigint").alias("remaining_linked")
                )
            )
            .select(
                F.lit(tbl).alias("tbl"),
                "rows_before",
                "rows_after",
                (F.col("rows_before") - F.col("rows_after")).alias("rows_erased"),
                "remaining_linked",
            )
        )

    return (
        erase(e, "events", "user_id")
        .unionAll(erase(T(spark, sf_dir, "orders"), "orders", "o_custkey"))
        .unionAll(erase(T(spark, sf_dir, "customer"), "customer", "c_custkey"))
    )


_T_FP9 = 300_000_000  # t = 0.30


@register(
    "q_t_closeness_audit",
    oracle=f"""
WITH cls AS (
  SELECT c_nationkey, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cs
  FROM customer GROUP BY 1, 2, 3
),
totals AS (
  SELECT c_nationkey, bal_band, CAST(SUM(n_cs) AS BIGINT) AS n_c
  FROM cls GROUP BY 1, 2
),
marg AS (
  SELECT c_mktsegment, CAST(SUM(n_cs) AS BIGINT) AS n_gs FROM cls GROUP BY 1
),
ntot AS (SELECT CAST(SUM(n_gs) AS BIGINT) AS n_g FROM marg),
grid AS (
  SELECT t.c_nationkey, t.bal_band, t.n_c, m.c_mktsegment, m.n_gs,
         COALESCE(c.n_cs, 0) AS n_cs
  FROM totals t CROSS JOIN marg m
  LEFT JOIN cls c ON c.c_nationkey = t.c_nationkey
                 AND c.bal_band = t.bal_band
                 AND c.c_mktsegment = m.c_mktsegment
),
agg AS (
  SELECT c_nationkey, bal_band, n_c, n_g,
         SUM(abs(CAST(n_cs AS DECIMAL(38,0)) * n_g
                 - CAST(n_gs AS DECIMAL(38,0)) * n_c)) AS tvd_num
  FROM grid CROSS JOIN ntot
  GROUP BY 1, 2, 3, 4
)
SELECT c_nationkey, bal_band, CAST(n_c AS BIGINT) AS n,
       CAST(floor(CAST(tvd_num AS DOUBLE) * 1000000000.0
                  / (2.0 * n_c * n_g)) AS BIGINT) AS tvd_fp9,
       CAST(floor(CAST(tvd_num AS DOUBLE) * 1000000000.0
                  / (2.0 * n_c * n_g)) AS BIGINT) <= {_T_FP9} AS is_t_close
FROM agg
""",
)
def q_t_closeness_audit(spark, sf_dir):
    """t-closeness audit (t = 0.30) completing the k-anonymity /
    l-diversity / t-closeness release-risk triple: per (nation, balance-band)
    class, the total-variation distance between the class's market-segment
    distribution and the global one, computed entirely in exact integers over
    a common denominator (see ``operators/privacy.py::t_closeness_audit``)."""
    cust = T(spark, sf_dir, "customer").withColumn(
        "bal_band", band("c_acctbal", 1000)
    )
    return t_closeness_audit(
        cust.select("c_nationkey", "bal_band", "c_mktsegment"),
        ["c_nationkey", "bal_band"],
        "c_mktsegment",
        _T_FP9,
    )


_DPQ_BINS = 64


@register(
    "q_dp_quantile",
    oracle=f"""
WITH mm AS (
  SELECT MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS lo,
         MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS hi
  FROM orders
),
binned AS (
  SELECT CAST(least(floor(CAST(CAST(o_totalprice AS DECIMAL(18,2)) - m.lo
                               AS DOUBLE)
                          / CAST(m.hi - m.lo AS DOUBLE) * {_DPQ_BINS}),
                    {_DPQ_BINS - 1}) AS BIGINT) AS bin,
         m.lo AS lo, m.hi AS hi
  FROM orders, mm m
),
hist AS (
  SELECT bin, MIN(lo) AS lo, MIN(hi) AS hi,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM binned GROUP BY bin
),
noisy AS (
  SELECT bin, lo, hi, n,
         n + (CASE WHEN uni < 0.5 THEN 1.0 ELSE -1.0 END)
             * ln(1.0 - 2.0 * abs(uni - 0.5)) AS noisy_n
  FROM (
    SELECT *,
           (CAST(('0x' || substr(md5('dpq:' || CAST(bin AS VARCHAR)), 1, 8))
                 AS BIGINT) + 0.5) / 4294967296.0 AS uni
    FROM hist
  )
),
cum AS (
  SELECT bin, lo, hi, n,
         SUM(noisy_n) OVER (ORDER BY bin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
         SUM(noisy_n) OVER () AS tot,
         SUM(n) OVER () AS nn
  FROM noisy
)
SELECT CAST(MIN(nn) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN c >= 0.5 * tot THEN bin END) AS BIGINT)
         AS dp_median_bin,
       CAST(MIN(CASE WHEN c >= 0.5 * tot THEN
              floor((CAST(lo AS DOUBLE)
                     + CAST(hi - lo AS DOUBLE) * (bin + 1) / {_DPQ_BINS})
                    * 100) END) AS BIGINT) AS dp_median_hi_cents
FROM cum
""",
)
def q_dp_quantile(spark, sf_dir):
    """Differentially-private median via the noisy-histogram mechanism: bin
    the metric into 64 fixed-width buckets, add Laplace(1/ε) noise
    to every bucket count, then walk the noisy CDF to the 50% point and
    release that bucket's upper edge. The histogram mechanism is the
    workhorse DP quantile (each count has sensitivity 1, the released edge
    is data-independent given the noisy counts). Noise is drawn by
    inverse-CDF from a DETERMINISTIC md5-seeded uniform — the same test-mode
    seam as q_dp_noisy_counts: production swaps in SecureRandom at the same
    expression, nothing else changes.

    Scale shape: one broadcast min/max probe, one shuffle to the
    64-row histogram frame; the noisy-CDF walk is a cumulative
    window over those 64 rows. The corpus is never sorted (an
    exact DP quantile via the exponential mechanism would need the full
    order statistics; the histogram trades resolution for one aggregate)."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("p")
    )
    mm = o.agg(F.min("p").alias("lo"), F.max("p").alias("hi"))
    binned = o.crossJoin(F.broadcast(mm)).select(  # 1-row min/max frame
        F.least(
            F.floor(
                (F.col("p") - F.col("lo")).cast("double")
                / (F.col("hi") - F.col("lo")).cast("double")
                * _DPQ_BINS
            ),
            F.lit(_DPQ_BINS - 1),
        )
        .cast("bigint")
        .alias("bin"),
        "lo",
        "hi",
    )
    hist = binned.groupBy("bin").agg(
        F.min("lo").alias("lo"),
        F.min("hi").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    uni = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dpq:"), F.col("bin").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    noise = F.when(uni < 0.5, F.lit(1.0)).otherwise(F.lit(-1.0)) * F.log(
        F.lit(1.0) - F.lit(2.0) * F.abs(uni - F.lit(0.5))
    )
    noisy = hist.select(
        "bin", "lo", "hi", "n", (F.col("n") + noise).alias("noisy_n")
    )
    from pyspark.sql import Window as W

    wc = W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    wall = W.partitionBy()
    cum = noisy.select(
        "bin",
        "lo",
        "hi",
        "n",
        F.sum("noisy_n").over(wc).alias("c"),
        F.sum("noisy_n").over(wall).alias("tot"),
        F.sum("n").over(wall).alias("nn"),
    )
    hit = F.when(F.col("c") >= 0.5 * F.col("tot"), F.col("bin"))
    edge = F.when(
        F.col("c") >= 0.5 * F.col("tot"),
        F.floor(
            (
                F.col("lo").cast("double")
                + (F.col("hi") - F.col("lo")).cast("double")
                * (F.col("bin") + 1)
                / _DPQ_BINS
            )
            * 100
        ),
    )
    return cum.agg(
        F.min("nn").cast("bigint").alias("n"),
        F.min(hit).cast("bigint").alias("dp_median_bin"),
        F.min(edge).cast("bigint").alias("dp_median_hi_cents"),
    )


# ---------------------------------------------------------------------------
# Local differential privacy: k-ary randomized response frequency estimation
# ---------------------------------------------------------------------------
#
# eps = ln 3 keeps every probability RATIONAL: report the true value with
# p = 3/(k+2), any specific other value with q = 1/(k+2) — so the unbiased
# estimator collapses to integers: pi_hat = (obs*(k+2) - n) / (2n).
# The per-report "randomness" is md5-derived (deterministic, engine-
# identical, and uniform enough for the mechanism's unbiasedness audit;
# production swaps SecureRandom per report — same plan, different column).


@register(
    "q_ldp_frequency",
    oracle="""
WITH types AS (
  SELECT list_sort(list(DISTINCT event_type)) AS ts_all,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
),
rep AS (
  SELECT e.event_type AS true_v,
         CASE WHEN CAST(('0x' || substr(md5('keep:' || CAST(e.event_id AS VARCHAR)), 1, 8))
                        AS BIGINT) * (t.k + 2) < 4294967296 * 3
              THEN e.event_type
              ELSE t.ts_all[
                CAST(1 + (CAST(('0x' || substr(md5('pick:' || CAST(e.event_id AS VARCHAR)), 1, 8))
                               AS BIGINT) % (t.k - 1)
                          + CASE WHEN t.ts_all[
                                CAST(1 + CAST(('0x' || substr(md5('pick:' || CAST(e.event_id AS VARCHAR)), 1, 8))
                                              AS BIGINT) % (t.k - 1) AS INTEGER)]
                                >= e.event_type THEN 1 ELSE 0 END) AS INTEGER)]
         END AS reported
  FROM events e CROSS JOIN types t
),
agg AS (
  SELECT v AS event_type,
         CAST(SUM(is_t) AS BIGINT) AS n_true,
         CAST(SUM(is_r) AS BIGINT) AS n_reported
  FROM (
    SELECT true_v AS v, 1 AS is_t, 0 AS is_r FROM rep
    UNION ALL
    SELECT reported AS v, 0 AS is_t, 1 AS is_r FROM rep
  ) GROUP BY v
)
SELECT a.event_type, a.n_true, a.n_reported,
       CAST(floor(1000000.0 * (a.n_reported * (t2.k + 2) - t2.n)
                  / (2.0 * t2.n)) AS BIGINT) AS est_share_fp6,
       CAST(floor(1000000.0 * a.n_true / t2.n) AS BIGINT) AS true_share_fp6
FROM agg a CROSS JOIN types t2
""",
)
def q_ldp_frequency(spark, sf_dir):
    """Local-DP frequency estimation via k-ary randomized response
    (Warner 1965 / generalized RR): each report keeps its true event type
    with probability ``3/(k+2)`` (ε = ln 3) or substitutes one of the k−1
    other types uniformly; the server-side unbiased estimator is the pure
    integer ``π̂ = (obs·(k+2) − n)/(2n)``. Emitted next to the true share,
    the query IS the mechanism's unbiasedness audit — estimates track true
    shares while every individual report is ε-deniable. Flip/pick decisions
    are cross-multiplied md5 thresholds (engine-identical; production swaps
    a SecureRandom column into the same plan).

    Scale shape: ONE O(1)-row stats probe over the corpus (sorted type
    array + k + n, broadcast twice) and ONE mechanism pass — a linear
    projection into a map-side-combined conditional aggregate over |types|
    cells. Two scans total; no corpus shuffle beyond the |types|-cell agg."""
    e = T(spark, sf_dir, "events").select("event_id", "event_type")
    # one-row stats probe, persisted so BOTH broadcast consumers (mechanism
    # pass + estimator projection) share a single corpus scan
    types = persisted(
        e.agg(
            F.sort_array(F.collect_set("event_type")).alias("ts_all"),
            F.count_distinct("event_type").cast("bigint").alias("k"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    u_keep = F.conv(
        F.substring(F.md5(F.concat(F.lit("keep:"), F.col("event_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    u_pick = F.conv(
        F.substring(F.md5(F.concat(F.lit("pick:"), F.col("event_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    # uniform index over the k-1 OTHER types: draw in [0, k-2], then shift
    # past the true value's sorted position to exclude it
    raw_idx = (u_pick % (F.col("k") - 1)).cast("int")
    picked_raw = F.element_at(F.col("ts_all"), raw_idx + 1)
    shift = F.when(picked_raw >= F.col("event_type"), 1).otherwise(0)
    reported = F.when(
        u_keep * (F.col("k") + 2) < F.lit(4294967296) * 3, F.col("event_type")
    ).otherwise(F.element_at(F.col("ts_all"), raw_idx + shift + 1))
    rep = e.crossJoin(F.broadcast(types.select("ts_all", "k"))).select(
        F.col("event_type").alias("true_v"),
        reported.alias("reported"),
    )
    # 2× role explode (true tally + report tally in ONE corpus pass) — a
    # per-type cell explode would multiply the corpus by k before combine
    pairs = rep.select(
        F.explode(
            F.array(
                F.struct(F.col("true_v").alias("v"), F.lit(1).alias("is_t"), F.lit(0).alias("is_r")),
                F.struct(F.col("reported").alias("v"), F.lit(0).alias("is_t"), F.lit(1).alias("is_r")),
            )
        ).alias("x")
    ).select("x.v", "x.is_t", "x.is_r")
    agg = pairs.groupBy(F.col("v").alias("event_type")).agg(
        F.sum("is_t").cast("bigint").alias("n_true"),
        F.sum("is_r").cast("bigint").alias("n_reported"),
    )
    return (
        agg.crossJoin(F.broadcast(types.select("k", "n")))
        .select(
            "event_type",
            "n_true",
            "n_reported",
            F.floor(
                1_000_000.0
                * (F.col("n_reported") * (F.col("k") + 2) - F.col("n"))
                / (2.0 * F.col("n"))
            )
            .cast("bigint")
            .alias("est_share_fp6"),
            F.floor(1_000_000.0 * F.col("n_true") / F.col("n"))
            .cast("bigint")
            .alias("true_share_fp6"),
        )
    )


# ---------------------------------------------------------------------------
# Generalization-lattice advisor: minimal generalization meeting k (r09).
# ---------------------------------------------------------------------------

_GEN_K = 5
_GEN_SUPP_PCT = 1  # residual suppression budget: <= 1% of rows

# (geo_level, geo expression) and (bal_level, bal expression) ladders; the
# lattice is their cross product. Region comes from the broadcast nation dim.
_GEO_DUCK = {
    0: "CAST(c_nationkey AS VARCHAR)",
    1: "CAST(n_regionkey AS VARCHAR)",
    2: "'*'",
}
_BAL_DUCK = {
    0: "CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR)",
    1: "CAST(CAST(floor(c_acctbal / 5000) AS BIGINT) AS VARCHAR)",
    2: "'*'",
}


def _gen_advisor_oracle() -> str:
    nodes = " UNION ALL ".join(
        f"SELECT {g} AS geo_level, {b} AS bal_level, "
        f"{_GEO_DUCK[g]} AS geo, c_mktsegment AS seg, {_BAL_DUCK[b]} AS bal "
        f"FROM j"
        for g in _GEO_DUCK
        for b in _BAL_DUCK
    )
    return f"""
WITH j AS (
  SELECT c.c_nationkey, c.c_mktsegment, c.c_acctbal, n.n_regionkey
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
),
nodes AS ({nodes}),
classes AS (
  SELECT geo_level, bal_level, geo, seg, bal,
         CAST(COUNT(*) AS BIGINT) AS cls_n
  FROM nodes GROUP BY geo_level, bal_level, geo, seg, bal
),
per_node AS (
  SELECT geo_level, bal_level,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(CASE WHEN cls_n < {_GEN_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating_classes,
         CAST(SUM(CASE WHEN cls_n < {_GEN_K} THEN cls_n ELSE 0 END) AS BIGINT)
           AS n_suppressed_rows,
         CAST(SUM(cls_n) AS BIGINT) AS n_rows
  FROM classes GROUP BY geo_level, bal_level
),
ranked AS (
  SELECT *,
         CASE WHEN n_suppressed_rows * 100 <= n_rows * {_GEN_SUPP_PCT}
              THEN 0 ELSE 1 END AS over_budget,
         geo_level + bal_level AS height
  FROM per_node
)
SELECT CAST(geo_level AS BIGINT) AS geo_level,
       CAST(bal_level AS BIGINT) AS bal_level,
       n_classes, n_violating_classes, n_suppressed_rows,
       CAST(CASE WHEN over_budget = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS within_suppression_budget,
       CAST(RANK() OVER (ORDER BY over_budget, height, n_suppressed_rows,
                                  geo_level, bal_level) AS BIGINT)
         AS advisor_rank
FROM ranked
"""


@register("q_generalization_advisor", oracle=_gen_advisor_oracle())
def q_generalization_advisor(spark, sf_dir):
    """Generalization-LATTICE advisor (r09): which generalization of the QI
    tuple (geography, segment, balance) is the MINIMAL one releasable at
    k = {k} with residual suppression ≤ {s}% — the planning step before
    ``q_k_anonymity_suppress`` enforces anything. The lattice crosses a
    geography ladder (nation → region → '*') with a balance ladder ($1 000
    bands → $5 000 bands → '*'); each of the 9 nodes reports its class
    count, violating classes, and rows a suppression pass would redact;
    ``advisor_rank`` orders nodes by (within-budget, generalization height,
    suppressed rows), so rank 1 is the release policy to adopt — the same
    measure-then-recommend shape as ``q_layout_advisor``.

    Scale shape: one customer scan (broadcast nation dim) stacked 9×, one
    hash aggregate to class grain, one 9-row rollup and rank — the full
    lattice evaluation costs one shuffle more than a single k-anonymity
    audit, not 9 table scans.""".format(k=_GEN_K, s=_GEN_SUPP_PCT)
    from pyspark.sql import Window

    cust = T(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    nat = T(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    j = cust.join(
        F.broadcast(nat), cust.c_nationkey == nat.n_nationkey
    ).select("c_nationkey", "c_mktsegment", "c_acctbal", "n_regionkey")
    geo_spark = {
        0: "cast(c_nationkey as string)",
        1: "cast(n_regionkey as string)",
        2: "'*'",
    }
    bal_spark = {
        0: "cast(cast(floor(c_acctbal / 1000) as bigint) as string)",
        1: "cast(cast(floor(c_acctbal / 5000) as bigint) as string)",
        2: "'*'",
    }
    stack_args = ", ".join(
        f"{g}, {b}, {geo_spark[g]}, {bal_spark[b]}"
        for g in geo_spark
        for b in bal_spark
    )
    nodes = j.selectExpr(
        f"stack(9, {stack_args}) AS (geo_level, bal_level, geo, bal)",
        "c_mktsegment AS seg",
    )
    classes = nodes.groupBy("geo_level", "bal_level", "geo", "seg", "bal").agg(
        F.count(F.lit(1)).cast("bigint").alias("cls_n")
    )
    per_node = classes.groupBy("geo_level", "bal_level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(F.when(F.col("cls_n") < _GEN_K, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_classes"),
        F.sum(F.when(F.col("cls_n") < _GEN_K, F.col("cls_n")).otherwise(0))
        .cast("bigint")
        .alias("n_suppressed_rows"),
        F.sum("cls_n").cast("bigint").alias("n_rows"),
    )
    ranked = per_node.withColumn(
        "over_budget",
        F.when(
            F.col("n_suppressed_rows") * 100 <= F.col("n_rows") * _GEN_SUPP_PCT, 0
        ).otherwise(1),
    ).withColumn("height", F.col("geo_level") + F.col("bal_level"))
    # bounded cardinality: the 9-node generalization lattice, a constant
    w = Window.orderBy(
        "over_budget", "height", "n_suppressed_rows", "geo_level", "bal_level"
    )
    return ranked.select(
        F.col("geo_level").cast("bigint").alias("geo_level"),
        F.col("bal_level").cast("bigint").alias("bal_level"),
        "n_classes",
        "n_violating_classes",
        "n_suppressed_rows",
        F.when(F.col("over_budget") == 0, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("within_suppression_budget"),
        F.rank().over(w).cast("bigint").alias("advisor_rank"),
    )


_DP_TOPK = 3
_DP_EPS = 1.0  # epsilon per selection; sensitivity of a count utility = 1


@register(
    "q_dp_topk_exponential",
    oracle=f"""
WITH g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_n
  FROM events GROUP BY event_type
),
noisy AS (
  SELECT event_type, true_n,
         -- md5-seeded uniform in (0,1), then Gumbel g = -ln(-ln(u));
         -- noisy score = eps*u/2 + Gumbel (the Gumbel-max trick makes one
         -- ranking equal iterated exponential-mechanism peeling)
         CAST(floor((
           {_DP_EPS} * true_n / 2.0
           - ln(-ln((CAST(('0x' || substr(md5('dptopk:' || event_type), 1, 8))
                     AS BIGINT) + 0.5) / 4294967296.0))
         ) * 1000000) AS BIGINT) AS noisy_score_fp6
  FROM g
)
SELECT event_type, true_n, noisy_score_fp6,
       CAST(rnk AS BIGINT) AS rank,
       CAST(CASE WHEN rnk <= {_DP_TOPK} THEN 1 ELSE 0 END AS BIGINT)
         AS selected
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY noisy_score_fp6 DESC, event_type)
            AS rnk
  FROM noisy
) z
""",
)
def q_dp_topk_exponential(spark, sf_dir):
    """Differentially-private top-k selection via the exponential
    mechanism (McSherry-Talwar 2007), implemented with the Gumbel-max
    trick: ranking every candidate once by ε·u/2 + Gumbel noise is
    distributionally IDENTICAL to iteratively applying the exponential
    mechanism without replacement (Durfee-Rogers, NeurIPS 2019) — so the
    k-fold peel collapses to ONE window over the |event types| frame. As
    in q_dp_noisy_counts, the Gumbel draw uses a DETERMINISTIC md5-seeded
    uniform in test mode (the whole mechanism hash-matches cross-engine);
    production swaps SecureRandom into the same expression seam. Ranking
    compares the fp6-FLOORED noisy scores (+ type tie-break) so the order
    is engine-stable. One map-side-combined count, then type-frame-only
    work."""
    from pyspark.sql import Window

    g = (
        T(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
    )
    uni = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dptopk:"), F.col("event_type"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    noisy = g.select(
        "event_type",
        "true_n",
        F.floor(
            (
                F.lit(_DP_EPS) * F.col("true_n") / F.lit(2.0)
                - F.log(-F.log(uni))
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("noisy_score_fp6"),
    )
    # bounded cardinality: one row per event TYPE (small domain)
    w = Window.orderBy(F.desc("noisy_score_fp6"), F.asc("event_type"))
    return noisy.withColumn("rnk", F.row_number().over(w)).select(
        "event_type",
        "true_n",
        "noisy_score_fp6",
        F.col("rnk").cast("bigint").alias("rank"),
        F.when(F.col("rnk") <= _DP_TOPK, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("selected"),
    )
