"""Classifier-evaluation metrics, exact and engine-stable (oracle-checked).

A training-data pipeline that filters with learned quality classifiers
(perplexity gates, fastText-style quality scores, dedup verifiers) needs the
evaluation layer next to the training layer: ROC AUC, average precision, and
an operating-point (best-F1 threshold) sweep. All three are exact rank
statistics, so the repo's doubled-midrank / integer-cross-multiplication
discipline (q_mann_whitney, q_kruskal_wallis) makes them hash-oracle-able —
no Monte Carlo, no float accumulation:

* **ROC AUC** via the Mann-Whitney identity AUC = U/(n⁺·n⁻): doubled
  midranks over the distinct-score frame keep tie handling integral
  (a score seen t times after c smaller ones contributes 2c+t+1 per
  occurrence in doubled units), so U2 = R2⁺ − n⁺(n⁺+1) is an exact
  DECIMAL(38,0) and auc_fp6 = (10⁶·U2) div (2·n⁺·n⁻) is one integer
  division — identical in Spark (`div`) and DuckDB (`//` on HUGEINT).
* **Average precision** (step-wise AP, the PR-AUC variant sklearn computes)
  as Σ_thresholds (p_v/n⁺)·(cumP_v/cumT_v) with every term fp9-floored via
  integer cross-multiplication BEFORE the sum — per-term flooring is the
  established fp discipline (each engine floors the same exact integers).
* **Best-F1 operating point**: F1 at threshold v is the pure integer ratio
  2·cumP_v/(cumT_v+n⁺), so the sweep is one window over the distinct-score
  frame and argmax is deterministic with a (f1 DESC, v DESC) tie-break
  (prefer the more selective threshold on ties).

The evaluated "classifier" is o_totalprice as a score for o_orderstatus='F'
(finished orders), grouped by o_orderpriority — the metric machinery, not
the model, is what's under test; a real quality score plugs into the same
seam.

Scale shape: ONE shuffle to the (group, distinct score) frame (map-side
combined), windows partitioned by group on that frame, then a group-sized
aggregate. The corpus is scanned once per query; nothing quadratic, no
driver-side math. At 100 TB the distinct-score frame of a near-unique score
is corpus-sized but stays sorted only WITHIN group partitions — the same
shape as q_mann_whitney / q_spearman_corr (never an unpartitioned global
sort); a bounded-precision score (e.g. fp3-bucketed probabilities) collapses
it to |groups|·|buckets|.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import T, persisted, register

# Shared distinct-score frame: per (priority group, exact 2-decimal score):
# positives p, totals t, and the doubled-midrank prefix c (count of pooled
# observations at strictly smaller scores).
_SCORE_FRAME_SQL = """
vc AS (
  SELECT o_orderpriority AS grp,
         CAST(o_totalprice AS DECIMAL(12,2)) AS v,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
              AS BIGINT) AS p,
         CAST(COUNT(*) AS BIGINT) AS t
  FROM orders GROUP BY 1, 2
),
rk AS (
  SELECT grp, v, p, t,
         COALESCE(SUM(t) OVER (PARTITION BY grp ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
  FROM vc
)
"""


def _score_frame(spark, sf_dir):
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("v"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_pos"),
    )
    vc = o.groupBy("grp", "v").agg(
        F.sum("is_pos").cast("bigint").alias("p"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return vc.select(
        "grp", "v", "p", "t",
        F.coalesce(F.sum("t").over(w), F.lit(0)).alias("c"),
    )


@register(
    "q_roc_auc",
    oracle=f"""
WITH {_SCORE_FRAME_SQL.strip().lstrip()},
agg AS (
  SELECT grp,
         CAST(SUM(p) AS BIGINT) AS n_pos,
         CAST(SUM(t) - SUM(p) AS BIGINT) AS n_neg,
         CAST(SUM(CAST(p AS HUGEINT) * (2 * c + t + 1)) AS HUGEINT) AS r2
  FROM rk GROUP BY grp
)
SELECT grp, n_pos, n_neg,
       CAST(r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1) AS BIGINT) AS u2,
       CAST((r2 - CAST(n_pos AS HUGEINT) * (n_pos + 1)) * 1000000
            // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) AS auc_fp6
FROM agg
""",
)
def q_roc_auc(spark, sf_dir):
    """Exact ROC AUC per order-priority group via the Mann-Whitney identity
    (module docstring): U2 (doubled U, tie-midranked) is an exact
    DECIMAL(38,0) and auc_fp6 one integer division — AUC ≈ 0.5 everywhere
    here (price doesn't predict status in this synthetic data), which is
    itself the correct reading of the metric."""
    rk = _score_frame(spark, sf_dir)
    agg = rk.groupBy("grp").agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        (F.sum("t") - F.sum("p")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("p").cast("decimal(38,0)")
            * (2 * F.col("c") + F.col("t") + 1)
        )
        .cast("decimal(38,0)")
        .alias("r2"),
    )
    return agg.select(
        "grp",
        "n_pos",
        "n_neg",
        F.expr("CAST(r2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1) AS BIGINT)").alias(
            "u2"
        ),
        F.expr(
            "CAST((r2 - CAST(n_pos AS DECIMAL(38,0)) * (n_pos + 1)) * 1000000"
            " div (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)"
        ).alias("auc_fp6"),
    )


@register(
    "q_pr_auc_best_f1",
    oracle=f"""
WITH {_SCORE_FRAME_SQL.strip().lstrip()},
down AS (
  SELECT grp, v, p, t,
         SUM(p) OVER (PARTITION BY grp ORDER BY v DESC) AS cum_p,
         SUM(t) OVER (PARTITION BY grp ORDER BY v DESC) AS cum_t,
         SUM(p) OVER (PARTITION BY grp) AS n_pos,
         SUM(t) OVER (PARTITION BY grp) AS n_tot
  FROM rk
),
scored AS (
  SELECT grp, v, cum_p, cum_t, n_pos, n_tot,
         CAST(CAST(p AS HUGEINT) * cum_p * 1000000000
              // (CAST(n_pos AS HUGEINT) * cum_t) AS BIGINT) AS ap_term_fp9,
         CAST(2 * CAST(cum_p AS HUGEINT) * 1000000
              // (CAST(cum_t AS HUGEINT) + n_pos) AS BIGINT) AS f1_fp6
  FROM down
),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY grp
                               ORDER BY f1_fp6 DESC, v DESC) AS rn
  FROM scored
)
SELECT grp,
       CAST(MAX(n_pos) AS BIGINT) AS n_pos,
       CAST(MAX(n_tot) - MAX(n_pos) AS BIGINT) AS n_neg,
       CAST(SUM(ap_term_fp9) AS BIGINT) AS ap_fp9,
       CAST(MAX(CASE WHEN rn = 1 THEN f1_fp6 END) AS BIGINT) AS best_f1_fp6,
       CAST(MAX(CASE WHEN rn = 1 THEN v END) AS DOUBLE) AS best_threshold,
       CAST(MAX(CASE WHEN rn = 1
                THEN CAST(cum_p AS HUGEINT) * 1000000 // cum_t END) AS BIGINT)
         AS best_precision_fp6,
       CAST(MAX(CASE WHEN rn = 1
                THEN CAST(cum_p AS HUGEINT) * 1000000 // n_pos END) AS BIGINT)
         AS best_recall_fp6
FROM best
GROUP BY grp
""",
)
def q_pr_auc_best_f1(spark, sf_dir):
    """Average precision (step-wise PR-AUC) + the best-F1 operating point
    per group, from ONE descending cumulative window over the shared
    distinct-score frame (module docstring). ap_term_fp9 floors each
    threshold's ΔR·P contribution via integer cross-multiplication before
    the sum; F1 at a threshold is the pure integer ratio 2·cumP/(cumT+n⁺);
    argmax tie-breaks to the highest (most selective) threshold."""
    rk = _score_frame(spark, sf_dir)
    wd = Window.partitionBy("grp").orderBy(F.desc("v"))
    wg = Window.partitionBy("grp")
    down = rk.select(
        "grp", "v", "p", "t",
        F.sum("p").over(wd).alias("cum_p"),
        F.sum("t").over(wd).alias("cum_t"),
        F.sum("p").over(wg).alias("n_pos"),
        F.sum("t").over(wg).alias("n_tot"),
    )
    scored = down.select(
        "grp", "v", "cum_p", "cum_t", "n_pos", "n_tot",
        F.expr(
            "CAST(CAST(p AS DECIMAL(38,0)) * cum_p * 1000000000"
            " div (CAST(n_pos AS DECIMAL(38,0)) * cum_t) AS BIGINT)"
        ).alias("ap_term_fp9"),
        F.expr(
            "CAST(2 * CAST(cum_p AS DECIMAL(38,0)) * 1000000"
            " div (CAST(cum_t AS DECIMAL(38,0)) + n_pos) AS BIGINT)"
        ).alias("f1_fp6"),
    )
    rn = F.row_number().over(
        Window.partitionBy("grp").orderBy(F.desc("f1_fp6"), F.desc("v"))
    )
    best = scored.withColumn("rn", rn)
    return best.groupBy("grp").agg(
        F.max("n_pos").cast("bigint").alias("n_pos"),
        (F.max("n_tot") - F.max("n_pos")).cast("bigint").alias("n_neg"),
        F.sum("ap_term_fp9").cast("bigint").alias("ap_fp9"),
        F.max(F.when(F.col("rn") == 1, F.col("f1_fp6")))
        .cast("bigint")
        .alias("best_f1_fp6"),
        F.max(F.when(F.col("rn") == 1, F.col("v")))
        .cast("double")
        .alias("best_threshold"),
        F.max(
            F.when(
                F.col("rn") == 1,
                F.expr("CAST(cum_p AS DECIMAL(38,0)) * 1000000 div cum_t"),
            )
        )
        .cast("bigint")
        .alias("best_precision_fp6"),
        F.max(
            F.when(
                F.col("rn") == 1,
                F.expr("CAST(cum_p AS DECIMAL(38,0)) * 1000000 div n_pos"),
            )
        )
        .cast("bigint")
        .alias("best_recall_fp6"),
    )


@register(
    "q_lift_gain_deciles",
    oracle=f"""
WITH {_SCORE_FRAME_SQL.strip().lstrip()},
down AS (
  SELECT grp, v, p, t,
         COALESCE(SUM(t) OVER (PARTITION BY grp ORDER BY v DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
         SUM(p) OVER (PARTITION BY grp) AS n_pos,
         SUM(t) OVER (PARTITION BY grp) AS n_tot
  FROM rk
),
dd AS (
  SELECT grp, n_pos, n_tot,
         CAST(cum_before * 10 // n_tot AS BIGINT) AS decile,
         p, t
  FROM down
),
agg AS (
  SELECT grp, decile,
         CAST(MAX(n_pos) AS BIGINT) AS n_pos,
         CAST(MAX(n_tot) AS BIGINT) AS n_tot,
         CAST(SUM(t) AS BIGINT) AS n_rows,
         CAST(SUM(p) AS BIGINT) AS n_pos_in
  FROM dd GROUP BY 1, 2
)
SELECT grp, decile, n_rows, n_pos_in,
       CAST(SUM(n_pos_in) OVER (PARTITION BY grp ORDER BY decile)
            * 1000000 // MAX(n_pos) OVER (PARTITION BY grp) AS BIGINT)
         AS cum_gain_fp6,
       CAST(CAST(n_pos_in AS HUGEINT) * n_tot * 1000000
            // (CAST(n_rows AS HUGEINT) * n_pos) AS BIGINT) AS lift_fp6
FROM agg
""",
)
def q_lift_gain_deciles(spark, sf_dir):
    """Cumulative-gains / lift table at score deciles — the campaign-
    targeting readout next to ROC AUC: decile k holds the rows whose
    descending-score prefix count lands in [k·n/10, (k+1)·n/10); gain is
    the cumulative share of positives captured, lift the within-decile
    positive rate over the base rate. A score value straddling a decile
    boundary is assigned by its FIRST row (exact, tie-stable); all ratios
    are integer cross-multiplications. Same one-shuffle distinct-score
    frame as q_roc_auc."""
    rk = _score_frame(spark, sf_dir)
    wd = (
        Window.partitionBy("grp")
        .orderBy(F.desc("v"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wg = Window.partitionBy("grp")
    down = rk.select(
        "grp", "v", "p", "t",
        F.coalesce(F.sum("t").over(wd), F.lit(0)).alias("cum_before"),
        F.sum("p").over(wg).alias("n_pos"),
        F.sum("t").over(wg).alias("n_tot"),
    )
    dd = down.select(
        "grp",
        "n_pos",
        "n_tot",
        F.expr("CAST(cum_before * 10 div n_tot AS BIGINT)").alias("decile"),
        "p",
        "t",
    )
    agg = dd.groupBy("grp", "decile").agg(
        F.max("n_pos").cast("bigint").alias("n_pos"),
        F.max("n_tot").cast("bigint").alias("n_tot"),
        F.sum("t").cast("bigint").alias("n_rows"),
        F.sum("p").cast("bigint").alias("n_pos_in"),
    )
    wcum = Window.partitionBy("grp").orderBy("decile")
    return agg.select(
        "grp",
        "decile",
        "n_rows",
        "n_pos_in",
        F.expr(
            "CAST(SUM(n_pos_in) OVER (PARTITION BY grp ORDER BY decile)"
            " * 1000000 div MAX(n_pos) OVER (PARTITION BY grp) AS BIGINT)"
        ).alias("cum_gain_fp6"),
        F.expr(
            "CAST(CAST(n_pos_in AS DECIMAL(38,0)) * n_tot * 1000000"
            " div (CAST(n_rows AS DECIMAL(38,0)) * n_pos) AS BIGINT)"
        ).alias("lift_fp6"),
    )


# --- trained Naive Bayes language-ID --------------------------------------
#
# The synthetic corpus draws every language from ONE shared vocabulary, so
# a text classifier CANNOT beat the class prior here — the point is the
# trained-model machinery (split-disjoint training, smoothed per-class
# likelihood tables, argmax scoring with a deterministic tie-break,
# confusion/accuracy readout), and the honest expected reading: predictions
# collapse to the majority class and accuracy ≈ its prior share. The audit
# emits the majority baseline next to the accuracy so that collapse is
# visible, witnessed, and cross-engine checked — the same
# measure-don't-assume stance as q_language_confusion's stopword screen.

_NB_TOKENS = (
    "filter(transform(split(lower(trim(text)), '\\\\s+'), "
    "t -> regexp_replace(t, '[^a-z0-9]', '')), t -> t != '')"
)
_NB_TOKS_SQL = (
    r"list_filter(list_transform(string_split_regex(lower(trim(text)), '\s+'), "
    r"t -> regexp_replace(t, '[^a-z0-9]', '', 'g')), t -> t <> '')"
)


@register(
    "q_naive_bayes_langid",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, lang, {_NB_TOKS_SQL} AS toks,
         CASE WHEN doc_id % 2 = 0 THEN 'train' ELSE 'test' END AS split
  FROM documents
),
tr AS (
  SELECT lang, unnest(toks) AS w FROM tk WHERE split = 'train'
),
cls AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tok FROM tr GROUP BY lang
),
pri AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM tk WHERE split = 'train' GROUP BY lang
),
ptot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM pri),
vocab AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM tr),
wc AS (
  SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c FROM tr GROUP BY 1, 2
),
-- log-likelihood of every (test-doc token, class): add-1 over train vocab;
-- unseen-in-class tokens fall back to the class smoothing mass
te AS (
  SELECT doc_id, lang AS true_lang, unnest(toks) AS w
  FROM tk WHERE split = 'test'
),
tec AS (
  SELECT doc_id, true_lang, w, CAST(COUNT(*) AS BIGINT) AS n
  FROM te GROUP BY 1, 2, 3
),
sc AS (
  SELECT t.doc_id, t.true_lang, c.lang,
         CAST(SUM(t.n * CAST(floor(
           (ln(COALESCE(w2.c, 0) + 1) - ln(c.n_tok + c.v)) * 1000000000)
           AS BIGINT)) AS DECIMAL(38,0)) AS ll9
  FROM tec t
  CROSS JOIN (SELECT cls.lang, cls.n_tok, vocab.v FROM cls, vocab) c
  LEFT JOIN wc w2 ON w2.lang = c.lang AND w2.w = t.w
  GROUP BY 1, 2, 3
),
scored AS (
  SELECT s.doc_id, s.true_lang, s.lang,
         s.ll9 + CAST(floor(ln(p.n_docs * 1.0 / ptot.n) * 1000000000)
                      AS BIGINT) AS post9
  FROM sc s JOIN pri p ON s.lang = p.lang, ptot
),
pred AS (
  SELECT doc_id, true_lang, lang AS pred_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY post9 DESC, lang) AS rn
  FROM scored
),
conf AS (
  SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred WHERE rn = 1 GROUP BY 1, 2
),
tots AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN true_lang = pred_lang THEN n ELSE 0 END)
              AS BIGINT) AS n_correct,
         CAST(MAX(mj) AS BIGINT) AS n_majority
  FROM conf, (SELECT MAX(s) AS mj FROM
              (SELECT SUM(n) AS s FROM conf GROUP BY true_lang) z) m
)
SELECT c.true_lang, c.pred_lang, c.n,
       CAST(t.n_correct * 1000000 // t.n_test AS BIGINT) AS accuracy_fp6,
       CAST(t.n_majority * 1000000 // t.n_test AS BIGINT)
         AS majority_baseline_fp6
FROM conf c, tots t
""",
)
def q_naive_bayes_langid(spark, sf_dir):
    """Multinomial Naive Bayes language-ID trained on the even doc_ids and
    scored on the odd ones (module docstring): add-1 token likelihoods +
    log prior, argmax with a (posterior DESC, lang) tie-break, confusion
    matrix with overall accuracy and the majority-class baseline beside it.
    Per-(token, class) log terms are fp9-floored lns of exact integers.

    Scale shape: the likelihood table is (|langs|·vocab)-sized; scoring
    joins the per-doc token-count frame against it per class — |langs| is
    a small constant, so the scoring frame is |doc tokens|·|langs|, one
    keyed aggregate to per-(doc, class) scores, one doc-keyed argmax
    window. Corpus scanned once for training counts, once for scoring."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr(_NB_TOKENS).alias("toks"),
        F.when(F.col("doc_id") % 2 == 0, "train")
        .otherwise("test")
        .alias("split"),
    )
    tr = docs.filter(F.col("split") == "train").select(
        "lang", F.explode("toks").alias("w")
    )
    # likelihood table (|langs|·vocab rows): the one frame everything else
    # derives from — persist so training tokenizes/shuffles ONCE; class
    # token totals and the train vocabulary are re-aggregates of it
    wc = (
        tr.groupBy("lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .transform(persisted)
    )
    cls = wc.groupBy("lang").agg(F.sum("c").cast("bigint").alias("n_tok"))
    pri = (
        docs.filter(F.col("split") == "train")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    ptot = pri.agg(F.sum("n_docs").cast("bigint").alias("n"))
    vocab = wc.select("w").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    tec = (
        docs.filter(F.col("split") == "test")
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.explode("toks").alias("w"),
        )
        .groupBy("doc_id", "true_lang", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    sc = (
        tec.crossJoin(F.broadcast(cls))
        .crossJoin(F.broadcast(vocab))
        .join(
            F.broadcast(
                wc.select(
                    F.col("lang"), F.col("w"), F.col("c").alias("wc_c")
                )
            ),
            ["lang", "w"],
            "left",
        )
        .groupBy("doc_id", "true_lang", "lang")
        .agg(
            F.sum(
                F.col("n").cast("decimal(38,0)")
                * F.floor(
                    (
                        F.log(F.coalesce(F.col("wc_c"), F.lit(0)) + 1)
                        - F.log(F.col("n_tok") + F.col("v"))
                    )
                    * 1_000_000_000
                ).cast("bigint")
            )
            .cast("decimal(38,0)")
            .alias("ll9")
        )
    )
    scored = (
        sc.join(F.broadcast(pri), "lang")
        .crossJoin(F.broadcast(ptot))
        .select(
            "doc_id",
            "true_lang",
            "lang",
            (
                F.col("ll9")
                + F.floor(
                    F.log(F.col("n_docs") * 1.0 / F.col("n"))
                    * 1_000_000_000
                ).cast("bigint")
            ).alias("post9"),
        )
    )
    pred = scored.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.desc("post9"), F.asc("lang")
            )
        ),
    ).filter(F.col("rn") == 1)
    conf = pred.groupBy("true_lang", F.col("lang").alias("pred_lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per_true = conf.groupBy("true_lang").agg(F.sum("n").alias("s"))
    tots = (
        conf.agg(
            F.sum("n").cast("bigint").alias("n_test"),
            F.sum(
                F.when(F.col("true_lang") == F.col("pred_lang"), F.col("n"))
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
        )
        .crossJoin(
            F.broadcast(per_true.agg(F.max("s").cast("bigint").alias("n_majority")))
        )
    )
    return conf.crossJoin(F.broadcast(tots)).select(
        "true_lang",
        "pred_lang",
        "n",
        F.expr("CAST(n_correct * 1000000 div n_test AS BIGINT)").alias(
            "accuracy_fp6"
        ),
        F.expr("CAST(n_majority * 1000000 div n_test AS BIGINT)").alias(
            "majority_baseline_fp6"
        ),
    )


@register(
    "q_conformal_interval_audit",
    oracle="""
WITH e AS (
  SELECT event_id, event_type,
         CAST(CAST(value AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS v6,
         CAST(('0x' || substr(md5('cfm:' || CAST(event_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 3 AS part
  FROM events
),
trainc AS (
  SELECT event_type, v6, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM e WHERE part = 0 GROUP BY 1, 2
),
med AS (
  SELECT event_type, CAST(MIN(CASE WHEN c * 2 >= n THEN v6 END) AS BIGINT)
           AS med6,
         CAST(MAX(n) AS BIGINT) AS n_train
  FROM (
    SELECT event_type, v6,
           SUM(cnt) OVER (PARTITION BY event_type ORDER BY v6
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
           SUM(cnt) OVER (PARTITION BY event_type) AS n
    FROM trainc
  ) q GROUP BY event_type
),
cal AS (
  SELECT e.event_type, abs(e.v6 - m.med6) AS s
  FROM e JOIN med m USING (event_type) WHERE e.part = 1
),
calc AS (
  SELECT event_type, s, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cal GROUP BY 1, 2
),
qh AS (
  SELECT event_type,
         CAST(MIN(CASE WHEN c >= (9 * (n + 1) + 9) // 10 THEN s END)
              AS BIGINT) AS qhat6,
         CAST(MAX(n) AS BIGINT) AS n_cal
  FROM (
    SELECT event_type, s,
           SUM(cnt) OVER (PARTITION BY event_type ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c,
           SUM(cnt) OVER (PARTITION BY event_type) AS n
    FROM calc
  ) q GROUP BY event_type
),
tst AS (
  SELECT e.event_type, abs(e.v6 - m.med6) AS s
  FROM e JOIN med m USING (event_type) WHERE e.part = 2
)
SELECT t.event_type,
       m.n_train, q.n_cal,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       m.med6, q.qhat6,
       CAST(SUM(CASE WHEN q.qhat6 IS NULL OR t.s <= q.qhat6
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
       CAST(SUM(CASE WHEN q.qhat6 IS NULL OR t.s <= q.qhat6
                     THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT)
         AS coverage_fp6,
       CAST(900000 AS BIGINT) AS target_fp6
FROM tst t JOIN med m USING (event_type) JOIN qh q USING (event_type)
GROUP BY t.event_type, m.n_train, q.n_cal, m.med6, q.qhat6
""",
)
def q_conformal_interval_audit(spark, sf_dir):
    """SPLIT-CONFORMAL prediction audit (Vovk; Lei et al. 2018) at
    α = 0.1: per event type, a deterministic md5 3-way split gives train /
    calibration / test; the point predictor is the train split's exact
    lower median; nonconformity s = |value − median| in exact micro-units;
    the conformal radius q̂ is the ⌈(n_cal+1)(1−α)⌉-th smallest calibration
    score — the FINITE-SAMPLE-exact rank, computed as an integer ceiling
    ((9(n+1)+9) div 10), never a float quantile; test coverage is the
    exact fraction |value − median| ≤ q̂.

    HONESTY: the conformal guarantee (coverage ≥ 1−α) holds in
    EXPECTATION over exchangeable splits — a realized split can dip below
    it — so coverage_fp6 is a measured cross-engine value next to the
    target, never a pinned verdict. A calibration split smaller than the
    required rank yields q̂ = NULL = the infinite interval (covers
    everything), the standard conformal convention.

    Scale shape: one shuffle to the per-(type, distinct value) count
    frame; medians and conformal ranks are windows PARTITIONED BY the
    group key on that frame (never a global sort); coverage is one keyed
    aggregate."""
    e = T(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(18,6)") * 1_000_000)
        .cast("bigint")
        .alias("v6"),
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cfm:"), F.col("event_id").cast("string")
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 3
        ).alias("part"),
    ).transform(persisted)  # consumers: train counts, cal, test
    trainc = (
        e.filter(F.col("part") == 0)
        .groupBy("event_type", "v6")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    wg = Window.partitionBy("event_type").orderBy("v6").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wa = Window.partitionBy("event_type")
    med = (
        trainc.select(
            "event_type",
            "v6",
            F.sum("cnt").over(wg).alias("c"),
            F.sum("cnt").over(wa).alias("n"),
        )
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("c") * 2 >= F.col("n"), F.col("v6")))
            .cast("bigint")
            .alias("med6"),
            F.max("n").cast("bigint").alias("n_train"),
        )
    )
    cal = (
        e.filter(F.col("part") == 1)
        .join(med, "event_type")
        .select("event_type", F.abs(F.col("v6") - F.col("med6")).alias("s"))
    )
    calc = cal.groupBy("event_type", "s").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    ws = Window.partitionBy("event_type").orderBy("s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    qh = (
        calc.select(
            "event_type",
            "s",
            F.sum("cnt").over(ws).alias("c"),
            F.sum("cnt").over(wa).alias("n"),
        )
        .groupBy("event_type")
        .agg(
            F.min(
                F.when(
                    F.col("c") >= F.expr("(9 * (n + 1) + 9) div 10"),
                    F.col("s"),
                )
            )
            .cast("bigint")
            .alias("qhat6"),
            F.max("n").cast("bigint").alias("n_cal"),
        )
    )
    tst = (
        e.filter(F.col("part") == 2)
        .join(med, "event_type")
        .select(
            "event_type",
            "n_train",
            "med6",
            F.abs(F.col("v6") - F.col("med6")).alias("s"),
        )
    )
    covered = F.when(
        F.col("qhat6").isNull() | (F.col("s") <= F.col("qhat6")), 1
    ).otherwise(0)
    return (
        tst.join(qh, "event_type")
        .groupBy("event_type", "n_train", "n_cal", "med6", "qhat6")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(covered).cast("bigint").alias("n_covered"),
            F.expr(
                "CAST(SUM(CASE WHEN qhat6 IS NULL OR s <= qhat6"
                " THEN 1 ELSE 0 END) * 1000000 div COUNT(*) AS BIGINT)"
            ).alias("coverage_fp6"),
        )
        .select(
            "event_type",
            "n_train",
            "n_cal",
            "n_test",
            "med6",
            "qhat6",
            "n_covered",
            "coverage_fp6",
            F.lit(900000).cast("bigint").alias("target_fp6"),
        )
    )



@register(
    "q_fairness_group_audit",
    oracle="""
WITH mm AS (
  SELECT CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS mn,
         CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS mx
  FROM orders
),
scored AS (
  SELECT o.o_orderpriority AS grp,
         CASE WHEN (CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                         AS BIGINT) - m.mn) * 2 >= (m.mx - m.mn)
              THEN 1 ELSE 0 END AS yhat,
         CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders o CROSS JOIN mm m
),
g AS (
  SELECT grp,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(yhat) AS BIGINT) AS n_pred_pos,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(y * yhat) AS BIGINT) AS n_tp,
         CAST(SUM((1 - y) * yhat) AS BIGINT) AS n_fp
  FROM scored GROUP BY grp
),
r AS (
  SELECT grp, n, n_pred_pos, n_pos, n_tp, n_fp,
         CAST(n_pred_pos * 1000000 // n AS BIGINT) AS selection_rate_fp6,
         CAST(CASE WHEN n_pos > 0
                   THEN n_tp * 1000000 // n_pos ELSE 0 END AS BIGINT)
           AS tpr_fp6,
         CAST(CASE WHEN n - n_pos > 0
                   THEN n_fp * 1000000 // (n - n_pos) ELSE 0 END AS BIGINT)
           AS fpr_fp6
  FROM g
),
ref AS (
  SELECT MAX(selection_rate_fp6) AS sr_max, MIN(selection_rate_fp6) AS sr_min,
         MAX(tpr_fp6) AS tpr_max, MIN(tpr_fp6) AS tpr_min,
         MAX(fpr_fp6) AS fpr_max, MIN(fpr_fp6) AS fpr_min
  FROM r
)
SELECT r.grp, r.n, r.n_pred_pos, r.n_pos,
       r.selection_rate_fp6, r.tpr_fp6, r.fpr_fp6,
       CAST(CASE WHEN ref.sr_max > 0
                 THEN r.selection_rate_fp6 * 1000000 // ref.sr_max
                 ELSE 1000000 END AS BIGINT) AS disparate_impact_fp6,
       CAST(ref.sr_max - ref.sr_min AS BIGINT) AS dp_gap_fp6,
       CAST(GREATEST(ref.tpr_max - ref.tpr_min, ref.fpr_max - ref.fpr_min)
            AS BIGINT) AS eq_odds_gap_fp6
FROM r CROSS JOIN ref
""",
)
def q_fairness_group_audit(spark, sf_dir):
    """GROUP-FAIRNESS audit of a binary classifier across groups — the
    dataset-card readout (Barocas/Hardt/Narayanan; Feldman 2015 disparate
    impact; Hardt 2016 equalized odds) a curation pipeline publishes
    before a filter model ships. Classifier = "price above the global
    midpoint" (exact integer threshold via cross-multiplication, no
    division); label = fulfilled; groups = order priority. Per group,
    exact fp6 integer ratios:

    * selection rate P(ŷ=1 | g) and the demographic-parity gap
      (max − min across groups);
    * disparate impact = rate / max rate (the 80%-rule numerator);
    * TPR and FPR per group and the equalized-odds gap
      max(ΔTPR, ΔFPR) — zero-positive/negative groups emit 0 rather than
      dividing by zero.

    Every number is a measured cross-engine value (counts and integer
    divisions) — fairness gaps are data facts, never pinned verdicts.

    Scale shape: one scan → one |groups|-row aggregate; the min/max
    threshold is a 1-row broadcast; gaps are an aggregate over the group
    frame re-joined by broadcast."""
    o = T(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    mm = o.agg(
        F.min("cents").cast("bigint").alias("mn"),
        F.max("cents").cast("bigint").alias("mx"),
    )
    scored = o.crossJoin(F.broadcast(mm)).select(
        "grp",
        "y",
        F.expr(
            "CASE WHEN (cents - mn) * 2 >= (mx - mn) THEN 1 ELSE 0 END"
        ).alias("yhat"),
    )
    r = (
        scored.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("yhat").cast("bigint").alias("n_pred_pos"),
            F.sum("y").cast("bigint").alias("n_pos"),
            F.sum(F.col("y") * F.col("yhat")).cast("bigint").alias("n_tp"),
            F.sum((1 - F.col("y")) * F.col("yhat"))
            .cast("bigint")
            .alias("n_fp"),
        )
        .selectExpr(
            "grp", "n", "n_pred_pos", "n_pos", "n_tp", "n_fp",
            "CAST(n_pred_pos * 1000000 div n AS BIGINT)"
            " AS selection_rate_fp6",
            "CAST(CASE WHEN n_pos > 0 THEN n_tp * 1000000 div n_pos"
            " ELSE 0 END AS BIGINT) AS tpr_fp6",
            "CAST(CASE WHEN n - n_pos > 0"
            " THEN n_fp * 1000000 div (n - n_pos)"
            " ELSE 0 END AS BIGINT) AS fpr_fp6",
        )
        .transform(persisted)  # |groups| rows; consumers: rows + gaps
    )
    ref = r.agg(
        F.max("selection_rate_fp6").alias("sr_max"),
        F.min("selection_rate_fp6").alias("sr_min"),
        F.max("tpr_fp6").alias("tpr_max"),
        F.min("tpr_fp6").alias("tpr_min"),
        F.max("fpr_fp6").alias("fpr_max"),
        F.min("fpr_fp6").alias("fpr_min"),
    )
    return r.crossJoin(F.broadcast(ref)).selectExpr(
        "grp", "n", "n_pred_pos", "n_pos",
        "selection_rate_fp6", "tpr_fp6", "fpr_fp6",
        "CAST(CASE WHEN sr_max > 0"
        " THEN selection_rate_fp6 * 1000000 div sr_max"
        " ELSE 1000000 END AS BIGINT) AS disparate_impact_fp6",
        "CAST(sr_max - sr_min AS BIGINT) AS dp_gap_fp6",
        "CAST(GREATEST(tpr_max - tpr_min, fpr_max - fpr_min) AS BIGINT)"
        " AS eq_odds_gap_fp6",
    )
