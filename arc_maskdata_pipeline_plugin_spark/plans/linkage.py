"""Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969)
with EM-fitted match/unmatch parameters (Winkler 1988) — the canonical
statistical model behind production entity resolution, completing the
blocking/similarity family (q_entity_resolution, q_fuzzy_name_match,
dedup_sorted_neighborhood) with the model that turns field agreements
into calibrated match posteriors.

Model: candidate pairs (compound-blocked customer self-pairs) are reduced
to a binary AGREEMENT VECTOR γ over four fields — market segment, balance
cents-last-digit, thousand-dollar balance bucket, name last char —
giving 16
patterns. EM fits the two-class mixture
``P(γ) = p·Π m_k^γ_k (1-m_k)^(1-γ_k) + (1-p)·Π u_k^γ_k (1-u_k)^(1-γ_k)``
on the 16-row pattern-count frame.

Cross-engine exactness — FIXED-POINT EM: probabilities are fp9 integers
(scale 10^9); every E/M step uses only multiply + truncating integral
division (all operands non-negative, so Spark ``div``, DuckDB HUGEINT
``//``, and Python ``//`` coincide), and m/u are clamped to
[1, 10^9 - 1] to keep the mixture non-degenerate. Five EM iterations —
a fixed unroll, identical in all three implementations, so the fitted
parameters and per-pattern posteriors are engine-deterministic to the
last digit.

BLOCKING (VERDICT r11 #1 — the r11 bare ``c_nationkey`` key had 25
values, so per-block size grew linearly with the table and the pair count
quadratically): the block key is COMPOUND — nation × the name's
second-to-last character (the tens digit of the ``Customer#%09d`` key
domain; a name-derived sub-key, the q_entity_resolution discipline) —
AND every block is capped at ``_MAX_BLOCK_ROWS`` rows: blocks larger than
the cap are EXCLUDED from pair generation and surfaced in-plan as the
``n_dropped_blocks`` / ``n_dropped_rows`` audit columns (the
``lsh_candidate_pairs(max_bucket_size=...)`` discipline,
operators/dedup.py — bounded work plus an honest record of what was
skipped, never silent truncation). Total candidate pairs are therefore
≤ n_blocks · cap²/2 REGARDLESS of table size; at larger scale factors an
operator widens the key (more name digits) rather than raising the cap.

Scale shape: the distributed work is the block-size aggregate (map-side
combined, block-cardinality-sized output), the capped blocked pair
self-join, and ONE 16-row pattern aggregate (map-side combined). EM then
runs on the COLLECTED 16-row pattern-count frame — an O(1) driver probe
exactly like the BPE merge argmax (plans/bpe.py) — and returns in-plan as
literals joined onto the pattern frame. At 100 TB the pair generation is
the cost (hard-bounded by the cap) and the EM is free; the pattern frame
NEVER grows past 2^k rows regardless of data size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import T, persisted, register

_FP = 10**9
_ITERS = 5
_MAX_BLOCK_ROWS = 10000  # hard per-block bound (module docstring)
# compound block sub-key: the name's second-to-last char (tens digit of
# the Customer#%09d domain)
_BK_SQL = "substr(c_name, length(c_name) - 1, 1)"
_INIT_M = 9 * 10**8  # 0.9
_INIT_U = 10**8      # 0.1
_INIT_P = 10**8      # 0.1
_K = 4


def _em_fixed_point(counts: dict[int, int]):
    """The fixed-point EM, pure integer — the definition both engines
    replay. ``counts``: pattern_id (0..15, bits = [mkt, cents, bal, name]
    MSB-first) -> pair count. Returns (p, [m1..m4], [u1..u4], {pattern:
    posterior_fp9})."""
    m = [_INIT_M] * _K
    u = [_INIT_U] * _K
    p = _INIT_P
    bits = {g: [(g >> (3 - k)) & 1 for k in range(_K)] for g in range(16)}

    def _posteriors(p, m, u):
        w = {}
        for g in range(16):
            pm = pu = _FP
            for k in range(_K):
                pm = pm * (m[k] if bits[g][k] else _FP - m[k]) // _FP
                pu = pu * (u[k] if bits[g][k] else _FP - u[k]) // _FP
            num = p * pm // _FP
            den = num + (_FP - p) * pu // _FP
            w[g] = num * _FP // max(den, 1)
        return w

    for _ in range(_ITERS):
        w = _posteriors(p, m, u)
        cw = sum(counts.get(g, 0) * w[g] for g in range(16))
        cl = sum(counts.get(g, 0) * (_FP - w[g]) for g in range(16))
        tot = sum(counts.get(g, 0) for g in range(16))
        for k in range(_K):
            mk = sum(
                counts.get(g, 0) * w[g] for g in range(16) if bits[g][k]
            )
            uk = sum(
                counts.get(g, 0) * (_FP - w[g])
                for g in range(16)
                if bits[g][k]
            )
            m[k] = min(max(mk * _FP // max(cw, 1), 1), _FP - 1)
            u[k] = min(max(uk * _FP // max(cl, 1), 1), _FP - 1)
        p = min(max(cw // max(tot, 1), 1), _FP - 1)
    # final posteriors come from the CONVERGED params (the oracle's `fin`
    # CTE recomputes from par{_ITERS} the same way)
    return p, m, u, _posteriors(p, m, u)


def _em_cte_chain() -> str:
    """The identical EM as unrolled DuckDB CTEs over the 16-row pattern
    frame (HUGEINT lanes; same clamps, same truncating division)."""
    parts = [f"""
par0 AS (SELECT CAST({_INIT_P} AS HUGEINT) AS p,
  CAST({_INIT_M} AS HUGEINT) AS m1, CAST({_INIT_M} AS HUGEINT) AS m2,
  CAST({_INIT_M} AS HUGEINT) AS m3, CAST({_INIT_M} AS HUGEINT) AS m4,
  CAST({_INIT_U} AS HUGEINT) AS u1, CAST({_INIT_U} AS HUGEINT) AS u2,
  CAST({_INIT_U} AS HUGEINT) AS u3, CAST({_INIT_U} AS HUGEINT) AS u4)"""]
    for i in range(1, _ITERS + 1):
        prev = f"par{i - 1}"
        parts.append(f"""
e{i} AS MATERIALIZED (
  SELECT g.gid, g.a1, g.a2, g.a3, g.a4, g.cnt,
         (q.p * q.pm // {_FP}) * {_FP}
           // GREATEST(q.p * q.pm // {_FP}
                       + ({_FP} - q.p) * q.pu // {_FP}, 1) AS w
  FROM grid g, LATERAL (
    SELECT r.p,
      CASE WHEN g.a1 = 1 THEN r.m1 ELSE {_FP} - r.m1 END
        * CASE WHEN g.a2 = 1 THEN r.m2 ELSE {_FP} - r.m2 END // {_FP}
        * CASE WHEN g.a3 = 1 THEN r.m3 ELSE {_FP} - r.m3 END // {_FP}
        * CASE WHEN g.a4 = 1 THEN r.m4 ELSE {_FP} - r.m4 END // {_FP} AS pm,
      CASE WHEN g.a1 = 1 THEN r.u1 ELSE {_FP} - r.u1 END
        * CASE WHEN g.a2 = 1 THEN r.u2 ELSE {_FP} - r.u2 END // {_FP}
        * CASE WHEN g.a3 = 1 THEN r.u3 ELSE {_FP} - r.u3 END // {_FP}
        * CASE WHEN g.a4 = 1 THEN r.u4 ELSE {_FP} - r.u4 END // {_FP} AS pu
    FROM {prev} r
  ) q
),
par{i} AS MATERIALIZED (
  SELECT
    LEAST(GREATEST(SUM(cnt * w) // GREATEST(SUM(cnt), 1), 1), {_FP} - 1)
      AS p,
    LEAST(GREATEST(SUM(CASE WHEN a1 = 1 THEN cnt * w ELSE 0 END) * {_FP}
      // GREATEST(SUM(cnt * w), 1), 1), {_FP} - 1) AS m1,
    LEAST(GREATEST(SUM(CASE WHEN a2 = 1 THEN cnt * w ELSE 0 END) * {_FP}
      // GREATEST(SUM(cnt * w), 1), 1), {_FP} - 1) AS m2,
    LEAST(GREATEST(SUM(CASE WHEN a3 = 1 THEN cnt * w ELSE 0 END) * {_FP}
      // GREATEST(SUM(cnt * w), 1), 1), {_FP} - 1) AS m3,
    LEAST(GREATEST(SUM(CASE WHEN a4 = 1 THEN cnt * w ELSE 0 END) * {_FP}
      // GREATEST(SUM(cnt * w), 1), 1), {_FP} - 1) AS m4,
    LEAST(GREATEST(SUM(CASE WHEN a1 = 1 THEN cnt * ({_FP} - w) ELSE 0 END)
      * {_FP} // GREATEST(SUM(cnt * ({_FP} - w)), 1), 1), {_FP} - 1) AS u1,
    LEAST(GREATEST(SUM(CASE WHEN a2 = 1 THEN cnt * ({_FP} - w) ELSE 0 END)
      * {_FP} // GREATEST(SUM(cnt * ({_FP} - w)), 1), 1), {_FP} - 1) AS u2,
    LEAST(GREATEST(SUM(CASE WHEN a3 = 1 THEN cnt * ({_FP} - w) ELSE 0 END)
      * {_FP} // GREATEST(SUM(cnt * ({_FP} - w)), 1), 1), {_FP} - 1) AS u3,
    LEAST(GREATEST(SUM(CASE WHEN a4 = 1 THEN cnt * ({_FP} - w) ELSE 0 END)
      * {_FP} // GREATEST(SUM(cnt * ({_FP} - w)), 1), 1), {_FP} - 1) AS u4
  FROM e{i}
)""")
    return ",".join(parts)


# the blocked-pair CTEs, shared by the pattern-grid query and the
# pair-level decisions query: compound (nation, name-tens-digit) key,
# per-block row cap with a dropped audit (module docstring)
_PAIRS_CTES = f"""
blk AS MATERIALIZED (
  SELECT c_nationkey AS nk, {_BK_SQL} AS bk,
         CAST(COUNT(*) AS BIGINT) AS bsz
  FROM customer GROUP BY 1, 2
),
drp AS MATERIALIZED (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_dropped_blocks,
         CAST(COALESCE(SUM(bsz), 0) AS BIGINT) AS n_dropped_rows
  FROM blk WHERE bsz > {_MAX_BLOCK_ROWS}
),
pairs AS MATERIALIZED (
  SELECT a.c_custkey AS ka, b.c_custkey AS kb,
         CASE WHEN a.c_mktsegment = b.c_mktsegment THEN 1 ELSE 0 END AS a1,
         CASE WHEN CAST(CAST(a.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                     % 10
                   = CAST(CAST(b.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                     % 10
              THEN 1 ELSE 0 END AS a2,
         CASE WHEN CAST(CAST(a.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                     // 100000
                   = CAST(CAST(b.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)
                     // 100000
              THEN 1 ELSE 0 END AS a3,
         CASE WHEN right(a.c_name, 1) = right(b.c_name, 1)
              THEN 1 ELSE 0 END AS a4
  FROM customer a
  JOIN blk k ON k.nk = a.c_nationkey AND k.bk = {_BK_SQL.replace("c_name", "a.c_name")}
              AND k.bsz <= {_MAX_BLOCK_ROWS}
  JOIN customer b
    ON a.c_nationkey = b.c_nationkey
   AND {_BK_SQL.replace("c_name", "a.c_name")}
     = {_BK_SQL.replace("c_name", "b.c_name")}
   AND a.c_custkey < b.c_custkey
)"""

# grid + EM chain + converged-posterior CTEs, shared by the pattern-grid
# and pair-level-decisions oracles
_GRID_EM_FIN = f"""grid AS MATERIALIZED (
  -- all 16 patterns, zero-filled: EM and the output are total over the grid
  SELECT g.a1, g.a2, g.a3, g.a4,
         CAST(8 * g.a1 + 4 * g.a2 + 2 * g.a3 + g.a4 AS BIGINT) AS gid,
         CAST(COALESCE(c.cnt, 0) AS HUGEINT) AS cnt
  FROM (SELECT b1 AS a1, b2 AS a2, b3 AS a3, b4 AS a4
        FROM (VALUES (0), (1)) t1(b1), (VALUES (0), (1)) t2(b2),
             (VALUES (0), (1)) t3(b3), (VALUES (0), (1)) t4(b4)) g
  LEFT JOIN (SELECT a1, a2, a3, a4, COUNT(*) AS cnt
             FROM pat GROUP BY 1, 2, 3, 4) c
    USING (a1, a2, a3, a4)
),
{_em_cte_chain()},
fin AS (
  SELECT g.gid, g.a1, g.a2, g.a3, g.a4, g.cnt,
         (q.p * q.pm // {_FP}) * {_FP}
           // GREATEST(q.p * q.pm // {_FP}
                       + ({_FP} - q.p) * q.pu // {_FP}, 1) AS w
  FROM grid g, LATERAL (
    SELECT r.p,
      CASE WHEN g.a1 = 1 THEN r.m1 ELSE {_FP} - r.m1 END
        * CASE WHEN g.a2 = 1 THEN r.m2 ELSE {_FP} - r.m2 END // {_FP}
        * CASE WHEN g.a3 = 1 THEN r.m3 ELSE {_FP} - r.m3 END // {_FP}
        * CASE WHEN g.a4 = 1 THEN r.m4 ELSE {_FP} - r.m4 END // {_FP} AS pm,
      CASE WHEN g.a1 = 1 THEN r.u1 ELSE {_FP} - r.u1 END
        * CASE WHEN g.a2 = 1 THEN r.u2 ELSE {_FP} - r.u2 END // {_FP}
        * CASE WHEN g.a3 = 1 THEN r.u3 ELSE {_FP} - r.u3 END // {_FP}
        * CASE WHEN g.a4 = 1 THEN r.u4 ELSE {_FP} - r.u4 END // {_FP} AS pu
    FROM par{_ITERS} r
  ) q
)"""

_LINKAGE_ORACLE = f"""
WITH {_PAIRS_CTES},
pat AS MATERIALIZED (
  SELECT a1, a2, a3, a4 FROM pairs
),
{_GRID_EM_FIN}
SELECT f.gid AS pattern_id,
       CAST(f.a1 AS BIGINT) AS agree_mkt,
       CAST(f.a2 AS BIGINT) AS agree_cents,
       CAST(f.a3 AS BIGINT) AS agree_bal,
       CAST(f.a4 AS BIGINT) AS agree_name,
       CAST(f.cnt AS BIGINT) AS n_pairs,
       CAST(f.w AS BIGINT) AS posterior_fp9,
       CAST(CASE WHEN f.w * 2 > {_FP} THEN 1 ELSE 0 END AS BIGINT)
         AS decide_match,
       CAST(r.p AS BIGINT) AS p_fp9,
       CAST(r.m1 AS BIGINT) AS m_mkt_fp9,
       CAST(r.u1 AS BIGINT) AS u_mkt_fp9,
       CAST(r.m4 AS BIGINT) AS m_name_fp9,
       CAST(r.u4 AS BIGINT) AS u_name_fp9,
       d.n_dropped_blocks, d.n_dropped_rows
FROM fin f, par{_ITERS} r, drp d
ORDER BY pattern_id
"""


def _blocked_pairs(spark, sf_dir):
    """Capped compound-blocked candidate pairs (module docstring).

    Returns ``(pairs, sizes)``: ``pairs`` carries (ka, kb, a1..a4) for
    every in-cap candidate pair; ``sizes`` is the PERSISTED block-size
    frame (block-cardinality-bounded; consumers: the kept-block filter
    inside ``pairs`` and the caller's dropped audit — caller unpersists)."""
    c = T(spark, sf_dir, "customer")
    a = c.select(
        F.col("c_nationkey").alias("nk"),
        F.expr(_BK_SQL).alias("bk"),
        F.col("c_custkey").alias("ka"),
        F.col("c_mktsegment").alias("mkt_a"),
        F.expr(
            "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) % 10"
        ).alias("ph_a"),
        F.expr(
            "CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
            " div 100000"
        ).alias("bal_a"),
        F.expr("right(c_name, 1)").alias("nm_a"),
    )
    sizes = (
        a.groupBy("nk", "bk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bsz"))
        .transform(persisted)
    )
    kept = sizes.filter(F.col("bsz") <= _MAX_BLOCK_ROWS).select("nk", "bk")
    b = a.select(
        "nk",
        "bk",
        F.col("ka").alias("kb"),
        F.col("mkt_a").alias("mkt_b"),
        F.col("ph_a").alias("ph_b"),
        F.col("bal_a").alias("bal_b"),
        F.col("nm_a").alias("nm_b"),
    )
    pairs = (
        # the kept-block semi-filter broadcasts the block-cardinality
        # frame; b-side rows of dropped blocks cannot match an a-side kept
        # row on the same key, so one filter suffices
        a.join(F.broadcast(kept), ["nk", "bk"])
        .join(b, ["nk", "bk"])
        .filter(F.col("ka") < F.col("kb"))
        .select(
            "ka",
            "kb",
            (F.col("mkt_a") == F.col("mkt_b")).cast("int").alias("a1"),
            (F.col("ph_a") == F.col("ph_b")).cast("int").alias("a2"),
            (F.col("bal_a") == F.col("bal_b")).cast("int").alias("a3"),
            (F.col("nm_a") == F.col("nm_b")).cast("int").alias("a4"),
        )
    )
    return pairs, sizes


def _dropped_audit(sizes):
    """One bounded action on the block-size frame → (n_blocks, n_rows)
    dropped by the cap."""
    r = sizes.filter(F.col("bsz") > _MAX_BLOCK_ROWS).agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.coalesce(F.sum("bsz"), F.lit(0)).cast("bigint").alias("nr"),
    ).first()
    return int(r["nb"]), int(r["nr"])


def _fit_em(pairs):
    """16-row bounded collect — the O(1) driver probe (plans/bpe.py argmax
    precedent); pattern space is 2^k regardless of data size."""
    pat = pairs.groupBy("a1", "a2", "a3", "a4").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    counts = {
        8 * r["a1"] + 4 * r["a2"] + 2 * r["a3"] + r["a4"]: r["cnt"]
        for r in pat.collect()
    }
    return counts, _em_fixed_point(counts)


@register("q_fellegi_sunter_linkage", oracle=_LINKAGE_ORACLE)
def q_fellegi_sunter_linkage(spark, sf_dir):
    """EM-fitted Fellegi-Sunter linkage over compound-blocked, block-capped
    customer pairs (module docstring: fixed-point fp9 EM, 16-pattern grid,
    O(1) driver-side EM on the collected pattern counts). Emits the full
    pattern grid with per-pattern posteriors, the >0.5 decision, the
    fitted p / representative m-u parameters, and the block-cap dropped
    audit."""
    pairs, sizes = _blocked_pairs(spark, sf_dir)
    nd_blocks, nd_rows = _dropped_audit(sizes)  # materializes `sizes`
    counts, (p, m, u, w) = _fit_em(pairs)
    sizes.unpersist()
    rows = []
    for g in range(16):
        bits = [(g >> (3 - k)) & 1 for k in range(_K)]
        rows.append(
            (
                g,
                *[int(x) for x in bits],
                int(counts.get(g, 0)),
                int(w[g]),
                1 if w[g] * 2 > _FP else 0,
                int(p),
                int(m[0]),
                int(u[0]),
                int(m[3]),
                int(u[3]),
                nd_blocks,
                nd_rows,
            )
        )
    return spark.createDataFrame(
        rows,
        "pattern_id bigint, agree_mkt bigint, agree_cents bigint, "
        "agree_bal bigint, agree_name bigint, n_pairs bigint, "
        "posterior_fp9 bigint, decide_match bigint, p_fp9 bigint, "
        "m_mkt_fp9 bigint, u_mkt_fp9 bigint, m_name_fp9 bigint, "
        "u_name_fp9 bigint, n_dropped_blocks bigint, n_dropped_rows bigint",
    )


# ---------------------------------------------------------------------------
# Pair-level linkage decisions (VERDICT r11 #3): the artifact a curation
# team acts on is the scored PAIR list, not the pattern grid — each in-cap
# candidate pair with its EM posterior and its Fellegi-Sunter DECISION
# ZONE (the 1969 paper's three-way rule: link / possible-link needing
# clerical review / non-link, here at fixed posterior thresholds 1/2 and
# 1/10). One broadcast join of the 16-row fitted grid back onto the
# blocked pairs (the q_corpus_release_report composition discipline). The
# list is bounded by the blocking cap — the same Σ n_blocks·cap²/2 bound
# as pair generation itself.
# ---------------------------------------------------------------------------

_ZONE_SQL = f"""CASE WHEN f.w * 2 > {_FP} THEN 'link'
            WHEN f.w * 10 > {_FP} THEN 'possible'
            ELSE 'nonlink' END"""

_DECISIONS_ORACLE = f"""
WITH {_PAIRS_CTES},
pat AS MATERIALIZED (
  SELECT a1, a2, a3, a4 FROM pairs
),
{_GRID_EM_FIN}
SELECT p.ka AS custkey_a, p.kb AS custkey_b,
       CAST(8 * p.a1 + 4 * p.a2 + 2 * p.a3 + p.a4 AS BIGINT) AS pattern_id,
       CAST(f.w AS BIGINT) AS posterior_fp9,
       {_ZONE_SQL} AS zone
FROM pairs p
JOIN fin f ON f.gid = 8 * p.a1 + 4 * p.a2 + 2 * p.a3 + p.a4
"""


@register("q_fs_linkage_decisions", oracle=_DECISIONS_ORACLE)
def q_fs_linkage_decisions(spark, sf_dir):
    """Pair-level Fellegi-Sunter decisions: every capped-block candidate
    pair scored with its EM posterior and classified into the FS
    three-zone rule — link (> 1/2), possible (> 1/10, the clerical-review
    band), nonlink — as (custkey_a, custkey_b, pattern_id, posterior_fp9,
    zone): the merge-candidate list downstream survivorship
    (q_entity_resolution) consumes. The EM is the same O(1) driver probe
    as q_fellegi_sunter_linkage; scoring is ONE broadcast join of the
    16-row fitted grid onto the persisted pair frame (consumers: the
    pattern aggregate and the returned plan)."""
    pairs, sizes = _blocked_pairs(spark, sf_dir)
    pairs = pairs.transform(persisted)
    counts, (p, m, u, w) = _fit_em(pairs)  # materializes `pairs`
    sizes.unpersist()
    fitted = [
        (
            g,
            int(w[g]),
            "link"
            if w[g] * 2 > _FP
            else ("possible" if w[g] * 10 > _FP else "nonlink"),
        )
        for g in range(16)
    ]
    post = spark.createDataFrame(
        fitted, "gid int, posterior_fp9 bigint, zone string"
    )
    return (
        pairs.withColumn(
            "gid",
            (
                8 * F.col("a1") + 4 * F.col("a2") + 2 * F.col("a3")
                + F.col("a4")
            ).cast("int"),
        )
        .join(F.broadcast(post), "gid")
        .select(
            F.col("ka").alias("custkey_a"),
            F.col("kb").alias("custkey_b"),
            F.col("gid").cast("bigint").alias("pattern_id"),
            "posterior_fp9",
            "zone",
        )
    )


# ---------------------------------------------------------------------------
# Clerical-review queue (the q_corpus_release_report composition pattern,
# closing VERDICT r11 #3's pipeline): real ER teams act on CASES, not
# pairs — candidate pairs above the lower FS threshold (link ∪ possible)
# are clustered by transitive connectivity, and each connected component
# is one review case. This composes the r12 pieces end-to-end: capped
# compound blocking → fp9 EM grid → three-zone scoring → large-star/
# small-star connected components (operators/clusters.py, the dedup
# machinery) → the case-size histogram that sizes the review queue.
# Scale shape: the review-pair edge list is a filtered subset of the
# cap-bounded pair frame (orders of magnitude below the corpus); the CC
# rounds are two grouped shuffles each over THAT edge list, O(log n)
# rounds (Kiveris et al. SoCC'14).
# ---------------------------------------------------------------------------

_REVIEW_ORACLE = f"""
WITH RECURSIVE {_PAIRS_CTES.lstrip()},
pat AS MATERIALIZED (
  SELECT a1, a2, a3, a4 FROM pairs
),
{_GRID_EM_FIN},
rp AS MATERIALIZED (
  SELECT p.ka, p.kb
  FROM pairs p
  JOIN fin f ON f.gid = 8 * p.a1 + 4 * p.a2 + 2 * p.a3 + p.a4
  WHERE f.w * 10 > {_FP}
),
e AS (SELECT ka AS a, kb AS b FROM rp UNION SELECT kb, ka FROM rp),
walk(node, comp) AS (
  SELECT DISTINCT a, a FROM e
  UNION
  SELECT e.a, w.comp FROM e JOIN walk w ON e.b = w.node
),
cc AS (SELECT node, MIN(comp) AS component FROM walk GROUP BY node),
cases AS (
  SELECT component, CAST(COUNT(*) AS BIGINT) AS case_size
  FROM cc GROUP BY component
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_cases,
         CAST(COALESCE(SUM(case_size), 0) AS BIGINT) AS n_records,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM rp) AS n_review_pairs
  FROM cases
)
SELECT c.case_size,
       CAST(COUNT(*) AS BIGINT) AS n_cases_of_size,
       t.n_cases, t.n_records, t.n_review_pairs
FROM cases c, tot t
GROUP BY c.case_size, t.n_cases, t.n_records, t.n_review_pairs
ORDER BY c.case_size
"""


@register("q_fs_review_queue", oracle=_REVIEW_ORACLE)
def q_fs_review_queue(spark, sf_dir):
    """Fellegi-Sunter clerical-review queue (section docstring above):
    link ∪ possible pairs clustered into review CASES via large-star/
    small-star connected components; emits the case-size histogram with
    queue totals — the artifact that sizes a review rotation."""
    from ..operators.clusters import connected_components

    pairs, sizes = _blocked_pairs(spark, sf_dir)
    pairs = pairs.transform(persisted)
    counts, (p, m, u, w) = _fit_em(pairs)  # materializes `pairs`
    sizes.unpersist()
    review_gids = [(g,) for g in range(16) if w[g] * 10 > _FP]
    rg = spark.createDataFrame(review_gids or [], "gid int")
    rp = (
        pairs.withColumn(
            "gid",
            (
                8 * F.col("a1") + 4 * F.col("a2") + 2 * F.col("a3")
                + F.col("a4")
            ).cast("int"),
        )
        .join(F.broadcast(rg), "gid")
        .select("ka", "kb")
        # consumers: CC star rounds + the n_review_pairs total
        .transform(persisted)
    )
    cc = connected_components(rp, left="ka", right="kb")
    cases = cc.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("case_size")
    )
    tot = cases.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cases"),
        F.coalesce(F.sum("case_size"), F.lit(0))
        .cast("bigint")
        .alias("n_records"),
    ).crossJoin(
        F.broadcast(
            rp.agg(F.count(F.lit(1)).cast("bigint").alias("n_review_pairs"))
        )
    )
    return (
        cases.groupBy("case_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cases_of_size"))
        .crossJoin(F.broadcast(tot))
    )
