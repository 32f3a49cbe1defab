"""Local mirror of the driver's correctness gate.

For every query in ``__spark_entry__.queries()``: run the Spark DataFrame and
the DuckDB oracle SQL side-by-side on the same parquet tables, then compare
row count, column names, and an order-insensitive value canonicalization.
Run as a script:  python tools/oracle_check.py [flags] [sf_dir] [query ...]

Config-matrix flags (VERDICT r10 #2 — the driver's session is NOT
``session.py``'s, and that gap shipped the r10 ``q_bloom_skip_audit``
escape: plans that relied on AQE exchange reuse or the builder's
64-partition layout passed locally and failed in the driver's stock
200-partition session):

* ``--stock``  — run under stock ``spark.sql.shuffle.partitions=200``
* ``--no-aqe`` — run with ``spark.sql.adaptive.enabled=false``
* ``--gate``   — restrict to the GATE_WINDOW (the driver's 50-query gate)

Each flag combination needs its own process (one JVM = one session config);
the round-close checklist runs ``--gate --stock`` and ``--gate --no-aqe``
as two extra passes alongside the full default sweep.
"""

from __future__ import annotations

import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Sketch ESTIMATE frames (VERDICT r02 #8): the sketches differ across
# engines, so exact hashing is impossible — but the sketch's answer must sit
# within a bounded relative error of DuckDB's EXACT answer. rel_err 0.0 =
# exact match (for columns both engines compute exactly). As of r08 the
# REGISTERED queries are hash-oracled audits (exact integers + Spark-side
# verdicts); these specs now check the raw *_estimates helper frames, driven
# by tests/test_sketch_tolerance.py (compare_query's dispatch still works if
# a registered name lands here with oracle=None).
TOLERANCE_ORACLES: dict[str, dict] = {
    # HLL++ at rsd=0.01; 5% is a generous envelope over the configured 1%
    "q_approx_distinct_users_estimates": {
        "oracle": """
            SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS approx_users
            FROM events GROUP BY event_type
        """,
        "keys": ["event_type"],
        "rel_err": {"approx_users": 0.05},
    },
    # Greenwald-Khanna at accuracy=10000 (rank error 1e-4). A VALUE tolerance
    # is the wrong shape for quantiles (at small n the sketch returns an
    # actual element while quantile_cont interpolates — relative gaps can be
    # large even when the rank is dead on); the guarantee GK actually makes
    # is on RANK, so check the answer lies in the exact-quantile bracket
    # [quantile_cont(p-δ), quantile_cont(p+δ)] with δ=0.01 (100× the sketch's
    # configured rank error).
    "q_approx_quantiles_estimates": {
        "oracle": """
            SELECT event_type,
                   quantile_cont(value, 0.49) AS p50_lo,
                   quantile_cont(value, 0.51) AS p50_hi,
                   quantile_cont(value, 0.94) AS p95_lo,
                   quantile_cont(value, 0.96) AS p95_hi,
                   quantile_cont(value, 0.98) AS p99_lo,
                   quantile_cont(value, 1.00) AS p99_hi,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY event_type
        """,
        "keys": ["event_type"],
        "bracket": {"p50": ("p50_lo", "p50_hi"), "p95": ("p95_lo", "p95_hi"), "p99": ("p99_lo", "p99_hi")},
        "rel_err": {"n": 0.0},
    },
    # DataSketches HLL at lgConfigK=12 (rsd ≈ 1.04/sqrt(2^12) ≈ 1.6%); 5% is
    # a generous envelope. Both the direct sketch and the merged-daily sketch
    # must land within it (their bit-exact equality is asserted in-plan via
    # the merge_exact column — checked here as rel_err 0 against each other
    # by construction since both columns face the same exact count).
    "q_hll_merge_daily_estimates": {
        "oracle": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS est_direct,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS est_merged
            FROM events GROUP BY event_type
        """,
        "keys": ["event_type"],
        "rel_err": {"est_direct": 0.05, "est_merged": 0.05},
    },
    # inclusion-exclusion over HLL sketches: each estimate carries the
    # sketch's ~1% envelope and the overlap subtracts three of them, so its
    # budget is wider (10%); at gate cardinalities the sketches run in exact
    # (coupon) mode and the match is typically exact.
    "q_hll_audience_overlap_estimates": {
        "oracle": """
            WITH ue AS (SELECT DISTINCT event_type, user_id FROM events),
            n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd
                  FROM ue GROUP BY event_type)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   na.nd AS est_a, nb.nd AS est_b,
                   CAST(COUNT(*) AS BIGINT) AS est_overlap
            FROM ue a JOIN ue b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            JOIN n na ON na.event_type = a.event_type
            JOIN n nb ON nb.event_type = b.event_type
            GROUP BY 1, 2, 3, 4
        """,
        "keys": ["type_a", "type_b"],
        "rel_err": {"est_a": 0.05, "est_b": 0.05, "est_overlap": 0.10},
    },
}


def compare_tolerance(name: str, spdf, spec: dict, sf_dir: str) -> dict:
    """Join Spark and exact-oracle results on the keys; every value column
    must sit within its relative-error budget of the exact answer."""
    opdf = duckdb_run(spec["oracle"], sf_dir)
    out = {"name": name, "rows": len(spdf), "oracle_rows": len(opdf)}
    if len(spdf) != len(opdf):
        out["status"] = "ROWCOUNT-MISMATCH"
        return out
    merged = spdf.merge(opdf, on=spec["keys"], suffixes=("_s", "_o"), how="outer")
    if len(merged) != len(opdf):
        out["status"] = "KEY-MISMATCH"
        return out

    def side(col: str, suffix: str):
        # pandas only suffixes columns present on BOTH sides of the merge
        return merged[f"{col}{suffix}" if f"{col}{suffix}" in merged else col]

    worst: tuple[float, str] | None = None
    for col, eps in spec.get("rel_err", {}).items():
        for s, o in zip(side(col, "_s"), side(col, "_o")):
            s, o = float(s), float(o)
            rel = abs(s - o) / max(abs(o), 1e-12)
            if worst is None or rel > worst[0]:
                worst = (rel, col)
            if rel > eps:
                out["status"] = "TOLERANCE-EXCEEDED"
                out["col"] = col
                out["spark"] = s
                out["exact"] = o
                out["rel_err"] = rel
                return out
    for col, (lo_col, hi_col) in spec.get("bracket", {}).items():
        for s, lo, hi in zip(side(col, "_s"), merged[lo_col], merged[hi_col]):
            if not (float(lo) <= float(s) <= float(hi)):
                out["status"] = "BRACKET-EXCEEDED"
                out["col"] = col
                out["spark"] = float(s)
                out["bounds"] = (float(lo), float(hi))
                return out
    out["status"] = "TOLERANCE-MATCH"
    if worst:
        out["worst_rel_err"] = round(worst[0], 6)
        out["worst_col"] = worst[1]
    return out


def duckdb_run(sql: str, sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _canon_cell(v):
    """Canonicalize one cell for order-insensitive comparison."""
    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # exact: hash the bit pattern (we design queries to be bit-stable)
        return repr(v)
    if isinstance(v, Decimal):
        return f"dec:{v}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or isinstance(v, np.ndarray):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return "b:" + v.hex()
    if pd.isna(v):
        return "NULL"
    return str(v)


def canonical_rows(pdf) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def compare_query(name: str, fn, oracle: str | None, spark, sf_dir: str) -> dict:
    sdf = fn(spark, sf_dir)
    spdf = sdf.toPandas()
    out = {"name": name, "rows": len(spdf), "cols": sorted(spdf.columns)}
    if oracle is None:
        if name in TOLERANCE_ORACLES:
            return compare_tolerance(name, spdf, TOLERANCE_ORACLES[name], sf_dir)
        out["status"] = "rows-only"
        return out
    opdf = duckdb_run(oracle, sf_dir)
    out["oracle_rows"] = len(opdf)
    if len(spdf) != len(opdf):
        out["status"] = "ROWCOUNT-MISMATCH"
        return out
    if sorted(spdf.columns) != sorted(opdf.columns):
        out["status"] = "SCHEMA-MISMATCH"
        out["oracle_cols"] = sorted(opdf.columns)
        return out
    s_rows, o_rows = canonical_rows(spdf), canonical_rows(opdf)
    if s_rows == o_rows:
        out["status"] = "MATCH"
    else:
        out["status"] = "VALUE-MISMATCH"
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b]
        out["n_diff_rows"] = len(diffs)
        out["first_diff"] = diffs[0] if diffs else None
    return out


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry
    from arc_maskdata_pipeline_plugin_spark import get_spark
    from arc_maskdata_pipeline_plugin_spark.cache import release_persisted

    args = sys.argv[1:]
    stock = "--stock" in args
    no_aqe = "--no-aqe" in args
    gate_only = "--gate" in args
    args = [a for a in args if a not in ("--stock", "--no-aqe", "--gate")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    extra = {}
    if stock:
        extra["spark.sql.shuffle.partitions"] = "200"
    if no_aqe:
        extra["spark.sql.adaptive.enabled"] = "false"
    spark = get_spark("oracle-check", extra_conf=extra)
    for k, v in extra.items():
        # getOrCreate reuses a live session without applying builder confs;
        # set runtime-settable confs explicitly so the matrix flag always
        # binds (shuffle.partitions and AQE are both runtime-settable)
        spark.conf.set(k, v)
    if extra:
        print(
            "config-matrix: "
            + ", ".join(f"{k}={spark.conf.get(k)}" for k in extra)
        )
    qs = entry.queries()
    if gate_only:
        qs = {n: qs[n] for n in entry.GATE_WINDOW}
    oracles = entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = compare_query(name, fn, oracles.get(name), spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            res = {"name": name, "status": "ERROR", "error": repr(e)[:500]}
        ok = res["status"] in ("MATCH", "rows-only", "TOLERANCE-MATCH")
        if not ok:
            failed.append(name)
        print(("PASS " if ok else "FAIL ") + str(res))
        # Some queries persist small shared fragments (shingles, BPE vocab,
        # daily aggregates). Drop them between queries — a lingering cache on
        # a fragment shared across queries flips later plans to
        # InMemoryTableScan and accumulates pressure over the 226-query
        # single-session sweep (bench.py already does this).
        spark.catalog.clearCache()
        release_persisted()  # drop the tracking list alongside the cache
    n_run = len(only) if only else len(qs)
    print(f"\n{n_run - len(failed)}/{n_run} ok; failed: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
