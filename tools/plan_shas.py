"""Compute normalized physical-plan fingerprints for a repo tree's headline
queries WITHOUT benchmarking them.

Usage: python tools/plan_shas.py <repo_root> <sf_dir> [out.json]

Used once to backfill `plan_shas` into a previous round's
BENCH_DETAIL_r{N}.json snapshot (git worktree at that round's commit), so
bench.py's >1.3x regression flags can be auto-adjudicated as `plan-changed`
vs `environment (plan unchanged)` from the very first round the mechanism
ships (VERDICT r05 next-round #3). The normalization here MUST stay
byte-identical to ``bench._plan_sha``.

Note: "planning only" still executes any O(1)-row driver probes a query
performs during construction (BPE vocab argmax, PCA moment probe, iterative
graph rounds), so this is minutes, not seconds, at sf0.1.
"""

import hashlib
import json
import re
import sys


def plan_sha(df) -> str:
    sess = df.sparkSession
    prev = sess.conf.get("spark.sql.maxMetadataStringLength", "100")
    sess.conf.set("spark.sql.maxMetadataStringLength", "100000")
    try:
        s = df._jdf.queryExecution().executedPlan().toString()
    finally:
        sess.conf.set("spark.sql.maxMetadataStringLength", prev)
    s = re.sub(r"#\d+", "#x", s)
    s = re.sub(r"\[id=[^\]]*\]", "", s)
    s = re.sub(r"plan_id=\d+", "plan_id=x", s)
    s = re.sub(r"Statistics\([^)]*\)", "", s)
    s = re.sub(r"isFinalPlan=\w+", "", s)
    # higher-order-function lambda variables (x_3, y_7, ...) carry
    # session-monotonic suffixes — normalize the name, keep the shape
    s = re.sub(r"\b([a-z]+)_\d+#x", r"\1_n#x", s)
    # IN-list literals built from a Python set splat in hash-randomized
    # order (VERDICT r06 wrong-item #1) — fingerprint the SET, not the
    # arrival order (byte-identical to bench._plan_sha)
    s = re.sub(
        r"\bIN \(([^()]+)\)",
        lambda m: "IN (" + ",".join(sorted(m.group(1).split(","))) + ")",
        s,
    )
    return hashlib.sha256(s.encode()).hexdigest()[:16]


def main():
    repo_root, sf_dir = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    sys.path.insert(0, repo_root)
    import bench as bench_mod  # the TARGET tree's bench (for HEADLINE)
    import __spark_entry__ as entry_mod
    from arc_maskdata_pipeline_plugin_spark import get_spark

    spark = get_spark("plan_shas")
    qs = entry_mod.queries()
    names = [n for n in bench_mod.HEADLINE if n in qs]
    shas = {}
    for name in names:
        try:
            shas[name] = plan_sha(qs[name](spark, sf_dir))
        except Exception as exc:  # a query that can't even plan is reported
            print(f"# {name}: FAILED to plan: {exc}", file=sys.stderr)
        spark.catalog.clearCache()
        print(f"# {name}: {shas.get(name)}", file=sys.stderr)
    doc = json.dumps(shas, indent=1)
    if out_path:
        with open(out_path, "w") as f:
            f.write(doc)
    else:
        print(doc)


if __name__ == "__main__":
    main()
