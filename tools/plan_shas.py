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


def _split_toplevel(inner: str) -> list:
    parts, depth, cur = [], 0, []
    for ch in inner:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur).strip())
    return parts


def _group_end(s: str, start: int) -> int:
    depth, j = 1, start + 1
    while j < len(s) and depth:
        if s[j] in "([":
            depth += 1
        elif s[j] in ")]":
            depth -= 1
        j += 1
    return j


def _canon_group(s: str, start: int, open_ch: str, expand: bool, gid_idx=None) -> tuple:
    close_ch = "]" if open_ch == "[" else ")"
    j = _group_end(s, start)
    items = _split_toplevel(s[start + 1 : j - 1])
    if expand:
        def _sub(it):
            parts = [p.strip() for p in _split_toplevel(it[1:-1])]
            if gid_idx is not None and gid_idx < len(parts) and parts[gid_idx].isdigit():
                parts[gid_idx] = "n"
            return "[" + ", ".join(sorted(parts)) + "]"

        items = [
            _sub(it) if it.startswith("[") and it.endswith("]") else it
            for it in items
        ]
    return open_ch + ", ".join(sorted(items)) + close_ch, j


def _canon_distinct_rewrite(s: str) -> str:
    """Byte-identical to bench._canon_distinct_rewrite (locked by
    tests/test_plan_sha_stability.py)."""
    s = re.sub(r"\(gid#x = \d+\)", "(gid#x = n)", s)
    out_lines = []
    for line in s.split("\n"):
        for marker in ("keys=[", "output=[", "hashpartitioning("):
            pos = 0
            while True:
                idx = line.find(marker, pos)
                if idx < 0:
                    break
                grp, end = _canon_group(
                    line, idx + len(marker) - 1, marker[-1], expand=False
                )
                line = line[: idx + len(marker) - 1] + grp + line[end:]
                pos = idx + len(marker)
        if "Expand [" in line:
            pos = 0
            while True:
                idx = line.find("Expand [", pos)
                if idx < 0:
                    break
                proj_end = _group_end(line, idx + 7)
                gid_idx = None
                if line[proj_end:].startswith(", ["):
                    out_end = _group_end(line, proj_end + 2)
                    out_items = _split_toplevel(line[proj_end + 3 : out_end - 1])
                    for i, attr in enumerate(out_items):
                        if re.match(r"(gid|spark_grouping_id)#", attr.strip()):
                            gid_idx = i
                            break
                grp, end = _canon_group(line, idx + 7, "[", expand=True, gid_idx=gid_idx)
                rest = line[end:]
                if rest.startswith(", ["):
                    grp2, end2 = _canon_group(rest, 2, "[", expand=False)
                    rest = ", " + grp2 + rest[end2:]
                line = line[: idx + 7] + grp + rest
                pos = idx + 8
        out_lines.append(line)
    return "\n".join(out_lines)


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
    # AQE stage/codegen ids are timing-dependent (byte-identical to bench)
    s = re.sub(r"\b(Shuffle|Broadcast|TableCache|Result)QueryStage \d+", r"\1QueryStage n", s)
    s = re.sub(r"\*\(\d+\)", "*(n)", s)
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
    s = _canon_distinct_rewrite(s)
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
