"""Per-query optimization profiler (r12 optimization round).

For each named query: capture ``.explain('formatted')`` to a file, then time
cold + N warm runs with the bench's methodology (``.count()`` after
``release_persisted()`` + ``clearCache()`` between runs is NOT done inside a
query's warm loop — matching bench.py, caches persist across the warm runs of
one query and are dropped before the next query).

Usage:
    python tools/profile_query.py [--plans-dir plans/r12 --suffix before]
        [--noop] [--runs 3] q_pagerank_suppliers [more...]

``--noop`` times ``df.write.format('noop')`` instead of ``.count()`` (guide
§1.4) — used to sanity-check that count() isn't pruning whole subtrees; the
recorded bench methodology stays count().
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from arc_maskdata_pipeline_plugin_spark import get_spark  # noqa: E402
from arc_maskdata_pipeline_plugin_spark.cache import release_persisted  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--plan-only", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_spark("profile")
    qs = entry_mod.queries()
    sf_dir = args.sf_dir
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()

    for name in args.names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(plan)
            release_persisted()
            spark.catalog.clearCache()
        if args.plan_only:
            print(f"{name}: plan captured", flush=True)
            continue

        def action(df):
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
                return -1
            return df.count()

        spark.sparkContext.setJobDescription(f"profile:{name}:cold")
        t0 = time.perf_counter()
        n = action(qs[name](spark, sf_dir))
        cold = time.perf_counter() - t0
        warms = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}:warm{i}")
            t0 = time.perf_counter()
            action(qs[name](spark, sf_dir))
            warms.append(round(time.perf_counter() - t0, 3))
        release_persisted()
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: cold {cold:.3f}s warm {sorted(warms)} ({n} rows)",
            flush=True,
        )


if __name__ == "__main__":
    main()
