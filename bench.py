"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from arc_maskdata_pipeline_plugin_spark import get_spark  # noqa: E402

# Headline set: one per operator family; masking/dedup join as implemented.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q_window_top_customers",
    "q_rollup_sales",
    "q_events_hourly",
    "q_mask_customers",
    "q_fake_substitution",
    "dedup_minhash_pairs",
    "dedup_jaccard_pairs",
    "text_quality_scores",
    "text_fingerprints",
    "sim_knn_bruteforce",
    "sim_ann_lsh",
    "q_multimodal_features",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs]
    timings = {}
    # warm the JVM + parquet footer cache with one cheap action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for name in names:
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
