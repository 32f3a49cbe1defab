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
    "q2_cheapest_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_volume_shipping",
    "q_salted_join_revenue",
    "q_window_top_customers",
    "q_rollup_sales",
    "q_distinct_users_by_type",
    "q_events_hourly",
    "q_sessionize_events",
    "q_word_counts",
    "q_mask_customers",
    "q_fake_substitution",
    "dedup_minhash_pairs",
    "dedup_jaccard_pairs",
    "text_quality_scores",
    "text_fingerprints",
    "sim_knn_bruteforce",
    "sim_ann_lsh",
    "q_multimodal_features",
    # breadth additions (round 1): hardest TPC-H shapes + UDAF + IVF ANN
    "q8_market_share",
    "q21_sole_returning_supplier",
    "q_udaf_group_quantiles",
    "sim_ann_ivf",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    qs = entry_mod.queries()
    names = [n for n in HEADLINE if n in qs]
    timings = {}
    cold = {}
    # warm the JVM + parquet footer cache with one cheap action
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    for name in names:
        # two runs: first pays plan-compilation + Python-worker fork noise,
        # second is the steady-state number an engine comparison cares about
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: warm {timings[name]}s / cold {cold[name]}s ({n} rows)", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_total": round(sum(cold.values()), 3),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
