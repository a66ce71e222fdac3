"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Protocol (BASELINE.md): warm JVM (one untimed warm-up pass of the
flagship), then each query timed as a full plan build + execution with a
count-style sink (no driver materialization of result rows beyond the
aggregate — mirrors cluster behavior where results land in a sink).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from database_cloner_spark.registry import specs
from database_cloner_spark.session import get_spark

# Headline set: one representative per operator family, weighted toward
# the shapes that dominate at 100 TB (scan-agg, shuffle joins, windows).
HEADLINE = [
    "q1_pricing_summary",
    "q_agg_count_by_group",
    "q_agg_rollup",
    "q_agg_distinct",
    "q_sort",
    "q_topk",
    "q_filter_conj",
    "q_union_append",
    "q_except_diff",
    "q_scan_document",
    "q_join_multiway",
    "q_join_asof",
    "q_win_rownum_dedup",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_sim_topk",
    "q_corr_subquery",
    "q_sample_split",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("dcs-bench")

    registry = specs()
    names = [n for n in HEADLINE if n in registry]
    # Warm-up: JVM JIT + parquet footer cache (untimed).
    registry["q1_pricing_summary"].builder(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        builder = registry[name].builder
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df = builder(spark, sf_dir)
            # Force full execution without driver-side row transfer.
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
