"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark
from job_search_engine_using_pyspark_solar_and_angular_spark.queries import (
    extensions as _ext,  # noqa: F401  (registers extension queries)
)
from job_search_engine_using_pyspark_solar_and_angular_spark.queries.declared import QUERIES

HEADLINE = [
    "q03_anti_join",
    "ext_tpch_q3",
    "q08_latest_wins",
    "q11_agg_tpch_q1",
    "q12_broadcast_join",
    "q17_wordcount_topk",
    "q20_bm25_search",
    "q23_tumbling_window",
    "x1_dedup_stats",
    "x2_cosine_topk",
    "ext_minhash_candidates",
    "ext_simhash",
    "ext_multimodal_features",
    # the reference's whole batch job (BASELINE.md Figure 10 workload shape):
    # nested flatten + 3-way split + latest-wins dedup + vocab regex filter
    "ext_preprocess_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="jse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths AND the Python worker pool once so per-query
    # numbers measure the plan, not first-call JIT / worker-spawn (standard
    # benchmark practice; warmup at tiny sf).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        QUERIES["q11_agg_tpch_q1"](spark, warm_dir).collect()
        QUERIES["q20_bm25_search"](spark, warm_dir).collect()
        QUERIES["ext_multimodal_features"](spark, warm_dir).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        # count() forces full execution without driver-side result transfer
        # for big outputs; top-k queries return tiny results anyway.
        df.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "?"
    print(
        json.dumps(
            {
                "metric": "headline query wall time (sum)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
