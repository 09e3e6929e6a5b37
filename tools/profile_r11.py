"""r11 optimization round: per-query profiling — construction time vs
execution time, job counts, and plan stats for the bench's hottest entries.

Usage: python tools/profile_r11.py [query ...]   (defaults to the hot set)

For each query: builds the DataFrame twice (construction wall), forces the
noop sink three times (exec wall: first = codegen-cold, then 2 warm), and
reports the Exchange count of the final plan. Run on an idle host.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark
from job_search_engine_using_pyspark_solar_and_angular_spark.queries import (
    extensions as _ext,  # noqa: F401
)
from job_search_engine_using_pyspark_solar_and_angular_spark.queries.declared import QUERIES

HOT = [
    "ext_pagerank",
    "ext_curation_verdict",
    "ext_preprocess_pipeline",
    "ext_repeated_spans",
    "ext_bfs_distances",
    "ext_bpe_encode",
    "ext_bpe_merges",
    "ext_dedup_clusters",
    "ext_ann_lsh_quantized",
    "ext_ann_pq",
    "ext_ann_pq_rerank",
    "ext_tpch_q9",
    "ext_hybrid_rrf",
]


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    names = sys.argv[1:] or HOT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="jse-profile-r11")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm
    force(QUERIES["q11_agg_tpch_q1"](spark, "/root/testdata/sf0.001"))

    print(f"{'query':<28} {'constr_s':>8} {'exec1_s':>8} {'exec2_s':>8} "
          f"{'exec3_s':>8} {'jobs':>5} {'exch':>5}")
    for name in names:
        if name not in QUERIES:
            print(f"{name:<28} MISSING")
            continue
        # construction cost: build twice, report the second (first may JIT)
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        c1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        df = QUERIES[name](spark, sf_dir)
        c2 = time.perf_counter() - t0
        execs = []
        jobs_before = sc.statusTracker().getJobIdsForGroup(None)
        for i in range(3):
            # rebuild per trial like the bench does for trial parity of
            # iterative queries (their loops run actions during build)
            t0 = time.perf_counter()
            if i > 0:
                df = QUERIES[name](spark, sf_dir)
            force(df)
            execs.append(time.perf_counter() - t0)
        try:
            plan = df._jdf.queryExecution().executedPlan().toString()
            exch = plan.count("Exchange")
        except Exception:
            exch = -1
        njobs = len(sc.statusTracker().getJobIdsForGroup(None)) - len(jobs_before)
        print(
            f"{name:<28} {min(c1, c2):>8.3f} {execs[0]:>8.3f} "
            f"{execs[1]:>8.3f} {execs[2]:>8.3f} {njobs // 3:>5} {exch:>5}"
        )


if __name__ == "__main__":
    main()
