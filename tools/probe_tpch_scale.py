"""Relational-core replication probe: replicate the sf0.1 FACT tables
(lineitem x orders, key-consistently) and re-run the heaviest TPC-H
dossier members against the larger corpus — the relational twin of the
ANN/BM25 probes. What it demonstrates: scan-bound aggregates scale
sub-linearly (partial aggregation — the shuffle moves group states, not
rows), and the star/composite-key joins scale near-linearly in the fact
volume with no plan degradation (broadcast dims stay broadcast).

Replication is KEY-CONSISTENT: replica r of order o gets
o_orderkey + r*10^9 on both sides of the orders<->lineitem edge, while
customer/part/supplier foreign keys are left untouched — dimensions stay
the same size (their realistic shape: facts grow, dims don't).

Usage:
  python tools/probe_tpch_scale.py [reps]     # default 20 (-> 12M lineitem)

At reps=100 (60M lineitem) run with JSE_DRIVER_MEMORY=16g: five warmed
60M-row query plans' broadcast variables accumulate in the single probe
session and the default 8g driver can hit broadcast-build OOM between
ContextCleaner passes (a probe-harness artifact — each query alone fits).

Prints one JSON line with per-query sf0.1 vs replicated timings (min of
2, noop-forced). Replicated tables cached under .bench/tpchrep_r{reps}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BENCH_DIR = os.path.join(REPO, ".bench")
# q21 added in the r7 continuation: the shuffle-volume audit's only
# mildly super-linear entry (13.2x shuffle write at 10x data — the
# lineitem exists/not-exists self-join pair); probed here to bound it
QUERIES_TO_PROBE = [
    "ext_tpch_q1",
    "ext_tpch_q5",
    "ext_tpch_q9",
    "ext_tpch_q18",
    "ext_tpch_q21",
]
SMALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "events", "documents", "embeddings",
]


def timed_min(fn, trials: int = 2) -> float:
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_replicated_dir(spark, reps: int) -> str:
    out = os.path.join(BENCH_DIR, f"tpchrep_r{reps}")
    marker = os.path.join(out, "_REPLICATED_OK")
    if os.path.exists(marker):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    r = spark.range(reps).select(F.col("id").alias("__rep"))
    off = F.col("__rep") * 1_000_000_000

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.crossJoin(r).withColumn(
        "l_orderkey", F.col("l_orderkey") + off
    ).drop("__rep").write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    o.crossJoin(r).withColumn(
        "o_orderkey", F.col("o_orderkey") + off
    ).drop("__rep").write.mode("overwrite").parquet(f"{out}/orders.parquet")

    for t in SMALL_TABLES:
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(src):
            # dims stay 1x — copy so the dir is a complete sf layout
            spark.read.parquet(src).write.mode("overwrite").parquet(
                f"{out}/{t}.parquet"
            )
    open(marker, "w").close()
    return out


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark
    from job_search_engine_using_pyspark_solar_and_angular_spark.queries import (
        extensions as _ext,  # noqa: F401
    )
    from job_search_engine_using_pyspark_solar_and_angular_spark.queries.declared import (
        QUERIES,
    )

    spark = get_spark(app_name="probe-tpch-scale")
    spark.sparkContext.setLogLevel("ERROR")
    rep_dir = build_replicated_dir(spark, reps)

    out = {"metric": "TPC-H replication probe", "reps": reps, "queries": {}}
    for name in QUERIES_TO_PROBE:
        force(QUERIES[name](spark, SF_DIR))  # warm both plans
        force(QUERIES[name](spark, rep_dir))
        base = timed_min(lambda: force(QUERIES[name](spark, SF_DIR)))
        big = timed_min(lambda: force(QUERIES[name](spark, rep_dir)))
        out["queries"][name] = {
            "sf0.1_sec": base,
            f"x{reps}_sec": big,
            "time_ratio": round(big / base, 2) if base else None,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
