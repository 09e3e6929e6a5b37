"""Q18 on a bucketed storage layout at x100 — the fix SCALE.md names for
the one super-linear TPC-H scaler, measured instead of only plan-pinned.

Q18 keys its grouped-fact HAVING on l_orderkey, the highest-cardinality
key in the schema (~15M groups at 100 TB-shape), so map-side combine
compresses only the ~4-line per-order fan-in and the shuffle carries the
full group-state volume; the probe-measured unbucketed ratio was 22-74x
time at 100x data. The cluster-scale fix is storage layout: lineitem
bucketed (and sorted) on l_orderkey makes the aggregation shuffle-free,
and orders bucketed on o_orderkey with the SAME bucket count makes the
orderkey join co-located too — the only remaining Exchange in the whole
plan is the final ORDER BY's range partitioning over the ~1% qualifying
rows.

Usage:
  python tools/probe_q18_bucketed.py [reps]   # default 100 (60M lineitem)

Reuses .bench/tpchrep_r{reps} (probe_tpch_scale builds it) and writes the
bucketed twins once under .bench/q18_bucketed_r{reps}. Prints one JSON
line: unbucketed vs bucketed min-of-2 timings, the one-time bucketing
write cost, and the Exchange counts of both executed plans.
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

from tools.probe_tpch_scale import (  # noqa: E402
    SF_DIR,
    build_replicated_dir,
    force,
    timed_min,
)

BENCH_DIR = os.path.join(REPO, ".bench")
BUCKETS = 64


def q18_plan(li, o, c):
    """The exact ext_tpch_q18 logic (extensions.py) over caller-supplied
    relations, so the same plan runs against parquet or bucketed tables."""
    qc = F.round(F.col("l_quantity") * 100, 0).cast("long")
    big = (
        li.groupBy(F.col("l_orderkey").alias("lk"))
        .agg(F.sum(qc).alias("sum_qc"))
        .filter(F.col("sum_qc") > 250 * 100)
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("lk"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("o_totalprice"),
            (F.col("sum_qc") / 100.0).alias("sum_qty"),
        )
        .orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderdate"), F.col("o_orderkey")
        )
    )


def exchange_count(df) -> int:
    p = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        line.strip().lstrip("+-: ").startswith("Exchange")
        for line in p.splitlines()
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    from job_search_engine_using_pyspark_solar_and_angular_spark.catalog import (
        write_bucketed,
    )
    from job_search_engine_using_pyspark_solar_and_angular_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="probe-q18-bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    rep_dir = build_replicated_dir(spark, reps)

    bdir = os.path.join(BENCH_DIR, f"q18_bucketed_r{reps}")
    marker = os.path.join(bdir, "_BUCKETED_OK")
    li_name, o_name = f"q18_li_b{reps}", f"q18_o_b{reps}"
    bucket_write_sec = None
    if os.path.exists(marker):
        # data written by a previous session: the catalog is per-session
        # (in-memory), so re-attach the bucketed metadata via DDL — the
        # bucket spec must match write_bucketed's exactly or the layout's
        # partitioning guarantee silently vanishes from the plans
        for name, loc, cols, key in (
            (
                li_name,
                os.path.join(bdir, "lineitem"),
                "l_orderkey BIGINT, l_quantity DOUBLE",
                "l_orderkey",
            ),
            (
                o_name,
                os.path.join(bdir, "orders"),
                "o_orderkey BIGINT, o_custkey BIGINT, "
                "o_orderdate TIMESTAMP, o_totalprice DOUBLE",
                "o_orderkey",
            ),
        ):
            if not spark.catalog.tableExists(name):
                spark.sql(
                    f"CREATE TABLE {name} ({cols}) USING PARQUET "
                    f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                    f"INTO {BUCKETS} BUCKETS LOCATION '{loc}'"
                )
    else:
        shutil.rmtree(bdir, ignore_errors=True)
        os.makedirs(bdir, exist_ok=True)
        for n in (li_name, o_name):
            spark.sql(f"DROP TABLE IF EXISTS {n}")
        t0 = time.perf_counter()
        write_bucketed(
            spark.read.parquet(f"{rep_dir}/lineitem.parquet").select(
                "l_orderkey", "l_quantity"
            ),
            li_name,
            os.path.join(bdir, "lineitem"),
            ["l_orderkey"],
            buckets=BUCKETS,
        )
        write_bucketed(
            spark.read.parquet(f"{rep_dir}/orders.parquet").select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
            ),
            o_name,
            os.path.join(bdir, "orders"),
            ["o_orderkey"],
            buckets=BUCKETS,
        )
        bucket_write_sec = round(time.perf_counter() - t0, 3)
        open(marker, "w").close()

    c = spark.read.parquet(f"{rep_dir}/customer.parquet")
    unbucketed = q18_plan(
        spark.read.parquet(f"{rep_dir}/lineitem.parquet"),
        spark.read.parquet(f"{rep_dir}/orders.parquet"),
        c,
    )
    bucketed = q18_plan(spark.table(li_name), spark.table(o_name), c)

    # correctness: identical result sets (count + a value checksum)
    chk = lambda df: df.agg(  # noqa: E731
        F.count("*").alias("n"),
        F.sum(F.col("c_custkey") + F.col("o_orderkey")).alias("s"),
    ).first()
    a, b = chk(unbucketed), chk(bucketed)
    assert (a["n"], a["s"]) == (b["n"], b["s"]), (a, b)

    force(unbucketed)  # warm
    force(bucketed)
    out = {
        "metric": "Q18 bucketed-layout probe",
        "reps": reps,
        "buckets": BUCKETS,
        "bucket_write_sec": bucket_write_sec,
        "unbucketed_sec": timed_min(lambda: force(
            q18_plan(
                spark.read.parquet(f"{rep_dir}/lineitem.parquet"),
                spark.read.parquet(f"{rep_dir}/orders.parquet"),
                c,
            )
        )),
        "bucketed_sec": timed_min(
            lambda: force(q18_plan(spark.table(li_name), spark.table(o_name), c))
        ),
        "unbucketed_exchanges": exchange_count(unbucketed),
        "bucketed_exchanges": exchange_count(bucketed),
        "rows": a["n"],
    }
    out["speedup"] = round(out["unbucketed_sec"] / out["bucketed_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
