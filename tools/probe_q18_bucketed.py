"""Q18 + Q21 on a bucketed storage layout at x100 — the fix SCALE.md
names for the schema's two heaviest orderkey aggregations, measured
instead of only plan-pinned.

Both queries key their fact-grain work on l_orderkey, the
highest-cardinality key in the schema (~15M groups at 100 TB-shape):

* Q18's grouped-fact HAVING shuffles one group state per ORDER (map-side
  combine only compresses the ~4-line per-order fan-in); measured
  unbucketed ratio was 22-74x time at 100x data.
* Q21's EXISTS/NOT-EXISTS pair starts from a fact⋈fact lineitem⋈orders
  join on orderkey, then EVERY downstream step (the (orderkey, suppkey)
  pair dedup, the per-order quantifier agg, the culprit join-back) just
  reuses orderkey clustering — it was the shuffle audit's only
  super-linear entry before the two-stage rewrite.

The cluster-scale fix is storage layout, not plan surgery: lineitem
bucket-sorted on l_orderkey and orders on o_orderkey with the SAME bucket
count make Q18's aggregation + join AND Q21's fact⋈fact join + whole
aggregation ladder run shuffle-free off the layout. The only Exchanges
left are the result-sized tail (Q18's final ORDER BY range partition;
Q21's 10-row supplier-name agg).

Usage:
  python tools/probe_q18_bucketed.py [reps]   # default 100 (60M lineitem)

Reuses .bench/tpchrep_r{reps} (probe_tpch_scale builds it) and writes the
bucketed twins once under .bench/bucketed_r{reps} (one table pair serves
both queries — the point of a layout fix). Prints one JSON line per
query: unbucketed vs bucketed min-of-2 timings, the one-time bucketing
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
# one bucketed table pair serves both probed queries
LI_COLS = ["l_orderkey", "l_quantity", "l_suppkey", "l_shipdate"]
O_COLS = ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "o_orderstatus"]
LI_DDL = (
    "l_orderkey BIGINT, l_quantity DOUBLE, l_suppkey BIGINT, "
    "l_shipdate TIMESTAMP"
)
O_DDL = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderdate TIMESTAMP, "
    "o_totalprice DOUBLE, o_orderstatus STRING"
)


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


def q21_plan(li, o, s):
    """The exact ext_tpch_q21 logic (extensions.py: two-stage pair dedup ->
    per-order quantifiers -> culprit join-back) over caller-supplied
    relations."""
    rows = li.join(
        o.filter(F.col("o_orderstatus") == "F"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
        ).alias("is_late"),
    )
    per_pair = rows.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("is_late").cast("int")).alias("late")
    )
    waiting = (
        per_pair.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.count("*").alias("n_supp"), F.sum("late").alias("n_late_supp"))
        .filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    culprit = (
        per_pair.filter(F.col("late") == 1)
        .join(waiting, F.col("l_orderkey") == F.col("ok"))
        .select("l_orderkey", "l_suppkey")
    )
    return (
        culprit.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(10)
    )


def exchange_count(df) -> int:
    p = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        line.strip().lstrip("+-: ").startswith("Exchange")
        for line in p.splitlines()
    )


def ensure_bucketed_pair(spark, li_src, o_src, bdir: str, li_name: str, o_name: str):
    """Ensure the bucket-sorted lineitem/orders pair exists at ``bdir``
    under the given catalog names — the ONE owner of the on-disk layout +
    DDL re-attach sequence (bench.py's bucketed entry and this probe both
    call it; the CREATE TABLE bucket spec must match write_bucketed's
    exactly or the layout guarantee silently vanishes from the plans, so
    there must be exactly one copy of it). Returns the one-time write cost
    in seconds — recorded IN the marker at write time and returned on
    every cache reuse too, so the bench artifact's ``bucket_write_sec``
    is never null (VERDICT r10 #5: SCALE.md's amortization claim rests on
    this number, and cached runs kept reporting null).

    ``li_src``/``o_src`` are zero-arg callables returning the SOURCE
    DataFrames. The marker records each source's row count AND its
    orderkey sum (one agg pass per table): a source regenerated in place
    (fresh-container testdata rebuild with a persistent .bench)
    invalidates the cache and triggers a rewrite instead of feeding
    callers a stale layout (whose result-equality assert would otherwise
    abort the whole bench run). Counts alone were not enough (ADVICE r9):
    regenerated data with identical counts but different content silently
    reused the stale layout."""
    from job_search_engine_using_pyspark_solar_and_angular_spark.catalog import (
        write_bucketed,
    )

    marker = os.path.join(bdir, "_BUCKETED_OK")
    li_df, o_df = li_src(), o_src()

    def _fingerprint(df, key: str) -> dict:
        r = df.agg(F.count("*").alias("n"), F.sum(key).alias("s")).first()
        return {"n": r["n"], "key_sum": r["s"]}

    counts = {
        "lineitem": _fingerprint(li_df, "l_orderkey"),
        "orders": _fingerprint(o_df, "o_orderkey"),
    }
    cached = None
    if os.path.exists(marker):
        try:
            with open(marker, encoding="utf-8") as fh:
                cached = json.load(fh)
        except (OSError, ValueError):
            cached = None
    cached_counts = (cached or {}).get("counts", cached)
    if cached_counts == counts:
        # data written by a previous session: the catalog is per-session
        # (in-memory), so re-attach the bucketed metadata via DDL
        for name, loc, cols, key in (
            (li_name, os.path.join(bdir, "lineitem"), LI_DDL, "l_orderkey"),
            (o_name, os.path.join(bdir, "orders"), O_DDL, "o_orderkey"),
        ):
            if not spark.catalog.tableExists(name):
                spark.sql(
                    f"CREATE TABLE {name} ({cols}) USING PARQUET "
                    f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                    f"INTO {BUCKETS} BUCKETS LOCATION '{loc}'"
                )
        # pre-r11 markers carried only the counts (no recorded cost)
        return (cached or {}).get("bucket_write_sec")
    shutil.rmtree(bdir, ignore_errors=True)
    os.makedirs(bdir, exist_ok=True)
    for n in (li_name, o_name):
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    t0 = time.perf_counter()
    write_bucketed(
        li_df.select(*LI_COLS), li_name, os.path.join(bdir, "lineitem"),
        ["l_orderkey"], buckets=BUCKETS,
    )
    write_bucketed(
        o_df.select(*O_COLS), o_name, os.path.join(bdir, "orders"),
        ["o_orderkey"], buckets=BUCKETS,
    )
    bucket_write_sec = round(time.perf_counter() - t0, 3)
    with open(marker, "w", encoding="utf-8") as fh:
        json.dump({"counts": counts, "bucket_write_sec": bucket_write_sec}, fh)
    return bucket_write_sec


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    from job_search_engine_using_pyspark_solar_and_angular_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="probe-q18-bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    rep_dir = build_replicated_dir(spark, reps)

    bdir = os.path.join(BENCH_DIR, f"bucketed_r{reps}")
    li_name, o_name = f"jse_li_b{reps}", f"jse_o_b{reps}"
    bucket_write_sec = ensure_bucketed_pair(
        spark,
        lambda: spark.read.parquet(f"{rep_dir}/lineitem.parquet"),
        lambda: spark.read.parquet(f"{rep_dir}/orders.parquet"),
        bdir, li_name, o_name,
    )

    li_raw = lambda: spark.read.parquet(f"{rep_dir}/lineitem.parquet")  # noqa: E731
    o_raw = lambda: spark.read.parquet(f"{rep_dir}/orders.parquet")  # noqa: E731
    c = spark.read.parquet(f"{rep_dir}/customer.parquet")
    s = spark.read.parquet(f"{rep_dir}/supplier.parquet")

    out = {
        "metric": "bucketed-layout probe (Q18 + Q21)",
        "reps": reps,
        "buckets": BUCKETS,
        "bucket_write_sec": bucket_write_sec,
        "queries": {},
    }
    cases = {
        "ext_tpch_q18": (
            lambda: q18_plan(li_raw(), o_raw(), c),
            lambda: q18_plan(spark.table(li_name), spark.table(o_name), c),
            lambda df: df.agg(
                F.count("*").alias("n"),
                F.sum(F.col("c_custkey") + F.col("o_orderkey")).alias("s"),
            ).first(),
        ),
        "ext_tpch_q21": (
            lambda: q21_plan(li_raw(), o_raw(), s),
            lambda: q21_plan(spark.table(li_name), spark.table(o_name), s),
            # Q21 returns <=10 rows: compare them exactly
            lambda df: tuple(sorted(map(tuple, df.collect()))),
        ),
    }
    for qname, (mk_unb, mk_b, chk) in cases.items():
        unb, b = mk_unb(), mk_b()
        assert chk(unb) == chk(b), f"{qname}: bucketed result differs"
        force(unb)  # warm
        force(b)
        row = {
            "unbucketed_sec": timed_min(lambda: force(mk_unb())),
            "bucketed_sec": timed_min(lambda: force(mk_b())),
            "unbucketed_exchanges": exchange_count(unb),
            "bucketed_exchanges": exchange_count(b),
        }
        row["speedup"] = round(row["unbucketed_sec"] / row["bucketed_sec"], 2)
        out["queries"][qname] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
