"""Served-ANN replication probe: scale the sf0.1 embeddings corpus by
replication (default 500x -> 1M 64-dim vectors), build the int8-LSH
bucket-partitioned index with CORPUS-COUNT-AUTO-SIZED planes
(similarity.planes_for_corpus), and measure the serving ladder —
single-bucket vs Hamming-1 multiprobe vs exact full-corpus cosine —
plus the per-bucket size distribution (the boundedness claim).

This is the r6 follow-up to the r5 60k probe (SCALE.md round-5 notes):
the question is whether multiprobe's ~15% latency premium and bounded
per-bucket sizes HOLD when the corpus grows 16x and the plane count
auto-sizes 4 -> 10 (1024 buckets, so Hamming-1 probes 11/1024 = ~1% of
partitions instead of 5/16 = 31%).

Usage:
  python tools/probe_ann_scale.py [reps]      # default 500 (-> 1M vectors)

Prints one JSON line. The replicated index is cached under
.bench/vecidx_probe_r{reps}_p{planes} and reused (build is one-time by
design — that is the deployment model being measured).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table  # noqa: E402
from job_search_engine_using_pyspark_solar_and_angular_spark.operators import similarity  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BENCH_DIR = os.path.join(REPO, ".bench")


def replicated_embeddings(spark, sf_dir: str, reps: int):
    """The sf corpus replicated ``reps`` times: replica r of vector v gets
    vec_id = r*100_000_000 + v and a deterministic per-(replica, dim)
    integer-derived perturbation (cheap in-plan math, no hashing per
    element) so replicas are near- but not exact duplicates — the shape a
    dedup-adjacent ANN corpus actually has."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    r = spark.range(reps).select(F.col("id").alias("__rep"))
    return emb.crossJoin(r).select(
        (F.col("__rep") * 100_000_000 + F.col("vec_id")).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + 1e-4 * (((F.col("__rep") * 31 + i.cast("long")) % 17) - 8),
        ).alias("embedding"),
    )


def timed_min(fn, trials: int = 2) -> float:
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark

    spark = get_spark(app_name="probe-ann-scale")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF_DIR, "embeddings")
    base_n = base.count()
    n = base_n * reps
    planes = similarity.planes_for_corpus(n, target_bucket=1024)
    path = os.path.join(BENCH_DIR, f"vecidx_probe_r{reps}_p{planes}")

    build_sec = None
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus = replicated_embeddings(spark, SF_DIR, reps).filter(
            F.col("vec_id") != 0
        )
        t0 = time.perf_counter()
        similarity.write_vector_index_int8(corpus, path, num_planes=planes)
        build_sec = round(time.perf_counter() - t0, 3)

    # per-bucket size distribution: the boundedness claim. Expected size is
    # n / 2^planes; hyperplane LSH is data-dependent, so report the max too.
    sizes = (
        spark.read.parquet(path)
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .agg(
            F.count("*").alias("n_buckets"),
            F.max("n").alias("max_bucket"),
            F.round(F.avg("n"), 1).alias("mean_bucket"),
        )
        .collect()[0]
    )

    q = base.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("qv")
    )
    t_single = timed_min(
        lambda: force(
            similarity.ann_lsh_quantized_served(
                spark, path, q, k=5, num_planes=planes, multiprobe=False
            )
        )
    )
    t_multi = timed_min(
        lambda: force(
            similarity.ann_lsh_quantized_served(
                spark, path, q, k=5, num_planes=planes, multiprobe=True
            )
        )
    )

    # the STATIC-probe request path (query arrives as a vector): driver-side
    # quantize+bucket, isin partition filter — no query-side jobs, no DPP.
    # Steady-state serving resolves the index relation ONCE per generation
    # (partition discovery over 2^planes dirs costs seconds; a reused
    # relation serves from its cached file index) — both figures reported.
    qv = [float(x) for x in base.filter(F.col("vec_id") == 0).first()["embedding"]]
    t_vec_cold = timed_min(
        lambda: force(
            similarity.ann_lsh_served_vec(
                spark, path, qv, k=5, num_planes=planes, multiprobe=True
            )
        )
    )
    idx_df = spark.read.parquet(path)
    force(
        similarity.ann_lsh_served_vec(
            spark, idx_df, qv, k=5, num_planes=planes, multiprobe=True
        )
    )  # warm the relation's file index once (the per-generation cost)
    t_vec_single = timed_min(
        lambda: force(
            similarity.ann_lsh_served_vec(
                spark, idx_df, qv, k=5, num_planes=planes, multiprobe=False
            )
        )
    )
    t_vec_multi = timed_min(
        lambda: force(
            similarity.ann_lsh_served_vec(
                spark, idx_df, qv, k=5, num_planes=planes, multiprobe=True
            )
        )
    )

    # exact full-corpus cosine baseline over the same index files
    from job_search_engine_using_pyspark_solar_and_angular_spark.functions.vectors import cosine

    idx = spark.read.parquet(path)

    def exact():
        force(
            idx.crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                F.round(cosine(F.col("embedding"), F.col("qv")), 4).alias("sim"),
            )
            .orderBy(F.col("sim").desc(), F.col("vec_id"))
            .limit(5)
        )

    t_exact = timed_min(exact)

    print(
        json.dumps(
            {
                "metric": "served-ANN replication probe",
                "n_vectors": n,
                "reps": reps,
                "num_planes": planes,
                "n_buckets": sizes["n_buckets"],
                "expected_bucket": round(n / (1 << planes), 1),
                "max_bucket": sizes["max_bucket"],
                "mean_bucket": float(sizes["mean_bucket"]),
                "build_sec": build_sec,
                "single_bucket_sec": t_single,
                "multiprobe_sec": t_multi,
                "vec_cold_read_sec": t_vec_cold,
                "vec_single_bucket_sec": t_vec_single,
                "vec_multiprobe_sec": t_vec_multi,
                "exact_scan_sec": t_exact,
                "multiprobe_premium": round(t_vec_multi / t_vec_single - 1, 3)
                if t_vec_single
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
