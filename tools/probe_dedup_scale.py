"""Near-dedup replication probe: the fuzzy-dedup pipeline (MinHash
signatures -> banded LSH candidates -> exact n-gram Jaccard verify ->
connected components) timed against a replicated documents corpus — the
dedup twin of the TPC-H / BM25 / ANN probes, substantiating the
"bucketed, never all-pairs" scale claim with numbers.

Replication is DUP-RATE-CONSTANT: replica r of doc d gets doc_id
d + r*10^7 and EVERY TOKEN suffixed with the replica tag, so cross-replica
copies share ZERO shingles and the corpus keeps its native dup structure
at every scale — bucket sizes stay bounded, which is exactly the property
banded LSH relies on. (A first version appended ONE marker token instead;
MinHash barely moves under a single-token edit — the replicas stayed
near-dups, buckets grew R-fold, and the x100 run exploded its candidate
pairs to a transient disk-full. That regime is kept deliberately as the
small-R pathological case below: it is WHY dup-heavy corpora need the
exact-dup hash-groupBy pass before banded LSH.)

Usage:
  python tools/probe_dedup_scale.py [reps ...]   # default 20 100

Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_documents(spark, reps: int, identical: bool = False):
    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    r = spark.range(reps).select(F.col("id").alias("__rep"))
    mutated = F.expr(
        "array_join(transform(split(text, ' '), "
        "x -> concat(x, '_r', CAST(__rep AS STRING))), ' ')"
    )
    out = base.crossJoin(r).select(
        (F.col("doc_id") + F.col("__rep") * 10_000_000).alias("doc_id"),
        (F.col("text") if identical else mutated).alias("text"),
    )
    return out


def timed(fn, trials: int = 2) -> float:
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    reps_list = [int(a) for a in sys.argv[1:]] or [20, 100]
    from job_search_engine_using_pyspark_solar_and_angular_spark.operators import dedup
    from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark

    spark = get_spark(app_name="probe-dedup-scale")
    spark.sparkContext.setLogLevel("ERROR")

    def pipeline(docs, stats=None):
        cand = dedup.minhash_lsh_candidates(docs)
        verified = dedup.ngram_jaccard_pairs(docs, cand, threshold=0.5).select(
            "doc_a", "doc_b"
        )
        return dedup.connected_components(verified, stats=stats)

    def structure(docs) -> dict:
        """The quantities that decide whether the banded build survives a
        scale-up (VERDICT r9 #4): candidate-pair growth must be
        sub-quadratic (a query doc only meets its own bucket), the banded
        self-join's bucket-size TAIL must stay bounded (the per-bucket
        join is quadratic in bucket size), and cc rounds must stay flat
        (component diameter, not corpus size)."""
        bt = dedup.minhash_bucket_table(docs)
        sizes = bt.groupBy("band", "band_key").agg(F.count("*").alias("n"))
        s = sizes.agg(
            F.count("*").alias("n_buckets"),
            F.max("n").alias("max"),
            F.expr("percentile_approx(n, 0.99, 10000)").alias("p99"),
            F.round(F.avg("n"), 2).alias("mean"),
        ).first()
        n_pairs = dedup.minhash_lsh_candidates(docs).count()
        cc_stats: dict = {}
        pipeline(docs, stats=cc_stats).count()
        return {
            "candidate_pairs": n_pairs,
            "bucket_sizes": {
                "n_buckets": s["n_buckets"],
                "max": s["max"],
                "p99": s["p99"],
                "mean": s["mean"],
            },
            "cc_rounds": cc_stats.get("rounds"),
        }

    out = {"metric": "near-dedup replication probe", "sf_dir": SF_DIR, "runs": {}}

    base_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_base = base_docs.count()
    pipeline(base_docs).count()  # warm
    out["runs"]["x1"] = {
        "docs": n_base,
        "sec": timed(lambda: pipeline(base_docs).count()),
        "clusters": pipeline(base_docs).select("cluster_id").distinct().count(),
        **structure(base_docs),
    }

    for reps in reps_list:
        docs = replicated_documents(spark, reps).persist()
        n = docs.count()
        pipeline(docs).count()  # warm
        sec = timed(lambda: pipeline(docs).count())
        run = {
            "docs": n,
            "sec": sec,
            "ratio_vs_x1": round(sec / out["runs"]["x1"]["sec"], 2),
            "clusters": pipeline(docs).select("cluster_id").distinct().count(),
            **structure(docs),
        }
        run["pair_growth_vs_x1"] = round(
            run["candidate_pairs"] / max(out["runs"]["x1"]["candidate_pairs"], 1), 2
        )
        out["runs"][f"x{reps}"] = run
        docs.unpersist()

    # pathological regime: identical replicas — every doc gains R-1 exact
    # twins, buckets grow R-fold, the per-bucket self-join is quadratic in
    # R. Small R only; the number documents WHY dup-heavy corpora need the
    # exact-dup pass (hash groupBy) BEFORE banded LSH.
    docs = replicated_documents(spark, 4, identical=True).persist()
    docs.count()
    pipeline(docs).count()
    out["runs"]["x4_identical_pathological"] = {
        "docs": out["runs"]["x1"]["docs"] * 4,
        "sec": timed(lambda: pipeline(docs).count()),
    }
    docs.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
