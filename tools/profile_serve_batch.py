"""Per-stage wall-clock profile of serve_loop.serve_batch using its
failpoint hook as a timing tap: bootstrap the corpus as segment 1, then
time each durable stage of a ~200-row delta batch. NOTE: passing the
failpoint forces the SEQUENTIAL write path — run once with --parallel to
time the thread-pool path (totals only; stage marks need the failpoint).
Scratch diagnostic (the permanent artifact is bench.py's
served_refresh_sec).

Usage: python tools/profile_serve_batch.py [sf_dir] [--parallel]
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
from job_search_engine_using_pyspark_solar_and_angular_spark.search import serve_loop
from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    parallel = "--parallel" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="serve_profile_")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        emb = load_table(spark, sf_dir, "embeddings").select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").cast("array<double>").alias("embedding"),
        )
        corpus = docs.join(emb, "doc_id", "left")
        t0 = time.time()
        serve_loop.serve_batch(
            spark, corpus, base, "prof_serve", vec_col="embedding"
        )
        print(f"bootstrap: {time.time()-t0:.2f}s", flush=True)

        # delta batch: 200 rows, all with NEW ids (+10M); even ids append
        # " fresh content" (genuinely new text), odd ids keep byte-identical
        # text — EXACT-duplicate arrivals the gate suppresses
        new = (
            corpus.limit(200)
            .withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000))
            .withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 2 == 0,
                    F.concat(F.col("text"), F.lit(" fresh content")),
                ).otherwise(F.col("text")),
            )
        )

        for trial in range(3):
            batch = new.withColumn(
                "doc_id", F.col("doc_id") + F.lit(trial * 1000)
            )
            marks = [("start", time.time())]

            def fp(label):
                marks.append((label, time.time()))

            t0 = time.time()
            r = serve_loop.serve_batch(
                spark,
                batch,
                base,
                "prof_serve",
                vec_col="embedding",
                failpoint=None if parallel else fp,
            )
            total = time.time() - t0
            mode = "parallel" if parallel else "sequential"
            print(f"trial {trial} ({mode}): total {total:.2f}s  {r}", flush=True)
            prev = marks[0][1]
            for label, ts in marks[1:]:
                print(f"  {label:12s} +{ts-prev:.2f}s", flush=True)
                prev = ts
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
