"""Per-stage wall-clock profile of serve_loop.serve_batch using its
failpoint hook as a timing tap: bootstrap the sf0.1 corpus as segment 1,
then time each durable stage of a ~200-doc delta batch. Scratch diagnostic
(the permanent artifact is bench.py's served_refresh_sec)."""

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
from job_search_engine_using_pyspark_solar_and_angular_spark.search import serve_loop
from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark

BASE = "/tmp/serve_profile"


def main():
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(BASE, ignore_errors=True)
    sf_dir = "/root/testdata/sf0.1"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    corpus = docs.join(emb, "doc_id", "left")
    t0 = time.time()
    serve_loop.serve_batch(spark, corpus, BASE, "prof_serve", vec_col="embedding")
    print(f"bootstrap: {time.time()-t0:.2f}s", flush=True)

    # delta batch: 100 new docs + 100 near-dups (same construction as bench)
    new = corpus.limit(200).withColumn(
        "doc_id", F.col("doc_id") + F.lit(10_000_000)
    ).withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(" fresh content")))
        .otherwise(F.col("text")),
    )

    for trial in range(3):
        batch = new.withColumn("doc_id", F.col("doc_id") + F.lit(trial * 1000))
        marks = [("start", time.time())]

        def fp(label):
            marks.append((label, time.time()))

        t0 = time.time()
        r = serve_loop.serve_batch(
            spark, batch, BASE, "prof_serve", vec_col="embedding", failpoint=fp
        )
        total = time.time() - t0
        print(f"trial {trial}: total {total:.2f}s  {r}", flush=True)
        prev = marks[0][1]
        for label, ts in marks[1:]:
            print(f"  {label:12s} +{ts-prev:.2f}s", flush=True)
            prev = ts
        print(f"  (after last failpoint: {t0+total-prev:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
