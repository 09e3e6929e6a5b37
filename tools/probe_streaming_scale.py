"""Sustained streaming-ingest probe at ~1 GB: the bench's streaming entry
(bench.bench_streaming_ingest) proves the loop at the reference's ~124 MB
corpus; this probe runs the SAME file-source stream + foreachBatch
preprocess at 8× the volume and answers the two questions the small point
can't:

1. Does sustained throughput HOLD as the stream runs (fixed per-batch
   cost amortized, no drift from checkpoint/state growth across a longer
   batch sequence)? Reported as per-batch wall times, first→last.
2. Does the trigger-sizing rule ("size the batch so data work dominates
   the ~1 s fixed job cost") deliver at volume? maxFilesPerTrigger is
   scaled so batches are ~100 MB.

Usage: python tools/probe_streaming_scale.py [target_mb]   # default 1000
One JSON line; paste the row into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BENCH_DIR = os.path.join(REPO, ".bench")


def main() -> None:
    from job_search_engine_using_pyspark_solar_and_angular_spark.plans.preprocess import (
        preprocess,
    )
    from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark
    from job_search_engine_using_pyspark_solar_and_angular_spark.sources.synthetic import (
        scaled_tweet_corpus,
        tweets_from_documents,
    )

    target_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    spark = get_spark(app_name="jse-streaming-probe")
    spark.sparkContext.setLogLevel("ERROR")

    corpus_dir = os.path.join(BENCH_DIR, f"tweets_json_{target_mb}")
    path, size_mb = scaled_tweet_corpus(
        spark, "/root/testdata/sf0.1", corpus_dir, target_mb=target_mb
    )
    schema = tweets_from_documents(
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
            "doc_id", "text"
        )
    ).schema
    n_files = len([f for f in os.listdir(path) if f.endswith(".json")]) or 1
    per_file_mb = size_mb / n_files
    mfpt = max(1, round(100 / per_file_mb))  # ~100 MB per micro-batch

    ck = os.path.join(BENCH_DIR, "stream_probe_ck")
    shutil.rmtree(ck, ignore_errors=True)
    batch_secs: list[float] = []
    last = [0.0]

    def _sink(batch, batch_id):
        from bench import force  # repo-root bench.py helper

        force(preprocess(batch))
        now = time.perf_counter()
        batch_secs.append(round(now - last[0], 3))
        last[0] = now

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", mfpt)
        .json(path)
    )
    t0 = time.perf_counter()
    last[0] = t0
    q = (
        raw.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sec = round(time.perf_counter() - t0, 3)
    shutil.rmtree(ck, ignore_errors=True)

    half = max(1, len(batch_secs) // 2)
    drift = (
        round(
            (sum(batch_secs[half:]) / len(batch_secs[half:]))
            / (sum(batch_secs[:half]) / len(batch_secs[:half])),
            3,
        )
        if len(batch_secs) >= 2
        else None
    )
    print(
        json.dumps(
            {
                "metric": "sustained streaming ingest",
                "input_mb": size_mb,
                "sec": sec,
                "mb_per_sec": round(size_mb / sec, 2),
                "n_batches": len(batch_secs),
                "max_files_per_trigger": mfpt,
                "batch_secs": batch_secs,
                "late_vs_early_batch_ratio": drift,
            }
        )
    )


if __name__ == "__main__":
    main()
