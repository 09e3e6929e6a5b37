"""Served-read degradation probe: query latency vs serving-segment count.

Sizes the compaction cadence empirically (DEPLOY.md "Compaction cadence"):
bootstrap the serve loop with the full documents table (1 segment), append
K tiny delta batches (segment per batch, a slice of them replace-by-id so
the tombstone filter is exercised), and time the SAME served BM25 query at
increasing segment counts, then after compaction. What grows with segments
is exactly what a reader pays between compactions: the per-segment union +
the broadcast tombstone anti-filter.

Usage: python tools/probe_segments.py [sf_dir] [n_batches]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from job_search_engine_using_pyspark_solar_and_angular_spark.io import (  # noqa: E402
    load_table,
)
from job_search_engine_using_pyspark_solar_and_angular_spark.search import (  # noqa: E402
    bm25,
    serve_loop,
)
from job_search_engine_using_pyspark_solar_and_angular_spark.session import (  # noqa: E402
    get_spark,
)

TERMS = ["distributed", "data", "query"]


def timed_query(spark, base) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        idx = serve_loop.read_served_index(spark, base)
        rows = bm25.bm25_search(spark, idx, TERMS, k=10).collect()
        assert rows, "probe query returned nothing"
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark(app_name="segment-probe")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(tempfile.mkdtemp(prefix="segprobe_"), "serving")
    prefix = "segprobe"

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    serve_loop.serve_batch(spark, docs, base, prefix)
    points = {1: timed_query(spark, base)}

    batch_sz = 50
    for i in range(n_batches):
        fresh = docs.filter(F.col("doc_id") % 997 == i).limit(batch_sz // 2)
        # half genuinely new ids, half replace-by-id (tombstone churn)
        batch = fresh.select(
            (F.col("doc_id") + 10_000_000 + i * 100_000).alias("doc_id"),
            F.concat_ws(" ", F.lit(f"delta batch {i} body"), "text").alias("text"),
        ).unionByName(
            docs.filter(F.col("doc_id") % 991 == i)
            .limit(batch_sz // 2)
            .select(
                "doc_id",
                F.concat_ws(" ", F.lit(f"replacement rev {i}"), "text").alias(
                    "text"
                ),
            )
        )
        serve_loop.serve_batch(spark, batch, base, prefix)
        segs = i + 2
        if segs in (5, 10, n_batches + 1):
            points[segs] = timed_query(spark, base)

    serve_loop.compact_segments(spark, base, prefix, vacuum_now=False)
    points["compacted"] = timed_query(spark, base)
    serve_loop.vacuum_segments(spark, base, prefix)
    points["vacuumed"] = timed_query(spark, base)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_batches": n_batches,
                "latency_sec_by_segments": points,
            }
        )
    )
    shutil.rmtree(os.path.dirname(base), ignore_errors=True)


if __name__ == "__main__":
    main()
