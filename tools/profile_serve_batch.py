"""Attribute the serve-loop per-batch cost (BENCH `served_refresh_sec`) to
its individual steps, using the failpoint hook as a step timer: every
durable-mutation boundary in :func:`serve_batch` invokes the hook, so a
recording callable yields exact step boundaries with zero code duplication.

Bootstraps the full documents table at the given sf as serving state, then
profiles one ~200-doc delta batch (same shape as the bench entry): prints a
JSON line with per-step seconds so the fixed-overhead claim in SCALE.md is
measured, not asserted.

Usage: python tools/profile_serve_batch.py [sf_dir]
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
    serve_loop,
)
from job_search_engine_using_pyspark_solar_and_angular_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="serve-batch-profile")
    spark.sparkContext.setLogLevel("ERROR")
    base = os.path.join(tempfile.mkdtemp(prefix="srvprof_"), "serving")
    prefix = "srvprof"

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), F.col("text")
    )
    n = docs.count()
    t0 = time.perf_counter()
    serve_loop.serve_batch(spark, docs, base, prefix, batch_id=0)
    bootstrap_sec = round(time.perf_counter() - t0, 3)

    # the bench-shaped delta: ~200 docs, half new ids, half replace-by-id
    delta = (
        docs.limit(100)
        .select("doc_id", F.concat(F.lit("updated revision "), "text").alias("text"))
        .unionByName(
            docs.limit(100).select(
                (F.col("doc_id") + 10_000_000).alias("doc_id"),
                F.concat(F.lit("fresh arrival "), "text").alias("text"),
            )
        )
    )
    marks: list[tuple[str, float]] = []
    t0 = time.perf_counter()
    res = serve_loop.serve_batch(
        spark,
        delta,
        base,
        prefix,
        batch_id=1,
        failpoint=lambda lbl: marks.append((lbl, time.perf_counter() - t0)),
    )
    total = time.perf_counter() - t0
    steps: dict[str, float] = {}
    prev = 0.0
    for lbl, at in marks:
        steps[lbl] = round(at - prev, 3)
        prev = at
    steps["counts_return"] = round(total - prev, 3)
    out = {
        "sf_dir": sf_dir,
        "corpus_docs": n,
        "bootstrap_sec": bootstrap_sec,
        "delta_batch": {k: res[k] for k in ("arrived", "suppressed", "indexed")},
        "delta_total_sec": round(total, 3),
        "steps_sec": steps,
    }
    print(json.dumps(out))
    shutil.rmtree(os.path.dirname(base), ignore_errors=True)


if __name__ == "__main__":
    main()
