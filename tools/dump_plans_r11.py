"""Dump explain("formatted") for the r11-touched queries.

Usage: python tools/dump_plans_r11.py <out_dir> <suffix>
e.g.   python tools/dump_plans_r11.py plans/r11 after
Run it from a worktree at the pre-round commit for the _before files.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

TOUCHED = [
    "ext_pagerank",
    "ext_pagerank_personalized",
    "ext_bpe_merges",
    "ext_bpe_encode",
    "ext_preprocess_pipeline",
    "ext_ann_lsh_quantized",
    "ext_ann_lsh_multiprobe",
    "ext_ann_quantized",
    "ext_quantize_embeddings",
    "ext_triangles",
    "ext_bfs_distances",
    "ext_dedup_clusters",
    "ext_minhash_candidates",
    "ext_curation_verdict",
]


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plans-r11-{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    for name in TOUCHED:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            queries[name](spark, sf).explain("formatted")
        with open(
            os.path.join(out_dir, f"{name}_{suffix}.txt"), "w", encoding="utf-8"
        ) as fh:
            fh.write(buf.getvalue())
        print(name, "done")


if __name__ == "__main__":
    main()
