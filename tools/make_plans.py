"""Regenerate PLANS.md: formatted physical plans of the headline queries.

Usage: python tools/make_plans.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

PICKS = {
    "q11_agg_tpch_q1": "two-phase hash agg: partial_sum map-side, one shuffle on the group keys",
    "q12_broadcast_join": "dimension join as BroadcastHashJoin (no shuffle of the fact side)",
    "ext_tpch_q3": "selective scans with pushed filters + broadcast joins + TakeOrderedAndProject",
    "q20_bm25_search": "postings build -> query-term semi restriction -> score agg -> top-k",
    "ext_preprocess_pipeline": "single-scan 3-way branch flatten -> partial max_by dedup (skew-proof) -> regex filter",
    "ext_diversity_sample": "row-local int8 quantize + argmin; only shuffle is the per-cluster quota window",
    "ext_ann_lsh_quantized": "integer LSH bucket (no shuffle) -> broadcast bucket probe -> top-k",
}

HEADER = """# PLANS — formatted physical plans of headline queries (sf0.1)

Regenerate any query's plan via
`__spark_entry__.queries()[name](spark, sf_dir).explain("formatted")`.

What to look for (the engine's plan invariants, enforced by
tests/test_plans.py): filters/projections pushed into the parquet scans
(`PushedFilters`, pruned `ReadSchema`), dimension joins broadcast, two-phase
aggregation (`partial_*` before the exchange), `TakeOrderedAndProject` for
top-k, no `BatchEvalPython` anywhere relational, windows always partitioned.
"""


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="plans-doc")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    out = [HEADER]
    for name, note in PICKS.items():
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            queries[name](spark, sf).explain("formatted")
        lines = buf.getvalue().splitlines()
        if len(lines) > 121:
            lines = lines[:121] + [
                "   ... (detail blocks trimmed; regenerate for full text)"
            ]
        out.append(f"## {name}\n\n_{note}_\n\n```\n" + "\n".join(lines) + "\n```\n")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w", encoding="utf-8") as fh:
        fh.write("\n".join(out))
    print("PLANS.md regenerated")


if __name__ == "__main__":
    main()
