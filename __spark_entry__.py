"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (SURVEY.md §7.2 — BM25 keyword search
  over the documents corpus, top-k joined back to the doc rows and the
  broadcast user dimension: scan → tokenize → postings → score → top-k →
  join, the whole reference request path as one plan) at sf0.001.
- ``queries()``: every implemented operator from SURVEY.md §2 (declared set
  Q01-Q24 + extensions X1-X4 + LLM-pipeline operators).
- ``oracle_sql()``: DuckDB-equivalent SQL for each hash-checkable query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from job_search_engine_using_pyspark_solar_and_angular_spark.queries import (  # noqa: E402
    extensions as _ext,  # imported for its QUERIES registrations
)
from job_search_engine_using_pyspark_solar_and_angular_spark.queries.declared import (  # noqa: E402
    QUERIES as _QUERIES,
)
from job_search_engine_using_pyspark_solar_and_angular_spark.queries.oracles import (  # noqa: E402
    ORACLES as _ORACLES,
)

_ = _ext  # silence unused-import linters; importing registers the queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _QUERIES["ext_search_e2e"](spark, "/root/testdata/sf0.001")


# The verification driver hash-checks the FIRST 50 entries of queries().
# Window spec — every slot is exact-DuckDB-oracle checkable:
#   * slots 1-25: the declared set (Q01-Q24 + sql_frontdoor), the reference's
#     own query surface (SURVEY.md §2.12);
#   * slot 26: ext_preprocess_pipeline — the reference's entire batch job
#     end-to-end (array outputs JSON-stringified for the hash canonicalizer);
#   * slots 27-33 (rotated r4): as-of join + except stay; the other five
#     twice-driver-certified slots (range_join, sessionize, window_analytics,
#     cube, intersect — all still exact-oracle-green locally every run in
#     tests/test_oracle_parity.py) rotated out for five never-driver-certified
#     exact-oracle queries: the bucket-pruned int8-LSH ANN pipeline, grouped
#     batch cosine top-k (two-phase salted partial top-k), TPC-H Q1, SCD2
#     dimension build, and the hybrid BM25+vector RRF front door;
#   * slots 34-36: multimodal Arrow contract + NLP (POS tag, spell correct);
#   * slots 37-39: the dedup ladder's verification rungs — MinHash banded
#     candidates, SimHash pigeonhole near-dups, exact n-gram Jaccard;
#   * slots 40-50: curation capstone, cosine top-k, dedup clusters (iterative
#     CC), decontamination, sequence packing, repetition, count-min heavy
#     hitters, int8 quantized ANN (the exact-hashable ANN tier), integer
#     PageRank, TPC-H Q3, and the flagship search path.
# Float-sensitive ANN variants (ext_ann_lsh / ext_ann_ivf /
# ext_embedding_near_dups) are deliberately OUTSIDE the window: the driver
# scores a no-oracle row as red, so they are recall-tested locally instead
# (tests/test_similarity.py) with ext_ann_quantized + ext_ann_lsh_quantized
# as their exact in-window/oracle-checked twins. Everything after slot 50 is
# still exact-oracle-checked locally by tests/test_oracle_parity.py.
_PRIORITY = [
    *[n for n in _QUERIES if n.startswith("q") and n[1].isdigit()],  # q01..q24
    "sql_frontdoor",
    "ext_preprocess_pipeline",
    # r4 rotation: ext_asof_join (driver-certified r1-r3) -> the serve-loop
    # end-to-end row; asof stays exact-oracle-checked locally every run
    "ext_serve_loop_e2e",
    "ext_ann_lsh_quantized",
    "ext_batch_cosine_topk",
    "ext_tpch_q1",
    "ext_scd2",
    "ext_hybrid_rrf",
    # r4 rotation, second wave: 13 more twice-certified slots (except,
    # pos_tag, spell_correct, minhash_candidates, simhash_near_dups,
    # ngram_jaccard, decontaminate, pack_sequences, repetition,
    # heavy_hitters, pagerank, tpch_q3, x2_cosine_topk) swapped for
    # never-driver-certified queries that upgrade capabilities whose
    # correctness column was previously pass(local)-only: Solr facets /
    # more-like-this / phrase search, embedding near-dup, substring-span
    # dedup, boilerplate line dedup, SemDeDup diversity + cluster assign,
    # chunking, curriculum, domain mixing, PII redaction, BPE. Rotated-out
    # queries stay exact-oracle-checked locally every run.
    "ext_multimodal_features",
    "ext_curation_verdict",
    "ext_dedup_clusters",
    "ext_ann_quantized",
    "ext_search_e2e",
    "ext_near_dedup",
    "ext_repeated_spans",
    "ext_dedup_lines",
    "ext_diversity_sample",
    "ext_cluster_assign",
    "ext_chunk_documents",
    "ext_curriculum",
    "ext_domain_mix",
    "ext_pii_redact",
    "ext_bpe_merges",
    "ext_search_facets",
    "ext_more_like_this",
    "ext_phrase_search",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: _QUERIES[n] for n in _PRIORITY if n in _QUERIES}
    ordered.update({n: f for n, f in _QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
