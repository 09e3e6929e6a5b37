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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
