"""Differential test: every declared query vs its DuckDB oracle at sf0.001.

This mirrors the driver's t2 gate (which runs at sf0.01); running the full
set at the smallest sf keeps the suite fast enough for every commit.
"""

from __future__ import annotations

import pytest

from job_search_engine_using_pyspark_solar_and_angular_spark.queries import extensions  # noqa: F401  (registers)
from job_search_engine_using_pyspark_solar_and_angular_spark.queries.declared import QUERIES
from job_search_engine_using_pyspark_solar_and_angular_spark.queries.oracles import ORACLES

from .conftest import SF_DIR, assert_matches_oracle

ORACLE_CHECKED = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, ddb, name):
    df = QUERIES[name](spark, SF_DIR)
    assert_matches_oracle(df, ddb, ORACLES[name], name=name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert df.columns  # stable schema


def test_every_oracle_has_query():
    missing = sorted(set(ORACLES) - set(QUERIES))
    assert not missing, f"oracles without queries: {missing}"
