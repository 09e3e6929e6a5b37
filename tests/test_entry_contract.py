"""Driver-contract regression tests for __spark_entry__: the three functions
the verification driver calls, checked exactly as it calls them."""

from __future__ import annotations

import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

entry_mod = importlib.import_module("__spark_entry__")


def test_queries_and_oracles_align():
    """Every oracle has a query; every non-rows-only query in the driver's
    50-entry window has an oracle; names are unique and stable."""
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    assert len(qs) >= 100
    missing_queries = sorted(set(os_) - set(qs))
    assert not missing_queries, missing_queries
    window = list(qs)[:50]
    rows_only = [n for n in window if n not in os_]
    # every window slot must be exact-oracle checkable (the driver scores a
    # no-oracle row as red); float-sensitive ANN tiers live outside the window
    assert rows_only == [], rows_only


def test_priority_names_all_registered():
    qs = entry_mod.queries()
    missing = [n for n in entry_mod._PRIORITY if n not in qs]
    assert not missing, f"priority entries without implementations: {missing}"


def test_entry_runs_and_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.columns
    assert df.count() > 0


def test_every_query_callable_signature():
    """Each registered query is a (spark, sf_dir) callable (the driver calls
    them positionally)."""
    import inspect

    for name, fn in entry_mod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) >= 2, f"{name} must take (spark, sf_dir)"


def test_type_class_rules():
    """The canonicalizer's type-class table: DuckDB HUGEINT/DECIMAL class
    apart from int (the pandas/arrow fetch renders them float64 — the
    CORRECTNESS_r04 ext_cluster_assign red), while genuine ints, floats,
    strings, and arrays class together across both engines' spellings."""
    from .conftest import type_class

    assert type_class("HUGEINT") == "decimal"
    assert type_class("DECIMAL(38,0)") == "decimal"
    assert type_class("decimal(38,0)") == "decimal"
    assert type_class("BIGINT") == type_class("bigint") == "int"
    assert type_class("INTEGER") == type_class("smallint") == "int"
    assert type_class("DOUBLE") == type_class("float") == "float"
    assert type_class("VARCHAR") == type_class("string") == "str"
    assert type_class("TIMESTAMP WITH TIME ZONE") == type_class("timestamp") == "ts"
    # arrays class by ELEMENT type (numeric checks run first) — deliberate:
    # a DuckDB HUGEINT[] vs Spark array<bigint> drift is then FLAGGED
    # (decimal vs int), where a flat "array" class would mask it
    assert type_class("DOUBLE[]") == type_class("array<double>") == "float"
    assert type_class("HUGEINT[]") == "decimal"
    assert type_class("array<bigint>") == "int"
    assert type_class("VARCHAR[]") == type_class("array<string>") == "str"
    assert type_class("BOOLEAN") == type_class("boolean") == "bool"
