"""Pre-flight certification of the driver window: run queries vs their
DuckDB oracles at sf0.01 (the driver's t2 scale) through BOTH comparison
models — (a) collect() vs fetchall() (Decimal/None-preserving, what
tests/conftest.py mirrors) and (b) toPandas() vs fetchdf() (the pandas
model, where nullable ints float64-ify on BOTH sides and DuckDB
HUGEINT/DECIMAL float64-ifies on ONE — the model that explains
CORRECTNESS_r04: ext_hybrid_rrf green, ext_cluster_assign red) — plus the
result type-class check. A query is rotation-ready only when every model
hash-matches.

Usage:
  python tools/certify_window.py            # the current first-50 window
  python tools/certify_window.py name1 ...  # specific queries
Prints one line per query and a final verdict; exit 1 on any mismatch.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402

SF = os.environ.get("JSE_CERTIFY_SF_DIR", "/root/testdata/sf0.01")


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main() -> int:
    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[1:] or [n for n in list(queries)[:50]]

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    if os.environ.get("JSE_CERTIFY_VANILLA"):
        # the verification driver builds its OWN SparkSession — certify
        # under a bare one (no UTC pin, no tuned shuffle/AQE confs) to
        # prove no window query depends on the tuned factory
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("certify-window-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark(app_name="certify-window")
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
    from conftest import type_class  # reuse the suite's class rules

    bad = []
    for name in names:
        if name not in oracles:
            print(f"{name}: NO ORACLE (rows-only — driver scores weaker)")
            continue
        try:
            sdf = queries[name](spark, SF)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            s_classes = {
                f.name: type_class(f.dataType.simpleString())
                for f in sdf.schema.fields
            }
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            pdf = con.execute(oracles[name]).fetchdf()
            d_classes = {
                r[0]: type_class(r[1])
                for r in con.execute("DESCRIBE " + oracles[name]).fetchall()
            }
        except Exception as exc:
            bad.append(name)
            print(f"{name}: ERROR {str(exc)[:160]}")
            continue
        probs = []
        if sorted(s_cols) != sorted(d_cols):
            probs.append(f"cols {sorted(s_cols)} != {sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            probs.append(f"rows {len(s_rows)} != {len(d_rows)}")
        drift = {
            c: (s_classes[c], d_classes.get(c))
            for c in s_classes
            if c in d_classes and s_classes[c] != d_classes[c]
        }
        if drift:
            probs.append(f"type-class drift {drift}")
        if canon_rows(s_cols, s_rows) != canon_rows(d_cols, d_rows):
            probs.append("fetchall hash mismatch")
        try:
            spdf = sdf.toPandas()
        except Exception as exc:
            probs.append(f"toPandas failed: {str(exc)[:80]}")
            spdf = None
        if spdf is not None:
            sp_rows = [tuple(r) for r in spdf.itertuples(index=False)]
            p_rows = [tuple(r) for r in pdf.itertuples(index=False)]
            if canon_rows(list(spdf.columns), sp_rows) != canon_rows(
                list(pdf.columns), p_rows
            ):
                probs.append("pandas-model hash mismatch")
        if probs:
            bad.append(name)
            print(f"{name}: FAIL — {'; '.join(probs)}")
        else:
            print(f"{name}: ok ({len(s_rows)} rows)")
    print(f"-- {len(names) - len(bad)}/{len(names)} certified, {len(bad)} failing")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
