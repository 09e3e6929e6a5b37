"""Differential SQL fuzzing: hypothesis generates queries in a
dialect-safe subset (integer predicates, standard aggregates, GROUP BY)
and the SAME SQL text runs on Spark and DuckDB over the same parquet
fixtures — any disagreement is a real cross-engine conformance bug in
the engine's SQL front door.

The subset is chosen so semantics are unambiguous across engines:
integer columns and literals only (no float formatting or timestamp
sub-second hazards), AND/OR of simple comparisons, IN-lists on the
event_type dictionary, COUNT/SUM/MIN/MAX/COUNT DISTINCT, optional GROUP
BY on the categorical column. The fixed-query oracle suite pins 219
curated queries; this pins the long tail between them.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table

from .conftest import SF_DIR, canon_rows

_SET = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_TYPES = ["click", "view", "purchase", "signup", "error"]

_comparison = st.one_of(
    st.tuples(
        st.sampled_from(["user_id", "event_id"]),
        st.sampled_from(["<", "<=", ">", ">=", "="]),
        st.integers(0, 200),
    ).map(lambda t: f"{t[0]} {t[1]} {t[2]}"),
    st.tuples(
        st.sampled_from(["user_id", "event_id"]),
        st.integers(2, 7),
        st.integers(0, 6),
    ).map(lambda t: f"{t[0]} % {t[1]} = {t[2] % t[1]}"),
    st.lists(st.sampled_from(_TYPES), min_size=1, max_size=3, unique=True).map(
        lambda ts: "event_type IN (" + ", ".join(f"'{t}'" for t in ts) + ")"
    ),
    # LIKE on the categorical dictionary: prefix/suffix/infix patterns only
    # (no escapes, no regex metachars) — identical semantics across engines
    st.tuples(
        st.sampled_from(["c", "v", "p", "s", "e", "u", "r"]),
        st.sampled_from(["{}%", "%{}", "%{}%"]),
    ).map(lambda t: f"event_type LIKE '{t[1].format(t[0])}'"),
    # string-function predicates: length and 1-based substr agree exactly
    st.integers(3, 8).map(lambda n: f"length(event_type) >= {n}"),
    st.sampled_from(["c", "v", "p", "s", "e"]).map(
        lambda c: f"substr(event_type, 1, 1) = '{c}'"
    ),
)

_predicate = st.one_of(
    _comparison,
    st.tuples(_comparison, st.sampled_from(["AND", "OR"]), _comparison).map(
        lambda t: f"({t[0]} {t[1]} {t[2]})"
    ),
)

_aggs = st.lists(
    st.sampled_from(
        [
            "CAST(COUNT(*) AS BIGINT) AS n",
            "CAST(SUM(user_id) AS BIGINT) AS su",
            "CAST(MIN(event_id) AS BIGINT) AS mn",
            "CAST(MAX(event_id) AS BIGINT) AS mx",
            "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS du",
            "CAST(SUM(event_id % 97) AS BIGINT) AS sm",
            "MIN(event_type) AS mt",
            "MAX(event_type) AS xt",
            "CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ev",
            "CAST(SUM(length(event_type)) AS BIGINT) AS sl",
        ]
    ),
    min_size=1,
    max_size=4,
    unique=True,
)


@st.composite
def _query(draw):
    where = draw(_predicate)
    aggs = draw(_aggs)
    grouped = draw(st.booleans())
    joined = draw(st.booleans())
    frm = "events"
    if joined:
        # dimension join + a predicate that touches the joined side
        frm = "events JOIN customer ON user_id = c_custkey"
        where = f"({where} AND c_custkey < {draw(st.integers(50, 500))})"
    if grouped:
        having = ""
        if draw(st.booleans()):
            having = f" HAVING COUNT(*) > {draw(st.integers(0, 5))}"
        # sometimes group on a DERIVED integer key instead of the category
        if draw(st.booleans()):
            k = draw(st.integers(2, 5))
            return (
                f"SELECT CAST(user_id % {k} AS BIGINT) AS gk, " + ", ".join(aggs)
                + f" FROM {frm} WHERE {where} GROUP BY gk"
                + having
                + " ORDER BY gk"
            )
        return (
            "SELECT event_type, " + ", ".join(aggs)
            + f" FROM {frm} WHERE {where} GROUP BY event_type"
            + having
            + " ORDER BY event_type"
        )
    return "SELECT " + ", ".join(aggs) + f" FROM {frm} WHERE {where}"


@st.composite
def _window_query(draw):
    """Deterministic window-function form: unique ORDER BY key (event_id)
    inside the frame and in the final sort, so both engines must agree
    row-for-row."""
    where = draw(_predicate)
    fn = draw(
        st.sampled_from(
            [
                "ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY event_id)",
                "RANK() OVER (PARTITION BY event_type ORDER BY event_id)",
                "CAST(SUM(user_id) OVER (PARTITION BY event_type ORDER BY event_id "
                "ROWS UNBOUNDED PRECEDING) AS BIGINT)",
                "LAG(event_id) OVER (PARTITION BY event_type ORDER BY event_id)",
            ]
        )
    )
    lim = draw(st.integers(50, 400))
    return (
        f"SELECT event_id, event_type, CAST({fn} AS BIGINT) AS w "
        f"FROM events WHERE {where} ORDER BY event_id LIMIT {lim}"
    )


@given(sql=_window_query())
@_SET
def test_sql_differential_fuzz_windows(spark, ddb, sql):
    """Window-function SQL (deterministic frames) must agree row-for-row."""
    load_table(spark, SF_DIR, "events").createOrReplaceTempView("events")
    s = spark.sql(sql)
    s_rows = [tuple(r) for r in s.collect()]
    d = ddb.execute(sql)
    d_rows = d.fetchall()
    assert canon_rows(s.columns, s_rows) == canon_rows(
        [c[0] for c in d.description], d_rows
    ), sql


@given(sql=_query())
@_SET
def test_sql_differential_fuzz(spark, ddb, sql):
    """The same SQL text must produce identical rows on both engines."""
    load_table(spark, SF_DIR, "events").createOrReplaceTempView("events")
    load_table(spark, SF_DIR, "customer").createOrReplaceTempView("customer")
    s = spark.sql(sql)
    s_cols = s.columns
    s_rows = [tuple(r) for r in s.collect()]
    d = ddb.execute(sql)
    d_cols = [c[0] for c in d.description]
    d_rows = d.fetchall()
    assert canon_rows(s_cols, s_rows) == canon_rows(d_cols, d_rows), sql
