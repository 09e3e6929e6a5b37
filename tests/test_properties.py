"""Property-based tests (hypothesis) for the engine's core invariants, plus
the IVF ANN recall check. Examples are capped small — each example runs Spark
jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
from job_search_engine_using_pyspark_solar_and_angular_spark.operators import similarity
from job_search_engine_using_pyspark_solar_and_angular_spark.operators.dedup import (
    latest_wins,
)
from job_search_engine_using_pyspark_solar_and_angular_spark.search.api import (
    tokenize_query,
)

from .conftest import SF_DIR

_SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),      # key
            st.integers(0, 50),     # ts
            st.integers(0, 10**6),  # unique-ish payload
        ),
        min_size=1,
        max_size=30,
    )
)
@_SET
def test_latest_wins_matches_python_reference(spark, rows):
    """latest_wins == max-by-(ts, uid) per key, computed independently."""
    df = spark.createDataFrame(
        [(k, t, u) for k, t, u in rows], "k long, t long, u long"
    )
    got = {
        r["k"]: (r["t"], r["u"])
        for r in latest_wins(df, ["k"], "t", ["u"]).collect()
    }
    want: dict[int, tuple[int, int]] = {}
    for k, t, u in rows:
        if k not in want or (t, u) > want[k]:
            want[k] = (t, u)
    assert got == want


@given(
    text=st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Po", "Zs")),
        max_size=80,
    )
)
@_SET
def test_tokenizer_jvm_python_agree(spark, text):
    """The JVM analyzer and the driver-side query tokenizer agree on any
    input — guarantees query terms hit index terms."""
    from job_search_engine_using_pyspark_solar_and_angular_spark.functions.text import (
        tokenize_normalized,
    )

    jvm = spark.createDataFrame([(text,)], "t string").select(
        tokenize_normalized(F.lower(F.col("t"))).alias("tk")
    ).first()["tk"]
    assert jvm == tokenize_query(text)


@given(st.integers(0, 40), st.integers(1, 15))
@_SET
def test_pagination_window_equivalence(spark, offset, limit):
    """paginate(offset, limit) == orderBy.limit(offset+limit) minus the first
    offset rows, for any page geometry."""
    from job_search_engine_using_pyspark_solar_and_angular_spark.operators.topk import (
        paginate,
    )

    e = load_table(spark, SF_DIR, "events").limit(60)
    order = [F.col("ts"), F.col("event_id")]
    page = [r["event_id"] for r in paginate(e, order, offset, limit).collect()]
    full = [
        r["event_id"]
        for r in e.orderBy(*order).limit(offset + limit).select("event_id").collect()
    ]
    assert page == full[offset:]


def test_ivf_recall_vs_exact(spark):
    """IVF with nprobe=4/16 centroids must recover >= 2 of the exact top-5
    (recall floor for the fixture corpus; exact scorer is the rerank path)."""
    emb = load_table(spark, SF_DIR, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {
        r["vec_id"]
        for r in similarity.cosine_topk(emb, qvec, k=5, exclude_ids=[0]).collect()
    }
    approx = {
        r["vec_id"]
        for r in similarity.ivf_topk(emb, qvec, k=5, nprobe=4, exclude_ids=[0]).collect()
    }
    assert len(exact & approx) >= 2, (exact, approx)


def test_ivf_assignment_partitions_corpus(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    cents = similarity.ivf_centroids(emb, n_centroids=8)
    assigned = similarity.ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    n_lists = assigned.select("cent_id").distinct().count()
    assert 1 < n_lists <= 8
