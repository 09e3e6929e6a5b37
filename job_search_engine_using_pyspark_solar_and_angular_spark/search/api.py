"""Query-surface functions mirroring the reference's three REST endpoints
(``Ranking Model/src/main/java/api/Handler.java:33-161`` and
``Main/SolrRanker.java:66-160``), re-expressed as single Catalyst plans.

The reference's N+1 per-row Solr lookups (``SolrRanker.java:80-84,107-110``)
become one broadcast hash join; the ``{count, data:[{tweet,user}]}`` envelope
(``api/Handler.java:42-64``) is built by ``to_envelope`` from the collected
top-k only (k rows cross the driver boundary, never the corpus).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokenize_normalized
from .bm25 import bm25_search
from .index import SearchIndex


def search_keyword(
    spark: SparkSession,
    index: SearchIndex,
    docs: DataFrame,
    users: DataFrame | None,
    query: str,
    k: int = 10,
    doc_user_key: tuple[str, str] | None = None,
    start: int = 0,
    after: tuple[float, int] | None = None,
) -> DataFrame:
    """BM25 top-k for a free-text query, joined back to full docs (and
    optionally the user dimension — reference J1 broadcast join). The query
    passes through the SAME analyzer as the corpus (tokenize_query mirrors
    tokenize_normalized) — otherwise punctuated queries would never match.

    Pagination (reference O5 — the skip/limit the reference controller
    accepted but ignored, ``api/Handler.java:34``): ``start`` is Solr-style
    numeric offset (the retrieval pool deepens to ``start+k`` and the page
    is sliced via :func:`operators.topk.paginate`); ``after=(score,
    doc_id)`` is the KEYSET cursor — constant per-page cost, preferred for
    deep paging. The join-back and ordering are identical either way.
    ``start`` and ``after`` are mutually exclusive: they define different
    page boundaries, and silently preferring one (the pre-r9 behavior
    ignored ``start``) hides a caller bug — reject the combination."""
    terms = tokenize_query(query)
    if after is not None and start > 0:
        raise ValueError(
            "start and after are mutually exclusive pagination modes; "
            "pass a numeric offset OR a keyset cursor, not both"
        )
    if after is not None:
        hits = bm25_search(spark, index, terms, k=k, after=after)
    elif start > 0:
        from ..operators.topk import paginate

        pool = bm25_search(spark, index, terms, k=start + k)
        hits = paginate(
            pool, [F.col("score").desc(), F.col("doc_id")], start, k
        )
    else:
        hits = bm25_search(spark, index, terms, k=k)
    out = hits.join(docs, "doc_id")  # hits is tiny: Catalyst broadcasts it
    if users is not None and doc_user_key is not None:
        dcol, ucol = doc_user_key
        out = out.join(F.broadcast(users), out[dcol] == users[ucol], "left")
    return out.orderBy(F.col("score").desc(), F.col("doc_id"))


def search_hashtag(
    docs: DataFrame,
    tag: str,
    tags_col: str = "hashtags",
    order_col: str = "doc_id",
    k: int = 1000,
) -> DataFrame:
    """Exact-match search on a multiValued field (reference R3:
    ``SolrRanker.java:93-118``, rows=1000): array_contains + time-desc top-k.
    The array_contains predicate stays in the scan stage — no shuffle until
    the top-k."""
    return (
        docs.filter(F.array_contains(F.col(tags_col), tag))
        .orderBy(F.col(order_col).desc())
        .limit(k)
    )


def search_user(
    users: DataFrame,
    items: DataFrame,
    name: str,
    name_col: str,
    user_key: str,
    item_user_key: str,
    time_col: str,
    k: int = 1000,
) -> DataFrame:
    """User page (reference R4: ``SolrRanker.java:120-160``): look up the user
    by exact name, then their items time-desc. The 1-row user lookup is
    broadcast into the items scan — a semi-join point lookup, not a collect."""
    u = users.filter(F.col(name_col) == name).limit(1)
    return (
        items.join(F.broadcast(u), items[item_user_key] == u[user_key])
        .orderBy(F.col(time_col).desc(), items[item_user_key])
        .limit(k)
    )


def search_vector(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    multiprobe: bool = True,
    num_planes: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Vector search against the on-disk bucket-partitioned int8 LSH index
    (``similarity.write_vector_index_int8``) — the vector twin of the BM25
    request path: one served query = the probed buckets' files only
    (dynamic partition pruning). ``multiprobe`` widens the probe set to
    the Hamming-1 buckets (recall ladder measured by
    ext_ann_tier_recall). Returns (vec_id, sim) top-k; wrap with
    :func:`to_envelope` for the REST shape.

    ``dim`` defaults to ``len(query_vec)`` and must match the dim the index
    was written with — a mismatched index raises via lsh_bucket_int8's
    per-row size guard rather than silently probing the wrong bucket."""
    from pyspark.sql import functions as F

    from ..functions.vectors import cosine
    from ..operators.similarity import lsh_bucket_int8, quantize_int8

    if dim is None:
        dim = len(query_vec)
    q = spark.createDataFrame(
        [(0, [float(x) for x in query_vec])], "vec_id long, embedding array<double>"
    )
    qb = lsh_bucket_int8(quantize_int8(q), num_planes=num_planes, dim=dim)
    probes = F.array(F.col("bucket"))
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(num_planes)],
        )
    probe_df = qb.select(F.explode(probes).alias("qbucket"))
    qv = q.select(F.col("embedding").alias("qv"))
    idx = spark.read.parquet(index_path)
    return (
        idx.join(F.broadcast(probe_df), idx["bucket"] == F.col("qbucket"))
        .select("vec_id", "embedding")
        .distinct()
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            (F.round(cosine(F.col("embedding"), F.col("qv")), 4) + F.lit(0.0)).alias(
                "sim"
            ),
        )
        .orderBy(F.col("sim").desc(), F.col("vec_id"))
        .limit(k)
    )


def to_envelope(df: DataFrame, k: int | None = None) -> dict[str, Any]:
    """Collect <=k rows into the reference's REST envelope shape
    (``api/Handler.java:42-64``, ``constants/APIConstants.java:5-17``)."""
    rows = [r.asDict(recursive=True) for r in (df.limit(k) if k else df).collect()]
    return {"count": len(rows), "data": rows, "status_code": 200, "message": "OK"}


def tokenize_query(query: str) -> list[str]:
    """Driver-side mirror of functions.text.tokenize_normalized for query
    strings (tiny, so plain Python is fine here)."""
    import re

    return [t for t in (re.sub(r"[^a-z0-9]", "", w) for w in query.lower().split(" ")) if t]


def suggest_next_token(
    docs, prev: str, k: int = 5, id_col: str = "doc_id", text_col: str = "text"
):
    """Query-completion by bigram conditional probability: the top-``k``
    tokens following ``prev`` in the corpus, with P(next|prev) =
    c(prev next) / c(prev ·). One token-stream pass (bigram counts filtered
    to the prev token — the filter pushes into the aggregation), top-k via
    TakeOrderedAndProject. Deterministic ties on the token."""
    from pyspark.sql import functions as F

    from ..functions.hashing import token_ngrams
    from ..functions.text import tokenize_normalized
    from ..io import ensure_parallelism

    toks = ensure_parallelism(docs).select(
        tokenize_normalized(text_col).alias("tk")
    )
    bi = (
        toks.select(F.explode(token_ngrams(F.col("tk"), 2)).alias("pair"))
        .filter(F.col("pair").startswith(prev + " "))
        .groupBy("pair")
        .agg(F.count("*").alias("c"))
    )
    total = bi.agg(F.sum("c").alias("n"))
    return (
        bi.crossJoin(F.broadcast(total))
        .select(
            F.split("pair", " ")[1].alias("next_token"),
            F.col("c").cast("long").alias("c"),
            F.round(F.col("c") / F.col("n"), 4).alias("p"),
        )
        .orderBy(F.col("c").desc(), "next_token")
        .limit(k)
    )


def autocomplete(
    docs, prefix: str, k: int = 10, id_col: str = "doc_id", text_col: str = "text"
):
    """Prefix autocomplete over the corpus vocabulary: top-``k`` tokens
    starting with ``prefix`` by frequency. On a served deployment this
    reads the bucketed postings/term table instead of re-tokenizing —
    same shape as the BM25 served path."""
    from pyspark.sql import functions as F

    from ..functions.text import tokenize_normalized
    from ..io import ensure_parallelism

    toks = ensure_parallelism(docs).select(
        F.explode(tokenize_normalized(text_col)).alias("token")
    )
    return (
        toks.filter(F.col("token").startswith(prefix))
        .groupBy("token")
        .agg(F.count("*").alias("c"))
        .select("token", F.col("c").cast("long").alias("c"))
        .orderBy(F.col("c").desc(), "token")
        .limit(k)
    )


def phrase_search(
    docs: DataFrame,
    phrase: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase matching via POSITIONAL postings — the Lucene/Solr
    phrase-query capability (``"window join"``) the keyword surfaces can't
    express: term i of the phrase must occur at position p+i of the same
    document.

    Plan: one posexplode to (doc, token, pos), pruned to the phrase's terms
    BEFORE any shuffle (the same postings-pruning discipline as BM25 —
    the scan drops every non-phrase token); then one self-equi-join per
    adjacent term pair on (doc, expected position) — never a positions
    array crossing the shuffle — and a per-doc occurrence count. Returns
    (doc_id, n_occurrences) top-k by count desc, id asc."""
    from ..functions.text import tokenize_normalized

    toks = docs.select(
        F.col(id_col), F.posexplode(tokenize_normalized(text_col)).alias("pos", "tok")
    ).filter(F.col("tok").isin(list(set(phrase))))
    first = toks.filter(F.col("tok") == phrase[0]).select(
        id_col, F.col("pos").alias("p0")
    )
    matched = first
    for i, term in enumerate(phrase[1:], start=1):
        nxt = toks.filter(F.col("tok") == term).select(
            id_col, (F.col("pos") - i).alias("p0")
        )
        matched = matched.join(nxt, [id_col, "p0"])
    return (
        matched.groupBy(id_col)
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col(id_col))
        .limit(k)
    )


def search_all_terms(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boolean-AND search: documents containing EVERY query term (the
    reference's Solr surface only ORs its fields). One tokenize pass pruned
    to the query terms, one distinct, one per-doc count — a doc matches iff
    it covers all |terms| distinct terms. Returns (doc_id, n_terms) top-k
    ordered by doc_id (all matches tie on n_terms by construction)."""
    from ..functions.text import tokenize_normalized

    uniq = sorted(set(terms))
    toks = (
        docs.select(
            F.col(id_col), F.explode(tokenize_normalized(text_col)).alias("tok")
        )
        .filter(F.col("tok").isin(uniq))
        .distinct()
    )
    return (
        toks.groupBy(id_col)
        .agg(F.count("*").alias("n_terms"))
        .filter(F.col("n_terms") == len(uniq))
        .orderBy(F.col(id_col))
        .limit(k)
    )


def snippets(
    docs: DataFrame,
    term: str,
    window: int = 3,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Search-result snippet extraction (the Solr highlighting surface): the
    ±``window`` raw tokens around the FIRST occurrence of ``term``.

    Matching happens on a position-ALIGNED normalized view (normalize each
    whitespace token in place — never filter, so display positions line up
    with match positions), then one ``slice`` of the raw tokens. Pure
    per-row column math: no shuffle, no UDF; the filter prunes non-matching
    docs at the scan."""
    from ..functions.text import normalize_token

    raw = F.split(F.col(text_col), " ")
    norm = F.transform(raw, normalize_token)
    pos = F.array_position(norm, term)  # 1-based; 0 when absent
    start = F.greatest(F.col("pos") - window, F.lit(1))
    length = F.col("pos") + window - start + 1
    return (
        docs.select(F.col(id_col), raw.alias("__raw"), pos.alias("pos"))
        .filter(F.col("pos") > 0)
        .select(
            id_col,
            "pos",
            F.concat_ws(" ", F.slice("__raw", start, length)).alias("snippet"),
        )
        .orderBy(id_col)
        .limit(k)
    )


def related_docs(
    docs: DataFrame,
    doc_id,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Related-content endpoint (Solr's MLT handler shape): More-Like-This
    top-k for a document, joined back to the full doc rows — the same
    hits-are-tiny broadcast-back pattern as search_keyword."""
    from .bm25 import more_like_this

    hits = more_like_this(docs, doc_id, k=k, id_col=id_col, text_col=text_col)
    return hits.join(docs, id_col).orderBy(
        F.col("sim").desc(), F.col(id_col)
    )


def search_facets(
    index,
    docs: DataFrame,
    terms: list[str],
    facet_cols: list[str],
    top: int = 5,
) -> DataFrame:
    """Facet counts over the MATCHING document set (Solr's facet component,
    reference R6 — docValues faceting re-expressed as grouped counts over
    a columnar scan): documents containing ANY query term (the same OR
    match semantics as ranked retrieval), then per-facet-column value
    counts, top-``top`` per facet by (count desc, value). Matching is a
    semi join of the docs table against the query's postings — the facet
    aggregation reads only the facet columns (column pruning) over the
    matched set, never scores anything."""
    from pyspark.sql import Window

    hits = (
        index.postings.filter(F.col("token").isin(terms))
        .select("doc_id")
        .distinct()
    )
    matched = docs.join(hits, "doc_id", "left_semi")
    out = None
    for c in facet_cols:
        f = matched.groupBy(F.col(c).cast("string").alias("value")).agg(
            F.count("*").alias("n")
        )
        f = f.select(F.lit(c).alias("facet"), "value", "n")
        out = f if out is None else out.unionByName(f)
    w = Window.partitionBy("facet").orderBy(F.col("n").desc(), "value")
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top)
        .select("facet", "value", "n", F.col("rn").cast("long").alias("rn"))
        .orderBy("facet", "rn")
    )


def correct_query_terms(
    spark: SparkSession,
    index,
    terms: list[str],
    max_dist: int = 1,
) -> list[str]:
    """Did-you-mean: correct each query term against the INDEX VOCABULARY
    (term_stats) via delete-key blocked fuzzy matching — Solr's spellcheck
    component re-expressed relationally. A term found in the vocabulary
    passes through; otherwise the candidate with (lowest edit distance,
    highest document frequency, lexicographic) wins; terms with no
    candidate within ``max_dist`` pass through unchanged.

    The fuzzy block join runs against term_stats (vocabulary-grain — tiny
    relative to the corpus); only the ≤len(terms) correction rows are
    collected, never postings."""
    from ..operators.joins import fuzzy_join

    qdf = spark.createDataFrame([(t,) for t in terms], "qterm string")
    vocab = index.term_stats.select("token", "df")
    cand = fuzzy_join(qdf, vocab, "qterm", "token", max_dist=max_dist)
    scored = (
        cand.join(vocab, "token")
        .groupBy("qterm")
        .agg(
            F.min(
                F.struct(
                    F.col("dist"),
                    (-F.col("df")).alias("ndf"),
                    F.col("token").alias("token"),
                )
            ).alias("b")
        )
        .select("qterm", F.col("b.token").alias("corrected"))
    )
    fixes = {r["qterm"]: r["corrected"] for r in scored.collect()}
    return [fixes.get(t, t) for t in terms]


def search_keyword_corrected(
    spark: SparkSession,
    index,
    query: str,
    k: int = 10,
    max_dist: int = 1,
):
    """BM25 search with did-you-mean correction: tokenize, correct each
    term against the index vocabulary, then the ordinary ranked retrieval.
    Returns (results_df, corrected_terms)."""
    from .bm25 import bm25_search

    terms = tokenize_query(query)
    corrected = correct_query_terms(spark, index, terms, max_dist=max_dist)
    return bm25_search(spark, index, corrected, k=k), corrected


def search_hybrid_served(
    spark: SparkSession,
    index_base: str,
    vector_index_path: str,
    query: str,
    query_vec: list[float],
    k: int = 10,
    pool: int = 20,
    table: str = "jse_postings",
    num_planes: int = 4,
) -> DataFrame:
    """The fully-SERVED hybrid front door: BM25 from the on-disk bucketed
    postings index (``search.index.read_index``) fused with multiprobe
    vector search from the on-disk LSH index (``search_vector``) by the
    same RRF arithmetic as :func:`search_hybrid`. Per-request cost is
    posting-list reads + probed-bucket files — both index builds are paid
    at index time; no corpus scan serves a request."""
    from pyspark.sql import Window

    from .bm25 import bm25_search
    from .index import read_index

    idx = read_index(spark, index_base, table=table)
    bm = bm25_search(spark, idx, tokenize_query(query), k=pool)
    wb = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    bmr = bm.select("doc_id", F.row_number().over(wb).cast("long").alias("rb"))

    vec = search_vector(
        spark, vector_index_path, query_vec, k=pool, num_planes=num_planes
    )
    wv = Window.orderBy(F.col("sim").desc(), F.col("vec_id"))
    vr = vec.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(wv).cast("long").alias("rv"),
    )
    rrf = F.coalesce(1.0 / (F.lit(60) + F.col("rb")), F.lit(0.0)) + F.coalesce(
        1.0 / (F.lit(60) + F.col("rv")), F.lit(0.0)
    )
    return (
        bmr.join(vr, "doc_id", "full_outer")
        .select("doc_id", F.round(rrf, 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(k)
    )


def search_hybrid(
    spark: SparkSession,
    index: SearchIndex,
    embeddings: DataFrame,
    query: str,
    query_vec_id,
    k: int = 10,
    pool: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval endpoint: BM25 over the query text fused with
    cosine over a query vector by Reciprocal-Rank Fusion (1/(60+rank)) —
    the RAG-stack front door. Both candidate pools are size ``pool``; the
    fusion runs over ≤2·pool rows while each retrieval keeps its
    distributed plan."""
    from pyspark.sql import Window

    from ..functions.vectors import cosine

    terms = tokenize_query(query)
    bm = bm25_search(spark, index, terms, k=pool)
    wb = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    bmr = bm.select("doc_id", F.row_number().over(wb).cast("long").alias("rb"))
    qv = embeddings.filter(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("qv")
    )
    cos = (
        embeddings.filter(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col(id_col).alias("doc_id"),
            (F.round(cosine(F.col(vec_col), F.col("qv")), 4) + F.lit(0.0)).alias(
                "sim"
            ),
        )
        .orderBy(F.col("sim").desc(), F.col("doc_id"))
        .limit(pool)
    )
    wv = Window.orderBy(F.col("sim").desc(), F.col("doc_id"))
    vr = cos.select("doc_id", F.row_number().over(wv).cast("long").alias("rv"))
    rrf = F.coalesce(1.0 / (F.lit(60) + F.col("rb")), F.lit(0.0)) + F.coalesce(
        1.0 / (F.lit(60) + F.col("rv")), F.lit(0.0)
    )
    return (
        bmr.join(vr, "doc_id", "full_outer")
        .select("doc_id", "rb", "rv", F.round(rrf, 6).alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(k)
    )
