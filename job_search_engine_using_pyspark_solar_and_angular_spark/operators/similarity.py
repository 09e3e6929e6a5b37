"""Similarity search over embedding columns (array<float>).

Three tiers, one API:
- brute-force cosine top-k (exact baseline; X2) — per-row HOF math + one
  TakeOrderedAndProject. At 100 TB use this per-partition as the rerank stage.
- random-hyperplane LSH bucketing (scale path) — deterministic planes derived
  from md5 of (plane_index, dimension), so signatures are reproducible across
  runs/partitions; candidates only compare within a bucket.
- embedding near-dup pairs (cosine >= threshold) via the same LSH buckets.

No MLlib dependency: MLlib's LSH uses Vector UDTs and private seeds; plain
arrays + md5-derived planes keep everything oracle-testable and
column-pruning-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Returns (vec_id, sim rounded to 4) ordered sim desc, id asc. The query
    vector is a literal array in the plan — broadcast by construction; the
    scan is embarrassingly parallel and the only cross-partition work is the
    k-row merge."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    out = embeddings.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 4).alias("sim"),
    )
    if exclude_ids:
        out = out.filter(~F.col(id_col).isin(exclude_ids))
    return out.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def cosine_topk_df(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Batch exact top-k: every query row against the corpus. Queries are
    broadcast (they are the small side by contract); per-query top-k via a
    rank window partitioned by query id."""
    from .topk import top_k_per_group

    joined = embeddings.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col(query_vec_col)), 4).alias("sim"),
    )
    return top_k_per_group(
        joined, [query_id_col], [F.col("sim").desc(), F.col(id_col)], k
    )


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1): derived from
    md5 of 'plane:dim' — stable across runs, languages, partitions."""
    import hashlib

    h = int(hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[:15], 16)
    return (h / float(1 << 60)) * 2.0 - 1.0


def lsh_bucket(
    embeddings: DataFrame,
    num_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Random-hyperplane LSH: sign bits of <v, plane_j> packed into an int
    bucket id. Cosine-similar vectors collide with high probability."""
    bits = []
    for j in range(num_planes):
        plane = F.array(*[F.lit(_plane_component(j, d)) for d in range(dim)])
        bits.append(F.when(dot(F.col(vec_col), plane) >= 0, 1 << j).otherwise(0))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return embeddings.withColumn(bucket_col, bucket.cast("int"))


def ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
) -> DataFrame:
    """Approximate top-k: restrict the exact scorer to the query's LSH bucket.
    At 100 TB, write the corpus partitioned by bucket so this prunes files."""
    dim = len(query_vec)
    bucketed = lsh_bucket(embeddings, num_planes, dim, vec_col)
    qbits = 0
    for j in range(num_planes):
        s = sum(query_vec[d] * _plane_component(j, d) for d in range(dim))
        if s >= 0:
            qbits |= 1 << j
    cand = bucketed.filter(F.col("bucket") == qbits)
    return cosine_topk(cand, query_vec, k, id_col, vec_col, exclude_ids)


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF codebook: the ``n_centroids`` lowest-id vectors act
    as centroids (reproducible across runs; production swaps in k-means —
    the inverted-list plan below is unchanged). Returns (cent_id, centroid)."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col(id_col))
    return (
        embeddings.select(id_col, vec_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_centroids)
        .select(
            (F.col("__rn") - 1).alias("cent_id"),
            F.col(vec_col).alias("centroid"),
        )
    )


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (cosine argmax) — the
    inverted-list build. Centroids broadcast; one max_by agg per vector.
    At 100 TB, write the result partitioned by cent_id so a query scans only
    its probed lists (partition pruning = the inverted file)."""
    scored = embeddings.crossJoin(F.broadcast(centroids)).select(
        F.col(id_col),
        F.col(vec_col),
        F.col("cent_id"),
        cosine(F.col(vec_col), F.col("centroid")).alias("csim"),
    )
    return scored.groupBy(id_col).agg(
        F.max_by("cent_id", F.struct("csim", (-F.col("cent_id")).alias("t"))).alias(
            "cent_id"
        ),
        F.first(vec_col).alias(vec_col),
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: list[int] | None = None,
    assigned: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` centroids nearest the
    query, exact-score only their inverted lists. Pass a prebuilt
    (assigned, centroids) pair to amortize the index across queries."""
    if centroids is None:
        centroids = ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    if assigned is None:
        assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    probes = (
        centroids.select("cent_id", cosine(F.col("centroid"), q).alias("qsim"))
        .orderBy(F.col("qsim").desc(), F.col("cent_id"))
        .limit(nprobe)
        .select("cent_id")
    )
    cand = assigned.join(F.broadcast(probes), "cent_id")
    return cosine_topk(cand, query_vec, k, id_col, vec_col, exclude_ids)


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), candidates limited
    to same-LSH-bucket pairs. Returns (id_a, id_b, sim)."""
    b = lsh_bucket(embeddings, num_planes, dim, vec_col)
    left = b.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("bucket")
    )
    right = b.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("bucket")
    )
    pairs = left.join(right, ["bucket"]).filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )
