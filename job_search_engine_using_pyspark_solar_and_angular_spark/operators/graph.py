"""Link-analysis over document similarity graphs: integer-exact PageRank.

Web-corpus curation uses link centrality as a quality prior (a page many
pages point at is worth keeping; an orphaned near-dup is not). The engine
already derives a graph from content — LSH candidate pairs — so the same
edges that drive dedup clustering can rank documents by connectivity.

Exactness: classic PageRank iterates floating-point mass, which is
summation-order-dependent and so un-oracle-able. This formulation keeps ALL
mass in integer micro-units (scale = 1e12):

    contrib(u->v) = rank(u) div deg(u)
    rank'(v)      = (15 * (scale div n)) div 100  +  (85 * Σ contrib) div 100

Every operation is integer division/addition — bit-identical in any engine,
so a FIXED-iteration run has an exact SQL oracle (the iterations unroll as
chained CTEs; no recursive aggregates needed). The div-floor leaks a few
units of mass per division — at scale=1e12 that is a ~1e-12 relative bias,
irrelevant for ranking and the price of exactness.

Scale shape per iteration: one join edges⋈ranks on the source key + one
sum-shuffle on the destination key — identical to the connected-components
round shape (operators/dedup.py), with ``localCheckpoint`` cutting lineage
so iteration k's plan does not embed iterations 1..k-1. Dangling nodes
cannot exist here (every node in an LSH pair has degree >= 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank_int(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    iters: int = 5,
    scale: int = SCALE,
) -> DataFrame:
    """Integer PageRank over the undirected graph of ``pairs``. Returns
    (node, rank) for every node in at least one pair, rank in micro-units
    of ``scale``. Deterministic for any partitioning/run."""
    pairs_p = pairs.persist()
    edges = (
        pairs_p.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs_p.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    pairs_p.unpersist()
    deg = edges.groupBy("a").agg(F.count("*").alias("deg")).localCheckpoint()
    n = deg.count()
    base = (15 * (scale // n)) // 100
    rank = deg.select(F.col("a").alias("node"), F.lit(scale // n).alias("rank"))
    edges_deg = edges.join(deg, "a").localCheckpoint()
    for _ in range(iters):
        contrib = edges_deg.join(
            rank, edges_deg.a == rank.node
        ).select(F.col("b").alias("node"), F.expr("rank div deg").alias("c"))
        incoming = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        rank = (
            deg.select(F.col("a").alias("node"))
            .join(incoming, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("(85 * coalesce(s, 0L)) div 100")
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return rank
