"""Iterative-graph scale probe (VERDICT r8 #4): per-round cost flatness
and edge-count scaling of the two production iterative operators —
``graph.pagerank_int`` (5 rounds) and ``graph.bfs_distances`` (4 hops) —
at x1 / x10 / x100 edge scale.

What it measures, per scale point:

* END-TO-END wall of the real operators (the production code path);
* PER-ROUND wall of an instrumented loop with the exact production round
  shape (join on the source key + keyed agg + lazy ``lineage_cut``, see
  operators/graph.py:127-143 and :243-252), each round materialized by a
  count so rounds are individually timed;
* PER-ROUND executed-plan size — the lineage_cut effectiveness check:
  with working cuts the plan string stays the same size every round;
  without them round k's plan embeds rounds 1..k-1 and grows without
  bound (the failure mode that kills iterative jobs at cluster scale).

Edge scaling: the base graph is the REAL LSH candidate-pair graph over
the sf0.1 documents corpus — the same edges the dedup clustering derives
(operators/dedup.py:minhash_lsh_candidates). Larger scales replicate it
as id-offset DISJOINT copies. Replicating the corpus *texts* and
re-running LSH would instead connect every copy of every doc (identical
text is the ultimate near-dup), collapsing the graph into dense clique
families — that measures LSH bucket skew, which probe_dedup_scale.py
owns; THIS probe owns the iteration shape, so the replication must
preserve the base graph's degree/diameter structure, which disjoint
copies do exactly.

Usage:
  python tools/probe_graph_scale.py [reps_csv]   # default 1,10,100

Prints one JSON line; SCALE.md records the ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_pairs(spark, base, reps: int, id_offset: int):
    """``reps`` disjoint id-offset copies of the base pair graph.
    ``id_offset`` must exceed the base graph's max node id (derived by the
    caller — a fixed constant would silently overlap copies on a larger
    corpus, welding them into cross-connected components and invalidating
    the disjoint-replication invariant this probe's numbers rest on)."""
    if reps == 1:
        return base
    return base.crossJoin(spark.range(reps).select(F.col("id").alias("__r"))).select(
        (F.col("doc_a") + F.col("__r") * id_offset).alias("doc_a"),
        (F.col("doc_b") + F.col("__r") * id_offset).alias("doc_b"),
    )


def timed_rounds_pagerank(pairs, iters: int = 5):
    """graph.pagerank_int's exact loop (operators/graph.py:106-143), each
    round materialized and timed; returns (per_round_sec, plan_chars)."""
    from job_search_engine_using_pyspark_solar_and_angular_spark.operators.checkpointing import (
        lineage_cut,
    )
    from job_search_engine_using_pyspark_solar_and_angular_spark.operators.graph import (
        SCALE,
    )

    pairs_p = pairs.persist()
    edges = lineage_cut(
        pairs_p.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs_p.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct(),
        None,
    )
    pairs_p.unpersist()
    deg = lineage_cut(edges.groupBy("a").agg(F.count("*").alias("deg")), None, eager=False)
    n = deg.count()
    base_mass = (15 * (SCALE // n)) // 100
    rank = deg.select(F.col("a").alias("node"), F.lit(SCALE // n).alias("rank"))
    edges_deg = lineage_cut(edges.join(deg, "a"), None, eager=False)
    per_round, plan_chars = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        contrib = edges_deg.join(rank, edges_deg.a == rank.node).select(
            F.col("b").alias("node"), F.expr("rank div deg").alias("c")
        )
        incoming = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        rank = lineage_cut(
            deg.select(F.col("a").alias("node"))
            .join(incoming, "node", "left")
            .select(
                "node",
                (F.lit(base_mass) + F.expr("(85 * coalesce(s, 0L)) div 100")).alias(
                    "rank"
                ),
            ),
            None,
            eager=False,
        )
        rank.count()  # materialize THIS round only (prior rounds are cut)
        per_round.append(round(time.perf_counter() - t0, 3))
        plan_chars.append(
            len(rank._jdf.queryExecution().executedPlan().toString())
        )
    return per_round, plan_chars


def timed_rounds_bfs(pairs, max_hops: int = 4):
    """graph.bfs_distances' exact loop (operators/graph.py:233-252)."""
    from job_search_engine_using_pyspark_solar_and_angular_spark.operators.checkpointing import (
        lineage_cut,
    )

    e = lineage_cut(
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct(),
        None,
    )
    dist = e.agg(F.min("a").alias("node")).select(
        "node", F.lit(0).cast("long").alias("dist")
    )
    per_round, plan_chars = [], []
    for _ in range(max_hops):
        t0 = time.perf_counter()
        nxt = dist.join(e, dist.node == e.a).select(
            F.col("b").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        dist = lineage_cut(
            dist.unionByName(nxt).groupBy("node").agg(F.min("dist").alias("dist")),
            None,
            eager=False,
        )
        dist.count()
        per_round.append(round(time.perf_counter() - t0, 3))
        plan_chars.append(len(dist._jdf.queryExecution().executedPlan().toString()))
    return per_round, plan_chars


def main() -> None:
    reps_list = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1 else "1,10,100").split(",")]
    from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
    from job_search_engine_using_pyspark_solar_and_angular_spark.operators import (
        dedup,
        graph,
    )
    from job_search_engine_using_pyspark_solar_and_angular_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="probe-graph-scale")
    spark.sparkContext.setLogLevel("ERROR")

    from job_search_engine_using_pyspark_solar_and_angular_spark.operators.checkpointing import (
        lineage_cut,
    )

    docs = load_table(spark, SF_DIR, "documents")
    # lineage_cut, not persist: the operators under test persist+unpersist
    # their pairs input internally, which would strip a shared persisted
    # cache mid-probe (and reps=1 ALIASES base) — later scales would then
    # silently re-run the whole LSH pipeline inside their timings. A local
    # checkpoint is immune to callee unpersist and survives all scales.
    base = lineage_cut(dedup.minhash_lsh_candidates(docs), None)
    base_edges = base.count()
    id_offset = (
        base.agg(F.greatest(F.max("doc_a"), F.max("doc_b")).alias("m")).first()[0]
        + 1
    )

    out = {
        "metric": "iterative graph scale probe (pagerank + bfs)",
        "sf_dir": SF_DIR,
        "base_edges": base_edges,
        "scales": {},
    }
    for reps in reps_list:
        pairs = lineage_cut(replicated_pairs(spark, base, reps, id_offset), None)
        n_edges = pairs.count()
        # end-to-end production paths first (warm codegen for the loops)
        t0 = time.perf_counter()
        graph.pagerank_int(pairs).write.format("noop").mode("overwrite").save()
        pr_total = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        graph.bfs_distances(pairs).write.format("noop").mode("overwrite").save()
        bfs_total = round(time.perf_counter() - t0, 3)
        pr_rounds, pr_plans = timed_rounds_pagerank(pairs)
        bfs_rounds, bfs_plans = timed_rounds_bfs(pairs)
        # pairs is a local checkpoint — freed by the context cleaner when
        # this reference drops; nothing to unpersist
        out["scales"][f"x{reps}"] = {
            "edges": n_edges,
            "pagerank_total_sec": pr_total,
            "bfs_total_sec": bfs_total,
            "pagerank_rounds_sec": pr_rounds,
            "bfs_rounds_sec": bfs_rounds,
            # flatness: last/first — >1.3 means rounds are getting slower
            # (uncut lineage or state growth)
            "pagerank_round_flatness": round(pr_rounds[-1] / pr_rounds[0], 2),
            "bfs_round_flatness": round(bfs_rounds[-1] / bfs_rounds[0], 2),
            # BFS round 1 is a one-node frontier (nearly free), so
            # last/first mostly measures frontier EXPANSION, not lineage
            # growth; steady-state flatness (last / second) is the
            # lineage-health signal once the frontier has fanned out
            "bfs_steady_flatness": round(bfs_rounds[-1] / bfs_rounds[1], 2)
            if len(bfs_rounds) > 1
            else 1.0,
            # plan growth: chars of round k's executed plan — flat when
            # lineage cuts work (the load-bearing invariant)
            "pagerank_plan_chars": pr_plans,
            "bfs_plan_chars": bfs_plans,
        }
    # headline ratios vs x1
    if len(reps_list) > 1 and reps_list[0] == 1:
        s1 = out["scales"]["x1"]
        for reps in reps_list[1:]:
            s = out["scales"][f"x{reps}"]
            s["pagerank_round_scaling_vs_x1"] = round(
                (sum(s["pagerank_rounds_sec"]) / len(s["pagerank_rounds_sec"]))
                / (sum(s1["pagerank_rounds_sec"]) / len(s1["pagerank_rounds_sec"])),
                2,
            )
            s["bfs_round_scaling_vs_x1"] = round(
                (sum(s["bfs_rounds_sec"]) / len(s["bfs_rounds_sec"]))
                / (sum(s1["bfs_rounds_sec"]) / len(s1["bfs_rounds_sec"])),
                2,
            )
    print(json.dumps(out))
    os.makedirs(os.path.join(REPO, ".bench"), exist_ok=True)
    with open(
        os.path.join(REPO, ".bench", "graph_scale.json"), "w", encoding="utf-8"
    ) as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
