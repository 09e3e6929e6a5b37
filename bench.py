"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "served_refresh_sec": <per-micro-batch serve-loop cost>,
   "streaming_ingest": {"input_mb": ..., "sec": ..., "mb_per_sec": ...,
                        "n_batches": ...},  # Structured Streaming ingest loop
   "preprocess_scaled": {"input_mb": ..., "sec": ..., "mb_per_sec": ...,
                         "baseline_mb_per_sec": 1.11, "speedup_vs_baseline": ...},
   "preprocess_scaled_1gb": {same shape, ~1 GB input},
   "preprocess_skewed": {same shape + "ratio_vs_uniform", one org_id = ~10% of rows},
   "preprocess_scaled_10gb": {same shape, ~10 GB input, min-of-2 with
                              per-sink stage walls},
   "served_trials": {name: [sec, ...], ...},  # raw trials, headline + served
   "regressions": {name: {"prev": sec, "cur": sec, "ratio": ...}, ...}}

``regressions`` compares to the best available prior run — the builder's
own ``.bench/last_full.json`` first, else the newest BENCH_r{N}.json
(parsed dict, or reconstructed from its ``tail`` string when the driver
recorded ``parsed: null``) — and flags >1.5x per-query slowdowns on the
common set. ``_baseline`` names the source and ``_compared`` counts the
common queries, so "no flags" is distinguishable from "nothing compared".
Would-be flags the artifact itself explains as noise (host-adjusted-clean,
or inside the baseline's own recorded trial spread) land in
``_noise_absorbed`` instead of counting — see _flag_slowdowns. Flags that
survive absorption are then RE-MEASURED at end of run (the burst that
inflated them has usually passed; the fresh trials land under the
artifact's ``recheck_trials`` key AND REPLACE the burst-inflated
``served_trials`` entry — so the baseline the next run absorbs against
carries the quiet spread, not the burst's — and the guard recomputes):
a real plan regression reproduces and keeps its flag, transient load
clears with a true quiet measurement. ``_rechecked`` lists the
re-measured entries.

Methodology:
- each query is forced with ``df.write.format("noop")`` — full column
  materialization on every plan (a bare count() lets Spark skip decoding
  projected columns on some plans, flattering the numbers).
- each query reports the MIN of 2 back-to-back trials (3 when the two
  disagree by >1.3x — one noisy-neighbor spike then gets a retry at a
  quiet window): trial 1 pays per-plan whole-stage-codegen compilation (a
  fixed driver-side cost, irrelevant at cluster scale); the min is the
  reproducible plan cost.
- COLD-TRIAL ACCOUNTING (r12, VERDICT r11 #1/#3): every trial starts with
  the query's ``persist_scoped`` cache generation released, so each trial
  rebuilds its persists and the recorded min is the honest cold cost — a
  measurement fix, not an optimization: pre-r12 a scoped-persist query's
  trial 2 read trial 1's cache blocks and min-of-N recorded a warm cache
  read (ext_minhash_candidates' 0.59 s vs its ~1.0 s true cost). Entries
  affected are listed in the artifact's ``scoped_cache_queries``; their
  r12 numbers are NOT comparable to earlier rounds' warm minima.
- ``preprocess_scaled`` measures the END-TO-END reference batch job at the
  reference's own measured volume (BASELINE.md Fig. 10: ~90 s / 100 MB of
  raw tweet JSON => ~1.1 MB/s): read a >=100 MB JSON corpus from disk,
  flatten/split/dedup/filter (plans/preprocess.py), write BOTH sinks
  (typed parquet + stringified CSV) like the reference does. Corpus is
  synthesized once (sources/synthetic.scaled_tweet_corpus) and cached under
  .bench/; JSON Lines (splittable) rather than the reference's multiLine
  arrays (one task per file) — the format choice itself is part of the
  engine's 100 TB design.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from job_search_engine_using_pyspark_solar_and_angular_spark.session import get_spark
from job_search_engine_using_pyspark_solar_and_angular_spark.queries import (
    extensions as _ext,  # noqa: F401  (registers extension queries)
)
from job_search_engine_using_pyspark_solar_and_angular_spark.queries.declared import QUERIES

HEADLINE = [
    "q03_anti_join",
    "ext_tpch_q3",
    "q08_latest_wins",
    "q11_agg_tpch_q1",
    "q12_broadcast_join",
    "q17_wordcount_topk",
    "q20_bm25_search",
    "q23_tumbling_window",
    "x1_dedup_stats",
    "x2_cosine_topk",
    "ext_cosine_rerank_np",
    "ext_minhash_candidates",
    "ext_simhash",
    "ext_multimodal_features",
    # corpus-to-trainer stage: broadcast-membership decontamination,
    # LSH-pairs -> connected-components clustering (iterative),
    # concatenate-and-chunk sequence packing, inter-doc line dedup,
    # unigram-LM surprisal, RAG chunking
    "ext_decontaminate",
    "ext_dedup_clusters",
    "ext_pack_sequences",
    "ext_dedup_lines",
    "ext_unigram_logprob",
    "ext_chunk_documents",
    # sketch + quantized-vector tiers and the hopping-window/skew ops
    "ext_heavy_hitters",
    "ext_ann_quantized",
    "ext_sliding_window",
    "ext_salted_join",
    # 5-way star join, time-range frames, exact integer 3-sigma outliers
    "ext_tpch_q5",
    "ext_moving_avg",
    "ext_outliers",
    # iterative link analysis + embedding whitening
    "ext_pagerank",
    "ext_zscore_embeddings",
    # the composed curation funnel (lang/quality/repetition/LSH-dup/
    # decontamination -> one verdict per doc) — the flagship composition
    "ext_curation_verdict",
    # the reference's whole batch job (BASELINE.md Figure 10 workload shape):
    # nested flatten + 3-way split + latest-wins dedup + vocab regex filter
    "ext_preprocess_pipeline",
    # round-2 late additions: canonical TPC-H scan-aggregates, the packed
    # Bloom join filter, MLT doc-to-doc retrieval, hybrid RRF fusion, and
    # the triangle census over the LSH similarity graph
    "ext_tpch_q1",
    "ext_tpch_q6",
    "ext_bloom_prune",
    "ext_more_like_this",
    "ext_hybrid_rrf",
    "ext_triangles",
    # session-3 additions: the completed TPC-H dossier's heaviest members
    # (grouped-fact HAVING, two-quantifier decorrelation, outer-join
    # distribution), BPE vocabulary induction, exact-substring repeated
    # spans, and BFS over the similarity graph
    "ext_tpch_q18",
    "ext_tpch_q21",
    "ext_tpch_q13",
    "ext_bpe_merges",
    "ext_repeated_spans",
    "ext_bfs_distances",
    # session-4 additions: BPE encode (vocab-grain apply + one corpus
    # join), the scan-speed text audits, and the doubled-cents MAD panel
    "ext_bpe_encode",
    "ext_readability",
    "ext_encoding_audit",
    "ext_mad_outliers",
    # late session-4: delete-key fuzzy self-join over the vocabulary and
    # the decorrelated LATERAL top-3-per-user
    "ext_typo_pairs",
    "ext_sql_lateral",
    # round-3 additions: the integer-exact ANN bucket tier, the
    # cluster-quota diversity-sampling selection step, the trainer-handoff
    # shard manifest, and the one-row corpus dataset card
    "ext_ann_lsh_quantized",
    "ext_ann_pq",
    "ext_diversity_sample",
    "ext_shard_manifest",
    "ext_dataset_card",
    # batch exact ANN serving via two-phase partial top-k
    "ext_batch_cosine_topk",
    # round-5 additions: temperature-scaled mixing (apply), the
    # packing-efficiency audit, and the PQ->full-precision rerank funnel
    # (the production composition DEPLOY.md recommends — benched so its
    # ACCEPTED_REGRESSIONS annotation is actually reachable)
    "ext_mix_temperature",
    "ext_packing_stats",
    "ext_ann_pq_rerank",
    # round-6 addition: TPC-H Q9 over the derived partsupp — the dossier's
    # heaviest join tree (6 tables, composite two-column shuffle key)
    "ext_tpch_q9",
]

# BASELINE.md Fig. 10: reference preprocess ≈ 90 s per 100 MB raw JSON.
BASELINE_MB_PER_SEC = 100.0 / 90.0

REPO = os.path.dirname(os.path.abspath(__file__))
BENCH_DIR = os.path.join(REPO, ".bench")


def force(df) -> None:
    """Materialize every column of every row (noop sink — no driver transfer,
    no output files, no column-decode shortcuts)."""
    df.write.format("noop").mode("overwrite").save()


# raw per-trial timings of every regression-tracked entry (headline AND
# served since r10), recorded in the artifact so a flagged "regression" can
# be adjudicated as noise (trial spread) vs plan change without re-running
# on an idle machine — BENCH_r04 recorded three phantom regressions
# precisely because the served entries were single-shot, and six of seven
# r9 closing runs were discarded because headline entries carried no spread
# information at all
SERVED_TRIALS: dict[str, list[float]] = {}

# rerun thunk per timed entry — lets the end-of-run flag RECHECK re-measure
# exactly what the original timing measured (headline, served, bucketed all
# flow through timed_min)
RERUN: dict[str, object] = {}

# run-scoped contexts (the HTTP bench's live server) kept open so RERUN
# thunks still work at recheck time; closed when the process exits
import contextlib as _contextlib

_HTTP_STACK = _contextlib.ExitStack()
import atexit as _atexit

_atexit.register(_HTTP_STACK.close)


def timed_min(
    name: str,
    fn,
    trials: int = 2,
    max_trials: int = 3,
    spread: float = 1.3,
    pre=None,
) -> float:
    """Min-of-N timed runs of ``fn`` (the bench's standard policy — the
    per-query loop in main() routes through this too); raw trials recorded
    in SERVED_TRIALS for the artifact. When the first ``trials`` runs
    disagree by more than ``spread`` (max/min), escalate one extra trial up
    to ``max_trials`` — a noisy-neighbor spike on a single trial then gets
    a third chance at a quiet window instead of inflating the recorded min
    (VERDICT r9 #2: best-of-N INSIDE one run, so a noisy host doesn't cost
    the whole run).

    ``pre``: run OUTSIDE the timed region before every trial. The headline
    loop passes the scoped-cache release (VERDICT r11 #1/#3 cold-trial
    accounting): a query whose plan registers ``persist_scoped`` caches
    rebuilds them in every trial, so min-of-N records the reproducible COLD
    cost — pre-r12 trial 2 read trial 1's still-registered cache blocks and
    the recorded min measured a cache read, not the query. The RERUN thunk
    folds ``pre`` in (the unpersist of a dropped generation is microseconds)
    so flag rechecks re-measure the same cold cost."""

    def one() -> float:
        if pre is not None:
            pre()
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 3)

    ts = [one() for _ in range(trials)]
    while (
        len(ts) < max_trials
        and min(ts) > 0
        and max(ts) / min(ts) > spread
    ):
        ts.append(one())
    SERVED_TRIALS[name] = ts
    RERUN[name] = fn if pre is None else (lambda: (pre(), fn()))
    return min(ts)


def bench_bm25_served(spark, sf_dir: str) -> float:
    """q20's served deployment shape: BM25 against the token-bucketed on-disk
    index (write_index), where the per-request cost is posting-list reads —
    the in-session index build that dominates headline q20 is paid once at
    index time. Index cached under .bench/ per sf."""
    from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
    from job_search_engine_using_pyspark_solar_and_angular_spark.search.bm25 import (
        bm25_search,
    )
    from job_search_engine_using_pyspark_solar_and_angular_spark.search.index import (
        build_index,
        read_index,
        write_index,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(BENCH_DIR, f"index_{sf_tag}")
    table = f"jse_bench_postings_{sf_tag.replace('.', '_')}"
    try:
        idx = read_index(spark, base, table=table)
        idx.postings.first()  # metastore + files both present?
    except Exception:
        built = build_index(load_table(spark, sf_dir, "documents"), cache=True)
        write_index(built, base, table=table)
        idx = read_index(spark, base, table=table)
    force(bm25_search(spark, idx, ["spark", "join"], 10))  # warm scan
    return timed_min(
        "q20_bm25_served",
        lambda: force(bm25_search(spark, idx, ["spark", "join"], 10)),
    )


def bench_http_served(spark, sf_dir: str) -> float:
    """End-to-end HTTP request latency for the reference's /api/search/query
    route (search/http_server.py): socket in → BM25 against the on-disk
    bucketed index → doc rows joined back → broadcast user join → envelope
    JSON out. Reuses bench_bm25_served's cached index, so the delta over
    q20_bm25_served is the doc/user join-back + k-row marshaling + HTTP —
    the full serving stack the Angular client sees."""
    import json as _json
    import urllib.request

    from pyspark.sql import functions as F

    from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
    from job_search_engine_using_pyspark_solar_and_angular_spark.search.http_server import (
        SearchService,
        serve,
    )
    from job_search_engine_using_pyspark_solar_and_angular_spark.search.index import (
        read_index,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(BENCH_DIR, f"index_{sf_tag}")
    table = f"jse_bench_postings_{sf_tag.replace('.', '_')}"
    idx = read_index(spark, base, table=table)  # built by bench_bm25_served
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "owner", (F.col("doc_id") % 100) + 1
    )
    users = load_table(spark, sf_dir, "customer")
    svc = SearchService(
        spark, idx, docs, users=users, doc_user_key=("owner", "c_custkey")
    )
    # the serve context stays open until process exit (contextlib.ExitStack
    # closed in main's finally / atexit): the RERUN thunk must hit the SAME
    # live server at flag-recheck time — pre-r10 this was the one entry the
    # recheck could not re-measure, and it kept a phantom flag on every
    # noisy-host run
    handle = _HTTP_STACK.enter_context(serve(svc))
    url = handle.url + "/api/search/query?query=spark%20join"

    def one() -> None:
        with urllib.request.urlopen(url, timeout=300) as resp:
            body = _json.loads(resp.read())
        assert body["status_code"] == 200 and body["count"] > 0

    one()  # warm (index relation resolution + codegen)
    return timed_min("http_query_served", one)


def bench_ann_served(spark, sf_dir: str) -> float:
    """The served ANN deployment shape beside q20_bm25_served: integer-LSH
    query against the on-disk bucket-partitioned vector index (dynamic
    partition pruning = one bucket's files per query). Index cached under
    .bench/ per sf."""
    from pyspark.sql import functions as F

    from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
    from job_search_engine_using_pyspark_solar_and_angular_spark.operators.similarity import (
        ann_lsh_quantized_served,
        write_vector_index_int8,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    # cache key carries the build parameters: a default change in
    # write_vector_index_int8 must miss the cache, never silently bench a
    # stale index built by older code
    import inspect

    sig = inspect.signature(write_vector_index_int8)
    planes = sig.parameters["num_planes"].default
    dim = sig.parameters["dim"].default
    path = os.path.join(BENCH_DIR, f"vecidx_{sf_tag}_p{planes}_d{dim}")
    emb = load_table(spark, sf_dir, "embeddings")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_vector_index_int8(emb.filter(F.col("vec_id") != 0), path)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    force(ann_lsh_quantized_served(spark, path, q, k=5))  # warm
    return timed_min(
        "ann_lsh_served",
        lambda: force(ann_lsh_quantized_served(spark, path, q, k=5)),
    )


def bench_ann_pq_served(spark, sf_dir: str) -> float:
    """The IVFPQ served deployment shape beside ann_lsh_served_vec: ADC
    query against the on-disk PQ index — driver-side LUT from the bounded
    stats/codebook components, static partition pruning to the probe
    buckets, m table lookups per candidate (embeddings never read).

    r7 measurement change (mirrors ann_lsh_served_vec's contract): queries
    run against a PRE-RESOLVED PQIndexHandle — meta/stats/codebook
    collected and the codes relation resolved ONCE per index generation,
    as a serving loop actually operates. The old per-call shape re-ran 3
    driver collects + a fresh parquet resolution per query (~1.2 s fixed
    cost at sf0.1 — the r6 'slowest serving entry' was mostly that, not
    ADC). The handle resolution cost is paid in the warm call, outside
    the timed region, exactly like ann_lsh_served_vec's 'resolve + list
    once'. Index cached under .bench/ per sf."""
    from pyspark.sql import functions as F

    from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
    from job_search_engine_using_pyspark_solar_and_angular_spark.operators.similarity import (
        ann_pq_served,
        resolve_pq_index,
        write_vector_index_pq,
    )

    import inspect

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    # cache key carries the build parameters, and the persisted meta row is
    # verified against the current defaults before reuse — a default or
    # layout change in write_vector_index_pq must rebuild, never silently
    # bench a stale index written by older code
    sig = inspect.signature(write_vector_index_pq)
    params = {
        k: sig.parameters[k].default for k in ("m", "ksub", "dim", "num_planes")
    }
    tag = "_".join(f"{k}{v}" for k, v in sorted(params.items()))
    path = os.path.join(BENCH_DIR, f"pqidx_{sf_tag}_{tag}")
    emb = load_table(spark, sf_dir, "embeddings")

    def _cache_valid() -> bool:
        if not (
            os.path.exists(os.path.join(path, "codes", "_SUCCESS"))
            and os.path.exists(os.path.join(path, "meta", "_SUCCESS"))
        ):
            return False
        try:
            meta = spark.read.parquet(f"{path}/meta").collect()[0]
            return all(meta[k] == v for k, v in params.items())
        except Exception:
            # torn/empty/old-layout meta: self-heal by rebuilding, never
            # abort the bench (matching the stated cache contract)
            return False

    if not _cache_valid():
        shutil.rmtree(path, ignore_errors=True)
        write_vector_index_pq(emb.filter(F.col("vec_id") != 0), path)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    handle = resolve_pq_index(spark, path)  # once per index generation
    force(ann_pq_served(spark, handle, qv, k=5))  # warm
    return timed_min(
        "ann_pq_served", lambda: force(ann_pq_served(spark, handle, qv, k=5))
    )


def bench_ann_served_vec(spark, sf_dir: str) -> float:
    """The REQUEST-path twin of ann_lsh_served: query arrives as a vector,
    probe selection is driver-side integer arithmetic, pruning is STATIC
    partition elimination against a pre-resolved index relation (the
    steady-state serving shape — see ann_lsh_served_vec). ann_lsh_served
    keeps measuring the DataFrame/DPP path for round-over-round
    comparability; this entry is what a serving deployment actually pays
    per query."""
    import inspect

    from pyspark.sql import functions as F

    from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
    from job_search_engine_using_pyspark_solar_and_angular_spark.operators.similarity import (
        ann_lsh_served_vec,
        write_vector_index_int8,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    sig = inspect.signature(write_vector_index_int8)
    planes = sig.parameters["num_planes"].default
    dim = sig.parameters["dim"].default
    path = os.path.join(BENCH_DIR, f"vecidx_{sf_tag}_p{planes}_d{dim}")
    emb = load_table(spark, sf_dir, "embeddings")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_vector_index_int8(emb.filter(F.col("vec_id") != 0), path)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    idx_df = spark.read.parquet(path)

    def one() -> None:
        force(ann_lsh_served_vec(spark, idx_df, qv, k=5, num_planes=planes))

    one()  # resolve + list the relation once
    return timed_min("ann_lsh_served_vec", one)


def bench_ann_served_1m(spark) -> float:
    """Steady-state served-ANN latency at the 1M-vector replication probe
    (sf0.1 embeddings x500, corpus-auto-sized planes -> 1024 bucket
    partitions): static-probe multiprobe query against a PRE-RESOLVED
    index relation — the serving deployment shape (resolve once per index
    generation, serve many queries; a fresh read pays ~1.2-3.3 s of
    partition discovery instead). Index build (~250 s) is one-time and
    cached under .bench/ keyed on (reps, planes)."""
    import sys as _sys

    from pyspark.sql import functions as F

    from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
    from job_search_engine_using_pyspark_solar_and_angular_spark.operators import (
        similarity,
    )

    _sys.path.insert(0, os.path.join(REPO, "tools"))
    import probe_ann_scale

    reps = 500
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    n = base.count() * reps
    planes = similarity.planes_for_corpus(n, target_bucket=1024)
    path = os.path.join(BENCH_DIR, f"vecidx_probe_r{reps}_p{planes}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        corpus = probe_ann_scale.replicated_embeddings(
            spark, "/root/testdata/sf0.1", reps
        ).filter(F.col("vec_id") != 0)
        similarity.write_vector_index_int8(corpus, path, num_planes=planes)
    qv = [float(x) for x in base.filter(F.col("vec_id") == 0).first()["embedding"]]
    idx_df = spark.read.parquet(path)

    def one() -> None:
        force(
            similarity.ann_lsh_served_vec(
                spark, idx_df, qv, k=5, num_planes=planes, multiprobe=True
            )
        )

    one()  # resolve + list the relation once (the per-generation cost)
    return timed_min("ann_lsh_served_1m", one)


def bench_preprocess_scaled(
    spark, target_mb: int = 120, tag: str = "", hot_pct: int = 0, runs: int = 2
) -> dict:
    from job_search_engine_using_pyspark_solar_and_angular_spark.plans.preprocess import (
        preprocess,
        write_outputs,
    )
    from job_search_engine_using_pyspark_solar_and_angular_spark.sources.synthetic import (
        scaled_tweet_corpus,
        tweets_from_documents,
    )

    corpus_dir = os.path.join(BENCH_DIR, f"tweets_json{tag}")
    path, size_mb = scaled_tweet_corpus(
        spark, "/root/testdata/sf0.1", corpus_dir, target_mb=target_mb, hot_pct=hot_pct
    )
    # explicit schema: taken from the generator's plan, not inferred per-file
    # (the reference re-infers per file — one of its measured costs; a fixed
    # ingest schema is the engine's contract, SURVEY.md §1.2)
    schema = tweets_from_documents(
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
            "doc_id", "text"
        )
    ).schema

    out_parquet = os.path.join(BENCH_DIR, f"out_parquet{tag}")
    out_csv = os.path.join(BENCH_DIR, f"out_csv{tag}")
    # raw trials + per-sink stage walls recorded per run (VERDICT r10 #2:
    # the 10 GB entry was one opaque sample with no trials/recheck
    # protection — the 116.9->95.6->76.5 MB/s committed-artifact trend was
    # unattributable); stages make compute vs output-IO visible per trial
    sec = float("inf")
    trials: list[float] = []
    stage_trials: list[dict] = []
    best_stages: dict = {}
    for _ in range(runs):  # min-of-runs, same policy as the per-query timings
        stages: dict = {}
        t0 = time.perf_counter()
        raw = spark.read.schema(schema).json(path)
        result = preprocess(raw)
        write_outputs(result, out_parquet, out_csv, stage_times=stages)
        trial = round(time.perf_counter() - t0, 3)
        trials.append(trial)
        stage_trials.append(stages)
        if trial < sec:
            sec, best_stages = trial, stages
        shutil.rmtree(out_parquet, ignore_errors=True)
        shutil.rmtree(out_csv, ignore_errors=True)
    mb_per_sec = round(size_mb / sec, 2)
    return {
        "input_mb": size_mb,
        "sec": sec,
        "mb_per_sec": mb_per_sec,
        "trials": trials,
        "stages": best_stages,
        "stage_trials": stage_trials,
        "baseline_mb_per_sec": round(BASELINE_MB_PER_SEC, 2),
        "speedup_vs_baseline": round(mb_per_sec / BASELINE_MB_PER_SEC, 1),
    }


def bench_streaming_ingest(spark) -> dict:
    """Structured-Streaming form of the reference's collector -> preprocess
    loop (S1/§2.11: tweepy listener + per-epoch batch loop,
    ``DataCollector.py:19-64`` + ``Tweets_preprocessing.py:605-621``): the
    same ~124 MB JSONL corpus consumed as a file-source STREAM in
    maxFilesPerTrigger micro-batches, each batch run through the full
    preprocess plan (flatten -> dedup -> filter) in foreachBatch and fully
    materialized (noop write, same policy as the per-query timings).
    Reports end-to-end MB/s across all micro-batches — the figure that
    shows what the continuously-running ingest loop sustains, checkpoint
    and trigger overhead included (one timed pass; the corpus and schema
    are the cached ones the batch probe uses).

    maxFilesPerTrigger=8 (~32 MB/batch, 4 micro-batches): the r5 profile
    measured per-batch cost ~0.95 s nearly FLAT from 16 MB to 63 MB
    batches — fixed per-job cost (task launch, stage scheduling, reader
    setup) dominates at this volume while trigger/commit overhead is only
    ~0.1 s/batch — so halving the batch count at mFPT=4 was paying double
    the fixed cost for no freshness a 124 MB corpus needs (measured 14.4
    vs 26-28 MB/s warm). At production volume the same rule applies as a
    rate: size the trigger so per-batch data work dominates the ~1 s fixed
    job cost."""
    from job_search_engine_using_pyspark_solar_and_angular_spark.plans.preprocess import (
        preprocess,
    )
    from job_search_engine_using_pyspark_solar_and_angular_spark.sources.synthetic import (
        scaled_tweet_corpus,
        tweets_from_documents,
    )

    corpus_dir = os.path.join(BENCH_DIR, "tweets_json")
    path, size_mb = scaled_tweet_corpus(
        spark, "/root/testdata/sf0.1", corpus_dir, target_mb=120
    )
    schema = tweets_from_documents(
        spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
            "doc_id", "text"
        )
    ).schema
    # min-of-2 full stream replays (fresh checkpoint each), same policy as
    # every other entry: the r4 driver artifact showed this entry at 1/3 of
    # its idle throughput purely from machine load on a single-shot run
    sec, n_batches = float("inf"), 0
    for trial in (1, 2):
        ck = os.path.join(BENCH_DIR, f"stream_ingest_ck{trial}")
        shutil.rmtree(ck, ignore_errors=True)
        batches = []

        def _sink(batch, batch_id):
            force(preprocess(batch))
            batches.append(batch_id)

        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 8)
            .json(path)
        )
        t0 = time.perf_counter()
        q = (
            raw.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        trial_sec = round(time.perf_counter() - t0, 3)
        SERVED_TRIALS.setdefault("streaming_ingest", []).append(trial_sec)
        shutil.rmtree(ck, ignore_errors=True)
        if trial_sec < sec:
            sec, n_batches = trial_sec, len(batches)
    return {
        "input_mb": size_mb,
        "sec": sec,
        "mb_per_sec": round(size_mb / sec, 2),
        "n_batches": n_batches,
        "baseline_mb_per_sec": round(BASELINE_MB_PER_SEC, 2),
        "speedup_vs_baseline": round(size_mb / sec / BASELINE_MB_PER_SEC, 1),
    }


def bench_served_refresh(spark, sf_dir: str) -> float:
    """Per-micro-batch cost of the FULL serve loop (search/serve_loop.py:
    dedup gate vs corpus LSH buckets -> fresh postings segment -> stats +
    tombstones -> vector segment -> manifest publish) against corpus-sized
    serving state. Bootstrap (segment 1 = the whole documents table) is
    excluded — the reported figure is min-of-2 over successive ~200-doc
    delta batches (half genuinely new, half near-dup arrivals the gate
    suppresses), i.e. what a production re-index pays per batch."""
    from pyspark.sql import functions as F

    from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
    from job_search_engine_using_pyspark_solar_and_angular_spark.search import (
        serve_loop,
    )

    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    base = os.path.join(BENCH_DIR, f"serving_{sf_tag}")
    shutil.rmtree(base, ignore_errors=True)  # fresh serving state per run
    prefix = f"jse_serve_{sf_tag.replace('.', '_')}"

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    corpus = docs.join(emb, "doc_id", "left")
    serve_loop.serve_batch(spark, corpus, base, prefix, vec_col="embedding")

    best = float("inf")
    for i in (1, 2):
        fresh = corpus.filter(F.col("doc_id") % 50 == i).select(
            (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
            F.format_string(
                "fresh arrival %d engine refresh batch %d unique body %d",
                F.col("doc_id"), F.lit(i), F.col("doc_id") + F.lit(7 * i),
            ).alias("text"),
            "embedding",
        )
        dups = corpus.filter(F.col("doc_id") % 50 == 10 + i).select(
            (F.col("doc_id") + 2_000_000 * i).alias("doc_id"), "text", "embedding"
        )
        batch = fresh.unionByName(dups)
        t0 = time.perf_counter()
        serve_loop.serve_batch(spark, batch, base, prefix, vec_col="embedding")
        trial = round(time.perf_counter() - t0, 3)
        SERVED_TRIALS.setdefault("served_refresh", []).append(trial)
        best = min(best, trial)
    return round(best, 3)


def bench_bucketed_layout(spark, sf_dir: str) -> dict:
    """The prescribed fact layout (DEPLOY.md), measured in the driver-visible
    artifact (VERDICT r8 #2): lineitem bucket-sorted on l_orderkey and orders
    on o_orderkey (same bucket count) run BOTH heavy orderkey workloads —
    Q18's grouped-fact HAVING agg + join and Q21's fact⋈fact ladder — off the
    layout. The bucketed pair is written once per sf and cached under
    .bench/ (the one-time layout cost is recorded when paid); each query's
    result is asserted identical to the unbucketed plan and the bucketed
    Exchange counts are asserted at the shuffle-free caps the CI plan pin
    uses (Q18 ≤1: only the final ORDER BY; Q21 ≤2: the few-row supplier
    tail) before timing."""
    from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table
    from tools.probe_q18_bucketed import (
        BUCKETS,
        ensure_bucketed_pair,
        exchange_count,
        q18_plan,
        q21_plan,
    )
    from pyspark.sql import functions as F

    tag = os.path.basename(sf_dir.rstrip("/"))
    bdir = os.path.join(BENCH_DIR, f"bucketed_bench_{tag}")
    safe = tag.replace(".", "_")
    li_name, o_name = f"jse_li_bench_{safe}", f"jse_o_bench_{safe}"
    # ONE owner of the layout-write + DDL re-attach sequence (the probe's
    # helper) — the marker fingerprints source row counts, so regenerated
    # testdata triggers a rewrite instead of a stale-layout assert abort
    bucket_write_sec = ensure_bucketed_pair(
        spark,
        lambda: load_table(spark, sf_dir, "lineitem"),
        lambda: load_table(spark, sf_dir, "orders"),
        bdir, li_name, o_name,
    )

    li, o = load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "orders")
    c, s = load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "supplier")
    lib, ob = spark.table(li_name), spark.table(o_name)

    out: dict = {"buckets": BUCKETS, "bucket_write_sec": bucket_write_sec}
    cases = {
        "ext_tpch_q18": (
            lambda: q18_plan(li, o, c),
            lambda: q18_plan(lib, ob, c),
            1,
            lambda df: df.agg(
                F.count("*").alias("n"),
                F.sum(F.col("c_custkey") + F.col("o_orderkey")).alias("s"),
            ).first(),
        ),
        "ext_tpch_q21": (
            lambda: q21_plan(li, o, s),
            lambda: q21_plan(lib, ob, s),
            2,
            lambda df: tuple(sorted(map(tuple, df.collect()))),
        ),
    }
    for qname, (mk_unb, mk_b, cap, chk) in cases.items():
        unb, b = mk_unb(), mk_b()
        assert chk(unb) == chk(b), f"{qname}: bucketed result differs"
        xb = exchange_count(b)
        assert xb <= cap, f"{qname}: bucketed plan has {xb} Exchanges (cap {cap})"
        out[qname] = {
            "unbucketed_sec": timed_min(
                f"{qname}_unbucketed", lambda: force(mk_unb())
            ),
            "bucketed_sec": timed_min(f"{qname}_bucketed", lambda: force(mk_b())),
            "unbucketed_exchanges": exchange_count(unb),
            "bucketed_exchanges": xb,
        }
        out[qname]["speedup"] = round(
            out[qname]["unbucketed_sec"] / max(out[qname]["bucketed_sec"], 1e-9), 2
        )
    return out


# Deliberate cost increases, annotated so the artifact explains itself when
# the guard flags them (the r4 precedent: ext_multimodal_features 0.45->0.83
# was the honest price of real pixel decode). Entries are NOT suppressed —
# the ratio still appears; the reason rides along.
ACCEPTED_REGRESSIONS = {
    "ext_ann_pq": "r6: PQ m 8->16 + ksub 16->32 — encode work x4 (corpus x "
    "m x ksub sub-distances); rerank recall@5 q0 went 0.8/0.6 -> 1.0/0.8 at "
    "sf0.01/0.1 (4-query mean 0.95/0.90); m=8 subspaces were the bottleneck",
    "ext_ann_pq_rerank": "r6: same m 8->16 + ksub 16->32 recall fix; "
    "shortlist stays 100",
    "ann_pq_served": "r6: ADC now does m=16 lookups per candidate instead "
    "of 8 (the served cost of the recall fix; codes still 16 bytes/vector)",
    "ann_lsh_served": "r5: Hamming-1 multiprobe is the served default now "
    "(single-bucket measured recall 0.0 at sf0.01) — 5 of 16 partitions "
    "read instead of 1",
}


def host_calibration(runs: int = 3) -> float:
    """Fixed synthetic CPU kernel — a machine-speed constant emitted into
    every artifact (``host_calib_sec``) so cross-round query ratios can be
    normalized for host speed mechanically (r6's ~1.4x-slower-host
    adjudication was manual archaeology; VERDICT r6 #8). The kernel mixes
    a BLAS-threaded matmul and single-core sha256 over fixed-seed data —
    deterministic work, min-of-N wall time. It measures the HOST, not
    Spark: no session, no data dependence, ~0.3 s."""
    import hashlib

    import numpy as np

    rng = np.random.RandomState(7)
    a = rng.rand(512, 512)
    buf = rng.bytes(32 * 1024 * 1024)
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        m = a
        for _ in range(48):
            m = m @ a
            m /= m[0, 0]  # renormalize: keeps 48 chained matmuls finite
        h = hashlib.sha256()
        for _ in range(6):
            h.update(buf)
        h.digest()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def _timings_from_tail(tail: str) -> dict[str, float]:
    """Reconstruct per-query timings from a driver artifact's ``tail``
    string (truncated raw stdout). The tail survives truncation from the
    END, so the ``queries`` dict — printed early in the JSON line — is the
    part most likely present. We extract every flat ``"name": number``
    pair; lookups are restricted to the caller's current query names, so
    numeric keys from nested blocks (``sec``, ``input_mb``...) are inert."""
    import re

    out: dict[str, float] = {}
    for m in re.finditer(r'"([A-Za-z0-9_]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)', tail):
        # first occurrence wins: a query name appears once in the queries
        # dict; later duplicates would come from unrelated nested blocks
        out.setdefault(m.group(1), float(m.group(2)))
    return out


def _round_artifact_timings(
    repo_dir: str,
) -> tuple[dict, str, float | None, dict]:
    """Timings (+ calibration, when present) from the newest
    ``BENCH_r{N}.json`` driver artifact — its ``queries`` dict when the
    driver parsed the stdout line, else reconstructed from the ``tail``
    string (driver artifacts r4/r5 carry ``"parsed": null`` and a
    truncated tail, which is why ``doc.get("parsed", {})`` alone fails
    open — the key EXISTS with value None, so ``.get`` on it raises
    AttributeError). Returns ({}, "none", None, {}) when nothing usable.
    The 4th element is baseline meta: ``calib_kind`` ("min_pair" when the
    baseline's calibration is the r9+ min(pre, post) sandwich, "single"
    when it is a lone pre-r9 end-of-run sample — ADVICE r9: compare
    like-for-like) and ``trials`` (per-query raw trial lists, when the
    baseline carries them)."""
    import glob
    import re

    prior_files = sorted(
        glob.glob(os.path.join(repo_dir, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1)),
    )
    if not prior_files:
        return {}, "none", None, {}
    try:
        with open(prior_files[-1], encoding="utf-8") as fh:
            doc = json.load(fh)
    except (OSError, ValueError):
        return {}, "none", None, {}
    parsed = doc.get("parsed") or {}
    tail = str(doc.get("tail") or "")
    prev = (
        doc.get("queries")
        or parsed.get("queries")
        or _timings_from_tail(tail)
        or {}
    )
    calib = (
        doc.get("host_calib_sec")
        or parsed.get("host_calib_sec")
        # the tail fallback surfaces flat "host_calib_sec": N pairs too
        or prev.get("host_calib_sec")
    )
    prev.pop("host_calib_sec", None)
    meta = {
        # r9+ artifacts carry host_calib_samples alongside the min; its
        # presence (even in a truncated tail) marks the sandwich kind
        "calib_kind": (
            "min_pair"
            if (
                doc.get("host_calib_samples")
                or parsed.get("host_calib_samples")
                or '"host_calib_samples"' in tail
            )
            else "single"
        ),
        "trials": doc.get("served_trials") or parsed.get("served_trials") or {},
    }
    return prev, os.path.basename(prior_files[-1]), calib, meta


def _previous_timings(
    repo_dir: str, bench_dir: str
) -> tuple[dict, str, float | None, dict]:
    """PRIMARY baseline for the regression guard, by reliability:
    1. ``.bench/last_full.json`` — this builder's own prior full run
       (complete, untruncated; written by every full-sf main() run);
    2. the newest driver artifact (see _round_artifact_timings).
    Returns (timings, source_label, host_calib_sec|None, meta) — meta as
    in _round_artifact_timings."""
    own = os.path.join(bench_dir, "last_full.json")
    if os.path.isfile(own):
        try:
            with open(own, encoding="utf-8") as fh:
                doc = json.load(fh)
            prev = doc.get("queries") or {}
            if prev:
                meta = {
                    "calib_kind": (
                        "min_pair" if doc.get("host_calib_samples") else "single"
                    ),
                    "trials": doc.get("served_trials") or {},
                }
                return prev, "last_full.json", doc.get("host_calib_sec"), meta
        except (OSError, ValueError):
            pass
    return _round_artifact_timings(repo_dir)


def _flag_slowdowns(
    timings: dict[str, float],
    prev: dict,
    host_factor: float | None,
    prev_trials: dict | None = None,
) -> tuple[dict, int, dict]:
    """Flag >1.5x slowdowns of ``timings`` vs ``prev``. ``host_factor`` is
    cur_calib/prev_calib when both runs carried a calibration kernel time:
    each flag then also records ``host_adj_ratio`` (raw ratio divided by
    the host factor), and a slowdown is flagged when EITHER ratio exceeds
    1.5 — the adjusted one catches a real regression a faster host would
    mask.

    Noise absorption (VERDICT r9 #2 — back-to-back runs on a noisy host
    must not need human adjudication): a would-be flag moves to the third
    returned dict (absorbed) instead of the first (counted flags) when the
    artifact itself explains it as noise —

    - ``host_adjusted_clean``: calibration exists on both sides and the
      host-adjusted ratio is <=1.5 (uniform host load, not a plan change);
    - ``within_prev_trial_spread``: the baseline recorded raw trials for
      this query and the current min lies inside the baseline's own trial
      range (+5%) — the "regression" is the baseline having gotten a lucky
      min, not this run getting slower.

    A real plan regression survives both tests: it moves EVERY trial past
    the baseline's worst trial, and no host factor explains it."""
    flags: dict = {}
    absorbed: dict = {}
    compared = 0
    for name, cur in timings.items():
        p = prev.get(name)
        if p and p > 0:
            compared += 1
            ratio = cur / p
            adj = ratio / host_factor if host_factor else None
            if ratio > 1.5 or (adj is not None and adj > 1.5):
                rec = {"prev": p, "cur": cur, "ratio": round(ratio, 2)}
                if adj is not None:
                    rec["host_adj_ratio"] = round(adj, 2)
                if name in ACCEPTED_REGRESSIONS:
                    rec["accepted"] = ACCEPTED_REGRESSIONS[name]
                p_trials = [
                    t for t in (prev_trials or {}).get(name) or [] if t > 0
                ]
                if adj is not None and adj <= 1.5:
                    rec["absorbed"] = "host_adjusted_clean"
                    absorbed[name] = rec
                elif (
                    p_trials
                    and cur <= max(p_trials) * 1.05
                    # guard against pre-fix baselines whose recorded min was
                    # recheck-folded BELOW its trials (ADVICE r10): trials
                    # inconsistent with the recorded min mean the spread is
                    # burst-inflated — do not absorb against it
                    and p >= min(p_trials)
                ):
                    rec["absorbed"] = "within_prev_trial_spread"
                    absorbed[name] = rec
                else:
                    flags[name] = rec
    return flags, compared, absorbed


def regressions_vs_previous(
    timings: dict[str, float],
    repo_dir: str = REPO,
    bench_dir: str = BENCH_DIR,
    host_calib_sec: float | None = None,
    host_calib_samples: dict | None = None,
) -> dict:
    """Per-query regression guard: compare this run to the best available
    prior run (see _previous_timings) on the common query set and flag
    >1.5x slowdowns — so a methodology-vs-regression question is answered
    by the artifact itself, not by archaeology. The result always carries
    a ``_baseline`` key naming the comparison source, so an empty flag set
    is distinguishable from a guard that had nothing to compare against
    (the r5 fail-open: parsed:null made {} the only possible output).

    Two anti-creep mechanisms (ADVICE r6 / VERDICT r6 #8):

    - ``_round_anchor``: when the primary baseline is the builder's own
      ``last_full.json``, ratios vs the newest DRIVER artifact are
      recorded alongside — the primary otherwise ratchets (each run
      overwrites it, so a <=1.5x-per-run creep compounds invisibly
      across rounds; the round artifact is the fixed anchor).
    - host calibration: when both runs carry ``host_calib_sec``, each
      flag records a host-speed-adjusted ratio and flagging considers
      both (a slower host no longer reads as a uniform regression, and a
      faster host no longer masks one)."""
    prev, source, prev_calib, meta = _previous_timings(repo_dir, bench_dir)

    def _cur_calib(baseline_meta: dict) -> float | None:
        # like-for-like (ADVICE r9): a pre-r9 baseline's calibration is one
        # end-of-run sample — compare it to THIS run's post sample, not the
        # min(pre, post) sandwich, else host_factor is biased low
        if (
            baseline_meta.get("calib_kind") == "single"
            and host_calib_samples
            and host_calib_samples.get("post")
        ):
            return host_calib_samples["post"]
        return host_calib_sec

    cur_calib = _cur_calib(meta)
    host_factor = cur_calib / prev_calib if cur_calib and prev_calib else None
    flags, compared, absorbed = _flag_slowdowns(
        timings, prev, host_factor, prev_trials=meta.get("trials")
    )
    out: dict = {"_baseline": source, "_compared": compared, **flags}
    if absorbed:
        out["_noise_absorbed"] = absorbed
    if host_factor is not None:
        out["_host_factor"] = round(host_factor, 3)
    if source == "last_full.json":
        a_prev, a_source, a_calib, a_meta = _round_artifact_timings(repo_dir)
        if a_prev:
            a_cur_calib = _cur_calib(a_meta)
            a_factor = (
                a_cur_calib / a_calib if a_cur_calib and a_calib else None
            )
            a_flags, a_compared, a_absorbed = _flag_slowdowns(
                timings, a_prev, a_factor, prev_trials=a_meta.get("trials")
            )
            out["_round_anchor"] = {
                "source": a_source,
                "compared": a_compared,
                "flags": a_flags,
            }
            if a_absorbed:
                out["_round_anchor"]["noise_absorbed"] = a_absorbed
            if a_factor is not None:
                out["_round_anchor"]["host_factor"] = round(a_factor, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # calibration sample BEFORE any Spark work: a straggling JVM thread
    # (stream cleanup, GC) can inflate the end-of-run sample — a poisoned
    # calib in last_full.json then mis-adjusts EVERY next-run ratio (one
    # r9 run recorded 1.37 vs the true ~0.28 and produced 67 false
    # host-adjusted flags). The artifact keeps min(pre, post) plus both
    # samples so an anomaly is visible instead of silently absorbed.
    calib_pre = host_calibration()
    spark = get_spark(app_name="jse-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen paths AND the Python worker pool once so per-query
    # numbers measure the plan, not first-call JIT / worker-spawn (standard
    # benchmark practice; warmup at tiny sf).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        force(QUERIES["q11_agg_tpch_q1"](spark, warm_dir))
        force(QUERIES["q20_bm25_search"](spark, warm_dir))
        QUERIES["ext_multimodal_features"](spark, warm_dir).count()

    # min of 2 trials per query (escalating to 3 when the trials disagree
    # by >1.3x — see timed_min): first-trial numbers fold in per-plan
    # codegen compile and page-cache state; the min is the reproducible
    # figure (standard steady-state practice; every trial runs the full
    # plan). Raw trials land in the artifact's served_trials so a flagged
    # slowdown is adjudicable from the artifact alone.
    # cold-trial accounting (VERDICT r11 #1/#3): each trial starts with the
    # query's scoped-cache generation RELEASED, so every trial pays the full
    # cold plan (persist fills included) and the recorded min is the honest
    # per-run cost. Queries that registered a scoped cache are listed in the
    # artifact's ``scoped_cache_queries`` — the warm-capable set whose
    # steady-state rerun cost is lower than the recorded cold number.
    from job_search_engine_using_pyspark_solar_and_angular_spark.queries.declared import (
        release_query_caches,
    )

    timings: dict[str, float] = {}
    warm_capable: list[str] = []
    for name in HEADLINE:
        timings[name] = timed_min(
            name,
            lambda n=name: force(QUERIES[n](spark, sf_dir)),
            pre=lambda n=name: release_query_caches(n),
        )
        if release_query_caches(name):
            warm_capable.append(name)

    timings["q20_bm25_served"] = bench_bm25_served(spark, sf_dir)
    timings["http_query_served"] = bench_http_served(spark, sf_dir)
    timings["ann_lsh_served"] = bench_ann_served(spark, sf_dir)
    timings["ann_lsh_served_vec"] = bench_ann_served_vec(spark, sf_dir)
    timings["ann_pq_served"] = bench_ann_pq_served(spark, sf_dir)
    if sf_dir.rstrip("/").endswith("sf0.1"):
        # the 1M-vector replication probe only makes sense at the full
        # bench scale (its index replicates the sf0.1 corpus)
        timings["ann_lsh_served_1m"] = bench_ann_served_1m(spark)
    bucketed_layout = bench_bucketed_layout(spark, sf_dir)
    # the layout's query timings join the regression-tracked set under
    # stable names; the full record (exchanges, speedup, write cost) rides
    # in the artifact's bucketed_layout section
    timings["ext_tpch_q18_bucketed"] = bucketed_layout["ext_tpch_q18"]["bucketed_sec"]
    timings["ext_tpch_q21_bucketed"] = bucketed_layout["ext_tpch_q21"]["bucketed_sec"]
    served_refresh = bench_served_refresh(spark, sf_dir)
    streaming_ingest = bench_streaming_ingest(spark)
    scaled = bench_preprocess_scaled(spark)
    # sustained-throughput point: the same end-to-end job at ~1 GB (8x the
    # reference's measured volume) — the figure that shows per-job fixed
    # costs amortized, recorded in the artifact rather than claimed in prose
    scaled_1gb = bench_preprocess_scaled(spark, target_mb=1000, tag="_1gb")
    # skew stress (r3 verdict ask #4): same volume, ONE org_id holding ~10%
    # of all rows — the max_by dedup's map-side combine should keep this
    # within noise of the uniform run (ratio_vs_uniform ~1.0)
    skewed = bench_preprocess_scaled(spark, tag="_skew", hot_pct=10)
    skewed["ratio_vs_uniform"] = round(skewed["sec"] / scaled["sec"], 2)
    # sustained point past page-cache effects: ~10 GB, min-of-2 with
    # per-sink stage walls (VERDICT r10 #2: the single-sample form left the
    # committed 116.9->95.6->76.5 MB/s trend unattributable — trials +
    # stages give this entry the same noise protection every other number
    # has; the second run costs ~1 min now that the CSV sink reads back
    # the parquet instead of recomputing the pipeline)
    scaled_10gb = bench_preprocess_scaled(spark, target_mb=10_000, tag="_10gb", runs=2)

    total = round(sum(timings.values()), 3)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or "?"
    doc = {
        "metric": "headline query wall time (sum)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "served_refresh_sec": served_refresh,
        "streaming_ingest": streaming_ingest,
        "preprocess_scaled": scaled,
        "preprocess_scaled_1gb": scaled_1gb,
        "preprocess_skewed": skewed,
        "preprocess_scaled_10gb": scaled_10gb,
        "bucketed_layout": bucketed_layout,
        # raw per-trial served timings: lets a flagged regression be
        # adjudicated as noise (trial spread) vs plan change from the
        # artifact alone (r4 recorded three phantom regressions from
        # single-shot served timings)
        "served_trials": SERVED_TRIALS,
        # the warm-capable set (VERDICT r11 #3): these queries registered
        # persist_scoped caches, which the r12 cold-trial accounting
        # releases between trials — their recorded numbers are honest COLD
        # costs; a steady-state same-sf rerun (caches warm) is cheaper.
        "scoped_cache_queries": warm_capable,
    }
    calib_post = host_calibration()
    doc["host_calib_sec"] = min(calib_pre, calib_post)
    doc["host_calib_samples"] = {"pre": calib_pre, "post": calib_post}
    guard_kw = dict(
        host_calib_sec=doc["host_calib_sec"],
        host_calib_samples=doc["host_calib_samples"],
    )
    doc["regressions"] = regressions_vs_previous(timings, **guard_kw)
    # Flag RECHECK (VERDICT r9 #2): a noisy-neighbor burst inflates a
    # query's trials for as long as the burst lasts — trial escalation and
    # calibration can both miss it (the 1-thread calib kernel barely slows
    # under multi-core contention). So flags are re-MEASURED here, minutes
    # after the original run: re-run each flagged entry's exact thunk
    # (min-of-2 more trials, appended to the artifact's raw trials), fold
    # the new min into the timing, and recompute the guard. A passed burst
    # clears with a true quiet measurement; a real plan regression
    # reproduces and keeps its flag. Evidence, not thresholds.
    flagged = [
        k for k in doc["regressions"] if not k.startswith("_") and k in RERUN
    ]
    if flagged:
        rechecked = []
        recheck_trials: dict[str, list[float]] = {}
        for name in flagged:
            fn = RERUN[name]
            rts = []
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    fn()
                    rts.append(round(time.perf_counter() - t0, 3))
            except Exception:
                # thunk needs run-scoped context — keep the original
                # flag, trials tell why
                continue
            # recheck trials are recorded under their own key for the
            # adjudicator AND replace this entry's served_trials (ADVICE
            # r10 medium): keeping the burst-inflated originals as the
            # recorded spread would let the NEXT run's
            # within_prev_trial_spread absorption silently swallow a real
            # regression up to the burst magnitude (absorbed flags are
            # never rechecked). The folded min is prepended when it beats
            # the recheck trials so min(served_trials) always equals the
            # recorded timing.
            recheck_trials[name] = rts
            timings[name] = min(timings[name], *rts)
            SERVED_TRIALS[name] = (
                [timings[name]] + rts if timings[name] < min(rts) else list(rts)
            )
            rechecked.append(name)
        doc["recheck_trials"] = recheck_trials
        total = round(sum(timings.values()), 3)
        doc["value"] = total
        doc["queries"] = timings
        doc["regressions"] = regressions_vs_previous(timings, **guard_kw)
        doc["regressions"]["_rechecked"] = rechecked
    # Persist the complete artifact as the next run's primary regression
    # baseline: driver BENCH_r{N}.json files truncate stdout into ``tail``
    # with ``parsed: null``, so the builder's own full JSON is the only
    # guaranteed-complete comparison base. Written only for full sf0.1
    # runs — a quick sf0.01 iteration must not poison the baseline.
    if doc["sf"] == 0.1:
        os.makedirs(BENCH_DIR, exist_ok=True)
        with open(
            os.path.join(BENCH_DIR, "last_full.json"), "w", encoding="utf-8"
        ) as fh:
            json.dump(doc, fh)
    # The driver's BENCH artifact keeps only a bounded stdout TAIL (r1-r8:
    # "parsed": null because the single full-doc line overflows it), so emit
    # a COMPACT totals line first (VERDICT r8 #7) and again LAST — whichever
    # end a bounded capture keeps, it contains one complete parseable JSON
    # line with the headline numbers. The full doc stays on its own line and
    # in .bench/last_full.json.
    flags = {
        k: v
        for k, v in doc["regressions"].items()
        if not k.startswith("_")
    }
    summary = {
        "metric": doc["metric"],
        "value": total,
        "unit": "sec",
        "sf": doc["sf"],
        "queries_n": len(timings),
        # full per-query min timings ON the contract line (VERDICT r11 #2):
        # the driver's PERF comparison reads the one-line JSON, which until
        # r12 carried only totals + the slowest-8 — per-query
        # round-over-round status and geomean were impossible for two
        # rounds running. Same dict as the full artifact's ``queries``.
        "queries": timings,
        "slowest": dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:8]
        ),
        "preprocess_mb_per_sec": scaled["mb_per_sec"],
        "preprocess_10gb_mb_per_sec": scaled_10gb["mb_per_sec"],
        "streaming_mb_per_sec": streaming_ingest["mb_per_sec"],
        # keys deliberately NOT registry query names: _timings_from_tail
        # extracts flat "name": number pairs first-occurrence-wins from a
        # truncated tail, and a ratio under a real query name would poison
        # a tail-reconstructed regression baseline
        "bucketed_speedup": {
            q.replace("ext_tpch_", "") + "_speedup": bucketed_layout[q]["speedup"]
            for q in ("ext_tpch_q18", "ext_tpch_q21")
        },
        "regression_flags": len(flags),
        "host_calib_sec": doc["host_calib_sec"],
        "full_artifact": ".bench/last_full.json",
    }
    print(json.dumps(summary))
    print(json.dumps(doc))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
