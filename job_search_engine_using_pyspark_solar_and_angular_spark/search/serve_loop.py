"""The full streaming serve loop — the reference's production architecture
(``Main/SolrIndexer.java:25-45`` stream -> preprocess -> re-index per batch,
``Main/SolrRanker.java:66-91`` serve from the live index) composed from the
engine's verified pieces: ingest dedup gate, incremental index refresh, and
the served BM25/ANN tiers.

Per micro-batch (:func:`serve_batch`):

1. **Gate** — MinHash-LSH sketch ONLY the batch, join against the live
   corpus bucket rows (union of per-segment bucket tables, tombstone-
   filtered): arrivals that share a band bucket with an existing doc
   (different id — same-id is a replace-by-id UPDATE, reference
   ``SolrIndexer.java:36-45``) or with an earlier-id batch doc are
   suppressed. Cost scales with the batch, never the corpus.
2. **Index delta** — survivors' postings are built fresh (churn-sized
   tokenize) and published as a NEW token-bucketed segment table; replaced
   doc_ids get a tombstone ``(doc_id, before_seg)``. This is the Lucene
   segment + delete-bitmap model expressed in Spark tables: the 100 TB
   components are append-only, a re-index never rewrites history.
3. **Stats** — EVERYTHING doc-grain is segmented the same way: per-doc
   lengths and the batch's LSH bucket rows are written as batch-sized
   segment files (never a rewrite of corpus state — per-batch write volume
   is O(batch), not O(corpus)); the corpus constants (n_docs, avg_dl) are
   per-segment PARTIALS (new counts/sums plus the replaced docs' retracted
   counts/sums, looked up churn-sized at batch time), so the served value
   derives from <= n_segments rows — exact integer arithmetic, identical
   to re-aggregating doc_stats.
4. **Vector delta** — survivors' embeddings append as a bucket-partitioned
   segment under the int8-LSH layout, so served ANN still reads only probed
   bucket partitions (static partition pruning) and the same tombstones
   invalidate replaced vectors.
5. **Publish** — the segment manifest commits LAST (versioned state store,
   atomic pointer flip): a crash anywhere earlier leaves the previous
   manifest live — uncommitted segment directories are invisible because
   every read iterates the manifest's segment list — and every step is
   idempotent on Structured Streaming's retry (all segment writes are
   mode-overwrite to seg-deterministic locations; partials derive from
   COMMITTED state + the batch, never from increments). The foreachBatch
   ``batch_id`` rides in the manifest row itself, so POST-publish
   redelivery (at-least-once) is skipped by a high-water-mark check that
   can never disagree with what is live — re-application after publish
   would re-gate the batch against the post-batch corpus and is NOT
   idempotent (see :func:`serve_batch`). Pinned by the every-failpoint
   crash sweep in tests/test_serve_loop.py.

Served reads (:func:`read_served_index` / :func:`vector_search_served`)
union the manifest's segments and drop tombstoned rows (seg < the doc's
latest ``before_seg``) via a broadcast anti-filter — churn-sized until
:func:`compact_segments` folds everything back into one base segment.
Compaction deletes nothing; :func:`vacuum_segments` reclaims unreferenced
segments and inert tombstones after the read grace window, so a reader
that resolved the previous manifest mid-query stays consistent.

Exactness: the served index is provably identical to a full rebuild over
the latest-wins corpus — postings are a disjoint union of per-doc segment
rows (a doc's postings depend on its own text alone), and avg_dl is the
same exact integer-sum/count both ways — so served BM25 scores hash-match a
batch rebuild (pinned in tests/test_serve_loop.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import minhash_bucket_table
from ..streaming.state_store import commit_state, read_state
from .index import SearchIndex, build_index

VEC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.DoubleType()), True),
        T.StructField("seg", T.IntegerType(), True),
        T.StructField("bucket", T.IntegerType(), True),  # partition column
    ]
)


def _paths(base: str) -> dict[str, str]:
    return {
        "manifest": f"{base}/manifest",
        "tombstones": f"{base}/tombstones",
        "doc_stats": f"{base}/doc_stats",
        "lsh": f"{base}/lsh_buckets",
        "scalar": f"{base}/corpus_stats",
        "postings": f"{base}/postings",
        "vectors": f"{base}/vectors",
    }


def serve_batch(
    spark: SparkSession,
    batch: DataFrame,
    base: str,
    table_prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str | None = None,
    shingle_n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    num_planes: int = 4,
    dim: int = 64,
    postings_buckets: int = 16,
    batch_id: int | None = None,
    failpoint=None,
) -> dict:
    """One micro-batch of the serve loop (the foreachBatch body of
    :func:`serve_loop_sink`, exposed so crash-retry semantics are directly
    testable). Returns {"seg", "arrived", "suppressed", "indexed"}.

    ``batch`` must carry one row per ``id_col`` (upstream latest-wins); a
    row whose id already exists in the corpus is a replace-by-id update.

    ``batch_id`` makes redelivery exactly-once: the id is recorded IN the
    manifest row (one atomic commit — there is no window where the segment
    is published but its batch_id is not), and a batch whose id is already
    <= the manifest's high-water mark returns ``{"skipped": True}``
    untouched. This guard is what makes POST-publish redelivery safe:
    re-running an already-published batch would re-gate it against the
    post-batch corpus — e.g. a batch that both replaced doc X and carried a
    near-dup of X's OLD text would admit on re-run the dup it suppressed
    the first time (the old text's bucket rows are tombstoned by then).
    Pre-publish crashes never need the guard (nothing is live until the
    manifest flips); :func:`serve_loop_sink` always passes foreachBatch's
    monotonic batch_id. Manual/bootstrap callers may omit it — then THEY
    own not re-applying a published batch.

    ``failpoint`` (tests only): a callable invoked with a label after each
    durable mutation — raising from it simulates a crash at exactly that
    point. The crash-sweep test retries the batch after a crash at EVERY
    label and pins convergence to the clean run, including the
    post-publish redelivery (skipped via the batch_id guard). A failpoint
    also forces the pre-publish segment writes into their deterministic
    sequential label order; with no failpoint they run concurrently from a
    thread pool (test_parallel_writes_equal_sequential pins path
    equivalence)."""
    p = _paths(base)
    man = read_state(spark, p["manifest"])
    man_rows = [] if man is None else man.orderBy("seg").collect()
    if batch_id is not None and man is not None and "batch_id" in man.columns:
        applied = max(
            (r["batch_id"] for r in man_rows if r["batch_id"] is not None),
            default=None,
        )
        if applied is not None and applied >= batch_id:
            return {"skipped": True, "batch_id": batch_id, "applied": applied}
    prior_segs = [r["seg"] for r in man_rows]
    seg = 1 if not prior_segs else 1 + prior_segs[-1]
    max_committed = prior_segs[-1] if prior_segs else 0
    # tombstones from a PREVIOUS crashed attempt of this very seg are
    # clamped out (before_seg <= max committed seg) so a retry sees exactly
    # the pre-batch live state — the differential partials stay idempotent
    tombs_df = read_state(spark, p["tombstones"]) if prior_segs else None

    def _fp(label: str) -> None:
        if failpoint is not None:
            failpoint(label)

    batch = batch.persist()
    nb = minhash_bucket_table(
        batch, id_col, text_col, shingle_n, num_perm, bands
    ).persist()
    survivors = None
    replaced_stats = None
    fresh_post = None
    try:
        # ---- 1. gate: vs live corpus buckets, then earlier-id batch docs ---
        sup_parts = []
        if prior_segs:
            corpus_buckets = _alive(
                _union_segments(spark, p["lsh"], prior_segs),
                tombs_df,
                max_committed,
            )
            sup_parts.append(
                nb.join(
                    corpus_buckets.select(
                        F.col("doc_id").alias("old_id"), "band", "band_key"
                    ),
                    ["band", "band_key"],
                )
                .filter(F.col("doc_id") != F.col("old_id"))
                .select("doc_id")
            )
        earlier = nb.select(F.col("doc_id").alias("eid"), "band", "band_key")
        sup_parts.append(
            nb.join(earlier, ["band", "band_key"])
            .filter(F.col("eid") < F.col("doc_id"))
            .select("doc_id")
        )
        suppressed = sup_parts[0]
        for s in sup_parts[1:]:
            suppressed = suppressed.unionByName(s)
        suppressed = suppressed.distinct().persist()
        survivors = batch.join(
            suppressed.withColumnRenamed("doc_id", id_col), id_col, "left_anti"
        ).persist()
        surv_ids = survivors.select(F.col(id_col).alias("doc_id"))
        _fp("gated")

        # ---- 2-5. the durable pre-publish segment writes -------------------
        # Every write below lands at a seg-deterministic location and is
        # invisible until the manifest flips, so they are mutually
        # independent: order among them is irrelevant to correctness (a
        # crash leaves orphan files the retry overwrites). With no
        # failpoint they run CONCURRENTLY from a small thread pool (Spark
        # schedules jobs from multiple submitter threads onto idle slots —
        # a delta batch's jobs are tiny, so per-job fixed cost, not
        # compute, dominates the sequential form: measured ~4.6s -> ~3.5s
        # per ~200-doc batch at sf0.1). A failpoint forces the sequential
        # order so the crash sweep pins one deterministic label sequence.

        # persisted: the batch is tokenized ONCE and feeds the segment
        # write, the doc-stats segment, and the scalar partial (unpersisted
        # chains would re-tokenize the batch for each — 3x the dominant
        # per-batch compute at scale). (A tokenize-the-full-batch-
        # concurrent-with-the-gate variant was measured and REJECTED:
        # on a shared local[32] pool the extra tokenize work on suppressed
        # arrivals plus the survivor semi-join cost more than the overlap
        # saved — 3.30 s -> 3.68 s per delta batch at sf0.1.)
        fresh = build_index(survivors, id_col, text_col)
        fresh_post = fresh.postings.persist()
        seg_table = f"{table_prefix}_seg{seg}"

        def _write_postings() -> None:
            # fresh postings segment (token-bucketed table).
            # repartition(N, token) is the SAME hash spec bucketBy uses
            # (pmod(murmur3, N)), so every task holds exactly one bucket and
            # the segment is N files instead of tasks x buckets tiny ones —
            # served reads open N files per segment, and the delta write
            # stops paying per-file creation for empty bucket slices
            (
                fresh_post.withColumn("seg", F.lit(seg))
                .repartition(postings_buckets, "token")
                .write.mode("overwrite")
                .bucketBy(postings_buckets, "token")
                .sortBy("token", "doc_id")
                .option("path", f"{p['postings']}_seg{seg}")
                .saveAsTable(seg_table)
            )

        # doc-grain SEGMENTS: per-batch write volume is O(batch): the new
        # stats rows and the batch's scalar partial are segment files;
        # corpus state is never rewritten (the old design re-committed the
        # full doc_stats and LSH tables every batch — O(corpus) write
        # amplification at scale)
        new_stats = fresh_post.groupBy("doc_id").agg(
            F.sum("tf").alias("doc_len")
        )
        if prior_segs:
            alive_stats = _alive(
                _union_segments(spark, p["doc_stats"], prior_segs),
                tombs_df,
                max_committed,
            )
            # churn-sized: the replaced docs' OLD rows (for tombstones and
            # the retraction side of this segment's scalar partial)
            replaced_stats = alive_stats.join(
                surv_ids, "doc_id", "left_semi"
            ).persist()

        def _write_doc_stats() -> None:
            new_stats.withColumn("seg", F.lit(seg)).write.mode(
                "overwrite"
            ).parquet(f"{p['doc_stats']}/seg{seg}")

        def _write_scalar() -> None:
            newagg = new_stats.agg(
                F.count("*").alias("n_new"),
                F.coalesce(F.sum("doc_len"), F.lit(0))
                .cast("long")
                .alias("sum_new"),
            )
            if replaced_stats is not None:
                repagg = replaced_stats.agg(
                    F.count("*").alias("n_rep"),
                    F.coalesce(F.sum("doc_len"), F.lit(0))
                    .cast("long")
                    .alias("sum_rep"),
                )
                partial = newagg.crossJoin(repagg)
            else:
                partial = newagg.select(
                    "n_new",
                    "sum_new",
                    F.lit(0).cast("long").alias("n_rep"),
                    F.lit(0).cast("long").alias("sum_rep"),
                )
            partial.select(
                F.lit(seg).cast("int").alias("seg"),
                F.col("n_new").cast("long").alias("n_new"),
                "sum_new",
                F.col("n_rep").cast("long").alias("n_rep"),
                "sum_rep",
            ).write.mode("overwrite").parquet(f"{p['scalar']}/seg{seg}")

        def _commit_tombstones() -> None:
            if replaced_stats is not None:
                tomb_new = replaced_stats.select("doc_id").withColumn(
                    "before_seg", F.lit(seg)
                )
                tombs = (
                    tomb_new
                    if tombs_df is None
                    else tombs_df.unionByName(tomb_new)
                ).distinct()
                commit_state(tombs, p["tombstones"])

        def _write_lsh() -> None:
            # LSH bucket segment (survivors' buckets, batch-sized)
            nb.join(surv_ids, "doc_id", "left_semi").withColumn(
                "seg", F.lit(seg)
            ).write.mode("overwrite").parquet(f"{p['lsh']}/seg{seg}")

        def _write_vectors() -> None:
            if vec_col is None:
                return
            from ..operators.similarity import lsh_bucket_int8, quantize_int8

            vecs = survivors.filter(F.col(vec_col).isNotNull()).select(
                F.col(id_col).alias("doc_id"), F.col(vec_col).alias("embedding")
            )
            q = quantize_int8(vecs, "doc_id", "embedding")
            b = lsh_bucket_int8(q, num_planes=num_planes, dim=dim).select(
                "doc_id", "bucket"
            )
            (
                vecs.join(b, "doc_id")
                .select(
                    "doc_id",
                    "embedding",
                    F.lit(seg).cast("int").alias("seg"),
                    F.col("bucket").cast("int").alias("bucket"),
                )
                .repartition(F.col("bucket"))
                .write.mode("overwrite")
                .partitionBy("bucket")
                .parquet(f"{p['vectors']}/seg{seg}")
            )

        if failpoint is None:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=6) as ex:
                # ONE wave: all six pre-publish writes are mutually
                # independent (each lands at a seg-deterministic location,
                # invisible until the manifest flips), and the shared
                # persisted inputs (fresh_post, replaced_stats) are safe to
                # materialize concurrently — the block manager computes
                # each cached partition once, other submitters block on it.
                # The earlier 2-wave form made doc_stats/scalar/tombstones
                # wait for the postings/vector WRITES to finish, not just
                # the caches — a barrier that added a full write's latency
                # per batch for no correctness gain (the crash sweep pins
                # retry convergence for every completion order).
                for f in [
                    ex.submit(_write_postings),
                    ex.submit(_write_lsh),
                    ex.submit(_write_vectors),
                    ex.submit(_write_doc_stats),
                    ex.submit(_write_scalar),
                    ex.submit(_commit_tombstones),
                ]:
                    f.result()
        else:
            _write_postings()
            _fp("postings")
            _write_doc_stats()
            _fp("doc_stats")
            _write_scalar()
            _fp("scalar")
            _commit_tombstones()
            _fp("tombstones")
            _write_lsh()
            _fp("lsh")
            _write_vectors()
            _fp("vectors")

        # ---- 6. PUBLISH: manifest commits last ------------------------------
        # batch_id rides in the same atomic commit as the segment pointer:
        # either both are live or neither, so the redelivery guard can never
        # disagree with what is actually published. The new manifest is
        # assembled DRIVER-side from the rows already collected at entry
        # (manifest-sized, the sanctioned envelope class) — the earlier
        # union+distinct formulation put a shuffle job on the publish
        # critical path to dedup rows the driver can dedup in microseconds.
        # Single-writer contract (foreachBatch is sequential) makes the
        # entry-time snapshot authoritative.
        has_bid = man is not None and "batch_id" in man.columns
        prior_tuples = [
            (r["seg"], r["table"], r["batch_id"] if has_bid else None)
            for r in man_rows
        ]
        all_tuples = list(
            dict.fromkeys(prior_tuples + [(seg, seg_table, batch_id)])
        )
        man_new = spark.createDataFrame(
            all_tuples, "seg int, table string, batch_id long"
        )
        _fp("pre_publish")
        commit_state(man_new, p["manifest"])
        _fp("published")

        n_arrived = batch.count()
        n_indexed = survivors.count()
        return {
            "seg": seg,
            "arrived": n_arrived,
            "suppressed": n_arrived - n_indexed,
            "indexed": n_indexed,
        }
    finally:
        nb.unpersist()
        batch.unpersist()
        if survivors is not None:
            survivors.unpersist()
        if replaced_stats is not None:
            replaced_stats.unpersist()
        if fresh_post is not None:
            fresh_post.unpersist()


def _alive(
    rows: DataFrame, tombstones: DataFrame | None, max_seg: int | None = None
) -> DataFrame:
    """Drop tombstoned rows: a row of segment s for doc d is dead iff d has
    a tombstone with s < before_seg (the re-index segment's own rows
    survive). Tombstones aggregate to one (doc_id, cut) row per doc and
    broadcast — churn-sized between compactions.

    ``max_seg``: ignore tombstones with before_seg > max_seg. A crashed
    attempt may have committed tombstones for a segment whose manifest
    entry never published; clamping to the max COMMITTED seg makes both the
    retry and every concurrent reader see exactly the pre-batch live
    state."""
    if tombstones is None:
        return rows
    if max_seg is not None:
        tombstones = tombstones.filter(F.col("before_seg") <= max_seg)
    cut = tombstones.groupBy("doc_id").agg(F.max("before_seg").alias("__cut"))
    return (
        rows.join(F.broadcast(cut), "doc_id", "left")
        .filter(F.col("seg") >= F.coalesce(F.col("__cut"), F.lit(0)))
        .drop("__cut")
    )


def _union_segments(spark: SparkSession, base_path: str, segs: list[int]) -> DataFrame:
    """Union per-segment parquet directories (doc_stats / lsh / scalar) as
    ONE multi-path relation — a single schema resolution + file listing,
    not one per segment (segment schemas are identical by construction:
    every segment is written by the same serve_batch code path). Per-seg
    ``spark.read.parquet`` calls cost a resolution each — the fresh-read
    class the r6 1M-probe measured at 1.2-3.3 s/read on large partition
    counts, and at many-segment serving state even small per-read costs
    multiply by segments x (lsh + doc_stats + scalar) reads per batch."""
    return spark.read.parquet(*[f"{base_path}/seg{s}" for s in segs])


def read_served_index(
    spark: SparkSession, base: str, manifest_version: int | None = None
) -> SearchIndex:
    """The live SearchIndex: manifest segments unioned (each token-bucketed,
    so a term lookup still prunes to the query terms' buckets per segment),
    tombstone-filtered. Corpus constants derive from the per-segment scalar
    PARTIALS — an agg over <= n_segments rows, never a corpus re-aggregation
    — with bit-identical results (integer sums; one double division).
    term_stats derives lazily from alive postings (BM25 never touches it —
    per-term df comes from the pruned posting lists).

    ``manifest_version`` pins a previously committed manifest (state-store
    time travel): valid until :func:`vacuum_segments` reclaims that
    version's segments, it reads the exact point-in-time snapshot — the
    tombstone clamp (``before_seg <= that manifest's max seg``) hides any
    tombstones committed after it, so later replaces don't bleed in."""
    p = _paths(base)
    man = read_state(spark, p["manifest"], version=manifest_version)
    if man is None:
        raise FileNotFoundError(f"no serving manifest committed under {base}")
    rows = man.orderBy("seg").collect()
    segs = [r["seg"] for r in rows]
    tombs = read_state(spark, p["tombstones"])
    max_seg = segs[-1]
    postings = spark.table(rows[0]["table"])
    for r in rows[1:]:
        postings = postings.unionByName(spark.table(r["table"]))
    alive = _alive(postings, tombs, max_seg).drop("seg")
    doc_stats = _alive(
        _union_segments(spark, p["doc_stats"], segs), tombs, max_seg
    ).drop("seg")
    corpus = (
        _union_segments(spark, p["scalar"], segs)
        .agg(
            (F.sum("n_new") - F.sum("n_rep")).alias("__n"),
            (F.sum("sum_new") - F.sum("sum_rep")).alias("__s"),
        )
        .select(
            F.col("__n").cast("long").alias("n_docs"),
            (F.col("__s").cast("double") / F.col("__n").cast("double")).alias(
                "avg_dl"
            ),
        )
    )
    term_stats = alive.groupBy("token").agg(F.count("*").alias("df"))
    return SearchIndex(
        postings=alive,
        doc_stats=doc_stats,
        term_stats=term_stats,
        corpus=corpus,
    )


def _python_probe_buckets(
    query_vec: list[float], num_planes: int, dim: int, multiprobe: bool
) -> list[int]:
    """The query's int8-LSH bucket computed driver-side in pure Python —
    bit-identical to lsh_bucket_int8's plan (same IEEE double quantization,
    same integer Rademacher dot products; Python==Spark pinned by
    test_lsh_bucket_int8_matches_python_reference) — so the served read
    uses STATIC partition pruning: the probe list is literal in the plan."""
    import math

    from ..operators.similarity import rademacher_plane

    x = [float(v) for v in query_vec]
    mn, mx = min(x), max(x)
    if mx == mn:
        codes = [0] * len(x)
    else:
        codes = [
            int(math.floor((v - mn) * 255.0 / (mx - mn) + 0.5)) - 128 for v in x
        ]
    if len(codes) != dim:
        raise ValueError(f"query dim {len(codes)} != index dim {dim}")
    bucket = 0
    for j in range(num_planes):
        plane = rademacher_plane(j, dim)
        if sum(c * r for c, r in zip(codes, plane)) >= 0:
            bucket |= 1 << j
    probes = [bucket]
    if multiprobe:
        probes += [bucket ^ (1 << j) for j in range(num_planes)]
    return probes


def _read_vector_segments(spark, p: dict, segs: list[int]) -> DataFrame | None:
    """Union the vector segments that exist on disk; None when the loop ran
    text-only (vec_col=None writes no vector segment for that batch — a
    batch of docs without embeddings is normal, not an error)."""
    import os

    vecs = None
    for s in segs:
        path = f"{p['vectors']}/seg{s}"
        if not os.path.isdir(path):
            continue
        df = spark.read.schema(VEC_SCHEMA).parquet(path)
        vecs = df if vecs is None else vecs.unionByName(df)
    return vecs


def vector_search_served(
    spark: SparkSession,
    base: str,
    query_vec: list[float],
    k: int = 5,
    num_planes: int = 4,
    dim: int | None = None,
    multiprobe: bool = True,
) -> DataFrame:
    """Served ANN over the segment layout: probe buckets computed driver-side
    (static partition pruning on every segment dir), tombstone-filtered,
    exact cosine rerank of the probed candidates. Returns (doc_id, sim)."""
    from ..functions.vectors import cosine

    if dim is None:
        dim = len(query_vec)
    p = _paths(base)
    man = read_state(spark, p["manifest"])
    if man is None:
        raise FileNotFoundError(f"no serving manifest committed under {base}")
    segs = [r["seg"] for r in man.orderBy("seg").collect()]
    vecs = _read_vector_segments(spark, p, segs)
    if vecs is None:
        raise FileNotFoundError(
            f"no vector segments under {base}: the serve loop ran without "
            "vec_col, so there is no ANN tier to query"
        )
    probes = _python_probe_buckets(query_vec, num_planes, dim, multiprobe)
    cands = _alive(
        vecs.filter(F.col("bucket").isin(probes)),
        read_state(spark, p["tombstones"]),
        segs[-1],
    )
    qv = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        cands.select(
            "doc_id",
            (F.round(cosine(F.col("embedding"), qv), 4) + F.lit(0.0)).alias("sim"),
        )
        .orderBy(F.col("sim").desc(), F.col("doc_id"))
        .limit(k)
    )


def compact_segments(
    spark: SparkSession,
    base: str,
    table_prefix: str,
    postings_buckets: int = 16,
    vacuum_now: bool = True,
) -> None:
    """Fold all live postings, doc-grain segments, and vectors into fresh
    base segments — Lucene's merge policy. Run off the serving path on a
    cadence sized by churn; between compactions served reads pay one
    broadcast tombstone filter and a per-segment union.

    Crash-safe ordering: every folded segment is written FIRST, then the
    manifest flips to [new_seg] (folded rows carry seg=new_seg so old
    tombstones, whose before_seg <= old max, cannot kill them) — a crash at
    any point leaves a correct view.

    Compaction itself deletes NOTHING and does not touch the tombstones:
    a reader that resolved the previous manifest mid-query keeps both its
    segment files and the exact tombstone set those segments need. (The
    first design reset tombstones here; an old-manifest reader racing that
    reset would re-read the emptied tombstone state and resurrect replaced
    docs.) Old segments are reclaimed by :func:`vacuum_segments` — run it
    once the longest read SLA has elapsed since the manifest flip, or pass
    ``vacuum_now=True`` (the default, matching single-process use where no
    concurrent reader exists)."""
    p = _paths(base)
    idx = read_served_index(spark, base)
    man = read_state(spark, p["manifest"])
    man_rows = man.orderBy("seg").collect()
    old_segs = [(r["seg"], r["table"]) for r in man_rows]
    # the redelivery high-water mark must survive the fold: dropping it
    # would let a redelivered last batch re-apply after compaction
    applied = max(
        (
            r["batch_id"]
            for r in man_rows
            if "batch_id" in man.columns and r["batch_id"] is not None
        ),
        default=None,
    )
    new_seg = old_segs[-1][0] + 1
    seg_table = f"{table_prefix}_seg{new_seg}"
    (
        idx.postings.withColumn("seg", F.lit(new_seg))
        .repartition(postings_buckets, "token")  # one file per bucket
        .write.mode("overwrite")
        .bucketBy(postings_buckets, "token")
        .sortBy("token", "doc_id")
        .option("path", f"{p['postings']}_seg{new_seg}")
        .saveAsTable(seg_table)
    )
    idx.doc_stats.withColumn("seg", F.lit(new_seg).cast("int")).write.mode(
        "overwrite"
    ).parquet(f"{p['doc_stats']}/seg{new_seg}")
    idx.doc_stats.agg(
        F.count("*").alias("n_new"),
        F.coalesce(F.sum("doc_len"), F.lit(0)).cast("long").alias("sum_new"),
    ).select(
        F.lit(new_seg).cast("int").alias("seg"),
        F.col("n_new").cast("long").alias("n_new"),
        "sum_new",
        F.lit(0).cast("long").alias("n_rep"),
        F.lit(0).cast("long").alias("sum_rep"),
    ).write.mode("overwrite").parquet(f"{p['scalar']}/seg{new_seg}")
    tombs = read_state(spark, p["tombstones"])
    old_seg_ids = [s for s, _ in old_segs]
    _alive(
        _union_segments(spark, p["lsh"], old_seg_ids), tombs, old_seg_ids[-1]
    ).drop("seg").withColumn("seg", F.lit(new_seg).cast("int")).write.mode(
        "overwrite"
    ).parquet(f"{p['lsh']}/seg{new_seg}")
    vecs = _read_vector_segments(spark, p, old_seg_ids)
    if vecs is not None:
        alive_vecs = _alive(vecs, tombs, old_seg_ids[-1])
        (
            alive_vecs.select(
                "doc_id", "embedding", F.lit(new_seg).cast("int").alias("seg"), "bucket"
            )
            .repartition(F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{p['vectors']}/seg{new_seg}")
        )
    commit_state(
        spark.createDataFrame(
            [(new_seg, seg_table, applied)], "seg int, table string, batch_id long"
        ),
        p["manifest"],
    )
    if vacuum_now:
        vacuum_segments(spark, base, table_prefix)


def vacuum_segments(spark: SparkSession, base: str, table_prefix: str) -> None:
    """Reclaim segments no longer referenced by the live manifest, and GC
    tombstones that can no longer kill any live row — Delta's VACUUM beside
    the state store's ``keep`` retention. Run on a cadence >= the longest
    read SLA after :func:`compact_segments`: everything vacuum deletes is
    exactly what an in-flight reader of a PRE-compaction manifest may still
    be touching, so the gap between flip and vacuum IS the read grace
    window.

    No bookkeeping state: reclaimable segments are discovered from disk as
    ``seg < max(live)`` and not in the manifest (a serve batch in flight
    writes only ``seg = max(live)+1``, never below, so it is untouchable by
    construction) — which also sweeps segments leaked by a compaction that
    crashed after its manifest flip. Idempotent and crash-safe: deletion
    order is irrelevant because nothing live is ever in the candidate set,
    and the tombstone GC rewrites state through the versioned commit."""
    import os
    import re
    import shutil

    p = _paths(base)
    man = read_state(spark, p["manifest"])
    if man is None:
        return
    live = {r["seg"] for r in man.collect()}
    mx = max(live)
    seen: set[int] = set()
    pat = re.compile(r"^seg(\d+)$")
    for key in ("doc_stats", "lsh", "scalar", "vectors"):
        root = p[key]
        if os.path.isdir(root):
            for name in os.listdir(root):
                m = pat.match(name)
                if m:
                    seen.add(int(m.group(1)))
    post_pat = re.compile(r"^postings_seg(\d+)$")
    for name in os.listdir(base):
        m = post_pat.match(name)
        if m:
            seen.add(int(m.group(1)))
    for s in sorted(seen - live):
        if s >= mx:  # in-flight writer territory — never touch
            continue
        spark.sql(f"DROP TABLE IF EXISTS {table_prefix}_seg{s}")
        # external tables keep their data on DROP — remove the postings dir
        shutil.rmtree(f"{p['postings']}_seg{s}", ignore_errors=True)
        for key in ("doc_stats", "lsh", "scalar", "vectors"):
            shutil.rmtree(f"{p[key]}/seg{s}", ignore_errors=True)
    # tombstone GC: (doc_id, before_seg=b) kills rows with seg < b only; once
    # every live row has seg >= b the tombstone is inert and safe to drop.
    tombs = read_state(spark, p["tombstones"])
    if tombs is not None:
        mn = min(live)
        alive_tombs = tombs.filter(F.col("before_seg") > mn)
        if alive_tombs.count() < tombs.count():
            commit_state(alive_tombs, p["tombstones"])


def serve_loop_sink(
    stream_df: DataFrame,
    spark: SparkSession,
    base: str,
    checkpoint: str,
    table_prefix: str,
    trigger_once: bool = True,
    auto_compact_max_segments: int | None = 8,
    **serve_kwargs,
):
    """The streaming composition: every micro-batch runs the full
    gate -> delta-index -> publish loop. Idempotent per batch (see module
    docstring), so exactly-once serving state over at-least-once delivery.

    ``auto_compact_max_segments``: Lucene's merge policy for the loop —
    when a batch's publish leaves the manifest holding at least this many
    segments, :func:`compact_segments` runs inline before the next batch,
    so a long-running loop's per-read segment fan-in (manifest collect +
    per-segment unions + tombstone filter) stays bounded instead of
    growing with every batch forever. DEFAULT ON at 8 segments — a
    long-running loop without any operator attention must not degrade
    reads without bound (the r4 default of None did exactly that); pass
    ``None`` to disable and own the cadence externally (DEPLOY.md — e.g.
    a deployment with concurrent out-of-process readers compacting off
    the serving path with a read grace window).

    Crash-safe by ordering alone: compaction runs strictly AFTER the
    batch's manifest publish, and itself flips the manifest only after
    every folded segment is written — a crash mid-compaction leaves the
    multi-segment manifest live and the threshold simply re-triggers
    after the next batch; a redelivery after a post-compaction crash is
    skipped because the fold carries the batch_id high-water mark
    (test_redelivery_guard_survives_compaction). Inline vacuum is the
    single-writer default (compact_segments vacuum_now) — a deployment
    with concurrent out-of-process readers should instead compact off the
    serving path with a read grace window, per DEPLOY.md."""

    def _body(batch: DataFrame, batch_id: int) -> None:
        # batch_id threads into the manifest commit: a redelivered batch
        # (at-least-once foreachBatch) whose publish already succeeded is
        # skipped instead of re-gated against the post-batch corpus
        serve_batch(spark, batch, base, table_prefix, batch_id=batch_id, **serve_kwargs)
        if auto_compact_max_segments is not None:
            man = read_state(spark, _paths(base)["manifest"])
            if man is not None and man.count() >= auto_compact_max_segments:
                compact_segments(
                    spark,
                    base,
                    table_prefix,
                    postings_buckets=serve_kwargs.get("postings_buckets", 16),
                )

    writer = stream_df.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
