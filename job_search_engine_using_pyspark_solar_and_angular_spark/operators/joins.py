"""Temporal join operators Spark lacks as primitives: as-of join, range
(interval-bucket) join, and gap-based sessionization — composed from existing
DataFrame ops per the engine's custom-operator policy (composition first,
Pandas UDF only if semantics demand it; these don't).

The reference has no temporal joins (SURVEY.md §2.4: equi-joins only); these
are extension operators for the training-data-pipeline charter (event/feature
alignment, bucketed joins, session corpora).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right.ts <= left.ts`` for the same key (left outer: nulls when no prior
    right row) — the standard event/feature-snapshot alignment join.

    Scale design: NOT a per-row lookup and NOT a range cross-join. Both sides
    union into one stream, ONE shuffle on the key, and a running
    ``last(ignorenulls)`` window carries the most recent right-side values
    forward onto left rows. O(n log n) in partition size, no state blowup,
    AQE-skew-splittable — the same plan shape at any scale.

    Ties (right.ts == left.ts): the right row counts (matches DuckDB/pandas
    ASOF semantics with >=), enforced by ordering right rows before left rows
    at equal timestamps.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tagged = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in left.columns if c not in (key,)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (key,)],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col(key),
        *[F.col(c) for c in left.columns if c not in (key,)],
        *[F.col(f"__asof_{c}").alias(c) for c in right_cols],
    )
    return out


def range_bucket_join(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join facts to half-open buckets [lo, hi) by a non-equi predicate.
    The ranges side is a small static table by contract — broadcast, so the
    'join' is a map-side scan per fact row (BroadcastNestedLoopJoin with a
    tiny build side), never a shuffle."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(ranges), cond, "left")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_start: str = "l_start",
    l_end: str = "l_end",
    r_start: str = "r_start",
    r_end: str = "r_end",
    grid_seconds: int = 3600,
) -> DataFrame:
    """Keyed interval-overlap join: all (left, right) row pairs sharing
    ``key`` whose half-open time intervals [start, end) intersect.

    A naive formulation is an equi-join on key + two inequality predicates —
    Spark executes the inequalities as a post-join filter, so a hot key
    degenerates to its full cross product. Instead both sides explode onto a
    time grid (one row per ``grid_seconds`` cell the interval touches) and
    equi-join on (key, cell): the join is hash-partitioned on fixed-width
    keys, each pair meets only in cells both touch, and a distinct collapses
    multi-cell meetings. Work scales with total interval length / grid, so
    pick ``grid_seconds`` near the median interval length; intervals
    spanning many cells (skew) are bounded by interval length, not by key
    popularity. DuckDB states the oracle with the plain inequality join —
    same rows, different physical strategy, which is exactly the point.
    """
    def cells(df: DataFrame, s: str, e: str) -> DataFrame:
        epoch_s = F.col(s).cast("timestamp").cast("long")
        epoch_e = F.col(e).cast("timestamp").cast("long")
        # Empty/negative intervals ([t, t) and worse) touch no cells and
        # overlap nothing under half-open semantics — drop them BEFORE the
        # span build: the classic overlap predicate below wrongly admits
        # them, and Spark's sequence() would generate a DESCENDING cell
        # range for them. Half-open [s, e): last touched cell contains e-1.
        df = df.filter(epoch_e > epoch_s)
        span = F.sequence(
            F.floor(epoch_s / grid_seconds),
            F.floor((epoch_e - 1) / grid_seconds),
        )
        return df.withColumn("__cell", F.explode(span))

    l = cells(left, l_start, l_end)
    r = cells(right, r_start, r_end)
    overlap = (F.col(l_start) < F.col(r_end)) & (F.col(r_start) < F.col(l_end))
    return (
        l.join(r, [key, "__cell"])
        .filter(overlap)
        .drop("__cell")
        .distinct()
    )


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since the
    key's previous event exceeds ``gap_seconds``. Returns per-session rows
    (key, session_idx, n_events, start/end ts). One shuffle on the key; the
    cumulative-sum window is the classic single-pass formulation (same SQL in
    any engine, which is what makes it oracle-checkable)."""
    w = Window.partitionBy(key).orderBy(F.col(ts_col))
    # NTZ-safe epoch seconds: TIMESTAMP_NTZ can't cast straight to BIGINT on
    # Spark 4; going through TIMESTAMP first is a no-op for TIMESTAMP inputs
    # (UTC session) and legal for NTZ ones.
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = events.withColumn(
        "__new",
        F.when(gap.isNull() | (gap > gap_seconds), F.lit(1)).otherwise(F.lit(0)),
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = marked.withColumn("session_idx", F.sum("__new").over(wsum))
    return sessions.groupBy(key, "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resilient equi-join: replicate the small side ``n_salts`` times
    and scatter the big side's rows across salt buckets, so one hot key
    (a power-law user_id, a null-heavy dimension key) spreads over
    ``n_salts`` shuffle partitions instead of pinning one task.

    Result is EXACTLY the plain ``big.join(small, key, how)`` — salting only
    changes the shuffle key from ``key`` to ``(key, salt)``; every big row
    still meets every matching small row exactly once because the small side
    carries all salt values.

    Scale rationale: AQE's skew-split (OptimizeSkewedJoin) only re-plans
    after a shuffle stage materializes and only for sort-merge joins; salting
    fixes the plan shape up front, works for shuffle-hash joins too, and its
    cost is bounded: the small side grows ``n_salts``×, which is the knob —
    size it to ceil(hot_key_rows / target_partition_rows).

    ``salt_src`` must be a big-side column that varies WITHIN a key (a
    row-unique id is ideal); the salt is a deterministic hash of it, so the
    join stays layout- and rerun-stable. Supported ``how``: inner / left —
    the semantics where row multiplicity is driven by the big side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, on=[key, "__salt"], how=how).drop("__salt")


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Entity-resolution fuzzy EQUI-join: match rows whose string keys are
    within levenshtein ``max_dist`` (1 or 2), via symmetric delete-key
    blocking on BOTH tables — the table-to-table generalization of the
    SymSpell spell corrector (there the right side was a driver-side
    dictionary; here both sides are DataFrames of any size).

    Shape: each side explodes into (delete-key, value) rows, then ONE
    equi-join on the block key, exact levenshtein verify, distinct. Never a
    cross join; blocking keys are near-unique for natural-language strings,
    so block groups stay small the same way LSH bands do (a hot key means
    near-identical values — exactly the rows you want matched). Returns the
    distinct matched pairs (left_col, right_col, dist).

    Completeness is the SymSpell delete-set property: lev(a, b) <= d
    implies deletes<=d(a) ∩ deletes<=d(b) is nonempty (every edit —
    deletion, insertion, substitution, and at d=2 transposition — is
    reachable by deleting at most d chars from each side); the levenshtein
    verify then discards block-collision false positives. Pinned against
    brute force at both distances in tests.

    Key-count cost: n+1 keys per value at d=1; ~1 + n + n(n-1)/2 at d=2 —
    quadratic in string LENGTH (not corpus size), i.e. ~200 keys for a
    20-char key. d=2 is the common typo-clustering setting; for longer-
    than-word keys at 100 TB, block on a tokenized/normalized form
    instead of raw strings before reaching for d > 2 (why larger d is
    deliberately unsupported)."""
    if max_dist not in (1, 2):
        raise NotImplementedError("fuzzy_join supports max_dist in {1, 2}")

    def _del1(expr: str, var: str) -> str:
        """SQL array of all delete-one variants of string expr (empty array
        for the empty string — sequence(1, 0) would run DESCENDING)."""
        return (
            f"case when length({expr}) >= 1 then "
            f"transform(sequence(1, length({expr})), "
            f"{var} -> concat(substring({expr}, 1, {var}-1), "
            f"substring({expr}, {var}+1))) "
            f"else array() end"
        )

    def keys(df: DataFrame, col: str) -> DataFrame:
        c = F.col(col)
        d1 = _del1(col, "i")
        key_sets = [f"array({col})", d1]
        if max_dist == 2:
            # deletes of deletes: depth-2 delete set, deduped by array_union
            key_sets.append(
                f"flatten(transform({d1}, s2 -> {_del1('s2', 'j')}))"
            )
        all_keys = key_sets[0]
        for ks in key_sets[1:]:
            all_keys = f"array_union({all_keys}, {ks})"
        return df.select(col).where(c.isNotNull()).distinct().select(
            c.alias("v"),
            F.explode(F.expr(all_keys)).alias("bkey"),
        )

    lk = keys(left, left_col).withColumnRenamed("v", "lv")
    rk = keys(right, right_col).withColumnRenamed("v", "rv")
    return (
        lk.join(rk, "bkey")
        .select("lv", "rv")
        .distinct()
        .withColumn("dist", F.levenshtein("lv", "rv"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("lv").alias(left_col),
            F.col("rv").alias(right_col),
            F.col("dist").cast("long").alias("dist"),
        )
    )
