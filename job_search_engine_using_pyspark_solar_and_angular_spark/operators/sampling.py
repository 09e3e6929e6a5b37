"""Deterministic hash-based sampling for training-data pipelines.

``df.sample()``/``sampleBy()`` are seed-dependent AND partition-layout
dependent — rerun the job with different file splits and the sample changes,
which silently breaks train/test hygiene (a row can migrate between splits
across runs). The pipeline-safe primitive is a HASH of a stable key: the
same row lands in the same split on every run, on any cluster layout, in any
engine — and because the engine's md5-prefix scheme (functions/hashing.py) is
reproducible in ANSI SQL, the splits are exactly oracle-checkable too.

All operators are stateless row-local filters: no shuffle, no sort, fully
pushdown-friendly. The reference has no sampling surface (SURVEY.md §2);
these are extension operators for the LLM-pipeline charter (stable corpus
subsets, train/test splits, per-class rebalancing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

# basis points: fractions are expressed as parts per 10_000 so equality with
# the SQL oracle is integer-exact (no float thresholds)
BPS = 10_000


def _bucket(key: Column, salt: str) -> Column:
    """Stable bucket in [0, 10000): md5-prefix of (key string + salt)."""
    return md5_long(F.concat(key.cast("string"), F.lit(salt))) % F.lit(BPS)


def hash_sample(
    df: DataFrame, key_col: str, fraction_bps: int, salt: str = ""
) -> DataFrame:
    """Keep rows whose key hashes into the first ``fraction_bps`` of 10,000
    buckets — a deterministic ``fraction_bps/10000`` sample. ``salt`` makes
    independent samples from the same keys (different salt, different rows)."""
    return df.filter(_bucket(F.col(key_col), salt) < fraction_bps)


def train_test_split(
    df: DataFrame, key_col: str, test_bps: int = 2_000, salt: str = ""
) -> DataFrame:
    """Add a ``split`` column ('test' for ``test_bps``/10000 of keys, else
    'train'). Keyed on the hash, so all rows of one key land in one split —
    group-safe when ``key_col`` is a user/document id with multiple rows."""
    return df.withColumn(
        "split",
        F.when(_bucket(F.col(key_col), salt) < test_bps, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Keep at most ``k`` rows per group, chosen by md5 order — the CCNet
    'cap documents per domain' step. Unlike ``LIMIT``-per-group over an
    arbitrary order, the hash order makes the kept set a uniform,
    run/layout/engine-stable sample of each group. One shuffle on the
    group key; the per-group sort is bounded by group size (hot groups are
    exactly what the cap truncates)."""
    w = Window.partitionBy(group_col).orderBy(
        md5_long(F.concat(F.col(id_col).cast("string"), F.lit(salt))), id_col
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def domain_mix(
    df: DataFrame,
    strata_col: str,
    shares_bps: dict[str, int],
    budget_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Target-mixture downsampling: given desired OUTPUT shares per domain
    (basis points, summing to 10000) and a total token budget, derive each
    domain's keep-rate from its measured token mass and apply the
    deterministic hash filter — the data-mixing step of a training run
    (upweight code, downweight boilerplate web) expressed as one plan.

    rate_bps(s) = min(10000, share_bps(s) * budget / tokens(s)) — integer
    arithmetic end-to-end, so the oracle reproduces it exactly. Domains too
    small for their share keep everything (rate capped at 100%); no
    upsampling/replication here (layout-stable repetition belongs to the
    epoch shuffle, operators/pipeline.corpus_shuffle, via salted epochs).

    Plan: one stats agg per domain (tiny — #domains rows) broadcast back
    onto the corpus, then a row-local bucket filter. The corpus is scanned
    twice (stats + filter) but never shuffled."""
    from .textstats import token_count

    share_expr = None
    for value, bps in sorted(shares_bps.items()):
        cond = F.col(strata_col) == value
        share_expr = (
            F.when(cond, F.lit(bps))
            if share_expr is None
            else share_expr.when(cond, F.lit(bps))
        )
    share_expr = share_expr.otherwise(F.lit(0))
    stats = (
        df.groupBy(strata_col)
        .agg(F.sum(token_count(text_col)).alias("__tok"))
        .withColumn(
            "__rate_bps",
            F.least(
                F.lit(BPS).cast("long"),
                F.floor(share_expr.cast("long") * F.lit(budget_tokens) / F.col("__tok")),
            ),
        )
    )
    return (
        df.join(F.broadcast(stats.select(strata_col, "__rate_bps")), strata_col)
        .filter(_bucket(F.col(id_col), salt) < F.col("__rate_bps"))
        .drop("__rate_bps")
    )


def temperature_mix_apply(
    df: DataFrame,
    strata_col: str,
    budget_tokens: int,
    temperature: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """APPLY the temperature-scaled mix — :func:`temperature_mix` reports
    the smoothed weights; this operator derives keep-rates from them and
    actually downsamples. Equivalent to :func:`domain_mix` with
    the target shares DERIVED from measured per-domain token mass instead
    of hand-specified: share_s ∝ mass_s^(1/T), the standard multilingual /
    multi-domain rebalancing (T=1 proportional i.e. no rebalancing, T>1
    flattens toward uniform so small domains keep more of their data).

    Exactness contract: supported temperatures are 1.0 and 2.0 — T=2 maps
    to IEEE ``sqrt`` (correctly rounded by the standard, engine-identical),
    whose output is micro-quantized to integer units BEFORE the
    cross-domain normalization, and every later step (share, keep-rate,
    bucket filter) is int64 floor-division — so the whole mix is
    hash-exact cross-engine, unlike a float ``pow`` chain. Arbitrary T
    would need pow (correctly-rounded nowhere guaranteed) and is rejected
    rather than silently rows-only.

    Scale shape (same as domain_mix): one #domains-row stats agg, shares
    normalized in-plan by an ``over ()`` window on that tiny relation (no
    driver collect, and no second execution of the corpus-scan stats
    subplan to build a 1-row total), broadcast back, row-local hash
    filter; the corpus is scanned twice and never shuffled. int64 bounds: T=2 quantizes sqrt(tok) by
    1e6 (q <= ~3e12 at 100 TB token mass, 10000*q <= ~3e16 < 2^63); T=1
    uses the raw integer token counts UNQUANTIZED — they are already
    exact, and scaling them by 1e6 would overflow 10000*q at ~9e8 tokens
    per domain (a few GB of text) and silently drop the domain under
    non-ANSI long wraparound."""
    from .textstats import token_count

    if temperature == 1.0:
        q = F.col("__tok")  # exact integers already — no quantization
    elif temperature == 2.0:
        q = F.round(F.sqrt(F.col("__tok").cast("double")) * 1_000_000, 0).cast(
            "long"
        )
    else:
        raise ValueError(
            f"temperature {temperature} unsupported: only 1.0 and 2.0 keep "
            "the mix engine-exact (IEEE sqrt); arbitrary T needs pow, whose "
            "rounding is engine-dependent"
        )
    stats = (
        df.groupBy(strata_col)
        .agg(F.sum(token_count(text_col)).alias("__tok"))
        .withColumn("__q", q)
    )
    # cross-domain total via an `over ()` window on the #domains-row stats
    # relation (same pattern as temperature_mix) — a crossJoin with a
    # separate stats.agg() would re-execute the corpus scan + token_count
    # agg a second time just to build the 1-row total
    rates = (
        stats.withColumn(
            "__share_bps", F.expr("div(10000 * __q, sum(__q) over ())")
        )
        .select(
            strata_col,
            F.least(
                F.lit(10_000).cast("long"),
                F.expr(f"div(__share_bps * {int(budget_tokens)}, __tok)"),
            ).alias("__rate_bps"),
        )
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(_bucket(F.col(id_col), salt) < F.col("__rate_bps"))
        .drop("__rate_bps")
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions_bps: dict[str, int],
    default_bps: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (class rebalancing): stratum s keeps
    ``fractions_bps[s]``/10000 of its rows; strata absent from the dict keep
    ``default_bps``. One row-local when-chain — no shuffle, no per-stratum
    pass (``sampleBy`` semantics, reproducible)."""
    threshold = None
    for value, bps in sorted(fractions_bps.items()):
        cond = F.col(strata_col) == value
        threshold = (
            F.when(cond, F.lit(bps))
            if threshold is None
            else threshold.when(cond, F.lit(bps))
        )
    threshold = (
        threshold.otherwise(F.lit(default_bps))
        if threshold is not None
        else F.lit(default_bps)
    )
    return df.filter(_bucket(F.col(key_col), salt) < threshold)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_bps: Column,
    salt: str = "",
) -> DataFrame:
    """Keep each row with probability ``weight_bps``/10000 — importance
    sampling with a PER-ROW acceptance rate (quality-weighted data
    selection: high-quality docs survive at higher rates). Deterministic:
    the acceptance draw is the key's md5 bucket, so reruns, repartitions,
    and incremental extensions of the corpus keep identical decisions —
    ``df.sample`` can promise none of that. Row-local, no shuffle.

    ``weight_bps`` must be an integer-valued column in [0, 10000]."""
    return df.filter(_bucket(F.col(key_col), salt) < weight_bps)


def kfold_assign(
    df: DataFrame, key_col: str, k: int = 5, salt: str = ""
) -> DataFrame:
    """Add a ``fold`` column in [0, k): deterministic k-fold cross-validation
    assignment by key hash. Every key lands in exactly one fold (partition of
    the key space — no leakage between a fold's train and eval side by
    construction), identically on every run and layout; ``salt`` draws an
    independent folding. Row-local, no shuffle.

    The fold is the full 60-bit md5 hash mod ``k`` directly — NOT the
    10000-bucket value mod k, which is biased whenever k does not divide
    10000 (k=3 would give 3334/3333/3333 per 10k buckets). The residual
    bias of 2^60 mod k is < 2^-47 for any practical k — negligible.

    .. warning:: **Assignment-version break (v2).** This derivation replaced
       the original ``(_bucket % k)`` one; the two disagree on most keys, so
       any split persisted under the old scheme must NOT be mixed with folds
       from this one — re-deriving on upgraded code moves keys between folds
       and silently leaks eval rows into train. Re-materialize persisted
       splits once after upgrading, or pin the old folds by keeping the
       persisted ``fold`` column instead of recomputing. Pass a project-
       specific ``salt`` (e.g. ``"v2"``) to make the folding generation
       explicit in your own pipelines."""
    h = md5_long(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.withColumn("fold", (h % F.lit(k)).cast("long"))


def temperature_mix(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Temperature-scaled mixture weights (the multilingual-LM alpha = 0.5
    smoothing of mBERT/XLM-R): per group, raw token-mass share and the
    sqrt-smoothed share — low-resource groups are upsampled relative to
    their raw mass, high-resource groups downsampled.

    Exactness: token masses are exact integer sums; the smoothed weight is
    floor(sqrt(mass)) — IEEE double sqrt is correctly rounded and the
    masses are far below 2^53, so the floor is engine-identical — and both
    share columns are floored basis points of integer ratios. One scan,
    one tiny group-by, a 1-row total kept in-plan (broadcast, never
    collected)."""
    toks = F.size(F.split(F.col(text_col), " "))
    per = df.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(toks).cast("long").alias("sum_tokens"),
    ).withColumn("w", F.floor(F.sqrt(F.col("sum_tokens"))).cast("long"))
    # the `over ()` totals window runs on the group-count-sized frame
    # (one row per language), never the corpus — totals stay in-plan
    return (
        per.select(
            group_col,
            "n_docs",
            "sum_tokens",
            F.expr("sum_tokens * 10000 div sum(sum_tokens) over ()").alias(
                "raw_bp"
            ),
            F.expr("w * 10000 div sum(w) over ()").alias("smooth_bp"),
        )
        .orderBy(group_col)
    )
