"""Deterministic tweet-shaped corpus synthesized from the ``documents``
fixture table — lets the END-TO-END preprocess pipeline (plans/preprocess.py)
be differential-tested against a DuckDB oracle: every field is a pure
function of ``doc_id``/``text``, so the oracle can state the expected output
without modeling the nested structures at all.

Construction (mirrored in queries/oracles.py ``ext_preprocess_pipeline``):
- branch  = doc_id % 3 -> 0 original, 1 retweet, 2 quoted
- org_id  = doc_id; samp_id = doc_id + 1_000_000
- org ts  = 2022-01-01 00:00:00 UTC + doc_id seconds; samp ts = org ts + 1 h
- re-observation for doc_id % 7 == 0: samp_id += 1_000_000, samp ts += 2 h,
  favorite_count += 5  (exercises latest-wins dedup)
- sensitive when doc_id % 11 == 3 (flag sits on the ORG status: top level for
  originals, nested for retweets/quotes — exercises every drop path)
- hashtags = [first whitespace token of text]; quoted permalink for branch 2
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH_2022 = 1640995200  # 2022-01-01 00:00:00 UTC
TWITTER_FMT = "EEE MMM dd HH:mm:ss '+0000' yyyy"

_NULL_ENTITIES_URLS = "array<struct<expanded_url:string>>"
_NULL_MENTIONS = "array<struct<screen_name:string>>"
_NULL_MEDIA = (
    "struct<media:array<struct<media_url:string,expanded_url:string,type:string>>>"
)
_NULL_EXTENDED = (
    "struct<full_text:string,"
    "entities:struct<hashtags:array<struct<text:string>>,"
    "urls:array<struct<expanded_url:string>>,"
    "user_mentions:array<struct<screen_name:string>>>,"
    "extended_entities:struct<media:array<struct<media_url:string,"
    "expanded_url:string,type:string>>>>"
)


def _twitter_ts(epoch: Column) -> Column:
    return F.date_format(F.timestamp_seconds(epoch), TWITTER_FMT)


def _mk_status(doc_id: Column, text: Column, created_epoch: Column,
               fav_bonus: Column) -> Column:
    """A full inner-status struct whose every field is doc_id-derived."""
    first_tok = F.split(text, " ").getItem(0)
    entities = F.struct(
        F.array(F.struct(first_tok.alias("text"))).alias("hashtags"),
        F.lit(None).cast(_NULL_ENTITIES_URLS).alias("urls"),
        F.lit(None).cast(_NULL_MENTIONS).alias("user_mentions"),
    )
    user = F.struct(
        (doc_id % 100).alias("id"),
        F.concat(F.lit("u"), (doc_id % 100).cast("string")).alias("name"),
        F.concat(F.lit("u"), (doc_id % 100).cast("string")).alias("screen_name"),
        (doc_id % 2 == 0).alias("verified"),
        F.lit(None).cast("string").alias("profile_image_url"),
        F.lit(None).cast("string").alias("profile_banner_url"),
        F.lit(None).cast("string").alias("profile_background_image_url"),
        (doc_id % 100 * 10).cast("long").alias("followers_count"),
        (doc_id % 100 * 3).cast("long").alias("friends_count"),
    )
    return F.struct(
        doc_id.alias("id"),
        _twitter_ts(created_epoch).alias("created_at"),
        text.alias("text"),
        F.lit(False).alias("truncated"),
        (doc_id % 11 == 3).alias("possibly_sensitive"),
        entities.alias("entities"),
        F.lit(None).cast(_NULL_MEDIA).alias("extended_entities"),
        F.lit(None).cast(_NULL_EXTENDED).alias("extended_tweet"),
        ((doc_id % 10) + fav_bonus).cast("long").alias("favorite_count"),
        (doc_id % 5).cast("long").alias("quote_count"),
        (doc_id % 7).cast("long").alias("reply_count"),
        (doc_id % 13).cast("long").alias("retweet_count"),
        user.alias("user"),
        F.lit("en").alias("lang"),
    )


def tweets_from_documents(docs: DataFrame) -> DataFrame:
    """Nested raw-tweet DataFrame: one observation per document plus a later
    re-observation (higher counts) for every 7th doc.

    If ``docs`` carries an optional ``org_doc_id`` column, the INNER
    (quoted/retweeted) status takes that id instead of ``doc_id`` — many
    outer observations then share one org_id, which is exactly a celebrity
    tweet retweeted en masse. Used by :func:`scaled_tweet_corpus`'s
    ``hot_pct`` to synthesize the skewed-dedup bench corpus; absent the
    column, behavior is unchanged (org id == doc_id)."""
    # re-observations only for retweet/quote branches: an original's org_id
    # IS its samp_id, so a "re-observation" would be a different tweet.
    has_org = "org_doc_id" in docs.columns
    cols = ["doc_id", "text"] + (["org_doc_id"] if has_org else [])
    base = docs.select(*cols, F.lit(0).alias("re_obs")).unionByName(
        docs.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") % 3 != 0)).select(
            *cols, F.lit(1).alias("re_obs")
        )
    )
    return base.select(*_tweet_exprs(has_org))


@functools.cache
def _tweet_exprs(has_org: bool) -> tuple:
    """The nested-tweet select list, built ONCE per process per variant
    (r11): two full ``_mk_status`` struct trees are ~0.5 s of py4j round
    trips per construction, previously paid on every call — every bench
    trial and every streaming micro-batch. Pure unresolved Column trees
    (no DataFrame binding); resolution still happens per-plan."""
    doc_id = F.col("doc_id")
    org_doc = F.col("org_doc_id") if has_org else doc_id
    text = F.col("text")
    branch = doc_id % 3
    org_epoch = F.lit(EPOCH_2022) + doc_id
    samp_epoch = org_epoch + 3600 + F.col("re_obs") * 7200
    fav_bonus = F.col("re_obs") * 5

    org = _mk_status(org_doc, text, org_epoch, fav_bonus)
    samp_id = doc_id + 1000000 + F.col("re_obs") * 1000000

    # the sampled (outer) status: for originals it IS the org status but with
    # the outer id/created_at; for retweets/quotes the outer text is noise.
    outer_text = F.when(branch == 0, text).otherwise(F.lit("RT noise"))
    outer = _mk_status(samp_id, outer_text, samp_epoch, fav_bonus)

    struct_t = org  # same type for quoted/retweeted slots
    return (
        *[
            outer.getField(f).alias(f)
            for f in (
                "created_at", "truncated", "entities",
                "extended_entities", "extended_tweet", "favorite_count",
                "quote_count", "reply_count", "retweet_count", "lang",
            )
        ],
        samp_id.alias("id"),
        outer_text.alias("text"),
        # originals carry the org's sensitive flag + counts + user at top level
        F.when(branch == 0, doc_id % 11 == 3).otherwise(F.lit(False)).alias(
            "possibly_sensitive"
        ),
        F.when(branch == 0, org.getField("user")).otherwise(
            outer.getField("user")
        ).alias("user"),
        (branch == 2).alias("is_quote_status"),
        F.when(branch == 2, struct_t).alias("quoted_status"),
        F.when(branch == 1, struct_t).alias("retweeted_status"),
        F.when(
            branch == 2,
            F.struct(
                F.concat(F.lit("https://p/"), doc_id.cast("string")).alias("expanded")
            ),
        ).alias("quoted_status_permalink"),
    )


def scaled_tweet_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    target_mb: int = 120,
    files: int = 32,
    hot_pct: int = 0,
) -> tuple[str, float]:
    """Materialize a >= ``target_mb`` raw-tweet corpus as JSON on disk, for
    benchmarking the end-to-end preprocess pipeline at the reference's
    measured volume (BASELINE.md Fig. 10: ~90 s per 100 MB).

    The corpus replicates the ``documents`` fixture with doc_id offsets (every
    replica gets distinct org/samp ids, so dedup/join cardinalities scale
    linearly — no artificial hot keys). Written as JSON Lines across
    ``files`` files: unlike the reference's multiLine JSON arrays (one
    non-splittable task per file), JSONL splits by byte range — the format a
    100 TB deployment would use.

    ``hot_pct`` > 0 makes that percentage of all rows (retweet-branch rows
    with ``doc_id % 30`` in the first hot_pct/10*3 residues ≡ 1 mod 3)
    re-observations of ONE celebrity org — the skewed-dedup stress corpus
    (verdict r3 ask #4): latest-wins then sees a single org_id carrying
    ~hot_pct% of the corpus.

    Idempotent: returns the cached corpus if present (a _SIZE marker records
    bytes). Returns (path, size_mb).
    """
    marker = os.path.join(out_dir, "_SIZE")
    if os.path.exists(marker):
        return out_dir, float(open(marker).read().strip())

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    # measure per-row JSON bytes on one replica, then scale replication
    probe_dir = out_dir + "__probe"
    probe = tweets_from_documents(docs)
    probe.write.mode("overwrite").json(probe_dir)
    probe_bytes = sum(
        os.path.getsize(os.path.join(probe_dir, f))
        for f in os.listdir(probe_dir)
        if f.endswith(".json")
    )
    replicas = max(1, -(-target_mb * 1024 * 1024 // probe_bytes))  # ceil

    replicated = docs.crossJoin(
        spark.range(replicas).select(F.col("id").alias("rep"))
    ).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "text",
    )
    if hot_pct:
        # residues {1, 4, 7, ...} mod 30 are all ≡ 1 mod 3 (retweet branch,
        # so org_id comes from the INNER status we override); each residue
        # adds 1/30 ≈ 3.33% of rows to the celebrity key
        residues = [1 + 3 * i for i in range(max(1, round(hot_pct / (100 / 30))))]
        is_hot = (F.col("doc_id") % 30).isin(residues)
        replicated = replicated.withColumn(
            "org_doc_id", F.when(is_hot, F.lit(7)).otherwise(F.col("doc_id"))
        )
    tweets = tweets_from_documents(replicated)
    tweets.repartition(files).write.mode("overwrite").json(out_dir)

    import shutil

    shutil.rmtree(probe_dir, ignore_errors=True)
    size = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
        if f.endswith(".json")
    )
    size_mb = round(size / (1024 * 1024), 1)
    with open(marker, "w") as fh:
        fh.write(str(size_mb))
    return out_dir, size_mb
