"""Tests for the tweet preprocessing pipeline (plans/preprocess.py) against a
deterministic synthesized raw-tweet fixture.

The driver fixtures have no tweet-shaped nested JSON, so this suite builds a
tiny corpus exercising every branch of the reference pipeline
(``Spark/Tweets_preprocessing.py:102-507``): quoted / retweet / original,
truncated / untruncated, sensitive drops, duplicate observations with growing
engagement counts, and the hiring-vocabulary filter. Expected values are
asserted literally (hand-computed), mirroring the reference's own invariants:
post-dedup key uniqueness (``:470``), split disjointness, merge idempotence.
"""

from __future__ import annotations

import json

import pytest

from job_search_engine_using_pyspark_solar_and_angular_spark.operators.dedup import (
    latest_wins,
)
from job_search_engine_using_pyspark_solar_and_angular_spark.plans.preprocess import (
    flatten_tweets,
    hiring_filter,
    preprocess,
    write_outputs,
)
from job_search_engine_using_pyspark_solar_and_angular_spark.sources.tweets import (
    read_tweets,
    tweet_schema,
)


def _user(uid, name):
    return {
        "id": uid,
        "name": name,
        "screen_name": name.lower(),
        "verified": uid % 2 == 0,
        "profile_image_url": f"http://img/{uid}",
        "profile_banner_url": None,
        "profile_background_image_url": None,
        "followers_count": uid * 10,
        "friends_count": uid * 3,
    }


def _status(sid, created, text, uid=1, uname="Alice", truncated=False,
            full_text=None, hashtags=(), mentions=(), urls=(), media=(),
            sensitive=None, counts=(0, 0, 0, 0)):
    s = {
        "id": sid,
        "created_at": created,
        "text": text,
        "truncated": truncated,
        "possibly_sensitive": sensitive,
        "entities": {
            "hashtags": [{"text": h} for h in hashtags],
            "urls": [{"expanded_url": u} for u in urls],
            "user_mentions": [{"screen_name": m} for m in mentions],
        },
        "extended_entities": {
            "media": [
                {"media_url": m, "expanded_url": m + "?x", "type": "photo"}
                for m in media
            ]
        }
        if media
        else None,
        "extended_tweet": {
            "full_text": full_text,
            "entities": {
                "hashtags": [{"text": h} for h in hashtags],
                "urls": [{"expanded_url": u} for u in urls],
                "user_mentions": [{"screen_name": m} for m in mentions],
            },
            "extended_entities": None,
        }
        if full_text
        else None,
        "favorite_count": counts[0],
        "quote_count": counts[1],
        "reply_count": counts[2],
        "retweet_count": counts[3],
        "user": _user(uid, uname),
        "lang": "en",
    }
    return s


def _fixture_tweets():
    """9 sampled statuses -> expected post-preprocess originals."""
    t = []

    # 1. plain original, matches hiring vocab
    t.append(
        {
            **_status(101, "Mon Apr 04 10:00:00 +0000 2022",
                      "We are hiring a data engineer", uid=1, uname="Acme",
                      hashtags=("jobs",), counts=(5, 0, 1, 2)),
            "is_quote_status": False,
            "quoted_status": None,
            "retweeted_status": None,
            "quoted_status_permalink": None,
        }
    )
    # 2. same original observed LATER via a retweet with higher counts ->
    #    latest-wins must keep this version
    t.append(
        {
            **_status(202, "Mon Apr 04 12:00:00 +0000 2022", "RT ..."),
            "is_quote_status": False,
            "quoted_status": None,
            "retweeted_status": _status(
                101, "Mon Apr 04 10:00:00 +0000 2022",
                "We are hiring a data engineer", uid=1, uname="Acme",
                hashtags=("jobs",), counts=(9, 1, 2, 7)),
            "quoted_status_permalink": None,
        }
    )
    # 3. quoted status (hiring), with permalink
    t.append(
        {
            **_status(303, "Mon Apr 04 11:00:00 +0000 2022", "look at this",
                      uid=3, uname="Carol"),
            "is_quote_status": True,
            "quoted_status": _status(
                150, "Sun Apr 03 09:30:00 +0000 2022",
                "Join our team as an SRE", uid=4, uname="Dave",
                mentions=("bob",), counts=(1, 0, 0, 0)),
            "retweeted_status": None,
            "quoted_status_permalink": {"expanded": "https://t.co/q150"},
        }
    )
    # 4. truncated original: full text (hiring) lives in extended_tweet
    t.append(
        {
            **_status(104, "Mon Apr 04 13:00:00 +0000 2022",
                      "Open position for a Spark dev, apply…", uid=5,
                      uname="Eve", truncated=True,
                      full_text="Open position for a Spark developer, apply now at example.com",
                      urls=("https://example.com/careers",)),
            "is_quote_status": False,
            "quoted_status": None,
            "retweeted_status": None,
            "quoted_status_permalink": None,
        }
    )
    # 5. sensitive original -> dropped
    t.append(
        {
            **_status(105, "Mon Apr 04 14:00:00 +0000 2022",
                      "hiring but marked sensitive", sensitive=True),
            "is_quote_status": False,
            "quoted_status": None,
            "retweeted_status": None,
            "quoted_status_permalink": None,
        }
    )
    # 6. original that does NOT match hiring vocab -> dropped by filter
    t.append(
        {
            **_status(106, "Mon Apr 04 15:00:00 +0000 2022",
                      "just had a great lunch", uid=6, uname="Frank"),
            "is_quote_status": False,
            "quoted_status": None,
            "retweeted_status": None,
            "quoted_status_permalink": None,
        }
    )
    # 7. retweet of a sensitive status -> dropped
    t.append(
        {
            **_status(207, "Mon Apr 04 16:00:00 +0000 2022", "RT ..."),
            "is_quote_status": False,
            "quoted_status": None,
            "retweeted_status": _status(
                151, "Mon Apr 04 08:00:00 +0000 2022",
                "now accepting applications", sensitive=True),
            "quoted_status_permalink": None,
        }
    )
    # 8. apostrophe normalization: U+2019 in "we’re looking for"
    t.append(
        {
            **_status(108, "Mon Apr 04 17:00:00 +0000 2022",
                      "We’re looking for a compiler engineer", uid=7,
                      uname="Grace", media=("http://m/8",)),
            "is_quote_status": False,
            "quoted_status": None,
            "retweeted_status": None,
            "quoted_status_permalink": None,
        }
    )
    # 9. null is_quote_status + retweeted_status present -> retweet branch
    t.append(
        {
            **_status(209, "Mon Apr 04 18:00:00 +0000 2022", "RT ..."),
            "is_quote_status": None,
            "quoted_status": None,
            "retweeted_status": _status(
                152, "Mon Apr 04 07:00:00 +0000 2022",
                "vacancy: senior analyst", uid=8, uname="Heidi"),
            "quoted_status_permalink": None,
        }
    )
    return t


@pytest.fixture(scope="module")
def raw(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("tweets")
    f = path / "output1.json"
    f.write_text(json.dumps(_fixture_tweets()))
    return read_tweets(spark, str(f), multiline=True)


def test_schema_is_stable(raw):
    assert raw.schema == tweet_schema()
    assert raw.count() == 9


def test_flatten_branches_disjoint_and_complete(raw):
    flat = flatten_tweets(raw)
    # 9 inputs - 2 sensitive (105, RT of 151) = 7 flat rows
    assert flat.count() == 7
    # reference invariant: branch split is disjoint on samp_id
    assert flat.select("samp_id").distinct().count() == 7


def test_flatten_values(raw):
    rows = {r["org_id"]: r for r in flatten_tweets(raw).collect()}
    # quoted branch: org fields come from quoted_status, url from permalink
    q = rows[150]
    assert q["samp_id"] == 303
    assert q["org_url"] == "https://t.co/q150"
    assert q["org_text"] == "Join our team as an SRE"
    assert q["org_user_metions"] == ["bob"]
    assert q["user_name"] == "Dave"
    # truncated original: full_text wins, links from extended entities
    tr = rows[104]
    assert tr["org_text"].startswith("Open position for a Spark developer")
    assert tr["org_attached_links"] == ["https://example.com/careers"]
    # media url/type arrays + first-media org_url for original branch
    m = rows[108]
    assert m["org_media_url"] == ["http://m/8"]
    assert m["org_media_type"] == ["photo"]
    assert m["org_url"] == "http://m/8?x"
    # null is_quote_status routed to retweet branch
    assert rows[152]["samp_id"] == 209


def test_latest_wins_keeps_freshest_counts(raw):
    out = preprocess(raw)
    r101 = {r["org_id"]: r for r in out.collect()}[101]
    # the 12:00 retweet observation (counts 9,1,2,7) beats the 10:00 direct one
    assert r101["samp_id"] == 202
    assert r101["org_favorite_count"] == 9
    assert r101["org_retweet_count"] == 7


def test_dedup_uniqueness_invariant(raw):
    """Reference assert at ``Tweets_preprocessing.py:470``."""
    out = preprocess(raw)
    assert out.groupBy("org_id").count().filter("count > 1").count() == 0


def test_hiring_filter_and_apostrophes(raw):
    out = preprocess(raw)
    ids = {r["org_id"] for r in out.select("org_id").collect()}
    # 106 (lunch) filtered out; 108 kept via unicode-apostrophe normalization
    assert ids == {101, 150, 104, 108, 152}


def test_preprocess_idempotent(raw):
    """Re-running dedup over its own output is a no-op (D2 idempotence)."""
    once = preprocess(raw)
    again = latest_wins(
        once.unionByName(once), ["org_id"], "samp_datetime", ["samp_id"]
    )
    assert sorted(r["org_id"] for r in again.collect()) == sorted(
        r["org_id"] for r in once.collect()
    )


def test_timestamp_parse(raw):
    out = flatten_tweets(raw)
    r = {x["org_id"]: x for x in out.collect()}[150]
    assert str(r["org_datetime"]) == "2022-04-03 09:30:00"
    assert str(r["samp_datetime"]) == "2022-04-04 11:00:00"


def test_write_outputs_roundtrip(raw, spark, tmp_path):
    out = preprocess(raw)
    pq = str(tmp_path / "pq")
    csv = str(tmp_path / "csv")
    write_outputs(out, pq, csv)
    back = spark.read.parquet(pq)
    assert back.count() == out.count()
    # parquet keeps typed arrays
    assert dict(back.dtypes)["org_hashtags"] == "array<string>"
    # csv has stringified arrays + string ids
    csv_back = spark.read.option("header", True).csv(csv)
    assert csv_back.count() == out.count()
    row = {r["org_id"]: r for r in csv_back.collect()}["101"]
    assert row["org_hashtags"] == '["jobs"]'


def test_skewed_corpus_hot_key_dedups_to_one_row(spark):
    """The hot_pct generator path (bench's preprocess_skewed corpus): ~10% of
    retweet-branch rows share ONE celebrity org_id, and the skew-proof
    latest-wins still reduces that key to exactly one output row."""
    from pyspark.sql import functions as F

    from job_search_engine_using_pyspark_solar_and_angular_spark.sources.synthetic import (
        tweets_from_documents,
    )

    docs = spark.range(600).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("hiring text "), F.col("id").cast("string")).alias("text"),
    )
    residues = [1, 4, 7]
    hot = (F.col("doc_id") % 30).isin(residues)
    skewed = docs.withColumn(
        "org_doc_id", F.when(hot, F.lit(7)).otherwise(F.col("doc_id"))
    )
    out = preprocess(tweets_from_documents(skewed), apply_hiring_filter=False)
    by_org = {r["org_id"]: r["cnt"] for r in
              out.groupBy("org_id").count().withColumnRenamed("count", "cnt").collect()}
    assert all(c == 1 for c in by_org.values())  # dedup invariant holds
    assert 7 in by_org  # the celebrity org survived as one row
    # the hot key really was hot pre-dedup: 60/600 base rows (+ re-obs)
    flat = flatten_tweets(tweets_from_documents(skewed))
    n_hot = flat.filter(F.col("org_id") == 7).count()
    assert n_hot >= 60, n_hot


def test_write_outputs_string_partition_values_survive_csv(spark, tmp_path):
    """ADVICE r11: the CSV read-back must not re-infer partition column
    types from directory names — a string partition value like '00123'
    would round-trip as int 123 -> '123'. write_outputs disables partition
    type inference for the read-back, so values come back as written."""
    from job_search_engine_using_pyspark_solar_and_angular_spark.plans.preprocess import (
        write_outputs,
    )

    df = spark.createDataFrame(
        [(1, "a", "00123"), (2, "b", "00123"), (3, "c", "7")],
        "org_id long, org_text string, ingest_day string",
    )
    pq = str(tmp_path / "pq_part")
    csv = str(tmp_path / "csv_part")
    write_outputs(df, pq, csv, partition_by=["ingest_day"])
    back = spark.read.option("header", True).csv(csv)
    got = {r["org_id"]: r["ingest_day"] for r in back.collect()}
    assert got == {"1": "00123", "2": "00123", "3": "7"}
