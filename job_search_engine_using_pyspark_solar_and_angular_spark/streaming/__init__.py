"""Structured Streaming front door (SURVEY.md §2.11).

The reference has no streaming engine — it simulates micro-batches with a
tweepy file listener (``Data Collection/DataCollector.py:41-46``, 7200 s
rotation) plus a per-file driver loop
(``Spark/Tweets_preprocessing.py:605-621``) and re-indexes each batch with a
Java HashMap latest-wins upsert (``Main/SolrIndexer.java:25-45``). This
package replaces all three with Structured Streaming primitives.
"""

from .jobs import (
    dedup_gate_sink,
    latest_wins_merge_sink,
    stream_parquet,
    stream_stream_join,
    streaming_dedup,
    trending_topk,
    windowed_counts,
)

__all__ = [
    "dedup_gate_sink",
    "latest_wins_merge_sink",
    "stream_parquet",
    "stream_stream_join",
    "streaming_dedup",
    "trending_topk",
    "windowed_counts",
]
