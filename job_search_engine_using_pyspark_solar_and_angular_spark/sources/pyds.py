"""Custom Python Data Source (Spark 4 DataSource API): the extension
contract for formats Spark has no native reader for.

The reference ingests its corpus through an external indexer process
(`Main/SolrIndexer.java` walks files and pushes documents row by row);
the Spark-4-native equivalent of "teach the engine a new format" is a
``pyspark.sql.datasource.DataSource`` — registered once per session,
then ``spark.read.format("tweets_jsonl")`` behaves like any built-in
source: lazy, partitioned, schema-first, usable in SQL via a temp view.

``TweetsJsonlDataSource`` reads the flattened tweet-export JSONL this
repo's preprocess pipeline writes: one InputPartition PER FILE (files are
the natural split unit of line-delimited JSON; a production source would
further split by byte ranges exactly like Spark's native text source),
each partition streaming its lines through ``json.loads`` and yielding
tuples in declared-schema order.

This is deliberately the EXTENSION HOOK demo, not the hot path: for
formats Spark already reads natively (JSON/CSV/parquet), the native
reader is JVM-side and faster — pinned by the parity test
(tests/test_sources_catalog.py) which requires this source to return
row-identical frames to ``spark.read.json`` with the same schema. The
value is the contract: partition planning on the driver, per-partition
iterators on executors, no driver-side data movement.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T


def flat_jsonl_schema() -> T.StructType:
    """id/text/lang/created_ts — the minimal flat export contract."""
    return T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("created_ts", T.StringType()),
        ]
    )


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TweetsJsonlReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("tweets_jsonl: 'path' option is required")

    def partitions(self):
        # one partition per file: planned driver-side from listing only
        # (never file contents); executors open their own file handles
        if os.path.isdir(self._path):
            files = sorted(
                os.path.join(self._path, f)
                for f in os.listdir(self._path)
                if f.endswith((".json", ".jsonl"))
            )
        else:
            files = [self._path]
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition):
        names = [f.name for f in self._schema.fields]
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(n) for n in names)


class TweetsJsonlDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tweets_jsonl"

    def schema(self) -> T.StructType:
        return flat_jsonl_schema()

    def reader(self, schema: T.StructType) -> TweetsJsonlReader:
        return TweetsJsonlReader(schema, self.options)

    def simpleStreamReader(self, schema: T.StructType):
        return TweetsJsonlStreamReader(schema, self.options)


def register(spark) -> None:
    """Idempotent session registration; after this,
    ``spark.read.format("tweets_jsonl").option("path", dir)`` works."""
    spark.dataSource.register(TweetsJsonlDataSource)


class TweetsJsonlStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the custom source: micro-batch tailing of a
    growing JSONL directory. ``SimpleDataSourceStreamReader`` is the
    driver-side variant (reads happen on the driver, suited to control-rate
    feeds like the reference's tweet poller — the reference polls the
    Twitter API on one node too, `Main/TwitterConsumer.java`); bulk
    replayable history belongs to the partitioned batch reader above.

    Offset contract (JSON dict, as the API requires):
        {"files": {<path>: <bytes consumed>}}

    Offsets are keyed BY FILE PATH, never by position in a sorted listing —
    with positional offsets, a late-arriving file that sorts before an
    existing one shifts every index, applying one file's byte offset to
    another (duplicate and corrupt reads). Path keys make each file's
    progress independent of what else appears in the directory.

    Byte offsets only ever land on line boundaries: ``latestOffset`` caps
    each file at the position after its last newline (``_complete_size``),
    so a partially-appended trailing line is never cut mid-bytes — it stays
    unconsumed and is delivered by the batch after its newline arrives.
    (Consequence: a final line is delivered once newline-terminated, which
    is how the preprocess export writes JSONL.) Since every (lo, hi) range
    starts and ends at line boundaries, UTF-8 sequences never split across
    reads. Restart-from-checkpoint resumes at exact per-file positions —
    exactly-once delivery into an idempotent sink."""

    def __init__(self, schema: T.StructType, options: dict):
        self._schema = schema
        self._path = options.get("path")
        if not self._path:
            raise ValueError("tweets_jsonl stream: 'path' option is required")

    def _files(self):
        if not os.path.isdir(self._path):
            return [self._path] if os.path.exists(self._path) else []
        return sorted(
            os.path.join(self._path, f)
            for f in os.listdir(self._path)
            if f.endswith((".json", ".jsonl"))
        )

    @staticmethod
    def _complete_size(path: str) -> int:
        """Position just past the LAST newline in the file — the greatest
        offset that is guaranteed to be a line boundary. Scans backwards in
        chunks; the common case (file ends with a newline) reads one
        chunk."""
        size = os.path.getsize(path)
        if size == 0:
            return 0
        with open(path, "rb") as fh:
            pos = size
            chunk = 65536
            while pos > 0:
                lo = max(0, pos - chunk)
                fh.seek(lo)
                buf = fh.read(pos - lo)
                nl = buf.rfind(b"\n")
                if nl >= 0:
                    return lo + nl + 1
                pos = lo
        return 0

    @staticmethod
    def _file_map(offset) -> dict:
        if "files" in offset:
            return offset["files"]
        # legacy positional offset: only the zero offset is translatable
        if offset.get("file_idx") == 0 and offset.get("byte") == 0:
            return {}
        raise ValueError(
            "tweets_jsonl stream: positional offset checkpoints "
            f"({offset!r}) are not resumable under path-keyed offsets; "
            "restart the query with a fresh checkpoint"
        )

    def initialOffset(self):
        return {"files": {}}

    def latestOffset(self):
        return {"files": {p: self._complete_size(p) for p in self._files()}}

    def read(self, start):
        end = self.latestOffset()
        return list(self._rows_between(start, end)), end

    def readBetweenOffsets(self, start, end):
        return list(self._rows_between(start, end))

    def _rows_between(self, start, end):
        starts = self._file_map(start)
        ends = self._file_map(end)
        names = [f.name for f in self._schema.fields]
        for path in sorted(ends):
            lo = starts.get(path, 0)
            hi = ends[path]
            if hi <= lo or not os.path.exists(path):
                continue
            with open(path, "rb") as fh:
                fh.seek(lo)
                chunk = fh.read(hi - lo)
            for line in chunk.decode("utf-8").splitlines():
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                yield tuple(rec.get(n) for n in names)
