"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step is a STUB (the container has no image/audio libraries): it
extracts deterministic pseudo-features (byte length, sha256 prefix, a fake
"dimension" derived from the header bytes) so the Spark-side contract —
schema, batch shape, partitioning, UDF signature — is real and tested. Swap
``_decode_stub`` for PIL/librosa/ffmpeg calls in production; nothing else
changes.

Scale notes: binary payloads ride in parquet as byte arrays; ``mapInPandas``
streams Arrow record batches so a 100 TB corpus decodes at
(n_cores x batch) parallelism with constant memory. Keep payloads out of
shuffles: derive features first, shuffle features only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("meta_json", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("sha256_16", StringType(), True),
        StructField("fake_width", LongType(), True),
        StructField("fake_height", LongType(), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "image"
) -> DataFrame:
    """Build a media table from any fixture table by treating UTF-8 text bytes
    as the opaque payload — deterministic stand-in for real blobs, letting the
    binary path be correctness-tested against an oracle (octet_length/sha)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.col(text_col).cast("binary").alias("payload"),
        F.to_json(F.struct(F.length(F.col(text_col)).alias("n_chars"))).alias("meta_json"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake decode: 'dimensions' from the first payload bytes.
    Replace with a real decoder (PIL.Image.open etc.) in production."""
    if not payload:
        return (0, 0)
    h = hashlib.sha256(payload).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas."""
    from ..io import ensure_parallelism

    media = ensure_parallelism(media)  # Python workers scale with partitions

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            dims = [_decode_stub(p if p is not None else b"") for p in payloads]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "sha256_16": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()[:16]
                        for p in payloads
                    ],
                    "fake_width": [d[0] for d in dims],
                    "fake_height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize contract: passes payload through the decode stub and re-emits it
    unchanged with target dims in metadata. A real implementation decodes,
    resizes, re-encodes inside the same mapInPandas shape."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["meta_json"] = [
                f'{{"resized_to":[{width},{height}]}}' for _ in range(len(pdf))
            ]
            yield out

    return media.mapInPandas(_batches, schema=MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling contract (1 row in -> k frame rows out),
    demonstrating the fan-out mapInPandas shape. Frames are fake (payload
    slices); a real implementation uses ffmpeg per batch."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_no", LongType(), False),
            StructField("frame_payload", BinaryType(), True),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, frames, payloads = [], [], []
            for _, row in pdf.iterrows():
                p = row["payload"] or b""
                n_frames = max(len(p) // max(every_n, 1), 1)
                for fno in range(min(n_frames, 8)):
                    ids.append(row["media_id"])
                    frames.append(fno)
                    payloads.append(p[fno * every_n : (fno + 1) * every_n])
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frames, "frame_payload": payloads}
            )

    return media.mapInPandas(_batches, schema=out_schema)


def decode_real(media: DataFrame) -> DataFrame:
    """Placeholder for a real decoder; raises until a decoder lib is present."""
    raise NotImplementedError(
        "No image/audio codec libraries in this environment. "
        "Swap _decode_stub in extract_features for PIL/librosa/ffmpeg."
    )


def audio_chunk_stub(
    media: DataFrame,
    sample_rate_hz: int = 16_000,
    chunk_ms: int = 30_000,
    overlap_ms: int = 5_000,
) -> DataFrame:
    """ASR-prep audio chunking contract: 1 audio row -> k overlapping
    fixed-duration chunk rows (chunk_no, start_ms, end_ms, chunk_payload),
    byte ranges computed from PCM16 framing (2 bytes/sample) — the
    Whisper-style 30s/5s-overlap windowing. The chunk math is real and
    deterministic (boundary/overlap invariants pinned in tests); a real
    implementation only swaps the byte-slice for a codec-aware splitter
    inside the same Arrow batch shape. Row-local fan-out: no shuffle until
    a downstream operator keys on the chunks."""
    bytes_per_ms = sample_rate_hz * 2 // 1000
    step_ms = chunk_ms - overlap_ms
    assert step_ms > 0, "overlap must be shorter than the chunk"
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("chunk_no", LongType(), False),
            StructField("start_ms", LongType(), False),
            StructField("end_ms", LongType(), False),
            StructField("chunk_payload", BinaryType(), True),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, chunks, starts, ends, payloads = [], [], [], [], []
            for _, row in pdf.iterrows():
                p = row["payload"] or b""
                dur_ms = max(len(p) // max(bytes_per_ms, 1), 1)
                cno, start = 0, 0
                while start < dur_ms:
                    end = min(start + chunk_ms, dur_ms)
                    ids.append(row["media_id"])
                    chunks.append(cno)
                    starts.append(start)
                    ends.append(end)
                    payloads.append(
                        p[start * bytes_per_ms : end * bytes_per_ms]
                    )
                    if end >= dur_ms:
                        break
                    start += step_ms
                    cno += 1
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "chunk_no": chunks,
                    "start_ms": starts,
                    "end_ms": ends,
                    "chunk_payload": payloads,
                }
            )

    return media.mapInPandas(_batches, schema=out_schema)
