"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed through Arrow-batched ``mapInPandas``
(reference media-enrichment hook: ``Main/SolrIndexer.java:115-129``).

The decode step is REAL since r4: dependency-free byte-level parsers for the
uncompressed classics (PPM/P6, 24-bit BMP, PCM16 WAV — see
``functions/codecs.py``) run inside the Arrow batches, so width/height and
channel means come from actual raster bytes and sample stats from actual PCM
frames. Compressed formats (JPEG/PNG/MP3) still need a codec lib the
container doesn't have; :func:`extract_features` degrades them (and any
unrecognized payload) to byte-level stats, :func:`decode_strict` raises.
Swapping in PIL/ffmpeg on a real cluster changes only the per-payload decode
call — schema, batch shape, partitioning are identical.

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

from ..functions import codecs

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
        StructField("format", StringType(), True),  # ppm|bmp|wav|unknown
        StructField("n_bytes", LongType(), True),
        StructField("sha256_16", StringType(), True),
        # image stats (null for non-images)
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_pixels", LongType(), True),
        StructField("mean_r", LongType(), True),
        StructField("mean_g", LongType(), True),
        StructField("mean_b", LongType(), True),
        # audio stats (null for non-audio)
        StructField("sample_rate", LongType(), True),
        StructField("channels", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("peak", LongType(), True),
        StructField("rms", LongType(), True),
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


def encode_solid_ppm_payloads(params: DataFrame) -> DataFrame:
    """Synthesize a REAL image corpus: one solid-color P6 PPM per input row
    from columns (media_id, width, height, r, g, b) — the encoder writes an
    actual Netpbm header + raster, so downstream decode exercises the real
    parser. Solid fill keeps every derived stat a closed-form function of
    the parameters (exact SQL oracle) while the decoder still reads every
    raster byte. Row-local mapInPandas fan-through, no shuffle."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for w, h, r, g, b in zip(
                pdf["width"], pdf["height"], pdf["r"], pdf["g"], pdf["b"]
            ):
                w, h = int(w), int(h)
                payloads.append(
                    codecs.encode_ppm(w, h, bytes((int(r), int(g), int(b))) * (w * h))
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": ["image"] * len(pdf),
                    "payload": payloads,
                    "meta_json": [None] * len(pdf),
                }
            )

    return params.mapInPandas(_batches, schema=MEDIA_SCHEMA)


def encode_tone_wav_payloads(params: DataFrame, sample_rate: int = 8000) -> DataFrame:
    """Synthesize a REAL audio corpus: one PCM16 WAV per input row from
    columns (media_id, n_samples, amp_a, amp_b) — a square-ish alternating
    wave (+amp_a, -amp_b, ...) written through the real RIFF encoder. The
    alternation keeps peak/RMS closed-form (exact SQL oracle: peak =
    max(a, b), rms = isqrt((ceil(n/2)*a^2 + floor(n/2)*b^2) // n)) while the
    decoder still parses the fmt chunk and unpacks every frame."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for n, a, b in zip(pdf["n_samples"], pdf["amp_a"], pdf["amp_b"]):
                n, a, b = int(n), int(a), int(b)
                samples = [a if i % 2 == 0 else -b for i in range(n)]
                payloads.append(codecs.encode_wav(samples, sample_rate, 1))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": ["audio"] * len(pdf),
                    "payload": payloads,
                    "meta_json": [None] * len(pdf),
                }
            )

    return params.mapInPandas(_batches, schema=MEDIA_SCHEMA)


def _feature_row(media_id, media_type, payload: bytes) -> dict:
    row = {
        "media_id": media_id,
        "media_type": media_type,
        "format": "unknown",
        "n_bytes": len(payload),
        "sha256_16": hashlib.sha256(payload).hexdigest()[:16],
        "width": None,
        "height": None,
        "n_pixels": None,
        "mean_r": None,
        "mean_g": None,
        "mean_b": None,
        "sample_rate": None,
        "channels": None,
        "n_samples": None,
        "peak": None,
        "rms": None,
    }
    try:
        dec = codecs.decode(payload)
    except ValueError:
        # recognized compressed format — keep byte stats, record the name
        row["format"] = codecs.sniff(payload)
        return row
    if dec is None:
        return row
    row["format"] = dec["format"]
    if "pixels" in dec:
        row["width"] = dec["width"]
        row["height"] = dec["height"]
        row.update(codecs.image_stats(dec))
    else:
        row.update(codecs.audio_stats(dec))
    return row


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL feature extraction over binary payloads via
    mapInPandas: PPM/BMP rasters -> dimensions + integer-exact channel
    means; PCM16 WAV -> sample_rate/channels/n_samples/peak/isqrt-RMS;
    anything else -> byte-level stats with null media fields."""
    from ..io import ensure_parallelism

    media = ensure_parallelism(media)  # Python workers scale with partitions

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                _feature_row(mid, mtype, bytes(p) if p is not None else b"")
                for mid, mtype, p in zip(
                    pdf["media_id"], pdf["media_type"], pdf["payload"]
                )
            ]
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def decode_strict(media: DataFrame) -> DataFrame:
    """Production-facing strict decode: like :func:`extract_features` but an
    unrecognized or compressed payload RAISES (per-batch, surfacing the
    media_id) instead of degrading to byte stats — the mode for pipelines
    that must not silently pass undecoded media downstream."""
    from ..io import ensure_parallelism

    media = ensure_parallelism(media)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, mtype, p in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                payload = bytes(p) if p is not None else b""
                kind = codecs.sniff(payload)
                if kind not in ("ppm", "bmp", "wav"):
                    raise ValueError(
                        f"decode_strict: media_id={mid} has "
                        f"{'unrecognized' if kind is None else kind} payload; "
                        "supported here: ppm, bmp, wav"
                    )
                rows.append(_feature_row(mid, mtype, payload))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL nearest-neighbor resize for decodable images (PPM/BMP), decoded,
    resampled (integer source-index mapping — engine-exact), and re-encoded
    in their original container inside one mapInPandas pass. Non-image
    payloads pass through byte-identical with ``resize_skipped`` metadata,
    so mixed corpora survive the operator."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for p in pdf["payload"]:
                payload = bytes(p) if p is not None else b""
                kind = codecs.sniff(payload)
                if kind in ("ppm", "bmp"):
                    dec = codecs.decode(payload)
                    res = codecs.resize_nearest(dec, width, height)
                    enc = (
                        codecs.encode_ppm(width, height, res["pixels"])
                        if kind == "ppm"
                        else codecs.encode_bmp(width, height, res["pixels"])
                    )
                    payloads.append(enc)
                    metas.append(f'{{"resized_to":[{width},{height}]}}')
                else:
                    payloads.append(payload)
                    metas.append('{"resize_skipped":true}')
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": payloads,
                    "meta_json": metas,
                }
            )

    return media.mapInPandas(_batches, schema=MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling contract (1 row in -> k frame rows out),
    demonstrating the fan-out mapInPandas shape. Frames are byte slices (the
    container has no video codec); a real implementation uses ffmpeg per
    batch inside the same shape."""
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


def audio_chunk(
    media: DataFrame,
    sample_rate_hz: int = 16_000,
    chunk_ms: int = 30_000,
    overlap_ms: int = 5_000,
) -> DataFrame:
    """ASR-prep audio chunking: 1 audio row -> k overlapping fixed-duration
    chunk rows (chunk_no, start_ms, end_ms, chunk_payload) — the
    Whisper-style 30s/5s-overlap windowing.

    WAV payloads are chunked from their REAL header since r4: the fmt chunk
    supplies sample rate/channels (``sample_rate_hz`` is ignored), slicing
    is block-aligned within the data chunk only (headers never leak into
    chunk payloads). Headerless payloads are treated as raw mono PCM16 at
    ``sample_rate_hz`` — the documented raw mode. Row-local fan-out: no
    shuffle until a downstream operator keys on the chunks."""
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

    def _chunk_region(pcm: bytes, bytes_per_ms: int):
        dur_ms = max(len(pcm) // max(bytes_per_ms, 1), 1)
        cno, start = 0, 0
        while start < dur_ms:
            end = min(start + chunk_ms, dur_ms)
            yield cno, start, end, pcm[start * bytes_per_ms : end * bytes_per_ms]
            if end >= dur_ms:
                break
            start += step_ms
            cno += 1

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, chunks, starts, ends, payloads = [], [], [], [], []
            for _, row in pdf.iterrows():
                p = bytes(row["payload"]) if row["payload"] is not None else b""
                if codecs.sniff(p) == "wav":
                    dec = codecs.decode_wav(p)
                    import struct as _struct

                    pcm = _struct.pack(f"<{len(dec['samples'])}h", *dec["samples"])
                    bpm = dec["sample_rate"] * dec["channels"] * 2 // 1000
                else:
                    pcm = p
                    bpm = sample_rate_hz * 2 // 1000
                for cno, start, end, chunk in _chunk_region(pcm, bpm):
                    ids.append(row["media_id"])
                    chunks.append(cno)
                    starts.append(start)
                    ends.append(end)
                    payloads.append(chunk)
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


# Pre-r4 name kept for callers written against the stub-era API; the chunk
# math was always real, only the WAV-header awareness is new.
audio_chunk_stub = audio_chunk


# ---------------------------------------------------------------------------
# OCR hook (reference: Ranking Model/src/main/java/Main/SolrIndexer.java:
# 115-129 — Tesseract over tweet media before indexing). The Spark-side
# plumbing (schema, Arrow batching, decode, pass-through rows) is real and
# always tested; the character-recognition engine itself is import-gated:
# pytesseract+PIL when installed, any injected callable otherwise (tests use
# a deterministic fake), ImportError with guidance when neither.
# ---------------------------------------------------------------------------

OCR_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), True),
        StructField("format", StringType(), True),
        StructField("ocr_text", StringType(), True),  # null = not OCRable
        StructField("ocr_skipped", StringType(), True),  # reason, null = ran
    ]
)


def ocr_available() -> bool:
    """True when the default OCR engine (pytesseract + PIL) is importable
    on the driver. Worker availability is assumed to match — on a real
    cluster ship the same image/venv to executors."""
    try:
        import PIL.Image  # noqa: F401
        import pytesseract  # noqa: F401
    except ImportError:
        return False
    return True


def pixel_probe_engine(raw: bytes, decoded) -> str:
    """Deterministic stand-in OCR engine: 'reads' a decoded raster by
    reporting its dims and first-pixel RGB ("WxH:r,g,b"). Two jobs: (a) a
    pipeline smoke engine that exercises the full ocr_text plumbing with a
    closed-form, oracle-checkable output (query ext_ocr_features); (b) the
    engine the plumbing tests inject. Raises for undecodable containers —
    exactly like a real engine on bytes it can't open — which ocr_text
    degrades to a per-row ocr_skipped reason."""
    if decoded is None or "pixels" not in decoded:
        raise ValueError("container not decodable here")
    px = decoded["pixels"]
    return f"{decoded['width']}x{decoded['height']}:{px[0]},{px[1]},{px[2]}"


def _default_ocr_engine():
    """Build the DEFAULT OCR engine closure: pytesseract over a PIL image
    constructed from the raw bytes when PIL knows the container, else from
    the already-decoded RGB raster (the PPM fallback — stock PIL opens BMP
    but this engine must not depend on PIL's plugin list for formats our
    own codecs already decoded). Extracted from :func:`ocr_text` so the
    construction path is unit-testable with a substituted PIL/pytesseract
    pair even where the real binary is absent (this container): the
    closure does LAZY imports per executor, so driver-side sys.modules
    injection reaches it only when it runs driver-side — which the golden
    -glyph test does deliberately. Callers must gate on
    :func:`ocr_available` first; import errors inside the closure are
    per-row degraded by ocr_text's engine-error handling."""

    def engine(raw: bytes, decoded) -> str:
        import io as _io

        import PIL.Image as _Image
        import pytesseract as _tess

        try:
            img = _Image.open(_io.BytesIO(raw))
        except Exception:
            if decoded is None or "pixels" not in decoded:
                raise
            img = _Image.frombytes(
                "RGB", (decoded["width"], decoded["height"]), decoded["pixels"]
            )
        return _tess.image_to_string(img)

    return engine


def ocr_text(media: DataFrame, engine=None) -> DataFrame:
    """OCR over binary image payloads via Arrow-batched ``mapInPandas`` —
    the reference's media-enrichment stage (``SolrIndexer.java:115-129``)
    re-expressed on the engine's multimodal contract.

    ``engine``: a serializable callable ``(raw_bytes, decoded_or_none) ->
    str`` run per payload INSIDE the Arrow batches; ``decoded_or_none`` is
    the codecs.decode dict (pixels/width/height) for PPM/BMP, else None.
    Defaults to pytesseract over a PIL image (constructed from the raw
    bytes when PIL knows the container, else from the decoded RGB raster),
    imported lazily per executor; when the default is requested but not
    importable, raises ImportError DRIVER-side (fail fast, not per-task).

    Non-image payloads (audio/video/unknown binary) pass through with
    ``ocr_text`` null and ``ocr_skipped`` set — mixed corpora survive, the
    same degradation contract as :func:`extract_features`. Scale shape:
    map-only (no shuffle), payload bytes never leave the scan partition."""
    from ..io import ensure_parallelism

    if engine is None:
        if not ocr_available():
            raise ImportError(
                "ocr_text: default engine needs pytesseract + PIL "
                "(pip install pytesseract pillow + the tesseract binary), "
                "or pass engine=callable(raw_bytes, decoded) -> str"
            )
        engine = _default_ocr_engine()

    media = ensure_parallelism(media)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, mtype, p in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                raw = bytes(p) if p is not None else b""
                kind = codecs.sniff(raw)  # header-only, cheap
                if mtype != "image":
                    # pass through BEFORE decoding: a misc-typed row must
                    # not pay a full raster decode it then discards
                    rows.append((mid, mtype, kind, None, f"not an image: {mtype}"))
                    continue
                decoded = None
                if kind in ("ppm", "bmp"):
                    decoded = codecs.decode(raw)
                try:
                    text = engine(raw, decoded)
                except Exception as exc:  # undecodable container etc.
                    rows.append((mid, mtype, kind, None, f"engine error: {exc}"))
                    continue
                rows.append((mid, mtype, kind, text, None))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "media_type", "format", "ocr_text", "ocr_skipped"],
            )

    return media.mapInPandas(_batches, schema=OCR_SCHEMA)
