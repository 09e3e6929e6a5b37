"""Dependency-free media codecs: real byte-level decoders for the multimodal
pipeline (SURVEY.md §2 S10/U5 — the reference's media-enrichment hook,
``Ranking Model/src/main/java/Main/SolrIndexer.java:115-129``).

The runtime has no codec libraries (no PIL/librosa/ffmpeg), so the decode
step supports the classic header-documented UNCOMPRESSED formats that can be
parsed correctly with nothing but ``struct``:

- **PPM (Netpbm P6)** — ASCII header (magic, width, height, maxval, with
  ``#`` comments and arbitrary whitespace per the spec) + raw RGB bytes.
- **BMP** — BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit BI_RGB; rows
  4-byte padded, bottom-up by default (top-down when height < 0), BGR order.
- **WAV** — RIFF container, ``fmt `` + ``data`` chunks walked generically
  (unknown chunks skipped with odd-length padding per the RIFF spec),
  PCM16 little-endian.

Compressed formats (JPEG/PNG/MP3/...) raise ``ValueError`` — entropy coding
without a codec lib is out of scope; on a production cluster swap
:func:`decode` for a PIL/ffmpeg call inside the same Arrow batch shape.

All derived statistics are integer-exact (floor-division means,
``math.isqrt`` RMS) so they admit exact DuckDB oracles.
"""

from __future__ import annotations

import math
import struct

PPM_MAGIC = b"P6"
BMP_MAGIC = b"BM"
RIFF_MAGIC = b"RIFF"

_COMPRESSED_MAGICS = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"ID3": "mp3",
    b"\xff\xfb": "mp3",
    b"OggS": "ogg",
    b"fLaC": "flac",
    b"GIF8": "gif",
}


def sniff(payload: bytes) -> str | None:
    """Identify the container from magic bytes; None when unrecognized."""
    if payload.startswith(PPM_MAGIC) and len(payload) > 2 and payload[2:3] in b" \t\n\r#":
        return "ppm"
    if payload.startswith(BMP_MAGIC) and len(payload) >= 54:
        return "bmp"
    if payload.startswith(RIFF_MAGIC) and payload[8:12] == b"WAVE":
        return "wav"
    for magic, name in _COMPRESSED_MAGICS.items():
        if payload.startswith(magic):
            return name
    return None


# ---------------------------------------------------------------------------
# PPM (Netpbm P6)
# ---------------------------------------------------------------------------


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """P6 image from row-major RGB bytes (3 bytes/pixel, top-down)."""
    if len(rgb) != 3 * width * height:
        raise ValueError(
            f"encode_ppm: need {3 * width * height} RGB bytes, got {len(rgb)}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def _ppm_header_tokens(payload: bytes, n_tokens: int) -> tuple[list[int], int]:
    """Read ``n_tokens`` ASCII integers after the magic, honoring the Netpbm
    grammar: fields separated by whitespace; ``#`` starts a comment running
    to end of line. Returns (values, offset_after_single_ws) where the
    offset points just past the single whitespace byte that terminates the
    last header field (the spec: raster starts after exactly one whitespace
    char following maxval)."""
    vals: list[int] = []
    i = 2  # past 'P6'
    n = len(payload)
    while len(vals) < n_tokens:
        # skip whitespace and comments
        while i < n:
            c = payload[i : i + 1]
            if c in b" \t\r\n":
                i += 1
            elif c == b"#":
                while i < n and payload[i : i + 1] not in b"\r\n":
                    i += 1
            else:
                break
        j = i
        while j < n and payload[j : j + 1].isdigit():
            j += 1
        if j == i:
            raise ValueError("decode_ppm: malformed header (expected integer)")
        vals.append(int(payload[i:j]))
        i = j
    if i >= n or payload[i : i + 1] not in b" \t\r\n":
        raise ValueError("decode_ppm: missing whitespace after maxval")
    return vals, i + 1


def decode_ppm(payload: bytes) -> dict:
    """Parse a P6 image -> {format, width, height, pixels} with ``pixels``
    as row-major top-down RGB bytes."""
    if not payload.startswith(PPM_MAGIC):
        raise ValueError("decode_ppm: not a P6 payload")
    (width, height, maxval), off = _ppm_header_tokens(payload, 3)
    if maxval != 255:
        raise ValueError(f"decode_ppm: only maxval 255 supported, got {maxval}")
    need = 3 * width * height
    pixels = payload[off : off + need]
    if len(pixels) != need:
        raise ValueError(
            f"decode_ppm: truncated raster ({len(pixels)} of {need} bytes)"
        )
    return {"format": "ppm", "width": width, "height": height, "pixels": pixels}


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """24-bit uncompressed BMP from row-major top-down RGB bytes. Written
    in the format's canonical layout: bottom-up rows, BGR order, rows
    padded to 4 bytes."""
    if len(rgb) != 3 * width * height:
        raise ValueError(
            f"encode_bmp: need {3 * width * height} RGB bytes, got {len(rgb)}"
        )
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    raster = bytearray()
    for y in range(height - 1, -1, -1):  # bottom-up
        row = rgb[y * row_bytes : (y + 1) * row_bytes]
        for x in range(width):
            r, g, b = row[3 * x : 3 * x + 3]
            raster += bytes((b, g, r))
        raster += b"\x00" * pad
    pixel_off = 14 + 40
    file_size = pixel_off + len(raster)
    file_header = struct.pack("<2sIHHI", BMP_MAGIC, file_size, 0, 0, pixel_off)
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 2835, 2835, 0, 0
    )
    return file_header + info_header + bytes(raster)


def decode_bmp(payload: bytes) -> dict:
    """Parse a 24-bit BI_RGB BMP -> row-major top-down RGB bytes. Handles
    both bottom-up (height > 0) and top-down (height < 0) rasters and the
    4-byte row padding."""
    if not payload.startswith(BMP_MAGIC):
        raise ValueError("decode_bmp: not a BMP payload")
    _, _file_size, _, _, pixel_off = struct.unpack_from("<2sIHHI", payload, 0)
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"decode_bmp: unsupported DIB header size {header_size}")
    width, height_raw, _planes, bpp, compression = struct.unpack_from(
        "<iiHHI", payload, 18
    )
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"decode_bmp: only 24-bit BI_RGB supported (bpp={bpp}, comp={compression})"
        )
    top_down = height_raw < 0
    height = abs(height_raw)
    row_bytes = width * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(payload) < pixel_off + stride * height:
        raise ValueError("decode_bmp: truncated raster")
    out = bytearray(3 * width * height)
    for y in range(height):
        src_row = y if top_down else height - 1 - y
        base = pixel_off + src_row * stride
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            o = (y * width + x) * 3
            out[o : o + 3] = bytes((r, g, b))
    return {"format": "bmp", "width": width, "height": height, "pixels": bytes(out)}


# ---------------------------------------------------------------------------
# WAV (RIFF / PCM16)
# ---------------------------------------------------------------------------


def encode_wav(
    samples: list[int], sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Canonical 44-byte-header PCM16 WAV from interleaved int16 samples."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> dict:
    """Walk the RIFF chunk list (skipping unknown chunks with odd-length
    padding, per spec) -> {format, sample_rate, channels, bits, samples}
    with ``samples`` the interleaved int16 list from the data chunk."""
    if not (payload.startswith(RIFF_MAGIC) and payload[8:12] == b"WAVE"):
        raise ValueError("decode_wav: not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    fmt = None
    data = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (size,) = struct.unpack_from("<I", payload, i + 4)
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("decode_wav: short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("decode_wav: missing fmt/data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"decode_wav: only PCM16 supported (format={audio_format}, bits={bits})"
        )
    n_samp = len(data) // 2
    samples = list(struct.unpack(f"<{n_samp}h", data[: 2 * n_samp]))
    return {
        "format": "wav",
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "samples": samples,
    }


# ---------------------------------------------------------------------------
# Dispatch + integer-exact statistics
# ---------------------------------------------------------------------------


def decode(payload: bytes) -> dict | None:
    """Sniff + decode. None for unrecognized payloads (caller falls back to
    byte stats); ValueError for recognized-but-compressed formats."""
    kind = sniff(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "wav":
        return decode_wav(payload)
    if kind is not None:
        raise ValueError(
            f"decode: {kind} is a compressed format; no codec libs in this "
            "environment — supported: ppm, bmp, wav"
        )
    return None


def image_stats(dec: dict) -> dict:
    """Integer-exact channel means (floor of sum/count) over the decoded
    raster — exactly mirrorable in SQL."""
    px = dec["pixels"]
    n = dec["width"] * dec["height"]
    if n == 0:
        return {"n_pixels": 0, "mean_r": None, "mean_g": None, "mean_b": None}
    sums = [0, 0, 0]
    for i, v in enumerate(px):
        sums[i % 3] += v
    return {
        "n_pixels": n,
        "mean_r": sums[0] // n,
        "mean_g": sums[1] // n,
        "mean_b": sums[2] // n,
    }


def audio_stats(dec: dict) -> dict:
    """Integer-exact PCM stats: peak = max |sample|, rms = isqrt(floor mean
    square). Both engine-identical for any PCM16 input."""
    s = dec["samples"]
    n = len(s)
    if n == 0:
        return {
            "sample_rate": dec["sample_rate"],
            "channels": dec["channels"],
            "n_samples": 0,
            "peak": None,
            "rms": None,
        }
    return {
        "sample_rate": dec["sample_rate"],
        "channels": dec["channels"],
        "n_samples": n,
        "peak": max(abs(v) for v in s),
        "rms": math.isqrt(sum(v * v for v in s) // n),
    }


def resize_nearest(dec: dict, out_w: int, out_h: int) -> dict:
    """Nearest-neighbor resample of a decoded image: source index =
    floor(dst * src_size / dst_size) — the standard NN mapping, integer-only
    so the result is engine- and layout-exact."""
    w, h, px = dec["width"], dec["height"], dec["pixels"]
    out = bytearray(3 * out_w * out_h)
    for y in range(out_h):
        sy = y * h // out_h
        for x in range(out_w):
            sx = x * w // out_w
            src = (sy * w + sx) * 3
            dst = (y * out_w + x) * 3
            out[dst : dst + 3] = px[src : src + 3]
    return {"format": dec["format"], "width": out_w, "height": out_h, "pixels": bytes(out)}
