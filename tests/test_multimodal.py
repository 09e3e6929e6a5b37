"""Real media decode (r4 — closes the S10/U5 partial): the dependency-free
PPM/BMP/WAV codecs, the Arrow-batched decode/resize/chunk operators over
them, and the strict-mode raise.

The codec tests decode HAND-BUILT byte literals (not our encoder's output)
so an encoder/decoder pair that is symmetrically wrong cannot pass."""

from __future__ import annotations

import math
import struct

import pytest
from pyspark.sql import functions as F

from job_search_engine_using_pyspark_solar_and_angular_spark.functions import codecs
from job_search_engine_using_pyspark_solar_and_angular_spark.operators import (
    multimodal,
)

from .conftest import SF_DIR


# ---------------------------------------------------------------------------
# pure codec tests (no Spark)
# ---------------------------------------------------------------------------


def gradient_rgb(w, h):
    return bytes((x * 13 + y * 7 + c * 3) % 256 for y in range(h) for x in range(w) for c in range(3))


def test_ppm_decode_hand_built_literal():
    """Decode a P6 payload written by hand — comments, multi-whitespace, and
    the single-whitespace-after-maxval rule, straight from the Netpbm spec."""
    rgb = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    payload = b"P6 # inline comment\n# full-line comment\n 2\t2 \n255\n" + rgb
    d = codecs.decode_ppm(payload)
    assert (d["width"], d["height"], d["pixels"]) == (2, 2, rgb)


def test_ppm_roundtrip_and_errors():
    rgb = gradient_rgb(5, 3)
    assert codecs.decode_ppm(codecs.encode_ppm(5, 3, rgb))["pixels"] == rgb
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_ppm(b"P6\n5 3\n255\n" + rgb[:-1])
    with pytest.raises(ValueError, match="maxval"):
        codecs.decode_ppm(b"P6\n1 1\n65535\n" + b"\x00" * 6)


def test_bmp_decode_hand_built_literal():
    """A 2x2 24-bit BMP built field-by-field: bottom-up rows, BGR order,
    2-byte row padding (width 2 -> 6 raster bytes -> pad 2)."""
    # top-down RGB we expect back:
    # (255,0,0) (0,255,0)
    # (0,0,255) (10,20,30)
    raster = (
        bytes([255, 0, 0]) + bytes([30, 20, 10]) + b"\x00\x00"  # bottom row BGR
        + bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"  # top row BGR
    )
    fh = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    ih = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster), 0, 0, 0, 0)
    d = codecs.decode_bmp(fh + ih + raster)
    assert (d["width"], d["height"]) == (2, 2)
    assert d["pixels"] == bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])


def test_bmp_top_down_negative_height():
    rgb = bytes([1, 2, 3, 4, 5, 6])  # 2x1
    bottom_up = codecs.encode_bmp(2, 1, rgb)
    # flip the height sign: same single row, now declared top-down
    hacked = bottom_up[:22] + struct.pack("<i", -1) + bottom_up[26:]
    assert codecs.decode_bmp(hacked)["pixels"] == rgb


@pytest.mark.parametrize("w,h", [(5, 3), (4, 2), (1, 1), (3, 4)])
def test_bmp_roundtrip_padding(w, h):
    rgb = gradient_rgb(w, h)
    assert codecs.decode_bmp(codecs.encode_bmp(w, h, rgb))["pixels"] == rgb


def test_wav_decode_hand_built_with_extra_chunk():
    """RIFF walk: an odd-sized LIST chunk (word-aligned skip) before data,
    stereo 44.1k fmt parsed from the header."""
    samples = [100, -200, 32767, -32768]
    data = struct.pack("<4h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 2, 44100, 44100 * 4, 4, 16)
    body = (
        b"WAVE"
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd -> padded
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    d = codecs.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert d["sample_rate"] == 44100 and d["channels"] == 2
    assert d["samples"] == samples


def test_wav_rejects_non_pcm16():
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 0)
    with pytest.raises(ValueError, match="PCM16"):
        codecs.decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_stats_hand_computed():
    rgb = gradient_rgb(5, 3)
    st = codecs.image_stats({"width": 5, "height": 3, "pixels": rgb})
    sums = [0, 0, 0]
    for i, v in enumerate(rgb):
        sums[i % 3] += v
    assert (st["mean_r"], st["mean_g"], st["mean_b"]) == tuple(s // 15 for s in sums)
    samples = [100, -200, 32767, -32768, 0, 5]
    au = codecs.audio_stats(
        {"sample_rate": 16000, "channels": 1, "samples": samples}
    )
    assert au["peak"] == 32768
    assert au["rms"] == math.isqrt(sum(v * v for v in samples) // 6)


def test_resize_nearest_expected_pixels():
    """2x2 -> 4x4 nearest neighbor: src index floor(dst*src/dst) duplicates
    each source pixel into a 2x2 block; 4x4 -> 2x2 keeps (0,0),(2,0),(0,2),(2,2)."""
    rgb = bytes([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    up = codecs.resize_nearest({"format": "ppm", "width": 2, "height": 2, "pixels": rgb}, 4, 4)
    exp = (
        bytes([1, 2, 3, 1, 2, 3, 4, 5, 6, 4, 5, 6]) * 2
        + bytes([7, 8, 9, 7, 8, 9, 10, 11, 12, 10, 11, 12]) * 2
    )
    assert up["pixels"] == exp
    g = gradient_rgb(4, 4)
    down = codecs.resize_nearest({"format": "ppm", "width": 4, "height": 4, "pixels": g}, 2, 2)
    pick = lambda x, y: g[(y * 4 + x) * 3 : (y * 4 + x) * 3 + 3]
    assert down["pixels"] == pick(0, 0) + pick(2, 0) + pick(0, 2) + pick(2, 2)


def test_sniff_and_compressed_raise():
    assert codecs.sniff(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert codecs.sniff(b"\x89PNG\r\n\x1a\n") == "png"
    assert codecs.sniff(b"plain text") is None
    with pytest.raises(ValueError, match="compressed"):
        codecs.decode(b"\x89PNG\r\n\x1a\n")
    assert codecs.decode(b"plain text") is None


# ---------------------------------------------------------------------------
# Spark operators over real payloads
# ---------------------------------------------------------------------------


def _mixed_media(spark):
    ppm = codecs.encode_ppm(3, 2, gradient_rgb(3, 2))
    bmp = codecs.encode_bmp(3, 2, gradient_rgb(3, 2))
    wav = codecs.encode_wav([1000, -2000, 3000, -4000], 22050, 1)
    rows = [
        (1, "image", bytearray(ppm), None),
        (2, "image", bytearray(bmp), None),
        (3, "audio", bytearray(wav), None),
        (4, "text", bytearray(b"not media at all"), None),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_features_mixed_corpus(spark):
    feats = {
        r["media_id"]: r for r in multimodal.extract_features(_mixed_media(spark)).collect()
    }
    rgb = gradient_rgb(3, 2)
    sums = [0, 0, 0]
    for i, v in enumerate(rgb):
        sums[i % 3] += v
    for mid, fmt in [(1, "ppm"), (2, "bmp")]:
        f = feats[mid]
        assert f["format"] == fmt and (f["width"], f["height"]) == (3, 2)
        assert (f["mean_r"], f["mean_g"], f["mean_b"]) == tuple(s // 6 for s in sums)
        assert f["n_samples"] is None
    a = feats[3]
    assert a["format"] == "wav" and a["sample_rate"] == 22050
    assert a["n_samples"] == 4 and a["peak"] == 4000
    assert a["rms"] == math.isqrt((1000**2 + 2000**2 + 3000**2 + 4000**2) // 4)
    assert a["width"] is None
    u = feats[4]
    assert u["format"] == "unknown" and u["n_bytes"] == 16
    assert u["width"] is None and u["n_samples"] is None


def test_decode_strict_raises_on_unknown(spark):
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception), match="decode_strict"):
        multimodal.decode_strict(_mixed_media(spark)).collect()
    ok = multimodal.decode_strict(
        _mixed_media(spark).filter(F.col("media_id") < 4)
    ).collect()
    assert len(ok) == 3


def test_resize_images_real_resample(spark):
    """Images come back re-encoded in their own container at the target dims
    with the exact nearest-neighbor raster; text passes through."""
    out = {
        r["media_id"]: r
        for r in multimodal.resize_images(_mixed_media(spark), 6, 4).collect()
    }
    want = codecs.resize_nearest(
        {"format": "ppm", "width": 3, "height": 2, "pixels": gradient_rgb(3, 2)}, 6, 4
    )["pixels"]
    dp = codecs.decode_ppm(bytes(out[1]["payload"]))
    assert (dp["width"], dp["height"], dp["pixels"]) == (6, 4, want)
    db = codecs.decode_bmp(bytes(out[2]["payload"]))
    assert (db["width"], db["height"], db["pixels"]) == (6, 4, want)
    assert out[1]["meta_json"] == '{"resized_to":[6,4]}'
    assert out[4]["meta_json"] == '{"resize_skipped":true}'
    assert bytes(out[4]["payload"]) == b"not media at all"


def test_audio_chunk_uses_real_wav_header(spark):
    """A WAV payload is chunked from its OWN header: sample rate read from
    fmt (the passed-in rate is ignored), slices are sample-aligned within
    the data chunk only — no header bytes leak into chunk payloads."""
    sr = 1000  # 2 bytes/ms at mono PCM16
    samples = list(range(-60, 60))  # 120 samples = 120 ms
    wav = codecs.encode_wav(samples, sr, 1)
    media = spark.createDataFrame(
        [(7, "audio", bytearray(wav), None)], multimodal.MEDIA_SCHEMA
    )
    chunks = sorted(
        multimodal.audio_chunk(
            media, sample_rate_hz=999_999, chunk_ms=50, overlap_ms=10
        ).collect(),
        key=lambda r: r["chunk_no"],
    )
    pcm = struct.pack(f"<{len(samples)}h", *samples)
    assert [(c["start_ms"], c["end_ms"]) for c in chunks] == [
        (0, 50), (40, 90), (80, 120)
    ]
    for c in chunks:
        assert bytes(c["chunk_payload"]) == pcm[c["start_ms"] * 2 : c["end_ms"] * 2]


def test_encode_decode_loop_matches_params(spark):
    """The windowed query's loop at tiny scale: JVM-derived params ->
    real encoder -> real decoder -> stats equal the parameters."""
    params = spark.createDataFrame(
        [(1, 5, 4, 10, 20, 30), (2, 16, 10, 255, 0, 128)],
        "media_id long, width int, height int, r int, g int, b int",
    )
    feats = {
        r["media_id"]: r
        for r in multimodal.extract_features(
            multimodal.encode_solid_ppm_payloads(params)
        ).collect()
    }
    assert (feats[1]["width"], feats[1]["height"], feats[1]["n_pixels"]) == (5, 4, 20)
    assert (feats[1]["mean_r"], feats[1]["mean_g"], feats[1]["mean_b"]) == (10, 20, 30)
    assert (feats[2]["mean_r"], feats[2]["mean_g"], feats[2]["mean_b"]) == (255, 0, 128)
    wparams = spark.createDataFrame(
        [(1, 51, 300, 500)], "media_id long, n_samples int, amp_a int, amp_b int"
    )
    w = multimodal.extract_features(
        multimodal.encode_tone_wav_payloads(wparams, sample_rate=8000)
    ).collect()[0]
    assert w["format"] == "wav" and w["sample_rate"] == 8000
    assert w["n_samples"] == 51 and w["peak"] == 500
    assert w["rms"] == math.isqrt((26 * 300**2 + 25 * 500**2) // 51)


def test_extract_features_on_fixture_docs(spark):
    """Unknown-payload fallback over the real fixture table (the stub-era
    byte-stat contract still holds: n_bytes + sha256_16 populated, media
    stat fields null)."""
    from job_search_engine_using_pyspark_solar_and_angular_spark.io import load_table

    d = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 10)
    media = multimodal.attach_binary_payload(d, "doc_id", "text")
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 10
    for f in feats:
        assert f["format"] == "unknown"
        assert f["n_bytes"] > 0 and len(f["sha256_16"]) == 16
        assert f["width"] is None and f["rms"] is None


# ---------------------------------------------------------------------------
# OCR hook (reference SolrIndexer.java:115-129 — Tesseract over tweet media)
# ---------------------------------------------------------------------------


# the deterministic stand-in engine lives in the library (it powers the
# oracle-checked ext_ocr_features query); the tests inject the same one
_fake_ocr_engine = multimodal.pixel_probe_engine


def test_ocr_text_plumbing_with_injected_engine(spark):
    """The OCR hook's Spark-side plumbing is always tested: schema, Arrow
    batch shape, decode handoff, non-image pass-through, and the per-row
    engine-error degradation (never a task failure for one bad payload)."""
    out = {
        r["media_id"]: r
        for r in multimodal.ocr_text(
            _mixed_media(spark), engine=_fake_ocr_engine
        ).collect()
    }
    rgb = gradient_rgb(3, 2)
    want = f"3x2:{rgb[0]},{rgb[1]},{rgb[2]}"
    assert out[1]["ocr_text"] == want and out[1]["ocr_skipped"] is None
    assert out[2]["ocr_text"] == want and out[2]["format"] == "bmp"
    assert out[3]["ocr_text"] is None and "not an image" in out[3]["ocr_skipped"]
    assert out[4]["ocr_text"] is None and "not an image" in out[4]["ocr_skipped"]
    assert [f.name for f in multimodal.OCR_SCHEMA.fields] == [
        "media_id", "media_type", "format", "ocr_text", "ocr_skipped",
    ]


def test_ocr_default_engine_raises_fast_when_absent(spark):
    if multimodal.ocr_available():
        pytest.skip("pytesseract present — covered by the real-engine test")
    with pytest.raises(ImportError, match="pytesseract"):
        multimodal.ocr_text(_mixed_media(spark))


@pytest.mark.skipif(
    not multimodal.ocr_available(), reason="pytesseract/PIL not installed"
)
def test_ocr_real_engine_reads_rendered_text(spark):
    """With a real tesseract install: rendered glyphs must come back as
    text. (Skipped in this container — the hook's import gate is the
    deliverable; SURVEY §7.4 descopes the model itself.)"""
    out = multimodal.ocr_text(
        _mixed_media(spark).filter(F.col("media_id") == 1)
    ).collect()
    assert out[0]["ocr_skipped"] is None or out[0]["ocr_text"] is not None


def test_ocr_default_engine_construction_golden_glyph():
    """Execute the DEFAULT-engine construction path (multimodal.py
    _default_ocr_engine — the pytesseract-over-PIL branch VERDICT r05
    noted never runs in this container) by substituting a golden-glyph
    PIL/pytesseract pair into sys.modules and calling the closure
    DRIVER-side. Exercises BOTH sub-branches: (a) PIL.Image.open succeeds
    (BMP — a container stock PIL knows), (b) PIL.Image.open raises and
    the engine rebuilds the image from the codecs-decoded RGB raster
    (PPM fallback), and (c) open fails with nothing decoded -> the raise
    propagates for ocr_text's per-row degradation. The fake
    image_to_string 'reads' the raster deterministically, so assertions
    are closed-form. The real-binary integration test remains
    test_ocr_real_engine_reads_rendered_text (skipped where absent)."""
    import sys
    import types

    from job_search_engine_using_pyspark_solar_and_angular_spark.functions import (
        codecs,
    )

    class _GlyphImage:
        def __init__(self, mode, size, data):
            self.mode, self.size, self.data = mode, size, bytes(data)

    def _open(buf):
        raw = buf.read()
        if codecs.sniff(raw) != "bmp":
            raise OSError("cannot identify image file")  # stock-PIL shape
        dec = codecs.decode(raw)
        return _GlyphImage("RGB", (dec["width"], dec["height"]), dec["pixels"])

    def _frombytes(mode, size, data):
        return _GlyphImage(mode, size, data)

    def _image_to_string(img):
        w, h = img.size
        return f"GLYPH {img.mode} {w}x{h} sum={sum(img.data)}"

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = _open
    pil_image.frombytes = _frombytes
    pil.Image = pil_image
    tess = types.ModuleType("pytesseract")
    tess.image_to_string = _image_to_string

    saved = {k: sys.modules.get(k) for k in ("PIL", "PIL.Image", "pytesseract")}
    sys.modules.update({"PIL": pil, "PIL.Image": pil_image, "pytesseract": tess})
    try:
        engine = multimodal._default_ocr_engine()
        rgb = gradient_rgb(3, 2)
        want = f"GLYPH RGB 3x2 sum={sum(rgb)}"

        bmp = codecs.encode_bmp(3, 2, rgb)
        assert engine(bmp, None) == want  # open() branch — no decode needed

        ppm = codecs.encode_ppm(3, 2, rgb)
        assert engine(ppm, codecs.decode(ppm)) == want  # frombytes fallback

        with pytest.raises(OSError):  # undecodable, nothing to fall back to
            engine(b"\x00\x01not-an-image", None)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
