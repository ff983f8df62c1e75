"""From-scratch baseline JPEG codec: encoder/decoder roundtrips, the
entropy-coding edge cases, and integration with the image-luma ladder
and the glyph OCR engine."""

from __future__ import annotations

import random

import pytest

from ocr_service_spark.extraction.image_codecs import decode_image_luma
from ocr_service_spark.extraction.jpeg_codec import (
    JpegError,
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def test_roundtrip_random_image_near_lossless():
    rng = random.Random(7)
    w, h = 24, 17  # forces partial edge blocks + crop of the padded plane
    px = bytes(rng.randrange(256) for _ in range(w * h))
    w2, h2, out = decode_jpeg_gray(encode_jpeg_gray(w, h, px))
    assert (w2, h2) == (w, h)
    assert max(abs(a - b) for a, b in zip(px, out)) <= 2


def test_roundtrip_flat_and_gradient_blocks():
    flat = bytes([200]) * 64
    _, _, out = decode_jpeg_gray(encode_jpeg_gray(8, 8, flat))
    assert max(abs(a - b) for a, b in zip(flat, out)) <= 1
    grad = bytes(((x * 11 + y * 7) % 256) for y in range(32) for x in range(32))
    _, _, out = decode_jpeg_gray(encode_jpeg_gray(32, 32, grad))
    assert max(abs(a - b) for a, b in zip(grad, out)) <= 2


def test_quantization_actually_quantizes():
    rng = random.Random(3)
    px = bytes(rng.randrange(256) for _ in range(16 * 16))
    coarse = encode_jpeg_gray(16, 16, px, quant=[16] * 64)
    fine = encode_jpeg_gray(16, 16, px)
    assert len(coarse) < len(fine)  # coarser table -> fewer coded bits
    _, _, out = decode_jpeg_gray(coarse)
    # lossy but sane
    err = sum(abs(a - b) for a, b in zip(px, out)) / len(px)
    assert 0 < err < 40


def test_long_zero_runs_use_zrl():
    # one isolated high-frequency coefficient after >16 zeros forces the
    # ZRL (15,0) path through both encoder and decoder
    px = bytearray([128] * 64)
    px[63] = 255  # bottom-right corner -> energy in the last zigzag slots
    _, _, out = decode_jpeg_gray(encode_jpeg_gray(8, 8, bytes(px)))
    assert max(abs(a - b) for a, b in zip(px, out)) <= 2


def test_rejects_non_baseline_and_junk():
    with pytest.raises(JpegError):
        decode_jpeg_gray(b"\x00\x01not a jpeg")
    good = bytearray(encode_jpeg_gray(8, 8, bytes(64)))
    sof = good.index(b"\xff\xc0")
    good[sof + 1] = 0xC2  # pretend progressive
    with pytest.raises(JpegError):
        decode_jpeg_gray(bytes(good))


def test_image_luma_ladder_and_media_features_pick_up_jpeg():
    from ocr_service_spark.operators.multimodal import _decode

    px = bytes(((x + y) * 9) % 256 for y in range(16) for x in range(16))
    data = encode_jpeg_gray(16, 16, px)
    w, h, luma = decode_image_luma(data)
    assert (w, h) == (16, 16)
    meta = _decode(data)
    assert meta["media_type"] == "image/jpeg"
    assert (meta["width"], meta["height"]) == (16, 16)
    # feature hash is the hash of the DECODED luma plane, not of the
    # container bytes
    import hashlib

    assert meta["feature_hash"] == hashlib.sha256(luma).hexdigest()[:16]


def test_glyph_ocr_reads_jpeg_pages():
    from ocr_service_spark.extraction.glyph_ocr import GlyphOcrEngine, render_text_png
    from ocr_service_spark.extraction.png_codec import decode_png_gray

    text = "JPEG PAGE 7: ok"
    w, h, luma = decode_png_gray(render_text_png(text))
    got, conf = GlyphOcrEngine().recognize(encode_jpeg_gray(w, h, luma))
    assert got == text
    assert conf == 100.0

def test_fill_bytes_before_markers_are_skipped():
    # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker —
    # between segments and inside the entropy stream before RST/EOI
    from ocr_service_spark.extraction.jpeg_codec import _BitReader

    px = bytes(((x * 5 + y * 3) % 256) for y in range(16) for x in range(16))
    data = encode_jpeg_gray(16, 16, px)
    padded = data[:2] + b"\xff\xff\xff" + data[2:]  # fills after SOI
    w, h, out = decode_jpeg_gray(padded)
    assert (w, h) == (16, 16)
    assert out == decode_jpeg_gray(data)[2]

    r = _BitReader(b"\xff\xff\xff\xd0rest", 0)
    r.align_and_expect_rst(0)  # fills before RST0 resolve to the marker
    assert r.marker is None and r.pos == 4
    r2 = _BitReader(b"\xff\xff\xff\xd9", 0)
    assert r2._fill() is False and r2.marker == 0xD9


def test_single_component_scan_with_sampling_factors_is_raster_order():
    # T.81 A.2: a non-interleaved (one-component) scan iterates data
    # units in ceil(w/8) x ceil(h/8) raster order even when the
    # component declares sampling factors > 1 — the factors only matter
    # for interleaved scans
    px = bytes(((x * 7 + y * 13) % 256) for y in range(24) for x in range(24))
    data = bytearray(encode_jpeg_gray(24, 24, px))
    sof = bytes(data).index(b"\xff\xc0")
    assert data[sof + 11] == 0x11  # sampling byte of the only component
    data[sof + 11] = 0x22
    w, h, out = decode_jpeg_gray(bytes(data))
    assert (w, h) == (24, 24)
    assert out == decode_jpeg_gray(encode_jpeg_gray(24, 24, px))[2]
