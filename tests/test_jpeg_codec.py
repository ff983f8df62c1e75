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


def test_progressive_decode_matches_baseline_decode():
    """Progressive (SOF2) decode must reconstruct EXACTLY the same
    pixels as the baseline decode of the same source — the coefficient
    accumulation across DC/AC first+refinement scans is lossless."""
    rng = random.Random(4)
    from ocr_service_spark.extraction.jpeg_codec import encode_jpeg_gray_progressive

    for w, h in [(8, 8), (24, 17), (40, 33)]:
        px = bytes(rng.randrange(256) for _ in range(w * h))
        w2, h2, prog = decode_jpeg_gray(encode_jpeg_gray_progressive(w, h, px))
        assert (w2, h2) == (w, h)
        base = decode_jpeg_gray(encode_jpeg_gray(w, h, px))[2]
        assert prog == base
    # coarse quantization: sparse coefficients exercise EOB runs, ZRL
    # and the refinement correction-bit sweeps
    px = bytes(rng.randrange(256) for _ in range(40 * 33))
    prog = decode_jpeg_gray(encode_jpeg_gray_progressive(40, 33, px, quant=[16] * 64))[2]
    base = decode_jpeg_gray(encode_jpeg_gray(40, 33, px, quant=[16] * 64))[2]
    assert prog == base
    # flat + gradient images: long EOB runs across blocks
    for img, w, h in [
        (bytes([200]) * (32 * 32), 32, 32),
        (bytes(((x * 3 + y * 2) % 256) for y in range(48) for x in range(48)), 48, 48),
    ]:
        assert decode_jpeg_gray(encode_jpeg_gray_progressive(w, h, img))[2] == \
            decode_jpeg_gray(encode_jpeg_gray(w, h, img))[2]


def test_progressive_interleaved_dc_with_chroma_sync():
    """Hand-built 3-component progressive file with one interleaved DC
    scan: chroma DC diffs must be entropy-decoded (bitstream sync) and
    discarded; DC-only blocks reconstruct to flat dc/8 + 128 grays."""
    import struct as st

    from ocr_service_spark.extraction.jpeg_codec import (
        _DC_COUNTS,
        _DC_SYMBOLS,
        _encode_table,
        _BitWriter,
        _size_cat,
    )

    dc_table = _encode_table(_DC_COUNTS, _DC_SYMBOLS)

    def seg(marker, body):
        return bytes([0xFF, marker]) + st.pack(">H", len(body) + 2) + body

    w = h = 16  # 2x2 MCUs at 1x1 sampling for all three components
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += seg(
        0xC2,
        bytes([8]) + st.pack(">HH", h, w)
        + bytes([3, 1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS)
    bw = _BitWriter()
    y_dcs = [-64, 0, 64, 96]  # -> grays 120, 128, 136, 140
    preds = {1: 0, 2: 0, 3: 0}
    for mcu in range(4):
        for cid, dc in ((1, y_dcs[mcu]), (2, 40), (3, -40)):  # chroma non-zero
            diff = dc - preds[cid]
            preds[cid] = dc
            s = _size_cat(diff)
            code, length = dc_table[s]
            bw.write(code, length)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    bw.flush()
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 0, 0x00])) + bw.out
    out += b"\xff\xd9"

    w2, h2, luma = decode_jpeg_gray(bytes(out))
    assert (w2, h2) == (16, 16)
    blocks = [luma[0], luma[8], luma[8 * 16], luma[8 * 16 + 8]]
    assert blocks == [128 + dc // 8 for dc in y_dcs]
    for y in range(8):  # each block is flat
        for x in range(8):
            assert luma[y * 16 + x] == blocks[0]


def test_progressive_fuzz_never_hangs_or_crashes_uncontrolled():
    rng = random.Random(21)
    from ocr_service_spark.extraction.jpeg_codec import encode_jpeg_gray_progressive

    px = bytes(rng.randrange(256) for _ in range(24 * 24))
    seed = encode_jpeg_gray_progressive(24, 24, px)
    for _ in range(60):
        mutated = bytearray(seed)
        for _ in range(rng.randrange(1, 6)):
            mutated[rng.randrange(len(mutated))] = rng.randrange(256)
        trunc = bytes(mutated[: rng.randrange(4, len(mutated))])
        for payload in (bytes(mutated), trunc):
            try:
                out = decode_jpeg_gray(payload)
                assert len(out[2]) == out[0] * out[1]
            except JpegError:
                pass  # controlled rejection
