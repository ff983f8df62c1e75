"""Generate the SECOND real-scan OCR fixture (tests/golden/scan_page2.jpg).

The first scan competency fixture is the reference's own pat_id_1.png
(anti-aliased ~12px sans-serif). This one is rendered by the repo's own
codecs in a DIFFERENT typeface/size so the scan engine can't be
pat_id_1-overfit: the 5x7 skeleton is anisotropically upscaled by a
fractional factor (2.6x horizontal, 2.2x vertical — glyph aspect and
stroke geometry unlike both the templates and pat_id_1), strokes are
thickened one pixel (a bold weight the templates don't have), edges
anti-alias through pixel-center bilinear sampling, deterministic
per-pixel sensor noise (+-6 grey levels from sha256(x,y)) is added, and
the page goes through the repo's own baseline JPEG encoder so block
quantization artifacts are real.

Fully deterministic: tests/test_scan_ocr.py regenerates the bytes and
asserts they equal the committed file, then pins the recognition floor
(measured 0.8784 vs the page text; the reference's own OCR gate is
0.60, test_process.py:23).

Usage: python tools/gen_scan_fixture2.py  (rewrites tests/golden/scan_page2.jpg)
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PAGE2_TEXT = """Discharge Summary
Patient Janet Oduya was seen on 14 March 2026.
Prescribed 250mg amoxicillin three times daily for 7 days.
Follow up with Dr Hughes at Milltown Clinic, 22 Acorn Road.
Contact 01632 960173 for appointments."""

SCALE_X, SCALE_Y = 2.6, 2.2
BOLD_REACH = 1
NOISE = 6

FIXTURE_PATH = Path(__file__).resolve().parents[1] / "tests/golden/scan_page2.jpg"


def _bilinear(src: bytes, sw: int, sh: int, dw: int, dh: int) -> bytes:
    out = bytearray(dw * dh)
    for y in range(dh):
        fy = (y + 0.5) * sh / dh - 0.5
        y0 = max(0, min(sh - 1, int(fy)))
        y1 = min(sh - 1, y0 + 1)
        wy = fy - y0
        for x in range(dw):
            fx = (x + 0.5) * sw / dw - 0.5
            x0 = max(0, min(sw - 1, int(fx)))
            x1 = min(sw - 1, x0 + 1)
            wx = fx - x0
            v = (
                src[y0 * sw + x0] * (1 - wy) * (1 - wx)
                + src[y0 * sw + x1] * (1 - wy) * wx
                + src[y1 * sw + x0] * wy * (1 - wx)
                + src[y1 * sw + x1] * wy * wx
            )
            out[y * dw + x] = int(v + 0.5)
    return bytes(out)


def _thicken(src: bytes, w: int, h: int, reach: int) -> bytes:
    """Horizontal min-filter: dark ink dilates rightward -> bold weight."""
    out = bytearray(w * h)
    for y in range(h):
        row = y * w
        for x in range(w):
            lo = src[row + x]
            for d in range(1, reach + 1):
                if x - d >= 0:
                    lo = min(lo, src[row + x - d])
            out[row + x] = lo
    return bytes(out)


def build_scan_page2() -> bytes:
    from ocr_service_spark.extraction.glyph_ocr import render_text_png
    from ocr_service_spark.extraction.image_codecs import decode_image_luma
    from ocr_service_spark.extraction.jpeg_codec import encode_jpeg_gray

    png = render_text_png(PAGE2_TEXT)
    sw, sh, luma = decode_image_luma(png)
    dw, dh = int(sw * SCALE_X), int(sh * SCALE_Y)
    px = _bilinear(luma, sw, sh, dw, dh)
    px = bytearray(_thicken(px, dw, dh, BOLD_REACH))
    for y in range(dh):
        for x in range(dw):
            hv = hashlib.sha256(f"{x},{y}".encode()).digest()[0]
            px[y * dw + x] = max(
                0, min(255, px[y * dw + x] + (hv % (2 * NOISE + 1)) - NOISE)
            )
    return encode_jpeg_gray(dw, dh, bytes(px))


if __name__ == "__main__":
    data = build_scan_page2()
    FIXTURE_PATH.write_bytes(data)
    print(f"wrote {FIXTURE_PATH} ({len(data)} bytes)")
