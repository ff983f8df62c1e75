"""From-scratch PNG codec (no imaging libraries).

Implements the subset of ISO/IEC 15948 (PNG) the OCR tier needs:

- ``decode_png_gray``: signature + chunk walk, IHDR parse, IDAT concat,
  zlib inflate, per-scanline unfiltering (filter types 0-4 incl.
  Paeth), and conversion of gray / RGB / palette / alpha images to an
  8-bit luma plane. Non-interlaced, 8-bit channels (the output of any
  standard renderer at these settings); 1-bit gray is also accepted
  since fax-style scans are common OCR inputs.
- ``encode_png_gray``: minimal single-IDAT grayscale writer used by the
  test fixtures and the glyph renderer.

The reference service leaves raster handling to pdfium/Pillow inside
tesseract's process (converter.py:139-150 pins DPI/grayscale); this
module is the sandbox's dependency-free equivalent so the OCR tier can
run REAL image decoding end-to-end.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# decode-work budget: bounds both the pixel loops and the zlib inflate
# (a 100 KB "PNG bomb" can claim gigapixel dims; an executor task must
# degrade, not stall or OOM). 16 MP covers A4 at 300 DPI with headroom.
MAX_PIXELS = 16_000_000


class PngError(ValueError):
    pass


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        yield ctype, body
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IEND":
            return


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png_gray(data: bytes) -> tuple[int, int, bytes]:
    """PNG bytes -> (width, height, row-major 8-bit luma plane).

    Alpha is composited over white (documents are dark-on-light).
    """
    if data[:8] != _SIGNATURE:
        raise PngError("not a PNG")
    width = height = None
    bit_depth = color_type = None
    palette: bytes | None = None
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if interlace != 0:
                raise PngError("interlaced PNG not supported")
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise PngError("missing IHDR")
    if width * height > MAX_PIXELS:
        raise PngError("image exceeds decode budget")
    if bit_depth not in (1, 8) or (bit_depth == 1 and color_type != 0):
        raise PngError(f"unsupported bit depth {bit_depth}/color type {color_type}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise PngError(f"unsupported color type {color_type}")

    # bounded inflate: never decompress more than the image accounts for
    expected = height * (1 + width * channels) + 8
    d = zlib.decompressobj()
    raw = d.decompress(bytes(idat), expected)
    if bit_depth == 1:
        row_bytes = (width + 7) // 8
        bpp = 1
    else:
        row_bytes = width * channels
        bpp = channels
    if len(raw) < height * (1 + row_bytes):
        raise PngError("truncated IDAT")

    # unfilter
    out = bytearray(height * row_bytes)
    prev = bytes(row_bytes)
    for y in range(height):
        off = y * (1 + row_bytes)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + row_bytes])
        if ftype == 1:  # Sub
            for i in range(bpp, row_bytes):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(row_bytes):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(row_bytes):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(row_bytes):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise PngError(f"bad filter type {ftype}")
        out[y * row_bytes : (y + 1) * row_bytes] = line
        prev = bytes(line)

    # to 8-bit luma
    luma = bytearray(width * height)
    if bit_depth == 1:
        for y in range(height):
            base = y * row_bytes
            for x in range(width):
                bit = (out[base + (x >> 3)] >> (7 - (x & 7))) & 1
                luma[y * width + x] = 255 if bit else 0
    elif color_type == 0:
        luma[:] = out
    elif color_type == 2:
        for p in range(width * height):
            r, g, b = out[3 * p], out[3 * p + 1], out[3 * p + 2]
            luma[p] = (299 * r + 587 * g + 114 * b) // 1000
    elif color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        for p in range(width * height):
            i = 3 * out[p]
            r, g, b = palette[i], palette[i + 1], palette[i + 2]
            luma[p] = (299 * r + 587 * g + 114 * b) // 1000
    elif color_type == 4:
        for p in range(width * height):
            v, a = out[2 * p], out[2 * p + 1]
            luma[p] = (a * v + (255 - a) * 255) // 255
    elif color_type == 6:
        for p in range(width * height):
            r, g, b, a = out[4 * p], out[4 * p + 1], out[4 * p + 2], out[4 * p + 3]
            v = (299 * r + 587 * g + 114 * b) // 1000
            luma[p] = (a * v + (255 - a) * 255) // 255
    return width, height, bytes(luma)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png_gray(width: int, height: int, luma: bytes) -> bytes:
    """8-bit grayscale pixels (row-major, len == width*height) -> PNG."""
    if len(luma) != width * height:
        raise PngError("pixel buffer size mismatch")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter: None
        raw += luma[y * width : (y + 1) * width]
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )
