"""From-scratch image pixel decoders -> 8-bit luma planes.

One ladder (`decode_image_luma`) over every codec buildable without
native libraries: PNG (extraction/png_codec.py), baseline JPEG
(extraction/jpeg_codec.py), uncompressed BMP, GIF (LZW) and
uncompressed TIFF. Shared by the multimodal feature operators and the
glyph OCR engine, so any of these formats can carry a page image.
Returns None for undecodable/unsupported payloads — callers fall back
to header-only handling.
"""

from __future__ import annotations

import struct

# decode-work budget shared by the pure-Python pixel loops (PNG and
# JPEG carry their own in their codec modules): claimed dimensions
# beyond this degrade to None rather than stalling an executor task
MAX_PIXELS = 16_000_000


def _bmp_luma(payload: bytes) -> tuple[int, int, bytes] | None:
    """Real pixel decode for uncompressed BMP (24/32-bit BGR(A) and
    8-bit palette), BITMAPINFOHEADER, bottom-up or top-down rows."""
    if payload[:2] != b"BM" or len(payload) < 54:
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        return None
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (8, 24, 32) or width <= 0 or height == 0:
        return None
    top_down = height < 0
    height = abs(height)
    if width * height > MAX_PIXELS:
        return None
    palette = None
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + hdr_size
        palette = payload[pal_off : pal_off + 4 * n_colors]
    row_stride = ((width * bpp + 31) // 32) * 4
    if data_off + row_stride * height > len(payload):
        return None
    luma = bytearray(width * height)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        base = data_off + src_y * row_stride
        for x in range(width):
            if bpp == 8:
                i = 4 * payload[base + x]
                b, g, r = palette[i], palette[i + 1], palette[i + 2]
            else:
                o = base + x * (bpp // 8)
                b, g, r = payload[o], payload[o + 1], payload[o + 2]
            luma[y * width + x] = (299 * r + 587 * g + 114 * b) // 1000
    return width, height, bytes(luma)


def _gif_lzw(data: bytes, min_code_size: int, max_pixels: int) -> bytes | None:
    """GIF-variant LZW decode (LSB-first variable-width codes, CLEAR /
    END control codes, dictionary growth to 12 bits)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    base = {i: bytes([i]) for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    out = bytearray()
    prev: int | None = None
    bitpos, nbits = 0, len(data) * 8
    while len(out) < max_pixels:
        if bitpos + code_size > nbits:
            break
        code = 0
        for i in range(code_size):
            code |= ((data[(bitpos + i) >> 3] >> ((bitpos + i) & 7)) & 1) << i
        bitpos += code_size
        if code == end:
            break
        if code == clear:
            table = dict(base)
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
            out += entry
            prev = code
            continue
        if code in table:
            entry = table[code]
        elif code == next_code:
            entry = table[prev] + table[prev][:1]
        else:
            return None
        out += entry
        if next_code < 4096:
            table[next_code] = table[prev] + entry[:1]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = code
    return bytes(out[:max_pixels]) if len(out) >= max_pixels else None


def _gif_luma(payload: bytes) -> tuple[int, int, bytes] | None:
    """Real pixel decode for GIF (LZW, palette, optional interlace);
    first frame only — later frames are deltas a feature extractor
    doesn't need."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(payload):
        marker = payload[pos]
        if marker == 0x21:  # extension: label byte + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif marker == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                return None
            _ix, _iy, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
            lflags = payload[pos + 9]
            pos += 10
            pal = gct
            if lflags & 0x80:
                n = 2 << (lflags & 7)
                pal = payload[pos : pos + 3 * n]
                pos += 3 * n
            if pal is None or pos >= len(payload) or not iw or not ih:
                return None
            if iw * ih > MAX_PIXELS:
                return None
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                sz = payload[pos]
                data += payload[pos + 1 : pos + 1 + sz]
                pos += 1 + sz
            idx = _gif_lzw(bytes(data), min_code_size, iw * ih)
            if idx is None:
                return None
            if lflags & 0x40:  # Adam-free GIF interlace: 4 row passes
                order = (
                    list(range(0, ih, 8)) + list(range(4, ih, 8))
                    + list(range(2, ih, 4)) + list(range(1, ih, 2))
                )
                rows = [idx[r * iw : (r + 1) * iw] for r in range(ih)]
                deinter = [None] * ih
                for src, dst in enumerate(order):
                    deinter[dst] = rows[src]
                idx = b"".join(deinter)
            luma = bytearray(iw * ih)
            for p in range(iw * ih):
                i = 3 * idx[p]
                if i + 2 >= len(pal):
                    return None
                r, g, b = pal[i], pal[i + 1], pal[i + 2]
                luma[p] = (299 * r + 587 * g + 114 * b) // 1000
            return iw, ih, bytes(luma)
        else:  # trailer or junk before any image
            return None
    return None


def _tiff_luma(payload: bytes) -> tuple[int, int, bytes] | None:
    """Real pixel decode for uncompressed TIFF (Compression=1, 8 bits
    per sample, gray or RGB, strip layout, both byte orders)."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        return None
    off = struct.unpack_from(e + "I", payload, 4)[0]
    if not off or off + 2 > len(payload):
        return None
    n = struct.unpack_from(e + "H", payload, off)[0]
    if off + 2 + n * 12 + 4 > len(payload):
        return None
    tags: dict[int, tuple[int, int, int]] = {}  # tag -> (type, count, value_off)
    for i in range(n):
        entry = off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(e + "HHI", payload, entry)
        tags[tag] = (typ, cnt, entry + 8)

    def vals(tag: int, default=None) -> list[int] | None:
        if tag not in tags:
            return default
        typ, cnt, voff = tags[tag]
        size = {3: 2, 4: 4}.get(typ)
        if size is None:
            return None
        if cnt * size > 4:
            voff = struct.unpack_from(e + "I", payload, voff)[0]
        fmt = e + ("H" if typ == 3 else "I")
        if voff + cnt * size > len(payload):
            return None
        return [struct.unpack_from(fmt, payload, voff + k * size)[0] for k in range(cnt)]

    def one(tag: int, default=None):
        v = vals(tag, None)
        return v[0] if v else default

    width, height = one(256), one(257)
    if not width or not height or width * height > MAX_PIXELS:
        return None
    if one(259, 1) != 1:  # Compression: uncompressed only
        return None
    spp = one(277, 1)
    bits = vals(258, [8])
    if spp not in (1, 3) or bits is None or any(b != 8 for b in bits[:spp]):
        return None
    offsets = vals(273)
    counts = vals(279)
    if not offsets or not counts or len(offsets) != len(counts):
        return None
    data = bytearray()
    for o, c in zip(offsets, counts):
        if o + c > len(payload):
            return None
        data += payload[o : o + c]
    if len(data) < width * height * spp:
        return None
    luma = bytearray(width * height)
    if spp == 1:
        luma[:] = data[: width * height]
        if one(262, 1) == 0:  # PhotometricInterpretation WhiteIsZero
            luma = bytearray(255 - v for v in luma)
    else:
        for p in range(width * height):
            r, g, b = data[3 * p], data[3 * p + 1], data[3 * p + 2]
            luma[p] = (299 * r + 587 * g + 114 * b) // 1000
    return width, height, bytes(luma)


def decode_image_luma(payload: bytes) -> tuple[int, int, bytes] | None:
    """(width, height, row-major luma) for any from-scratch-decodable
    image format; None otherwise (e.g. progressive JPEG, LZW TIFF)."""
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        try:
            from ocr_service_spark.extraction.png_codec import decode_png_gray

            return decode_png_gray(payload)
        except Exception:
            return None
    if payload[:2] == b"\xff\xd8":
        try:
            from ocr_service_spark.extraction.jpeg_codec import decode_jpeg_gray

            return decode_jpeg_gray(payload)
        except Exception:
            return None
    for decoder in (_bmp_luma, _gif_luma, _tiff_luma):
        try:
            out = decoder(payload)
        except Exception:
            out = None
        if out is not None:
            return out
    return None


def box_resize_luma(w: int, h: int, luma: bytes, tw: int, th: int) -> bytes:
    """Box-filter resample (area average over the source box each target
    pixel covers — the right filter for downscale; degenerates to
    nearest-neighbor on upscale)."""
    out = bytearray(tw * th)
    for ty in range(th):
        y0 = ty * h // th
        y1 = max(y0 + 1, (ty + 1) * h // th)
        for tx in range(tw):
            x0 = tx * w // tw
            x1 = max(x0 + 1, (tx + 1) * w // tw)
            total = 0
            for y in range(y0, y1):
                base = y * w
                for x in range(x0, x1):
                    total += luma[base + x]
            out[ty * tw + tx] = total // ((y1 - y0) * (x1 - x0))
    return bytes(out)
