"""From-scratch image pixel decoders -> 8-bit luma planes.

One ladder (`decode_image_luma`) over every codec buildable without
native libraries: PNG (extraction/png_codec.py), baseline JPEG
(extraction/jpeg_codec.py), uncompressed BMP, GIF (LZW, incl. the
animated-frame compositor `gif_frames`) and TIFF (none/LZW/PackBits
compression, horizontal-differencing predictor, gray/gray+alpha/RGB/
RGBA). Shared by the multimodal feature operators and the glyph OCR
engine, so any of these formats can carry a page image.
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


def gif_frames(payload: bytes, max_frames: int = 8):
    """Animated-GIF frame sampler: yields up to ``max_frames`` fully
    COMPOSITED canvas lumas (width, height, luma) honoring the GIF89a
    graphic-control semantics — frame offsets, transparent index, and
    disposal methods 2 (restore background) / 3 (restore previous).
    The canvas starts filled with the background color. Stops cleanly
    on any malformed block (yields what it decoded so far)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return
    cw, chh = struct.unpack_from("<HH", payload, 6)
    if not cw or not chh or cw * chh > MAX_PIXELS:
        return
    flags = payload[10]
    bg_idx = payload[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n

    def pal_luma(pal: bytes, idx: int) -> int:
        i = 3 * idx
        if i + 2 >= len(pal):
            return 0
        return (299 * pal[i] + 587 * pal[i + 1] + 114 * pal[i + 2]) // 1000

    bg = pal_luma(gct, bg_idx) if gct else 0
    canvas = bytearray([bg]) * (cw * chh)
    transparent = None
    disposal = 0
    emitted = 0
    while pos < len(payload) and emitted < max_frames:
        marker = payload[pos]
        if marker == 0x21:  # extension
            if pos + 1 < len(payload) and payload[pos + 1] == 0xF9 and pos + 7 < len(payload):
                gflags = payload[pos + 3]
                disposal = (gflags >> 2) & 7
                transparent = payload[pos + 6] if gflags & 1 else None
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif marker == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                return
            ix, iy, iw, ih = struct.unpack_from("<HHHH", payload, pos + 1)
            lflags = payload[pos + 9]
            pos += 10
            pal = gct
            if lflags & 0x80:
                n = 2 << (lflags & 7)
                pal = payload[pos : pos + 3 * n]
                pos += 3 * n
            if pal is None or pos >= len(payload) or not iw or not ih:
                return
            if iw * ih > MAX_PIXELS:
                return
            min_code_size = payload[pos]
            pos += 1
            data = bytearray()
            while pos < len(payload) and payload[pos] != 0:
                sz = payload[pos]
                data += payload[pos + 1 : pos + 1 + sz]
                pos += 1 + sz
            pos += 1  # block terminator
            idx = _gif_lzw(bytes(data), min_code_size, iw * ih)
            if idx is None:
                return
            if lflags & 0x40:  # interlaced frame: 4 row passes
                order = (
                    list(range(0, ih, 8)) + list(range(4, ih, 8))
                    + list(range(2, ih, 4)) + list(range(1, ih, 2))
                )
                rows = [idx[r * iw : (r + 1) * iw] for r in range(ih)]
                deinter: list = [None] * ih
                for src, dst in enumerate(order):
                    deinter[dst] = rows[src]
                idx = b"".join(deinter)
            saved = bytes(canvas) if disposal == 3 else None
            lumas = [pal_luma(pal, i) for i in range(len(pal) // 3)]
            for r in range(ih):
                cy = iy + r
                if cy >= chh:
                    break
                for c in range(iw):
                    cx = ix + c
                    if cx >= cw:
                        break
                    v = idx[r * iw + c]
                    if transparent is not None and v == transparent:
                        continue
                    canvas[cy * cw + cx] = lumas[v] if v < len(lumas) else 0
            yield cw, chh, bytes(canvas)
            emitted += 1
            if disposal == 2:  # restore rect to background
                for r in range(ih):
                    cy = iy + r
                    if cy >= chh:
                        break
                    row0 = cy * cw + ix
                    span = min(iw, cw - ix)
                    canvas[row0 : row0 + span] = bytes([bg]) * span
            elif disposal == 3 and saved is not None:
                canvas[:] = saved
            transparent = None
            disposal = 0
        else:  # trailer (0x3B) or junk
            return


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


def _packbits(data: bytes, expected: int) -> bytes | None:
    """TIFF PackBits (Compression=32773): n in 0..127 copies n+1
    literals, n in -127..-1 repeats the next byte 1-n times, -128 is a
    noop."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                return None
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: noop
    return bytes(out[:expected]) if len(out) >= expected else None


def _tiff_lzw(data: bytes, expected: int) -> bytes | None:
    """TIFF-variant LZW (Compression=5): MSB-first bit packing, codes
    256=CLEAR / 257=EOI, width 9->12 bits with TIFF's early change
    (bump one code before the table fills)."""
    clear, eoi = 256, 257
    code_size = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = nbits = 0
    pos = 0
    while len(out) < expected:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out[:expected]) if len(out) >= expected else None
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (acc >> (nbits - code_size)) & ((1 << code_size) - 1)
        nbits -= code_size
        if code == eoi:
            break
        if code == clear:
            table = table[:258]
            code_size = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            return None
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        # early change: widen when the NEXT code would overflow
        if len(table) + 1 >= (1 << code_size) and code_size < 12:
            code_size += 1
        prev = entry
    return bytes(out[:expected]) if len(out) >= expected else None


def _tiff_luma(payload: bytes) -> tuple[int, int, bytes] | None:
    """Real pixel decode for TIFF: Compression none/LZW/PackBits with
    the horizontal-differencing predictor, 8 bits per sample, gray /
    gray+alpha / RGB / RGBA, strip layout, both byte orders."""
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
    compression = one(259, 1)
    if compression not in (1, 5, 32773):  # none, LZW, PackBits
        return None
    spp = one(277, 1)
    bits = vals(258, [8])
    # gray, gray+alpha, RGB, RGBA (alpha ignored for luma)
    if spp not in (1, 2, 3, 4) or bits is None or any(b != 8 for b in bits[:spp]):
        return None
    offsets = vals(273)
    counts = vals(279)
    if not offsets or not counts or len(offsets) != len(counts):
        return None
    rows_per_strip = one(278, height)
    row_bytes = width * spp
    data = bytearray()
    for si, (o, c) in enumerate(zip(offsets, counts)):
        if o + c > len(payload):
            return None
        strip = payload[o : o + c]
        n_rows = min(rows_per_strip, height - si * rows_per_strip)
        expected = n_rows * row_bytes
        if compression == 5:
            strip = _tiff_lzw(strip, expected)
        elif compression == 32773:
            strip = _packbits(strip, expected)
        if strip is None or len(strip) < expected:
            return None
        data += strip[:expected]
    if len(data) < width * height * spp:
        return None
    if one(317, 1) == 2:  # horizontal differencing predictor
        for y in range(height):
            base = y * row_bytes
            for x in range(spp, row_bytes):
                data[base + x] = (data[base + x] + data[base + x - spp]) & 0xFF
    luma = bytearray(width * height)
    if spp in (1, 2):
        # channel 0 is gray; channel 1 (if any) is alpha
        luma[:] = data[0 : width * height * spp : spp] if spp == 2 else data[: width * height]
        if one(262, 1) == 0:  # PhotometricInterpretation WhiteIsZero
            luma = bytearray(255 - v for v in luma)
    else:
        for p in range(width * height):
            r, g, b = data[spp * p], data[spp * p + 1], data[spp * p + 2]
            luma[p] = (299 * r + 587 * g + 114 * b) // 1000
    return width, height, bytes(luma)


def decode_image_luma(payload: bytes) -> tuple[int, int, bytes] | None:
    """(width, height, row-major luma) for any from-scratch-decodable
    image format (PNG, baseline + progressive JPEG, BMP, GIF,
    none/LZW/PackBits TIFF); None otherwise (e.g. JPEG-in-TIFF)."""
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


def encode_gif_gray(
    width: int,
    height: int,
    frames: list[bytes],
    disposals: list[int] | None = None,
    transparent: int | None = None,
) -> bytes:
    """Test/fixture twin of ``gif_frames``: animated GIF89a from 8-bit
    gray frames (values double as palette indices via a 256-entry
    grayscale GCT, so decoded luma == source value). LZW is emitted as
    literal 9-bit codes with periodic CLEARs — valid GIF any decoder
    accepts, no compression."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # GCT present, 256 entries; bg idx 0
    for v in range(256):
        out += bytes([v, v, v])
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for i, frame in enumerate(frames):
        disposal = (disposals[i] if disposals else 1) & 7
        gflags = (disposal << 2) | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gflags, 0, 0, transparent or 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, width, height) + bytes([0])
        out += bytes([8])  # min code size
        acc = 0
        nbits = 0
        data = bytearray()

        def put(code: int) -> None:
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += 9
            while nbits >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        put(256)  # CLEAR
        for j, v in enumerate(frame):
            if j and j % 200 == 0:
                put(256)
            put(v)
        put(257)  # END
        if nbits:
            data.append(acc & 0xFF)
        for k in range(0, len(data), 255):
            chunk = data[k : k + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def _packbits_encode(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        j = i
        while j + 1 < len(raw) and raw[j + 1] == raw[j] and j - i < 127:
            j += 1
        if j > i + 1:  # run of 3+ (2-byte runs encode fine as literals)
            out += bytes([257 - (j - i + 1), raw[i]])
            i = j + 1
            continue
        j = i
        while j + 1 < len(raw) and j - i < 127:
            if j + 2 < len(raw) and raw[j] == raw[j + 1] == raw[j + 2]:
                break
            j += 1
        out += bytes([j - i]) + raw[i : j + 1]
        i = j + 1
    return bytes(out)


def _tiff_lzw_encode_literals(raw: bytes) -> bytes:
    """Literal-only TIFF LZW (CLEAR, one code per byte, periodic
    resets) — valid input for any decoder, no compression."""
    codes: list[tuple[int, int]] = []
    table_len, code_size = 258, 9
    first_after_clear = True  # decoder adds entries only from the 2nd code on
    codes.append((256, code_size))
    for b in raw:
        codes.append((b, code_size))
        if first_after_clear:
            first_after_clear = False
        else:
            table_len += 1
        if table_len + 1 >= (1 << code_size) and code_size < 12:
            code_size += 1
        if table_len >= 4093:
            codes.append((256, code_size))
            table_len, code_size = 258, 9
            first_after_clear = True
    codes.append((257, code_size))
    acc = n = 0
    out = bytearray()
    for code, size in codes:
        acc = (acc << size) | code
        n += size
        while n >= 8:
            out.append((acc >> (n - 8)) & 0xFF)
            n -= 8
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def encode_tiff_gray(
    width: int,
    height: int,
    luma: bytes,
    compression: int = 1,
    predictor: int = 1,
    alpha: bool = False,
) -> bytes:
    """Test/fixture twin of ``_tiff_luma``: little-endian single-strip
    TIFF from an 8-bit gray plane; Compression 1/5/32773, optional
    horizontal-differencing predictor (LZW), optional alpha channel
    (samples-per-pixel 2)."""
    spp = 2 if alpha else 1
    raw = bytearray()
    if alpha:
        for v in luma:
            raw += bytes([v, 255])
    else:
        raw[:] = luma
    if predictor == 2:
        row_bytes = width * spp
        for y in range(height):
            base = y * row_bytes
            for x in range(row_bytes - 1, spp - 1, -1):
                raw[base + x] = (raw[base + x] - raw[base + x - spp]) & 0xFF
    strip = bytes(raw)
    if compression == 5:
        strip = _tiff_lzw_encode_literals(strip)
    elif compression == 32773:
        strip = _packbits_encode(strip)

    tags = [
        (256, 3, [width]), (257, 3, [height]), (258, 3, [8] * spp),
        (259, 3, [compression]), (262, 3, [1]), (277, 3, [spp]),
        (278, 3, [height]),
    ]
    if predictor == 2:
        tags.append((317, 3, [predictor]))
    ntags = len(tags) + 2  # + offsets, counts
    ifd_off = 8
    ext = bytearray()
    ext_base = ifd_off + 2 + ntags * 12 + 4

    def enc(tag: int, typ: int, vs: list[int]) -> bytes:
        size = {3: 2, 4: 4}[typ]
        fmt = "<" + ("H" if typ == 3 else "I")
        if len(vs) * size <= 4:
            vb = b"".join(struct.pack(fmt, v) for v in vs)
            return struct.pack("<HHI", tag, typ, len(vs)) + vb + b"\x00" * (4 - len(vb))
        off = ext_base + len(ext)
        ext.extend(b"".join(struct.pack(fmt, v) for v in vs))
        return struct.pack("<HHII", tag, typ, len(vs), off)

    entries = [enc(t, ty, vs) for t, ty, vs in tags]
    # strip data goes right after the external arrays (none grow past
    # this point: offsets/counts are single values, inline)
    entries.append(enc(273, 4, [0]))  # patched below
    entries.append(enc(279, 4, [len(strip)]))
    entries.sort(key=lambda b: struct.unpack_from("<H", b, 0)[0])
    strip_off = ext_base + len(ext)
    for i, entry in enumerate(entries):
        if struct.unpack_from("<H", entry, 0)[0] == 273:
            entries[i] = entry[:8] + struct.pack("<I", strip_off)
    ifd = struct.pack("<H", ntags) + b"".join(entries) + struct.pack("<I", 0)
    return b"II*\x00" + struct.pack("<I", ifd_off) + ifd + bytes(ext) + strip
