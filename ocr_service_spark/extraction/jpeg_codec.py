"""From-scratch baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

``decode_jpeg_gray`` implements the baseline sequential DCT process:
marker walk (DQT/DHT/SOF0/SOF1/DRI/SOS), canonical Huffman table
construction, the entropy bit reader with 0xFF00 byte-stuffing and
restart-marker handling, MCU/data-unit interleaving per component
sampling factors, DC prediction + AC run-length decode, dequantization,
zigzag reorder, separable 2-D IDCT, and level shift. Only the LUMA
plane is returned (the Y component is always full resolution, so
chroma upsampling is unnecessary for feature extraction / OCR);
grayscale JPEGs decode directly.

``encode_jpeg_gray`` is the test/fixture twin: single-component
baseline with self-describing Huffman tables (our own canonical
fixed-length layout emitted in DHT — any valid table is legal JPEG)
and a configurable quantization table; with the all-ones table the
encode/decode roundtrip is exact to within DCT rounding (±2 gray
levels), which the tests pin.

Progressive (SOF2), arithmetic coding, 12-bit precision and lossless
modes raise ``JpegError`` — callers fall back to header-only handling.
"""

from __future__ import annotations

import math
import struct

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# separable IDCT basis: _COS[u][x] = c(u)/2 * cos((2x+1) u pi / 16)
_COS = [
    [
        (math.sqrt(0.5) if u == 0 else 1.0) / 2.0 * math.cos((2 * x + 1) * u * math.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
]


class JpegError(ValueError):
    pass


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code) -> symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-segment bit reader: MSB-first, 0xFF00 unstuffing; stops
    at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> bool:
        if self.marker is not None:
            return False
        while True:
            if self.pos >= len(self.data):
                return False
            b = self.data[self.pos]
            if b != 0xFF:
                self.pos += 1
                break
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 2
                break
            if nxt == 0xFF:
                # T.81 B.1.1.2: optional fill byte before a marker
                self.pos += 1
                continue
            self.marker = nxt
            return False
        self.bits = (self.bits << 8) | b
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise JpegError("bitstream exhausted")
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        self.bits = 0
        self.nbits = 0
        if self.marker is None:
            # scan forward to the marker (0xFF 0xFF = fill byte, keep going)
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] not in (0x00, 0xFF):
                    self.marker = self.data[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
        else:
            self.pos += 2  # consume the marker we stopped at
        if self.marker != 0xD0 + (n & 7):
            raise JpegError(f"expected RST{n & 7}, got {self.marker}")
        self.marker = None

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    # T.81 F.2.2.1: map the s-bit magnitude to the signed coefficient
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _idct_block(coef: list[float]) -> list[int]:
    # rows then columns, each a 1-D 8-point IDCT
    tmp = [0.0] * 64
    for r in range(8):
        base = r * 8
        row = coef[base : base + 8]
        for x in range(8):
            tmp[base + x] = sum(row[u] * _COS[u][x] for u in range(8))
    out = [0] * 64
    for c in range(8):
        col = [tmp[r * 8 + c] for r in range(8)]
        for y in range(8):
            v = sum(col[u] * _COS[u][y] for u in range(8))
            p = int(round(v)) + 128
            out[y * 8 + c] = 0 if p < 0 else (255 if p > 255 else p)
    return out


# pure-Python entropy decode + IDCT costs ~2 us/pixel; cap the work so
# an adversarial/huge scan degrades to the header-only path instead of
# stalling an executor task (the page-timeout analog, settings.py:32)
MAX_PIXELS = 4_000_000


def decode_jpeg_gray(data: bytes, max_pixels: int = MAX_PIXELS) -> tuple[int, int, bytes]:
    """Baseline JPEG -> (width, height, 8-bit luma plane)."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError("marker desync")
        while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1  # T.81 B.1.1.2 fill bytes between segments
        marker = data[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            if marker == 0xD9:
                break
            continue
        if pos + 2 > len(data):
            raise JpegError("truncated segment")
        seglen = struct.unpack_from(">H", data, pos)[0]
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise JpegError("16-bit quant tables unsupported")
                qt[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = list(body[i + 1 : i + 17])
                n = sum(counts)
                symbols = body[i + 17 : i + 17 + n]
                huff[(tc, th)] = _build_huffman(counts, symbols)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            precision = body[0]
            if precision != 8:
                raise JpegError("only 8-bit precision")
            h, w = struct.unpack_from(">HH", body, 1)
            if w * h > max_pixels:
                raise JpegError("image exceeds pure-python decode budget")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("non-baseline JPEG process")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"id": cid, "dc": tables >> 4, "ac": tables & 15})
            pos += seglen
            break
        pos += seglen
    if frame is None or scan is None:
        raise JpegError("missing SOF/SOS")

    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    for s in scan:
        if s["id"] not in by_id:
            raise JpegError("scan references unknown component")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
        raise JpegError("bad sampling factors")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # per-component plane (only Y is kept, but all must be decoded)
    y_comp = comps[0]
    yw, yh = mcus_x * y_comp["h"] * 8, mcus_y * y_comp["v"] * 8
    yplane = bytearray(yw * yh)

    reader = _BitReader(data, pos)
    dc_pred = {c["id"]: 0 for c in comps}

    def decode_unit(dc_t: dict, ac_t: dict, q: list[int], cid: int) -> list[float]:
        coef = [0.0] * 64
        ssss = reader.decode_huff(dc_t)
        diff = _extend(reader.receive(ssss), ssss)
        dc_pred[cid] += diff
        coef[0] = dc_pred[cid] * q[0]
        k = 1
        while k < 64:
            rs = reader.decode_huff(ac_t)
            r, size = rs >> 4, rs & 15
            if size == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise JpegError("AC run past block end")
            coef[ZIGZAG[k]] = _extend(reader.receive(size), size) * q[k]
            k += 1
        return coef

    mcu_count = 0
    rst_n = 0

    def maybe_restart() -> None:
        nonlocal mcu_count, rst_n, dc_pred
        if restart_interval and mcu_count and mcu_count % restart_interval == 0:
            reader.align_and_expect_rst(rst_n)
            rst_n = (rst_n + 1) & 7
            dc_pred = {c["id"]: 0 for c in comps}
        mcu_count += 1

    if len(scan) == 1:
        # T.81 A.2: a single-component scan is non-interleaved — data
        # units iterate in plain raster order over the component's own
        # ceil(cw/8) x ceil(ch/8) grid regardless of its declared
        # sampling factors (one data unit per "MCU", incl. for restart)
        s0 = scan[0]
        comp = by_id[s0["id"]]
        if comp is not y_comp:
            raise JpegError("first scan is not the luma component")
        dc_t, ac_t, q = huff.get((0, s0["dc"])), huff.get((1, s0["ac"])), qt.get(comp["tq"])
        if dc_t is None or ac_t is None or q is None:
            raise JpegError("missing table")
        cw = -(-(w * comp["h"]) // hmax)
        ch = -(-(h * comp["v"]) // vmax)
        if cw != w or ch != h:
            raise JpegError("subsampled luma component")
        yw = -(-w // 8) * 8
        yplane = bytearray(yw * (-(-h // 8) * 8))
        for byi in range(-(-h // 8)):
            for bxi in range(-(-w // 8)):
                maybe_restart()
                px = _idct_block(decode_unit(dc_t, ac_t, q, comp["id"]))
                x0, y0 = bxi * 8, byi * 8
                for row in range(8):
                    dst = (y0 + row) * yw + x0
                    yplane[dst : dst + 8] = bytes(px[row * 8 : row * 8 + 8])
    else:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for s in scan:
                    comp = by_id[s["id"]]
                    dc_t = huff.get((0, s["dc"]))
                    ac_t = huff.get((1, s["ac"]))
                    q = qt.get(comp["tq"])
                    if dc_t is None or ac_t is None or q is None:
                        raise JpegError("missing table")
                    for bv in range(comp["v"]):
                        for bh in range(comp["h"]):
                            coef = decode_unit(dc_t, ac_t, q, comp["id"])
                            if comp is y_comp:
                                px = _idct_block(coef)
                                x0 = (mx * comp["h"] + bh) * 8
                                y0 = (my * comp["v"] + bv) * 8
                                for row in range(8):
                                    dst = (y0 + row) * yw + x0
                                    yplane[dst : dst + 8] = bytes(px[row * 8 : row * 8 + 8])
    # crop the padded plane to the true dimensions
    luma = bytearray(w * h)
    for row in range(h):
        luma[row * w : (row + 1) * w] = yplane[row * yw : row * yw + w]
    return w, h, bytes(luma)


# ---------------------------------------------------------------------------
# Encoder (grayscale baseline; test/fixture twin)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1s per spec


def _fdct_block(px: list[int]) -> list[int]:
    out = [0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (px[y * 8 + x] - 128) * math.cos(
                        (2 * x + 1) * u * math.pi / 16
                    ) * math.cos((2 * y + 1) * v * math.pi / 16)
            cu = math.sqrt(0.5) if u == 0 else 1.0
            cv = math.sqrt(0.5) if v == 0 else 1.0
            out[v * 8 + u] = int(round(s * cu * cv / 4.0))
    return out


def _size_cat(v: int) -> int:
    s = 0
    a = abs(v)
    while a:
        s += 1
        a >>= 1
    return s


# our canonical tables (emitted in DHT, so decoder and encoder agree):
# DC size categories 0..11 as 4-bit codes; all 162 (run,size) AC symbols
# as 9-bit codes
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_DC_SYMBOLS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_AC_COUNTS = [0] * 8 + [len(_AC_SYMBOLS)] + [0] * 7


def _encode_table(counts: list[int], symbols: bytes) -> dict[int, tuple[int, int]]:
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def encode_jpeg_gray(width: int, height: int, luma: bytes, quant: list[int] | None = None) -> bytes:
    """8-bit grayscale -> baseline JPEG with self-described tables.
    Default quant table is all ones (near-lossless: ±2 from DCT
    rounding)."""
    q = quant or [1] * 64
    dc_table = _encode_table(_DC_COUNTS, _DC_SYMBOLS)
    ac_table = _encode_table(_AC_COUNTS, _AC_SYMBOLS)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(q))
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", height, width) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS)
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMBOLS)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    dc_prev = 0
    for by in range(-(-height // 8)):
        for bx in range(-(-width // 8)):
            px = []
            for y in range(8):
                for x in range(8):
                    sy = min(by * 8 + y, height - 1)
                    sx = min(bx * 8 + x, width - 1)
                    px.append(luma[sy * width + sx])
            coef = _fdct_block(px)
            qc = [int(round(coef[ZIGZAG[k]] / q[k])) for k in range(64)]
            diff = qc[0] - dc_prev
            dc_prev = qc[0]
            s = _size_cat(diff)
            code, length = dc_table[s]
            bw.write(code, length)
            if s:
                bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
            # AC run-length
            run = 0
            last_nz = 0
            for k in range(1, 64):
                if qc[k]:
                    last_nz = k
            for k in range(1, last_nz + 1):
                v = qc[k]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_table[0xF0]
                    bw.write(code, length)
                    run -= 16
                s = _size_cat(v)
                code, length = ac_table[(run << 4) | s]
                bw.write(code, length)
                bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz != 63:
                code, length = ac_table[0x00]
                bw.write(code, length)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
