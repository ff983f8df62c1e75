"""From-scratch baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

``decode_jpeg_gray`` implements the baseline sequential DCT process:
marker walk (DQT/DHT/SOF0/SOF1/SOF2/DRI/SOS), canonical Huffman table
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

Progressive JPEG (SOF2) decodes too (``_decode_progressive``):
coefficients accumulate across scans — DC first/refinement, AC
spectral-selection bands with successive approximation and EOB runs —
then dequantize + IDCT once; ``encode_jpeg_gray_progressive`` is its
four-scan test twin, and progressive decode is pinned bit-identical
to the baseline decode of the same source. Arithmetic coding, 12-bit
precision and lossless modes raise ``JpegError`` — callers fall back
to header-only handling.
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
    if sum(counts) > len(symbols):
        raise JpegError("truncated DHT symbol list")
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
    """JPEG (baseline or progressive) -> (width, height, luma plane).
    Malformed input raises JpegError — truncation/corruption anywhere
    in the marker walk or entropy decode is a controlled rejection."""
    try:
        return _decode_jpeg_gray(data, max_pixels)
    except (IndexError, struct.error) as exc:
        raise JpegError(f"malformed JPEG structure: {exc}") from exc


def _decode_jpeg_gray(data: bytes, max_pixels: int) -> tuple[int, int, bytes]:
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG")
    pos = 2
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    prog_scans: list[dict] = []
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 baseline, SOF2 progressive
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
            frame = {"w": w, "h": h, "comps": comps, "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("unsupported JPEG process")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if not body:
                raise JpegError("truncated SOS")
            ns = body[0]
            if len(body) < 1 + 2 * ns + 3:
                raise JpegError("truncated SOS")
            scan = []
            for c in range(ns):
                cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"id": cid, "dc": tables >> 4, "ac": tables & 15})
            if frame is not None and frame.get("progressive"):
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ah_al = body[3 + 2 * ns]
                # snapshot the table objects NOW — DHT may redefine them
                # between scans
                prog_scans.append(
                    {
                        "comps": scan,
                        "ss": ss,
                        "se": se,
                        "ah": ah_al >> 4,
                        "al": ah_al & 15,
                        "pos": pos + seglen,
                        "dc_tables": {s["id"]: huff.get((0, s["dc"])) for s in scan},
                        "ac_tables": {s["id"]: huff.get((1, s["ac"])) for s in scan},
                        "restart": restart_interval,
                    }
                )
                # skip the entropy-coded segment: next non-stuffed,
                # non-RST, non-fill marker
                p = pos + seglen
                while p + 1 < len(data):
                    if data[p] == 0xFF and data[p + 1] not in (0x00, 0xFF) and not (
                        0xD0 <= data[p + 1] <= 0xD7
                    ):
                        break
                    p += 1
                pos = p
                scan = None
                continue
            pos += seglen
            break
        pos += seglen
    if frame is not None and frame.get("progressive"):
        if not prog_scans:
            raise JpegError("missing SOF/SOS")
        return _decode_progressive(data, frame, prog_scans, qt, max_pixels)
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


def _decode_progressive(
    data: bytes, frame: dict, scans: list[dict], qt: dict, max_pixels: int
) -> tuple[int, int, bytes]:
    """Progressive JPEG (SOF2, T.81 G): coefficients accumulate across
    scans — DC first/refinement (interleaved or not) and per-component
    AC spectral-selection bands with successive approximation + EOB
    runs. Only the luma component's coefficients are stored; chroma DC
    in interleaved scans is entropy-decoded for bitstream sync and
    discarded, and chroma-only AC scans are skipped wholesale (each
    scan's entropy segment is independent)."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 4 and 1 <= vmax <= 4):
        raise JpegError("bad sampling factors")
    y_comp = comps[0]
    if -(-(w * y_comp["h"]) // hmax) != w or -(-(h * y_comp["v"]) // vmax) != h:
        raise JpegError("subsampled luma component")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # padded Y block grid (interleaved scans address edge-padding blocks)
    ybw = mcus_x * y_comp["h"]
    ybh = mcus_y * y_comp["v"]
    if ybw * ybh * 64 > 4 * max_pixels:
        raise JpegError("image exceeds pure-python decode budget")
    coefs: list[list[int]] = [[0] * 64 for _ in range(ybw * ybh)]
    # tight (non-interleaved) Y grid
    tbw, tbh = -(-w // 8), -(-h // 8)

    for scan in scans:
        ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
        ns = len(scan["comps"])
        for s in scan["comps"]:
            if s["id"] not in by_id:
                raise JpegError("scan references unknown component")
        reader = _BitReader(data, scan["pos"])
        restart = scan["restart"]
        rst_n = 0
        unit = 0
        dc_pred = {c["id"]: 0 for c in comps}
        eobrun = 0

        def maybe_restart() -> None:
            nonlocal unit, rst_n, dc_pred, eobrun
            if restart and unit and unit % restart == 0:
                reader.align_and_expect_rst(rst_n)
                rst_n = (rst_n + 1) & 7
                dc_pred = {c["id"]: 0 for c in comps}
                eobrun = 0
            unit += 1

        def dc_unit(comp: dict, dc_t: dict | None, blk: int | None) -> None:
            if ah == 0:
                if dc_t is None:
                    raise JpegError("missing table")
                ssss = reader.decode_huff(dc_t)
                dc_pred[comp["id"]] += _extend(reader.receive(ssss), ssss)
                if blk is not None:
                    coefs[blk][0] = dc_pred[comp["id"]] << al
            else:
                bit = reader.read_bit()
                if blk is not None and bit:
                    coefs[blk][0] |= bit << al

        def ac_first(coef: list[int], ac_t: dict) -> None:
            nonlocal eobrun
            if eobrun > 0:
                eobrun -= 1
                return
            k = ss
            while k <= se:
                rs = reader.decode_huff(ac_t)
                r, s = rs >> 4, rs & 15
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        return
                    k += 16
                    continue
                k += r
                if k > se:
                    raise JpegError("AC run past band end")
                coef[ZIGZAG[k]] = _extend(reader.receive(s), s) << al
                k += 1

        def ac_refine(coef: list[int], ac_t: dict) -> None:
            # T.81 G.1.2.3: correction bits for history-nonzero
            # coefficients interleave with newly-significant ones
            nonlocal eobrun
            bit = 1 << al
            if eobrun > 0:
                eobrun -= 1
                for j in range(ss, se + 1):
                    z = ZIGZAG[j]
                    if coef[z] != 0 and reader.read_bit() and not (coef[z] & bit):
                        coef[z] += bit if coef[z] > 0 else -bit
                return
            k = ss
            while k <= se:
                rs = reader.decode_huff(ac_t)
                r, s = rs >> 4, rs & 15
                val = 0
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        r = 64  # sentinel: sweep corrections to band end
                else:
                    if s != 1:
                        raise JpegError("bad refinement magnitude")
                    val = bit if reader.read_bit() else -bit
                while k <= se:
                    z = ZIGZAG[k]
                    if coef[z] != 0:
                        if reader.read_bit() and not (coef[z] & bit):
                            coef[z] += bit if coef[z] > 0 else -bit
                    else:
                        if r == 0:
                            if val:
                                coef[z] = val
                            k += 1
                            break
                        r -= 1
                    k += 1

        if ns > 1 or ss == 0:
            if ss != 0 or se != 0:
                raise JpegError("interleaved AC scan is illegal in progressive")
            if ns > 1:
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        maybe_restart()
                        for s in scan["comps"]:
                            comp = by_id[s["id"]]
                            dc_t = scan["dc_tables"][s["id"]]
                            for bv in range(comp["v"]):
                                for bh in range(comp["h"]):
                                    blk = None
                                    if comp is y_comp:
                                        blk = (my * comp["v"] + bv) * ybw + mx * comp["h"] + bh
                                    dc_unit(comp, dc_t, blk)
            else:
                s0 = scan["comps"][0]
                comp = by_id[s0["id"]]
                if comp is not y_comp:
                    continue  # sync not needed: scans are independent segments
                for byi in range(tbh):
                    for bxi in range(tbw):
                        maybe_restart()
                        dc_unit(comp, scan["dc_tables"][s0["id"]], byi * ybw + bxi)
        else:
            s0 = scan["comps"][0]
            comp = by_id[s0["id"]]
            if comp is not y_comp:
                continue  # chroma AC: skip (independent entropy segment)
            ac_t = scan["ac_tables"][s0["id"]]
            if ac_t is None:
                raise JpegError("missing table")
            for byi in range(tbh):
                for bxi in range(tbw):
                    maybe_restart()
                    coef = coefs[byi * ybw + bxi]
                    if ah == 0:
                        ac_first(coef, ac_t)
                    else:
                        ac_refine(coef, ac_t)

    q = qt.get(y_comp["tq"])
    if q is None:
        raise JpegError("missing table")
    qnat = [0] * 64
    for k in range(64):
        qnat[ZIGZAG[k]] = q[k]
    yw = tbw * 8
    yplane = bytearray(yw * tbh * 8)
    for byi in range(tbh):
        for bxi in range(tbw):
            coef = coefs[byi * ybw + bxi]
            px = _idct_block([coef[i] * qnat[i] for i in range(64)])
            x0, y0 = bxi * 8, byi * 8
            for row in range(8):
                dst = (y0 + row) * yw + x0
                yplane[dst : dst + 8] = bytes(px[row * 8 : row * 8 + 8])
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


# all 256 RS symbols (255 at 9 bits + 1 at 10 — a DHT count byte caps
# at 255): canonical, none all-ones; lets the progressive encoder emit
# any EOBn/ZRL/(r,s) combination
_PROG_AC_COUNTS = [0] * 8 + [255, 1] + [0] * 6
_PROG_AC_SYMBOLS = bytes(range(256))


def encode_jpeg_gray_progressive(
    width: int, height: int, luma: bytes, quant: list[int] | None = None
) -> bytes:
    """Progressive (SOF2) grayscale encoder — the test/fixture twin of
    ``_decode_progressive``. Four scans exercising every decoder path:
    DC first at Al=1, DC refinement, AC 1-63 first at Al=1 (EOB runs,
    ZRL), AC refinement at Al=0 (newly-significant coefficients,
    inline + EOB-run correction bits)."""
    q = quant or [1] * 64
    tbw, tbh = -(-width // 8), -(-height // 8)
    blocks: list[list[int]] = []
    for by in range(tbh):
        for bx in range(tbw):
            px = []
            for y in range(8):
                for x in range(8):
                    sy = min(by * 8 + y, height - 1)
                    sx = min(bx * 8 + x, width - 1)
                    px.append(luma[sy * width + sx])
            coef = _fdct_block(px)
            blocks.append([int(round(coef[ZIGZAG[k]] / q[k])) for k in range(64)])

    dc_table = _encode_table(_DC_COUNTS, _DC_SYMBOLS)
    ac_table = _encode_table(_PROG_AC_COUNTS, list(_PROG_AC_SYMBOLS))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(q))
    out += seg(0xC2, bytes([8]) + struct.pack(">HH", height, width) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMBOLS)
    out += seg(0xC4, bytes([0x10]) + bytes(_PROG_AC_COUNTS) + _PROG_AC_SYMBOLS)

    def sos(ss: int, se: int, ah: int, al: int, bits: "_BitWriter") -> bytes:
        bits.flush()
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al])) + bits.out

    # --- scan 1: DC first, Al=1 (arithmetic shift per T.81 point transform)
    bw = _BitWriter()
    prev = 0
    for blk in blocks:
        v = blk[0] >> 1
        diff = v - prev
        prev = v
        s = _size_cat(diff)
        code, length = dc_table[s]
        bw.write(code, length)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out += sos(0, 0, 0, 1, bw)

    # --- scan 2: DC refinement, Ah=1 Al=0 (one bit per unit)
    bw = _BitWriter()
    for blk in blocks:
        bw.write(blk[0] & 1, 1)
    out += sos(0, 0, 1, 0, bw)

    def emit_sym(bw: "_BitWriter", rs: int) -> None:
        code, length = ac_table[rs]
        bw.write(code, length)

    def flush_eob(bw: "_BitWriter", count: int, corrections: list[int]) -> None:
        if count == 0:
            return
        r = count.bit_length() - 1
        emit_sym(bw, r << 4)
        if r:
            bw.write(count - (1 << r), r)
        for bit in corrections:
            bw.write(bit, 1)

    # --- scan 3: AC 1..63 first, Al=1
    bw = _BitWriter()
    eob = 0
    for blk in blocks:
        vals = [0] * 64
        for k in range(1, 64):
            c = blk[k]
            vals[k] = (abs(c) >> 1) * (1 if c >= 0 else -1)
        last = max((k for k in range(1, 64) if vals[k]), default=0)
        if last == 0:
            eob += 1
            if eob == 32767:
                flush_eob(bw, eob, [])
                eob = 0
            continue
        flush_eob(bw, eob, [])
        eob = 0
        r = 0
        for k in range(1, last + 1):
            v = vals[k]
            if v == 0:
                r += 1
                continue
            while r > 15:
                emit_sym(bw, 0xF0)
                r -= 16
            s = _size_cat(v)
            emit_sym(bw, (r << 4) | s)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if last < 63:
            eob = 1
    flush_eob(bw, eob, [])
    out += sos(1, 63, 0, 1, bw)

    # --- scan 4: AC 1..63 refinement, Ah=1 Al=0
    bw = _BitWriter()
    eob = 0
    eob_corrections: list[int] = []
    for blk in blocks:
        history = [abs(blk[k]) >> 1 != 0 for k in range(64)]
        newly = [abs(blk[k]) == 1 for k in range(64)]
        if not any(newly[1:]):
            eob += 1
            eob_corrections.extend(abs(blk[k]) & 1 for k in range(1, 64) if history[k])
            if eob == 32767:
                flush_eob(bw, eob, eob_corrections)
                eob, eob_corrections = 0, []
            continue
        flush_eob(bw, eob, eob_corrections)
        eob, eob_corrections = 0, []
        # event queue mirrors the decoder's walk: correction bits are
        # consumed positionally interleaved with the zero-run slots a
        # symbol covers, not batched
        queue: list[tuple[str, int]] = []
        last_new = max(k for k in range(1, 64) if newly[k])
        for k in range(1, last_new + 1):
            if history[k]:
                queue.append(("c", abs(blk[k]) & 1))
            elif newly[k]:
                nz = sum(1 for item in queue if item[0] == "z")
                while nz > 15:
                    emit_sym(bw, 0xF0)
                    zpop = 0
                    while zpop < 16:
                        kind, bit = queue.pop(0)
                        if kind == "z":
                            zpop += 1
                        else:
                            bw.write(bit, 1)
                    nz -= 16
                emit_sym(bw, (nz << 4) | 1)
                bw.write(1 if blk[k] > 0 else 0, 1)
                for kind, bit in queue:
                    if kind == "c":
                        bw.write(bit, 1)
                queue = []
            else:
                queue.append(("z", 0))
        # tail of this block (positions last_new+1..63) joins the EOB run
        tail = [abs(blk[k]) & 1 for k in range(last_new + 1, 64) if history[k]]
        if last_new < 63:
            eob = 1
            eob_corrections = tail
    flush_eob(bw, eob, eob_corrections)
    out += sos(1, 63, 1, 0, bw)

    out += b"\xff\xd9"
    return bytes(out)
