"""Legacy Excel 97-2003 (.xls) text extraction — from scratch, public
[MS-XLS] BIFF8 record layout.

The reference extracts .xls via LibreOffice conversion
(/root/reference/ocr_service/processor/converter.py:227-345); here the
Workbook stream's BIFF records are read directly: the shared string
table (SST, 0x00FC) with its CONTINUE (0x003C) continuation semantics
— a string split inside character data restarts with a fresh grbit
byte in the next segment — plus old-style inline LABEL (0x0204)
strings. Output is the strings in table order, newline-joined. Same
cascade slot as the .doc reader (doc_text.py).
"""

from __future__ import annotations

import struct

from ocr_service_spark.extraction.doc_text import cfb_streams

_SST = 0x00FC
_CONTINUE = 0x003C
_LABEL = 0x0204


class _Segments:
    """Cursor over the byte segments of an SST record + its CONTINUEs,
    implementing the BIFF8 split rules."""

    def __init__(self, segments: list[bytes]) -> None:
        self.segs = segments
        self.i = 0
        self.pos = 0

    def _remaining(self) -> int:
        return len(self.segs[self.i]) - self.pos

    def _advance_segment(self) -> bool:
        if self.i + 1 >= len(self.segs):
            return False
        self.i += 1
        self.pos = 0
        return True

    def exhausted(self) -> bool:
        while self._remaining() == 0:
            if not self._advance_segment():
                return True
        return False

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            if self.exhausted():
                break
            take = min(n, self._remaining())
            out += self.segs[self.i][self.pos : self.pos + take]
            self.pos += take
            n -= take
        return bytes(out)

    def u8(self) -> int:
        b = self.read(1)
        return b[0] if b else 0

    def u16(self) -> int:
        b = self.read(2)
        return struct.unpack("<H", b)[0] if len(b) == 2 else 0

    def u32(self) -> int:
        b = self.read(4)
        return struct.unpack("<I", b)[0] if len(b) == 4 else 0

    def read_chars(self, cch: int, wide: bool) -> str:
        """cch characters; at every segment boundary INSIDE character
        data a fresh grbit byte re-specifies the width ([MS-XLS]
        §2.5.293)."""
        parts: list[str] = []
        while cch > 0:
            if self.exhausted():
                break
            width = 2 if wide else 1
            take = min(cch, self._remaining() // width)
            if take == 0:
                # a wide char split across the boundary cannot happen
                # (writers align); bail defensively
                break
            raw = self.read(take * width)
            parts.append(raw.decode("utf-16-le" if wide else "cp1252", "ignore"))
            cch -= take
            if cch > 0:
                if self.exhausted():
                    break
                wide = bool(self.u8() & 0x01)  # fresh grbit in the CONTINUE
        return "".join(parts)

    def skip(self, n: int) -> None:
        self.read(n)


def _read_sst_strings(segments: list[bytes]) -> list[str]:
    cur = _Segments(segments)
    cur.u32()  # cstTotal
    unique = cur.u32()
    out: list[str] = []
    for _ in range(min(unique, 1_000_000)):
        if cur.exhausted():
            break
        cch = cur.u16()
        grbit = cur.u8()
        wide = bool(grbit & 0x01)
        c_run = cur.u16() if grbit & 0x08 else 0
        cb_ext = cur.u32() if grbit & 0x04 else 0
        out.append(cur.read_chars(cch, wide))
        cur.skip(c_run * 4 + cb_ext)
    return out


def extract_xls_text(data: bytes) -> str:
    """SST + inline-label strings in table order; '' when not a
    readable Excel binary (caller falls back)."""
    try:
        streams = cfb_streams(data)
        wb = streams.get("workbook") or streams.get("book")
        if not wb:
            return ""
        out: list[str] = []
        pos = 0
        while pos + 4 <= len(wb):
            rtype, rlen = struct.unpack_from("<HH", wb, pos)
            pos += 4
            payload = wb[pos : pos + rlen]
            pos += rlen
            if rtype == _SST:
                segments = [payload]
                # swallow the SST's CONTINUE records
                while pos + 4 <= len(wb):
                    ntype, nlen = struct.unpack_from("<HH", wb, pos)
                    if ntype != _CONTINUE:
                        break
                    segments.append(wb[pos + 4 : pos + 4 + nlen])
                    pos += 4 + nlen
                out.extend(_read_sst_strings(segments))
            elif rtype == _LABEL and rlen >= 9:
                # row(2) col(2) ixfe(2) then XLUnicodeString
                cur = _Segments([payload[6:]])
                cch = cur.u16()
                wide = bool(cur.u8() & 0x01)
                out.append(cur.read_chars(cch, wide))
        return "\n".join(s for s in out if s).strip()
    except Exception:
        return ""
