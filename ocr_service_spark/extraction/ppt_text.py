"""Legacy PowerPoint 97-2003 (.ppt) text extraction — from scratch,
public [MS-PPT] record layout.

The reference extracts .ppt via LibreOffice conversion
(/root/reference/ocr_service/processor/converter.py:227-345); here the
'PowerPoint Document' stream is walked directly: records are
(verAndInstance, type, length) headers; containers (recVer == 0xF)
recurse; text lives in TextCharsAtom (UTF-16LE) and TextBytesAtom
(CP1252). Same cascade slot as the .doc reader (doc_text.py).
"""

from __future__ import annotations

import struct

from ocr_service_spark.extraction.doc_text import cfb_streams

_TEXT_CHARS_ATOM = 0x0FA0
_TEXT_BYTES_ATOM = 0x0FA8
_CSTRING = 0x0FBA


def _walk(buf: bytes, pos: int, end: int, out: list[str], depth: int) -> None:
    while pos + 8 <= end:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", buf, pos)
        pos += 8
        rend = min(pos + rlen, end)
        if (ver_inst & 0x000F) == 0x000F and depth < 32:
            _walk(buf, pos, rend, out, depth + 1)
        elif rtype in (_TEXT_CHARS_ATOM, _CSTRING):
            out.append(buf[pos:rend].decode("utf-16-le", "ignore"))
        elif rtype == _TEXT_BYTES_ATOM:
            out.append(buf[pos:rend].decode("cp1252", "ignore"))
        pos = rend


def extract_ppt_text(data: bytes) -> str:
    """Slide/outline text in record order; '' when not a readable
    PowerPoint binary (caller falls back)."""
    try:
        streams = cfb_streams(data)
        doc = streams.get("powerpoint document")
        if not doc:
            return ""
        out: list[str] = []
        _walk(doc, 0, len(doc), out, 0)
        # PPT uses \r for line breaks inside a text atom
        text = "\n".join(t.replace("\r", "\n").strip("\x00") for t in out if t)
        return text.strip()
    except Exception:
        return ""
