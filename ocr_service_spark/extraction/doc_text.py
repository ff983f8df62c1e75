"""Legacy Word 97-2003 (.doc) text extraction — from scratch, public
[MS-CFB] + [MS-DOC] layouts only.

The reference extracts .doc via LibreOffice conversion
(/root/reference/ocr_service/processor/converter.py:227-345; fixture
gate tests/test_process.py:115-167 on generic/pat_id_1.doc). That
binary is structurally absent here, so the WordDocument stream is read
directly: FIB -> Clx piece table in the 0Table/1Table stream -> text
runs (CP1252 or UTF-16LE per piece) -> Word control-char
normalization. Deterministic, pure Python, no dependencies.
"""

from __future__ import annotations

import struct

OLE_SIGNATURE = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = {0xFFFFFFFF, 0xFFFFFFFE, 0xFFFFFFFD, 0xFFFFFFFC}


def _read_chain(data: bytes, fat: list[int], start: int, sector_size: int,
                header_bytes: int = 512) -> bytes:
    """Concatenate a FAT sector chain (cycle-guarded)."""
    out = []
    sid, seen = start, set()
    while sid not in _FREESECT and sid not in seen and sid < len(fat):
        seen.add(sid)
        off = header_bytes + sid * sector_size
        out.append(data[off : off + sector_size])
        sid = fat[sid]
    return b"".join(out)


def cfb_streams(data: bytes) -> dict[str, bytes]:
    """All stream contents of an OLE compound file, keyed by lowercase
    top-level name. Complements sniff.ole_stream_names (names only):
    this reader also follows the mini-FAT for streams below the mini
    cutoff, which is where small WordDocument/Table streams live."""
    if not data.startswith(OLE_SIGNATURE) or len(data) < 512:
        return {}
    sector_shift = struct.unpack_from("<H", data, 30)[0]
    mini_shift = struct.unpack_from("<H", data, 32)[0]
    sector_size, mini_size = 1 << sector_shift, 1 << mini_shift
    num_fat_sectors = struct.unpack_from("<I", data, 44)[0]
    first_dir = struct.unpack_from("<I", data, 48)[0]
    mini_cutoff = struct.unpack_from("<I", data, 56)[0]
    first_minifat = struct.unpack_from("<I", data, 60)[0]
    first_difat = struct.unpack_from("<I", data, 68)[0]
    num_difat = struct.unpack_from("<I", data, 72)[0]

    # DIFAT -> FAT
    difat = list(struct.unpack_from("<109I", data, 76))
    nxt = first_difat
    for _ in range(num_difat):
        if nxt in _FREESECT:
            break
        off = 512 + nxt * sector_size
        entries = struct.unpack_from(f"<{sector_size // 4}I", data, off)
        difat.extend(entries[:-1])
        nxt = entries[-1]
    fat: list[int] = []
    for fs in [s for s in difat if s not in _FREESECT][:num_fat_sectors]:
        off = 512 + fs * sector_size
        fat.extend(struct.unpack_from(f"<{sector_size // 4}I", data, off))

    # directory entries
    dir_raw = _read_chain(data, fat, first_dir, sector_size)
    entries = []
    for i in range(len(dir_raw) // 128):
        raw = dir_raw[i * 128 : (i + 1) * 128]
        name_len = struct.unpack_from("<H", raw, 64)[0]
        obj_type = raw[66]
        if obj_type == 0 or name_len < 2:
            entries.append(None)
            continue
        name = raw[: name_len - 2].decode("utf-16-le", "ignore")
        start = struct.unpack_from("<I", raw, 116)[0]
        size = struct.unpack_from("<Q", raw, 120)[0]
        if sector_shift == 9:  # v3: only the low dword of size is valid
            size &= 0xFFFFFFFF
        entries.append((name, obj_type, start, size))

    if not entries or entries[0] is None:
        return {}
    root = entries[0]
    ministream = _read_chain(data, fat, root[2], sector_size)[: root[3]]
    minifat_raw = _read_chain(data, fat, first_minifat, sector_size)
    minifat = list(struct.unpack_from(f"<{len(minifat_raw) // 4}I", minifat_raw, 0))

    out: dict[str, bytes] = {}
    for ent in entries[1:]:
        if ent is None or ent[1] != 2:  # streams only
            continue
        name, _, start, size = ent
        if size < mini_cutoff:
            chunks, sid, seen = [], start, set()
            while sid not in _FREESECT and sid not in seen and sid < len(minifat):
                seen.add(sid)
                chunks.append(ministream[sid * mini_size : (sid + 1) * mini_size])
                sid = minifat[sid]
            content = b"".join(chunks)[:size]
        else:
            content = _read_chain(data, fat, start, sector_size)[:size]
        out[name.lower()] = content
    return out


# Word control characters -> plain text ([MS-DOC] §2.8 text stream)
_CTRL_MAP = {
    0x0D: "\n",   # paragraph mark
    0x0B: "\n",   # line break
    0x07: "\n",   # cell / row mark
    0x0C: "\n",   # page break / section mark
    0x1E: "-",    # non-breaking hyphen
    0x1F: "",     # optional hyphen
    0x13: "",     # field begin
    0x14: "",     # field separator
    0x15: "",     # field end
    0x01: "",     # embedded object / picture anchor
    0x02: "",     # footnote mark
    0x05: "",     # annotation mark
    0x08: "",     # drawn object
}


def _normalize_word_text(text: str) -> str:
    out = []
    for ch in text:
        code = ord(ch)
        if code in _CTRL_MAP:
            out.append(_CTRL_MAP[code])
        elif code >= 0x20 or ch in "\t\n":
            out.append(ch)
    return "".join(out)


def extract_doc_text(data: bytes) -> str:
    """WordDocument-stream text via the Clx piece table; '' when the
    payload is not a readable Word binary (caller falls back)."""
    try:
        streams = cfb_streams(data)
        wd = streams.get("worddocument")
        if not wd or len(wd) < 0x200:
            return ""
        if struct.unpack_from("<H", wd, 0)[0] != 0xA5EC:  # wIdent
            return ""
        flags = struct.unpack_from("<H", wd, 0x0A)[0]
        if flags & 0x0100:  # fEncrypted
            return ""
        table = streams.get(f"{(flags >> 9) & 1}table")
        if table is None:
            return ""

        # FIB variable parts -> fcClx/lcbClx + ccpText
        csw = struct.unpack_from("<H", wd, 32)[0]
        pos = 34 + csw * 2
        cslw = struct.unpack_from("<H", wd, pos)[0]
        fib_rg_lw = pos + 2
        ccp_text = struct.unpack_from("<I", wd, fib_rg_lw + 12)[0]  # FibRgLw97.ccpText
        pos = fib_rg_lw + cslw * 4
        cb_rg_fc_lcb = struct.unpack_from("<H", wd, pos)[0]
        blob = pos + 2
        if cb_rg_fc_lcb < 68:  # need pair index 33 (fcClx)
            return ""
        fc_clx, lcb_clx = struct.unpack_from("<II", wd, blob + 33 * 8)
        clx = table[fc_clx : fc_clx + lcb_clx]

        # Clx = Prc* Pcdt; Prc: 0x01 + cbGrpprl(int16) + data
        p = 0
        while p < len(clx) and clx[p] == 0x01:
            cb = struct.unpack_from("<h", clx, p + 1)[0]
            p += 3 + max(cb, 0)
        if p >= len(clx) or clx[p] != 0x02:  # Pcdt
            return ""
        lcb = struct.unpack_from("<I", clx, p + 1)[0]
        plc = clx[p + 5 : p + 5 + lcb]
        n = (lcb - 4) // 12  # PlcPcd: (n+1) CPs + n PCDs(8B)
        if n <= 0:
            return ""
        cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
        pieces = []
        for i in range(n):
            fc_raw = struct.unpack_from("<I", plc, 4 * (n + 1) + i * 8 + 2)[0]
            cp_len = cps[i + 1] - cps[i]
            if cp_len <= 0:
                continue
            compressed = bool(fc_raw & 0x40000000)
            off = fc_raw & 0x3FFFFFFF
            if compressed:
                raw = wd[off // 2 : off // 2 + cp_len]
                pieces.append(raw.decode("cp1252", "ignore"))
            else:
                raw = wd[off : off + 2 * cp_len]
                pieces.append(raw.decode("utf-16-le", "ignore"))
        text = "".join(pieces)[:ccp_text]
        return _normalize_word_text(text)
    except Exception:
        return ""
