"""EXIF metadata: APP1 segment scan + TIFF IFD walk, both endians.

A training-data pipeline keeps typed metadata columns next to opaque
media payloads (capture time, orientation, camera) — this module
recovers them from raw bytes. The reference service exposes a
per-document metadata dict (ocr_service/processor/processor.py:47,
converter.py:166-523); EXIF is the media-tier analog of that surface.

Two entry containers:
- baseline/progressive JPEG: scan marker segments for APP1 whose body
  starts with ``Exif\\0\\0``; the remainder is a TIFF blob.
- raw TIFF: the payload IS the blob (EXIF tags live on IFD0).

The IFD walk resolves inline vs offset values, ASCII/SHORT/LONG types,
and the 0x8769 Exif sub-IFD pointer. ``build_exif_blob`` /
``splice_app1`` exist so tests and the q102 corpus can synthesize
payloads from parameters the oracle mirrors closed-form — the parser
is exercised on bytes it did not produce (hand-packed fixtures in
tests pin the wire format independently).
"""

from __future__ import annotations

import struct

TAG_MAKE = 0x010F
TAG_MODEL = 0x0110
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132
TAG_EXIF_IFD = 0x8769
TAG_GPS_IFD = 0x8825
TAG_DATETIME_ORIGINAL = 0x9003
# GPS IFD tag space (EXIF 2.32 §4.6.6) — tag ids restart from 0x0000
TAG_GPS_LAT_REF = 0x0001
TAG_GPS_LAT = 0x0002
TAG_GPS_LON_REF = 0x0003
TAG_GPS_LON = 0x0004

_TYPE_ASCII = 2
_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_RATIONAL = 5
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

# GPS tag ids collide with low-numbered IFD0 tags (the GPS IFD restarts
# the tag space), so the GPS sub-IFD is walked with its OWN wanted map
_GPS_WANTED = {
    TAG_GPS_LAT_REF: "gps_lat_ref",
    TAG_GPS_LAT: "gps_lat",
    TAG_GPS_LON_REF: "gps_lon_ref",
    TAG_GPS_LON: "gps_lon",
}


# -- builder -------------------------------------------------------------------
def build_exif_blob(
    make: str,
    model: str,
    orientation: int,
    datetime_original: str,
    big_endian: bool = False,
    gps: tuple | None = None,
) -> bytes:
    """TIFF-format EXIF blob: IFD0 carries Make/Model/Orientation/
    DateTime + the 0x8769 pointer; the Exif sub-IFD carries
    DateTimeOriginal. ``gps`` optionally adds a GPS sub-IFD behind the
    0x8825 pointer as ``(lat_ref, (deg, min, sec), lon_ref,
    (deg, min, sec))`` — each coordinate stored as three RATIONALs
    with denominator 1."""
    e = ">" if big_endian else "<"

    def entries_bytes(entries, data_base):
        ext = bytearray()
        out = b""
        for tag, typ, values in entries:
            if typ == _TYPE_ASCII:
                raw = values.encode("ascii") + b"\x00"
                cnt = len(raw)
            elif typ == _TYPE_RATIONAL:
                raw = b"".join(
                    struct.pack(e + "II", num, den) for num, den in values
                )
                cnt = len(values)
            else:
                raw = b"".join(
                    struct.pack(e + ("H" if typ == _TYPE_SHORT else "I"), v)
                    for v in values
                )
                cnt = len(values)
            if len(raw) <= 4:
                val = raw.ljust(4, b"\x00")
            else:
                val = struct.pack(e + "I", data_base + len(ext))
                ext += raw
            out += struct.pack(e + "HHI", tag, typ, cnt) + val
        return out, bytes(ext)

    # layout: header(8) | IFD0 | ifd0-ext | exif-IFD | exif-ext
    #         | [gps-IFD | gps-ext]
    ifd0_entries = [
        (TAG_MAKE, _TYPE_ASCII, make),
        (TAG_MODEL, _TYPE_ASCII, model),
        (TAG_ORIENTATION, _TYPE_SHORT, [orientation]),
        (TAG_DATETIME, _TYPE_ASCII, datetime_original),
        (TAG_EXIF_IFD, _TYPE_LONG, [0]),  # patched below
    ]
    if gps is not None:
        ifd0_entries.append((TAG_GPS_IFD, _TYPE_LONG, [0]))  # patched below
    sub_entries = [(TAG_DATETIME_ORIGINAL, _TYPE_ASCII, datetime_original)]

    ifd0_size = 2 + len(ifd0_entries) * 12 + 4
    # first pass to size ifd0's external area (stable across patching:
    # pointer values live inline, never in ext)
    _, ifd0_ext = entries_bytes(ifd0_entries, 0)
    sub_off = 8 + ifd0_size + len(ifd0_ext)
    sub_size = 2 + len(sub_entries) * 12 + 4
    _, sub_ext = entries_bytes(sub_entries, 0)

    ifd0_entries[4] = (TAG_EXIF_IFD, _TYPE_LONG, [sub_off])
    gps_ifd = b""
    if gps is not None:
        lat_ref, lat_dms, lon_ref, lon_dms = gps
        gps_entries = [
            (TAG_GPS_LAT_REF, _TYPE_ASCII, lat_ref),
            (TAG_GPS_LAT, _TYPE_RATIONAL, [(v, 1) for v in lat_dms]),
            (TAG_GPS_LON_REF, _TYPE_ASCII, lon_ref),
            (TAG_GPS_LON, _TYPE_RATIONAL, [(v, 1) for v in lon_dms]),
        ]
        gps_off = sub_off + sub_size + len(sub_ext)
        gps_size = 2 + len(gps_entries) * 12 + 4
        gps_body, gps_ext = entries_bytes(gps_entries, gps_off + gps_size)
        gps_ifd = (
            struct.pack(e + "H", len(gps_entries))
            + gps_body
            + struct.pack(e + "I", 0)
            + gps_ext
        )
        ifd0_entries[5] = (TAG_GPS_IFD, _TYPE_LONG, [gps_off])

    ifd0_body, ifd0_ext = entries_bytes(ifd0_entries, 8 + ifd0_size)
    sub_body, sub_ext = entries_bytes(sub_entries, sub_off + sub_size)

    header = (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(e + "I", 8)
    ifd0 = struct.pack(e + "H", len(ifd0_entries)) + ifd0_body + struct.pack(
        e + "I", 0
    )
    sub = struct.pack(e + "H", len(sub_entries)) + sub_body + struct.pack(
        e + "I", 0
    )
    return header + ifd0 + ifd0_ext + sub + sub_ext + gps_ifd


def splice_app1(jpeg: bytes, tiff_blob: bytes) -> bytes:
    """Insert an APP1/Exif segment immediately after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    body = b"Exif\x00\x00" + tiff_blob
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return jpeg[:2] + seg + jpeg[2:]


# -- parser --------------------------------------------------------------------
def _exif_blob_span(payload: bytes) -> tuple[int, int] | None:
    """(start, end) of the TIFF blob within the payload — the whole
    payload for a raw TIFF container, the APP1/Exif body for a JPEG."""
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return 0, len(payload)
    if payload[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # entropy data starts: no APP1 past here
            return None
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        if seg_len < 2 or pos + 2 + seg_len > len(payload):
            return None
        if marker == 0xE1 and payload[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return pos + 10, pos + 2 + seg_len
        pos += 2 + seg_len
    return None


def _exif_tiff_blob(payload: bytes) -> bytes | None:
    span = _exif_blob_span(payload)
    return None if span is None else payload[span[0] : span[1]]


def _walk_ifd(
    blob: bytes, e: str, off: int, wanted: dict, seen: set | None = None
) -> dict:
    out: dict = {}
    # untrusted input: a sub-IFD pointer may loop back at an already
    # visited offset (or chain arbitrarily deep) — track visited offsets
    # so a crafted payload degrades to a partial parse, never recursion
    seen = set() if seen is None else seen
    if off in seen or len(seen) >= 8:
        return out
    seen.add(off)
    if off + 2 > len(blob):
        return out
    n = struct.unpack_from(e + "H", blob, off)[0]
    if off + 2 + n * 12 + 4 > len(blob):
        return out
    for i in range(n):
        entry = off + 2 + i * 12
        tag, typ, cnt = struct.unpack_from(e + "HHI", blob, entry)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue
        voff = entry + 8
        if cnt * size > 4:
            voff = struct.unpack_from(e + "I", blob, voff)[0]
        if voff + cnt * size > len(blob):
            continue
        if tag == TAG_EXIF_IFD and typ == _TYPE_LONG and cnt == 1:
            sub_off = struct.unpack_from(e + "I", blob, voff)[0]
            out.update(_walk_ifd(blob, e, sub_off, wanted, seen))
            continue
        if tag == TAG_GPS_IFD and typ == _TYPE_LONG and cnt == 1:
            # the GPS IFD restarts the tag space, so it gets its own map
            gps_off = struct.unpack_from(e + "I", blob, voff)[0]
            out.update(_walk_ifd(blob, e, gps_off, _GPS_WANTED, seen))
            continue
        if tag not in wanted:
            continue
        if typ == _TYPE_ASCII:
            raw = blob[voff : voff + cnt].split(b"\x00", 1)[0]
            try:
                out[wanted[tag]] = raw.decode("ascii")
            except UnicodeDecodeError:
                continue
        elif typ in (_TYPE_SHORT, _TYPE_LONG):
            fmt = e + ("H" if typ == _TYPE_SHORT else "I")
            out[wanted[tag]] = struct.unpack_from(fmt, blob, voff)[0]
        elif typ == _TYPE_RATIONAL:
            out[wanted[tag]] = [
                struct.unpack_from(e + "II", blob, voff + 8 * k)
                for k in range(cnt)
            ]
    return out


def parse_exif(payload: bytes) -> dict | None:
    """(make, model, orientation, datetime_original) from JPEG APP1 or
    raw TIFF; None when the container has no EXIF."""
    blob = _exif_tiff_blob(payload)
    if blob is None or len(blob) < 8:
        return None
    if blob[:4] == b"II*\x00":
        e = "<"
    elif blob[:4] == b"MM\x00*":
        e = ">"
    else:
        return None
    ifd0 = struct.unpack_from(e + "I", blob, 4)[0]
    wanted = {
        TAG_MAKE: "make",
        TAG_MODEL: "model",
        TAG_ORIENTATION: "orientation",
        TAG_DATETIME_ORIGINAL: "datetime_original",
    }
    out = _walk_ifd(blob, e, ifd0, wanted)
    return out or None


# -- GPS privacy scrub -----------------------------------------------------------
def scrub_gps(payload: bytes) -> tuple[bytes, bool]:
    """Remove GPS coordinates from a JPEG/TIFF payload IN PLACE
    (length-preserving byte surgery, so every other EXIF offset stays
    valid): the 0x8825 entry is dropped from IFD0 (count decremented,
    later entries shifted up, the freed 12 bytes zeroed) and the GPS
    IFD itself — entry table plus every out-of-line value such as the
    coordinate RATIONALs — is overwritten with zeros, so the
    coordinates are gone from the bytes, not merely unreferenced.

    Returns ``(scrubbed_payload, had_gps)``. The untrusted-media
    contract holds: any structural inconsistency degrades to
    ``(payload, False)`` — never an exception, never a corrupted
    rewrite (the surgery is all-or-nothing)."""
    try:
        span = _exif_blob_span(payload)
        if span is None:
            return payload, False
        start, end = span
        blob = memoryview(payload)[start:end]
        if len(blob) < 8:
            return payload, False
        if bytes(blob[:4]) == b"II*\x00":
            e = "<"
        elif bytes(blob[:4]) == b"MM\x00*":
            e = ">"
        else:
            return payload, False
        ifd0 = struct.unpack_from(e + "I", blob, 4)[0]
        if ifd0 + 2 > len(blob):
            return payload, False
        n = struct.unpack_from(e + "H", blob, ifd0)[0]
        if ifd0 + 2 + n * 12 + 4 > len(blob):
            return payload, False
        gps_entry_idx = None
        gps_off = None
        for i in range(n):
            entry = ifd0 + 2 + i * 12
            tag, typ, cnt = struct.unpack_from(e + "HHI", blob, entry)
            if tag == TAG_GPS_IFD and typ == _TYPE_LONG and cnt == 1:
                gps_entry_idx = i
                gps_off = struct.unpack_from(e + "I", blob, entry + 8)[0]
                break
        if gps_entry_idx is None:
            return payload, False
        if gps_off + 2 > len(blob):
            return payload, False
        g = struct.unpack_from(e + "H", blob, gps_off)[0]
        gps_end = gps_off + 2 + g * 12 + 4
        if gps_end > len(blob):
            return payload, False
        # collect zero ranges BEFORE mutating (all-or-nothing)
        zero_ranges = [(gps_off, gps_end)]
        for i in range(g):
            entry = gps_off + 2 + i * 12
            _tag, typ, cnt = struct.unpack_from(e + "HHI", blob, entry)
            size = _TYPE_SIZES.get(typ)
            if size is None or cnt * size <= 4:
                continue
            voff = struct.unpack_from(e + "I", blob, entry + 8)[0]
            if voff + cnt * size <= len(blob):
                zero_ranges.append((voff, voff + cnt * size))
        buf = bytearray(payload)

        def b(off: int) -> int:  # blob-relative -> payload-relative
            return start + off

        for lo, hi in zero_ranges:
            buf[b(lo) : b(hi)] = bytes(hi - lo)
        # drop the 0x8825 entry: count-1, later entries shift up 12,
        # next-IFD pointer follows them, freed 12 bytes zeroed
        struct.pack_into(e + "H", buf, b(ifd0), n - 1)
        entries_start = ifd0 + 2
        k = gps_entry_idx
        tail = bytes(
            blob[entries_start + (k + 1) * 12 : entries_start + n * 12 + 4]
        )
        buf[b(entries_start + k * 12) : b(entries_start + k * 12) + len(tail)] = tail
        zero_at = entries_start + (n - 1) * 12 + 4
        buf[b(zero_at) : b(zero_at) + 12] = bytes(12)
        return bytes(buf), True
    except Exception:
        return payload, False
