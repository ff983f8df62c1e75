"""Content sniffing: magic-byte file typing + text-shape heuristics.

From-scratch stdlib reimplementation of the detection layer of the
reference service (operators D1-D9 in SURVEY.md §2.2):

- magic-byte typing covering the subset of the ``filetype`` library the
  reference exercises (reference ``utils/utils.py:421-435``);
- HTML / XML / RTF / plain-text heuristics (``utils/utils.py:210-272``);
- ZIP office-container sniff (``utils/utils.py:275-300``);
- OLE compound-file directory walk for legacy-office + encrypted-OOXML
  detection (``utils/utils.py:303-332``), written from the public
  MS-CFB spec (no ``olefile`` dependency).

All functions are pure ``bytes -> value`` and are called per-payload
inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import string
import struct
import xml.sax
import zipfile
from dataclasses import dataclass
from io import BytesIO

# Printable-byte set used by the plain-text heuristic; mirrors
# utils/utils.py:35 (string.printable ASCII plus TAB/LF/CR).
PRINTABLE = set(bytes(string.printable, "ascii")) | {9, 10, 13}
_PRINTABLE_BYTES = bytes(sorted(PRINTABLE))

OLE_SIGNATURE = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

# ODF mimetype-entry -> extension (utils/utils.py:38-47).
ODF_MIME_EXTENSIONS: dict[str, str] = {
    "application/vnd.oasis.opendocument.text": "odt",
    "application/vnd.oasis.opendocument.text-template": "ott",
    "application/vnd.oasis.opendocument.spreadsheet": "ods",
    "application/vnd.oasis.opendocument.spreadsheet-template": "ots",
    "application/vnd.oasis.opendocument.presentation": "odp",
    "application/vnd.oasis.opendocument.presentation-template": "otp",
    "application/vnd.oasis.opendocument.graphics": "odg",
    "application/vnd.oasis.opendocument.formula": "odf",
}

# OOXML marker paths -> extension (utils/utils.py:49-53).
OOXML_PATH_EXTENSIONS: tuple[tuple[str, str], ...] = (
    ("word/document.xml", "docx"),
    ("xl/workbook.xml", "xlsx"),
    ("ppt/presentation.xml", "pptx"),
)

# Legacy OLE stream leaf-names -> extension (utils/utils.py:55-60).
OLE_STREAM_EXTENSIONS: tuple[tuple[str, str], ...] = (
    ("worddocument", "doc"),
    ("workbook", "xls"),
    ("book", "xls"),
    ("powerpoint document", "ppt"),
)
ENCRYPTED_OOXML_STREAMS = {"encryptedpackage", "encryptioninfo"}

MIME_BY_EXT: dict[str, str] = {
    "pdf": "application/pdf",
    "rtf": "application/rtf",
    "png": "image/png",
    "jpg": "image/jpeg",
    "gif": "image/gif",
    "bmp": "image/bmp",
    "tif": "image/tiff",
    "webp": "image/webp",
    "zip": "application/zip",
    "doc": "application/msword",
    "xls": "application/vnd.ms-excel",
    "ppt": "application/vnd.ms-powerpoint",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "odt": "application/vnd.oasis.opendocument.text",
    "ods": "application/vnd.oasis.opendocument.spreadsheet",
    "odp": "application/vnd.oasis.opendocument.presentation",
    # media containers (beyond-reference: a web corpus carries them;
    # the reference's filetype.guess would also type both)
    "mp4": "video/mp4",
    "wav": "audio/x-wav",
    # book container (beyond-reference: routine in web corpora and
    # disproportionately valuable training prose)
    "epub": "application/epub+zip",
}

# Extension groups mirroring filetype.types.DOCUMENT / IMAGE membership
# as used by the reference dispatch (converter.py:506,514).
DOCUMENT_EXTS = {"doc", "docx", "odt", "ods", "odp", "xls", "xlsx", "ppt", "pptx"}
IMAGE_EXTS = {"png", "jpg", "gif", "bmp", "tif", "webp"}
MEDIA_EXTS = {"mp4", "wav"}


@dataclass(frozen=True)
class FileType:
    """Detected magic-byte type: extension + mime (filetype-style)."""

    ext: str
    mime: str


def _zip_names(stream: bytes) -> set[str] | None:
    try:
        with zipfile.ZipFile(BytesIO(stream)) as archive:
            return set(archive.namelist())
    except Exception:
        return None


def infer_zip_office_extension(stream: bytes) -> str | None:
    """ODF mimetype entry, OOXML marker paths, then prefix heuristics
    (utils/utils.py:275-300)."""
    names = _zip_names(stream)
    if names is None:
        return None
    if "mimetype" in names:
        try:
            with zipfile.ZipFile(BytesIO(stream)) as archive:
                mimetype = archive.read("mimetype").decode("ascii", "ignore").strip()
        except Exception:
            mimetype = ""
        ext = ODF_MIME_EXTENSIONS.get(mimetype)
        if ext:
            return ext
    for marker_path, ext in OOXML_PATH_EXTENSIONS:
        if marker_path in names:
            return ext
    lowered = {name.lower() for name in names}
    if any(name.startswith("word/") for name in lowered):
        return "docx"
    if any(name.startswith("xl/") for name in lowered):
        return "xlsx"
    if any(name.startswith("ppt/") for name in lowered):
        return "pptx"
    return None


def ole_stream_names(stream: bytes) -> set[str]:
    """Walk the MS-CFB directory and return lowercase stream paths.

    Minimal compound-file reader (public [MS-CFB] layout): header at 0,
    sector FAT via DIFAT, directory entries are 128 bytes each. Only
    the directory *names* are needed (utils/utils.py:303-310), not the
    stream contents, so mini-FAT/stream data are never touched.
    """
    try:
        if not stream.startswith(OLE_SIGNATURE) or len(stream) < 512:
            return set()
        sector_shift = struct.unpack_from("<H", stream, 30)[0]
        sector_size = 1 << sector_shift
        num_fat_sectors = struct.unpack_from("<I", stream, 44)[0]
        first_dir_sector = struct.unpack_from("<I", stream, 48)[0]
        first_difat_sector = struct.unpack_from("<I", stream, 68)[0]
        num_difat_sectors = struct.unpack_from("<I", stream, 72)[0]

        def sector(idx: int) -> bytes:
            off = 512 + idx * sector_size
            return stream[off : off + sector_size]

        # DIFAT: 109 entries in the header, then chained DIFAT sectors.
        difat = list(struct.unpack_from("<109I", stream, 76))
        next_difat = first_difat_sector
        for _ in range(num_difat_sectors):
            if next_difat in (0xFFFFFFFE, 0xFFFFFFFF):
                break
            data = sector(next_difat)
            entries = struct.unpack(f"<{sector_size // 4}I", data)
            difat.extend(entries[:-1])
            next_difat = entries[-1]
        fat_sectors = [s for s in difat if s not in (0xFFFFFFFF, 0xFFFFFFFE)][:num_fat_sectors]

        fat: list[int] = []
        for fs in fat_sectors:
            fat.extend(struct.unpack(f"<{sector_size // 4}I", sector(fs)))

        # Directory sector chain.
        entries_raw = b""
        sid = first_dir_sector
        seen: set[int] = set()
        while sid not in (0xFFFFFFFE, 0xFFFFFFFF) and sid not in seen and sid < len(fat) + 1:
            seen.add(sid)
            entries_raw += sector(sid)
            sid = fat[sid] if sid < len(fat) else 0xFFFFFFFE

        # Entry: 64-byte UTF-16 name, 2-byte name length, 1-byte type.
        names: dict[int, str] = {}
        children: dict[int, tuple[int, int, int]] = {}
        types: dict[int, int] = {}
        for i in range(len(entries_raw) // 128):
            raw = entries_raw[i * 128 : (i + 1) * 128]
            name_len = struct.unpack_from("<H", raw, 64)[0]
            obj_type = raw[66]
            if obj_type == 0 or name_len < 2:
                continue
            name = raw[: name_len - 2].decode("utf-16-le", "ignore")
            left, right, child = struct.unpack_from("<3I", raw, 68)
            names[i] = name
            children[i] = (left, right, child)
            types[i] = obj_type

        # Flatten the red-black sibling trees into path strings.
        out: set[str] = set()

        def walk(entry_id: int, prefix: str, depth: int) -> None:
            if entry_id == 0xFFFFFFFF or entry_id not in names or depth > 64:
                return
            left, right, child = children[entry_id]
            walk(left, prefix, depth + 1)
            name = names[entry_id]
            path = f"{prefix}{name}" if prefix else name
            if types[entry_id] in (1, 2):  # storage or stream
                out.add(path.lower())
            if child != 0xFFFFFFFF and types[entry_id] in (1, 5):
                walk(child, path + "/" if types[entry_id] == 1 else "", depth + 1)
            walk(right, prefix, depth + 1)

        # Root entry is id 0 (type 5); its child tree holds top-level entries.
        if 0 in children:
            walk(children[0][2], "", 0)
        return out
    except Exception:
        return set()


def is_encrypted_office_document(stream: bytes) -> bool:
    """Encrypted OOXML package in an OLE container (utils/utils.py:313-318)."""
    if not stream.startswith(OLE_SIGNATURE):
        return False
    return ENCRYPTED_OOXML_STREAMS.issubset(ole_stream_names(stream))


def infer_ole_office_extension(stream: bytes) -> str | None:
    """utils/utils.py:321-332."""
    stream_names = ole_stream_names(stream)
    leaf_names = {name.rsplit("/", 1)[-1] for name in stream_names}
    if ENCRYPTED_OOXML_STREAMS.issubset(stream_names):
        return "docx"
    for stream_name, ext in OLE_STREAM_EXTENSIONS:
        if stream_name in leaf_names:
            return ext
    return None


def infer_office_extension_from_content(stream: bytes) -> str | None:
    """utils/utils.py:335-343."""
    if stream.startswith(b"PK"):
        return infer_zip_office_extension(stream)
    if stream.startswith(OLE_SIGNATURE):
        return infer_ole_office_extension(stream)
    return None


def detect_file_type(stream: bytes) -> FileType | None:
    """Magic-byte typing: the subset of ``filetype.guess`` the reference
    dispatch can actually hit (utils/utils.py:421-435).

    Offset-0 magics only (like the upstream matchers); ZIP containers
    are refined into OOXML/ODF document types, OLE containers into
    legacy office types.
    """
    b = stream
    if len(b) < 4:
        return None
    if b.startswith(b"%PDF"):
        return FileType("pdf", MIME_BY_EXT["pdf"])
    if b.startswith(b"{\\rtf"):
        return FileType("rtf", MIME_BY_EXT["rtf"])
    if b.startswith(b"\x89PNG\r\n\x1a\n"):
        return FileType("png", MIME_BY_EXT["png"])
    if b.startswith(b"\xff\xd8\xff"):
        return FileType("jpg", MIME_BY_EXT["jpg"])
    if b.startswith(b"GIF8"):
        return FileType("gif", MIME_BY_EXT["gif"])
    if b.startswith(b"BM"):
        return FileType("bmp", MIME_BY_EXT["bmp"])
    if b.startswith(b"II*\x00") or b.startswith(b"MM\x00*"):
        return FileType("tif", MIME_BY_EXT["tif"])
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return FileType("webp", MIME_BY_EXT["webp"])
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return FileType("wav", MIME_BY_EXT["wav"])
    if len(b) >= 12 and b[4:8] == b"ftyp":
        # ISO BMFF: the type lives at offset 4 (the one non-offset-0
        # magic filetype also special-cases)
        return FileType("mp4", MIME_BY_EXT["mp4"])
    if b.startswith(b"PK\x03\x04"):
        ext = infer_zip_office_extension(b)
        if ext and ext in MIME_BY_EXT:
            return FileType(ext, MIME_BY_EXT[ext])
        # non-office zip: EPUB declares itself in the FIRST, STORED
        # ``mimetype`` member (OCF spec) — a prefix probe, so the hot
        # path never opens the archive a second time; checked AFTER
        # the office refinement so the reference-pinned office dialect
        # is untouched
        from ocr_service_spark.extraction.epub_text import ocf_prefix_is_epub

        if ocf_prefix_is_epub(b):
            return FileType("epub", MIME_BY_EXT["epub"])
        return FileType("zip", MIME_BY_EXT["zip"])
    if b.startswith(OLE_SIGNATURE):
        ext = infer_ole_office_extension(b)
        if ext and ext in MIME_BY_EXT:
            return FileType(ext, MIME_BY_EXT[ext])
        # filetype-style offset-512 magics as last resort
        if len(b) > 515 and b[512:516] == b"\xec\xa5\xc1\x00":
            return FileType("doc", MIME_BY_EXT["doc"])
        return None
    return None


def is_file_content_plain_text(stream: bytes, threshold: float = 0.95) -> bool:
    """UTF-8-decodable head with >=95% printable-ASCII bytes
    (utils/utils.py:210-232, sample 4096, CR/LF/TAB allowed)."""
    if not stream:
        return False
    from ocr_service_spark.extraction.charset import sniff_bom

    bom = sniff_bom(stream)
    if bom is not None and bom[0] != "utf-8-sig":
        # UTF-16/32 plain text (invisible to the byte heuristic):
        # decode, then apply the same printable-ratio test per char —
        # identical semantics to the byte test on ASCII content.
        codec, n = bom
        try:
            text = stream[n : 4096 + n].decode(codec)
        except UnicodeDecodeError:
            return False
        if not text:
            return False
        printable_chars = sum(1 for c in text if ord(c) < 128 and ord(c) in PRINTABLE)
        return printable_chars / len(text) >= threshold
    # a UTF-8 BOM is signalling, not content — don't let its three
    # non-printable bytes sink a short document's printable ratio
    body = stream[3:] if bom is not None else stream
    if not body:
        return False
    sample = body[:4096]
    try:
        sample.decode("utf-8")
    except UnicodeDecodeError:
        return False
    # count via C-level translate (delete printable, measure the rest) —
    # equivalent to the reference's per-byte membership sum, ~100x faster
    printable = len(sample) - len(sample.translate(None, _PRINTABLE_BYTES))
    return printable / len(sample) >= threshold


def is_file_type_html(stream: bytes) -> bool:
    """``<html`` or ``<!doctype html`` in the first 2048 bytes,
    lowercased (utils/utils.py:234-244). Beyond the reference: a
    UTF-16/32 BOM'd page (real on the web, invisible to a raw byte
    scan) is decoded first so the same marker test applies."""
    from ocr_service_spark.extraction.charset import sniff_bom

    bom = sniff_bom(stream)
    if bom is not None and bom[0] != "utf-8-sig":
        codec, n = bom
        head = stream[n : 2048 + n].decode(codec, "ignore").lower()
    else:
        head = stream[:2048].decode(errors="ignore").lower()
    return "<html" in head or "<!doctype html" in head


def is_file_type_xml(stream: bytes) -> bool:
    """Stream parses as XML via ``xml.sax`` (utils/utils.py:246-260)."""
    try:
        xml.sax.parseString(stream, xml.sax.ContentHandler())
        return True
    except Exception:
        return False


def is_file_type_rtf(stream: bytes) -> bool:
    """lstripped 32-byte head starts with ``{\\rtf`` (utils/utils.py:262-272)."""
    head = stream[:32].lstrip()
    return head.startswith(b"{\\rtf")
