"""Charset sniffing + decoding for web-corpus payloads.

The reference service decodes every text-like payload as UTF-8
(converter.py:70-106 feeds raw bytes to BeautifulSoup, whose
UnicodeDammit layer does the sniffing) — fine for its clinical-note
corpus, wrong for a Common-Crawl-style corpus where several percent of
pages are windows-1251/shift_jis/iso-8859-* or carry UTF-16 BOMs.
This module is the from-scratch equivalent of that sniffing layer,
built on the public WHATWG encoding-sniffing algorithm
(https://html.spec.whatwg.org/multipage/parsing.html#determining-the-character-encoding),
precedence:

    1. byte-order mark (UTF-8 / UTF-16 LE/BE / UTF-32 LE/BE);
    2. a declared encoding in the first 1024 bytes — ``<meta
       charset=...>``, ``<meta http-equiv="content-type"
       content="...charset=...">``, or an ``<?xml ... encoding=...?>``
       declaration;
    3. a strict UTF-8 probe (valid UTF-8 is self-identifying);
    4. windows-1252 fallback (never fails; the WHATWG default for
       ASCII-superset content).

Two WHATWG label rules matter for real pages and are reproduced here:
ISO-8859-1 / latin-1 / US-ASCII labels map to **windows-1252** (the
bytes 0x80-0x9F are almost always cp1252 punctuation on the web even
when pages claim latin-1), and UTF-16 labels *declared in a meta tag*
map to UTF-8 (content that was byte-sniffable as ASCII cannot actually
be UTF-16).

Everything is stdlib (``codecs`` ships every codec used). Decoding
uses ``errors="ignore"`` to stay byte-parity-compatible with the
pinned UTF-8 tier (finalize re-encodes with ``errors="replace"``
anyway). All functions are pure ``bytes -> value`` and run inside
Arrow-batched pandas UDFs like the rest of the extraction stack.
"""

from __future__ import annotations

import codecs
import re

# Order matters: UTF-32-LE's BOM (FF FE 00 00) starts with UTF-16-LE's
# (FF FE) — test the 4-byte marks first.
_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)

# Declared-encoding scan over the ASCII-superset head. One pattern
# covers <meta charset="X">, <meta http-equiv=... content="...;
# charset=X"> and <?xml version="1.0" encoding="X"?>.
_DECL_RE = re.compile(
    rb"""(?:<meta[^>]{0,512}?charset\s*=\s*["']?\s*([A-Za-z0-9._:-]+)
         |<\?xml[^>]{0,256}?encoding\s*=\s*["']([A-Za-z0-9._:-]+))""",
    re.IGNORECASE | re.VERBOSE,
)

_HEAD_BYTES = 1024  # WHATWG prescan window

# WHATWG label -> codec overrides (subset covering the latin/misdecl
# cases; every other label resolves through codecs.lookup aliases).
_LABEL_OVERRIDES: dict[str, str] = {
    # the latin-1 family is windows-1252 on the real web
    "iso-8859-1": "cp1252",
    "iso8859-1": "cp1252",
    "iso_8859-1": "cp1252",
    "latin1": "cp1252",
    "latin-1": "cp1252",
    "l1": "cp1252",
    "cp819": "cp1252",
    "iso-ir-100": "cp1252",
    "ascii": "cp1252",
    "us-ascii": "cp1252",
    "ansi_x3.4-1968": "cp1252",
    "windows-1252": "cp1252",
    "x-cp1252": "cp1252",
    # UTF-16 declared in a byte-sniffable meta tag cannot be true
    "utf-16": "utf-8",
    "utf-16le": "utf-8",
    "utf-16be": "utf-8",
    "unicodefffe": "utf-8",
    "unicodefeff": "utf-8",
}


def sniff_bom(payload: bytes) -> tuple[str, int] | None:
    """(codec, bom_length) when the payload opens with a known BOM."""
    for bom, codec in _BOMS:
        if payload.startswith(bom):
            return codec, len(bom)
    return None


def normalize_label(label: str) -> str | None:
    """A declared charset label -> canonical codec name, or None when
    the label resolves to nothing decodable."""
    key = label.strip().strip("\"'").lower()
    if not key:
        return None
    if key in _LABEL_OVERRIDES:
        return _LABEL_OVERRIDES[key]
    try:
        name = codecs.lookup(key).name
    except LookupError:
        return None
    # codecs normalizes e.g. "windows-1252" -> "cp1252", "utf8" -> "utf-8"
    return _LABEL_OVERRIDES.get(name, name)


def sniff_declared_charset(payload: bytes) -> str | None:
    """Declared encoding in the first 1024 bytes (meta/xml-decl), as a
    canonical codec name; None when absent or unresolvable."""
    m = _DECL_RE.search(payload[:_HEAD_BYTES])
    if not m:
        return None
    raw = m.group(1) or m.group(2)
    try:
        return normalize_label(raw.decode("ascii", "ignore"))
    except Exception:
        return None


def sniff_charset(payload: bytes, markup: bool = True) -> tuple[str, int, str]:
    """Full sniff -> (codec, bom_bytes_to_strip, source).

    ``source`` is one of ``bom`` / ``declared`` / ``probe`` /
    ``fallback``; ``markup=False`` skips the declared-encoding scan
    (plain-text payloads have no meta tags to honor).
    """
    bom = sniff_bom(payload)
    if bom is not None:
        codec, n = bom
        return codec, n, "bom"
    if markup:
        declared = sniff_declared_charset(payload)
        if declared is not None:
            return declared, 0, "declared"
    try:
        payload.decode("utf-8")
        return "utf-8", 0, "probe"
    except UnicodeDecodeError:
        return "cp1252", 0, "fallback"


def decode_payload(payload: bytes, markup: bool = True) -> tuple[str, str]:
    """Sniff + decode -> (charset_label, text). The label is the
    sniffed codec name ("utf-8-sig" marks a BOM'd UTF-8 payload); the
    BOM is stripped before decoding. Decoding never raises: a payload
    whose declared codec chokes mid-stream degrades via
    ``errors="ignore"`` exactly like the pinned UTF-8 tier."""
    codec, strip, _source = sniff_charset(payload, markup=markup)
    body = payload[strip:]
    decode_codec = "utf-8" if codec == "utf-8-sig" else codec
    try:
        return codec, body.decode(decode_codec, "ignore")
    except Exception:
        # unknown/broken codec object: the cp1252 floor cannot fail
        return "cp1252", body.decode("cp1252", "ignore")


def decode_markup(payload: bytes) -> tuple[str, str]:
    """HTML/XML-ish payload -> (charset_label, text): full WHATWG-style
    precedence including declared encodings."""
    return decode_payload(payload, markup=True)


def decode_text(payload: bytes) -> tuple[str, str]:
    """Plain-text payload -> (charset_label, text): BOM, then UTF-8
    probe, then cp1252 — no declaration scan."""
    return decode_payload(payload, markup=False)


# -- mojibake (UTF-8-as-cp1252 double encoding) repair ------------------------
# The classic web-corpus defect: UTF-8 bytes decoded as windows-1252
# somewhere upstream turn "café" into "cafÃ©"; done twice it becomes
# "cafÃƒÂ©". The ftfy-style repair inverts the mistake: re-encode as
# cp1252 and strictly re-decode as UTF-8, accepting the step ONLY when
# the round trip is byte-valid UTF-8 and changes the text — legitimate
# cp1252-looking text (a lone "é") fails the strict UTF-8 decode and
# passes through untouched. Iterating bounds-many times unwinds
# double mojibake. Pure str -> str; runs inside the same Arrow-batched
# pandas UDFs as the decode ladder.
MOJIBAKE_MAX_ITERS = 2


def mojibake(text: str, times: int = 1) -> str:
    """Deliberately corrupt: decode the UTF-8 bytes as cp1252 (writer
    twin for tests/fixtures; raises if a byte has no cp1252 mapping,
    so fixtures stay in the repairable subset)."""
    for _ in range(times):
        text = text.encode("utf-8").decode("cp1252")
    return text


def repair_mojibake(text: str, max_iters: int = MOJIBAKE_MAX_ITERS) -> tuple[str, int]:
    """(repaired_text, n_iterations). Each iteration requires: every
    char encodable in cp1252, the bytes strictly valid UTF-8, and a
    result different from the input."""
    n = 0
    for _ in range(max_iters):
        try:
            fixed = text.encode("cp1252").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            break
        if fixed == text:
            break
        text = fixed
        n += 1
    return text, n
