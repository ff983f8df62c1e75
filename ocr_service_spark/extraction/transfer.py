"""Transfer-encoding decode: gzip/zlib-wrapped payloads.

Web-corpus payloads frequently arrive compressed (WARC records store
the HTTP body as transferred; mirrors and data dumps gzip whole
documents). The reference service never sees this — its callers
upload decoded files — so, like the charset ladder, this is a
beyond-reference rung of the ingest path: a payload that IS a gzip
member (magic ``1f 8b``) or a bare zlib stream is decompressed and
the inner bytes re-enter classification.

Safety at corpus scale (the same decode-bomb posture as the image
codecs' pixel budgets):

- output is capped (default 64 MiB) and enforced *during* streaming
  decompression — a 10^6:1 zip bomb costs one buffer, not one OOM'd
  executor;
- at most 3 nested layers (gzip-of-gzip happens in the wild;
  unbounded recursion does not);
- any failure (truncated stream, bad CRC, budget breach) returns the
  ORIGINAL bytes unchanged — degradation, never an exception.

Everything is stdlib ``zlib`` and runs per payload inside the same
Arrow-batched UDFs as the rest of the extraction stack.
"""

from __future__ import annotations

import zlib

GZIP_MAGIC = b"\x1f\x8b"
# zlib CMF/FLG pairs with deflate method + valid check bits (RFC 1950)
_ZLIB_FIRST = 0x78
_ZLIB_SECOND = {0x01, 0x5E, 0x9C, 0xDA}

MAX_OUTPUT_BYTES = 64 * 1024 * 1024
MAX_LAYERS = 3


def looks_compressed(payload: bytes) -> str | None:
    """'gzip' / 'deflate' when the head bytes say so, else None."""
    if payload.startswith(GZIP_MAGIC):
        return "gzip"
    if len(payload) >= 2 and payload[0] == _ZLIB_FIRST and payload[1] in _ZLIB_SECOND:
        return "deflate"
    return None


def _inflate(payload: bytes, wbits: int, budget: int) -> bytes | None:
    """Streaming decompress with an output cap; None on any failure."""
    d = zlib.decompressobj(wbits)
    out = []
    size = 0
    try:
        chunk = d.decompress(payload, budget + 1)
        size += len(chunk)
        if size > budget or d.unconsumed_tail:
            return None  # budget breach mid-stream
        out.append(chunk)
        tail = d.flush()
        size += len(tail)
        if size > budget:
            return None
        out.append(tail)
        if not d.eof:
            return None  # truncated stream
        return b"".join(out)
    except zlib.error:
        return None


def decode_transfer_encoding(
    payload: bytes, budget: int = MAX_OUTPUT_BYTES
) -> tuple[bytes, str | None]:
    """(decoded_bytes, encoding_label) — label is None when the
    payload was not compressed (or failed to decode and passes
    through unchanged). Nested layers are unwrapped up to MAX_LAYERS
    and reported outermost-first, comma-joined ("gzip,gzip")."""
    labels: list[str] = []
    current = payload
    for _ in range(MAX_LAYERS):
        kind = looks_compressed(current)
        if kind is None:
            break
        wbits = 16 + zlib.MAX_WBITS if kind == "gzip" else zlib.MAX_WBITS
        inner = _inflate(current, wbits, budget)
        if inner is None:
            break  # undecodable: keep what we have so far
        labels.append(kind)
        current = inner
    if not labels:
        return payload, None
    return current, ",".join(labels)
