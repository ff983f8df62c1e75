"""WARC (ISO 28500) record reading — the Common Crawl source format.

A Common-Crawl-style pages table is *distributed* as WARC: one file
per crawl shard, each record its own gzip member, members
concatenated back-to-back so a reader can split on member boundaries
without decompressing its neighbors. This module is the from-scratch
ingest rung that turns those bytes into pages rows. The reference
service has no crawl source (its API carries uploaded files —
SURVEY.md §3.2); beyond-reference like the charset/transfer/link
layers.

Format handled:

- **member splitting**: sequential ``zlib`` decompression with
  ``unused_data`` hand-off (each gzip member ends exactly at the next
  member's ``1f 8b`` magic); plain uncompressed WARC (records
  concatenated with their ``\\r\\n\\r\\n`` terminators) is detected and
  split by walking Content-Length;
- **record parsing**: ``WARC/1.x`` version line, case-insensitive
  headers, ``Content-Length``-delimited block;
- **HTTP response extraction**: for ``WARC-Type: response`` records
  whose block is an HTTP message — status line, headers, body;
  a ``Content-Encoding: gzip/deflate`` body is inflated through the
  bomb-safe ``transfer.decode_transfer_encoding`` budget;
- non-response records (``warcinfo``, ``request``, ``metadata``)
  are surfaced with a null payload so provenance survives.

Safety posture matches the rest of the ingest stack: per-record and
per-file output budgets, truncated/corrupt members end the walk
(records already split still parse), malformed records yield an
error row rather than an exception.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Any

from ocr_service_spark.extraction.transfer import decode_transfer_encoding

GZIP_MAGIC = b"\x1f\x8b"
MAX_MEMBERS = 100_000  # per input blob
MAX_RECORD_BYTES = 64 * 1024 * 1024


def split_members(data: bytes) -> list[bytes]:
    """Concatenated-gzip WARC -> one decompressed record per member.

    Sequential inflate: each ``zlib.decompressobj`` consumes exactly
    one member and hands the remainder over via ``unused_data`` — the
    standard streaming walk (no magic-byte scanning, which would
    misfire on 1f 8b inside compressed data). Uncompressed input is
    returned whole for the record walker to split by Content-Length.
    A truncated/corrupt member ends the walk; prior members survive.
    """
    if not data.startswith(GZIP_MAGIC):
        return [data] if data else []
    out: list[bytes] = []
    rest = data
    while rest.startswith(GZIP_MAGIC) and len(out) < MAX_MEMBERS:
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        try:
            member = d.decompress(rest, MAX_RECORD_BYTES)
        except zlib.error:
            break
        if not d.eof:  # truncated or over-budget member
            break
        out.append(member)
        rest = d.unused_data
    return out


def _split_records_plain(data: bytes) -> list[bytes]:
    """Uncompressed WARC: records separated by their Content-Length
    plus the mandated trailing CRLFCRLF."""
    records: list[bytes] = []
    pos = 0
    while pos < len(data) and len(records) < MAX_MEMBERS:
        if not data[pos : pos + 5].startswith(b"WARC/"):
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = data[pos : head_end + 4]
        length = 0
        for line in head.split(b"\r\n"):
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                try:
                    length = int(v.strip())
                except ValueError:
                    length = 0
        end = head_end + 4 + length
        records.append(data[pos:end])
        pos = end
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
    return records


def parse_record(raw: bytes) -> dict[str, Any] | None:
    """One decompressed record -> {version, headers (lower-cased
    keys), block}; None if the version line is missing."""
    if not raw.startswith(b"WARC/"):
        return None
    head_end = raw.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    lines = raw[:head_end].split(b"\r\n")
    version = lines[0].decode("ascii", "replace")
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
                "utf-8", "replace"
            )
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        length = len(raw) - head_end - 4
    block = raw[head_end + 4 : head_end + 4 + length]
    return {"version": version, "headers": headers, "block": block}


def parse_http_response(block: bytes) -> tuple[int | None, dict[str, str], bytes]:
    """HTTP response message -> (status, lower-cased headers, body).
    A Content-Encoding'd body is inflated via the bomb-safe transfer
    budget; on any malformation returns (None, {}, original block)."""
    head_end = block.find(b"\r\n\r\n")
    if head_end < 0 or not block.startswith(b"HTTP/"):
        return None, {}, block
    lines = block[:head_end].split(b"\r\n")
    parts = lines[0].split(None, 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, {}, block
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, sep, v = line.partition(b":")
        if sep:
            headers[k.strip().decode("ascii", "replace").lower()] = v.strip().decode(
                "utf-8", "replace"
            )
    body = block[head_end + 4 :]
    enc = headers.get("content-encoding", "").lower()
    if enc in ("gzip", "x-gzip", "deflate"):
        body, _ = decode_transfer_encoding(body)
    return status, headers, body


def warc_to_pages(data: bytes) -> list[dict[str, Any]]:
    """WARC bytes (gzip-per-member or plain) -> page dicts:
    (warc_type, url, warc_ts, status, content_type, payload). Response
    records carry the decoded HTTP body as payload; other record
    types carry a null payload. Malformed records yield a
    warc_type='invalid' row so corpus accounting stays exact."""
    members = split_members(data)
    if len(members) == 1 and not data.startswith(GZIP_MAGIC):
        members = _split_records_plain(members[0])
    rows: list[dict[str, Any]] = []
    for raw in members:
        rec = parse_record(raw)
        if rec is None:
            rows.append(
                {
                    "warc_type": "invalid",
                    "url": None,
                    "warc_ts": None,
                    "status": None,
                    "content_type": None,
                    "payload": None,
                }
            )
            continue
        h = rec["headers"]
        wtype = h.get("warc-type", "unknown").lower()
        row = {
            "warc_type": wtype,
            "url": h.get("warc-target-uri"),
            "warc_ts": h.get("warc-date"),
            "status": None,
            "content_type": None,
            "payload": None,
        }
        if wtype == "response":
            status, hh, body = parse_http_response(rec["block"])
            row["status"] = status
            ct = hh.get("content-type")
            row["content_type"] = ct.split(";")[0].strip().lower() if ct else None
            row["payload"] = body
        elif wtype == "conversion":
            # WET-style record: the block IS the converted text; the
            # record-level Content-Type header describes it directly
            # (no HTTP envelope to parse).
            ct = h.get("content-type")
            row["content_type"] = ct.split(";")[0].strip().lower() if ct else None
            row["payload"] = rec["block"]
        rows.append(row)
    return rows


def build_warc(records: list[dict[str, Any]], compress: bool = True) -> bytes:
    """Writer twin (tests + closed-form corpora): each record becomes
    its own gzip member (mtime=0 so bytes are deterministic in-process).
    ``records``: dicts with warc_type, url, ts, and either ``body`` +
    optional http_headers/status for responses, or ``block`` verbatim.
    """
    out = io.BytesIO()
    for r in records:
        if r.get("block") is not None:
            block = r["block"]
        else:
            body = r.get("body", b"")
            status = r.get("status", 200)
            http_headers = dict(r.get("http_headers", {}))
            http_headers.setdefault("Content-Type", "text/html; charset=utf-8")
            http_headers["Content-Length"] = str(len(body))
            head = f"HTTP/1.1 {status} OK\r\n" + "".join(
                f"{k}: {v}\r\n" for k, v in http_headers.items()
            )
            block = head.encode("ascii") + b"\r\n" + body
        warc_headers = [
            ("WARC-Type", r.get("warc_type", "response")),
            ("WARC-Target-URI", r.get("url", "")),
            ("WARC-Date", r.get("ts", "2026-01-01T00:00:00Z")),
            (
                "Content-Type",
                r.get("content_type", "application/http; msgtype=response"),
            ),
            ("Content-Length", str(len(block))),
        ]
        rec = (
            b"WARC/1.0\r\n"
            + "".join(f"{k}: {v}\r\n" for k, v in warc_headers).encode("utf-8")
            + b"\r\n"
            + block
            + b"\r\n\r\n"
        )
        out.write(gzip.compress(rec, mtime=0) if compress else rec)
    return out.getvalue()
