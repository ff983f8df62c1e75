"""Common-Crawl-style CDX(J) index reader.

Common Crawl publishes its URL index as CDXJ text lines
(``<urlkey(SURT)> <14-digit-timestamp> <json>``, the pywb/cdxj
format); the per-capture JSON carries url, mime, status, digest,
length, offset and the WARC filename. Reading this index is how real
pipelines decide WHAT to fetch out of the petabyte WARC store before
touching any payload bytes — dedup by content digest and
latest-capture election happen on the index, which is ~4 orders of
magnitude smaller than the crawl.

The parse is a pure whole-stage-codegen projection: one anchored
regex splits the three fields, ``from_json`` decodes the JSON blob.
No Python, no shuffle — at 100 TB of index this runs scan-side and
the only shuffles belong to the downstream dedup aggregations.
Malformed lines (the index files do contain stray header/footer
noise) yield a NULL urlkey and are dropped, never an error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# capture JSON schema (pywb cdxj fields; all strings in the wire format)
CDX_JSON_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)

_CDX_LINE_RE = r"^(\S+) ([0-9]{14}) (\{.*\})$"


def parse_cdx(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """CDXJ text lines -> typed capture records.

    Output: (urlkey, cdx_ts, url, mime, status int, digest,
    length bigint, offset bigint, filename). Lines that do not match
    the CDXJ shape are dropped (NULL-urlkey filter)."""
    c = F.col(line_col)
    urlkey = F.regexp_extract(c, _CDX_LINE_RE, 1)
    ts = F.regexp_extract(c, _CDX_LINE_RE, 2)
    j = F.from_json(F.regexp_extract(c, _CDX_LINE_RE, 3), CDX_JSON_SCHEMA)
    return (
        lines.select(
            F.nullif(urlkey, F.lit("")).alias("urlkey"),
            ts.alias("cdx_ts"),
            j["url"].alias("url"),
            j["mime"].alias("mime"),
            j["status"].cast("int").alias("status"),
            j["digest"].alias("digest"),
            j["length"].cast("bigint").alias("length"),
            j["offset"].cast("bigint").alias("offset"),
            j["filename"].alias("filename"),
        )
        .filter(F.col("urlkey").isNotNull())
    )
