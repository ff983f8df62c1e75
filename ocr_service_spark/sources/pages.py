"""Pages-table sources: schema, readers, payload ladder, deterministic
synthetic generator, and the reference-fixture loader.

Input shape is authoritative from BASELINE.json ``input_hint``:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

``html`` carries the raw payload bytes of *any* format (the name
follows the Common-Crawl column, not the content type) — it plays the
role of the reference's per-request ``ProcessContext.stream``.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from pathlib import Path

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

REFERENCE_DOCS = Path("/root/reference/ocr_service/tests/resources/docs")

# ground truth for the rendered OCR fixture in load_fixture_pages
GLYPH_FIXTURE_TEXT = "SCANNED PAGE 1\nPATIENT ID: 12345\nFINDINGS: NORMAL"


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Parquet reader for a pages table (Iceberg catalogs plug in the
    same way via ``spark.read.format("iceberg").load`` when a catalog
    is configured; parquet is the sandbox stand-in)."""
    return spark.read.parquet(path)


def decode_payload_ladder(df: DataFrame, src_col: str = "body") -> DataFrame:
    """The reference's ingest ladder (api/process.py:49-103) as pure
    Column expressions over a string payload column:

        JSON envelope {binary_data, footer}
            -> base64-decode binary_data, utf-8 bytes on decode failure,
               NULL (skip) when binary_data is null
        non-JSON body
            -> whole-body base64, else raw utf-8 bytes

    Declarative (from_json / try_to_binary / coalesce) so Catalyst keeps
    it JVM-side — no Python in the ingest path.
    """
    src = F.col(src_col)
    # from_json with a StructType never returns NULL for malformed input
    # (PERMISSIVE yields a null-field row), so JSON validity is probed
    # with map/array schemas, which DO null out on malformed input.
    obj_map = F.from_json(src, "map<string,string>")
    arr_first = F.element_at(F.from_json(src, "array<map<string,string>>"), 1)
    env_map = F.coalesce(obj_map, arr_first)  # reference takes record[0] for arrays
    env_struct = F.from_json(src, "binary_data string, footer map<string,string>")
    # array envelopes: the reference takes record[0]'s footer too
    # (utils/utils.py:154-197); the flat struct probe nulls out on arrays
    env_struct_arr = F.element_at(
        F.from_json(src, "array<struct<binary_data:string, footer:map<string,string>>>"), 1
    )

    # Spark's base64 decode is lenient; the reference uses strict
    # validation (base64.b64decode(..., validate=True), api/process.py:85),
    # so gate the decode on a strict-alphabet + padding regex.
    strict_b64 = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"

    def b64_or_utf8(col):
        return F.when(
            col.rlike(strict_b64) & (F.length(col) % 4 == 0),
            F.try_to_binary(col, F.lit("base64")),
        ).otherwise(F.encode(col, "utf-8"))

    binary_data = env_map["binary_data"]
    from_envelope = F.when(binary_data.isNotNull(), b64_or_utf8(binary_data)).otherwise(
        F.lit(None).cast(BinaryType())
    )
    from_raw = b64_or_utf8(src)
    payload = F.when(env_map.isNotNull(), from_envelope).otherwise(from_raw)
    footer = F.when(
        env_map.isNotNull(),
        F.coalesce(env_struct["footer"], env_struct_arr["footer"]),
    ).otherwise(F.lit(None))
    return df.withColumn("html", payload).withColumn("footer", footer)


def load_fixture_pages(spark: SparkSession) -> DataFrame:
    """Reference fixture payloads as a pages DataFrame (tests/E2E)."""
    rows = []
    base_ts = dt.datetime(2026, 7, 23, 0, 0, 0)
    for i, path in enumerate(sorted(REFERENCE_DOCS.rglob("*"))):
        if not path.is_file():
            continue
        rows.append(
            (
                f"https://fixtures.test/{path.parent.name}/{path.name}",
                base_ts + dt.timedelta(seconds=i),
                bytearray(path.read_bytes()),
                None,
                "en",
            )
        )
    rows.append(("https://fixtures.test/null-payload", base_ts, None, None, "en"))
    rows.append(("https://fixtures.test/empty-payload", base_ts, bytearray(b""), None, "en"))
    # in-model OCR fixture: a page rendered in the glyph engine's own
    # font (deterministic bytes, rendered at load time). NO_OCR skips it
    # like any image; OCR mode must read it back exactly at conf 100.
    from ocr_service_spark.extraction.glyph_ocr import render_text_png

    rows.append(
        (
            "https://fixtures.test/rendered/glyph_page.png",
            base_ts,
            bytearray(render_text_png(GLYPH_FIXTURE_TEXT)),
            None,
            "en",
        )
    )
    return spark.createDataFrame(rows, PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic synthetic generator (seeded, distributed, no driver data)
# ---------------------------------------------------------------------------

_WORDS = (
    "the quick brown fox jumps over lazy dog patient clinical record "
    "hospital treatment diagnosis review summary report finding value "
    "measure index crawl web page content extraction pipeline spark "
    "document text language corpus token paragraph section header body"
).split()

# class mix per 100 docs: mostly webtext HTML, a tail of every other
# route the engine supports (classes weighted per SURVEY.md §5 fixtures)
_MIX: list[tuple[str, int]] = [
    ("html", 70),
    ("plain", 8),
    ("rtf", 5),
    ("xml", 5),
    ("docx", 4),
    ("pdf", 3),
    ("png", 2),
    ("null", 1),
    ("binary", 1),
    ("encrypted", 1),
]
_MIX_TABLE: list[str] = [kind for kind, n in _MIX for _ in range(n)]


def _lcg(seed: int) -> Iterator[int]:
    state = (seed * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
    while True:
        state = (state * 6364136223846793005 + 1442695040888963407) & (2**64 - 1)
        yield state >> 33


def _sentence(rng: Iterator[int], n_words: int) -> str:
    words = [_WORDS[next(rng) % len(_WORDS)] for _ in range(n_words)]
    return " ".join(words).capitalize() + "."


def _synth_html(rng: Iterator[int], paragraphs: int) -> bytes:
    parts = [
        "<!DOCTYPE html>\n<html>\n<head><title>",
        _sentence(rng, 4),
        "</title><style>p { margin: 2px; }</style></head>\n<body>\n",
    ]
    for _ in range(paragraphs):
        parts.append("<p>" + _sentence(rng, 8 + next(rng) % 25) + "</p>\n")
    parts.append("</body>\n</html>\n")
    return "".join(parts).encode("utf-8")


def _synth_plain(rng: Iterator[int], paragraphs: int) -> bytes:
    return "\n\n".join(_sentence(rng, 10 + next(rng) % 30) for _ in range(paragraphs)).encode()


def _synth_rtf(rng: Iterator[int], paragraphs: int) -> bytes:
    body = "\\par ".join(_sentence(rng, 8 + next(rng) % 20) for _ in range(paragraphs))
    return ("{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0 Arial;}}" + body + "}").encode()


def _synth_docx(rng: Iterator[int], paragraphs: int) -> bytes:
    """Minimal deterministic OOXML package: a real ZIP whose
    word/document.xml carries the text (the C7 extraction path)."""
    import zipfile
    from io import BytesIO

    body = "".join(
        f"<w:p><w:r><w:t>{_sentence(rng, 8 + next(rng) % 20)}</w:t></w:r></w:p>"
        for _ in range(paragraphs)
    )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">'
        f"<w:body>{body}</w:body></w:document>"
    )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in (
            ("[Content_Types].xml", "<Types/>"),
            ("word/document.xml", document),
        ):
            info = zipfile.ZipInfo(name, date_time=(2026, 1, 1, 0, 0, 0))
            zf.writestr(info, content)
    return buf.getvalue()


def _synth_xml(rng: Iterator[int], paragraphs: int) -> bytes:
    items = "".join(
        f"<item id=\"i{next(rng) % 997}\">{_sentence(rng, 6 + next(rng) % 12)}</item>"
        for _ in range(paragraphs)
    )
    return f"<?xml version=\"1.0\"?><doc>{items}</doc>".encode()


def generate_pages(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    skew_every: int = 1000,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic Common-Crawl-style pages table.

    Distributed generation: ``spark.range(n)`` -> mapInPandas building
    payload bytes purely from (seed, id); nothing is collected on the
    driver, so the generator itself scales with the cluster. Every
    ``skew_every``-th document embeds a large multi-page payload
    (mirrors the 20-page docx skew payload in FIXTURES.md) so the
    salted PDF path and size-skew repartitioning have real work in
    benchmarks.
    """
    fixture_bytes = {
        "docx": (REFERENCE_DOCS / "generic/pat_id_1.docx").read_bytes(),
        "docx_big": (
            REFERENCE_DOCS / "generic/synthetic_medical_text_approx_20_pages.docx"
        ).read_bytes(),
        "pdf": (REFERENCE_DOCS / "generic/pat_id_1.pdf").read_bytes(),
        "pdf_big": (REFERENCE_DOCS / "pdf/ex1.pdf").read_bytes(),
        "png": (REFERENCE_DOCS / "generic/pat_id_1.png").read_bytes(),
        "encrypted": (REFERENCE_DOCS / "invalid/word_enc_noerror.docx").read_bytes(),
    }
    bc = spark.sparkContext.broadcast(fixture_bytes)
    base_ts = dt.datetime(2026, 1, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fixtures = bc.value
        for batch in batches:
            out: dict[str, list] = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for doc_id in batch["id"]:
                doc_id = int(doc_id)
                rng = _lcg(seed * 1_000_003 + doc_id)
                kind = _MIX_TABLE[next(rng) % 100]
                big = skew_every > 0 and doc_id % skew_every == 0
                # normal pages ~5-30 KB (Common-Crawl-realistic), skewed
                # pages several hundred KB
                paragraphs = (400 + next(rng) % 1200) if big else (10 + next(rng) % 55)
                payload: bytes | None
                ext = kind
                if kind == "html":
                    payload = _synth_html(rng, paragraphs)
                elif kind == "plain":
                    payload, ext = _synth_plain(rng, paragraphs), "txt"
                elif kind == "rtf":
                    payload = _synth_rtf(rng, paragraphs)
                elif kind == "xml":
                    payload = _synth_xml(rng, paragraphs)
                elif kind == "docx":
                    # alternate fixture payloads and synthetic OOXML so the
                    # zip-XML route sees varied content
                    if big:
                        payload = fixtures["docx_big"]
                    elif doc_id % 2:
                        payload = _synth_docx(rng, paragraphs)
                    else:
                        payload = fixtures["docx"]
                elif kind == "pdf":
                    payload = fixtures["pdf_big"] if big else fixtures["pdf"]
                elif kind == "png":
                    payload = fixtures["png"]
                elif kind == "encrypted":
                    payload = fixtures["encrypted"]
                elif kind == "null":
                    payload, ext = None, "bin"
                else:  # unknown binary
                    payload, ext = bytes([next(rng) % 256 for _ in range(64)]), "bin"
                out["url"].append(f"https://synth.test/{seed}/{doc_id}.{ext}")
                out["warc_ts"].append(base_ts + dt.timedelta(seconds=doc_id % 86400))
                out["html"].append(payload)
                out["text"].append(None)
                out["lang"].append("en")
            yield pd.DataFrame(out)

    partitions = partitions or max(spark.sparkContext.defaultParallelism * 2, 8)
    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )
