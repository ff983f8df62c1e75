"""EPUB reader dialect (extraction/epub_text.py, q133).

The oracle pins the fixture book; here the rules the fixture leaves
unexercised are pinned: nested OPF directories, dangling manifest
hrefs, the chapter cap, sniffer precedence (office zips must NOT
become epubs and vice versa), and totality over hostile bytes.
"""

from __future__ import annotations

import io
import zipfile

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.extraction.epub_text import (
    MAX_CHAPTERS,
    extract_epub,
    is_epub,
)
from ocr_service_spark.extraction.sniff import detect_file_type


def _book(members: dict[str, str], mimetype: str = "application/epub+zip") -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        # OCF conformance: mimetype first and STORED
        z.writestr("mimetype", mimetype, compress_type=zipfile.ZIP_STORED)
        for name, data in members.items():
            z.writestr(name, data)
    return buf.getvalue()


CONTAINER = (
    '<?xml version="1.0"?><container><rootfiles>'
    '<rootfile full-path="deep/dir/pkg.opf"/></rootfiles></container>'
)


def test_nested_opf_dir_and_dangling_href():
    book = _book(
        {
            "META-INF/container.xml": CONTAINER,
            "deep/dir/pkg.opf": (
                "<package><metadata><dc:title>T</dc:title></metadata><manifest>"
                '<item id="a" href="a.xhtml" media-type="application/xhtml+xml"/>'
                '<item id="gone" href="missing.xhtml" media-type="application/xhtml+xml"/>'
                "</manifest><spine>"
                '<itemref idref="gone"/><itemref idref="a"/><itemref idref="nosuch"/>'
                "</spine></package>"
            ),
            "deep/dir/a.xhtml": "<html><body><p>alpha</p></body></html>",
        }
    )
    title, chapters = extract_epub(book)
    # dangling href and unknown idref are skipped, not fatal; the href
    # resolves against the OPF's own directory
    assert (title, chapters) == ("T", ["alpha"])


def test_chapter_cap_bounds_hostile_spine():
    n = MAX_CHAPTERS + 20
    members = {
        "META-INF/container.xml": (
            '<container><rootfiles><rootfile full-path="p.opf"/></rootfiles></container>'
        ),
        "p.opf": (
            "<package><manifest>"
            + '<item id="c" href="c.xhtml" media-type="application/xhtml+xml"/>'
            + "</manifest><spine>"
            + '<itemref idref="c"/>' * n
            + "</spine></package>"
        ),
        "c.xhtml": "<html><body><p>x</p></body></html>",
    }
    _, chapters = extract_epub(_book(members))
    assert len(chapters) == MAX_CHAPTERS


def test_stored_zip_routes_epub_not_html():
    # a STORED (uncompressed) book leaks raw <html> member bytes into
    # the stream; the container magic must outrank the content sniffs
    from ocr_service_spark.extraction.classify import classify

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        z.writestr("mimetype", "application/epub+zip")
        z.writestr(
            "META-INF/container.xml",
            '<container><rootfiles><rootfile full-path="p.opf"/></rootfiles></container>',
        )
        z.writestr(
            "p.opf",
            '<package><manifest><item id="c" href="c.xhtml" '
            'media-type="application/xhtml+xml"/></manifest>'
            '<spine><itemref idref="c"/></spine></package>',
        )
        z.writestr("c.xhtml", "<html><body><p>stored book</p></body></html>")
    cls = classify(buf.getvalue(), "http://b.test/x.epub")
    assert cls.doc_class == "epub"
    from ocr_service_spark.extraction.pipeline import extract_document

    r = extract_document(buf.getvalue(), "http://b.test/x.epub")
    assert (r["extracted_text"], r["doc_class"]) == ("stored book", "epub")


def test_broken_book_fails_closed_never_leaks_container_bytes():
    # a structurally broken epub (no container.xml) must produce the
    # normal no-text FAILURE row — never fall through to the raw-text
    # fallback, which would emit the ZIP container bytes as
    # success=True "text" (stored members look html-ish to the sniffs)
    from ocr_service_spark.extraction.pipeline import extract_document

    for comp in (zipfile.ZIP_STORED, zipfile.ZIP_DEFLATED):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", comp) as z:
            z.writestr("mimetype", "application/epub+zip",
                       compress_type=zipfile.ZIP_STORED)
            z.writestr("OEBPS/c.xhtml", "<html><body><p>x</p></body></html>")
        r = extract_document(buf.getvalue(), "http://b.test/broken.epub")
        assert r["doc_class"] == "epub"
        assert r["success"] is False and (r["extracted_text"] or "") == ""
        assert r["pages"] == 0


def test_manifest_href_uri_decoding():
    # hrefs are URIs: percent-encoding decodes, fragments strip
    book = _book(
        {
            "META-INF/container.xml": (
                '<container><rootfiles><rootfile full-path="p.opf"/></rootfiles></container>'
            ),
            "p.opf": (
                "<package><manifest>"
                '<item id="a" href="My%20Chapter.xhtml#sec1" media-type="application/xhtml+xml"/>'
                "</manifest><spine>"
                '<itemref idref="a"/></spine></package>'
            ),
            "My Chapter.xhtml": "<html><body><p>spaced</p></body></html>",
        }
    )
    assert extract_epub(book) == (None, ["spaced"])


def test_ocf_prefix_probe():
    from ocr_service_spark.extraction.epub_text import ocf_prefix_is_epub

    assert ocf_prefix_is_epub(_book({"META-INF/container.xml": CONTAINER}))
    # a DEFLATED mimetype is non-conforming: probe says no, generic zip
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("mimetype", "application/epub+zip")  # deflated
    assert not ocf_prefix_is_epub(buf.getvalue())
    assert detect_file_type(buf.getvalue()).ext == "zip"
    assert not ocf_prefix_is_epub(b"PK\x03\x04 not long enough")


def test_sniffer_precedence_epub_vs_office_vs_zip():
    book = _book({"META-INF/container.xml": CONTAINER})
    assert is_epub(book)
    ft = detect_file_type(book)
    assert (ft.ext, ft.mime) == ("epub", "application/epub+zip")
    # an office zip keeps its office type even with an epub-ish member
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        z.writestr("content.xml", "<x/>")
    assert detect_file_type(buf.getvalue()).ext == "odt"
    # a plain zip stays a zip
    buf2 = io.BytesIO()
    with zipfile.ZipFile(buf2, "w") as z:
        z.writestr("readme.txt", "hi")
    assert detect_file_type(buf2.getvalue()).ext == "zip"
    assert not is_epub(buf2.getvalue())


@settings(max_examples=120, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_epub_fuzz_never_raises(b: bytes):
    title, chapters = extract_epub(b)
    assert title is None or isinstance(title, str)
    assert isinstance(chapters, list)
    assert is_epub(b) in (True, False)
