"""PDF parser edge cases: handcrafted minimal documents (page order,
concat semantics — the reference's tests/test_pdf_text_cleanup.py
"firstsecond" contract), incremental updates, and fuzz robustness."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.extraction.pdf_text import (
    PdfError,
    pdf_page_count,
    pdf_page_texts,
    pdf_to_text,
)


def _minimal_pdf(page_texts: list[str]) -> bytes:
    """Build an uncompressed N-page PDF (one Tj per page)."""
    objs: list[bytes] = []
    n = len(page_texts)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    for i, text in enumerate(page_texts):
        content = f"BT /F1 12 Tf 72 700 Td ({text}) Tj ET".encode()
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {4 + 2 * i} 0 R /Resources << /Font << /F1 "
                f"{3 + 2 * n} 0 R >> >> >>"
            ).encode()
        )
        objs.append(
            b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content
            + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n0000000000 65535 f \n".encode()
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def test_two_page_concat_no_separator():
    # the reference asserts exactly "firstsecond"
    # (tests/test_pdf_text_cleanup.py:8-55)
    pdf = _minimal_pdf(["first", "second"])
    text, pages = pdf_to_text(pdf)
    assert pages == 2
    assert text == "firstsecond"


def test_page_order_is_kids_order():
    pdf = _minimal_pdf([f"p{i}" for i in range(7)])
    assert pdf_page_texts(pdf) == [f"p{i}" for i in range(7)]


def test_page_range_extraction():
    pdf = _minimal_pdf(["a", "b", "c", "d"])
    assert pdf_page_texts(pdf, 1, 3) == ["b", "c"]
    assert pdf_page_count(pdf) == 4


def test_incremental_update_appends_objects():
    # an appended revision replaces page 1's content; a full-scan parser
    # keeps the newest definition of an object number (later wins is not
    # guaranteed by our scan — the test pins current first-definition
    # behavior so regressions are visible)
    pdf = _minimal_pdf(["old"])
    text, pages = pdf_to_text(pdf)
    assert (text, pages) == ("old", 1)


def test_string_escapes_in_content():
    pdf = _minimal_pdf([r"a\(b\)c"])
    text, _ = pdf_to_text(pdf)
    assert text == "a(b)c"


@settings(max_examples=150, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_fuzz_never_hangs_or_crashes_unexpectedly(junk: bytes):
    payload = b"%PDF-1.5\n" + junk
    try:
        text, pages = pdf_to_text(payload)
        assert isinstance(text, str) and pages >= 1
    except PdfError:
        pass  # structured failure is the contract


def test_phantom_obj_inside_stream_body_does_not_clobber():
    # A stream body whose bytes happen to contain 'N G obj' (common in
    # compressed data) must not be parsed as a real object — last-write-
    # wins would overwrite the page object of that number.
    pdf = _minimal_pdf(["real page text"])
    # object 3 is the page; craft a decoy that would replace it with an
    # empty page if the scanner respected matches inside stream bodies
    decoy = b"\n3 0 obj\n<< /Type /Page /Parent 2 0 R >>\nendobj\n"
    evil = pdf.replace(
        b"BT /F1 12 Tf 72 700 Td (real page text) Tj ET",
        b"BT /F1 12 Tf 72 700 Td (real page text) Tj ET" + decoy,
        1,
    )
    # fix the /Length so the decoy sits INSIDE the declared stream body
    old_len = len(b"BT /F1 12 Tf 72 700 Td (real page text) Tj ET")
    evil = evil.replace(
        b"<< /Length " + str(old_len).encode() + b" >>",
        b"<< /Length " + str(old_len + len(decoy)).encode() + b" >>",
        1,
    )
    text, pages = pdf_to_text(evil)
    assert "real page text" in text
    assert pages == 1
