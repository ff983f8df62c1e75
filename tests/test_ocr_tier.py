"""OCR tier plumbing: ordered fan-in, confidence averaging, engine
singleton — exercised through the real glyph engine (rendered pages)
with the hash stub covering schema-only determinism."""

from __future__ import annotations

from ocr_service_spark.extraction.glyph_ocr import GlyphOcrEngine, render_text_png
from ocr_service_spark.extraction.ocr_engine import StubOcrEngine, get_engine
from ocr_service_spark.operators.ocr import run_ocr_pages


def test_stub_engine_deterministic():
    eng = StubOcrEngine()
    a = eng.recognize(b"page-bytes")
    b = eng.recognize(b"page-bytes")
    assert a == b
    assert 0 <= a[1] <= 100


def test_engine_singleton_is_glyph_engine_without_tesseract():
    # no tesserocr in this environment -> the real from-scratch glyph
    # engine, not the stub
    assert isinstance(get_engine(), GlyphOcrEngine)
    assert get_engine() is get_engine()


def test_ocr_fanout_fanin_order_and_confidence(spark):
    # two docs; pages delivered out of order — fan-in must sort by page_no
    p0, p1, p2 = (render_text_png(t) for t in ("PAGE ZERO", "PAGE ONE", "PAGE TWO"))
    solo = render_text_png("ONLY PAGE")
    rows = [
        ("doc1", 2, bytearray(p2)),
        ("doc1", 0, bytearray(p0)),
        ("doc1", 1, bytearray(p1)),
        ("doc2", 0, bytearray(solo)),
    ]
    df = spark.createDataFrame(rows, "url string, page_no int, png binary")
    out = {r["url"]: r for r in run_ocr_pages(df).collect()}

    eng = GlyphOcrEngine()
    (t0, c0), (t1, c1), (t2, c2) = (eng.recognize(p) for p in (p0, p1, p2))
    assert (t0, t1, t2) == ("PAGE ZERO", "PAGE ONE", "PAGE TWO")
    assert out["doc1"]["ocr_text"] == t0 + t1 + t2  # page order, no separator
    assert out["doc1"]["pages"] == 3
    assert out["doc1"]["confidence"] == round((c0 + c1 + c2) / 3, 4)
    assert out["doc2"]["ocr_text"] == "ONLY PAGE"
    assert out["doc2"]["pages"] == 1
