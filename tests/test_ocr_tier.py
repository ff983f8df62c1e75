"""OCR tier plumbing: ordered fan-in, confidence averaging, engine
singleton — exercised through the deterministic stub engine."""

from __future__ import annotations

from ocr_service_spark.extraction.ocr_engine import StubOcrEngine, get_engine
from ocr_service_spark.operators.ocr import run_ocr_pages


def test_stub_engine_deterministic():
    eng = StubOcrEngine()
    a = eng.recognize(b"page-bytes")
    b = eng.recognize(b"page-bytes")
    assert a == b
    assert 0 <= a[1] <= 100


def test_engine_singleton_falls_back_to_stub():
    assert isinstance(get_engine(), StubOcrEngine)  # no tesserocr here
    assert get_engine() is get_engine()


def test_ocr_fanout_fanin_order_and_confidence(spark):
    # two docs; pages delivered out of order — fan-in must sort by page_no
    rows = [
        ("doc1", 2, bytearray(b"p2")),
        ("doc1", 0, bytearray(b"p0")),
        ("doc1", 1, bytearray(b"p1")),
        ("doc2", 0, bytearray(b"solo")),
    ]
    df = spark.createDataFrame(rows, "url string, page_no int, png binary")
    out = {r["url"]: r for r in run_ocr_pages(df).collect()}

    eng = StubOcrEngine()
    t0, c0 = eng.recognize(b"p0")
    t1, c1 = eng.recognize(b"p1")
    t2, c2 = eng.recognize(b"p2")
    assert out["doc1"]["ocr_text"] == t0 + t1 + t2  # page order, no separator
    assert out["doc1"]["pages"] == 3
    assert out["doc1"]["confidence"] == round((c0 + c1 + c2) / 3, 4)
    assert out["doc2"]["pages"] == 1
