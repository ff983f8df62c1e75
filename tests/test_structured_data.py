"""Structured-data extractor (extraction/structured_data.py): dialect
pins for the q126 oracle plus fuzz totality over untrusted markup.

Reference scope note: ocr_service extracts only flat text
(converter.py:70-106); the OG/meta/JSON-LD sidecar is the WAT-style
metadata tier a crawl pipeline mines on top of it.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_service_spark.extraction.structured_data import (
    MAX_FIELDS,
    META_ALLOWLIST,
    extract_structured,
)


def _kv(rows):
    return [(kind, key, val) for _, kind, key, val in rows]


def test_og_meta_and_ld_in_document_order():
    page = (
        '<html><head>'
        '<meta property="og:title" content="T &amp; U"/>'
        "<meta content='en' property='og:locale'/>"  # attr order + quotes
        '<meta name="DESCRIPTION" content="d"/>'  # case-folded name
        '<meta name="viewport" content="width=device-width"/>'  # dropped
        '<script type="application/ld+json">'
        '{"@type":"Article","name":"n","wordCount":42,"free":true}'
        "</script></head><body></body></html>"
    )
    rows = extract_structured(page)
    assert [r[0] for r in rows] == list(range(len(rows)))  # field_idx
    assert _kv(rows) == [
        ("og", "og:title", "T & U"),
        ("og", "og:locale", "en"),
        ("meta", "description", "d"),
        ("ld", "@type", "Article"),
        ("ld", "name", "n"),
        ("ld", "wordCount", "42"),
        ("ld", "free", "true"),  # JSON spelling, not Python's 'True'
    ]


def test_ld_array_root_object_skips_and_malformed():
    page = (
        '<script type="APPLICATION/LD+JSON">'
        '[{"@type":"A","nested":{"x":1},"items":[1,2]},{"@type":"B"},3]'
        "</script>"
        '<script type="application/ld+json">{broken</script>'
        '<script type="text/javascript">{"@type":"NotLd"}</script>'
    )
    rows = extract_structured(page)
    # nested object/array fields skipped; non-dict array element
    # skipped; malformed block and non-ld script contribute nothing
    assert _kv(rows) == [("ld", "@type", "A"), ("ld", "@type", "B")]


def test_meta_allowlist_is_exact():
    kept = "".join(
        f'<meta name="{n}" content="v"/>' for n in sorted(META_ALLOWLIST)
    )
    dropped = '<meta name="generator" content="x"/><meta name="og:title" content="y"/>'
    rows = extract_structured(kept + dropped)
    # og: must arrive via property=, not name= — pinned here
    assert len(rows) == len(META_ALLOWLIST)
    assert {key for _, _, key, _ in rows} == set(META_ALLOWLIST)


def test_field_cap_bounds_a_meta_farm():
    farm = '<meta property="og:x" content="v"/>' * (MAX_FIELDS + 500)
    rows = extract_structured(farm)
    assert len(rows) == MAX_FIELDS


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_fuzz_bytes_never_raise(payload: bytes):
    rows = extract_structured(payload)
    assert isinstance(rows, list) and len(rows) <= MAX_FIELDS
    for idx, kind, key, val in rows:
        assert kind in ("og", "meta", "ld")
        assert isinstance(key, str) and isinstance(val, str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=2048))
def test_fuzz_text_never_raises(markup: str):
    rows = extract_structured(markup)
    assert isinstance(rows, list) and len(rows) <= MAX_FIELDS


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["application/ld+json", "text/plain", ""]),
            st.text(max_size=200),
        ),
        max_size=8,
    )
)
def test_fuzz_script_blocks_total(blocks):
    page = "".join(
        f'<script type="{t}">{body}</script>' for t, body in blocks
    )
    rows = extract_structured(page)
    assert all(kind == "ld" for _, kind, _, _ in rows)
