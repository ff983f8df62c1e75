"""extraction/images.py dialect pins on handwritten markup — the
cases the q161 fixture doesn't exercise: figcaption BEFORE the img,
nested figures, unclosed figures, entity escapes, hostile bytes.
"""

from __future__ import annotations

from ocr_service_spark.extraction.images import MAX_IMAGES, extract_image_pairs

BASE = "http://h.test/a/page.html"


def _urls(html, base=BASE):
    return [r["image_url"] for r in extract_image_pairs(html, base)]


def test_caption_position_and_nesting():
    before = '<figure><figcaption>Cap first</figcaption><img src="/a.jpg"></figure>'
    after = '<figure><img src="/b.jpg"><figcaption>Cap after</figcaption></figure>'
    recs = extract_image_pairs(before + after, BASE)
    assert [r["caption"] for r in recs] == ["Cap first", "Cap after"]
    assert [r["seq"] for r in recs] == [0, 1]
    # nested figure: inner img gets the inner caption
    nested = (
        '<figure><figcaption>Outer cap</figcaption>'
        '<figure><img src="/in.jpg"><figcaption>Inner cap</figcaption></figure>'
        '<img src="/out.jpg"></figure>'
    )
    recs = extract_image_pairs(nested, BASE)
    caps = {r["image_url"].rsplit("/", 1)[1]: r["caption"] for r in recs}
    assert caps == {"in.jpg": "Inner cap", "out.jpg": "Outer cap"}


def test_unclosed_figure_still_emits():
    recs = extract_image_pairs(
        '<figure><img src="/x.jpg"><figcaption>Tail cap', BASE
    )
    assert len(recs) == 1 and recs[0]["caption"] == "Tail cap"


def test_hygiene_and_resolution():
    html = (
        '<img src="/rel.jpg" alt="ok alt here">'
        '<img src="data:image/png;base64,AA" alt="dropped">'
        '<img src="#frag" alt="dropped too">'
        '<img src="https://cdn.test/abs.png" alt="a&amp;b plus">'
    )
    recs = extract_image_pairs(html, BASE)
    assert _urls(html) == [
        "http://h.test/rel.jpg",
        "https://cdn.test/abs.png",
    ]
    assert recs[1]["alt"] == "a&b plus"  # entity-unescaped by tokenizer


def test_keep_verdict_rules():
    html = (
        '<img src="/long.jpg" alt="long enough alt">'
        '<img src="/shrt.jpg" alt="abc">'
        '<img src="/pix.gif" width="1" height="9" alt="long enough alt">'
        '<figure><img src="/fig.jpg"><figcaption>long caption</figcaption></figure>'
    )
    recs = {r["image_url"].rsplit("/", 1)[1]: r for r in extract_image_pairs(html, BASE)}
    assert recs["long.jpg"]["keep"] is True
    assert recs["shrt.jpg"]["keep"] is False  # alt under MIN_PAIR_TEXT
    assert recs["pix.gif"]["keep"] is False and recs["pix.gif"]["is_tracking"]
    assert recs["fig.jpg"]["keep"] is True  # caption supplies the text


def test_page_image_ladder():
    from ocr_service_spark.extraction.images import elect_page_image

    og = '<meta property="og:image" content="/card.png">'
    figure = '<figure><img src="/f.jpg"><figcaption>Caption here</figcaption></figure>'
    alt = '<img src="/a.jpg" alt="Alt text here">'
    # og beats figure beats alt; og resolves relative content too
    assert elect_page_image(og + figure + alt, BASE) == (
        "og", "http://h.test/card.png"
    )
    assert elect_page_image(figure + alt, BASE) == ("figure", "http://h.test/f.jpg")
    assert elect_page_image(alt, BASE) == ("alt", "http://h.test/a.jpg")
    # unusable og:image falls through; nothing usable -> None
    bad_og = '<meta property="og:image" content="data:image/png;base64,AA">'
    assert elect_page_image(bad_og + alt, BASE) == ("alt", "http://h.test/a.jpg")
    assert elect_page_image('<img src="/x.jpg" alt="abc">', BASE) is None


def test_image_farm_is_capped_and_hostile_bytes_are_total():
    farm = "".join(f'<img src="/i{i}.jpg" alt="alt {i} text">' for i in range(2000))
    assert len(extract_image_pairs(farm, BASE)) == MAX_IMAGES
    assert extract_image_pairs(b"\xff\xfe\x00garbage<img", BASE) == []
