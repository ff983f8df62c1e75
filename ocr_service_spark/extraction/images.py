"""Image-text pair extraction from HTML payloads.

The LAION-shape multimodal corpus builder: every ``<img>`` contributes
(resolved image URL, alt text, figure caption) — the text signal that
image-text training pairs are built from. Beyond-reference (the
service extracts text only), like the link/feed/structured-data
parsers, and built on the same stdlib tokenizer + charset ladder.

Pinned dialect:

- ``src`` resolves like an outlink (``links._resolve``): pseudo-scheme
  (``data:`` inlines included) and fragment-only sources drop;
- ``alt`` is the attribute value with whitespace collapsed ('' when
  absent);
- ``caption`` is the text of the nearest enclosing ``<figure>``'s
  ``<figcaption>`` (before or after the img, whitespace collapsed);
  None outside a figure or when the figure has no figcaption;
- ``is_tracking`` flags width="1" or height="1" pixels;
- document order is preserved and capped at MAX_IMAGES (an image farm
  yields MAX_IMAGES rows, not an unbounded explode).
"""

from __future__ import annotations

from html.parser import HTMLParser

from ocr_service_spark.extraction.links import _resolve

MAX_IMAGES = 500


def _collapse(s: str) -> str:
    return " ".join(s.split())


class _ImageCollector(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        # emitted: (doc_order, src, alt, caption_or_None, tracking)
        self.done: list[tuple[int, str, str, str | None, bool]] = []
        # open-figure stack: [caption_parts, [(order, src, alt, tracking)]]
        self._figs: list[list] = []
        self._in_figcaption = 0
        self._order = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "img":
            a = {k: (v if v is not None else "") for k, v in attrs}
            src = a.get("src", "")
            if not src:
                return
            alt = _collapse(a.get("alt", ""))
            tracking = a.get("width") == "1" or a.get("height") == "1"
            rec = (self._order, src, alt, tracking)
            self._order += 1
            if self._figs:
                self._figs[-1][1].append(rec)
            else:
                self.done.append((rec[0], rec[1], rec[2], None, rec[3]))
        elif tag == "figure":
            self._figs.append([[], []])
        elif tag == "figcaption" and self._figs:
            self._in_figcaption += 1

    def handle_endtag(self, tag: str) -> None:
        if tag == "figcaption" and self._in_figcaption:
            self._in_figcaption -= 1
        elif tag == "figure" and self._figs:
            parts, imgs = self._figs.pop()
            caption = _collapse("".join(parts)) or None
            for order, src, alt, tracking in imgs:
                self.done.append((order, src, alt, caption, tracking))

    def handle_data(self, data: str) -> None:
        if self._in_figcaption and self._figs and data:
            self._figs[-1][0].append(data)

    def close(self) -> None:  # flush unclosed figures (tolerant parse)
        super().close()
        while self._figs:
            self.handle_endtag("figure")


MIN_PAIR_TEXT = 5  # alt or caption must carry at least this many chars


def elect_page_image(
    payload: bytes | str, base_url: str | None = None
) -> tuple[str, str] | None:
    """The one image that REPRESENTS the page (social cards, doc-level
    image-text datasets), elected by a pinned precedence ladder:

    1. ``og:image`` (the publisher's own declaration) — resolved;
    2. the first figure image whose caption passes MIN_PAIR_TEXT;
    3. the first non-tracking image whose alt passes MIN_PAIR_TEXT.

    Returns (rule, image_url) — rule in {'og', 'figure', 'alt'} — or
    None when no rung matches. Tracking pixels and data: inlines never
    win (rungs 2-3 run on extract_image_pairs' post-hygiene rows)."""
    from ocr_service_spark.extraction.structured_data import extract_structured

    for _, kind, key, value in extract_structured(payload):
        if kind == "og" and key == "og:image":
            url = _resolve(value, base_url)
            if url is not None and url.lower().startswith(("http://", "https://")):
                return ("og", url)
            break  # a declared-but-unusable og:image falls through
    pairs = extract_image_pairs(payload, base_url)
    for rec in pairs:
        if (
            not rec["is_tracking"]
            and rec["caption"] is not None
            and len(rec["caption"]) >= MIN_PAIR_TEXT
        ):
            return ("figure", rec["image_url"])
    for rec in pairs:
        if not rec["is_tracking"] and len(rec["alt"]) >= MIN_PAIR_TEXT:
            return ("alt", rec["image_url"])
    return None


def extract_image_pairs(
    payload: bytes | str, base_url: str | None = None
) -> list[dict]:
    """Document-ordered image records:
    ``{seq, image_url, alt, caption, is_tracking, keep}``.

    ``keep`` is the training-pair verdict: an http(s) URL, not a
    tracking pixel, and alt-or-caption of >= MIN_PAIR_TEXT chars."""
    if isinstance(payload, (bytes, bytearray)):
        from ocr_service_spark.extraction.charset import decode_markup

        text = decode_markup(bytes(payload))[1]
    else:
        text = payload
    parser = _ImageCollector()
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        pass
    out: list[dict] = []
    for order, src, alt, caption, tracking in sorted(parser.done):
        url = _resolve(src, base_url)
        if url is None or not url.lower().startswith(("http://", "https://")):
            continue
        keep = (not tracking) and (
            len(alt) >= MIN_PAIR_TEXT
            or (caption is not None and len(caption) >= MIN_PAIR_TEXT)
        )
        out.append(
            {
                "seq": len(out),
                "image_url": url,
                "alt": alt,
                "caption": caption,
                "is_tracking": tracking,
                "keep": keep,
            }
        )
        if len(out) >= MAX_IMAGES:
            break
    return out
