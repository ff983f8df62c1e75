"""Out-of-model scan recognition for the glyph OCR engine.

The reference's OCR competency gate is recognizing a REAL rendered
document scan: ``pat_id_1.png`` at Levenshtein similarity >= 0.60
against its patient-record text
(/root/reference/ocr_service/tests/test_process.py:23,143-167 —
``TEXT_SIMILARITY_THRESHOLD``, ``lev_similarity``). The in-model
glyph matcher (glyph_ocr.py) is exact on its own 5x7 font but that
fixture is a ~12 px-per-line anti-aliased sans-serif page, squiggly
underlines included. This module is the from-scratch scaled-recognition
path for such input:

1. global Otsu binarization (grayscale normalization);
2. text-line bands from row ink runs (gap <= 2 merged), with
   underline stripping: a near-empty separator row in the bottom 40%
   of a band cuts off the rows below it (the squiggle) so the
   underline cannot weld a whole word into one blob;
3. glyph candidates as 8-connected components, re-merged when their
   x-spans stack vertically (i-dots, '=', ':'), with wide-short
   leftover underline components dropped;
4. per-band typography stats — baseline, x-line, median tall-glyph
   width — giving each glyph a vertical size class (ascender-height,
   x-height, descender, small mark) that gates which templates it may
   match: the scale analog of the font's case distinction;
5. template matching by resampling the glyph's bounding box onto each
   template's trimmed grid at two resolutions — a hard Hamming +
   8-neighbour chamfer blend on the 5x7 grid and a chamfer distance
   on a 2x upsampled grid (stroke-width tolerance without losing gap
   structure) — plus aspect-ratio, vertical-ink-run-count, and
   glyph-width priors. Resampling uses pixel-CENTER mapping (a floor
   mapping biases thin strokes one template row up: a crossbar at
   source row 5/12 must land on a 7-row template's row 3, not 2),
   and a cell also counts as inked when a ~1px stroke crosses it
   (absolute fill comparable to the cell span — thin strokes dilute
   the fill RATIO below any fixed cut without being less of a
   stroke);
6. recursive split of over-wide components at their thinnest interior
   columns (3 candidates, weld column dropped) when the split halves
   match better than the blob (touching kerned letters), and word
   spacing from inter-component gaps relative to the band's median
   glyph width;
7. tiny marks classified by VERTICAL POSITION (apostrophes hang from
   the cap line — curly U+2019 emitted for the slanted form —
   periods sit on the baseline, commas dip below or lost their tail
   to the underline strip: those columns are remembered from the
   separator row and also force descender classes on full glyphs);
8. a token-level digit-coherence pass: a token anchored by a
   confident digit whose other characters are all digit lookalikes
   (O/0, J/7, Z/2, l/1, ...) is re-matched against digit templates
   only.

Measured on the reference fixture (pinned in tests/test_scan_ocr.py):
similarity 0.9597 against the document's full text and 0.6280 against
the reference's DOCS gate text — PASSING the reference's own 0.60
OCR competency gate (test_process.py:23), whose ceiling for a
byte-perfect read of this page is 0.6524 (the gate text omits the
page's header line and carries literal space runs). Entirely
deterministic; no native libraries.
"""

from __future__ import annotations

import math

from ocr_service_spark.extraction.glyph_ocr import FONT

# alternate templates used ONLY on this scaled path: shapes the 5x7
# base font draws with serifs/flags that common scanned sans fonts
# render bare (dotted i without serifs, bar l, t with ascender + hook,
# H with a 2px-thick crossbar, A with the low crossbar of print fonts)
_RAW_ALTS: dict[str, tuple[str, str]] = {
    "i2": ("i", "X|.|X|X|X|X|X"),
    "l2": ("l", "X|X|X|X|X|X|X"),
    "t2": ("t", ".X.|.X.|XXX|.X.|.X.|.X.|..X"),
    "t3": ("t", ".X.|.X.|XXX|.X.|.X.|.X.|.XX"),
    "H2": ("H", "X...X|X...X|X...X|XXXXX|XXXXX|X...X|X...X"),
    "A2": ("A", ".XXX.|X...X|X...X|X...X|XXXXX|X...X|X...X"),
    # sans A: filled narrow apex, low crossbar, legs both sides
    "A3": ("A", "..X..|..X..|.X.X.|.X.X.|XXXXX|X...X|X...X"),
    # sans W: middle vertex rises to cap height, bottom vertices at
    # the quarter positions
    "W2": ("W", "X.X.X|X.X.X|X.X.X|XX.XX|XX.XX|.X.X.|.X.X."),
    # sans 6: wide curved top hook (the base font draws a narrow one)
    "62": ("6", ".XXXX|.X...|X....|XXXX.|X...X|X...X|.XXX."),
    # sans f: hook + crossbar sit high (ascender column, bar at the
    # x-line) — the base font centers the bar
    "f2": ("f", "..XX.|.X...|XXX..|.X...|.X...|.X...|.X..."),
    # thick-stroke N: at 2px strokes the diagonal reads as doubled
    # verticals with a mid crossing
    "N2": ("N", "X...X|XX..X|XX..X|X.X.X|X..XX|X..XX|X...X"),
}

# vertical size classes: which characters a glyph of a given size/
# position may be (the template grid cannot express descenders, so
# class membership is by character identity, not template geometry)
_ASC = set("ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789bdfhklt!?$#%&@/()ij") | set(_RAW_ALTS)
_DIGITS = set("0123456789")
# letters a template matcher plausibly emits for digit glyphs
_DIGIT_HINT = set("OoIlJTZSBG#?")
# measurement-unit suffixes that anchor a digit prefix even when no
# digit survived the first pass ("lOOmg" -> "100mg")
_UNIT_SUFFIXES = ("mg", "ml", "kg", "km", "mm", "cm", "kb", "mb", "gb", "g", "m", "s")
_XHT = set("acemnorsuvwxz+=*")
_DESC = set("gpqy")
_MARK = set(".,-':;")
_APOS = set("'")


def _trimmed(cells: frozenset) -> tuple[int, int, frozenset]:
    r0 = min(r for r, _ in cells)
    c0 = min(c for _, c in cells)
    r1 = max(r for r, _ in cells)
    c1 = max(c for _, c in cells)
    return r1 - r0 + 1, c1 - c0 + 1, frozenset((r - r0, c - c0) for r, c in cells)


def _upsample(th: int, tw: int, tr: frozenset, f: int = 2) -> tuple[int, int, frozenset]:
    return (
        th * f,
        tw * f,
        frozenset((r * f + dy, c * f + dx) for r, c in tr for dy in range(f) for dx in range(f)),
    )


def _vruns(th: int, tw: int, tr: frozenset) -> int:
    runs, prev = 0, False
    for r in range(th):
        has = any((r, c) in tr for c in range(tw))
        if has and not prev:
            runs += 1
        prev = has
    return runs


_TMPL: dict[str, tuple[tuple, tuple, int]] = {}
_ALT_OF: dict[str, str] = {}
for _ch, _cells in FONT.items():
    _t1 = _trimmed(_cells)
    _TMPL[_ch] = (_t1, _upsample(*_t1), _vruns(*_t1))
for _name, (_base, _pat) in _RAW_ALTS.items():
    _rows = _pat.split("|")
    _cells = frozenset(
        (r, c) for r, row in enumerate(_rows) for c, ch in enumerate(row) if ch == "X"
    )
    _t1 = _trimmed(_cells)
    _TMPL[_name] = (_t1, _upsample(*_t1), _vruns(*_t1))
    _ALT_OF[_name] = _base

# curly typographic apostrophe (U+2019): a slanted 3x4 blob hanging
# from the cap line — what proportional scan fonts actually render
# for ' — emitted as the typographic character, matching what a
# recognizer reading such a page should produce
_CURLY = frozenset({(0, 1), (0, 2), (1, 1), (1, 2), (2, 1), (3, 0)})
_t1 = _trimmed(_CURLY)
_TMPL["'c"] = (_t1, _upsample(*_t1), _vruns(*_t1))
_ALT_OF["'c"] = "’"
_APOS.add("'c")

# tail-TRIMMED descender variants: when the underline strip removes a
# g/p/q/y tail (the tail rows overlap the stripped underline), the
# surviving pixels are the template's rows ABOVE the tail — match
# against exactly that
for _ch in "gpqy":
    _h, _w, _tr = _trimmed(FONT[_ch])
    _cells = frozenset((r, c) for r, c in _tr if r < _h - 2)
    _t1 = _trimmed(_cells)
    _name = _ch + "~"
    _TMPL[_name] = (_t1, _upsample(*_t1), _vruns(*_t1))
    _ALT_OF[_name] = _ch
    _DESC.add(_name)


def otsu_threshold(luma: bytes) -> int:
    """Deterministic integer Otsu: the threshold maximizing between-
    class variance (first maximum wins)."""
    hist = [0] * 256
    for v in luma:
        hist[v] += 1
    total = len(luma)
    s_all = sum(i * hist[i] for i in range(256))
    sb = wb = 0
    best_t, best_v = 128, -1.0
    for t in range(256):
        wb += hist[t]
        if wb == 0:
            continue
        wf = total - wb
        if wf == 0:
            break
        sb += t * hist[t]
        var = wb * wf * (sb / wb - (s_all - sb) / wf) ** 2
        if var > best_v:
            best_v, best_t = var, t
    return best_t


def _components(pts: list[tuple[int, int]]) -> list[list[tuple[int, int]]]:
    ptset = set(pts)
    seen: set[tuple[int, int]] = set()
    comps = []
    for p in pts:
        if p in seen:
            continue
        stack, comp = [p], []
        seen.add(p)
        while stack:
            q = stack.pop()
            comp.append(q)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    r = (q[0] + dy, q[1] + dx)
                    if r in ptset and r not in seen:
                        seen.add(r)
                        stack.append(r)
        comps.append(comp)
    return comps


def _match_one(
    pts: list[tuple[int, int]],
    gy0: int,
    gy1: int,
    gx0: int,
    gx1: int,
    allowed: set[str],
) -> tuple[float, str]:
    """Best (score, char) over the allowed template set; lower score
    is better, 0 = perfect."""
    hg, wg = gy1 - gy0, gx1 - gx0
    rows_ink = [False] * hg
    for yy, _ in pts:
        rows_ink[yy - gy0] = True
    gruns, prev = 0, False
    for v in rows_ink:
        if v and not prev:
            gruns += 1
        prev = v

    grids: dict[tuple[int, int], set] = {}

    def frac_grid(th: int, tw: int) -> set:
        # pixel-CENTER sampling (yy+0.5): floor mapping biases thin
        # strokes one template row up — a crossbar at source row 5/12
        # must land on a 7-row template's row 3, not row 2
        if (th, tw) in grids:
            return grids[(th, tw)]
        fill: dict = {}
        cnt: dict = {}
        rows_in: dict = {}
        cols_in: dict = {}
        for yy in range(gy0, gy1):
            ti = min(th - 1, int((yy - gy0 + 0.5) * th / hg))
            rows_in[ti] = rows_in.get(ti, 0) + 1
        for xx in range(gx0, gx1):
            tj = min(tw - 1, int((xx - gx0 + 0.5) * tw / wg))
            cols_in[tj] = cols_in.get(tj, 0) + 1
        for ti, nr in rows_in.items():
            for tj, nc in cols_in.items():
                cnt[(ti, tj)] = nr * nc
        for yy, xx in pts:
            ti = min(th - 1, int((yy - gy0 + 0.5) * th / hg))
            tj = min(tw - 1, int((xx - gx0 + 0.5) * tw / wg))
            fill[(ti, tj)] = fill.get((ti, tj), 0) + 1
        mx = max(fill[k] / cnt[k] for k in fill)
        g = set()
        for k, f in fill.items():
            # on if dominant-fill, OR a ~1px stroke crosses the cell
            # (absolute fill comparable to the cell's span — a thin
            # stroke through a wide cell dilutes the fill RATIO far
            # below any fixed cut without being any less of a stroke)
            if f / cnt[k] >= 0.5 * mx or f >= max(
                2.0, 0.45 * rows_in[k[0]], 0.45 * cols_in[k[1]]
            ):
                g.add(k)
        grids[(th, tw)] = g
        return g

    def near(cell: tuple[int, int], sset) -> bool:
        r, c = cell
        return any(
            (r + dr, c + dc) in sset for dr in (-1, 0, 1) for dc in (-1, 0, 1)
        )

    def chamfer(tr, g) -> float:
        d = 0.0
        for cell in tr:
            if cell not in g:
                d += 0.4 if near(cell, g) else 1.0
        for cell in g:
            if cell not in tr:
                d += 0.4 if near(cell, tr) else 1.0
        return d / max(1, len(tr) + len(g))

    best: tuple[float, str] = (math.inf, "?")
    # sorted: `allowed` is a set of salted-hash strings — iterating it
    # raw would break score ties by per-process hash order
    for ch in sorted(allowed):
        (th1, tw1, tr1), (th2, tw2, tr2), truns = _TMPL[ch]
        g1 = frac_grid(th1, tw1)
        g2 = frac_grid(th2, tw2)
        hard1 = sum(
            1
            for ti in range(th1)
            for tj in range(tw1)
            if ((ti, tj) in g1) != ((ti, tj) in tr1)
        ) / (th1 * tw1)
        dn1 = 0.65 * hard1 + 0.35 * chamfer(tr1, g1)
        dn2 = chamfer(tr2, g2)
        aspect = abs(math.log((wg / hg + 1e-9) / (tw1 / th1 + 1e-9)))
        score = 0.5 * dn1 + 0.5 * dn2 + 0.15 * aspect + 0.12 * abs(gruns - truns)
        if score < best[0]:
            best = (score, _ALT_OF.get(ch, ch))
    return best


def recognize_scan(
    width: int, height: int, luma: bytes, trace: list | None = None
) -> tuple[str, float]:
    """Scanned page -> (text, mean per-glyph confidence 0..100).

    ``trace``, when a list, receives one dict per emitted glyph
    (band geometry, component box, allowed class, score) — a debug
    seam for tuning the matcher on real fixtures; never used on the
    production path.
    """
    t = otsu_threshold(luma)
    ink = [v <= t for v in luma]
    row_has = [any(ink[y * width : (y + 1) * width]) for y in range(height)]

    raw_bands: list[list[int]] = []
    start = None
    for y, has in enumerate(row_has):
        if has and start is None:
            start = y
        elif not has and start is not None:
            raw_bands.append([start, y])
            start = None
    if start is not None:
        raw_bands.append([start, height])
    if not raw_bands:
        return "", 0.0
    bands = [raw_bands[0]]
    for b in raw_bands[1:]:
        if b[0] - bands[-1][1] <= 2:
            bands[-1][1] = b[1]
        else:
            bands.append(b)

    out_lines: list[str] = []
    confs: list[float] = []
    for y0, y1 in bands:
        bh = y1 - y0
        # underline strip: cut the band at a near-empty separator row in
        # its bottom 40% when rows below it still carry ink
        counts = [
            sum(1 for x in range(width) if ink[y * width + x]) for y in range(y0, y1)
        ]
        peak = max(counts)
        cut = None
        for i in range(len(counts) - 2, int(0.6 * len(counts)), -1):
            if counts[i] <= 0.12 * peak and any(c > 0.1 * peak for c in counts[i + 1 :]):
                cut = i
                break
        yy1 = y0 + cut if cut is not None else y1
        if yy1 - y0 < 0.5 * bh:
            yy1 = y1
        # descender columns: when the underline strip cuts the band,
        # g/p/y tails overlap the stripped rows and vanish — but the
        # near-empty separator row itself carries ONLY tail pixels
        # (the underline proper starts below it), so remember which
        # columns had ink there and force descender classification
        # for glyphs above them
        desc_cols: set[int] = set()
        if yy1 < y1:
            for x in range(width):
                if ink[yy1 * width + x]:
                    desc_cols.add(x)
        bh = yy1 - y0

        band_pts = [
            (y, x) for y in range(y0, yy1) for x in range(width) if ink[y * width + x]
        ]
        if not band_pts:
            continue
        cinfo: list[list] = []
        for comp in _components(band_pts):
            ys = [p[0] for p in comp]
            xs = [p[1] for p in comp]
            cinfo.append([min(xs), max(xs) + 1, min(ys), max(ys) + 1, comp])
        # leftover underline fragments: much wider than tall
        cinfo = [
            c for c in cinfo if not (c[1] - c[0] > 2.2 * bh and c[3] - c[2] <= 0.3 * bh)
        ]
        if not cinfo:
            continue
        cinfo.sort(key=lambda c: (c[0], c[2]))
        stacked: list[list] = []
        for c in cinfo:
            if stacked:
                m = stacked[-1]
                ov = min(m[1], c[1]) - max(m[0], c[0])
                small = (c[3] - c[2]) < 0.5 * bh or (m[3] - m[2]) < 0.5 * bh
                if ov > (0.4 if small else 0.75) * min(m[1] - m[0], c[1] - c[0]):
                    m[0] = min(m[0], c[0])
                    m[1] = max(m[1], c[1])
                    m[2] = min(m[2], c[2])
                    m[3] = max(m[3], c[3])
                    m[4] = m[4] + c[4]
                    continue
            stacked.append(c)
        cinfo = stacked

        tall = [c for c in cinfo if (c[3] - c[2]) >= 0.55 * bh]
        if tall:
            baseline = sorted(c[3] for c in tall)[len(tall) // 2]
            tops = [c[2] for c in tall]
            top_min = min(tops)
            xc = [tp for tp in tops if tp > top_min + 0.12 * bh]
            xline = sorted(xc)[len(xc) // 2] if xc else top_min + int(0.25 * bh)
            med_w = sorted(c[1] - c[0] for c in tall)[len(tall) // 2]
        else:
            baseline, xline, med_w = yy1, y0, max(1, int(bh * 0.5))

        def classify_sets(gy0: int, gy1: int, gx0: int, gx1: int) -> set[str]:
            hg = gy1 - gy0
            has_tail = any(x in desc_cols for x in range(gx0, gx1))
            if hg < 0.5 * bh:
                # tiny marks are near-identical blobs once trimmed —
                # VERTICAL POSITION is the discriminator: apostrophes
                # hang from the top, periods sit ON the baseline,
                # commas dip below it (or had their tail stripped
                # with the underline)
                if gy1 <= xline + 0.3 * bh:
                    return _APOS
                if gy1 >= baseline - max(1.0, 0.1 * bh):
                    if has_tail or gy1 > baseline + max(1.0, 0.05 * bh):
                        return {","}
                    return {".", ",", ":", ";"}
                return _MARK
            below = gy1 > baseline + 0.08 * bh or has_tail
            lowtop = gy0 > y0 + 0.6 * (xline - y0) and xline > y0
            if below and lowtop:
                return _DESC
            if below:
                return _DESC | _ASC
            if lowtop:
                return _XHT
            return _ASC

        def match_maybe_split(c: list, depth: int = 0) -> tuple[float, str]:
            x0, x1, gy0, gy1, pts = c
            s0, ch0 = _match_one(pts, gy0, gy1, x0, x1, classify_sets(gy0, gy1, x0, x1))
            # width prior: one template stretched over a 2-glyph-wide
            # blob should lose to its split
            s0 += 0.10 * max(0.0, (x1 - x0) / max(1, med_w) - 1.35)
            if depth < 3 and x1 - x0 > 1.45 * med_w and x1 - x0 >= 6:
                colcnt: dict[int, int] = {}
                for _, xx in pts:
                    colcnt[xx] = colcnt.get(xx, 0) + 1
                lo = x0 + int(0.3 * (x1 - x0))
                hi = x0 + int(0.7 * (x1 - x0)) + 1
                # try the 3 thinnest columns in the middle window, not
                # just the single thinnest: welded pairs often split
                # best OFF the global minimum (the weld can be thinner
                # than the true inter-letter boundary)
                cand = sorted(
                    range(lo, hi),
                    key=lambda i: (colcnt.get(i, 0), abs(i - (x0 + x1) // 2)),
                )[:3]
                best_split: tuple[float, str] | None = None
                for cut2 in cand:
                    # drop the cut column itself: it carries the
                    # anti-alias weld between kerned letters
                    left = [p for p in pts if p[1] < cut2]
                    right = [p for p in pts if p[1] > cut2]
                    if not left or not right:
                        continue

                    def box(pp: list) -> list:
                        ys = [p[0] for p in pp]
                        xs = [p[1] for p in pp]
                        return [min(xs), max(xs) + 1, min(ys), max(ys) + 1, pp]

                    sl, tl = match_maybe_split(box(left), depth + 1)
                    sr, tr_ = match_maybe_split(box(right), depth + 1)
                    avg = (sl + sr) / 2
                    if best_split is None or avg < best_split[0]:
                        best_split = (avg, tl + tr_)
                if best_split is not None and best_split[0] + 0.12 < s0:
                    return best_split
            return s0, ch0

        entries: list[list] = []  # [txt, comp|None, score]
        prev_end = None
        for c in cinfo:
            tiny_mark = (c[3] - c[2]) < 0.5 * bh and not (
                c[3] <= xline + 0.3 * bh
            )  # punctuation follows its word with no space
            if (
                prev_end is not None
                and c[0] - prev_end >= 0.65 * med_w
                and not tiny_mark
            ):
                entries.append(
                    [" " * max(1, round((c[0] - prev_end) / (1.3 * med_w))), None, 0.0]
                )
            prev_end = c[1]
            score, txt = match_maybe_split(c)
            entries.append([txt, c, score])
            confs.append(max(0.0, 100.0 * (1.0 - score)))
            if trace is not None:
                trace.append(
                    {
                        "band": (y0, yy1),
                        "box": (c[0], c[1], c[2], c[3]),
                        "pts": c[4],
                        "baseline": baseline,
                        "xline": xline,
                        "med_w": med_w,
                        "allowed": classify_sets(c[2], c[3], c[0], c[1]),
                        "txt": txt,
                        "score": score,
                    }
                )

        # token digit coherence: a token anchored by at least one
        # confident digit whose other characters are all digit-lookalike
        # letters (O/0, J/7, Z/2, l/1, ...) is a number — re-match the
        # lookalikes against digit templates only, keeping the flip
        # when the digit reading is within margin of the letter one
        token: list[int] = []

        def flush_token() -> None:
            if len(token) >= 2:
                s = "".join(entries[i][0] for i in token)
                # a trailing measurement unit anchors the prefix even
                # when every prefix digit was misread as a letter
                # ("lOOmg"): strip the unit, require the rest to be
                # all digit-or-lookalike
                body = token
                one_char_each = all(len(entries[i][0]) == 1 for i in token)
                for unit in _UNIT_SUFFIXES:
                    if (
                        one_char_each  # index math below is per-glyph
                        and len(s) > len(unit) + 1
                        and s.endswith(unit)
                        and all(
                            ch.isdigit() or ch in _DIGIT_HINT
                            for ch in s[: -len(unit)]
                        )
                    ):
                        body = token[: len(token) - len(unit)]
                        s = s[: -len(unit)]
                        break
                nd = sum(ch.isdigit() for ch in s)
                anchored = nd >= 1 or body is not token  # unit counts as anchor
                if anchored and all(ch.isdigit() or ch in _DIGIT_HINT for ch in s):
                    for i in body:
                        txt_i, comp, old = entries[i]
                        if comp is None or len(txt_i) != 1 or txt_i.isdigit():
                            continue
                        s2, ch2 = _match_one(
                            comp[4], comp[2], comp[3], comp[0], comp[1], _DIGITS
                        )
                        if s2 <= old + 0.30:
                            entries[i][0] = ch2
            token.clear()

        for i, (txt_i, comp, _s) in enumerate(entries):
            if comp is None:
                flush_token()
            else:
                token.append(i)
        flush_token()
        out_lines.append("".join(e[0] for e in entries))

    text = "\n".join(out_lines)
    mean_conf = sum(confs) / max(len(confs), 1)
    return text, round(mean_conf, 4)
