"""Layout operators over positional spans (x / y / page / mat).

These are the downstream consumers the positional columns exist for
(BASELINE north star: header/footer stripping, column detection).  Spans
carry text-line-space coordinates plus the span's page-space frame
``mat`` (ctm o Tm); glyph i's page position is ``mat`` applied to
``(x[i], y)``.  Pure functions over one document's span rows, run per
row inside map_batches.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np

_DIGITS = re.compile(r"\d+")


def _normalize(text: str) -> str:
    """Header/footer template: digits collapse (page numbers vary),
    whitespace collapses."""
    return _DIGITS.sub("#", " ".join(text.split()))


def _page_xy(span: dict) -> tuple[float, float]:
    """Page-space position of the span's first glyph."""
    a, b, c, d, e, f = span.get("mat") or (1, 0, 0, 1, 0, 0)
    xs = [v for v in (span.get("x") or []) if v != -1.0]
    x0 = xs[0] if xs else 0.0
    y0 = span.get("y") or 0.0
    return (a * x0 + c * y0 + e, b * x0 + d * y0 + f)


def strip_headers_footers(spans: list[dict], *, band_frac: float = 0.12,
                          y_tol: float = 3.0,
                          min_frac: float = 0.5) -> list[dict]:
    """Drop text spans that sit in a page's top/bottom ``band_frac`` band
    AND repeat (same normalized text at ~the same page y) on at least
    ``min_frac`` of the document's pages — running heads, footers, page
    numbers.  Body text repeating mid-page is never touched; media spans
    and one-page documents pass through unchanged."""
    pages = {s["page"] for s in spans if s.get("page") is not None}
    n_pages = len(pages)
    if n_pages < 2:
        return list(spans)
    # per-page vertical extent (page-space)
    ys_by_page: dict[int, list[float]] = {}
    pos: dict[int, tuple[float, float]] = {}
    for i, s in enumerate(spans):
        if s["kind"] != "text" or s.get("y") is None:
            continue
        p = _page_xy(s)
        pos[i] = p
        ys_by_page.setdefault(s["page"], []).append(p[1])
    bands = {}
    for pg, ys in ys_by_page.items():
        lo, hi = min(ys), max(ys)
        margin = (hi - lo) * band_frac
        bands[pg] = (lo + margin, hi - margin)

    support: Counter = Counter()
    keys: dict[int, tuple] = {}
    for i, s in enumerate(spans):
        if i not in pos:
            continue
        blo, bhi = bands[s["page"]]
        py = pos[i][1]
        if blo < py < bhi:
            continue  # mid-page: never a header/footer candidate
        key = (_normalize(s["text"]), round(py / y_tol))
        keys[i] = key
    for key, pgs in _group_pages(keys, spans).items():
        support[key] = len(pgs)
    cut = max(2, int(np.ceil(min_frac * n_pages)))
    banned = {key for key, n in support.items() if n >= cut}
    return [s for i, s in enumerate(spans)
            if keys.get(i) not in banned]


def _group_pages(keys: dict[int, tuple], spans: list[dict]) -> dict:
    out: dict[tuple, set] = {}
    for i, key in keys.items():
        out.setdefault(key, set()).add(spans[i]["page"])
    return out


def detect_columns(spans: list[dict], page: int, *, bins: int = 40,
                   gutter_frac: float = 0.35, edge: int = 3) -> int:
    """Column count for one page: project page-space glyph x positions
    onto a histogram; interior bins whose density falls below
    ``gutter_frac`` of the median are gutters; columns = gutter runs + 1.
    (Measured on the corpus: C04-1204 two-column gutter bin carries ~15%
    of median density, single-column pages never dip below ~70%.)"""
    axs: list[float] = []
    for s in spans:
        if s["kind"] != "text" or s.get("page") != page:
            continue
        a, b, c, d, e, f = s.get("mat") or (1, 0, 0, 1, 0, 0)
        y0 = s.get("y") or 0.0
        for v in (s.get("x") or []):
            if v != -1.0:
                axs.append(a * v + c * y0 + e)
    if len(axs) < 100:
        return 1
    h, _edges = np.histogram(np.asarray(axs), bins=bins)
    interior = h[edge:-edge]
    med = np.median(h[h > 0])
    low = interior < gutter_frac * med
    runs = int(np.count_nonzero(low[1:] & ~low[:-1]) + (1 if low[0] else 0))
    return 1 + runs


def _gutter_positions(spans: list[dict], page: int, *, bins: int = 40,
                      gutter_frac: float = 0.35,
                      edge: int = 3) -> list[float]:
    """x positions of the column gutters on a page (the same histogram
    detect_columns counts runs in)."""
    axs: list[float] = []
    for s in spans:
        if s["kind"] != "text" or s.get("page") != page:
            continue
        a, b, c, d, e, f = s.get("mat") or (1, 0, 0, 1, 0, 0)
        y0 = s.get("y") or 0.0
        for v in (s.get("x") or []):
            if v != -1.0:
                axs.append(a * v + c * y0 + e)
    if len(axs) < 100:
        return []
    h, edges = np.histogram(np.asarray(axs), bins=bins)
    interior = h[edge:-edge]
    med = np.median(h[h > 0])
    low = interior < gutter_frac * med
    out = []
    i = 0
    while i < len(low):
        if low[i]:
            j = i
            while j + 1 < len(low) and low[j + 1]:
                j += 1
            lo_edge = edges[edge + i]
            hi_edge = edges[edge + j + 1]
            out.append((lo_edge + hi_edge) / 2.0)
            i = j + 1
        else:
            i += 1
    return out


def merge_lines(spans: list[dict], *, y_tol: float = 2.5) -> list[str]:
    """Reading-order line assembly over positional spans: per page,
    spans are bucketed into columns (gutters from the x histogram),
    ordered top-to-bottom within a column (orientation inferred from
    emission order, so either y convention works), and spans whose
    baselines agree within ``y_tol`` merge into one line.  Whether two
    adjacent spans get a separating space is decided by the page-space
    gap against the left span's own glyph advance — golden spans split
    mid-word at font changes, so unconditional spaces would corrupt
    words."""
    lines: list[str] = []
    pages = sorted({s["page"] for s in spans
                    if s.get("page") is not None and s["kind"] == "text"})
    for pg in pages:
        recs = []        # (px_first, px_last, advance, py, text)
        for s in spans:
            if s["kind"] != "text" or s.get("page") != pg or \
                    s.get("y") is None:
                continue
            xs = [v for v in (s.get("x") or []) if v != -1.0]
            if not xs or not s["text"]:
                continue
            a, b, c, d, e, f = s.get("mat") or (1, 0, 0, 1, 0, 0)
            y0 = s["y"]
            px0 = a * xs[0] + c * y0 + e
            px1 = a * xs[-1] + c * y0 + e
            py = b * xs[0] + d * y0 + f
            adv = (abs(px1 - px0) / max(1, len(xs) - 1)) if len(xs) > 1 \
                else 0.0
            recs.append((px0, px1, adv, py, s["text"]))
        if not recs:
            continue
        # orientation: emission (DOM) order is roughly reading order
        ys = np.asarray([r[3] for r in recs])
        if len(ys) > 2 and np.polyfit(np.arange(len(ys)), ys, 1)[0] < 0:
            recs = [(px0, px1, adv, -py, t)
                    for px0, px1, adv, py, t in recs]
        gutters = _gutter_positions(spans, pg)

        def col_of(px: float) -> int:
            n = 0
            for g in gutters:
                if px > g:
                    n += 1
            return n

        recs.sort(key=lambda r: (col_of(r[0]), r[3], r[0]))
        cur: list = []
        cur_y = None
        cur_col = None
        for r in recs:
            col = col_of(r[0])
            if cur and col == cur_col and abs(r[3] - cur_y) <= y_tol:
                cur.append(r)
            else:
                if cur:
                    lines.append(_join_line(cur))
                cur = [r]
                cur_y = r[3]
                cur_col = col
        if cur:
            lines.append(_join_line(cur))
    return lines


def _join_line(recs: list) -> str:
    recs = sorted(recs, key=lambda r: r[0])
    out = ""
    prev_end = None
    prev_adv = 0.0
    for px0, px1, adv, _py, text in recs:
        if out:
            gap = px0 - prev_end
            ref = max(prev_adv, adv, 1e-6)
            # conservative: true word breaks already carry emitted
            # space chunks inside span text (the golden contract);
            # between-span separators only close LARGE gaps (tabular
            # cells, column remnants), never font-change kerns
            if gap > 1.2 * ref and not out.endswith(" ") and \
                    not text.startswith(" "):
                out += " "
        out += text
        prev_end = px1
        prev_adv = adv if adv > 0 else prev_adv
    return out


def repair_hyphenation(lines: list[str]) -> list[str]:
    """Join hyphen-broken words across consecutive lines: a line ending
    in '-' whose successor starts with a lowercase letter merges with
    the hyphen removed; uppercase/digit starts keep the hyphen (likely a
    real compound or enumeration)."""
    out: list[str] = []
    for line in lines:
        line = line.rstrip()
        if out and out[-1].endswith("-") and line and line[0].islower():
            out[-1] = out[-1][:-1] + line
        else:
            out.append(line)
    return out


def body_text_lines(spans: list[dict]) -> list[str]:
    """The full layout pipeline the north star names: header/footer
    strip -> column-aware reading-order line merge -> hyphenation
    repair."""
    return repair_hyphenation(merge_lines(strip_headers_footers(spans)))
