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
