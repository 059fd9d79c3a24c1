"""getTextContent parity: the reference's *second* text extractor.

Reimplements the item-based extractor of PartialEvaluator.getTextContent
(/root/reference/src/main/js/pdf.combined.js:45900-46463) — the surface
behind node/getinfo.js — producing ``{str, dir, width, height, transform,
font_name}`` items with the documented heuristics:

* SPACE_FACTOR 0.3 / MULTI_SPACE_FACTOR 1.5 / MULTI_SPACE_FACTOR_MAX 4
  fake-space insertion against the font's estimated space width
  (pdf.combined.js:45929-45932, 46138-46150, spaceWidth 36576-36619);
* same-line Td treated as an in-item advance when 0 < advance <=
  fakeMultiSpaceMax (46201-46218);
* TJ numbers advance the matrix, break the run past fakeMultiSpaceMax,
  or fake spaces (46253-46301);
* Form XObject recursion with saved state (46319-46366), ExtGState
  nested Font (46367-46393).

Item strings run through the full bidi reorder (pdf/bidi.py, parity with
PDFJS.bidi incl. its quirks — runBidiTransform, 46033-46045).

Known approximations (documented, no golden exists for this surface —
the reference repo ships no getTextContent expected outputs):
* NormalizedUnicodes table approximated by NFKC on non-ASCII chars;
* isMonospace is not tracked (textRunBreakAllowed whenever spaceWidth>0).
"""

from __future__ import annotations

import math
import unicodedata

from .bidi import bidi
from .content_scanner import ContentScanner
from .objects import Name, Stream

SPACE_FACTOR = 0.3
MULTI_SPACE_FACTOR = 1.5
MULTI_SPACE_FACTOR_MAX = 4

_IDENTITY = [1.0, 0.0, 0.0, 1.0, 0.0, 0.0]


def _transform(m1, m2):
    return [m1[0] * m2[0] + m1[2] * m2[1], m1[1] * m2[0] + m1[3] * m2[1],
            m1[0] * m2[2] + m1[2] * m2[3], m1[1] * m2[2] + m1[3] * m2[3],
            m1[0] * m2[4] + m1[2] * m2[5] + m1[4],
            m1[1] * m2[4] + m1[3] * m2[5] + m1[5]]


class _TextState:
    __slots__ = ("ctm", "tm", "tlm", "font", "font_size", "font_matrix",
                 "char_spacing", "word_spacing", "hscale", "leading", "rise")

    def __init__(self):
        self.ctm = list(_IDENTITY)
        self.tm = list(_IDENTITY)
        self.tlm = list(_IDENTITY)
        self.font = None
        self.font_size = 0.0
        self.font_matrix = [0.001, 0, 0, 0.001, 0, 0]
        self.char_spacing = 0.0
        self.word_spacing = 0.0
        self.hscale = 1.0
        self.leading = 0.0
        self.rise = 0.0

    def clone(self):
        c = _TextState.__new__(_TextState)
        for s in _TextState.__slots__:
            v = getattr(self, s)
            setattr(c, s, list(v) if isinstance(v, list) else v)
        return c

    def translate_tm(self, x, y):
        m = self.tm
        m[4] = m[0] * x + m[2] * y + m[4]
        m[5] = m[1] * x + m[3] * y + m[5]

    def translate_tlm(self, x, y):
        m = self.tlm
        m[4] = m[0] * x + m[2] * y + m[4]
        m[5] = m[1] * x + m[3] * y + m[5]

    def carriage_return(self):
        self.translate_tlm(0, -self.leading)
        self.tm = list(self.tlm)


def _space_width(font) -> float:
    """Estimate of the space glyph width (spaceWidth, 36576-36619).

    Memoized on the font object: _ensure_item calls this per text item,
    and building the reverse ToUnicode map is O(|cmap|) — a hot-path cost
    for CID fonts with large maps."""
    if font is None:
        return 0.0
    cached = getattr(font, "_space_width_cache", None)
    if cached is not None:
        return cached
    sw = _space_width_uncached(font)
    try:
        font._space_width_cache = sw
    except AttributeError:  # __slots__-style fonts: recompute per item
        pass
    return sw


def _space_width_uncached(font) -> float:
    rev = {u: c for c, u in font.to_unicode.items()}
    for uni in (" ", "-", "1", "i"):
        code = rev.get(uni, ord(uni))
        if font.composite and font.cmap is not None:
            cid = font.cmap.lookup(code)
            code = cid if isinstance(cid, int) else code
        w = font.widths.get(code)
        if w:
            return float(w)
    return float(font.default_width)


def _normalize(uni: str) -> str:
    if uni.isascii():
        return uni
    n = unicodedata.normalize("NFKC", uni)
    return n if n else uni


class _Item:
    __slots__ = ("initialized", "str", "width", "height", "vertical",
                 "last_advance_width", "last_advance_height",
                 "text_advance_scale", "space_width", "fake_space_min",
                 "fake_multi_space_min", "fake_multi_space_max",
                 "break_allowed", "transform", "font_name")

    def __init__(self):
        self.initialized = False
        self.str: list[str] = []
        self.width = self.height = 0.0
        self.vertical = False
        self.last_advance_width = self.last_advance_height = 0.0
        self.text_advance_scale = 0.0
        self.space_width = 0.0
        self.fake_space_min = math.inf
        self.fake_multi_space_min = math.inf
        self.fake_multi_space_max = 0.0
        self.break_allowed = False
        self.transform = None
        self.font_name = ""


class TextContentExtractor:
    """Run over one content stream (plus Form XObjects) and collect
    items; shares the page's font cache via the PageInterpreter loader."""

    def __init__(self, xref, font_loader):
        self.xref = xref
        self.load_font = font_loader   # font_obj -> TranslatedFont
        self.items: list[dict] = []
        self.styles: dict[str, dict] = {}
        self.item = _Item()

    # -- item lifecycle ----------------------------------------------------

    def _ensure_item(self, ts: _TextState) -> _Item:
        it = self.item
        if it.initialized:
            return it
        font = ts.font
        it.font_name = getattr(font, "name", "") or ""
        if it.font_name not in self.styles:
            self.styles[it.font_name] = {
                "fontFamily": it.font_name,
                "vertical": bool(getattr(font, "vertical", False))}
        tsm = [ts.font_size * ts.hscale, 0, 0, ts.font_size, 0, ts.rise]
        trm = _transform(ts.ctm, _transform(ts.tm, tsm))
        it.transform = trm
        vertical = bool(getattr(font, "vertical", False))
        it.vertical = vertical
        if not vertical:
            it.width = 0.0
            it.height = math.hypot(trm[2], trm[3])
        else:
            it.width = math.hypot(trm[0], trm[1])
            it.height = 0.0
        scale_line_x = math.hypot(ts.tlm[0], ts.tlm[1])
        scale_ctm_x = math.hypot(ts.ctm[0], ts.ctm[1])
        it.text_advance_scale = scale_ctm_x * scale_line_x
        it.last_advance_width = it.last_advance_height = 0.0
        sw = _space_width(font) / 1000 * ts.font_size
        if sw:
            it.space_width = sw
            it.fake_space_min = sw * SPACE_FACTOR
            it.fake_multi_space_min = sw * MULTI_SPACE_FACTOR
            it.fake_multi_space_max = sw * MULTI_SPACE_FACTOR_MAX
            it.break_allowed = True
        else:
            it.space_width = 0.0
            it.fake_space_min = math.inf
            it.fake_multi_space_min = math.inf
            it.fake_multi_space_max = 0.0
            it.break_allowed = False
        it.initialized = True
        return it

    def _add_fake_spaces(self, width: float, buf: list[str]) -> None:
        it = self.item
        if width < it.fake_space_min:
            return
        if width < it.fake_multi_space_min:
            buf.append(" ")
            return
        n = round(width / it.space_width)
        buf.extend(" " * n)

    def _flush(self) -> None:
        it = self.item
        if not it.initialized:
            return
        # runBidiTransform (46033-46045): the item string is replaced by
        # the bidi display order and dir comes from the algorithm
        s, direction = bidi("".join(it.str), -1, it.vertical)
        self.items.append({"str": s, "dir": direction,
                           "width": it.width, "height": it.height,
                           "transform": it.transform,
                           "font_name": it.font_name})
        it.initialized = False
        it.str = []

    # -- glyph run ---------------------------------------------------------

    def _iter_codes(self, font, s: bytes):
        """(charcode, width, unicode, is_space) per glyph — same decode
        the span path uses, plus the is-space flag getTextContent needs."""
        if font.composite and font.cmap is not None:
            i, n = 0, len(s)
            while i < n:
                code, nb = font.cmap.read_char_code(s, i)
                i += nb
                cid = font.cmap.lookup(code)
                cid = cid if isinstance(cid, int) else 0
                w = font.widths.get(cid, font.default_width)
                uni = font.to_unicode.get(code)
                if uni is None:
                    uni = chr(code) if code <= 0x10FFFF else "�"
                yield code, float(w), uni, (nb == 1 and code == 0x20)
        else:
            tu, ws, dw = font.to_unicode, font.widths, font.default_width
            for c in s:
                yield (c, float(ws.get(c, dw)), tu.get(c) or chr(c),
                       c == 0x20)

    def _build_item(self, ts: _TextState, chars: bytes) -> None:
        font = ts.font
        if font is None:
            return
        it = self._ensure_item(ts)
        width = 0.0
        for _code, gw, uni, is_space in self._iter_codes(font, chars):
            char_spacing = ts.char_spacing
            if is_space:
                char_spacing += ts.word_spacing
                if ts.word_spacing > 0:
                    self._add_fake_spaces(ts.word_spacing, it.str)
            w0 = gw * ts.font_matrix[0]
            tx = (w0 * ts.font_size + char_spacing) * ts.hscale
            width += tx
            ts.translate_tm(tx, 0.0)
            it.str.append(_normalize(uni))
        it.last_advance_width = width
        it.width += width * it.text_advance_scale

    # -- main loop ---------------------------------------------------------

    def run(self, content: bytes, resources: dict, ts: _TextState) -> None:
        fetch = self.xref.fetch_if_ref
        resources = resources or {}
        stack: list[_TextState] = []
        xobj_cache_key = None
        xobj_cache_items = None
        for args, op, _pos in ContentScanner(content):
            try:
                if op == "Tj":
                    self._build_item(ts, args[-1] if args else b"")
                elif op == "TJ":
                    self._show_spaced(ts, args[-1] if args else [])
                elif op == "'":
                    self._flush()
                    ts.carriage_return()
                    self._build_item(ts, args[-1] if args else b"")
                elif op == '"':
                    self._flush()
                    if len(args) >= 3:
                        ts.word_spacing = _num(args[-3])
                        ts.char_spacing = _num(args[-2])
                    ts.carriage_return()
                    self._build_item(ts, args[-1] if args else b"")
                elif op == "Td":
                    self._move_text(ts, _num(args[-2]), _num(args[-1]))
                elif op == "TD":
                    self._flush()
                    ts.leading = -_num(args[-1])
                    ts.translate_tlm(_num(args[-2]), _num(args[-1]))
                    ts.tm = list(ts.tlm)
                elif op == "Tm":
                    self._flush()
                    m = [_num(a) for a in args[-6:]]
                    ts.tm = list(m)
                    ts.tlm = list(m)
                elif op == "T*":
                    self._flush()
                    ts.carriage_return()
                elif op == "BT":
                    self._flush()
                    ts.tm = list(_IDENTITY)
                    ts.tlm = list(_IDENTITY)
                elif op == "ET":
                    self._flush()
                elif op == "Tf":
                    self._flush()
                    fonts = fetch(resources.get("Font"))
                    fname = args[-2] if len(args) >= 2 else None
                    font_obj = (fonts.get(str(fname))
                                if isinstance(fonts, dict)
                                and isinstance(fname, Name) else None)
                    ts.font = self.load_font(font_obj)
                    ts.font_size = _num(args[-1]) if args else 0.0
                    fm = getattr(ts.font, "font_matrix", None)
                    ts.font_matrix = fm or [0.001, 0, 0, 0.001, 0, 0]
                elif op == "Tc":
                    ts.char_spacing = _num(args[-1])
                elif op == "Tw":
                    ts.word_spacing = _num(args[-1])
                elif op == "Tz":
                    self._flush()
                    ts.hscale = _num(args[-1]) / 100.0
                elif op == "TL":
                    self._flush()
                    ts.leading = _num(args[-1])
                elif op == "Ts":
                    self._flush()
                    ts.rise = _num(args[-1])
                elif op == "q":
                    stack.append(ts.clone())
                elif op == "Q":
                    if stack:
                        prev = stack.pop()
                        for s in _TextState.__slots__:
                            setattr(ts, s, getattr(prev, s))
                elif op == "cm":
                    ts.ctm = _transform(ts.ctm, [_num(a)
                                                 for a in args[-6:]])
                elif op == "gs":
                    self._gs(ts, args, resources, fetch)
                elif op == "Do":
                    xobj_cache_key, xobj_cache_items = self._do_xobject(
                        ts, args, resources, fetch,
                        xobj_cache_key, xobj_cache_items)
            except Exception:
                continue
        self._flush()

    def _move_text(self, ts: _TextState, x: float, y: float) -> None:
        # same-line Td within fakeMultiSpaceMax is an in-item advance
        # (pdf.combined.js:46201-46218)
        it = self.item
        is_same_line = ts.font is not None and (
            x if getattr(ts.font, "vertical", False) else y) == 0
        advance = x - y
        if (is_same_line and it.initialized and advance > 0
                and advance <= it.fake_multi_space_max):
            ts.translate_tlm(x, y)
            it.width += x - it.last_advance_width
            it.height += y - it.last_advance_height
            diff = ((x - it.last_advance_width)
                    - (y - it.last_advance_height))
            self._add_fake_spaces(diff, it.str)
            return
        self._flush()
        ts.translate_tlm(x, y)
        ts.tm = list(ts.tlm)

    def _show_spaced(self, ts: _TextState, items) -> None:
        it = self.item
        for el in items:
            if isinstance(el, bytes):
                self._build_item(ts, el)
            elif isinstance(el, (int, float)):
                self._ensure_item(ts)
                advance = el * ts.font_size / 1000.0
                if getattr(ts.font, "vertical", False):
                    offset = advance * (ts.hscale * ts.tm[2] + ts.tm[3])
                    ts.translate_tm(0, advance)
                    brk = it.break_allowed and advance > it.fake_multi_space_max
                    if not brk:
                        it.height += offset
                else:
                    advance = -advance
                    offset = advance * (ts.hscale * ts.tm[0] + ts.tm[1])
                    ts.translate_tm(advance, 0)
                    brk = it.break_allowed and advance > it.fake_multi_space_max
                    if not brk:
                        it.width += offset
                if brk:
                    self._flush()
                elif advance > 0:
                    self._add_fake_spaces(advance, it.str)

    def _gs(self, ts, args, resources, fetch) -> None:
        self._flush()
        name = args[-1] if args else None
        ext = fetch(resources.get("ExtGState"))
        gs = fetch(ext.get(str(name))) if isinstance(ext, dict) else None
        if not isinstance(gs, dict):
            return
        entry = fetch(gs.get("Font"))
        if isinstance(entry, list) and len(entry) == 2:
            ts.font = self.load_font(fetch(entry[0]))
            ts.font_size = _num(entry[1])
            fm = getattr(ts.font, "font_matrix", None)
            ts.font_matrix = fm or [0.001, 0, 0, 0.001, 0, 0]

    def _do_xobject(self, ts, args, resources, fetch, ck, ci):
        self._flush()
        name = str(args[-1]) if args else ""
        if ck == name and ci is not None:
            self.items.extend(ci)
            return ck, ci
        xobjs = fetch(resources.get("XObject"))
        xo = fetch(xobjs.get(name)) if isinstance(xobjs, dict) else None
        if not isinstance(xo, Stream):
            return ck, ci
        if str(fetch(xo.dict.get("Subtype")) or "") != "Form":
            return name, None
        sub = ts.clone()
        m = fetch(xo.dict.get("Matrix"))
        if isinstance(m, list) and len(m) == 6:
            sub.ctm = _transform(sub.ctm, [_num(v) for v in m])
        from .filters import decode_stream
        n_before = len(self.items)
        sub_res = fetch(xo.dict.get("Resources")) or resources
        try:
            self.run(decode_stream(xo, self.xref), sub_res, sub)
        except Exception:
            pass
        return name, list(self.items[n_before:])


def _num(v) -> float:
    if isinstance(v, (int, float)) and not isinstance(v, bool):
        return float(v)
    return 0.0


def extract_text_content(pdf_bytes: bytes,
                         page_range: tuple[int, int] | None = None,
                         password: bytes = b"") -> list[dict]:
    """Per-page text items, getinfo.js-style (node/getinfo.js:51-58 joins
    item strs with ' ').  Returns [{page, items: [...]}, ...]."""
    from .document import PdfDocument
    from .evaluator import PageInterpreter
    doc = PdfDocument(pdf_bytes, password=password)
    pages = doc.pages
    if page_range is not None:
        pages = pages[page_range[0]:page_range[1]]
    font_cache: dict = {}
    out = []
    for page in pages:
        interp = PageInterpreter(doc.xref, page.index, font_cache)
        ex = TextContentExtractor(doc.xref, interp._load_font)
        ex.run(page.content_bytes(), page.resources, _TextState())
        from .metadata import page_view_size
        out.append({"page": page.index, "items": ex.items,
                    "styles": ex.styles, "size": page_view_size(page)})
    return out
