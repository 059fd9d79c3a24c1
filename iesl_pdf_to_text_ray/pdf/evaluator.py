"""Content-stream interpreter: drives a SpanBuilder per page.

Single-pass re-expression of the reference's two-stage pipeline
(PartialEvaluator.getOperatorList -> SVGGraphics.executeOpTree,
/root/reference/src/main/js/pdf.combined.js:45599-45898 and 20113-20254):
operator translation (TJ flattening, '/" expansion, color normalization,
form recursion, image id assignment) and replay happen in one walk, calling
the SpanBuilder's leaf methods in the exact order the reference's replay
would.  Annotation appearance streams are excluded by design (the reference
replay never implements them; goldens contain no annotation text).
"""

from __future__ import annotations

import re

from ..functions.span_builder import SpanBuilder
from .content_scanner import ContentScanner
from .fonts import TranslatedFont, translate_font
from .objects import Name, Ref, Stream

# ops the reference evaluator consumes without emitting anything: they do
# not interrupt a constructPath merge run
_NON_EMITTING = {"cs", "CS", "BMC", "BDC", "EMC", "MP", "DP", "BX", "EX",
                 "d0", "d1"}
_PATH_OPS = {"m", "l", "c", "v", "y", "re", "h"}

_EI_RE = re.compile(rb"\sEI(?=[\s\x00/\[<(%]|$)")


class _IState:
    __slots__ = ("font", "fill_cs_pattern")

    def __init__(self):
        self.font: TranslatedFont | None = None
        self.fill_cs_pattern = False

    def clone(self):
        c = _IState.__new__(_IState)
        c.font = self.font
        c.fill_cs_pattern = self.fill_cs_pattern
        return c


class PageInterpreter:
    """Interprets one page's content (plus nested form XObjects)."""

    def __init__(self, xref, page_index: int, font_cache: dict,
                 media_sink: dict | None = None):
        self.xref = xref
        self.page_index = page_index
        self.font_cache = font_cache  # doc-level: key -> TranslatedFont
        self.media_sink = media_sink  # ref -> image source (optional)
        self.builder = SpanBuilder()
        self.state = _IState()
        self.state_stack: list[_IState] = []
        self.obj_ctr = 0       # img_p<page>_<n>
        self.aux_ctr = 0       # mask_/inline_ refs
        self.in_path = False
        self.form_depth = 0

    # -- font loading ------------------------------------------------------

    def _load_font(self, font_obj) -> TranslatedFont | None:
        key = None
        if isinstance(font_obj, Ref):
            key = ("ref", font_obj.num, font_obj.gen)
            f = self.font_cache.get(key)
            if f is not None:      # hot path: Tf re-selects a known font
                return f
        font_dict = self.xref.fetch_if_ref(font_obj)
        if not isinstance(font_dict, dict):
            return None
        if key is None:
            key = ("id", id(font_dict))
        f = self.font_cache.get(key)
        if f is None:
            try:
                f = translate_font(font_dict, self.xref)
            except Exception:
                f = TranslatedFont()  # error font: empty widths, identity
            self.font_cache[key] = f
        return f

    def _set_font(self, font_obj, size: float) -> None:
        f = self._load_font(font_obj)
        self.state.font = f
        fm0 = None
        if f is not None and f.font_matrix:
            fm0 = f.font_matrix[0]
        self.builder.set_font(size, fm0, name=(f.name if f else ""))

    # -- main loop ---------------------------------------------------------

    def run(self, content: bytes, resources: dict) -> None:
        xref = self.xref
        fetch = xref.fetch_if_ref
        b = self.builder
        scanner = ContentScanner(content)

        def emit():
            self.in_path = False

        fonts_res = _UNRESOLVED
        for args, op, op_pos in scanner:
            try:
                if op == "Tj":
                    emit()
                    self._show_text(args[-1] if args else b"")
                elif op == "TJ":
                    emit()
                    self._show_spaced_text(args[-1] if args else [])
                elif op == "'":
                    emit()
                    b.next_line()
                    self._show_text(args[-1] if args else b"")
                elif op == '"':
                    emit()
                    b.next_line()
                    if len(args) >= 3:
                        b.set_word_spacing(_num(args[-3]))
                        b.set_char_spacing(_num(args[-2]))
                    self._show_text(args[-1] if args else b"")
                elif op == "Td":
                    emit()
                    b.move_text(_num(args[-2]), _num(args[-1]))
                elif op == "TD":
                    emit()
                    b.set_leading(-_num(args[-1]))
                    b.move_text(_num(args[-2]), _num(args[-1]))
                elif op == "Tm":
                    emit()
                    b.set_text_matrix(*[_num(a) for a in args[-6:]])
                elif op == "T*":
                    emit()
                    b.next_line()
                elif op == "BT":
                    emit()
                    b.begin_text()
                elif op == "ET":
                    emit()
                    b.end_text()
                elif op == "Tf":
                    emit()
                    if fonts_res is _UNRESOLVED:
                        # resources are fixed for this content stream;
                        # resolve the Font dict once, not per Tf op
                        fonts_res = fetch(resources.get("Font"))
                    fname = args[-2] if len(args) >= 2 else None
                    size = _num(args[-1]) if args else 0.0
                    font_obj = None
                    if isinstance(fonts_res, dict) \
                            and isinstance(fname, Name):
                        font_obj = fonts_res.get(str(fname))
                    self._set_font(font_obj, size)
                elif op == "Tc":
                    emit()
                    b.set_char_spacing(_num(args[-1]))
                elif op == "Tw":
                    emit()
                    b.set_word_spacing(_num(args[-1]))
                elif op == "Tz":
                    emit()
                    b.set_hscale(_num(args[-1]))
                elif op == "TL":
                    emit()
                    b.set_leading(_num(args[-1]))
                elif op in ("Ts", "Tr"):
                    emit()  # emitted op, no replay effect
                elif op == "q":
                    emit()
                    b.save()
                    self.state_stack.append(self.state)
                    self.state = self.state.clone()
                elif op == "Q":
                    emit()
                    b.restore()
                    if self.state_stack:
                        self.state = self.state_stack.pop()
                elif op == "cm":
                    emit()
                    b.transform([_num(a) for a in args[-6:]])
                elif op in ("rg", "g", "k", "sc"):
                    emit()
                    b.set_fill_rgb()
                elif op == "scn":
                    if self.state.fill_cs_pattern:
                        emit()  # pattern ops; no tspan trigger
                    else:
                        emit()
                        b.set_fill_rgb()
                elif op in ("RG", "G", "K", "SC", "SCN"):
                    emit()  # stroke colors: emitted, no tspan effect
                elif op == "cs":
                    csname = args[-1] if args else None
                    self.state.fill_cs_pattern = self._is_pattern(
                        csname, resources)
                    # non-emitting: do not clear path run
                elif op == "CS":
                    pass
                elif op in _PATH_OPS:
                    if not self.in_path:
                        b.construct_path()
                        self.in_path = True
                elif op in ("S", "s", "f", "F", "f*", "B", "B*", "b", "b*"):
                    emit()  # fill/stroke: attrs only
                elif op == "n":
                    emit()
                    b.end_path()
                elif op in ("W", "W*"):
                    emit()
                    # bug-compat clip guard (SURVEY.md §5.3 rule 6)
                    if b.current.element is not None:
                        b.clip()
                elif op == "Do":
                    emit()
                    self._do_xobject(args[-1] if args else None, resources)
                elif op == "BI":
                    emit()
                    scanner.pos = self._inline_image(content, scanner.pos)
                elif op == "gs":
                    emit()
                    self._set_gstate(args[-1] if args else None, resources)
                elif op == "sh":
                    emit()  # shading: replay unimplemented in reference
                elif op in ("w", "J", "j", "M", "d", "ri", "i"):
                    emit()  # line params: emitted, no DOM effect
                elif op in _NON_EMITTING:
                    pass
                else:
                    # unknown operator: reference drops or warns; no effect
                    pass
            except Exception:
                # per-op robustness: a malformed operator must not kill the
                # page (reference tolerates similar via warn + continue)
                pass

    # -- helpers -----------------------------------------------------------

    def _is_pattern(self, csname, resources) -> bool:
        if not isinstance(csname, Name):
            return False
        if str(csname) == "Pattern":
            return True
        csres = self.xref.fetch_if_ref(resources.get("ColorSpace"))
        if isinstance(csres, dict):
            cs = self.xref.fetch_if_ref(csres.get(str(csname)))
            if isinstance(cs, Name) and str(cs) == "Pattern":
                return True
            if isinstance(cs, list) and cs and str(cs[0]) == "Pattern":
                return True
        return False

    def _show_text(self, s) -> None:
        if not isinstance(s, bytes):
            return
        font = self.state.font
        if font is None:
            return
        self.builder.show_text(font.chars_to_glyphs(s))

    def _show_spaced_text(self, arr) -> None:
        if not isinstance(arr, list):
            return
        font = self.state.font
        if font is None:
            return
        items: list = []
        for el in arr:
            if isinstance(el, bytes):
                items.extend(font.chars_to_glyphs(el))
            elif isinstance(el, (int, float)):
                items.append(float(el))
        self.builder.show_text(items)

    def _set_gstate(self, gsname, resources) -> None:
        fetch = self.xref.fetch_if_ref
        ext = fetch(resources.get("ExtGState"))
        if not (isinstance(ext, dict) and isinstance(gsname, Name)):
            return
        gs = fetch(ext.get(str(gsname)))
        if not isinstance(gs, dict):
            return
        font_entry = fetch(gs.get("Font"))
        if isinstance(font_entry, list) and len(font_entry) == 2:
            self._set_font(font_entry[0], _num(font_entry[1]))

    # -- XObjects ----------------------------------------------------------

    def _do_xobject(self, name, resources) -> None:
        fetch = self.xref.fetch_if_ref
        if not isinstance(name, Name):
            return
        xres = fetch(resources.get("XObject"))
        if not isinstance(xres, dict):
            return
        xobj = fetch(xres.get(str(name)))
        if not isinstance(xobj, Stream):
            return
        subtype = str(fetch(xobj.dict.get("Subtype")) or "")
        if subtype == "Form":
            if self.form_depth > 10:
                return
            self.form_depth += 1
            try:
                self._run_form(xobj, resources)
            finally:
                self.form_depth -= 1
        elif subtype == "Image":
            self._paint_image(xobj, cache_key=str(name))
        # PS XObjects ignored (reference: 45673-45677)

    def _run_form(self, xobj: Stream, parent_resources: dict) -> None:
        from .filters import decode_stream
        fetch = self.xref.fetch_if_ref
        b = self.builder
        d = xobj.dict
        matrix = fetch(d.get("Matrix"))
        bbox = fetch(d.get("BBox"))
        # paintFormXObjectBegin (reference replay 20791-20813)
        b.save()
        self.state_stack.append(self.state)
        self.state = self.state.clone()
        if isinstance(matrix, list) and len(matrix) == 6:
            b.transform([_num(v) for v in matrix])
        if isinstance(bbox, list) and len(bbox) == 4:
            from ..functions.minidom import Element
            b.current.element = Element("rect")
            b.clip()
            b.end_path()
        res = fetch(d.get("Resources"))
        res = res if isinstance(res, dict) else parent_resources
        saved_in_path = self.in_path
        self.in_path = False
        try:
            self.run(decode_stream(xobj, self.xref), res)
        except Exception:
            pass
        self.in_path = saved_in_path
        # paintFormXObjectEnd
        b.restore()
        if self.state_stack:
            self.state = self.state_stack.pop()

    _image_cache_attr = "_img_op_cache"

    def _paint_image(self, xobj: Stream, cache_key: str | None) -> None:
        """XObject image -> media op (identity only, no decoding)."""
        fetch = self.xref.fetch_if_ref
        d = xobj.dict
        cache = getattr(self, "_img_cache", None)
        if cache is None:
            cache = self._img_cache = {}
        if cache_key is not None and cache_key in cache:
            kind, ref = cache[cache_key]
            self._replay_image_op(kind, ref)
            return
        w = fetch(d.get("Width") or d.get("W"))
        h = fetch(d.get("Height") or d.get("H"))
        if not isinstance(w, (int, float)) or not isinstance(h, (int, float)):
            return
        is_mask = bool(fetch(d.get("ImageMask") or d.get("IM")))
        filters = fetch(d.get("Filter") or d.get("F"))
        fl = [str(x) for x in (filters if isinstance(filters, list)
                               else [filters]) if x is not None]
        if is_mask:
            self.aux_ctr += 1
            kind, ref = "mask", f"mask_p{self.page_index}_{self.aux_ctr}"
        else:
            self.obj_ctr += 1
            ref = f"img_p{self.page_index}_{self.obj_ctr}"
            has_smask = d.get("SMask") is not None or d.get("Mask") is not None
            kind = ("jpeg" if ("DCTDecode" in fl or "DCT" in fl)
                    and not has_smask else "image")
        if cache_key is not None:
            cache[cache_key] = (kind, ref)
        if self.media_sink is not None and ref not in self.media_sink:
            self.media_sink[ref] = ("xobj", xobj)
        self._replay_image_op(kind, ref)

    def _replay_image_op(self, kind: str, ref: str) -> None:
        b = self.builder
        if kind == "mask":
            b.paint_image_mask(ref)
        elif kind == "jpeg":
            b.paint_jpeg(ref)
        else:
            b.paint_inline_image(ref)

    # -- inline images -----------------------------------------------------

    def _inline_image(self, content: bytes, start: int) -> int:
        """Parse BI params + data at ``start``; emit media op; return the
        position just past EI."""
        inner = ContentScanner(content)
        inner.pos = start
        d: dict = {}
        id_pos = None
        for operands, op, op_pos in inner:
            if op == "ID":
                for i in range(0, len(operands) - 1, 2):
                    k = operands[i]
                    if isinstance(k, Name):
                        d[str(k)] = operands[i + 1]
                id_pos = op_pos
            break
        if id_pos is None:
            return len(content)
        p = id_pos + 2
        if p < len(content) and content[p] in b" \r\n\t":
            p += 1
        length = d.get("L") or d.get("Length")
        end = None
        if isinstance(length, int) and length > 0:
            cand = p + length
            m = _EI_RE.search(content, cand)
            end = m.end() if m else None
        if end is None:
            m = _EI_RE.search(content, p)
            end = m.end() if m else len(content)
        data = content[p:end]
        # media op
        fetch = self.xref.fetch_if_ref
        is_mask = bool(fetch(d.get("IM") or d.get("ImageMask")))
        w = fetch(d.get("W") or d.get("Width")) or 0
        h = fetch(d.get("H") or d.get("Height")) or 0
        cache = getattr(self, "_inline_cache", None)
        if cache is None:
            cache = self._inline_cache = {}
        ck = (bytes(data[:64]), len(data), is_mask)
        if ck in cache:
            kind, ref = cache[ck]
        else:
            if is_mask:
                self.aux_ctr += 1
                kind, ref = "mask", f"mask_p{self.page_index}_{self.aux_ctr}"
            else:
                self.aux_ctr += 1
                kind, ref = "inline", f"inline_p{self.page_index}_{self.aux_ctr}"
            cache[ck] = (kind, ref)
        if self.media_sink is not None and ref not in self.media_sink:
            self.media_sink[ref] = ("inline", d, bytes(data))
        if kind == "mask":
            self.builder.paint_image_mask(ref)
        else:
            self.builder.paint_inline_image(ref)
        return end


_UNRESOLVED = object()


def _num(v) -> float:
    if isinstance(v, (int, float)):
        return float(v)
    return 0.0


def interpret_page(xref, page, font_cache: dict) -> SpanBuilder:
    interp = PageInterpreter(xref, page.index, font_cache)
    content = page.content_bytes()
    interp.run(content, page.resources)
    return interp.builder
