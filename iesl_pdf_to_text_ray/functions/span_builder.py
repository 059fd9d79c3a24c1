"""Span builder: replays content-stream replay events into interleaved spans.

This is a faithful re-implementation of the *behavior* of the reference's SVG
text replay (SVGGraphics, /root/reference/src/main/js/pdf.combined.js:19910-20821)
combined with the reverse-engineered span-emission contract of the golden
generator (SURVEY.md §5.3): glyph *unicode* emission, TJ-gap word-space
insertion, run-start leading-space insertion, control-char stripping and
empty-span dropping.  Span order is document order of the produced mini-DOM,
which reproduces the golden ordering including save/restore re-append moves.

No code is copied from the reference; semantics were derived by instrumenting
the reference bundle and fitting against its golden corpus (see SURVEY.md §5).
"""

from __future__ import annotations

from .minidom import Element

# SURVEY.md §5.3 rule 3/4: word-space threshold in em units.  Empirically the
# decision margin on the golden corpus is (0.1122, 0.1504] so any value in
# that interval reproduces the goldens exactly; 0.15 matches the reference's
# getTextContent SPACE_FACTOR(0.3) x typical space width (0.5 em).
SPACE_THRESHOLD_EM = 0.15

FONT_IDENTITY_MATRIX0 = 0.001

_ID6 = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mul6(m1, m2):
    """PDF matrix concat (Util.transform convention: apply m2 then m1)."""
    return (m1[0] * m2[0] + m1[2] * m2[1],
            m1[1] * m2[0] + m1[3] * m2[1],
            m1[0] * m2[2] + m1[2] * m2[3],
            m1[1] * m2[2] + m1[3] * m2[3],
            m1[0] * m2[4] + m1[2] * m2[5] + m1[4],
            m1[1] * m2[4] + m1[3] * m2[5] + m1[5])


class _State:
    """Mirror of the reference's per-graphics-state text state.

    Cloning is shallow (the reference uses prototype inheritance): scalar
    writes shadow, while the mutable tspan/txt_element references are shared
    between a saved state and its clone until a new-tspan trigger replaces
    them.
    """

    __slots__ = (
        "x", "y", "line_x", "line_y",
        "font_size", "font_matrix0", "font_name",
        "char_spacing", "word_spacing", "text_hscale", "font_direction",
        "leading", "pending_clip",
        "tspan", "txt_element", "txtgrp", "element",
        "ctm", "tm",
    )

    def __init__(self):
        self.x = 0.0
        self.y = 0.0
        self.line_x = 0.0
        self.line_y = 0.0
        self.font_size = 0.0
        self.font_matrix0 = FONT_IDENTITY_MATRIX0
        self.font_name = ""
        self.char_spacing = 0.0
        self.word_spacing = 0.0
        self.text_hscale = 1.0
        self.font_direction = 1.0
        self.leading = 0.0
        self.pending_clip = False
        self.ctm = _ID6          # accumulated cm transforms (q/Q scoped)
        self.tm = _ID6           # current Tm frame
        self.tspan: Element | None = None
        self.txt_element: Element | None = None
        self.txtgrp: Element | None = None
        self.element: Element | None = None

    def clone(self) -> "_State":
        c = _State.__new__(_State)
        for name in _State.__slots__:
            setattr(c, name, getattr(self, name))
        return c


class SpanBuilder:
    """One instance per page.  Drive with replay events; then collect()."""

    def __init__(self):
        self.current = _State()
        self.extra_stack: list[_State] = []
        self.pgrp = Element("g")          # page root
        self.defs = Element("defs")
        self.pgrp.append_child(self.defs)
        self.tgrp = Element("g")          # transform group
        self.pgrp.append_child(self.tgrp)
        self.cgrp: Element | None = None  # clip group
        # §5.3 rule 4: pen end-x of the previous glyph run, reset per page.
        self.last_end_x: float | None = None

    # -- graphics state ---------------------------------------------------

    def save(self) -> None:
        self.extra_stack.append(self.current)
        self.current = self.current.clone()

    def restore(self) -> None:
        if self.extra_stack:
            self.current = self.extra_stack.pop()
        self.tgrp = Element("g")
        self.pgrp.append_child(self.tgrp)

    def transform(self, m=None) -> None:
        if m is not None and len(m) == 6:
            self.current.ctm = _mul6(self.current.ctm, tuple(m))
        self.tgrp = Element("g")

    # -- text state -------------------------------------------------------

    def begin_text(self) -> None:
        cur = self.current
        cur.x = cur.line_x = 0.0
        cur.y = cur.line_y = 0.0
        cur.tm = _ID6
        cur.tspan = Element("tspan")
        cur.txt_element = Element("text")
        cur.txtgrp = Element("g")

    def end_text(self) -> None:
        if self.current.pending_clip and self.cgrp is not None:
            self.cgrp.append_child(self.tgrp)
            self.pgrp.append_child(self.cgrp)
        else:
            self.pgrp.append_child(self.tgrp)
        self.tgrp = Element("g")

    def set_font(self, size: float, font_matrix0: float | None,
                 name: str = "") -> None:
        cur = self.current
        cur.font_matrix0 = (font_matrix0 if font_matrix0 is not None
                            else FONT_IDENTITY_MATRIX0)
        if size < 0:
            size = -size
            cur.font_direction = -1.0
        else:
            cur.font_direction = 1.0
        cur.font_size = size
        cur.font_name = name
        cur.tspan = Element("tspan")

    def move_text(self, dx: float, dy: float) -> None:
        cur = self.current
        cur.line_x += dx
        cur.x = cur.line_x
        cur.line_y += dy
        cur.y = cur.line_y
        cur.tspan = Element("tspan")

    def set_text_matrix(self, a, b, c, d, e, f) -> None:
        cur = self.current
        cur.tm = (float(a), float(b), float(c), float(d),
                  float(e), float(f))
        cur.x = cur.line_x = 0.0
        cur.y = cur.line_y = 0.0
        cur.tspan = Element("tspan")
        cur.txt_element = Element("text")
        cur.txt_element.append_child(cur.tspan)

    def set_leading(self, v: float) -> None:
        self.current.leading = -v

    def set_leading_move_text(self, x: float, y: float) -> None:
        self.set_leading(-y)
        self.move_text(x, y)

    def next_line(self) -> None:
        self.move_text(0.0, self.current.leading)

    def set_char_spacing(self, v: float) -> None:
        self.current.char_spacing = v

    def set_word_spacing(self, v: float) -> None:
        self.current.word_spacing = v

    def set_hscale(self, v: float) -> None:
        self.current.text_hscale = v / 100.0

    def set_fill_rgb(self) -> None:
        # Any fill-color change starts a new tspan (span-boundary trigger).
        self.current.tspan = Element("tspan")

    # -- the core emitter -------------------------------------------------

    def show_text(self, items) -> None:
        """items: iterable of glyph-stream entries:
        None (word break), float (TJ kerning, 1/1000 em), or
        (unicode: str, width: float) glyph tuples.
        """
        cur = self.current
        font_size = cur.font_size
        if font_size == 0:
            return
        char_spacing = cur.char_spacing
        word_spacing = cur.word_spacing
        font_dir = cur.font_direction
        hscale = cur.text_hscale * font_dir
        wa_scale = font_size * cur.font_matrix0
        threshold = SPACE_THRESHOLD_EM * font_size
        neg_cs = char_spacing if char_spacing < 0 else 0.0

        tspan = cur.tspan
        if tspan is None:
            tspan = cur.tspan = Element("tspan")
        chunks = tspan.text_chunks
        chunks_append = chunks.append
        xcoords_append = tspan.x_coords.append

        x = 0.0
        emitted_glyph = False
        for it in items:
            if it is None:
                x += font_dir * word_spacing
                continue
            if type(it) is not tuple:
                # TJ kerning number (units: 1/1000 em)
                gap = -it * font_size * 0.001
                if gap + neg_cs >= threshold:
                    chunks_append(" ")
                    xcoords_append(-1.0)   # inserted-space sentinel
                x += gap
                continue
            uni, width = it
            if uni:
                # §5.3 rule 4: leading space on a new span after a pen jump.
                # Bug-compat: the (JavaScript) golden generator guards with
                # plain truthiness, so a pen reference of exactly 0.0 —
                # which arises after a zero-width Type3 run at the origin of
                # a fresh Tm frame — disables the check like None does.
                # This closes the C04-1204 residue: 5603/5603 exact.
                if not chunks and self.last_end_x:
                    start_x = cur.x + x * hscale
                    if start_x - self.last_end_x >= threshold:
                        chunks_append(" ")
                        xcoords_append(-1.0)
                if tspan.y is None:
                    tspan.y = cur.y
                    tspan.font_size = font_size
                    tspan.font_name = cur.font_name
                    # page-space frame for layout consumers: ctm o Tm
                    # (glyph page position = mat applied to (x_i, y))
                    tspan.mat = _mul6(cur.ctm, cur.tm)
                chunks_append(uni)
                xcoords_append(cur.x + x * hscale)
                emitted_glyph = True
            x += width * wa_scale + char_spacing * font_dir

        cur.x += x * hscale
        if emitted_glyph:
            # §5.3 rule 4: only runs that placed at least one glyph move the
            # pen reference; number-only and empty runs leave it unchanged.
            self.last_end_x = cur.x

        cur.txt_element.append_child(tspan)
        if cur.txtgrp is not None:
            cur.txtgrp.append_child(cur.txt_element)
        self.tgrp.append_child(cur.txt_element)

    # -- paths & clipping (placement only) --------------------------------

    def construct_path(self) -> None:
        cur = self.current
        path = Element("path")
        self.tgrp.append_child(path)
        if cur.pending_clip and self.cgrp is not None:
            self.cgrp.append_child(self.tgrp)
            self.pgrp.append_child(self.cgrp)
        else:
            self.pgrp.append_child(self.tgrp)
        cur.element = path

    def end_path(self) -> None:
        if self.current.pending_clip and self.cgrp is not None:
            self.cgrp.append_child(self.tgrp)
            self.pgrp.append_child(self.cgrp)
        else:
            self.pgrp.append_child(self.tgrp)
        self.tgrp = Element("g")

    def clip(self) -> None:
        # Guarded by callers when no path element is pending (§5.3 rule 6).
        self.current.pending_clip = True
        self.cgrp = Element("g")
        self.pgrp.append_child(self.cgrp)

    # -- media ------------------------------------------------------------

    def _image_element(self, media_ref: str) -> Element:
        img = Element("image")
        img.media_ref = media_ref
        return img

    def paint_jpeg(self, media_ref: str) -> None:
        cur = self.current
        self.tgrp.append_child(self._image_element(media_ref))
        if cur.pending_clip and self.cgrp is not None:
            self.cgrp.append_child(self.tgrp)
            self.pgrp.append_child(self.cgrp)
        else:
            self.pgrp.append_child(self.tgrp)

    def paint_inline_image(self, media_ref: str, mask: Element | None = None) -> None:
        cur = self.current
        cliprect = Element("rect")
        cur.element = cliprect
        self.clip()
        img = self._image_element(media_ref)
        if mask is not None:
            mask.append_child(img)
        else:
            self.tgrp.append_child(img)
        if cur.pending_clip and self.cgrp is not None:
            self.cgrp.append_child(self.tgrp)
            self.pgrp.append_child(self.cgrp)
        else:
            self.pgrp.append_child(self.tgrp)

    def paint_image_mask(self, media_ref: str) -> None:
        # The reference routes the image into an svg:mask inside defs and
        # paints a fill rect in the content flow; the rect carries the media
        # position for our interleaving contract.
        mask = Element("mask")
        rect = Element("rect")
        rect.media_ref = media_ref
        self.defs.append_child(mask)
        self.tgrp.append_child(rect)
        self.paint_inline_image("", mask)

    # -- collection -------------------------------------------------------

    def collect(self) -> list[tuple[str, str, str, list[float],
                                    float | None]]:
        """Walk the final DOM in document order; return
        ``(kind, text, media_ref, x, y)`` — ``x`` is the per-glyph
        x-coordinate array in text-line space with ``-1`` marking inserted
        word spaces (docs/svg-syntax.md:8-16 semantics), ``y`` the span's
        line y.  Media spans carry ``([], None)``.

        §5.3 rule 5: control chars < U+0020 are stripped from span text, and
        spans that are empty after stripping are dropped.
        """
        spans: list[tuple[str, str, str, list[float], float | None]] = []

        def visit(el: Element):
            if el is self.defs:
                return  # masked image payloads live in defs; skip
            if el.tag == "tspan":
                text = el.text_content
                # §5.3 rule 5 (refined on the C04 corpus): a span containing
                # ANY control character (< U+0020) is dropped wholesale —
                # the golden generator did not strip-and-keep; partial
                # formula runs vanish entirely.  Whitespace-only spans are
                # dropped too (no golden span is whitespace-only).
                if text and not text.isspace() and min(text) >= "\x20":
                    spans.append(("text", text, "", list(el.x_coords),
                                  el.y, list(el.mat or _ID6)))
            elif el.media_ref:
                spans.append(("media", "", el.media_ref, [], None,
                              list(_ID6)))
            for c in el.children:
                visit(c)

        visit(self.pgrp)
        return spans
