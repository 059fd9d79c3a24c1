"""SVG artifact serializer: mini-DOM -> the reference's svg-syntax output.

Reproduces the *positional text artifact* of the reference
(docs/svg-syntax.md:7-41; emission at pdf.combined.js:20310-20378 and the
multi-page fold in src/main/js/pdfToSvg.js:92-236): one ``svg:svg`` with a
per-page ``svg:g`` stack, ``svg:text``/``svg:tspan`` elements carrying the
extracted text with per-glyph ``x`` arrays (``-1`` marking inserted word
spaces), ``y``, ``font-size`` and ``font-family``.  Font embedding,
path/shading rendering and image pixels are out of scope per SURVEY.md
§7.4 (images emit ``svg:image`` placeholders keyed by media_ref).
"""

from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

from .minidom import Element


def _fmt(v: float) -> str:
    s = f"{v:.10g}"
    return s


def _tspan_svg(el: Element, out: list[str]) -> None:
    attrs = []
    if el.mat is not None:
        # the reference emits transform=pm(textMatrix) on the parent
        # svg:text (pdf.combined.js:20370); tspans cannot carry transform,
        # so the page-space frame rides as a data attribute
        attrs.append('data-mat="%s"' % " ".join(_fmt(v) for v in el.mat))
    if el.font_name:
        attrs.append(f"font-family={quoteattr(el.font_name)}")
    if el.font_size:
        attrs.append(f'font-size="{_fmt(el.font_size)}px"')
    # reference convention: tspan y = -current.y with a scale(1,-1) on the
    # text element (pdf.combined.js:20355)
    attrs.append(f'y="{_fmt(-(el.y if el.y is not None else 0.0))}"')
    xs = " ".join(_fmt(v) for v in el.x_coords)
    attrs.append(f'x="{xs}"')
    out.append(f"<svg:tspan {' '.join(attrs)}>"
               f"{escape(el.text_content)}</svg:tspan>")


def _walk(el: Element, out: list[str], skip: Element | None) -> None:
    if el is skip:
        return
    if el.tag == "tspan":
        text = el.text_content
        # same rule-5 filter as collect(): dropped spans don't serialize
        if text and not text.isspace() and min(text) >= "\x20":
            _tspan_svg(el, out)
        return
    if el.media_ref:
        out.append(f"<svg:image data-media-ref={quoteattr(el.media_ref)}/>")
    wrap = el.tag in ("g", "text")
    if wrap:
        out.append(f"<svg:{el.tag}>")
    for c in el.children:
        _walk(c, out, skip)
    if wrap:
        out.append(f"</svg:{el.tag}>")


def page_svg(builder) -> str:
    """One page's content group (``svg:g``) from a replayed SpanBuilder."""
    out: list[str] = []
    _walk(builder.pgrp, out, skip=builder.defs)
    return "\n".join(out)


def document_svg(page_groups: list[str]) -> str:
    """Fold page groups into one book SVG (pdfToSvg.js:171-220 stacks
    pages vertically; we keep one g per page in order)."""
    parts = ['<svg:svg xmlns:svg="http://www.w3.org/2000/svg" '
             'xmlns:xlink="http://www.w3.org/1999/xlink" version="1.1">']
    for i, g in enumerate(page_groups):
        parts.append(f'<svg:g data-page="{i}">')
        parts.append(g)
        parts.append("</svg:g>")
    parts.append("</svg:svg>")
    return "\n".join(parts)
