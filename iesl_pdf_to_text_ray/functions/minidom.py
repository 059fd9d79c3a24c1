"""Minimal DOM with appendChild *move* semantics.

The reference emits spans by building an SVG DOM and serializing it; span
order in the golden files is **document order** of ``svg:tspan`` elements.
Because ``appendChild`` on a live DOM moves an already-attached node to the
new position, replaying the exact builder calls against this mini-DOM and
then walking the final tree reproduces the golden ordering without having to
reason about every re-append case.

Reference behavior modeled: /root/reference/src/main/js/pdf.combined.js
(SVGGraphics, 19910-20821) — DOM calls only; no styling/serialization.
"""

from __future__ import annotations


class Element:
    __slots__ = ("tag", "children", "parent", "text_chunks", "x_coords",
                 "y", "media_ref", "font_size", "font_name", "mat")

    def __init__(self, tag: str):
        self.tag = tag
        self.children: list[Element] = []
        self.parent: Element | None = None
        # tspan text accumulates as chunks (chars / inserted spaces);
        # x_coords holds one per-glyph x (text-line space) per chunk, with
        # -1.0 marking an *inserted* word space (docs/svg-syntax.md:8-16)
        self.text_chunks: list[str] = []
        self.x_coords: list[float] = []
        self.y: float | None = None
        self.media_ref: str = ""
        self.font_size: float = 0.0
        self.font_name: str = ""
        self.mat: tuple | None = None   # page-space frame (ctm o Tm)

    def append_child(self, child: "Element") -> None:
        # DOM appendChild: if the node is already in a tree, it is first
        # removed from its current parent (move semantics).
        if child.parent is not None:
            child.parent.children.remove(child)
        child.parent = self
        self.children.append(child)

    @property
    def text_content(self) -> str:
        return "".join(self.text_chunks)

    def walk(self):
        """Yield elements in document order (pre-order)."""
        yield self
        for c in self.children:
            yield from c.walk()
