"""Document-level extraction: PDF bytes -> interleaved span sequence.

This is the single-document core the Ray Data stages wrap (SURVEY.md §1.2):
one row in, one ordered list of (kind, text, media_ref, offset) out.
"""

from __future__ import annotations

from .document import PdfDocument
from .evaluator import interpret_page


def extract_spans(pdf_bytes: bytes,
                  page_range: tuple[int, int] | None = None,
                  ) -> list[tuple[str, str, str, int]]:
    """Extract the full span sequence of a document in reading order.

    page_range: optional (start, stop) page-index slice for page-level
    skew splitting; offsets are then local to the slice (the reassembly
    stage rebases them).
    """
    doc = PdfDocument(pdf_bytes)
    pages = doc.pages
    if page_range is not None:
        pages = pages[page_range[0]:page_range[1]]
    font_cache: dict = {}
    out: list[tuple[str, str, str, int]] = []
    for page in pages:
        builder = interpret_page(doc.xref, page, font_cache)
        for kind, text, media_ref in builder.collect():
            out.append((kind, text, media_ref, len(out)))
    return out


def count_pages(pdf_bytes: bytes) -> int:
    return len(PdfDocument(pdf_bytes).pages)
