"""Layout operators over positional spans (functions/layout.py)."""

from __future__ import annotations

from iesl_pdf_to_text_ray.functions.layout import (detect_columns,
                                                   strip_headers_footers)
from iesl_pdf_to_text_ray.pdf.extractor import extract_spans
from iesl_pdf_to_text_ray.sources.corpus import reference_pdf_bytes


def _mk(kind, text, page, y, x=None):
    return {"kind": kind, "text": text, "media_ref": "", "offset": 0,
            "x": x or [0.0], "y": y, "page": page}


def test_repeated_header_footer_stripped():
    spans = []
    for p in range(4):
        spans.append(_mk("text", "Journal of Testing", p, 770.0))
        spans.append(_mk("text", f"body paragraph {p} unique", p, 400.0))
        spans.append(_mk("text", f"{p + 1}", p, 30.0))  # page number
    body = strip_headers_footers(spans)
    texts = [s["text"] for s in body]
    assert "Journal of Testing" not in texts
    assert "3" not in texts               # page numbers normalized away
    assert sum("body paragraph" in t for t in texts) == 4


def test_single_page_doc_untouched():
    spans = [_mk("text", "only page", 0, 100.0)]
    assert strip_headers_footers(spans) == spans


def test_media_spans_pass_through():
    spans = []
    for p in range(3):
        spans.append(_mk("text", "Header", p, 770.0))
        spans.append({"kind": "media", "text": "", "media_ref": f"img_p{p}_1",
                      "offset": 0, "x": [], "y": None, "page": p})
    body = strip_headers_footers(spans)
    assert sum(s["kind"] == "media" for s in body) == 3
    assert all(s["text"] != "Header" for s in body)


def test_column_detection_two_columns():
    # two clusters of x positions with a wide gutter
    left = [float(v) for v in range(50, 250, 4)]
    right = [float(v) for v in range(350, 550, 4)]
    spans = [_mk("text", "l", 0, 100.0, x=left),
             _mk("text", "r", 0, 100.0, x=right)]
    assert detect_columns(spans, page=0) == 2
    one = [_mk("text", "a", 0, 100.0,
               x=[float(v) for v in range(50, 550, 4)])]
    assert detect_columns(one, page=0) == 1


def test_real_corpus_columns():
    """C04-1204 (ACL paper) is two-column; 1301.4293 (arXiv preprint) is
    single-column."""
    blobs = reference_pdf_bytes()

    def spans_of(doc):
        return [{"kind": k, "text": t, "media_ref": m, "offset": o,
                 "x": xs, "y": y, "page": pg, "mat": mt}
                for k, t, m, o, xs, y, pg, mt in extract_spans(blobs[doc])]

    assert detect_columns(spans_of("C04-1204"), page=1) == 2
    assert detect_columns(spans_of("1301.4293"), page=1) == 1
