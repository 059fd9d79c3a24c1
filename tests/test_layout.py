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


# ---- line merging + hyphenation repair (north-star layout heuristics) -----

def _mk_span(text, x0, y, page=0, adv=5.0):
    xs = [x0 + i * adv for i in range(len(text))]
    return {"kind": "text", "text": text, "media_ref": "", "offset": 0,
            "x": xs, "y": y, "page": page, "mat": [1, 0, 0, 1, 0, 0]}


def test_merge_lines_same_baseline_and_order():
    from iesl_pdf_to_text_ray.functions.layout import merge_lines
    spans = [
        _mk_span("world", 60, 10),       # same line, right part
        _mk_span("hello ", 10, 10),      # same line, left part
        _mk_span("second line", 10, 30),
    ]
    lines = merge_lines(spans)
    assert lines == ["hello world", "second line"]


def test_merge_lines_no_space_for_font_change_kern():
    from iesl_pdf_to_text_ray.functions.layout import merge_lines
    # "Pre" + "dicate" split mid-word with a tight gap must NOT get a space
    a = _mk_span("Pre", 10, 10, adv=5.0)
    b = _mk_span("dicate", 10 + 3 * 5.0, 10, adv=5.0)
    assert merge_lines([a, b]) == ["Predicate"]


def test_repair_hyphenation_rules():
    from iesl_pdf_to_text_ray.functions.layout import repair_hyphenation
    lines = ["this is a con-", "tinuation", "a real-", "Compound stays",
             "trailing-"]
    out = repair_hyphenation(lines)
    assert out == ["this is a continuation", "a real-", "Compound stays",
                   "trailing-"]


def test_body_text_lines_on_corpus():
    from iesl_pdf_to_text_ray.functions.layout import (
        body_text_lines, merge_lines, repair_hyphenation,
        strip_headers_footers)
    from iesl_pdf_to_text_ray.pdf.extractor import extract_spans
    from iesl_pdf_to_text_ray.sources.corpus import reference_pdf_bytes

    def as_dicts(spans):
        return [{"kind": k, "text": t, "media_ref": m, "offset": o,
                 "x": xs, "y": y, "page": pg, "mat": mt}
                for k, t, m, o, xs, y, pg, mt in spans]

    spans = as_dicts(extract_spans(reference_pdf_bytes()["C04-1204"]))
    merged = merge_lines(strip_headers_footers(spans))
    repaired = repair_hyphenation(merged)
    # hyphenation repair must join the vast majority of broken words
    before = sum(1 for l in merged if l.rstrip().endswith("-"))
    after = sum(1 for l in repaired if l.rstrip().endswith("-"))
    assert before > 100 and after < before * 0.1
    # two-column reading order: the known title line survives intact
    assert any("Predicate-Argument" in l for l in repaired[:5])
    assert body_text_lines(spans) == repaired   # composition is exact
