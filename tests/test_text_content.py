"""getTextContent parity surface (pdf.combined.js:45900-46463).

No golden exists for this extractor (the reference ships no expected
getTextContent outputs), so these tests pin structure and the documented
heuristics on the corpus plus synthetic streams."""

from __future__ import annotations

import pytest

from iesl_pdf_to_text_ray.pdf.extractor import extract_plain_text
from iesl_pdf_to_text_ray.pdf.text_content import extract_text_content
from iesl_pdf_to_text_ray.sources.corpus import reference_pdf_bytes


@pytest.fixture(scope="module")
def corpus():
    return reference_pdf_bytes()


def test_item_schema_and_counts(corpus):
    pages = extract_text_content(corpus["1301.4293"])
    assert len(pages) == 4
    items = [i for p in pages for i in p["items"]]
    assert len(items) > 400
    for it in items[:50]:
        assert set(it) == {"str", "dir", "width", "height", "transform",
                           "font_name"}
        assert it["dir"] == "ltr"
        assert len(it["transform"]) == 6
        assert it["width"] >= 0
    # styles registered per font
    assert pages[0]["styles"]


def test_fake_spaces_inside_items(corpus):
    # TJ kerning gaps inside items must become real ' ' chars (SPACE_FACTOR
    # heuristic) — the title line arrives as one multi-word item
    pages = extract_text_content(corpus["1301.4293"])
    strs = [i["str"] for p in pages for i in p["items"]]
    multi = [s for s in strs if s.count(" ") >= 2]
    assert len(multi) > 50
    assert any("Latent Relation Representations" in s for s in strs)


def test_plain_text_getinfo_join(corpus):
    text = extract_plain_text(corpus["1301.4293"])
    assert "Latent Relation Representations for Universal" in text
    assert "arXiv:1301.4293" in text
    # item join uses single spaces
    assert "\n" not in text


def test_same_line_td_merges_into_item(corpus):
    # C04 uses same-line Td advances; the merge keeps sentences together
    pages = extract_text_content(corpus["C04-1204"])
    strs = [i["str"] for p in pages for i in p["items"]]
    joined = " ".join(strs)
    assert "Deep Linguistic Analysis" in joined


def test_form_xobject_recursion(corpus):
    # test24 draws content through Form XObjects; their text must appear
    pages = extract_text_content(corpus["test24"])
    joined = " ".join(i["str"] for p in pages for i in p["items"])
    assert "Thiocyanato" in joined


def test_rtl_item_bidi_reorder():
    """A synthetic Hebrew page: items must flow through the full bidi
    reorder (pdf/bidi.py) — dir='rtl' and display order reversed, with
    trailing Latin/digits kept LTR inside the RTL line (reference
    runBidiTransform, pdf.combined.js:46033-46045)."""
    from tests.test_ccitt import _pdf

    # ToUnicode maps codes 0x41.. to Hebrew shalom + " 12"
    heb = "שלום"        # shin lamed vav mem
    bf = "".join(f"<{0x41 + i:02X}> <{ord(c):04X}>\n"
                 for i, c in enumerate(heb))
    tounicode = (
        "/CIDInit /ProcSet findresource begin\n12 dict begin begincmap\n"
        "1 begincodespacerange <00> <FF> endcodespacerange\n"
        f"{len(heb)} beginbfchar\n{bf}endbfchar\n"
        "endcmap end end").encode()
    content = b"BT /F1 12 Tf 72 700 Td (ABCD 12) Tj ET"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>"),
        4: b"<< /Length %d >>\nstream\n" % len(content) + content
           + b"\nendstream",
        5: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
            b"/ToUnicode 6 0 R >>"),
        6: b"<< /Length %d >>\nstream\n" % len(tounicode) + tounicode
           + b"\nendstream",
    }
    pages = extract_text_content(_pdf(objects))
    items = [i for p in pages for i in p["items"]]
    assert len(items) == 1
    item = items[0]
    assert item["dir"] == "rtl"
    # display order: Hebrew reversed, digit run intact, all RTL-flowed
    from iesl_pdf_to_text_ray.pdf.bidi import bidi
    assert item["str"] == bidi(heb + " 12", -1)[0]
    assert "12" in item["str"]           # EN run not internally reversed
    assert item["str"][-1] == heb[0]     # first logical char displays last
