"""Composite (Type0/CID) fonts, ToUnicode CMaps, and rendering-mode
behaviors through synthetic PDFs."""

from __future__ import annotations

import zlib

from iesl_pdf_to_text_ray.pdf.extractor import extract_spans


def _pdf(objects: dict[int, bytes], root: int = 1) -> bytes:
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out.extend(f"{num} 0 obj\n".encode())
        out.extend(objects[num])
        out.extend(b"\nendobj\n")
    xref_off = len(out)
    maxnum = max(objects)
    out.extend(f"xref\n0 {maxnum + 1}\n".encode())
    out.extend(b"0000000000 65535 f \n")
    for num in range(1, maxnum + 1):
        off = offsets.get(num, 0)
        out.extend(f"{off:010d} 00000 n \n".encode())
    out.extend(f"trailer\n<< /Size {maxnum + 1} /Root {root} 0 R >>\n"
               f"startxref\n{xref_off}\n%%EOF\n".encode())
    return bytes(out)


def _doc_objects(content: bytes, font_objs: dict[int, bytes],
                 font_ref: int) -> dict[int, bytes]:
    return {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 %d 0 R >> >> /Contents 4 0 R >>"
            % font_ref),
        4: b"<< /Length %d >>\nstream\n" % len(content) + content
           + b"\nendstream",
        **font_objs,
    }


def test_type0_identity_h_with_tounicode():
    tounicode = (b"/CIDInit /ProcSet findresource begin\n"
                 b"12 dict begin begincmap\n"
                 b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
                 b"2 beginbfchar\n<0041> <0048>\n<0042> <0049>\nendbfchar\n"
                 b"1 beginbfrange <0050> <0052> <0065> endbfrange\n"
                 b"endcmap end end")
    comp = zlib.compress(tounicode)
    font_objs = {
        5: (b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
            b"/Encoding /Identity-H /DescendantFonts [6 0 R] "
            b"/ToUnicode 7 0 R >>"),
        6: (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /FontDescriptor 8 0 R /DW 1000 "
            b"/W [ 65 [500 600] 80 82 450 ] >>"),
        7: b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(comp)
           + comp + b"\nendstream",
        8: (b"<< /Type /FontDescriptor /FontName /Fake /Flags 4 "
            b"/FontBBox [0 0 1000 1000] /ItalicAngle 0 /Ascent 800 "
            b"/Descent -200 /CapHeight 700 /StemV 80 >>"),
    }
    # two-byte codes: 0041 0042 (bfchar -> 'H','I'), 0050..0052 (range ->
    # 'e','f','g')
    content = (b"BT /F1 12 Tf 72 700 Td "
               b"<00410042> Tj 0 -20 Td <005000510052> Tj ET")
    pdf = _pdf(_doc_objects(content, font_objs, 5))
    spans = extract_spans(pdf)
    texts = [s[1] for s in spans if s[0] == "text"]
    assert texts == ["HI", "efg"]


def test_type0_without_tounicode_identity_fallback():
    font_objs = {
        5: (b"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Identity-H "
            b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>"),
        6: (b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fake "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /DW 1000 >>"),
    }
    # charcode 0x0041 -> identity unicode 'A'
    content = b"BT /F1 12 Tf 72 700 Td <00410042> Tj ET"
    pdf = _pdf(_doc_objects(content, font_objs, 5))
    texts = [s[1] for s in extract_spans(pdf) if s[0] == "text"]
    assert texts == ["AB"]


def test_invisible_text_mode_still_emitted():
    # Tr 3 (invisible; OCR layers) must still produce spans
    font_objs = {
        5: (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    }
    content = b"BT /F1 12 Tf 3 Tr 72 700 Td (hidden ocr text) Tj ET"
    pdf = _pdf(_doc_objects(content, font_objs, 5))
    texts = [s[1] for s in extract_spans(pdf) if s[0] == "text"]
    assert texts == ["hidden ocr text"]


def test_word_spacing_advance_ignored_like_reference():
    # Tw affects layout in real PDF but the reference SVG replay never
    # applies it to simple-font glyph advances; parity requires same
    font_objs = {5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>"}
    content = (b"BT /F1 10 Tf 50 Tw 72 700 Td (a b) Tj ET")
    pdf = _pdf(_doc_objects(content, font_objs, 5))
    texts = [s[1] for s in extract_spans(pdf) if s[0] == "text"]
    assert texts == ["a b"]


def test_standard14_widths_used_without_widths_array():
    # Helvetica without /Widths must pull AFM metrics (affects rule-4
    # leading spaces): two runs with a gap > 0.15em get the space
    font_objs = {5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"}
    # 'ab' at width 556+556=1112/1000*10 = 11.12pt; jump to x+14 => gap
    # 2.88pt >= 1.5pt threshold -> leading space
    content = (b"BT /F1 10 Tf 72 700 Td (ab) Tj 14 0 Td (cd) Tj ET")
    pdf = _pdf(_doc_objects(content, font_objs, 5))
    texts = [s[1] for s in extract_spans(pdf) if s[0] == "text"]
    assert texts == ["ab", " cd"]
