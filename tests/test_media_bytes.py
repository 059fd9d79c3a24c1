"""Media byte materialization (reference: PDFImage + convertImgDataToPng,
pdf.combined.js:41838 / 19659-19849): decodable rasters become structurally
valid PNGs, DCT images pass through as JPEG, refs join back to the span
stream."""

from __future__ import annotations

import struct
import zlib

import pytest

from iesl_pdf_to_text_ray.pdf.extractor import extract_media, extract_spans
from iesl_pdf_to_text_ray.pdf.images import png_encode
from iesl_pdf_to_text_ray.sources.corpus import reference_pdf_bytes


def _parse_png(data: bytes):
    assert data.startswith(b"\x89PNG\r\n\x1a\n")
    pos = 8
    chunks = {}
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF, tag
        chunks.setdefault(tag, []).append(payload)
        pos += 12 + length
    assert b"IEND" in chunks
    return chunks


def test_png_encoder_roundtrip():
    px = bytes(range(12))  # 2x2 RGB
    png = png_encode(2, 2, px, color_type=2)
    chunks = _parse_png(png)
    w, h, depth, ct = struct.unpack(">IIBB", chunks[b"IHDR"][0][:10])
    assert (w, h, depth, ct) == (2, 2, 8, 2)
    raw = zlib.decompress(b"".join(chunks[b"IDAT"]))
    assert raw == b"\x00" + px[:6] + b"\x00" + px[6:]


@pytest.mark.parametrize("doc,expect_mime", [
    ("test25", "image/png"), ("test24", "image/jpeg")])
def test_corpus_media_materializes(doc, expect_mime):
    data = reference_pdf_bytes()[doc]
    media = extract_media(data)
    assert media
    by_mime = [m for m in media if m["mime"] == expect_mime]
    assert by_mime, [m["mime"] for m in media]
    for m in by_mime:
        assert m["width"] > 0 and m["height"] > 0
        if m["mime"] == "image/png":
            chunks = _parse_png(m["data"])
            w, h = struct.unpack(">II", chunks[b"IHDR"][0][:8])
            assert (w, h) == (m["width"], m["height"])
        else:
            assert m["data"][:2] == b"\xff\xd8"  # JPEG SOI


def test_media_refs_join_spans():
    data = reference_pdf_bytes()["test25"]
    span_refs = {s[2] for s in extract_spans(data) if s[0] == "media"}
    media_refs = {m["media_ref"] for m in extract_media(data)}
    # every materialized image is referenced by the span stream (the span
    # stream may repeat a cached ref; the media list is unique per ref)
    assert media_refs <= span_refs
    assert len(media_refs) > 0
