"""CCITT G3/G4 fax decode (pdf/ccitt.py).

Three layers of evidence:
1. encoder/decoder round-trip across K modes, alignment, polarity;
2. bit-level cross-validation against the reference's CCITTFaxStream
   (pdf.combined.js:22827) driven through node — the reference's decoded
   bytes must be a prefix of ours (its readBlock loop truncates the final
   row once EOD sets eof, and with EOFB it may emit one junk byte past
   the end; we keep the full image);
3. end-to-end: a synthetic PDF with a CCITTFaxDecode image materializes
   as a PNG with the exact expected pixels.
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import struct
import subprocess
import zlib

import numpy as np
import pytest

from iesl_pdf_to_text_ray.pdf.ccitt import ccitt_decode, ccitt_encode

_REF_BUNDLE = "/root/reference/src/main/js/pdf.combined.js"


def _random_bitmap(rng, cols, nrows):
    img = np.zeros((nrows, cols), np.uint8)
    for r in range(nrows):
        pos = 0
        color = int(rng.randint(0, 2))
        while pos < cols:
            run = int(rng.randint(1, max(2, cols // 3)))
            if color:
                img[r, pos:pos + run] = 1
            pos += run
            color ^= 1
    return img


def _unpack(packed, cols, nrows, black1=False):
    bits = np.unpackbits(
        np.frombuffer(packed, np.uint8).reshape(nrows, -1), axis=1)[:, :cols]
    return bits if black1 else 1 - bits


@pytest.mark.parametrize("k", [-1, 0, 4])
@pytest.mark.parametrize("byte_align", [False, True])
def test_roundtrip(k, byte_align):
    rng = np.random.RandomState(10 + 3 * k + byte_align)
    for cols, nrows in ((8, 3), (17, 5), (100, 7), (256, 4)):
        img = _random_bitmap(rng, cols, nrows)
        eol = k == 0 and byte_align
        enc = ccitt_encode([list(r) for r in img], cols, k=k,
                           byte_align=byte_align, end_of_line=eol)
        dec, n = ccitt_decode(enc, k=k, columns=cols, rows=nrows,
                              byte_align=byte_align, end_of_line=eol)
        assert n == nrows
        assert np.array_equal(_unpack(dec, cols, n), img)


def test_black_is_1_polarity_and_padding():
    img = np.array([[1, 0, 1, 1, 0]], np.uint8)   # 5 cols -> 3 pad bits
    enc = ccitt_encode([list(img[0])], 5, k=-1)
    d0, _ = ccitt_decode(enc, k=-1, columns=5, rows=1)
    d1, _ = ccitt_decode(enc, k=-1, columns=5, rows=1, black_is_1=True)
    assert _unpack(d0, 5, 1).tolist() == img.tolist()
    assert _unpack(d1, 5, 1, black1=True).tolist() == img.tolist()
    # reference pads row tails with black in both polarities
    # (pdf.combined.js:23645-23658: zero bits pre-inversion)
    assert d0[0] & 0b111 == 0
    assert d1[0] & 0b111 == 0b111


# ---- cross-validation vs the reference JS decoder -------------------------

_HARNESS = r"""
var M = require(process.argv[2]);
var chunks = [];
process.stdin.on('data', function (c) { chunks.push(c); });
process.stdin.on('end', function () {
  var req = JSON.parse(Buffer.concat(chunks).toString('utf8'));
  var bytes = new Uint8Array(Buffer.from(req.b64, 'base64'));
  var str = new M.Stream(bytes, 0, bytes.length, null);
  str.dict = null;
  var P = {K: req.k, Columns: req.columns, Rows: req.rows || 0,
           BlackIs1: !!req.blackIs1, EncodedByteAlign: !!req.byteAlign,
           EndOfLine: !!req.endOfLine, EndOfBlock: req.endOfBlock};
  var params = {get: function (n) { return P[n]; }};
  try {
    var cs = new M.CCITTFaxStream(str, bytes.length, params);
    process.stdout.write(JSON.stringify(
      {ok: true, b64: Buffer.from(cs.getBytes()).toString('base64')}));
  } catch (e) {
    process.stdout.write(JSON.stringify({ok: false, err: String(e)}));
  }
});
"""


@pytest.fixture(scope="module")
def ref_ccitt(tmp_path_factory):
    if shutil.which("node") is None or not os.path.exists(_REF_BUNDLE):
        pytest.skip("node or reference bundle unavailable")
    d = tmp_path_factory.mktemp("ccittref")
    lines = open(_REF_BUNDLE, encoding="utf-8").read().split("\n")

    def closure(start_marker):
        a = next(i for i, l in enumerate(lines) if l.startswith(start_marker))
        b = next(i for i in range(a, len(lines)) if lines[i] == "})();")
        return "\n".join(lines[a:b + 1])

    module = "\n".join([
        "function warn(m){}",
        "function error(m){throw new Error(m);}",
        "var info = warn;",
        "var EOF = {};",
        "function isEOF(v){return v === EOF;}",
        closure("var Stream = (function StreamClosure()"),
        closure("var DecodeStream = (function DecodeStreamClosure()"),
        closure("var CCITTFaxStream = (function CCITTFaxStreamClosure()"),
        "module.exports = {CCITTFaxStream: CCITTFaxStream, Stream: Stream};",
    ])
    (d / "ccitt_ref.js").write_text(module)
    (d / "run.js").write_text(_HARNESS)

    def run(enc: bytes, **kw):
        req = {"b64": base64.b64encode(enc).decode(), **kw}
        p = subprocess.run(
            ["node", str(d / "run.js"), str(d / "ccitt_ref.js")],
            input=json.dumps(req).encode(), capture_output=True, timeout=60)
        r = json.loads(p.stdout)
        assert r["ok"], r.get("err")
        return base64.b64decode(r["b64"])

    return run


def test_vs_reference_decoder(ref_ccitt):
    rng = np.random.RandomState(42)
    for trial in range(6):
        cols = int(rng.choice([8, 17, 64, 100, 256]))
        nrows = int(rng.randint(2, 8))
        stride = (cols + 7) // 8
        img = _random_bitmap(rng, cols, nrows)
        for k, eol in ((-1, False), (0, False), (0, True), (4, True)):
            for ba in (False, True):
                for b1 in (False, True):
                    enc = ccitt_encode([list(r) for r in img], cols, k=k,
                                       byte_align=ba, end_of_line=eol)
                    mine, n = ccitt_decode(
                        enc, k=k, columns=cols, rows=nrows, byte_align=ba,
                        end_of_line=eol, black_is_1=b1)
                    ref = ref_ccitt(enc, k=k, columns=cols, rows=nrows,
                                    byteAlign=ba, endOfLine=eol, blackIs1=b1,
                                    endOfBlock=(k < 0))
                    case = (trial, k, eol, ba, b1)
                    assert len(mine) == nrows * stride, case
                    common = min(len(ref), len(mine))
                    # reference may truncate the last row at EOD or emit
                    # one junk byte past EOFB; everything else is ours
                    assert common >= (nrows - 1) * stride, case
                    assert len(ref) <= len(mine) + stride, case
                    assert mine[:common] == ref[:common], case


# ---- end-to-end: CCITT image inside a PDF ---------------------------------

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
        out.extend(f"{offsets.get(num, 0):010d} 00000 n \n".encode())
    out.extend(f"trailer\n<< /Size {maxnum + 1} /Root {root} 0 R >>\n"
               f"startxref\n{xref_off}\n%%EOF\n".encode())
    return bytes(out)


def test_pdf_ccitt_image_materializes_png():
    from iesl_pdf_to_text_ray.pdf.extractor import extract_media
    cols, nrows = 24, 6
    rng = np.random.RandomState(5)
    img = _random_bitmap(rng, cols, nrows)
    enc = ccitt_encode([list(r) for r in img], cols, k=-1)
    content = b"q 24 0 0 6 0 0 cm /Im1 Do Q"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] "
            b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"),
        4: b"<< /Length %d >>\nstream\n" % len(content) + content
           + b"\nendstream",
        5: (b"<< /Type /XObject /Subtype /Image /Width 24 /Height 6 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
            b"/Filter /CCITTFaxDecode "
            b"/DecodeParms << /K -1 /Columns 24 /Rows 6 >> "
            b"/Length %d >>\nstream\n" % len(enc) + enc + b"\nendstream"),
    }
    media = extract_media(_pdf(objects))
    assert len(media) == 1
    m = media[0]
    assert m["mime"] == "image/png", m
    assert (m["width"], m["height"]) == (cols, nrows)
    # decode the PNG (filter byte 0 per row) and compare pixels
    assert m["data"].startswith(b"\x89PNG")
    pos = 8
    idat = b""
    while pos < len(m["data"]):
        (length,) = struct.unpack(">I", m["data"][pos:pos + 4])
        tag = m["data"][pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += m["data"][pos + 8:pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    row_bytes = cols  # 8-bit gray
    pixels = np.frombuffer(
        b"".join(raw[y * (row_bytes + 1) + 1:(y + 1) * (row_bytes + 1)]
                 for y in range(nrows)), np.uint8).reshape(nrows, cols)
    # CCITT default: 0 bits black -> sample 0 -> gray 0; 1=black internal
    expect = np.where(img == 1, 0, 255)
    assert np.array_equal(pixels, expect)
