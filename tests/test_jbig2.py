"""JBIG2 decode (pdf/jbig2.py).

Three layers of evidence, mirroring tests/test_ccitt.py:
1. MQ-coder and region round-trips (the in-repo T.88 Annex E encoder
   exists only to make fixtures — no JBIG2 encoder ships in the
   container);
2. byte-level cross-validation against the reference's Jbig2Image
   (pdf.combined.js:9603) driven through node on the same fixture
   streams;
3. end-to-end: a synthetic PDF with a JBIG2Decode image (including the
   JBIG2Globals layout real PDFs use) materializes as a PNG with the
   exact expected pixels.
"""

from __future__ import annotations

import base64
import json
import os
import random
import shutil
import struct
import subprocess
import zlib

import numpy as np
import pytest

from iesl_pdf_to_text_ray.pdf import jbig2 as J

_REF_BUNDLE = "/root/reference/src/main/js/pdf.combined.js"


def _random_bitmap(seed, w, h):
    rng = random.Random(seed)
    return [bytearray(rng.getrandbits(1) for _ in range(w))
            for _ in range(h)]


def _unpack_page(packed, w, h, inverted=True):
    stride = (w + 7) // 8
    out = np.unpackbits(
        np.frombuffer(packed[:h * stride], np.uint8).reshape(h, stride),
        axis=1)[:, :w]
    return (1 - out) if inverted else out


# ------------------------------------------------------------- round-trip

def test_mq_roundtrip():
    rng = random.Random(7)
    for trial in range(10):
        n = rng.randint(1, 4000)
        bits = [rng.getrandbits(1) for _ in range(n)]
        ctxs = [rng.randrange(64) for _ in range(n)]
        enc = J.MQEncoder()
        ec = bytearray(1 << 16)
        for b, cx in zip(bits, ctxs):
            enc.encode_bit(ec, cx, b)
        data = enc.flush()
        dec = J.MQDecoder(data, 0, len(data))
        dc = bytearray(1 << 16)
        assert [dec.read_bit(dc, cx) for cx in ctxs] == bits, trial


def test_integer_roundtrip():
    values = [0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436, 99999,
              -1, -5, -340, -70000, None]
    ectx = J.EncodingContext()
    for v in values:
        J.encode_integer(ectx, "IADW", v)
    data = ectx.encoder.flush()
    ctx = J.DecodingContext(data, 0, len(data))
    for v in values:
        assert J.decode_integer(ctx.cache, "IADW", ctx.decoder) == v


@pytest.mark.parametrize("template", [0, 1, 2, 3])
def test_generic_region_roundtrip(template):
    for seed, (w, h) in enumerate([(7, 5), (64, 48), (31, 17), (100, 3)]):
        bm = _random_bitmap(100 * template + seed, w, h)
        stream = J.build_generic_region_stream(bm, template_index=template)
        packed, pw, ph = J.jbig2_decode(stream)
        assert (pw, ph) == (w, h)
        expect = np.array([list(r) for r in bm], np.uint8)
        assert np.array_equal(_unpack_page(packed, w, h), expect)


def test_symbol_text_region_roundtrip():
    A = [bytearray([1, 1, 1, 1]), bytearray([1, 0, 0, 1]),
         bytearray([1, 1, 1, 1])]
    B = [bytearray([0, 1, 0]), bytearray([1, 1, 1]),
         bytearray([0, 1, 0]), bytearray([1, 0, 1])]
    W, H = 32, 16
    placements = [(0, 2, 1), (1, 10, 1), (0, 20, 2), (1, 5, 9), (0, 12, 9)]
    stream = J.build_symbol_text_stream([A, B], placements, W, H)
    packed, pw, ph = J.jbig2_decode(stream)
    assert (pw, ph) == (W, H)
    page = np.zeros((H, W), np.uint8)
    for sym, s, t in placements:
        g = [A, B][sym]
        for i, row in enumerate(g):
            for j, v in enumerate(row):
                if v and t + i < H and s + j < W:
                    page[t + i][s + j] = 1
    assert np.array_equal(_unpack_page(packed, W, H), page)


# ---- cross-validation vs the reference JS decoder -------------------------

_HARNESS = r"""
var M = require(process.argv[2]);
var chunks = [];
process.stdin.on('data', function (c) { chunks.push(c); });
process.stdin.on('end', function () {
  var req = JSON.parse(Buffer.concat(chunks).toString('utf8'));
  try {
    var jb = [];
    req.chunks.forEach(function (b64) {
      var bytes = new Uint8Array(Buffer.from(b64, 'base64'));
      jb.push({data: bytes, start: 0, end: bytes.length});
    });
    var img = new M.Jbig2Image();
    var buf = img.parseChunks(jb);
    process.stdout.write(JSON.stringify(
      {ok: true, b64: Buffer.from(buf).toString('base64')}));
  } catch (e) {
    process.stdout.write(JSON.stringify({ok: false, err: String(e)}));
  }
});
"""


@pytest.fixture(scope="module")
def ref_jbig2(tmp_path_factory):
    if shutil.which("node") is None or not os.path.exists(_REF_BUNDLE):
        pytest.skip("node or reference bundle unavailable")
    d = tmp_path_factory.mktemp("jbig2ref")
    lines = open(_REF_BUNDLE, encoding="utf-8").read().split("\n")

    def closure(start_marker):
        a = next(i for i, l in enumerate(lines) if l.startswith(start_marker))
        b = next(i for i in range(a, len(lines)) if lines[i] == "})();")
        return "\n".join(lines[a:b + 1])

    module = "\n".join([
        "function warn(m){}",
        "function error(m){throw new Error(m);}",
        "var info = warn;",
        "function shadow(obj, prop, value){Object.defineProperty(obj, prop,"
        " {value: value, enumerable: true, configurable: true,"
        " writable: false}); return value;}",
        "function log2(x){var n=1,i=0;while(x>n){n<<=1;i++;}return i;}",
        "function readInt8(data,start){return (data[start] << 24) >> 24;}",
        "function readUint16(data,offset){"
        "return (data[offset] << 8) | data[offset+1];}",
        "function readUint32(data,offset){"
        "return ((data[offset] << 24) | (data[offset+1] << 16) |"
        " (data[offset+2] << 8) | data[offset+3]) >>> 0;}",
        closure("var ArithmeticDecoder = (function ArithmeticDecoder"),
        closure("var Jbig2Image = (function Jbig2ImageClosure()"),
        "module.exports = {Jbig2Image: Jbig2Image};",
    ])
    (d / "jbig2_ref.js").write_text(module)
    (d / "run.js").write_text(_HARNESS)

    def run(chunks: list[bytes]) -> bytes:
        req = {"chunks": [base64.b64encode(c).decode() for c in chunks]}
        p = subprocess.run(
            ["node", str(d / "run.js"), str(d / "jbig2_ref.js")],
            input=json.dumps(req).encode(), capture_output=True, timeout=60)
        r = json.loads(p.stdout)
        assert r["ok"], r.get("err")
        return base64.b64decode(r["b64"])

    return run


def test_generic_vs_reference(ref_jbig2):
    for template in range(4):
        for seed, (w, h) in enumerate([(13, 9), (64, 32), (75, 7)]):
            bm = _random_bitmap(7 * template + seed, w, h)
            stream = J.build_generic_region_stream(bm,
                                                   template_index=template)
            mine, _, _ = J.parse_chunks(
                [{"data": stream, "start": 0, "end": len(stream)}])
            ref = ref_jbig2([stream])
            assert bytes(mine) == ref, (template, seed)


def test_symbol_text_vs_reference(ref_jbig2):
    rng = random.Random(3)
    symbols = [_random_bitmap(i, rng.randint(3, 9), rng.randint(3, 9))
               for i in range(4)]
    W, H = 80, 40
    placements = []
    for sym in range(4):
        for _ in range(3):
            placements.append((sym, rng.randrange(W - 10),
                               rng.randrange(H - 10)))
    stream = J.build_symbol_text_stream(symbols, placements, W, H)
    mine, _, _ = J.parse_chunks(
        [{"data": stream, "start": 0, "end": len(stream)}])
    ref = ref_jbig2([stream])
    assert bytes(mine) == ref


def test_globals_chunk_vs_reference(ref_jbig2):
    A = [bytearray([1, 1]), bytearray([1, 1])]
    B = [bytearray([1, 0, 1]), bytearray([0, 1, 0]), bytearray([1, 0, 1])]
    W, H = 24, 12
    placements = [(0, 1, 1), (1, 8, 4), (0, 15, 7)]
    globals_data, data = J.build_symbol_text_stream(
        [A, B], placements, W, H, split_globals=True)
    mine, _, _ = J.parse_chunks(
        [{"data": globals_data, "start": 0, "end": len(globals_data)},
         {"data": data, "start": 0, "end": len(data)}])
    ref = ref_jbig2([globals_data, data])
    assert bytes(mine) == ref


# ---- end-to-end: JBIG2 image inside a PDF ---------------------------------

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


def _png_gray_pixels(png: bytes, w: int, h: int) -> np.ndarray:
    assert png.startswith(b"\x89PNG")
    pos = 8
    idat = b""
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos:pos + 4])
        tag = png[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += png[pos + 8:pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    return np.frombuffer(
        b"".join(raw[y * (w + 1) + 1:(y + 1) * (w + 1)] for y in range(h)),
        np.uint8).reshape(h, w)


def test_pdf_jbig2_image_materializes_png():
    from iesl_pdf_to_text_ray.pdf.extractor import extract_media
    w, h = 24, 9
    bm = _random_bitmap(11, w, h)
    enc = J.build_generic_region_stream(bm)
    content = b"q 24 0 0 9 0 0 cm /Im1 Do Q"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] "
            b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"),
        4: b"<< /Length %d >>\nstream\n" % len(content) + content
           + b"\nendstream",
        5: (b"<< /Type /XObject /Subtype /Image /Width 24 /Height 9 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
            b"/Filter /JBIG2Decode "
            b"/Length %d >>\nstream\n" % len(enc) + enc + b"\nendstream"),
    }
    media = extract_media(_pdf(objects))
    assert len(media) == 1
    m = media[0]
    assert m["mime"] == "image/png", m
    assert (m["width"], m["height"]) == (w, h)
    pixels = _png_gray_pixels(m["data"], w, h)
    # JBIG2 1 = black -> gray sample 0
    expect = np.where(np.array([list(r) for r in bm]) == 1, 0, 255)
    assert np.array_equal(pixels, expect)


def test_pdf_jbig2_with_globals_materializes_png():
    from iesl_pdf_to_text_ray.pdf.extractor import extract_media
    A = [bytearray([1, 1, 1]), bytearray([1, 0, 1]), bytearray([1, 1, 1])]
    W, H = 16, 8
    placements = [(0, 2, 2), (0, 9, 3)]
    globals_data, data = J.build_symbol_text_stream(
        [A], placements, W, H, split_globals=True)
    content = b"q 16 0 0 8 0 0 cm /Im1 Do Q"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] "
            b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"),
        4: b"<< /Length %d >>\nstream\n" % len(content) + content
           + b"\nendstream",
        5: (b"<< /Type /XObject /Subtype /Image /Width 16 /Height 8 "
            b"/ColorSpace /DeviceGray /BitsPerComponent 1 "
            b"/Filter /JBIG2Decode "
            b"/DecodeParms << /JBIG2Globals 6 0 R >> "
            b"/Length %d >>\nstream\n" % len(data) + data + b"\nendstream"),
        6: (b"<< /Length %d >>\nstream\n" % len(globals_data) + globals_data
            + b"\nendstream"),
    }
    media = extract_media(_pdf(objects))
    assert len(media) == 1
    m = media[0]
    assert m["mime"] == "image/png", m
    pixels = _png_gray_pixels(m["data"], W, H)
    page = np.full((H, W), 255, np.uint8)
    for sym, s, t in placements:
        for i, row in enumerate(A):
            for j, v in enumerate(row):
                if v:
                    page[t + i][s + j] = 0
    assert np.array_equal(pixels, page)


def test_tpgdon_roundtrip():
    rng = random.Random(5)
    w, h = 40, 24
    bm = [bytearray(rng.getrandbits(1) for _ in range(w)) for _ in range(h)]
    bm[6] = bytearray(bm[5])      # consecutive duplicates: real LTP rows
    bm[7] = bytearray(bm[5])
    stream = J.build_generic_region_stream(bm, prediction=True)
    packed, pw, ph = J.jbig2_decode(stream)
    assert (pw, ph) == (w, h)
    expect = np.array([list(r) for r in bm], np.uint8)
    assert np.array_equal(_unpack_page(packed, w, h), expect)


def _refinement_fixture():
    base = [[bytearray([1, 1, 1, 1, 1]), bytearray([1, 0, 0, 0, 1]),
             bytearray([1, 1, 1, 1, 1])],
            [bytearray([0, 1, 0]), bytearray([1, 1, 1]),
             bytearray([0, 1, 0])]]
    refined = []
    for bi, b in enumerate(base):
        r = [bytearray(row) for row in b]
        r[0][0] ^= 1
        r[-1][-1] ^= 1
        refined.append((bi, r, 0, 0))
    W, H = 30, 12
    placements = [(0, 2, 2), (1, 12, 2), (0, 20, 6), (1, 5, 7)]
    return base, refined, placements, W, H


def test_refined_symbol_dictionary_roundtrip():
    base, refined, placements, W, H = _refinement_fixture()
    stream = J.build_refined_symbol_stream(base, refined, placements, W, H)
    packed, pw, ph = J.jbig2_decode(stream)
    assert (pw, ph) == (W, H)
    page = np.zeros((H, W), np.uint8)
    for sym, s, t in placements:
        g = refined[sym][1]
        for i, row in enumerate(g):
            for j, v in enumerate(row):
                if v and t + i < H and s + j < W:
                    page[t + i][s + j] = 1
    assert np.array_equal(_unpack_page(packed, W, H), page)


def test_tpgdon_vs_reference(ref_jbig2):
    rng = random.Random(13)
    w, h = 33, 18
    bm = [bytearray(rng.getrandbits(1) for _ in range(w)) for _ in range(h)]
    bm[4] = bytearray(bm[3])
    stream = J.build_generic_region_stream(bm, prediction=True)
    mine, _, _ = J.parse_chunks(
        [{"data": stream, "start": 0, "end": len(stream)}])
    assert bytes(mine) == ref_jbig2([stream])


def test_refined_symbols_vs_reference(ref_jbig2):
    base, refined, placements, W, H = _refinement_fixture()
    stream = J.build_refined_symbol_stream(base, refined, placements, W, H)
    mine, _, _ = J.parse_chunks(
        [{"data": stream, "start": 0, "end": len(stream)}])
    assert bytes(mine) == ref_jbig2([stream])


def test_fuzz_corrupt_streams_fail_cleanly():
    """Random garbage and bit-flipped valid streams must raise or
    return quickly — never hang or allocate unboundedly (corrupt
    headers can claim gigapixel regions)."""
    rng = random.Random(99)
    valid = J.build_generic_region_stream(_random_bitmap(1, 24, 16))
    cases = [bytes(rng.randrange(256) for _ in range(rng.randint(1, 200)))
             for _ in range(30)]
    for _ in range(30):
        b = bytearray(valid)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        cases.append(bytes(b))
    for data in cases:
        try:
            J.jbig2_decode(data)
        except Exception:
            pass
