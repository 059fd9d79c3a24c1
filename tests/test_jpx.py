"""JPEG 2000 decode (pdf/jpx.py).

Same three evidence layers as tests/test_ccitt.py / test_jbig2.py:
1. round-trips through the in-repo fixture encoder (reversible 5/3,
   every progression order, MCT, multi-tile, odd geometry, multi-level
   tag trees);
2. byte-exact cross-validation against the reference's JpxImage
   (pdf.combined.js:10689) driven through node — including the
   irreversible 9/7 + ICT float paths, which have no reversible
   encoder, exercised by re-tagging 5/3 coefficient streams;
3. end-to-end: a synthetic PDF with a JPXDecode image materializes as a
   PNG with the exact expected pixels.
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

from iesl_pdf_to_text_ray.pdf import jpx as J

_REF_BUNDLE = "/root/reference/src/main/js/pdf.combined.js"


def _rnd(seed, w, h):
    rng = random.Random(seed)
    return [[rng.randrange(256) for _ in range(w)] for _ in range(h)]


def _roundtrip(planes, **kw):
    w = len(planes[0][0])
    h = len(planes[0])
    nc = len(planes)
    stream = J.encode_j2k(planes, **kw)
    pixels, pw, ph, pnc = J.jpx_decode(stream)
    assert (pw, ph, pnc) == (w, h, nc)
    for c in range(nc):
        for y in range(h):
            for x in range(w):
                assert pixels[(y * w + x) * nc + c] == planes[c][y][x], \
                    (c, x, y, kw)
    return stream


@pytest.mark.parametrize("name,shape,kw", [
    ("l1", (16, 16), dict(levels=1, xcb=4, ycb=4)),
    ("l2-odd", (17, 13), dict(levels=2, xcb=4, ycb=4)),
    ("l3-many-cb", (32, 32), dict(levels=3, xcb=2, ycb=2)),
    ("l0", (11, 7), dict(levels=0, xcb=4, ycb=4)),
    ("row", (16, 1), dict(levels=1, xcb=4, ycb=4)),
    ("col", (1, 16), dict(levels=1, xcb=4, ycb=4)),
    ("flat", (16, 16), dict(levels=1, xcb=4, ycb=4)),
])
def test_gray_roundtrip(name, shape, kw):
    w, h = shape
    img = ([[128] * w for _ in range(h)] if name == "flat"
           else _rnd(hash(name) & 0xFFFF, w, h))
    _roundtrip([img], **kw)


@pytest.mark.parametrize("progression", [0, 1, 2, 3, 4])
def test_progression_orders_roundtrip(progression):
    planes = [_rnd(progression, 20, 14), _rnd(progression + 50, 20, 14)]
    _roundtrip(planes, levels=2, xcb=3, ycb=3, progression=progression)


def test_mct_roundtrip():
    planes = [_rnd(i, 12, 10) for i in range(3)]
    _roundtrip(planes, levels=1, xcb=4, ycb=4, mct=True)


def test_multitile_roundtrip():
    _roundtrip([_rnd(5, 24, 16)], levels=1, xcb=4, ycb=4,
               tile_size=(12, 8))


def test_forward_inverse_dwt_identity():
    rng = random.Random(3)
    for w, h in ((8, 8), (9, 5), (1, 7), (6, 1)):
        img = [[rng.randrange(-300, 300) for _ in range(w)]
               for _ in range(h)]
        ll, hl, lh, hh = J._forward_dwt_level(img)
        # rebuild via the decoder's inverse machinery
        items = [0.0] * (w * h)
        for rows, (dy, dx) in ((hl, (0, 1)), (lh, (1, 0)), (hh, (1, 1))):
            for i, r in enumerate(rows):
                for j, v in enumerate(r):
                    items[(2 * i + dy) * w + (2 * j + dx)] = float(v)
        ll_flat = {"width": len(ll[0]) if ll else 0, "height": len(ll),
                   "items": [float(v) for r in ll for v in r]}
        out = J._transform_iterate(ll_flat,
                                  {"width": w, "height": h, "items": items},
                                  0, 0, J._filter_reversible)
        got = [[int(out["items"][i * w + j]) for j in range(w)]
               for i in range(h)]
        assert got == img, (w, h)


# ---- cross-validation vs the reference JS decoder -------------------------

_HARNESS = r"""
var M = require(process.argv[2]);
var chunks = [];
process.stdin.on('data', function (c) { chunks.push(c); });
process.stdin.on('end', function () {
  var req = JSON.parse(Buffer.concat(chunks).toString('utf8'));
  try {
    var bytes = new Uint8Array(Buffer.from(req.b64, 'base64'));
    var img = new M.JpxImage();
    img.failOnCorruptedImage = true;
    img.parse(bytes);
    var width = img.width, height = img.height, nc = img.componentsCount;
    var data;
    if (img.tiles.length === 1) {
      data = img.tiles[0].items;
    } else {
      data = new Uint8Array(width * height * nc);
      for (var k = 0; k < img.tiles.length; k++) {
        var t = img.tiles[k];
        var src = t.items, sp = 0;
        var dp = (width * t.top + t.left) * nc;
        var imgRow = width * nc, tileRow = t.width * nc;
        for (var j = 0; j < t.height; j++) {
          data.set(src.subarray(sp, sp + tileRow), dp);
          sp += tileRow; dp += imgRow;
        }
      }
    }
    process.stdout.write(JSON.stringify({ok: true, w: width, h: height,
      nc: nc, b64: Buffer.from(data).toString('base64')}));
  } catch (e) {
    process.stdout.write(JSON.stringify({ok: false, err: String(e)}));
  }
});
"""


@pytest.fixture(scope="module")
def ref_jpx(tmp_path_factory):
    if shutil.which("node") is None or not os.path.exists(_REF_BUNDLE):
        pytest.skip("node or reference bundle unavailable")
    d = tmp_path_factory.mktemp("jpxref")
    lines = open(_REF_BUNDLE, encoding="utf-8").read().split("\n")

    def closure(start_marker):
        a = next(i for i, l in enumerate(lines) if l.startswith(start_marker))
        b = next(i for i in range(a, len(lines)) if lines[i] == "})();")
        return "\n".join(lines[a:b + 1])

    module = "\n".join([
        "function warn(m){}",
        "function error(m){throw new Error(m);}",
        "var info = warn;",
        "function log2(x){var n=1,i=0;while(x>n){n<<=1;i++;}return i;}",
        "function readUint16(data,offset){"
        "return (data[offset] << 8) | data[offset+1];}",
        "function readUint32(data,offset){"
        "return ((data[offset] << 24) | (data[offset+1] << 16) |"
        " (data[offset+2] << 8) | data[offset+3]) >>> 0;}",
        closure("var ArithmeticDecoder = (function ArithmeticDecoder"),
        closure("var JpxImage = (function JpxImageClosure()"),
        "module.exports = {JpxImage: JpxImage};",
    ])
    (d / "jpx_ref.js").write_text(module)
    (d / "run.js").write_text(_HARNESS)

    def run(stream: bytes):
        req = {"b64": base64.b64encode(stream).decode()}
        p = subprocess.run(
            ["node", str(d / "run.js"), str(d / "jpx_ref.js")],
            input=json.dumps(req).encode(), capture_output=True, timeout=60)
        r = json.loads(p.stdout)
        assert r["ok"], r.get("err")
        return base64.b64decode(r["b64"]), r["w"], r["h"], r["nc"]

    return run


@pytest.mark.parametrize("name,nc,shape,kw", [
    ("gray-l2", 1, (17, 13), dict(levels=2, xcb=4, ycb=4)),
    ("gray-l3-cb", 1, (32, 32), dict(levels=3, xcb=2, ycb=2)),
    ("rgb-mct", 3, (12, 10), dict(levels=1, xcb=4, ycb=4, mct=True)),
    ("multitile", 1, (24, 16), dict(levels=1, xcb=4, ycb=4,
                                    tile_size=(12, 8))),
    ("prog2", 2, (20, 14), dict(levels=2, xcb=3, ycb=3, progression=2)),
    ("prog4", 2, (20, 14), dict(levels=2, xcb=3, ycb=3, progression=4)),
    # irreversible decode paths: no 9/7 forward exists, so 5/3
    # coefficients are re-tagged — pixels don't round-trip, but both
    # decoders must produce identical bytes (floats round through f32
    # exactly like Float32Array stores)
    ("irrev-97", 1, (16, 12), dict(levels=2, xcb=4, ycb=4,
                                   reversible=False)),
    ("irrev-ict", 3, (16, 12), dict(levels=1, xcb=4, ycb=4,
                                    reversible=False, mct=True)),
])
def test_vs_reference_decoder(ref_jpx, name, nc, shape, kw):
    w, h = shape
    planes = [_rnd(hash(name) + i, w, h) for i in range(nc)]
    stream = J.encode_j2k(planes, **kw)
    mine = J.jpx_decode(stream)
    ref = ref_jpx(stream)
    assert mine[1:] == ref[1:], name
    assert mine[0] == ref[0], name


# ---- end-to-end: JPX image inside a PDF -----------------------------------

def _pdf(objects: dict[int, bytes], root: int = 1) -> bytes:
    out = bytearray(b"%PDF-1.5\n")
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


def test_pdf_jpx_image_materializes_png():
    from iesl_pdf_to_text_ray.pdf.extractor import extract_media
    w, h = 16, 12
    planes = [_rnd(21 + i, w, h) for i in range(3)]
    enc = J.encode_j2k(planes, levels=1, xcb=4, ycb=4, mct=True)
    content = b"q 16 0 0 12 0 0 cm /Im1 Do Q"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] "
            b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"),
        4: b"<< /Length %d >>\nstream\n" % len(content) + content
           + b"\nendstream",
        5: (b"<< /Type /XObject /Subtype /Image /Width 16 /Height 12 "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
            b"/Filter /JPXDecode "
            b"/Length %d >>\nstream\n" % len(enc) + enc + b"\nendstream"),
    }
    media = extract_media(_pdf(objects))
    assert len(media) == 1
    m = media[0]
    assert m["mime"] == "image/png", m
    assert (m["width"], m["height"]) == (w, h)
    png = m["data"]
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
    row = w * 3
    pixels = np.frombuffer(
        b"".join(raw[y * (row + 1) + 1:(y + 1) * (row + 1)]
                 for y in range(h)), np.uint8).reshape(h, w, 3)
    expect = np.stack([np.array(p, np.uint8) for p in planes], axis=-1)
    assert np.array_equal(pixels, expect)


def test_fuzz_corrupt_streams_fail_cleanly():
    """Random garbage and bit-flipped valid codestreams must raise or
    return quickly — never hang or allocate unboundedly."""
    rng = random.Random(77)
    valid = J.encode_j2k([_rnd(0, 16, 12)], levels=1, xcb=4, ycb=4)
    cases = [bytes(rng.randrange(256) for _ in range(rng.randint(2, 200)))
             for _ in range(30)]
    for _ in range(30):
        b = bytearray(valid)
        for _ in range(rng.randint(1, 6)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        cases.append(bytes(b))
    for data in cases:
        try:
            J.jpx_decode(data)
        except Exception:
            pass
