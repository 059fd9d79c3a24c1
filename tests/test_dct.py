"""Baseline/progressive JPEG (DCT) decode — byte-exact cross-validation
against the reference's JpegImage (pdf.combined.js:638-1647) driven
through node, exactly as test_ccitt/test_jbig2/test_jpx validate their
codecs.

Three evidence layers:
1. every DCTDecode stream in the reference's own test PDFs decodes to
   the reference's exact bytes (gray, RGB 4:2:0, forceRGB on and off);
2. a synthetic matrix from tests/jpeg_encoder.py covers what the real
   corpus lacks: CMYK (Adobe YCCK transform 2, plain transform 0, no
   Adobe marker), Decode-array transforms, restart intervals, 16-bit
   quantization tables, odd dimensions, asymmetric sampling, and
   progressive scans (DC successive approximation + AC spectral
   selection + AC refinement);
3. the images.py integration: a non-native JPEG materializes as PNG
   pixels, a native one stays a passthrough JPEG.
"""

from __future__ import annotations

import base64
import json
import os
import shutil
import subprocess

import numpy as np
import pytest

from iesl_pdf_to_text_ray.pdf.jpg import (JpegError, JpegImage,
                                          build_decode_transform,
                                          decode_jpeg)
from tests.jpeg_encoder import JpegEncoder

_REF_BUNDLE = "/root/reference/src/main/js/pdf.combined.js"
_HARNESS = r"""
var M = require(process.argv[2]);
var chunks = [];
process.stdin.on('data', function (c) { chunks.push(c); });
process.stdin.on('end', function () {
  var req = JSON.parse(Buffer.concat(chunks).toString('utf8'));
  var bytes = new Uint8Array(Buffer.from(req.b64, 'base64'));
  try {
    var img = new M.JpegImage();
    if (req.transform) { img.decodeTransform = new Int32Array(req.transform); }
    img.parse(bytes);
    var data = img.getData(req.width || img.width, req.height || img.height,
                           !!req.forceRGB);
    process.stdout.write(JSON.stringify(
      {ok: true, w: img.width, h: img.height, ncomp: img.numComponents,
       b64: Buffer.from(data).toString('base64')}));
  } catch (e) {
    process.stdout.write(JSON.stringify({ok: false, err: String(e)}));
  }
});
"""


@pytest.fixture(scope="module")
def ref_jpeg(tmp_path_factory):
    if shutil.which("node") is None or not os.path.exists(_REF_BUNDLE):
        pytest.skip("node or reference bundle unavailable")
    d = tmp_path_factory.mktemp("jpegref")
    lines = open(_REF_BUNDLE, encoding="utf-8").read().split("\n")
    a = next(i for i, l in enumerate(lines)
             if l.startswith("var JpegImage = (function jpegImage()"))
    b = next(i for i in range(a, len(lines)) if lines[i] == "})();")
    (d / "jpeg_ref.js").write_text(
        "\n".join(lines[a:b + 1])
        + "\nmodule.exports = {JpegImage: JpegImage};\n")
    (d / "run.js").write_text(_HARNESS)

    def run(data: bytes, width=None, height=None, force_rgb=False,
            transform=None):
        req = {"b64": base64.b64encode(bytes(data)).decode(),
               "width": width, "height": height, "forceRGB": force_rgb,
               "transform": transform}
        p = subprocess.run(
            ["node", str(d / "run.js"), str(d / "jpeg_ref.js")],
            input=json.dumps(req).encode(), capture_output=True,
            timeout=120)
        return json.loads(p.stdout)

    return run


def _assert_exact(ref_jpeg, data: bytes, force_rgb: bool,
                  transform=None, width=None, height=None):
    r = ref_jpeg(data, width=width, height=height, force_rgb=force_rgb,
                 transform=transform)
    assert r.get("ok"), f"reference failed: {r.get('err')}"
    img = JpegImage()
    if transform:
        img.decode_transform = transform
    img.parse(data)
    mine = img.get_data(width or r["w"], height or r["h"], force_rgb)
    golden = base64.b64decode(r["b64"])
    assert len(mine) == len(golden)
    assert mine == golden


# ------------------------------------------- real corpus DCT streams

def _corpus_streams():
    from iesl_pdf_to_text_ray.pdf.objects import Ref, Stream
    from iesl_pdf_to_text_ray.pdf.xref import XRef
    out = []
    for path in ("/root/reference/src/test/resources/input/test24.pdf",
                 "/root/reference/src/test/resources/input/test25.pdf",
                 "/root/reference/test-papers/2839.pdf"):
        if not os.path.exists(path):
            continue
        xr = XRef(open(path, "rb").read())
        for num in range(1, 400):
            try:
                obj = xr.fetch(Ref(num, 0))
            except Exception:
                continue
            if isinstance(obj, Stream):
                f = obj.dict.get("Filter")
                fl = [str(x) for x in (f if isinstance(f, list) else [f])]
                if any("DCT" in s for s in fl):
                    out.append((f"{os.path.basename(path)}#{num}",
                                bytes(obj.raw)))
    return out


@pytest.mark.parametrize("force_rgb", [True, False])
def test_real_corpus_streams_exact(ref_jpeg, force_rgb):
    streams = _corpus_streams()
    assert len(streams) >= 20
    checked = 0
    for name, data in streams:
        r = ref_jpeg(data, force_rgb=force_rgb)
        if not r.get("ok"):
            # the reference throws on this stream (test error parity)
            with pytest.raises(Exception):
                img = JpegImage()
                img.parse(data)
                img.get_data(img.width, img.height, force_rgb)
            continue
        _assert_exact(ref_jpeg, data, force_rgb)
        checked += 1
    assert checked >= 19


def test_truncated_stream_error_parity(ref_jpeg):
    """2839.pdf#20 is truncated mid-scan; the reference throws
    'unexpected marker: ffd9' — ours must reject it too, not return
    garbage pixels."""
    bad = [d for n, d in _corpus_streams() if "2839" in n]
    failures = 0
    for data in bad:
        r = ref_jpeg(data, force_rgb=True)
        if r.get("ok"):
            continue
        with pytest.raises(JpegError):
            img = JpegImage()
            img.parse(data)
        failures += 1
    assert failures >= 1


# -------------------------------------------------- synthetic matrix

def _img(h, w, ncomp, seed):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 256, (h, w, ncomp)).astype(np.float64)
    # low-pass so quantized coefficients have realistic runs
    for _ in range(2):
        base[1:] = (base[1:] + base[:-1]) / 2
        base[:, 1:] = (base[:, 1:] + base[:, :-1]) / 2
    return base.astype(np.uint8)


CASES = [
    ("gray8x8", dict(h=8, w=8, n=1)),
    ("gray_odd", dict(h=21, w=13, n=1)),
    ("rgb444", dict(h=24, w=31, n=3)),
    ("rgb420", dict(h=35, w=37, n=3, sampling=[(2, 2), (1, 1), (1, 1)])),
    ("rgb_21", dict(h=18, w=26, n=3, sampling=[(2, 1), (1, 1), (1, 1)])),
    # note: the 2015 reference decoder's restart loop consumes a full
    # interval unconditionally, so the MCU count (3x3 here) must divide
    # evenly by the restart interval for the stream to decode at all
    ("rgb_restart", dict(h=40, w=40, n=3, restart=3,
                         sampling=[(2, 2), (1, 1), (1, 1)])),
    ("gray_q16", dict(h=16, w=16, n=1, q16=True)),
    ("cmyk_adobe2", dict(h=16, w=24, n=4, adobe=2)),
    ("cmyk_adobe0", dict(h=16, w=24, n=4, adobe=0)),
    ("cmyk_noadobe", dict(h=16, w=24, n=4)),
    ("prog_gray", dict(h=24, w=17, n=1, progressive=True)),
    ("prog_rgb", dict(h=29, w=22, n=3, progressive=True)),
    ("prog_rgb420", dict(h=32, w=32, n=3, progressive=True,
                         sampling=[(2, 2), (1, 1), (1, 1)])),
    ("prog_cmyk", dict(h=16, w=16, n=4, adobe=2, progressive=True)),
]


@pytest.mark.parametrize("name,spec", CASES, ids=[c[0] for c in CASES])
@pytest.mark.parametrize("force_rgb", [True, False])
def test_synthetic_matrix_exact(ref_jpeg, name, spec, force_rgb):
    img = _img(spec["h"], spec["w"], spec["n"], seed=hash(name) % 1000)
    enc = JpegEncoder(img, sampling=spec.get("sampling"),
                      quality_16bit=spec.get("q16", False),
                      adobe_transform=spec.get("adobe"),
                      restart_interval=spec.get("restart", 0),
                      progressive=spec.get("progressive", False))
    data = enc.encode()
    _assert_exact(ref_jpeg, data, force_rgb)


def test_decode_transform_exact(ref_jpeg):
    """Inverted-CMYK Decode array -> JpegStream transform pairs applied
    identically (reference :22396-22413 + :1465-1476)."""
    img = _img(16, 16, 4, seed=3)
    data = JpegEncoder(img, adobe_transform=2).encode()
    transform = build_decode_transform([1, 0, 1, 0, 1, 0, 1, 0], 8)
    assert transform == [-256, 255] * 4
    _assert_exact(ref_jpeg, data, True, transform=transform)
    _assert_exact(ref_jpeg, data, False, transform=transform)
    # inverted GRAY (scanned-negative shape), through the gray->RGB
    # expansion as well
    gdata = JpegEncoder(_img(12, 9, 1, seed=4)).encode()
    gtrans = build_decode_transform([1, 0], 8)
    _assert_exact(ref_jpeg, gdata, True, transform=gtrans)
    _assert_exact(ref_jpeg, gdata, False, transform=gtrans)
    # identity Decode arrays must produce NO transform
    assert build_decode_transform([0, 1, 0, 1, 0, 1], 8) is None


def test_scaled_draw_dimensions_exact(ref_jpeg):
    """getData at non-native draw dims exercises the nearest-neighbor
    linearization scaling (reference :1433-1463)."""
    img = _img(24, 24, 3, seed=5)
    data = JpegEncoder(img, sampling=[(2, 2), (1, 1), (1, 1)]).encode()
    _assert_exact(ref_jpeg, data, True, width=37, height=11)
    _assert_exact(ref_jpeg, data, True, width=48, height=48)


# ------------------------------------------------ images.py integration

def test_materialize_non_native_jpeg_decodes_to_png():
    import zlib
    from iesl_pdf_to_text_ray.pdf.images import materialize_image
    from iesl_pdf_to_text_ray.pdf.objects import Stream

    img = _img(16, 16, 4, seed=7)
    data = JpegEncoder(img, adobe_transform=2).encode()
    stm = Stream({"Width": 16, "Height": 16, "Filter": "DCTDecode",
                  "ColorSpace": "DeviceCMYK",
                  "BitsPerComponent": 8}, data)

    class FakeXref:
        def fetch_if_ref(self, o):
            return o
    out = materialize_image(("xobj", stm), FakeXref())
    assert out["mime"] == "image/png"
    # RGB triplets, full geometry
    px, _n = decode_jpeg(data, 16, 16, force_rgb=True)
    assert len(px) == 16 * 16 * 3
    # PNG IDAT decodes back to exactly those pixels
    idat = out["data"]
    pos = idat.find(b"IDAT") - 4
    import struct
    chunks = []
    p = 8
    while p < len(idat):
        ln = struct.unpack(">I", idat[p:p + 4])[0]
        tag = idat[p + 4:p + 8]
        if tag == b"IDAT":
            chunks.append(idat[p + 8:p + 8 + ln])
        p += 12 + ln
    raw = zlib.decompress(b"".join(chunks))
    rows = [raw[y * (16 * 3 + 1) + 1:(y + 1) * (16 * 3 + 1)]
            for y in range(16)]
    assert b"".join(rows) == px


def test_materialize_native_jpeg_stays_passthrough():
    from iesl_pdf_to_text_ray.pdf.images import materialize_image
    from iesl_pdf_to_text_ray.pdf.objects import Stream

    img = _img(16, 16, 3, seed=9)
    data = JpegEncoder(img).encode()
    stm = Stream({"Width": 16, "Height": 16, "Filter": "DCTDecode",
                  "ColorSpace": "DeviceRGB",
                  "BitsPerComponent": 8}, data)

    class FakeXref:
        def fetch_if_ref(self, o):
            return o
    out = materialize_image(("xobj", stm), FakeXref())
    assert out["mime"] == "image/jpeg"
    assert out["data"] == data


def test_materialize_masked_jpeg_composes_rgba():
    """A DCT image with an /SMask leaves the native passthrough path
    (reference :45194 requires !softMask) and materializes as RGBA PNG
    with the smask as its alpha channel."""
    import zlib
    from iesl_pdf_to_text_ray.pdf.images import materialize_image
    from iesl_pdf_to_text_ray.pdf.objects import Stream

    img = _img(8, 8, 3, seed=11)
    data = JpegEncoder(img).encode()
    alpha = bytes(range(0, 64 * 4, 4))[:64]
    smask = Stream({"Width": 8, "Height": 8, "Filter": "FlateDecode",
                    "ColorSpace": "DeviceGray", "BitsPerComponent": 8},
                   zlib.compress(alpha))
    stm = Stream({"Width": 8, "Height": 8, "Filter": "DCTDecode",
                  "ColorSpace": "DeviceRGB", "BitsPerComponent": 8,
                  "SMask": smask}, data)

    class FakeXref:
        def fetch_if_ref(self, o):
            return o
    out = materialize_image(("xobj", stm), FakeXref())
    assert out["mime"] == "image/png"
    # color type 6 (RGBA) in the IHDR, alpha == the smask samples
    import struct
    ihdr = out["data"][16:16 + 13]
    w, h, depth, ctype = struct.unpack(">IIBB", ihdr[:10])
    assert (w, h, depth, ctype) == (8, 8, 8, 6)
    p = 8
    chunks = []
    while p < len(out["data"]):
        ln = struct.unpack(">I", out["data"][p:p + 4])[0]
        if out["data"][p + 4:p + 8] == b"IDAT":
            chunks.append(out["data"][p + 8:p + 8 + ln])
        p += 12 + ln
    raw = zlib.decompress(b"".join(chunks))
    rows = b"".join(raw[y * (8 * 4 + 1) + 1:(y + 1) * (8 * 4 + 1)]
                    for y in range(8))
    assert bytes(rows[3::4]) == alpha


def test_int32_wrap_parity_extreme_coefficients(ref_jpeg):
    """The IDCT's JS ToInt32 wrap emulation: a 16-bit quant table at
    65535 with near-max coefficients overflows int32 inside the
    reference's shift chain (dctSqrt2 * dequant > 2^31); our decode
    must reproduce the wrapped garbage bit-for-bit, not a saner
    unwrapped value."""
    img = np.zeros((8, 8, 1), dtype=np.uint8)
    enc = JpegEncoder(img)
    enc.quant = [np.full((8, 8), 65535, dtype=np.int64)]
    # inject extreme coefficients directly (no uint8 image can quantize
    # to these against a 65535 table)
    coefs = np.zeros((1, 1, 64), dtype=np.int64)
    coefs[0, 0, 0] = 1024           # DC
    coefs[0, 0, 1] = 900            # AC01
    coefs[0, 0, 8] = -900           # AC10
    coefs[0, 0, 27] = 500
    enc.coefs = [coefs]
    data = enc.encode()
    _assert_exact(ref_jpeg, data, False)
    _assert_exact(ref_jpeg, data, True)
