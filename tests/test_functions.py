"""PDF function engine (pdf/functions.py).

Cross-validated against the reference's PDFFunction +
PostScriptEvaluator (pdf.combined.js:39410, :31557) through node on
random functions of every type, plus an end-to-end Separation-image
PDF."""

from __future__ import annotations

import base64
import json
import os
import random
import shutil
import struct
import subprocess
import zlib

import pytest

from iesl_pdf_to_text_ray.pdf import functions as F
from iesl_pdf_to_text_ray.pdf.objects import Stream

_REF_BUNDLE = "/root/reference/src/main/js/pdf.combined.js"


def _decode_stream(stm, _xref):
    return stm.raw


def _mkstream(d: dict, payload: bytes) -> Stream:
    return Stream(d, payload)


# ------------------------------------------------------------ unit level

def test_type2_exponential():
    fn = F.parse_function({"FunctionType": 2, "C0": [0.0, 1.0],
                           "C1": [1.0, 0.0], "N": 2.0},
                          lambda v: v, _decode_stream)
    assert fn([0.0]) == [0.0, 1.0]
    assert fn([1.0]) == [1.0, 0.0]
    assert fn([0.5]) == [0.25, 0.75]


def test_type3_stitching():
    sub0 = {"FunctionType": 2, "C0": [0.0], "C1": [1.0], "N": 1.0}
    sub1 = {"FunctionType": 2, "C0": [1.0], "C1": [0.0], "N": 1.0}
    fn = F.parse_function({"FunctionType": 3, "Domain": [0, 1],
                           "Functions": [sub0, sub1], "Bounds": [0.5],
                           "Encode": [0, 1, 0, 1]},
                          lambda v: v, _decode_stream)
    assert fn([0.25]) == [0.5]
    assert fn([0.75]) == [0.5]
    assert fn([1.0]) == [0.0]    # second segment at its right edge


def test_type4_postscript_ops():
    code = b"{ 2 mul 1 exch sub dup 0.5 gt { 0.5 sub } { pop 0 } ifelse }"
    fn = F.parse_function(
        _mkstream({"FunctionType": 4, "Domain": [0, 1], "Range": [0, 1]},
                  code), lambda v: v, _decode_stream)
    # x=0 -> 1-0=1 > .5 -> .5 ; x=0.4 -> 1-0.8=0.2 -> 0
    assert fn([0.0]) == [0.5]
    assert fn([0.4])[0] == pytest.approx(0.0)


def test_type0_sampled_bilinear():
    # 2x2 grid, 8 bps, one output: corners 0, 255, 255, 0
    samples = bytes([0, 255, 255, 0])
    fn = F.parse_function(
        _mkstream({"FunctionType": 0, "Domain": [0, 1, 0, 1],
                   "Range": [0, 1], "Size": [2, 2], "BitsPerSample": 8},
                  samples), lambda v: v, _decode_stream)
    assert fn([0.0, 0.0])[0] == pytest.approx(0.0)
    assert fn([1.0, 0.0])[0] == pytest.approx(1.0)
    assert fn([0.5, 0.5])[0] == pytest.approx(0.5)


# ---------------------------------------------- cross-validation via node

_HARNESS_PRELUDE = [
    "function warn(m){}",
    "function error(m){throw new Error(m);}",
    "var info = warn;",
    "var EOF = {};",
    "function isBool(v){return typeof v === 'boolean';}",
    "function isArray(v){return Array.isArray(v);}",
    "function isDict(v){return v && v.__dict;}",
    "function isStream(v){return v && v.getBytes;}",
    "var Lexer = {isSpace: function(ch){return ch === 0x20 ||"
    " ch === 0x0D || ch === 0x0A || ch === 0x09;}};",
    "function PostScriptCompiler(){"
    "this.compile = function(){return null;};}",
]

_HARNESS_MAIN = r"""
function mkFn(spec) {
  var dict = {__dict: true, get: function (n) {
    var v = spec.dict[n];
    if (v && v.__fn) { return mkFn(v); }
    if (Array.isArray(v)) {
      return v.map(function (e) {
        return (e && e.__fn) ? mkFn(e) : e;
      });
    }
    return v;
  }, has: function (n) { return n in spec.dict; }};
  if (spec.b64 !== undefined) {
    var bytes = new Uint8Array(Buffer.from(spec.b64, 'base64'));
    var pos = 0;
    return {dict: dict,
            getBytes: function (n) {
              return bytes.subarray(0, n === undefined ? bytes.length
                                                       : Math.min(n, bytes.length)); },
            getByte: function () {
              return pos < bytes.length ? bytes[pos++] : -1; }};
  }
  return dict;
}
var chunks = [];
process.stdin.on('data', function (c) { chunks.push(c); });
process.stdin.on('end', function () {
  var req = JSON.parse(Buffer.concat(chunks).toString('utf8'));
  try {
    var xref = {fetchIfRef: function (v) { return v; }};
    var fn = PDFFunction.parse(xref, mkFn(req.fn));
    var outs = [];
    req.inputs.forEach(function (src) {
      var dest = new Float32Array(req.nOut);
      fn(new Float32Array(src), 0, dest, 0);
      outs.push(Array.prototype.slice.call(dest));
    });
    process.stdout.write(JSON.stringify({ok: true, outs: outs}));
  } catch (e) {
    process.stdout.write(JSON.stringify({ok: false, err: String(e),
                                         stack: String(e.stack)}));
  }
});
"""


@pytest.fixture(scope="module")
def ref_fn(tmp_path_factory):
    if shutil.which("node") is None or not os.path.exists(_REF_BUNDLE):
        pytest.skip("node or reference bundle unavailable")
    d = tmp_path_factory.mktemp("fnref")
    lines = open(_REF_BUNDLE, encoding="utf-8").read().split("\n")

    def closure(start_marker):
        a = next(i for i, l in enumerate(lines) if l.startswith(start_marker))
        b = next(i for i in range(a, len(lines)) if lines[i] == "})();")
        return "\n".join(lines[a:b + 1])

    module = "\n".join(
        _HARNESS_PRELUDE + [
            closure("var PostScriptParser = (function PostScriptParser"),
            closure("var PostScriptToken = (function PostScriptToken"),
            closure("var PostScriptLexer = (function PostScriptLexer"),
            "var PostScriptTokenTypes = {LBRACE: 0, RBRACE: 1, NUMBER: 2,"
            " OPERATOR: 3, IF: 4, IFELSE: 5};",
            closure("var PostScriptStack = (function PostScriptStack"),
            closure("var PostScriptEvaluator = (function PostScriptEval"),
            closure("var PDFFunction = (function PDFFunctionClosure()"),
            _HARNESS_MAIN])
    # PostScriptTokenTypes must precede its users
    module = module.replace(
        closure("var PostScriptParser = (function PostScriptParser"),
        "var PostScriptTokenTypes = {LBRACE: 0, RBRACE: 1, NUMBER: 2,"
        " OPERATOR: 3, IF: 4, IFELSE: 5};\n" +
        closure("var PostScriptParser = (function PostScriptParser"), 1)
    (d / "fn_ref.js").write_text(module)

    def run(fn_spec, inputs, n_out):
        req = {"fn": fn_spec, "inputs": inputs, "nOut": n_out}
        p = subprocess.run(["node", str(d / "fn_ref.js")],
                           input=json.dumps(req).encode(),
                           capture_output=True, timeout=60)
        r = json.loads(p.stdout)
        assert r["ok"], r.get("err", "") + (r.get("stack", "") or "")[:400]
        return r["outs"]

    return run


def _f32(vals):
    return [struct.unpack("f", struct.pack("f", v))[0] for v in vals]


def _f32v(v):
    """Round to a float32-representable value: the reference evaluates
    through Float32Array inputs, so boundary comparisons only agree when
    both sides see the same rounded input."""
    return struct.unpack("f", struct.pack("f", v))[0]


def test_type2_vs_reference(ref_fn):
    rng = random.Random(1)
    for _ in range(5):
        k = rng.randint(1, 4)
        spec = {"dict": {"FunctionType": 2,
                         "C0": [round(rng.uniform(-1, 1), 3)
                                for _ in range(k)],
                         "C1": [round(rng.uniform(-1, 2), 3)
                                for _ in range(k)],
                         "N": float(rng.choice([1, 2, 3]))}}
        fn = F.parse_function(spec["dict"], lambda v: v, _decode_stream)
        inputs = [[_f32v(round(rng.random(), 4))] for _ in range(10)]
        ref = ref_fn(spec, inputs, k)
        for src, r in zip(inputs, ref):
            assert _f32(fn(src)) == pytest.approx(r, abs=1e-6)


def test_type0_vs_reference(ref_fn):
    rng = random.Random(2)
    for _ in range(4):
        m = rng.randint(1, 2)
        n = rng.randint(1, 3)
        size = [rng.randint(2, 5) for _ in range(m)]
        total = n
        for s in size:
            total *= s
        samples = bytes(rng.randrange(256) for _ in range(total))
        dct = {"FunctionType": 0, "Domain": [0, 1] * m,
               "Range": [0, 1] * n, "Size": size, "BitsPerSample": 8}
        fn = F.parse_function(_mkstream(dct, samples),
                              lambda v: v, _decode_stream)
        spec = {"dict": dct, "b64": base64.b64encode(samples).decode()}
        inputs = [[_f32v(round(rng.random(), 4)) for _ in range(m)]
                  for _ in range(10)]
        ref = ref_fn(spec, inputs, n)
        for src, r in zip(inputs, ref):
            assert _f32(fn(src)) == pytest.approx(r, abs=1e-6)


def test_type3_vs_reference(ref_fn):
    rng = random.Random(3)
    subs = [{"__fn": True,
             "dict": {"FunctionType": 2, "C0": [0.1 * i], "C1": [1.0 - 0.1 * i],
                      "N": 1.0}} for i in range(3)]
    dct = {"FunctionType": 3, "Domain": [0, 1],
           "Functions": subs, "Bounds": [0.3, 0.7],
           "Encode": [0, 1, 1, 0, 0, 1]}
    py_subs = [{"FunctionType": 2, "C0": [0.1 * i], "C1": [1.0 - 0.1 * i],
                "N": 1.0} for i in range(3)]
    fn = F.parse_function({**dct, "Functions": py_subs},
                          lambda v: v, _decode_stream)
    inputs = [[_f32v(round(rng.random(), 4))] for _ in range(20)] + \
        [[0.0], [_f32v(0.3)], [_f32v(0.7)], [1.0]]
    ref = ref_fn({"dict": dct}, inputs, 1)
    for src, r in zip(inputs, ref):
        assert _f32(fn(src)) == pytest.approx(r, abs=1e-6)


def test_type4_vs_reference(ref_fn):
    rng = random.Random(4)
    programs = [
        b"{ dup 0.5 gt { 1 exch sub } if 2 mul }",
        b"{ dup mul 1 exch sub sqrt }",
        b"{ 2 copy add 3 1 roll sub abs exch pop }",
        b"{ dup sin exch cos add 2 div abs }",
        b"{ 10 mul truncate 10 div 0.05 add }",
        b"{ dup 0.3 lt { pop 0 } { dup 0.6 lt { 0.5 mul } "
        b"{ 1 exch sub } ifelse } ifelse }",
    ]
    for prog in programs:
        n_in = 2 if b"copy" in prog or prog.count(b"exch") > 1 else 1
        n_in = 2 if b"2 copy" in prog else 1
        dct = {"FunctionType": 4, "Domain": [0, 1] * n_in,
               "Range": [0, 1]}
        fn = F.parse_function(_mkstream(dct, prog),
                              lambda v: v, _decode_stream)
        spec = {"dict": dct, "b64": base64.b64encode(prog).decode()}
        inputs = [[_f32v(round(rng.random(), 4)) for _ in range(n_in)]
                  for _ in range(15)]
        ref = ref_fn(spec, inputs, 1)
        for src, r in zip(inputs, ref):
            assert _f32(fn(src)) == pytest.approx(r, abs=1e-6), prog


# ------------------------------------------- end-to-end Separation image

def test_separation_image_materializes(tmp_path):
    from iesl_pdf_to_text_ray.pdf.extractor import extract_media
    # tint: t -> (0.2+0.8t, 0.1, 1-t) in DeviceRGB via type-4 function
    prog = (b"{ dup 0.8 mul 0.2 add exch 1 exch sub 0.1 exch }")
    samples = bytes([0, 64, 128, 192, 255, 32, 96, 160])
    payload = zlib.compress(samples)
    content = b"q 4 0 0 2 0 0 cm /Im1 Do Q"
    objects = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 100 100] "
            b"/Resources << /XObject << /Im1 5 0 R >> >> /Contents 4 0 R >>"),
        4: b"<< /Length %d >>\nstream\n" % len(content) + content
           + b"\nendstream",
        5: (b"<< /Type /XObject /Subtype /Image /Width 4 /Height 2 "
            b"/ColorSpace [/Separation /Spot /DeviceRGB 6 0 R] "
            b"/BitsPerComponent 8 /Filter /FlateDecode "
            b"/Length %d >>\nstream\n" % len(payload) + payload
            + b"\nendstream"),
        6: (b"<< /FunctionType 4 /Domain [0 1] /Range [0 1 0 1 0 1] "
            b"/Length %d >>\nstream\n" % len(prog) + prog + b"\nendstream"),
    }
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(objects[num])
        out.extend(b"\nendobj\n")
    xref_off = len(out)
    out.extend(b"xref\n0 7\n0000000000 65535 f \n")
    for num in range(1, 7):
        out.extend(b"%010d 00000 n \n" % offsets[num])
    out.extend(b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n"
               b"%d\n%%%%EOF\n" % xref_off)
    media = extract_media(bytes(out))
    assert len(media) == 1
    m = media[0]
    assert m["mime"] == "image/png", m
    # decode PNG and compare against the tint math
    png = m["data"]
    pos = 8
    idat = b""
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos:pos + 4])
        tag = png[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat += png[pos + 8:pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    pixels = b"".join(raw[y * 13 + 1:(y + 1) * 13] for y in range(2))
    expect = bytearray()
    fn = F.parse_function(
        _mkstream({"FunctionType": 4, "Domain": [0, 1],
                   "Range": [0, 1, 0, 1, 0, 1]}, prog),
        lambda v: v, _decode_stream)
    for v in samples:
        # same f32 input rounding the materializer applies
        for t in fn([_f32v(v / 255.0)]):
            expect.append(int(t * 255.0) & 0xFF)
    assert pixels == bytes(expect)
