"""Numeric validation of positional output against the reference bundle.

The fixture trace logs, for every showText the reference's SVGGraphics
executed on 1301.4293.pdf, the glyph stream AND the bundle's own computed
per-glyph x coordinates (pdf.combined.js:20339 pushes
``current.x + x * textHScale``) plus the post-run text-space y.  Replaying
the same glyph stream through our SpanBuilder must reproduce every
coordinate bit-for-bit — the -1 sentinels for inserted spaces are ours
alone (the unpatched bundle inserts none) and are excluded.
"""

from __future__ import annotations

import gzip
import json
import os

from iesl_pdf_to_text_ray.functions import span_builder as sb
from tools.trace_replay import replay_trace

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "1301.4293.x.jsonl.gz")


def test_glyph_x_positions_match_reference(tmp_path):
    events = [json.loads(l) for l in
              gzip.open(FIXTURE, "rt", encoding="utf-8")]
    ref_xs = []
    for e in events:
        if e["e"] != "showText":
            continue
        n = sum(1 for g in e["g"] if isinstance(g, dict))
        if n:
            ref_xs.extend(e["xc"][-n:])

    mine_xs = []
    orig = sb.SpanBuilder.show_text

    def patched(self, items):
        t0 = self.current.tspan
        before = len(t0.x_coords) if t0 is not None else 0
        orig(self, items)
        t1 = self.current.tspan
        new = (t1.x_coords[before:] if t1 is t0
               else (t1.x_coords if t1 is not None else []))
        mine_xs.extend(v for v in new if v != -1.0)

    plain = tmp_path / "trace.jsonl"
    with gzip.open(FIXTURE, "rb") as f:
        plain.write_bytes(f.read())
    sb.SpanBuilder.show_text = patched
    try:
        replay_trace(str(plain))
    finally:
        sb.SpanBuilder.show_text = orig

    assert len(mine_xs) == len(ref_xs) == 10618
    bad = [i for i, (a, b) in enumerate(zip(ref_xs, mine_xs))
           if abs(a - b) > 1e-9]
    assert not bad, f"{len(bad)} coordinate mismatches, first {bad[:5]}"
