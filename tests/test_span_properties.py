"""Property-based tests: random op streams -> span invariants."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from iesl_pdf_to_text_ray.functions.span_builder import SpanBuilder

glyph = st.tuples(
    st.text(alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E),
            min_size=1, max_size=1),
    st.floats(min_value=100, max_value=900))
item = st.one_of(glyph, st.floats(min_value=-600, max_value=600),
                 st.none())

op = st.one_of(
    st.tuples(st.just("show"), st.lists(item, max_size=8)),
    st.tuples(st.just("td"), st.floats(-50, 50), st.floats(-20, 20)),
    st.tuples(st.just("tm")),
    st.tuples(st.just("tf"), st.floats(1, 24)),
    st.tuples(st.just("rg")),
    st.tuples(st.just("save")),
    st.tuples(st.just("restore")),
    st.tuples(st.just("bt")),
    st.tuples(st.just("et")),
    st.tuples(st.just("tc"), st.floats(-2, 2)),
)


def run_ops(ops):
    b = SpanBuilder()
    b.begin_text()
    b.set_font(10.0, 0.001)
    for o in ops:
        kind = o[0]
        if kind == "show":
            b.show_text(o[1])
        elif kind == "td":
            b.move_text(o[1], o[2])
        elif kind == "tm":
            b.set_text_matrix(1, 0, 0, 1, 0, 0)
        elif kind == "tf":
            b.set_font(o[1], 0.001)
        elif kind == "rg":
            b.set_fill_rgb()
        elif kind == "save":
            b.save()
        elif kind == "restore":
            b.restore()
        elif kind == "bt":
            b.begin_text()
        elif kind == "et":
            b.end_text()
        elif kind == "tc":
            b.set_char_spacing(o[1])
    return b


@settings(max_examples=200, deadline=None)
@given(st.lists(op, max_size=40))
def test_collect_invariants(ops):
    b = run_ops(ops)
    spans = b.collect()
    shown = "".join(g[0] for o in ops if o[0] == "show"
                    for g in o[1] if isinstance(g, tuple))
    collected = "".join(s[1] for s in spans if s[0] == "text")
    # invariant 1: no control chars, no empty/whitespace-only spans;
    # inserted-space sentinels (-1) line up with space chunks in x
    for kind, text, media_ref, xs, y, mat in spans:
        assert kind == "text"
        assert text and not text.isspace()
        assert min(text) >= "\x20"
        assert len(xs) >= 1 and y is not None
        for coord in xs:
            assert coord == -1.0 or coord >= -1e9
    # invariant 2: collected glyphs (ignoring inserted/real spaces) are a
    # subsequence of the shown glyph stream characters.  With save/restore
    # in play the reference's DOM *move* semantics can legitimately reorder
    # whole text elements (an empty show after restore re-appends the
    # pre-save text element at the tail), so only multiset containment
    # holds there.
    from collections import Counter
    stripped = collected.replace(" ", "")
    if any(o[0] in ("save", "restore") for o in ops):
        assert not Counter(stripped) - Counter(shown)
    else:
        it = iter(shown)
        for ch in stripped:
            for s in it:
                if s == ch:
                    break
            else:
                raise AssertionError(f"{ch!r} not in shown stream order")
    # invariant 3: collect() is idempotent
    assert b.collect() == spans


@settings(max_examples=100, deadline=None)
@given(st.lists(op, max_size=30))
def test_builder_never_raises(ops):
    run_ops(ops)
