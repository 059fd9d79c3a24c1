"""Unit tests for the span-emission contract (FIXTURES.md §4 edge cases)."""

from __future__ import annotations

from iesl_pdf_to_text_ray.functions.span_builder import SpanBuilder


def emit(builder):
    return builder.collect()


def fresh(fs=10.0):
    b = SpanBuilder()
    b.begin_text()
    b.set_font(fs, 0.001)
    return b


def texts(b):
    return [s[1] for s in b.collect() if s[0] == "text"]


def test_tj_gap_inserts_space():
    b = fresh()
    # gap 0.2 em >= 0.15 em -> space
    b.show_text([("a", 500.0), -200.0, ("b", 500.0)])
    assert texts(b) == ["a b"]


def test_tj_gap_below_threshold_no_space():
    b = fresh()
    b.show_text([("a", 500.0), -112.0, ("b", 500.0)])
    assert texts(b) == ["ab"]


def test_negative_charspacing_compensation():
    # "Table 1" pattern: letter gaps ~180/1000 em with charSpacing
    # -0.1974*fontSize must NOT produce spaces
    b = fresh()
    b.set_char_spacing(-1.974)  # fontSize 10
    b.show_text([("T", 611.0), -180.0, ("a", 500.0), -190.0, ("b", 500.0)])
    assert texts(b) == ["Tab"]
    # but a large gap still qualifies: 0.43 em + (-0.1974) >= 0.15
    b2 = fresh()
    b2.set_char_spacing(-1.974)
    b2.show_text([("T", 611.0), -430.0, ("a", 500.0)])
    assert texts(b2) == ["T a"]


def test_positive_charspacing_not_added():
    b = fresh()
    b.set_char_spacing(3.8)
    b.show_text([("a", 500.0), -100.0, ("b", 500.0)])
    assert texts(b) == ["ab"]


def test_run_start_leading_space():
    b = fresh()
    b.show_text([("a", 500.0)])        # ends at x = 5.0
    b.move_text(7.0, 0.0)              # jump right by 2.0 = 0.2 em
    b.show_text([("b", 500.0)])
    assert texts(b) == ["a", " b"]


def test_run_start_new_line_no_space():
    b = fresh()
    b.show_text([("a", 500.0), ("b", 500.0)])
    b.move_text(-10.0, -12.0)          # new line starts left of previous end
    b.show_text([("c", 500.0)])
    assert texts(b) == ["ab", "c"]


def test_first_run_of_page_never_leading_space():
    b = fresh()
    b.move_text(100.0, 0.0)
    b.show_text([("a", 500.0)])
    assert texts(b) == ["a"]


def test_new_span_triggers():
    b = fresh()
    b.show_text([("a", 500.0)])
    b.set_font(10.0, 0.001)            # Tf -> new span
    b.show_text([("b", 500.0)])
    b.set_fill_rgb()                   # rg -> new span
    b.show_text([("c", 500.0)])
    b.set_text_matrix(1, 0, 0, 1, 0, 0)  # Tm -> new span+frame
    b.show_text([("d", 500.0)])
    assert texts(b) == ["a", "b", "c", "d"]


def test_save_restore_shares_tspan():
    b = fresh()
    b.show_text([("a", 500.0)])
    b.save()
    b.show_text([("b", 500.0)])        # same shared tspan
    b.restore()
    b.show_text([("c", 500.0)])
    assert texts(b) == ["abc"]


def test_control_char_drops_whole_span():
    b = fresh()
    b.show_text([("a", 500.0), ("\x01", 500.0), ("b", 500.0)])
    assert texts(b) == []


def test_control_only_run_dropped():
    b = fresh()
    b.show_text([("\x01", 500.0), ("\x02", 500.0)])
    assert texts(b) == []


def test_word_break_null_consumes_wordspacing():
    b = fresh()
    b.set_word_spacing(2.0)
    b.show_text([("a", 500.0), None, ("b", 500.0)])
    assert texts(b) == ["ab"]  # no char for the break


def test_showspacedtext_flattening():
    b = fresh()
    b.show_text([("a", 500.0), -250.0, ("b", 500.0), -99.0, ("c", 500.0)])
    assert texts(b) == ["a bc"]


def test_media_interleaving_positions():
    b = fresh()
    b.show_text([("a", 500.0)])
    b.end_text()
    b.paint_jpeg("img_p1_1")
    b.begin_text()
    b.set_font(10.0, 0.001)
    b.show_text([("b", 500.0)])
    b.end_text()
    spans = b.collect()
    assert [(s[0], s[1] or s[2]) for s in spans] == [
        ("text", "a"), ("media", "img_p1_1"), ("text", "b")]


def test_fontsize_zero_emits_nothing():
    b = fresh(fs=0.0)
    b.show_text([("a", 500.0)])
    assert texts(b) == []


def test_multichar_chunk_x_alignment():
    """Multi-char toUnicode chunks (ligatures like "ffi") get ONE x entry
    for the whole chunk, so len(xs) < len(text); -1 sentinels still mark
    exactly the inserted word spaces when walked chunk-wise (the case the
    golden corpus' len(xs)==len(text) fast path never exercises)."""
    b = fresh()
    b.show_text([("a", 500.0), -200.0, ("ffi", 1500.0), -200.0, ("b", 500.0)])
    (kind, text, _ref, xs, y, _mat), = b.collect()
    assert kind == "text" and text == "a ffi b"
    # chunks: "a", inserted-space, "ffi", inserted-space, "b"
    assert len(xs) == 5 < len(text)
    assert [i for i, v in enumerate(xs) if v == -1.0] == [1, 3]
    # walk chunk-wise: sentinel chunks are the spaces, multi-char chunk
    # consumes its full unicode with a single coordinate
    chunks = ["a", " ", "ffi", " ", "b"]
    assert "".join(chunks) == text
    for c, x in zip(chunks, xs):
        assert (x == -1.0) == (c == " ")
    # real coordinates advance monotonically (a@0, ffi@7, b@24)
    assert xs[0] == 0.0 and xs[2] == 7.0 and xs[4] == 24.0


def test_multichar_chunk_internal_space_no_sentinel():
    """A space INSIDE a chunk's unicode (e.g. toUnicode "a b") is glyph
    content, not an inserted word space — no -1 sentinel appears."""
    b = fresh()
    b.show_text([("x y", 1000.0), -200.0, ("z", 500.0)])
    (_k, text, _ref, xs, _y, _mat), = b.collect()
    assert text == "x y z"
    # chunks: "x y", inserted-space, "z" -> one sentinel only
    assert len(xs) == 3
    assert [i for i, v in enumerate(xs) if v == -1.0] == [1]


def test_empty_run_does_not_move_pen_reference():
    b = fresh()
    b.show_text([("a", 500.0)])        # ends at 5.0
    b.set_text_matrix(1, 0, 0, 1, 50, 0)
    b.show_text([])                    # empty: must not reset last_end_x
    b.move_text(7.0, 0.0)
    b.show_text([("b", 500.0)])        # 7.0 - 5.0 = 2.0 >= 1.5 -> space
    assert texts(b) == ["a", " b"]
