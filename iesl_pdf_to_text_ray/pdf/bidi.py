"""Bidirectional text reordering for getTextContent (UAX #9 subset).

Reproduces the reference's PDFJS.bidi (pdf.combined.js:1695-2096): the
implicit-levels portion of the Unicode bidi algorithm — W1-W7, N1-N2,
I1-I2, L2 — with no explicit embeddings (X rules skipped; single-line
text), over the bundle's snapshot of the Unicode character classes
(pdf/data/bidi_types.json, see tools/gen_bidi_data.py).

Reference quirks reproduced deliberately (cross-validated char-for-char
against the JS in tests/test_bidi.py):

* the "30% RTL" auto-detection ratio is inverted in the reference
  (``strLength / numBidi < 0.3`` can never hold since numBidi <=
  strLength), so any string containing an R/AL/AN character resolves RTL
  when start_level is auto (-1);
* W5's scan *after* a European number decrements its index (``--j`` for
  ``++j``), so only the single ET immediately following an EN converts;
* '<' and '>' are dropped from reordered output (the reference strips
  them for its HTML text layer).
"""

from __future__ import annotations

import json
import os

_DATA = json.load(open(os.path.join(os.path.dirname(__file__), "data",
                                    "bidi_types.json")))
_BASE_TYPES = _DATA["base"]
_ARABIC_TYPES = _DATA["arabic"]


def _char_type(code: int) -> str:
    if code <= 0xFF:
        return _BASE_TYPES[code]
    if 0x0590 <= code <= 0x05F4:
        return "R"
    if 0x0600 <= code <= 0x06FF:
        return _ARABIC_TYPES[code & 0xFF]
    if 0x0700 <= code <= 0x08AC:
        return "AL"
    return "L"


def bidi(s: str, start_level: int = -1,
         vertical: bool = False) -> tuple[str, str]:
    """-> (display-ordered string, direction 'ltr'|'rtl'|'ttb')."""
    n = len(s)
    if n == 0 or vertical:
        return s, ("ttb" if vertical else "ltr")

    chars = list(s)
    types = []
    num_bidi = 0
    for ch in s:
        t = _char_type(ord(ch))
        if t in ("R", "AL", "AN"):
            num_bidi += 1
        types.append(t)

    if num_bidi == 0:
        return s, "ltr"

    # reference quirk: isLTR only flips in the auto-detect branch, so an
    # explicit start_level always reports 'ltr' (pdf.combined.js:1794)
    is_ltr = True
    if start_level == -1:
        # reference's inverted ratio: never < 0.3, so always RTL here
        if (n / num_bidi) < 0.3:
            is_ltr, start_level = True, 0
        else:
            is_ltr, start_level = False, 1

    levels = [start_level] * n
    e = "R" if (start_level & 1) else "L"
    sor = eor = e

    # W1: non-spacing marks take the type of the previous character
    last = sor
    for i in range(n):
        if types[i] == "NSM":
            types[i] = last
        else:
            last = types[i]

    # W2: EN after an AL (nearest strong) becomes AN
    last = sor
    for i in range(n):
        t = types[i]
        if t == "EN":
            types[i] = "AN" if last == "AL" else "EN"
        elif t in ("R", "L", "AL"):
            last = t

    # W3: AL -> R
    for i in range(n):
        if types[i] == "AL":
            types[i] = "R"

    # W4: single separators between equal-typed numbers join them
    for i in range(1, n - 1):
        if types[i] == "ES" and types[i - 1] == "EN" \
                and types[i + 1] == "EN":
            types[i] = "EN"
        if types[i] == "CS" and types[i - 1] in ("EN", "AN") \
                and types[i + 1] == types[i - 1]:
            types[i] = types[i - 1]

    # W5: ET sequences adjacent to EN become EN.  The reference's
    # forward scan decrements (pdf.combined.js:1920 `--j`), so only the
    # one ET directly after the EN converts; the backward scan is full.
    for i in range(n):
        if types[i] == "EN":
            j = i - 1
            while j >= 0 and types[j] == "ET":
                types[j] = "EN"
                j -= 1
            if i + 1 < n and types[i + 1] == "ET":
                types[i + 1] = "EN"

    # W6: remaining separators/terminators -> ON
    for i in range(n):
        if types[i] in ("WS", "ES", "ET", "CS"):
            types[i] = "ON"

    # W7: EN with nearest strong L becomes L
    last = sor
    for i in range(n):
        t = types[i]
        if t == "EN":
            types[i] = "L" if last == "L" else "EN"
        elif t in ("R", "L"):
            last = t

    # N1: neutrals between same-direction strong text take that direction
    # (numbers count as R)
    i = 0
    while i < n:
        if types[i] == "ON":
            end = i + 1
            while end < n and types[end] == "ON":
                end += 1
            before = types[i - 1] if i > 0 else sor
            # reference looks at end+1 (one past the run), falling back
            # to eor when that is out of range (pdf.combined.js:1965-1974)
            after = types[end + 1] if end + 1 < n else eor
            if before != "L":
                before = "R"
            if after != "L":
                after = "R"
            if before == after:
                for j in range(i, end):
                    types[j] = before
            i = end - 1
        i += 1

    # N2: remaining neutrals take the embedding direction
    for i in range(n):
        if types[i] == "ON":
            types[i] = e

    # I1/I2: resolve implicit levels
    for i in range(n):
        t = types[i]
        if not (levels[i] & 1):
            if t == "R":
                levels[i] += 1
            elif t in ("AN", "EN"):
                levels[i] += 2
        else:
            if t in ("L", "AN", "EN"):
                levels[i] += 1

    # L2: reverse contiguous runs from the highest level down to the
    # lowest odd level
    highest = max(levels)
    lowest_odd = min((l for l in levels if l & 1), default=99)
    for level in range(highest, lowest_odd - 1, -1):
        start = -1
        for i in range(n):
            if levels[i] < level:
                if start >= 0:
                    chars[start:i] = chars[start:i][::-1]
                    start = -1
            elif start < 0:
                start = i
        if start >= 0:
            chars[start:n] = chars[start:n][::-1]

    # reference strips angle brackets from reordered output
    out = "".join(c for c in chars if c not in ("<", ">"))
    return out, ("ltr" if is_ltr else "rtl")
