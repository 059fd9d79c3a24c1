"""PDF tokenizer.

Produces the token stream for both the object layer and content streams.
Behavioral reference: pdf.js Lexer (/root/reference/src/main/js/
pdf.combined.js:27836-28329); implementation is an independent Python design.
"""

from __future__ import annotations

from .objects import Name

WHITESPACE = b"\x00\t\n\x0c\r "
DELIMITERS = b"()<>[]{}/%"

_IS_REGULAR = bytearray(1 for _ in range(256))
for _b in WHITESPACE + DELIMITERS:
    _IS_REGULAR[_b] = 0


EOF = object()


class Lexer:
    __slots__ = ("data", "pos", "end", "tok_start")

    def __init__(self, data: bytes, pos: int = 0, end: int | None = None):
        self.data = data
        self.pos = pos
        self.end = len(data) if end is None else end
        self.tok_start = pos

    def _skip_ws(self) -> None:
        data, pos, end = self.data, self.pos, self.end
        while pos < end:
            b = data[pos]
            if b in (0x00, 0x09, 0x0A, 0x0C, 0x0D, 0x20):
                pos += 1
            elif b == 0x25:  # '%' comment
                while pos < end and data[pos] not in (0x0A, 0x0D):
                    pos += 1
            else:
                break
        self.pos = pos

    def next_token(self):
        """Return next token: int | float | bytes (string) | Name | bytes
        keyword (as str) | one of '[',']','<<','>>','{','}' | EOF."""
        self._skip_ws()
        data, pos, end = self.data, self.pos, self.end
        self.tok_start = pos
        if pos >= end:
            return EOF
        b = data[pos]
        # number
        if 0x30 <= b <= 0x39 or b in (0x2B, 0x2D, 0x2E):  # digit + - .
            return self._read_number()
        if b == 0x2F:  # /
            return self._read_name()
        if b == 0x28:  # (
            return self._read_string()
        if b == 0x3C:  # <
            if pos + 1 < end and data[pos + 1] == 0x3C:
                self.pos = pos + 2
                return "<<"
            return self._read_hex_string()
        if b == 0x3E:  # >
            if pos + 1 < end and data[pos + 1] == 0x3E:
                self.pos = pos + 2
                return ">>"
            self.pos = pos + 1
            return ">"
        if b in (0x5B, 0x5D, 0x7B, 0x7D):  # [ ] { }
            self.pos = pos + 1
            return chr(b)
        if b == 0x29:  # stray ')'
            self.pos = pos + 1
            return ")"
        # keyword / command
        start = pos
        while pos < end and _IS_REGULAR[data[pos]]:
            pos += 1
        if pos == start:  # unclassifiable byte; skip it
            self.pos = pos + 1
            return self.next_token()
        self.pos = pos
        return data[start:pos].decode("latin1")

    def _read_number(self):
        data, pos, end = self.data, self.pos, self.end
        start = pos
        if data[pos] in (0x2B, 0x2D):
            pos += 1
        is_float = False
        while pos < end:
            b = data[pos]
            if 0x30 <= b <= 0x39:
                pos += 1
            elif b == 0x2E:
                is_float = True
                pos += 1
            elif b in (0x2D, 0x2B):  # buggy writers: embedded sign; stop
                pos += 1
            elif b in (0x45, 0x65):  # exponent (rare, invalid per spec)
                is_float = True
                pos += 1
            else:
                break
        self.pos = pos
        text = data[start:pos].decode("latin1")
        try:
            return float(text) if is_float else int(text)
        except ValueError:
            # salvage leading numeric prefix
            import re
            m = re.match(r"[+-]?\d*\.?\d*", text)
            t = m.group(0) if m else "0"
            if not t or t in "+-.":
                return 0
            return float(t) if ("." in t) else int(t)

    def _read_name(self) -> Name:
        data, pos, end = self.data, self.pos + 1, self.end
        out = bytearray()
        while pos < end and _IS_REGULAR[data[pos]]:
            b = data[pos]
            if b == 0x23 and pos + 2 < end:  # #xx hex escape
                try:
                    out.append(int(data[pos + 1:pos + 3], 16))
                    pos += 3
                    continue
                except ValueError:
                    pass
            out.append(b)
            pos += 1
        self.pos = pos
        return Name(out.decode("latin1"))

    def _read_string(self) -> bytes:
        data, pos, end = self.data, self.pos + 1, self.end
        out = bytearray()
        depth = 1
        while pos < end:
            b = data[pos]
            if b == 0x5C:  # backslash
                pos += 1
                if pos >= end:
                    break
                c = data[pos]
                if c == 0x6E:
                    out.append(0x0A)
                elif c == 0x72:
                    out.append(0x0D)
                elif c == 0x74:
                    out.append(0x09)
                elif c == 0x62:
                    out.append(0x08)
                elif c == 0x66:
                    out.append(0x0C)
                elif 0x30 <= c <= 0x37:  # octal, up to 3 digits
                    val = c - 0x30
                    for _ in range(2):
                        if pos + 1 < end and 0x30 <= data[pos + 1] <= 0x37:
                            pos += 1
                            val = val * 8 + (data[pos] - 0x30)
                        else:
                            break
                    out.append(val & 0xFF)
                elif c == 0x0A:
                    pass  # line continuation
                elif c == 0x0D:
                    if pos + 1 < end and data[pos + 1] == 0x0A:
                        pos += 1
                else:
                    out.append(c)
                pos += 1
                continue
            if b == 0x28:
                depth += 1
            elif b == 0x29:
                depth -= 1
                if depth == 0:
                    pos += 1
                    break
            out.append(b)
            pos += 1
        self.pos = pos
        return bytes(out)

    def _read_hex_string(self) -> bytes:
        data, pos, end = self.data, self.pos + 1, self.end
        out = bytearray()
        digits = []
        while pos < end:
            b = data[pos]
            if b == 0x3E:  # >
                pos += 1
                break
            c = chr(b)
            if c in "0123456789abcdefABCDEF":
                digits.append(c)
            pos += 1
        if len(digits) % 2:
            digits.append("0")
        for i in range(0, len(digits), 2):
            out.append(int(digits[i] + digits[i + 1], 16))
        self.pos = pos
        return bytes(out)
