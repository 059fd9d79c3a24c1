"""Fast content-stream scanner.

Content streams are ~hundreds of thousands of tiny tokens per page; the
general object Parser's recursive two-token lookahead is wasted there (no
indirect references can occur).  This scanner does one compiled-regex pass
per token with direct float conversion, falling back to the Lexer's string
readers only for ``(...)`` / ``<...>`` literals and to the full Parser for
inline dictionaries (BDC property lists).

Yields (operands, operator, op_pos) tuples; arrays are built inline.
"""

from __future__ import annotations

import re

from .lexer import Lexer
from .objects import Name

_TOKEN_RE = re.compile(
    rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)*"          # whitespace/comments
    rb"(?:"
    rb"(?P<num>[+-]?(?:\d+\.?\d*|\.\d+))"
    rb"|\((?P<litstr>[^()\\]*)\)"                   # escape-free string
    rb"|/(?P<name>[^\x00\t\n\x0c\r ()<>\[\]{}/%]*)"
    rb"|(?P<op>[^\x00\t\n\x0c\r ()<>\[\]{}/%]+)"
    rb"|<(?P<hexstr>[0-9A-Fa-f\x00\t\n\x0c\r ]*)>"
    rb"|(?P<delim><<|>>|[()\[\]{}<>])"
    rb")")

_NAME_ESC = re.compile(rb"#([0-9A-Fa-f]{2})")


def _decode_name(raw: bytes) -> str:
    if b"#" in raw:
        raw = _NAME_ESC.sub(lambda m: bytes([int(m.group(1), 16)]), raw)
    return raw.decode("latin1")


class ContentScanner:
    """Iterate (operands, operator, operator_pos) over a content stream."""

    __slots__ = ("data", "pos", "end")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.end = len(data)

    def __iter__(self):
        data = self.data
        end = self.end
        match = _TOKEN_RE.match
        stack: list = []
        arrays: list[list] = []        # nested array frames
        cur = stack

        def read_string(pos):
            # Lexer read helpers expect pos ON the opening delimiter
            lx = Lexer(data, pos - 1)
            s = lx._read_string()
            return s, lx.pos

        def read_hex(pos):
            lx = Lexer(data, pos - 1)
            s = lx._read_hex_string()
            return s, lx.pos

        # finditer drives the common path in C (search semantics also skip
        # junk bytes like the old pos+=1 loop); the iterator is restarted
        # only after position jumps — escaped strings, inline dicts, and
        # BI handlers that consume image payloads — all rare
        pos = self.pos
        running = True
        while running:
            running = False
            # explicit end bound so the scan contract honours self.end if
            # a caller ever scans a sub-range (today end == len(data))
            for m in _TOKEN_RE.finditer(data, pos, end):
                pos = m.end()
                g = m.lastindex  # 1=num 2=litstr 3=name 4=op 5=hex 6=delim
                # branch order: numbers >> operators >> names >> strings
                if g == 1:
                    cur.append(float(m[1]))
                    continue
                if g == 4:
                    op = m[4].decode("latin1")
                    if op in ("true", "false", "null"):
                        cur.append(True if op == "true"
                                   else (False if op == "false" else None))
                        continue
                    operands = stack
                    self.pos = pos
                    yield operands, op, m.start(4)
                    stack = []
                    arrays = []
                    cur = stack
                    if self.pos != pos:  # handler consumed bytes (BI..EI)
                        pos = self.pos
                        running = True
                        break
                    continue
                if g == 3:
                    cur.append(Name(_decode_name(m[3])))
                    continue
                if g == 2:
                    cur.append(m[2])
                    continue
                if g == 5:
                    h = m.group(5)
                    if b" " in h or b"\n" in h or b"\r" in h or b"\t" in h:
                        h = bytes(c for c in h
                                  if c not in (0, 9, 10, 12, 13, 32))
                    if len(h) % 2:
                        h += b"0"
                    try:
                        cur.append(bytes.fromhex(h.decode("ascii")))
                    except ValueError:
                        cur.append(b"")
                    continue
                d = m.group(6)
                if d == b"(":
                    # fast path: string without escapes or nested parens
                    j = data.find(b")", pos)
                    if j >= 0:
                        seg = data[pos:j]
                        if b"\\" not in seg and b"(" not in seg:
                            cur.append(seg)
                            pos = j + 1
                            running = True
                            break
                    s, pos = read_string(pos)
                    cur.append(s)
                    running = True
                    break
                elif d == b"<":
                    s, pos = read_hex(pos)
                    cur.append(s)
                    running = True
                    break
                elif d == b"[":
                    arrays.append(cur)
                    new: list = []
                    cur.append(new)
                    cur = new
                elif d == b"]":
                    if arrays:
                        cur = arrays.pop()
                elif d == b"<<":
                    # rare inline dict (BDC property list): full parse
                    from .parser import Parser
                    p = Parser(data, m.start(), xref=None)
                    obj = p.get_obj(allow_streams=False)
                    cur.append(obj)
                    pos = p.pos1   # start of the parser lookahead token
                    running = True
                    break
                # '>>', '{', '}', stray ')'/'>': ignore
        # trailing operands without operator are dropped (malformed tail)
