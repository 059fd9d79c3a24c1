"""PDF object parser (arrays, dicts, streams, indirect refs).

Behavioral reference: pdf.js Parser (/root/reference/src/main/js/
pdf.combined.js:27271-27835); independent Python design.
"""

from __future__ import annotations

from .lexer import EOF, Lexer
from .objects import Name, PdfError, Ref, Stream


class Parser:
    """Recursive-descent parser over a Lexer with 2-token lookahead for
    indirect references (``N G R``) and object headers (``N G obj``)."""

    def __init__(self, data: bytes, pos: int = 0, xref=None):
        self.lexer = Lexer(data, pos)
        self.xref = xref
        self.buf1 = self.lexer.next_token()
        self.pos1 = self.lexer.tok_start
        self.buf2 = self.lexer.next_token()
        self.pos2 = self.lexer.tok_start
        self.last_pos = pos

    def shift(self):
        tok = self.buf1
        self.last_pos = self.pos1
        self.buf1 = self.buf2
        self.pos1 = self.pos2
        self.buf2 = self.lexer.next_token()
        self.pos2 = self.lexer.tok_start
        return tok

    def get_obj(self, allow_streams: bool = True):
        tok = self.shift()
        if tok is EOF:
            return EOF
        if tok == "[":
            arr = []
            while self.buf1 != "]":
                if self.buf1 is EOF:
                    break
                arr.append(self.get_obj(allow_streams))
            self.shift()  # ']'
            return arr
        if tok == "<<":
            d = {}
            while self.buf1 != ">>":
                if self.buf1 is EOF:
                    break
                key = self.shift()
                if not isinstance(key, Name):
                    continue  # skip junk
                d[str(key)] = self.get_obj(allow_streams)
            self.shift()  # '>>'
            # stream?
            if allow_streams and self.buf1 == "stream":
                return self._read_stream(d)
            return d
        if isinstance(tok, int):
            # possible "N G R" reference
            if isinstance(self.buf1, int) and self.buf2 == "R":
                gen = self.shift()
                self.shift()  # 'R'
                return Ref(tok, gen)
            return tok
        if tok == "true":
            return True
        if tok == "false":
            return False
        if tok == "null":
            return None
        return tok  # Name, number, bytes string, or command keyword

    def _read_stream(self, sdict: dict) -> Stream:
        data = self.lexer.data
        # buf1 == 'stream'; its start offset was recorded at tokenization
        p = self.pos1 + 6
        if p < len(data) and data[p] == 0x0D:
            p += 1
        if p < len(data) and data[p] == 0x0A:
            p += 1
        length = sdict.get("Length")
        if self.xref is not None:
            length = self.xref.fetch_if_ref(length)
        raw = None
        if isinstance(length, int) and length >= 0:
            e = p + length
            if e <= len(data):
                tail = data[e:e + 20].lstrip(b"\r\n \t")
                if tail.startswith(b"endstream"):
                    raw = data[p:e]
        if raw is None:
            # broken /Length: scan for endstream (find, not regex, so it
            # streams over ChunkedData buffers too)
            e = data.find(b"endstream", p)
            if e < 0:
                raise PdfError("endstream not found")
            # strip at most one EOL before endstream
            if e > p and data[e - 1] == 0x0A:
                e -= 1
            if e > p and data[e - 1] == 0x0D:
                e -= 1
            raw = data[p:e]
        # resync lexer after the stream
        i = data.find(b"endstream", p + len(raw))
        self.lexer.pos = (i + 9 if i >= 0 else p + len(raw))
        self.buf1 = self.lexer.next_token()
        self.pos1 = self.lexer.tok_start
        self.buf2 = self.lexer.next_token()
        self.pos2 = self.lexer.tok_start
        return Stream(sdict, raw)
