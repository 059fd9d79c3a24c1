"""XRef: cross-reference tables/streams, trailer chain, object fetch,
object streams, and brute-force recovery for damaged files.

Behavioral reference: pdf.js XRef (/root/reference/src/main/js/
pdf.combined.js:43070-43535); independent Python design.
"""

from __future__ import annotations

import re

from .chunked_data import finditer_buffer
from .filters import decode_stream
from .lexer import EOF
from .objects import PdfError, Ref, Stream
from .parser import Parser

_STARTXREF_RE = re.compile(rb"startxref\s+(\d+)")
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_CATALOG_RE = re.compile(rb"/Type\s*/Catalog")


class XRef:
    def __init__(self, data: bytes, password: bytes = b""):
        self.data = data
        # obj num -> (offset, gen) for classic entries,
        #            ("objstm", stm_num, idx) for compressed entries
        self.entries: dict[int, tuple] = {}
        self.trailer: dict = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, dict[int, object]] = {}
        self._recovered = False
        self.handler = None          # security handler (encrypted docs)
        try:
            self._parse()
        except Exception:
            self._recover()
        if not self.entries or "Root" not in self.trailer:
            self._recover()
        self._init_encryption(password)

    def _init_encryption(self, password: bytes) -> None:
        enc_ref = self.trailer.get("Encrypt")
        if enc_ref is None:
            return
        from .crypto import make_handler
        # the /Encrypt dict itself is never encrypted; fetch it while
        # handler is still None so its O/U/OE/UE strings stay raw
        enc = self.fetch_if_ref(enc_ref)
        if not isinstance(enc, dict):
            return
        self.handler = make_handler(enc, self.trailer.get("ID"), password)
        # anything fetched pre-handler (recovery scan, Encrypt resolution)
        # was cached undecrypted — flush so re-fetches decrypt
        self._cache.clear()
        self._objstm_cache.clear()
        if isinstance(enc_ref, Ref):
            self._cache[enc_ref.num] = enc  # keep the raw Encrypt dict

    def _has_identity_crypt(self, sdict: dict) -> bool:
        """A stream whose /Filter chain names /Crypt with the Identity
        crypt filter (or no /Name, which defaults to Identity) is exempt
        from the document-level stream decryption."""
        f = sdict.get("Filter")
        filters = f if isinstance(f, list) else [f]
        if not any(str(x) == "Crypt" for x in filters if x is not None):
            return False
        dp = sdict.get("DecodeParms") or sdict.get("DP")
        parms = dp if isinstance(dp, list) else [dp]
        for i, x in enumerate(filters):
            if x is not None and str(x) == "Crypt":
                p = parms[i] if i < len(parms) else None
                name = p.get("Name") if isinstance(p, dict) else None
                return name is None or str(name) == "Identity"
        return False

    def _decrypt_object(self, obj, num: int, gen: int):
        """Recursively decrypt strings (and stream bytes) of a fetched
        top-level object.  Objects inside object streams are NOT
        decrypted (the containing ObjStm stream already was); XRef
        streams are never encrypted by spec."""
        h = self.handler
        if isinstance(obj, bytes):
            return h.decrypt_string(num, gen, obj)
        if isinstance(obj, list):
            return [self._decrypt_object(o, num, gen) for o in obj]
        if isinstance(obj, Stream):
            obj.dict = self._decrypt_object(obj.dict, num, gen)
            t = str(obj.dict.get("Type") or "")
            if t == "XRef":
                return obj
            if t == "Metadata" and not h.encrypt_metadata:
                return obj
            if self._has_identity_crypt(obj.dict):
                return obj  # per-stream /Crypt Identity override
            obj.raw = h.decrypt_stream(num, gen, obj.raw)
            return obj
        if isinstance(obj, dict):
            return {k: self._decrypt_object(v, num, gen)
                    for k, v in obj.items()}
        return obj

    # -- parsing ----------------------------------------------------------

    def _parse(self) -> None:
        data = self.data
        tail = data[-2048:]
        m = None
        for m in _STARTXREF_RE.finditer(tail):
            pass
        if m is None:
            raise PdfError("startxref not found")
        start = int(m.group(1))
        seen = set()
        while start >= 0 and start < len(data) and start not in seen:
            seen.add(start)
            start = self._parse_section(start)

    def _parse_section(self, pos: int) -> int:
        """Parse one xref section (table or stream). Returns /Prev or -1."""
        data = self.data
        # skip whitespace
        while pos < len(data) and data[pos] in b" \r\n\t":
            pos += 1
        if data.startswith(b"xref", pos):
            return self._parse_table(pos + 4)
        # xref stream: "N G obj <<...>> stream"
        parser = Parser(data, pos, xref=self)
        num = parser.get_obj()
        gen = parser.get_obj()
        kw = parser.shift()
        obj = parser.get_obj()
        if not isinstance(obj, Stream):
            raise PdfError("expected xref stream")
        self._parse_xref_stream(obj)
        if not self.trailer:
            self.trailer = dict(obj.dict)
        else:
            for k, v in obj.dict.items():
                self.trailer.setdefault(k, v)
        prev = obj.dict.get("Prev")
        return int(prev) if isinstance(prev, (int, float)) else -1

    def _parse_table(self, pos: int) -> int:
        data = self.data
        parser = Parser(data, pos, xref=self)
        while True:
            tok = parser.shift()
            if tok == "trailer":
                trailer = parser.get_obj()
                if isinstance(trailer, dict):
                    if not self.trailer:
                        self.trailer = trailer
                    else:
                        for k, v in trailer.items():
                            self.trailer.setdefault(k, v)
                    # hybrid-reference file: XRefStm
                    xrefstm = trailer.get("XRefStm")
                    if isinstance(xrefstm, int):
                        try:
                            self._parse_section(xrefstm)
                        except Exception:
                            pass
                    prev = trailer.get("Prev")
                    return int(prev) if isinstance(prev, (int, float)) else -1
                return -1
            if tok is EOF:
                return -1
            # subsection header: first count
            if not isinstance(tok, int):
                continue
            first = tok
            count = parser.shift()
            if not isinstance(count, int):
                continue
            for i in range(count):
                offset = parser.shift()
                gen = parser.shift()
                kind = parser.shift()
                if not isinstance(offset, int) or not isinstance(gen, int):
                    raise PdfError("malformed xref entry")
                num = first + i
                if num in self.entries:
                    continue
                if kind == "n":
                    self.entries[num] = (offset, gen)
                elif kind == "f":
                    # tombstone: an object freed in a newer incremental
                    # update must shadow any definition in an older /Prev
                    # section (sections are parsed newest-first)
                    self.entries[num] = None

    def _parse_xref_stream(self, stm: Stream) -> None:
        d = stm.dict
        size = self.fetch_if_ref(d.get("Size")) or 0
        w = [int(x) for x in self.fetch_if_ref(d.get("W")) or []]
        index = self.fetch_if_ref(d.get("Index")) or [0, size]
        data = decode_stream(stm, self)
        entry_len = sum(w)
        pos = 0

        def read_field(width, default):
            nonlocal pos
            if width == 0:
                return default
            v = int.from_bytes(data[pos:pos + width], "big")
            pos += width
            return v

        for k in range(0, len(index), 2):
            first, count = index[k], index[k + 1]
            for i in range(count):
                if pos + entry_len > len(data):
                    return
                ftype = read_field(w[0], 1)
                f2 = read_field(w[1], 0)
                f3 = read_field(w[2] if len(w) > 2 else 0, 0)
                num = first + i
                if num in self.entries:
                    continue
                if ftype == 1:
                    self.entries[num] = (f2, f3)
                elif ftype == 2:
                    self.entries[num] = ("objstm", f2, f3)
                elif ftype == 0:
                    self.entries[num] = None  # free-entry tombstone

    # -- damage recovery --------------------------------------------------

    def _recover(self) -> None:
        if self._recovered:
            return
        self._recovered = True
        data = self.data
        for m in finditer_buffer(_OBJ_RE, data):
            num, gen = int(m.group(1)), int(m.group(2))
            # later definitions win (incremental updates appear later)
            self.entries[num] = (m.start(), gen)
        # index compressed objects: any recovered /Type/ObjStm stream gets
        # its members added (real corpora hide the catalog inside one)
        for num in list(self.entries):
            entry = self.entries.get(num)
            if not entry or entry[0] == "objstm":
                continue
            try:
                obj = self._fetch_at(entry[0], num)
            except Exception:
                continue
            if isinstance(obj, Stream) and \
                    str(obj.dict.get("Type") or "") == "ObjStm":
                try:
                    n = int(self.fetch_if_ref(obj.dict.get("N")) or 0)
                    from .filters import decode_stream
                    body = decode_stream(obj, self)
                    hp = Parser(body, 0, xref=self)
                    for idx in range(n):
                        onum = hp.get_obj()
                        hp.get_obj()  # offset
                        if isinstance(onum, int) and onum not in self.entries:
                            self.entries[onum] = ("objstm", num, idx)
                except Exception:
                    continue
        if "Root" not in self.trailer:
            # find an uncompressed catalog
            for m in finditer_buffer(_CATALOG_RE, data):
                # locate enclosing object header
                head = data.rfind(b" obj", 0, m.start())
                objm = None
                for objm in _OBJ_RE.finditer(
                        data[max(0, head - 64):m.start()]):
                    pass
                if objm:
                    self.trailer["Root"] = Ref(int(objm.group(1)),
                                               int(objm.group(2)))
                    break
        # also pick up trailer dict for Root/Info if present
        if "Root" not in self.trailer:
            t = data.rfind(b"trailer")
            if t >= 0:
                try:
                    p = Parser(data, t + 7, xref=self)
                    tr = p.get_obj()
                    if isinstance(tr, dict) and "Root" in tr:
                        self.trailer.update(tr)
                except Exception:
                    pass
        if "Root" not in self.trailer:
            # last resort: a catalog hidden in a recovered object stream
            for num, entry in list(self.entries.items()):
                if entry and entry[0] == "objstm":
                    try:
                        obj = self.fetch(Ref(num, 0))
                    except Exception:
                        continue
                    if isinstance(obj, dict) and \
                            str(obj.get("Type") or "") == "Catalog":
                        self.trailer["Root"] = Ref(num, 0)
                        break

    # -- fetching ---------------------------------------------------------

    def fetch_if_ref(self, obj):
        while isinstance(obj, Ref):
            obj = self.fetch(obj)
        return obj

    def fetch(self, ref: Ref):
        num = ref.num
        if num in self._cache:
            return self._cache[num]
        entry = self.entries.get(num)
        obj = None
        if entry is None:
            obj = None
        elif entry[0] == "objstm":
            obj = self._fetch_from_objstm(entry[1], entry[2], num)
        else:
            obj = self._fetch_at(entry[0], num)
            if obj is None and not self._recovered:
                self._recover()
                entry = self.entries.get(num)
                if entry and entry[0] != "objstm":
                    obj = self._fetch_at(entry[0], num)
            if obj is not None and self.handler is not None:
                gen = entry[1] if entry and isinstance(entry[1], int) else 0
                obj = self._decrypt_object(obj, num, gen)
        self._cache[num] = obj
        return obj

    def _fetch_at(self, offset: int, expected_num: int):
        data = self.data
        if offset < 0 or offset >= len(data):
            return None
        parser = Parser(data, offset, xref=self)
        num = parser.get_obj()
        gen = parser.get_obj()
        kw = parser.shift()
        if kw != "obj":
            # tolerate off-by-small offsets: scan forward for the header
            # (bounded window, materialized so it works on lazy buffers)
            a = max(0, offset - 32)
            m = _OBJ_RE.search(data[a:offset + 1024])
            if m and int(m.group(1)) == expected_num:
                parser = Parser(data, a + m.end(), xref=self)
                return parser.get_obj()
            return None
        if num != expected_num:
            return None
        return parser.get_obj()

    def _fetch_from_objstm(self, stm_num: int, idx: int, expected_num: int):
        objs = self._objstm_cache.get(stm_num)
        if objs is None:
            objs = {}
            stm = self.fetch(Ref(stm_num, 0))
            if isinstance(stm, Stream):
                data = decode_stream(stm, self)
                n = self.fetch_if_ref(stm.dict.get("N")) or 0
                first = self.fetch_if_ref(stm.dict.get("First")) or 0
                hp = Parser(data, 0, xref=self)
                heads = []
                for _ in range(n):
                    onum = hp.get_obj()
                    off = hp.get_obj()
                    if not isinstance(onum, int) or not isinstance(off, int):
                        break
                    heads.append((onum, off))
                for onum, off in heads:
                    try:
                        p = Parser(data, first + off, xref=self)
                        objs[onum] = p.get_obj()
                    except Exception:
                        objs[onum] = None
            self._objstm_cache[stm_num] = objs
        return objs.get(expected_num)

    # -- convenience ------------------------------------------------------

    @property
    def root(self) -> dict:
        root = self.fetch_if_ref(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise PdfError("no document catalog")
        return root
