"""PdfDocument: header check, catalog, page tree traversal, content access.

Behavioral reference: pdf.js PDFDocument/Catalog/Page
(/root/reference/src/main/js/pdf.combined.js:48769-49130, 42541-42980);
independent Python design.
"""

from __future__ import annotations

from .filters import decode_stream
from .objects import PdfError, Ref, Stream
from .xref import XRef

_INHERITABLE = ("Resources", "MediaBox", "CropBox", "Rotate")


class Page:
    __slots__ = ("index", "dict", "xref")

    def __init__(self, index: int, pdict: dict, xref: XRef):
        self.index = index
        self.dict = pdict
        self.xref = xref

    @property
    def resources(self) -> dict:
        r = self.xref.fetch_if_ref(self.dict.get("Resources"))
        return r if isinstance(r, dict) else {}

    def content_bytes(self) -> bytes:
        """Concatenated decoded content streams (joined with newlines)."""
        contents = self.xref.fetch_if_ref(self.dict.get("Contents"))
        streams = contents if isinstance(contents, list) else [contents]
        parts = []
        for s in streams:
            s = self.xref.fetch_if_ref(s)
            if isinstance(s, Stream):
                try:
                    parts.append(decode_stream(s, self.xref))
                except Exception:
                    continue
        return b"\n".join(parts)


class PdfDocument:
    def __init__(self, data: bytes, password: bytes = b""):
        if not data.lstrip(b"\x00\t\r\n %")[:4] == b"%PDF":
            # tolerate leading garbage; search for header
            idx = data.find(b"%PDF-")
            if idx < 0:
                raise PdfError("not a PDF (no %PDF header)")
            data = data[idx:]
        self.xref = XRef(data, password=password)
        self._pages: list[Page] | None = None

    @property
    def pages(self) -> list[Page]:
        if self._pages is None:
            xref = self.xref
            root = xref.root
            pages_root = xref.fetch_if_ref(root.get("Pages"))
            out: list[Page] = []
            seen: set[int] = set()

            def walk(node, inherited: dict):
                node = xref.fetch_if_ref(node)
                if not isinstance(node, dict):
                    return
                ntype = str(node.get("Type") or "")
                inh = dict(inherited)
                for k in _INHERITABLE:
                    if k in node:
                        inh[k] = node[k]
                kids = xref.fetch_if_ref(node.get("Kids"))
                if ntype == "Page" or (kids is None and "Contents" in node):
                    pd = dict(node)
                    for k in _INHERITABLE:
                        pd.setdefault(k, inh.get(k))
                    out.append(Page(len(out), pd, xref))
                    return
                if isinstance(kids, list):
                    for kid in kids:
                        if isinstance(kid, Ref):
                            if kid.num in seen:
                                continue
                            seen.add(kid.num)
                        walk(kid, inh)

            walk(pages_root, {})
            self._pages = out
        return self._pages
