"""PDF object model: Name, Ref, Stream plus resolution helpers.

Dictionaries are plain Python dicts keyed by name strings; arrays are lists;
numbers are int/float; strings are bytes; null is None.  Indirect references
are ``Ref`` instances resolved through the document's XRef.

Behavioral reference: the Dict/Name/Ref primitives of pdf.js
(/root/reference/src/main/js/pdf.combined.js:15994-16281) — re-designed for
Python, not translated.
"""

from __future__ import annotations

from typing import NamedTuple


class Name(str):
    """A PDF name token (/Foo).  Subclasses str for ergonomic comparisons."""
    __slots__ = ()


class Ref(NamedTuple):
    num: int
    gen: int


class Stream:
    __slots__ = ("dict", "raw", "_decoded")

    def __init__(self, sdict: dict, raw: bytes):
        self.dict = sdict
        self.raw = raw
        self._decoded: bytes | None = None

    def __repr__(self):  # pragma: no cover
        return f"<Stream {self.dict.get('Type')} len={len(self.raw)}>"


class PdfError(Exception):
    pass
