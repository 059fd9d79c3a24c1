"""ChunkedData: a lazy, range-fetched byte buffer for the PDF layer.

The reference keeps an analogous structure — ChunkedStream
(/root/reference/src/main/js/pdf.combined.js:4614-4870) backed by range
requests (NetworkPdfManager, :49446) — so a document larger than worker
memory is parsed by materializing only the byte ranges the parser
actually touches.  This module is the Ray-side analog: ``ChunkedData``
duck-types the small ``bytes`` surface the engine's lexer/parser/xref
use (``len``, int/slice indexing, ``find``/``rfind``, ``startswith``)
over an on-demand ``fetch(start, stop) -> bytes`` callback with a
bounded LRU of fixed-size chunks, so peak residency for one multi-GB
PDF is ``max_chunks * chunk_size`` plus the largest single object
materialized — never the whole file.

Regex scans over the raw buffer (the xref damage-recovery path) go
through ``finditer_buffer``, which windows the scan with enough overlap
for the short header patterns involved.

Slices (``data[a:b]``) materialize real ``bytes`` — stream payloads are
bounded by the largest object in the file, the same bound the
reference's ChunkedStream has once a stream is decoded.
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Callable

DEFAULT_CHUNK_SIZE = 1 << 16        # 64 KiB = pdf.js RANGE_CHUNK_SIZE
DEFAULT_MAX_CHUNKS = 256            # 16 MiB resident cap per open document
_SCAN_OVERLAP = 512                 # > any recovery-regex match length


class _ChunkStore:
    """LRU chunk cache shared by a buffer and its offset views."""

    __slots__ = ("fetch", "chunk_size", "max_chunks", "chunks",
                 "fetched_bytes", "max_resident")

    def __init__(self, fetch: Callable[[int, int], bytes],
                 chunk_size: int, max_chunks: int):
        self.fetch = fetch
        self.chunk_size = chunk_size
        self.max_chunks = max_chunks
        self.chunks: OrderedDict[int, bytes] = OrderedDict()
        self.fetched_bytes = 0      # total bytes pulled from storage
        self.max_resident = 0       # peak bytes held in the cache

    def get(self, idx: int, file_length: int) -> bytes:
        c = self.chunks.get(idx)
        if c is not None:
            self.chunks.move_to_end(idx)
            return c
        start = idx * self.chunk_size
        stop = min(start + self.chunk_size, file_length)
        c = self.fetch(start, stop)
        self.fetched_bytes += len(c)
        self.chunks[idx] = c
        while len(self.chunks) > self.max_chunks:
            self.chunks.popitem(last=False)
        resident = sum(len(v) for v in self.chunks.values())
        if resident > self.max_resident:
            self.max_resident = resident
        return c


class ChunkedData:
    __slots__ = ("_store", "_base", "_length", "_file_length",
                 "_hot", "_hot_lo", "_hot_hi")

    def __init__(self, fetch: Callable[[int, int], bytes], length: int, *,
                 chunk_size: int = DEFAULT_CHUNK_SIZE,
                 max_chunks: int = DEFAULT_MAX_CHUNKS,
                 _store: _ChunkStore | None = None, _base: int = 0,
                 _file_length: int | None = None):
        self._store = _store or _ChunkStore(fetch, chunk_size, max_chunks)
        self._base = _base
        self._length = length
        self._file_length = length if _file_length is None else _file_length
        self._hot = b""             # most-recently touched chunk
        self._hot_lo = 0
        self._hot_hi = 0

    # -- constructors -----------------------------------------------------

    @classmethod
    def from_file(cls, path: str, *,
                  chunk_size: int = DEFAULT_CHUNK_SIZE,
                  max_chunks: int = DEFAULT_MAX_CHUNKS) -> "ChunkedData":
        """Range-read a local file (stands in for any storage that serves
        byte-range GETs; one opened fd per buffer, closed with it)."""
        f = open(path, "rb")
        length = os.fstat(f.fileno()).st_size

        def fetch(start: int, stop: int) -> bytes:
            f.seek(start)
            return f.read(stop - start)

        buf = cls(fetch, length, chunk_size=chunk_size,
                  max_chunks=max_chunks)
        return buf

    # -- stats ------------------------------------------------------------

    @property
    def max_resident(self) -> int:
        return self._store.max_resident

    @property
    def fetched_bytes(self) -> int:
        return self._store.fetched_bytes

    def view(self, offset: int) -> "ChunkedData":
        """Suffix view sharing the chunk cache (the leading-garbage
        header case in PdfDocument)."""
        return ChunkedData(self._store.fetch, self._length - offset,
                           _store=self._store, _base=self._base + offset,
                           _file_length=self._file_length)

    # -- core reads -------------------------------------------------------

    def _read(self, start: int, stop: int) -> bytes:
        """Materialize [start, stop) (buffer-local coordinates)."""
        a = start + self._base
        b = stop + self._base
        if a >= b:
            return b""
        cs = self._store.chunk_size
        first, last = a // cs, (b - 1) // cs
        if first == last:
            c = self._store.get(first, self._file_length)
            lo = first * cs
            self._hot, self._hot_lo, self._hot_hi = c, lo, lo + len(c)
            return c[a - lo:b - lo]
        parts = []
        for idx in range(first, last + 1):
            c = self._store.get(idx, self._file_length)
            lo = idx * cs
            parts.append(c[max(a - lo, 0):b - lo])
        return b"".join(parts)

    def __len__(self) -> int:
        return self._length

    def __getitem__(self, key):
        if isinstance(key, slice):
            a, b, step = key.indices(self._length)
            if step != 1:
                raise ValueError("ChunkedData slices must be contiguous")
            return self._read(a, b)
        i = key
        if i < 0:
            i += self._length
        if i < 0 or i >= self._length:
            raise IndexError("ChunkedData index out of range")
        j = i + self._base
        if self._hot_lo <= j < self._hot_hi:
            return self._hot[j - self._hot_lo]
        cs = self._store.chunk_size
        c = self._store.get(j // cs, self._file_length)
        lo = (j // cs) * cs
        self._hot, self._hot_lo, self._hot_hi = c, lo, lo + len(c)
        return c[j - lo]

    # -- bytes-surface methods the PDF layer uses -------------------------

    def startswith(self, prefix: bytes, pos: int = 0) -> bool:
        return self._read(pos, pos + len(prefix)) == prefix

    def find(self, sub: bytes, start: int = 0, end: int | None = None) -> int:
        n = self._length
        if end is None or end > n:
            end = n
        start = max(start + n, 0) if start < 0 else start
        if not sub:
            return min(start, end)
        win = max(self._store.chunk_size, 2 * len(sub))
        pos = start
        while pos < end:
            stop = min(pos + win, end)
            i = self._read(pos, stop).find(sub)
            if i >= 0:
                return pos + i
            if stop == end:
                return -1
            pos = stop - (len(sub) - 1)
        return -1

    def rfind(self, sub: bytes, start: int = 0,
              end: int | None = None) -> int:
        n = self._length
        if end is None or end > n:
            end = n
        start = max(start + n, 0) if start < 0 else start
        if not sub:
            return end
        win = max(self._store.chunk_size, 2 * len(sub))
        stop = end
        while stop > start:
            pos = max(stop - win, start)
            i = self._read(pos, stop).rfind(sub)
            if i >= 0:
                return pos + i
            if pos == start:
                return -1
            stop = pos + (len(sub) - 1)
        return -1


class _ShiftedMatch:
    """Absolute-position adapter for a windowed regex match."""

    __slots__ = ("_m", "_shift")

    def __init__(self, m, shift: int):
        self._m = m
        self._shift = shift

    def start(self, *a) -> int:
        return self._m.start(*a) + self._shift

    def end(self, *a) -> int:
        return self._m.end(*a) + self._shift

    def group(self, *a):
        return self._m.group(*a)


def finditer_buffer(pattern, data, start: int = 0, end: int | None = None):
    """pattern.finditer over bytes OR ChunkedData.  For ChunkedData the
    scan is windowed with ``_SCAN_OVERLAP`` overlap (matches longer than
    the overlap could be missed — all callers use short header patterns)
    and matches are deduplicated by absolute start."""
    if isinstance(data, (bytes, bytearray, memoryview)):
        if end is None:
            yield from pattern.finditer(data, start)
        else:
            yield from pattern.finditer(data, start, end)
        return
    n = len(data)
    if end is None or end > n:
        end = n
    win = max(data._store.chunk_size, 4 * _SCAN_OVERLAP)
    pos = start
    while pos < end:
        stop = min(pos + win, end)
        window = data[pos:stop]
        final = stop == end
        # non-final windows: only yield matches STARTING before the
        # overlap zone; anything starting inside it is re-found — from
        # its full start — by the next window (which begins at
        # stop - _SCAN_OVERLAP <= that start), and since matches are
        # shorter than _SCAN_OVERLAP they cannot be edge-truncated here
        yield_limit = len(window) if final else len(window) - _SCAN_OVERLAP
        for m in pattern.finditer(window):
            if m.start() >= yield_limit:
                break
            yield _ShiftedMatch(m, pos)
        if final:
            return
        pos = stop - _SCAN_OVERLAP
