"""CCITT Group 3 / Group 4 (ITU-T T.4 / T.6) fax decoding.

Pure-Python modified-Huffman / modified-READ decoder for the
CCITTFaxDecode filter (PDF 1.7 §7.4.6).  The reference engine decodes
this via CCITTFaxStream (pdf.combined.js:22827); this implementation is
written from the public ITU tables with a changing-elements (a0/b1/b2)
row decoder, and is cross-validated bit-for-bit against the reference's
JS decoder in tests/test_ccitt.py.

Supported: K < 0 (pure 2D / G4), K = 0 (1D MH), K > 0 (mixed 1D/2D G3
with tag bits), EncodedByteAlign, EndOfLine, BlackIs1, Rows/Columns.
An encoder for the same subset lives here too — it generates the
fixtures (the container has no image codecs to produce them otherwise).
"""

from __future__ import annotations

from bisect import bisect_right

from .objects import PdfError

# ---- code tables (ITU-T T.4 §4.1/T.6; public spec data) --------------------
# {(n_bits, code): run_length}

_WHITE_CODES = {
    (8, 0b00110101): 0, (6, 0b000111): 1, (4, 0b0111): 2, (4, 0b1000): 3,
    (4, 0b1011): 4, (4, 0b1100): 5, (4, 0b1110): 6, (4, 0b1111): 7,
    (5, 0b10011): 8, (5, 0b10100): 9, (5, 0b00111): 10, (5, 0b01000): 11,
    (6, 0b001000): 12, (6, 0b000011): 13, (6, 0b110100): 14,
    (6, 0b110101): 15, (6, 0b101010): 16, (6, 0b101011): 17,
    (7, 0b0100111): 18, (7, 0b0001100): 19, (7, 0b0001000): 20,
    (7, 0b0010111): 21, (7, 0b0000011): 22, (7, 0b0000100): 23,
    (7, 0b0101000): 24, (7, 0b0101011): 25, (7, 0b0010011): 26,
    (7, 0b0100100): 27, (7, 0b0011000): 28, (8, 0b00000010): 29,
    (8, 0b00000011): 30, (8, 0b00011010): 31, (8, 0b00011011): 32,
    (8, 0b00010010): 33, (8, 0b00010011): 34, (8, 0b00010100): 35,
    (8, 0b00010101): 36, (8, 0b00010110): 37, (8, 0b00010111): 38,
    (8, 0b00101000): 39, (8, 0b00101001): 40, (8, 0b00101010): 41,
    (8, 0b00101011): 42, (8, 0b00101100): 43, (8, 0b00101101): 44,
    (8, 0b00000100): 45, (8, 0b00000101): 46, (8, 0b00001010): 47,
    (8, 0b00001011): 48, (8, 0b01010010): 49, (8, 0b01010011): 50,
    (8, 0b01010100): 51, (8, 0b01010101): 52, (8, 0b00100100): 53,
    (8, 0b00100101): 54, (8, 0b01011000): 55, (8, 0b01011001): 56,
    (8, 0b01011010): 57, (8, 0b01011011): 58, (8, 0b01001010): 59,
    (8, 0b01001011): 60, (8, 0b00110010): 61, (8, 0b00110011): 62,
    (8, 0b00110100): 63,
    # makeup
    (5, 0b11011): 64, (5, 0b10010): 128, (6, 0b010111): 192,
    (7, 0b0110111): 256, (8, 0b00110110): 320, (8, 0b00110111): 384,
    (8, 0b01100100): 448, (8, 0b01100101): 512, (8, 0b01101000): 576,
    (8, 0b01100111): 640, (9, 0b011001100): 704, (9, 0b011001101): 768,
    (9, 0b011010010): 832, (9, 0b011010011): 896, (9, 0b011010100): 960,
    (9, 0b011010101): 1024, (9, 0b011010110): 1088, (9, 0b011010111): 1152,
    (9, 0b011011000): 1216, (9, 0b011011001): 1280, (9, 0b011011010): 1344,
    (9, 0b011011011): 1408, (9, 0b010011000): 1472, (9, 0b010011001): 1536,
    (9, 0b010011010): 1600, (6, 0b011000): 1664, (9, 0b010011011): 1728,
}

_BLACK_CODES = {
    (10, 0b0000110111): 0, (3, 0b010): 1, (2, 0b11): 2, (2, 0b10): 3,
    (3, 0b011): 4, (4, 0b0011): 5, (4, 0b0010): 6, (5, 0b00011): 7,
    (6, 0b000101): 8, (6, 0b000100): 9, (7, 0b0000100): 10,
    (7, 0b0000101): 11, (7, 0b0000111): 12, (8, 0b00000100): 13,
    (8, 0b00000111): 14, (9, 0b000011000): 15, (10, 0b0000010111): 16,
    (10, 0b0000011000): 17, (10, 0b0000001000): 18,
    (11, 0b00001100111): 19, (11, 0b00001101000): 20,
    (11, 0b00001101100): 21, (11, 0b00000110111): 22,
    (11, 0b00000101000): 23, (11, 0b00000010111): 24,
    (11, 0b00000011000): 25, (12, 0b000011001010): 26,
    (12, 0b000011001011): 27, (12, 0b000011001100): 28,
    (12, 0b000011001101): 29, (12, 0b000001101000): 30,
    (12, 0b000001101001): 31, (12, 0b000001101010): 32,
    (12, 0b000001101011): 33, (12, 0b000011010010): 34,
    (12, 0b000011010011): 35, (12, 0b000011010100): 36,
    (12, 0b000011010101): 37, (12, 0b000011010110): 38,
    (12, 0b000011010111): 39, (12, 0b000001101100): 40,
    (12, 0b000001101101): 41, (12, 0b000011011010): 42,
    (12, 0b000011011011): 43, (12, 0b000001010100): 44,
    (12, 0b000001010101): 45, (12, 0b000001010110): 46,
    (12, 0b000001010111): 47, (12, 0b000001100100): 48,
    (12, 0b000001100101): 49, (12, 0b000001010010): 50,
    (12, 0b000001010011): 51, (12, 0b000000100100): 52,
    (12, 0b000000110111): 53, (12, 0b000000111000): 54,
    (12, 0b000000100111): 55, (12, 0b000000101000): 56,
    (12, 0b000001011000): 57, (12, 0b000001011001): 58,
    (12, 0b000000101011): 59, (12, 0b000000101100): 60,
    (12, 0b000001011010): 61, (12, 0b000001100110): 62,
    (12, 0b000001100111): 63,
    # makeup
    (10, 0b0000001111): 64, (12, 0b000011001000): 128,
    (12, 0b000011001001): 192, (12, 0b000001011011): 256,
    (12, 0b000000110011): 320, (12, 0b000000110100): 384,
    (12, 0b000000110101): 448, (13, 0b0000001101100): 512,
    (13, 0b0000001101101): 576, (13, 0b0000001001010): 640,
    (13, 0b0000001001011): 704, (13, 0b0000001001100): 768,
    (13, 0b0000001001101): 832, (13, 0b0000001110010): 896,
    (13, 0b0000001110011): 960, (13, 0b0000001110100): 1024,
    (13, 0b0000001110101): 1088, (13, 0b0000001110110): 1152,
    (13, 0b0000001110111): 1216, (13, 0b0000001010010): 1280,
    (13, 0b0000001010011): 1344, (13, 0b0000001010100): 1408,
    (13, 0b0000001010101): 1472, (13, 0b0000001011010): 1536,
    (13, 0b0000001011011): 1600, (13, 0b0000001100100): 1664,
    (13, 0b0000001100101): 1728,
}

# extended makeup codes, common to both colors (T.4 table 3)
_EXT_CODES = {
    (11, 0b00000001000): 1792, (11, 0b00000001100): 1856,
    (11, 0b00000001101): 1920, (12, 0b000000010010): 1984,
    (12, 0b000000010011): 2048, (12, 0b000000010100): 2112,
    (12, 0b000000010101): 2176, (12, 0b000000010110): 2240,
    (12, 0b000000010111): 2304, (12, 0b000000011100): 2368,
    (12, 0b000000011101): 2432, (12, 0b000000011110): 2496,
    (12, 0b000000011111): 2560,
}

_WHITE_ALL = {**_WHITE_CODES, **_EXT_CODES}
_BLACK_ALL = {**_BLACK_CODES, **_EXT_CODES}
_MAX_WHITE_BITS = max(n for n, _ in _WHITE_ALL)
_MAX_BLACK_BITS = max(n for n, _ in _BLACK_ALL)

# 2D mode codes (T.6 table 4): V0=1, VR1=011, VL1=010, H=001, P=0001,
# VR2=000011, VL2=000010, VR3=0000011, VL3=0000010
_MODE_V0, _MODE_VR1, _MODE_VL1, _MODE_H, _MODE_P = "V0", "VR1", "VL1", "H", "P"
_MODE_VR2, _MODE_VL2, _MODE_VR3, _MODE_VL3 = "VR2", "VL2", "VR3", "VL3"
_MODE_CODES = {
    (1, 0b1): _MODE_V0, (3, 0b011): _MODE_VR1, (3, 0b010): _MODE_VL1,
    (3, 0b001): _MODE_H, (4, 0b0001): _MODE_P,
    (6, 0b000011): _MODE_VR2, (6, 0b000010): _MODE_VL2,
    (7, 0b0000011): _MODE_VR3, (7, 0b0000010): _MODE_VL3,
}
_V_DELTA = {_MODE_V0: 0, _MODE_VR1: 1, _MODE_VR2: 2, _MODE_VR3: 3,
            _MODE_VL1: -1, _MODE_VL2: -2, _MODE_VL3: -3}

_EOL = (12, 0b000000000001)


class _BitReader:
    """MSB-first bit reader over a byte string."""

    __slots__ = ("data", "bitpos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.bitpos = 0
        self.nbits = 8 * len(data)

    def peek(self, n: int) -> int | None:
        """Next n bits as an int; None if fewer than n remain (no pad —
        callers handle the EOD tail explicitly)."""
        if self.bitpos + n > self.nbits:
            return None
        v = 0
        p = self.bitpos
        d = self.data
        for _ in range(n):
            v = (v << 1) | ((d[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        return v

    def skip(self, n: int) -> None:
        self.bitpos += n

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def at_end(self) -> bool:
        return self.bitpos >= self.nbits


def _read_code(br: _BitReader, table: dict, max_bits: int):
    """Prefix-decode one code from ``table``; None at end of data."""
    for n in range(1, max_bits + 1):
        v = br.peek(n)
        if v is None:
            return None
        run = table.get((n, v))
        if run is not None:
            br.skip(n)
            return run
    raise PdfError("CCITT: bad code at bit %d" % br.bitpos)


def _read_run(br: _BitReader, white: bool) -> int | None:
    """One full run length: makeup codes (>=64) chain until a
    terminating code (<64) ends the run (T.4 §4.1.3)."""
    table = _WHITE_ALL if white else _BLACK_ALL
    max_bits = _MAX_WHITE_BITS if white else _MAX_BLACK_BITS
    total = 0
    while True:
        run = _read_code(br, table, max_bits)
        if run is None:
            return None
        total += run
        if run < 64:
            return total


def _skip_eols(br: _BitReader) -> bool:
    """Consume any EOL codes (plus fill bits) at the current position.
    Returns True if at least one EOL was seen."""
    saw = False
    while True:
        # fill bits: a run of >11 zeros preceding the EOL's 1
        v = br.peek(12)
        if v == 1:
            br.skip(12)
            saw = True
            continue
        if v == 0:
            br.skip(1)   # fill zero
            continue
        return saw


def _transitions_to_row(changes: list[int], columns: int) -> bytearray:
    """Changing-element positions -> one byte per pixel (1 = black)."""
    row = bytearray(columns)
    color = 0
    prev = 0
    for pos in changes:
        pos = min(pos, columns)
        if color:
            for i in range(prev, pos):
                row[i] = 1
        prev = pos
        color ^= 1
        if prev >= columns:
            break
    if color and prev < columns:
        for i in range(prev, columns):
            row[i] = 1
    return row


def _decode_1d_row(br: _BitReader, columns: int) -> list[int] | None:
    """One MH-coded row -> changing-element positions (white first)."""
    changes: list[int] = []
    pos = 0
    white = True
    while pos < columns:
        run = _read_run(br, white)
        if run is None:
            return None if not changes else changes
        pos += run
        changes.append(min(pos, columns))
        white = not white
    return changes


def _decode_2d_row(br: _BitReader, ref: list[int],
                   columns: int) -> list[int] | None:
    """One 2D-coded row against reference transitions ``ref``."""
    changes: list[int] = []
    a0 = -1
    white = True
    while a0 < columns:
        # locate b1: first ref transition strictly right of a0 whose
        # parity matches the current color (even index = white->black);
        # at row start a0 = -1, so transitions at position 0 qualify
        i = bisect_right(ref, a0)
        if (i & 1) != (0 if white else 1):
            i += 1
        b1 = ref[i] if i < len(ref) else columns
        b2 = ref[i + 1] if i + 1 < len(ref) else columns

        mode = None
        for n in range(1, 8):
            v = br.peek(n)
            if v is None:
                return None if not changes else changes
            mode = _MODE_CODES.get((n, v))
            if mode is not None:
                br.skip(n)
                break
        if mode is None:
            # EOL / EOFB region reached mid-row
            return None if not changes else changes

        if mode == _MODE_P:
            a0 = b2            # pass: color unchanged, no transition
        elif mode == _MODE_H:
            start = a0 if a0 > 0 else 0
            r1 = _read_run(br, white)
            if r1 is None:
                return changes or None
            r2 = _read_run(br, not white)
            if r2 is None:
                return changes or None
            a1 = start + r1
            a2 = a1 + r2
            changes.append(min(a1, columns))
            changes.append(min(a2, columns))
            a0 = a2
        else:
            a1 = b1 + _V_DELTA[mode]
            changes.append(min(a1, columns))
            a0 = a1
            white = not white
    return changes


def ccitt_decode(data: bytes, *, k: int = 0, columns: int = 1728,
                 rows: int = 0, black_is_1: bool = False,
                 byte_align: bool = False, end_of_line: bool = False,
                 max_rows: int = 1 << 20) -> tuple[bytes, int]:
    """Decode a CCITTFaxDecode payload.

    Returns ``(packed, n_rows)``: packed 1-bit rows (MSB-first, row
    stride ceil(columns/8)) where — per the PDF default — 0 bits are
    black unless ``black_is_1``.
    """
    br = _BitReader(data)
    stride = (columns + 7) // 8
    out = bytearray()
    n_rows = 0
    # reference line for 2D rows: an all-white line
    ref = [columns, columns]
    next_2d = k < 0

    _skip_eols(br)  # leading EOL permitted in all modes

    while (rows == 0 or n_rows < rows) and n_rows < max_rows:
        if br.at_end():
            break
        if k > 0:
            # mixed mode: tag bit selects 1D/2D for this row (after any
            # EOL the bit follows immediately)
            tag = br.peek(1)
            if tag is None:
                break
            br.skip(1)
            next_2d = tag == 0
        if k < 0:
            # EOFB = two EOLs
            if br.peek(24) == 0x001001:
                break
            changes = _decode_2d_row(br, ref, columns)
        elif next_2d:
            changes = _decode_2d_row(br, ref, columns)
        else:
            changes = _decode_1d_row(br, columns)
        if changes is None:
            break
        row = _transitions_to_row(changes, columns)
        packed = bytearray(stride)
        for i in range(columns):
            # internal 1 = black; output default black = 0 bits
            bit = row[i] if black_is_1 else 1 - row[i]
            if bit:
                packed[i >> 3] |= 0x80 >> (i & 7)
        if black_is_1 and columns & 7:
            # row padding is black in both polarities (reference emits
            # zero bits pre-inversion, pdf.combined.js:23645-23658)
            packed[-1] |= (1 << (8 - (columns & 7))) - 1
        out += packed
        n_rows += 1
        ref = [min(c, columns) for c in changes]
        if len(ref) & 1:
            ref.append(columns)
        ref += [columns, columns]
        if byte_align:
            br.align()
        if k >= 0:
            saw_eol = _skip_eols(br)
            if end_of_line and not saw_eol and not br.at_end():
                # tolerated: some encoders omit trailing EOLs
                pass
    return bytes(out), n_rows


# ---- encoder (fixture generation + round-trip tests) -----------------------

_ENC_WHITE = {run: (n, code) for (n, code), run in _WHITE_ALL.items()}
_ENC_BLACK = {run: (n, code) for (n, code), run in _BLACK_ALL.items()}
_ENC_MODE = {m: (n, code) for (n, code), m in _MODE_CODES.items()}


class _BitWriter:
    __slots__ = ("buf", "cur", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, n: int, code: int) -> None:
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.cur)
                self.cur = 0
                self.nbits = 0

    def align(self) -> None:
        if self.nbits:
            self.buf.append(self.cur << (8 - self.nbits))
            self.cur = 0
            self.nbits = 0

    def getvalue(self) -> bytes:
        b = bytearray(self.buf)
        if self.nbits:
            b.append(self.cur << (8 - self.nbits))
        return bytes(b)


def _write_run(bw: _BitWriter, run: int, white: bool) -> None:
    enc = _ENC_WHITE if white else _ENC_BLACK
    while run >= 64:
        # largest makeup <= run (makeups are multiples of 64 up to 2560)
        mk = min(run - run % 64, 2560)
        while mk not in enc:
            mk -= 64
        bw.write(*enc[mk])
        run -= mk
    bw.write(*enc[run])


def _row_transitions(row, columns: int) -> list[int]:
    changes = []
    color = 0
    for i in range(columns):
        if row[i] != color:
            changes.append(i)
            color = row[i]
    return changes


def ccitt_encode(rows_pixels, columns: int, *, k: int = -1,
                 byte_align: bool = False,
                 end_of_line: bool = False) -> bytes:
    """Encode rows of 0/1 pixels (1 = black) for the decoder above.
    K<0: G4.  K=0: MH 1D.  K>0: mixed, alternating 1D (first) / 2D rows.
    """
    bw = _BitWriter()
    ref = [columns, columns]
    for r, row in enumerate(rows_pixels):
        if k >= 0 and (end_of_line or (k > 0)):
            bw.write(*_EOL)
        if k > 0:
            use_2d = (r % 2) == 1
            bw.write(1, 0 if use_2d else 1)   # tag bit: 1 = 1D
        else:
            use_2d = k < 0

        changes = _row_transitions(row, columns)
        if not use_2d:
            pos = 0
            white = True
            for c in changes + [columns]:
                _write_run(bw, c - pos, white)
                pos = c
                white = not white
                if pos >= columns:
                    break
            if pos < columns:
                pass
        else:
            cl = changes + [columns, columns]
            rl = ref
            a0 = -1
            white = True
            ci = 0
            while a0 < columns:
                i = bisect_right(rl, a0)
                if (i & 1) != (0 if white else 1):
                    i += 1
                b1 = rl[i] if i < len(rl) else columns
                b2 = rl[i + 1] if i + 1 < len(rl) else columns
                a1 = cl[ci] if ci < len(cl) else columns
                if b2 < a1:
                    bw.write(*_ENC_MODE[_MODE_P])
                    a0 = b2
                elif abs(a1 - b1) <= 3:
                    delta = a1 - b1
                    mode = {0: _MODE_V0, 1: _MODE_VR1, 2: _MODE_VR2,
                            3: _MODE_VR3, -1: _MODE_VL1, -2: _MODE_VL2,
                            -3: _MODE_VL3}[delta]
                    bw.write(*_ENC_MODE[mode])
                    a0 = a1
                    white = not white
                    ci += 1
                else:
                    a2 = cl[ci + 1] if ci + 1 < len(cl) else columns
                    start = a0 if a0 > 0 else 0
                    bw.write(*_ENC_MODE[_MODE_H])
                    _write_run(bw, a1 - start, white)
                    _write_run(bw, a2 - a1, not white)
                    a0 = a2
                    ci += 2
        ref = changes + [columns, columns]
        if byte_align:
            bw.align()
    if k < 0:
        bw.write(*_EOL)
        bw.write(*_EOL)   # EOFB
    elif end_of_line:
        for _ in range(6):  # RTC
            bw.write(*_EOL)
    return bw.getvalue()
