"""JBIG2 (ITU-T T.88) decoder — arithmetic-coding paths.

Reproduces the behavior of the reference's Jbig2Image
(pdf.combined.js:9603-10668) and Jbig2Stream glue (:22530): embedded
segment streams (optionally preceded by a JBIG2Globals chunk), generic
region decoding (templates 0-3, TPGDON typical prediction), generic
refinement (templates 0-1), symbol dictionary + text region
(arithmetic coding; Huffman and MMR raise, exactly like the reference),
page composition with OR/XOR, and packed 1-bpp output with colors
inverted to the PDF 1-bpc gray convention (JBIG2 1 = black).

The MQ arithmetic decoder follows T.88 Annex C software conventions
(reference ArithmeticDecoder, pdf.combined.js:58-215).  Context labels
for non-nominal templates follow the reference's (y, x)-sorted template
ordering — a fixed relabeling of the spec's context numbering, identical
in effect because encoder-visible state evolves per relabeled context.

An MQ *encoder* (T.88 Annex E flowcharts, software conventions — the
same procedure OpenJPEG/jbig2enc implement) lives here as well: the
container ships no JBIG2 encoder, so the tests generate round-trip
fixtures in-repo (generic region, symbol dictionary + text region),
the same strategy pdf/writer.py uses for encrypted-twin fixtures.
Round-tripping validates the encoder against the reference-ported
decoder, and the decoder against known-plaintext bitmaps.

Decoding is per-pixel sequential (arithmetic-coder state) and therefore
Python-slow on full scanned pages; like pdf/ccitt.py this is a
correctness codec — web-scale raster work routes through the actor-pool
media stages where a native codec would be dropped in.
"""

from __future__ import annotations

from .objects import PdfError

# T.88 Table C-2 / reference QeTable (pdf.combined.js:60): (qe, nmps,
# nlps, switch)
_QE = (
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0))


class MQDecoder:
    """T.88 Annex C decoder (reference ArithmeticDecoder,
    pdf.combined.js:111-214).  Contexts are packed one byte per label:
    index << 1 | mps."""

    __slots__ = ("data", "bp", "end", "chigh", "clow", "ct", "a")

    def __init__(self, data, start: int, end: int):
        self.data = data
        self.bp = start
        self.end = end
        self.chigh = data[start] if start < len(data) else 0
        self.clow = 0
        self._byte_in()
        self.chigh = ((self.chigh << 7) & 0xFFFF) | ((self.clow >> 9) & 0x7F)
        self.clow = (self.clow << 7) & 0xFFFF
        self.ct -= 7
        self.a = 0x8000

    def _byte_in(self):
        data = self.data
        bp = self.bp
        cur = data[bp] if bp < len(data) else 0
        if cur == 0xFF:
            b1 = data[bp + 1] if bp + 1 < len(data) else 0
            if b1 > 0x8F:
                self.clow += 0xFF00
                self.ct = 8
            else:
                bp += 1
                self.clow += b1 << 9
                self.ct = 7
                self.bp = bp
        else:
            bp += 1
            nxt = data[bp] if bp < len(data) else 0
            self.clow += (nxt << 8) if bp < self.end else 0xFF00
            self.ct = 8
            self.bp = bp
        if self.clow > 0xFFFF:
            self.chigh += self.clow >> 16
            self.clow &= 0xFFFF

    def read_bit(self, contexts, pos: int) -> int:
        cx = contexts[pos]
        cx_index = cx >> 1
        cx_mps = cx & 1
        qe, nmps, nlps, switch = _QE[cx_index]
        a = self.a - qe
        if self.chigh < qe:
            if a < qe:      # exchange LPS
                a = qe
                d = cx_mps
                cx_index = nmps
            else:
                a = qe
                d = 1 ^ cx_mps
                if switch:
                    cx_mps = d
                cx_index = nlps
        else:
            self.chigh -= qe
            if a & 0x8000:
                self.a = a
                return cx_mps
            if a < qe:      # exchange MPS
                d = 1 ^ cx_mps
                if switch:
                    cx_mps = d
                cx_index = nlps
            else:
                d = cx_mps
                cx_index = nmps
        while True:         # renormalize
            if self.ct == 0:
                self._byte_in()
            a <<= 1
            self.chigh = ((self.chigh << 1) & 0xFFFF) | ((self.clow >> 15) & 1)
            self.clow = (self.clow << 1) & 0xFFFF
            self.ct -= 1
            if a & 0x8000:
                break
        self.a = a
        contexts[pos] = (cx_index << 1) | cx_mps
        return d


class ContextCache(dict):
    def contexts(self, name: str) -> bytearray:
        c = self.get(name)
        if c is None:
            c = self[name] = bytearray(1 << 16)
        return c


class DecodingContext:
    def __init__(self, data, start: int, end: int):
        self.decoder = MQDecoder(data, start, end)
        self.cache = ContextCache()


def _log2(x: int) -> int:
    """reference log2 (pdf.combined.js:2783): smallest i with 2**i >= x."""
    n, i = 1, 0
    while x > n:
        n <<= 1
        i += 1
    return i


def decode_integer(cache: ContextCache, procedure: str, decoder: MQDecoder):
    """T.88 Annex A.2 (reference decodeInteger).  Returns int or None
    (OOB)."""
    contexts = cache.contexts(procedure)
    prev = 1

    def read_bits(length: int) -> int:
        nonlocal prev
        v = 0
        for _ in range(length):
            bit = decoder.read_bit(contexts, prev)
            prev = ((prev << 1) | bit) if prev < 256 else \
                ((((prev << 1) | bit) & 511) | 256)
            v = (v << 1) | bit
        return v & 0xFFFFFFFF

    sign = read_bits(1)
    if read_bits(1):
        if read_bits(1):
            if read_bits(1):
                if read_bits(1):
                    if read_bits(1):
                        value = read_bits(32) + 4436
                    else:
                        value = read_bits(12) + 340
                else:
                    value = read_bits(8) + 84
            else:
                value = read_bits(6) + 20
        else:
            value = read_bits(4) + 4
    else:
        value = read_bits(2)
    if sign == 0:
        return value
    return -value if value > 0 else None


def decode_iaid(cache: ContextCache, decoder: MQDecoder,
                code_length: int) -> int:
    contexts = cache.contexts("IAID")
    prev = 1
    for _ in range(code_length):
        bit = decoder.read_bit(contexts, prev)
        prev = (prev << 1) | bit
    if code_length < 31:
        return prev & ((1 << code_length) - 1)
    return prev & 0x7FFFFFFF


# 6.2.5.3 fixed templates (reference CodingTemplates)
_CODING_TEMPLATES = (
    ((-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1), (1, -1),
     (2, -1), (-4, 0), (-3, 0), (-2, 0), (-1, 0)),
    ((-1, -2), (0, -2), (1, -2), (2, -2), (-2, -1), (-1, -1), (0, -1),
     (1, -1), (2, -1), (-3, 0), (-2, 0), (-1, 0)),
    ((-1, -2), (0, -2), (1, -2), (-2, -1), (-1, -1), (0, -1), (1, -1),
     (-2, 0), (-1, 0)),
    ((-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (-4, 0), (-3, 0),
     (-2, 0), (-1, 0)))

_REFINEMENT_TEMPLATES = (
    {"coding": ((0, -1), (1, -1), (-1, 0)),
     "reference": ((0, -1), (1, -1), (-1, 0), (0, 0), (1, 0), (-1, 1),
                   (0, 1), (1, 1))},
    {"coding": ((-1, -1), (0, -1), (1, -1), (-1, 0)),
     "reference": ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1))})

# 6.2.5.7 pseudo-pixel contexts for TPGDON, per template
_REUSED_CONTEXTS = (0x9B25, 0x0795, 0x00E5, 0x0195)
_REFINEMENT_REUSED_CONTEXTS = (0x0020, 0x0008)

_NOMINAL_AT = ((3, -1), (-3, -1), (2, -2), (-2, -2))


def _sorted_template(template_index: int, at) -> list[tuple[int, int]]:
    t = list(_CODING_TEMPLATES[template_index]) + [tuple(p) for p in at]
    t.sort(key=lambda p: (p[1], p[0]))
    return t


def decode_bitmap(mmr: bool, width: int, height: int, template_index: int,
                  prediction: bool, skip, at,
                  ctx: DecodingContext) -> list[bytearray]:
    """6.2 generic region decoding (reference decodeBitmap,
    pdf.combined.js:9772)."""
    if mmr:
        raise PdfError("JBIG2: MMR encoding is not supported")
    if width * height > 1 << 26 or width < 0 or height < 0:
        # corrupt headers must fail fast, not allocate gigabytes
        raise PdfError("JBIG2: unreasonable region size %dx%d"
                       % (width, height))
    template = _sorted_template(template_index, at)
    tlen = len(template)
    pseudo = _REUSED_CONTEXTS[template_index]
    decoder = ctx.decoder
    contexts = ctx.cache.contexts("GB")
    bitmap: list[bytearray] = []
    ltp = 0
    for i in range(height):
        if prediction:
            sltp = decoder.read_bit(contexts, pseudo)
            ltp ^= sltp
            if ltp:
                bitmap.append(bytearray(bitmap[-1]) if bitmap
                              else bytearray(width))
                continue
        row = bytearray(width)
        bitmap.append(row)
        for j in range(width):
            if skip is not None and skip[i][j]:
                row[j] = 0
                continue
            context_label = 0
            shift = tlen - 1
            for (tx, ty) in template:
                j0 = j + tx
                if 0 <= j0 < width:
                    i0 = i + ty
                    if 0 <= i0 < len(bitmap):
                        if i0 < i or j0 < j:   # only already-decoded pixels
                            bit = bitmap[i0][j0]
                            if bit:
                                context_label |= bit << shift
                shift -= 1
            row[j] = decoder.read_bit(contexts, context_label)
    return bitmap


def decode_refinement(width: int, height: int, template_index: int,
                      reference, dx: int, dy: int, prediction: bool, at,
                      ctx: DecodingContext) -> list[bytearray]:
    """6.3.2 generic refinement (reference decodeRefinement,
    pdf.combined.js:9899)."""
    coding = list(_REFINEMENT_TEMPLATES[template_index]["coding"])
    ref = list(_REFINEMENT_TEMPLATES[template_index]["reference"])
    if template_index == 0:
        coding = coding + [tuple(at[0])]
        ref = ref + [tuple(at[1])]
    ref_w = len(reference[0]) if reference else 0
    ref_h = len(reference)
    pseudo = _REFINEMENT_REUSED_CONTEXTS[template_index]
    decoder = ctx.decoder
    contexts = ctx.cache.contexts("GR")
    bitmap: list[bytearray] = []
    ltp = 0
    for i in range(height):
        if prediction:
            sltp = decoder.read_bit(contexts, pseudo)
            ltp ^= sltp
            if ltp:
                raise PdfError("JBIG2: prediction is not supported")
        row = bytearray(width)
        bitmap.append(row)
        for j in range(width):
            label = 0
            for (tx, ty) in coding:
                i0 = i + ty
                j0 = j + tx
                if i0 < 0 or j0 < 0 or j0 >= width:
                    label <<= 1
                else:
                    label = (label << 1) | bitmap[i0][j0]
            for (tx, ty) in ref:
                i0 = i + ty + dy
                j0 = j + tx + dx
                if i0 < 0 or i0 >= ref_h or j0 < 0 or j0 >= ref_w:
                    label <<= 1
                else:
                    label = (label << 1) | reference[i0][j0]
            row[j] = decoder.read_bit(contexts, label)
    return bitmap


def decode_symbol_dictionary(huffman: bool, refinement: bool, symbols,
                             n_new: int, n_exported: int, template_index,
                             at, r_template, r_at,
                             ctx: DecodingContext) -> list:
    """6.5.5 (reference decodeSymbolDictionary, pdf.combined.js:9979)."""
    if huffman:
        raise PdfError("JBIG2: huffman is not supported")
    new_symbols: list = []
    current_height = 0
    symbol_code_length = _log2(len(symbols) + n_new)
    decoder = ctx.decoder
    cache = ctx.cache
    while len(new_symbols) < n_new:
        current_height += decode_integer(cache, "IADH", decoder)
        current_width = 0
        while True:
            delta_width = decode_integer(cache, "IADW", decoder)
            if delta_width is None:
                break  # OOB
            current_width += delta_width
            if refinement:
                n_inst = decode_integer(cache, "IAAI", decoder)
                if n_inst > 1:
                    bitmap = decode_text_region(
                        huffman, refinement, current_width, current_height,
                        0, n_inst, 1, symbols + new_symbols,
                        symbol_code_length, 0, 0, 1, 0,
                        r_template, r_at, ctx)
                else:
                    sym_id = decode_iaid(cache, decoder, symbol_code_length)
                    rdx = decode_integer(cache, "IARDX", decoder)
                    rdy = decode_integer(cache, "IARDY", decoder)
                    symbol = (symbols[sym_id] if sym_id < len(symbols)
                              else new_symbols[sym_id - len(symbols)])
                    bitmap = decode_refinement(
                        current_width, current_height, r_template, symbol,
                        rdx, rdy, False, r_at, ctx)
            else:
                bitmap = decode_bitmap(False, current_width, current_height,
                                       template_index, False, None, at, ctx)
            new_symbols.append(bitmap)
    # 6.5.10 exported symbols
    flags: list[bool] = []
    current_flag = False
    total = len(symbols) + n_new
    while len(flags) < total:
        run = decode_integer(cache, "IAEX", decoder)
        flags.extend([current_flag] * run)
        current_flag = not current_flag
    exported = [s for s, f in zip(symbols, flags[:len(symbols)]) if f]
    exported += [s for s, f in zip(new_symbols, flags[len(symbols):]) if f]
    return exported


def decode_text_region(huffman: bool, refinement: bool, width: int,
                       height: int, default_pixel: int, n_instances: int,
                       strip_size: int, input_symbols, symbol_code_length,
                       transposed, ds_offset, reference_corner,
                       combination_operator, r_template, r_at,
                       ctx: DecodingContext) -> list[bytearray]:
    """6.4 text region decoding (reference decodeTextRegion,
    pdf.combined.js:10063).  Out-of-region symbol pixels are clipped
    (typed-array writes out of bounds are no-ops in the reference)."""
    if huffman:
        raise PdfError("JBIG2: huffman is not supported")
    bitmap = [bytearray([default_pixel] * width) if default_pixel
              else bytearray(width) for _ in range(height)]
    decoder = ctx.decoder
    cache = ctx.cache
    strip_t = -decode_integer(cache, "IADT", decoder)
    first_s = 0
    i = 0
    while i < n_instances:
        strip_t += decode_integer(cache, "IADT", decoder)
        first_s += decode_integer(cache, "IAFS", decoder)
        current_s = first_s
        while True:
            current_t = (0 if strip_size == 1
                         else decode_integer(cache, "IAIT", decoder))
            t = strip_size * strip_t + current_t
            sym_id = decode_iaid(cache, decoder, symbol_code_length)
            apply_ref = refinement and decode_integer(cache, "IARI", decoder)
            symbol = input_symbols[sym_id]
            sym_w = len(symbol[0]) if symbol else 0
            sym_h = len(symbol)
            if apply_ref:
                rdw = decode_integer(cache, "IARDW", decoder)
                rdh = decode_integer(cache, "IARDH", decoder)
                rdx = decode_integer(cache, "IARDX", decoder)
                rdy = decode_integer(cache, "IARDY", decoder)
                sym_w += rdw
                sym_h += rdh
                symbol = decode_refinement(
                    sym_w, sym_h, r_template, symbol, (rdw >> 1) + rdx,
                    (rdh >> 1) + rdy, False, r_at, ctx)
            offset_t = t - (0 if (reference_corner & 1) else sym_h)
            offset_s = current_s - (sym_w if (reference_corner & 2) else 0)
            if transposed:
                for s2 in range(sym_h):
                    ri = offset_s + s2
                    if not (0 <= ri < height):
                        continue
                    row = bitmap[ri]
                    sym_row = symbol[s2]
                    max_w = min(width - offset_t, sym_w)
                    if combination_operator == 0:
                        for t2 in range(max(0, -offset_t), max_w):
                            row[offset_t + t2] |= sym_row[t2]
                    elif combination_operator == 2:
                        for t2 in range(max(0, -offset_t), max_w):
                            row[offset_t + t2] ^= sym_row[t2]
                    else:
                        raise PdfError("JBIG2: operator %d is not supported"
                                       % combination_operator)
                current_s += sym_h - 1
            else:
                for t2 in range(sym_h):
                    ri = offset_t + t2
                    if not (0 <= ri < height):
                        continue
                    row = bitmap[ri]
                    sym_row = symbol[t2]
                    if combination_operator == 0:
                        for s2 in range(max(0, -offset_s),
                                        min(sym_w, width - offset_s)):
                            row[offset_s + s2] |= sym_row[s2]
                    elif combination_operator == 2:
                        for s2 in range(max(0, -offset_s),
                                        min(sym_w, width - offset_s)):
                            row[offset_s + s2] ^= sym_row[s2]
                    else:
                        raise PdfError("JBIG2: operator %d is not supported"
                                       % combination_operator)
                current_s += sym_w - 1
            i += 1
            delta_s = decode_integer(cache, "IADS", decoder)
            if delta_s is None:
                break  # OOB
            current_s += delta_s + ds_offset
    return bitmap


# ------------------------------------------------------------- segments

_SEGMENT_TYPES = {0: "SymbolDictionary", 4: "IntermediateTextRegion",
                  6: "ImmediateTextRegion", 7: "ImmediateLosslessTextRegion",
                  16: "PatternDictionary", 20: "IntermediateHalftoneRegion",
                  22: "ImmediateHalftoneRegion",
                  23: "ImmediateLosslessHalftoneRegion",
                  36: "IntermediateGenericRegion",
                  38: "ImmediateGenericRegion",
                  39: "ImmediateLosslessGenericRegion",
                  40: "IntermediateGenericRefinementRegion",
                  42: "ImmediateGenericRefinementRegion",
                  43: "ImmediateLosslessGenericRefinementRegion",
                  48: "PageInformation", 49: "EndOfPage", 50: "EndOfStripe",
                  51: "EndOfFile", 52: "Profiles", 53: "Tables",
                  62: "Extension"}

_REGION_INFO_LEN = 17


def _u32(data, p):
    return (data[p] << 24) | (data[p + 1] << 16) | (data[p + 2] << 8) | \
        data[p + 3]


def _u16(data, p):
    return (data[p] << 8) | data[p + 1]


def _i8(data, p):
    v = data[p]
    return v - 256 if v >= 128 else v


def _read_region_info(data, p):
    return {"width": _u32(data, p), "height": _u32(data, p + 4),
            "x": _u32(data, p + 8), "y": _u32(data, p + 12),
            "combination_operator": data[p + 16] & 7}


def read_segment_header(data, start: int) -> dict:
    """7.2 (reference readSegmentHeader, pdf.combined.js:10191)."""
    h = {"number": _u32(data, start)}
    flags = data[start + 4]
    seg_type = flags & 0x3F
    if seg_type not in _SEGMENT_TYPES:
        raise PdfError("JBIG2: invalid segment type %d" % seg_type)
    h["type"] = seg_type
    page_assoc_4 = bool(flags & 0x40)
    referred_flags = data[start + 5]
    referred_count = (referred_flags >> 5) & 7
    position = start + 6
    if referred_flags == 7:
        referred_count = _u32(data, position - 1) & 0x1FFFFFFF
        position += 3
        position += (referred_count + 7) >> 3
    elif referred_flags in (5, 6):
        raise PdfError("JBIG2: invalid referred-to flags")
    size = 1 if h["number"] <= 256 else (2 if h["number"] <= 65536 else 4)
    referred = []
    for _ in range(referred_count):
        if size == 1:
            referred.append(data[position])
        elif size == 2:
            referred.append(_u16(data, position))
        else:
            referred.append(_u32(data, position))
        position += size
    h["referred_to"] = referred
    if not page_assoc_4:
        h["page_association"] = data[position]
        position += 1
    else:
        h["page_association"] = _u32(data, position)
        position += 4
    h["length"] = _u32(data, position)
    position += 4
    if h["length"] == 0xFFFFFFFF:
        # 7.2.7 unknown length: only for immediate generic regions; scan
        # for the row-count terminator (reference :10240)
        if seg_type != 38:
            raise PdfError("JBIG2: invalid unknown segment length")
        info = _read_region_info(data, position)
        seg_flags = data[position + _REGION_INFO_LEN]
        mmr = bool(seg_flags & 1)
        pattern = bytearray(6)
        if not mmr:
            pattern[0] = 0xFF
            pattern[1] = 0xAC
        pattern[2] = (info["height"] >> 24) & 0xFF
        pattern[3] = (info["height"] >> 16) & 0xFF
        pattern[4] = (info["height"] >> 8) & 0xFF
        pattern[5] = info["height"] & 0xFF
        idx = bytes(data).find(bytes(pattern), position)
        if idx < 0:
            raise PdfError("JBIG2: segment end was not found")
        # the reference stores the absolute end offset here and then
        # re-adds it as a length (readSegments :10290) — a latent bug for
        # unknown-length segments; we store the actual relative length
        h["length"] = idx + len(pattern) - position
    h["header_end"] = position
    return h


def read_segments(data, start: int, end: int) -> list[dict]:
    segments = []
    position = start
    while position < end:
        h = read_segment_header(data, position)
        position = h["header_end"]
        seg = {"header": h, "data": data, "start": position,
               "end": position + h["length"]}
        position = seg["end"]
        segments.append(seg)
        if h["type"] == 51:
            break
    return segments


class PageVisitor:
    """reference SimpleSegmentVisitor (pdf.combined.js:10521): composes
    region bitmaps into one packed 1-bpp page buffer."""

    def __init__(self):
        self.page_info = None
        self.buffer = None
        self.symbols: dict[int, list] = {}

    def on_page_information(self, info):
        self.page_info = info
        row_size = (info["width"] + 7) >> 3
        height = info.get("height")
        if height is None:
            raise PdfError("JBIG2: unknown page height is not supported")
        if row_size * height > 1 << 28:
            raise PdfError("JBIG2: unreasonable page size")
        self.buffer = bytearray(row_size * height)
        if info["default_pixel_value"]:
            for i in range(len(self.buffer)):
                self.buffer[i] = 0xFF

    def draw_bitmap(self, region_info, bitmap):
        info = self.page_info
        width = region_info["width"]
        height = region_info["height"]
        row_size = (info["width"] + 7) >> 3
        op = (region_info["combination_operator"]
              if info["combination_operator_override"]
              else info["combination_operator"])
        if op not in (0, 2):
            raise PdfError("JBIG2: operator %d is not supported" % op)
        buf = self.buffer
        n = len(buf)
        for i in range(height):
            mask = 128 >> (region_info["x"] & 7)
            offset = (region_info["y"] + i) * row_size + \
                (region_info["x"] >> 3)
            row = bitmap[i]
            for j in range(width):
                if row[j] and 0 <= offset < n:
                    if op == 0:
                        buf[offset] |= mask
                    else:
                        buf[offset] ^= mask
                mask >>= 1
                if not mask:
                    mask = 128
                    offset += 1

    def process(self, segment):
        h = segment["header"]
        data = segment["data"]
        position = segment["start"]
        end = segment["end"]
        t = h["type"]
        if t == 0:
            self._on_symbol_dictionary(h, data, position, end)
        elif t in (6, 7):
            self._on_text_region(h, data, position, end)
        elif t in (38, 39):
            self._on_generic_region(h, data, position, end)
        elif t == 48:
            self._on_page_information(data, position)
        elif t in (49, 50, 51, 62):
            pass
        else:
            raise PdfError("JBIG2: segment type %s (%d) is not implemented"
                           % (_SEGMENT_TYPES[t], t))

    def _on_page_information(self, data, position):
        info = {"width": _u32(data, position),
                "height": _u32(data, position + 4)}
        if info["height"] == 0xFFFFFFFF:
            info["height"] = None
        flags = data[position + 16]
        info["default_pixel_value"] = (flags >> 2) & 1
        info["combination_operator"] = (flags >> 3) & 3
        info["combination_operator_override"] = bool(flags & 64)
        self.on_page_information(info)

    def _on_generic_region(self, h, data, position, end):
        info = _read_region_info(data, position)
        position += _REGION_INFO_LEN
        flags = data[position]
        position += 1
        mmr = bool(flags & 1)
        template = (flags >> 1) & 3
        prediction = bool(flags & 8)
        at = []
        if not mmr:
            for _ in range(4 if template == 0 else 1):
                at.append((_i8(data, position), _i8(data, position + 1)))
                position += 2
        ctx = DecodingContext(data, position, end)
        bitmap = decode_bitmap(mmr, info["width"], info["height"], template,
                               prediction, None, at, ctx)
        self.draw_bitmap(info, bitmap)

    def _on_symbol_dictionary(self, h, data, position, end):
        flags = _u16(data, position)
        position += 2
        huffman = bool(flags & 1)
        refinement = bool(flags & 2)
        template = (flags >> 10) & 3
        r_template = (flags >> 12) & 1
        if huffman:
            raise PdfError("JBIG2: huffman is not supported")
        at = []
        for _ in range(4 if template == 0 else 1):
            at.append((_i8(data, position), _i8(data, position + 1)))
            position += 2
        r_at = []
        if refinement and not r_template:
            for _ in range(2):
                r_at.append((_i8(data, position), _i8(data, position + 1)))
                position += 2
        n_exported = _u32(data, position)
        position += 4
        n_new = _u32(data, position)
        position += 4
        input_symbols: list = []
        for ref in h["referred_to"]:
            input_symbols = input_symbols + self.symbols.get(ref, [])
        ctx = DecodingContext(data, position, end)
        self.symbols[h["number"]] = decode_symbol_dictionary(
            huffman, refinement, input_symbols, n_new, n_exported,
            template, at, r_template, r_at, ctx)

    def _on_text_region(self, h, data, position, end):
        info = _read_region_info(data, position)
        position += _REGION_INFO_LEN
        flags = _u16(data, position)
        position += 2
        huffman = bool(flags & 1)
        refinement = bool(flags & 2)
        strip_size = 1 << ((flags >> 2) & 3)
        reference_corner = (flags >> 4) & 3
        transposed = bool(flags & 64)
        combination_operator = (flags >> 7) & 3
        default_pixel = (flags >> 9) & 1
        # signed 5-bit field (bits 10-14); the reference extracts it with
        # (flags << 17) >> 27 on int32
        ds_offset = (flags >> 10) & 31
        if ds_offset >= 16:
            ds_offset -= 32
        r_template = (flags >> 15) & 1
        if huffman:
            raise PdfError("JBIG2: huffman is not supported")
        r_at = []
        if refinement and not r_template:
            for _ in range(2):
                r_at.append((_i8(data, position), _i8(data, position + 1)))
                position += 2
        n_instances = _u32(data, position)
        position += 4
        input_symbols: list = []
        for ref in h["referred_to"]:
            input_symbols = input_symbols + self.symbols.get(ref, [])
        symbol_code_length = _log2(len(input_symbols))
        ctx = DecodingContext(data, position, end)
        bitmap = decode_text_region(
            huffman, refinement, info["width"], info["height"],
            default_pixel, n_instances, strip_size, input_symbols,
            symbol_code_length, transposed, ds_offset, reference_corner,
            combination_operator, r_template, r_at, ctx)
        self.draw_bitmap(info, bitmap)


def parse_chunks(chunks) -> tuple[bytearray, int, int]:
    """reference parseJbig2Chunks (pdf.combined.js:10511): returns
    (packed 1-bpp page buffer, page width, page height)."""
    visitor = PageVisitor()
    for chunk in chunks:
        for segment in read_segments(chunk["data"], chunk["start"],
                                     chunk["end"]):
            visitor.process(segment)
    if visitor.buffer is None or visitor.page_info is None:
        raise PdfError("JBIG2: no page information segment")
    return (visitor.buffer, visitor.page_info["width"],
            visitor.page_info["height"])


def jbig2_decode(data: bytes, globals_data: bytes | None = None
                 ) -> tuple[bytes, int, int]:
    """Embedded-PDF JBIG2 stream -> (packed rows inverted to 1-bpc gray,
    width, height); reference Jbig2Stream.ensureBuffer
    (pdf.combined.js:22549) including the black=1 -> black=0 inversion."""
    chunks = []
    if globals_data:
        chunks.append({"data": globals_data, "start": 0,
                       "end": len(globals_data)})
    chunks.append({"data": data, "start": 0, "end": len(data)})
    buf, width, height = parse_chunks(chunks)
    return bytes(bytearray(b ^ 0xFF for b in buf)), width, height


# -------------------------------------------------- MQ encoder (fixtures)

class MQEncoder:
    """T.88 Annex E encoder, software conventions (the OpenJPEG/jbig2enc
    flowcharts).  Only used to build round-trip test fixtures — PDFs are
    never *written* with JBIG2 payloads by this engine."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray()      # out[0] is the scratch byte (B(-1))
        self.out.append(0)

    def encode_bit(self, contexts: bytearray, pos: int, d: int):
        cx = contexts[pos]
        index = cx >> 1
        mps = cx & 1
        qe, nmps, nlps, switch = _QE[index]
        if d == mps:
            # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
            else:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                contexts[pos] = (nmps << 1) | mps
                self._renorm()
        else:
            # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                mps = 1 - mps
            contexts[pos] = (nlps << 1) | mps
            self._renorm()

    def _renorm(self):
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byte_out()
            if self.a & 0x8000:
                break

    def _byte_out(self):
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8
            else:
                self.out[-1] += 1           # carry
                if self.out[-1] == 0xFF:
                    self.c &= 0x7FFFFFF
                    self.out.append((self.c >> 20) & 0xFF)
                    self.c &= 0xFFFFF
                    self.ct = 7
                else:
                    self.out.append((self.c >> 19) & 0xFF)
                    self.c &= 0x7FFFF
                    self.ct = 8

    def flush(self) -> bytes:
        # SETBITS
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byte_out()
        self.c <<= self.ct
        self._byte_out()
        data = self.out[1:]                 # drop the scratch byte
        while data and data[-1] == 0xFF:    # trailing stuff bytes optional
            data.pop()
        return bytes(data)


class EncodingContext:
    def __init__(self):
        self.encoder = MQEncoder()
        self.cache = ContextCache()


def encode_integer(ectx: EncodingContext, procedure: str, value):
    """Inverse of decode_integer (value=None encodes OOB)."""
    contexts = ectx.cache.contexts(procedure)
    enc = ectx.encoder
    prev = 1

    def put_bits(v: int, length: int):
        nonlocal prev
        for k in range(length - 1, -1, -1):
            bit = (v >> k) & 1
            enc.encode_bit(contexts, prev, bit)
            prev = ((prev << 1) | bit) if prev < 256 else \
                ((((prev << 1) | bit) & 511) | 256)

    if value is None:
        sign, mag = 1, 0
    elif value < 0:
        sign, mag = 1, -value
    else:
        sign, mag = 0, value
    put_bits(sign, 1)
    if mag < 4:
        put_bits(0, 1)
        put_bits(mag, 2)
    elif mag < 20:
        put_bits(1, 1)
        put_bits(0, 1)
        put_bits(mag - 4, 4)
    elif mag < 84:
        put_bits(1, 1)
        put_bits(1, 1)
        put_bits(0, 1)
        put_bits(mag - 20, 6)
    elif mag < 340:
        put_bits(1, 1)
        put_bits(1, 1)
        put_bits(1, 1)
        put_bits(0, 1)
        put_bits(mag - 84, 8)
    elif mag < 4436:
        put_bits(1, 1)
        put_bits(1, 1)
        put_bits(1, 1)
        put_bits(1, 1)
        put_bits(0, 1)
        put_bits(mag - 340, 12)
    else:
        put_bits(1, 1)
        put_bits(1, 1)
        put_bits(1, 1)
        put_bits(1, 1)
        put_bits(1, 1)
        put_bits(mag - 4436, 32)


def encode_iaid(ectx: EncodingContext, code_length: int, value: int):
    contexts = ectx.cache.contexts("IAID")
    enc = ectx.encoder
    prev = 1
    for k in range(code_length - 1, -1, -1):
        bit = (value >> k) & 1
        enc.encode_bit(contexts, prev, bit)
        prev = (prev << 1) | bit


def encode_bitmap(bitmap, template_index: int, at,
                  ectx: EncodingContext, procedure: str = "GB",
                  prediction: bool = False):
    """Generic-region encode: same template/context formation as
    decode_bitmap (so the pair round-trips through any T.88 decoder that
    uses the reference's sorted-template labeling).  With ``prediction``
    (TPGDON) identical consecutive rows are coded as LTP duplicates via
    the pseudo-pixel context."""
    height = len(bitmap)
    width = len(bitmap[0]) if height else 0
    template = _sorted_template(template_index, at)
    tlen = len(template)
    contexts = ectx.cache.contexts(procedure)
    enc = ectx.encoder
    pseudo = _REUSED_CONTEXTS[template_index]
    ltp = 0
    for i in range(height):
        if prediction:
            same = (bitmap[i] == bitmap[i - 1] if i > 0
                    else not any(bitmap[i]))
            want = 1 if same else 0
            enc.encode_bit(contexts, pseudo, ltp ^ want)
            ltp = want
            if ltp:
                continue
        for j in range(width):
            label = 0
            shift = tlen - 1
            for (tx, ty) in template:
                j0 = j + tx
                if 0 <= j0 < width:
                    i0 = i + ty
                    if 0 <= i0 < height and (i0 < i or j0 < j):
                        if bitmap[i0][j0]:
                            label |= 1 << shift
                shift -= 1
            enc.encode_bit(contexts, label, 1 if bitmap[i][j] else 0)


# ----------------------------------------- fixture segment construction

def _segment_header(number: int, seg_type: int, referred: list[int],
                    page: int, length: int) -> bytes:
    out = bytearray()
    out += number.to_bytes(4, "big")
    out.append(seg_type & 0x3F)
    if len(referred) > 4:
        raise PdfError("fixture: too many referred segments")
    out.append(len(referred) << 5)
    for r in referred:
        out.append(r)            # segment numbers stay < 256 in fixtures
    out.append(page)
    out += length.to_bytes(4, "big")
    return bytes(out)


def build_generic_region_stream(bitmap, template_index: int = 0,
                                prediction: bool = False) -> bytes:
    """Embedded-style JBIG2 chunk: PageInformation + one
    ImmediateGenericRegion holding ``bitmap`` (rows of 0/1)."""
    height = len(bitmap)
    width = len(bitmap[0]) if height else 0
    at = _NOMINAL_AT[:4 if template_index == 0 else 1]
    ectx = EncodingContext()
    encode_bitmap(bitmap, template_index, at, ectx, prediction=prediction)
    payload = ectx.encoder.flush()

    page = bytearray()
    page += width.to_bytes(4, "big") + height.to_bytes(4, "big")
    page += (0).to_bytes(4, "big") + (0).to_bytes(4, "big")  # resolution
    page.append(0)               # flags: default pixel 0, OR composition
    page += (0).to_bytes(2, "big")   # striping information

    region = bytearray()
    region += width.to_bytes(4, "big") + height.to_bytes(4, "big")
    region += (0).to_bytes(4, "big") + (0).to_bytes(4, "big")  # x, y
    region.append(0)             # external combination operator: OR
    region.append((template_index << 1) |
                  (8 if prediction else 0))   # flags: MMR=0, TPGDON bit 3
    for (ax, ay) in at:
        region.append(ax & 0xFF)
        region.append(ay & 0xFF)
    region += payload

    out = bytearray()
    out += _segment_header(0, 48, [], 1, len(page)) + page
    out += _segment_header(1, 38, [], 1, len(region)) + bytes(region)
    return bytes(out)


def build_symbol_text_stream(symbols, placements, width: int,
                             height: int, split_globals: bool = False):
    """Embedded-style chunk: PageInformation + SymbolDictionary (direct
    arithmetic coding, all symbols exported, sorted by height class) +
    ImmediateTextRegion placing ``placements`` = [(sym_index, s, t), ...]
    with reference corner TOPLEFT.  With ``split_globals`` the symbol
    dictionary goes into a separate JBIG2Globals-style chunk (the layout
    real PDFs use) and (globals, data) is returned."""
    at = _NOMINAL_AT
    ectx = EncodingContext()
    # --- symbol dictionary data (6.5.5 inverse)
    current_height = 0
    by_height: dict[int, list[tuple[int, list]]] = {}
    for idx, sym in enumerate(symbols):
        by_height.setdefault(len(sym), []).append((idx, sym))
    order: list[int] = []      # dictionary order -> original index
    for h in sorted(by_height):
        encode_integer(ectx, "IADH", h - current_height)
        current_height = h
        current_width = 0
        for idx, sym in by_height[h]:
            w = len(sym[0])
            encode_integer(ectx, "IADW", w - current_width)
            current_width = w
            encode_bitmap(sym, 0, at, ectx)
            order.append(idx)
        encode_integer(ectx, "IADW", None)   # OOB ends the height class
    # export all symbols: run of 0 non-exported, then run of all exported
    encode_integer(ectx, "IAEX", 0)
    encode_integer(ectx, "IAEX", len(symbols))
    dict_payload = ectx.encoder.flush()

    dict_seg = bytearray()
    dict_seg += (0).to_bytes(2, "big")       # flags: arithmetic, template 0
    for (ax, ay) in at:
        dict_seg.append(ax & 0xFF)
        dict_seg.append(ay & 0xFF)
    dict_seg += len(symbols).to_bytes(4, "big")   # exported
    dict_seg += len(symbols).to_bytes(4, "big")   # new
    dict_seg += dict_payload

    # --- text region data (6.4 inverse), strip size 1, corner TOPLEFT(1)
    code_length = _log2(len(symbols))
    remap = {orig: pos for pos, orig in enumerate(order)}
    ectx2 = EncodingContext()
    placements = sorted(((t, s, sym) for sym, s, t in placements))
    # decode does: stripT = -IADT0; per strip stripT += IADT;
    # firstS += IAFS; per later symbol currentS += (symW-1) + IADS
    encode_integer(ectx2, "IADT", 0)        # initial stripT = 0
    strip_t = 0
    first_s = 0
    i = 0
    while i < len(placements):
        t = placements[i][0]
        strip = [p for p in placements[i:] if p[0] == t]
        encode_integer(ectx2, "IADT", t - strip_t)
        strip_t = t
        prev_s = None
        for k, (_, s, sym_idx) in enumerate(strip):
            if k == 0:
                encode_integer(ectx2, "IAFS", s - first_s)
                first_s = s
            else:
                prev_w = len(symbols[strip[k - 1][2]][0])
                encode_integer(ectx2, "IADS", s - prev_s - (prev_w - 1))
            encode_iaid(ectx2, code_length, remap[sym_idx])
            prev_s = s
        encode_integer(ectx2, "IADS", None)          # OOB: end of strip
        i += len(strip)
    text_payload = ectx2.encoder.flush()

    text_seg = bytearray()
    text_seg += width.to_bytes(4, "big") + height.to_bytes(4, "big")
    text_seg += (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
    text_seg.append(0)                               # region op OR
    # flags: huffman=0, refine=0, stripSize log=0, refCorner=1 (TOPLEFT),
    # transposed=0, combOp=0, defPixel=0, dsOffset=0, rTemplate=0
    text_seg += (1 << 4).to_bytes(2, "big")
    text_seg += len(placements).to_bytes(4, "big")
    text_seg += text_payload

    page = bytearray()
    page += width.to_bytes(4, "big") + height.to_bytes(4, "big")
    page += (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
    page.append(0)
    page += (0).to_bytes(2, "big")

    dict_bytes = _segment_header(1, 0, [], 1, len(dict_seg)) + \
        bytes(dict_seg)
    page_bytes = _segment_header(0, 48, [], 1, len(page)) + bytes(page)
    text_bytes = _segment_header(2, 6, [1], 1, len(text_seg)) + \
        bytes(text_seg)
    if split_globals:
        return dict_bytes, page_bytes + text_bytes
    return page_bytes + dict_bytes + text_bytes


def encode_refinement_bitmap(bitmap, reference, dx: int, dy: int, r_at,
                             ectx: EncodingContext,
                             template_index: int = 0):
    """Refinement encode mirroring decode_refinement's context
    formation (GR contexts, template 0 + the two AT pixels)."""
    coding = list(_REFINEMENT_TEMPLATES[template_index]["coding"])
    ref_t = list(_REFINEMENT_TEMPLATES[template_index]["reference"])
    if template_index == 0:
        coding = coding + [tuple(r_at[0])]
        ref_t = ref_t + [tuple(r_at[1])]
    height = len(bitmap)
    width = len(bitmap[0]) if height else 0
    ref_h = len(reference)
    ref_w = len(reference[0]) if ref_h else 0
    contexts = ectx.cache.contexts("GR")
    enc = ectx.encoder
    for i in range(height):
        for j in range(width):
            label = 0
            for (tx, ty) in coding:
                i0 = i + ty
                j0 = j + tx
                if i0 < 0 or j0 < 0 or j0 >= width:
                    label <<= 1
                else:
                    # the decoder's own bitmap holds zeros at cells it
                    # has not written yet (current row right of j)
                    v = bitmap[i0][j0] if (i0 < i or
                                           (i0 == i and j0 < j)) else 0
                    label = (label << 1) | (1 if v else 0)
            for (tx, ty) in ref_t:
                i0 = i + ty + dy
                j0 = j + tx + dx
                if i0 < 0 or i0 >= ref_h or j0 < 0 or j0 >= ref_w:
                    label <<= 1
                else:
                    label = (label << 1) | (1 if reference[i0][j0] else 0)
            enc.encode_bit(contexts, label, 1 if bitmap[i][j] else 0)


_NOMINAL_R_AT = ((-1, -1), (-1, -1))


def build_refined_symbol_stream(base_symbols, refined, placements,
                                width: int, height: int) -> bytes:
    """Embedded-style chunk exercising the refinement paths:
    PageInformation + dictionary A (direct-coded ``base_symbols``) +
    dictionary B (refinement-coded: ``refined`` = [(base_index, bitmap,
    rdx, rdy), ...], same sizes as their bases, sorted by height) +
    ImmediateTextRegion placing dictionary B's symbols."""
    at = _NOMINAL_AT
    # --- dictionary A: direct
    ectx = EncodingContext()
    current_height = 0
    by_height: dict[int, list] = {}
    for idx, sym in enumerate(base_symbols):
        by_height.setdefault(len(sym), []).append((idx, sym))
    a_order = []
    for h in sorted(by_height):
        encode_integer(ectx, "IADH", h - current_height)
        current_height = h
        current_width = 0
        for idx, sym in by_height[h]:
            w = len(sym[0])
            encode_integer(ectx, "IADW", w - current_width)
            current_width = w
            encode_bitmap(sym, 0, at, ectx)
            a_order.append(idx)
        encode_integer(ectx, "IADW", None)
    encode_integer(ectx, "IAEX", 0)
    encode_integer(ectx, "IAEX", len(base_symbols))
    dict_a = bytearray()
    dict_a += (0).to_bytes(2, "big")
    for (ax, ay) in at:
        dict_a.append(ax & 0xFF)
        dict_a.append(ay & 0xFF)
    dict_a += len(base_symbols).to_bytes(4, "big")
    dict_a += len(base_symbols).to_bytes(4, "big")
    dict_a += ectx.encoder.flush()
    a_remap = {orig: pos for pos, orig in enumerate(a_order)}

    # --- dictionary B: refinement-coded, refers to A
    n_input = len(base_symbols)
    code_length = _log2(n_input + len(refined))
    ectx2 = EncodingContext()
    current_height = 0
    by_height2: dict[int, list] = {}
    for idx, (base_idx, sym, rdx, rdy) in enumerate(refined):
        by_height2.setdefault(len(sym), []).append((idx, base_idx, sym,
                                                    rdx, rdy))
    b_order = []
    for h in sorted(by_height2):
        encode_integer(ectx2, "IADH", h - current_height)
        current_height = h
        current_width = 0
        for idx, base_idx, sym, rdx, rdy in by_height2[h]:
            w = len(sym[0])
            encode_integer(ectx2, "IADW", w - current_width)
            current_width = w
            encode_integer(ectx2, "IAAI", 1)      # single instance
            encode_iaid(ectx2, code_length, a_remap[base_idx])
            encode_integer(ectx2, "IARDX", rdx)
            encode_integer(ectx2, "IARDY", rdy)
            base = base_symbols[base_idx]
            encode_refinement_bitmap(sym, base, rdx, rdy, _NOMINAL_R_AT,
                                     ectx2)
            b_order.append(idx)
        encode_integer(ectx2, "IADW", None)
    # export only the new (refined) symbols
    encode_integer(ectx2, "IAEX", n_input)
    encode_integer(ectx2, "IAEX", len(refined))
    dict_b = bytearray()
    # flags: refinement (bit 1), template 0, refinement template 0
    dict_b += (2).to_bytes(2, "big")
    for (ax, ay) in at:
        dict_b.append(ax & 0xFF)
        dict_b.append(ay & 0xFF)
    for (ax, ay) in _NOMINAL_R_AT:
        dict_b.append(ax & 0xFF)
        dict_b.append(ay & 0xFF)
    dict_b += len(refined).to_bytes(4, "big")
    dict_b += len(refined).to_bytes(4, "big")
    dict_b += ectx2.encoder.flush()
    b_remap = {orig: pos for pos, orig in enumerate(b_order)}

    # --- text region over dictionary B (strip size 1, TOPLEFT)
    tr_code_length = _log2(len(refined))
    ectx3 = EncodingContext()
    placements = sorted(((t, s, sym) for sym, s, t in placements))
    encode_integer(ectx3, "IADT", 0)
    strip_t = 0
    first_s = 0
    i = 0
    while i < len(placements):
        t = placements[i][0]
        strip = [p for p in placements[i:] if p[0] == t]
        encode_integer(ectx3, "IADT", t - strip_t)
        strip_t = t
        prev_s = None
        for k, (_, s, sym_idx) in enumerate(strip):
            if k == 0:
                encode_integer(ectx3, "IAFS", s - first_s)
                first_s = s
            else:
                prev_w = len(refined[strip[k - 1][2]][1][0])
                encode_integer(ectx3, "IADS", s - prev_s - (prev_w - 1))
            encode_iaid(ectx3, tr_code_length, b_remap[sym_idx])
            prev_s = s
        encode_integer(ectx3, "IADS", None)
        i += len(strip)
    text_seg = bytearray()
    text_seg += width.to_bytes(4, "big") + height.to_bytes(4, "big")
    text_seg += (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
    text_seg.append(0)
    text_seg += (1 << 4).to_bytes(2, "big")
    text_seg += len(placements).to_bytes(4, "big")
    text_seg += ectx3.encoder.flush()

    page = bytearray()
    page += width.to_bytes(4, "big") + height.to_bytes(4, "big")
    page += (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
    page.append(0)
    page += (0).to_bytes(2, "big")

    out = bytearray()
    out += _segment_header(0, 48, [], 1, len(page)) + bytes(page)
    out += _segment_header(1, 0, [], 1, len(dict_a)) + bytes(dict_a)
    out += _segment_header(2, 0, [1], 1, len(dict_b)) + bytes(dict_b)
    out += _segment_header(3, 6, [2], 1, len(text_seg)) + bytes(text_seg)
    return bytes(out)
