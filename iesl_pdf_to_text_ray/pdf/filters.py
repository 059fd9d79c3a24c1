"""Stream filters: Flate(+predictor), LZW, ASCII85, ASCIIHex, RunLength.

Image-only codecs (DCT/JPX/JBIG2/CCITTFax) are passed through undecoded
here — the extraction contract only needs media identity (media_ref).
Pixel materialization (pdf/images.py) decodes CCITT via pdf/ccitt.py,
JBIG2 via pdf/jbig2.py and JPEG 2000 via pdf/jpx.py, and passes JPEG
through.

Behavioral reference: pdf.js stream filters (/root/reference/src/main/js/
pdf.combined.js:21518-24001); implemented from the public filter specs.
"""

from __future__ import annotations

import zlib

from .objects import Name, Stream

IMAGE_FILTERS = {"DCTDecode", "DCT", "JPXDecode", "JBIG2Decode",
                 "CCITTFaxDecode", "CCF"}


def apply_predictor(data: bytes, params: dict) -> bytes:
    predictor = params.get("Predictor", 1)
    if not isinstance(predictor, int) or predictor <= 1:
        return data
    colors = params.get("Colors", 1) or 1
    bpc = params.get("BitsPerComponent", 8) or 8
    columns = params.get("Columns", 1) or 1
    bpp = max(1, (colors * bpc) // 8)          # bytes per pixel
    row_bytes = (columns * colors * bpc + 7) // 8
    if predictor == 2:  # TIFF horizontal differencing (8-bit path)
        if bpc == 8:
            out = bytearray(data)
            for r in range(0, len(out), row_bytes):
                for i in range(r + bpp, min(r + row_bytes, len(out))):
                    out[i] = (out[i] + out[i - bpp]) & 0xFF
            return bytes(out)
        return data
    # PNG predictors: each row prefixed with a filter-type byte
    out = bytearray()
    prev = bytearray(row_bytes)
    pos = 0
    n = len(data)
    while pos + 1 <= n:
        ft = data[pos]
        pos += 1
        row = bytearray(data[pos:pos + row_bytes])
        pos += row_bytes
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, len(row)):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(len(row)):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        out += row
        prev = row
    return bytes(out)


def flate_decode(data: bytes) -> bytes:
    try:
        return zlib.decompress(data)
    except zlib.error:
        # tolerate truncated / trailing-garbage streams
        d = zlib.decompressobj()
        try:
            return d.decompress(data)
        except zlib.error:
            # skip possibly-corrupt leading bytes (broken encoders)
            for skip in (1, 2):
                try:
                    return zlib.decompressobj().decompress(data[skip:])
                except zlib.error:
                    continue
            raise


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    out = bytearray()
    dict_size = 258
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    bit_buf = 0
    bit_len = 0
    code_len = 9
    prev: bytes | None = None
    for byte in data:
        bit_buf = (bit_buf << 8) | byte
        bit_len += 8
        while bit_len >= code_len:
            code = (bit_buf >> (bit_len - code_len)) & ((1 << code_len) - 1)
            bit_len -= code_len
            if code == 256:  # clear
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                dict_size = 258
                code_len = 9
                prev = None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table) and code != dict_size:
                entry = table[code]
                table.append(prev + entry[:1])
                dict_size += 1
            else:
                entry = prev + prev[:1]
                table.append(entry)
                dict_size += 1
            out += entry
            prev = entry
            if dict_size + early_change >= (1 << code_len) and code_len < 12:
                code_len += 1
    return bytes(out)


def ascii85_decode(data: bytes) -> bytes:
    out = bytearray()
    group = []
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c in b" \t\r\n\x0c\x00":
            continue
        if c == 0x7E:  # '~' EOD
            break
        if c == 0x7A and not group:  # 'z' => four zero bytes
            out += b"\x00\x00\x00\x00"
            continue
        group.append(c - 33)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            out += v.to_bytes(4, "big")
            group = []
    if group:
        k = len(group)
        group += [84] * (5 - k)
        v = 0
        for g in group:
            v = v * 85 + g
        out += v.to_bytes(4, "big")[:k - 1]
    return bytes(out)


def asciihex_decode(data: bytes) -> bytes:
    digits = [chr(b) for b in data
              if chr(b) in "0123456789abcdefABCDEF"]
    if len(digits) % 2:
        digits.append("0")
    return bytes(int(digits[i] + digits[i + 1], 16)
                 for i in range(0, len(digits), 2))


def rle_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        l = data[i]
        i += 1
        if l == 128:
            break
        if l < 128:
            out += data[i:i + l + 1]
            i += l + 1
        else:
            if i < n:
                out += bytes([data[i]]) * (257 - l)
                i += 1
    return bytes(out)


def _as_list(v):
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def decode_stream(stream: Stream, xref=None) -> bytes:
    """Decode all non-image filters; image codecs halt decoding (raw out)."""
    if stream._decoded is not None:
        return stream._decoded
    d = stream.dict
    fetch = (xref.fetch_if_ref if xref is not None else (lambda v: v))
    filters = _as_list(fetch(d.get("Filter") or d.get("F")))
    params_list = _as_list(fetch(d.get("DecodeParms") or d.get("DP")))
    data = stream.raw
    for i, f in enumerate(filters):
        fname = str(f) if isinstance(f, (Name, str)) else ""
        params = fetch(params_list[i]) if i < len(params_list) else None
        params = params if isinstance(params, dict) else {}
        params = {k: fetch(v) for k, v in params.items()}
        if fname in ("FlateDecode", "Fl"):
            data = apply_predictor(flate_decode(data), params)
        elif fname in ("LZWDecode", "LZW"):
            data = apply_predictor(
                lzw_decode(data, params.get("EarlyChange", 1)), params)
        elif fname in ("ASCII85Decode", "A85"):
            data = ascii85_decode(data)
        elif fname in ("ASCIIHexDecode", "AHx"):
            data = asciihex_decode(data)
        elif fname in ("RunLengthDecode", "RL"):
            data = rle_decode(data)
        elif fname == "Crypt":
            # /Crypt stream filter: the default Identity crypt filter is a
            # no-op here because object-level decryption already ran at
            # fetch time (XRef._decrypt_object); a named non-Identity CF
            # would have been applied there too.
            continue
        elif fname in IMAGE_FILTERS:
            break  # keep encoded; identity only
        # unknown filter: keep as-is
    stream._decoded = data
    return data
