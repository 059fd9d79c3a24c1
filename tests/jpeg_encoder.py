"""Minimal JPEG encoder (test-vector generator for tests/test_dct.py).

Produces standards-conforming baseline and progressive JPEG streams —
gray / YCbCr (any sampling factors) / 4-component Adobe CMYK+YCCK,
8/16-bit quant tables, restart intervals, spectral-selection and
successive-approximation progressive scans (libjpeg's refinement-scan
run/correction-bit algorithm, re-derived from ITU T.81 G.1.2.3).

Only VALIDITY matters here: the decoder-parity tests compare our
decoder and the reference decoder on these bytes, so the encoder just
has to emit streams both accept.  The FDCT is plain float math.
"""

from __future__ import annotations

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19,
    26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42, 49,
    56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51, 58, 59, 52,
    45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# ITU T.81 Annex K tables
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99]).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99]).reshape(8, 8)

DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
AC_LUMA = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7,
    0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])
AC_CHROMA = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15,
    0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17,
    0x18, 0x19, 0x1a, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8a,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5,
    0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9,
    0xda, 0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2,
    0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa])

# Progressive AC scans need EOBn symbols (0x10..0xE0) absent from the
# Annex K baseline tables; a flat canonical table carrying every symbol
# 0x00..0xFE at 9-10 bits is valid and trivially complete.
AC_PROG = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 0, 0, 0, 0, 0, 0, 0],
           list(range(255)))
AC_PROG[0][9] = 1          # one 10-bit code for the 256th symbol
AC_PROG[1].append(255)

_C = np.array([[np.cos((2 * x + 1) * u * np.pi / 16)
                * (np.sqrt(0.5) if u == 0 else 1.0) * 0.5
                for x in range(8)] for u in range(8)])


def _fdct(block):
    return _C @ block @ _C.T


def _huff_codes(bits, values):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value, length):
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0)   # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _magnitude(v):
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


class JpegEncoder:
    """Encode uint8 samples (h, w, ncomp) to JPEG bytes."""

    def __init__(self, img: np.ndarray, sampling=None, quality_16bit=False,
                 adobe_transform=None, restart_interval=0,
                 progressive=False):
        if img.ndim == 2:
            img = img[:, :, None]
        self.h, self.w, self.ncomp = img.shape
        self.sampling = sampling or [(1, 1)] * self.ncomp
        self.q16 = quality_16bit
        self.adobe = adobe_transform
        self.restart = restart_interval
        self.progressive = progressive
        self.quant = [QUANT_LUMA if i in (0, 3) else QUANT_CHROMA
                      for i in range(self.ncomp)]
        if quality_16bit:
            # exercise the 16-bit DQT path with >255 entries
            self.quant = [(q.astype(np.int64) * 3 + 200) for q in
                          self.quant]
        max_h = max(s[0] for s in self.sampling)
        max_v = max(s[1] for s in self.sampling)
        self.max_h, self.max_v = max_h, max_v
        self.mcus_x = -(-self.w // (8 * max_h))
        self.mcus_y = -(-self.h // (8 * max_v))
        self.coefs = []
        for i in range(self.ncomp):
            sh, sv = self.sampling[i]
            cw = -(-self.w * sh // max_h)
            ch = -(-self.h * sv // max_v)
            # nearest-neighbor downsample
            ys = (np.arange(ch) * (self.h / ch)).astype(int).clip(0, self.h - 1)
            xs = (np.arange(cw) * (self.w / cw)).astype(int).clip(0, self.w - 1)
            plane = img[ys][:, xs, i].astype(np.float64) - 128.0
            bw = self.mcus_x * sh
            bh = self.mcus_y * sv
            padded = np.zeros((bh * 8, bw * 8))
            padded[:ch, :cw] = plane
            # edge-extend padding
            padded[ch:, :cw] = plane[-1:, :]
            padded[:, cw:] = padded[:, cw - 1:cw]
            blocks = np.zeros((bh, bw, 64), dtype=np.int64)
            q = self.quant[i].astype(np.float64)
            for by in range(bh):
                for bx in range(bw):
                    blk = padded[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                    blocks[by, bx] = np.round(
                        _fdct(blk) / q).astype(np.int64).reshape(64)
            self.coefs.append(blocks)

    # ------------------------------------------------------ structure

    def encode(self) -> bytes:
        out = bytearray(b"\xFF\xD8")
        if self.adobe is not None:
            payload = (b"Adobe" + bytes([0, 100, 0, 0, 0, 0,
                                         self.adobe]))
            out += b"\xFF\xEE" + (len(payload) + 2).to_bytes(2, "big") \
                + payload
        # DQT
        for i, q in enumerate({0: self.quant[0],
                               1: self.quant[1]}.values()
                              if self.ncomp > 1 else [self.quant[0]]):
            prec = 1 if q.max() > 255 else 0
            body = bytes([(prec << 4) | i])
            zz = q.reshape(64)[ZIGZAG]
            if prec:
                body += b"".join(int(v).to_bytes(2, "big") for v in zz)
            else:
                body += bytes(int(v) for v in zz)
            out += b"\xFF\xDB" + (len(body) + 2).to_bytes(2, "big") + body
        # SOF
        sof = 0xFFC2 if self.progressive else 0xFFC0
        body = bytes([8]) + self.h.to_bytes(2, "big") \
            + self.w.to_bytes(2, "big") + bytes([self.ncomp])
        for i in range(self.ncomp):
            sh, sv = self.sampling[i]
            body += bytes([i + 1, (sh << 4) | sv,
                           0 if i in (0, 3) or self.ncomp == 1 else 1])
        out += sof.to_bytes(2, "big") + (len(body) + 2).to_bytes(2, "big") \
            + body
        # DHT (all four standard tables; progressive swaps in the
        # EOBn-capable AC table)
        ac0 = AC_PROG if self.progressive else AC_LUMA
        ac1 = AC_PROG if self.progressive else AC_CHROMA
        for cls, tid, (bits, vals) in [(0, 0, DC_LUMA), (0, 1, DC_CHROMA),
                                       (1, 0, ac0), (1, 1, ac1)]:
            body = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
            out += b"\xFF\xC4" + (len(body) + 2).to_bytes(2, "big") + body
        if self.restart:
            out += b"\xFF\xDD\x00\x04" + self.restart.to_bytes(2, "big")
        if self.progressive:
            out += self._progressive_scans()
        else:
            out += self._scan_header(range(self.ncomp), 0, 63, 0, 0)
            out += self._entropy_baseline()
        out += b"\xFF\xD9"
        return bytes(out)

    def _tables(self, ci):
        luma = ci in (0, 3) or self.ncomp == 1
        if self.progressive:
            ac = AC_PROG
        else:
            ac = AC_LUMA if luma else AC_CHROMA
        return (_huff_codes(*(DC_LUMA if luma else DC_CHROMA)),
                _huff_codes(*ac))

    def _scan_header(self, comps, ss, se, ah, al):
        body = bytes([len(list(comps))])
        for ci in comps:
            luma = ci in (0, 3) or self.ncomp == 1
            tid = 0 if luma else 1
            body += bytes([ci + 1, (tid << 4) | tid])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xFF\xDA" + (len(body) + 2).to_bytes(2, "big") + body

    # ------------------------------------------------------- baseline

    def _mcu_blocks(self, interleaved):
        """Yield (comp_idx, by, bx) in scan order."""
        if not interleaved:
            raise ValueError
        for my in range(self.mcus_y):
            for mx in range(self.mcus_x):
                for ci in range(self.ncomp):
                    sh, sv = self.sampling[ci]
                    for j in range(sv):
                        for k in range(sh):
                            yield ci, my * sv + j, mx * sh + k

    def _entropy_baseline(self) -> bytes:
        w = _BitWriter()
        pred = [0] * self.ncomp
        tables = [self._tables(i) for i in range(self.ncomp)]
        out = bytearray()
        mcu = 0
        rst = 0
        n_mcus = self.mcus_x * self.mcus_y
        per_mcu = [list() for _ in range(n_mcus)]
        for ci, by, bx in self._mcu_blocks(True):
            my = by // self.sampling[ci][1]
            mx = bx // self.sampling[ci][0]
            per_mcu[my * self.mcus_x + mx].append((ci, by, bx))
        for mcu in range(n_mcus):
            if self.restart and mcu and mcu % self.restart == 0:
                w.flush()
                out += w.out
                w = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                pred = [0] * self.ncomp
            for ci, by, bx in per_mcu[mcu]:
                dc_t, ac_t = tables[ci]
                coef = self.coefs[ci][by, bx]
                diff = int(coef[0]) - pred[ci]
                pred[ci] = int(coef[0])
                n, bits = _magnitude(diff)
                ln, code = dc_t[n]
                w.put(code, ln)
                w.put(bits, n)
                zz = coef[ZIGZAG]
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_t[0xF0]
                        w.put(code, ln)
                        run -= 16
                    n, bits = _magnitude(v)
                    ln, code = ac_t[(run << 4) | n]
                    w.put(code, ln)
                    w.put(bits, n)
                    run = 0
                if run:
                    ln, code = ac_t[0x00]
                    w.put(code, ln)
        w.flush()
        out += w.out
        return bytes(out)

    # ---------------------------------------------------- progressive

    def _progressive_scans(self) -> bytes:
        """DC first (Al=1) -> DC refine -> per-component AC first scans
        (Al=1) split in two bands -> AC refinement scans (Ah=1, Al=0)."""
        out = bytearray()
        out += self._scan_header(range(self.ncomp), 0, 0, 0, 1)
        out += self._dc_scan(first=True, al=1)
        out += self._scan_header(range(self.ncomp), 0, 0, 1, 0)
        out += self._dc_scan(first=False, al=0)
        for ci in range(self.ncomp):
            for ss, se in ((1, 5), (6, 63)):
                out += self._scan_header([ci], ss, se, 0, 1)
                out += self._ac_first_scan(ci, ss, se, 1)
        for ci in range(self.ncomp):
            out += self._scan_header([ci], 1, 63, 1, 0)
            out += self._ac_refine_scan(ci, 1, 63, 0)
        return bytes(out)

    def _dc_scan(self, first, al):
        w = _BitWriter()
        pred = [0] * self.ncomp
        for ci, by, bx in self._mcu_blocks(True):
            dc_t, _ = self._tables(ci)
            v = int(self.coefs[ci][by, bx][0])
            if first:
                vq = v >> al   # DC point transform is ARITHMETIC (T.81)
                diff = vq - pred[ci]
                pred[ci] = vq
                n, bits = _magnitude(diff)
                ln, code = dc_t[n]
                w.put(code, ln)
                w.put(bits, n)
            else:
                w.put(v & 1, 1)
        w.flush()
        return bytes(w.out)

    def _comp_blocks(self, ci):
        """Non-interleaved scan order over the component's own grid."""
        import math
        blocks = self.coefs[ci]
        sh, sv = self.sampling[ci]
        bpl = math.ceil(math.ceil(self.w / 8) * sh / self.max_h)
        bpc = math.ceil(math.ceil(self.h / 8) * sv / self.max_v)
        for by in range(bpc):
            for bx in range(bpl):
                yield blocks[by, bx]

    def _ac_first_scan(self, ci, ss, se, al):
        _, ac_t = self._tables(ci)
        w = _BitWriter()
        eobrun = 0

        def emit_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                n = eobrun.bit_length() - 1
                ln, code = ac_t[n << 4]
                w.put(code, ln)
                w.put(eobrun - (1 << n), n)
                eobrun = 0

        for coef in self._comp_blocks(ci):
            zz = coef[ZIGZAG]
            vals = []
            for k in range(ss, se + 1):
                v = int(zz[k])
                vals.append(v >> al if v >= 0 else -((-v) >> al))
            if not any(vals):
                eobrun += 1
                if eobrun == 0x7FFF:
                    emit_eobrun()
                continue
            emit_eobrun()
            run = 0
            last_nz = max(i for i, v in enumerate(vals) if v)
            for i, v in enumerate(vals):
                if i > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    ln, code = ac_t[0xF0]
                    w.put(code, ln)
                    run -= 16
                n, bits = _magnitude(v)
                ln, code = ac_t[(run << 4) | n]
                w.put(code, ln)
                w.put(bits, n)
                run = 0
            if last_nz < len(vals) - 1:
                eobrun += 1
        emit_eobrun()
        w.flush()
        return bytes(w.out)

    def _ac_refine_scan(self, ci, ss, se, al):
        """T.81 G.1.2.3 / libjpeg encode_mcu_AC_refine."""
        _, ac_t = self._tables(ci)
        w = _BitWriter()
        eobrun = 0
        pending_bits: list[int] = []

        def emit_eobrun():
            nonlocal eobrun, pending_bits
            if eobrun > 0:
                n = eobrun.bit_length() - 1
                ln, code = ac_t[n << 4]
                w.put(code, ln)
                w.put(eobrun - (1 << n), n)
                eobrun = 0
                for b in pending_bits:
                    w.put(b, 1)
                pending_bits = []

        for coef in self._comp_blocks(ci):
            zz = coef[ZIGZAG]
            absv = []
            eob = 0
            for idx, k in enumerate(range(ss, se + 1)):
                v = abs(int(zz[k])) >> al
                absv.append(v)
                if v == 1:
                    eob = idx
            run = 0
            br: list[int] = []
            for idx, k in enumerate(range(ss, se + 1)):
                temp = absv[idx]
                if temp == 0:
                    run += 1
                    continue
                while run > 15 and idx <= eob:
                    emit_eobrun()
                    ln, code = ac_t[0xF0]
                    w.put(code, ln)
                    run -= 16
                    for b in br:
                        w.put(b, 1)
                    br = []
                if temp > 1:
                    br.append((abs(int(zz[k])) >> al) & 1)
                    continue
                emit_eobrun()
                ln, code = ac_t[(run << 4) | 1]
                w.put(code, ln)
                w.put(0 if int(zz[k]) < 0 else 1, 1)
                for b in br:
                    w.put(b, 1)
                br = []
                run = 0
            if run > 0 or br:
                eobrun += 1
                pending_bits += br
                if eobrun == 0x7FFF or len(pending_bits) > 900:
                    emit_eobrun()
        emit_eobrun()
        w.flush()
        return bytes(w.out)
