"""Baseline + progressive JPEG (DCT) decoder with reference parity.

Behavioral re-implementation of the reference's ``JpegImage``
(pdf.combined.js:638-1647, the 2015 pdf.js jpg.js): marker parse,
baseline and progressive Huffman scan decode, the Loeffler-Ligtenberg-
Moschytz integer IDCT with the reference's exact fixed-point rounding
(:980-1160 quantizeAndInverse), its nearest-neighbor block linearization
(:1433-1480), the Decode-array transform (:1465-1476, wired from
JpegStream :22396-22413), and its YCC/YCCK/CMYK color transforms
(:1493-1608) including the polynomial approximations.

Exactness notes (all verified bit-for-bit against the reference via
node in tests/test_dct.py):

* ``blockData`` is an Int16Array in the reference — coefficient stores
  wrap to int16, and the IDCT row pass writes its intermediate into an
  Int16Array scratch.  Both truncations are replicated.
* JS ``>>``/``<<``/``|`` coerce through ToInt32; every shift operand
  here passes through an int32 wrap first, so even pathological
  streams (oversized coefficients x 16-bit quant tables) decode to the
  reference's exact bytes.
* Uint8Array stores truncate toward zero (ToUint8); the float color
  transforms floor after clamping exactly like the typed-array store.

The scan decode is a sequential bit-consumer (inherently so — Huffman
boundaries are data-dependent), kept in tight local-variable Python; the
IDCT, linearization and color transforms — the bulk of the work — are
vectorized numpy over all blocks at once.
"""

from __future__ import annotations

import numpy as np

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19,
    26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42, 49,
    56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51, 58, 59, 52,
    45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

_COS1, _SIN1 = 4017, 799      # cos(pi/16) << 12, sin(pi/16) << 12
_COS3, _SIN3 = 3406, 2276
_COS6, _SIN6 = 1567, 3784
_SQRT2, _SQRT1D2 = 5793, 2896


class JpegError(Exception):
    pass


def _build_huffman(code_lengths, values):
    """Canonical Huffman -> flat (length, code) -> value dict; decode
    walks bit-by-bit exactly like the reference tree (:670-702), raising
    on an undefined prefix ("invalid huffman sequence")."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(code_lengths[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _i32(x):
    """JS ToInt32 for numpy int64 arrays/scalars."""
    return ((x + 0x80000000) & 0xFFFFFFFF) - 0x80000000


def _i16(x):
    return ((x + 0x8000) & 0xFFFF) - 0x8000


class _Component:
    __slots__ = ("h", "v", "quant_id", "quant", "block_data",
                 "blocks_per_line", "blocks_per_column", "dc_table",
                 "ac_table", "pred", "scale_x", "scale_y", "output")


class JpegImage:
    """parse(data) -> getData(width, height, force_rgb) mirror of the
    reference API; ``decode_transform`` is the Int32 pair array the
    JpegStream glue builds from the PDF Decode entry."""

    def __init__(self):
        self.decode_transform = None
        self.width = 0
        self.height = 0
        self.jfif = None
        self.adobe = None
        self.components = []
        self.num_components = 0

    # ------------------------------------------------------------ parse

    def parse(self, data: bytes):
        data = np.frombuffer(bytes(data), dtype=np.uint8)
        pos = [0]

        def u16():
            v = (int(data[pos[0]]) << 8) | int(data[pos[0] + 1])
            pos[0] += 2
            return v

        def block():
            length = u16()
            a = pos[0]
            pos[0] += length - 2
            return data[a:a + length - 2]

        frame = None
        reset_interval = 0
        quant_tables = {}
        huff_dc, huff_ac = {}, {}
        jfif = adobe = None

        if u16() != 0xFFD8:
            raise JpegError("SOI not found")
        marker = u16()
        while marker != 0xFFD9:
            if (0xFFE0 <= marker <= 0xFFEF) or marker == 0xFFFE:
                app = block()
                if marker == 0xFFE0 and len(app) >= 14 and \
                        bytes(app[:5]) == b"JFIF\x00":
                    jfif = {"version": (int(app[5]), int(app[6]))}
                if marker == 0xFFEE and len(app) >= 12 and \
                        bytes(app[:5]) == b"Adobe":
                    adobe = {"version": (int(app[5]) << 8) | int(app[6]),
                             "transform_code": int(app[11])}
            elif marker == 0xFFDB:   # DQT
                end = u16() + pos[0] - 2
                while pos[0] < end:
                    spec = int(data[pos[0]]); pos[0] += 1
                    tbl = np.zeros(64, dtype=np.int64)
                    if spec >> 4 == 0:
                        tbl[_ZIGZAG] = data[pos[0]:pos[0] + 64]
                        pos[0] += 64
                    elif spec >> 4 == 1:
                        raw = data[pos[0]:pos[0] + 128].astype(np.int64)
                        tbl[_ZIGZAG] = (raw[0::2] << 8) | raw[1::2]
                        pos[0] += 128
                    else:
                        raise JpegError("DQT: invalid table spec")
                    quant_tables[spec & 15] = tbl
            elif marker in (0xFFC0, 0xFFC1, 0xFFC2):   # SOF0/1/2
                if frame is not None:
                    raise JpegError("only single frame JPEGs supported")
                u16()
                frame = {"extended": marker == 0xFFC1,
                         "progressive": marker == 0xFFC2,
                         "precision": int(data[pos[0]]),
                         "components": [], "ids": {}}
                pos[0] += 1
                frame["scan_lines"] = u16()
                frame["samples_per_line"] = u16()
                n_comp = int(data[pos[0]]); pos[0] += 1
                max_h = max_v = 0
                for _ in range(n_comp):
                    cid = int(data[pos[0]])
                    c = _Component()
                    c.h = int(data[pos[0] + 1]) >> 4
                    c.v = int(data[pos[0] + 1]) & 15
                    c.quant_id = int(data[pos[0] + 2])
                    # captured AT SOF like the reference (:805) — a DQT
                    # arriving after SOF is not visible to this frame
                    c.quant = quant_tables.get(c.quant_id)
                    c.pred = 0
                    max_h, max_v = max(max_h, c.h), max(max_v, c.v)
                    frame["ids"][cid] = len(frame["components"])
                    frame["components"].append(c)
                    pos[0] += 3
                frame["max_h"], frame["max_v"] = max_h, max_v
                self._prepare_components(frame)
            elif marker == 0xFFC4:   # DHT
                length = u16()
                i = 2
                while i < length:
                    spec = int(data[pos[0]]); pos[0] += 1
                    lens = data[pos[0]:pos[0] + 16].astype(np.int64)
                    pos[0] += 16
                    total = int(lens.sum())
                    vals = data[pos[0]:pos[0] + total].astype(np.int64)
                    pos[0] += total
                    i += 17 + total
                    tgt = huff_dc if spec >> 4 == 0 else huff_ac
                    tgt[spec & 15] = _build_huffman(
                        [int(x) for x in lens], [int(x) for x in vals])
            elif marker == 0xFFDD:   # DRI
                u16()
                reset_interval = u16()
            elif marker == 0xFFDA:   # SOS
                u16()
                n_sel = int(data[pos[0]]); pos[0] += 1
                comps = []
                for _ in range(n_sel):
                    ci = frame["ids"][int(data[pos[0]])]
                    comp = frame["components"][ci]
                    spec = int(data[pos[0] + 1])
                    comp.dc_table = huff_dc.get(spec >> 4)
                    comp.ac_table = huff_ac.get(spec & 15)
                    comps.append(comp)
                    pos[0] += 2
                spectral_start = int(data[pos[0]])
                spectral_end = int(data[pos[0] + 1])
                succ = int(data[pos[0] + 2])
                pos[0] += 3
                processed = _decode_scan(
                    data, pos[0], frame, comps, reset_interval,
                    spectral_start, spectral_end, succ >> 4, succ & 15)
                pos[0] += processed
            elif marker == 0xFFFF:   # fill byte
                if int(data[pos[0]]) != 0xFF:
                    pos[0] -= 1
            else:
                if int(data[pos[0] - 3]) == 0xFF and \
                        0xC0 <= int(data[pos[0] - 2]) <= 0xFE:
                    # incorrect encoding: last 0xFF of the previous block
                    # was eaten (reference :1418-1424)
                    pos[0] -= 3
                else:
                    raise JpegError(
                        f"unknown JPEG marker {marker:x}")
            marker = u16()

        if frame is None:
            raise JpegError("no frame")
        self.width = frame["samples_per_line"]
        self.height = frame["scan_lines"]
        self.jfif, self.adobe = jfif, adobe
        self.components = []
        for c in frame["components"]:
            if c.quant is None:
                raise JpegError("missing quantization table")
            _build_component_data(c)
            c.scale_x = c.h / frame["max_h"]
            c.scale_y = c.v / frame["max_v"]
            self.components.append(c)
        self.num_components = len(self.components)

    @staticmethod
    def _prepare_components(frame):
        import math
        mcus_per_line = math.ceil(frame["samples_per_line"] / 8
                                  / frame["max_h"])
        mcus_per_column = math.ceil(frame["scan_lines"] / 8
                                    / frame["max_v"])
        for c in frame["components"]:
            c.blocks_per_line = math.ceil(
                math.ceil(frame["samples_per_line"] / 8)
                * c.h / frame["max_h"])
            c.blocks_per_column = math.ceil(
                math.ceil(frame["scan_lines"] / 8)
                * c.v / frame["max_v"])
            bpl_mcu = mcus_per_line * c.h
            bpc_mcu = mcus_per_column * c.v
            c.block_data = np.zeros(64 * bpc_mcu * (bpl_mcu + 1),
                                    dtype=np.int16)
        frame["mcus_per_line"] = mcus_per_line
        frame["mcus_per_column"] = mcus_per_column

    # ------------------------------------------------------- linearize

    def _linearized(self, width: int, height: int) -> np.ndarray:
        scale_x = self.width / width
        scale_y = self.height / height
        n = self.num_components
        out = np.empty((height, width, n), dtype=np.uint8)
        xs = np.arange(width, dtype=np.float64)
        ys = np.arange(height, dtype=np.float64)
        for i, c in enumerate(self.components):
            csx = c.scale_x * scale_x
            csy = c.scale_y * scale_y
            bpsl = (c.blocks_per_line + 1) << 3
            jx = (xs * csx).astype(np.int64)          # 0 | (x * scale)
            x_off = ((jx & ~np.int64(7)) << 3) | (jx & 7)
            jy = (ys * csy).astype(np.int64)
            y_off = bpsl * (jy & ~np.int64(7)) | ((jy & 7) << 3)
            idx = y_off[:, None] + x_off[None, :]
            out[:, :, i] = c.block_data[idx].astype(np.uint8)
        data = out.reshape(-1, n).astype(np.int64)
        t = self.decode_transform
        if t is not None:
            for j in range(n):
                data[:, j] = (_i32(data[:, j] * int(t[2 * j])) >> 8) \
                    + int(t[2 * j + 1])
            data &= 0xFF   # Uint8Array store wraps
        return data.reshape(-1)

    # --------------------------------------------------- color science

    def _is_color_conversion_needed(self) -> bool:
        if self.adobe and self.adobe["transform_code"]:
            return True
        return self.num_components == 3

    @staticmethod
    def _ycc_to_rgb(d: np.ndarray) -> np.ndarray:
        p = d.reshape(-1, 3).astype(np.float64)
        y, cb, cr = p[:, 0].copy(), p[:, 1].copy(), p[:, 2].copy()
        p[:, 0] = y - 179.456 + 1.402 * cr
        p[:, 1] = y + 135.459 - 0.344 * cb - 0.714 * cr
        p[:, 2] = y - 226.816 + 1.772 * cb
        return np.floor(np.clip(p, 0, 255)).astype(np.uint8).reshape(-1)

    @staticmethod
    def _ycck_to_rgb(d: np.ndarray) -> np.ndarray:
        p = d.reshape(-1, 4).astype(np.float64)
        y, cb, cr, k = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
        r = -122.67195406894 + \
            cb * (-6.60635669420364e-5 * cb + 0.000437130475926232 * cr -
                  5.4080610064599e-5 * y + 0.00048449797120281 * k -
                  0.154362151871126) + \
            cr * (-0.000957964378445773 * cr + 0.000817076911346625 * y -
                  0.00477271405408747 * k + 1.53380253221734) + \
            y * (0.000961250184130688 * y - 0.00266257332283933 * k +
                 0.48357088451265) + \
            k * (-0.000336197177618394 * k + 0.484791561490776)
        g = 107.268039397724 + \
            cb * (2.19927104525741e-5 * cb - 0.000640992018297945 * cr +
                  0.000659397001245577 * y + 0.000426105652938837 * k -
                  0.176491792462875) + \
            cr * (-0.000778269941513683 * cr + 0.00130872261408275 * y +
                  0.000770482631801132 * k - 0.151051492775562) + \
            y * (0.00126935368114843 * y - 0.00265090189010898 * k +
                 0.25802910206845) + \
            k * (-0.000318913117588328 * k - 0.213742400323665)
        b = -20.810012546947 + \
            cb * (-0.000570115196973677 * cb - 2.63409051004589e-5 * cr +
                  0.0020741088115012 * y - 0.00288260236853442 * k +
                  0.814272968359295) + \
            cr * (-1.53496057440975e-5 * cr - 0.000132689043961446 * y +
                  0.000560833691242812 * k - 0.195152027534049) + \
            y * (0.00174418132927582 * y - 0.00255243321439347 * k +
                 0.116935020465145) + \
            k * (-0.000343531996510555 * k + 0.24165260232407)
        rgb = np.floor(np.clip(np.stack([r, g, b], axis=1),
                               0, 255)).astype(np.uint8).reshape(-1)
        # the reference packs RGB into the FRONT of the same 4-comp
        # buffer and returns it full length, stale tail and all
        # (:1537-1540 data[offset++] over the input array)
        out = d.reshape(-1).copy()
        out[:len(rgb)] = rgb
        return out

    @staticmethod
    def _ycck_to_cmyk(d: np.ndarray) -> np.ndarray:
        p = d.reshape(-1, 4).astype(np.float64)
        y, cb, cr = p[:, 0].copy(), p[:, 1].copy(), p[:, 2].copy()
        p[:, 0] = np.clip(434.456 - y - 1.402 * cr, 0, 255)
        p[:, 1] = np.clip(119.541 - y + 0.344 * cb + 0.714 * cr, 0, 255)
        p[:, 2] = np.clip(481.816 - y - 1.772 * cb, 0, 255)
        return np.floor(p).astype(np.uint8).reshape(-1)

    @staticmethod
    def _cmyk_to_rgb(d: np.ndarray) -> np.ndarray:
        p = d.reshape(-1, 4).astype(np.float64)
        c, m, y, k = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
        r = c * (-4.387332384609988 * c + 54.48615194189176 * m +
                 18.82290502165302 * y + 212.25662451639585 * k -
                 72734.4411664936) + \
            m * (1.7149763477362134 * m - 5.6096736904047315 * y -
                 17.873870861415444 * k - 1401.7366389350734) + \
            y * (-2.5217340131683033 * y - 21.248923337353073 * k +
                 4465.541406466231) - \
            k * (21.86122147463605 * k + 48317.86113160301)
        g = c * (8.841041422036149 * c + 60.118027045597366 * m +
                 6.871425592049007 * y + 31.159100130055922 * k -
                 20220.756542821975) + \
            m * (-15.310361306967817 * m + 17.575251261109482 * y +
                 131.35250912493976 * k - 48691.05921601825) + \
            y * (4.444339102852739 * y + 9.8632861493405 * k -
                 6341.191035517494) - \
            k * (20.737325471181034 * k + 47890.15695978492)
        b = c * (0.8842522430003296 * c + 8.078677503112928 * m +
                 30.89978309703729 * y - 0.23883238689178934 * k -
                 3616.812083916688) + \
            m * (10.49593273432072 * m + 63.02378494754052 * y +
                 50.606957656360734 * k - 28620.90484698408) + \
            y * (0.03296041114873217 * y + 115.60384449646641 * k -
                 49363.43385999684) - \
            k * (22.33816807309886 * k + 45932.16563550634)
        mn = -255.0 * 255.0 * 255.0
        scale = 1.0 / 255.0 / 255.0
        rgb = np.empty((len(r), 3), dtype=np.uint8)
        for j, ch in enumerate((r, g, b)):
            v = np.trunc(255.0 + ch * scale)   # x | 0 truncates
            v = np.where(ch >= 0, 255.0, np.where(ch <= mn, 0.0, v))
            rgb[:, j] = v.astype(np.uint8)
        # same front-packed full-length return as _ycck_to_rgb
        # (reference :1601-1603)
        out = d.reshape(-1).copy()
        out[:rgb.size] = rgb.reshape(-1)
        return out

    # ------------------------------------------------------------ data

    def get_data(self, width: int, height: int,
                 force_rgb: bool = False) -> bytes:
        if self.num_components > 4:
            raise JpegError("unsupported color mode")
        data = self._linearized(width, height).astype(np.uint8)
        if self.num_components == 1 and force_rgb:
            return np.repeat(data, 3).tobytes()
        if self.num_components == 3:
            return self._ycc_to_rgb(data).tobytes()
        if self.num_components == 4:
            if self._is_color_conversion_needed():
                if force_rgb:
                    return self._ycck_to_rgb(data).tobytes()
                return self._ycck_to_cmyk(data).tobytes()
            if force_rgb:
                return self._cmyk_to_rgb(data).tobytes()
        return data.tobytes()


# ------------------------------------------------------------ scan decode

def _decode_scan(data, offset, frame, components, reset_interval,
                 spectral_start, spectral_end, successive_prev,
                 successive):
    """Sequential Huffman scan (reference decodeScan :706-980): baseline
    and all four progressive refinement modes, restart markers, 0xFF00
    byte unstuffing, int16-wrapping coefficient stores."""
    mcus_per_line = frame["mcus_per_line"]
    progressive = frame["progressive"]
    start_offset = offset
    data_len = len(data)

    # Buffered MSB-first bit reader.  Semantics are the reference
    # readBit's, bit for bit: 0xFF00 pairs unstuff, a REAL marker
    # throws only when a bit beyond it is actually needed, and a read
    # past the end serves zero bits (JS `undefined >>> 7` is 0 — the
    # reference pads with zeros at EOF rather than throwing).  Each
    # buffered byte's source offset is recorded so the interval-end
    # reset can rewind to the reference's unbuffered offset exactly
    # (stuffed zeros make offset arithmetic non-linear).
    state = {"offset": offset}
    rd = {"buf": 0, "cnt": 0, "pos": []}

    def _refill():
        o = state["offset"]
        if o >= data_len:
            b = 0                      # EOF: zero bits, like undefined
            state["offset"] = o + 1
        else:
            b = int(data[o])
            if b == 0xFF:
                nxt = int(data[o + 1]) if o + 1 < data_len else 0
                if nxt:
                    return False       # marker: not consumed
                state["offset"] = o + 2
            else:
                state["offset"] = o + 1
        cnt = rd["cnt"]
        rd["buf"] = ((rd["buf"] & ((1 << cnt) - 1)) << 8) | b
        rd["cnt"] = cnt + 8
        pos = rd["pos"]
        pos.append(o)
        if len(pos) > 8:
            del pos[:-4]
        return True

    def _marker_throw():
        o = state["offset"]
        m = ((int(data[o]) << 8) | int(data[o + 1])) \
            if o + 1 < data_len else 0
        raise JpegError(f"unexpected marker: {m:x}")

    def read_bit():
        if rd["cnt"] == 0 and not _refill():
            _marker_throw()
        rd["cnt"] -= 1
        return (rd["buf"] >> rd["cnt"]) & 1

    def decode_huffman(table):
        while rd["cnt"] < 16:
            if not _refill():
                break
        cnt, buf = rd["cnt"], rd["buf"]
        get = table.get
        limit = cnt if cnt < 16 else 16
        for length in range(1, limit + 1):
            v = get((length,
                     (buf >> (cnt - length)) & ((1 << length) - 1)))
            if v is not None:
                rd["cnt"] = cnt - length
                return v
        if limit < 16:
            _marker_throw()   # code needs bits past a marker boundary
        raise JpegError("invalid huffman sequence")

    def receive(length):
        while rd["cnt"] < length:
            if not _refill():
                _marker_throw()
        rd["cnt"] -= length
        return (rd["buf"] >> rd["cnt"]) & ((1 << length) - 1)

    def receive_and_extend(length):
        if length == 1:
            return 1 if read_bit() == 1 else -1
        n = receive(length)
        if n >= 1 << (length - 1):
            return n
        return n + (-1 << length) + 1

    zz = _ZIGZAG

    def store(comp, off, val):
        comp.block_data[off] = _i16(val)

    def decode_baseline(comp, off):
        t = decode_huffman(comp.dc_table)
        diff = 0 if t == 0 else receive_and_extend(t)
        comp.pred += diff
        store(comp, off, comp.pred)
        k = 1
        while k < 64:
            rs = decode_huffman(comp.ac_table)
            s, r = rs & 15, rs >> 4
            if s == 0:
                if r < 15:
                    break
                k += 16
                continue
            k += r
            store(comp, off + int(zz[k]), receive_and_extend(s))
            k += 1

    def decode_dc_first(comp, off):
        t = decode_huffman(comp.dc_table)
        diff = 0 if t == 0 else (receive_and_extend(t) << successive)
        comp.pred += diff
        store(comp, off, comp.pred)

    def decode_dc_successive(comp, off):
        store(comp, off,
              int(comp.block_data[off]) | (read_bit() << successive))

    eobrun = [0]

    def decode_ac_first(comp, off):
        if eobrun[0] > 0:
            eobrun[0] -= 1
            return
        k, e = spectral_start, spectral_end
        while k <= e:
            rs = decode_huffman(comp.ac_table)
            s, r = rs & 15, rs >> 4
            if s == 0:
                if r < 15:
                    eobrun[0] = receive(r) + (1 << r) - 1
                    break
                k += 16
                continue
            k += r
            store(comp, off + int(zz[k]),
                  receive_and_extend(s) * (1 << successive))
            k += 1

    ac_state = [0, 0]   # state, next value

    def decode_ac_successive(comp, off):
        k, e = spectral_start, spectral_end
        r = 0
        bd = comp.block_data
        while k <= e:
            z = off + int(zz[k])
            if ac_state[0] == 0:
                rs = decode_huffman(comp.ac_table)
                s, r = rs & 15, rs >> 4   # r carries into states 1/2
                if s == 0:
                    if r < 15:
                        eobrun[0] = receive(r) + (1 << r)
                        ac_state[0] = 4
                    else:
                        r = 16
                        ac_state[0] = 1
                else:
                    if s != 1:
                        raise JpegError("invalid ACn encoding")
                    ac_state[1] = receive_and_extend(s)
                    ac_state[0] = 2 if r else 3
                continue
            if ac_state[0] in (1, 2):
                if bd[z]:
                    bd[z] = _i16(int(bd[z]) + (read_bit() << successive))
                else:
                    r -= 1
                    if r == 0:
                        ac_state[0] = 3 if ac_state[0] == 2 else 0
            elif ac_state[0] == 3:
                if bd[z]:
                    bd[z] = _i16(int(bd[z]) + (read_bit() << successive))
                else:
                    bd[z] = _i16(ac_state[1] << successive)
                    ac_state[0] = 0
            elif ac_state[0] == 4:
                if bd[z]:
                    bd[z] = _i16(int(bd[z]) + (read_bit() << successive))
            k += 1
        if ac_state[0] == 4:
            eobrun[0] -= 1
            if eobrun[0] == 0:
                ac_state[0] = 0

    def block_offset(comp, row, col):
        return 64 * ((comp.blocks_per_line + 1) * row + col)

    if progressive:
        if spectral_start == 0:
            decode_fn = (decode_dc_first if successive_prev == 0
                         else decode_dc_successive)
        else:
            decode_fn = (decode_ac_first if successive_prev == 0
                         else decode_ac_successive)
    else:
        decode_fn = decode_baseline

    n_comp = len(components)
    if n_comp == 1:
        mcu_expected = (components[0].blocks_per_line
                        * components[0].blocks_per_column)
    else:
        mcu_expected = mcus_per_line * frame["mcus_per_column"]
    if not reset_interval:
        reset_interval = mcu_expected

    mcu = 0
    while mcu < mcu_expected:
        for c in components:
            c.pred = 0
        eobrun[0] = 0
        ac_state[0] = 0

        if n_comp == 1:
            comp = components[0]
            for _ in range(reset_interval):
                row = mcu // comp.blocks_per_line
                col = mcu % comp.blocks_per_line
                decode_fn(comp, block_offset(comp, row, col))
                mcu += 1
        else:
            for _ in range(reset_interval):
                mcu_row = mcu // mcus_per_line
                mcu_col = mcu % mcus_per_line
                for comp in components:
                    for j in range(comp.v):
                        for k2 in range(comp.h):
                            decode_fn(comp, block_offset(
                                comp, mcu_row * comp.v + j,
                                mcu_col * comp.h + k2))
                mcu += 1

        # discard buffered bits; rewind to the first fully-unconsumed
        # buffered byte so the marker check runs at the reference's
        # exact offset (a partially-consumed byte stays consumed, its
        # leftover bits dropped — the reference's bitsCount = 0)
        full = rd["cnt"] // 8
        if full:
            state["offset"] = rd["pos"][-full]
        rd["buf"] = 0
        rd["cnt"] = 0
        rd["pos"].clear()
        o = state["offset"]
        marker = ((int(data[o]) << 8) | int(data[o + 1])) \
            if o + 1 < data_len else 0
        if marker <= 0xFF00:
            raise JpegError("marker was not found")
        if 0xFFD0 <= marker <= 0xFFD7:   # RSTx
            state["offset"] += 2
        else:
            break

    return state["offset"] - start_offset


# --------------------------------------------------------------- IDCT

def _build_component_data(comp):
    """Vectorized quantizeAndInverse over every (row, col) block of the
    component — same fixed-point schedule and truncations as reference
    :980-1160, applied to all blocks as (N, 8) numpy lanes."""
    bpl, bpc = comp.blocks_per_line, comp.blocks_per_column
    if bpl == 0 or bpc == 0:
        return
    rows = np.arange(bpc, dtype=np.int64)
    cols = np.arange(bpl, dtype=np.int64)
    offsets = (64 * ((bpl + 1) * rows[:, None] + cols[None, :])) \
        .reshape(-1)
    gather = offsets[:, None] + np.arange(64, dtype=np.int64)[None, :]
    blocks = comp.block_data[gather].astype(np.int64)   # (N, 64)
    qt = comp.quant

    p = np.empty_like(blocks)   # row-pass scratch (int16-truncated)

    # ---- row pass
    for row in range(0, 64, 8):
        pr = blocks[:, row:row + 8]
        p0 = pr[:, 0] * qt[row]
        zero_ac = (pr[:, 1] | pr[:, 2] | pr[:, 3] | pr[:, 4]
                   | pr[:, 5] | pr[:, 6] | pr[:, 7]) == 0
        t_flat = _i32(_SQRT2 * p0 + 512) >> 10
        d = pr * qt[row:row + 8]
        p1, p2, p3 = d[:, 1], d[:, 2], d[:, 3]
        p4, p5, p6, p7 = d[:, 4], d[:, 5], d[:, 6], d[:, 7]
        v0 = _i32(_SQRT2 * p0 + 128) >> 8
        v1 = _i32(_SQRT2 * p4 + 128) >> 8
        v2, v3 = p2, p6
        v4 = _i32(_SQRT1D2 * (p1 - p7) + 128) >> 8
        v7 = _i32(_SQRT1D2 * (p1 + p7) + 128) >> 8
        v5 = _i32(_i32(p3) << 4)
        v6 = _i32(_i32(p5) << 4)
        v0 = _i32(v0 + v1 + 1) >> 1
        v1 = v0 - v1
        t = _i32(v2 * _SIN6 + v3 * _COS6 + 128) >> 8
        v2 = _i32(v2 * _COS6 - v3 * _SIN6 + 128) >> 8
        v3 = t
        v4_ = _i32(v4 + v6 + 1) >> 1
        v6 = v4_ - v6
        v4 = v4_
        v7_ = _i32(v7 + v5 + 1) >> 1
        v5 = v7_ - v5
        v7 = v7_
        v0_ = _i32(v0 + v3 + 1) >> 1
        v3 = v0_ - v3
        v0 = v0_
        v1_ = _i32(v1 + v2 + 1) >> 1
        v2 = v1_ - v2
        v1 = v1_
        t = _i32(v4 * _SIN3 + v7 * _COS3 + 2048) >> 12
        v4 = _i32(v4 * _COS3 - v7 * _SIN3 + 2048) >> 12
        v7 = t
        t = _i32(v5 * _SIN1 + v6 * _COS1 + 2048) >> 12
        v5 = _i32(v5 * _COS1 - v6 * _SIN1 + 2048) >> 12
        v6 = t
        res = np.stack([v0 + v7, v1 + v6, v2 + v5, v3 + v4,
                        v3 - v4, v2 - v5, v1 - v6, v0 - v7], axis=1)
        res = np.where(zero_ac[:, None], t_flat[:, None], res)
        p[:, row:row + 8] = _i16(res)   # Int16Array scratch store

    # ---- column pass
    out = np.empty_like(blocks)
    for col in range(8):
        pc = p[:, col::8]
        p0 = pc[:, 0]
        zero_ac = (pc[:, 1] | pc[:, 2] | pc[:, 3] | pc[:, 4]
                   | pc[:, 5] | pc[:, 6] | pc[:, 7]) == 0
        t_flat = _i32(_SQRT2 * p0 + 8192) >> 14
        t_flat = np.where(t_flat < -2040, 0,
                          np.where(t_flat >= 2024, 255,
                                   (t_flat + 2056) >> 4))
        p1, p2, p3 = pc[:, 1], pc[:, 2], pc[:, 3]
        p4, p5, p6, p7 = pc[:, 4], pc[:, 5], pc[:, 6], pc[:, 7]
        v0 = _i32(_SQRT2 * p0 + 2048) >> 12
        v1 = _i32(_SQRT2 * p4 + 2048) >> 12
        v2, v3 = p2, p6
        v4 = _i32(_SQRT1D2 * (p1 - p7) + 2048) >> 12
        v7 = _i32(_SQRT1D2 * (p1 + p7) + 2048) >> 12
        v5, v6 = p3, p5
        # shift by 128.5 << 5 folded in (reference :1098)
        v0n = (_i32(v0 + v1 + 1) >> 1) + 4112
        v1 = v0n - v1
        v0 = v0n
        t = _i32(v2 * _SIN6 + v3 * _COS6 + 2048) >> 12
        v2 = _i32(v2 * _COS6 - v3 * _SIN6 + 2048) >> 12
        v3 = t
        v4_ = _i32(v4 + v6 + 1) >> 1
        v6 = v4_ - v6
        v4 = v4_
        v7_ = _i32(v7 + v5 + 1) >> 1
        v5 = v7_ - v5
        v7 = v7_
        v0_ = _i32(v0 + v3 + 1) >> 1
        v3 = v0_ - v3
        v0 = v0_
        v1_ = _i32(v1 + v2 + 1) >> 1
        v2 = v1_ - v2
        v1 = v1_
        t = _i32(v4 * _SIN3 + v7 * _COS3 + 2048) >> 12
        v4 = _i32(v4 * _COS3 - v7 * _SIN3 + 2048) >> 12
        v7 = t
        t = _i32(v5 * _SIN1 + v6 * _COS1 + 2048) >> 12
        v5 = _i32(v5 * _COS1 - v6 * _SIN1 + 2048) >> 12
        v6 = t
        res = np.stack([v0 + v7, v1 + v6, v2 + v5, v3 + v4,
                        v3 - v4, v2 - v5, v1 - v6, v0 - v7], axis=1)
        res = np.where(res < 16, 0, np.where(res >= 4080, 255, res >> 4))
        res = np.where(zero_ac[:, None], t_flat[:, None], res)
        out[:, col::8] = res

    comp.block_data[gather] = out.astype(np.int16)
    comp.output = comp.block_data


def decode_jpeg(data: bytes, width: int, height: int,
                force_rgb: bool = True,
                decode_transform=None) -> tuple[bytes, int]:
    """JpegStream glue (reference :22361-22436): skip junk before the
    0xFF of SOI, parse, getData at the PDF draw dimensions.  Returns
    (pixel bytes, components per pixel)."""
    buf = bytes(data)
    start = 0
    while start < len(buf) and buf[start] != 0xFF:
        start += 1
    img = JpegImage()
    img.decode_transform = decode_transform
    img.parse(buf[start:])
    px = img.get_data(width, height, force_rgb)
    if force_rgb:
        # 4-comp sources return the full-length buffer with RGB packed
        # at the front (reference parity) — consumers want the triplets
        return px[:width * height * 3], 3
    if img.num_components == 4 and img._is_color_conversion_needed():
        return px, 4
    return px, img.num_components


def build_decode_transform(decode_arr, bits_per_component: int = 8):
    """Decode array -> Int32 (multiplier, additive) pairs, or None when
    the transform is the identity (reference JpegStream :22396-22413)."""
    if not decode_arr:
        return None
    max_value = (1 << bits_per_component) - 1
    transform = []
    needed = False
    for i in range(0, len(decode_arr), 2):
        m = int((decode_arr[i + 1] - decode_arr[i]) * 256)
        a = int(decode_arr[i] * max_value)
        transform += [m, a]
        if m != 256 or a != 0:
            needed = True
    return transform if needed else None
