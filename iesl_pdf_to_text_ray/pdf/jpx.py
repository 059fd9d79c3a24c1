"""JPEG 2000 (ITU-T T.800) decoder — behavioral port of the reference's
JpxImage (pdf.combined.js:10689-12880) and JpxStream glue (:22461).

Covers what the reference covers: JP2 box / raw codestream parsing, SIZ /
COD / QCD / QCC / SOT / SOD markers (COC raises, like the reference),
tile/precinct/codeblock geometry, all five progression-order packet
iterators, packet-header parsing (inclusion + zero-bitplane tag trees,
Lblock lengths), EBCOT tier-1 coefficient decoding (BitModel: three
passes over the MQ coder shared with pdf/jbig2.py), dequantization,
reversible 5/3 and irreversible 9/7 inverse DWT, and the reversible /
irreversible multiple-component transforms.  Float stores round through
float32 exactly like the reference's Float32Array writes, so outputs are
byte-identical.

Two reference quirks are reproduced on purpose (cross-validation against
the reference decoder depends on them): buildCodeblocks writes cbxMin
where cbyMin is meant when extending a precinct upward
(pdf.combined.js:11235), and getPrecinctIndexIfExist divides posY by the
precinct *width* (:11511).

The in-repo encoder (fixtures only — no JPEG2000 encoder ships in the
container) lives at the bottom: forward 5/3 DWT, tier-1 encoder that
mirrors BitModel pass-for-pass, tag-tree emission by simulating the
decoder's tree walk, and codestream assembly.  Round-tripping validates
the decoder against known pixels and the encoder against the reference
decoder (driven through node), the same strategy as pdf/ccitt.py and
pdf/jbig2.py.

Like the other pure-Python codecs this is a correctness path, not a
throughput path: tier-1 is per-coefficient sequential arithmetic coding.
"""

from __future__ import annotations

import math

import numpy as np

from .jbig2 import MQDecoder, MQEncoder
from .objects import PdfError

# Table E.1
_SUBBAND_GAIN_LOG2 = {"LL": 0, "LH": 1, "HL": 1, "HH": 2}


class JpxError(PdfError):
    pass


def _u16(d, p):
    return (d[p] << 8) | d[p + 1]


def _u32(d, p):
    return ((d[p] << 24) | (d[p + 1] << 16) | (d[p + 2] << 8) |
            d[p + 3]) & 0xFFFFFFFF


class _Obj(dict):
    """Attribute-style dict for the context trees."""
    __getattr__ = dict.get

    def __setattr__(self, k, v):
        self[k] = v


# ------------------------------------------------------------ geometry

def _calculate_component_dimensions(component, siz):
    # B.2 component mapping
    component.x0 = -(-siz.XOsiz // component.XRsiz)
    component.x1 = -(-siz.Xsiz // component.XRsiz)
    component.y0 = -(-siz.YOsiz // component.YRsiz)
    component.y1 = -(-siz.Ysiz // component.YRsiz)
    component.width = component.x1 - component.x0
    component.height = component.y1 - component.y0


def _calculate_tile_grids(context, components):
    siz = context.SIZ
    tiles = []
    num_x = -(-(siz.Xsiz - siz.XTOsiz) // siz.XTsiz)
    num_y = -(-(siz.Ysiz - siz.YTOsiz) // siz.YTsiz)
    for q in range(num_y):
        for p in range(num_x):
            tile = _Obj()
            tile.tx0 = max(siz.XTOsiz + p * siz.XTsiz, siz.XOsiz)
            tile.ty0 = max(siz.YTOsiz + q * siz.YTsiz, siz.YOsiz)
            tile.tx1 = min(siz.XTOsiz + (p + 1) * siz.XTsiz, siz.Xsiz)
            tile.ty1 = min(siz.YTOsiz + (q + 1) * siz.YTsiz, siz.Ysiz)
            tile.width = tile.tx1 - tile.tx0
            tile.height = tile.ty1 - tile.ty0
            tile.components = {}
            tiles.append(tile)
    context.tiles = tiles
    for i in range(siz.Csiz):
        component = components[i]
        for tile in tiles:
            tc = _Obj()
            tc.tcx0 = -(-tile.tx0 // component.XRsiz)
            tc.tcy0 = -(-tile.ty0 // component.YRsiz)
            tc.tcx1 = -(-tile.tx1 // component.XRsiz)
            tc.tcy1 = -(-tile.ty1 // component.YRsiz)
            tc.width = tc.tcx1 - tc.tcx0
            tc.height = tc.tcy1 - tc.tcy0
            tile.components[i] = tc


def _get_blocks_dimensions(component, r):
    cod = component.codingStyleParameters
    result = _Obj()
    if not cod.entropyCoderWithCustomPrecincts:
        result.PPx = 15
        result.PPy = 15
    else:
        result.PPx = cod.precinctsSizes[r]["PPx"]
        result.PPy = cod.precinctsSizes[r]["PPy"]
    # B.7 codeblock size
    result.xcb_ = (min(cod.xcb, result.PPx - 1) if r > 0
                   else min(cod.xcb, result.PPx))
    result.ycb_ = (min(cod.ycb, result.PPy - 1) if r > 0
                   else min(cod.ycb, result.PPy))
    return result


def _build_precincts(resolution, dimensions):
    # B.6
    precinct_width = 1 << dimensions.PPx
    precinct_height = 1 << dimensions.PPy
    is_zero_res = resolution.resLevel == 0
    pw_sub = 1 << (dimensions.PPx + (0 if is_zero_res else -1))
    ph_sub = 1 << (dimensions.PPy + (0 if is_zero_res else -1))
    numwide = (-(-resolution.trx1 // precinct_width) -
               (resolution.trx0 // precinct_width)
               if resolution.trx1 > resolution.trx0 else 0)
    numhigh = (-(-resolution.try1 // precinct_height) -
               (resolution.try0 // precinct_height)
               if resolution.try1 > resolution.try0 else 0)
    resolution.precinctParameters = _Obj(
        precinctWidth=precinct_width, precinctHeight=precinct_height,
        numprecinctswide=numwide, numprecinctshigh=numhigh,
        numprecincts=numwide * numhigh,
        precinctWidthInSubband=pw_sub, precinctHeightInSubband=ph_sub)


def _build_codeblocks(subband, dimensions):
    # B.7
    xcb_ = dimensions.xcb_
    ycb_ = dimensions.ycb_
    cb_w = 1 << xcb_
    cb_h = 1 << ycb_
    cbx0 = subband.tbx0 >> xcb_
    cby0 = subband.tby0 >> ycb_
    cbx1 = (subband.tbx1 + cb_w - 1) >> xcb_
    cby1 = (subband.tby1 + cb_h - 1) >> ycb_
    pp = subband.resolution.precinctParameters
    codeblocks = []
    precincts = {}
    for j in range(cby0, cby1):
        for i in range(cbx0, cbx1):
            cb = _Obj(cbx=i, cby=j,
                      tbx0=cb_w * i, tby0=cb_h * j,
                      tbx1=cb_w * (i + 1), tby1=cb_h * (j + 1))
            cb.tbx0_ = max(subband.tbx0, cb.tbx0)
            cb.tby0_ = max(subband.tby0, cb.tby0)
            cb.tbx1_ = min(subband.tbx1, cb.tbx1)
            cb.tby1_ = min(subband.tby1, cb.tby1)
            pi = (cb.tbx0_ - subband.tbx0) // pp.precinctWidthInSubband
            pj = (cb.tby0_ - subband.tby0) // pp.precinctHeightInSubband
            precinct_number = pi + pj * pp.numprecinctswide
            cb.precinctNumber = precinct_number
            cb.subbandType = subband.type
            cb.Lblock = 3
            if cb.tbx1_ <= cb.tbx0_ or cb.tby1_ <= cb.tby0_:
                continue
            codeblocks.append(cb)
            precinct = precincts.get(precinct_number)
            if precinct is not None:
                if i < precinct.cbxMin:
                    precinct.cbxMin = i
                elif i > precinct.cbxMax:
                    precinct.cbxMax = i
                if j < precinct.cbyMin:
                    # reference bug preserved: writes cbxMin here
                    # (pdf.combined.js:11235)
                    precinct.cbxMin = j
                elif j > precinct.cbyMax:
                    precinct.cbyMax = j
            else:
                precinct = _Obj(cbxMin=i, cbyMin=j, cbxMax=i, cbyMax=j)
                precincts[precinct_number] = precinct
            cb.precinct = precinct
    subband.codeblockParameters = _Obj(
        codeblockWidth=xcb_, codeblockHeight=ycb_,
        numcodeblockwide=cbx1 - cbx0 + 1, numcodeblockhigh=cby1 - cby0 + 1)
    subband.codeblocks = codeblocks
    subband.precincts = precincts


def _create_packet(resolution, precinct_number, layer_number):
    precinct_codeblocks = []
    for subband in resolution.subbands:          # LL | HL, LH, HH order
        for cb in subband.codeblocks:
            if cb.precinctNumber == precinct_number:
                precinct_codeblocks.append(cb)
    return _Obj(layerNumber=layer_number, codeblocks=precinct_codeblocks)


# --------------------------------------------------- progression orders

def _lrcp_iterator(context):
    siz = context.SIZ
    tile = context.tiles[context.currentTile.index]
    layers = tile.codingStyleDefaultParameters.layersCount
    max_lev = max(tile.components[q].codingStyleParameters
                  .decompositionLevelsCount for q in range(siz.Csiz))
    for l in range(layers):                              # noqa: E741
        for r in range(max_lev + 1):
            for i in range(siz.Csiz):
                component = tile.components[i]
                if r > component.codingStyleParameters \
                        .decompositionLevelsCount:
                    continue
                resolution = component.resolutions[r]
                for k in range(resolution.precinctParameters.numprecincts):
                    yield _create_packet(resolution, k, l)


def _rlcp_iterator(context):
    siz = context.SIZ
    tile = context.tiles[context.currentTile.index]
    layers = tile.codingStyleDefaultParameters.layersCount
    max_lev = max(tile.components[q].codingStyleParameters
                  .decompositionLevelsCount for q in range(siz.Csiz))
    for r in range(max_lev + 1):
        for l in range(layers):                          # noqa: E741
            for i in range(siz.Csiz):
                component = tile.components[i]
                if r > component.codingStyleParameters \
                        .decompositionLevelsCount:
                    continue
                resolution = component.resolutions[r]
                for k in range(resolution.precinctParameters.numprecincts):
                    yield _create_packet(resolution, k, l)


def _rpcl_iterator(context):
    siz = context.SIZ
    tile = context.tiles[context.currentTile.index]
    layers = tile.codingStyleDefaultParameters.layersCount
    max_lev = max(tile.components[c].codingStyleParameters
                  .decompositionLevelsCount for c in range(siz.Csiz))
    max_precincts = []
    for r in range(max_lev + 1):
        mx = 0
        for c in range(siz.Csiz):
            resolutions = tile.components[c].resolutions
            if r < len(resolutions):
                mx = max(mx,
                         resolutions[r].precinctParameters.numprecincts)
        max_precincts.append(mx)
    for r in range(max_lev + 1):
        for p in range(max_precincts[r]):
            for c in range(siz.Csiz):
                component = tile.components[c]
                if r > component.codingStyleParameters \
                        .decompositionLevelsCount:
                    continue
                resolution = component.resolutions[r]
                if p >= resolution.precinctParameters.numprecincts:
                    continue
                for l in range(layers):                  # noqa: E741
                    yield _create_packet(resolution, p, l)


def _precinct_index_if_exist(px, py, size_in_image_scale, iteration_sizes,
                             resolution):
    pos_x = px * iteration_sizes.minWidth
    pos_y = py * iteration_sizes.minHeight
    if pos_x % size_in_image_scale["width"] != 0 or \
            pos_y % size_in_image_scale["height"] != 0:
        return None
    # reference bug preserved: divides posY by width and posX by height
    # (pdf.combined.js:11511)
    start_row = (pos_y // size_in_image_scale["width"]) * \
        resolution.precinctParameters.numprecinctswide
    return (pos_x // size_in_image_scale["height"]) + start_row


def _precinct_sizes_in_image_scale(tile):
    components_count = len(tile.components)
    min_w = min_h = float("inf")
    max_wide = max_high = 0
    per_component = []
    for c in range(components_count):
        component = tile.components[c]
        lev = component.codingStyleParameters.decompositionLevelsCount
        per_resolution = [None] * (lev + 1)
        c_min_w = c_min_h = float("inf")
        c_max_wide = c_max_high = 0
        scale = 1
        for r in range(lev, -1, -1):
            resolution = component.resolutions[r]
            w = scale * resolution.precinctParameters.precinctWidth
            h = scale * resolution.precinctParameters.precinctHeight
            c_min_w = min(c_min_w, w)
            c_min_h = min(c_min_h, h)
            c_max_wide = max(c_max_wide,
                             resolution.precinctParameters.numprecinctswide)
            c_max_high = max(c_max_high,
                             resolution.precinctParameters.numprecinctshigh)
            per_resolution[r] = {"width": w, "height": h}
            scale <<= 1
        min_w = min(min_w, c_min_w)
        min_h = min(min_h, c_min_h)
        max_wide = max(max_wide, c_max_wide)
        max_high = max(max_high, c_max_high)
        per_component.append(_Obj(
            resolutions=per_resolution, minWidth=c_min_w, minHeight=c_min_h,
            maxNumWide=c_max_wide, maxNumHigh=c_max_high))
    return _Obj(components=per_component, minWidth=min_w, minHeight=min_h,
                maxNumWide=max_wide, maxNumHigh=max_high)


def _pcrl_iterator(context):
    siz = context.SIZ
    tile = context.tiles[context.currentTile.index]
    layers = tile.codingStyleDefaultParameters.layersCount
    sizes = _precinct_sizes_in_image_scale(tile)
    for py in range(sizes.maxNumHigh):
        for px in range(sizes.maxNumWide):
            for c in range(siz.Csiz):
                component = tile.components[c]
                lev = component.codingStyleParameters \
                    .decompositionLevelsCount
                for r in range(lev + 1):
                    resolution = component.resolutions[r]
                    k = _precinct_index_if_exist(
                        px, py, sizes.components[c].resolutions[r],
                        sizes, resolution)
                    if k is None:
                        continue
                    for l in range(layers):              # noqa: E741
                        yield _create_packet(resolution, k, l)


def _cprl_iterator(context):
    siz = context.SIZ
    tile = context.tiles[context.currentTile.index]
    layers = tile.codingStyleDefaultParameters.layersCount
    sizes = _precinct_sizes_in_image_scale(tile)
    for c in range(siz.Csiz):
        component = tile.components[c]
        iteration_sizes = sizes.components[c]
        lev = component.codingStyleParameters.decompositionLevelsCount
        for py in range(iteration_sizes.maxNumHigh):
            for px in range(iteration_sizes.maxNumWide):
                for r in range(lev + 1):
                    resolution = component.resolutions[r]
                    k = _precinct_index_if_exist(
                        px, py, iteration_sizes.resolutions[r],
                        iteration_sizes, resolution)
                    if k is None:
                        continue
                    for l in range(layers):              # noqa: E741
                        yield _create_packet(resolution, k, l)


_ITERATORS = (_lrcp_iterator, _rlcp_iterator, _rpcl_iterator,
              _pcrl_iterator, _cprl_iterator)


def _build_packets(context):
    siz = context.SIZ
    tile = context.tiles[context.currentTile.index]
    for c in range(siz.Csiz):
        component = tile.components[c]
        lev = component.codingStyleParameters.decompositionLevelsCount
        resolutions = []
        subbands = []
        for r in range(lev + 1):
            dims = _get_blocks_dimensions(component, r)
            resolution = _Obj()
            scale = 1 << (lev - r)
            resolution.trx0 = -(-component.tcx0 // scale)
            resolution.try0 = -(-component.tcy0 // scale)
            resolution.trx1 = -(-component.tcx1 // scale)
            resolution.try1 = -(-component.tcy1 // scale)
            resolution.resLevel = r
            _build_precincts(resolution, dims)
            resolutions.append(resolution)
            if r == 0:
                subband = _Obj(type="LL",
                               tbx0=-(-component.tcx0 // scale),
                               tby0=-(-component.tcy0 // scale),
                               tbx1=-(-component.tcx1 // scale),
                               tby1=-(-component.tcy1 // scale),
                               resolution=resolution)
                _build_codeblocks(subband, dims)
                subbands.append(subband)
                resolution.subbands = [subband]
            else:
                bscale = 1 << (lev - r + 1)
                res_subbands = []
                for stype in ("HL", "LH", "HH"):
                    half_x = 0.5 if stype[0] == "H" else 0.0
                    half_y = 0.5 if stype[1] == "H" else 0.0
                    subband = _Obj(
                        type=stype,
                        tbx0=math.ceil(component.tcx0 / bscale - half_x),
                        tby0=math.ceil(component.tcy0 / bscale - half_y),
                        tbx1=math.ceil(component.tcx1 / bscale - half_x),
                        tby1=math.ceil(component.tcy1 / bscale - half_y),
                        resolution=resolution)
                    _build_codeblocks(subband, dims)
                    subbands.append(subband)
                    res_subbands.append(subband)
                resolution.subbands = res_subbands
        component.resolutions = resolutions
        component.subbands = subbands
    order = tile.codingStyleDefaultParameters.progressionOrder
    if not 0 <= order < len(_ITERATORS):
        raise JpxError("JPX: unsupported progression order %d" % order)
    tile.packetsIterator = _ITERATORS[order](context)


# ---------------------------------------------------- tile packet parse

def _parse_tile_packets(context, data, offset, data_length):
    position = 0
    buffer = 0
    buffer_size = 0
    skip_next_bit = False

    def read_bits(count):
        nonlocal position, buffer, buffer_size, skip_next_bit
        while buffer_size < count:
            b = data[offset + position]
            position += 1
            if skip_next_bit:
                buffer = ((buffer << 7) | b) & 0xFFFFFFFF
                buffer_size += 7
                skip_next_bit = False
            else:
                buffer = ((buffer << 8) | b) & 0xFFFFFFFF
                buffer_size += 8
            if b == 0xFF:
                skip_next_bit = True
        buffer_size -= count
        return (buffer >> buffer_size) & ((1 << count) - 1)

    def skip_marker_if_equal(value):
        nonlocal position
        if data[offset + position - 1] == 0xFF and \
                data[offset + position] == value:
            position += 1
            return True
        if data[offset + position] == 0xFF and \
                data[offset + position + 1] == value:
            position += 2
            return True
        return False

    def align_to_byte():
        nonlocal buffer_size, position, skip_next_bit
        buffer_size = 0
        if skip_next_bit:
            position += 1
            skip_next_bit = False

    def read_coding_passes():
        if read_bits(1) == 0:
            return 1
        if read_bits(1) == 0:
            return 2
        value = read_bits(2)
        if value < 3:
            return value + 3
        value = read_bits(5)
        if value < 31:
            return value + 6
        return read_bits(7) + 37

    tile = context.tiles[context.currentTile.index]
    sop_used = context.COD.sopMarkerUsed
    eph_used = context.COD.ephMarkerUsed
    iterator = tile.packetsIterator
    while position < data_length:
        align_to_byte()
        if sop_used and skip_marker_if_equal(0x91):
            position += 4
        try:
            packet = next(iterator)
        except StopIteration:
            raise JpxError("JPX: out of packets")
        if not read_bits(1):
            continue
        layer_number = packet.layerNumber
        queue = []
        for cb in packet.codeblocks:
            precinct = cb.precinct
            col = cb.cbx - precinct.cbxMin
            row = cb.cby - precinct.cbyMin
            included = False
            first_time = False
            if cb.included is not None:
                included = bool(read_bits(1))
            else:
                inclusion_tree = precinct.inclusionTree
                if inclusion_tree is None:
                    width = precinct.cbxMax - precinct.cbxMin + 1
                    height = precinct.cbyMax - precinct.cbyMin + 1
                    inclusion_tree = _InclusionTree(width, height,
                                                    layer_number)
                    precinct.inclusionTree = inclusion_tree
                    precinct.zeroBitPlanesTree = _TagTree(width, height)
                if inclusion_tree.reset(col, row, layer_number):
                    while True:
                        if read_bits(1):
                            value_ready = not inclusion_tree.next_level()
                            if value_ready:
                                cb.included = True
                                included = first_time = True
                                break
                        else:
                            inclusion_tree.increment_value(layer_number)
                            break
            if not included:
                continue
            if first_time:
                zbp = precinct.zeroBitPlanesTree
                zbp.reset(col, row)
                while True:
                    if read_bits(1):
                        if not zbp.next_level():
                            break
                    else:
                        zbp.increment_value()
                cb.zeroBitPlanes = zbp.value
            coding_passes = read_coding_passes()
            while read_bits(1):
                cb.Lblock += 1
            cp_log2 = _log2_ref(coding_passes)
            bits = ((cp_log2 - 1 if coding_passes < (1 << cp_log2)
                     else cp_log2) + cb.Lblock)
            coded_length = read_bits(bits)
            queue.append((cb, coding_passes, coded_length))
        align_to_byte()
        if eph_used:
            skip_marker_if_equal(0x92)
        for cb, coding_passes, coded_length in queue:
            if cb.data is None:
                cb.data = []
            cb.data.append({"data": data, "start": offset + position,
                            "end": offset + position + coded_length,
                            "codingpasses": coding_passes})
            position += coded_length
    return position


def _log2_ref(x):
    n, i = 1, 0
    while x > n:
        n <<= 1
        i += 1
    return i


# -------------------------------------------------------------- tag trees

class _TreeLevel:
    __slots__ = ("width", "height", "items", "index")

    def __init__(self, width, height, items):
        self.width = width
        self.height = height
        self.items = items
        self.index = 0


class _TagTree:
    """B.10.2 (reference TagTree, pdf.combined.js:12147)."""

    def __init__(self, width, height):
        levels_length = _log2_ref(max(width, height)) + 1
        self.levels = []
        for _ in range(levels_length):
            self.levels.append(_TreeLevel(width, height, {}))
            width = -(-width // 2)
            height = -(-height // 2)
        self.value = None

    def reset(self, i, j):
        current_level = 0
        value = 0
        while current_level < len(self.levels):
            level = self.levels[current_level]
            index = i + j * level.width
            if index in level.items:
                value = level.items[index]
                break
            level.index = index
            i >>= 1
            j >>= 1
            current_level += 1
        current_level -= 1
        level = self.levels[current_level]
        level.items[level.index] = value
        self.currentLevel = current_level
        self.value = None

    def increment_value(self):
        level = self.levels[self.currentLevel]
        level.items[level.index] += 1

    def next_level(self):
        current_level = self.currentLevel
        level = self.levels[current_level]
        value = level.items[level.index]
        current_level -= 1
        if current_level < 0:
            self.value = value
            return False
        self.currentLevel = current_level
        level = self.levels[current_level]
        level.items[level.index] = value
        return True


class _InclusionTree:
    """reference InclusionTree (pdf.combined.js:12205)."""

    def __init__(self, width, height, default_value):
        levels_length = _log2_ref(max(width, height)) + 1
        self.levels = []
        for _ in range(levels_length):
            items = [default_value] * (width * height)
            self.levels.append(_TreeLevel(width, height, items))
            width = -(-width // 2)
            height = -(-height // 2)

    def reset(self, i, j, stop_value):
        current_level = 0
        while current_level < len(self.levels):
            level = self.levels[current_level]
            index = i + j * level.width
            level.index = index
            value = level.items[index]
            if value == 0xFF:
                break
            if value > stop_value:
                self.currentLevel = current_level
                self._propagate_values()
                return False
            i >>= 1
            j >>= 1
            current_level += 1
        self.currentLevel = current_level - 1
        return True

    def increment_value(self, stop_value):
        level = self.levels[self.currentLevel]
        level.items[level.index] = stop_value + 1
        self._propagate_values()

    def _propagate_values(self):
        level_index = self.currentLevel
        level = self.levels[level_index]
        current_value = level.items[level.index]
        while level_index > 0:
            level_index -= 1
            level = self.levels[level_index]
            level.items[level.index] = current_value

    def next_level(self):
        current_level = self.currentLevel
        level = self.levels[current_level]
        value = level.items[level.index]
        level.items[level.index] = 0xFF
        current_level -= 1
        if current_level < 0:
            return False
        self.currentLevel = current_level
        level = self.levels[current_level]
        level.items[level.index] = value
        return True


# ------------------------------------------------- tier-1: bit modeling

_UNIFORM_CONTEXT = 17
_RUNLENGTH_CONTEXT = 18

# Table D-1, indexed 0dddvvhh (reference pdf.combined.js:12290)
_LL_LH_LABELS = bytes([
    0, 5, 8, 0, 3, 7, 8, 0, 4, 7, 8, 0, 0, 0, 0, 0, 1, 6, 8, 0, 3, 7, 8, 0,
    4, 7, 8, 0, 0, 0, 0, 0, 2, 6, 8, 0, 3, 7, 8, 0, 4, 7, 8, 0, 0, 0, 0, 0,
    2, 6, 8, 0, 3, 7, 8, 0, 4, 7, 8, 0, 0, 0, 0, 0, 2, 6, 8, 0, 3, 7, 8, 0,
    4, 7, 8])
_HL_LABELS = bytes([
    0, 3, 4, 0, 5, 7, 7, 0, 8, 8, 8, 0, 0, 0, 0, 0, 1, 3, 4, 0, 6, 7, 7, 0,
    8, 8, 8, 0, 0, 0, 0, 0, 2, 3, 4, 0, 6, 7, 7, 0, 8, 8, 8, 0, 0, 0, 0, 0,
    2, 3, 4, 0, 6, 7, 7, 0, 8, 8, 8, 0, 0, 0, 0, 0, 2, 3, 4, 0, 6, 7, 7, 0,
    8, 8, 8])
_HH_LABELS = bytes([
    0, 1, 2, 0, 1, 2, 2, 0, 2, 2, 2, 0, 0, 0, 0, 0, 3, 4, 5, 0, 4, 5, 5, 0,
    5, 5, 5, 0, 0, 0, 0, 0, 6, 7, 7, 0, 7, 7, 7, 0, 7, 7, 7, 0, 0, 0, 0, 0,
    8, 8, 8, 0, 8, 8, 8, 0, 8, 8, 8, 0, 0, 0, 0, 0, 8, 8, 8, 0, 8, 8, 8, 0,
    8, 8, 8])


class _BitModel:
    """Section D coefficient bit modeling (reference BitModel,
    pdf.combined.js:12283).  The ``coder`` duck-types MQDecoder
    (read_bit) for decoding; the fixture encoder drives the same pass
    structure through _BitEncoderAdapter."""

    def __init__(self, width, height, subband, zero_bit_planes, mb):
        self.width = width
        self.height = height
        self.labels = (_HH_LABELS if subband == "HH" else
                       _HL_LABELS if subband == "HL" else _LL_LH_LABELS)
        n = width * height
        self.neighborsSignificance = bytearray(n)
        self.coefficentsSign = bytearray(n)
        self.coefficentsMagnitude = [0] * n
        self.processingFlags = bytearray(n)
        self.bitsDecoded = bytearray([zero_bit_planes] * n)
        self.reset()

    def set_decoder(self, decoder):
        self.decoder = decoder

    def reset(self):
        self.contexts = bytearray(19)
        self.contexts[0] = (4 << 1) | 0
        self.contexts[_UNIFORM_CONTEXT] = (46 << 1) | 0
        self.contexts[_RUNLENGTH_CONTEXT] = (3 << 1) | 0

    def set_neighbors_significance(self, row, column, index):
        ns = self.neighborsSignificance
        width = self.width
        height = self.height
        left = column > 0
        right = column + 1 < width
        if row > 0:
            i = index - width
            if left:
                ns[i - 1] += 0x10
            if right:
                ns[i + 1] += 0x10
            ns[i] += 0x04
        if row + 1 < height:
            i = index + width
            if left:
                ns[i - 1] += 0x10
            if right:
                ns[i + 1] += 0x10
            ns[i] += 0x04
        if left:
            ns[index - 1] += 0x01
        if right:
            ns[index + 1] += 0x01
        ns[index] |= 0x80

    def run_significance_propagation_pass(self):
        decoder = self.decoder
        width = self.width
        height = self.height
        mag = self.coefficentsMagnitude
        ns = self.neighborsSignificance
        flags = self.processingFlags
        contexts = self.contexts
        labels = self.labels
        bits_decoded = self.bitsDecoded
        for i0 in range(0, height, 4):
            for j in range(width):
                index = i0 * width + j
                for i1 in range(4):
                    i = i0 + i1
                    if i >= height:
                        break
                    flags[index] &= ~1 & 0xFF
                    if mag[index] or not ns[index]:
                        index += width
                        continue
                    context_label = labels[ns[index]]
                    decision = decoder.read_bit(contexts, context_label)
                    if decision:
                        sign = self.decode_sign_bit(i, j, index)
                        self.coefficentsSign[index] = sign
                        mag[index] = 1
                        self.set_neighbors_significance(i, j, index)
                        flags[index] |= 2
                    bits_decoded[index] += 1
                    flags[index] |= 1
                    index += width

    def sign_context(self, row, column, index):
        """(context_label, xor) for the sign of coefficient ``index``
        given current significance state; shared by decode and the
        fixture encoder."""
        width = self.width
        height = self.height
        mag = self.coefficentsMagnitude
        sign_arr = self.coefficentsSign
        # horizontal contribution
        significance1 = column > 0 and mag[index - 1] != 0
        if column + 1 < width and mag[index + 1] != 0:
            sign1 = sign_arr[index + 1]
            if significance1:
                sign0 = sign_arr[index - 1]
                contribution = 1 - sign1 - sign0
            else:
                contribution = 1 - sign1 - sign1
        elif significance1:
            sign0 = sign_arr[index - 1]
            contribution = 1 - sign0 - sign0
        else:
            contribution = 0
        horizontal = 3 * contribution
        # vertical contribution
        significance1 = row > 0 and mag[index - width] != 0
        if row + 1 < height and mag[index + width] != 0:
            sign1 = sign_arr[index + width]
            if significance1:
                sign0 = sign_arr[index - width]
                contribution = 1 - sign1 - sign0 + horizontal
            else:
                contribution = 1 - sign1 - sign1 + horizontal
        elif significance1:
            sign0 = sign_arr[index - width]
            contribution = 1 - sign0 - sign0 + horizontal
        else:
            contribution = horizontal
        if contribution >= 0:
            return 9 + contribution, 0
        return 9 - contribution, 1

    def decode_sign_bit(self, row, column, index):
        context_label, xor = self.sign_context(row, column, index)
        return self.decoder.read_bit(self.contexts, context_label) ^ xor

    def run_magnitude_refinement_pass(self):
        decoder = self.decoder
        width = self.width
        mag = self.coefficentsMagnitude
        ns = self.neighborsSignificance
        contexts = self.contexts
        bits_decoded = self.bitsDecoded
        flags = self.processingFlags
        length = width * self.height
        width4 = width * 4
        index0 = 0
        while index0 < length:
            index_next = min(length, index0 + width4)
            for j in range(width):
                index = index0 + j
                while index < index_next:
                    if not mag[index] or (flags[index] & 1) != 0:
                        index += width
                        continue
                    context_label = 16
                    if (flags[index] & 2) != 0:
                        flags[index] ^= 2
                        significance = ns[index] & 127
                        context_label = 15 if significance == 0 else 14
                    bit = decoder.read_bit(contexts, context_label)
                    mag[index] = (mag[index] << 1) | bit
                    bits_decoded[index] += 1
                    flags[index] |= 1
                    index += width
            index0 = index_next

    def run_cleanup_pass(self):
        decoder = self.decoder
        width = self.width
        height = self.height
        ns = self.neighborsSignificance
        mag = self.coefficentsMagnitude
        contexts = self.contexts
        labels = self.labels
        bits_decoded = self.bitsDecoded
        flags = self.processingFlags
        one_row = width
        two_rows = width * 2
        three_rows = width * 3
        i0 = 0
        while i0 < height:
            i_next = min(i0 + 4, height)
            index_base = i0 * width
            check_all_empty = i0 + 3 < height
            for j in range(width):
                index0 = index_base + j
                all_empty = (check_all_empty and
                             flags[index0] == 0 and
                             flags[index0 + one_row] == 0 and
                             flags[index0 + two_rows] == 0 and
                             flags[index0 + three_rows] == 0 and
                             ns[index0] == 0 and
                             ns[index0 + one_row] == 0 and
                             ns[index0 + two_rows] == 0 and
                             ns[index0 + three_rows] == 0)
                i1 = 0
                index = index0
                i = i0
                if all_empty:
                    has_significant = decoder.read_bit(contexts,
                                                       _RUNLENGTH_CONTEXT)
                    if not has_significant:
                        bits_decoded[index0] += 1
                        bits_decoded[index0 + one_row] += 1
                        bits_decoded[index0 + two_rows] += 1
                        bits_decoded[index0 + three_rows] += 1
                        continue
                    i1 = (decoder.read_bit(contexts, _UNIFORM_CONTEXT)
                          << 1) | \
                        decoder.read_bit(contexts, _UNIFORM_CONTEXT)
                    if i1 != 0:
                        i = i0 + i1
                        index += i1 * width
                    sign = self.decode_sign_bit(i, j, index)
                    self.coefficentsSign[index] = sign
                    mag[index] = 1
                    self.set_neighbors_significance(i, j, index)
                    flags[index] |= 2
                    index = index0
                    for _ in range(i0, i + 1):
                        bits_decoded[index] += 1
                        index += width
                    i1 += 1
                i = i0 + i1
                index = index0 + i1 * width
                while i < i_next:
                    if mag[index] or (flags[index] & 1) != 0:
                        i += 1
                        index += width
                        continue
                    context_label = labels[ns[index]]
                    decision = decoder.read_bit(contexts, context_label)
                    if decision == 1:
                        sign = self.decode_sign_bit(i, j, index)
                        self.coefficentsSign[index] = sign
                        mag[index] = 1
                        self.set_neighbors_significance(i, j, index)
                        flags[index] |= 2
                    bits_decoded[index] += 1
                    i += 1
                    index += width
            i0 = i_next

    def check_segmentation_symbol(self):
        decoder = self.decoder
        contexts = self.contexts
        symbol = (decoder.read_bit(contexts, _UNIFORM_CONTEXT) << 3) | \
                 (decoder.read_bit(contexts, _UNIFORM_CONTEXT) << 2) | \
                 (decoder.read_bit(contexts, _UNIFORM_CONTEXT) << 1) | \
                 decoder.read_bit(contexts, _UNIFORM_CONTEXT)
        if symbol != 0xA:
            raise JpxError("JPX: invalid segmentation symbol")


# --------------------------------------------- coefficients + transforms

def _copy_coefficients(coefficients, level_width, level_height, subband,
                       delta, mb, reversible, segmentation_symbol_used):
    x0 = subband.tbx0
    y0 = subband.tby0
    width = subband.tbx1 - subband.tbx0
    right = 1 if subband.type[0] == "H" else 0
    bottom = level_width if subband.type[1] == "H" else 0
    for cb in subband.codeblocks:
        block_width = cb.tbx1_ - cb.tbx0_
        block_height = cb.tby1_ - cb.tby0_
        if block_width == 0 or block_height == 0 or cb.data is None:
            continue
        bit_model = _BitModel(block_width, block_height, cb.subbandType,
                              cb.zeroBitPlanes, mb)
        current_pass = 2      # first bit plane starts from cleanup
        encoded = bytearray()
        coding_passes = 0
        for item in cb.data:
            encoded += bytes(item["data"][item["start"]:item["end"]])
            coding_passes += item["codingpasses"]
        decoder = MQDecoder(bytes(encoded), 0, len(encoded))
        bit_model.set_decoder(decoder)
        for _ in range(coding_passes):
            if current_pass == 0:
                bit_model.run_significance_propagation_pass()
            elif current_pass == 1:
                bit_model.run_magnitude_refinement_pass()
            else:
                bit_model.run_cleanup_pass()
                if segmentation_symbol_used:
                    bit_model.check_segmentation_symbol()
            current_pass = (current_pass + 1) % 3
        offset = (cb.tbx0_ - x0) + (cb.tby0_ - y0) * width
        sign = bit_model.coefficentsSign
        magnitude = bit_model.coefficentsMagnitude
        bits_decoded = bit_model.bitsDecoded
        magnitude_correction = 0 if reversible else 0.5
        position = 0
        interleave = subband.type != "LL"
        for _j in range(block_height):
            row = offset // width
            level_offset = 2 * row * (level_width - width) + right + bottom
            for _k in range(block_width):
                n = magnitude[position]
                if n != 0:
                    n = (n + magnitude_correction) * delta
                    if sign[position] != 0:
                        n = -n
                    nb = bits_decoded[position]
                    pos = (level_offset + (offset << 1)) if interleave \
                        else offset
                    if reversible and nb >= mb:
                        coefficients[pos] = n
                    else:
                        coefficients[pos] = n * (1 << (mb - nb))
                offset += 1
                position += 1
            offset += width - block_width


def _extend(buffer, offset, size):
    # F.3.7 symmetric extension (max extension 4)
    i1 = offset - 1
    j1 = offset + 1
    i2 = offset + size - 2
    j2 = offset + size
    buffer[i1] = buffer[j1]
    buffer[j2] = buffer[i2]
    buffer[i1 - 1] = buffer[j1 + 1]
    buffer[j2 + 1] = buffer[i2 - 1]
    buffer[i1 - 2] = buffer[j1 + 2]
    buffer[j2 + 2] = buffer[i2 - 2]
    buffer[i1 - 3] = buffer[j1 + 3]
    buffer[j2 + 3] = buffer[i2 - 3]


def _filter_reversible(x, offset, length):
    # F reversible 5/3 inverse lifting; values are integral, JS coerces
    # through ToInt32 for the shifts
    half = length >> 1
    j = offset
    for _ in range(half + 1):
        x[j] = float(int(x[j]) - ((int(x[j - 1]) + int(x[j + 1]) + 2) >> 2))
        j += 2
    j = offset + 1
    for _ in range(half):
        x[j] = float(int(x[j]) + ((int(x[j - 1]) + int(x[j + 1])) >> 1))
        j += 2


_F32 = np.float32


def _f32(v):
    """Round a float64 through float32 storage, like Float32Array writes."""
    return float(_F32(v))


def _filter_irreversible(x, offset, length):
    # 9/7 inverse lifting (reference irreversibleTransformFilter): JS
    # computes in float64 and stores into a Float32Array each step
    half = length >> 1
    alpha = -1.586134342059924
    beta = -0.052980118572961
    gamma = 0.882911075530934
    delta = 0.443506852043971
    K = 1.230174104914001
    K_ = 1 / K
    # step 2
    j = offset - 3
    for _ in range(half + 4):
        x[j] = _f32(x[j] * K_)
        j += 2
    # steps 1 & 3
    j = offset - 2
    current = delta * x[j - 1]
    n = half + 3
    while n > 0:
        n -= 1
        nxt = delta * x[j + 1]
        x[j] = _f32(K * x[j] - current - nxt)
        if n > 0:
            n -= 1
            j += 2
            current = delta * x[j + 1]
            x[j] = _f32(K * x[j] - current - nxt)
        else:
            break
        j += 2
    # step 4
    j = offset - 1
    current = gamma * x[j - 1]
    n = half + 2
    while n > 0:
        n -= 1
        nxt = gamma * x[j + 1]
        x[j] = _f32(x[j] - (current + nxt))
        if n > 0:
            n -= 1
            j += 2
            current = gamma * x[j + 1]
            x[j] = _f32(x[j] - (current + nxt))
        else:
            break
        j += 2
    # step 5
    j = offset
    current = beta * x[j - 1]
    n = half + 1
    while n > 0:
        n -= 1
        nxt = beta * x[j + 1]
        x[j] = _f32(x[j] - (current + nxt))
        if n > 0:
            n -= 1
            j += 2
            current = beta * x[j + 1]
            x[j] = _f32(x[j] - (current + nxt))
        else:
            break
        j += 2
    # step 6
    if half != 0:
        j = offset + 1
        current = alpha * x[j - 1]
        n = half
        while n > 0:
            n -= 1
            nxt = alpha * x[j + 1]
            x[j] = _f32(x[j] - (current + nxt))
            if n > 0:
                n -= 1
                j += 2
                current = alpha * x[j + 1]
                x[j] = _f32(x[j] - (current + nxt))
            else:
                break
            j += 2


def _transform_iterate(ll, hl_lh_hh, u0, v0, filter_fn):
    ll_width = ll["width"]
    ll_height = ll["height"]
    ll_items = ll["items"]
    width = hl_lh_hh["width"]
    height = hl_lh_hh["height"]
    items = hl_lh_hh["items"]
    # interleave LL (F.3.3)
    k = 0
    for i in range(ll_height):
        p = i * 2 * width
        for j in range(ll_width):
            items[p] = ll_items[k]
            k += 1
            p += 2
    pad = 4
    row_buffer = [0.0] * (width + 2 * pad)
    # HOR_SR
    if width == 1:
        if (u0 & 1) != 0:
            for v in range(height):
                items[v * width] = _f32(items[v * width] * 0.5)
    else:
        for v in range(height):
            k = v * width
            row_buffer[pad:pad + width] = items[k:k + width]
            _extend(row_buffer, pad, width)
            filter_fn(row_buffer, pad, width)
            items[k:k + width] = row_buffer[pad:pad + width]
    # VER_SR
    if height == 1:
        if (v0 & 1) != 0:
            for u in range(width):
                items[u] = _f32(items[u] * 0.5)
    else:
        col_buffer = [0.0] * (height + 2 * pad)
        for u in range(width):
            for i in range(height):
                col_buffer[pad + i] = items[u + i * width]
            _extend(col_buffer, pad, height)
            filter_fn(col_buffer, pad, height)
            for i in range(height):
                items[u + i * width] = col_buffer[pad + i]
    return {"width": width, "height": height, "items": items}


def _transform_calculate(subbands, u0, v0, filter_fn):
    ll = subbands[0]
    for i in range(1, len(subbands)):
        ll = _transform_iterate(ll, subbands[i], u0, v0, filter_fn)
    return ll


def _transform_tile(context, tile, c):
    component = tile.components[c]
    cod = component.codingStyleParameters
    quant = component.quantizationParameters
    lev = cod.decompositionLevelsCount
    spqcds = quant.SPqcds
    scalar_expounded = quant.scalarExpounded
    guard_bits = quant.guardBits
    segmentation = cod.segmentationSymbolUsed
    precision = context.components[c].precision
    reversible = cod.reversibleTransformation
    filter_fn = _filter_reversible if reversible else _filter_irreversible
    subband_coefficients = []
    b = 0
    for i in range(lev + 1):
        resolution = component.resolutions[i]
        width = resolution.trx1 - resolution.trx0
        height = resolution.try1 - resolution.try0
        coefficients = [0.0] * (width * height)
        for subband in resolution.subbands:
            if not scalar_expounded:
                mu = spqcds[0]["mu"]
                epsilon = spqcds[0]["epsilon"] + (1 - i if i > 0 else 0)
            else:
                mu = spqcds[b]["mu"]
                epsilon = spqcds[b]["epsilon"]
                b += 1
            gain_log2 = _SUBBAND_GAIN_LOG2[subband.type]
            delta = (1 if reversible else
                     math.pow(2, precision + gain_log2 - epsilon) *
                     (1 + mu / 2048))
            mb = guard_bits + epsilon - 1
            _copy_coefficients(coefficients, width, height, subband, delta,
                               mb, reversible, segmentation)
        subband_coefficients.append({"width": width, "height": height,
                                     "items": coefficients})
    result = _transform_calculate(subband_coefficients,
                                  component.tcx0, component.tcy0, filter_fn)
    return {"left": component.tcx0, "top": component.tcy0,
            "width": result["width"], "height": result["height"],
            "items": result["items"]}


def _transform_components(context):
    siz = context.SIZ
    components = context.components
    components_count = siz.Csiz
    result_images = []
    for tile in context.tiles:
        transformed = [_transform_tile(context, tile, c)
                       for c in range(components_count)]
        tile0 = transformed[0]
        out = bytearray(len(tile0["items"]) * components_count)
        result = {"left": tile0["left"], "top": tile0["top"],
                  "width": tile0["width"], "height": tile0["height"],
                  "items": out}
        pos = 0
        if tile.codingStyleDefaultParameters.multipleComponentTransform:
            four = components_count == 4
            y0i = transformed[0]["items"]
            y1i = transformed[1]["items"]
            y2i = transformed[2]["items"]
            y3i = transformed[3]["items"] if four else None
            shift = components[0].precision - 8
            offset = (128 << shift) + 0.5
            mx = 255 * (1 << shift)
            max_k = mx * 0.5
            mn = -max_k
            component0 = tile.components[0]
            alpha01 = components_count - 3
            jj = len(y0i)
            if not component0.codingStyleParameters.reversibleTransformation:
                for j in range(jj):
                    y0 = y0i[j] + offset
                    y1 = y1i[j]
                    y2 = y2i[j]
                    r = y0 + 1.402 * y2
                    g = y0 - 0.34413 * y1 - 0.71414 * y2
                    bb = y0 + 1.772 * y1
                    out[pos] = 0 if r <= 0 else \
                        255 if r >= mx else int(r) >> shift
                    out[pos + 1] = 0 if g <= 0 else \
                        255 if g >= mx else int(g) >> shift
                    out[pos + 2] = 0 if bb <= 0 else \
                        255 if bb >= mx else int(bb) >> shift
                    pos += 3 + alpha01
            else:
                for j in range(jj):
                    y0 = y0i[j] + offset
                    y1 = y1i[j]
                    y2 = y2i[j]
                    g = y0 - ((int(y2) + int(y1)) >> 2)
                    r = g + y2
                    bb = g + y1
                    out[pos] = 0 if r <= 0 else \
                        255 if r >= mx else int(r) >> shift
                    out[pos + 1] = 0 if g <= 0 else \
                        255 if g >= mx else int(g) >> shift
                    out[pos + 2] = 0 if bb <= 0 else \
                        255 if bb >= mx else int(bb) >> shift
                    pos += 3 + alpha01
            if four:
                pos = 3
                for j in range(jj):
                    k = y3i[j]
                    out[pos] = 0 if k <= mn else \
                        255 if k >= max_k else int(k + offset) >> shift
                    pos += 4
        else:
            for c in range(components_count):
                items = transformed[c]["items"]
                shift = components[c].precision - 8
                offset = (128 << shift) + 0.5
                mx = 127.5 * (1 << shift)
                mn = -mx
                pos = c
                for val in items:
                    out[pos] = 0 if val <= mn else \
                        255 if val >= mx else int(val + offset) >> shift
                    pos += components_count
        result_images.append(result)
    return result_images


def _initialize_tile(context, tile_index):
    siz = context.SIZ
    tile = context.tiles[tile_index]
    for c in range(siz.Csiz):
        component = tile.components[c]
        component.quantizationParameters = (
            context.currentTile.QCC.get(c) or context.currentTile.QCD)
        component.codingStyleParameters = (
            context.currentTile.COC.get(c) or context.currentTile.COD)
    tile.codingStyleDefaultParameters = context.currentTile.COD


# ------------------------------------------------------- codestream parse

class JpxImage:
    """reference JpxImage; ``parse`` accepts JP2 boxes or a raw
    codestream."""

    def __init__(self, fail_on_corrupted_image: bool = False):
        self.fail_on_corrupted_image = fail_on_corrupted_image
        self.tiles = []
        self.width = 0
        self.height = 0
        self.components_count = 0

    def parse(self, data):
        if len(data) >= 2 and _u16(data, 0) == 0xFF4F:
            self.parse_codestream(data, 0, len(data))
            return
        position = 0
        length = len(data)
        while position < length:
            header_size = 8
            lbox = _u32(data, position)
            tbox = _u32(data, position + 4)
            position += header_size
            if lbox == 1:
                lbox = _u32(data, position) * 4294967296 + \
                    _u32(data, position + 4)
                position += 8
                header_size += 8
            if lbox == 0:
                lbox = length - position + header_size
            if lbox < header_size:
                raise JpxError("JPX: invalid box field size")
            data_length = lbox - header_size
            jump = True
            if tbox == 0x6A703268:       # jp2h: parse children
                jump = False
            elif tbox == 0x6A703263:     # jp2c
                self.parse_codestream(data, position, position + data_length)
            # colr/jP/ftyp/rreq/res/ihdr and unknown boxes: skipped
            if jump:
                position += data_length
        if not self.tiles:
            raise JpxError("JPX: no codestream found")

    def parse_codestream(self, data, start, end):
        context = _Obj()
        try:
            do_not_recover = False
            position = start
            while position + 1 < end:
                code = _u16(data, position)
                position += 2
                length = 0
                if code == 0xFF4F:       # SOC
                    context.mainHeader = True
                elif code == 0xFFD9:     # EOC
                    pass
                elif code == 0xFF51:     # SIZ
                    length = _u16(data, position)
                    siz = _Obj()
                    siz.Xsiz = _u32(data, position + 4)
                    siz.Ysiz = _u32(data, position + 8)
                    if siz.Xsiz * siz.Ysiz > 1 << 28:
                        # corrupt headers must fail fast (recovery path
                        # still catches this), not allocate gigabytes
                        raise JpxError("JPX: unreasonable image size")
                    siz.XOsiz = _u32(data, position + 12)
                    siz.YOsiz = _u32(data, position + 16)
                    siz.XTsiz = _u32(data, position + 20)
                    siz.YTsiz = _u32(data, position + 24)
                    siz.XTOsiz = _u32(data, position + 28)
                    siz.YTOsiz = _u32(data, position + 32)
                    components_count = _u16(data, position + 36)
                    siz.Csiz = components_count
                    components = []
                    j = position + 38
                    for _ in range(components_count):
                        # reference quirks preserved: j never advances and
                        # YRsiz reads the XRsiz byte (pdf.combined.js:
                        # 10839-10846) — every component takes component
                        # 0's precision/subsampling
                        component = _Obj(
                            precision=(data[j] & 0x7F) + 1,
                            isSigned=bool(data[j] & 0x80),
                            XRsiz=data[j + 1], YRsiz=data[j + 1])
                        _calculate_component_dimensions(component, siz)
                        components.append(component)
                    context.SIZ = siz
                    context.components = components
                    _calculate_tile_grids(context, components)
                    context.QCC = {}
                    context.COC = {}
                elif code in (0xFF5C, 0xFF5D):   # QCD / QCC
                    length = _u16(data, position)
                    q = _Obj()
                    j = position + 2
                    cqcc = None
                    if code == 0xFF5D:
                        if context.SIZ.Csiz < 257:
                            cqcc = data[j]
                            j += 1
                        else:
                            cqcc = _u16(data, j)
                            j += 2
                    sqcd = data[j]
                    j += 1
                    kind = sqcd & 0x1F
                    if kind == 0:
                        spqcd_size, scalar_expounded = 8, True
                    elif kind == 1:
                        spqcd_size, scalar_expounded = 16, False
                    elif kind == 2:
                        spqcd_size, scalar_expounded = 16, True
                    else:
                        raise JpxError("JPX: invalid SQcd value %d" % sqcd)
                    q.noQuantization = spqcd_size == 8
                    q.scalarExpounded = scalar_expounded
                    q.guardBits = sqcd >> 5
                    spqcds = []
                    while j < length + position:
                        if spqcd_size == 8:
                            spqcds.append({"epsilon": data[j] >> 3, "mu": 0})
                            j += 1
                        else:
                            spqcds.append({
                                "epsilon": data[j] >> 3,
                                "mu": ((data[j] & 0x7) << 8) | data[j + 1]})
                            j += 2
                    q.SPqcds = spqcds
                    if code == 0xFF5C:
                        if context.mainHeader:
                            context.QCD = q
                        else:
                            context.currentTile.QCD = q
                            context.currentTile.QCC = {}
                    else:
                        if context.mainHeader:
                            context.QCC[cqcc] = q
                        else:
                            context.currentTile.QCC[cqcc] = q
                elif code == 0xFF52:     # COD
                    length = _u16(data, position)
                    cod = _Obj()
                    j = position + 2
                    scod = data[j]
                    j += 1
                    cod.entropyCoderWithCustomPrecincts = bool(scod & 1)
                    cod.sopMarkerUsed = bool(scod & 2)
                    cod.ephMarkerUsed = bool(scod & 4)
                    cod.progressionOrder = data[j]
                    j += 1
                    cod.layersCount = _u16(data, j)
                    j += 2
                    cod.multipleComponentTransform = data[j]
                    j += 1
                    cod.decompositionLevelsCount = data[j]
                    j += 1
                    cod.xcb = (data[j] & 0xF) + 2
                    j += 1
                    cod.ycb = (data[j] & 0xF) + 2
                    j += 1
                    block_style = data[j]
                    j += 1
                    cod.selectiveArithmeticCodingBypass = \
                        bool(block_style & 1)
                    cod.resetContextProbabilities = bool(block_style & 2)
                    cod.terminationOnEachCodingPass = bool(block_style & 4)
                    cod.verticalyStripe = bool(block_style & 8)
                    cod.predictableTermination = bool(block_style & 16)
                    cod.segmentationSymbolUsed = bool(block_style & 32)
                    cod.reversibleTransformation = data[j]
                    j += 1
                    if cod.entropyCoderWithCustomPrecincts:
                        sizes = []
                        while j < length + position:
                            b = data[j]
                            j += 1
                            sizes.append({"PPx": b & 0xF, "PPy": b >> 4})
                        cod.precinctsSizes = sizes
                    unsupported = [name for flag, name in (
                        (cod.selectiveArithmeticCodingBypass,
                         "selectiveArithmeticCodingBypass"),
                        (cod.resetContextProbabilities,
                         "resetContextProbabilities"),
                        (cod.terminationOnEachCodingPass,
                         "terminationOnEachCodingPass"),
                        (cod.verticalyStripe, "verticalyStripe"),
                        (cod.predictableTermination,
                         "predictableTermination")) if flag]
                    if unsupported:
                        do_not_recover = True
                        raise JpxError("JPX: unsupported COD options (%s)"
                                       % ", ".join(unsupported))
                    if context.mainHeader:
                        context.COD = cod
                    else:
                        context.currentTile.COD = cod
                        context.currentTile.COC = {}
                elif code == 0xFF90:     # SOT
                    length = _u16(data, position)
                    tile = _Obj()
                    tile.index = _u16(data, position + 2)
                    tile.length = _u32(data, position + 4)
                    tile.dataEnd = tile.length + position - 2
                    tile.partIndex = data[position + 8]
                    tile.partsCount = data[position + 9]
                    context.mainHeader = False
                    if tile.partIndex == 0:
                        tile.COD = context.COD
                        tile.COC = dict(context.COC)
                        tile.QCD = context.QCD
                        tile.QCC = dict(context.QCC)
                    context.currentTile = tile
                elif code == 0xFF93:     # SOD
                    tile = context.currentTile
                    if tile.partIndex == 0:
                        _initialize_tile(context, tile.index)
                        _build_packets(context)
                    length = tile.dataEnd - position
                    _parse_tile_packets(context, data, position, length)
                elif code in (0xFF55, 0xFF57, 0xFF58, 0xFF64):
                    length = _u16(data, position)   # TLM/PLM/PLT/COM: skip
                elif code == 0xFF53:
                    raise JpxError(
                        "JPX: codestream code 0xFF53 (COC) is "
                        "not implemented")
                else:
                    raise JpxError("JPX: unknown codestream code %04x"
                                   % code)
                position += length
        except Exception:
            if do_not_recover or self.fail_on_corrupted_image:
                raise
        self.tiles = _transform_components(context)
        self.width = context.SIZ.Xsiz - context.SIZ.XOsiz
        self.height = context.SIZ.Ysiz - context.SIZ.YOsiz
        self.components_count = context.SIZ.Csiz


def jpx_decode(data: bytes) -> tuple[bytes, int, int, int]:
    """reference JpxStream.ensureBuffer (pdf.combined.js:22480): returns
    (interleaved 8-bit samples, width, height, components)."""
    img = JpxImage()
    img.parse(data)
    width = img.width
    height = img.height
    ncomp = img.components_count
    if len(img.tiles) == 1:
        return bytes(img.tiles[0]["items"]), width, height, ncomp
    out = bytearray(width * height * ncomp)
    for t in img.tiles:
        tile_width = t["width"]
        src = t["items"]
        src_position = 0
        data_position = (width * t["top"] + t["left"]) * ncomp
        img_row = width * ncomp
        tile_row = tile_width * ncomp
        for _ in range(t["height"]):
            out[data_position:data_position + tile_row] = \
                src[src_position:src_position + tile_row]
            src_position += tile_row
            data_position += img_row
    return bytes(out), width, height, ncomp


# ================================================================
# Fixture encoder (tests only; see module docstring).  Re-uses the
# decoder's geometry machinery so packet structure agrees by
# construction, and mirrors BitModel's passes bit-for-bit.
# ================================================================

class _BitWriter:
    """Packet-header bit writer mirroring _parse_tile_packets'
    bit-stuffed reader: a byte following 0xFF carries only 7 bits."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0
        self.budget = 8

    def put_bit(self, bit):
        self.acc = (self.acc << 1) | bit
        self.nbits += 1
        if self.nbits == self.budget:
            self.out.append(self.acc)
            self.budget = 7 if self.acc == 0xFF else 8
            self.acc = 0
            self.nbits = 0

    def put_bits(self, v, n):
        for k in range(n - 1, -1, -1):
            self.put_bit((v >> k) & 1)

    def align(self):
        while self.nbits:
            self.put_bit(0)
        if self.out and self.out[-1] == 0xFF:
            # reader's align skips the post-FF stuffing byte
            self.out.append(0)
            self.budget = 8


def _mirror(k, n):
    """Whole-sample symmetric index reflection (period 2(n-1))."""
    if n == 1:
        return 0
    p = 2 * (n - 1)
    k = abs(k) % p
    return p - k if k > n - 1 else k


def _forward_53_1d(x):
    """Exact inverse of _filter_reversible + _extend boundary handling
    (see module docstring derivation): high first from original evens,
    then low from the new highs."""
    n = len(x)
    if n == 1:
        return list(x)
    out = list(x)
    for j in range(1, n, 2):        # high (odd positions)
        a = x[_mirror(j - 1, n)]
        b = x[_mirror(j + 1, n)]
        out[j] = x[j] - ((a + b) >> 1)
    for j in range(0, n, 2):        # low (even positions)
        jl = _mirror(j - 1, n)
        jr = _mirror(j + 1, n)
        a = out[jl] if jl % 2 else out[j]   # mirrors of odds stay odd
        b = out[jr] if jr % 2 else out[j]
        out[j] = x[j] + ((a + b + 2) >> 2)
    return out


def _forward_dwt_level(img):
    """One 2D forward 5/3 level (columns then rows — the inverse applies
    rows then columns).  img: list of rows of ints.  Returns (ll, hl,
    lh, hh) as row-major lists of rows."""
    h = len(img)
    w = len(img[0])
    cols = [[img[i][j] for i in range(h)] for j in range(w)]
    cols = [_forward_53_1d(c) for c in cols]
    rows = [[cols[j][i] for j in range(w)] for i in range(h)]
    rows = [_forward_53_1d(r) for r in rows]
    ll = [[rows[i][j] for j in range(0, w, 2)] for i in range(0, h, 2)]
    hl = [[rows[i][j] for j in range(1, w, 2)] for i in range(0, h, 2)]
    lh = [[rows[i][j] for j in range(0, w, 2)] for i in range(1, h, 2)]
    hh = [[rows[i][j] for j in range(1, w, 2)] for i in range(1, h, 2)]
    return ll, hl, lh, hh


def _tier1_encode(width, height, subband_type, mags, signs, mb):
    """EBCOT tier-1 encoder mirroring _BitModel's three passes; returns
    (data, coding_passes, zero_bit_planes)."""
    nbps = max((m.bit_length() for m in mags), default=0)
    if nbps == 0:
        return b"", 0, 0
    zbp = mb - nbps
    bm = _BitModel(width, height, subband_type, max(0, zbp), mb)
    enc = MQEncoder()
    contexts = bm.contexts
    flags = bm.processingFlags
    ns = bm.neighborsSignificance
    state_mag = bm.coefficentsMagnitude
    labels = bm.labels

    def encode_sign(i, j, index):
        label, xor = bm.sign_context(i, j, index)
        enc.encode_bit(contexts, label, signs[index] ^ xor)
        bm.coefficentsSign[index] = signs[index]

    def spp(p):
        for i0 in range(0, height, 4):
            for j in range(width):
                index = i0 * width + j
                for i1 in range(4):
                    i = i0 + i1
                    if i >= height:
                        break
                    flags[index] &= ~1 & 0xFF
                    if state_mag[index] or not ns[index]:
                        index += width
                        continue
                    bit = (mags[index] >> p) & 1
                    enc.encode_bit(contexts, labels[ns[index]], bit)
                    if bit:
                        encode_sign(i, j, index)
                        state_mag[index] = 1
                        bm.set_neighbors_significance(i, j, index)
                        flags[index] |= 2
                    flags[index] |= 1
                    index += width

    def mrp(p):
        length = width * height
        width4 = width * 4
        index0 = 0
        while index0 < length:
            index_next = min(length, index0 + width4)
            for j in range(width):
                index = index0 + j
                while index < index_next:
                    if not state_mag[index] or (flags[index] & 1) != 0:
                        index += width
                        continue
                    context_label = 16
                    if (flags[index] & 2) != 0:
                        flags[index] ^= 2
                        significance = ns[index] & 127
                        context_label = 15 if significance == 0 else 14
                    bit = (mags[index] >> p) & 1
                    enc.encode_bit(contexts, context_label, bit)
                    state_mag[index] = (state_mag[index] << 1) | bit
                    flags[index] |= 1
                    index += width
            index0 = index_next

    def cleanup(p):
        one_row = width
        two_rows = width * 2
        three_rows = width * 3
        i0 = 0
        while i0 < height:
            i_next = min(i0 + 4, height)
            index_base = i0 * width
            check_all_empty = i0 + 3 < height
            for j in range(width):
                index0 = index_base + j
                all_empty = (check_all_empty and
                             flags[index0] == 0 and
                             flags[index0 + one_row] == 0 and
                             flags[index0 + two_rows] == 0 and
                             flags[index0 + three_rows] == 0 and
                             ns[index0] == 0 and
                             ns[index0 + one_row] == 0 and
                             ns[index0 + two_rows] == 0 and
                             ns[index0 + three_rows] == 0)
                i1 = 0
                if all_empty:
                    first = None
                    for k in range(4):
                        if (mags[index0 + k * width] >> p) & 1:
                            first = k
                            break
                    enc.encode_bit(contexts, _RUNLENGTH_CONTEXT,
                                   0 if first is None else 1)
                    if first is None:
                        continue
                    enc.encode_bit(contexts, _UNIFORM_CONTEXT,
                                   (first >> 1) & 1)
                    enc.encode_bit(contexts, _UNIFORM_CONTEXT, first & 1)
                    i = i0 + first
                    index = index0 + first * width
                    encode_sign(i, j, index)
                    state_mag[index] = 1
                    bm.set_neighbors_significance(i, j, index)
                    flags[index] |= 2
                    i1 = first + 1
                i = i0 + i1
                index = index0 + i1 * width
                while i < i_next:
                    if state_mag[index] or (flags[index] & 1) != 0:
                        i += 1
                        index += width
                        continue
                    bit = (mags[index] >> p) & 1
                    enc.encode_bit(contexts, labels[ns[index]], bit)
                    if bit:
                        encode_sign(i, j, index)
                        state_mag[index] = 1
                        bm.set_neighbors_significance(i, j, index)
                        flags[index] |= 2
                    i += 1
                    index += width
            i0 = i_next

    cleanup(nbps - 1)
    passes = 1
    for p in range(nbps - 2, -1, -1):
        spp(p)
        mrp(p)
        cleanup(p)
        passes += 3
    return enc.flush(), passes, max(0, zbp)


def _encode_coding_passes(writer, n):
    if n == 1:
        writer.put_bit(0)
    elif n == 2:
        writer.put_bits(0b10, 2)
    elif n <= 5:
        writer.put_bits(0b11, 2)
        writer.put_bits(n - 3, 2)
    elif n <= 36:
        writer.put_bits(0b11, 2)
        writer.put_bits(3, 2)
        writer.put_bits(n - 6, 5)
    else:
        writer.put_bits(0b11, 2)
        writer.put_bits(3, 2)
        writer.put_bits(31, 5)
        writer.put_bits(n - 37, 7)


def _tree_mins(width, height, leaf_values):
    """Per-level subtree minima matching _TagTree/_InclusionTree level
    geometry; unqueried leaves hold +inf."""
    levels = []
    w, h = width, height
    cur = leaf_values
    for _ in range(_log2_ref(max(width, height)) + 1):
        levels.append((w, cur))
        nw, nh = -(-w // 2), -(-h // 2)
        nxt = [float("inf")] * (nw * nh)
        for j in range(h):
            for i in range(w):
                v = cur[i + j * w]
                ni = (i >> 1) + (j >> 1) * nw
                if v < nxt[ni]:
                    nxt[ni] = v
        w, h, cur = nw, nh, nxt
    return levels


def _emit_tagtree(writer, tree: "_TagTree", mins, i, j, target):
    tree.reset(i, j)
    while True:
        level = tree.currentLevel
        idx = tree.levels[level].index
        cur = tree.levels[level].items[idx]
        node_target = mins[level][1][idx]
        if cur < node_target:
            writer.put_bit(0)
            tree.increment_value()
        else:
            writer.put_bit(1)
            if not tree.next_level():
                assert tree.value == target
                break


def _emit_inclusion(writer, tree: "_InclusionTree", mins, col, row,
                    included):
    if not tree.reset(col, row, 0):
        return False                  # excluded via earlier ancestor bit
    while True:
        level = tree.currentLevel
        idx = tree.levels[level].index
        node_target = mins[level][1][idx]
        if node_target == 0:
            writer.put_bit(1)
            if not tree.next_level():
                return True           # reached leaf: included
        else:
            writer.put_bit(0)
            tree.increment_value(0)
            return False


def encode_j2k(component_planes, *, levels: int = 1, xcb: int = 6,
               ycb: int = 6, progression: int = 0, reversible: bool = True,
               mct: bool = False, tile_size: tuple | None = None,
               precision: int = 8, guard_bits: int = 2) -> bytes:
    """Build a raw JPEG 2000 codestream for the given 8-bit component
    planes (list of 2D row lists, all same size).  Single layer, no
    custom precincts, origin 0.  With ``reversible=False`` the 5/3
    coefficients are deliberately re-tagged as 9/7 (there is no 9/7
    forward here): pixels will NOT round-trip, but the stream exercises
    the irreversible decode path deterministically for cross-validation
    against the reference decoder."""
    ncomp = len(component_planes)
    height = len(component_planes[0])
    width = len(component_planes[0][0])
    xt, yt = tile_size if tile_size else (width, height)

    # DC level shift / MCT (G.2)
    if mct:
        if ncomp != 3:
            raise JpxError("fixture: MCT needs 3 components")
        shifted = [[[0] * width for _ in range(height)] for _ in range(3)]
        for y in range(height):
            for x in range(width):
                r = component_planes[0][y][x]
                g = component_planes[1][y][x]
                b = component_planes[2][y][x]
                y1 = b - g
                y2 = r - g
                y0 = g + ((y1 + y2) >> 2) - 128
                shifted[0][y][x] = y0
                shifted[1][y][x] = y1
                shifted[2][y][x] = y2
    else:
        shifted = [[[v - 128 for v in row] for row in plane]
                   for plane in component_planes]

    # headers ------------------------------------------------------
    def u16(v):
        return v.to_bytes(2, "big")

    def u32(v):
        return v.to_bytes(4, "big")

    out = bytearray()
    out += b"\xFF\x4F"                                  # SOC
    siz = bytearray()
    siz += u16(0)                                       # Rsiz
    siz += u32(width) + u32(height) + u32(0) + u32(0)
    siz += u32(xt) + u32(yt) + u32(0) + u32(0)
    siz += u16(ncomp)
    for _ in range(ncomp):
        siz += bytes([precision - 1, 1, 1])
    out += b"\xFF\x51" + u16(len(siz) + 2) + siz
    cod = bytearray()
    cod.append(0)                                       # Scod
    cod.append(progression)
    cod += u16(1)                                       # layers
    cod.append(1 if mct else 0)
    cod.append(levels)
    cod.append(xcb - 2)
    cod.append(ycb - 2)
    cod.append(0)                                       # block style
    cod.append(1 if reversible else 0)
    out += b"\xFF\x52" + u16(len(cod) + 2) + cod
    # QCD: scalar expounded; epsilon = precision + gain (delta == 1)
    n_subbands = 1 + 3 * levels
    qcd = bytearray()
    if reversible:
        qcd.append((guard_bits << 5) | 0)               # 8-bit, no quant
        gains = [0] + [g for _ in range(levels) for g in (1, 1, 2)]
        for gain in gains:
            qcd.append((precision + gain) << 3)
    else:
        qcd.append((guard_bits << 5) | 2)               # 16-bit expounded
        gains = [0] + [g for _ in range(levels) for g in (1, 1, 2)]
        for gain in gains:
            eps = precision + gain
            qcd += bytes([eps << 3, 0])
    out += b"\xFF\x5C" + u16(len(qcd) + 2) + qcd

    # decoder-geometry context to mirror packet structure ----------
    context = _Obj()
    context.mainHeader = True
    siz_obj = _Obj(Xsiz=width, Ysiz=height, XOsiz=0, YOsiz=0,
                   XTsiz=xt, YTsiz=yt, XTOsiz=0, YTOsiz=0, Csiz=ncomp)
    components = []
    for _ in range(ncomp):
        comp = _Obj(precision=precision, isSigned=False, XRsiz=1, YRsiz=1)
        _calculate_component_dimensions(comp, siz_obj)
        components.append(comp)
    context.SIZ = siz_obj
    context.components = components
    _calculate_tile_grids(context, components)
    context.QCC = {}
    context.COC = {}
    cod_obj = _Obj(entropyCoderWithCustomPrecincts=False,
                   sopMarkerUsed=False, ephMarkerUsed=False,
                   progressionOrder=progression, layersCount=1,
                   multipleComponentTransform=1 if mct else 0,
                   decompositionLevelsCount=levels, xcb=xcb, ycb=ycb,
                   selectiveArithmeticCodingBypass=False,
                   resetContextProbabilities=False,
                   terminationOnEachCodingPass=False,
                   verticalyStripe=False, predictableTermination=False,
                   segmentationSymbolUsed=False,
                   reversibleTransformation=1 if reversible else 0)
    context.COD = cod_obj
    spqcds = [{"epsilon": precision + g, "mu": 0} for g in
              [0] + [g for _ in range(levels) for g in (1, 1, 2)]]
    context.QCD = _Obj(noQuantization=reversible, scalarExpounded=True,
                       guardBits=guard_bits, SPqcds=spqcds)
    assert len(spqcds) == n_subbands

    n_tiles = len(context.tiles)
    for tile_index in range(n_tiles):
        tile = context.tiles[tile_index]
        context.currentTile = _Obj(index=tile_index, partIndex=0,
                                   COD=cod_obj, COC={}, QCD=context.QCD,
                                   QCC={})
        context.mainHeader = False
        _initialize_tile(context, tile_index)
        _build_packets(context)

        # per-component forward DWT over the tile region -------------
        subband_values = {}          # id(subband) -> {(x,y)->value}
        for c in range(ncomp):
            component = tile.components[c]
            img = [[shifted[c][y][x]
                    for x in range(component.tcx0, component.tcx1)]
                   for y in range(component.tcy0, component.tcy1)]
            current = img
            for r in range(levels, 0, -1):
                ll, hl, lh, hh = _forward_dwt_level(current)
                resolution = component.resolutions[r]
                for stype, vals in (("HL", hl), ("LH", lh), ("HH", hh)):
                    subband = next(s for s in resolution.subbands
                                   if s.type == stype)
                    subband_values[id(subband)] = vals
                current = ll
            ll_subband = component.resolutions[0].subbands[0]
            subband_values[id(ll_subband)] = current

        # tier-1 encode every codeblock ------------------------------
        cb_payload = {}
        for c in range(ncomp):
            component = tile.components[c]
            for subband in component.subbands:
                vals = subband_values[id(subband)]
                gain = _SUBBAND_GAIN_LOG2[subband.type]
                mb = guard_bits + (precision + gain) - 1
                for cb in subband.codeblocks:
                    bw = cb.tbx1_ - cb.tbx0_
                    bh = cb.tby1_ - cb.tby0_
                    mags = []
                    sgns = []
                    for yy in range(cb.tby0_ - subband.tby0,
                                    cb.tby1_ - subband.tby0):
                        for xx in range(cb.tbx0_ - subband.tbx0,
                                        cb.tbx1_ - subband.tbx0):
                            v = vals[yy][xx]
                            mags.append(abs(v))
                            sgns.append(1 if v < 0 else 0)
                    data, passes, zbp = _tier1_encode(
                        bw, bh, subband.type, mags, sgns, mb)
                    cb_payload[id(cb)] = (data, passes, zbp)

        # packets (same iterator as the decoder) ---------------------
        body = bytearray()
        writer = None
        iterator = tile.packetsIterator
        incl_state = {}
        while True:
            try:
                packet = next(iterator)
            except StopIteration:
                break
            writer = _BitWriter()
            has_any = any(cb_payload[id(cb)][1] > 0
                          for cb in packet.codeblocks)
            if not has_any:
                # zero-length packet: one 0 bit, nothing contributes
                writer.put_bit(0)
                writer.align()
                body += writer.out
                continue
            writer.put_bit(1)
            chunks = []
            for cb in packet.codeblocks:
                precinct = cb.precinct
                key = id(precinct)
                if key not in incl_state:
                    pw = precinct.cbxMax - precinct.cbxMin + 1
                    ph = precinct.cbyMax - precinct.cbyMin + 1
                    leaf_incl = [1] * (pw * ph)
                    leaf_zbp = [float("inf")] * (pw * ph)
                    for other in packet.codeblocks:
                        if other.precinct is not precinct:
                            continue
                        oc = other.cbx - precinct.cbxMin
                        orr = other.cby - precinct.cbyMin
                        _, opasses, ozbp = cb_payload[id(other)]
                        if opasses > 0:
                            leaf_incl[oc + orr * pw] = 0
                            leaf_zbp[oc + orr * pw] = ozbp
                    incl_state[key] = (
                        _InclusionTree(pw, ph, 0), _TagTree(pw, ph),
                        _tree_mins(pw, ph, leaf_incl),
                        _tree_mins(pw, ph, leaf_zbp))
                itree, ztree, imins, zmins = incl_state[key]
                col = cb.cbx - precinct.cbxMin
                row = cb.cby - precinct.cbyMin
                data, passes, zbp = cb_payload[id(cb)]
                included = _emit_inclusion(writer, itree, imins, col, row,
                                           passes > 0)
                if not included:
                    continue
                _emit_tagtree(writer, ztree, zmins, col, row, zbp)
                _encode_coding_passes(writer, passes)
                cp_log2 = _log2_ref(passes)
                base_bits = (cp_log2 - 1 if passes < (1 << cp_log2)
                             else cp_log2)
                need = max(1, len(data)).bit_length() \
                    if len(data) > 0 else 1
                lblock = 3
                while base_bits + lblock < need:
                    writer.put_bit(1)
                    lblock += 1
                writer.put_bit(0)
                writer.put_bits(len(data), base_bits + lblock)
                chunks.append(data)
            writer.align()
            body += writer.out
            for data in chunks:
                body += data

        sot_payload_len = 10 + 2 + len(body)   # SOT seg + SOD marker + body
        out += b"\xFF\x90" + u16(10) + u16(tile_index) + \
            u32(sot_payload_len + 2) + bytes([0, 1])
        out += b"\xFF\x93" + body
    out += b"\xFF\xD9"                                  # EOC
    return bytes(out)
