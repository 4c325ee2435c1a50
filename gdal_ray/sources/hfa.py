"""HFA (Erdas Imagine .img) raster reader.

Reference: frmts/hfa/hfaopen.cpp (header + entry tree + the
self-describing data dictionary), hfafield.cpp (field syntax and
instance layout: pointer fields carry an 8-byte count+offset prefix
with the payload inline, BASEDATA carries a 12-byte rows/cols/type
header), hfaband.cpp (RasterDMS blockinfo, "ESRI GRID compression"
blocks: 13-byte min/runs/offset/bits header, 2-bit-tagged variable-
length repeat counts, MSB value lanes, reduced-precision fallback).

Scope: read-only — all 13 EPT pixel types incl. bit-packed u1/u2/u4
(promoted to uint8 like the reference band model), uncompressed and
RLE-compressed blocks, multi-band stacks, Eprj_MapInfo georeferencing.
Spill files (.ige ExternalRasterDMS) and overviews (.rrd) raise.

Conformance: the reference's own autotest/gcore/hfa_read.py init_list
(byte/int16/uint16/int32/uint32/float32/float64 4672, utmsmall 50054,
2bit_compressed 11918) in tests/test_hfa.py.
"""

from __future__ import annotations

import struct

import numpy as np

_EPT_NAMES = ["u1", "u2", "u4", "u8", "s8", "u16", "s16", "u32", "s32",
              "f32", "f64", "c64", "c128"]
_EPT_BITS = [1, 2, 4, 8, 8, 16, 16, 32, 32, 32, 64, 64, 128]
_EPT_NP = {3: np.uint8, 4: np.int8, 5: np.dtype("<u2"), 6: np.dtype("<i2"),
           7: np.dtype("<u4"), 8: np.dtype("<i4"), 9: np.dtype("<f4"),
           10: np.dtype("<f8"), 11: np.dtype("<c8"), 12: np.dtype("<c16")}

_BASIC_SIZE = {"1": 1, "2": 1, "4": 1, "c": 1, "C": 1, "e": 2, "s": 2,
               "S": 2, "t": 4, "l": 4, "L": 4, "f": 4, "d": 8, "m": 8,
               "M": 16}
_BASIC_FMT = {"s": "<H", "S": "<h", "t": "<I", "l": "<i", "L": "<I",
              "f": "<f", "d": "<d"}


def sniff_hfa(data: bytes) -> bool:
    return data[:15] == b"EHFA_HEADER_TAG"


# ---------------------------------------------------------------------------
# data dictionary (hfafield.cpp HFAField::Initialize syntax)

class _Field:
    __slots__ = ("count", "pointer", "itype", "obj", "enums", "name")

    def __init__(self, count, pointer, itype, obj, enums, name):
        self.count = count
        self.pointer = pointer
        self.itype = itype
        self.obj = obj
        self.enums = enums
        self.name = name


def parse_dictionary(text: str) -> dict[str, list[_Field]]:
    """'{fields}TypeName,{...}Name,...' until '.'; field syntax
    count ':' [p|*] typechar [objname ','] [enumdef] name ','."""
    types: dict[str, list[_Field]] = {}
    i = 0
    n = len(text)
    while i < n and text[i] == "{":
        fields, i = _parse_fields(text, i + 1)
        j = text.index(",", i)
        types[text[i:j]] = fields
        i = j + 1
    return types


def _parse_fields(text: str, i: int) -> tuple[list[_Field], int]:
    fields = []
    while text[i] != "}":
        j = text.index(":", i)
        count = int(text[i:j])
        i = j + 1
        pointer = ""
        if text[i] in "p*":
            pointer = text[i]
            i += 1
        itype = text[i]
        i += 1
        obj = None
        enums = None
        if itype == "o":
            j = text.index(",", i)
            obj = text[i:j]
            i = j + 1
        elif itype == "x" and text[i] == "{":
            # inline definition: skip braces, then the type name
            depth = 1
            i += 1
            while depth:
                if text[i] == "{":
                    depth += 1
                elif text[i] == "}":
                    depth -= 1
                i += 1
            itype = "o"
            j = text.index(",", i)
            obj = text[i:j]
            i = j + 1
        if itype == "e":
            j = text.index(":", i)
            n_enum = int(text[i:j])
            i = j + 1
            enums = []
            for _ in range(n_enum):
                j = text.index(",", i)
                enums.append(text[i:j])
                i = j + 1
        j = text.index(",", i)
        fields.append(_Field(count, pointer, itype, obj, enums, text[i:j]))
        i = j + 1
    return fields, i + 1


def _decode_instance(data: bytes, off: int, fields: list[_Field],
                     types: dict) -> tuple[dict, int]:
    """One instance of a composite type -> ({field: value}, next offset).
    Pointer fields: 4-byte count + 4-byte (ignored) file offset, payload
    inline (hfafield.cpp ExtractInstValue skips 8 then reads)."""
    out: dict = {}
    end = len(data)
    for f in fields:
        if off >= end:
            break
        count = f.count
        if f.pointer:
            count = struct.unpack_from("<I", data, off)[0]
            off += 8
        it = f.itype
        if it == "b":  # BASEDATA: rows, cols, itemtype, (pad), payload
            rows, cols = struct.unpack_from("<ii", data, off)
            btype = struct.unpack_from("<h", data, off + 8)[0]
            off += 12
            npx = max(rows, 0) * max(cols, 0)
            nbytes = (_EPT_BITS[btype] * npx + 7) // 8 if 0 <= btype < 13 \
                else 0
            if btype in _EPT_NP:
                out[f.name] = np.frombuffer(
                    data, _EPT_NP[btype], count=npx, offset=off)
            off += nbytes
        elif it == "o":
            sub = types[f.obj]
            vals = []
            for _ in range(count):
                v, off = _decode_instance(data, off, sub, types)
                vals.append(v)
            out[f.name] = vals[0] if count == 1 else vals
        elif it in "cC":
            raw = data[off:off + count]
            off += count
            out[f.name] = raw.split(b"\0")[0].decode("latin-1")
        else:
            size = _BASIC_SIZE[it]
            vals = []
            for _ in range(count):
                if off + size > end:
                    break
                if it in "124C":
                    vals.append(data[off])
                elif it == "e":
                    vals.append(struct.unpack_from("<H", data, off)[0])
                elif it in "mM":
                    vals.append(None)  # complex scalars unused here
                else:
                    vals.append(struct.unpack_from(_BASIC_FMT[it],
                                                   data, off)[0])
                off += size
            out[f.name] = vals[0] if len(vals) == 1 else vals
    return out, off


# ---------------------------------------------------------------------------
# entry tree

class _Entry:
    __slots__ = ("name", "type", "data_pos", "data_size", "children")

    def __init__(self, name, type_, data_pos, data_size):
        self.name = name
        self.type = type_
        self.data_pos = data_pos
        self.data_size = data_size
        self.children: list[_Entry] = []

    def find(self, type_=None, name=None):
        for c in self.children:
            if ((type_ is None or c.type == type_) and
                    (name is None or c.name == name)):
                return c
        return None


def _read_entry(data: bytes, pos: int) -> tuple[_Entry, int, int]:
    nxt, _prev, _parent, child, dpos, dsize = \
        struct.unpack_from("<IIIIIi", data, pos)
    name = data[pos + 24:pos + 88].split(b"\0")[0].decode("latin-1")
    type_ = data[pos + 88:pos + 120].split(b"\0")[0].decode("latin-1")
    return _Entry(name, type_, dpos, dsize), nxt, child


def _read_tree(data: bytes, pos: int) -> tuple[_Entry, int]:
    ent, nxt, child = _read_entry(data, pos)
    while child:
        c, child = _read_tree(data, child)
        ent.children.append(c)
    return ent, nxt


# ---------------------------------------------------------------------------
# compressed blocks (hfaband.cpp UncompressBlock)

def _read_rle_counts(buf: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    counts = np.empty(n, np.int64)
    for i in range(n):
        b0 = buf[pos]
        tag = b0 >> 6
        v = b0 & 0x3F
        for k in range(tag):
            v = v * 256 + buf[pos + 1 + k]
        counts[i] = v
        pos += 1 + tag
    return counts, pos


def _read_values(buf: bytes, pos: int, n: int, nbits: int) -> np.ndarray:
    """n raw values of nbits each; sub-byte lanes are LSB-first within
    the byte, 16/32-bit lanes are BIG-endian (CPL_MSBPTR32 path)."""
    if nbits == 0:
        return np.zeros(n, np.int64)
    if nbits == 8:
        return np.frombuffer(buf, np.uint8, count=n, offset=pos) \
            .astype(np.int64)
    if nbits == 16:
        return np.frombuffer(buf, ">u2", count=n, offset=pos) \
            .astype(np.int64)
    if nbits == 32:
        return np.frombuffer(buf, ">i4", count=n, offset=pos) \
            .astype(np.int64)
    nbytes = (n * nbits + 7) // 8
    bits = np.unpackbits(np.frombuffer(buf, np.uint8, count=nbytes,
                                       offset=pos)[:, None],
                         axis=1, bitorder="little").ravel()
    lanes = bits[:n * nbits].reshape(n, nbits)
    weights = (1 << np.arange(nbits, dtype=np.int64))
    return lanes @ weights


def _uncompress_block(cdata: bytes, n_pixels: int, ept: int) -> np.ndarray:
    data_min = struct.unpack_from("<I", cdata, 0)[0]
    n_runs = struct.unpack_from("<i", cdata, 4)[0]
    data_off = struct.unpack_from("<i", cdata, 8)[0]
    nbits = cdata[12]

    if n_runs == -1:    # reduced precision, no runs
        vals = _read_values(cdata, 13, n_pixels, nbits) + int(data_min)
    else:
        counts, _ = _read_rle_counts(cdata, 13, n_runs)
        rvals = _read_values(cdata, data_off, n_runs, nbits) + int(data_min)
        total = int(counts.sum())
        if total > n_pixels:    # clamp like the reference
            over = np.cumsum(counts) > n_pixels
            first = int(np.argmax(over))
            counts[first] = n_pixels - int(counts[:first].sum())
            counts[first + 1:] = 0
        vals = np.repeat(rvals, counts)
        if len(vals) < n_pixels:
            vals = np.concatenate([vals, np.zeros(n_pixels - len(vals),
                                                  np.int64)])
    if ept == 9:        # f32 carried as signed-int bit pattern (bug #1000)
        return vals.astype(np.int32).view(np.float32).astype(np.float32)
    out_dt = _EPT_NP.get(ept, np.uint8)
    if ept <= 2:        # u1/u2/u4 promote to uint8 values
        return vals.astype(np.uint8)
    return vals.astype(out_dt)


def _unpack_subbyte(raw: bytes, n_pixels: int, bits: int) -> np.ndarray:
    lanes = np.unpackbits(np.frombuffer(raw, np.uint8)[:, None],
                          axis=1, bitorder="little").ravel()
    lanes = lanes[:n_pixels * bits].reshape(n_pixels, bits)
    weights = (1 << np.arange(bits, dtype=np.uint8))
    return (lanes @ weights).astype(np.uint8)


# ---------------------------------------------------------------------------

def decode_hfa(data: bytes, ige: bytes | None = None):
    """-> (pixels (h, w) or (h, w, n), gt | None, meta dict).
    `ige`: the external spill file's bytes for layers that store their
    blocks in an ERDAS_IMG_EXTERNAL_RASTER file (hfaband.cpp
    LoadExternalBlockInfo: uniform uncompressed blocks at
    layerStackDataOffset with a 20-byte-prefixed validity bitmap)."""
    if not sniff_hfa(data):
        raise ValueError("not an HFA file")
    header_pos = struct.unpack_from("<I", data, 16)[0]
    # version(4) freeList(4) rootEntryPtr(4) entryHeaderLength(2)
    # dictionaryPtr(4) — sequential, unaligned (hfaopen.cpp HFAOpen)
    root_pos = struct.unpack_from("<I", data, header_pos + 8)[0]
    dict_pos = struct.unpack_from("<I", data, header_pos + 14)[0]
    # dictionary runs from dict_pos to the terminating '.'
    dend = data.index(b".", dict_pos)
    types = parse_dictionary(data[dict_pos:dend].decode("latin-1"))
    root, _ = _read_tree(data, root_pos)

    bands = []
    gt = None
    proj_name = None
    for node in root.children:
        if node.type not in ("Eimg_Layer",):
            continue
        layer, _ = _decode_instance(data[node.data_pos:
                                         node.data_pos + node.data_size],
                                    0, types["Eimg_Layer"], types)
        w, h = layer["width"], layer["height"]
        bw, bh = layer["blockWidth"], layer["blockHeight"]
        ept = layer["pixelType"]
        nbx = (w + bw - 1) // bw
        nby = (h + bh - 1) // bh
        npx_blk = bw * bh
        ext = node.find(name="ExternalRasterDMS")
        infos = None
        if ext is not None:
            if ige is None:
                raise NotImplementedError(
                    "HFA spill (.ige) layer: pass the external file's "
                    "bytes as decode_hfa(..., ige=...)")
            er, _ = _decode_instance(data[ext.data_pos:
                                          ext.data_pos + ext.data_size],
                                     0, types["ImgExternalRaster"], types)
            if ige[:25] != b"ERDAS_IMG_EXTERNAL_RASTER":
                raise ValueError("HFA spill file header mismatch")

            def big(v):  # 2:L pairs -> 64-bit (GetBigIntField)
                return v[0] + (v[1] << 32) if isinstance(v, list) else v

            valid_off = big(er["layerStackValidFlagsOffset"])
            data_off = big(er["layerStackDataOffset"])
            stack_count = er["layerStackCount"]
            stack_index = er["layerStackIndex"]
            blk_bytes = (bw * bh * _EPT_BITS[ept] + 7) // 8
            bytes_per_row = (nbx + 7) // 8
            vmap = np.frombuffer(ige, np.uint8,
                                 count=bytes_per_row * nby + 20,
                                 offset=valid_off)
            infos = []
            for ib in range(nbx * nby):
                row, col = divmod(ib, nbx)
                bit = row * bytes_per_row * 8 + col + 160
                infos.append({
                    "logvalid": (vmap[bit >> 3] >> (bit & 7)) & 1,
                    "offset": data_off + blk_bytes * ib * stack_count
                    + stack_index * blk_bytes,
                    "size": blk_bytes, "compressionType": 0})
            src = ige
        else:
            dms = node.find(type_="Edms_State")
            if dms is None:
                raise NotImplementedError("HFA layer without RasterDMS")
            st, _ = _decode_instance(data[dms.data_pos:
                                          dms.data_pos + dms.data_size],
                                     0, types["Edms_State"], types)
            infos = st["blockinfo"]
            if isinstance(infos, dict):
                infos = [infos]
            src = data
        if ept <= 2:
            full = np.zeros((nby * bh, nbx * bw), np.uint8)
        else:
            full = np.zeros((nby * bh, nbx * bw), _EPT_NP[ept])
        for ib, bi in enumerate(infos[:nbx * nby]):
            by, bx = divmod(ib, nbx)
            if not bi["logvalid"]:
                continue
            boff, bsize = bi["offset"], bi["size"]
            raw = src[boff:boff + bsize]
            if bi["compressionType"]:
                blk = _uncompress_block(raw, npx_blk, ept)
            elif ept <= 2:
                blk = _unpack_subbyte(raw, npx_blk, _EPT_BITS[ept])
            else:
                blk = np.frombuffer(raw, _EPT_NP[ept], count=npx_blk)
            full[by * bh:(by + 1) * bh,
                 bx * bw:(bx + 1) * bw] = blk.reshape(bh, bw)
        bands.append(full[:h, :w])

        if gt is None:
            mi = node.find(type_="Eprj_MapInfo")
            if mi is not None:
                info, _ = _decode_instance(
                    data[mi.data_pos:mi.data_pos + mi.data_size],
                    0, types["Eprj_MapInfo"], types)
                ul = info["upperLeftCenter"]
                ps = info["pixelSize"]
                gt = (ul["x"] - ps["width"] / 2.0, ps["width"], 0.0,
                      ul["y"] + ps["height"] / 2.0, 0.0, -ps["height"])
                proj_name = info.get("proName")

    if not bands:
        raise ValueError("HFA: no Eimg_Layer found")
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=2)
    return px, gt, {"projection": proj_name, "n_bands": len(bands)}


def read_hfa_rat(data: bytes, band: int = 0):
    """Raster attribute table of an HFA layer -> RasterAttributeTable
    (None when the layer has no Descriptor_Table).

    Re-derives frmts/hfa/hfadataset.cpp HFARasterAttributeTable():
    Edsc_Column children typed by their dataType field with usages
    inferred from the column name (Histogram -> PixelCount, RGBA ->
    color, Class_Names -> Name); an Edsc_BinFunction840 of type
    BFUnique contributes the leading 'BinValues' Real/MinMax column
    (hfaband.cpp HFAReadBFUniqueBins: F64 basedata, doubles at
    signature+24); a plain Edsc_BinFunction sets linear binning."""
    from ..functions.rat import (GFT_Integer, GFT_Real, GFT_String,
                                 GFU_Alpha, GFU_Blue, GFU_Generic,
                                 GFU_Green, GFU_MinMax, GFU_Name,
                                 GFU_PixelCount, GFU_Red,
                                 RasterAttributeTable)

    if not sniff_hfa(data):
        raise ValueError("not an HFA file")
    header_pos = struct.unpack_from("<I", data, 16)[0]
    root_pos = struct.unpack_from("<I", data, header_pos + 8)[0]
    dict_pos = struct.unpack_from("<I", data, header_pos + 14)[0]
    dend = data.index(b".", dict_pos)
    types = parse_dictionary(data[dict_pos:dend].decode("latin-1"))
    root, _ = _read_tree(data, root_pos)

    layers = [n for n in root.children if n.type == "Eimg_Layer"]
    if band >= len(layers):
        return None
    dt = layers[band].find(type_="Edsc_Table", name="Descriptor_Table")
    if dt is None:
        return None
    tab, _ = _decode_instance(
        data[dt.data_pos:dt.data_pos + dt.data_size], 0,
        types["Edsc_Table"], types)
    nrows = int(tab.get("numrows", tab.get("numRows", 0)))

    rat = RasterAttributeTable()
    rat.row_count = nrows

    usage_by_name = {"Histogram": GFU_PixelCount, "Red": GFU_Red,
                     "Green": GFU_Green, "Blue": GFU_Blue,
                     "Opacity": GFU_Alpha, "Class_Names": GFU_Name}
    for child in dt.children:
        raw = data[child.data_pos:child.data_pos + child.data_size]
        if child.type == "Edsc_BinFunction840":
            # BFUnique basedata: scan for the F64 signature the
            # reference checks at MIFObject[20:22] == 0a 00
            if b"BFUnique" not in raw:
                continue
            start = raw.index(b"BFUnique")
            for off in range(start, len(raw) - 24 - 8 * nrows + 1):
                if (raw[off + 20] == 0x0A and raw[off + 21] == 0
                        and struct.unpack_from("<i", raw, off)[0] == nrows):
                    vals = np.frombuffer(raw, "<f8", nrows, off + 24)
                    i = rat.create_column("BinValues", GFT_Real,
                                          GFU_MinMax)
                    rat.columns[i].values = vals.tolist()
                    break
        elif child.type == "Edsc_BinFunction":
            try:
                bf, _ = _decode_instance(raw, 0,
                                         types["Edsc_BinFunction"],
                                         types)
            except struct.error:
                # the reference writes truncated 30-byte
                # Edsc_BinFunction records (hfadataset.cpp
                # MakeData(30)); decode what fits
                bf = {}
                if len(raw) >= 16:
                    bf = {"numBins": struct.unpack_from("<i", raw, 4)[0],
                          "minLimit": struct.unpack_from("<d", raw, 8)[0] if len(raw) >= 16 else 0.0,
                          "maxLimit": struct.unpack_from("<d", raw, 16)[0] if len(raw) >= 24 else 0.0}
            nbins = int(bf.get("numBins", 0))
            mn = float(bf.get("minLimit", 0.0))
            mx = float(bf.get("maxLimit", 0.0))
            if nbins == nrows and mx != mn and nbins > 1:
                rat.set_linear_binning(mn, (mx - mn) / (nbins - 1))
        elif child.type == "Edsc_Column":
            col, _ = _decode_instance(raw, 0, types["Edsc_Column"],
                                      types)
            off = int(col.get("columnDataPtr", 0))
            dtcode = col.get("dataType")
            if not off or dtcode is None:
                continue
            name = child.name
            usage = usage_by_name.get(name, GFU_Generic)
            if dtcode == 0:        # integer
                vals = np.frombuffer(data, "<i4", nrows, off).tolist()
                ftype = GFT_Integer
            elif dtcode == 1:      # real
                vals = np.frombuffer(data, "<f8", nrows, off).tolist()
                ftype = GFT_Real
            elif dtcode == 2:      # string
                w = int(col.get("maxNumChars", 1)) or 1
                vals = [data[off + i * w:off + (i + 1) * w]
                        .split(b"\x00")[0].decode("latin-1")
                        for i in range(nrows)]
                ftype = GFT_String
            else:
                continue
            if name in ("Red", "Green", "Blue", "Opacity"):
                # color columns read as ints regardless of storage
                # (255 * stored 0..1 real, hfadataset.cpp)
                if ftype == GFT_Real:
                    vals = [int(v * 255 + 0.5) for v in vals]
                ftype = GFT_Integer
            i = rat.create_column(name, ftype, usage)
            rat.columns[i].values = vals
    return rat if rat.columns else None
