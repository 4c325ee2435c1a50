"""HDF4 (classic NCSA HDF) reader: SDS scientific data sets and GR
general raster images.

Pure-Python re-derivation of the reference HDF4/HDF4Image drivers'
read surface (frmts/hdf4/hdf4dataset.cpp, hdf4imagedataset.cpp),
against the public HDF 4 file format specification:

- magic ``0e 03 13 01``; DD (data descriptor) blocks: int16 count,
  uint32 next, then 12-byte entries (tag, ref, offset, length);
- SDS: DFTAG_NDG (720) groups with DFTAG_SDD (701: int16 rank,
  uint32 dims, then (tag, ref) pairs for the data NT and one NT per
  dim) and DFTAG_SD (702: raw array); DFTAG_NT (106: version, type,
  width, class) with the DFNT type codes and the 0x4000 LITEND flag;
- GR: DFTAG_RIG (306) / bare DFTAG_ID (300: xdim, ydim, NT tag/ref,
  int16 ncomp, int16 interlace, comp tag/ref) + DFTAG_RI (302,
  pixel-interleaved) + DFTAG_LUT (301, 256x3 palette);
- extended tags (tag | 0x4000) with SPECIAL_LINKED (1) headers:
  uint32 length, uint32 blk_len, uint32 num_blk, uint16 link ref —
  a chain of DFTAG_LINKED (20) elements, each uint16 next-ref then
  payload (the unlimited-dimension layout).

Conformance: autotest/gcore/hdf4_read.py — checksum 4672 for the
byte/int16/uint16/int32/uint32/float32/float64 _2 and _3 fixtures,
50054 for utmsmall, GR checksums 361/400, palette presence.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"\x0e\x03\x13\x01"

_DFNT = {
    3: "u1", 4: "i1", 5: "f4", 6: "f8",
    20: "i1", 21: "u1", 22: "i2", 23: "u2",
    24: "i4", 25: "u4", 26: "i8", 27: "u8",
}


def _dds(data: bytes) -> list[tuple[int, int, int, int]]:
    out = []
    off = 4
    while off:
        ndd, nxt = struct.unpack(">hI", data[off:off + 6])
        for i in range(ndd):
            tag, ref, o, ln = struct.unpack(
                ">HHII", data[off + 6 + i * 12: off + 18 + i * 12])
            if tag not in (0, 1):               # NULL entries
                out.append((tag, ref, o, ln))
        off = nxt
    return out


def _element(data: bytes, dds: list, tag: int, ref: int) -> bytes:
    """Raw bytes of (tag, ref), resolving extended/linked elements."""
    for t, r, o, ln in dds:
        if r != ref:
            continue
        if t == tag:
            return data[o:o + ln]
        if t == (tag | 0x4000):
            special, = struct.unpack(">h", data[o:o + 2])
            if special != 1:                    # SPECIAL_LINKED only
                raise NotImplementedError(
                    f"HDF4 special element kind {special}")
            length, first_len, blk_len, num_blk, link = struct.unpack(
                ">IIIIH", data[o + 2:o + 20])
            out = bytearray()
            nref = link
            first = True
            while nref and len(out) < length:
                blk = _element(data, dds, 20, nref)   # DFTAG_LINKED
                nref, = struct.unpack(">H", blk[:2])
                body = blk[2:]
                if first:
                    # first block is the link table: uint16 refs of
                    # the data blocks
                    refs = struct.unpack(f">{len(body) // 2}H", body)
                    for r2 in refs:
                        if not r2:
                            break
                        out += _element(data, dds, 20, r2)
                    first = False
                else:
                    out += body
            return bytes(out[:length])
    raise KeyError(f"HDF4: no element tag={tag} ref={ref}")


def _nt_dtype(data: bytes, dds: list, ref: int) -> np.dtype:
    nt = _element(data, dds, 106, ref)
    code = nt[1]
    le = bool(code & 0x40) or bool(code & 0x4000)
    base = _DFNT.get(code & 0x3f)
    if base is None:
        raise NotImplementedError(f"HDF4 DFNT type {code}")
    return np.dtype(("<" if le else ">") + base)


def hdf4_datasets(data: bytes) -> list[dict]:
    """All SDS and GR images: dicts with kind, dims, dtype, pixels
    (+ palette for GR with LUT)."""
    if data[:4] != MAGIC:
        raise ValueError("not an HDF4 file")
    dds = _dds(data)
    out = []
    # ---- SDS: every NDG group
    for tag, ref, o, ln in dds:
        if tag != 720:
            continue
        members = struct.unpack(f">{ln // 4 * 2}H", data[o:o + ln])
        pairs = list(zip(members[::2], members[1::2]))
        sdd_ref = next((r for t, r in pairs if t == 701), None)
        sd_ref = next((r for t, r in pairs if t == 702), None)
        if sdd_ref is None or sd_ref is None:
            continue
        sdd = _element(data, dds, 701, sdd_ref)
        rank, = struct.unpack(">h", sdd[:2])
        dims = struct.unpack(f">{rank}I", sdd[2:2 + 4 * rank])
        nt_tag, nt_ref = struct.unpack(
            ">HH", sdd[2 + 4 * rank:6 + 4 * rank])
        dt = _nt_dtype(data, dds, nt_ref)
        raw = _element(data, dds, 702, sd_ref)
        n = int(np.prod(dims))
        px = np.frombuffer(raw, dt, count=min(n, len(raw) // dt.itemsize))
        if px.size < n:                         # unlimited dim short
            dims = (px.size // int(np.prod(dims[1:])),) + tuple(dims[1:])
            n = int(np.prod(dims))
        out.append({"kind": "sds", "dims": tuple(dims),
                    "dtype": dt, "pixels": px[:n].reshape(dims)})
    # ---- GR: every DFTAG_ID image header
    for tag, ref, o, ln in dds:
        if tag != 300:
            continue
        xdim, ydim, nt_tag, nt_ref, ncomp, interlace, ctag, cref = \
            struct.unpack(">IIHHhhHH", data[o:o + 20])
        dt = _nt_dtype(data, dds, nt_ref)
        raw = _element(data, dds, 302, ref)
        px = np.frombuffer(raw, dt, count=xdim * ydim * ncomp)
        if interlace == 0:                      # pixel interleave
            px = px.reshape(ydim, xdim, ncomp)
        elif interlace == 1:                    # scanline interleave
            px = px.reshape(ydim, ncomp, xdim).transpose(0, 2, 1)
        else:                                   # component interleave
            px = px.reshape(ncomp, ydim, xdim).transpose(1, 2, 0)
        d = {"kind": "gr", "dims": (ydim, xdim, ncomp),
             "dtype": dt, "pixels": px}
        try:
            lut = _element(data, dds, 301, ref)
            pal = np.frombuffer(lut, np.uint8, 768).reshape(256, 3)
            d["palette"] = pal
        except KeyError:
            pass
        out.append(d)
    return out


def read_hdf4(data: bytes) -> dict:
    """open_raster-style dict for the first 2-D+ dataset."""
    sets = hdf4_datasets(data)
    if not sets:
        raise ValueError("HDF4: no SDS or GR dataset")
    best = next((s for s in sets if len(s["dims"]) >= 2), sets[0])
    px = best["pixels"]
    if best["kind"] == "gr" and px.shape[2] == 1:
        px = px[:, :, 0]
    out = {"pixels": px, "gt": None, "epsg": None, "driver": "HDF4",
           "hdf4_kind": best["kind"]}
    if "palette" in best:
        out["palette"] = best["palette"]
    return out
