"""NITF (National Imagery Transmission Format) raster driver.

Reference: frmts/nitf/nitffile.c (file header: HL at 354, or 394 for
NITF01/2.0-with-FSDWNG-999998; segment-info lists IM(6,10) GR(4,6)
LA(4,3) TX(4,5) DE(4,9) RE(4,7)), frmts/nitf/nitfimage.c (image
subheader: NROWS at 333 [+40 for the 2.0 ISDEVT case], per-band
IREPBAND/ISUBCAT/LUTs, IMODE B/P/S/R stride rules, M-compression
block-mask table with 0xFFFFFFFF for missing blocks).

Read: uncompressed (IC=NC/NM) NITF 2.0/2.1/NSIF images, 1-bit packed
and 8/16/32/64-bit MSB samples, IMODE B/P/S/R, block mask tables,
multi-image files (first image exposed), IGEOLO 'G' geographic corner
coordinates -> geotransform. Compressed IC codes (C*/M3..) raise.

Write: minimal NITF02.10, IC=NC, one block, IMODE B (single band) or
P (multi-band), uint8/uint16/int16/float32.

Conformance: autotest/gdrivers/nitf.py fixture checksums in
tests/test_nitf.py (rgb.ntf 21349, i_3034c/i_3034f/ns3034d 170) and
byte.tif CreateCopy round-trip 4672.
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_nitf(data: bytes) -> bool:
    return data[:4] in (b"NITF", b"NSIF")


def _int(data: bytes, off: int, n: int) -> int:
    s = data[off:off + n].strip()
    return int(s) if s else 0


def _collect_segments(data: bytes, off: int, n_hl: int, n_dl: int):
    count = _int(data, off, 3)
    off += 3
    segs = []
    for _ in range(count):
        segs.append((_int(data, off, n_hl), _int(data, off + n_hl, n_dl)))
        off += n_hl + n_dl
    return segs, off


def decode_nitf(data: bytes):
    """First image segment -> (pixels (h,w) or (h,w,n), gt | None,
    meta dict with version/irep/icords)."""
    if not sniff_nitf(data):
        raise ValueError("not a NITF file")
    ver = data[:9].decode("latin-1")
    if ver.startswith("NITF01.") or (ver == "NITF02.00"
                                     and data[280:286] == b"999998"):
        hl_off = 394
    else:
        hl_off = 354
    off = hl_off + 6
    im_segs, off = _collect_segments(data, off, 6, 10)
    if not im_segs:
        raise ValueError("NITF: no image segments")
    hl = _int(data, hl_off, 6)

    # first image segment: subheader at HL
    sub_start = hl
    sh_len, d_len = im_segs[0]
    sh = data[sub_start:sub_start + sh_len]
    seg_data_start = sub_start + sh_len

    # image subheader (nitfimage.c): NROWS at 333 (+40 for 2.0 ISDEVT)
    o = 333
    if ver.startswith("NITF01.") or sh[284:290] == b"999998":
        o += 40
    rows = _int(sh, o, 8)
    cols = _int(sh, o + 8, 8)
    pvtype = sh[o + 16:o + 19].decode("latin-1").strip()
    irep = sh[o + 19:o + 27].decode("latin-1").strip()
    abpp = _int(sh, o + 35, 2)
    o += 38
    icords = chr(sh[o])
    o += 1
    if ver in ("NITF02.10", "NSIF01.00"):
        have_igeolo = icords != " "
    else:
        have_igeolo = icords not in (" ", "N")
    igeolo = None
    if have_igeolo:
        igeolo = sh[o:o + 60].decode("latin-1")
        o += 60
    n_icom = _int(sh, o, 1)
    o += 1 + 80 * n_icom
    ic = sh[o:o + 2].decode("latin-1")
    o += 2
    if ic[0] != "N":
        o += 4  # COMRAT
    nbands = _int(sh, o, 1)
    o += 1
    if nbands == 0:
        nbands = _int(sh, o, 5)
        o += 5
    for _ in range(nbands):
        o += 2 + 6 + 4  # IREPBAND, ISUBCAT, IFC+IMFLT
        nluts = _int(sh, o, 1)
        o += 1
        if nluts:
            nelut = _int(sh, o, 5)
            o += 5 + nluts * nelut
    if ic not in ("NC", "NM"):
        raise NotImplementedError(f"NITF compression {ic}")
    if o + 40 > sh_len:
        imode, nbpr, nbpc = "B", 1, 1
        bw, bh, nbpp = cols, rows, abpp
    else:
        imode = chr(sh[o + 1])
        nbpr = _int(sh, o + 2, 4)
        nbpc = _int(sh, o + 6, 4)
        bw = _int(sh, o + 10, 4) or cols
        bh = _int(sh, o + 14, 4) or rows
        nbpp = _int(sh, o + 18, 2)

    # stride rules (nitfimage.c "Setup some image access values")
    word = 1 if nbpp <= 8 else 2 if nbpp <= 16 else 4 if nbpp <= 32 else 8
    line_off = bw * nbpp // 8
    if imode == "S":
        block_off = line_off * bh
        band_off = block_off * nbpr * nbpc
    elif imode == "P":
        line_off = bw * nbpp * nbands // 8
        band_off = word
        block_off = line_off * bh
    elif imode == "R":
        band_off = bw * nbpp // 8
        line_off = band_off * nbands
        block_off = line_off * bh
    else:  # B
        band_off = bh * line_off
        block_off = band_off * nbands

    # block start map
    n_blocks = nbpr * nbpc
    starts = np.zeros((nbands, n_blocks), np.int64)
    if ic == "NC":
        for ib in range(n_blocks):
            for b in range(nbands):
                starts[b, ib] = (seg_data_start + ib * block_off
                                 + b * band_off)
    else:  # NM: mask table at segment start (big-endian)
        imdatoff = struct.unpack_from(">I", data, seg_data_start)[0]
        bmrlnth, _tmrlnth, tpxcdlnth = struct.unpack_from(
            ">HHH", data, seg_data_start + 4)
        p = seg_data_start + 10 + (tpxcdlnth + 7) // 8
        if bmrlnth == 4 and imode == "P":
            offs = np.frombuffer(data, ">u4", count=n_blocks, offset=p) \
                .astype(np.int64)
            for b in range(nbands):
                starts[b] = np.where(
                    offs == 0xFFFFFFFF, -1,
                    offs + seg_data_start + imdatoff + b * band_off)
        elif bmrlnth == 4:
            offs = np.frombuffer(data, ">u4", count=n_blocks * nbands,
                                 offset=p).astype(np.int64)
            offs = np.where(offs == 0xFFFFFFFF, -1,
                            offs + seg_data_start + imdatoff)
            starts = offs.reshape(nbands, n_blocks) if imode == "S" \
                else np.repeat(offs.reshape(1, -1), 1, axis=0) \
                .reshape(nbands, n_blocks) if nbands == 1 else \
                offs.reshape(n_blocks, nbands).T
        else:  # packed tightly after the mask header
            base = seg_data_start + imdatoff
            for ib in range(n_blocks):
                for b in range(nbands):
                    starts[b, ib] = base + ib * block_off + b * band_off

    if pvtype == "R":
        dt = np.dtype(f">f{word}")
    elif pvtype == "SI":
        dt = np.dtype(f">i{word}")
    else:  # INT / B
        dt = np.dtype(f">u{word}") if word > 1 else np.uint8

    full = np.zeros((nbands, nbpc * bh, nbpr * bw), dt)
    for ib in range(n_blocks):
        by, bx = divmod(ib, nbpr)
        for b in range(nbands):
            s = int(starts[b, ib])
            if s < 0:
                continue
            if nbpp == 1:
                # 1-bit blocks are one contiguous MSB-first bitstream
                nby = (bh * bw + 7) // 8
                bits = np.unpackbits(np.frombuffer(
                    data, np.uint8, count=nby, offset=s))
                blk = bits[:bh * bw].reshape(bh, bw).astype(np.uint8)
            elif imode == "P":
                # s points at this band's first sample (block start +
                # b*word); samples interleave with stride nbands
                inter = np.frombuffer(
                    data, dt, count=bh * bw * nbands - b, offset=s)
                blk = inter[::nbands][:bh * bw].reshape(bh, bw)
            else:
                blk = np.frombuffer(data, dt, count=bh * bw, offset=s) \
                    .reshape(bh, bw)
            full[b, by * bh:(by + 1) * bh, bx * bw:(bx + 1) * bw] = blk

    full = full[:, :rows, :cols]
    px = full[0] if nbands == 1 else np.moveaxis(full, 0, 2)
    px = px.astype(px.dtype.newbyteorder("="), copy=False)  # native order

    gt = None
    if igeolo and icords == "G":
        gt = _igeolo_geographic_gt(igeolo, rows, cols)
    meta = {"version": ver, "irep": irep, "ic": ic, "imode": imode,
            "icords": icords, "n_bands": nbands}
    return np.ascontiguousarray(px), gt, meta


def _dms(s: str) -> float:
    """ddmmssX / dddmmssX -> decimal degrees."""
    hemi = s[-1]
    body = s[:-1]
    sec = int(body[-2:])
    minute = int(body[-4:-2])
    deg = int(body[:-4])
    v = deg + minute / 60.0 + sec / 3600.0
    return -v if hemi in "SW" else v


def _igeolo_geographic_gt(igeolo: str, rows: int, cols: int):
    """4 corner points (UL UR LR LL), each lat(7)+lon(8) DMS."""
    pts = []
    for i in range(4):
        part = igeolo[i * 15:(i + 1) * 15]
        pts.append((_dms(part[7:15]), _dms(part[:7])))  # (lon, lat)
    (ulx, uly), (urx, _ury), (_lrx, lry), _ = pts
    return (ulx, (urx - ulx) / cols, 0.0, uly, 0.0, (lry - uly) / rows)


# ---------------------------------------------------------------------------

def encode_nitf(px: np.ndarray) -> bytes:
    """Minimal NITF02.10 writer: IC=NC, one block, IMODE B (1 band) or
    P (interleaved multi-band)."""
    px = np.asarray(px)
    rows, cols = px.shape[:2]
    nbands = 1 if px.ndim == 2 else px.shape[2]
    if px.dtype == np.uint8:
        pvtype, nbpp, dt = "INT", 8, np.uint8
    elif px.dtype == np.uint16:
        pvtype, nbpp, dt = "INT", 16, np.dtype(">u2")
    elif px.dtype == np.int16:
        pvtype, nbpp, dt = "SI ", 16, np.dtype(">i2")
    elif px.dtype == np.float32:
        pvtype, nbpp, dt = "R  ", 32, np.dtype(">f4")
    else:
        raise NotImplementedError(f"NITF writer dtype {px.dtype}")

    imode = "B" if nbands == 1 else "P"
    body = np.ascontiguousarray(px.astype(dt, copy=False)).tobytes()

    irep = "MONO    " if nbands == 1 else ("RGB     " if nbands == 3
                                           else "MULTI   ")
    bandrep = {1: ["M "], 3: ["R ", "G ", "B "]}.get(
        nbands, ["M "] * nbands)

    sub = bytearray()
    sub += b"IM"
    sub += b"%-10s" % b"GDALRAY"          # IID1
    sub += b"20210101000000"               # IDATIM
    sub += b" " * 17                       # TGTID
    sub += b" " * 80                       # IID2
    sub += b"U" + b" " * 166               # ISCLAS + 2.1 security
    sub += b"0"                            # ENCRYP
    sub += b" " * 42                       # ISORCE
    sub += b"%08d%08d" % (rows, cols)
    sub += pvtype.ljust(3).encode()
    sub += irep.encode()
    sub += b"VIS     "                     # ICAT
    sub += b"%02d" % nbpp                  # ABPP
    sub += b"R"                            # PJUST
    sub += b" "                            # ICORDS blank -> no IGEOLO
    sub += b"0"                            # NICOM
    sub += b"NC"
    sub += b"%d" % nbands
    for r in bandrep:
        sub += r.encode() + b" " * 6 + b"N" + b" " * 3 + b"0"
    sub += b"0"                            # ISYNC
    sub += imode.encode()
    sub += b"0001" * 2                     # NBPR NBPC
    sub += b"%04d%04d" % (cols, rows)      # NPPBH NPPBV
    sub += b"%02d" % nbpp
    sub += b"001" + b"000" + b"0" * 10 + b"1.0 "
    sub += b"00000" + b"00000"             # UDIDL IXSHDL

    hl = 404
    fl = hl + len(sub) + len(body)
    hdr = bytearray()
    hdr += b"NITF02.10"
    hdr += b"03" + b"BF01"
    hdr += b"%-10s" % b"GDALRAY"
    hdr += b"20210101000000"
    hdr += b" " * 80                       # FTITLE
    hdr += b"U" + b" " * 166               # FSCLAS + security
    hdr += b"00000" + b"00000" + b"0"      # FSCOP FSCPYS ENCRYP
    hdr += b"\x00\x00\x00"                 # FBKGC
    hdr += b" " * 24 + b" " * 18           # ONAME OPHONE
    hdr += b"%012d%06d" % (fl, hl)
    hdr += b"001" + b"%06d%010d" % (len(sub), len(body))
    hdr += b"000" * 5                      # NUMS NUMX NUMT NUMDES NUMRES
    hdr += b"00000" + b"00000"             # UDHDL XHDL
    assert len(hdr) == hl, len(hdr)
    return bytes(hdr) + bytes(sub) + body
