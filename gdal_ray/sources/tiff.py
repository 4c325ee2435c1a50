"""Minimal TIFF reader (baseline TIFF + BigTIFF, strips + tiles).

The format entry point for GeoTIFF-shaped inputs (reference
frmts/gtiff/): classic TIFF (magic 42) AND BigTIFF (magic 43, 8-byte
offsets — the >4 GiB layout, libtiff tif_open.c big-TIFF branch),
II/MM byte order, striped or tiled, COMPRESSION=1 (none), 5 (LZW,
MSB-first with early change), 8/32946 (Deflate — pure zlib) or 32773
(PackBits), horizontal-differencing predictor, 8/16/32-bit
signed/unsigned or float samples, chunky or separate planar config.
Enough to read the reference test fixtures
(autotest/gcore/data/byte.tif, utmsmall.tif, the autotest/alg warp
goldens) and any baseline export — other codecs (JPEG etc.) raise
``NotImplementedError`` (no codec libs in this container).

Decodes the GeoTIFF geotransform from ModelPixelScale + ModelTiepoint
(with the PixelIsPoint half-pixel shift) or the full — possibly
rotated — ModelTransformationTag (reference gcore geotransform model,
frmts/gtiff geotiff.cpp).
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTE_COUNTS = 279
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_BYTE_COUNTS = 325
_TAG_PREDICTOR = 317
_TAG_SAMPLE_FORMAT = 339
_TAG_PIXEL_SCALE = 33550
_TAG_GEOKEYS = 34735
_TAG_TIEPOINT = 33922
_TAG_TRANSFORM = 34264  # ModelTransformationTag (16 doubles)

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 11: 4,
              12: 8, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f",
             12: "d", 16: "Q", 17: "q", 18: "Q"}


def _read_tag_values(data: bytes, bo: str, typ: int, cnt: int, raw: bytes,
                     big: bool = False):
    size = _TYPE_SIZE[typ] * cnt
    inline = 8 if big else 4
    if size <= inline:
        buf = raw[:size]
    else:
        off = struct.unpack(bo + ("Q" if big else "I"), raw)[0]
        buf = data[off:off + size]
    if typ == 5:  # RATIONAL
        vals = struct.unpack(bo + "%dI" % (2 * cnt), buf)
        return [vals[i] / vals[i + 1] for i in range(0, 2 * cnt, 2)]
    if typ == 2:  # ASCII
        return [buf.rstrip(b"\x00").decode("latin-1")]
    if typ == 7:  # UNDEFINED: raw bytes (JPEGTables et al.)
        return [bytes(buf)]
    return list(struct.unpack(bo + "%d%s" % (cnt, _TYPE_FMT[typ]), buf))


def _read_ifd(data: bytes, bo: str) -> dict[int, list]:
    """First-IFD tag dict for classic (magic 42) AND BigTIFF (43).

    BigTIFF (the reference's >4 GiB path, frmts/gtiff libtiff
    tif_open.c big-TIFF branch): 8-byte offsets, 8-byte IFD entry
    counts, 20-byte entries (tag H, type H, count Q, value/offset Q),
    value types LONG8/SLONG8/IFD8 (16/17/18)."""
    magic = struct.unpack(bo + "H", data[2:4])[0]
    if magic == 42:
        big = False
        ifd_off = struct.unpack(bo + "I", data[4:8])[0]
    elif magic == 43:
        offsize, reserved = struct.unpack(bo + "HH", data[4:8])
        if offsize != 8 or reserved != 0:
            raise NotImplementedError(
                f"BigTIFF offset size {offsize} (only 8 defined)")
        big = True
        ifd_off = struct.unpack(bo + "Q", data[8:16])[0]
    else:
        raise ValueError(f"bad TIFF magic {magic}")
    if big:
        n = struct.unpack(bo + "Q", data[ifd_off:ifd_off + 8])[0]
        ent0, esz, hdr = ifd_off + 8, 20, 4
    else:
        n = struct.unpack(bo + "H", data[ifd_off:ifd_off + 2])[0]
        ent0, esz, hdr = ifd_off + 2, 12, 4
    tags: dict[int, list] = {}
    for i in range(n):
        e = ent0 + esz * i
        if big:
            t, typ, cnt = struct.unpack(bo + "HHQ", data[e:e + 12])
            raw = data[e + 12:e + 20]
        else:
            t, typ, cnt = struct.unpack(bo + "HHI", data[e:e + 8])
            raw = data[e + 8:e + 12]
        if typ in _TYPE_SIZE:
            tags[t] = _read_tag_values(data, bo, typ, cnt, raw, big)
    return tags


def _unpackbits(src: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(src) and len(out) < expected:
        n = src[i]
        i += 1
        if n < 128:
            out += src[i:i + n + 1]
            i += n + 1
        elif n > 128:
            out += src[i:i + 1] * (257 - n)
            i += 1
    return bytes(out)


def _unlzw(src: bytes, expected: int) -> bytes:
    """TIFF LZW (MSB-first bit order, early-change code width bump —
    the variant libtiff writes; reference frmts/gtiff tif_lzw)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    buf = 0
    nbits = 0
    prev: bytes | None = None
    i = 0
    n = len(src)
    while i < n or nbits >= width:
        while nbits < width and i < n:
            buf = (buf << 8) | src[i]
            i += 1
            nbits += 8
        if nbits < width:
            break
        code = (buf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == CLEAR:
            table = table[:258]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # libtiff width rule (tif_lzw.c): the decoder bumps when its
        # next free entry reaches MAXCODE(nbits) — one entry before the
        # encoder does, which is the TIFF "early change" asymmetry
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            break
    return bytes(out)


def _undo_predictor(chunk: bytes, nrows: int, w: int, spp: int,
                    dtype: np.dtype) -> bytes:
    """Horizontal differencing (predictor=2): cumulative sum along the
    row per sample channel, wrapping modulo 2^bits."""
    # libtiff tif_predict.c accumulates on the raw integer lanes of
    # whatever the sample width is — float samples included (the
    # gcore float32/float64_LZW_predictor_2 fixtures)
    u = np.dtype(f"{dtype.byteorder}u{dtype.itemsize}")
    arr = np.frombuffer(chunk, dtype=u,
                        count=nrows * w * spp).reshape(nrows, w, spp)
    return np.cumsum(arr, axis=1, dtype=u).tobytes()


def _ycbcr_tables(luma, refbw):
    """TIFFYCbCrToRGBInit (tif_color.c) fixed-point tables."""
    SHIFT = 16
    ONE_HALF = 1 << (SHIFT - 1)

    def FIX(x):
        return int(x * (1 << SHIFT) + 0.5)

    def code2v(c, rb, rw, cr):
        d = (rw - rb) if (rw - rb) != 0 else 1
        return (c - rb) * float(cr) / float(d)

    lr, lg, lb = luma
    f1 = 2 - 2 * lr
    d1 = FIX(min(max(f1, 0.0), 2.0))
    f2 = lr * f1 / lg
    d2 = -FIX(min(max(f2, 0.0), 2.0))
    f3 = 2 - 2 * lb
    d3 = FIX(min(max(f3, 0.0), 2.0))
    f4 = lb * f3 / lg
    d4 = -FIX(min(max(f4, 0.0), 2.0))
    cr_r = np.empty(256, np.int64)
    cb_b = np.empty(256, np.int64)
    cr_g = np.empty(256, np.int64)
    cb_g = np.empty(256, np.int64)
    y_tab = np.empty(256, np.int64)
    for i in range(256):
        x = i - 128
        cr = int(np.clip(code2v(x, refbw[4] - 128.0, refbw[5] - 128.0,
                                127), -128.0 * 32, 128.0 * 32))
        cb = int(np.clip(code2v(x, refbw[2] - 128.0, refbw[3] - 128.0,
                                127), -128.0 * 32, 128.0 * 32))
        cr_r[i] = (d1 * cr + ONE_HALF) >> SHIFT
        cb_b[i] = (d3 * cb + ONE_HALF) >> SHIFT
        cr_g[i] = d2 * cr
        cb_g[i] = d4 * cb + ONE_HALF
        y_tab[i] = int(np.clip(code2v(x + 128, refbw[0], refbw[1], 255),
                               -128.0 * 32, 128.0 * 32))
    return y_tab, cr_r, cb_b, cr_g, cb_g


def _ycbcr_to_rgb(Y, Cb, Cr, tabs):
    """TIFFYCbCrtoRGB per pixel, vectorized."""
    y_tab, cr_r, cb_b, cr_g, cb_g = tabs
    Y = np.clip(Y, 0, 255).astype(np.int64)
    Cb = np.clip(Cb, 0, 255).astype(np.int64)
    Cr = np.clip(Cr, 0, 255).astype(np.int64)
    yv = y_tab[Y]
    r = np.clip(yv + cr_r[Cr], 0, 255)
    g = np.clip(yv + ((cb_g[Cb] + cr_g[Cr]) >> 16), 0, 255)
    b = np.clip(yv + cb_b[Cb], 0, 255)
    return np.stack([r, g, b], -1).astype(np.uint8)


def decode_tiff(data: bytes):
    """-> (pixels ndarray (h, w) or (h, w, bands), geotransform | None)."""
    if data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF")
    bo = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, bo)
    w = int(tags[_TAG_WIDTH][0])
    h = int(tags[_TAG_HEIGHT][0])
    bits = int(tags.get(_TAG_BITS, [8])[0])
    comp = int(tags.get(_TAG_COMPRESSION, [1])[0])
    spp = int(tags.get(_TAG_SAMPLES_PER_PIXEL, [1])[0])
    fmt = int(tags.get(_TAG_SAMPLE_FORMAT, [1])[0])
    rows_per_strip = int(tags.get(_TAG_ROWS_PER_STRIP, [h])[0])
    if comp not in (1, 4, 5, 7, 8, 32773, 32946, 50001, 34925, 34887):
        raise NotImplementedError(
            f"TIFF compression {comp} (no codec library in this container)")
    # LERC (tif_lerc.c): LERC_PARAMETERS = [version, add_compression]
    lerc_add = int(tags.get(50674, [0, 0])[1]) if comp == 34887 else 0
    if comp == 34887 and lerc_add == 2:
        raise NotImplementedError(
            "TIFF LERC+ZSTD (no zstd library in this container)")
    predictor = int(tags.get(_TAG_PREDICTOR, [1])[0])
    photometric = int(tags.get(262, [1])[0])
    jpeg_tables = tags.get(347, [None])[0]  # TIFF TechNote2 tables stream
    # photometric drives the colorspace (libtiff tif_jpeg.c): 6=YCbCr
    # transforms to RGB on read (what GDAL exposes), 2=RGB planes direct
    jpeg_color = {6: "ycbcr", 2: "rgb"}.get(photometric, "auto")
    complex_int = False
    if bits == 1:
        dt = "u1"  # expanded to one byte per pixel below
    elif fmt == 3:
        dt = {16: "f2", 32: "f4", 64: "f8"}[bits]
    elif fmt == 2:
        dt = {8: "i1", 16: "i2", 32: "i4", 64: "i8"}[bits]
    elif fmt == 6:   # complex IEEE (CFloat32/CFloat64)
        dt = {64: "c8", 128: "c16"}[bits]
    elif fmt == 5:   # complex int (CInt16/CInt32): interleaved pairs
        dt = {32: "i2", 64: "i4"}[bits]
        complex_int = True
    else:
        dt = {8: "u1", 16: "u2", 32: "u4", 64: "u8"}[bits]
    dtype = np.dtype(bo + dt)
    if complex_int:
        spp *= 2    # decode the I/Q lanes as doubled samples
    planar = int(tags.get(284, [1])[0])

    def decomp(chunk: bytes, nrows: int, ncols: int, nspp: int = None) -> bytes:
        nspp = spp if nspp is None else nspp
        nbytes = nrows * ncols * nspp * dtype.itemsize
        if comp == 4:  # CCITT Group 4 (T.6); 1 = black run
            from ..functions.ccittg4 import decode_g4

            return decode_g4(bytes(chunk), ncols, nrows).tobytes()
        if bits == 1:  # uncompressed/deflate 1-bit rows, byte-aligned
            if comp in (8, 32946):
                import zlib

                chunk = zlib.decompress(chunk)
            elif comp == 32773:
                chunk = _unpackbits(chunk, (ncols + 7) // 8 * nrows)
            rowbytes = (ncols * nspp + 7) // 8
            rows = np.frombuffer(chunk, np.uint8,
                                 count=rowbytes * nrows)
            bits_arr = np.unpackbits(rows.reshape(nrows, rowbytes),
                                     axis=1)[:, :ncols * nspp]
            return bits_arr.astype(np.uint8).tobytes()
        if comp == 50001:  # WebP (libtiff: full RIFF stream per chunk)
            from ..functions.webp import decode_webp

            arr = decode_webp(bytes(chunk))
            out = np.zeros((nrows, ncols, nspp), np.uint8)
            sh, sw = min(nrows, arr.shape[0]), min(ncols, arr.shape[1])
            out[:sh, :sw] = arr[:sh, :sw, :nspp]
            return out.astype(dtype).tobytes()
        if comp == 7:  # new-style JPEG (TechNote2)
            from ..functions.jpeg import decode_jpeg_tiff

            arr = decode_jpeg_tiff(bytes(chunk), jpeg_tables,
                                   jpeg_color if nspp > 1 else "auto")
            if arr.ndim == 2:
                arr = arr[:, :, None]
            out = np.zeros((nrows, ncols, nspp), np.uint8)
            sh, sw = min(nrows, arr.shape[0]), min(ncols, arr.shape[1])
            out[:sh, :sw] = arr[:sh, :sw, :nspp]
            return out.astype(dtype).tobytes()
        if comp == 32773:
            chunk = _unpackbits(chunk, nbytes)
        elif comp in (8, 32946):
            import zlib

            chunk = zlib.decompress(chunk)
        elif comp == 5:
            chunk = _unlzw(chunk, nbytes)
        elif comp == 34925:   # LZMA (tif_lzma.c; xz container)
            import lzma

            chunk = lzma.decompress(chunk)
        elif comp == 34887:   # LERC (tif_lerc.c)
            from ..functions.lerc import _decode_lerc2

            if lerc_add == 1:
                import zlib

                chunk = zlib.decompress(chunk)
            arr = _decode_lerc2(bytes(chunk))  # (rows, cols, ndim)
            out = np.zeros((nrows, ncols, nspp), dtype)
            sh = min(nrows, arr.shape[0])
            sw = min(ncols, arr.shape[1])
            out[:sh, :sw] = arr[:sh, :sw, :nspp].astype(dtype)
            return out.tobytes()
        if predictor == 2:
            chunk = _undo_predictor(chunk[:nbytes], nrows, ncols, nspp, dtype)
        return chunk[:nbytes]

    if photometric == 6 and comp in (1, 5, 8, 32946) and bits == 8 \
            and _TAG_TILE_WIDTH not in tags:
        # subsampled YCbCr strips (libtiff contig layout: per v-row
        # unit group h*v luma samples + Cb + Cr; replication
        # upsampling and the tif_color.c fixed-point conversion —
        # pinned by the gcore ycbcr_*_lzw checksum matrix)
        sub = tags.get(530, [2, 2])
        sh_, sv_ = int(sub[0]), int(sub[1])
        if (sh_, sv_) not in ((1, 1), (1, 2), (2, 1), (2, 2),
                              (4, 1), (4, 2), (4, 4)):
            # the combinations libtiff has no putcontig routine for
            # (the gcore matrix marks 1x4 / 2x4 "not supported")
            raise NotImplementedError(
                f"YCbCr subsampling {sh_}x{sv_} unsupported (libtiff)")
        luma = [float(v) for v in tags.get(
            529, [0.299, 0.587, 0.114])]
        refbw = [float(v) for v in tags.get(
            532, [0.0, 255.0, 128.0, 255.0, 128.0, 255.0])]
        tabs = _ycbcr_tables(luma, refbw)
        offsets = [int(v) for v in tags[_TAG_STRIP_OFFSETS]]
        counts = [int(v) for v in tags[_TAG_STRIP_BYTE_COUNTS]]
        wpad = -(-w // sh_) * sh_
        unit = sh_ * sv_ + 2
        Yf = np.zeros((0, wpad), np.uint8)
        Cbf = []
        Crf = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            rpad = -(-nrows // sv_) * sv_
            nunits = (wpad // sh_) * (rpad // sv_)
            chunk = data[off:off + cnt]
            if comp == 5:
                chunk = _unlzw(chunk, nunits * unit)
            elif comp in (8, 32946):
                import zlib

                chunk = zlib.decompress(chunk)
            u = np.frombuffer(chunk, np.uint8, nunits * unit).reshape(
                rpad // sv_, wpad // sh_, unit)
            yy = u[:, :, :sh_ * sv_].reshape(
                rpad // sv_, wpad // sh_, sv_, sh_)
            yy = yy.transpose(0, 2, 1, 3).reshape(rpad, wpad)
            Yf = np.vstack([Yf, yy[:nrows]])
            cb = np.repeat(np.repeat(u[:, :, sh_ * sv_], sh_, axis=1),
                           sv_, axis=0)[:nrows]
            cr = np.repeat(np.repeat(u[:, :, sh_ * sv_ + 1], sh_,
                                     axis=1), sv_, axis=0)[:nrows]
            Cbf.append(cb)
            Crf.append(cr)
        Y = Yf[:, :w]
        Cb = np.vstack(Cbf)[:, :w]
        Cr = np.vstack(Crf)[:, :w]
        px = _ycbcr_to_rgb(Y, Cb, Cr, tabs)
        return px, None

    if _TAG_TILE_WIDTH in tags:
        # tiled layout (TileWidth/TileLength/TileOffsets/TileByteCounts)
        tw = int(tags[_TAG_TILE_WIDTH][0])
        th = int(tags[_TAG_TILE_LENGTH][0])
        toffs = [int(v) for v in tags[_TAG_TILE_OFFSETS]]
        tcnts = [int(v) for v in tags[_TAG_TILE_BYTE_COUNTS]]
        ntx = (w + tw - 1) // tw
        nty = (h + th - 1) // th
        px = np.zeros((h, w, spp), dtype=dtype)
        tiles_per_band = ntx * nty
        for ti, (off, cnt) in enumerate(zip(toffs, tcnts)):
            if off == 0 or cnt == 0:    # sparse tile -> zeros
                continue
            if planar == 2 and spp > 1:
                band, pos = divmod(ti, tiles_per_band)
                ty, tx = divmod(pos, ntx)
                buf = decomp(data[off:off + cnt], th, tw, 1)
                tile = np.frombuffer(buf, dtype=dtype,
                                     count=th * tw).reshape(th, tw, 1)
                bsl = slice(band, band + 1)
            else:
                ty, tx = divmod(ti, ntx)
                buf = decomp(data[off:off + cnt], th, tw)
                tile = np.frombuffer(
                    buf, dtype=dtype,
                    count=th * tw * spp).reshape(th, tw, spp)
                bsl = slice(None)
            y0, x0 = ty * th, tx * tw
            ny = min(th, h - y0)
            nx_ = min(tw, w - x0)
            px[y0:y0 + ny, x0:x0 + nx_, bsl] = tile[:ny, :nx_]
        px = px if spp > 1 else px[:, :, 0]
    elif planar == 2 and spp > 1:
        # separate planes: one run of strips per band
        offsets = [int(v) for v in tags[_TAG_STRIP_OFFSETS]]
        counts = [int(v) for v in tags[_TAG_STRIP_BYTE_COUNTS]]
        spb = (h + rows_per_strip - 1) // rows_per_strip
        px = np.zeros((h, w, spp), dtype=dtype)
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            if off == 0 or cnt == 0:    # sparse strip -> zeros
                continue
            band, blk = divmod(si, spb)
            y0 = blk * rows_per_strip
            nrows = min(rows_per_strip, h - y0)
            buf = decomp(data[off:off + cnt], nrows, w, 1)
            px[y0:y0 + nrows, :, band] = np.frombuffer(
                buf, dtype=dtype, count=nrows * w).reshape(nrows, w)
    else:
        offsets = [int(v) for v in tags[_TAG_STRIP_OFFSETS]]
        if _TAG_STRIP_BYTE_COUNTS not in tags and comp == 1:
            # missing StripByteCounts: infer for uncompressed strips
            # (gtiff one_strip_nobytecount / minimum-tags fixtures)
            counts = [min(rows_per_strip, h - i * rows_per_strip) * w
                      * spp * dtype.itemsize
                      for i in range(len(offsets))]
        else:
            counts = [int(v) for v in tags[_TAG_STRIP_BYTE_COUNTS]]
        raw_all = bytearray()
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            if off == 0 or cnt == 0:    # sparse strip -> zeros
                raw_all += bytes(nrows * w * spp * dtype.itemsize)
                continue
            raw_all += decomp(data[off:off + cnt], nrows, w)
        px = np.frombuffer(bytes(raw_all), dtype=dtype, count=h * w * spp)
        px = px.reshape(h, w, spp) if spp > 1 else px.reshape(h, w)

    if complex_int:
        cdt = np.complex64 if dtype.itemsize == 2 else np.complex128
        px3 = px if px.ndim == 3 else px[:, :, None]
        px = (px3[:, :, 0::2].astype(np.float64) +
              1j * px3[:, :, 1::2].astype(np.float64)).astype(cdt)
        if px.shape[2] == 1:
            px = px[:, :, 0]

    gt = None
    if _TAG_TRANSFORM in tags and len(tags[_TAG_TRANSFORM]) >= 16:
        # ModelTransformationTag: full (possibly rotated) 4x4 affine
        # (frmts/gtiff geotiff.cpp ModelTransformation read path)
        t4 = tags[_TAG_TRANSFORM]
        gt = (t4[3], t4[0], t4[1], t4[7], t4[4], t4[5])
    elif _TAG_PIXEL_SCALE in tags and _TAG_TIEPOINT in tags:
        sx, sy = tags[_TAG_PIXEL_SCALE][0], tags[_TAG_PIXEL_SCALE][1]
        tp = tags[_TAG_TIEPOINT]
        # tiepoint: (i, j, k, X, Y, Z) — raster point -> model point
        i, j, X, Y = tp[0], tp[1], tp[3], tp[4]
        gt = (X - i * sx, sx, 0.0, Y + j * sy, 0.0, -sy)
        # GTRasterTypeGeoKey == RasterPixelIsPoint: the tiepoint names
        # the pixel CENTER; GDAL converts to its corner convention by
        # shifting half a pixel (frmts/gtiff geotiff.cpp PixelIsPoint)
        gk = tags.get(_TAG_GEOKEYS)
        if gk and len(gk) >= 8:
            for k in range(4, len(gk) - 3, 4):
                if int(gk[k]) == 1025 and int(gk[k + 3]) == 2:
                    gt = (gt[0] - gt[1] / 2, gt[1], 0.0,
                          gt[3] - gt[5] / 2, 0.0, gt[5])
                    break
    return px, gt


def encode_tiff(px: np.ndarray, gt=None, compression: str = "none",
                bigtiff: bool = False, epsg: int | None = None,
                palette: np.ndarray | None = None,
                jpeg_quality: int = 92) -> bytes:
    """Minimal TIFF writer (little-endian, single strip, chunky):
    uint8/16/32, int8/16/32 or float32/64 samples, optional Deflate
    compression, GeoTIFF tags when ``gt`` is given — ModelPixelScale +
    ModelTiepoint for axis-aligned geotransforms, the full
    ModelTransformationTag for rotated ones (frmts/gtiff geotiff.cpp
    write path analog). ``bigtiff=True`` writes the 8-byte-offset
    BigTIFF layout (magic 43, 20-byte IFD entries) — the >4 GiB form
    a 100-TB raster store actually holds."""
    import zlib

    px = np.ascontiguousarray(px)
    if px.ndim == 2:
        h, w = px.shape
        spp = 1
    else:
        h, w, spp = px.shape
    dt = px.dtype
    if dt.kind == "f":
        fmt = 3
    elif dt.kind == "i":
        fmt = 2
    else:
        fmt = 1
    bits = dt.itemsize * 8
    data = px.astype(dt.newbyteorder("<")).tobytes()
    comp_tag = 1
    photometric = 1 if spp == 1 else 2
    if compression == "deflate":
        data = zlib.compress(data, 6)
        comp_tag = 8
    elif compression == "jpeg":
        # Compression=7 (TechNote2), self-contained per-strip stream
        # (tables inline — spec-valid without a JPEGTables tag);
        # 3-band data goes through the encoder's YCbCr path, so the
        # photometric tag must say 6 (frmts/gtiff JPEG write analog)
        if dt != np.uint8 or spp not in (1, 3):
            raise NotImplementedError(
                "JPEG-in-TIFF write needs uint8 gray or 3-band")
        from ..functions.jpeg import encode_jpeg

        data = encode_jpeg(px, quality=jpeg_quality)
        comp_tag = 7
        if spp == 3:
            photometric = 6
    elif compression == "webp":
        # Compression=50001, lossless VP8L (the reference's
        # COMPRESS=WEBP + WEBP_LOSSLESS=true write path; each strip is
        # a self-contained RIFF WebP stream like libtiff's tif_webp.c)
        if dt != np.uint8 or spp not in (3, 4):
            raise NotImplementedError(
                "WebP-in-TIFF write needs uint8 3- or 4-band")
        from ..functions.webp import encode_webp_lossless

        data = encode_webp_lossless(px)
        comp_tag = 50001
    elif compression != "none":
        raise NotImplementedError(f"tiff write compression {compression}")

    off_typ = 16 if bigtiff else 4  # LONG8 / LONG for offsets+counts
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, bits),
        (259, 3, 1, comp_tag),
        (262, 3, 1, photometric),
        (277, 3, 1, spp), (278, 3, 1, h),
        (339, 3, 1, fmt),
    ]
    extra = b""
    header_len = 16 if bigtiff else 8
    esz = 20 if bigtiff else 12
    cnt_sz = 8 if bigtiff else 2
    next_sz = 8 if bigtiff else 4
    # strip data right after header; IFD after the strip
    strip_off = header_len
    ifd_off = strip_off + len(data)

    # out-of-line tag payloads appended after the IFD
    def add_payload(buf: bytes) -> int:
        nonlocal extra
        off = ifd_off + cnt_sz + esz * n_entries + next_sz + len(extra)
        extra += buf
        return off

    tags.append((273, off_typ, 1, strip_off))
    tags.append((279, off_typ, 1, len(data)))
    rotated = gt is not None and (gt[2] != 0.0 or gt[4] != 0.0)
    if gt is not None:
        if rotated:
            tags.append((_TAG_TRANSFORM, 12, 16, None))
        else:
            tags.append((33550, 12, 3, None))  # pixel scale
            tags.append((33922, 12, 6, None))  # tiepoint
    if epsg is not None:
        # GeoKey directory: header + Projected/GeographicTypeGeoKey
        # (gt_wkt_srs.cpp GTIFSetFromOGISDefn analog; 4xxx = geographic)
        tags.append((_TAG_GEOKEYS, 3, 8, None))
    if palette is not None:
        if spp != 1 or bits != 8:
            raise ValueError("palette requires a single 8-bit band")
        # ColorMap: 3 * 2^bits SHORTs, 8-bit components scaled by 257
        # (the reference's GTiffDataset::SetColorTable rule)
        tags = [(262, 3, 1, 3) if t[0] == 262 else t for t in tags]
        tags.append((320, 3, 3 * 256, None))
    tags.sort(key=lambda t: t[0])
    n_entries = len(tags)

    def pack_entry(tag: int, typ: int, cnt: int, val: int) -> bytes:
        if bigtiff:
            return struct.pack("<HHQQ", tag, typ, cnt, val)
        return struct.pack("<HHII", tag, typ, cnt, val)

    entries = b""
    for tag, typ, cnt, val in tags:
        if tag == 33550:
            val = add_payload(struct.pack("<3d", abs(gt[1]), abs(gt[5]), 0.0))
        elif tag == 33922:
            val = add_payload(struct.pack("<6d", 0.0, 0.0, 0.0,
                                          gt[0], gt[3], 0.0))
        elif tag == _TAG_TRANSFORM:
            val = add_payload(struct.pack(
                "<16d", gt[1], gt[2], 0.0, gt[0],
                gt[4], gt[5], 0.0, gt[3],
                0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0))
        elif tag == _TAG_GEOKEYS:
            kid = 2048 if 4000 <= int(epsg) < 5000 else 3072
            val = add_payload(struct.pack(
                "<8H", 1, 1, 0, 1, kid, 0, 1, int(epsg)))
        elif tag == 320:
            pal = np.zeros((256, 3), np.uint16)
            p8 = np.asarray(palette, np.uint16)
            pal[:len(p8)] = p8 * 257
            val = add_payload(
                np.ascontiguousarray(pal.T.astype("<u2")).tobytes())
        entries += pack_entry(tag, typ, cnt, val)
    if bigtiff:
        head = b"II" + struct.pack("<HHHQ", 43, 8, 0, ifd_off)
        body = struct.pack("<Q", n_entries) + entries + struct.pack("<Q", 0)
    else:
        head = b"II" + struct.pack("<HI", 42, ifd_off)
        body = struct.pack("<H", n_entries) + entries + struct.pack("<I", 0)
    return head + data + body + extra


def tiff_colormap(data: bytes) -> np.ndarray | None:
    """ColorMap tag (320, photometric palette) -> (n, 3) uint8 table.

    TIFF stores 16-bit components r..r g..g b..b; the reference maps
    them to 8-bit color-table entries by /257 (gcore GTiffDataset
    color-table read; 8-bit entries were written as v*257)."""
    bo = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, bo)
    if 320 not in tags:
        return None
    vals = np.asarray(tags[320], np.uint32)
    n = vals.size // 3
    rgb16 = vals.reshape(3, n).T
    return np.floor(rgb16 / 257.0 + 0.5).astype(np.uint8)


def pct2rgb(band: np.ndarray, table: np.ndarray) -> np.ndarray:
    """pct2rgb utility semantics (gdal-utils pct2rgb.py: LUT expand of
    a paletted band to RGB)."""
    return np.asarray(table, np.uint8)[np.asarray(band, np.intp)]


def tiff_epsg(data: bytes) -> int | None:
    """EPSG from the GeoKey directory: ProjectedCSTypeGeoKey (3072)
    wins over GeographicTypeGeoKey (2048) — the same precedence the
    reference's GTIFGetDefn applies (frmts/gtiff/gt_wkt_srs.cpp)."""
    bo = "<" if data[:2] == b"II" else ">"
    tags = _read_ifd(data, bo)
    gk = tags.get(_TAG_GEOKEYS)
    if not gk or len(gk) < 4:
        return None
    proj = geog = None
    for k in range(4, len(gk) - 3, 4):
        kid, loc, cnt, val = (int(v) for v in gk[k:k + 4])
        if loc != 0:
            continue  # value lives in another tag (citation strings)
        if kid == 3072 and val not in (0, 32767):
            proj = val
        elif kid == 2048 and val not in (0, 32767):
            geog = val
    return proj or geog


def tiff_nodata(data: bytes) -> float | None:
    """The GDAL_NODATA ascii tag (42113) as a float, if present."""
    if data[:2] not in (b"II", b"MM"):
        return None
    bo = "<" if data[:2] == b"II" else ">"
    vals = _read_ifd(data, bo).get(42113)
    if not vals:
        return None
    try:
        return float(str(vals[0]).strip())
    except ValueError:
        return None


def read_tiff_dataset(paths: list[str]):
    """Ray source: binary files -> decoded tile rows (image_id, pixels
    meta + raw-codec bytes), the GDALOpenEx probe path for TIFF."""
    import pyarrow as pa
    import ray.data

    from ..functions.codecs import encode_image

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def decode(b) -> "pa.Table":
        ids, blobs, ws, hs, gts = [], [], [], [], []
        for path, data in zip(b["path"], b["bytes"]):
            px, gt = decode_tiff(bytes(data))
            ids.append(path)
            blobs.append(encode_image(px if px.ndim == 3 else px[:, :, None], "raw"))
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            gts.append(list(gt) if gt else [0.0, 1.0, 0.0, 0.0, 0.0, -1.0])
        return pa.table({
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "gt": pa.array(gts, pa.list_(pa.float64(), 6)),
        })

    return ds.map_batches(decode, batch_format="numpy")
