"""RasterLite2 (.rl2) raster driver (reference frmts/rasterlite2,
autotest/gdrivers/rl2.py).

A RasterLite2 database is SpatiaLite + ``raster_coverages`` metadata
plus per-coverage ``<name>_sections`` / ``_levels`` / ``_tiles`` /
``_tile_data`` tables.  Tiles are stored as two blobs: for DEFLATE the
pixel rows are split odd/even (tile_data_odd = rows 0,2,..,
tile_data_even = rows 1,3,..) and each half is horizontally
byte-delta-coded then zlib'd; JPEG/PNG blobs hold one full-tile
stream in tile_data_odd.

Blob header (reverse-derived against the reference's own fixtures —
every field cross-checked over 22 blobs spanning 512/256 tiles, all
sample types, DEFLATE and JPEG):

  odd  [0]=0x00 [1]=0xfa [2]=endian [3]=compression [4]=sample
       [5]=pixel [6]=nbands [7-8]=u16le width [9-10]=u16le height
       [15-18]=u32le uncompressed size [19-22]=u32le compressed size
       [23-26]=u32le full-tile size [27-30]=u32le mask size
       [31]=0xc8, payload at 32 (mask section after payload, unused
       here: validity is the section extent)
  even [0]=0x00 [1]=0xdb ... [7-8]/[9-10] w/h [13-16]=crc
       [17-20]=u32le uncompressed [21-24]=u32le compressed
       [25]=0xc8, payload at 26

Compression codes: 0x20 NONE, 0x22 DEFLATE, 0x25 PNG, 0x26 JPEG.
Sample codes 0xa1..0xab = 1-BIT..DOUBLE; pixel codes 0x11 MONOCHROME,
0x12 PALETTE, 0x13 GRAYSCALE, 0x14 RGB, 0x16 DATAGRID.

Coverage pyramids: ``_levels`` rows give per-level base resolutions;
tiles with ``section_id IS NULL`` are coverage-wide overviews (shown
by default), section-pyramid tiles only appear with
``show_all_pyramids`` (the RL2_SHOW_ALL_PYRAMID_LEVELS config of the
reference).
"""

from __future__ import annotations

import sqlite3
import struct
import zlib

import numpy as np

_SAMPLE_DTYPE = {0xA4: np.int8, 0xA5: np.uint8, 0xA6: np.int16,
                 0xA7: np.uint16, 0xA8: np.int32, 0xA9: np.uint32,
                 0xAA: np.float32, 0xAB: np.float64}
_SAMPLE_OF = {"INT8": 0xA4, "UINT8": 0xA5, "INT16": 0xA6,
              "UINT16": 0xA7, "INT32": 0xA8, "UINT32": 0xA9,
              "FLOAT": 0xAA, "DOUBLE": 0xAB, "1-BIT": 0xA1,
              "2-BIT": 0xA2, "4-BIT": 0xA3}
_PIXEL_OF = {"MONOCHROME": 0x11, "PALETTE": 0x12, "GRAYSCALE": 0x13,
             "RGB": 0x14, "MULTIBAND": 0x15, "DATAGRID": 0x16}
_COMP_OF = {"NONE": 0x20, "DEFLATE": 0x22, "PNG": 0x25, "JPEG": 0x26}


def _gaia_mbr(blob: bytes) -> tuple[float, float, float, float]:
    """SpatiaLite gaia geometry blob -> (minx, miny, maxx, maxy)."""
    if not blob or blob[0] != 0x00:
        raise ValueError("not a gaia geometry blob")
    fmt = "<4d" if blob[1] == 0x01 else ">4d"
    return struct.unpack_from(fmt, blob, 6)


def _gaia_rect(minx, miny, maxx, maxy, srid: int) -> bytes:
    ring = [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy),
            (minx, miny)]
    body = struct.pack("<I", 3) + struct.pack("<I", 1) \
        + struct.pack("<I", 5) \
        + b"".join(struct.pack("<2d", x, y) for x, y in ring)
    return (b"\x00\x01" + struct.pack("<i", srid)
            + struct.pack("<4d", minx, miny, maxx, maxy)
            + b"\x7c" + body + b"\xfe")


def _undelta_rows(raw: bytes, nrows: int, dt: np.dtype, npx: int,
                  nb: int) -> np.ndarray:
    """Invert the horizontal byte-LANE delta: byte k of each sample
    accumulates independently along the row (verified against the
    fixtures' checksums for every sample type)."""
    isz = dt.itemsize
    a = np.frombuffer(raw, np.uint8, count=nrows * npx * nb * isz)
    a = a.reshape(nrows, npx * nb, isz)
    out = np.cumsum(a, axis=1, dtype=np.uint32).astype(np.uint8)
    return out.tobytes()


def _delta_rows(arr_bytes: bytes, nrows: int, npx_nb: int,
                isz: int) -> bytes:
    a = np.frombuffer(arr_bytes, np.uint8,
                      count=nrows * npx_nb * isz)
    a = a.reshape(nrows, npx_nb, isz)
    d = a.astype(np.int16)
    d[:, 1:] = d[:, 1:] - a[:, :-1].astype(np.int16)
    return (d & 0xFF).astype(np.uint8).tobytes()


def _decode_tile(odd: bytes, even: bytes | None, tw: int,
                 th: int, scale_denom: int = 1) -> np.ndarray:
    """Decode one tile from its own blob header (sample/pixel/bands
    can differ from the coverage — palette pyramids are RGB).
    ``scale_denom`` > 1 renders the tile at 1/2, 1/4 or 1/8: JPEG via
    libjpeg-exact DCT-scaled decode, lossless codecs via top-left
    pixel pick — matching librasterlite2's virtual pyramid levels."""
    comp = odd[3]
    sample = odd[4]
    nb = odd[6]
    dt = np.dtype(_SAMPLE_DTYPE.get(sample, np.uint8))
    if comp == 0x26:                     # JPEG — one full-tile stream
        from ..functions.jpeg import decode_jpeg

        csz = struct.unpack_from("<I", odd, 19)[0]
        px = decode_jpeg(bytes(odd[32:32 + csz]),
                         scale_denom=scale_denom)
        if px.ndim == 2:
            px = px[:, :, None]
        return px[:, :, :nb]
    if scale_denom != 1:
        full = _decode_tile(odd, even, tw, th)
        return full[::scale_denom, ::scale_denom]
    if comp == 0x25:                     # PNG — one full-tile stream
        from ..functions.png import decode_png

        csz = struct.unpack_from("<I", odd, 19)[0]
        px = decode_png(bytes(odd[32:32 + csz]))
        if px.ndim == 2:
            px = px[:, :, None]
        return px[:, :, :nb]
    if comp not in (0x20, 0x22):
        raise NotImplementedError(f"RL2 tile compression {comp:#x}")

    def payload(blob, hdr_off, usz_off, csz_off):
        usz = struct.unpack_from("<I", blob, usz_off)[0]
        csz = struct.unpack_from("<I", blob, csz_off)[0]
        raw = bytes(blob[hdr_off:hdr_off + csz])
        return zlib.decompress(raw) if comp == 0x22 else raw, usz

    raw_o, usz_o = payload(odd, 32, 15, 19)
    if sample in (0xA1, 0xA2, 0xA3):     # sub-byte: full tile, packed
        bits = {0xA1: 1, 0xA2: 2, 0xA3: 4}[sample]
        packed = np.frombuffer(raw_o, np.uint8)
        rowbytes = (tw * bits + 7) // 8
        rows = packed[:th * rowbytes].reshape(th, rowbytes)
        allbits = np.unpackbits(rows, axis=1)[:, :tw * bits]
        if bits == 1:
            px = allbits[:, :tw]
            if odd[5] == 0x11:           # MONOCHROME: 0 = white
                px = (1 - px) * np.uint8(255)
            return px.astype(np.uint8)[:, :, None]
        vals = allbits.reshape(th, tw, bits)
        w = (1 << np.arange(bits - 1, -1, -1)).astype(np.uint8)
        return (vals * w).sum(axis=2).astype(np.uint8)[:, :, None]

    n_odd = (th + 1) // 2
    tile = np.zeros((th, tw, nb), dt)
    dec_o = _undelta_rows(raw_o, n_odd, dt, tw, nb)
    tile[0::2] = np.frombuffer(dec_o, dt,
                               count=n_odd * tw * nb).reshape(n_odd, tw,
                                                              nb)
    if even is not None:
        n_even = th // 2
        raw_e, _ = payload(even, 26, 17, 21)
        dec_e = _undelta_rows(raw_e, n_even, dt, tw, nb)
        tile[1::2] = np.frombuffer(
            dec_e, dt, count=n_even * tw * nb).reshape(n_even, tw, nb)
    return tile


def rl2_subdatasets(path: str) -> list[tuple[str, str]]:
    """GetSubDatasets analog (rl2.py test_rl2_3/test_rl2_5 naming)."""
    db = sqlite3.connect(path)
    try:
        covs = [r[0] for r in db.execute(
            "SELECT coverage_name FROM raster_coverages"
            " ORDER BY rowid").fetchall()]
        if len(covs) > 1:
            return [(f"RASTERLITE2:{path}:{c}", f"Coverage {c}")
                    for c in covs]
        out = []
        c = covs[0]
        secs = db.execute(
            f'SELECT section_id, section_name FROM "{c}_sections" '
            f'ORDER BY section_id').fetchall()
        if len(secs) > 1:
            for sid, sname in secs:
                out.append((f"RASTERLITE2:{path}:{c}:{sid}:{sname}",
                            f"Coverage {c}, section {sname} / {sid}"))
        return out
    finally:
        db.close()


def read_rl2(path: str, coverage: str | None = None,
             section_id: int | None = None, overview: int | None = None,
             show_all_pyramids: bool = False) -> dict:
    """-> {"pixels", "gt", "epsg", "palette", "overviews", "driver"}.

    ``overviews`` follows the reference's ListOverviews (rasterlite2
    .cpp:754): every distinct resolution from the ``_levels`` rows'
    1_1/1_2/1_4/1_8 columns, sized int(0.5 + extent/res), dropped
    when a dimension is <= 1 or when both are < 64 unless
    ``show_all_pyramids`` (RL2_SHOW_ALL_PYRAMID_LEVELS).  ``overview``
    indexes that list (GetOverview(i)); rendering reads the finest
    stored pyramid level whose resolution <= the requested one and
    reduces by the {1,2,4,8} factor — DCT-scaled decode for JPEG
    tiles (librasterlite2 uses libjpeg scale_denom), top-left pick
    for lossless codecs (both checksum-verified against the
    reference's rl2.py expectations)."""
    db = sqlite3.connect(path)
    try:
        q = "SELECT coverage_name, sample_type, pixel_type, num_bands,"\
            " compression, tile_width, tile_height, horz_resolution,"\
            " vert_resolution, srid, palette, extent_minx, extent_miny,"\
            " extent_maxx, extent_maxy FROM raster_coverages"\
            " ORDER BY rowid"
        rows = db.execute(q).fetchall()
        if coverage is not None:
            rows = [r for r in rows if r[0] == coverage]
        if not rows:
            raise ValueError(f"no coverage {coverage!r} in {path}")
        (cov, stype, ptype, nb, _comp, tw, th, xres, yres, srid, pal,
         minx, miny, maxx, maxy) = rows[0]
        sample = _SAMPLE_OF[stype]
        dt = np.dtype(_SAMPLE_DTYPE.get(sample, np.uint8))

        if section_id is not None:
            sec = db.execute(
                f'SELECT width, height, geometry FROM "{cov}_sections"'
                f' WHERE section_id = ?', (section_id,)).fetchone()
            _sw, _sh, geom = sec
            minx, miny, maxx, maxy = _gaia_mbr(geom)

        lvl_rows = db.execute(
            f'SELECT * FROM "{cov}_levels" ORDER BY pyramid_level'
        ).fetchall()
        lvl_cols = [d[0] for d in db.execute(
            f'SELECT * FROM "{cov}_levels" LIMIT 0').description]

        def col(row, name):
            return row[lvl_cols.index(name)] if name in lvl_cols \
                else None

        stored = {}                      # pyramid_level -> res_1_1
        cand = []                        # resolution candidates, ordered
        for r in lvl_rows:
            lvl = col(r, "pyramid_level")
            stored[lvl] = (col(r, "x_resolution_1_1"),
                           col(r, "y_resolution_1_1"))
            for suf in ("1_1", "1_2", "1_4", "1_8"):
                rx = col(r, f"x_resolution_{suf}")
                ry = col(r, f"y_resolution_{suf}")
                if rx is not None and ry is not None:
                    cand.append((rx, ry))
        ovr = []
        for rx, ry in cand:
            if abs(rx - xres) < 1e-5 * xres:
                continue
            if any(abs(rx - o[0]) < 1e-5 * o[0] for o in ovr):
                continue
            ow = int(0.5 + (maxx - minx) / rx)
            oh = int(0.5 + (maxy - miny) / ry)
            if ow <= 1 or oh <= 1:
                continue
            if ow < 64 and oh < 64 and not show_all_pyramids:
                continue
            ovr.append((rx, ry, ow, oh))

        if overview is not None:
            rxres, ryres, w, h = ovr[overview]
        else:
            rxres, ryres = xres, yres
            # level-0 grids divide exactly
            w = int(np.ceil((maxx - minx) / rxres - 1e-9))
            h = int(np.ceil((maxy - miny) / ryres - 1e-9))
        # finest stored level not finer than the request
        use_lvl, lvl_res = 0, xres
        for lvl in sorted(stored):
            lx = stored[lvl][0]
            if lx <= rxres * (1 + 1e-9):
                use_lvl, lvl_res = lvl, lx
        factor = int(round(rxres / lvl_res))
        if factor not in (1, 2, 4, 8):
            raise NotImplementedError(
                f"RL2 reduction factor {factor} (res {rxres} from"
                f" level res {lvl_res})")

        canvas = None
        tq = (f'SELECT t.tile_id, t.geometry, d.tile_data_odd,'
              f' d.tile_data_even FROM "{cov}_tiles" t JOIN'
              f' "{cov}_tile_data" d ON t.tile_id = d.tile_id'
              f' WHERE t.pyramid_level = ?')
        args = [use_lvl]
        if section_id is not None:
            tq += " AND t.section_id = ?"
            args.append(section_id)
        for _tid, geom, odd, even in db.execute(tq, args):
            tminx, tminy, tmaxx, tmaxy = _gaia_mbr(geom)
            if tminx >= maxx or tmaxx <= minx or tminy >= maxy \
                    or tmaxy <= miny:
                continue
            tile = _decode_tile(odd, even, tw, th, scale_denom=factor)
            if canvas is None:           # dtype/bands from the blobs
                nb = tile.shape[2]
                dt = tile.dtype
                canvas = np.zeros((h, w, nb), dt)
            x0 = int(round((tminx - minx) / rxres))
            y0 = int(round((maxy - tmaxy) / ryres))
            sx = max(0, -x0)
            sy = max(0, -y0)
            dx = max(0, x0)
            dy = max(0, y0)
            cw = min(tile.shape[1] - sx, w - dx)
            ch = min(tile.shape[0] - sy, h - dy)
            if cw > 0 and ch > 0:
                canvas[dy:dy + ch, dx:dx + cw] = \
                    tile[sy:sy + ch, sx:sx + cw]

        if canvas is None:
            canvas = np.zeros((h, w, nb), dt)
        gt = (minx, rxres, 0.0, maxy, 0.0, -ryres)
        palette = None
        if pal is not None and ptype == "PALETTE":
            n = pal[4]
            n = 256 if n == 0 else n     # header count byte (0 => 256)
            palette = np.frombuffer(pal, np.uint8, count=256 * 3,
                                    offset=6).reshape(256, 3)
        return {"pixels": canvas[:, :, 0] if nb == 1 else canvas,
                "gt": gt, "epsg": srid, "palette": palette,
                "overviews": ovr, "coverage": cov, "driver": "SQLite"}
    finally:
        db.close()


# --------------------------------------------------------------- write


def write_rl2(path: str, px: np.ndarray, gt, epsg: int,
              compression: str = "DEFLATE", coverage: str = "raster",
              tile_size: int = 512) -> None:
    """CreateCopy analog (rl2.py test_rl2_6/7/8): build the SpatiaLite
    raster_coverages schema + one section and its tile grid."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nb = px.shape
    stype = {np.dtype(np.uint8): "UINT8", np.dtype(np.int8): "INT8",
             np.dtype(np.uint16): "UINT16",
             np.dtype(np.int16): "INT16",
             np.dtype(np.uint32): "UINT32",
             np.dtype(np.int32): "INT32",
             np.dtype(np.float32): "FLOAT",
             np.dtype(np.float64): "DOUBLE"}[px.dtype]
    ptype = ("RGB" if nb == 3 else
             "GRAYSCALE" if px.dtype == np.uint8 else "DATAGRID")
    comp = _COMP_OF[compression.upper()]
    xres, yres = gt[1], -gt[5]
    minx, maxy = gt[0], gt[3]
    maxx, miny = minx + w * xres, maxy - h * yres

    db = sqlite3.connect(path)
    cur = db.cursor()
    cur.execute("CREATE TABLE IF NOT EXISTS raster_coverages ("
                "coverage_name TEXT, sample_type TEXT,"
                " pixel_type TEXT, num_bands INTEGER,"
                " compression TEXT, tile_width INTEGER,"
                " tile_height INTEGER, horz_resolution DOUBLE,"
                " vert_resolution DOUBLE, srid INTEGER, palette BLOB,"
                " extent_minx DOUBLE, extent_miny DOUBLE,"
                " extent_maxx DOUBLE, extent_maxy DOUBLE)")
    cur.execute("INSERT INTO raster_coverages VALUES "
                "(?,?,?,?,?,?,?,?,?,?,NULL,?,?,?,?)",
                (coverage, stype, ptype, nb, compression.upper(),
                 tile_size, tile_size, xres, yres, epsg,
                 minx, miny, maxx, maxy))
    cur.execute(f'CREATE TABLE "{coverage}_sections" (section_id'
                f' INTEGER PRIMARY KEY, section_name TEXT, width'
                f' INTEGER, height INTEGER, geometry BLOB)')
    cur.execute(f'INSERT INTO "{coverage}_sections" VALUES'
                f' (1, ?, ?, ?, ?)',
                (coverage, w, h, _gaia_rect(minx, miny, maxx, maxy,
                                            epsg)))
    cur.execute(f'CREATE TABLE "{coverage}_levels" (pyramid_level'
                f' INTEGER, x_resolution_1_1 DOUBLE, y_resolution_1_1'
                f' DOUBLE)')
    cur.execute(f'INSERT INTO "{coverage}_levels" VALUES (0, ?, ?)',
                (xres, yres))
    cur.execute(f'CREATE TABLE "{coverage}_tiles" (tile_id INTEGER'
                f' PRIMARY KEY, pyramid_level INTEGER, section_id'
                f' INTEGER, geometry BLOB)')
    cur.execute(f'CREATE TABLE "{coverage}_tile_data" (tile_id'
                f' INTEGER PRIMARY KEY, tile_data_odd BLOB,'
                f' tile_data_even BLOB)')

    sval = _SAMPLE_OF[stype]
    pval = _PIXEL_OF[ptype]
    tid = 0
    for ty0 in range(0, h, tile_size):
        for tx0 in range(0, w, tile_size):
            tid += 1
            tile = np.zeros((tile_size, tile_size, nb), px.dtype)
            part = px[ty0:ty0 + tile_size, tx0:tx0 + tile_size]
            tile[:part.shape[0], :part.shape[1]] = part

            def hdr_odd(usz, csz):
                b = bytearray(32)
                b[0:7] = bytes([0, 0xFA, 1, comp, sval, pval, nb])
                struct.pack_into("<H", b, 7, tile_size)
                struct.pack_into("<H", b, 9, tile_size)
                struct.pack_into("<I", b, 15, usz)
                struct.pack_into("<I", b, 19, csz)
                struct.pack_into("<I", b, 23,
                                 tile_size * tile_size * nb
                                 * px.dtype.itemsize)
                b[31] = 0xC8
                return bytes(b)

            if comp == 0x26:
                from ..functions.jpeg import encode_jpeg

                data = encode_jpeg(tile[:, :, 0] if nb == 1
                                   else tile, quality=85)
                odd = hdr_odd(tile.nbytes, len(data)) + data
                even = None
            elif comp == 0x25:
                from ..functions.png import encode_png

                data = encode_png(tile[:, :, 0] if nb == 1 else tile)
                odd = hdr_odd(tile.nbytes, len(data)) + data
                even = None
            else:
                rows_o = np.ascontiguousarray(tile[0::2]).tobytes()
                rows_e = np.ascontiguousarray(tile[1::2]).tobytes()
                n_o = (tile_size + 1) // 2
                n_e = tile_size // 2
                isz = px.dtype.itemsize
                enc_o = zlib.compress(
                    _delta_rows(rows_o, n_o, tile_size * nb, isz), 6)
                enc_e = zlib.compress(
                    _delta_rows(rows_e, n_e, tile_size * nb, isz), 6)
                odd = hdr_odd(len(rows_o), len(enc_o)) + enc_o
                eb = bytearray(26)
                eb[0:7] = bytes([0, 0xDB, 1, comp, sval, pval, nb])
                struct.pack_into("<H", eb, 7, tile_size)
                struct.pack_into("<H", eb, 9, tile_size)
                struct.pack_into("<I", eb, 17, len(rows_e))
                struct.pack_into("<I", eb, 21, len(enc_e))
                eb[25] = 0xC8
                even = bytes(eb) + enc_e
            tminx = minx + tx0 * xres
            tmaxy = maxy - ty0 * yres
            geom = _gaia_rect(tminx, tmaxy - tile_size * yres,
                              tminx + tile_size * xres, tmaxy, epsg)
            cur.execute(f'INSERT INTO "{coverage}_tiles" VALUES'
                        f' (?, 0, 1, ?)', (tid, geom))
            cur.execute(f'INSERT INTO "{coverage}_tile_data" VALUES'
                        f' (?, ?, ?)', (tid, odd, even))
    db.commit()
    db.close()
