"""Cloud-Optimized GeoTIFF layout writer + chained-IFD reader
(reference frmts/gtiff/cogdriver.cpp + gtiffdataset_write.cpp:7654-7692).

A COG is a classic little-endian GeoTIFF with
- the GDAL structural-metadata ghost area straight after the header
  (``GDAL_STRUCTURAL_METADATA_SIZE=%06d bytes`` + LAYOUT=
  IFDS_BEFORE_DATA, BLOCK_ORDER=ROW_MAJOR, BLOCK_LEADER=SIZE_AS_UINT4,
  BLOCK_TRAILER=LAST_4_BYTES_REPEATED, KNOWN_INCOMPATIBLE_EDITION=NO
  — the exact strings the reference emits),
- ALL IFDs (full resolution first, then each overview with
  NewSubfileType=1) before any tile data,
- tile data written smallest overview first, full resolution last,
  row-major within a level, each block preceded by a 4-byte size
  leader and followed by its last 4 bytes repeated (the trailer),
- tiled layout (TileWidth/TileLength/TileOffsets/TileByteCounts) with
  right/bottom edge tiles padded to full tile size per the TIFF spec.

Overviews are 2x2 masked averages per level until the level fits one
tile (gcore/overview.cpp average semantics: half-away rounding for
integer types). Level 0 of the produced file also decodes through the
engine's plain ``decode_tiff`` (tiled single-IFD path) — the readers
cross-check each other.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_GHOST_ITEMS = ("LAYOUT=IFDS_BEFORE_DATA\n"
                "BLOCK_ORDER=ROW_MAJOR\n"
                "BLOCK_LEADER=SIZE_AS_UINT4\n"
                "BLOCK_TRAILER=LAST_4_BYTES_REPEATED\n"
                "KNOWN_INCOMPATIBLE_EDITION=NO\n ")


def _ghost() -> bytes:
    body = _GHOST_ITEMS
    return (f"GDAL_STRUCTURAL_METADATA_SIZE={len(body):06d} bytes\n"
            + body).encode("ascii")


def reduce2_average(a: np.ndarray) -> np.ndarray:
    """One 2x2-average overview level (gcore/overview.cpp average
    reducer: half-away rounding back to integer types; odd edges
    replicate the last row/column)."""
    h, w = a.shape[:2]
    if h % 2:
        a = np.concatenate([a, a[-1:]], axis=0)
    if w % 2:
        a = np.concatenate([a, a[:, -1:]], axis=1)
    f = a.astype(np.float64)
    m = (f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2]) / 4.0
    if np.issubdtype(a.dtype, np.integer):
        return np.floor(m + 0.5).astype(a.dtype)
    return m.astype(a.dtype)


def _tiles_of(level: np.ndarray, tile: int):
    h, w = level.shape[:2]
    spp = 1 if level.ndim == 2 else level.shape[2]
    out = []
    for ty in range(0, h, tile):
        for tx in range(0, w, tile):
            block = level[ty:ty + tile, tx:tx + tile]
            if block.shape[0] != tile or block.shape[1] != tile:
                pad = np.zeros((tile, tile) + level.shape[2:], level.dtype)
                pad[:block.shape[0], :block.shape[1]] = block
                block = pad
            out.append(np.ascontiguousarray(block).tobytes())
    return out, spp


def encode_cog(px: np.ndarray, gt=None, tile: int = 256,
               compression: str = "deflate",
               epsg: int | None = None) -> bytes:
    """Encode a 2-D (or (h, w, bands) chunky) array as a COG."""
    px = np.ascontiguousarray(px)
    if px.dtype.kind == "f":
        fmt = 3
    elif px.dtype.kind == "i":
        fmt = 2
    elif px.dtype.kind == "u":
        fmt = 1
    else:
        raise ValueError(f"unsupported dtype {px.dtype}")
    px = px.astype(px.dtype.newbyteorder("<"))
    bits = px.dtype.itemsize * 8
    spp = 1 if px.ndim == 2 else px.shape[2]
    if compression == "deflate":
        comp_tag = 8
    elif compression == "none":
        comp_tag = 1
    else:
        raise NotImplementedError(f"COG compression {compression}")

    levels = [px]
    while max(levels[-1].shape[0], levels[-1].shape[1]) > tile:
        levels.append(reduce2_average(levels[-1]))

    # compress every tile of every level
    blobs: list[list[bytes]] = []
    for lv in levels:
        raw, _ = _tiles_of(lv, tile)
        blobs.append([zlib.compress(t, 6) if comp_tag == 8 else t
                      for t in raw])

    # ---- plan the IFDs -------------------------------------------------
    header = b"II" + struct.pack("<HI", 42, 0)  # offset patched below
    ghost = _ghost()
    pos = 8 + len(ghost)

    geo_doubles = geo_tie = geo_keys = None
    if gt is not None:
        if gt[2] or gt[4]:
            raise NotImplementedError("rotated gt in COG writer")
        geo_doubles = struct.pack("<3d", gt[1], -gt[5], 0.0)
        geo_tie = struct.pack("<6d", 0, 0, 0, gt[0], gt[3], 0)
    if epsg is not None:
        is_geog = 4000 <= epsg <= 4999
        geo_keys = struct.pack(
            "<16H", 1, 1, 0, 3,
            1024, 0, 1, 2 if is_geog else 1,
            1025, 0, 1, 1,
            (2048 if is_geog else 3072), 0, 1, epsg)

    ifd_plans = []
    for li, lv in enumerate(levels):
        h, w = lv.shape[:2]
        n_tiles = len(blobs[li])
        tags = []
        if li > 0:
            tags.append((254, 4, 1, [1]))  # reduced-resolution subfile
        tags += [(256, 3, 1, [w]), (257, 3, 1, [h])]
        tags.append((258, 3, spp, [bits] * spp))
        tags += [(259, 3, 1, [comp_tag]),
                 (262, 3, 1, [2 if spp >= 3 else 1]),
                 (277, 3, 1, [spp]), (284, 3, 1, [1]),
                 (322, 3, 1, [tile]), (323, 3, 1, [tile]),
                 (324, 4, n_tiles, None),   # offsets patched later
                 (325, 4, n_tiles, [len(b) for b in blobs[li]]),
                 (339, 3, 1, [fmt])]
        if li == 0 and geo_doubles is not None:
            tags.append((33550, 12, 3, geo_doubles))
            tags.append((33922, 12, 6, geo_tie))
        if li == 0 and geo_keys is not None:
            tags.append((34735, 3, 16, geo_keys))
        tags.sort(key=lambda t: t[0])
        ifd_plans.append(tags)

    type_size = {3: 2, 4: 4, 12: 8}

    # IFD sizes (entries + next pointer) and external payload sizes
    ifd_offs = []
    for tags in ifd_plans:
        ifd_offs.append(pos)
        pos += 2 + 12 * len(tags) + 4
    # external payload area
    ext_offs: dict[tuple[int, int], int] = {}
    for li, tags in enumerate(ifd_plans):
        for (tag, typ, cnt, val) in tags:
            if cnt * type_size[typ] > 4:
                ext_offs[(li, tag)] = pos
                pos += cnt * type_size[typ]
                pos += pos % 2  # word-align
    # data blocks: smallest overview first, full res last
    tile_offsets: list[list[int]] = [[] for _ in levels]
    for li in range(len(levels) - 1, -1, -1):
        for b in blobs[li]:
            pos += 4  # leader
            tile_offsets[li].append(pos)
            pos += len(b) + 4  # data + trailer

    # ---- emit ----------------------------------------------------------
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_offs[0])
    out += ghost

    def pack_val(typ, cnt, vals) -> bytes:
        if typ == 12:
            return vals if isinstance(vals, bytes) else struct.pack(
                f"<{cnt}d", *vals)
        if isinstance(vals, bytes):
            return vals
        f = "H" if typ == 3 else "I"
        return struct.pack(f"<{cnt}{f}", *vals)

    for li, tags in enumerate(ifd_plans):
        out += struct.pack("<H", len(tags))
        for (tag, typ, cnt, val) in tags:
            if tag == 324:
                val = tile_offsets[li]
            raw = pack_val(typ, cnt, val)
            if len(raw) > 4:
                out += struct.pack("<HHI", tag, typ, cnt) + struct.pack(
                    "<I", ext_offs[(li, tag)])
            else:
                out += struct.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\0")
        nxt = ifd_offs[li + 1] if li + 1 < len(ifd_plans) else 0
        out += struct.pack("<I", nxt)

    for li, tags in enumerate(ifd_plans):
        for (tag, typ, cnt, val) in tags:
            if cnt * type_size[typ] > 4:
                if tag == 324:
                    val = tile_offsets[li]
                out += pack_val(typ, cnt, val)
                if len(out) % 2:
                    out += b"\0"

    for li in range(len(levels) - 1, -1, -1):
        for bi, b in enumerate(blobs[li]):
            out += struct.pack("<I", len(b))  # BLOCK_LEADER=SIZE_AS_UINT4
            assert len(out) == tile_offsets[li][bi]
            out += b
            out += b[-4:] if len(b) >= 4 else b.ljust(4, b"\0")  # trailer
    return bytes(out)


# --------------------------------------------------------------- reading

def _walk_ifds(data: bytes):
    bo = "<" if data[:2] == b"II" else ">"
    if struct.unpack(bo + "H", data[2:4])[0] != 42:
        raise NotImplementedError("COG reader handles classic TIFF only")
    off = struct.unpack(bo + "I", data[4:8])[0]
    while off:
        n = struct.unpack(bo + "H", data[off:off + 2])[0]
        tags = {}
        for i in range(n):
            e = off + 2 + 12 * i
            tag, typ, cnt = struct.unpack(bo + "HHI", data[e:e + 8])
            raw = data[e + 8:e + 12]
            sz = {1: 1, 2: 1, 3: 2, 4: 4, 12: 8}.get(typ)
            if sz is None:
                continue
            if cnt * sz > 4:
                p = struct.unpack(bo + "I", raw)[0]
                body = data[p:p + cnt * sz]
            else:
                body = raw[:cnt * sz]
            f = {1: "B", 2: "B", 3: "H", 4: "I", 12: "d"}[typ]
            tags[tag] = list(struct.unpack(bo + str(cnt) + f, body))
        yield tags
        off = struct.unpack(
            bo + "I", data[off + 2 + 12 * n:off + 6 + 12 * n])[0]


def cog_structural_metadata(data: bytes) -> dict[str, str] | None:
    """Parse the ghost area if present."""
    head = data[8:8 + 43]
    if not head.startswith(b"GDAL_STRUCTURAL_METADATA_SIZE="):
        return None
    size = int(head[30:36])
    body = data[8 + 43:8 + 43 + size].decode("ascii")
    out = {}
    for line in body.splitlines():
        if "=" in line:
            k, v = line.split("=", 1)
            out[k.strip()] = v.strip()
    return out


def cog_level_count(data: bytes) -> int:
    return sum(1 for _ in _walk_ifds(data))


def decode_cog(data: bytes, level: int = 0):
    """-> (pixels, geotransform|None) for one resolution level."""
    for li, tags in enumerate(_walk_ifds(data)):
        if li != level:
            continue
        w, h = tags[256][0], tags[257][0]
        bits = tags[258][0]
        spp = tags.get(277, [1])[0]
        fmt = tags.get(339, [1])[0]
        comp = tags.get(259, [1])[0]
        tile = tags[322][0]
        kind = {1: "u", 2: "i", 3: "f"}[fmt]
        dt = np.dtype(f"<{kind}{bits // 8}")
        shape = (h, w) if spp == 1 else (h, w, spp)
        out = np.zeros((((h + tile - 1) // tile) * tile,
                        ((w + tile - 1) // tile) * tile) +
                       ((spp,) if spp > 1 else ()), dt)
        per_row = (w + tile - 1) // tile
        for ti, (o, c) in enumerate(zip(tags[324], tags[325])):
            raw = data[o:o + c]
            if comp == 8:
                raw = zlib.decompress(raw)
            block = np.frombuffer(raw, dt).reshape(
                (tile, tile) + ((spp,) if spp > 1 else ()))
            ty, tx = divmod(ti, per_row)
            out[ty * tile:(ty + 1) * tile, tx * tile:(tx + 1) * tile] = block
        px = out[:h, :w]
        gt = None
        if 33550 in tags and 33922 in tags:
            sx, sy = tags[33550][0], tags[33550][1]
            tie = tags[33922]
            gt = (tie[3], sx, 0.0, tie[4], 0.0, -sy)
        return (px.reshape(shape) if spp > 1 else px), gt
    raise IndexError(f"COG has no level {level}")
