"""SOZip — Seek-Optimized ZIP create / validate / ranged read.

Re-derives the reference's SOZip support (port/cpl_minizip_zip.cpp
CPLAddFileInZip SOZip branch, port/cpl_vsil_gzip.cpp index parsing;
`gdal vsi sozip` in apps/gdalalg_vsi_sozip*; spec at sozip.org):

- a SOZip-enabled entry is a PLAIN deflate (method 8) member whose
  stream is flushed (Z_FULL_FLUSH) at every ``chunk_size`` boundary,
  so any chunk can be inflated independently;
- a hidden companion entry ``<dir>/.<name>.sozip.idx`` follows the
  member's data with a LOCAL header only (no central-directory
  entry), holding a 32-byte header (u32 version=1, u32 skip=0,
  u32 chunk_size, u32 offset_size=8, u64 uncompressed, u64
  compressed) + one little-endian u64 compressed-stream offset per
  chunk AFTER the first;
- readers that do not know SOZip see a perfectly normal zip (python
  ``zipfile`` reads our output — the conformance check in tests).

Why it matters at 100 TB: a zipped asset becomes RANGE-READABLE, so
`sozip_chunk_dataset` can fan chunk decompression out over Ray
workers instead of streaming the whole member through one.

AUTO mode enables SOZip when the member is larger than 1 MiB
(nSOZipMinFileSize default) and larger than one chunk, like the
reference.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np  # noqa: F401

SOZIP_VERSION = 1
DEFAULT_CHUNK = 32 * 1024
AUTO_MIN_SIZE = 1024 * 1024


def _dos_time() -> tuple[int, int]:
    return 0, 0x21  # deterministic epoch-ish timestamp


def _local_header(name: bytes, method: int, crc: int, csize: int,
                  usize: int) -> bytes:
    t, d = _dos_time()
    return (b"PK\x03\x04" + struct.pack(
        "<HHHHHIIIHH", 20, 0, method, t, d, crc, csize, usize,
        len(name), 0) + name)


def _central_header(name: bytes, method: int, crc: int, csize: int,
                    usize: int, offset: int) -> bytes:
    t, d = _dos_time()
    return (b"PK\x01\x02" + struct.pack(
        "<HHHHHHIIIHHHHHII", 20, 20, 0, method, t, d, crc, csize,
        usize, len(name), 0, 0, 0, 0, 0, offset) + name)


def _deflate_chunked(data: bytes, chunk: int):
    """Raw-deflate with a FULL_FLUSH at every chunk boundary ->
    (compressed bytes, offsets of each chunk after the first)."""
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    out = bytearray()
    offsets = []
    for start in range(0, len(data), chunk):
        if start:
            offsets.append(len(out))
        out += comp.compress(data[start:start + chunk])
        if start + chunk < len(data):
            out += comp.flush(zlib.Z_FULL_FLUSH)
    out += comp.flush(zlib.Z_FINISH)
    return bytes(out), offsets


def sozip_create(zip_path: str, entries: list[tuple[str, bytes]],
                 chunk_size: int = DEFAULT_CHUNK,
                 enable: str = "auto") -> dict:
    """Write ``entries`` [(archive_name, payload), ...] to a zip;
    returns {name: sozip_enabled}.  ``enable``: "auto" | "yes" |
    "no" (gdal vsi sozip create semantics)."""
    if not zip_path.endswith(".zip"):
        raise ValueError("Extension of zip filename should be .zip")
    if sum(len(d) for _, d in entries) >= 0xFFFFFFFF:
        # the writer emits 32-bit records only (the READER handles
        # zip64); >=4 GiB members need a chunk-partitioned layout
        raise ValueError(
            "sozip_create writes 32-bit zip records; split members "
            ">= 4 GiB across archives (zip64 write not implemented)")
    on = {}
    body = bytearray()
    central = bytearray()
    for name, data in entries:
        want = (enable == "yes"
                or (enable == "auto" and len(data) > AUTO_MIN_SIZE))
        want = want and len(data) > chunk_size
        on[name] = bool(want)
        crc = zlib.crc32(data) & 0xFFFFFFFF
        nb = name.encode()
        if want:
            comp, offsets = _deflate_chunked(data, chunk_size)
            hdr_off = len(body)
            body += _local_header(nb, 8, crc, len(comp), len(data))
            body += comp
            idx = struct.pack("<IIII", SOZIP_VERSION, 0, chunk_size, 8)
            idx += struct.pack("<QQ", len(data), len(comp))
            idx += b"".join(struct.pack("<Q", o) for o in offsets)
            d, base = (name.rsplit("/", 1) if "/" in name
                       else ("", name))
            iname = (f"{d}/.{base}.sozip.idx" if d
                     else f".{base}.sozip.idx").encode()
            # hidden: LOCAL header only, no central-directory entry
            body += _local_header(iname, 0, zlib.crc32(idx) & 0xFFFFFFFF,
                                  len(idx), len(idx))
            body += idx
        else:
            comp = zlib.compress(data, 9)[2:-4]  # raw deflate
            hdr_off = len(body)
            body += _local_header(nb, 8, crc, len(comp), len(data))
            body += comp
        central += _central_header(nb, 8, crc, len(comp), len(data),
                                   hdr_off)
    eocd = (b"PK\x05\x06" + struct.pack(
        "<HHHHIIH", 0, 0, len(entries), len(entries), len(central),
        len(body), 0))
    with open(zip_path, "wb") as f:
        f.write(bytes(body) + bytes(central) + eocd)
    return on


def _iter_central(blob: bytes):
    eocd = blob.rfind(b"PK\x05\x06")
    n = struct.unpack_from("<H", blob, eocd + 10)[0]
    cd_off = struct.unpack_from("<I", blob, eocd + 16)[0]
    if n == 0xFFFF or cd_off == 0xFFFFFFFF:
        loc = blob.rfind(b"PK\x06\x07", 0, eocd)
        e64 = struct.unpack_from("<Q", blob, loc + 8)[0]
        n = struct.unpack_from("<Q", blob, e64 + 32)[0]
        cd_off = struct.unpack_from("<Q", blob, e64 + 48)[0]
    pos = cd_off
    for _ in range(n):
        assert blob[pos:pos + 4] == b"PK\x01\x02"
        (method, crc, csize, usize, nlen, elen, clen) = (
            struct.unpack_from("<H", blob, pos + 10)[0],
            struct.unpack_from("<I", blob, pos + 16)[0],
            struct.unpack_from("<I", blob, pos + 20)[0],
            struct.unpack_from("<I", blob, pos + 24)[0],
            struct.unpack_from("<H", blob, pos + 28)[0],
            struct.unpack_from("<H", blob, pos + 30)[0],
            struct.unpack_from("<H", blob, pos + 32)[0])
        off = struct.unpack_from("<I", blob, pos + 42)[0]
        # minimal zip64: 0x0001 extra supplies the 0xFFFFFFFF fields
        # in order (usize, csize, offset)
        ep = pos + 46 + nlen
        eend = ep + elen
        while ep + 4 <= eend:
            tag, sz = struct.unpack_from("<HH", blob, ep)
            if tag == 0x0001:
                vp = ep + 4
                if usize == 0xFFFFFFFF:
                    usize = struct.unpack_from("<Q", blob, vp)[0]
                    vp += 8
                if csize == 0xFFFFFFFF:
                    csize = struct.unpack_from("<Q", blob, vp)[0]
                    vp += 8
                if off == 0xFFFFFFFF:
                    off = struct.unpack_from("<Q", blob, vp)[0]
            ep += 4 + sz
        name = blob[pos + 46:pos + 46 + nlen].decode()
        yield dict(name=name, method=method, crc=crc, csize=csize,
                   usize=usize, offset=off)
        pos += 46 + nlen + elen + clen


def _data_start(blob: bytes, hdr_off: int) -> int:
    nlen, elen = struct.unpack_from("<HH", blob, hdr_off + 26)
    return hdr_off + 30 + nlen + elen


def sozip_info(zip_path: str) -> list[dict]:
    """Per-member SOZip status: {name, size, sozip, chunk_size,
    n_chunks, index_valid} — the `gdal vsi sozip validate` facts."""
    blob = open(zip_path, "rb").read()
    out = []
    for ent in _iter_central(blob):
        rec = dict(name=ent["name"], size=ent["usize"], sozip=False,
                   chunk_size=0, n_chunks=0, index_valid=False)
        ds = _data_start(blob, ent["offset"])
        after = ds + ent["csize"]
        if (ent["method"] == 8 and blob[after:after + 4] == b"PK\x03\x04"):
            nlen = struct.unpack_from("<H", blob, after + 26)[0]
            iname = blob[after + 30:after + 30 + nlen].decode()
            if iname.endswith(".sozip.idx"):
                ids = _data_start(blob, after)
                ver, skip, chunk, osz = struct.unpack_from(
                    "<IIII", blob, ids)
                usz, csz = struct.unpack_from("<QQ", blob, ids + 16)
                n_chunks = max(1, -(-ent["usize"] // chunk)) if chunk \
                    else 0
                rec.update(sozip=True, chunk_size=chunk,
                           n_chunks=n_chunks)
                idx_len = struct.unpack_from("<I", blob,
                                             after + 18)[0]
                rec["index_valid"] = (
                    ver == SOZIP_VERSION and skip == 0 and osz == 8
                    and usz == ent["usize"] and csz == ent["csize"]
                    and idx_len == 32 + (n_chunks - 1) * 8)
        out.append(rec)
    return out


def sozip_read(zip_path: str, name: str) -> bytes:
    """Whole-member read through the normal deflate path."""
    blob = open(zip_path, "rb").read()
    for ent in _iter_central(blob):
        if ent["name"] == name:
            ds = _data_start(blob, ent["offset"])
            raw = blob[ds:ds + ent["csize"]]
            if ent["method"] == 0:
                return raw
            return zlib.decompress(raw, -15)
    raise FileNotFoundError(name)


def sozip_read_range(zip_path: str, name: str, offset: int,
                     size: int) -> bytes:
    """Ranged read THROUGH THE INDEX: only the chunks covering
    [offset, offset+size) are inflated (the point of SOZip)."""
    blob = open(zip_path, "rb").read()
    for ent in _iter_central(blob):
        if ent["name"] != name:
            continue
        ds = _data_start(blob, ent["offset"])
        after = ds + ent["csize"]
        is_idx = False
        if blob[after:after + 4] == b"PK\x03\x04":
            nlen = struct.unpack_from("<H", blob, after + 26)[0]
            is_idx = blob[after + 30:after + 30 + nlen].decode(
                errors="replace").endswith(".sozip.idx")
        if not is_idx:
            raise ValueError(f"{name} is not SOZip-enabled")
        ids = _data_start(blob, after)
        _ver, _skip, chunk, _osz = struct.unpack_from("<IIII", blob, ids)
        usz, _csz = struct.unpack_from("<QQ", blob, ids + 16)
        n_chunks = max(1, -(-usz // chunk))
        offs = [0] + [struct.unpack_from("<Q", blob,
                                         ids + 32 + 8 * i)[0]
                      for i in range(n_chunks - 1)]
        c0 = max(0, min(offset // chunk, n_chunks - 1))
        c1 = max(0, min((offset + size - 1) // chunk, n_chunks - 1))
        out = bytearray()
        for c in range(c0, c1 + 1):
            start = ds + offs[c]
            end = ds + (offs[c + 1] if c + 1 < n_chunks
                        else ent["csize"])
            d = zlib.decompressobj(-15)
            out += d.decompress(blob[start:end])
        rel = offset - c0 * chunk
        return bytes(out[rel:rel + size])
    raise FileNotFoundError(name)


def sozip_chunk_dataset(zip_path: str, name: str):
    """Ray Dataset of the member's chunks, inflated IN PARALLEL via
    the SOZip index.  The index and entry offsets resolve ONCE on the
    driver; each task then seeks straight to its compressed byte
    range — no per-chunk archive re-read."""
    import pyarrow as pa
    import ray.data

    blob = open(zip_path, "rb").read()
    for ent in _iter_central(blob):
        if ent["name"] == name:
            break
    else:
        raise FileNotFoundError(name)
    ds0 = _data_start(blob, ent["offset"])
    after = ds0 + ent["csize"]
    nlen = struct.unpack_from("<H", blob, after + 26)[0]
    if not (blob[after:after + 4] == b"PK\x03\x04"
            and blob[after + 30:after + 30 + nlen].decode(
                errors="replace").endswith(".sozip.idx")):
        raise ValueError(f"{name} is not SOZip-enabled")
    ids = _data_start(blob, after)
    _ver, _skip, chunk, _osz = struct.unpack_from("<IIII", blob, ids)
    usz, _csz = struct.unpack_from("<QQ", blob, ids + 16)
    n = max(1, -(-usz // chunk))
    offs = [0] + [struct.unpack_from("<Q", blob, ids + 32 + 8 * i)[0]
                  for i in range(n - 1)]
    bounds = [(ds0 + offs[c],
               ds0 + (offs[c + 1] if c + 1 < n else ent["csize"]))
              for c in range(n)]
    del blob

    def read_chunks(t: pa.Table) -> pa.Table:
        cs, datas = [], []
        with open(zip_path, "rb") as f:
            for c in t["chunk"].to_pylist():
                start, end = bounds[c]
                f.seek(start)
                raw = f.read(end - start)
                size = min(chunk, usz - c * chunk)
                d = zlib.decompressobj(-15)
                datas.append(d.decompress(raw)[:size])
                cs.append(c)
        return pa.table({"chunk": pa.array(cs, pa.int64()),
                         "data": pa.array(datas, pa.binary())})

    return (ray.data.range(n)
            .map_batches(lambda t: pa.table(
                {"chunk": t["id"]}), batch_format="pyarrow")
            .map_batches(read_chunks, batch_format="pyarrow"))
