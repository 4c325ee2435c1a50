"""Zarr v2 store reader/writer (the reference's Zarr driver,
frmts/zarr/zarr_v2_array.cpp — GDALMDArray over a chunked directory
store).

A v2 array is a directory holding a ``.zarray`` JSON descriptor
(shape, chunks, dtype, compressor, fill_value, order,
dimension_separator) plus one file per chunk named ``i.j.k`` (or
``i/j/k``); missing chunk files read as fill_value. ``.zattrs``
carries attributes, including the xarray ``_ARRAY_DIMENSIONS``
dimension-name convention the reference honors
(frmts/zarr/zarr_v2_array.cpp:93-105). ``.zgroup`` marks a group.

Read side returns a lazy :class:`~gdal_ray.sources.multidim.MDArray`
whose provider opens only the chunk files intersecting the requested
window — composing with slice/transpose/unscale views and
``as_classic_dataset`` (the Dataset bridge), so distributed readers
pull chunks task-side, never through the driver.

Compressors: ``null`` (raw), ``zlib``, ``gzip`` (stdlib); blosc/zstd/
lz4 are env-blocked here and raise. Filters are not supported (raise).
"""

from __future__ import annotations

import gzip
import json
import math
import os
import zlib

import numpy as np

from .multidim import MDArray


def _decompress(blob: bytes, comp: dict | None) -> bytes:
    if comp is None:
        return blob
    cid = comp.get("id")
    if cid == "zlib":
        return zlib.decompress(blob)
    if cid == "gzip":
        return gzip.decompress(blob)
    if cid == "lzma":
        import lzma

        fmt = comp.get("format", lzma.FORMAT_XZ)
        # filter chains live inside the container except FORMAT_RAW
        flt = comp.get("filters") if fmt == lzma.FORMAT_RAW else None
        return lzma.decompress(blob, format=fmt, filters=flt or None)
    raise NotImplementedError(
        f"zarr compressor {cid!r} not available in this environment "
        "(stdlib supports null/zlib/gzip)")


def _compress(raw: bytes, comp: dict | None) -> bytes:
    if comp is None:
        return raw
    cid = comp.get("id")
    level = int(comp.get("level", 6))
    if cid == "zlib":
        return zlib.compress(raw, level)
    if cid == "gzip":
        return gzip.compress(raw, compresslevel=level)
    raise NotImplementedError(f"zarr compressor {cid!r}")


def _fill_scalar(meta_fill, dtype: np.dtype):
    if meta_fill is None:
        return np.zeros((), dtype)[()]
    if isinstance(meta_fill, str):
        if meta_fill == "NaN":
            return np.float64(np.nan).astype(dtype)[()]
        if meta_fill == "Infinity":
            return np.float64(np.inf).astype(dtype)[()]
        if meta_fill == "-Infinity":
            return np.float64(-np.inf).astype(dtype)[()]
        if dtype.kind == "U":
            return np.asarray(meta_fill, dtype)[()]   # literal string
        if dtype.kind in "SV" or dtype.names:
            # v2 spec: structured / raw / bytes dtypes carry the
            # fill as base64 of the raw itemsize bytes
            import base64

            raw = base64.b64decode(meta_fill)
            return np.frombuffer(raw.ljust(dtype.itemsize, b"\0"),
                                 dtype, count=1)[0]
        try:
            return np.asarray(float(meta_fill), dtype)[()]
        except ValueError:
            raise ValueError(f"unsupported fill_value {meta_fill!r}")
    return np.asarray(meta_fill, dtype)[()]


def _np_dtype(meta_dtype) -> np.dtype:
    """.zarray dtype -> numpy: strings pass through ('!' byte order
    normalized); compound dtypes arrive as JSON lists-of-lists and
    need tuples (zarr_v2_array.cpp ParseDtype)."""
    if isinstance(meta_dtype, str):
        if meta_dtype[:1] == "!":
            meta_dtype = ("|" if np.dtype(meta_dtype[1:]).itemsize == 1
                          else ">") + meta_dtype[1:]
        return np.dtype(meta_dtype)
    return np.dtype([(f[0], _np_dtype(f[1]), *[tuple(s) for s in f[2:]])
                     for f in meta_dtype])


def _load_json(path: str):
    with open(path, "rb") as f:
        raw = f.read()
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        # the reference's json-c based parser tolerates single-quoted
        # strings (array_attrs.zarr ships '!b1'); normalize and retry
        import re

        fixed = re.sub(rb"'([^']*)'", rb'"\1"', raw)
        return json.loads(fixed)


def _apply_filters_decode(raw: bytes, filters, dtype: np.dtype):
    """Reverse the numcodecs filter pipeline (encode = filters in
    order then compressor; decode = decompress then filters reversed).
    Supported: delta, shuffle, fixedscaleoffset, quantize."""
    arr = None
    for f in reversed(filters or []):
        fid = f.get("id")
        if fid == "shuffle":
            es = int(f.get("elementsize", dtype.itemsize))
            b = raw if arr is None else arr.tobytes()
            n = len(b) // es
            raw = (np.frombuffer(b, np.uint8, n * es)
                   .reshape(es, n).T.copy().tobytes())
            arr = None
        elif fid == "delta":
            enc_dt = np.dtype(f.get("astype") or f.get("dtype") or dtype)
            a = np.frombuffer(raw, enc_dt) if arr is None else arr
            arr = np.cumsum(a, dtype=np.dtype(f.get("dtype") or dtype))
        elif fid == "fixedscaleoffset":
            enc_dt = np.dtype(f.get("astype") or "u1")
            a = np.frombuffer(raw, enc_dt) if arr is None else arr
            arr = (a / f["scale"] + f["offset"]).astype(
                np.dtype(f.get("dtype") or dtype))
        elif fid == "quantize":
            # lossy at encode time; stored as astype, read back as dtype
            dt = np.dtype(f.get("dtype") or dtype)
            enc_dt = np.dtype(f.get("astype") or dt)
            a = np.frombuffer(raw, enc_dt) if arr is None else arr
            arr = a.astype(dt)
        else:
            raise NotImplementedError(f"zarr filter {fid!r}")
    if arr is None:
        return np.frombuffer(raw, dtype)
    return arr.astype(dtype, copy=False)


def _chunk_name(idx: tuple[int, ...], sep: str) -> str:
    # 0-d arrays store their lone chunk as "0" (v2 spec)
    return sep.join(str(i) for i in idx) if idx else "0"


def read_zarr_array(path: str, name: str | None = None) -> MDArray:
    """Open a Zarr v2 array directory as a lazy MDArray."""
    meta = _load_json(os.path.join(path, ".zarray"))
    if meta.get("zarr_format") != 2:
        raise NotImplementedError(
            f"zarr_format {meta.get('zarr_format')} (only v2 supported)")
    filters = meta.get("filters")
    order = meta.get("order", "C")
    if order not in ("C", "F"):
        raise ValueError(f"bad chunk order {order!r}")
    shape = tuple(int(n) for n in meta["shape"])
    chunks = tuple(int(n) for n in meta["chunks"])
    if len(chunks) != len(shape):
        raise ValueError("chunks/shape rank mismatch")
    dtype = _np_dtype(meta["dtype"])
    comp = meta.get("compressor")
    sep = meta.get("dimension_separator", ".")
    fill = _fill_scalar(meta.get("fill_value"), dtype)

    attrs: dict = {}
    zattrs = os.path.join(path, ".zattrs")
    if os.path.exists(zattrs):
        attrs = _load_json(zattrs)
    dims = tuple(attrs.get("_ARRAY_DIMENSIONS",
                           [f"dim_{i}" for i in range(len(shape))]))
    # CF scale/offset map onto MDArray.unscaled defaults
    if "scale_factor" in attrs:
        attrs.setdefault("scale", float(attrs["scale_factor"]))
    if "add_offset" in attrs:
        attrs.setdefault("offset", float(attrs["add_offset"]))

    def provider(origin, want):
        out = np.full(tuple(want), fill, dtype)
        lo = [o // c for o, c in zip(origin, chunks)]
        hi = [(o + s - 1) // c for o, s, c in zip(origin, want, chunks)]
        # enumerate the chunk-index hyper-rectangle
        def rec(d, cur, acc):
            if d == len(shape):
                acc.append(tuple(cur))
                return
            for k in range(lo[d], hi[d] + 1):
                cur.append(k)
                rec(d + 1, cur, acc)
                cur.pop()
        acc: list[tuple[int, ...]] = []
        rec(0, [], acc)
        for cidx in acc:
            fp = os.path.join(path, _chunk_name(cidx, sep))
            cstart = [k * c for k, c in zip(cidx, chunks)]
            src_sl, dst_sl = [], []
            for d in range(len(shape)):
                a = max(origin[d], cstart[d])
                b = min(origin[d] + want[d], cstart[d] + chunks[d])
                src_sl.append(slice(a - cstart[d], b - cstart[d]))
                dst_sl.append(slice(a - origin[d], b - origin[d]))
            if not os.path.exists(fp):
                continue  # missing chunk == fill_value (already in out)
            with open(fp, "rb") as f:
                raw = _decompress(f.read(), comp)
            block = _apply_filters_decode(raw, filters, dtype).reshape(
                chunks, order=order)
            out[tuple(dst_sl)] = block[tuple(src_sl)]
        return out

    return MDArray(name or os.path.basename(path.rstrip("/")) or "zarr",
                   dims, shape, provider, attrs)


def open_zarr(path: str) -> dict[str, MDArray]:
    """Open a Zarr v2 store (array OR group) -> {path/name: MDArray}.
    Groups (.zgroup, incl. NCZarr v2 stores and consolidated
    .zmetadata) are walked recursively for array directories — the
    reference's ZarrV2Group::Open* traversal."""
    if os.path.exists(os.path.join(path, ".zarray")):
        return {os.path.basename(path.rstrip("/")): read_zarr_array(path)}
    out: dict[str, MDArray] = {}

    def walk(d: str, prefix: str):
        for name in sorted(os.listdir(d)):
            sub = os.path.join(d, name)
            if not os.path.isdir(sub):
                continue
            rel = f"{prefix}/{name}" if prefix else name
            if os.path.exists(os.path.join(sub, ".zarray")):
                out[rel] = read_zarr_array(sub, name=rel)
            else:
                walk(sub, rel)

    walk(path, "")
    if not out:
        raise ValueError(f"no zarr arrays under {path}")
    return out


def write_zarr_array(path: str, arr: np.ndarray, *,
                     chunks: tuple[int, ...] | None = None,
                     compressor: dict | None = {"id": "zlib", "level": 6},
                     dims: tuple[str, ...] | None = None,
                     attrs: dict | None = None,
                     fill_value=0,
                     dimension_separator: str = ".") -> None:
    """Write a numpy array as a Zarr v2 store (driver-side; for
    distributed chunk writes see :func:`write_zarr_from_dataset`)."""
    arr = np.asarray(arr)
    chunks = tuple(chunks or arr.shape)
    os.makedirs(path, exist_ok=True)
    write_zarr_meta(path, arr.shape, arr.dtype, chunks,
                    compressor=compressor, dims=dims, attrs=attrs,
                    fill_value=fill_value,
                    dimension_separator=dimension_separator)
    n_chunks = [math.ceil(n / c) for n, c in zip(arr.shape, chunks)]
    def rec(d, cur):
        if d == arr.ndim:
            write_zarr_chunk(path, tuple(cur), _chunk_block(arr, cur, chunks),
                             chunks, compressor=compressor,
                             fill_value=fill_value,
                             dimension_separator=dimension_separator)
            return
        for k in range(n_chunks[d]):
            cur.append(k)
            rec(d + 1, cur)
            cur.pop()
    rec(0, [])


def _chunk_block(arr: np.ndarray, cidx, chunks) -> np.ndarray:
    sl = tuple(slice(k * c, min((k + 1) * c, n))
               for k, c, n in zip(cidx, chunks, arr.shape))
    return arr[sl]


def write_zarr_meta(path: str, shape, dtype, chunks, *,
                    compressor: dict | None = {"id": "zlib", "level": 6},
                    dims=None, attrs=None, fill_value=0,
                    dimension_separator: str = ".") -> None:
    """Write .zarray/.zattrs only (driver side of a distributed write)."""
    dtype = np.dtype(dtype)
    os.makedirs(path, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(int(n) for n in shape),
        "chunks": list(int(c) for c in chunks),
        "dtype": dtype.str,
        "compressor": compressor,
        "fill_value": (None if fill_value is None else
                       ("NaN" if isinstance(fill_value, float)
                        and math.isnan(fill_value) else fill_value)),
        "filters": None,
        "order": "C",
    }
    if dimension_separator != ".":
        meta["dimension_separator"] = dimension_separator
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f)
    a = dict(attrs or {})
    if dims is not None:
        a["_ARRAY_DIMENSIONS"] = list(dims)
    if a:
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(a, f)


def write_zarr_chunk(path: str, cidx: tuple[int, ...], block: np.ndarray,
                     chunks: tuple[int, ...], *,
                     compressor: dict | None = {"id": "zlib", "level": 6},
                     fill_value=0,
                     dimension_separator: str = ".") -> None:
    """Write one chunk file (callable from any worker task — the
    distributed sink path). Partial edge blocks are padded with
    fill_value to the full chunk size, per the v2 spec."""
    block = np.asarray(block)
    if tuple(block.shape) != tuple(chunks):
        full = np.full(tuple(chunks),
                       _fill_scalar(fill_value, block.dtype), block.dtype)
        full[tuple(slice(0, s) for s in block.shape)] = block
        block = full
    raw = np.ascontiguousarray(block).tobytes()
    fp = os.path.join(path, _chunk_name(cidx, dimension_separator))
    os.makedirs(os.path.dirname(fp) or path, exist_ok=True)
    with open(fp, "wb") as f:
        f.write(_compress(raw, compressor))


def write_zarr_from_dataset(ds, path: str, *, shape: tuple[int, int],
                            dtype, tile: int,
                            compressor: dict | None = {"id": "zlib",
                                                       "level": 6},
                            dims=None, attrs=None, fill_value=0) -> int:
    """Distributed 2-D Zarr sink: a Dataset of classic tile rows
    (ty, tx, h, w, pixels float64 bytes — the as_classic_dataset
    schema) writes each tile as the chunk file it maps to, task-side
    (tile grid == chunk grid, so no shuffle). Returns tiles written."""
    import pyarrow as pa

    write_zarr_meta(path, shape, dtype, (tile, tile), compressor=compressor,
                    dims=dims, attrs=attrs, fill_value=fill_value)
    np_dtype = np.dtype(dtype)

    def sink(t: pa.Table) -> pa.Table:
        n = 0
        for r in t.to_pylist():
            px = np.frombuffer(r["pixels"], np.float64).reshape(
                -1, r["h"], r["w"])[0].astype(np_dtype)
            write_zarr_chunk(path, (r["ty"] // tile, r["tx"] // tile), px,
                             (tile, tile), compressor=compressor,
                             fill_value=fill_value)
            n += 1
        return pa.table({"written": pa.array([n], pa.int64())})

    out = ds.map_batches(sink, batch_format="pyarrow")
    total = 0
    for b in out.iter_batches(batch_size=None, batch_format="pyarrow"):
        total += int(np.sum(b["written"].to_numpy()))
    return total
