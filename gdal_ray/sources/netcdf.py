"""Classic netCDF (CDF-1/2/5) reader + CDF-1 writer (reference
frmts/netcdf/ — the classic binary format is fully specified by the
NetCDF "classic format spec"; the reference's driver reads the same
dims/vars/attrs model into GDALMDArray, with 2-D variables exposed as
rasters, bottom-up y flipped when the y coordinate ascends).

Format: big-endian; header = magic ('CDF' 01|02|05) + numrecs +
dim_list + gatt_list + var_list; names and attribute payloads padded
to 4 bytes; fixed variables live at their 'begin' offsets row-major,
record variables interleave one record slab per unlimited-dim index.
CDF-2 widens 'begin' to 8 bytes; CDF-5 also widens counts.

Variables surface as lazy :class:`~gdal_ray.sources.multidim.MDArray`
providers — a window read touches only the needed byte ranges, and
the classic-dataset bridge fans tiles out through Ray tasks like the
Zarr store.
"""

from __future__ import annotations

import struct

import numpy as np

from .multidim import MDArray

_NC_TYPES = {1: ("i1", 1), 2: ("S1", 1), 3: (">i2", 2), 4: (">i4", 4),
             5: (">f4", 4), 6: (">f8", 8), 10: (">i8", 8),
             7: ("u1", 1), 8: (">u2", 2), 9: (">u4", 4), 11: (">u8", 8)}


class _R:
    def __init__(self, data: bytes, wide_count: bool):
        self.d = data
        self.p = 4
        self.wc = wide_count

    def u4(self) -> int:
        v = struct.unpack(">I", self.d[self.p:self.p + 4])[0]
        self.p += 4
        return v

    def u8(self) -> int:
        v = struct.unpack(">Q", self.d[self.p:self.p + 8])[0]
        self.p += 8
        return v

    def count(self) -> int:
        return self.u8() if self.wc else self.u4()

    def name(self) -> str:
        n = self.count()
        s = self.d[self.p:self.p + n].decode("utf-8")
        self.p += n + (-n) % 4
        return s

    def values(self, nc_type: int, n: int):
        dt, sz = _NC_TYPES[nc_type]
        raw = self.d[self.p:self.p + n * sz]
        self.p += n * sz + (-(n * sz)) % 4
        if nc_type == 2:
            return raw.decode("utf-8", "replace")
        return np.frombuffer(raw, dt).tolist()


def parse_nc_header(data: bytes) -> dict:
    if data[:3] != b"CDF" or data[3] not in (1, 2, 5):
        raise ValueError("not a classic netCDF file")
    version = data[3]
    r = _R(data, wide_count=(version == 5))
    numrecs = r.count() if version != 5 else r.u8()
    if version == 5 and False:
        pass

    def tagged_list(expect_tag):
        tag = r.u4()
        n = r.count()
        if tag == 0 and n == 0:
            return 0
        if tag != expect_tag:
            raise ValueError(f"bad list tag {tag} (want {expect_tag})")
        return n

    dims = []
    for _ in range(tagged_list(0x0A)):
        dims.append((r.name(), r.count()))

    def attrs():
        out = {}
        for _ in range(tagged_list(0x0C)):
            nm = r.name()
            t = r.u4()
            n = r.count()
            v = r.values(t, n)
            out[nm] = v if (isinstance(v, str) or len(v) != 1) else v[0]
        return out

    gatts = attrs()
    variables = []
    for _ in range(tagged_list(0x0B)):
        nm = r.name()
        ndims = r.count()
        dimids = [r.count() for _ in range(ndims)]
        vatts = attrs()
        t = r.u4()
        _vsize = r.count()
        begin = r.u8() if version in (2, 5) else r.u4()
        variables.append({"name": nm, "dimids": dimids, "attrs": vatts,
                          "type": t, "begin": begin})
    # record layout: the unlimited dim is the one with size 0
    rec_dim = next((i for i, (_, sz) in enumerate(dims) if sz == 0), None)
    rec_size = 0
    for v in variables:
        dt, sz = _NC_TYPES[v["type"]]
        shape = [dims[i][1] for i in v["dimids"]]
        v["is_record"] = bool(v["dimids"]) and v["dimids"][0] == rec_dim
        inner = shape[1:] if v["is_record"] else shape
        n = int(np.prod(inner)) if inner else 1
        v["slab"] = n * sz
        if v["is_record"]:
            rec_size += v["slab"] + ((-v["slab"]) % 4)
    n_rec_vars = sum(v["is_record"] for v in variables)
    if n_rec_vars == 1:  # single record var: no padding (spec special case)
        for v in variables:
            if v["is_record"]:
                rec_size = v["slab"]
    return {"version": version, "numrecs": numrecs, "dims": dims,
            "attrs": gatts, "vars": variables, "rec_size": rec_size}


def nc_variable(data: bytes, name: str) -> MDArray:
    """One variable as a lazy MDArray (byte-range window reads);
    netCDF-4 goes through the HDF5 reader."""
    if _is_nc4(data):
        return _nc4_variable(data, name)
    hdr = parse_nc_header(data)
    v = next((x for x in hdr["vars"] if x["name"] == name), None)
    if v is None:
        raise KeyError(name)
    dims = hdr["dims"]
    dim_names = tuple(dims[i][0] for i in v["dimids"])
    shape = tuple(hdr["numrecs"] if dims[i][1] == 0 else dims[i][1]
                  for i in v["dimids"])
    dt, isz = _NC_TYPES[v["type"]]
    if v["type"] == 2:
        raise NotImplementedError("char variables are not rasters")
    begin = v["begin"]
    rec = v["is_record"]
    rec_size = hdr["rec_size"]

    def provider(origin, want):
        if not shape:
            return np.frombuffer(data[begin:begin + isz], dt).reshape(())
        if rec:
            inner = shape[1:]
            out = np.empty(want, np.dtype(dt).newbyteorder("="))
            for k in range(want[0]):
                t = origin[0] + k
                base = begin + t * rec_size
                slab = np.frombuffer(
                    data[base:base + v["slab"]], dt).reshape(inner)
                sl = tuple(slice(o, o + s)
                           for o, s in zip(origin[1:], want[1:]))
                out[k] = slab[sl]
            return out
        arr = np.frombuffer(
            data[begin:begin + int(np.prod(shape)) * isz], dt).reshape(shape)
        sl = tuple(slice(o, o + s) for o, s in zip(origin, want))
        return np.ascontiguousarray(arr[sl]).astype(
            np.dtype(dt).newbyteorder("="))

    attrs = dict(v["attrs"])
    if "scale_factor" in attrs:
        attrs.setdefault("scale", float(attrs["scale_factor"]))
    if "add_offset" in attrs:
        attrs.setdefault("offset", float(attrs["add_offset"]))
    return MDArray(name, dim_names, shape, provider, attrs)


_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


def _is_nc4(data: bytes) -> bool:
    return data[:8] == _HDF5_MAGIC


def _nc4_datasets(data: bytes):
    from .hdf5 import HDF5File

    f = HDF5File(data)
    out = []
    for ds in f.root.walk_datasets():
        if ds.name.startswith("_nc"):
            continue    # netCDF-4 internal bookkeeping
        out.append(ds)
    return out


def nc_list_variables(data: bytes) -> list[str]:
    """Classic CDF-1/2/5 header walk; netCDF-4 (HDF5 container)
    delegates to the engine's pure-Python HDF5 reader (the reference
    routes both through libnetcdf; frmts/netcdf identifies NC4 by the
    HDF5 signature)."""
    if _is_nc4(data):
        return [ds.path.strip("/") for ds in _nc4_datasets(data)]
    return [v["name"] for v in parse_nc_header(data)["vars"]]


def _nc4_variable(data: bytes, name: str) -> MDArray:
    from .hdf5 import HDF5File

    f = HDF5File(data)
    ds = f.root[name]
    arr = ds.read()

    def provider(origin, want):
        sl = tuple(slice(o, o + s) for o, s in zip(origin, want))
        return np.ascontiguousarray(arr[sl])

    attrs = dict(ds.attrs or {})
    if "scale_factor" in attrs:
        attrs.setdefault("scale", float(attrs["scale_factor"]))
    if "add_offset" in attrs:
        attrs.setdefault("offset", float(attrs["add_offset"]))
    dim_names = tuple(f"dim{i}" for i in range(len(arr.shape)))
    return MDArray(name.split("/")[-1], dim_names, tuple(arr.shape),
                   provider, attrs)


def _byte_is_signed(attrs: dict) -> bool:
    """NC_BYTE surfaces as GDT_Byte (unsigned) unless the variable
    carries a signedness hint (frmts/netcdf netCDFRasterBand ctor:
    _Unsigned=="false", or a negative valid_range/valid_min)."""
    u = attrs.get("_Unsigned")
    if isinstance(u, str):
        return u.lower() == "false"
    for key in ("valid_range", "valid_min"):
        v = attrs.get(key)
        if v is not None:
            vals = v if isinstance(v, list) else [v]
            if any(float(x) < 0 for x in vals):
                return True
    return False


def raster_from_nc(data: bytes, var: str | None = None, band: int = 1):
    """Variable -> (array, gt | None) with the driver's bottom-up
    flip: netCDF rasters store south-up when the y coordinate
    ascends (frmts/netcdf netCDFDataset::SetProjectionFromVar /
    bBottomUp default). Variables with extra leading dims (time,
    level) expose each leading index as a band; ``band`` is the
    1-based flattened leading index, matching the driver's band
    numbering."""
    hdr = parse_nc_header(data)
    names = {v["name"] for v in hdr["vars"]}
    dim_names = {d for d, _ in hdr["dims"]}
    if var is None:
        cands = [v for v in hdr["vars"]
                 if len(v["dimids"]) >= 2 and v["type"] != 2
                 and v["name"] not in dim_names]
        if not cands:
            raise ValueError("no raster variable found")
        var = max(cands, key=lambda v: len(v["dimids"]))["name"]
    md = nc_variable(data, var)
    if len(md.shape) < 2:
        raise ValueError(f"{var} is not a raster variable")
    lead = md.shape[:-2]
    nbands = int(np.prod(lead)) if lead else 1
    if not 1 <= band <= nbands:
        raise IndexError(f"band {band} out of range 1..{nbands}")
    if lead:
        idx = np.unravel_index(band - 1, lead)
        origin = tuple(int(i) for i in idx) + (0, 0)
        want = (1,) * len(lead) + md.shape[-2:]
        arr = md.read(origin, want).reshape(md.shape[-2:])
    else:
        arr = md.read()
    vmeta = next(v for v in hdr["vars"] if v["name"] == var)
    if vmeta["type"] == 1 and not _byte_is_signed(vmeta["attrs"]):
        arr = arr.view(np.uint8)
    ydim, xdim = md.dims[-2:]
    gt = None
    flip = True  # netCDF default is bottom-up
    if ydim in names:
        y = nc_variable(data, ydim).read()
        flip = bool(len(y) > 1 and y[1] > y[0])
        if xdim in names and len(y) > 1:
            x = nc_variable(data, xdim).read()
            dx = float(x[1] - x[0]) if len(x) > 1 else 1.0
            dy = float(y[1] - y[0])
            ys = y[::-1] if flip else y
            dyo = -abs(dy)
            gt = (float(x[0]) - dx / 2.0, dx, 0.0,
                  float(ys[0]) - dyo / 2.0, 0.0, dyo)
    if flip:
        arr = arr[::-1]
    return arr, gt


# ------------------------------------------------------------------ writer

def _pad(b: bytes) -> bytes:
    return b + b"\0" * ((-len(b)) % 4)


def _w_name(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack(">I", len(b)) + _pad(b)


_W_TYPES = {np.dtype("i1"): 1, np.dtype("i2"): 3, np.dtype("i4"): 4,
            np.dtype("f4"): 5, np.dtype("f8"): 6, np.dtype("u1"): 1}


def write_nc_classic(variables: dict[str, tuple[tuple[str, ...], np.ndarray]],
                     dims: dict[str, int] | None = None,
                     attrs: dict | None = None) -> bytes:
    """CDF-1 writer for fixed-size variables.

    ``variables``: {name: (dim_names, array)}; dims are inferred from
    the arrays when not given. Returns the file bytes."""
    dims = dict(dims or {})
    for name, (dnames, arr) in variables.items():
        arr = np.asarray(arr)
        for d, n in zip(dnames, arr.shape):
            if dims.setdefault(d, n) != n:
                raise ValueError(f"dim {d} size conflict")
    dim_ids = {d: i for i, d in enumerate(dims)}

    def w_attrs(a: dict) -> bytes:
        if not a:
            return struct.pack(">II", 0, 0)
        out = struct.pack(">II", 0x0C, len(a))
        for k, v in a.items():
            out += _w_name(k)
            if isinstance(v, str):
                b = v.encode("utf-8")
                out += struct.pack(">II", 2, len(b)) + _pad(b)
            else:
                vals = np.atleast_1d(np.asarray(v, np.float64))
                out += struct.pack(">II", 6, len(vals)) + _pad(
                    vals.astype(">f8").tobytes())
        return out

    hdr = b"CDF\x01" + struct.pack(">I", 0)
    hdr += struct.pack(">II", 0x0A, len(dims))
    for d, n in dims.items():
        hdr += _w_name(d) + struct.pack(">I", n)
    hdr += w_attrs(attrs or {})

    # variable headers need data offsets: two passes
    var_items = []
    for name, (dnames, arr) in variables.items():
        arr = np.asarray(arr)
        t = _W_TYPES.get(arr.dtype.newbyteorder("="))
        if t is None:
            raise NotImplementedError(f"nc type for {arr.dtype}")
        dt, _ = _NC_TYPES[t]
        payload = _pad(arr.astype(dt).tobytes())
        var_items.append((name, dnames, t, payload, arr.ndim))

    def var_block(begin_map):
        out = struct.pack(">II", 0x0B, len(var_items))
        for (name, dnames, t, payload, _nd) in var_items:
            out += _w_name(name) + struct.pack(">I", len(dnames))
            for d in dnames:
                out += struct.pack(">I", dim_ids[d])
            out += w_attrs({})
            out += struct.pack(">III", t, len(payload),
                               begin_map.get(name, 0))
        return out

    base = len(hdr) + len(var_block({}))
    begin_map = {}
    pos = base
    for (name, _d, _t, payload, _nd) in var_items:
        begin_map[name] = pos
        pos += len(payload)
    out = hdr + var_block(begin_map)
    for (_n, _d, _t, payload, _nd) in var_items:
        out += payload
    return out
