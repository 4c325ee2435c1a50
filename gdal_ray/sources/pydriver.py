"""OGR Python-driver plugin loader (the reference's
GDAL_PYTHON_DRIVER_PATH mechanism, frmts/../gdalpythondriverloader.cpp
+ the published plugin contract in autotest/ogr/ogr_pythondrivers.py
and its template plugin).

- plugin discovery scans a directory for ``*.py`` files and parses
  the ``# gdal: KEY = <literal>`` metadata comments WITHOUT importing
  the module (exactly like the C++ pre-loader): DRIVER_NAME and a
  DRIVER_SUPPORTED_API_VERSION list containing 1 are required —
  missing metadata raises, an unsupported API version skips the file
  silently (the reference's missingmetadata / unsupportedapiversion
  fixtures);
- at open time the module is executed with an injected
  ``gdal_python_driver`` module providing BaseDriver / BaseDataset /
  BaseLayer (with the capability constants and the default
  iterate-and-count feature_count); a module without a BaseDriver
  subclass or whose driver lacks identify() errors at open like the
  nodriverclass / missingidentify fixtures;
- datasets expose layers whose reserved attributes/methods (name,
  fid_name, fields, geometry_fields, feature_count, extent,
  test_capability, __iter__) convert to engine Arrow tables: OGR
  field types map Boolean->bool, Integer16/Integer->int32,
  Integer64->int64, Real->float64, Float->float32, String->string,
  Binary->binary, Time/Date/DateTime->OGR-normalized strings
  ('2017/04/26', '2017/04/26 12:34:56.789+00'); geometry accepts WKT
  str or WKB bytes/bytearray per the plugin's GEOMFORMAT.
"""
from __future__ import annotations

import ast
import os
import re
import sys
import types

import numpy as np
import pyarrow as pa


class BaseLayer:
    RandomRead = "RandomRead"
    FastSpatialFilter = "FastSpatialFilter"
    FastFeatureCount = "FastFeatureCount"
    FastGetExtent = "FastGetExtent"
    StringsAsUTF8 = "StringsAsUTF8"

    attribute_filter = None
    spatial_filter = None
    iterator_honour_attribute_filter = False
    iterator_honour_spatial_filter = False
    feature_count_honour_attribute_filter = False
    feature_count_honour_spatial_filter = False

    def feature_count(self, force_computation=False):
        return sum(1 for _ in self)


class BaseDataset:
    pass


class BaseDriver:
    pass


def _parse_metadata(path: str) -> dict:
    md = {}
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            m = re.match(r"#\s*gdal:\s*([A-Z_0-9]+)\s*=\s*(.+)$", line)
            if m:
                try:
                    md[m.group(1)] = ast.literal_eval(m.group(2).strip())
                except (ValueError, SyntaxError):
                    md[m.group(1)] = m.group(2).strip()
    return md


class PyDriver:
    def __init__(self, path: str, metadata: dict):
        self.path = path
        self.metadata = metadata
        self.name = metadata["DRIVER_NAME"]
        self._driver = None

    def _load(self):
        if self._driver is not None:
            return self._driver
        shim = types.ModuleType("gdal_python_driver")
        shim.BaseDriver = BaseDriver
        shim.BaseDataset = BaseDataset
        shim.BaseLayer = BaseLayer
        old = sys.modules.get("gdal_python_driver")
        sys.modules["gdal_python_driver"] = shim
        try:
            mod = types.ModuleType(f"_pydriver_{self.name}")
            code = open(self.path, encoding="utf-8").read()
            exec(compile(code, self.path, "exec"), mod.__dict__)
        finally:
            if old is not None:
                sys.modules["gdal_python_driver"] = old
            else:
                sys.modules.pop("gdal_python_driver", None)
        cls = None
        for v in mod.__dict__.values():
            if (isinstance(v, type) and issubclass(v, BaseDriver)
                    and v is not BaseDriver):
                cls = v
        if cls is None:
            raise ValueError(
                f"pydriver {self.name}: cannot find class deriving "
                "from BaseDriver")
        drv = cls()
        if not hasattr(drv, "identify"):
            raise ValueError(
                f"pydriver {self.name}: driver has no identify() method")
        self._driver = drv
        return drv

    def identify(self, filename: str, first_bytes: bytes = b"") -> bool:
        return bool(self._load().identify(filename, first_bytes, 0, {}))

    def open(self, filename: str, open_options: dict | None = None,
             first_bytes: bytes = b""):
        ds = self._load().open(filename, first_bytes, 0,
                               open_options or {})
        return None if ds is None else PyDataset(ds)


class PyDriverRegistry:
    """GDAL_PYTHON_DRIVER_PATH scan; metadata parsed pre-import."""

    def __init__(self, path: str):
        self.drivers: list[PyDriver] = []
        for f in sorted(os.listdir(path)):
            if not f.endswith(".py"):
                continue
            full = os.path.join(path, f)
            md = _parse_metadata(full)
            if "DRIVER_NAME" not in md or \
                    "DRIVER_SUPPORTED_API_VERSION" not in md:
                raise ValueError(
                    f"{f}: missing # gdal: DRIVER_NAME / "
                    "DRIVER_SUPPORTED_API_VERSION metadata")
            vers = md["DRIVER_SUPPORTED_API_VERSION"]
            if 1 not in (vers if isinstance(vers, list) else [vers]):
                continue    # silently skipped like the reference
            self.drivers.append(PyDriver(full, md))

    def by_name(self, name: str) -> PyDriver | None:
        for d in self.drivers:
            if d.name == name:
                return d
        return None

    def open(self, filename: str, open_options: dict | None = None):
        for d in self.drivers:
            if d.identify(filename):
                return d.open(filename, open_options)
        return None


_FIELD_TYPES = {
    "Boolean": pa.bool_(), "Integer16": pa.int32(),
    "Integer": pa.int32(), "Integer64": pa.int64(),
    "Real": pa.float64(), "Float": pa.float32(),
    "String": pa.string(), "Binary": pa.binary(),
    "Time": pa.string(), "Date": pa.string(), "DateTime": pa.string(),
}


def _norm_temporal(val, typ):
    """OGR normalization: dates slash-separated, datetimes
    'YYYY/MM/DD HH:MM:SS[.mmm]+00' (ogr_pythondrivers.py goldens)."""
    if val is None or not isinstance(val, str):
        return val
    if typ == "Date":
        return val.replace("-", "/")
    if typ == "DateTime":
        v = val.replace("-", "/").replace("T", " ")
        if v.endswith("Z"):
            v = v[:-1] + "+00"
        return v
    return val


def _attr(obj, name, *args, default=None):
    v = getattr(obj, name, None)
    if v is None:
        return default
    return v(*args) if callable(v) else v


class PyLayer:
    def __init__(self, layer):
        self._layer = layer
        self.name = _attr(layer, "name")
        self.fid_name = _attr(layer, "fid_name", default="fid")
        self.fields = _attr(layer, "fields", default=[])
        self.geometry_fields = _attr(layer, "geometry_fields", default=[])
        self.metadata = _attr(layer, "metadata", default={}) or {}

    def feature_count(self):
        fc = getattr(self._layer, "feature_count", None)
        if fc is not None:
            return fc(False)
        return sum(1 for _ in self._layer)

    def extent(self):
        e = getattr(self._layer, "extent", None)
        return e(False) if e is not None else None

    def test_capability(self, cap):
        tc = getattr(self._layer, "test_capability", None)
        return bool(tc(cap)) if tc is not None else False

    def to_arrow(self) -> pa.Table:
        from gdal_ray.functions.wkb import geom_to_wkb, wkt_to_geom

        names = [f["name"] for f in self.fields]
        typs = [f["type"] for f in self.fields]
        cols: dict[str, list] = {n: [] for n in names}
        fids, wkbs = [], []
        for feat in self._layer:
            fids.append(feat.get("id"))
            props = feat.get("fields", {}) or {}
            for n, t in zip(names, typs):
                v = props.get(n)
                if isinstance(v, bytearray):
                    v = bytes(v)
                cols[n].append(_norm_temporal(v, t))
            gf = feat.get("geometry_fields", {}) or {}
            geom = next(iter(gf.values()), None)
            if isinstance(geom, str):
                wkbs.append(geom_to_wkb(wkt_to_geom(geom)))
            elif isinstance(geom, (bytes, bytearray)):
                wkbs.append(bytes(geom))
            else:
                wkbs.append(b"")
        arrs = {self.fid_name: pa.array(fids, pa.int64())}
        for n, t in zip(names, typs):
            arrs[n] = pa.array(cols[n], _FIELD_TYPES.get(t, pa.string()))
        arrs["geometry"] = pa.array(wkbs, pa.binary())
        return pa.table(arrs)


class PyDataset:
    def __init__(self, ds):
        self._ds = ds
        layers = _attr(ds, "layers", default=None)
        if layers is None:
            n = ds.layer_count()
            layers = [ds.layer(i) for i in range(n)]
        self.layers = [PyLayer(l) for l in layers]
        self.metadata = _attr(ds, "metadata", default={}) or {}

    def layer_count(self):
        return len(self.layers)

    def layer(self, i):
        if i < 0 or i >= len(self.layers):
            return None
        return self.layers[i]

    def close(self):
        c = getattr(self._ds, "close", None)
        if c is not None:
            c()
