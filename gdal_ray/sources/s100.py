"""S-100 family IHO product readers on the pure-Python HDF5 core:
S-102 bathymetry, S-104 water level, S-111 surface currents.

Semantics match the reference drivers (frmts/hdf5/s100.cpp,
s102dataset.cpp, s104dataset.cpp, s111dataset.cpp; conformance
autotest/gdrivers/s102.py / s104.py / s111.py):

- geotransform from the coverage instance group's gridOrigin*/
  gridSpacing*/numPoints* attributes, shifted from pixel-center to
  pixel-corner convention and row-flipped when north-up
  (s100.cpp S100GetGeoTransform, lines 234-268);
- per-component nodata / unit from the /Group_F feature-information
  table's fillValue / uom.name columns (hdf5multidim.cpp:1008-1226);
- vertical datum code -> (meaning, abbreviation) per the
  S100_VerticalAndSoundingDatum table (s100.cpp:334-372);
- root metadata = every root string attribute except the CRS/extent
  bookkeeping names (s100.cpp S100ReadMetadata:445-460), plus
  AREA_OR_POINT=Point;
- S102: depth/uncertainty bands, DEPTH_OR_ELEVATION=ELEVATION negates
  depth (GetUnscaled(-1,0,nodata)), min/max from Group_001 attributes
  unless equal to nodata; QualityOfSurvey / QualityOfBathymetryCoverage
  subdatasets expose the uint32 id grid plus a RAT decoded from the
  quality group's featureAttributeTable (s102dataset.cpp:480-615);
- S104: waterLevelHeight/waterLevelTrend bands per timestamp group,
  fixed water-level-trend RAT (s104dataset.cpp:355-385);
- S111: surfaceCurrentSpeed (knots) / surfaceCurrentDirection (degree)
  bands per timestamp group (s111dataset.cpp:311-365).
"""
from __future__ import annotations

import os
import re

import numpy as np

from .hdf5 import H5Dataset, open_hdf5

# s100.cpp:334-372 (S-100 5.0.0 Table S100_VerticalAndSoundingDatum)
VERTICAL_DATUMS = {
    1: ("meanLowWaterSprings", "MLWS"),
    2: ("meanLowerLowWaterSprings", None),
    3: ("meanSeaLevel", "MSL"),
    4: ("lowestLowWater", None),
    5: ("meanLowWater", "MLW"),
    6: ("lowestLowWaterSprings", None),
    7: ("approximateMeanLowWaterSprings", None),
    8: ("indianSpringLowWater", None),
    9: ("lowWaterSprings", None),
    10: ("approximateLowestAstronomicalTide", None),
    11: ("nearlyLowestLowWater", None),
    12: ("meanLowerLowWater", "MLLW"),
    13: ("lowWater", "LW"),
    14: ("approximateMeanLowWater", None),
    15: ("approximateMeanLowerLowWater", None),
    16: ("meanHighWater", "MHW"),
    17: ("meanHighWaterSprings", "MHWS"),
    18: ("highWater", "HW"),
    19: ("approximateMeanSeaLevel", None),
    20: ("highWaterSprings", None),
    21: ("meanHigherHighWater", "MHHW"),
    22: ("equinoctialSpringLowWater", None),
    23: ("lowestAstronomicalTide", "LAT"),
    24: ("localDatum", None),
    25: ("internationalGreatLakesDatum1985", None),
    26: ("meanWaterLevel", None),
    27: ("lowerLowWaterLargeTide", None),
    28: ("higherHighWaterLargeTide", None),
    29: ("nearlyHighestHighWater", None),
    30: ("highestAstronomicalTide", "HAT"),
}

# s100.cpp S100ReadMetadata skip list (:445-455) + the "metadata"
# attribute which becomes the ISO metadata sidecar file reference
_META_SKIP = {
    "horizontalCRS", "horizontalDatumReference", "horizontalDatumValue",
    "productSpecification", "eastBoundLongitude", "northBoundLatitude",
    "southBoundLatitude", "westBoundLongitude", "extentTypeCode",
    "verticalCS", "verticalCoordinateBase", "verticalDatumReference",
    "verticalDatum", "metadata",
}


def _s(v) -> str:
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, (float, np.floating)):
        return str(int(v)) if float(v) == int(v) else str(float(v))
    return str(v)


def s100_product(path: str) -> str | None:
    """Identify the product family from productSpecification."""
    try:
        root = open_hdf5(path)
    except Exception:
        return None
    spec = _s(root.attrs.get("productSpecification", ""))
    for code in ("S-102", "S-104", "S-111"):
        if code in spec:
            return code.replace("-", "")
    return None


def _root_metadata(root, path: str) -> tuple[dict, str | None]:
    md = {"AREA_OR_POINT": "Point"}
    meta_file = None
    for name, val in root.attrs.items():
        if name == "metadata":
            v = _s(val)
            if v:
                cand = os.path.join(os.path.dirname(path), v)
                if os.path.exists(cand):
                    meta_file = cand
                elif v.startswith("MD_"):
                    cand = os.path.join(os.path.dirname(path), v[3:])
                    if os.path.exists(cand):
                        meta_file = cand
        elif name not in _META_SKIP:
            v = _s(val)
            if v:
                md[name] = v
    vd = root.attrs.get("verticalDatum")
    if vd is not None:
        try:
            meaning, abbrev = VERTICAL_DATUMS[int(_s(vd))]
            md["VERTICAL_DATUM_MEANING"] = meaning
            if abbrev:
                md["VERTICAL_DATUM_ABBREV"] = abbrev
        except (KeyError, ValueError):
            md["verticalDatum"] = _s(vd)
    return md, meta_file


def _geotransform(inst, north_up: bool):
    """s100.cpp S100GetGeoTransform: center->corner shift + N-up flip."""
    ox = float(inst.attrs["gridOriginLongitude"])
    oy = float(inst.attrs["gridOriginLatitude"])
    sx = float(inst.attrs["gridSpacingLongitudinal"])
    sy = float(inst.attrs["gridSpacingLatitudinal"])
    nx = int(inst.attrs["numPointsLongitudinal"])
    ny = int(inst.attrs["numPointsLatitudinal"])
    gt0 = ox
    gt3 = oy + (sy * (ny - 1) if north_up else 0.0)
    gt1 = sx
    gt5 = -sy if north_up else sy
    gt0 -= gt1 / 2
    gt3 -= gt5 / 2
    return (gt0, gt1, 0.0, gt3, 0.0, gt5), nx, ny


def _group_f(root, feature: str) -> dict[str, dict]:
    """Per-component fillValue/uom from /Group_F/<feature>
    (hdf5multidim.cpp fillValue lookup)."""
    out = {}
    gf = root.children.get("Group_F")
    if gf is None:
        return out
    ds = gf.children.get(feature)
    if not isinstance(ds, H5Dataset):
        return out
    rec = ds.read()
    names = rec.dtype.names or ()
    for row in rec:
        code = _s(row["code"]).strip()
        info = {}
        if "fillValue" in names:
            fv = _s(row["fillValue"]).strip()
            try:
                info["fill"] = float(fv)
            except ValueError:
                pass
        if "uom.name" in names:
            info["uom"] = _s(row["uom.name"]).strip()
        out[code] = info
    return out


def _gf_lookup(fills: dict[str, dict], component: str) -> dict:
    """Exact code match, else width-truncated-prefix match (fixed-width
    S16/S20 strings in Group_F truncate long component names)."""
    if component in fills:
        return fills[component]
    for code, info in fills.items():
        if code and component.startswith(code):
            return info
    return {}


def _first_group(parent, prefix: str):
    for name, child in parent.children.items():
        if name.startswith(prefix) and not isinstance(child, H5Dataset):
            return name, child
    raise ValueError(f"Cannot find group {prefix}.01")


def _rat_from_table(ds: H5Dataset) -> dict:
    """s102dataset.cpp HDF5CreateRAT: compound 1-D table -> RAT."""
    rec = ds.read()
    cols = []
    for name in rec.dtype.names:
        kind = rec.dtype[name].kind
        if kind in "iu":
            typ, vals = "int", [int(v) for v in rec[name]]
        elif kind == "f":
            typ, vals = "real", [float(v) for v in rec[name]]
        else:
            typ, vals = "str", [_s(v) for v in rec[name]]
        cols.append({"name": name, "type": typ, "values": vals})
    return {"columns": cols, "rows": len(rec)}


_SUBDS_RE = re.compile(r'^S1(02|04|11):"([^"]+)":(.+)$')


def read_s100(path: str, subdataset: str | None = None,
              north_up: bool = True,
              depth_or_elevation: str = "DEPTH") -> dict:
    """Open an S-102/S-104/S-111 product (or one of its subdatasets,
    by S1xx:"file":component name)."""
    m = _SUBDS_RE.match(path)
    if m:
        path, subdataset = m.group(2), m.group(3)
    root = open_hdf5(path)
    product = s100_product(path)
    if product is None:
        raise ValueError(f"{path}: not an S-100 product")
    md, meta_file = _root_metadata(root, path)
    epsg = int(_s(root.attrs.get("horizontalDatumValue", "4326")))
    out = {"driver": product, "metadata": md, "epsg": epsg,
           "metadata_file": meta_file, "subdatasets": [], "bands": []}

    if product == "S102":
        _read_s102(root, path, subdataset, north_up,
                   depth_or_elevation, out)
    else:
        feature = ("WaterLevel" if product == "S104"
                   else "SurfaceCurrent")
        _read_s1xx_timeseries(root, path, subdataset, north_up,
                              feature, product, out)
    if out["bands"]:  # open_raster-style pixels convenience view
        arrs = [b["data"] for b in out["bands"]]
        out["pixels"] = (arrs[0] if len(arrs) == 1 else np.stack(
            [a.astype(np.result_type(*arrs)) for a in arrs], axis=-1))
        out["nodata"] = out["bands"][0]["nodata"]
    return out


def _read_s102(root, path, subdataset, north_up, depth_or_elevation,
               out):
    quality_name = next(
        (n for n in ("QualityOfSurvey", "QualityOfBathymetryCoverage")
         if n in root.children), None)
    if subdataset and subdataset not in (
            "BathymetryCoverage", "QualityOfSurvey",
            "QualityOfBathymetryCoverage"):
        raise ValueError("Unsupported subdataset component")
    if subdataset in ("QualityOfSurvey", "QualityOfBathymetryCoverage"):
        if subdataset not in root.children:
            raise ValueError(f"Cannot find group /{subdataset}")
        _read_s102_quality(root, subdataset, north_up, out)
        return
    if subdataset is None and quality_name:
        out["subdatasets"] = [
            (f'S102:"{path}":BathymetryCoverage',
             "Bathymetric gridded data"),
            (f'S102:"{path}":{quality_name}',
             f"Georeferenced metadata {quality_name}"),
        ]

    bathy = root.children["BathymetryCoverage"]
    _, inst = _first_group(bathy, "BathymetryCoverage.")
    gt, nx, ny = _geotransform(inst, north_up)
    out.update(gt=gt, width=nx, height=ny)
    g1 = inst.children["Group_001"]
    values = g1.read() if isinstance(g1, H5Dataset) \
        else g1.children["values"].read()
    fills = _group_f(root, "BathymetryCoverage")

    elevation = depth_or_elevation.upper() == "ELEVATION"
    depth = values["depth"].astype(np.float32)
    nod = _gf_lookup(fills, "depth").get("fill", 1e6)
    if north_up:
        depth = depth[::-1]
    band = {"description": "elevation" if elevation else "depth",
            "nodata": nod, "unit": "metre"}
    vmin = g1.attrs.get("minimumDepth")
    vmax = g1.attrs.get("maximumDepth")
    if elevation:
        valid = depth != nod
        depth = np.where(valid, -depth, depth).astype(np.float32)
        vmin, vmax = (None if vmax is None else -float(vmax),
                      None if vmin is None else -float(vmin))
    if vmin is not None and float(vmin) != nod:
        band["min"] = float(vmin)
    if vmax is not None and float(vmax) != nod:
        band["max"] = float(vmax)
    band["data"] = depth
    out["bands"].append(band)

    if "uncertainty" in (values.dtype.names or ()):
        unc = values["uncertainty"].astype(np.float32)
        if north_up:
            unc = unc[::-1]
        nod_u = _gf_lookup(fills, "uncertainty").get("fill", 1e6)
        band = {"description": "uncertainty", "nodata": nod_u,
                "unit": "metre", "data": unc}
        for key, attr in (("min", "minimumUncertainty"),
                          ("max", "maximumUncertainty")):
            v = g1.attrs.get(attr)
            if v is not None and float(v) != nod_u:
                band[key] = float(v)
        out["bands"].append(band)


def _read_s102_quality(root, quality_name, north_up, out):
    grp = root.children[quality_name]
    _, inst = _first_group(grp, quality_name + ".")
    gt, nx, ny = _geotransform(inst, north_up)
    out.update(gt=gt, width=nx, height=ny)
    values = inst.children["Group_001"].children["values"].read()
    if values.dtype.names:  # non-conformant single-component compound
        values = values[values.dtype.names[0]]
    values = values.astype(np.uint32)
    if north_up:
        values = values[::-1]
    fat = grp.children.get("featureAttributeTable")
    if fat is None:
        raise ValueError(
            f"Cannot find array /{quality_name}/featureAttributeTable")
    fills = _group_f(root, quality_name)
    nod = fills.get("id", {}).get("fill")
    if nod is None:
        nod = next((i["fill"] for i in fills.values() if "fill" in i),
                   0.0)
    out["bands"].append({"description": "id", "nodata": nod,
                         "data": values,
                         "rat": _rat_from_table(fat)})


# s104dataset.cpp:355-385 — D-5.3 Water Level Trend of S-101 v1.1
WATER_LEVEL_TREND_RAT = {
    "columns": [
        {"name": "code", "type": "int", "values": [0, 1, 2, 3]},
        {"name": "label", "type": "str",
         "values": ["Nodata", "Decreasing", "Increasing", "Steady"]},
        {"name": "definition", "type": "str",
         "values": ["No data", "Becoming smaller in magnitude",
                    "Becoming larger in magnitude", "Constant"]},
    ],
    "rows": 4,
}

# s111dataset.cpp:360-390 — S-111 v1.2 tables 9.1/9.2
SPEED_BANDS_RAT = {
    "columns": [
        {"name": "speed_band", "type": "int",
         "values": [1, 2, 3, 4, 5, 6, 7, 8, 9]},
        {"name": "min_speed", "type": "real",
         "values": [0.0, 0.5, 1.0, 2.0, 3.0, 5.0, 7.0, 10.0, 13.0]},
        {"name": "width_band", "type": "real",
         "values": [0.5, 0.5, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 86.0]},
        {"name": "color", "type": "str",
         "values": ["purple", "dark blue", "light blue", "dark green",
                    "light green", "yellow green", "orange", "pink",
                    "red"]},
        {"name": "red", "type": "int",
         "values": [118, 72, 97, 109, 180, 205, 248, 247, 255]},
        {"name": "green", "type": "int",
         "values": [82, 152, 203, 188, 220, 193, 167, 162, 30]},
        {"name": "blue", "type": "int",
         "values": [226, 211, 229, 69, 0, 0, 24, 157, 30]},
    ],
    "rows": 9,
}

_S1XX_BANDS = {
    "S104": (("waterLevelHeight", "metre"), ("waterLevelTrend", None)),
    "S111": (("surfaceCurrentSpeed", "knots"),
             ("surfaceCurrentDirection", "degree")),
}
_S1XX_EXTRA_MD = {
    "S104": ("methodWaterLevelProduct", "minDatasetHeight",
             "maxDatasetHeight"),
    "S111": ("methodCurrentsProduct", "minDatasetCurrentSpeed",
             "maxDatasetCurrentSpeed"),
}


def _read_s1xx_timeseries(root, path, subdataset, north_up, feature,
                          product, out):
    grp = root.children[feature]
    for attr in _S1XX_EXTRA_MD[product]:
        if attr in grp.attrs:
            out["metadata"][attr] = _s(grp.attrs[attr])
    inst_name, inst = _first_group(grp, feature + ".")
    for attr in ("timeRecordInterval", "dateTimeOfFirstRecord",
                 "dateTimeOfLastRecord", "numberOfTimes"):
        if attr in inst.attrs:
            out["metadata"][attr] = _s(inst.attrs[attr])
    gt, nx, ny = _geotransform(inst, north_up)
    out.update(gt=gt, width=nx, height=ny)

    groups = [n for n, c in inst.children.items()
              if not isinstance(c, H5Dataset) and n.startswith("Group_")]
    if subdataset is None:
        for g in groups:
            desc = f"Values for group {g}"
            tp = inst.children[g].attrs.get("timePoint")
            if tp is not None:
                desc = f"Values at timestamp {_s(tp)}"
            out["subdatasets"].append(
                (f'{product}:"{path}":{g}', desc))
        return

    if subdataset not in groups:
        raise ValueError(
            f"Cannot find /{feature}/{inst_name}/{subdataset} group")
    values = inst.children[subdataset].children["values"].read()
    fills = _group_f(root, feature)
    for i, (comp, unit) in enumerate(_S1XX_BANDS[product]):
        arr = values[comp]
        if north_up:
            arr = arr[::-1]
        info = _gf_lookup(fills, comp)
        band = {"description": comp, "data": arr,
                "nodata": info.get("fill", 0.0)}
        u = unit or info.get("uom")
        if u:
            band["unit"] = u
        if product == "S104" and comp == "waterLevelTrend":
            band["rat"] = WATER_LEVEL_TREND_RAT
        if product == "S111" and comp == "surfaceCurrentSpeed":
            band["rat"] = SPEED_BANDS_RAT
        out["bands"].append(band)
