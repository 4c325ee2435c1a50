"""COSAR (TerraSAR-X annotated binary matrix) + TSX/TDX/PAZ product
drivers.

COSAR per frmts/cosar/cosar_dataset.cpp: big-endian header words
BIB/RSRI/RS(+8)/AS(+12)/BI(+16)/RTNB(+20)/TNL(+24), magic "CSAR" at
+28, version at +32 (1 = CInt16 COSAR, 2 = CFloat32 COSSC stored as
half floats).  The file is a matrix of RTNB-byte range lines with 4
annotation lines up front (line y lives at RTNB·(y+4)); each line
leads with big-endian RSFV/RSLV (Range Sample First/Last Valid,
1-based per TX-GS-DD-3307) and samples are (I,Q) int16 pairs —
samples outside [RSFV, RSLV] read as zero.

TSX per frmts/tsx/tsxdataset.cpp: a TSX1_SAR/TDX1_SAR/PAZ1_SAR
level1Product XML whose productComponents imageData entries (one per
polLayer) reference the per-band files (COSAR for COMPLEX/SSC,
GeoTIFF otherwise, opened through the unified raster opener exactly
like the reference recurses into GDALOpen); georeferencing comes from
the GEOREF.xml geolocationGrid gridPoints (col/row/lon/lat GCPs,
tsxdataset.cpp:340-430) with the SSC fallback to
sceneCenterCoord/sceneCornerCoord refColumn/refRow GCPs at
sceneAverageHeight (tsxdataset.cpp:694-760); metadata items mirror
the reference's productInfo extraction.
"""
from __future__ import annotations

import os
import re
import struct
import xml.etree.ElementTree as ET

import numpy as np

from .vsi import vsi_open_bytes


# ------------------------------------------------------------------ COSAR
def read_cosar(data: bytes) -> dict:
    """-> {"pixels": complex64 (h, w), "driver": "COSAR", "version",
    "rsfv", "rslv"} — invalid samples zeroed like IReadBlock."""
    if len(data) < 36 or data[28:32] != b"CSAR":
        raise ValueError("not a COSAR file (missing CSAR magic)")
    rs = struct.unpack(">i", data[8:12])[0]       # range samples (width)
    az = struct.unpack(">i", data[12:16])[0]      # azimuth samples (height)
    rtnb = struct.unpack(">I", data[20:24])[0]    # bytes per range line
    version = struct.unpack(">I", data[32:36])[0]
    if version not in (1, 2):
        raise ValueError(f"COSAR version {version} not supported")
    if rs <= 0 or az <= 0 or rtnb < 8:
        raise ValueError("COSAR: bad dimensions")
    item = 4  # (I, Q) int16
    out = np.zeros((az, rs), np.complex64)
    rsfv_l = np.zeros(az, np.int32)
    rslv_l = np.zeros(az, np.int32)
    for y in range(az):
        base = rtnb * (y + 4)
        line = data[base:base + rtnb]
        if len(line) < 8:
            raise ValueError(f"COSAR: truncated line {y}")
        rsfv, rslv = struct.unpack(">II", line[:8])
        if (rslv < rsfv or rsfv == 0 or rslv == 0 or rsfv - 1 >= rs
                or rslv - 1 >= rs or rsfv >= rtnb or rslv > rtnb):
            raise ValueError("COSAR: RSLV/RSFV values are not sane")
        n = rslv - rsfv + 1
        raw = line[(rsfv + 1) * item:(rsfv + 1) * item + n * item]
        if version == 1:
            iq = np.frombuffer(raw, ">i2").astype(np.float32)
        else:   # COSSC: half floats (CPLHalfToFloat)
            iq = np.frombuffer(raw, ">e").astype(np.float32)
        out[y, rsfv - 1:rslv] = iq[0::2] + 1j * iq[1::2]
        rsfv_l[y], rslv_l[y] = rsfv, rslv
    return {"pixels": out, "gt": None, "epsg": None, "driver": "COSAR",
            "version": version, "rsfv": rsfv_l, "rslv": rslv_l}


def write_cosar(arr: np.ndarray, version: int = 1,
                rsfv: np.ndarray | None = None,
                rslv: np.ndarray | None = None) -> bytes:
    """Synthesize a COSAR burst for a complex matrix (tests +
    fixture generation; int16-quantized for version 1)."""
    arr = np.asarray(arr)
    az, rs = arr.shape
    rtnb = 8 + rs * 4
    if rsfv is None:
        rsfv = np.full(az, 1, np.int64)
    if rslv is None:
        rslv = np.full(az, rs, np.int64)
    head = bytearray(rtnb * 4)
    struct.pack_into(">i", head, 0, rtnb * az)        # BIB
    struct.pack_into(">i", head, 4, 1)                # RSRI
    struct.pack_into(">i", head, 8, rs)
    struct.pack_into(">i", head, 12, az)
    struct.pack_into(">i", head, 16, 1)               # BI
    struct.pack_into(">I", head, 20, rtnb)
    struct.pack_into(">i", head, 24, az)              # TNL
    head[28:32] = b"CSAR"
    struct.pack_into(">I", head, 32, version)
    lines = [bytes(head)]
    for y in range(az):
        buf = bytearray(rtnb)
        struct.pack_into(">II", buf, 0, int(rsfv[y]), int(rslv[y]))
        row = arr[y]
        iq = np.empty(rs * 2, np.float32)
        iq[0::2] = row.real
        iq[1::2] = row.imag
        if version == 1:
            enc = iq.astype(">i2").tobytes()
        else:
            enc = iq.astype(">e").tobytes()
        lo, hi = int(rsfv[y]) - 1, int(rslv[y])
        buf[(int(rsfv[y]) + 1) * 4:(int(rsfv[y]) + 1) * 4
            + (hi - lo) * 4] = enc[lo * 4:hi * 4]
        lines.append(bytes(buf))
    return b"".join(lines)


# ------------------------------------------------------------------ TSX
_TSX_PREFIXES = ("TSX1_SAR", "TDX1_SAR", "PAZ1_SAR")

_PRODUCTINFO_ITEMS = [
    ("SENSOR", "acquisitionInfo/sensor"),
    ("OPERATIONAL_MODE", "acquisitionInfo/imagingMode"),
    ("ORBIT_CYCLE", "missionInfo/orbitCycle"),
    ("ABSOLUTE_ORBIT", "missionInfo/absOrbit"),
    ("ORBIT_DIRECTION", "missionInfo/orbitDirection"),
    ("IMAGING_MODE", "acquisitionInfo/imagingMode"),
    ("PRODUCT_VARIANT", "productVariantInfo/productVariant"),
    ("ROW_SPACING", "imageDataInfo/imageRaster/rowSpacing"),
    ("COL_SPACING", "imageDataInfo/imageRaster/columnSpacing"),
    ("AZIMUTH_LOOKS", "imageDataInfo/imageRaster/azimuthLooks"),
    ("RANGE_LOOKS", "imageDataInfo/imageRaster/rangeLooks"),
]


def is_tsx(path: str) -> bool:
    base = os.path.basename(path.rstrip("/"))
    return base.upper().startswith(tuple(p.upper() for p in _TSX_PREFIXES))


def _component_path(comp: ET.Element) -> tuple[str, str, str]:
    loc = comp.find("file/location")
    d = loc.findtext("path", "") if loc is not None else ""
    f = loc.findtext("filename", "") if loc is not None else ""
    typ = comp.findtext("type", " ") or " "
    return d, f, typ


def _georef_gcps(path: str) -> list[dict]:
    try:
        root = ET.parse(path).getroot()
    except Exception:
        return []
    grid = root.find(".//geolocationGrid")
    if grid is None:
        return []
    pts = grid.findall("gridPoint")
    gcps = []
    for i, p in enumerate(pts):
        col, row = p.findtext("col"), p.findtext("row")
        lon, lat = p.findtext("lon"), p.findtext("lat")
        if None in (col, row, lon, lat):
            return []   # all-or-nothing like the reference's precheck
        gcps.append({"id": str(i + 1), "pixel": float(col),
                     "line": float(row), "x": float(lon), "y": float(lat),
                     "z": float(p.findtext("height", "0") or 0)})
    return gcps


def read_tsx(path: str) -> dict:
    """Open a TSX/TDX/PAZ level1Product (directory or .xml)."""
    if os.path.isdir(path):
        cand = os.path.join(path, os.path.basename(path.rstrip("/")) +
                            ".xml")
        if not os.path.exists(cand):
            xs = [f for f in os.listdir(path)
                  if f.lower().endswith(".xml") and is_tsx(f)]
            if not xs:
                raise ValueError(f"TSX: no product xml in {path}")
            cand = os.path.join(path, xs[0])
        path = cand
    if not is_tsx(path):
        raise ValueError(f"TSX: {path} is not a TSX1_SAR/TDX1_SAR/PAZ1_SAR "
                         "product")
    text = vsi_open_bytes(path).decode("utf-8", "replace")
    if "<level1Product" not in text[:2048]:
        raise ValueError("TSX: missing <level1Product element")
    root = ET.fromstring(text)
    base = os.path.dirname(path) or "."

    info = root.find("productInfo")
    md = {}
    for key, xp in _PRODUCTINFO_ITEMS:
        v = info.findtext(xp) if info is not None else None
        md[key] = v if v is not None else "unknown"
    data_type = (info.findtext("imageDataInfo/imageDataType", "unknown")
                 if info is not None else "unknown")
    md["IMAGE_TYPE"] = data_type
    variant = md["PRODUCT_VARIANT"]

    nrows = int(info.findtext("imageDataInfo/imageRaster/numberOfRows", "0"))
    ncols = int(info.findtext(
        "imageDataInfo/imageRaster/numberOfColumns", "0"))

    bands, poles = [], []
    georef_file = None
    gt = None
    epsg = None
    comps = root.find("productComponents")
    for comp in (comps if comps is not None else []):
        d, f, typ = _component_path(comp)
        comp_path = os.path.join(base, d, f)
        pol = comp.findtext("polLayer", " ") or " "
        if typ.strip():
            if typ.upper().startswith("MAPPING_GRID"):
                md["MAPPING_GRID"] = comp_path
            elif typ.upper().startswith("GEOREF"):
                georef_file = comp_path
        elif pol.strip() and comp.tag.startswith("imageData"):
            poles.append(pol if pol in ("HH", "HV", "VH") else "VV")
            low = comp_path.lower()
            if low.endswith(".cos"):
                bands.append(read_cosar(vsi_open_bytes(comp_path))["pixels"])
            elif low.endswith((".tif", ".tiff")):
                from .tiff import decode_tiff, tiff_epsg

                px, bgt = decode_tiff(vsi_open_bytes(comp_path))
                bands.append(px if px.ndim == 2 else px[:, :, 0])
                if bgt is not None:
                    gt = bgt
                    epsg = tiff_epsg(vsi_open_bytes(comp_path))
            else:
                from .raster_open import open_raster

                rd = open_raster(comp_path)
                bands.append(np.asarray(rd["pixels"]))
                if rd.get("gt") is not None:
                    gt, epsg = rd["gt"], rd.get("epsg")
    if not bands:
        raise ValueError("TSX: no imageData components")
    if len(bands) == 4:
        md["MATRIX_REPRESENTATION"] = "SCATTERING"

    gcps = _georef_gcps(georef_file) if georef_file else []
    if not gcps and variant.upper().startswith("SSC"):
        scene = root.find("productInfo/sceneInfo")
        if scene is not None:
            avg_h = float(scene.findtext("sceneAverageHeight", "0") or 0)
            n = 0
            for node in scene:
                if node.tag not in ("sceneCenterCoord", "sceneCornerCoord"):
                    continue
                gcps.append({
                    "id": str(n), "pixel":
                        float(node.findtext("refColumn", "0") or 0),
                    "line": float(node.findtext("refRow", "0") or 0),
                    "x": float(node.findtext("lon", "0") or 0),
                    "y": float(node.findtext("lat", "0") or 0),
                    "z": avg_h})
                n += 1
    if gcps:
        gt, epsg = None, None   # GCPs override the geotransform

    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=2)
    return {"pixels": px, "gt": gt, "epsg": epsg, "driver": "TSX",
            "gcps": gcps, "gcp_epsg": 4326 if gcps else None,
            "poles": poles, "metadata": md,
            "size": (ncols, nrows)}


# ------------------------------------------------------------------ fixture
def synth_tsx_product(tmp_path, variant="SSC", with_georef=True, n_pol=2):
    """Synthesize a minimal TSX SSC product directory (tests + the
    driver-query fixture)."""
    import pathlib

    tmp_path = pathlib.Path(tmp_path)
    name = "TSX1_SAR__SSC______SM_S_SRA_20260101T000000_20260101T000010"
    root = tmp_path / name
    (root / "IMAGEDATA").mkdir(parents=True)
    rng = np.random.default_rng(42)
    arrs, comps = [], []
    for i, pol in enumerate(["HH", "VV", "HV", "VH"][:n_pol]):
        arr = (rng.integers(-500, 500, (6, 9)) +
               1j * rng.integers(-500, 500, (6, 9))).astype(np.complex64)
        fn = f"IMAGE_{pol}_SRA_spot_042.cos"
        (root / "IMAGEDATA" / fn).write_bytes(write_cosar(arr))
        arrs.append(arr)
        comps.append(f"""
  <imageData layerIndex="{i + 1}">
   <polLayer>{pol}</polLayer>
   <file><location><path>IMAGEDATA</path>
   <filename>{fn}</filename></location></file>
  </imageData>""")
    georef = ""
    if with_georef:
        pts = "".join(
            f"<gridPoint iaz='1' irg='{i}'><t>0</t><tau>0</tau>"
            f"<col>{c}</col><row>{r}</row><lat>{50 + r * 0.01}</lat>"
            f"<lon>{8 + c * 0.01}</lon><height>120</height></gridPoint>"
            for i, (c, r) in enumerate([(0, 0), (8, 0), (0, 5), (8, 5)]))
        (root / "ANNOTATION").mkdir()
        (root / "ANNOTATION" / "GEOREF.xml").write_text(
            f"<geoReference><geolocationGrid>"
            f"<numberOfGridPoints><total>4</total></numberOfGridPoints>"
            f"{pts}</geolocationGrid></geoReference>")
        georef = """
  <annotation>
   <type>GEOREF</type>
   <file><location><path>ANNOTATION</path>
   <filename>GEOREF.xml</filename></location></file>
  </annotation>"""
    xml = f"""<level1Product>
 <productComponents>{georef}{''.join(comps)}
 </productComponents>
 <productInfo>
  <missionInfo><orbitCycle>25</orbitCycle><absOrbit>1234</absOrbit>
   <orbitDirection>ASCENDING</orbitDirection></missionInfo>
  <acquisitionInfo><sensor>SAR</sensor>
   <imagingMode>SM</imagingMode></acquisitionInfo>
  <productVariantInfo><productVariant>{variant}</productVariant>
  </productVariantInfo>
  <imageDataInfo><imageDataType>COMPLEX</imageDataType>
   <imageRaster><numberOfRows>6</numberOfRows>
    <numberOfColumns>9</numberOfColumns>
    <rowSpacing>1.8</rowSpacing><columnSpacing>0.9</columnSpacing>
    <azimuthLooks>1</azimuthLooks><rangeLooks>1</rangeLooks>
   </imageRaster></imageDataInfo>
  <sceneInfo><sceneAverageHeight>118.5</sceneAverageHeight>
   <sceneCenterCoord><refRow>3</refRow><refColumn>4</refColumn>
    <lat>50.03</lat><lon>8.04</lon></sceneCenterCoord>
   <sceneCornerCoord><refRow>0</refRow><refColumn>0</refColumn>
    <lat>50.0</lat><lon>8.0</lon></sceneCornerCoord>
   <sceneCornerCoord><refRow>5</refRow><refColumn>8</refColumn>
    <lat>50.05</lat><lon>8.08</lon></sceneCornerCoord>
  </sceneInfo>
 </productInfo>
</level1Product>"""
    (root / f"{name}.xml").write_text(xml)
    return str(root), arrs
