"""RADARSAT-2 (RS2) and RADARSAT Constellation Mission (RCM) readers.

Pure-Python re-derivation of the reference drivers:

- RS2 (frmts/rs2/rs2dataset.cpp): ``product.xml`` names one GeoTIFF
  per polarization (``fullResolutionImageData pole=..``), geolocation
  tie points, an RPC block (rationalFunctions, passed through as the
  RPC metadata domain), and per-calibration lookup tables.  The
  ``RADARSAT_2_CALIB:{BETA0,SIGMA0,GAMMA,UNCALIB}:path`` subdataset
  applies ``(DN^2 + offset) / gain[col]`` as float32
  (rs2dataset.cpp:485-531 RS2CalibRasterBand::IReadBlock).
- RCM (frmts/rcm/rcmdataset.cpp): same family; ``product.xml`` lives
  under ``<scene>/metadata/``, imagery under ``../imagery/*.tif``
  (sceneAttributes/imageAttributes/ipdf), band order follows
  radarParameters/polarizations, metadata keys per
  rcmdataset.cpp:1190-1450, calibration LUTs are runs of gains
  expanded by ``index = i * stepSize + pixelFirstLutValue``
  (rcmdataset.cpp:78-190, :393).  Subdataset:
  ``RCM_CALIB:{BETA0,SIGMA0,GAMMA,UNCALIB}:path``.

Conformance: autotest/gdrivers/rs2.py (checksums 4672 / 4848, RPC
dict), autotest/gdrivers/rcm.py (size/dtype/checksum, full metadata
dict, GCP, RPC).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET

import numpy as np

from .tiff import decode_tiff
from .vsi import vsi_open_bytes

_CALIB = {"BETA0": "Beta Nought", "SIGMA0": "Sigma Nought",
          "GAMMA": "Gamma", "UNCALIB": None}


def _strip_ns(root):
    for el in root.iter():
        el.tag = el.tag.split("}")[-1]
    return root


def _xml(path: str):
    return _strip_ns(ET.fromstring(vsi_open_bytes(path)))


def _text(root, xpath: str, default=None):
    el = root.find(xpath)
    return el.text if el is not None and el.text is not None else default


# ------------------------------------------------------------------- RS2

def _rs2_gcps(root) -> list[dict]:
    gcps = []
    for tp in root.iter("imageTiePoint"):
        gcps.append({
            "pixel": float(_text(tp, "imageCoordinate/pixel", 0)),
            "line": float(_text(tp, "imageCoordinate/line", 0)),
            "x": float(_text(tp, "geodeticCoordinate/longitude", 0)),
            "y": float(_text(tp, "geodeticCoordinate/latitude", 0)),
            "z": float(_text(tp, "geodeticCoordinate/height", 0) or 0),
        })
    return gcps


_RPC_MAP = [
    ("ERR_BIAS", "biasError"), ("ERR_RAND", "randomError"),
    ("LINE_OFF", "lineOffset"), ("SAMP_OFF", "pixelOffset"),
    ("LAT_OFF", "latitudeOffset"), ("LONG_OFF", "longitudeOffset"),
    ("HEIGHT_OFF", "heightOffset"), ("LINE_SCALE", "lineScale"),
    ("SAMP_SCALE", "pixelScale"), ("LAT_SCALE", "latitudeScale"),
    ("LONG_SCALE", "longitudeScale"), ("HEIGHT_SCALE", "heightScale"),
    ("LINE_NUM_COEFF", "lineNumeratorCoefficients"),
    ("LINE_DEN_COEFF", "lineDenominatorCoefficients"),
    ("SAMP_NUM_COEFF", "pixelNumeratorCoefficients"),
    ("SAMP_DEN_COEFF", "pixelDenominatorCoefficients"),
]


def _rpc_dict(root) -> dict:
    rf = root.find(".//rationalFunctions")
    if rf is None:
        return {}
    return {k: _text(rf, src) for k, src in _RPC_MAP
            if _text(rf, src) is not None}


def _rs2_lut(base: str, root, correction: str, width: int) -> tuple:
    """(offset, per-column gains) from the RS2 lut.xml named by the
    lookupTable element with the given incidenceAngleCorrection."""
    for el in root.iter("lookupTable"):
        if el.get("incidenceAngleCorrection") == correction:
            lut = _xml(os.path.join(base, el.text.strip()))
            offset = float(_text(lut, "offset", 0))
            gains = np.array([float(v) for v in
                              _text(lut, "gains", "1").split()],
                             np.float64)
            if gains.size < width:
                gains = np.pad(gains, (0, width - gains.size),
                               mode="edge")
            return offset, gains[:width]
    raise ValueError(f"RS2: no lookupTable for {correction!r}")


def read_rs2(path: str) -> dict:
    """Open an RS2 product.xml (or RADARSAT_2_CALIB:TYPE:path)."""
    calib = None
    m = re.match(r"^RADARSAT_2_CALIB:([A-Z0-9]+):(.*)$", path)
    if m:
        calib, path = m.group(1), m.group(2)
        if calib not in _CALIB:
            raise ValueError(f"Unsupported calibration type: {calib}")
    root = _xml(path)
    base = os.path.dirname(path) or "."
    bands, poles = [], []
    for el in root.iter("fullResolutionImageData"):
        px, _ = decode_tiff(vsi_open_bytes(os.path.join(base,
                                                        el.text.strip())))
        bands.append(px if px.ndim == 2 else px[:, :, 0])
        poles.append(el.get("pole", ""))
    if not bands:
        raise ValueError(f"RS2: no fullResolutionImageData in {path}")
    if calib and _CALIB[calib]:
        offset, gains = _rs2_lut(base, root, _CALIB[calib],
                                 bands[0].shape[1])
        bands = [((b.astype(np.float64) ** 2 + offset) / gains)
                 .astype(np.float32) for b in bands]
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=2)
    return {
        "pixels": px, "gt": None, "epsg": None, "driver": "RS2",
        "gcps": _rs2_gcps(root), "gcp_epsg": 4326,
        "rpc": _rpc_dict(root), "poles": poles,
        "metadata": {
            "SATELLITE_IDENTIFIER": _text(root, ".//satellite"),
            "SENSOR_IDENTIFIER": _text(root, ".//sensor"),
            "BEAM_MODE_MNEMONIC": _text(root, ".//beamModeMnemonic"),
            "PRODUCT_TYPE": _text(root, ".//productType"),
            "ACQUISITION_START_TIME": _text(root, ".//rawDataStartTime"),
        },
    }


# ------------------------------------------------------------------- RCM

def _rcm_expand_lut(lut_root, width: int) -> tuple:
    """(offset, per-column gains): gains entry i applies at column
    ``i * stepSize + pixelFirstLutValue`` with linear interpolation
    between entries (rcmdataset.cpp:78-190)."""
    offset = float(_text(lut_root, "offset", 0))
    first = int(_text(lut_root, "pixelFirstLutValue", 0))
    step = int(_text(lut_root, "stepSize", 0) or 0)
    vals = np.array([float(v) for v in
                     _text(lut_root, "gains", "1").split()], np.float64)
    out = np.empty(width, np.float64)
    if vals.size == 1 or step == 0:
        out[:] = vals[0]
        return offset, out
    # anchor columns for each entry
    cols = first + step * np.arange(vals.size)
    if step < 0:                        # decreasing columns: reverse
        cols, vals = cols[::-1], vals[::-1]
    out = np.interp(np.arange(width), cols, vals)
    return offset, out


def _rcm_paths(path: str) -> str:
    """Accept scene dir, metadata dir, or product.xml path."""
    if os.path.isdir(path):
        for cand in (os.path.join(path, "metadata", "product.xml"),
                     os.path.join(path, "product.xml")):
            if os.path.exists(cand):
                return cand
        raise FileNotFoundError(f"RCM: no product.xml under {path}")
    return path


def read_rcm(path: str) -> dict:
    """Open an RCM scene (dir, metadata dir, product.xml, or
    RCM_CALIB:TYPE:path)."""
    calib = None
    m = re.match(r"^RCM_CALIB:([A-Za-z0-9]+):(.*)$", path)
    if m:
        calib, path = m.group(1), m.group(2)
        if calib not in _CALIB:
            raise ValueError(f"Unsupported calibration type: {calib}")
    xml_path = _rcm_paths(path)
    root = _xml(xml_path)
    base = os.path.dirname(xml_path) or "."
    pols = (_text(root, ".//radarParameters/polarizations", "") or
            "").split()
    ipdf = {el.get("pole"): el.text.strip()
            for el in root.iter("ipdf")}
    order = [p for p in pols if p in ipdf] or sorted(ipdf)
    bands = []
    for p in order:
        px, _ = decode_tiff(vsi_open_bytes(
            os.path.normpath(os.path.join(base, ipdf[p]))))
        bands.append(px if px.ndim == 2 else px[:, :, 0])
    if not bands:
        raise ValueError(f"RCM: no ipdf imagery in {xml_path}")
    if calib and _CALIB[calib]:
        kind = {"BETA0": "lutBeta", "SIGMA0": "lutSigma",
                "GAMMA": "lutGamma"}[calib]
        new = []
        for p, b in zip(order, bands):
            lut = _xml(os.path.join(base, "calibration",
                                    f"{kind}_{p}.xml"))
            offset, gains = _rcm_expand_lut(lut, b.shape[1])
            new.append(((b.astype(np.float64) ** 2 + offset) / gains)
                       .astype(np.float32))
        bands = new
    # metadata dict per rcmdataset.cpp (keys pinned by autotest rcm.py)
    def t(xp):
        return _text(root, xp)

    def luts(kind):
        found = {el.get("pole"): os.path.join(base, "calibration",
                                              el.text.strip())
                 for el in root.iter("lookupTableFileName")
                 if el.get("sarCalibrationType") == kind}
        return ",".join(found[p] for p in order if p in found)

    md = {
        "ACQUISITION_START_TIME": t(".//rawDataStartTime"),
        "ACQUISITION_TYPE": t(".//radarParameters/acquisitionType"),
        "BEAMS": t(".//radarParameters/beams"),
        "BEAM_MODE": t(".//beamMode"),
        "BEAM_MODE_DEFINITION_ID": t(".//beamModeDefinitionId"),
        "BEAM_MODE_MNEMONIC": t(".//beamModeMnemonic"),
        "BETA_NOUGHT_LUT": luts("Beta Nought"),
        "BITS_PER_SAMPLE": t(".//rasterAttributes/bitsPerSample"),
        "DATA_TYPE": t(".//rasterAttributes/dataType"),
        "FACILITY_IDENTIFIER": t(".//inputDatasetFacilityId"),
        "FAR_RANGE_INCIDENCE_ANGLE": t(".//incAngFarRng"),
        "FIRST_LINE_TIME": t(".//zeroDopplerTimeFirstLine"),
        "GAMMA_LUT": luts("Gamma"),
        "GEODETIC_TERRAIN_HEIGHT": t(".//geodeticTerrainHeight"),
        "LAST_LINE_TIME": t(".//zeroDopplerTimeLastLine"),
        "LINE_SPACING": t(".//rasterAttributes/sampledLineSpacing"),
        "LINE_TIME_ORDERING": t(".//lineTimeOrdering"),
        "LUT_APPLIED": t(".//lutApplied"),
        "NEAR_RANGE_INCIDENCE_ANGLE": t(".//incAngNearRng"),
        "ORBIT_DATA_FILE": t(".//orbitDataFileName"),
        "ORBIT_DATA_SOURCE": t(".//orbitDataSource"),
        "ORBIT_DIRECTION": t(".//passDirection"),
        "PER_POLARIZATION_SCALING": t(".//perPolarizationScaling"),
        "PIXEL_SPACING": t(".//rasterAttributes/sampledPixelSpacing"),
        "PIXEL_TIME_ORDERING": t(".//pixelTimeOrdering"),
        "POLARIZATIONS": " ".join(order),
        "POLARIZATION_DATA_MODE": t(".//polarizationDataMode"),
        "PROCESSING_FACILITY": t(".//processingFacility"),
        "PROCESSING_TIME": t(".//processingTime"),
        "PRODUCT_ID": t(".//productId"),
        "PRODUCT_TYPE": t(".//productType"),
        "SAMPLED_LINE_SPACING_TIME":
            t(".//rasterAttributes/sampledLineSpacingTime"),
        "SAMPLED_PIXEL_SPACING_TIME":
            t(".//rasterAttributes/sampledPixelSpacingTime"),
        "SAMPLE_TYPE": t(".//rasterAttributes/sampleType"),
        "SATELLITE_HEIGHT": t(".//satelliteHeight"),
        "SATELLITE_IDENTIFIER": t(".//satellite"),
        "SECURITY_CLASSIFICATION": t(".//securityClassification"),
        "SENSOR_IDENTIFIER": t(".//sensor"),
        "SIGMA_NOUGHT_LUT": luts("Sigma Nought"),
        "SLANT_RANGE_FAR_EDGE": t(".//slantRangeFarEdge"),
        "SLANT_RANGE_NEAR_EDGE": t(".//slantRangeNearEdge"),
    }
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=2)
    return {
        "pixels": px, "gt": None, "epsg": None, "driver": "RCM",
        "gcps": _rs2_gcps(root), "gcp_epsg": 4326,
        "rpc": _rpc_dict(root), "poles": order, "metadata": md,
    }
