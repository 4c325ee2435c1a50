"""RS2 / RCM conformance — every expectation is the reference's OWN
published value (autotest/gdrivers/rs2.py, rcm.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.radarsat import read_rcm, read_rs2
from gdal_ray.sources.raster_open import open_raster

D = "/root/reference/autotest/gdrivers/data"
RCM = f"{D}/rcm/fake_VV_VH_GRD"


def test_rs2_open():
    r = open_raster(f"{D}/rs2/product.xml")
    assert r["driver"] == "RS2"
    assert r["pixels"].shape == (20, 20, 2)
    assert checksum_image(r["pixels"][:, :, 0]) == 4672
    assert r["poles"] == ["HH", "HV"]
    assert len(r["gcps"]) == 4
    assert r["gcps"][0] == {"pixel": 0.0, "line": 0.0, "x": 2.0,
                            "y": 49.0, "z": 0.0}


def test_rs2_calib_beta0():
    r = open_raster(f"RADARSAT_2_CALIB:BETA0:{D}/rs2/product.xml")
    assert r["pixels"].dtype == np.float32
    assert checksum_image(r["pixels"][:, :, 0]) == 4848


def test_rs2_rpc():
    r = read_rs2(f"{D}/rs2/product.xml")
    assert r["rpc"] == {
        "ERR_BIAS": "biasError",
        "ERR_RAND": "randomError",
        "HEIGHT_OFF": "heightOffset",
        "HEIGHT_SCALE": "heightScale",
        "LAT_OFF": "latitudeOffset",
        "LAT_SCALE": "latitudeScale",
        "LINE_DEN_COEFF": "lineDenominatorCoefficients",
        "LINE_NUM_COEFF": "lineNumeratorCoefficients",
        "LINE_OFF": "lineOffset",
        "LINE_SCALE": "lineScale",
        "LONG_OFF": "longitudeOffset",
        "LONG_SCALE": "longitudeScale",
        "SAMP_DEN_COEFF": "pixelDenominatorCoefficients",
        "SAMP_NUM_COEFF": "pixelNumeratorCoefficients",
        "SAMP_OFF": "pixelOffset",
        "SAMP_SCALE": "pixelScale",
    }


def test_rcm_open_variants():
    for p in (RCM, f"{RCM}/metadata", f"{RCM}/metadata/product.xml"):
        r = open_raster(p) if not p.endswith("metadata") else read_rcm(p)
        assert r["driver"] == "RCM"
        assert r["pixels"].shape[2] == 2


def test_rcm_product():
    r = read_rcm(f"{RCM}/metadata/product.xml")
    assert r["pixels"].shape == (3297, 17915, 2)
    assert r["pixels"].dtype == np.uint16
    assert checksum_image(r["pixels"][:, :, 0]) == 0
    assert r["poles"] == ["VH", "VV"]      # band 1 POLARIMETRIC_INTERP
    md = r["metadata"]
    cal = f"{RCM}/metadata/calibration"
    assert md == {
        "ACQUISITION_START_TIME": "rawDataStartTime",
        "ACQUISITION_TYPE": "Medium Resolution 50m",
        "BEAMS": "beams",
        "BEAM_MODE": "Medium Resolution 50m",
        "BEAM_MODE_DEFINITION_ID": "beamModeDefinitionId",
        "BEAM_MODE_MNEMONIC": "beamModeMnemonic",
        "BETA_NOUGHT_LUT": f"{cal}/lutBeta_VH.xml,{cal}/lutBeta_VV.xml",
        "BITS_PER_SAMPLE": "16",
        "DATA_TYPE": "Integer",
        "FACILITY_IDENTIFIER": "inputDatasetFacilityId",
        "FAR_RANGE_INCIDENCE_ANGLE": "incAngFarRng",
        "FIRST_LINE_TIME": "zeroDopplerTimeFirstLine",
        "GAMMA_LUT": f"{cal}/lutGamma_VH.xml,{cal}/lutGamma_VV.xml",
        "GEODETIC_TERRAIN_HEIGHT": "200",
        "LAST_LINE_TIME": "zeroDopplerTimeLastLine",
        "LINE_SPACING": "sampledLineSpacing",
        "LINE_TIME_ORDERING": "Increasing",
        "LUT_APPLIED": "Mixed",
        "NEAR_RANGE_INCIDENCE_ANGLE": "incAngNearRng",
        "ORBIT_DATA_FILE": "orbitDataFileName",
        "ORBIT_DATA_SOURCE": "Downlinked",
        "ORBIT_DIRECTION": "Descending",
        "PER_POLARIZATION_SCALING": "true",
        "PIXEL_SPACING": "sampledPixelSpacing",
        "PIXEL_TIME_ORDERING": "Decreasing",
        "POLARIZATIONS": "VH VV",
        "POLARIZATION_DATA_MODE": "Dual Co/Cross",
        "PROCESSING_FACILITY": "processingFacility",
        "PROCESSING_TIME": "processingTime",
        "PRODUCT_ID": "productId",
        "PRODUCT_TYPE": "GRD",
        "SAMPLED_LINE_SPACING_TIME": "sampledLineSpacingTime",
        "SAMPLED_PIXEL_SPACING_TIME": "sampledPixelSpacingTime",
        "SAMPLE_TYPE": "Magnitude Detected",
        "SATELLITE_HEIGHT": "600000",
        "SATELLITE_IDENTIFIER": "RCM-1",
        "SECURITY_CLASSIFICATION": "Non classifié / Unclassified",
        "SENSOR_IDENTIFIER": "SAR",
        "SIGMA_NOUGHT_LUT": f"{cal}/lutSigma_VH.xml,{cal}/lutSigma_VV.xml",
        "SLANT_RANGE_FAR_EDGE": "slantRangeFarEdge",
        "SLANT_RANGE_NEAR_EDGE": "slantRangeNearEdge",
    }
    assert r["rpc"]["LINE_NUM_COEFF"] == " ".join(["0"] * 20)
    assert r["rpc"]["ERR_BIAS"] == "0"
    assert len(r["gcps"]) == 1
    g = r["gcps"][0]
    assert (g["pixel"], g["line"], g["x"], g["y"], g["z"]) == \
        (2.0, 1.0, 2.5, 1.5, 3.5)
    assert r["gcp_epsg"] == 4326


def test_rcm_calib_subdatasets():
    for c in ("BETA0", "SIGMA0", "GAMMA", "UNCALIB"):
        r = open_raster(f"RCM_CALIB:{c}:{RCM}/metadata/product.xml")
        want = np.float32 if c != "UNCALIB" else np.uint16
        assert r["pixels"].dtype == want
        assert checksum_image(r["pixels"][:, :, 0]) == 0
    with pytest.raises(ValueError, match="Unsupported calibration type"):
        open_raster(f"RCM_CALIB:unhandled:{RCM}/metadata/product.xml")
    with pytest.raises(Exception):
        open_raster("RCM_CALIB:UNCALIB:i_do_not_exist/product.xml")
