"""S-57 / ISO 8211 reader vs the reference's own autotest
(autotest/ogr/ogr_s57.py, data/s57 fixtures)."""

import re

import pytest

from gdal_ray.sources.s57 import read_s57

FIX = "/root/reference/autotest/ogr/data/s57/"

EXPECTED_LAYERS = {  # ogr_s57.py test_ogr_s57_check_layers
    "DSID": 1, "COALNE": 1, "DEPARE": 4, "DEPCNT": 4, "LNDARE": 1,
    "LNDELV": 2, "SBDARE": 2, "SLCONS": 1, "SLOTOP": 1, "SOUNDG": 2,
    "M_COVR": 1, "M_NSYS": 1, "M_QUAL": 1,
}


@pytest.fixture(scope="module")
def enc():
    return read_s57(FIX + "1B5X02NE.000")


def test_layers_and_counts(enc):
    assert {k: t.num_rows for k, t in enc.items()} == EXPECTED_LAYERS


def test_coalne(enc):
    r = enc["COALNE"].to_pylist()[0]
    assert r["RCID"] == 1 and r["OBJL"] == 30 and r["AGEN"] == 65535
    assert r["LNAM"] == "FFFF7F4F0FB002D3"
    exp = ("LINESTRING (60.976834 -32.494426,60.977182 -32.494538,"
           "60.977424 -32.494774,60.977748 -32.49504,60.977916 -32.495472,"
           "60.97793 -32.495818,60.977944 -32.496178,60.978044 -32.496476,"
           "60.978002 -32.497038,60.978002 -32.497266,60.978058 -32.497494,"
           "60.978128 -32.497732,60.97827 -32.497948,60.979102 -32.498486,"
           "60.979426 -32.498666)")
    assert r["wkt"].replace(", ", ",") == exp


def _ring_canon(wkt):
    """Normalize a single-ring POLYGON wkt to a canonical cycle
    (rotation + direction independent)."""
    pts = re.findall(r"(-?[\d.]+) (-?[\d.]+)", wkt)
    ring = [tuple(map(float, p)) for p in pts]
    assert ring[0] == ring[-1]
    ring = ring[:-1]
    best = None
    for seq in (ring, ring[::-1]):
        for i in range(len(seq)):
            cand = tuple(seq[i:] + seq[:i])
            if best is None or cand < best:
                best = cand
    return best


def test_m_qual_polygon(enc):
    r = enc["M_QUAL"].to_pylist()[0]
    assert r["RCID"] == 15 and r["OBJL"] == 308 and r["AGEN"] == 65535
    exp = ("POLYGON ((60.976834 -32.49534,60.976834 -32.49762,"
           "60.976834 -32.498666,60.97869 -32.498666,60.979426 -32.498666,"
           "60.982152 -32.498666,60.983166 -32.498666,60.983166 -32.497558,"
           "60.983166 -32.49477,60.983166 -32.4935,60.981468 -32.4935,"
           "60.980298 -32.4935,60.979474 -32.4935,60.979016 -32.4935,"
           "60.976834 -32.4935,60.976834 -32.494426,60.976834 -32.494698,"
           "60.976834 -32.49534))")
    assert _ring_canon(r["wkt"]) == _ring_canon(exp)


def test_soundg_multipoint_z(enc):
    r = enc["SOUNDG"].to_pylist()[0]
    assert r["RCID"] == 20 and r["OBJL"] == 129 and r["AGEN"] == 65535
    assert r["QUASOU"] == ["1"]
    assert r["wkt"].startswith("MULTIPOINT Z (")
    # 3-D soundings scaled by SOMF
    assert "60.981644 -32.49449 3.4" in r["wkt"].replace("(", "").replace(")", "")


def test_dsid_layer(enc):
    t = enc["DSID"]
    assert t.num_rows == 1
    r = t.to_pylist()[0]
    assert r["DSNM"].startswith("1B5X02NE")


def test_double_byte_attributes():
    """ogr_s57.py test_ogr_s57_double_byte_attrs: INFORM +
    lexical-level-2 NINFOM."""
    L = read_s57(FIX + "bug1526.000")
    r = L["FOGSIG"].to_pylist()[0]
    assert r["INFORM"] == ("During South winds nautophone is not always "
                           "heard in S direction from lighthouse")
    assert len(r["NINFOM"]) >= 1


def test_multilinestring_feature():
    """ogr_s57.py test_ogr_s57_multilinestring golden — exact vertex
    sequence of an 8-part ROADWY."""
    L = read_s57(FIX + "bug2147_3R7D0889.000")
    w = L["ROADWY"].to_pylist()[0]["wkt"].replace(", ", ",")
    assert w.startswith(
        "MULTILINESTRING ((22.5659615 44.5541942,22.5652045 44.5531651,")
    assert w.count("(") == 9  # 8 parts + outer
    assert w.endswith("(22.5093748 44.5311182,22.5107969 44.5285258,"
                      "22.5108905 44.5267978,22.5076679 44.5223309))")
