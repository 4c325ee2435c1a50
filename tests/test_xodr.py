"""XODR (OpenDRIVE) driver vs the reference's own autotest goldens
(autotest/ogr/ogr_xodr.py over
autotest/ogr/data/xodr/5g_living_lab_A39_Wolfsburg-West.xodr)."""
import os
import re
import struct

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.sources.xodr import read_xodr, xodr_layer_names

FIX = ("/root/reference/autotest/ogr/data/xodr/"
       "5g_living_lab_A39_Wolfsburg-West.xodr")
EMPTY = "/root/reference/autotest/ogr/data/xodr/empty.xodr"

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIX), reason="reference fixture unavailable")


def _tin_tris(wkb: bytes) -> list[np.ndarray]:
    assert struct.unpack("<BI", wkb[:5]) == (1, 1016)
    n = struct.unpack("<I", wkb[5:9])[0]
    off, tris = 9, []
    for _ in range(n):
        assert struct.unpack("<BIII", wkb[off:off + 13]) == (1, 1017, 1, 4)
        off += 13
        pts = np.frombuffer(wkb[off:off + 96]).reshape(4, 3)
        assert np.allclose(pts[0], pts[3])
        tris.append(pts[:3].copy())
        off += 96
    return tris


def _poly_ring(wkb: bytes) -> np.ndarray:
    assert struct.unpack("<BII", wkb[:9])[:2] == (1, 1003)
    n = struct.unpack("<I", wkb[9:13])[0]
    return np.frombuffer(wkb[13:13 + 24 * n]).reshape(n, 3)


def _line_pts(wkb: bytes) -> np.ndarray:
    assert struct.unpack("<BI", wkb[:5]) == (1, 1002)
    n = struct.unpack("<I", wkb[5:9])[0]
    return np.frombuffer(wkb[9:9 + 24 * n]).reshape(n, 3)


def _wkt_tris(wkt: str) -> list[np.ndarray]:
    return [np.array([[float(v) for v in p.split()]
                      for p in m.group(1).split(",")])[:3]
            for m in re.finditer(r"\(\(([^()]*)\)\)", wkt)]


@pytest.fixture(scope="module")
def layers():
    return read_xodr(FIX, epsilon=1.0)


@pytest.fixture(scope="module")
def dissolved():
    return read_xodr(FIX, epsilon=1.0, dissolve_tin=True)


def test_layer_set_and_counts(layers):
    # test_ogr_xodr_basics + per-layer GetFeatureCount
    assert xodr_layer_names(FIX) == [
        "ReferenceLine", "LaneBorder", "RoadMark", "RoadObject",
        "Lane", "RoadSignal"]
    assert layers["ReferenceLine"].num_rows == 41
    assert layers["LaneBorder"].num_rows == 230
    assert layers["RoadMark"].num_rows == 424
    assert layers["RoadObject"].num_rows == 273
    assert layers["Lane"].num_rows == 174
    assert layers["RoadSignal"].num_rows == 50


def test_srs(layers):
    assert layers["__proj4__"] == ("+proj=utm +zone=32 +ellps=GRS80 "
                                   "+towgs84=0,0,0,0,0,0,0 +units=m +no_defs")


def test_field_schemas(layers):
    t = layers["ReferenceLine"]
    assert [t.schema.field(c).type for c in ("ID", "Length", "Junction")] \
        == [pa.string(), pa.float64(), pa.string()]
    t = layers["LaneBorder"]
    assert [t.schema.field(c).type
            for c in ("ID", "RoadID", "Type", "Predecessor", "Successor")] \
        == [pa.int32(), pa.string(), pa.string(), pa.int32(), pa.int32()]
    t = layers["RoadMark"]
    assert [t.schema.field(c).type for c in ("RoadID", "LaneID", "Type")] \
        == [pa.string(), pa.int32(), pa.string()]
    t = layers["RoadObject"]
    assert all(t.schema.field(c).type == pa.string()
               for c in ("ObjectID", "RoadID", "Type", "Name"))
    t = layers["RoadSignal"]
    assert t.num_columns == 12  # fid + 10 fields + geometry
    assert all(t.schema.field(c).type == pa.string()
               for c in ("SignalID", "RoadID", "Type", "SubType"))
    assert all(t.schema.field(c).type == pa.float64()
               for c in ("HOffset", "Pitch", "Roll"))
    t = layers["Lane"]
    assert t.schema.field("LaneID").type == pa.int32()
    # Lane layer skips centre lanes entirely
    assert 0 not in t["LaneID"].to_pylist()


# --- test_ogr_xodr_geometry_eps goldens (exact to WKT print precision)
_REF_EPS_GOLD = {
    1.0: "618251.572934302 5809506.96459625 102.378603962182,"
         "618254.944363001 5809506.95481165 102.371268481462,"
         "618258.290734177 5809506.56065761 102.363999939623",
    0.1: "618251.572934302 5809506.96459625 102.378603962182,"
         "618254.944363001 5809506.95481165 102.371268481462,"
         "618257.937110798 5809506.62607284 102.364759846201,"
         "618258.290734177 5809506.56065761 102.363999939623",
}


@pytest.mark.parametrize("eps", [1.0, 0.1])
def test_reference_line_geometry_eps(eps):
    lay = read_xodr(FIX, epsilon=eps)
    t = lay["ReferenceLine"]
    assert t["ID"][0].as_py() == "2233498"
    pts = _line_pts(t["geometry"][0].as_py())
    gold = np.array([[float(v) for v in p.split()]
                     for p in _REF_EPS_GOLD[eps].split(",")])
    assert pts.shape == gold.shape
    assert np.abs(pts - gold).max() < 1e-8


def test_lane_tin_golden(layers):
    tris = _tin_tris(layers["Lane"]["geometry"][0].as_py())
    assert len(tris) == 8
    # first and last golden triangles of test_ogr_xodr_geometry_dissolve
    first = np.array([[618251.708293914, 5809503.30115552, 102.206436434521],
                      [618253.406110685, 5809502.59383908, 102.162274831603],
                      [618253.40871869, 5809503.08668632, 102.186041767762]])
    last = np.array([[618256.414547031, 5809502.56472816, 102.151918900654],
                     [618256.354637481, 5809502.1051039, 102.128452978327],
                     [618257.381896193, 5809501.87667676, 102.118091279345]])
    assert np.abs(tris[0] - first).max() < 1e-8
    assert np.abs(tris[-1] - last).max() < 1e-8


def test_lane_dissolved_golden(dissolved):
    ring = _poly_ring(dissolved["Lane"]["geometry"][0].as_py())
    gold = np.array([[float(v) for v in p.split()] for p in (
        "618257.381896193 5809501.87667676 102.118091279345,"
        "618256.354637481 5809502.1051039 102.128452978327,"
        "618254.710111278 5809502.39980074 102.146632509166,"
        "618253.406110685 5809502.59383908 102.162274831603,"
        "618251.726901715 5809502.7975446 102.182768671482,"
        "618251.708293914 5809503.30115552 102.206436434521,"
        "618253.40871869 5809503.08668632 102.186041767762,"
        "618254.735144074 5809502.88656198 102.170637739305,"
        "618256.414547031 5809502.56472816 102.151918900654,"
        "618257.465586929 5809502.30800315 102.140735883984,"
        "618257.381896193 5809501.87667676 102.118091279345").split(",")])
    assert ring.shape == gold.shape
    assert np.abs(ring - gold).max() < 1e-8


def test_roadmark_tin_golden(layers):
    tris = _tin_tris(layers["RoadMark"]["geometry"][0].as_py())
    assert len(tris) == 18
    first = np.array([[618251.72468874, 5809502.85743767, 102.185583413892],
                      [618252.578130818, 5809502.64753279, 102.169882217474],
                      [618252.576002918, 5809502.76737822, 102.175586986359]])
    last = np.array([[618256.884079624, 5809502.05360925, 102.126153745722],
                     [618256.86502563, 5809501.93528991, 102.120031826125],
                     [618257.370482622, 5809501.81785335, 102.11500305465]])
    assert np.abs(tris[0] - first).max() < 1e-8
    assert np.abs(tris[-1] - last).max() < 1e-8


def test_road_signal_dissolved_point(dissolved):
    wkb = dissolved["RoadSignal"]["geometry"][0].as_py()
    assert struct.unpack("<BI", wkb[:5]) == (1, 1001)
    pt = struct.unpack("<ddd", wkb[5:29])
    gold = (618366.942790883, 5809541.22374025, 103.556888074495)
    # the s→parameter chord table differs from the wrapped library by
    # O(2e-7) in parameter on this strongly-curved road — micrometres
    assert max(abs(a - b) for a, b in zip(pt, gold)) < 1e-5


def test_road_signal_tin_vertex_set(layers):
    tris = _tin_tris(layers["RoadSignal"]["geometry"][0].as_py())
    assert len(tris) == 12
    gold_first = np.array(
        [[618366.844654328, 5809540.96164437, 103.568946384872],
         [618366.840967264, 5809541.48457345, 103.54861591048],
         [618367.044614501, 5809540.96290705, 103.56516023851]])
    mine = np.concatenate(tris)
    # all three golden corners appear among the box vertices
    for g in gold_first:
        assert np.min(np.abs(mine - g).max(axis=1)) < 1e-4


def test_lane_border_runs_along_outer_border(layers):
    t = layers["LaneBorder"]
    # first feature: road 2233498 lane -2 (sorted by road id, lane id)
    assert t["RoadID"][0].as_py() == "2233498"
    assert t["ID"][0].as_py() == -2
    pts = _line_pts(t["geometry"][0].as_py())
    # endpoints = dissolved Lane golden's outer-border ends
    assert np.abs(pts[0] - np.array(
        [618251.726901715, 5809502.7975446, 102.182768671482])).max() < 1e-8
    assert np.abs(pts[-1] - np.array(
        [618257.381896193, 5809501.87667676, 102.118091279345])).max() < 1e-8


def test_empty_dataset():
    assert xodr_layer_names(EMPTY) == [
        "ReferenceLine", "LaneBorder", "RoadMark", "RoadObject",
        "Lane", "RoadSignal"]
    lay = read_xodr(EMPTY)
    lay.pop("__proj4__", None)
    assert all(t.num_rows == 0 for t in lay.values())


def test_not_opendrive(tmp_path):
    p = tmp_path / "x.xodr"
    p.write_text("<NotOpenDRIVE/>")
    with pytest.raises(ValueError):
        read_xodr(str(p))


def test_unified_vector_open():
    from gdal_ray.sources.vector_open import open_vector
    lay = open_vector(FIX)
    assert lay["Lane"].num_rows == 174
