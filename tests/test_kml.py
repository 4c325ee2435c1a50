"""KML driver vs the reference's own expectations
(autotest/ogr/ogr_kml.py on data/kml/samples.kml) + roundtrips."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.wkb import geom_to_wkb, wkb_to_geom, wkt_to_geom
from gdal_ray.sources.kml import read_kml, write_kml

SAMPLES = "/root/reference/autotest/ogr/data/kml/samples.kml"


@pytest.fixture(scope="module")
def samples():
    return read_kml(SAMPLES)


def test_placemarks_attributes(samples):
    # ogr_kml.py test_ogr_kml_attributes_1
    lyr = samples["Placemarks"]
    names = lyr["Name"].to_pylist()
    descs = lyr["description"].to_pylist()
    assert names[0] == "Simple placemark"
    assert descs[0].startswith("Attached to the ground.")
    assert names[1] == "Floating placemark"
    assert descs[1] == "Floats a defined distance above the ground."
    assert names[2] == "Extruded placemark"


def test_highlighted_icon_layer(samples):
    # ogr_kml.py test_ogr_kml_attributes_2
    lyr = samples["Highlighted Icon"]
    assert lyr.num_rows == 1
    assert lyr["Name"].to_pylist()[0] == "Roll over this icon"
    assert lyr["description"].to_pylist()[0] == ""


def test_point_read_golden(samples):
    # ogr_kml.py test_ogr_kml_point_read: first three points incl. Z
    lyr = samples["Placemarks"]
    g = wkb_to_geom(lyr["geometry"].to_pylist()[0])
    np.testing.assert_allclose(
        g.rings[0][0], [-122.0822035425683, 37.42228990140251])
    assert g.zs is not None and g.zs[0][0] == 0
    g2 = wkb_to_geom(lyr["geometry"].to_pylist()[1])
    np.testing.assert_allclose(g2.rings[0][0],
                               [-122.084075, 37.4220033612141])
    assert g2.zs[0][0] == 50


def test_linestring_read_golden(samples):
    # ogr_kml.py test_ogr_kml_linestring_read (layer "Paths")
    lyr = samples["Paths"]
    g = wkb_to_geom(lyr["geometry"].to_pylist()[0])
    assert g.kind == 2
    np.testing.assert_allclose(
        g.rings[0][0], [-112.081423783034495, 36.106778704771372])
    np.testing.assert_allclose(
        g.rings[0][-1], [-112.087026775269294, 36.0905099328766])


def test_polygon_read_golden(samples):
    # ogr_kml.py test_ogr_kml_polygon_read (layer "Google Campus")
    lyr = samples["Google Campus"]
    g = wkb_to_geom(lyr["geometry"].to_pylist()[0])
    assert g.kind == 3
    np.testing.assert_allclose(
        g.rings[0][0], [-122.084893845961204, 37.422571240447859])
    assert g.zs[0][0] == 17


def test_write_read_roundtrip(tmp_path):
    wkts = ["POINT (1 2)",
            "LINESTRING (0 0, 1 1, 2 0)",
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"]
    t = pa.table({
        "Name": pa.array([f"f{i}" for i in range(3)], pa.string()),
        "description": pa.array(["a & b", "<c>", ""], pa.string()),
        "grade": pa.array(["7", "8", "9"], pa.string()),
        "geometry": pa.array([geom_to_wkb(wkt_to_geom(w)) for w in wkts],
                             pa.binary()),
    })
    p = str(tmp_path / "out.kml")
    write_kml(p, t, layer_name="zone A")
    back = read_kml(p)["zone A"]
    assert back["Name"].to_pylist() == ["f0", "f1", "f2"]
    assert back["description"].to_pylist() == ["a & b", "<c>", ""]
    assert back["grade"].to_pylist() == ["7", "8", "9"]
    for i, w in enumerate(wkts):
        got = wkb_to_geom(back["geometry"].to_pylist()[i])
        want = wkt_to_geom(w)
        assert got.kind == want.kind
        for ra, rb in zip(got.rings, want.rings):
            np.testing.assert_allclose(ra, rb)


def test_multigeometry_roundtrip(tmp_path):
    w = ("MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
         "((5 5, 6 5, 6 6, 5 6, 5 5)))")
    t = pa.table({"Name": pa.array(["m"], pa.string()),
                  "geometry": pa.array([geom_to_wkb(wkt_to_geom(w))],
                                       pa.binary())})
    p = str(tmp_path / "multi.kml")
    write_kml(p, t, layer_name="L", desc_col=None)
    g = wkb_to_geom(read_kml(p)["L"]["geometry"].to_pylist()[0])
    assert g.kind == 6
    assert g.poly_ring_counts == [1, 1]
    np.testing.assert_allclose(g.rings[1][0], [5, 5])
