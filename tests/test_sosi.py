"""SOSI driver vs autotest/ogr/ogr_sosi.py (local-fixture tests 2-4)."""

import pyarrow as pa
import pytest

from gdal_ray.functions.wkb import wkb_to_geom
from gdal_ray.sources.sosi import read_sosi, sosi2epsg

FIX = "/root/reference/autotest/ogr/data/sosi/test_duplicate_fields.sos"


@pytest.fixture(scope="module")
def layers():
    return read_sosi(FIX)


def test_sosi_layer_counts(layers):
    # test_ogr_sosi_2: layer 0 = 17 features, layer 1 = 1 feature
    names = [n for n in layers if n != "__epsg__"]
    assert names == ["lines", "polygons"]
    assert layers["lines"].num_rows == 17
    assert layers["polygons"].num_rows == 1


def test_sosi_duplicate_field_first_wins(layers):
    # default: std::map::insert keeps the FIRST BEITEBRUKERID
    assert layers["polygons"]["reinbeitebrukerID"].to_pylist() == ["YD"]


def test_sosi_append_fields_map():
    # test_ogr_sosi_3 / _4: appendFieldsMap joins duplicates
    l2 = read_sosi(FIX, append_fields_map="BEITEBRUKERID&OPPHAV")
    assert l2["polygons"]["reinbeitebrukerID"].to_pylist() == ["YD,YG"]
    l3 = read_sosi(FIX, append_fields_map="BEITEBRUKERID:;&OPPHAV:;")
    assert l3["polygons"]["reinbeitebrukerID"].to_pylist() == ["YD;YG"]


def test_sosi_kvalitet_composite(layers):
    # KVALITET "55 1500" -> 6-element composite, first two set
    pol = layers["polygons"]
    assert pol["målemetode"].to_pylist() == [55]
    assert pol["nøyaktighet"].to_pylist() == [1500]
    assert pol["synbarhet"].to_pylist() == [None]


def test_sosi_objtype_field(layers):
    assert layers["polygons"]["objekttypenavn"].to_pylist() == ["Flyttelei"]
    assert set(layers["lines"]["objekttypenavn"].to_pylist()) == \
        {"FlytteleiGrense"}


def test_sosi_quoted_string(layers):
    # OPPHAV "Asplan Viak AS" -> quotes stripped
    vals = set(layers["lines"]["opphav"].to_pylist())
    assert "Asplan Viak AS" in vals
    assert "Reindriftsforvaltningen" in vals


def test_sosi_flate_ring_assembly(layers):
    g = wkb_to_geom(layers["polygons"]["geometry"][0].as_py())
    assert g.name == "Polygon"
    ring = g.rings[0]
    # closed ring stitched from the 17 referenced curves
    assert (ring[0] == ring[-1]).all()
    assert len(ring) > 100


def test_sosi_coordinates_scaled(layers):
    # ENHET 0.01: raw 783117305 83001968 -> (830019.68, 7831173.05)
    g = wkb_to_geom(layers["lines"]["geometry"][0].as_py())
    assert abs(g.rings[0][0, 0] - 830019.68) < 1e-9
    assert abs(g.rings[0][0, 1] - 7831173.05) < 1e-9


def test_sosi_epsg(layers):
    # KOORDSYS 23 -> EPSG 3045 (ogrsosidatasource.cpp:83)
    assert layers["__epsg__"] == 3045
    assert sosi2epsg(84) == 4326
    assert sosi2epsg(33) == 23033
    assert sosi2epsg(5) == 27395
