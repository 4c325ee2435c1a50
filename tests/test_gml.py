"""GML driver vs the reference's own fixture expectations
(autotest/ogr/data/gml/expected_gml_gml3.gml: urn srsName axis swap,
per-layer feature elements) + roundtrips."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.wkb import geom_to_wkb, wkb_to_geom, wkt_to_geom
from gdal_ray.sources.gml import read_gml, write_gml

GML3 = "/root/reference/autotest/ogr/data/gml/expected_gml_gml3.gml"


def test_gml3_urn_axis_swap_golden():
    layers = read_gml(GML3)
    lyr = layers["firstlayer"]
    assert lyr.num_rows == 2
    assert lyr["gml_id"].to_pylist() == ["firstlayer.0", "firstlayer.1"]
    g0 = wkb_to_geom(lyr["geometry"].to_pylist()[0])
    # urn:ogc:def:crs:EPSG::4326 -> lat/lon order swapped to x=lon
    np.testing.assert_allclose(g0.rings[0][0], [2.0, 49.0])
    g1 = wkb_to_geom(lyr["geometry"].to_pylist()[1])
    np.testing.assert_allclose(g1.rings[0][0], [3.0, 48.0])
    assert lyr["string_field"].to_pylist() == [None, "foo"]


def test_gml2_coordinates_no_swap():
    xml = b"""<?xml version="1.0"?>
<ogr:FeatureCollection xmlns:ogr="http://ogr.maptools.org/"
 xmlns:gml="http://www.opengis.net/gml">
 <gml:featureMember>
  <ogr:roads fid="roads.1">
   <ogr:geometryProperty><gml:LineString srsName="EPSG:32631">
    <gml:coordinates>10,20 30,40 50,60</gml:coordinates>
   </gml:LineString></ogr:geometryProperty>
   <ogr:lanes>4</ogr:lanes>
   <ogr:len>12.5</ogr:len>
  </ogr:roads>
 </gml:featureMember>
</ogr:FeatureCollection>"""
    lyr = read_gml(xml)["roads"]
    assert lyr["lanes"].type == pa.int64()
    assert lyr["len"].type == pa.float64()
    g = wkb_to_geom(lyr["geometry"].to_pylist()[0])
    assert g.kind == 2
    np.testing.assert_allclose(g.rings[0],
                               [[10, 20], [30, 40], [50, 60]])


def test_roundtrip_polygon_holes_and_multi(tmp_path):
    wkts = [
        "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
        "((4 4, 6 4, 6 6, 4 6, 4 4)))",
        "POINT (7.25 -3.5)",
        "MULTIPOINT (1 1, 2 2)",
        "LINESTRING (0 0, 5 5)",
    ]
    t = pa.table({
        "kindname": pa.array(["poly", "multipoly", "pt", "mpt", "ln"],
                             pa.string()),
        "rank": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "geometry": pa.array([geom_to_wkb(wkt_to_geom(w)) for w in wkts],
                             pa.binary()),
    })
    p = str(tmp_path / "layer.gml")
    write_gml(p, t, layer_name="zones")
    back = read_gml(p)["zones"]
    assert back["kindname"].to_pylist() == t["kindname"].to_pylist()
    assert back["rank"].to_pylist() == [1, 2, 3, 4, 5]
    for i, w in enumerate(wkts):
        got = wkb_to_geom(back["geometry"].to_pylist()[i])
        want = wkt_to_geom(w)
        assert got.kind == want.kind, w
        assert got.poly_ring_counts == want.poly_ring_counts
        for ra, rb in zip(got.rings, want.rings):
            np.testing.assert_allclose(ra, rb)


def test_multisurface_read():
    xml = b"""<?xml version="1.0"?>
<ogr:FeatureCollection xmlns:ogr="http://ogr.maptools.org/"
 xmlns:gml="http://www.opengis.net/gml">
 <gml:featureMember>
  <ogr:a gml:id="a.0" xmlns:gml="http://www.opengis.net/gml">
   <ogr:geom><gml:MultiSurface><gml:surfaceMember>
     <gml:Polygon><gml:exterior><gml:LinearRing>
      <gml:posList>0 0 4 0 4 4 0 4 0 0</gml:posList>
     </gml:LinearRing></gml:exterior></gml:Polygon>
   </gml:surfaceMember></gml:MultiSurface></ogr:geom>
  </ogr:a>
 </gml:featureMember>
</ogr:FeatureCollection>"""
    g = wkb_to_geom(read_gml(xml)["a"]["geometry"].to_pylist()[0])
    assert g.kind == 6
    assert g.poly_ring_counts == [1]
    np.testing.assert_allclose(g.rings[0][2], [4, 4])
