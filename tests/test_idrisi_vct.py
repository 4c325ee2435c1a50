"""Idrisi vector (.vct) reader vs the reference's own autotest
expectations (autotest/ogr/ogr_idrisi.py test_ogr_idrisi_1/2/3)."""
import pyarrow as pa

from gdal_ray.functions.wkb import geom_to_wkt, wkb_to_geom
from gdal_ray.sources.idrisi_vct import read_vct
from gdal_ray.sources.vector_open import open_vector

DATA = "/root/reference/autotest/ogr/data/idrisi"


def _wkts(t: pa.Table) -> list[str]:
    return [geom_to_wkt(wkb_to_geom(b), precision=15)
            for b in t.column("geometry").to_pylist()]


def test_idrisi_points():
    # autotest/ogr/ogr_idrisi.py:26-95 (test_ogr_idrisi_1)
    r = read_vct(f"{DATA}/points.vct")
    t = r["table"]
    assert r["geom_type"] == "Point"
    assert t.num_rows == 2
    assert r["extent"] == (400000.0, 600000.0, 4000000.0, 5000000.0)
    # field 1 is IntegerField of type Integer
    assert t.column_names[3] == "IntegerField"
    assert t.column("IntegerField").type == pa.int64()
    assert t.column("id").to_pylist() == [1.0, 2.0]
    assert t.column("IntegerField").to_pylist() == [2, 3]
    assert t.column("RealField").to_pylist() == [3.45, 4.56]
    assert t.column("StringField").to_pylist() == ["foo", "bar"]
    assert _wkts(t) == ["POINT (400000 5000000)", "POINT (600000 4000000)"]
    # UTM-31N ref system resolves to the TM parameters the autotest pins
    srs = r["srs"]
    assert srs["projection"] == "Transverse_Mercator"
    assert srs["central_meridian"] == 3
    assert srs["scale_factor"] == 0.9996
    assert srs["false_easting"] == 500000.0
    assert srs["epsg"] == 32631


def test_idrisi_lines():
    # autotest/ogr/ogr_idrisi.py:102-144 (test_ogr_idrisi_2)
    r = read_vct(f"{DATA}/lines.vct")
    t = r["table"]
    assert r["geom_type"] == "LineString"
    assert t.num_rows == 2
    assert r["extent"] == (400000.0, 600000.0, 4000000.0, 5000000.0)
    assert t.column("id").to_pylist() == [10.0, 20.0]
    assert _wkts(t) == [
        "LINESTRING (400000 5000000, 600000 4500000)",
        "LINESTRING (450000 4000000, 550000 4500000)",
    ]


def test_idrisi_polygons():
    # autotest/ogr/ogr_idrisi.py:151-190 (test_ogr_idrisi_3)
    r = read_vct(f"{DATA}/polygons.vct")
    t = r["table"]
    assert r["geom_type"] == "Polygon"
    assert t.num_rows == 2
    assert t.column("id").to_pylist() == [1.0, 2.0]
    assert _wkts(t) == [
        "POLYGON ((400000 4000000, 400000 5000000, 600000 5000000, "
        "600000 4000000, 400000 4000000), (450000 4250000, 450000 4750000, "
        "550000 4750000, 550000 4250000, 450000 4250000))",
        "POLYGON ((400000 4000000, 400000 5000000, 600000 5000000, "
        "600000 4000000, 400000 4000000))",
    ]


def test_idrisi_open_vector():
    layers = open_vector(f"{DATA}/points.vct")
    assert list(layers) == ["points"]
    t = layers["points"]
    assert t.column("fid").to_pylist() == [1, 2]
    assert "geometry" in t.column_names
