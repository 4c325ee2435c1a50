"""Mapbox Vector Tiles reader vs autotest/ogr/ogr_mvt.py goldens."""

import pytest

from gdal_ray.sources.mvt import read_mvt

FIX = "/root/reference/autotest/ogr/data/mvt/"


def test_linestring_tile():
    L = read_mvt(FIX + "linestring/0/0/0.pbf")
    r = list(L.values())[0].to_pylist()[0]
    assert r["wkt"].replace(", ", ",") == \
        ("MULTILINESTRING ((215246.671651058 6281289.23636264,"
         "332653.947097085 6447616.20991119))")
    # without metadata.json the layer stays single-part
    L = read_mvt(FIX + "linestring/0/0/0.pbf", multi=False)
    r = list(L.values())[0].to_pylist()[0]
    assert r["wkt"].startswith("LINESTRING (215246.671651058")


def test_point_polygon_zoom_dir():
    L = read_mvt(FIX + "point_polygon/0")
    pt = L["point"].to_pylist()[0]
    assert pt["wkt"].replace(", ", ",") == \
        "MULTIPOINT ((215246.671651058 6281289.23636264))"
    poly = L["polygon2"].to_pylist()[0]
    exp = ("MULTIPOLYGON (((440277.282922614 450061.222543117,"
           "440277.282922614 -440277.282922614,0 -440277.282922614,"
           "0 -215246.671651058,215246.671651058 -215246.671651058,"
           "215246.671651058 225030.61127156,0 225030.61127156,"
           "0 450061.222543117,440277.282922614 450061.222543117)),"
           "((0 117407.275446031,0 -107623.335825529,"
           "-117407.275446031 -107623.335825529,"
           "-117407.275446031 117407.275446031,0 117407.275446031)),"
           "((107623.335825529 58703.6377230138,"
           "107623.335825529 -48919.6981025115,"
           "48919.6981025115 -48919.6981025115,"
           "48919.6981025115 58703.6377230138,"
           "107623.335825529 58703.6377230138)))")
    assert poly["wkt"].replace(", ", ",") == exp


def test_datatypes():
    """test_ogr_mvt_datatypes value goldens."""
    L = read_mvt(FIX + "datatypes/0/0/0.pbf")
    r = list(L.values())[0].to_pylist()[0]
    assert r["bool_false"] is False and r["bool_true"] is True
    assert r["pos_int_value"] == 1
    assert r["pos_int64_value"] == 123456789012345
    assert r["neg_int_value"] == -1
    assert r["neg_int64_value"] == -123456789012345
    assert r["pos_sint_value"] == 1 and r["neg_sint_value"] == -1
    assert r["pos_sint64_value"] == 123456789012345
    assert r["neg_sint64_value"] == -123456789012345
    assert r["uint_value"] == 2000000000
    assert r["uint64_value"] == 4000000000
    assert r["float_value"] == 1.25
    assert r["real_value"] == 1.23456789
    assert r["string_value"] == "str"


def test_multilinestring_and_mixed():
    L = read_mvt(FIX + "multilinestring/0/0/0.pbf")
    r = list(L.values())[0].to_pylist()[0]
    assert r["wkt"].startswith("MULTILINESTRING ((215246.671651058")
    L = read_mvt(FIX + "mixed/0/0/0.pbf")
    assert len(L) >= 1
    for t in L.values():
        assert t.num_rows >= 1
