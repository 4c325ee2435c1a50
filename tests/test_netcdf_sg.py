"""CF-1.8 Simple Geometries reader vs the reference's own autotest
expectations (autotest/gdrivers/netcdf.py test_bad_cf1_8 ..
test_states_full_layer, fixtures autotest/gdrivers/data/netcdf-sg)."""
import pytest

from gdal_ray.functions.wkb import geom_to_wkt, wkb_to_geom
from gdal_ray.sources.netcdf_sg import read_nc_sg
from gdal_ray.sources.vector_open import open_vector

D = "/root/reference/autotest/gdrivers/data/netcdf-sg"


def _wkts(table, n=None):
    col = table.column("geometry").to_pylist()
    if n is not None:
        col = col[:n]
    return [geom_to_wkt(wkb_to_geom(b)) for b in col]


def test_sg_bad_files_raise():
    # autotest test_bad_cf1_8: every one of these aborts the open
    for f in ("no_geometry_type", "bad_feature_test",
              "missing_node_counts_test", "unequal_xy",
              "corrupted_polygon_ncpncir", "corrupted_polygon_pnc",
              "corrupted_polygon_ir"):
        with pytest.raises(ValueError):
            read_nc_sg(f"{D}/{f}.nc")


def test_sg_point_read():
    r = read_nc_sg(f"{D}/point_test.nc")
    assert list(r) == ["names_geometry"]
    lay = r["names_geometry"]
    assert lay["geom_type"] == "Point"
    assert _wkts(lay["table"]) == [
        "POINT (1 -1)", "POINT (2 -2)", "POINT (3 -3)",
        "POINT (4 -4)", "POINT (5 -5)"]


def test_sg_point3d_read():
    lay = read_nc_sg(f"{D}/point3D_test.nc")["names_geometry"]
    assert _wkts(lay["table"]) == [
        "POINT Z (1 -1 1)", "POINT Z (2 -2 -2)", "POINT Z (3 -3 3)",
        "POINT Z (4 -4 -4)", "POINT Z (5 -5 5)"]


def test_sg_multipoint_read():
    lay = read_nc_sg(f"{D}/multipoint_test.nc")["names_geometry"]
    assert lay["geom_type"] == "MultiPoint"
    assert _wkts(lay["table"], 2) == [
        "MULTIPOINT ((1 -1), (2 -2), (3 -3), (4 -4))",
        "MULTIPOINT ((5 -5), (6 -6), (7 -7), (8 -8))"]


def test_sg_line_read():
    lay = read_nc_sg(f"{D}/line_test.nc")["names_geometry"]
    assert lay["geom_type"] == "LineString"
    assert _wkts(lay["table"], 2) == [
        "LINESTRING (1 -1, 2 -2, 3 -3, 4 -4)",
        "LINESTRING (5 -5, 6 -6, 7 -7, 8 -8)"]


def test_sg_multiline_read():
    lay = read_nc_sg(f"{D}/multiline_test.nc")["names_geometry"]
    assert lay["geom_type"] == "MultiLineString"
    assert _wkts(lay["table"], 2) == [
        "MULTILINESTRING ((1 -1), (2 -2, 3 -3, 4 -4))",
        "MULTILINESTRING ((5 -5, 6 -6, 7 -7, 8 -8))"]


def test_sg_polygon_read():
    lay = read_nc_sg(f"{D}/polygon_test.nc")["names_geometry"]
    assert lay["geom_type"] == "Polygon"
    assert _wkts(lay["table"]) == [
        "POLYGON ((0 0, 1 0, 1 1, 0 0))",
        "POLYGON ((3 0, 4 0, 4 1, 3 1, 3 0))"]


def test_sg_polygon3d_read():
    lay = read_nc_sg(f"{D}/polygon3D_test.nc")["names_geometry"]
    assert _wkts(lay["table"]) == [
        "POLYGON Z ((0 0 1, 1 0 2, 1 1 2, 0 0 1))",
        "POLYGON Z ((3 0 1, 4 0 1, 4 1 1, 3 1 1, 3 0 1))"]


def test_sg_multipolygon_read():
    lay = read_nc_sg(f"{D}/multipolygon_test.nc")["names_geometry"]
    assert lay["geom_type"] == "MultiPolygon"
    assert _wkts(lay["table"]) == [
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
        "MULTIPOLYGON (((3 0, 4 0, 4 1, 3 0)), ((3 0, 4 1, 3 1, 3 0)))"]


def test_sg_multipolygon3d_read():
    lay = read_nc_sg(f"{D}/multipolygon3D_test.nc")["names_geometry"]
    assert _wkts(lay["table"]) == [
        "MULTIPOLYGON Z (((0 0 0, 1 0 5, 1 1 5, 0 0 0)))",
        "MULTIPOLYGON Z (((3 0 5, 4 0 10, 4 1 10, 3 0 5)), "
        "((3 0 10, 4 1 15, 3 1 15, 3 0 10)))"]


def test_sg_serpenski_interior_ring():
    # interior_ring groups shell + hole into ONE member polygon
    lay = read_nc_sg(f"{D}/serpenski_2nd.nc")["serpenski"]
    assert lay["geom_type"] == "MultiPolygon"
    assert lay["table"].num_rows == 1
    assert _wkts(lay["table"]) == [
        "MULTIPOLYGON (((0 0, 1 0, 0.5 0.866025403784439, 0 0), "
        "(0.5 0, 0.75 0.433012701892219, 0.25 0.433012701892219, 0.5 0)))"]


def test_sg_serpenski3d():
    lay = read_nc_sg(f"{D}/serpenski3D_2nd.nc")["serpenski"]
    assert _wkts(lay["table"]) == [
        "MULTIPOLYGON Z (((0 0 1, 1 0 1, 0.5 0.866025403784439 1, 0 0 1), "
        "(0.5 0 1, 0.75 0.433012701892219 1, 0.25 0.433012701892219 1, "
        "0.5 0 1)))"]


def test_sg_flipped_and_arbitrary_axes():
    lay = read_nc_sg(f"{D}/flipped_axes_test.nc")["names_geometry"]
    assert _wkts(lay["table"], 1) == ["POLYGON ((0 0, 1 0, 1 1, 0 0))"]
    lay = read_nc_sg(f"{D}/arbitrary_axis_order_test.nc")["names_geometry"]
    assert _wkts(lay["table"]) == [
        "POLYGON Z ((0 0 1, 1 0 2, 1 1 2, 0 0 1))",
        "POLYGON Z ((3 0 1, 4 0 1, 4 1 1, 3 1 1, 3 0 1))"]


def test_sg_multiple_containers():
    r = read_nc_sg(f"{D}/multiple_containers.nc")
    assert set(r) == {"serpenski", "serpenski_outline"}
    assert r["serpenski"]["geom_type"] == "MultiPolygon"
    assert r["serpenski_outline"]["geom_type"] == "MultiLineString"
    assert _wkts(r["serpenski_outline"]["table"]) == [
        "MULTILINESTRING ((0 0, 1 0, 0.5 0.866025403784439, 0 0), "
        "(0.5 0, 0.75 0.433012701892219, 0.25 0.433012701892219, 0.5 0))"]


def test_sg_yahara():
    lay = read_nc_sg(f"{D}/Yahara_alb.nc")["geometry_container"]
    t = lay["table"]
    assert t.num_rows == 71
    assert lay["geom_type"] == "MultiPolygon"
    assert t.column("ID")[0].as_py() == 1
    assert t.column("GRIDCODE")[0].as_py() == 55
    assert t.column("X_COORD")[0].as_py() == 577251.43302
    assert t.column("Y_COORD")[0].as_py() == 319799.04918
    gm = lay["grid_mapping"]
    assert gm["grid_mapping_name"] == "albers_conical_equal_area"
    assert gm["latitude_of_projection_origin"] == 23.0
    assert gm["longitude_of_central_meridian"] == -96.0
    assert gm["standard_parallel"] == [29.5, 45.5]


def test_sg_states_full_layer():
    lay = read_nc_sg(f"{D}/cf1.8_states.nc")["geometry_container"]
    t = lay["table"]
    assert t.num_rows == 49
    assert lay["geom_type"] == "MultiPolygon"
    assert t.column("STATE_NAME")[1].as_py() == "Montana"
    assert t.column("DRAWSEQ")[1].as_py() == 3
    assert t.column("STATE_FIPS")[1].as_py() == "30"
    assert t.column("STATE_ABBR")[1].as_py() == "MT"


def test_sg_open_vector():
    layers = open_vector(f"{D}/cf1.8_states.nc")
    assert list(layers) == ["geometry_container"]
    assert layers["geometry_container"].num_rows == 49
