"""OGR VRT driver conformance — expectations are the reference's own
(autotest/ogr/ogr_vrt.py tests 2/3/7/8/17/SrcRegion_clip/29/30) plus
open_vector dispatch checks."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.wkb import (geom_to_wkt, points_to_wkb,
                                    wkb_to_geom, wkb_to_points)
from gdal_ray.sources.ogrvrt import read_ogrvrt
from gdal_ray.sources.vector_open import open_vector

OGR = "/root/reference/autotest/ogr"


@pytest.fixture(scope="module")
def vrt_layers():
    return read_ogrvrt(f"{OGR}/data/vrt/vrt_test.vrt")


def test_vrt_point_from_columns(vrt_layers):
    """ogr_vrt_2: x/y/z columns + FID = feature index."""
    t = vrt_layers["test2"]
    assert t["other"].to_pylist() == ["First", "Second"]
    assert t["fid"].to_pylist() == [0, 1]
    g0 = wkb_to_geom(t["geometry"][0].as_py())
    assert geom_to_wkt(g0) == "POINT Z (12.5 17 1.2)"
    g1 = wkb_to_geom(t["geometry"][1].as_py())
    assert geom_to_wkt(g1) == "POINT Z (100 200 0)"
    # extent check (ogr_vrt_2)
    xs, ys = [], []
    for b in t["geometry"].to_pylist():
        g = wkb_to_geom(b)
        xs.append(g.rings[0][0, 0])
        ys.append(g.rings[0][0, 1])
    assert (min(xs), max(xs), min(ys), max(ys)) == \
        (12.5, 100.0, 17.0, 200.0)


def test_vrt_wkt_column_and_fid(vrt_layers):
    """ogr_vrt_3: WKT column geometry + FID from attribute."""
    t = vrt_layers["test3"]
    assert t["fid"].to_pylist() == [1, 2]
    g = wkb_to_geom(t["geometry"][0].as_py())
    assert g.rings[0][0, 0] == 12.5 and g.rings[0][0, 1] == 17.0
    assert g.zs is not None and g.zs[0][0] == 1.2


def test_vrt_srcsql(vrt_layers):
    """ogr_vrt_7: SrcSQL SELECT * FROM flat."""
    t = vrt_layers["test4"]
    assert t["other"].to_pylist() == ["First", "Second"]
    assert t["fid"].to_pylist() == [1, 2]


def test_vrt_field_projection(vrt_layers):
    """test6: explicit <Field name="x"/> restricts the schema."""
    assert vrt_layers["test6"].column_names == ["fid", "x"]


def test_vrt_inline_nested(vrt_layers):
    """test8: inline CDATA nested OGRVRTDataSource source."""
    t = vrt_layers["test8"]
    assert t.num_rows == 2
    assert t["other"].to_pylist() == ["First", "Second"]


def test_vrt_inline_xml_open():
    """ogr_vrt_8: whole VRT contents as the 'filename'."""
    xml = ('<OGRVRTDataSource><OGRVRTLayer name="test4">'
           f'<SrcDataSource relativeToVRT="0">{OGR}/data/flat.dbf'
           '</SrcDataSource><SrcSQL>SELECT * FROM flat</SrcSQL>'
           '<FID>fid</FID><GeometryType>wkbPoint</GeometryType>'
           '<GeometryField encoding="PointFromColumns" x="x" y="y" '
           'z="z"/></OGRVRTLayer></OGRVRTDataSource>')
    t = read_ogrvrt(xml)["test4"]
    assert t["fid"].to_pylist() == [1, 2]
    assert t["other"].to_pylist() == ["First", "Second"]


def test_vrt_shp_passthrough():
    """poly_vrt.vrt: direct shapefile passthrough."""
    t = read_ogrvrt(f"{OGR}/data/vrt/poly_vrt.vrt")["poly"]
    assert t.num_rows == 10
    assert "EAS_ID" in t.column_names and "geometry" in t.column_names


def test_vrt_explicit_fields():
    """ogr_vrt_17: Field name/src/type projections over CSV."""
    xml = f"""
<OGRVRTDataSource>
    <OGRVRTLayer name="test">
        <SrcDataSource relativeToVRT="0">{OGR}/data/prime_meridian.csv</SrcDataSource>
        <SrcLayer>prime_meridian</SrcLayer>
        <Field name="pm_code" src="PRIME_MERIDIAN_CODE" type="integer" width="4" />
        <Field name="prime_meridian_name" width="24" />
        <Field name="new_col" type="Real" width="12" precision="3" />
        <Field name="DEPRECATED" type="Integer" subtype="Boolean" />
    </OGRVRTLayer>
</OGRVRTDataSource>"""
    t = read_ogrvrt(xml)["test"]
    assert t.column_names == ["fid", "pm_code", "prime_meridian_name",
                              "new_col", "DEPRECATED"]
    assert t["pm_code"].type == pa.int32()
    assert t["new_col"].type == pa.float64()
    assert t["pm_code"][0].as_py() == 8901
    assert t["prime_meridian_name"][0].as_py() == "Greenwich"
    assert t["new_col"][0].as_py() is None


def test_vrt_srcregion_clip():
    """ogr_vrt_SrcRegion_clip: LINESTRING clipped to the region."""
    d = tempfile.mkdtemp()
    with open(f"{d}/test.csv", "w") as f:
        f.write('wkt_geom,val1,val2\n"LINESTRING (-1 0.5,1.5 0.5)",,\n')
    xml = f"""
<OGRVRTDataSource>
    <OGRVRTLayer name="test">
        <SrcDataSource relativeToVRT="0">{d}/test.csv</SrcDataSource>
        <SrcLayer>test</SrcLayer>
        <GeometryField encoding="WKT" field="wkt_geom"/>
        <SrcRegion clip="true">POLYGON((0 0,0 1,1 1,1 0,0 0))</SrcRegion>
    </OGRVRTLayer>
</OGRVRTDataSource>"""
    t = read_ogrvrt(xml)["test"]
    assert geom_to_wkt(wkb_to_geom(t["geometry"][0].as_py())) == \
        "LINESTRING (0 0.5, 1 0.5)"


def _write_grid_shp(d, name, x0, fields):
    pts = [(x0 + i / 5.0, 49 + j / 5.0)
           for i in range(5) for j in range(5)]
    cols = {"geometry": pa.array(
        points_to_wkb(np.array([p[0] for p in pts]),
                      np.array([p[1] for p in pts])), pa.binary())}
    cols.update(fields)
    from gdal_ray.sources.shapefile import write_shapefile

    write_shapefile(f"{d}/{name}", pa.table(cols))


def test_vrt_union_layer():
    """ogr_vrt_30: union schema merge + extent."""
    d = tempfile.mkdtemp()
    _write_grid_shp(d, "ogr_vrt_30_1", 2, {
        "id1": pa.array(range(25), pa.int32()),
        "id2": pa.array([100 + i for i in range(25)], pa.int32())})
    _write_grid_shp(d, "ogr_vrt_30_2", 4, {
        "id2": pa.array([200 + i for i in range(25)], pa.int64()),
        "id3": pa.array([300 + i for i in range(25)], pa.int32())})
    xml = f"""<OGRVRTDataSource>
    <OGRVRTUnionLayer name="union_layer">
        <OGRVRTLayer name="ogr_vrt_30_1">
            <SrcDataSource>{d}/ogr_vrt_30_1.shp</SrcDataSource>
        </OGRVRTLayer>
        <OGRVRTLayer name="ogr_vrt_30_2">
            <SrcDataSource>{d}/ogr_vrt_30_2.shp</SrcDataSource>
        </OGRVRTLayer>
    </OGRVRTUnionLayer>
</OGRVRTDataSource>"""
    t = read_ogrvrt(xml)["union_layer"]
    assert t.num_rows == 50
    x, y = wkb_to_points(t["geometry"].to_pylist())
    assert (x.min(), x.max()) == (2.0, pytest.approx(4.8))
    assert (y.min(), y.max()) == (49.0, pytest.approx(49.8))
    assert {"id1", "id2", "id3"} <= set(t.column_names)
    assert t["id3"].null_count == 25
    assert t["id2"].to_pylist()[0] == 100
    assert t["id2"].to_pylist()[25] == 200


def test_vrt_warped_layer():
    """ogr_vrt_29: TargetSRS reprojection + error cases."""
    d = tempfile.mkdtemp()
    _write_grid_shp(d, "w", 2, {"id": pa.array(range(25), pa.int32())})
    xml = f"""<OGRVRTDataSource>
    <OGRVRTWarpedLayer>
        <OGRVRTLayer name="w">
            <SrcDataSource>{d}/w.shp</SrcDataSource>
            <LayerSRS>WGS84</LayerSRS>
        </OGRVRTLayer>
        <TargetSRS>EPSG:32631</TargetSRS>
    </OGRVRTWarpedLayer>
</OGRVRTDataSource>"""
    t, metas = read_ogrvrt(xml, with_meta=True)
    x, y = wkb_to_points(t["w"]["geometry"].to_pylist())
    # POINT(2 49) -> EPSG:32631 (the autotest's expected projection)
    assert x[0] == pytest.approx(426857.988, abs=1)
    assert y[0] == pytest.approx(5427937.523, abs=1)
    assert metas["w"]["srs"] == "EPSG:32631"
    # missing TargetSRS
    with pytest.raises(ValueError, match="TargetSRS"):
        read_ogrvrt(f"""<OGRVRTDataSource><OGRVRTWarpedLayer>
            <OGRVRTLayer name="w"><SrcDataSource>{d}/w.shp</SrcDataSource></OGRVRTLayer>
            </OGRVRTWarpedLayer></OGRVRTDataSource>""")
    # non-spatial source
    with pytest.raises(ValueError, match="not spatial"):
        read_ogrvrt(f"""<OGRVRTDataSource><OGRVRTWarpedLayer>
            <OGRVRTLayer name="flat"><SrcDataSource>{OGR}/data/flat.dbf</SrcDataSource></OGRVRTLayer>
            <TargetSRS>EPSG:32631</TargetSRS>
            </OGRVRTWarpedLayer></OGRVRTDataSource>""")


def test_open_vector_dispatch():
    t = open_vector(f"{OGR}/data/poly.shp")
    assert t["poly"].num_rows == 10
    t = open_vector(f"{OGR}/data/flat.dbf")["flat"]
    assert t["other"].to_pylist() == ["First", "Second"]
    assert "geometry" not in t.column_names
    t = open_vector(f"{OGR}/data/vrt/poly_vrt.vrt")
    assert t["poly"].num_rows == 10
