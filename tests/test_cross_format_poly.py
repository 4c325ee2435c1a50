"""Cross-format conformance: the reference ships its canonical
'poly' dataset (10 polygons, AREA/EAS_ID/PRFEDEA) as Shapefile
(ogr/data/poly.shp), GeoPackage (gpkg/poly_golden.gpkg, + the 1.4
variant) and FlatGeobuf (testfgb/poly.fgb).  Three independent
readers over three independent reference encodings must agree
bit-level on every vertex and attribute."""
import os

import numpy as np
import pytest

from gdal_ray.functions.wkb import wkb_to_geom
from gdal_ray.sources.fgb import read_fgb
from gdal_ray.sources.gpkg import read_gpkg_layer
from gdal_ray.sources.shapefile import read_shapefile

BASE = "/root/reference/autotest/ogr/data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{BASE}/poly.shp"),
    reason="reference fixtures unavailable")


def _tables():
    return {
        "shp": read_shapefile(f"{BASE}/poly.shp"),
        "gpkg": read_gpkg_layer(f"{BASE}/gpkg/poly_golden.gpkg", "poly"),
        "gpkg14": read_gpkg_layer(
            f"{BASE}/gpkg/poly_golden_gpkg_1_4.gpkg", "poly"),
        "fgb": read_fgb(f"{BASE}/testfgb/poly.fgb"),
    }


def _by_eas(t):
    return {int(e): i for i, e in enumerate(t["EAS_ID"].to_pylist())}


def test_same_rows_and_attributes():
    tabs = _tables()
    keys = None
    for name, t in tabs.items():
        assert t.num_rows == 10, name
        k = set(_by_eas(t))
        if keys is None:
            keys = k
        assert k == keys, name
    ref = tabs["shp"]
    kr = _by_eas(ref)
    for name, t in tabs.items():
        km = _by_eas(t)
        for e in kr:
            # the original poly.dbf stores AREA=-596610.313 for EAS 165
            # (raw record verified); the later gpkg/fgb derivations
            # carry the cleaned positive value — compare magnitudes
            assert abs(t["AREA"][km[e]].as_py()) == \
                abs(ref["AREA"][kr[e]].as_py()), (name, e)
            assert t["PRFEDEA"][km[e]].as_py() == \
                ref["PRFEDEA"][kr[e]].as_py(), (name, e)
    assert ref["AREA"][kr[165]].as_py() == -596610.313
    assert tabs["fgb"]["AREA"][_by_eas(tabs["fgb"])[165]].as_py() \
        == 596610.313


def test_same_geometry_vertices():
    tabs = _tables()
    ref = tabs.pop("shp")
    kr = _by_eas(ref)
    for name, t in tabs.items():
        km = _by_eas(t)
        for e in kr:
            a = np.vstack(wkb_to_geom(
                ref["geometry"][kr[e]].as_py()).rings)
            b = np.vstack(wkb_to_geom(
                t["geometry"][km[e]].as_py()).rings)
            assert a.shape == b.shape, (name, e)
            np.testing.assert_allclose(a, b, rtol=0, atol=0,
                                       err_msg=f"{name}/{e}")


def test_envelopes_agree():
    tabs = _tables()
    for name, t in tabs.items():
        assert min(t["bbox_xmin"].to_pylist()) == 478315.53125, name
        assert max(t["bbox_xmax"].to_pylist()) == 481645.3125, name
        assert min(t["bbox_ymin"].to_pylist()) == 4762880.5, name
        assert max(t["bbox_ymax"].to_pylist()) == 4765610.5, name
