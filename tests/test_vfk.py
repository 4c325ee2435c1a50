"""Czech VFK cadastre reader vs ogr_vfk.py goldens."""

import pyarrow.compute as pc
import pytest

from gdal_ray.sources.vfk import read_vfk


@pytest.fixture(scope="module")
def vfk():
    return read_vfk("/root/reference/autotest/ogr/data/vfk/bylany.vfk")


def test_layer_structure(vfk):
    """test_ogr_vfk_1: 61 layers, PAR first with 28 fields and one
    feature."""
    names = list(vfk)
    assert len(names) == 61
    assert names[0] == "PAR"
    assert vfk["PAR"].num_columns == 28
    assert vfk["PAR"].num_rows == 1
    assert names[43] == "SOBR"


def test_sobr_points(vfk):
    """test_ogr_vfk_3: SOBR attribute filter CISLO_BODU=55."""
    t = vfk["SOBR"]
    f = t.filter(pc.equal(pc.cast(t["CISLO_BODU"], "string"), "55"))
    assert f.num_rows == 1
    assert f.to_pylist()[0]["wkt"].startswith("POINT (-651240.47")


def test_par_attributes(vfk):
    r = vfk["PAR"].to_pylist()[0]
    assert r["ID"] is not None
    assert "KMENOVE_CISLO_PAR" in vfk["PAR"].column_names
