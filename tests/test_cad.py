"""CAD DWG R2000 driver tests — expectations transcribed from the
reference autotest (autotest/ogr/ogr_cad.py tests 2-9) against its own
data/cad/*_r2000.dwg fixtures."""
import os

import pytest

from gdal_ray.sources.cad import read_cad

FIX = "/root/reference/autotest/ogr/data/cad"

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{FIX}/ellipse_r2000.dwg"),
    reason="no reference fixtures")


def test_cad_ellipse():
    """ogr_cad.py test 2."""
    layers = read_cad(f"{FIX}/ellipse_r2000.dwg")
    assert list(layers) == ["0"]
    t = layers["0"]
    # 5 fixed fields: cadgeom_type thickness color extentity_data text
    assert t.column_names[1:6] == ["cadgeom_type", "thickness", "color",
                                   "extentity_data", "text"]
    assert t.num_rows == 1
    assert t["cadgeom_type"][0].as_py() == "CADEllipse"
    assert t["fid"][0].as_py() == 0
    assert t["thickness"][0].as_py() == 0
    assert t["extentity_data"][0].as_py() is None
    assert t["style"][0].as_py() == "PEN(c:#FFFFFFFF,w:5px)"
    wkt = t["wkt"][0].as_py()
    assert wkt.startswith("LINESTRING (")
    assert wkt.count(",") > 2            # tessellated, > 2 points


def test_cad_triple_circles():
    """ogr_cad.py test 3: 3 layers, one circle each."""
    layers = read_cad(f"{FIX}/triple_circles_r2000.dwg")
    assert list(layers) == ["0", "1", "2"]
    for name, thickness in (("0", 1.2), ("1", 0.8), ("2", 1.8)):
        t = layers[name]
        assert t.num_rows == 1
        assert t["cadgeom_type"][0].as_py() == "CADCircle"
        assert t["thickness"][0].as_py() == thickness
        assert t["extentity_data"][0].as_py() is None
        assert t["style"][0].as_py() == "PEN(c:#FFFFFFFF,w:5px)"
        assert t["wkt"][0].as_py().startswith("CIRCULARSTRING Z (")


def test_cad_point():
    """ogr_cad.py test 4."""
    t = read_cad(f"{FIX}/point2d_r2000.dwg")["0"]
    assert t.num_rows == 1
    assert t["wkt"][0].as_py() == "POINT (50 50 0)"


def test_cad_line():
    """ogr_cad.py test 5."""
    t = read_cad(f"{FIX}/line_r2000.dwg")["0"]
    assert t.num_rows == 1
    assert t["wkt"][0].as_py() == "LINESTRING (50 50 0,100 100 0)"


def test_cad_text_mtext_attdef():
    """ogr_cad.py tests 6/6bis/7/8: TEXT + MTEXT + ATTDEF points,
    LABEL styles, CP1251 Cyrillic decode."""
    t = read_cad(f"{FIX}/text_mtext_attdef_r2000.dwg")["0"]
    assert t.num_rows == 3
    assert t["cadgeom_type"].to_pylist() == ["CADText", "CADMText",
                                             "CADAttdef"]
    wkts = t["wkt"].to_pylist()
    # check_feature_geometry tolerance is 1e-4; pin to the same digits
    assert wkts[0].startswith("POINT (0.74126")
    assert wkts[1].startswith("POINT (2.81391")
    assert wkts[2].startswith("POINT (4.98953601938918 2.62670161690571")
    assert t["style"].to_pylist() == [
        'LABEL(f:"Arial",t:"Русские буквы",c:#FFFFFFFF)',
        'LABEL(f:"Arial",t:"English letters",c:#FFFFFFFF)',
        'LABEL(f:"Arial",t:"TESTTAG",c:#FFFFFFFF)',
    ]
    assert t["text"].to_pylist() == ["Русские буквы", "English letters",
                                     "TESTTAG"]


def test_cad_unsupported_version():
    """ogr_cad.py test 9: non-R2000 signature raises."""
    with pytest.raises(ValueError, match="does not support this version"):
        read_cad(f"{FIX}/AC1018_signature.dwg")


def test_cad_vector_open():
    from gdal_ray.sources.vector_open import open_vector

    layers = open_vector(f"{FIX}/triple_circles_r2000.dwg")
    assert sorted(layers) == ["0", "1", "2"]
