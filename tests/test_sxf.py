"""SXF driver vs the reference autotest (autotest/ogr/ogr_sxf.py) on
its own 100_test.sxf fixture + the reference's shipped default.rsc."""
import numpy as np

from gdal_ray.functions.wkb import wkb_to_geom
from gdal_ray.sources.sxf import read_sxf, read_sxf_passport

SXF = "/root/reference/autotest/ogr/data/sxf/100_test.sxf"
RSC = "/root/reference/ogr/ogrsf_frmts/sxf/data/default.rsc"


def test_sxf_passport():
    p = read_sxf_passport(open(SXF, "rb").read())
    assert p["version"] == 4
    assert p["scale"] == 100000
    assert p["sheet"] == "0.N-40-001"
    assert p["record_count"] == 78
    # all-zero frame coords force real coordinates
    assert p["real_coords"] is True
    # Pulkovo-1942 Gauss-Krueger codes
    assert (p["ellipsoid"], p["projsys"]) == (1, 1)


def test_sxf_default_layers():
    # test_ogr_sxf_3: empty/absent RSC -> SYSTEM + Not_Classified
    r = read_sxf(SXF, rsc_path=None)
    assert list(r) == ["SYSTEM", "Not_Classified"]
    assert sum(t.num_rows for t in r.values()) == 78


def test_sxf_fullname_layers():
    # test_ogr_sxf_4: SXF_LAYER_FULLNAME=YES with the default classifier
    r = read_sxf(SXF, rsc_path=RSC, layer_fullname=True)
    assert list(r) == [
        "СИСТЕМНЫЙ",
        "ВОДНЫЕ ОБЪЕКТЫ",
        "НАСЕЛЕННЫЕ ПУНКТЫ",
        "ИНФРАСТРУКТУРА",
        "ЗЕМЛЕПОЛЬЗОВАНИЕ",
        "РЕЛЬЕФ СУШИ",
        "ГИДРОГРАФИЯ (РЕЛЬЕФ)",
        "МАТЕМАТИЧЕСКАЯ ОСНОВА",
        "Not_Classified",
    ]


def test_sxf_short_layers_and_features():
    r = read_sxf(SXF, rsc_path=RSC)
    assert list(r) == ["SYSTEM", "water", "city", "poi", "landuses",
                       "Relief", "LAYER16", "LAYER17", "Not_Classified"]
    counts = {k: t.num_rows for k, t in r.items()}
    assert counts == {"SYSTEM": 1, "water": 6, "city": 1, "poi": 15,
                      "landuses": 1, "Relief": 6, "LAYER16": 1,
                      "LAYER17": 19, "Not_Classified": 28}
    # classified names come from the RSC Objects section (cp1251)
    city = r["city"]
    assert city["SC_9"][0].as_py() == "Город"
    assert city["SC_38"][0].as_py() == 34.0
    island = r["LAYER16"]
    assert island["SC_9"][0].as_py() == "Остров"
    # geometry decodes into the Pulkovo GK zone-10 range
    g = wkb_to_geom(city["geometry"][0].as_py())
    xs = np.concatenate([rg[:, 0] for rg in g.rings])
    ys = np.concatenate([rg[:, 1] for rg in g.rings])
    assert 1.03e7 < xs.mean() < 1.035e7
    assert 6.17e6 < ys.mean() < 6.22e6
    # grid lines layer carries the coordinate-label semantics
    grid = r["LAYER17"]
    assert grid["SC_17"][0].as_py() == "6176000.000000"
