"""Selafin driver vs the reference autotest's own constructed mesh
(autotest/ogr/ogr_selafin.py: 5x5 node grid valued i*5+j, quad
elements whose field is the mean of their nodes)."""
import numpy as np

from gdal_ray.functions.wkb import geom_to_wkt, wkb_to_geom
from gdal_ray.sources.selafin import (read_selafin, selafin_layers,
                                      write_selafin)


def _mesh():
    # the autotest's datasource after create_elements: 25 grid nodes
    # (values i*5+j) + 3 extra nodes for the (4,4)-(5,5) square = 28
    # points, 16 grid quads + 1 extra = 17 elements
    xs, ys, vals = [], [], []
    for i in range(5):
        for j in range(5):
            xs.append(float(i))
            ys.append(float(j))
            vals.append(float(i * 5 + j))
    extra = [(4.0, 5.0), (5.0, 5.0), (5.0, 4.0)]
    for ex, ey in extra:
        xs.append(ex)
        ys.append(ey)
        vals.append(0.0)
    ikle = []
    for i in range(4):
        for j in range(4):
            n00 = i * 5 + j
            ikle.append([n00 + 1, n00 + 2, n00 + 7, n00 + 6])  # 1-based
    ikle.append([25, 26, 27, 28])  # (4,4),(4,5),(5,5),(5,4)
    return (np.array(xs), np.array(ys), np.array(ikle),
            np.array(vals))


def test_selafin_roundtrip(tmp_path):
    x, y, ikle, vals = _mesh()
    path = str(tmp_path / "tmp.slf")
    write_selafin(path, x, y, ikle, {"value": vals}, title="t",
                  epsg=4326)
    h = read_selafin(path)
    assert h["title"] == "t"
    assert h["epsg"] == 4326
    assert h["vars"] == ["value"]
    assert len(h["x"]) == 28
    assert h["ikle"].shape == (17, 4)
    assert np.allclose(h["x"], x)
    assert np.allclose(h["steps"][0]["value"], vals)


def test_selafin_layers_element_means(tmp_path):
    x, y, ikle, vals = _mesh()
    path = str(tmp_path / "tmp.slf")
    write_selafin(path, x, y, ikle, {"value": vals})
    layers = selafin_layers(path)
    assert set(layers) == {"tmp_p0", "tmp_e0"}
    pts = layers["tmp_p0"]
    els = layers["tmp_e0"]
    # autotest: 28 point features after element creation, 17 elements
    assert pts.num_rows == 28
    assert els.num_rows == 17
    # element field = mean of node values (ogrselafinlayer.cpp:240):
    # feature 5 -> 9, feature 10 -> 15
    assert abs(els.column("value")[5].as_py() - 9.0) <= 0.01
    assert abs(els.column("value")[10].as_py() - 15.0) <= 0.01
    # geometry: closed quad ring for element 0: (0,0)(0,1)(1,1)(1,0)
    w = geom_to_wkt(wkb_to_geom(els.column("geometry")[0].as_py()))
    assert w == "POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))"
    # point 11 value 11 -> the set_field test scales by 10 driver-side;
    # here just verify the raw value
    assert pts.column("value")[11].as_py() == 11.0


def test_selafin_multistep(tmp_path):
    x, y, ikle, vals = _mesh()
    path = str(tmp_path / "m.slf")
    write_selafin(path, x, y, ikle,
                  {"value": np.stack([vals, vals * 10])},
                  times=[0.0, 3600.0])
    h = read_selafin(path)
    assert h["times"] == [0.0, 3600.0]
    layers = selafin_layers(path)
    assert set(layers) == {"m_p0", "m_e0", "m_p1", "m_e1"}
    assert abs(layers["m_e1"].column("value")[5].as_py() - 90.0) <= 0.01
