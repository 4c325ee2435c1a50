"""ogrlineref linear referencing vs autotest/utilities/test_ogrlineref.py."""

import numpy as np
import pytest

from gdal_ray.functions import lineref as lr
from gdal_ray.functions.wkb import wkb_to_geom
from gdal_ray.sources.shapefile import read_shapefile

DATA = "/root/reference/autotest/utilities/data"


@pytest.fixture(scope="module")
def parts():
    path_t = read_shapefile(f"{DATA}/path.shp")
    ms_t = read_shapefile(f"{DATA}/mstones.shp")
    g = wkb_to_geom(path_t["geometry"][0].as_py())
    repers = []
    for i in range(ms_t.num_rows):
        pg = wkb_to_geom(ms_t["geometry"][i].as_py())
        repers.append((float(ms_t["pos"][i].as_py()),
                       float(pg.rings[0][0, 0]), float(pg.rings[0][0, 1])))
    return lr.create_parts(g.rings[0], repers, 1000.0, geographic=True)


def test_lineref_create(parts):
    # test_ogrlineref_1: -create -s 1000 -> 9 parts
    assert len(parts) == 9
    # contiguous m-ranges at the picket step
    for a, b in zip(parts, parts[1:]):
        assert a[lr.FIELD_FINISH] == b[lr.FIELD_START]
    assert all(p[lr.FIELD_SCALE_FACTOR] > 0 for p in parts)


def test_lineref_get_pos(parts):
    # test_ogrlineref_2 golden
    pos = lr.get_position(parts, -1.4345, 51.9497)
    assert f"{pos:.6f}" == "15977.724709"


def test_lineref_get_coord(parts):
    # test_ogrlineref_3 golden
    x, y, z = lr.get_coordinates(parts, 15977.724709)
    assert f"{x:.6f},{y:.6f},{z:.6f}" == "-1.435097,51.950080,0.000000"


def test_lineref_get_subline(parts):
    # test_ogrlineref_4: one merged feature
    sub = lr.create_subline(parts, 13300, 17400)
    assert sub is not None and sub.ndim == 2 and len(sub) >= 2
    # the subline endpoints sit at m=13300 / m=17400
    x0, y0, _ = lr.get_coordinates(parts, 13300)
    x1, y1, _ = lr.get_coordinates(parts, 17400)
    assert np.hypot(sub[0, 0] - x0, sub[0, 1] - y0) < 1e-9
    assert np.hypot(sub[-1, 0] - x1, sub[-1, 1] - y1) < 1e-9


def test_lineref_primitives_roundtrip(parts):
    # Value/Project are inverse along each part
    p = parts[3]
    c = p["coords"]
    for frac in (0.25, 0.5, 0.75):
        d = lr.line_length(c) * frac
        x, y = lr.value_at(c, d)
        assert abs(lr.project(c, x, y) - d) < 1e-9


def test_lineref_subline_matches_reference_cutter(parts):
    # getSubLine vs independent resampling: same length
    c = parts[2]["coords"]
    total = lr.line_length(c)
    s = lr.sub_line(c, total * 0.2, total * 0.7)
    assert abs(lr.line_length(s) - total * 0.5) < 1e-12


def test_lineref_query_runs(ray_session):
    from gdal_ray.pipelines.vector_ops import q_lineref

    t = q_lineref("/root/testdata/sf0.001")
    import pyarrow as pa
    if not isinstance(t, pa.Table):
        t = pa.concat_tables(
            t.iter_batches(batch_size=None, batch_format="pyarrow"))
    d = dict(zip(t["case"].to_pylist(),
                 zip(t["value_a"].to_pylist(), t["value_b"].to_pylist())))
    assert d["n_parts"][0] == 9.0
    assert f"{d['get_pos'][0]:.6f}" == "15977.724709"
    assert (f"{d['get_coord'][0]:.6f}", f"{d['get_coord'][1]:.6f}") == \
        ("-1.435097", "51.950080")
