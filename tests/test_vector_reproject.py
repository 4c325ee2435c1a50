"""ogr2ogr -t_srs actor stage: point fast path and general ring path
agree with the CRS engine; 4326<->3857 roundtrip is lossless below
the mercator clamp."""

import numpy as np
import pyarrow as pa

from gdal_ray.functions.crs import Transformer
from gdal_ray.functions.wkb import (geom_to_wkb, points_to_wkb,
                                    wkb_to_geom, wkt_to_geom)
from gdal_ray.pipelines.vector_ops import ReprojectGeoms


def test_point_fast_path_matches_transformer():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-179, 179, 64)
    lat = rng.uniform(-84, 84, 64)
    t = pa.table({"geometry": pa.array(points_to_wkb(lon, lat),
                                       pa.binary())})
    out = ReprojectGeoms(4326, 3857)(t)
    tr = Transformer(4326, 3857)
    ex, ey = tr.transform(lon, lat)
    for i, b in enumerate(out["geometry"].to_pylist()):
        g = wkb_to_geom(b)
        np.testing.assert_allclose(g.rings[0][0], [ex[i], ey[i]],
                                   rtol=1e-12)


def test_polygon_ring_path_roundtrip():
    w = ("POLYGON ((2 48, 3 48, 3 49, 2 49, 2 48), "
         "(2.2 48.2, 2.4 48.2, 2.4 48.4, 2.2 48.4, 2.2 48.2))")
    t = pa.table({"geometry": pa.array([geom_to_wkb(wkt_to_geom(w))],
                                       pa.binary())})
    fwd = ReprojectGeoms(4326, 3857)(t)
    g_m = wkb_to_geom(fwd["geometry"].to_pylist()[0])
    assert g_m.kind == 3 and len(g_m.rings) == 2
    assert abs(g_m.rings[0][0, 0] - 222638.98) < 1.0  # 2 deg lon at eq
    back = ReprojectGeoms(3857, 4326)(fwd)
    g2 = wkb_to_geom(back["geometry"].to_pylist()[0])
    want = wkt_to_geom(w)
    for ra, rb in zip(g2.rings, want.rings):
        np.testing.assert_allclose(ra, rb, atol=1e-9)


def test_null_geometry_passthrough():
    t = pa.table({"geometry": pa.array(
        [None, geom_to_wkb(wkt_to_geom("LINESTRING (0 0, 1 1)"))],
        pa.binary())})
    out = ReprojectGeoms(4326, 3857)(t)
    vals = out["geometry"].to_pylist()
    assert vals[0] is None and vals[1] is not None
