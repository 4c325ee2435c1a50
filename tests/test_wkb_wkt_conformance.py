"""Core WKB/WKT codec vs the reference's full autotest conformance
corpus (autotest/ogr/data/wkb_wkt/* — the pairs ogr_wkbwkt_geom.py
cross-checks), including the intentionally quirky encodings GDAL
tolerates: DB2 v7.2 ASCII byte-order bytes, the Z-flag-in-2nd-byte
3d_broken_* fixtures, stray trailing ')' in 8.wkt, mixed-dimension
rings in 3d_1.wkt, and GEOMETRYCOLLECTION."""
import glob
import os

import numpy as np
import pytest

from gdal_ray.functions.wkb import (GEOMETRYCOLLECTION, geom_to_wkb,
                                    geom_to_wkt, wkb_to_geom, wkt_to_geom)

DIR = "/root/reference/autotest/ogr/data/wkb_wkt"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DIR), reason="reference fixtures unavailable")


def _flat(g):
    out = []
    if g.members is not None:
        for m in g.members:
            out.extend(_flat(m))
        return out
    for i, r in enumerate(g.rings):
        z = g.zs[i] if g.zs is not None else np.zeros(len(r))
        out.append(np.column_stack([r, z]))
    return out


@pytest.mark.parametrize(
    "ident", [os.path.basename(p)[:-4]
              for p in sorted(glob.glob(os.path.join(DIR, "*.wkb")))])
def test_wkb_wkt_pair(ident):
    raw_wkb = open(os.path.join(DIR, ident + ".wkb"), "rb").read()
    raw_wkt = open(os.path.join(DIR, ident + ".wkt")).read().strip()

    g_wkb = wkb_to_geom(raw_wkb)
    g_wkt = wkt_to_geom(raw_wkt)

    # same structure and coordinates from both representations
    assert g_wkb.kind == g_wkt.kind
    c1, c2 = _flat(g_wkb), _flat(g_wkt)
    assert len(c1) == len(c2)
    for a, b in zip(c1, c2):
        assert a.shape == b.shape
        # the .wkt fixtures print fewer significant digits
        assert np.allclose(a, b, atol=1e-7)

    # WKB -> geom -> WKB -> geom roundtrip preserves coordinates
    g_rt = wkb_to_geom(geom_to_wkb(g_wkb))
    for a, b in zip(c1, _flat(g_rt)):
        assert np.array_equal(a, b)

    # WKT writer/parser roundtrip
    g_rt2 = wkt_to_geom(geom_to_wkt(g_wkb))
    for a, b in zip(c1, _flat(g_rt2)):
        assert np.allclose(a, b, rtol=1e-14)


def test_geometrycollection_structure():
    g = wkb_to_geom(open(os.path.join(DIR, "3.wkb"), "rb").read())
    assert g.kind == GEOMETRYCOLLECTION
    assert g.name == "GeometryCollection"
    assert len(g.members) == 4
    assert [m.kind for m in g.members] == [1, 1, 2, 3]
    wkt = geom_to_wkt(g)
    assert wkt.startswith("GEOMETRYCOLLECTION (POINT (")


def test_db2_byte_order():
    # db2_poly.wkb uses ASCII '1'/'0' byte-order markers (despite its
    # name the content is a linestring)
    g = wkb_to_geom(open(os.path.join(DIR, "db2_poly.wkb"), "rb").read())
    assert g.kind == 2
    assert len(g.rings[0]) >= 10
    assert g.rings[0][0][0] == pytest.approx(873039.0)


def test_second_byte_z_flag():
    g = wkb_to_geom(open(os.path.join(DIR, "3d_broken_point.wkb"),
                         "rb").read())
    assert g.kind == 1 and g.zs is not None
    assert g.zs[0][0] == pytest.approx(5.1)


def test_trailing_junk_wkt():
    g = wkt_to_geom("POINT (2.0012135167 5.9985312409))")
    assert g.kind == 1
    assert g.rings[0][0][0] == pytest.approx(2.0012135167)
