"""Parameterized EPSG registry (functions/crs_registry.py).

Goldens are the published worked examples from EPSG Guidance Note
7-2 (the same source the reference's PROJ pipeline implements);
tolerance 0.01 m = the guidance's own rounding.
"""

import numpy as np
import pytest

from gdal_ray.functions.crs import Transformer, lonlat_to_utm
from gdal_ray.functions.crs_registry import (
    Helmert7,
    TransverseMercator,
    datum_shift,
    lookup,
)


def test_general_tm_matches_wgs84_krueger():
    """WGS84-parameterized general TM is bit-identical to the pinned
    Krueger UTM in crs.py."""
    tm = TransverseMercator(0.0, -183.0 + 6 * 33, 0.9996, 500000.0, 0.0,
                            "WGS84")
    lon = np.linspace(12.0, 18.0, 50)
    lat = np.linspace(-60.0, 70.0, 50)
    e1, n1 = tm.forward(lon, lat)
    e2, n2 = lonlat_to_utm(lon, lat, 33)
    np.testing.assert_array_equal(e1, e2)
    np.testing.assert_array_equal(n1, n2)


def test_osgb_grid_golden():
    """EPSG GN7-2 TM worked example (Airy 1830, natural origin
    49N 2W, k0=0.9996012717): 50d30'N 0d30'E -> 577274.99, 69740.50."""
    osgb, datum = lookup(27700)
    e, n = osgb.forward(np.array([0.5]), np.array([50.5]))
    assert abs(e[0] - 577274.99) < 0.01
    assert abs(n[0] - 69740.50) < 0.01
    # inverse closes
    lon, lat = osgb.inverse(e, n)
    assert abs(lon[0] - 0.5) < 1e-9 and abs(lat[0] - 50.5) < 1e-9
    assert datum is not None  # OSGB36 really is offset from WGS84


def test_ups_north_golden():
    """GN7-2 polar stereographic variant A example (k0=0.994):
    73N 44E -> 3320416.75, 632668.43."""
    ups, _ = lookup(32661)
    e, n = ups.forward(np.array([44.0]), np.array([73.0]))
    assert abs(e[0] - 3320416.75) < 0.01
    assert abs(n[0] - 632668.43) < 0.01
    lon, lat = ups.inverse(e, n)
    assert abs(lon[0] - 44.0) < 1e-8 and abs(lat[0] - 73.0) < 1e-8


def test_laea_europe_golden():
    """GN7-2 LAEA oblique example (ETRS89-LAEA): 50N 5E ->
    3962799.45, 2999718.85."""
    laea, _ = lookup(3035)
    e, n = laea.forward(np.array([5.0]), np.array([50.0]))
    assert abs(e[0] - 3962799.45) < 0.01
    assert abs(n[0] - 2999718.85) < 0.01
    lon, lat = laea.inverse(e, n)
    assert abs(lon[0] - 5.0) < 1e-9 and abs(lat[0] - 50.0) < 1e-9


def test_world_mercator_vs_spherical():
    """3395 (ellipsoidal) equator scale matches 3857's x; y differs
    by the known ellipsoidal correction (~0.7% at mid-latitudes)."""
    from gdal_ray.functions.crs import lonlat_to_webmercator

    merc, _ = lookup(3395)
    lon = np.array([10.0])
    lat = np.array([45.0])
    xe, ye = merc.forward(lon, lat)
    xs, ys = lonlat_to_webmercator(lon, lat)
    assert abs(xe[0] - xs[0]) < 1e-6  # same equatorial radius
    assert 0.0 < (ys[0] - ye[0]) / ys[0] < 0.01
    lon2, lat2 = merc.inverse(xe, ye)
    assert abs(lat2[0] - 45.0) < 1e-9


def test_utm_ranges_etrs89_nad83():
    """258xx/269xx resolve; GRS80 vs WGS84 TM differ by < 1e-3 m
    (the ellipsoids differ only in f's 9th decimal)."""
    for code, zone in ((25832, 32), (26917, 17)):
        proj, datum = lookup(code)
        assert datum is None
        lon0 = -183.0 + 6.0 * zone
        e, n = proj.forward(np.array([lon0 + 1.0]), np.array([50.0]))
        ew, nw = lonlat_to_utm(np.array([lon0 + 1.0]), np.array([50.0]), zone)
        assert abs(e[0] - ew[0]) < 1e-3 and abs(n[0] - nw[0]) < 1e-3


def test_gauss_krueger_zones():
    """3146x: zone z false easting z*1e6+500000, lon0 3z, Bessel."""
    gk3, _ = lookup(31467)  # zone 3, lon0 9E
    e, n = gk3.forward(np.array([9.0]), np.array([50.0]))
    assert abs(e[0] - 3_500_000.0) < 1e-6  # on the central meridian
    assert 5_000_000 < n[0] < 6_000_000


def test_helmert_roundtrip():
    """The linear part inverts exactly; the only residual is the
    dropped ellipsoidal height (2D interface), worth ~2 mm in
    lon/lat — bounded at 1e-7 deg (~1 cm)."""
    h = datum_shift("OSGB36")
    lon = np.linspace(-6.0, 2.0, 20)
    lat = np.linspace(50.0, 58.0, 20)
    lo2, la2 = h.from_wgs84(*h.to_wgs84(lon, lat))
    np.testing.assert_allclose(lo2, lon, atol=1e-7)
    np.testing.assert_allclose(la2, lat, atol=1e-7)


def test_osgb_datum_shift_magnitude():
    """WGS84 vs OSGB36 graticules differ by ~100-130 m over Britain."""
    h = datum_shift("OSGB36")
    lon, lat = np.array([-1.0]), np.array([52.0])
    lo, la = h.from_wgs84(lon, lat)
    dm = np.hypot((lo - lon) * 111320 * np.cos(np.radians(52)),
                  (la - lat) * 110574)
    assert 80.0 < dm[0] < 160.0


def test_transformer_datum_hop():
    """4326 -> 27700 includes the Helmert; round-trips through the
    full Transformer; and the shift is visible (> 50 m vs naive)."""
    t = Transformer(4326, 27700)
    x, y = t.transform(np.array([-0.1276]), np.array([51.5072]))
    bx, by = t.inverse().transform(x, y)
    assert abs(bx[0] + 0.1276) < 1e-7 and abs(by[0] - 51.5072) < 1e-7
    # projection-only (no datum hop) differs by the OSGB36 offset
    osgb, _ = lookup(27700)
    xn, yn = osgb.forward(np.array([-0.1276]), np.array([51.5072]))
    assert np.hypot(x[0] - xn[0], y[0] - yn[0]) > 50.0


def test_transformer_wgs84_equivalents_no_hop():
    """25832 <-> 32632: ETRS89~WGS84 null shift, same TM params —
    sub-mm apart."""
    t = Transformer(25832, 32632)
    x, y = t.transform(np.array([400000.0]), np.array([5_500_000.0]))
    assert abs(x[0] - 400000.0) < 1e-3
    assert abs(y[0] - 5_500_000.0) < 1e-3


def test_geographic_datum_codes():
    t = Transformer(4277, 4326)  # OSGB36 geographic -> WGS84
    lon, lat = t.transform(np.array([-1.0]), np.array([52.0]))
    assert 0.0005 < abs(lon[0] + 1.0) + abs(lat[0] - 52.0) < 0.01


def test_unknown_epsg_still_raises():
    with pytest.raises(NotImplementedError):
        Transformer(4326, 29903)  # Irish grid: not in the table


def test_round3_registry_additions():
    """MGA/NAD27-UTM/CS92/LCC-Europe/Australian-Albers: structural
    invariants (origin at false offsets, inverse closes to 1e-9 deg)
    and the NAD27 datum genuinely shifts."""
    from gdal_ray.functions.crs_registry import lookup

    # MGA zone 55 (cm 147E, southern false northing)
    mga, d = lookup(28355)
    e, n = mga.forward(np.array([147.0]), np.array([0.0]))
    assert abs(e[0] - 500000.0) < 1e-6 and abs(n[0] - 10_000_000.0) < 1e-6
    lon, lat = mga.inverse(*mga.forward(np.array([146.1]), np.array([-37.8])))
    assert abs(lon[0] - 146.1) < 1e-9 and abs(lat[0] + 37.8) < 1e-9
    assert d is None

    # NAD27 UTM zone 14 (cm 99W, Clarke 1866) + datum shift present
    n27, d27 = lookup(26714)
    lon, lat = n27.inverse(*n27.forward(np.array([-98.5]), np.array([41.2])))
    assert abs(lon[0] + 98.5) < 1e-9 and abs(lat[0] - 41.2) < 1e-9
    assert d27 is not None
    wlon, wlat = d27.to_wgs84(np.array([-98.5]), np.array([41.2]))
    shift_m = np.hypot((wlon[0] + 98.5) * 111320 * np.cos(np.radians(41.2)),
                       (wlat[0] - 41.2) * 111320)
    assert 5 < shift_m < 120  # NAD27 is tens of meters off WGS84

    # Poland CS92: natural origin 19E maps to (500000, -5300000 + M(0))
    pl, _ = lookup(2180)
    lon, lat = pl.inverse(*pl.forward(np.array([21.0]), np.array([52.2])))
    assert abs(lon[0] - 21.0) < 1e-9 and abs(lat[0] - 52.2) < 1e-9

    # LCC Europe / Australian Albers: false origins + closure
    lcc, _ = lookup(3034)
    e, n = lcc.forward(np.array([10.0]), np.array([52.0]))
    assert abs(e[0] - 4_000_000.0) < 1e-6 and abs(n[0] - 2_800_000.0) < 1e-6
    alb, _ = lookup(3577)
    e, n = alb.forward(np.array([132.0]), np.array([0.0]))
    assert abs(e[0]) < 1e-6 and abs(n[0]) < 1e-6
    lon, lat = alb.inverse(*alb.forward(np.array([145.0]), np.array([-30.0])))
    assert abs(lon[0] - 145.0) < 1e-9 and abs(lat[0] + 30.0) < 1e-9
