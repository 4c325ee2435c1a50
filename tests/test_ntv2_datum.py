"""NTv2 grid-shift datum path (crs_registry.NTv2Shift wired into
datum_shift) — the PROJ `+nadgrids` semantics the reference uses for
DHDN/BETA2007 and OSGB/OSTN15 (autotest/osr/osr_ct_proj.py:218-232).

No real grid ships in the sandbox (the reference downloads them), so
the tests synthesize a conformant constant-shift .gsb whose values
reproduce the reference's PUBLISHED BETA2007 expectation at the test
point: DHDN (10 E, 50 N) -> WGS84 (9.99881145557889, 49.9988573027651).
"""

import struct

import numpy as np
import pytest

from gdal_ray.functions import crs_registry as cr

# the reference's published BETA2007 result (osr_ct_proj.py:205-216)
SRC = (10.0, 50.0)
DST = (9.99881145557889, 49.9988573027651)
DLAT_AS = (DST[1] - SRC[1]) * 3600.0          # lat shift, arc-sec
DLON_AS = (SRC[0] - DST[0]) * 3600.0          # positive-west, arc-sec


def write_gsb(path, w_deg, e_deg, s_deg, n_deg, inc_deg,
              dlat_as, dlon_as):
    """Minimal conformant NTv2 (little-endian) with one sub-grid of
    constant shifts."""
    def rec(tag, payload):
        r = tag.ljust(8).encode() + payload
        return r.ljust(16, b"\x00")

    def drec(tag, v):
        return rec(tag, struct.pack("<d", v))

    def irec(tag, v):
        return rec(tag, struct.pack("<i", v))

    inc = inc_deg * 3600.0
    # stored positive-west arc-seconds
    s_lat, n_lat = s_deg * 3600.0, n_deg * 3600.0
    e_pw, w_pw = -e_deg * 3600.0, -w_deg * 3600.0
    nw = int(round((e_deg - w_deg) / inc_deg)) + 1
    nh = int(round((n_deg - s_deg) / inc_deg)) + 1
    count = nw * nh

    out = b"".join([
        irec("NUM_OREC", 11), irec("NUM_SREC", 11), irec("NUM_FILE", 1),
        rec("GS_TYPE", b"SECONDS "), rec("VERSION", b"TEST    "),
        rec("SYSTEM_F", b"SRC     "), rec("SYSTEM_T", b"DST     "),
        drec("MAJOR_F", 6377397.155), drec("MINOR_F", 6356078.963),
        drec("MAJOR_T", 6378137.0), drec("MINOR_T", 6356752.314),
    ])
    out += b"".join([
        rec("SUB_NAME", b"TESTGRID"), rec("PARENT", b"NONE    "),
        rec("CREATED", b"now     "), rec("UPDATED", b"now     "),
        drec("S_LAT", s_lat), drec("N_LAT", n_lat),
        drec("E_LONG", e_pw), drec("W_LONG", w_pw),
        drec("LAT_INC", inc), drec("LONG_INC", inc),
        irec("GS_COUNT", count),
    ])
    node = struct.pack("<4f", dlat_as, dlon_as, 0.01, 0.01)
    out += node * count
    with open(path, "wb") as fh:
        fh.write(out)


@pytest.fixture()
def grid_dir(tmp_path, monkeypatch):
    d = tmp_path / "grids"
    d.mkdir()
    monkeypatch.setenv("GDAL_RAY_GRID_DIR", str(d))
    # datum + registry caches must not leak grid-backed entries (a
    # registry _CACHE tuple holds the datum instance too)
    cr._DATUMS.clear()
    cr._CACHE.clear()
    yield d
    cr._DATUMS.clear()
    cr._CACHE.clear()


def test_beta2007_published_point(grid_dir):
    write_gsb(str(grid_dir / "BETA2007.gsb"), 5.0, 15.0, 45.0, 55.0,
              0.5, DLAT_AS, DLON_AS)
    ds = cr.datum_shift("DHDN")
    assert isinstance(ds, cr.NTv2Shift)
    lon, lat = ds.to_wgs84(np.array([SRC[0]]), np.array([SRC[1]]))
    assert lon[0] == pytest.approx(DST[0], abs=1e-8)
    assert lat[0] == pytest.approx(DST[1], abs=1e-8)


def test_grid_roundtrip_cm_level(grid_dir):
    write_gsb(str(grid_dir / "osgb36.gsb"), -8.0, 2.0, 49.0, 61.0,
              0.25, 2.345, -1.678)
    ds = cr.datum_shift("OSGB36")
    assert isinstance(ds, cr.NTv2Shift)
    rng = np.random.default_rng(4)
    lon = rng.uniform(-7.5, 1.5, 64)
    lat = rng.uniform(49.5, 60.5, 64)
    wlon, wlat = ds.to_wgs84(lon, lat)
    blon, blat = ds.from_wgs84(wlon, wlat)
    # fixed-point inverse converges far below cm (1e-9 deg ~ 0.1 mm)
    assert np.abs(blon - lon).max() < 1e-9
    assert np.abs(blat - lat).max() < 1e-9


def test_outside_grid_falls_back_to_helmert(grid_dir):
    write_gsb(str(grid_dir / "osgb36.gsb"), -8.0, 2.0, 49.0, 61.0,
              0.25, 2.345, -1.678)
    ds = cr.datum_shift("OSGB36")
    cr._DATUMS.clear()
    import os

    os.environ.pop("GDAL_RAY_GRID_DIR", None)
    helmert = cr.datum_shift("OSGB36")
    # a point in France, outside the grid: identical to pure Helmert
    glon, glat = ds.to_wgs84(np.array([2.5]), np.array([47.0]))
    hlon, hlat = helmert.to_wgs84(np.array([2.5]), np.array([47.0]))
    assert glon[0] == hlon[0] and glat[0] == hlat[0]


def test_no_grid_keeps_helmert(tmp_path, monkeypatch):
    monkeypatch.setenv("GDAL_RAY_GRID_DIR", str(tmp_path / "empty"))
    cr._DATUMS.clear()
    ds = cr.datum_shift("OSGB36")
    assert isinstance(ds, cr.Helmert7)
    cr._DATUMS.clear()
