"""PMTiles reader + line-of-sight vs reference autotest
(ogr_pmtiles.py, alg/los.py)."""

import numpy as np
import pytest

from gdal_ray.functions.viewshed import line_of_sight
from gdal_ray.sources.pmtiles import PmtilesFile, read_pmtiles

FIX = "/root/reference/autotest/ogr/data/pmtiles/"


def test_pmtiles_poly():
    """test_ogr_pmtiles_basic metadata + attribute goldens."""
    pf = PmtilesFile(FIX + "poly.pmtiles")
    assert (pf.min_zoom, pf.max_zoom) == (0, 5)
    md = pf.metadata
    assert md["name"] == "poly" and md["format"] == "pbf"
    assert md["scheme"] == "tms" and md["version"] == "2"
    assert md["maxzoom"] == "5"
    L = read_pmtiles(FIX + "poly.pmtiles")
    t = L["poly"]
    assert t.num_rows == 8
    r = t.to_pylist()[0]
    assert r["AREA"] == 215229.266
    assert r["EAS_ID"] == 168
    assert r["PRFEDEA"] == "35043411"
    assert r["wkt"].startswith("MULTIPOLYGON")


def test_pmtiles_leaf_directories():
    """leaf-dir variant decodes identically."""
    a = read_pmtiles(FIX + "poly.pmtiles")
    b = read_pmtiles(FIX + "poly_with_leaf_dir.pmtiles")
    assert a["poly"].num_rows == b["poly"].num_rows
    sa = sorted(a["poly"]["EAS_ID"].to_pylist())
    sb = sorted(b["poly"]["EAS_ID"].to_pylist())
    assert sa == sb


def test_pmtiles_france():
    L = read_pmtiles(FIX + "ne_10m_admin_0_france.pmtiles")
    assert len(L) >= 1
    t = list(L.values())[0]
    assert t.num_rows >= 1


def test_los_basic():
    """alg/los.py test_los_basic cases."""
    dem = np.zeros((1, 2))
    vis, ix, iy = line_of_sight(dem, 0, 0, 1, 1, 0, 1)
    assert vis and ix == -1 and iy == -1
    assert line_of_sight(dem, 0, 0, 1, 0, 0, 1)[0]
    assert not line_of_sight(dem, 0, 0, -1, 1, 0, 1)[0]
    assert not line_of_sight(dem, 0, 0, 1, 1, 0, -1)[0]
    with pytest.raises(IndexError):
        line_of_sight(dem, 0, 0, 1, 2, 0, 1)


def test_los_blocking_terrain():
    dem = np.array([[0, 5, 0]], float)
    vis, ix, iy = line_of_sight(dem, 0, 0, 1, 2, 0, 1)
    assert not vis and (ix, iy) == (1, 0)
    # fly over it
    vis, ix, iy = line_of_sight(dem, 0, 0, 10, 2, 0, 10)
    assert vis
    # diagonal walk on a larger grid
    dem = np.zeros((8, 8))
    dem[4, 4] = 9
    vis, ix, iy = line_of_sight(dem, 0, 0, 1, 7, 7, 1)
    assert not vis and (ix, iy) == (4, 4)


def test_apply_vertical_shift_grid():
    """alg/applyverticalshiftgrid.py: byte.tif 20x40 + same grid ->
    cs 10038; inverse with itself -> cs 0."""
    import numpy as np

    from gdal_ray.functions.checksum import checksum_image
    from gdal_ray.functions.resample import (apply_vertical_shift_grid,
                                             resize)
    from gdal_ray.sources.tiff import decode_tiff

    with open("/root/reference/autotest/gcore/data/byte.tif", "rb") as f:
        src = decode_tiff(f.read())[0]
    src2 = resize(src, 40, 20, method="nearest")
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -30.0)
    out = apply_vertical_shift_grid(src2, gt, src2, gt,
                                    out_dtype=np.uint8)
    assert checksum_image(out) == 10038
    inv = apply_vertical_shift_grid(src2, gt, src2, gt, inverse=True)
    assert checksum_image(inv.astype(np.float32)) == 0
