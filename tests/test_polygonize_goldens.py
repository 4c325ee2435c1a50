"""Polygonize conformance against the reference's own fixtures and
expected feature counts (reference autotest/alg/polygonize.py:30-210;
fixtures autotest/alg/data/polygonize_in*.grd, AAIGrid)."""

import collections

import numpy as np
import pytest
import ray.data

from gdal_ray.functions.ccl import label_components
from gdal_ray.stages.polygonize import grid_to_tiles, polygonize_tiles

DATA = "/root/reference/autotest/alg/data"


def read_aaigrid(path):
    """Minimal AAIGrid (Arc/Info ASCII) reader: header + rows."""
    with open(path) as f:
        toks = f.read().split()
    hdr = {}
    i = 0
    while toks[i].lower() in ("ncols", "nrows", "xllcorner", "yllcorner",
                              "cellsize", "nodata_value"):
        hdr[toks[i].lower()] = float(toks[i + 1])
        i += 2
    vals = np.array(toks[i:], np.float64)
    grid = vals.reshape(int(hdr["nrows"]), int(hdr["ncols"]))
    return grid, hdr.get("nodata_value")


def _regions(grid, connect, mask_value=None):
    labels = label_components(grid.astype(np.int32), connect)
    vals = {}
    for lab, v in zip(labels.ravel(), grid.ravel()):
        vals.setdefault(int(lab), int(v))
    out = list(vals.values())
    if mask_value is not None:
        out = [v for v in out if v != mask_value]
    return out


def test_polygonize_in_4connected_no_mask():
    """(test_polygonize_2): 17 regions, exact DN multiset."""
    grid, _ = read_aaigrid(f"{DATA}/polygonize_in.grd")
    dns = _regions(grid, 4)
    assert len(dns) == 17
    expect = [107, 123, 115, 132, 115, 140, 132, 132, 148, 123, 140, 132,
              100, 101, 102, 156, 103]
    assert collections.Counter(dns) == collections.Counter(expect)


def test_polygonize_in_4connected_masked():
    """(test_polygonize_1): masking nodata 132 leaves 13 regions."""
    grid, nodata = read_aaigrid(f"{DATA}/polygonize_in.grd")
    assert nodata == 132
    dns = _regions(grid, 4, mask_value=132)
    assert len(dns) == 13
    expect = [107, 123, 115, 115, 140, 148, 123, 140, 100, 101, 102, 156, 103]
    assert collections.Counter(dns) == collections.Counter(expect)


def test_polygonize_in_8connected():
    """(test_polygonize 8CONNECTED=8): 16 regions."""
    grid, _ = read_aaigrid(f"{DATA}/polygonize_in.grd")
    assert len(_regions(grid, 8)) == 16


def test_polygonize_in_2_feature_count():
    """(test_polygonize_3): 125 regions on the larger fixture."""
    grid, _ = read_aaigrid(f"{DATA}/polygonize_in_2.grd")
    assert len(_regions(grid, 4)) == 125


@pytest.mark.parametrize("fixture,connect,want", [
    ("polygonize_in.grd", 4, 17),
    ("polygonize_in.grd", 8, 16),
    ("polygonize_in_2.grd", 4, 125),
])
def test_distributed_polygonize_matches_reference_counts(
        ray_session, fixture, connect, want):
    """The DISTRIBUTED stage (tiles + boundary merge) reproduces the
    reference's feature counts, with tile borders forced through the
    cross-tile merge."""
    grid, _ = read_aaigrid(f"{DATA}/{fixture}")
    tiles = ray.data.from_arrow(grid_to_tiles(grid.astype(np.int32), tile=3))
    out = polygonize_tiles(tiles, connect=connect)
    assert out.num_rows == want


@pytest.mark.parametrize("fixture,connect,want", [
    ("sieve_src.grd", 4, 364),
    ("sieve_src.grd", 8, 370),
    ("unmergable.grd", 8, 451),   # cycle of small polys stays unmerged
    ("sieve_2634.grd", 4, 98),
])
def test_sieve_reference_checksums(fixture, connect, want):
    """GDALSieveFilter conformance (autotest/alg/sieve.py): threshold
    2, exact output checksums incl. the unmergable-cycle case."""
    from gdal_ray.functions.checksum import checksum_image
    from gdal_ray.functions.pixelfuncs import sieve

    grid, _ = read_aaigrid(f"{DATA}/{fixture}")
    out = sieve(grid.astype(np.int32), 2, connect).astype(np.uint8)
    assert checksum_image(out) == want
