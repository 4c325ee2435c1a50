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


def _cycle_equal(a, b):
    """Closed-ring equality modulo rotation and direction."""
    a = [tuple(p) for p in a[:-1]]
    b = [tuple(p) for p in b[:-1]]
    if len(a) != len(b):
        return False
    for cand in (b, b[::-1]):
        for s in range(len(cand)):
            if a == cand[s:] + cand[:s]:
                return True
    return False


def test_region_rings_match_reference_wkt():
    """(test_polygonize_1's geometry check): the DN=156 region's
    polygon is the exact WKT the reference asserts — outer ring with
    one interior hole, world coordinates."""
    from gdal_ray.functions.ccl import region_rings

    grid, _ = read_aaigrid(f"{DATA}/polygonize_in.grd")
    g = grid.astype(np.int32)
    labels = label_components(g, 4)
    lab = collections.Counter(
        labels[np.nonzero(g == 156)].tolist()).most_common(1)[0][0]
    rings = region_rings(labels == lab)
    assert len(rings) == 2
    ytop = 3751020 + 7 * 60
    world = [[(440720 + cx * 60, ytop - cy * 60) for cx, cy in r]
             for r in rings]
    expect_outer = [(440720, 3751200), (440720, 3751020), (440900, 3751020),
                    (440900, 3751200), (440720, 3751200)]
    expect_hole = [(440780, 3751140), (440840, 3751140), (440840, 3751080),
                   (440780, 3751080), (440780, 3751140)]
    assert _cycle_equal(world[0], expect_outer)
    assert _cycle_equal(world[1], expect_hole)


def test_region_rings_complex_staircase():
    """(test_polygonize_3's DN=0 geometry, polygonize_in_2.grd): the
    big region's ring structure — 1 outer + 2 holes with the exact
    vertex counts of the reference's expected WKT (47/13/13 points),
    and conservation: ring areas reproduce the pixel count."""
    from gdal_ray.functions.ccl import region_rings, ring_area_xy

    grid, _ = read_aaigrid(f"{DATA}/polygonize_in_2.grd")
    g = grid.astype(np.int32)
    labels = label_components(g, 4)
    # the reference filters dn = 0 and takes the first feature: the
    # largest 0-valued region
    zero_labels = labels[np.nonzero(g == 0)]
    lab = collections.Counter(zero_labels.tolist()).most_common(1)[0][0]
    rings = region_rings(labels == lab)
    assert len(rings) == 3
    assert [len(r) - 1 for r in rings] == [46, 12, 12]
    area = abs(ring_area_xy(rings[0])) - sum(
        abs(ring_area_xy(r)) for r in rings[1:])
    assert area == (labels == lab).sum()


def test_region_rings_8connected_diagonal():
    """8CONNECTED ring tracing: a diagonal cell pair is ONE polygon
    whose ring passes through the shared corner (area 2); 4-connected
    splits it into two unit squares."""
    from gdal_ray.functions.ccl import region_rings, ring_area_xy

    m = np.zeros((3, 3), bool)
    m[0, 0] = True
    m[1, 1] = True
    r4 = region_rings(m, 4)
    assert len(r4) == 2
    assert sorted(abs(ring_area_xy(r)) for r in r4) == [1.0, 1.0]
    r8 = region_rings(m, 8)
    assert len(r8) == 1
    assert abs(ring_area_xy(r8[0])) == 2.0
    # the shared corner appears twice in the ring (self-touching)
    pts = [tuple(p) for p in r8[0][:-1]]
    assert pts.count((1.0, 1.0)) == 2


@pytest.mark.parametrize("fixture,connect", [
    ("polygonize_in.grd", 4),
    ("polygonize_in.grd", 8),
    ("polygonize_in_2.grd", 4),
    ("polygonize_in_2.grd", 8),
])
def test_hierarchical_merge_bit_identical_to_single_tile(
        ray_session, fixture, connect):
    """Stress the hierarchical 2x2 merge: tile=2 (hundreds of tiles,
    every region crosses borders, ragged last row/col) must produce
    the exact same region table (value, n_pixels, bbox) as a single
    tile holding the whole grid."""
    grid, _ = read_aaigrid(f"{DATA}/{fixture}")
    g = grid.astype(np.int32)
    one = polygonize_tiles(
        ray.data.from_arrow(grid_to_tiles(g, tile=4096)), connect=connect)
    many = polygonize_tiles(
        ray.data.from_arrow(grid_to_tiles(g, tile=2)), connect=connect)
    assert one.num_rows == many.num_rows
    assert one.to_pydict() == many.to_pydict()
