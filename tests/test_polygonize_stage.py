"""Distributed polygonize (per-tile label + boundary merge) must match
whole-grid labeling exactly."""

import numpy as np
import pytest

from gdal_ray.functions.ccl import label_components, region_table
from gdal_ray.stages.polygonize import grid_to_tiles, polygonize_tiles


def _oracle_regions(grid):
    lab = label_components(grid, 4)
    t = region_table(grid, lab)
    rows = sorted(zip(t["value"], t["n_pixels"], t["xmin"], t["ymin"],
                      t["xmax"], t["ymax"]))
    return rows


@pytest.mark.parametrize("shape,tile", [((40, 56), 16), ((33, 29), 8)])
def test_polygonize_tiles_matches_whole_grid(ray_session, shape, tile):
    import ray.data

    rng = np.random.default_rng(shape[0] * 100 + shape[1])
    grid = rng.integers(0, 3, shape).astype(np.int32)
    tiles = ray.data.from_arrow(grid_to_tiles(grid, tile=tile))
    out = polygonize_tiles(tiles, connect=4)
    got = sorted(zip(out["value"].to_pylist(), out["n_pixels"].to_pylist(),
                     out["xmin"].to_pylist(), out["ymin"].to_pylist(),
                     out["xmax"].to_pylist(), out["ymax"].to_pylist()))
    assert got == _oracle_regions(grid)


def test_polygonize_single_region(ray_session):
    import ray.data

    grid = np.zeros((20, 20), np.int32)
    tiles = ray.data.from_arrow(grid_to_tiles(grid, tile=7))
    out = polygonize_tiles(tiles, connect=4)
    assert out.num_rows == 1
    assert out["n_pixels"][0].as_py() == 400
    assert (out["xmin"][0].as_py(), out["ymin"][0].as_py(),
            out["xmax"][0].as_py(), out["ymax"][0].as_py()) == (0, 0, 19, 19)
