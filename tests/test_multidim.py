"""GDALMDArray-style lazy views: composition must equal direct numpy."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.sources.multidim import MDArray, synthetic_mdarray


@pytest.fixture(scope="module")
def arr():
    return synthetic_mdarray(t=4, y=50, x=60)


def _full(a: MDArray) -> np.ndarray:
    return a.read()


def test_windowed_read_equals_full_slice(arr):
    full = _full(arr)
    win = arr.read((1, 10, 20), (2, 15, 25))
    np.testing.assert_allclose(win, full[1:3, 10:25, 20:45])


def test_slice_view(arr):
    full = _full(arr)
    v = arr.slice_view("time", 1, 3)
    assert v.shape == (2, 50, 60)
    np.testing.assert_allclose(_full(v), full[1:3])
    # windowed read through the view
    np.testing.assert_allclose(v.read((0, 5, 5), (1, 10, 10)),
                               full[1:2, 5:15, 5:15])


def test_transpose_view(arr):
    full = _full(arr)
    v = arr.transpose((2, 0, 1))  # (x, time, y)
    assert v.dims == ("x", "time", "y")
    assert v.shape == (60, 4, 50)
    np.testing.assert_allclose(_full(v), full.transpose(2, 0, 1))
    np.testing.assert_allclose(v.read((10, 1, 5), (5, 2, 7)),
                               full.transpose(2, 0, 1)[10:15, 1:3, 5:12])


def test_unscaled_view(arr):
    full = _full(arr)
    v = arr.unscaled()
    np.testing.assert_allclose(_full(v), full * 0.5 - 20.0)
    assert "scale" not in v.attrs


def test_view_composition(arr):
    full = _full(arr)
    v = arr.slice_view("time", 2, 4).transpose((0, 2, 1)).unscaled()
    want = (full[2:4].transpose(0, 2, 1)) * 0.5 - 20.0
    np.testing.assert_allclose(_full(v), want)


def test_as_classic_dataset(arr, ray_session):
    ds = arr.slice_view("time", 0, 1).as_classic_dataset("x", "y", tile=32)
    full = _full(arr)[0]
    seen = np.full(full.shape, np.nan)
    nrows = 0
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            block = np.frombuffer(r["pixels"], np.float64).reshape(
                r["bands"], r["h"], r["w"])
            seen[r["ty"]:r["ty"] + r["h"], r["tx"]:r["tx"] + r["w"]] = block[0]
            nrows += 1
    assert nrows == 2 * 2  # 50x60 at tile 32 -> 2x2 grid
    np.testing.assert_allclose(seen, full)


def test_bounds_checked(arr):
    with pytest.raises(IndexError):
        arr.read((0, 0, 0), (5, 50, 60))


def test_resampled_view_nearest_matches_direct():
    """GetResampled (gdal_priv.h:4439): nearest 2x downsample equals
    direct decimation of the parent; chunked reads equal full reads."""
    import numpy as np

    from gdal_ray.sources.multidim import synthetic_mdarray

    arr = synthetic_mdarray(t=2, y=64, x=80)
    r = arr.resampled("x", "y", 40, 32, "nearest")
    assert r.shape == (2, 32, 40)
    full = r.read()
    parent = arr.read()
    # nearest at center (j+0.5)*2 -> floor = 2j+1
    assert np.array_equal(full, parent[:, 1::2, 1::2])
    # chunk consistency (the lazy-view contract)
    chunk = r.read((1, 8, 10), (1, 16, 20))
    assert np.array_equal(chunk, full[1:2, 8:24, 10:30])


def test_resampled_bilinear_range():
    import numpy as np

    from gdal_ray.sources.multidim import synthetic_mdarray

    arr = synthetic_mdarray(t=1, y=50, x=50)
    up = arr.resampled("x", "y", 100, 100, "bilinear")
    full = up.read()
    parent = arr.read()
    assert full.shape == (1, 100, 100)
    assert full.min() >= parent.min() - 1e-9
    assert full.max() <= parent.max() + 1e-9


def test_gridded_from_points():
    """GetGridded (gdal_priv.h:4445): IDW grid is exact at a point's
    own cell center when the point sits there, and chunked == full."""
    import numpy as np

    from gdal_ray.sources.multidim import gridded_from_points

    # one point exactly at the center of cell (2, 3) of an 8x8 grid
    g = gridded_from_points(np.array([3.5, 6.0]), np.array([2.5, 7.0]),
                            np.array([10.0, -4.0]), 8, 8, (0, 0, 8, 8))
    full = g.read()
    assert full.shape == (8, 8)
    assert abs(full[2, 3] - 10.0) < 1e-6  # numerically dominated
    chunk = g.read((2, 2), (3, 4))
    assert np.allclose(chunk, full[2:5, 2:6])
