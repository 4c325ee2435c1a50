"""Zarr v2 store roundtrips (reference frmts/zarr/zarr_v2_array.cpp
semantics: chunk grid, fill_value for missing chunks, compressors,
dimension_separator, _ARRAY_DIMENSIONS)."""

import json
import os

import numpy as np
import pytest

from gdal_ray.sources.zarr import (read_zarr_array, write_zarr_array,
                                   write_zarr_from_dataset)


@pytest.mark.parametrize("dtype", ["<f8", "<f4", "<i4", "|u1", "<u2", "<i8"])
def test_roundtrip_dtypes(tmp_path, dtype):
    rng = np.random.default_rng(3)
    arr = (rng.random((13, 17)) * 100).astype(np.dtype(dtype))
    p = str(tmp_path / "a.zarr")
    write_zarr_array(p, arr, chunks=(5, 6))
    got = read_zarr_array(p)
    assert got.shape == (13, 17)
    np.testing.assert_array_equal(got.read(), arr)
    # windowed read crossing chunk boundaries
    np.testing.assert_array_equal(got.read((3, 4), (8, 9)), arr[3:11, 4:13])


@pytest.mark.parametrize("comp", [None, {"id": "zlib", "level": 1},
                                  {"id": "gzip", "level": 4}])
def test_compressors(tmp_path, comp):
    arr = np.arange(48, dtype=np.float64).reshape(6, 8)
    p = str(tmp_path / "c.zarr")
    write_zarr_array(p, arr, chunks=(4, 4), compressor=comp)
    np.testing.assert_array_equal(read_zarr_array(p).read(), arr)


def test_missing_chunk_reads_fill(tmp_path):
    arr = np.ones((8, 8), np.float64)
    p = str(tmp_path / "f.zarr")
    write_zarr_array(p, arr, chunks=(4, 4), fill_value=-5.0)
    os.remove(os.path.join(p, "1.0"))
    got = read_zarr_array(p).read()
    assert (got[4:, :4] == -5.0).all()
    assert (got[:4] == 1.0).all()


def test_nan_fill_and_separator(tmp_path):
    arr = np.full((4, 4), 2.5)
    p = str(tmp_path / "n.zarr")
    write_zarr_array(p, arr, chunks=(2, 2), fill_value=float("nan"),
                     dimension_separator="/")
    meta = json.load(open(os.path.join(p, ".zarray")))
    assert meta["fill_value"] == "NaN"
    assert meta["dimension_separator"] == "/"
    assert os.path.exists(os.path.join(p, "1", "1"))
    os.remove(os.path.join(p, "0", "1"))
    got = read_zarr_array(p).read()
    assert np.isnan(got[:2, 2:]).all()
    assert (got[:, :2] == 2.5).all()


def test_partial_edge_chunks_padded(tmp_path):
    # 5x7 with 4x4 chunks: edge chunk files must be full-size
    arr = np.arange(35, dtype=np.int32).reshape(5, 7)
    p = str(tmp_path / "e.zarr")
    write_zarr_array(p, arr, chunks=(4, 4), compressor=None)
    raw = open(os.path.join(p, "1.1"), "rb").read()
    assert len(raw) == 4 * 4 * 4
    np.testing.assert_array_equal(read_zarr_array(p).read(), arr)


def test_fortran_order_read(tmp_path):
    # hand-write an F-order store; the reader must honor it
    arr = np.arange(24, dtype=np.float64).reshape(4, 6)
    p = tmp_path / "fo.zarr"
    p.mkdir()
    json.dump({"zarr_format": 2, "shape": [4, 6], "chunks": [4, 6],
               "dtype": "<f8", "compressor": None, "fill_value": 0,
               "filters": None, "order": "F"},
              open(p / ".zarray", "w"))
    open(p / "0.0", "wb").write(np.asfortranarray(arr).tobytes(order="F"))
    np.testing.assert_array_equal(read_zarr_array(str(p)).read(), arr)


def test_dims_attrs_and_unscaled_view(tmp_path):
    arr = np.arange(12, dtype=np.int16).reshape(3, 4)
    p = str(tmp_path / "d.zarr")
    write_zarr_array(p, arr, chunks=(3, 4), dims=("y", "x"),
                     attrs={"scale_factor": 0.5, "add_offset": 10.0})
    md = read_zarr_array(p)
    assert md.dims == ("y", "x")
    un = md.unscaled()
    np.testing.assert_allclose(un.read(), arr * 0.5 + 10.0)


def test_unsupported_raise(tmp_path):
    arr = np.zeros((2, 2))
    p = str(tmp_path / "u.zarr")
    write_zarr_array(p, arr, chunks=(2, 2))
    meta = json.load(open(os.path.join(p, ".zarray")))
    meta["compressor"] = {"id": "blosc"}
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(NotImplementedError):
        read_zarr_array(p).read()
    meta["compressor"] = None
    meta["zarr_format"] = 3
    json.dump(meta, open(os.path.join(p, ".zarray"), "w"))
    with pytest.raises(NotImplementedError):
        read_zarr_array(p)


def test_distributed_roundtrip(ray_session, tmp_path):
    """classic-tile Dataset -> task-side chunk files -> lazy Dataset
    read-back, bit-identical to the source field."""
    from gdal_ray.sources.multidim import synthetic_mdarray

    arr = synthetic_mdarray(t=2, y=100, x=90).slice_view("time", 0, 1)
    field = arr.read()[0]
    ds = arr.as_classic_dataset("x", "y", tile=32)
    p = str(tmp_path / "dist.zarr")
    n = write_zarr_from_dataset(ds, p, shape=field.shape, dtype="<f8",
                                tile=32, dims=("y", "x"))
    assert n == 4 * 3
    md = read_zarr_array(p)
    assert md.dims == ("y", "x")
    np.testing.assert_allclose(md.read(), field, atol=1e-12)
    # distributed read-back through the classic bridge
    back = md.as_classic_dataset("x", "y", tile=32)
    total = 0
    for b in back.iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            px = np.frombuffer(r["pixels"], np.float64).reshape(
                r["h"], r["w"])
            np.testing.assert_allclose(
                px, field[r["ty"]:r["ty"] + r["h"],
                          r["tx"]:r["tx"] + r["w"]], atol=1e-12)
            total += 1
    assert total == 12
