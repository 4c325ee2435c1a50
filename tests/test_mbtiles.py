"""MBTiles + GPKG raster-tile conformance vs the reference's OWN
fixtures (autotest/gdrivers/mbtiles.py, autotest/gdrivers/gpkg.py) and
engine-native pyramid sink/source roundtrips."""

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.codecs import decode_image, encode_image
from gdal_ray.functions.tiles import tile_key
from gdal_ray.sources.mbtiles import (gpkg_tile_tables, is_mbtiles,
                                      read_gpkg_tiles, read_mbtiles,
                                      tiles_dataset, write_gpkg_tiles,
                                      write_mbtiles)

MB = "/root/reference/autotest/gdrivers/data/mbtiles"
GP = "/root/reference/autotest/gdrivers/data/gpkg"


def test_world_l1_full_grid_goldens():
    # autotest/gdrivers/mbtiles.py test_mbtiles_2 (USE_BOUNDS=NO):
    # libjpeg-6b checksum column + exact geotransform.
    r = read_mbtiles(f"{MB}/world_l1.mbtiles", use_bounds=False)
    px = r["pixels"]
    assert px.shape == (512, 512, 4)
    assert [checksum_image(px[:, :, i]) for i in range(3)] == \
        [6324, 19386, 45258]
    assert r["gt"] == pytest.approx(
        (-20037508.342789244, 78271.516964020484, 0.0,
         20037508.342789244, 0.0, -78271.516964020484), abs=1e-6)
    assert r["epsg"] == 3857
    # zoom 0 = the overview level (test_mbtiles_2 overview checksums)
    ov = read_mbtiles(f"{MB}/world_l1.mbtiles", zoom=0, use_bounds=False)
    assert [checksum_image(ov["pixels"][:, :, i]) for i in range(3)] == \
        [16642, 15772, 10029]


def test_world_l1_bounds_clip():
    # test_mbtiles_4: default open clips to bounds metadata -> 512x510
    r = read_mbtiles(f"{MB}/world_l1.mbtiles")
    assert r["pixels"].shape[:2] == (510, 512)
    assert r["gt"][3] == pytest.approx(19971868.880408563, abs=1e-6)
    assert r["meta"]["bounds"] == "-180.0,-85,180,85"


def test_byte_mbtiles_golden():
    # test_mbtiles (byte.mbtiles.sql open): band-1 checksum 4118
    r = read_mbtiles(f"{MB}/byte.mbtiles")
    assert checksum_image(r["pixels"][:, :, 0]) == 4118
    assert is_mbtiles(f"{MB}/byte.mbtiles")


def test_byte_gpkg_golden():
    # data/gpkg/byte.gpkg: byte.tif re-tiled -> checksum 4672, exact
    # gt from gpkg_contents extent, srs 26711, 20x20 window clip
    assert gpkg_tile_tables(f"{GP}/byte.gpkg") == ["byte"]
    r = read_gpkg_tiles(f"{GP}/byte.gpkg")
    assert r["pixels"].shape[:2] == (20, 20)
    assert checksum_image(r["pixels"][:, :, 0]) == 4672
    assert r["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert r["epsg"] == 26711


def test_webp_tiles_raise_honestly():
    # world_l1_webp.mbtiles holds lossy VP8X/ALPH/VP8 payloads — still
    # out of scope; lossless VP8L tile blobs decode natively
    # (tests/test_webp.py::test_mbtiles_webp_blob_path).
    with pytest.raises(NotImplementedError, match="VP8"):
        read_mbtiles(f"{MB}/world_l1_webp.mbtiles", use_bounds=False)


def _synthetic_tiles(z: int = 3, nx: int = 3, ny: int = 2):
    from gdal_ray.stages.tiling import TILE_SCHEMA, _rows_table

    rng = np.random.default_rng(42)
    rows = []
    for tx in range(2, 2 + nx):
        for ty in range(1, 1 + ny):
            canvas = rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)
            valid = np.ones((256, 256), bool)
            if (tx + ty) % 2:  # some tiles partially valid
                valid[200:, :] = False
                canvas[~valid] = 0
            rows.append({
                "tile_key": int(tile_key(tx, ty, z)),
                "z": z, "tx": tx, "ty": ty,
                "pixels": encode_image(canvas, "raw"),
                "alpha": np.packbits(valid.astype(np.uint8)).tobytes(),
                "n_src": 1, "n_valid": int(valid.sum()),
                "checksum": checksum_image(
                    np.where(valid, canvas[:, :, 0], 0)),
            })
    return _rows_table(rows, TILE_SCHEMA)


def test_mbtiles_roundtrip(ray_session, tmp_path):
    import ray.data

    src = _synthetic_tiles()
    path = str(tmp_path / "rt.mbtiles")
    stats = write_mbtiles(ray.data.from_arrow(src), path, fmt="png")
    assert stats["n_tiles"] == 6 and stats["zooms"] == [3]
    r = read_mbtiles(path, use_bounds=False)
    assert r["pixels"].shape == (512, 768, 4)
    # re-derive per-tile checksums from the mosaic (alpha zeroes the
    # invalid rows exactly like the stored checksum convention)
    got = {}
    for row in src.to_pylist():
        x0 = (row["tx"] - 2) * 256
        y0 = (row["ty"] - 1) * 256
        sub = r["pixels"][y0:y0 + 256, x0:x0 + 256]
        band = np.where(sub[:, :, 3] > 0, sub[:, :, 0], 0)
        got[row["tile_key"]] = checksum_image(band)
        assert got[row["tile_key"]] == row["checksum"]
    # engine-native re-read: TILE_SCHEMA Dataset from the file
    back = tiles_dataset(path)
    tabs = pa.concat_tables(
        [b for b in back.iter_batches(batch_size=None,
                                      batch_format="pyarrow")])
    assert tabs.num_rows == 6
    for rec in tabs.to_pylist():
        px = decode_image(rec["pixels"])
        orig = next(x for x in src.to_pylist()
                    if x["tile_key"] == rec["tile_key"])
        ov = np.unpackbits(
            np.frombuffer(orig["alpha"], np.uint8))[:256 * 256].reshape(
                256, 256).astype(bool)
        opx = decode_image(orig["pixels"])
        if opx.ndim == 2:
            opx = opx[:, :, None].repeat(3, axis=2)
        assert np.array_equal(px[ov], opx[ov])


def test_gpkg_tiles_roundtrip(ray_session, tmp_path):
    import ray.data

    src = _synthetic_tiles()
    path = str(tmp_path / "rt.gpkg")
    stats = write_gpkg_tiles(ray.data.from_arrow(src), path)
    assert stats["n_tiles"] == 6
    r = read_gpkg_tiles(path)
    assert r["epsg"] == 3857
    assert r["pixels"].shape[:2] == (512, 768)
    first = src.to_pylist()[0]
    sub = r["pixels"][:256, :256]
    band = np.where(sub[:, :, 3] > 0, sub[:, :, 0], 0)
    assert checksum_image(band) == first["checksum"]
    # cross-format: the same pyramid through MBTiles equals GPKG
    mpath = str(tmp_path / "rt2.mbtiles")
    write_mbtiles(ray.data.from_arrow(src), mpath)
    m = read_mbtiles(mpath, use_bounds=False)
    assert np.array_equal(m["pixels"], r["pixels"][:, :, :4]) or \
        np.array_equal(m["pixels"][:, :, :3], r["pixels"][:, :, :3])


def test_gpkg_tiles_dataset_feeds_overview(ray_session, tmp_path):
    """tiles_dataset output feeds build_overview_level unchanged —
    the sink/source pair composes with the pyramid engine."""
    import ray.data

    from gdal_ray.stages.tiling import build_overview_level

    src = _synthetic_tiles(z=3, nx=2, ny=2)
    path = str(tmp_path / "ov.gpkg")
    write_gpkg_tiles(ray.data.from_arrow(src), path)
    back = tiles_dataset(path)
    ov = build_overview_level(back)
    tabs = pa.concat_tables(
        [b for b in ov.iter_batches(batch_size=None,
                                    batch_format="pyarrow")])
    assert set(tabs["z"].to_pylist()) == {2}
    # tx 2..3 share parent 1; ty 1..2 straddle parents 0 and 1
    assert sorted((r["tx"], r["ty"]) for r in tabs.to_pylist()) == \
        [(1, 0), (1, 1)]
