"""Compose / overview / resume tests (SURVEY.md §2.6 semantics:
mosaic winner order, overviews-from-finer-zoom, --resume skip)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.functions.codecs import decode_image, encode_image
from gdal_ray.functions.tiles import tile_key
from gdal_ray.stages.tiling import sort_value
from gdal_ray.stages.warp import FRAGMENT_SCHEMA


def _frag(tx, ty, z, image_id, x0, y0, fw, fh, value):
    px = np.full((fh, fw, 3), value, np.uint8)
    mask = np.ones((fh, fw), np.uint8)
    return {
        "tile_key": int(tile_key(tx, ty, z)), "z": z, "tx": tx, "ty": ty,
        "image_id": image_id, "x0": x0, "y0": y0, "fw": fw, "fh": fh,
        "pixels": encode_image(px, "raw"),
        "mask": np.packbits(mask).tobytes(),
        "n_valid": int(fw * fh),
    }


def _frag_ds(ray, frags):
    import ray.data

    cols = {f.name: [fr[f.name] for fr in frags] for f in FRAGMENT_SCHEMA}
    t = pa.table({f.name: pa.array(cols[f.name], f.type) for f in FRAGMENT_SCHEMA})
    return ray.data.from_arrow(t)


def _tiles_dict(ds):
    out = {}
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            out[r["tile_key"]] = r
    return out


def test_sort_value_numeric_suffix_order():
    assert sort_value("img00000002") == 2
    assert sort_value("img00000010") > sort_value("img00000002")
    # non-numeric ids still get a deterministic value
    assert sort_value("abc") == sort_value("abc")


def test_compose_winner_rule(ray_session):
    """Overlapping fragments: the higher sort value wins per pixel."""
    from gdal_ray.stages.tiling import compose_tiles

    frags = [
        _frag(10, 20, 8, "img00000001", 0, 0, 64, 64, 50),
        _frag(10, 20, 8, "img00000002", 32, 32, 64, 64, 200),
    ]
    tiles = _tiles_dict(compose_tiles(_frag_ds(ray_session, frags)))
    assert len(tiles) == 1
    t = next(iter(tiles.values()))
    px = decode_image(t["pixels"])
    assert px[10, 10, 0] == 50         # only img1
    assert px[40, 40, 0] == 200        # overlap -> img2 wins
    assert px[90, 90, 0] == 200        # only img2
    assert px[200, 200, 0] == 0        # empty
    assert t["n_src"] == 2
    assert t["n_valid"] == 64 * 64 * 2 - 32 * 32


def test_salted_compose_identical(ray_session):
    """salt=k must produce bit-identical tiles to unsalted compose."""
    from gdal_ray.stages.tiling import compose_tiles

    rng = np.random.default_rng(7)
    frags = []
    for i in range(12):
        v = int(rng.integers(1, 255))
        x0, y0 = int(rng.integers(0, 128)), int(rng.integers(0, 128))
        frags.append(_frag(3, 4, 9, f"img{i:08d}", x0, y0, 96, 96, v))
    plain = _tiles_dict(compose_tiles(_frag_ds(ray_session, frags)))
    salted = _tiles_dict(compose_tiles(_frag_ds(ray_session, frags), salt=4))
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k]["checksum"] == salted[k]["checksum"]
        assert plain[k]["pixels"] == salted[k]["pixels"]
        assert plain[k]["alpha"] == salted[k]["alpha"]
        assert plain[k]["n_src"] == salted[k]["n_src"]


def test_overview_masked_average(ray_session):
    """One full child tile -> parent quadrant = 2x2 average; empty
    quadrants stay invalid."""
    from gdal_ray.stages.tiling import build_overview_level, compose_tiles

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (256, 256, 3), np.uint8)
    frag = _frag(6, 9, 10, "img00000001", 0, 0, 256, 256, 0)
    frag["pixels"] = encode_image(px, "raw")
    tiles = compose_tiles(_frag_ds(ray_session, [frag]))
    parents = _tiles_dict(build_overview_level(tiles))
    assert len(parents) == 1
    p = next(iter(parents.values()))
    assert p["z"] == 9 and p["tx"] == 3 and p["ty"] == 4
    out = decode_image(p["pixels"])
    # child (6,9): quadrant x = 6&1 = 0, y = 9&1 = 1 -> bottom-left
    q = out[128:, :128]
    expect = px.reshape(128, 2, 128, 2, 3).astype(np.float64).mean(axis=(1, 3))
    expect = np.clip(np.floor(expect + 0.5), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(q, expect)
    # other quadrants invalid
    alpha = np.unpackbits(np.frombuffer(p["alpha"], np.uint8),
                          count=256 * 256).reshape(256, 256).astype(bool)
    assert alpha[128:, :128].all()
    assert not alpha[:128, :].any() and not alpha[128:, 128:].any()
    assert p["n_valid"] == 128 * 128


def test_pyramid_and_resume(ray_session, tmp_path):
    """tile_pyramid writes manifests; a resumed run skips everything."""
    from gdal_ray.pipelines.tile_pyramid import tile_pyramid
    from gdal_ray.stages.tiling import finished_tile_keys

    out = str(tmp_path / "pyr")
    m1 = tile_pyramid(24, out, zoom=14, min_zoom=12, concurrency=2)
    assert m1["n_tiles_total"] > 0
    assert m1["levels"][14]["n_tiles"] >= m1["levels"][13]["n_tiles"]
    done = finished_tile_keys(out)
    assert len(done) == m1["n_tiles_total"]
    files_before = sorted(glob.glob(os.path.join(out, "*.parquet")))
    # resume: nothing new to do
    m2 = tile_pyramid(24, out, zoom=14, min_zoom=12, concurrency=2, resume=True)
    assert m2["n_tiles_total"] == 0
    assert sorted(glob.glob(os.path.join(out, "*.parquet"))) == files_before


def test_pyramid_overview_conservation(ray_session, tmp_path):
    """Sum of valid pixels shrinks ~4x per level (masked average)."""
    from gdal_ray.pipelines.tile_pyramid import tile_pyramid

    out = str(tmp_path / "pyr2")
    m = tile_pyramid(16, out, zoom=15, min_zoom=13, concurrency=2)
    v15 = m["levels"][15]["n_valid_px"]
    v14 = m["levels"][14]["n_valid_px"]
    # each valid parent pixel covers >=1 valid child pixel; ratio in (2,6)
    assert 2.0 < v15 / v14 < 6.0
