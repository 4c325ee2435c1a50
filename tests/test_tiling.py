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


def test_overview_methods_reduce_quads():
    """Direct check of every overview method's masked 2x2 semantics on a
    hand-built quad (values 10, 20, 20, 250 with one invalid corner)."""
    from gdal_ray.stages.tiling import _reduce_quads

    T = 2
    big = np.zeros((2 * T, 2 * T, 3), np.float64)
    cnt = np.zeros((2 * T, 2 * T), np.int32)
    # parent pixel (0,0): quad TL=10 TR=20 BL=20 BR=250, all valid
    big[0, 0] = 10; big[0, 1] = 20; big[1, 0] = 20; big[1, 1] = 250
    cnt[:2, :2] = 1
    # parent pixel (0,1): quad TL invalid, TR=40 BL=60 BR=60
    big[0, 3] = 40; big[1, 2] = 60; big[1, 3] = 60
    cnt[0, 3] = cnt[1, 2] = cnt[1, 3] = 1
    q = big.reshape(T, 2, T, 2, 3)
    c = cnt.reshape(T, 2, T, 2)
    csum = c.sum(axis=(1, 3))
    valid = csum > 0
    got = {m: _reduce_quads(q, c, csum, valid, m, T)
           for m in ("average", "rms", "nearest", "min", "max", "mode")}
    assert got["average"][0, 0, 0] == 75          # (10+20+20+250)/4
    assert got["average"][0, 1, 0] == 53          # (40+60+60)/3 -> 53.33 -> 53
    assert got["rms"][0, 0, 0] == 126             # sqrt(mean squares) = 125.8
    assert got["nearest"][0, 0, 0] == 10          # TL valid
    assert got["nearest"][0, 1, 0] == 40          # TL invalid -> TR
    assert got["min"][0, 0, 0] == 10 and got["max"][0, 0, 0] == 250
    assert got["mode"][0, 0, 0] == 20             # 20 appears twice
    assert got["mode"][0, 1, 0] == 60
    # invalid parent pixels come out 0 everywhere
    for m, arr in got.items():
        assert (arr[1, :, :] == 0).all() and (arr[0, :, :].ndim == 2)


def test_overview_method_nearest_through_stage(ray_session):
    """`method` is wired through build_overview_level (was dead)."""
    from gdal_ray.stages.tiling import build_overview_level, compose_tiles

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (256, 256, 3), np.uint8)
    frag = _frag(6, 9, 10, "img00000001", 0, 0, 256, 256, 0)
    frag["pixels"] = encode_image(px, "raw")
    tiles = compose_tiles(_frag_ds(ray_session, [frag]))
    parents = _tiles_dict(build_overview_level(tiles, method="nearest"))
    p = next(iter(parents.values()))
    out = decode_image(p["pixels"])
    np.testing.assert_array_equal(out[128:, :128], px[::2, ::2])


def test_parquet_keyed_loader_matches_synth(ray_session, tmp_path):
    """ParquetKeyedLoader returns exactly the synthesized rows for a
    keyed subset, in ascending image order."""
    from gdal_ray.sources.images import (ParquetKeyedLoader, corpus_dataset,
                                         make_batch)

    path = str(tmp_path / "corpus")
    corpus_dataset(24).write_parquet(path)
    loader = ParquetKeyedLoader(path)
    idxs = np.array([3, 7, 20])
    got = loader(idxs)
    want = make_batch(idxs)
    assert got["image_id"].to_pylist() == want["image_id"].to_pylist()
    assert [b.as_py() for b in got["bytes"]] == [b.as_py() for b in want["bytes"]]


def test_sink_fs_uri_roundtrip(ray_session, tmp_path):
    """file:// URI out_dir routes through FileSystem.from_uri — the
    object-store swap point (ADVICE r2: plain worker-local paths lose
    tiles on multi-node). Same manifests, same resume behavior."""
    from gdal_ray.pipelines.tile_pyramid import tile_pyramid
    from gdal_ray.stages.tiling import clean_orphans, finished_tile_keys

    local = str(tmp_path / "pyr_local")
    via_uri = str(tmp_path / "pyr_uri")
    m1 = tile_pyramid(16, local, zoom=14, min_zoom=13, concurrency=2)
    m2 = tile_pyramid(16, "file://" + via_uri, zoom=14, min_zoom=13,
                      concurrency=2)
    assert m2["n_tiles_total"] == m1["n_tiles_total"] > 0
    assert finished_tile_keys("file://" + via_uri) == finished_tile_keys(local)
    # resume through the URI path: nothing left to do
    m3 = tile_pyramid(16, "file://" + via_uri, zoom=14, min_zoom=13,
                      concurrency=2, resume=True)
    assert m3["n_tiles_total"] == 0
    assert clean_orphans("file://" + via_uri) == []
