"""Metadata-partitioned tiling vs the fragment-shuffle reference path
(must be bit-identical, including salted hot leaves)."""

import numpy as np
import pytest

from gdal_ray.stages.partitioned_tiling import (corpus_bboxes,
                                                quadtree_partitions)


def _tiles_dict(ds):
    out = {}
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            out[r["tile_key"]] = r
    return out


def test_quadtree_partitions_cover_and_salt():
    bbs = corpus_bboxes(64)
    t = quadtree_partitions(bbs, base_zoom=10, max_images_per_part=4,
                            max_part_zoom=14)
    idxs = set(t["image_idx"].to_pylist())
    assert idxs == set(range(64))  # every image assigned somewhere
    import collections

    per_leaf = collections.Counter()
    for k, s in zip(t["part_key"].to_pylist(), t["salt"].to_pylist()):
        per_leaf[(k, s)] += 1
    # after salting, no (leaf, salt) group exceeds the threshold + 3
    assert max(per_leaf.values()) <= 4 + 3


def test_partitioned_equals_shuffle_compose(ray_session):
    from gdal_ray.pipelines.tile_pyramid import warp_compose
    from gdal_ray.stages.partitioned_tiling import warp_compose_partitioned

    # tight threshold + shallow max zoom forces salted hot leaves
    a = _tiles_dict(warp_compose_partitioned(
        48, concurrency=2, max_images_per_part=4, max_part_zoom=14))
    b = _tiles_dict(warp_compose(48, concurrency=2))
    assert a.keys() == b.keys()
    for k in a:
        assert a[k]["pixels"] == b[k]["pixels"]
        assert a[k]["alpha"] == b[k]["alpha"]
        assert a[k]["checksum"] == b[k]["checksum"]
        assert a[k]["n_src"] == b[k]["n_src"]
        assert a[k]["n_valid"] == b[k]["n_valid"]


def test_distributed_assignment_matches_driver(ray_session):
    """The distributed footprint->count->walk assignment must produce
    the same leaf set and per-leaf image sets as the driver-side
    reference implementation."""
    import collections

    from gdal_ray.stages.partitioned_tiling import (assignment_dataset,
                                                    footprint_dataset,
                                                    quadtree_leaves)

    fp = footprint_dataset(64).materialize()
    leaves = quadtree_leaves(fp, base_zoom=10, max_images_per_part=4,
                             max_part_zoom=14)
    ref_t = quadtree_partitions(corpus_bboxes(64), base_zoom=10,
                                max_images_per_part=4, max_part_zoom=14)
    ref = collections.defaultdict(set)
    for k, i in zip(ref_t["part_key"].to_pylist(), ref_t["image_idx"].to_pylist()):
        ref[k].add(i)
    assert set(leaves) == set(ref)
    assert all(leaves[k] == len(ref[k]) for k in ref)

    got = collections.defaultdict(set)
    per_group = collections.Counter()
    ds = assignment_dataset(fp, leaves, 10, 4, 64)
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            got[r["part_key"]].add(r["image_idx"])
            per_group[(r["part_key"], r["salt"])] += 1
    assert {k: v for k, v in got.items()} == dict(ref)
    # salt ranks balance every (leaf, salt) group to <= threshold
    assert max(per_group.values()) <= 4


def test_fast_leaves_match_iterative(ray_session):
    """The single-pass quadtree (one map_batches + one combiner) must
    produce exactly the iterative refinement's leaf map."""
    from gdal_ray.stages.partitioned_tiling import (footprint_dataset,
                                                    quadtree_leaves,
                                                    quadtree_leaves_fast)

    fp = footprint_dataset(64).materialize()
    a = quadtree_leaves(fp, base_zoom=10, max_images_per_part=4,
                        max_part_zoom=14)
    b = quadtree_leaves_fast(fp, base_zoom=10, max_images_per_part=4,
                             max_part_zoom=14)
    assert b is not None and a == b


def test_pack_buckets_balances_and_separates():
    """Weighted bin-packing: every (leaf, salt) item gets a bucket,
    plain/salted land in disjoint ranges, and no bucket holds more
    than ~(max item + fair share) weight."""
    from gdal_ray.stages.partitioned_tiling import pack_buckets

    leaf_map = {100 + i: c for i, c in enumerate(
        [1, 2, 3, 5, 8, 8, 8, 30, 31, 32, 33, 70, 129])}
    out = pack_buckets(leaf_map, max_images_per_part=32, num_buckets=8)
    # coverage: one entry per (leaf, salt)
    for k, cnt in leaf_map.items():
        ns = max(1, -(-cnt // 32))
        for s in range(ns):
            assert (k, s) in out
        assert (k, ns) not in out
    # plain (n_salt==1) and salted leaves use disjoint bucket sets
    plain_b = {b for (k, s), b in out.items()
               if leaf_map[k] <= 32}
    salted_b = {b for (k, s), b in out.items() if leaf_map[k] > 32}
    assert not (plain_b & salted_b)
    # balance: max bucket load <= fair share + max single item
    loads = {}
    for (k, s), b in out.items():
        ns = max(1, -(-leaf_map[k] // 32))
        base, extra = divmod(leaf_map[k], ns)
        loads[b] = loads.get(b, 0) + base + (1 if s < extra else 0)
    plain_w = sum(c for c in leaf_map.values() if c <= 32)
    fair = plain_w / max(1, len(plain_b))
    assert max(loads[b] for b in plain_b) <= fair + 32


def test_owner_clip_matches_posthoc_filter():
    """warp_image_to_tiles(owner=...) must produce exactly the
    fragments the unclipped warp produces for tiles inside the owner
    leaf — same keys, same bytes."""
    import numpy as np

    from gdal_ray.sources.images import georef, image_pixels
    from gdal_ray.stages.warp import warp_image_to_tiles

    px = image_pixels(7)
    gt, epsg = georef(7)
    full = warp_image_to_tiles(px, gt, epsg, "img7", None)
    assert full, "fixture image must produce fragments"
    # pick the leaf (parent at z-1) of the first fragment as owner
    z0 = full[0]["z"]
    pz, ptx, pty = z0 - 1, full[0]["tx"] >> 1, full[0]["ty"] >> 1
    want = {f["tile_key"]: f for f in full
            if (f["tx"] >> (f["z"] - pz)) == ptx
            and (f["ty"] >> (f["z"] - pz)) == pty}
    got = {f["tile_key"]: f for f in warp_image_to_tiles(
        px, gt, epsg, "img7", None, owner=(pz, ptx, pty))}
    assert got.keys() == want.keys()
    for k in want:
        assert got[k]["pixels"] == want[k]["pixels"]
        assert got[k]["mask"] == want[k]["mask"]
        assert (got[k]["x0"], got[k]["y0"], got[k]["fw"], got[k]["fh"]) == \
               (want[k]["x0"], want[k]["y0"], want[k]["fw"], want[k]["fh"])


def test_vectorized_cell_expansion_matches_scalar():
    """_cell_range_vec + _expand_ranges must reproduce _cells_touched
    for every bbox, including edge-clipped and degenerate ones."""
    import numpy as np

    from gdal_ray.functions.crs import WEB_MERCATOR_EXTENT as E
    from gdal_ray.stages.partitioned_tiling import (_cell_range_vec,
                                                    _cells_touched,
                                                    _expand_ranges)

    rng = np.random.default_rng(7)
    boxes = []
    for _ in range(200):
        x0, y0 = rng.uniform(-E, E, 2)
        w, h = rng.uniform(0, E / 4, 2)
        boxes.append((x0, y0, min(x0 + w, E), min(y0 + h, E)))
    boxes += [(-E, -E, E, E), (0.0, 0.0, 0.0, 0.0), (E - 1, E - 1, E, E)]
    xmin, ymin, xmax, ymax = (np.array(v) for v in zip(*boxes))
    for z in (0, 1, 5, 10):
        row, tx, ty = _expand_ranges(
            *_cell_range_vec(xmin, ymin, xmax, ymax, z))
        got = {}
        for r, a, b in zip(row, tx, ty):
            got.setdefault(int(r), set()).add((int(a), int(b)))
        for i, bb in enumerate(boxes):
            assert got.get(i, set()) == set(_cells_touched(bb, z)), (i, z)
