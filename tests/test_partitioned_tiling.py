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
