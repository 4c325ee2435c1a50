"""Flagship pipeline: image corpus -> decode (actor pool) -> checksum
+ georef -> tile assignment (vectorized) -> S2 cell key -> PIP join
against the polygon layer (broadcast packed index) -> per-image
summary rows.

This is the M0-M1-M4 slice of SURVEY.md §7.1 (warp/compose joins in
stages/warp.py + stages/tiling.py extend it). Captions ride through
untouched (byte-equality invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.affine import apply_gt, bounds_of
from ..functions.checksum import checksum_image
from ..functions.codecs import decode_image, decode_images
from ..functions.crs import Transformer
from ..functions.geom import PackedPolygonIndex
from ..functions.s2cell import cell_id
from ..functions.tiles import lonlat_to_tile
from ..sources.images import georef

FLAGSHIP_ZOOM = 11
CELL_LEVEL = 12


class DecodeSummarize:
    """Actor: decode + checksum + world-bounds per image.

    Stateful pieces (Transformer cache) built once per actor
    (reference OGRProjCT reuse, ogr/ogrct.cpp:1654)."""

    def __init__(self):
        self._transformers: dict[int, Transformer] = {}

    def _t(self, epsg: int) -> Transformer:
        if epsg not in self._transformers:
            self._transformers[epsg] = Transformer(epsg, 4326)
        return self._transformers[epsg]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["image_id"].to_pylist()
        caps = batch["caption"]
        out = {"image_id": ids, "caption": caps, "w": [], "h": [],
               "checksum": [], "lon": [], "lat": []}
        pixs = decode_images(batch["bytes"].to_pylist())
        for i, px in enumerate(pixs):
            idx = int(ids[i][3:])
            gt, epsg = georef(idx)
            h, w = px.shape[0], px.shape[1]
            cx, cy = apply_gt(gt, w / 2.0, h / 2.0)
            lon, lat = self._t(epsg).transform(np.atleast_1d(cx), np.atleast_1d(cy))
            out["w"].append(w)
            out["h"].append(h)
            out["checksum"].append(checksum_image(px[:, :, 0] if px.ndim == 3 else px))
            out["lon"].append(float(lon[0]))
            out["lat"].append(float(lat[0]))
        return pa.table({
            "image_id": pa.array(out["image_id"], pa.string()),
            "caption": caps,
            "w": pa.array(out["w"], pa.int32()),
            "h": pa.array(out["h"], pa.int32()),
            "checksum": pa.array(out["checksum"], pa.int64()),
            "lon": pa.array(out["lon"], pa.float64()),
            "lat": pa.array(out["lat"], pa.float64()),
        })


def assign_keys(batch: pa.Table) -> pa.Table:
    """Vectorized tile + S2 cell keys from image centers."""
    lon = batch["lon"].to_numpy()
    lat = batch["lat"].to_numpy()
    tx, ty = lonlat_to_tile(lon, lat, FLAGSHIP_ZOOM)
    cells = cell_id(lon, lat, CELL_LEVEL)
    return batch.append_column("tile_x", pa.array(tx)) \
                .append_column("tile_y", pa.array(ty)) \
                .append_column("cell", pa.array(cells))


class PolygonJoin:
    """Actor: broadcast polygon layer index; counts containing
    polygons per image center."""

    def __init__(self, fids, wkbs):
        self.index = PackedPolygonIndex(np.asarray(fids), wkbs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        pi, fid = self.index.query_points(batch["lon"].to_numpy(), batch["lat"].to_numpy())
        counts = np.zeros(batch.num_rows, np.int64)
        if len(pi):
            np.add.at(counts, pi, 1)
        return batch.append_column("n_polygons", pa.array(counts))


def flagship(num_images: int = 256, concurrency: int = 4,
             source_path: str | None = None):
    """Build the flagship Dataset (lazy; caller consumes).
    ``source_path`` reads a stored corpus parquet (column-pruned)
    instead of synthesizing — the real pipeline's shape."""
    from ..sources.images import corpus_dataset
    from ..sources.vector import polygons_table

    poly = polygons_table(64)
    fids = poly["fid"].to_numpy()
    wkbs = [w.as_py() for w in poly["geometry"]]

    # Autoscaling actor pools (min 1): a fixed-size pool that demands
    # every cluster CPU would deadlock the upstream task stages.
    if source_path is not None:
        import ray.data
        ds = ray.data.read_parquet(source_path,
                                   columns=["image_id", "bytes", "caption"])
    else:
        ds = corpus_dataset(num_images)
    # batch_size 8: decode cost per row is wildly skewed (20px..512px
    # images), so fine batches keep the actor pool balanced — the tail
    # of a coarse batching is one actor stuck with several 512^2 JPEGs.
    # Pool floor at half the target: a floor of 1 spends most of the
    # run ramping up; a fixed full-size pool starves upstream tasks.
    ds = ds.map_batches(DecodeSummarize, batch_format="pyarrow", batch_size=8,
                        concurrency=(max(1, concurrency // 2),
                                     max(2, concurrency)))
    ds = ds.map_batches(assign_keys, batch_format="pyarrow")
    ds = ds.map_batches(PolygonJoin, fn_constructor_args=(fids, wkbs),
                        batch_format="pyarrow", batch_size=128, concurrency=(1, 4))
    return ds


PHASH_N = 256     # corpus slice for the near-dup query
PHASH_BANDS = 8   # 8 bands x 8 bits: pigeonhole-guaranteed FULL recall
PHASH_T = 6       #   for hamming <= 6 (bands > threshold)


def q_phash_neardup(sf_dir: str):
    """Banded-hamming phash near-duplicate image pairs (VERDICT r4
    directive #7 — the image mirror of q_minhash_lsh):

    1. the corpus streams (image_id, phash) only — pixels never move;
    2. each row explodes to (bucket = band_id<<8 | band_byte, idx,
       phash): tiny fixed-width rows, one per band;
    3. groupby(bucket).map_groups emits the verified pairs (idx_a <
       idx_b, popcount(xor) <= T) — per-bucket work is |bucket|^2 on
       8-bit band entropy, never a global all-pairs.  A pair at
       hamming <= 6 differs in <= 6 of the 8 bands, so at least one
       band matches exactly: recall is 100% by pigeonhole, not
       probabilistic.  For petabyte corpora use wider bands (4x16,
       guarantee threshold 3) plus the megabucket cap treatment of
       pipelines/text_embed.py q_minhash_lsh;
    4. pairs found in several bands dedup by pair key (first-win
       groupby), output sorted by (id_a, id_b).

    Oracle: engine-free single-machine banded-hamming recomputation
    from the synthesis manifest (scripts/oracle_expectations.py).
    """
    import ray.data

    from ..sources.images import corpus_dataset

    ds = corpus_dataset(PHASH_N).select_columns(["image_id", "phash"])

    def explode(t: pa.Table) -> pa.Table:
        import numpy as np

        idx = np.array([int(s[3:]) for s in t["image_id"].to_pylist()],
                       np.int64)
        ph = t["phash"].to_numpy().astype(np.int64).view(np.uint64)
        buckets, idxs, phs = [], [], []
        for b in range(PHASH_BANDS):
            byte = ((ph >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(
                np.int64)
            buckets.append((b << 8) | byte)
            idxs.append(idx)
            phs.append(ph.view(np.int64))
        return pa.table({"bucket": pa.array(np.concatenate(buckets)),
                         "idx": pa.array(np.concatenate(idxs)),
                         "phash": pa.array(np.concatenate(phs))})

    def pairs(g):
        import numpy as np
        import pandas as pd

        idx = g["idx"].to_numpy()
        ph = g["phash"].to_numpy().astype(np.int64).view(np.uint64)
        o = np.argsort(idx, kind="stable")
        idx, ph = idx[o], ph[o]
        n = len(idx)
        if n < 2:
            # typed empty frame: an object-dtype block would break
            # concat against the int64 blocks of non-trivial buckets
            return pd.DataFrame({"a": np.array([], np.int64),
                                 "b": np.array([], np.int64),
                                 "hamming": np.array([], np.int64)})
        ai, bi = np.triu_indices(n, k=1)
        x = ph[ai] ^ ph[bi]
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8),
                            axis=1).sum(axis=1).astype(np.int64)
        keep = ham <= PHASH_T
        return pd.DataFrame({"a": idx[ai[keep]], "b": idx[bi[keep]],
                             "hamming": ham[keep]})

    found = (ds.map_batches(explode, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(pairs, batch_format="pandas"))
    # global pair dedup (a pair surfaces once per matching band)
    tab = pa.concat_tables(
        b for b in found.iter_batches(batch_size=None,
                                      batch_format="pyarrow"))
    import numpy as np

    if not tab.num_rows:
        return pa.table({"id_a": pa.array([], pa.string()),
                         "id_b": pa.array([], pa.string()),
                         "hamming": pa.array([], pa.int64())})
    a = tab["a"].to_numpy().astype(np.int64)
    b = tab["b"].to_numpy().astype(np.int64)
    h = tab["hamming"].to_numpy().astype(np.int64)
    key = a * PHASH_N + b
    _, first = np.unique(key, return_index=True)
    a, b, h = a[first], b[first], h[first]
    return pa.table({
        "id_a": pa.array([f"img{v:08d}" for v in a], pa.string()),
        "id_b": pa.array([f"img{v:08d}" for v in b], pa.string()),
        "hamming": pa.array(h, pa.int64()),
    })
