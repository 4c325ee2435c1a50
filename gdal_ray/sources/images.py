"""Deterministic image+caption corpus (input_hint schema).

Schema (BASELINE.json input_hint, exact):
    image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
    caption:string, phash:int64

Everything is a pure function of (seed, idx): pixels, encoding,
caption, georeference — so goldens are reproducible anywhere and the
corpus can be regenerated shard-by-shard at any scale (the 10^12-image
design: the generator *is* the resumable source; at real scale this is
a `read_lance` of the stored corpus instead).

Georeference (FIXTURES.md F1): north-up affine, 0.25 units/pixel;
CRS alternates EPSG:32631 / EPSG:4326 by idx parity; ~20% of images
land in a "hot cell" cluster (dense megacell for salt testing), the
rest spread over a multi-cell bbox.

Lance note: pylance is not installed in this container, so persisted
corpora use parquet with the identical Arrow schema; `write_corpus` /
`corpus_dataset` would switch to write_lance/read_lance unchanged.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions.codecs import encode_image
from ..functions.crs import utm_zone_lon0

SEED = 42
SIZES = (20, 100, 256, 512)
PIXEL_RES = 0.25  # units (m for UTM) per pixel, FIXTURES.md F1
DEG_PER_M = 1.0 / 111320.0

# hot-spot cluster (Paris-ish) + the broad bbox, in lon/lat
HOT_LON, HOT_LAT = 2.2945, 48.8584
BBOX_LON = (0.5, 5.5)
BBOX_LAT = (44.5, 49.5)

SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)

_WORDS = (
    "tile raster vector warp cell join index band pixel scan merge "
    "mosaic zoom level cloud field river city road park".split()
)


def image_size(idx: int) -> int:
    return SIZES[idx % len(SIZES)]


def image_pixels(idx: int) -> np.ndarray:
    """(h, w, 3) uint8, deterministic: smooth gradient + sinusoid +
    per-image noise (noise makes resampling differences detectable)."""
    n = image_size(idx)
    rng = np.random.default_rng(SEED * 1_000_003 + idx)
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64) / n
    phase = rng.uniform(0, 2 * np.pi, 3)
    freq = rng.uniform(2, 9, 3)
    base = np.stack(
        [
            127.5 + 90 * np.sin(freq[c] * (xx + yy) + phase[c]) + 30 * (xx - yy)
            for c in range(3)
        ],
        axis=2,
    )
    noise = rng.normal(0, 12, (n, n, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def image_fmt(idx: int) -> str:
    return "png" if idx % 2 == 0 else "jpeg"


def image_caption(idx: int) -> str:
    rng = np.random.default_rng(SEED * 7_654_321 + idx)
    words = " ".join(rng.choice(_WORDS, 6))
    return f"caption for img{idx:08d}: {words}"


def phash64(pixels: np.ndarray) -> int:
    """Average-hash stand-in for a perceptual hash: 8x8 mean-pooled
    grayscale thresholded at its mean -> 64 bits."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    # crop to a multiple of 8 then mean-pool to 8x8
    h8, w8 = (h // 8) * 8, (w // 8) * 8
    g = gray[:h8, :w8].reshape(8, h8 // 8, 8, w8 // 8).mean(axis=(1, 3))
    bits = (g > g.mean()).astype(np.uint64).reshape(-1)
    return int(np.int64((bits << np.arange(64, dtype=np.uint64)).sum().astype(np.uint64).view(np.int64)))


def georef(idx: int):
    """(geotransform, epsg) for image idx — north-up, 0.25 units/px.

    idx % 2 == 0 -> EPSG:32631 (UTM meters), else EPSG:4326 (degrees,
    resolution scaled to ~0.25 m equivalent). ~1 in 5 images sits in
    the hot cluster (skewed megacell).
    """
    rng = np.random.default_rng(SEED * 9_176_249 + idx)
    if idx % 5 == 0:
        lon = HOT_LON + rng.uniform(-0.002, 0.002)
        lat = HOT_LAT + rng.uniform(-0.002, 0.002)
    else:
        lon = rng.uniform(*BBOX_LON)
        lat = rng.uniform(*BBOX_LAT)
    if idx % 2 == 0:
        from ..functions.crs import lonlat_to_utm

        e, n = lonlat_to_utm(lon, lat, 31)
        gt = (float(e), PIXEL_RES, 0.0, float(n), 0.0, -PIXEL_RES)
        return gt, 32631
    res = PIXEL_RES * DEG_PER_M
    return (float(lon), res, 0.0, float(lat), 0.0, -res), 4326


def make_batch(idxs: np.ndarray) -> pa.Table:
    """Materialize corpus rows for a batch of indices (runs inside
    map_batches workers during distributed synthesis)."""
    ids, blobs, ws, hs, fmts, caps, hashes = [], [], [], [], [], [], []
    for idx in np.asarray(idxs).tolist():
        px = image_pixels(idx)
        fmt = image_fmt(idx)
        ids.append(f"img{idx:08d}")
        blobs.append(encode_image(px, fmt))
        hs.append(px.shape[0])
        ws.append(px.shape[1])
        fmts.append(fmt)
        caps.append(image_caption(idx))
        hashes.append(phash64(px))
    return pa.table(
        {
            "image_id": pa.array(ids, pa.string()),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(caps, pa.string()),
            "phash": pa.array(hashes, pa.int64()),
        }
    )


def corpus_table(n: int, start: int = 0) -> pa.Table:
    """Driver-side corpus for unit tests (small n only)."""
    return make_batch(np.arange(start, start + n))


def corpus_dataset(n: int, *, override_num_blocks: int | None = None):
    """Distributed synthesis: ray.data.range(n) -> map_batches(make_batch).

    This replaces `read_lance` for the sandbox; the downstream pipeline
    is identical either way.
    """
    import ray.data

    if override_num_blocks is None:
        # one block per ~16 images: the block is Ray Data's scheduling
        # unit, so small blocks are what lets the synth + warp stages
        # fan out across every core (range() alone would emit a handful
        # of huge blocks and serialize the pipeline).
        override_num_blocks = max(1, (n + 15) // 16)
    ds = ray.data.range(n, override_num_blocks=override_num_blocks)
    return ds.map_batches(
        lambda b: make_batch(b["id"]),
        batch_format="numpy",
        batch_size=16,
        zero_copy_batch=True,
    )


def cached_corpus_parquet(n: int, root: str = "/tmp/gdal_ray_fixtures") -> str:
    """Write (once) and return the path of a parquet corpus of n rows —
    the stand-in for the stored Lance table in tests/benches."""
    import pyarrow.parquet as pq

    path = os.path.join(root, f"images_n{n}_v{CORPUS_VERSION}.parquet")
    if not os.path.exists(path):
        os.makedirs(root, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(corpus_table(n), tmp)
        os.replace(tmp, path)
    return path


CORPUS_VERSION = 3  # bump when synthesized bytes change (cache key)


class ParquetKeyedLoader:
    """Keyed read of corpus rows from a stored parquet directory —
    the sandbox stand-in for a Lance ``take``: predicate pushdown on
    the (zero-padded, hence order-preserving) ``image_id`` range prunes
    row groups, then an exact membership filter selects the rows.

    Picklable (holds only the path); the pyarrow dataset handle is
    opened lazily inside the consuming actor.
    """

    def __init__(self, path: str, columns=("image_id", "bytes")):
        self.path = path
        self.columns = list(columns)
        self._ds = None
        self._frag_bounds = None  # [(min_id, max_id, fragment)]

    def _ensure_index(self):
        """File-level min/max index over image_id, built once per
        actor from the parquet footers (metadata only). pyarrow's
        scanner does NOT row-group-prune an isin filter, so without
        this every keyed read scans the WHOLE corpus — measured 1.2 s
        and ~full-corpus memory traffic per call at 12k images, which
        saturates bandwidth under a 30-actor pool. This is the
        footer-statistics index any real table format (Lance/Iceberg)
        maintains natively."""
        import pyarrow.dataset as pads

        if self._ds is None:
            self._ds = pads.dataset(self.path, format="parquet")
        if self._frag_bounds is None:
            bounds = []
            for fr in self._ds.get_fragments():
                md = fr.metadata
                col = {c.path_in_schema: i
                       for i in range(md.row_group(0).num_columns)
                       for c in [md.row_group(0).column(i)]}["image_id"]
                lo = min(md.row_group(g).column(col).statistics.min
                         for g in range(md.num_row_groups))
                hi = max(md.row_group(g).column(col).statistics.max
                         for g in range(md.num_row_groups))
                bounds.append((lo, hi, fr))
            self._frag_bounds = bounds

    def __call__(self, idxs) -> pa.Table:
        import pyarrow.dataset as pads

        self._ensure_index()
        ids = sorted(f"img{int(i):08d}" for i in np.asarray(idxs).tolist())
        import bisect

        def hits(lo, hi):
            i = bisect.bisect_left(ids, lo)
            return i < len(ids) and ids[i] <= hi

        frags = [fr for lo, hi, fr in self._frag_bounds if hits(lo, hi)]
        f = pads.field("image_id")
        expr = (f >= ids[0]) & (f <= ids[-1]) & f.isin(ids)
        t = pa.concat_tables([
            fr.to_table(columns=self.columns, filter=expr) for fr in frags])
        return t.sort_by("image_id")
