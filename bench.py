"""Benchmark entry for the gdal_ray engine.

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N}

--scaling runs the flagship image pipeline twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs plus scaling efficiency throughput(4N)/(4*throughput(N))
(the sandbox stand-in for the north rule's N vs 4N node clusters).

This script OWNS its Ray session (ray.init/shutdown); the library and
__ray_entry__ never do.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline pipelines: the north-star geo path + the heavy relational /
# training-data operators. Each is (name, fn(sf_dir) -> consumable).
# warp_compose_tiles (the pixel-shuffling exchange path) is NOT a
# headline: BASELINE.md measured Ray's sort exchange anti-scaling on
# binary-heavy rows, so the path exists only as the bit-identity
# cross-check of the partitioned plan (tests/test_partitioned_tiling
# + --exchange-check here). Headline numbers track the production
# plan at two sizes so round-over-round deltas are meaningful.
HEADLINE = [
    "warp_partitioned",     # metadata-shuffle tiling (quadtree leaves + salting)
    "warp_partitioned_3072",  # same plan at 2x size (VERDICT r3 #8)
    "flagship_images",      # decode actor pool -> tile/cell keys -> PIP join
    "q_groupby_agg",        # TPC-H Q1 shape, combiner partials
    "q_join_hash_large",    # partitioned hash join lineitem x orders
    "q_pip_join",           # point-in-polygon join (packed index actors)
    "q_tile_counts",        # tile assignment + per-tile counts
    "q_window_tumbling",    # streaming windows as bucket groupby
    "q_exact_dedup",        # content-hash dedup
    "q_ann_multi_query",    # brute-force cosine ANN, broadcast queries
    "q_sessionize",         # groupby(user).map_groups stateful scan
    "q_minhash_lsh",        # minhash sketch -> LSH band buckets -> vectorized pairs
    "q_orderby_full",       # range-partitioned distributed global sort
    "st_area_vectorized",   # ST_Area column dispatch (sql_spatial fast path)
    "st_area_scalar",       # control: same layer through the per-row UDF loop
]

FLAGSHIP_IMAGES = int(os.environ.get("GRAFT_FLAGSHIP_IMAGES", "1536"))
SCALING_IMAGES = int(os.environ.get("GRAFT_SCALING_IMAGES", "12288"))
CORPUS_ROOT = os.environ.get("GRAFT_CORPUS_ROOT", "/tmp/gdal_ray_bench")


def ensure_corpus(n: int) -> str:
    """Write (once, in parallel, untimed) the image corpus parquet —
    the stand-in for the stored Lance table the real pipeline reads.
    The path embeds CORPUS_VERSION so stale bytes are never reused."""
    from gdal_ray.sources.images import CORPUS_VERSION, corpus_dataset

    path = os.path.join(CORPUS_ROOT, f"images_{n}_v{CORPUS_VERSION}")
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        # a dir without the marker is a partial write from a killed
        # run; write_parquet would APPEND duplicate rows — wipe first
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        os.makedirs(path, exist_ok=True)
        corpus_dataset(n).write_parquet(path)
        open(marker, "w").close()
    return path


def run_warp_compose_partitioned(num_cpus: int, n_images: int) -> tuple[float, int]:
    """Timed: the metadata-partitioned tiling job (no pixel shuffle;
    quadtree leaves, salted hot cells). The scaling headline."""
    from gdal_ray.sources.images import ParquetKeyedLoader
    from gdal_ray.stages.partitioned_tiling import warp_compose_partitioned

    src = ensure_corpus(n_images)
    t0 = time.time()
    ds = warp_compose_partitioned(n_images, concurrency=max(2, num_cpus - 2),
                                  max_images_per_part=32,
                                  loader=ParquetKeyedLoader(src))
    rows = ds.count()
    return time.time() - t0, rows


def hardware_control(num_cpus: int, n_images: int) -> float:
    """Multiprocessing control: the same per-image kernel with zero
    orchestration — measures the host's own scaling ceiling
    (frequency/memory-bandwidth) so Ray's efficiency can be judged
    against what the hardware allows."""
    from multiprocessing import Pool

    tasks = n_images // 8
    t0 = time.time()
    with Pool(num_cpus) as p:
        p.map(_hw_work, range(tasks))
    return time.time() - t0


def _hw_work(idx: int) -> int:
    import numpy as np

    from gdal_ray.functions.codecs import decode_image
    from gdal_ray.sources.images import georef, make_batch
    from gdal_ray.stages.warp import warp_image_to_tiles

    t = make_batch(np.arange(idx * 8, idx * 8 + 8))
    n = 0
    for i, blob in enumerate(t["bytes"]):
        px = decode_image(blob.as_py())
        gt, epsg = georef(idx * 8 + i)
        n += len(warp_image_to_tiles(px, gt, epsg, f"img{idx * 8 + i}", None))
    return n


def run_warp_compose(num_cpus: int, n_images: int) -> tuple[float, int]:
    """Timed: read corpus parquet -> warp actor pool -> compose. The
    north-star headline job (tiles composed from decoded images).
    Consumed with a distributed count — pulling every composed tile
    through the driver would serialize the tail (real runs write from
    tasks via write_tiles)."""
    from gdal_ray.pipelines.tile_pyramid import warp_compose

    src = ensure_corpus(n_images)
    t0 = time.time()
    ds = warp_compose(n_images, concurrency=max(2, num_cpus - 2), source_path=src)
    rows = ds.count()
    return time.time() - t0, rows


def consume(res) -> int:
    """Fully consume a result; return row count."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_size=None, batch_format="pyarrow"):
            n += b.num_rows
        return n
    if isinstance(res, pa.Table):
        return res.num_rows
    if isinstance(res, pd.DataFrame):
        return len(res)
    raise TypeError(type(res))


def run_flagship(num_cpus: int) -> tuple[float, int]:
    """Run the flagship image pipeline; return (sec, rows)."""
    from gdal_ray.pipelines.flagship import flagship

    src = ensure_corpus(FLAGSHIP_IMAGES)
    t0 = time.time()
    ds = flagship(num_images=FLAGSHIP_IMAGES, concurrency=max(2, num_cpus),
                  source_path=src)
    rows = consume(ds)
    return time.time() - t0, rows


def run_st_area(which: str) -> tuple[float, int]:
    """ST_Area over a zones layer derived from events (one rect zone
    per event row).  'vectorized' runs the registered column dispatch
    (sql_spatial fast paths, VERDICT r4 directive #3); 'scalar'
    forces the per-row UDF loop as the control — BASELINE.md records
    the ratio (>=10x on this host).  Reported seconds are the SUMMED
    PER-BATCH KERNEL times (CPU-seconds of the ST_Area evaluation
    itself), not pipeline wall time — the read/WKB-construction
    overhead is identical for both entries and would otherwise mask
    the kernel ratio at this layer size."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray.data

    def f(t: pa.Table) -> pa.Table:
        from gdal_ray.functions import sql_spatial as ss

        v = t["value"].to_numpy()
        x0 = np.fmod(v * 7.0, 340.0) - 170.0
        y0 = np.fmod(v * 3.0, 150.0) - 75.0
        n = len(v)
        # vectorized little-endian WKB rect construction: 93 bytes =
        # byte order + type + nrings + npts + 5 xy doubles
        buf = np.zeros((n, 93), np.uint8)
        buf[:, 0] = 1
        buf[:, 1] = 3
        buf[:, 5] = 1
        buf[:, 9] = 5
        xy = np.empty((n, 10), np.float64)
        xy[:, 0::2] = np.c_[x0, x0 + 13.0, x0 + 13.0, x0, x0]
        xy[:, 1::2] = np.c_[y0, y0, y0 + 15.0, y0 + 15.0, y0]
        buf[:, 13:] = xy.view(np.uint8).reshape(n, 80)
        offsets = pa.py_buffer(
            np.arange(0, (n + 1) * 93, 93, dtype=np.int32).tobytes())
        col = pa.Array.from_buffers(
            pa.binary(), n, [None, offsets, pa.py_buffer(buf.tobytes())])
        k0 = time.time()
        if which == "vectorized":
            out = ss._FAST_PATHS["AREA"](col)
            assert out is not None
        else:
            out = ss._scalar_fn(ss._st_area, pa.float64())(col)
        ksec = time.time() - k0
        return pa.table({"area_sum": pa.array([pc.sum(out).as_py()]),
                         "n": pa.array([n], pa.int64()),
                         "kernel_sec": pa.array([ksec])})

    ds = ray.data.read_parquet(
        os.path.join(SF_DIR, "events.parquet"),
        columns=["value"]).map_batches(f, batch_format="pyarrow")
    ksec = 0.0
    rows = 0
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        ksec += float(pc.sum(b["kernel_sec"]).as_py() or 0.0)
        rows += int(pc.sum(b["n"]).as_py() or 0)
    return ksec, rows


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             log_to_driver=False)
    try:
        import __ray_entry__ as e

        qs = e.queries()
        times: dict[str, float] = {}
        for name in HEADLINE:
            t0 = time.time()
            if name == "flagship_images":
                dt, _ = run_flagship(NUM_CPUS)
                times[name] = round(dt, 3)
                continue
            if name == "warp_partitioned":
                dt, _ = run_warp_compose_partitioned(NUM_CPUS, FLAGSHIP_IMAGES)
                times[name] = round(dt, 3)
                continue
            if name == "warp_partitioned_3072":
                dt, _ = run_warp_compose_partitioned(NUM_CPUS,
                                                     2 * FLAGSHIP_IMAGES)
                times[name] = round(dt, 3)
                continue
            if name.startswith("st_area_"):
                dt, _ = run_st_area(name.split("_")[-1])
                times[name] = round(dt, 3)
                continue
            consume(qs[name](SF_DIR))
            times[name] = round(time.time() - t0, 3)
        total = round(sum(times.values()), 3)
        print(json.dumps({
            "metric": "headline_pipelines_total_sec",
            "value": total,
            "unit": "sec",
            "queries": times,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
        }))
    finally:
        ray.shutdown()


def scaling_child(num_cpus: int, n_images: int | None = None) -> None:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             log_to_driver=False)
    try:
        dt, rows = run_warp_compose_partitioned(
            num_cpus, n_images or SCALING_IMAGES)
        print(json.dumps({"sec": dt, "rows": rows, "num_cpus": num_cpus}))
    finally:
        ray.shutdown()


def _scaling_run(cpus: int, n_images: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--_child",
         str(cpus), str(n_images)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")][-1]
    return json.loads(line)


def scaling() -> None:
    """Fresh-process runs of the partitioned tiling job at num_cpus=8
    and 32 on identical input (the sandbox stand-in for the north
    rule's N- vs 4N-node clusters), plus a Ray-free multiprocessing
    control of the same per-image kernel that measures the host's own
    scaling ceiling (turbo/memory bandwidth).  The efficiency is
    measured at TWO job sizes (VERDICT r4 directive #9: the quarter
    job guards against the fixed metadata preamble flattering one
    size)."""
    results = {}
    for cpus in (8, 32):
        results[cpus] = _scaling_run(cpus, SCALING_IMAGES)
    small = {cpus: _scaling_run(cpus, SCALING_IMAGES // 4)
             for cpus in (8, 32)}
    hw = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, %r); import bench; "
             "print(bench.hardware_control(%d, %d))"
             % (REPO, cpus, SCALING_IMAGES // 4)],
            capture_output=True, text=True, check=True, cwd=REPO,
        )
        hw[cpus] = float(out.stdout.strip().splitlines()[-1])
    n_img = SCALING_IMAGES
    thr8 = n_img / results[8]["sec"]
    thr32 = n_img / results[32]["sec"]
    eff = thr32 / (4.0 * thr8)
    sthr8 = (n_img // 4) / small[8]["sec"]
    sthr32 = (n_img // 4) / small[32]["sec"]
    seff = sthr32 / (4.0 * sthr8)
    hw_eff = hw[8] / (4.0 * hw[32])
    print(json.dumps({
        "metric": "scaling_efficiency_8_to_32_cpus",
        "value": round(eff, 3),
        "unit": "ratio",
        "job": "warp_compose_partitioned",
        "throughput_images_per_sec": {"8": round(thr8, 2), "32": round(thr32, 2)},
        "sec": {"8": round(results[8]["sec"], 3), "32": round(results[32]["sec"], 3)},
        "num_images": n_img,
        "tiles": results[32]["rows"],
        "second_size": {
            "num_images": n_img // 4,
            "value": round(seff, 3),
            "throughput_images_per_sec": {"8": round(sthr8, 2),
                                          "32": round(sthr32, 2)},
            "sec": {"8": round(small[8]["sec"], 3),
                    "32": round(small[32]["sec"], 3)},
        },
        "hardware_ceiling_efficiency": round(hw_eff, 3),
        "software_efficiency_vs_hardware": round(eff / hw_eff, 3) if hw_eff else None,
    }))


def exchange_check() -> None:
    """The demoted pixel-shuffle path, runnable on demand as the
    bit-identity cross-check (NOT part of the headline)."""
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             log_to_driver=False)
    try:
        dt, rows = run_warp_compose(NUM_CPUS, FLAGSHIP_IMAGES)
        print(json.dumps({"metric": "warp_compose_tiles_exchange_sec",
                          "value": round(dt, 3), "rows": rows,
                          "num_cpus": NUM_CPUS}))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        scaling()
    elif "--exchange-check" in sys.argv:
        exchange_check()
    elif "--_child" in sys.argv:
        i = sys.argv.index("--_child")
        scaling_child(int(sys.argv[i + 1]),
                      int(sys.argv[i + 2]) if len(sys.argv) > i + 2
                      else None)
    else:
        main()
