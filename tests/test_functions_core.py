"""Unit tests for the pure kernels: codecs, checksum, affine, CRS,
tiles, S2 cells. No Ray needed."""

import numpy as np
import pytest

from gdal_ray.functions.affine import apply_gt, bounds_of, compose_north_up, invert_gt, world_to_pixel
from gdal_ray.functions.checksum import checksum_image
from gdal_ray.functions.codecs import decode_image, encode_image, psnr
from gdal_ray.functions.crs import (
    A_WGS84,
    E2_WGS84,
    MAX_MERC_LAT,
    Transformer,
    UTM_K0,
    lonlat_to_utm,
    lonlat_to_webmercator,
    utm_to_lonlat,
    webmercator_to_lonlat,
)
from gdal_ray.functions.png import decode_png, encode_png
from gdal_ray.functions.s2cell import cell_id, cell_level, cell_parent, cell_range, lonlat_to_face_st
from gdal_ray.functions.tiles import (
    lonlat_to_tile,
    parent_tile,
    tile_bounds,
    tile_geotransform,
    tile_key,
    tiles_overlapping_bounds,
    unpack_tile_key,
)

RNG = np.random.default_rng(42)


# ------------------------------------------------------------------ PNG codec
@pytest.mark.parametrize(
    "shape,dtype",
    [((20, 20), np.uint8), ((33, 17, 3), np.uint8), ((8, 9, 4), np.uint8),
     ((12, 11), np.uint16), ((5, 7, 3), np.uint16), ((6, 6, 2), np.uint8)],
)
def test_png_roundtrip(shape, dtype):
    a = RNG.integers(0, np.iinfo(dtype).max + 1, size=shape, dtype=dtype)
    b = decode_png(encode_png(a))
    assert b.shape == a.shape and b.dtype == a.dtype
    np.testing.assert_array_equal(a, b)


def test_png_deterministic():
    a = RNG.integers(0, 256, size=(50, 50, 3), dtype=np.uint8)
    assert encode_png(a) == encode_png(a)


def test_png_filters_decode():
    """Decode scanline filters 1-4 written by hand."""
    import struct
    import zlib

    a = RNG.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    # build a PNG using per-row filters [0,1,2,3,4,2]
    rows = []
    prev = np.zeros(15, np.uint8)
    for y, f in enumerate([0, 1, 2, 3, 4, 2]):
        raw = a[y].reshape(-1)
        if f == 0:
            enc = raw.copy()
        elif f == 1:
            enc = raw.copy()
            enc[3:] = (raw[3:].astype(int) - raw[:-3].astype(int)) % 256
        elif f == 2:
            enc = (raw.astype(int) - prev.astype(int)) % 256
        elif f == 3:
            enc = np.empty(15, np.uint8)
            for x in range(15):
                left = int(raw[x - 3]) if x >= 3 else 0
                enc[x] = (int(raw[x]) - ((left + int(prev[x])) >> 1)) % 256
        else:  # paeth
            enc = np.empty(15, np.uint8)
            for x in range(15):
                left = int(raw[x - 3]) if x >= 3 else 0
                up = int(prev[x])
                ul = int(prev[x - 3]) if x >= 3 else 0
                p = left + up - ul
                pa_, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa_ <= pb and pa_ <= pc) else (up if pb <= pc else ul)
                enc[x] = (int(raw[x]) - pred) % 256
        rows.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = raw
    body = zlib.compress(b"".join(rows))

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(
            ">I", zlib.crc32(tag + data) & 0xFFFFFFFF
        )

    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", body) + chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(png), a)


def test_lossy_codec_psnr_gate():
    a = RNG.integers(0, 256, size=(128, 128, 3), dtype=np.uint8)
    b = decode_image(encode_image(a, "jpeg"))
    assert 40.0 <= psnr(a, b) < 45.0  # lossy, but above the 40 dB invariant
    assert decode_image(encode_image(a, "jpeg")) is not None
    c = decode_image(encode_image(a, "raw"))
    np.testing.assert_array_equal(a, c)


def test_unknown_format_raises():
    with pytest.raises(NotImplementedError):
        encode_image(np.zeros((2, 2), np.uint8), "jp2")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01\x02\x03garbage")


# ------------------------------------------------------------------ checksum
def test_checksum_known_semantics():
    # primes walk: value % prime (C-truncated), summed, & 0xffff
    vals = np.arange(400, dtype=np.uint8).reshape(20, 20)
    primes = [7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43]
    expected = sum(int(v) % primes[i % 11] for i, v in enumerate(vals.reshape(-1))) & 0xFFFF
    assert checksum_image(vals) == expected


def test_checksum_float_semantics():
    # floor(v+0.5); nan -> INT_MIN; negative C modulo keeps sign
    f = np.array([1.4, 2.6, -3.5, np.nan])
    primes = [7, 11, 13, 17]
    exp = 0
    for i, v in enumerate([1, 3, -3, -2147483648]):
        m = abs(v) % primes[i]
        exp += m if v >= 0 else -m
    assert checksum_image(f) == exp & 0xFFFF


def test_checksum_empty():
    assert checksum_image(np.empty((0,), np.uint8)) == 0


# ------------------------------------------------------------------ affine
def test_affine_roundtrip():
    gt = (448262.0, 60.0, 0.0, 3751190.0, 0.0, -60.0)
    px = RNG.uniform(0, 100, 50)
    ln = RNG.uniform(0, 100, 50)
    x, y = apply_gt(gt, px, ln)
    px2, ln2 = world_to_pixel(gt, x, y)
    np.testing.assert_allclose(px, px2, atol=1e-9)
    np.testing.assert_allclose(ln, ln2, atol=1e-9)


def test_affine_rotated_invert():
    gt = (100.0, 2.0, 0.5, 200.0, -0.3, -2.0)
    inv = invert_gt(gt)
    x, y = apply_gt(gt, 7.0, 13.0)
    px, ln = apply_gt(inv, x, y)
    assert abs(float(px) - 7) < 1e-12 and abs(float(ln) - 13) < 1e-12


def test_affine_bounds():
    gt = compose_north_up(10.0, 20.0, 0.5, 0.5)
    assert bounds_of(gt, 10, 4) == (10.0, 18.0, 15.0, 20.0)


# ------------------------------------------------------------------ CRS
def test_utm_central_meridian_anchor():
    e, n = lonlat_to_utm(3.0, 0.0, 31)
    assert abs(float(e) - 500000.0) < 1e-6 and abs(float(n)) < 1e-6


def test_utm_meridian_arc_vs_numeric_integration():
    lat = 45.0
    _, n = lonlat_to_utm(3.0, lat, 31)
    phi = np.linspace(0, np.radians(lat), 200001)
    integrand = A_WGS84 * (1 - E2_WGS84) / np.power(1 - E2_WGS84 * np.sin(phi) ** 2, 1.5)
    arc = np.trapz(integrand, phi)
    assert abs(float(n) - UTM_K0 * arc) < 1e-3


def test_utm_roundtrip():
    lon = RNG.uniform(0.1, 5.9, 500)
    lat = RNG.uniform(-80, 84, 500)
    e, n = lonlat_to_utm(lon, lat, 31)
    lo, la = utm_to_lonlat(e, n, 31)
    np.testing.assert_allclose(lo, lon, atol=1e-11)
    np.testing.assert_allclose(la, lat, atol=1e-11)


def test_utm_south():
    e, n = lonlat_to_utm(3.0, -30.0, 31)
    e2, n2 = Transformer(4326, 32731).transform(np.array([3.0]), np.array([-30.0]))
    assert abs(e2[0] - float(e)) < 1e-9
    assert n2[0] > 0 and abs((n2[0] - 10000000.0) - float(n)) < 1e-6


def test_webmercator_anchors():
    x, y = lonlat_to_webmercator(180.0, MAX_MERC_LAT, clamp=False)
    assert abs(float(x) - float(y)) < 1e-6  # square corner
    lo, la = webmercator_to_lonlat(x, y)
    assert abs(float(lo) - 180) < 1e-9 and abs(float(la) - MAX_MERC_LAT) < 1e-9


def test_webmercator_clamp():
    _, y1 = lonlat_to_webmercator(0.0, 89.9)
    _, y2 = lonlat_to_webmercator(0.0, MAX_MERC_LAT)
    assert float(y1) == float(y2)


def test_transformer_chain_roundtrip():
    t = Transformer("EPSG:32631", "EPSG:3857")
    x, y = t.transform(np.array([500000.0]), np.array([4649776.22]))
    xi, yi = t.inverse().transform(x, y)
    assert abs(xi[0] - 500000.0) < 1e-6 and abs(yi[0] - 4649776.22) < 1e-5


# ------------------------------------------------------------------ tiles
def test_tile_matches_slippy_formula():
    lon = RNG.uniform(-179.9, 179.9, 1000)
    lat = RNG.uniform(-84, 84, 1000)
    for z in (3, 9, 12):
        tx, ty = lonlat_to_tile(lon, lat, z)
        ex = np.floor((lon + 180) / 360 * (1 << z)).astype(int)
        ey = np.floor((1 - np.arcsinh(np.tan(np.radians(lat))) / np.pi) / 2 * (1 << z)).astype(int)
        np.testing.assert_array_equal(tx, ex)
        np.testing.assert_array_equal(ty, ey)


def test_tile_corner_and_clamp():
    tx, ty = lonlat_to_tile(-180.0, 85.0511287798066, 3)
    assert (int(tx), int(ty)) == (0, 0)
    tx, ty = lonlat_to_tile(179.9999, -89.9, 3)  # clamped south
    assert (int(tx), int(ty)) == (7, 7)


def test_tile_key_roundtrip_and_parent():
    k = tile_key(np.array([2074]), np.array([1409]), 12)
    z, x, y = unpack_tile_key(k)
    assert (int(z[0]), int(x[0]), int(y[0])) == (12, 2074, 1409)
    px, py, pz = parent_tile(2074, 1409, 12)
    assert (int(px), int(py), pz) == (1037, 704, 11)


def test_tile_bounds_contain_point():
    from gdal_ray.functions.crs import lonlat_to_webmercator as ll2wm

    lon, lat, z = 2.3522, 48.8566, 12
    tx, ty = lonlat_to_tile(lon, lat, z)
    xmin, ymin, xmax, ymax = tile_bounds(int(tx), int(ty), z)
    x, y = ll2wm(lon, lat)
    assert xmin <= float(x) < xmax and ymin < float(y) <= ymax
    gt = tile_geotransform(int(tx), int(ty), z, 256)
    assert abs(gt[1] * 256 - (xmax - xmin)) < 1e-6


def test_tiles_overlapping_bounds():
    xmin, ymin, xmax, ymax = tile_bounds(10, 20, 6)
    tx0, tx1, ty0, ty1 = tiles_overlapping_bounds(xmin, ymin, xmax, ymax, 6)
    assert (tx0, tx1, ty0, ty1) == (10, 10, 20, 20)


# ------------------------------------------------------------------ S2 cells
def test_s2_face_anchors():
    for lon, lat, ef in [(0, 0, 0), (90, 0, 1), (0, 90, 2), (180, 0, 3), (-90, 0, 4), (0, -90, 5)]:
        f, s, t = lonlat_to_face_st(float(lon), float(lat))
        assert int(f) == ef


def test_s2_hierarchy_invariants():
    lon = RNG.uniform(-179, 179, 3000)
    lat = RNG.uniform(-89, 89, 3000)
    c12 = cell_id(lon, lat, 12)
    c9 = cell_id(lon, lat, 9)
    np.testing.assert_array_equal(cell_parent(c12, 9), c9)
    assert (cell_level(c12) == 12).all() and (cell_level(c9) == 9).all()
    lsb = c9 & -c9
    assert ((c12 >= c9 - lsb + 1) & (c12 <= c9 + lsb - 1)).all()


def test_s2_locality():
    a = cell_id(np.array([2.0, 2.0000001]), np.array([48.0, 48.0000001]), 16)
    assert a[0] == a[1]


def test_s2_range_disjoint_siblings():
    c = cell_id(np.array([2.0]), np.array([48.0]), 9)
    lo, hi = cell_range(int(c[0]))
    # a far-away cell must be outside the range
    d = cell_id(np.array([-120.0]), np.array([-30.0]), 12)
    assert not (lo <= int(d[0]) <= hi)


def test_vsi_filesystems(ray_session, tmp_path):
    """VSI analog (port/cpl_vsi.h): /vsimem/ + /vsizip/ + local-fs
    parquet reads all produce the same rows."""
    import io
    import zipfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gdal_ray.sources.vsi import (vsi_read_parquet, vsimem_unlink,
                                      vsimem_write)

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()),
                  "b": pa.array(["x", "y", "z"])})
    # local file
    local = tmp_path / "t.parquet"
    pq.write_table(t, local)
    # vsimem
    sink = io.BytesIO()
    pq.write_table(t, sink)
    mem_path = vsimem_write("t.parquet", sink.getvalue())
    # vsizip (zip on disk containing the parquet)
    zpath = tmp_path / "a.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        zf.writestr("inner/t.parquet", sink.getvalue())

    def rows(ds):
        return sorted(r["a"] for b in ds.iter_batches(
            batch_size=None, batch_format="pyarrow") for r in b.to_pylist())

    assert rows(vsi_read_parquet(str(local))) == [1, 2, 3]
    assert rows(vsi_read_parquet(mem_path)) == [1, 2, 3]
    assert rows(vsi_read_parquet(f"/vsizip/{zpath}/inner/t.parquet")) == [1, 2, 3]
    vsimem_unlink("t.parquet")
    import pytest

    with pytest.raises(FileNotFoundError):
        vsi_read_parquet(mem_path)


def test_partial_groupby_distributed_combine(ray_session):
    """The partial combine goes distributed when the partial volume
    exceeds the threshold; result identical either way."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from gdal_ray.pipelines.common import partial_groupby_agg

    rng = np.random.default_rng(3)
    t = pa.table({"k": pa.array(rng.integers(0, 50, 20000)),
                  "v": pa.array(rng.normal(0, 1, 20000))})
    ds = ray.data.from_arrow(t).repartition(16)
    a = partial_groupby_agg(ds, ["k"], [("s", "v", "sum"), ("n", "v", "count_all"),
                                        ("mx", "v", "max")])
    b = partial_groupby_agg(ds, ["k"], [("s", "v", "sum"), ("n", "v", "count_all"),
                                        ("mx", "v", "max")],
                            distributed_threshold=100)
    da = a.to_pandas().sort_values("k").reset_index(drop=True)
    db = b.to_pandas().sort_values("k").reset_index(drop=True)
    assert da["n"].tolist() == db["n"].tolist()
    assert np.allclose(da["mx"], db["mx"])
    assert np.allclose(da["s"], db["s"])


def test_png_reference_fixture_checksums():
    """PNG decoder vs the reference's own fixtures: 16-bit RGBA
    (rgba16.png bands 1815/4873, autotest/gdrivers/png.py:102-112),
    Adam7-interlaced RGBA (stefan_full_rgba.png bands
    12603/58561/36064 per autotest/gcore/cog.py:2046), interlaced
    uint16, and the byte-pattern PNG (4672)."""
    from gdal_ray.functions.checksum import checksum_image
    from gdal_ray.functions.png import decode_png

    P = "/root/reference/autotest"
    px = decode_png(open(f"{P}/gdrivers/data/png/rgba16.png", "rb").read())
    assert checksum_image(px[:, :, 2]) == 1815
    assert checksum_image(px[:, :, 3]) == 4873

    st = decode_png(open(f"{P}/gcore/data/stefan_full_rgba.png", "rb").read())
    assert [checksum_image(st[:, :, b]) for b in range(3)] == \
        [12603, 58561, 36064]

    u16 = decode_png(
        open(f"{P}/gdrivers/data/png/uint16_interlaced.png", "rb").read())
    assert u16.dtype.name == "uint16" and checksum_image(u16) == 4672

    b = decode_png(open(f"{P}/gdrivers/data/png/byte_with_xmp.png", "rb").read())
    assert checksum_image(b) == 4672
