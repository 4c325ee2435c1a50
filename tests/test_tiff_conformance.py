"""Conformance against the reference's own fixtures and checksum
oracle: byte.tif has GDALChecksumImage == 4672
(reference autotest/gcore/tiff_read.py:45)."""

import os

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.tiff import decode_tiff

DATA = "/root/reference/autotest/gcore/data"


def test_byte_tif_checksum_4672():
    px, gt = decode_tiff(open(os.path.join(DATA, "byte.tif"), "rb").read())
    assert px.shape == (20, 20)
    assert px.dtype == np.uint8
    assert checksum_image(px) == 4672
    # georeference decoded (UTM zone 11, 60 m pixels)
    assert gt is not None
    assert gt[1] == pytest.approx(60.0)
    assert gt[5] == pytest.approx(-60.0)


def test_utmsmall_tif_checksum_50054():
    path = os.path.join(DATA, "utmsmall.tif")
    px, gt = decode_tiff(open(path, "rb").read())
    assert px.shape == (100, 100)
    assert px.dtype == np.uint8
    # the reference's own checksum oracle for utmsmall.tif band 1
    # (autotest/utilities/test_gdalalg_convert.py:32)
    assert checksum_image(px) == 50054
    assert gt is not None and gt[1] == pytest.approx(60.0)


def test_compressed_tiff_raises():
    # rle (PackBits) supported; deflate is not -> NotImplementedError
    path = os.path.join(DATA, "byte_zstd.tif")
    if not os.path.exists(path):
        pytest.skip("fixture absent")
    with pytest.raises(NotImplementedError):
        decode_tiff(open(path, "rb").read())


def test_tiff_ray_source(ray_session):
    from gdal_ray.functions.codecs import decode_image
    from gdal_ray.sources.tiff import read_tiff_dataset

    ds = read_tiff_dataset([os.path.join(DATA, "byte.tif"),
                            os.path.join(DATA, "utmsmall.tif")])
    rows = {}
    for b in ds.iter_batches(batch_size=None, batch_format="pyarrow"):
        for r in b.to_pylist():
            rows[os.path.basename(r["image_id"])] = r
    assert rows["byte.tif"]["w"] == 20
    px = decode_image(rows["byte.tif"]["bytes"])
    band = px[:, :, 0] if px.ndim == 3 else px
    assert checksum_image(band) == 4672


def test_tiff_lzw_fixture_decodes():
    """LZW strips (compression 5): the reference's gh_1439 fixtures
    decode to their tagged sizes without error."""
    from gdal_ray.sources.tiff import decode_tiff

    px, _ = decode_tiff(open(
        "/root/reference/autotest/gcore/data/bug_gh_1439_update_lzw.tif",
        "rb").read())
    assert px.shape == (1, 4096) and str(px.dtype) == "uint16"


def test_tiff_lzw_spec_roundtrip():
    """Decode a stream produced by an independent TIFF6-spec LZW
    encoder (MSB-first, early change) — exercises table growth and
    width bumps."""
    import numpy as np

    from gdal_ray.sources.tiff import _unlzw

    rng = np.random.default_rng(7)
    data = bytes(rng.integers(0, 7, 70000, dtype=np.uint8))  # repetitive

    # minimal spec encoder
    out_bits = []
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258

    def emit(code, w):
        out_bits.extend(((code >> (w - 1 - k)) & 1) for k in range(w))

    emit(256, width)  # CLEAR
    omega = b""
    for b in data:
        cand = omega + bytes([b])
        if cand in table:
            omega = cand
            continue
        emit(table[omega], width)
        table[cand] = next_code
        next_code += 1
        # libtiff encoder bumps at free_ent > MAXCODE(nbits) — one
        # entry AFTER the decoder's bump point (the early-change pair)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        omega = bytes([b])
    if omega:
        emit(table[omega], width)
    emit(257, width)  # EOI
    while len(out_bits) % 8:
        out_bits.append(0)
    enc = bytes(int("".join(map(str, out_bits[i:i + 8])), 2)
                for i in range(0, len(out_bits), 8))

    assert _unlzw(enc, len(data)) == data


def test_tiff_deflate_golden():
    """Deflate strips (compression 8): the reference warp golden reads
    byte-identically (validated transitively by the warp conformance
    tests against it)."""
    from gdal_ray.sources.tiff import decode_tiff

    px, gt = decode_tiff(open(
        "/root/reference/autotest/alg/data/utmsmall_near.tiff", "rb").read())
    assert px.shape == (500, 500)
    assert gt == (440720.0, 10.0, 0.0, 3751320.0, 0.0, -10.0)


def test_tiff_write_roundtrip():
    """encode_tiff -> decode_tiff round-trips pixels, dtype, and the
    GeoTIFF geotransform; with and without Deflate."""
    import numpy as np

    from gdal_ray.sources.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(5)
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    for arr in (rng.integers(0, 255, (37, 23), np.uint8),
                rng.integers(-500, 500, (16, 16), np.int16),
                rng.normal(0, 1, (8, 9)).astype(np.float32),
                rng.integers(0, 255, (12, 10, 3), np.uint8)):
        for comp in ("none", "deflate"):
            blob = encode_tiff(arr, gt=gt, compression=comp)
            out, got_gt = decode_tiff(blob)
            assert np.array_equal(out, arr), (arr.dtype, comp)
            assert got_gt == gt


def test_tiff_write_matches_reference_reader_semantics():
    """Write the reference fixture's pixels through our writer and
    re-read: checksum identical to the original byte.tif (4672)."""
    from gdal_ray.functions.checksum import checksum_image
    from gdal_ray.sources.tiff import decode_tiff, encode_tiff

    px, gt = decode_tiff(open(
        "/root/reference/autotest/gcore/data/byte.tif", "rb").read())
    blob = encode_tiff(px, gt=gt, compression="deflate")
    out, _ = decode_tiff(blob)
    assert checksum_image(out) == 4672


def test_tiff_tiled_read():
    """Tiled TIFF layout (TileWidth/TileLength tags): a tiled file
    written by an independent test-local writer round-trips through
    decode_tiff with the reference checksum preserved (utmsmall's
    50054), including edge tiles and Deflate-compressed tiles."""
    import struct as st
    import zlib

    import numpy as np

    from gdal_ray.functions.checksum import checksum_image
    from gdal_ray.sources.tiff import decode_tiff

    def write_tiled(px, tw, th, deflate=False):
        h, w = px.shape
        ntx = (w + tw - 1) // tw
        nty = (h + th - 1) // th
        tiles = []
        for ty in range(nty):
            for tx in range(ntx):
                t = np.zeros((th, tw), px.dtype)
                sub = px[ty * th:(ty + 1) * th, tx * tw:(tx + 1) * tw]
                t[:sub.shape[0], :sub.shape[1]] = sub
                buf = t.tobytes()
                tiles.append(zlib.compress(buf) if deflate else buf)
        ntags = 11
        data_off = 8
        blob = b"".join(tiles)
        ifd_off = data_off + len(blob)
        offs = []
        o = data_off
        for t in tiles:
            offs.append(o)
            o += len(t)
        extra_off = ifd_off + 2 + 12 * ntags + 4
        # out-of-line arrays for offsets/counts when >1 tile
        entries = []
        extra = b""

        def arr_tag(tag, values):
            nonlocal extra
            if len(values) == 1:
                entries.append(st.pack("<HHII", tag, 4, 1, values[0]))
            else:
                entries.append(st.pack("<HHII", tag, 4, len(values),
                                       extra_off + len(extra)))
                extra += st.pack(f"<{len(values)}I", *values)

        for tag, val in ((256, w), (257, h), (258, 8),
                         (259, 8 if deflate else 1), (262, 1), (277, 1),
                         (339, 1), (322, tw), (323, th)):
            entries.append(st.pack("<HHII", tag, 3, 1, val))
        arr_tag(324, offs)
        arr_tag(325, [len(t) for t in tiles])
        entries.sort(key=lambda e: st.unpack("<H", e[:2])[0])
        return (b"II" + st.pack("<HI", 42, ifd_off) + blob
                + st.pack("<H", len(entries)) + b"".join(entries)
                + st.pack("<I", 0) + extra)

    src, _ = decode_tiff(open(
        "/root/reference/autotest/gcore/data/utmsmall.tif", "rb").read())
    for tw, th, deflate in ((32, 32, False), (48, 16, False), (64, 64, True)):
        blob = write_tiled(src, tw, th, deflate)
        out, _ = decode_tiff(blob)
        assert np.array_equal(out, src), (tw, th, deflate)
        assert checksum_image(out) == 50054


def test_bigtiff_roundtrip_all_dtypes():
    """BigTIFF (magic 43, 8-byte offsets, 20-byte IFD entries —
    libtiff tif_open.c big-TIFF branch): write -> reread bit-exact,
    geotransform preserved, deflate path included."""
    import numpy as np

    from gdal_ray.sources.tiff import decode_tiff, encode_tiff

    rng = np.random.default_rng(5)
    gt = (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    for dt in (np.uint8, np.uint16, np.int16, np.int32, np.float32,
               np.float64):
        px = (rng.uniform(0, 255, (37, 53)) if np.dtype(dt).kind == "f"
              else rng.integers(0, 250, (37, 53))).astype(dt)
        b = encode_tiff(px, gt=gt, bigtiff=True)
        assert b[2] == 43
        p2, g2 = decode_tiff(b)
        assert np.array_equal(p2, px)
        assert np.allclose(g2, gt)
    px3 = rng.integers(0, 255, (40, 31, 3)).astype(np.uint8)
    b = encode_tiff(px3, gt=gt, compression="deflate", bigtiff=True)
    p2, g2 = decode_tiff(b)
    assert np.array_equal(p2, px3) and np.allclose(g2, gt)


def test_rotated_geotransform_modeltransformation():
    """Rotated geotransforms round-trip through ModelTransformationTag
    (frmts/gtiff geotiff.cpp), classic and BigTIFF, and the warp
    stage consumes them (GenImgProj affine link handles rotation)."""
    import numpy as np

    from gdal_ray.sources.tiff import decode_tiff, encode_tiff
    from gdal_ray.stages.warp import warp_image_to_tiles

    rng = np.random.default_rng(3)
    px = rng.integers(0, 255, (48, 48)).astype(np.uint8)
    gtrot = (440720.0, 58.0, 7.5, 3751320.0, -6.0, -59.0)
    for big in (False, True):
        b = encode_tiff(px, gt=gtrot, bigtiff=big)
        p2, g2 = decode_tiff(b)
        assert np.array_equal(p2, px)
        assert np.allclose(g2, gtrot)
    rgb = rng.integers(0, 255, (96, 96, 3)).astype(np.uint8)
    frags = warp_image_to_tiles(
        rgb, (500_000.0, 28.0, 9.0, 4_200_000.0, -8.5, -27.0), 32618, "rot")
    assert frags and sum(f["n_valid"] for f in frags) > 0
