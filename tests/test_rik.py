"""RIK driver over synthesized fixtures (reference autotest data is
download-only); wire parity per frmts/rik/rikdataset.cpp."""
import numpy as np
import pytest

from gdal_ray.sources.rik import read_rik, write_rik


def _img(h=20, w=25):
    rng = np.random.default_rng(11)
    return rng.integers(0, 255, (h, w)).astype(np.uint8)


@pytest.mark.parametrize("options", [0x00, 0x40, 0x01, 0x41, 0x0D])
def test_rik_roundtrip(options):
    px = _img()
    data = write_rik(px, options=options, block=(16, 16))
    rd = read_rik(data)
    assert rd["driver"] == "RIK"
    assert rd["epsg"] == 3021
    # raster is padded up to whole blocks (32x32 here)
    assert rd["pixels"].shape == (32, 32)
    assert np.array_equal(rd["pixels"][:20, :25], px)
    assert rd["metadata"]["OPTIONS"] == options


def test_rik_geotransform():
    px = _img(16, 16)
    rd = read_rik(write_rik(px, west=1450000.0, north=6510000.0,
                            mpp=2.0, block=(16, 16)))
    gt = rd["gt"]
    assert gt == (1450000.0 - 1.0, 2.0, 0.0, 6510000.0 + 1.0, 0.0, -2.0)


def test_rik_palette():
    pal = np.arange(768, dtype=np.uint32).reshape(256, 3) % 256
    rd = read_rik(write_rik(_img(16, 16), palette=pal.astype(np.uint8)))
    assert np.array_equal(rd["palette"], pal.astype(np.uint8))


def test_rik_zero_offset_block_is_blank():
    import struct

    px = np.full((16, 32), 7, np.uint8)
    data = bytearray(write_rik(px, options=0x0D, block=(16, 16)))
    # zero out the second block's offset table entry
    # (table sits right after name(2+9)+hdr(2+32+4+4+12+4+2)+palette 768)
    table_pos = 11 + 60 + 768
    struct.pack_into("<I", data, table_pos + 4, 0)
    rd = read_rik(bytes(data))
    assert np.all(rd["pixels"][:, :16] == 7)
    assert np.all(rd["pixels"][:, 16:] == 0)


def _lzw_pack(codes, code_bits=9):
    """LSB-first bit packer like GetNextLZWCode expects."""
    out = bytearray(5)
    out[4] = 13          # max bits, no clear code
    acc = 0
    nbits = 0
    for c in codes:
        acc |= c << nbits
        nbits += code_bits
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_rik_lzw_literal_stream():
    """Hand-built 9-bit literal LZW stream: pixels are consumed
    bottom-up with the line break aligned to 4 (OutputPixel)."""
    from gdal_ray.sources.rik import _lzw_decode

    bw, bh = 10, 3
    tile = (np.arange(bw * bh) % 251).reshape(bh, bw).astype(np.uint8)
    line_break = (bw + 3) & ~3          # 12
    seq = []
    for il in range(bh - 1, -1, -1):
        seq.extend(int(v) for v in tile[il])
        seq.extend([0] * (line_break - bw))
    out = _lzw_decode(_lzw_pack(seq), bw, bh)
    assert np.array_equal(out, tile)


def test_rik_lzw_repeat_uses_string_table():
    """A repeated-pattern stream exercising code > CLEAR table hits."""
    from gdal_ray.sources.rik import _lzw_decode

    bw, bh = 4, 2   # line_break == bw == 4
    # emissions bottom-up: line1 then line0
    # codes: 5, 5 -> adds entry 256=(5,5); then code 256 emits "5,5";
    # then four 7s
    codes = [5, 5, 256, 7, 7, 7, 7]
    out = _lzw_decode(_lzw_pack(codes), bw, bh)
    assert np.array_equal(out[1], [5, 5, 5, 5])
    assert np.array_equal(out[0], [7, 7, 7, 7])


def test_rik_rejects():
    with pytest.raises(ValueError):
        read_rik(b"\x00" * 100)
    # bad bits per pixel
    px = _img(16, 16)
    data = bytearray(write_rik(px))
    data[11 + 58] = 4   # bpp byte
    with pytest.raises(ValueError, match="bits per pixel"):
        read_rik(bytes(data))
