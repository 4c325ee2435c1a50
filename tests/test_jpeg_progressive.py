"""Progressive JPEG decoder (functions/jpeg.py
decode_jpeg_progressive) validated against a test-local progressive
ENCODER transcribed from the reference's vendored jcphuff.c
(encode_mcu_DC_first/AC_first/DC_refine/AC_refine + emit_eobrun):
the same quantized coefficients emitted as a baseline stream and as a
multi-scan progressive stream must decode pixel-identically.  Plus
the lossless (SOF3) golden from the reference's own fixture."""
import struct

import numpy as np
import pytest

from gdal_ray.functions.jpeg import (AC_LUM, DC_LUM, ZIGZAG,
                                     _BitWriter, _canonical_codes,
                                     _dht_segment, _dqt_segment,
                                     _fdct_blocks, _quality_tables,
                                     _to_blocks, decode_jpeg,
                                     decode_jpeg_progressive,
                                     encode_jpeg)


class _ProgWriter(_BitWriter):
    def __init__(self, codes):
        super().__init__()
        self.codes = codes

    def sym(self, s):
        code, ln = self.codes[s]
        self.put(code, ln)


def _encode_progressive(gray: np.ndarray, qtab: np.ndarray,
                        dc_scans, ac_scans) -> bytes:
    """Single-component progressive stream from explicit scan specs.
    dc_scans: [(ah, al)...] first then refinements; ac_scans:
    [(ss, se, ah, al)...]."""
    h, w = gray.shape
    blocks, bh, bw = _to_blocks(gray.astype(np.float64) - 128.0)
    coef = _fdct_blocks(blocks).reshape(-1, 64)
    qc = np.round(coef / qtab[None, :]).astype(np.int64)
    zz = qc[:, ZIGZAG]          # zigzag-order coefficients per block
    nb = len(zz)

    dc_codes = _canonical_codes(DC_LUM[0], DC_LUM[1])
    # progressive scans need the EOBn symbols (0x10..0xE0) missing
    # from the Annex K baseline AC table: use a flat custom table
    # with every symbol at 9 bits
    ac_bits = [0] * 16
    ac_bits[8] = 255            # 255 codes of length 9 (DHT count is u8)
    ac_bits[9] = 1              # + 1 code of length 10
    ac_values = list(range(256))
    ac_codes = _canonical_codes(ac_bits, ac_values)

    out = bytearray(b"\xff\xd8")
    out += _dqt_segment(0, qtab)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUM) + _dht_segment(1, 0, (ac_bits, ac_values))

    def sos_header(ss, se, ah, al):
        seg = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(seg) + 2) + seg

    # ---- DC scans
    for ah, al in dc_scans:
        out += sos_header(0, 0, ah, al)
        bwr = _ProgWriter(dc_codes)
        if ah == 0:
            last = 0
            for b in range(nb):
                v = int(zz[b, 0]) >> al
                diff = v - last
                last = v
                if diff == 0:
                    bwr.sym(0)
                else:
                    a = abs(diff)
                    nbits = a.bit_length()
                    bwr.sym(nbits)
                    bits = diff if diff > 0 else diff + (1 << nbits) - 1
                    bwr.put(bits, nbits)
        else:
            for b in range(nb):
                bwr.put((int(zz[b, 0]) >> al) & 1, 1)
        bwr.flush()
        out += bytes(bwr.buf)

    # ---- AC scans
    for ss, se, ah, al in ac_scans:
        out += sos_header(ss, se, ah, al)
        bwr = _ProgWriter(ac_codes)
        eobrun = 0
        be_bits: list[int] = []

        def emit_eobrun():
            nonlocal eobrun
            if eobrun > 0:
                nbits = eobrun.bit_length() - 1
                bwr.sym(nbits << 4)
                if nbits:
                    bwr.put(eobrun, nbits)
                eobrun = 0
                for bit in be_bits:
                    bwr.put(bit, 1)
                be_bits.clear()

        for b in range(nb):
            if ah == 0:     # AC first (jcphuff encode_mcu_AC_first)
                r = 0
                wrote = False
                for k in range(ss, se + 1):
                    t = int(zz[b, k])
                    if t < 0:
                        t = (-t) >> al
                        t2 = ~t & ((1 << 32) - 1)
                    else:
                        t = t >> al
                        t2 = t
                    if t == 0:
                        r += 1
                        continue
                    emit_eobrun()
                    while r > 15:
                        bwr.sym(0xF0)
                        r -= 16
                    nbits = t.bit_length()
                    bwr.sym((r << 4) + nbits)
                    bwr.put(t2 & ((1 << nbits) - 1), nbits)
                    r = 0
                    wrote = True
                if r > 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        emit_eobrun()
            else:           # AC refine (jcphuff encode_mcu_AC_refine)
                absv = [0] * 64
                eob = 0
                for k in range(ss, se + 1):
                    t = abs(int(zz[b, k])) >> al
                    absv[k] = t
                    if t == 1:
                        eob = k
                r = 0
                br: list[int] = []
                for k in range(ss, se + 1):
                    t = absv[k]
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        emit_eobrun()
                        bwr.sym(0xF0)
                        r -= 16
                        for bit in br:
                            bwr.put(bit, 1)
                        br = []
                    if t > 1:
                        br.append(t & 1)
                        continue
                    emit_eobrun()
                    bwr.sym((r << 4) + 1)
                    bwr.put(0 if int(zz[b, k]) < 0 else 1, 1)
                    for bit in br:
                        bwr.put(bit, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    eobrun += 1
                    be_bits.extend(br)
                    if eobrun == 0x7FFF or len(be_bits) > 937:
                        emit_eobrun()
        emit_eobrun()
        bwr.flush()
        out += bytes(bwr.buf)
    out += b"\xff\xd9"
    return bytes(out)


def _baseline(gray, qtab):
    return encode_jpeg(gray, quant_tables=(qtab, qtab))


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(23)
    smooth = (np.add.outer(np.arange(24) * 5, np.arange(40) * 2)
              % 256).astype(np.uint8)
    noisy = rng.integers(0, 255, (17, 31)).astype(np.uint8)
    flat = np.full((16, 16), 130, np.uint8)
    return {"smooth": smooth, "noisy": noisy, "flat": flat}


SPECTRAL = [(1, 5, 0, 0), (6, 63, 0, 0)]
SUCCESSIVE = [(1, 5, 0, 1), (6, 63, 0, 1), (1, 5, 1, 0), (6, 63, 1, 0)]
FULL = [(1, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0)]


@pytest.mark.parametrize("name", ["smooth", "noisy", "flat"])
@pytest.mark.parametrize("dc_scans,ac_scans", [
    ([(0, 0)], SPECTRAL),                      # spectral selection only
    ([(0, 1), (1, 0)], SUCCESSIVE),            # + successive approx
    ([(0, 2), (2, 1), (1, 0)], FULL),          # 2-level refinement
])
def test_progressive_equals_baseline(images, name, dc_scans, ac_scans):
    gray = images[name]
    qtab, _ = _quality_tables(85)
    base = decode_jpeg(_baseline(gray, qtab))
    prog = decode_jpeg_progressive(
        _encode_progressive(gray, qtab, dc_scans, ac_scans))
    assert prog.shape == base.shape
    np.testing.assert_array_equal(prog, base)


def test_reference_progressive_fixtures():
    # the reference's only progressive fixtures are blank rasters;
    # they must decode cleanly with the annotated constant values
    d = "/root/reference/autotest/gdrivers/data/jpeg"
    px = decode_jpeg_progressive(
        open(f"{d}/arcgis_geodataxform_gcp.jpg", "rb").read())
    assert px.shape == (30, 30) and set(np.unique(px)) == {1}
    px = decode_jpeg_progressive(
        open(f"{d}/arcgis_metadata_geodataxform_gcp.jpg", "rb").read())
    assert px.shape == (62, 58) and set(np.unique(px)) == {0}


def test_lossless_golden():
    from gdal_ray.functions.checksum import checksum_image
    from gdal_ray.functions.jpeg import decode_jpeg_lossless

    d = "/root/reference/autotest/gdrivers/data/jpeg"
    px = decode_jpeg_lossless(open(f"{d}/byte_lossless.jpg", "rb").read())
    # gdrivers/jpeg.py test_jpeg_read_lossless golden
    assert checksum_image(px) == 4672
    # GDAL itself rejects the 16-bit variant; this decoder reads it
    px16 = decode_jpeg_lossless(
        open(f"{d}/uint16_lossless.jpg", "rb").read())
    assert px16.dtype == np.uint16 and px16.shape == (20, 20)


def _encode_lossless_dri(img: np.ndarray, ri: int,
                         predictor: int = 1) -> bytes:
    """Minimal SOF3 grayscale encoder with restart intervals (test
    oracle for decode_jpeg_lossless's DRI path; T.81 Annex H
    semantics: interval start -> default prediction, restart line ->
    Ra, row start -> Rb)."""
    import struct

    h, w = img.shape
    # canonical Huffman: SSSS symbols 0..16, all 5-bit codes
    bits = [0, 0, 0, 0, 17] + [0] * 11
    values = list(range(17))
    codes = {v: (i, 5) for i, v in enumerate(values)}

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xc3" + struct.pack(">HBHHB", 11, 8, h, w, 1)
    out += b"\x01\x11\x00"
    out += b"\xff\xc4" + struct.pack(">H", 2 + 17 + len(values))
    out += bytes([0x00]) + bytes(bits[:16]) + bytes(values)
    out += b"\xff\xdd" + struct.pack(">HH", 4, ri)
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes(
        [1, 1, 0x00, predictor, 0, 0])

    buf = 0
    nbits = 0
    seg = bytearray()

    def put(code, k):
        nonlocal buf, nbits
        buf = (buf << k) | code
        nbits += k
        while nbits >= 8:
            b = (buf >> (nbits - 8)) & 0xFF
            seg.append(b)
            if b == 0xFF:
                seg.append(0x00)
            nbits -= 8

    def flush():
        nonlocal buf, nbits
        if nbits:
            b = ((buf << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xFF
            seg.append(b)
            if b == 0xFF:
                seg.append(0x00)
        buf = 0
        nbits = 0

    ry = rx = 0
    count = 0
    rst = 0
    px = img.astype(np.int64)
    for y in range(h):
        for x in range(w):
            if count == ri:
                flush()
                out += bytes(seg) + bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                seg = bytearray()
                count = 0
                ry, rx = y, x
            count += 1
            if y == ry:
                pred = 128 if x == rx else int(px[y, x - 1])
            elif x == 0:
                pred = int(px[y - 1, 0])
            else:
                ra, rb, rc = (int(px[y, x - 1]), int(px[y - 1, x]),
                              int(px[y - 1, x - 1]))
                pred = {1: ra, 2: rb, 3: rc, 4: ra + rb - rc,
                        5: ra + ((rb - rc) >> 1),
                        6: rb + ((ra - rc) >> 1),
                        7: (ra + rb) >> 1}[predictor]
            diff = int(px[y, x]) - pred
            ssss = 0 if diff == 0 else max(diff.bit_length(),
                                           (-diff).bit_length())
            code, k = codes[ssss]
            put(code, k)
            if ssss:
                v = diff if diff >= 0 else diff + (1 << ssss) - 1
                put(v & ((1 << ssss) - 1), ssss)
    flush()
    out += bytes(seg) + b"\xff\xd9"
    return bytes(out)


def test_lossless_restart_interval_roundtrip():
    from gdal_ray.functions.jpeg import decode_jpeg_lossless

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 17), dtype=np.uint8)
    for pred in (1, 4, 7):
        # mid-row restarts (ri not a multiple of width) and row-aligned
        for ri in (5, 17, 40):
            enc = _encode_lossless_dri(img, ri, predictor=pred)
            got = decode_jpeg_lossless(enc)
            assert got.dtype == np.uint8
            assert np.array_equal(got, img), (pred, ri)
