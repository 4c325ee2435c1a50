"""PCIDSK .pix database reader (reference frmts/pcidsk/sdk — an
independent re-derivation of core/cpcidskfile.cpp's header layout).
512-byte blocks; the ASCII file header carries (0-based offsets):
image-data start block [304,16], image-header start block [336,16],
interleaving [360,8], channel count [376,8], width [384,8], height
[392,8], per-type channel counts from [464]. Each channel has a
1024-byte image header whose pixel type sits at [160,8]; blank pixel
types fall back to the per-type count order (8U, 16S, 16U, 32R).
BAND interleaving stores channels contiguously from the image data
offset; PIXEL interleaving stores block-aligned interleaved lines.
Tiled (FILE /SIS=) channels are not implemented. Conformed against
the reference's own utm.pix checksum (tests/test_planetary2.py)."""

from __future__ import annotations

import numpy as np

_TYPES = {"8U": "u1", "16S": ">i2", "16U": ">u2", "32R": ">f4",
          "32S": ">i4", "32U": ">u4", "64R": ">f8"}


def sniff_pcidsk(data: bytes) -> bool:
    return data[:8] == b"PCIDSK  "


def read_pcidsk(data: bytes):
    """-> (pixels (h, w) or (h, w, bands), gt | None, info)."""
    if not sniff_pcidsk(data):
        raise ValueError("not a PCIDSK file")
    fh = data[:512].decode("latin-1")

    def get(off, n):
        return fh[off:off + n].strip()

    image_start = (int(get(304, 16) or "0") - 1) * 512
    ih_start = (int(get(336, 16) or "0") - 1) * 512
    interleaving = get(360, 8).upper()
    nchan = int(get(376, 8) or "0")
    w = int(get(384, 8) or "0")
    h = int(get(392, 8) or "0")
    if nchan <= 0 or w <= 0 or h <= 0:
        raise ValueError("PCIDSK: bad header dimensions")

    # default pixel types from the per-type channel counts
    counts = []
    if get(464, 4):
        for i, t in enumerate(("8U", "16S", "16U", "32R")):
            counts += [t] * int(get(464 + 4 * i, 4) or "0")
    types = []
    for c in range(nchan):
        ih_off = ih_start + c * 1024
        pt = data[ih_off + 160:ih_off + 168].decode(
            "latin-1").strip().upper()
        if not pt:
            pt = counts[c] if c < len(counts) else "8U"
        if pt not in _TYPES:
            raise NotImplementedError(f"PCIDSK pixel type {pt!r} "
                                      "(tiled/FILE channels unsupported)")
        types.append(np.dtype(_TYPES[pt]))

    bands = []
    if interleaving == "BAND":
        off = image_start
        for dt in types:
            n = w * h * dt.itemsize
            buf = data[off:off + n]
            buf = buf + b"\x00" * (n - len(buf))
            bands.append(np.frombuffer(buf, dt).reshape(h, w))
            off += n
    elif interleaving == "PIXEL":
        psz = sum(dt.itemsize for dt in types)
        # lines are padded to 512-byte blocks
        lsz = (w * psz + 511) // 512 * 512
        need = image_start + lsz * h
        buf = data[image_start:need]
        buf = buf + b"\x00" * (need - image_start - len(buf))
        rows = np.frombuffer(buf, np.uint8).reshape(h, lsz)[:, :w * psz]
        rows = np.ascontiguousarray(rows).reshape(h, w, psz)
        boff = 0
        for dt in types:
            chan = np.ascontiguousarray(
                rows[:, :, boff:boff + dt.itemsize]).reshape(-1).view(dt)
            bands.append(chan.reshape(h, w))
            boff += dt.itemsize
    else:
        raise NotImplementedError(
            f"PCIDSK interleaving {interleaving!r} (tiled files use the "
            "/SIS= blocked-segment layout)")
    px = bands[0] if len(bands) == 1 else np.dstack(bands)
    return np.ascontiguousarray(px), None, {"interleaving": interleaving,
                                            "nchan": nchan}
