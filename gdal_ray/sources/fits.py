"""FITS raster driver (reference frmts/fits/fitsdataset.cpp on
cfitsio). 2880-byte header units of 80-char keyword cards, big-endian
data, bottom-up row order (FITS pixel 1,1 is the bottom-left corner —
fitsdataset.cpp IReadBlock flips). BZERO/BSCALE follow the cfitsio
unsigned-integer convention (BITPIX 8 + BZERO -128 -> Int8, BITPIX 16 +
BZERO 32768 -> UInt16, ...); other scalings are exposed as
scale/offset metadata, not applied to pixels. Angular WCS georef per
LoadGeoreferencing: cd = CDELT x PC (or CD matrix), radfac = DEG2RAD *
A_RADIUS, gt[0] = CRVAL1*radfac - gt[1]*(CRPIX1-0.5), gt[3] =
-gt[5]*(CRPIX2-0.5). Conformed against the reference's own
byte_merc.fits geotransform and CreateCopy roundtrips
(tests/test_ers_fits.py)."""

from __future__ import annotations

import numpy as np

_BITPIX_DTYPE = {8: ">u1", 16: ">i2", 32: ">i4", 64: ">i8",
                 -32: ">f4", -64: ">f8"}


def sniff_fits(data: bytes) -> bool:
    return data[:9] == b"SIMPLE  ="


def _parse_cards(block: bytes) -> dict:
    out = {}
    for i in range(0, len(block), 80):
        card = block[i:i + 80].decode("ascii", "replace")
        key = card[:8].strip()
        if key in ("COMMENT", "HISTORY", "") or card[8] != "=":
            continue
        val = card[10:].split("/", 1)[0].strip()
        if val.startswith("'"):
            val = val[1:val.rindex("'")].strip()
        out[key] = val
    return out


def read_fits(data: bytes, hdu: int = 0):
    """-> (pixels north-up, gt | None, header dict). ``hdu`` selects
    the n-th IMAGE unit (primary counts when it has data)."""
    if not sniff_fits(data):
        raise ValueError("not a FITS file")
    pos = 0
    images = []
    while pos + 2880 <= len(data):
        cards: dict = {}
        hpos = pos
        while True:
            block = data[hpos:hpos + 2880]
            if not block:
                raise ValueError("FITS: truncated header")
            cards.update(_parse_cards(block))
            hpos += 2880
            if any(block[i:i + 80].rstrip() == b"END"
                   for i in range(0, len(block), 80)):
                break
        bitpix = int(cards.get("BITPIX", "8"))
        naxis = int(cards.get("NAXIS", "0"))
        dims = [int(cards.get(f"NAXIS{i + 1}", "0")) for i in range(naxis)]
        nbytes = abs(bitpix) // 8 * int(np.prod(dims)) if dims else 0
        dstart = hpos
        dlen = (nbytes + 2879) // 2880 * 2880
        xtension = cards.get("XTENSION", "" if pos == 0 else "?")
        is_image = (pos == 0 or xtension.upper().startswith("IMAGE"))
        if is_image and naxis >= 2 and all(d > 0 for d in dims[:2]):
            images.append((cards, dstart, dims, bitpix))
        pos = dstart + dlen
    if hdu >= len(images):
        raise ValueError(f"FITS: no image HDU #{hdu} "
                         f"({len(images)} image HDUs present)")
    cards, dstart, dims, bitpix = images[hdu]
    if bitpix not in _BITPIX_DTYPE:
        raise NotImplementedError(f"FITS BITPIX {bitpix}")
    w, h = dims[0], dims[1]
    nb = dims[2] if len(dims) > 2 else 1
    arr = np.frombuffer(data, _BITPIX_DTYPE[bitpix], w * h * nb,
                        dstart).reshape((nb, h, w) if nb > 1 else (h, w))
    bzero = float(cards.get("BZERO", "0"))
    bscale = float(cards.get("BSCALE", "1"))
    # cfitsio unsigned/signed remapping
    if bscale == 1.0:
        if bitpix == 8 and bzero == -128:
            arr = (arr.astype(np.int16) - 128).astype(np.int8)
        elif bitpix == 16 and bzero == 32768:
            arr = (arr.astype(np.int32) + 32768).astype(np.uint16)
        elif bitpix == 32 and bzero == 2147483648:
            arr = (arr.astype(np.int64) + 2147483648).astype(np.uint32)
    # bottom-up -> north-up
    arr = arr[..., ::-1, :]
    px = np.ascontiguousarray(
        np.transpose(arr, (1, 2, 0)) if nb > 1 else arr)

    gt = None
    ct1 = cards.get("CTYPE1", "")
    if "LN" in ct1 and "A_RADIUS" in cards and "CRPIX1" in cards:
        a_radius = float(cards["A_RADIUS"])
        crpix1, crpix2 = float(cards["CRPIX1"]), float(cards["CRPIX2"])
        crval1 = float(cards.get("CRVAL1", "0"))
        if "CDELT1" in cards:
            cdelt1 = float(cards["CDELT1"])
            cdelt2 = float(cards["CDELT2"])
            pc = [float(cards.get(f"PC{i}_{j}", "1" if i == j else "0"))
                  for i in (1, 2) for j in (1, 2)]
            cd = [cdelt1 * pc[0], cdelt1 * pc[1],
                  cdelt2 * pc[2], cdelt2 * pc[3]]
        else:
            cd = [float(cards.get(f"CD{i}_{j}", "0"))
                  for i in (1, 2) for j in (1, 2)]
        radfac = np.pi / 180.0 * a_radius
        if crval1 > 180.0:
            crval1 -= 180.0
        g1, g2 = cd[0] * radfac, cd[1] * radfac
        g4, g5 = cd[2] * radfac, -cd[3] * radfac
        gt = (crval1 * radfac - g1 * (crpix1 - 0.5), g1, g2,
              -g5 * (crpix2 - 0.5), g4, g5)
    return px, gt, cards


def _card(key: str, value: str, comment: str = "") -> bytes:
    s = f"{key:<8}= {value:>20}"
    if comment:
        s += f" / {comment}"
    return s[:80].ljust(80).encode("ascii")


def write_fits(pixels: np.ndarray) -> bytes:
    """Minimal single-HDU FITS writer (the reference's CreateCopy
    shape): big-endian data, bottom-up rows, cfitsio unsigned
    conventions for uint16/uint32."""
    px = np.asarray(pixels)
    nb = 1 if px.ndim == 2 else px.shape[2]
    h, w = px.shape[:2]
    kind = px.dtype
    bzero = 0
    if kind == np.uint8:
        bitpix, store = 8, px.astype(">u1")
    elif kind == np.int16:
        bitpix, store = 16, px.astype(">i2")
    elif kind == np.uint16:
        bitpix, bzero = 16, 32768
        store = (px.astype(np.int32) - 32768).astype(">i2")
    elif kind == np.int32:
        bitpix, store = 32, px.astype(">i4")
    elif kind == np.float32:
        bitpix, store = -32, px.astype(">f4")
    elif kind == np.float64:
        bitpix, store = -64, px.astype(">f8")
    else:
        raise NotImplementedError(f"FITS write for dtype {kind}")
    if nb > 1:
        store = np.transpose(store, (2, 0, 1))
    store = store[..., ::-1, :]  # north-up -> bottom-up

    cards = [_card("SIMPLE", "T", "file does conform to FITS standard"),
             _card("BITPIX", str(bitpix)),
             _card("NAXIS", str(2 if nb == 1 else 3)),
             _card("NAXIS1", str(w)), _card("NAXIS2", str(h))]
    if nb > 1:
        cards.append(_card("NAXIS3", str(nb)))
    if bzero:
        cards.append(_card("BZERO", str(bzero)))
        cards.append(_card("BSCALE", "1"))
    cards.append(b"END".ljust(80))
    hdr = b"".join(cards)
    hdr += b" " * ((2880 - len(hdr) % 2880) % 2880)
    body = store.tobytes()
    body += b"\x00" * ((2880 - len(body) % 2880) % 2880)
    return hdr + body
