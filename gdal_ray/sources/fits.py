"""FITS reader: image HDUs + BINTABLE vector layers.

Pure-Python re-derivation of the reference driver's semantics
(frmts/fits/fitsdataset.cpp): HDU scan and subdataset naming
(fitsdataset.cpp:2424-2505), metadata with the ignorable-header list
(:1840-1846, :2190-2259), WCS georeferencing incl. the Mercator /
SFL / CAR / ZEA / COO / SIN / STG projection mapping (:3396-3640),
bottom-up row order (:1744-1747 "FITS array offsets start at 1 at
the bottom left"), cfitsio-style BINTABLE column typing with the
unsigned TZERO conventions (:280-549) and ``%.17g + %.17gj`` complex
formatting (:822). Data layout follows the public FITS 4.0 standard
(2880-byte header blocks of 80-char cards, big-endian data, P/Q
variable-length heap descriptors).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa

BLOCK = 2880

_IGNORABLE = {
    "SIMPLE", "BITPIX", "NAXIS", "NAXIS1", "NAXIS2", "NAXIS3", "END",
    "XTENSION", "PCOUNT", "GCOUNT", "EXTEND", "CONTINUE", "COMMENT", "",
    "LONGSTRN", "BZERO", "BSCALE", "BLANK", "CHECKSUM", "DATASUM",
}


def _parse_value(raw: str):
    """Parse a FITS card value field (already stripped of comment)."""
    raw = raw.strip()
    if not raw:
        return None
    if raw.startswith("'"):
        # string: ends at a single quote not doubled
        out = []
        i = 1
        while i < len(raw):
            if raw[i] == "'":
                if i + 1 < len(raw) and raw[i + 1] == "'":
                    out.append("'")
                    i += 2
                    continue
                break
            out.append(raw[i])
            i += 1
        return "".join(out)
    if raw == "T":
        return True
    if raw == "F":
        return False
    try:
        if re.fullmatch(r"[+-]?\d+", raw):
            return int(raw)
        return float(raw.replace("D", "E").replace("d", "e"))
    except ValueError:
        return raw


def _split_card(card: str):
    key = card[:8].rstrip()
    rest = card[8:]
    if not rest.startswith("= "):
        return key, None
    body = rest[2:]
    # strip comment: a '/' outside a quoted string
    in_q = False
    for i, ch in enumerate(body):
        if ch == "'":
            in_q = not in_q
        elif ch == "/" and not in_q:
            body = body[:i]
            break
    return key, body


def parse_header(data: bytes, off: int):
    """Parse one header unit starting at ``off``.

    Returns (cards list[(key, value)], header dict, end offset)."""
    cards = []
    hdr = {}
    pos = off
    done = False
    while not done:
        if pos + BLOCK > len(data):
            raise ValueError("FITS: truncated header")
        blk = data[pos:pos + BLOCK]
        pos += BLOCK
        for i in range(0, BLOCK, 80):
            card = blk[i:i + 80].decode("latin-1")
            key = card[:8].rstrip()
            if key == "END":
                done = True
                break
            k, body = _split_card(card)
            if body is None:
                cards.append((k, None))
                continue
            v = _parse_value(body)
            cards.append((k, v))
            if k not in hdr:
                hdr[k] = v
    return cards, hdr, pos


_BITPIX_DTYPE = {8: ">u1", 16: ">i2", 32: ">i4", 64: ">i8",
                 -32: ">f4", -64: ">f8"}


def parse_fits(data: bytes) -> list[dict]:
    """Scan all HDUs; returns a list of HDU descriptors."""
    if data[:6] != b"SIMPLE":
        raise ValueError("not a FITS file")
    hdus = []
    pos = 0
    while pos + BLOCK <= len(data):
        start = pos
        try:
            cards, hdr, pos = parse_header(data, pos)
        except ValueError:
            break
        naxis = int(hdr.get("NAXIS", 0))
        naxes = [int(hdr.get(f"NAXIS{i}", 0)) for i in range(1, naxis + 1)]
        bitpix = int(hdr.get("BITPIX", 8))
        pcount = int(hdr.get("PCOUNT", 0))
        gcount = int(hdr.get("GCOUNT", 1))
        nbytes = abs(bitpix) // 8 * gcount
        n = 1
        for ax in naxes:
            n *= ax
        nbytes *= n if naxes else 0
        nbytes += abs(bitpix) // 8 * pcount if naxes else 0
        xt = hdr.get("XTENSION", "")
        kind = "primary" if start == 0 else (
            "bintable" if str(xt).strip() == "BINTABLE" else
            "image" if str(xt).strip() == "IMAGE" else "other")
        hdus.append({"kind": kind, "cards": cards, "header": hdr,
                     "data_off": pos, "naxis": naxis, "naxes": naxes,
                     "bitpix": bitpix, "pcount": pcount})
        pos += (nbytes + BLOCK - 1) // BLOCK * BLOCK
    return hdus


def hdu_metadata(hdu: dict) -> dict:
    """Non-structural header cards, quotes stripped, padding kept
    (fitsdataset.cpp:2190-2259)."""
    md = {}
    for k, v in hdu["cards"]:
        if k in _IGNORABLE or v is None:
            continue
        md[k] = str(v) if not isinstance(v, bool) else ("T" if v else "F")
    return md


def fits_subdatasets(data: bytes, filename: str = "") -> list[tuple]:
    """(name, desc) pairs per the reference's HDU scan
    (fitsdataset.cpp:2480-2498). Cleared when only one image HDU."""
    subs = []
    for i, h in enumerate(parse_fits(data)):
        if h["kind"] in ("primary", "image") and h["naxis"] in (2, 3):
            nb = h["naxes"][2] if h["naxis"] == 3 else 1
            desc = (f"HDU {i + 1} ({h['naxes'][0]}x{h['naxes'][1]}, "
                    f"{nb} band{'s' if h['naxis'] == 3 and nb > 1 else ''})")
            ext = h["header"].get("EXTNAME", "")
            extver = h["header"].get("EXTVER", 0)
            if ext and extver:
                ext = f"{ext} {extver}"
            if ext:
                desc += f", {ext}"
            subs.append((f'FITS:"{filename}":{i + 1}', desc))
    if len(subs) == 1:
        return []
    return subs


def read_fits_image(data: bytes, hdu_index: int | None = None) -> dict:
    """Decode one image HDU (1-based index; default = first valid).

    Returns the engine's open_raster dict: pixels (h,w) or (h,w,bands),
    gt, projection dict, metadata, offset/scale/nodata."""
    hdus = parse_fits(data)
    valid = [i for i, h in enumerate(hdus)
             if h["kind"] in ("primary", "image") and h["naxis"] in (2, 3)]
    if hdu_index is not None:
        idx = hdu_index - 1
        if idx < 0 or idx >= len(hdus) or hdus[idx]["naxis"] not in (2, 3):
            raise ValueError(f"FITS: HDU {hdu_index} is not a 2/3-axis image")
    else:
        if not valid:
            if any(h["kind"] == "bintable" for h in hdus):
                raise ValueError(
                    "This FITS dataset does not contain any image, but "
                    "contains binary table(s) that could be opened in "
                    "vector mode.")
            raise ValueError("Cannot find HDU of image type with 2 or 3 axes.")
        idx = valid[0]
    h = hdus[idx]
    hdr = h["header"]
    w, ht = h["naxes"][0], h["naxes"][1]
    nbands = h["naxes"][2] if h["naxis"] == 3 else 1
    dt = _BITPIX_DTYPE[h["bitpix"]]
    raw = np.frombuffer(data, dt, w * ht * nbands, h["data_off"])
    bzero = hdr.get("BZERO", 0.0) or 0.0
    bscale = hdr.get("BSCALE", 1.0)
    offset, scale = 0.0, 1.0
    # cfitsio unsigned conventions (fitsdataset.cpp:342-381)
    if h["bitpix"] == 16 and bzero == 32768.0 and bscale == 1:
        raw = (raw.astype(np.int32) + 32768).astype(np.uint16)
    elif h["bitpix"] == 32 and bzero == 2147483648.0 and bscale == 1:
        raw = (raw.astype(np.int64) + 2147483648).astype(np.uint32)
    elif h["bitpix"] == 8 and bzero == -128.0 and bscale == 1:
        raw = (raw.astype(np.int16) - 128).astype(np.int8)
    else:
        offset, scale = float(bzero), float(bscale)
        raw = np.asarray(raw).astype(raw.dtype.newbyteorder("="))
    # FITS rows are bottom-up (fitsdataset.cpp:1744)
    if nbands == 1:
        px = raw.reshape(ht, w)[::-1].copy()
    else:
        px = raw.reshape(nbands, ht, w)[:, ::-1].transpose(1, 2, 0).copy()
    md = hdu_metadata(h)
    # primary-HDU metadata folds under an image in a later HDU
    if idx != 0 and hdus[0]["naxis"] == 0:
        base = hdu_metadata(hdus[0])
        base.update(md)
        md = base
    gt, srs = fits_georef(hdr)
    out = {"pixels": px, "gt": gt, "srs": srs, "driver": "FITS",
           "metadata": md, "offset": offset, "scale": scale,
           "epsg": None}
    if "BLANK" in hdr:
        out["nodata"] = float(hdr["BLANK"])
    return out


def read_fits(data: bytes, hdu: int | None = None):
    """Array-level open: (pixels, gt, info) for the image HDU ``hdu``
    (0-based; default = first image HDU). Raises when no image HDU
    exists (fitsdataset.cpp:2424-2505 HDU scan semantics)."""
    hdus = parse_fits(data)
    valid = [i for i, h in enumerate(hdus)
             if h["kind"] in ("primary", "image") and h["naxis"] in (2, 3)]
    if hdu is None:
        if not valid:
            raise ValueError("FITS: no image HDU with 2 or 3 axes")
        idx = valid[0]
    else:
        if hdu not in valid:
            raise ValueError(f"FITS: no image HDU at index {hdu}")
        idx = hdu
    r = read_fits_image(data, idx + 1)
    return r["pixels"], r["gt"], r


_WRITE_BITPIX = {
    np.dtype(np.uint8): (8, ">u1", 0),
    np.dtype(np.int8): (8, ">u1", -128.0),
    np.dtype(np.int16): (16, ">i2", 0),
    np.dtype(np.uint16): (16, ">i2", 32768.0),
    np.dtype(np.int32): (32, ">i4", 0),
    np.dtype(np.uint32): (32, ">i4", 2147483648.0),
    np.dtype(np.int64): (64, ">i8", 0),
    np.dtype(np.float32): (-32, ">f4", 0),
    np.dtype(np.float64): (-64, ">f8", 0),
}


def _card(key: str, val) -> bytes:
    if isinstance(val, bool):
        s = "T" if val else "F"
    elif isinstance(val, str):
        return f"{key:<8}= '{val}'".ljust(80).encode("ascii")
    else:
        s = repr(val)
    return f"{key:<8}= {s:>20}".ljust(80).encode("ascii")


def write_fits(px: np.ndarray) -> bytes:
    """Encode (h,w) or (h,w,bands) as a single-HDU FITS file using the
    reference's conventions: bottom-up rows (fitsdataset.cpp:1744),
    cfitsio unsigned BZERO offsets (:342-381), big-endian data."""
    px = np.asarray(px)
    dt = px.dtype.newbyteorder("=")
    if dt not in _WRITE_BITPIX:
        raise ValueError(f"FITS write: unsupported dtype {px.dtype}")
    bitpix, store, bzero = _WRITE_BITPIX[dt]
    if px.ndim == 2:
        ht, w = px.shape
        naxes = [w, ht]
        arr = px[::-1]
    elif px.ndim == 3:
        ht, w, nb = px.shape
        naxes = [w, ht, nb]
        arr = px[::-1].transpose(2, 0, 1)
    else:
        raise ValueError("FITS write: expected 2-D or 3-D array")
    cards = [_card("SIMPLE", True), _card("BITPIX", bitpix),
             _card("NAXIS", len(naxes))]
    cards += [_card(f"NAXIS{i + 1}", n) for i, n in enumerate(naxes)]
    if bzero:
        cards += [_card("BZERO", bzero), _card("BSCALE", 1.0)]
    cards.append(b"END".ljust(80))
    hdr = b"".join(cards)
    hdr += b" " * (-len(hdr) % BLOCK)
    if bzero:
        raw = (arr.astype(np.float64) - bzero).astype(store)
    else:
        raw = arr.astype(store)
    body = raw.tobytes()
    body += b"\0" * (-len(body) % BLOCK)
    return hdr + body


_PROJ = {
    "SFL": "Sinusoidal",
    "MER": "Mercator",
    "CAR": "Equirectangular",
    "ZEA": "Lambert_Azimuthal_Equal_Area",
    "COO": "Lambert_Conformal_Conic_1SP",
    "SIN": "Orthographic",
    "STG": "Polar_Stereographic",
}


def fits_georef(hdr: dict):
    """WCS keywords -> (geotransform, srs dict) per
    fitsdataset.cpp:3396-3640. Returns (None, None) when absent."""
    target = str(hdr.get("OBJECT", "Undefined")).strip() or "Undefined"
    a = hdr.get("A_RADIUS")
    if a is None:
        return None, None
    c = hdr.get("C_RADIUS", a)
    inv_f = 0.0 if a == c else a / (a - c)
    ctype1 = str(hdr.get("CTYPE1", ""))
    if "LN" not in ctype1:
        return None, None
    try:
        crpix1, crpix2 = float(hdr["CRPIX1"]), float(hdr["CRPIX2"])
        crval1, crval2 = float(hdr["CRVAL1"]), float(hdr["CRVAL2"])
    except KeyError:
        return None, None
    if "CDELT1" in hdr:
        cd = [float(hdr["CDELT1"]) * float(hdr.get("PC1_1", 1.0)),
              float(hdr["CDELT1"]) * float(hdr.get("PC1_2", 0.0)),
              float(hdr["CDELT2"]) * float(hdr.get("PC2_1", 0.0)),
              float(hdr["CDELT2"]) * float(hdr.get("PC2_2", 1.0))]
    else:
        cd = [float(hdr.get("CD1_1", 0.0)), float(hdr.get("CD1_2", 0.0)),
              float(hdr.get("CD2_1", 0.0)), float(hdr.get("CD2_2", 0.0))]
    radfac = math.radians(1.0) * a
    g1 = cd[0] * radfac
    g2 = cd[1] * radfac
    g4 = cd[2] * radfac
    g5 = -cd[3] * radfac
    if crval1 > 180.0:
        crval1 -= 180.0
    # pixel centers at integer coords -> shift half a pixel
    g0 = crval1 * radfac - g1 * (crpix1 - 0.5)
    g3 = -g5 * (crpix2 - 0.5)
    gt = (g0, g1, g2, g3, g4, g5)
    code = ctype1.rsplit("-", 1)[-1] if "-" in ctype1 else ""
    proj = _PROJ.get(code)
    srs = {
        "projcs": f"{proj}_{target}" if proj else None,
        "projection": proj,
        "geogcs": f"GCS_{target}",
        "datum": f"D_{target}",
        "spheroid": (target, float(a), float(inv_f)),
        "center_lon": crval1,
        "center_lat": crval2,
    }
    return gt, srs


# ----------------------------------------------------------------- BINTABLE

_TFORM_RE = re.compile(r"^(\d*)([LXBIJKAEDCMPQ])([A-Z]?)(?:\((\d+)\))?")

_ELEM_SIZE = {"L": 1, "X": 0, "B": 1, "I": 2, "J": 4, "K": 8, "A": 1,
              "E": 4, "D": 8, "C": 8, "M": 16}
_ELEM_DTYPE = {"L": ">i1", "B": ">u1", "I": ">i2", "J": ">i4", "K": ">i8",
               "E": ">f4", "D": ">f8", "C": ">c8", "M": ">c16"}


def _fmt_complex(z) -> str:
    return f"{float(z.real):.17g} + {float(z.imag):.17g}j"


def fits_table_schema(data: bytes, hdu_index: int | None = None):
    """Column descriptors for a BINTABLE HDU: list of dicts with
    GDAL-equivalent (name, ogr_type, subtype, width) plus decode info."""
    hdus = parse_fits(data)
    if hdu_index is None:
        cands = [i for i, h in enumerate(hdus) if h["kind"] == "bintable"]
        if not cands:
            raise ValueError("This FITS dataset does not contain any binary "
                             "table, but contains image(s) that could be "
                             "opened in raster mode.")
        hdu_index = cands[0] + 1
    h = hdus[hdu_index - 1]
    hdr = h["header"]
    ncols = int(hdr["TFIELDS"])
    cols = []
    byte_off = 0
    for i in range(1, ncols + 1):
        name = str(hdr.get(f"TTYPE{i}", f"col{i}")).rstrip()
        tform = str(hdr[f"TFORM{i}"]).strip()
        m = _TFORM_RE.match(tform)
        if not m:
            raise ValueError(f"FITS: bad TFORM {tform!r}")
        repeat = int(m.group(1)) if m.group(1) else 1
        tc = m.group(2)
        sub = m.group(3)
        scale = float(hdr.get(f"TSCAL{i}", 1.0))
        zero = float(hdr.get(f"TZERO{i}", 0.0))
        tnull = hdr.get(f"TNULL{i}")
        tdim = hdr.get(f"TDIM{i}")
        width = repeat
        if tc == "A" and tdim:
            dims = [int(x) for x in re.findall(r"\d+", str(tdim))]
            if dims:
                width = dims[0]
        nbytes = (repeat + 7) // 8 if tc == "X" else (
            (16 if tc == "Q" else 8) if tc in "PQ" else
            repeat * _ELEM_SIZE[tc])
        col = {"name": name, "tc": tc, "sub": sub, "repeat": repeat,
               "scale": scale, "zero": zero, "tnull": tnull,
               "byte_off": byte_off, "nbytes": nbytes, "width": width}
        byte_off += nbytes
        cols.append(col)
    if byte_off != int(hdr["NAXIS1"]):
        raise ValueError(
            f"FITS: row width {byte_off} != NAXIS1 {hdr['NAXIS1']}")
    return h, cols


def _ogr_field_defns(cols) -> list[tuple]:
    """(name, OFT type, OFST subtype, width) per fitsdataset.cpp:280-549."""
    out = []
    for c in cols:
        tc, sub = c["tc"], c["sub"]
        scale, zero, rep = c["scale"], c["zero"], c["repeat"]
        t, st, w = "OFTString", "OFSTNone", 0
        if tc == "L":
            t, st = "OFTInteger", "OFSTBoolean"
        elif tc == "X":
            for j in range(1, rep + 1):
                out.append((f"{c['name']}_bit{j}", "OFTInteger",
                            "OFSTNone", 0))
            continue
        elif tc == "B":
            t = ("OFTInteger" if (zero == -128 and scale == 1)
                 or (zero == 0 and scale == 1) else "OFTReal")
        elif tc == "I":
            if zero == 32768.0 and scale == 1:
                t = "OFTInteger"
            elif zero != 0 or scale != 1:
                t = "OFTReal"
            else:
                t, st = "OFTInteger", "OFSTInt16"
        elif tc == "J":
            if zero == 2147483648.0 and scale == 1:
                t = "OFTInteger64"
            elif zero != 0 or scale != 1:
                t = "OFTReal"
            else:
                t = "OFTInteger"
        elif tc == "K":
            t = "OFTReal" if (zero != 0 or scale != 1) else "OFTInteger64"
        elif tc == "A":
            if rep >= 2 * c["width"] and c["width"] != 0 and \
                    rep != c["width"]:
                t = "OFTStringList"
                w = c["width"]
            else:
                t, w = "OFTString", c["width"]
        elif tc == "E":
            t = "OFTReal"
            if zero == 0 and scale == 1:
                st = "OFSTFloat32"
        elif tc == "D":
            t = "OFTReal"
        elif tc in "CM":
            t = "OFTString"
        elif tc in "PQ":
            if sub == "L":
                t, st = "OFTIntegerList", "OFSTBoolean"
            elif sub in "BJ":
                t = "OFTIntegerList"
            elif sub == "I":
                t, st = "OFTIntegerList", "OFSTInt16"
            elif sub == "K":
                t = "OFTInteger64List"
            elif sub == "A":
                t = "OFTString"
            elif sub in "ED":
                t = "OFTRealList"
                if sub == "E" and zero == 0 and scale == 1:
                    st = "OFSTFloat32"
            elif sub in "CM":
                t = "OFTStringList"
            out.append((c["name"], t, st, w))
            continue
        if rep > 1 and tc != "A" and tc not in "PQ":
            t = {"OFTInteger": "OFTIntegerList",
                 "OFTInteger64": "OFTInteger64List",
                 "OFTReal": "OFTRealList",
                 "OFTString": "OFTStringList"}.get(t, t)
        out.append((c["name"], t, st, w))
    return out


def _decode_scalar_col(c, rows: np.ndarray, heap: bytes):
    """Decode one column across all rows -> list of python values
    (None for TNULL). ``rows`` is (nrows, NAXIS1) uint8."""
    tc = c["tc"]
    nrows = rows.shape[0]
    sl = rows[:, c["byte_off"]:c["byte_off"] + c["nbytes"]]
    scale, zero = c["scale"], c["zero"]

    def scaled(v):
        # cfitsio auto-scale: raw*scale+zero promoted to double
        if scale == 1 and zero == 0:
            return v
        return v.astype(np.float64) * scale + zero

    if tc == "L":
        # Conformance quirk: the reference compares cfitsio's binary
        # 1/0 logical output against the char '1'
        # (fitsdataset.cpp:702 ``x[0] == '1'``), so inline L columns
        # storing the standard 'T'/'F' bytes always yield 0; only
        # var-length heap logicals (raw 0x01 bytes) yield 1 — both
        # behaviors pinned by autotest gdrivers/fits.py expected_f1/f2.
        if c["repeat"] == 1:
            return [0] * nrows
        return [[0] * c["repeat"] for _ in range(nrows)]
    if tc == "X":
        raise AssertionError("bit cols handled separately")
    if tc in "PQ":
        dt = ">i8" if tc == "Q" else ">i4"
        desc = sl.copy().view(dt).reshape(nrows, 2)
        sub = c["sub"]
        out = []
        for n, off in desc:
            n, off = int(n), int(off)
            if sub == "L":
                out.append([1 if x == 1 else 0
                            for x in heap[off:off + n]])
            elif sub == "A":
                out.append(heap[off:off + n].decode("latin-1"))
            else:
                dt2 = _ELEM_DTYPE[sub]
                arr = np.frombuffer(heap, dt2, n, off)
                if sub in "CM":
                    out.append([_fmt_complex(complex(
                        z.real * scale + zero, z.imag * scale + zero))
                        if (scale != 1 or zero != 0)
                        else _fmt_complex(z) for z in arr])
                else:
                    arr = scaled(arr)
                    out.append([v.item() for v in arr])
        return out
    if tc == "A":
        rep, w = c["repeat"], c["width"]
        strs = [bytes(row).split(b"\x00")[0].decode("latin-1")
                for row in sl]
        if rep >= 2 * w and w != 0 and rep != w:
            n_items = rep // w
            return [[s[j * w:(j + 1) * w] for j in range(n_items)]
                    for s in (x.ljust(rep) for x in strs)]
        return strs
    dt = _ELEM_DTYPE[tc]
    arr = sl.copy().view(dt).reshape(nrows, c["repeat"])
    if tc in "CM":
        if scale != 1 or zero != 0:
            # cfitsio auto-scale applies TSCAL/TZERO to both the real
            # and imaginary components (autotest expected_f1 C_scaled)
            conv = [[_fmt_complex(complex(z.real * scale + zero,
                                          z.imag * scale + zero))
                     for z in row] for row in arr]
        else:
            conv = [[_fmt_complex(z) for z in row] for row in arr]
        return [r[0] for r in conv] if c["repeat"] == 1 else conv
    if tc == "B" and zero == -128 and scale == 1:
        arr = arr.astype(np.int16) - 128  # signed-byte convention
        scale_, zero_ = 1, 0
    elif tc == "I" and zero == 32768.0 and scale == 1:
        arr = arr.astype(np.int32) + 32768
        scale_, zero_ = 1, 0
    elif tc == "J" and zero == 2147483648.0 and scale == 1:
        arr = arr.astype(np.int64) + 2147483648
        scale_, zero_ = 1, 0
    else:
        scale_, zero_ = scale, zero
    if scale_ != 1 or zero_ != 0:
        arr = arr.astype(np.float64) * scale_ + zero_
        if tc in "BIJK":
            # The reference double-applies TSCAL/TZERO on scaled
            # integer columns: cfitsio auto-scales and clamps back to
            # the column dtype (rint + saturate), then ReadCol scales
            # again (fitsdataset.cpp:636-643) — pinned by autotest
            # expected_f1 B_scaled 5.5 / expected_f2 385.0.
            lo, hi = {"B": (0, 255), "I": (-2**15, 2**15 - 1),
                      "J": (-2**31, 2**31 - 1),
                      "K": (-2**63, 2**63 - 1)}[tc]
            arr = np.clip(np.rint(arr), lo, hi) * scale_ + zero_
    tnull = c["tnull"]
    out = []
    for row in arr:
        vals = [v.item() for v in row]
        if tnull is not None:
            vals = [None if v == tnull else v for v in vals]
        out.append(vals[0] if c["repeat"] == 1 else vals)
    return out


def read_fits_table(data: bytes, hdu_index: int | None = None):
    """Decode a BINTABLE HDU into (pyarrow.Table, field_defns, layer
    name). Field order, naming, typing and value formatting match the
    reference driver (verified against autotest
    gdrivers/fits.py::test_fits_vector)."""
    h, cols = fits_table_schema(data, hdu_index)
    hdr = h["header"]
    nrows = int(hdr["NAXIS2"])
    rowlen = int(hdr["NAXIS1"])
    rows = np.frombuffer(data, np.uint8, nrows * rowlen,
                         h["data_off"]).reshape(nrows, rowlen)
    theap = int(hdr.get("THEAP", nrows * rowlen))
    heap = data[h["data_off"] + theap:
                h["data_off"] + theap + int(hdr.get("PCOUNT", 0))]
    names, arrays = [], []
    for c in cols:
        if c["tc"] == "X":
            sl = rows[:, c["byte_off"]:c["byte_off"] + c["nbytes"]]
            bits = np.unpackbits(sl, axis=1)
            for j in range(c["repeat"]):
                names.append(f"{c['name']}_bit{j + 1}")
                arrays.append(pa.array(bits[:, j].astype(np.int32)))
            continue
        vals = _decode_scalar_col(c, rows, heap)
        names.append(c["name"])
        arrays.append(pa.array(vals))
    name = str(hdr.get("EXTNAME", "")).rstrip() or "Table"
    return pa.table(arrays, names=names), _ogr_field_defns(cols), name
