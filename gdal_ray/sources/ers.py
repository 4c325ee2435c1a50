"""ERMapper ERS raster driver (reference frmts/ers/ersdataset.cpp +
ershdrnode.cpp). An .ers file is a hierarchical ASCII header
(`DatasetHeader Begin ... End`, # comments, quoted strings, `{ }`
multi-line values) describing a raw BIL binary file that lives next to
it (same path minus the .ers suffix, or the DataFile keyword).
Conformed against the reference's own fixtures: srtm.ers 64074 with
statistics metadata, ers_dem.ers 56588 with HeaderOffset 512, 8s.ers
Signed8BitInteger, caseinsensitive.ers (tests/test_ers_fits.py)."""

from __future__ import annotations

import os
import re

import numpy as np

_CELLTYPES = {
    "unsigned8bitinteger": "u1",
    "signed8bitinteger": "i1",
    "unsigned16bitinteger": "u2",
    "signed16bitinteger": "i2",
    "unsigned32bitinteger": "u4",
    "signed32bitinteger": "i4",
    "ieee4bytereal": "f4",
    "ieee8bytereal": "f8",
}


def sniff_ers(data: bytes) -> bool:
    head = data[:4096].lstrip()
    while head.startswith(b"#"):  # leading comment lines
        nl = head.find(b"\n")
        if nl < 0:
            return False
        head = head[nl + 1:].lstrip()
    return head[:13].lower() == b"datasetheader"


def _strip_comment(line: str) -> str:
    out, q = [], False
    for c in line:
        if c == '"':
            q = not q
        if c == "#" and not q:
            break
        out.append(c)
    return "".join(out)


def parse_ers_header(text: str) -> dict:
    """Flatten the Begin/End tree into lower-cased dotted keys; repeated
    keys (BandId) keep the first occurrence plus a count."""
    # fold { ... } multi-line values onto one line, stripping comments
    # line by line first (srtm.ers has "# comment in brackets")
    def fold(m: re.Match) -> str:
        kept = " ".join(
            " ".join(_strip_comment(ln).split())
            for ln in m.group(1).splitlines())
        return '"' + kept.strip() + '"'

    text = re.sub(r"\{([^}]*)\}", fold, text, flags=re.S)
    stack: list[str] = []
    out: dict[str, str] = {}
    counts: dict[str, int] = {}
    for raw in text.splitlines():
        line = _strip_comment(raw).strip()
        if not line:
            continue
        m = re.match(r"^(\w+)\s+Begin$", line, re.I)
        if m:
            stack.append(m.group(1).lower())
            key = ".".join(stack)
            counts[key] = counts.get(key, 0) + 1
            continue
        m = re.match(r"^(\w+)\s+End$", line, re.I)
        if m:
            if stack:
                stack.pop()
            continue
        m = re.match(r"^([\w.]+)\s*=\s*(.*)$", line)
        if m:
            key = ".".join(stack + [m.group(1).lower()])
            val = m.group(2).strip().strip('"')
            if key not in out:
                out[key] = val
    out["_counts"] = counts  # type: ignore[assignment]
    return out


def _dms(v: str) -> float:
    parts = v.split(":")
    if len(parts) == 1:
        return float(v)
    sign = -1.0 if parts[0].lstrip().startswith("-") else 1.0
    d = abs(float(parts[0]))
    mn = float(parts[1]) if len(parts) > 1 else 0.0
    s = float(parts[2]) if len(parts) > 2 else 0.0
    return sign * (d + mn / 60.0 + s / 3600.0)


def read_ers(path: str):
    """-> (pixels (h, w) or (h, w, bands), gt | None, meta dict)."""
    with open(path, "rb") as fh:
        raw = fh.read()
    if not sniff_ers(raw):
        raise ValueError(f"{path}: not an ERS header")
    hdr = parse_ers_header(raw.decode("latin-1"))
    pre = "datasetheader.rasterinfo."
    w = int(hdr[pre + "nrofcellsperline"])
    h = int(hdr[pre + "nroflines"])
    nb = int(hdr.get(pre + "nrofbands", "1"))
    ct = hdr.get(pre + "celltype", "Unsigned8BitInteger").lower()
    if ct not in _CELLTYPES:
        raise NotImplementedError(f"ERS CellType {ct}")
    bo = "<" if hdr.get("datasetheader.byteorder",
                        "LSBFirst").lower() == "lsbfirst" else ">"
    dt = np.dtype(bo + _CELLTYPES[ct])
    off = int(hdr.get("datasetheader.headeroffset", "0"))
    datafile = hdr.get(pre + "datafile")
    if datafile:
        dpath = os.path.join(os.path.dirname(path), datafile)
    else:
        dpath = path[:-4] if path.lower().endswith(".ers") else path
    with open(dpath, "rb") as fh:
        fh.seek(off)
        buf = fh.read(w * h * nb * dt.itemsize)
    need = w * h * nb * dt.itemsize
    buf = buf + b"\x00" * (need - len(buf))
    px = np.frombuffer(buf, dt).reshape(h, nb, w)  # BIL
    px = np.ascontiguousarray(np.transpose(px, (0, 2, 1)))
    if nb == 1:
        px = px[:, :, 0]

    gt = None
    xd = hdr.get(pre + "cellinfo.xdimension")
    yd = hdr.get(pre + "cellinfo.ydimension")
    rc = pre + "registrationcoord."
    if xd and yd:
        xdf, ydf = float(xd), float(yd)
        regx = float(hdr.get(pre + "registrationcellx", "0"))
        regy = float(hdr.get(pre + "registrationcelly", "0"))
        if rc + "eastings" in hdr:
            x0 = float(hdr[rc + "eastings"])
            y0 = float(hdr[rc + "northings"])
        elif rc + "longitude" in hdr:
            x0 = _dms(hdr[rc + "longitude"])
            y0 = _dms(hdr[rc + "latitude"])
        else:
            x0 = y0 = None
        if x0 is not None:
            gt = (x0 - regx * xdf, xdf, 0.0, y0 + regy * ydf, 0.0, -ydf)

    meta = {}
    stats = pre + "regioninfo.stats."
    for src, dst in (("minimumvalue", "STATISTICS_MINIMUM"),
                     ("maximumvalue", "STATISTICS_MAXIMUM"),
                     ("meanvalue", "STATISTICS_MEAN"),
                     ("medianvalue", "STATISTICS_MEDIAN")):
        if stats + src in hdr:
            meta[dst] = hdr[stats + src].strip()
    if pre + "nullcellvalue" in hdr:
        meta["nodata"] = float(hdr[pre + "nullcellvalue"])
    if "datasetheader.coordinatespace.projection" in hdr:
        meta["projection"] = hdr["datasetheader.coordinatespace.projection"]
        meta["datum"] = hdr.get("datasetheader.coordinatespace.datum", "")
    return px, gt, meta
