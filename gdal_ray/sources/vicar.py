"""JPL VICAR raster reader (reference frmts/pds/vicardataset.cpp). The
file opens with an ASCII label of space-separated KEY=VALUE items whose
total size is the leading LBLSIZE; the binary payload follows (NLB
binary-header records and NBB per-record binary prefixes skipped),
organised BSQ / BIL / BIP. FORMAT BYTE/HALF/FULL/REAL/DOUB/COMP with
INTFMT LOW|HIGH and REALFMT RIEEE (LE) | IEEE (BE) | VAX (D-floats via
exact bit conversion). Conformed against all 13 reference
read-datatype fixtures incl. the VAX encodings
(tests/test_planetary2.py)."""

from __future__ import annotations

import re

import numpy as np


def sniff_vicar(data: bytes) -> bool:
    return data[:8].replace(b" ", b"")[:8].startswith(b"LBLSIZE=")


def parse_vicar_label(text: str) -> dict:
    out = {}
    for m in re.finditer(
            r"(\w+)\s*=\s*('(?:[^']|'')*'|\([^)]*\)|[^\s]+)", text):
        v = m.group(2)
        if v.startswith("'") and v.endswith("'"):
            v = v[1:-1].replace("''", "'")
        out.setdefault(m.group(1).upper(), v)
    return out


def vax_to_float32(raw: np.ndarray) -> np.ndarray:
    """VAX F-float (word-swapped) -> float64 values, exact."""
    w = raw.reshape(-1, 2).astype(np.uint32)
    bits = (w[:, 0] << 16) | w[:, 1]
    sign = (bits >> 31) & 1
    exp = (bits >> 23) & 0xFF
    frac = bits & 0x7FFFFF
    val = (0.5 + frac.astype(np.float64) / (1 << 24)) * \
        np.power(2.0, exp.astype(np.float64) - 128.0)
    val[exp == 0] = 0.0
    return np.where(sign == 1, -val, val)


def vax_to_float64(raw: np.ndarray) -> np.ndarray:
    """VAX D-float (4 word-swapped 16-bit words) -> float64."""
    w = raw.reshape(-1, 4).astype(np.uint64)
    bits = (w[:, 0] << 48) | (w[:, 1] << 32) | (w[:, 2] << 16) | w[:, 3]
    sign = (bits >> 63) & 1
    exp = (bits >> 55) & 0xFF
    frac = bits & ((np.uint64(1) << np.uint64(55)) - np.uint64(1))
    val = (0.5 + frac.astype(np.float64) / float(1 << 56)) * \
        np.power(2.0, exp.astype(np.float64) - 128.0)
    val[exp == 0] = 0.0
    return np.where(sign == 1, -val, val)


def read_vicar(data: bytes):
    """-> (pixels (h, w[, bands or 2 for complex]), gt | None, label)."""
    if not sniff_vicar(data):
        raise ValueError("not a VICAR file")
    m = re.match(rb"\s*LBLSIZE\s*=\s*(\d+)", data)
    lblsize = int(m.group(1))
    lbl = parse_vicar_label(data[:lblsize].decode("latin-1", "replace"))
    nl = int(lbl["NL"])
    ns = int(lbl["NS"])
    nb = int(lbl.get("NB", "1"))
    org = lbl.get("ORG", "BSQ").upper()
    fmt = lbl.get("FORMAT", "BYTE").upper()
    intfmt = lbl.get("INTFMT", "LOW").upper()
    realfmt = lbl.get("REALFMT", "RIEEE").upper()
    nbb = int(lbl.get("NBB", "0"))
    nlb = int(lbl.get("NLB", "0"))
    recsize = int(lbl["RECSIZE"])

    iorder = "<" if intfmt == "LOW" else ">"
    rorder = "<" if realfmt == "RIEEE" else ">"
    vax = realfmt == "VAX"
    if fmt == "BYTE":
        dt, unit = np.dtype("u1"), 1
    elif fmt == "HALF":
        dt, unit = np.dtype(iorder + "i2"), 1
    elif fmt == "FULL":
        dt, unit = np.dtype(iorder + "i4"), 1
    elif fmt == "REAL":
        dt, unit = (np.dtype("<u2"), 2) if vax else \
            (np.dtype(rorder + "f4"), 1)
    elif fmt == "DOUB":
        dt, unit = (np.dtype("<u2"), 4) if vax else \
            (np.dtype(rorder + "f8"), 1)
    elif fmt == "COMP":
        dt, unit = (np.dtype("<u2"), 4) if vax else \
            (np.dtype(rorder + "f4"), 2)
    else:
        raise NotImplementedError(f"VICAR FORMAT {fmt}")

    if org == "BSQ":
        nrec = nl * nb
        per_rec = ns
    elif org == "BIL":
        nrec = nl * nb
        per_rec = ns
    elif org == "BIP":
        nrec = nl * ns  # one record per pixel (N1 = NB)
        per_rec = nb
    else:
        raise NotImplementedError(f"VICAR ORG {org}")
    start = lblsize + nlb * recsize
    need = start + nrec * recsize
    buf = data[start:need]
    buf = buf + b"\x00" * (need - start - len(buf))
    recs = np.frombuffer(buf, np.uint8).reshape(nrec, recsize)
    body = np.ascontiguousarray(recs[:, nbb:nbb + per_rec * unit
                                     * dt.itemsize])
    vals = body.reshape(-1).view(dt)

    if vax:
        if fmt == "REAL":
            vals = vax_to_float32(vals).astype(np.float32)
            comp = 1
        elif fmt == "DOUB":
            vals = vax_to_float64(vals)
            comp = 1
        else:  # COMP: pairs of F-floats
            vals = vax_to_float32(vals).astype(np.float32)
            comp = 2
    else:
        comp = 2 if fmt == "COMP" else 1

    if org == "BSQ":
        px = vals.reshape(nb, nl, ns * comp)
        px = np.transpose(px, (1, 2, 0))
    elif org == "BIL":
        px = vals.reshape(nl, nb, ns * comp)
        px = np.transpose(px, (0, 2, 1))
    else:  # BIP
        px = vals.reshape(nl, ns, nb * comp)
    if nb == 1 and px.ndim == 3 and px.shape[2] == 1:
        px = px[:, :, 0]
    if comp == 2 and px.ndim == 2:
        pass  # complex kept interleaved along x (ns*2 wide)

    gt = None
    if "MAP_SCALE" in lbl and "SAMPLE_PROJECTION_OFFSET" in lbl:
        scale = float(np.float32(float(lbl["MAP_SCALE"]))) * 1000.0
        so = float(lbl["SAMPLE_PROJECTION_OFFSET"]) - 0.5
        lo = float(lbl["LINE_PROJECTION_OFFSET"]) - 0.5
        gt = (-so * scale, scale, 0.0, lo * scale, 0.0, -scale)
    return np.ascontiguousarray(px), gt, lbl
