"""ENVISAT (ESA) product reader — MER/ASA/ATS record products.

Re-derivation of frmts/envisat (EnvisatFile.c + envisatdataset.cpp):

- MPH = 1247 bytes of KEY=value lines (EnvisatFile.c:79), SPH_SIZE
  from the MPH, SPH key/values up to the first "DS_NAME", then
  NUM_DSD descriptors of DSD_SIZE bytes each carrying
  DS_NAME/DS_TYPE/FILENAME/DS_OFFSET/DS_SIZE/NUM_DSR/DSR_SIZE
  (EnvisatFile.c:322-400); quoted values are unquoted, numeric values
  parse through their +0000 padding and trailing <units>;
- raster shape: first DS_TYPE=M dataset is the reference; width =
  SPH LINE_LENGTH, height = NUM_DSR; pixel type from SPH
  DATA_TYPE/SAMPLE_TYPE (FLT32[/COMPLEX] / UWORD / SWORD[/COMPLEX]),
  ATS_TOA_1 fallback (dsr_size-20)/2 int16, else the
  dsr_size >= 2*width UInt16-vs-Byte guess
  (envisatdataset.cpp:926-965); per-record prefix =
  dsr_size - itemsize*width; samples big-endian;
- every M dataset with the same NUM_DSR becomes a band, in DSD order
  (envisatdataset.cpp:995-1010); the MERIS level-2 MDS(16)/MDS(19)
  flags sub-band split is NOT implemented (documented subset);
- MERIS "Tie points ADS" GCPs: DSR = 13-byte header + u32be arrays
  of nTPPerLine values in slots [lat, lon, .., .., latCorr, lonCorr]
  with dsr_size = 50*n+13 (full) or 8*n+13 (browse, no corrections),
  scaled 1e-6, pixel = i*SAMPLES_PER_TIE_PT + 0.5, line = 0.5 +
  record*LINES_PER_TIE_PT (envisatdataset.cpp:404-580; the
  time-matched ADSRange subset is simplified to the aligned case);
- MPH_/SPH_-prefixed metadata like
  EnvisatDataset::CollectMetadata.
"""
from __future__ import annotations

import re

import numpy as np

MPH_SIZE = 1247


def _parse_kv(text: str) -> dict[str, str]:
    kv: dict[str, str] = {}
    for line in text.split("\n"):
        if "=" not in line:
            continue
        key, _, val = line.partition("=")
        key = key.strip()
        if not key:
            continue
        val = val.strip()
        if val.startswith('"'):
            val = val[1:]
            if val.endswith('"'):
                val = val[:-1]
        kv.setdefault(key, val)
    return kv


def _as_int(val: str, default: int = 0) -> int:
    m = re.match(r"\s*([+-]?\d+)", val or "")
    return int(m.group(1)) if m else default


class EnvisatProduct:
    def __init__(self, data: bytes):
        if len(data) < MPH_SIZE:
            raise ValueError("ENVISAT: file shorter than the MPH")
        head = data[:MPH_SIZE].decode("latin-1")
        if not head.startswith("PRODUCT="):
            raise ValueError("ENVISAT: missing PRODUCT= in MPH")
        self.data = data
        self.mph = _parse_kv(head)
        sph_size = _as_int(self.mph.get("SPH_SIZE", "0"))
        if sph_size <= 0:
            raise ValueError("ENVISAT: SPH_SIZE not set, or zero")
        sph_data = data[MPH_SIZE:MPH_SIZE + sph_size].decode("latin-1")
        ds_at = sph_data.find("DS_NAME")
        self.sph = _parse_kv(sph_data if ds_at < 0 else sph_data[:ds_at])
        self.dsds = []
        num_dsd = _as_int(self.mph.get("NUM_DSD", "0"))
        dsd_size = _as_int(self.mph.get("DSD_SIZE", "0"))
        if ds_at >= 0 and dsd_size > 0:
            for i in range(num_dsd):
                chunk = sph_data[ds_at + i * dsd_size:
                                 ds_at + (i + 1) * dsd_size]
                if "DS_NAME" not in chunk:
                    continue   # spare DSD
                d = _parse_kv(chunk)
                self.dsds.append({
                    "name": d.get("DS_NAME", "").rstrip(),
                    "type": d.get("DS_TYPE", ""),
                    "offset": _as_int(d.get("DS_OFFSET", "0")),
                    "size": _as_int(d.get("DS_SIZE", "0")),
                    "num_dsr": _as_int(d.get("NUM_DSR", "0")),
                    "dsr_size": _as_int(d.get("DSR_SIZE", "0"))})

    def dataset(self, name: str) -> dict | None:
        want = name.rstrip()
        for d in self.dsds:
            if d["name"][:len(want)] == want or want[:len(d["name"])] \
                    == d["name"]:
                return d
        return None


def read_envisat(data: bytes) -> dict:
    prod = EnvisatProduct(data)
    ref = next((d for d in prod.dsds if d["type"] == "M"), None)
    if ref is None:
        raise ValueError("ENVISAT: no measurement (M) dataset")
    product = prod.mph.get("PRODUCT", "")
    width = _as_int(prod.sph.get("LINE_LENGTH", "0"))
    height = ref["num_dsr"]
    data_type = prod.sph.get("DATA_TYPE", "")
    sample_type = prod.sph.get("SAMPLE_TYPE", "")
    dsr_size = ref["dsr_size"]

    if data_type == "FLT32" and sample_type.upper().startswith("COMPLEX"):
        dt, cplx = np.dtype(">f4"), True
    elif data_type == "FLT32":
        dt, cplx = np.dtype(">f4"), False
    elif data_type == "UWORD":
        dt, cplx = np.dtype(">u2"), False
    elif data_type == "SWORD" and sample_type.upper().startswith("COMPLEX"):
        dt, cplx = np.dtype(">i2"), True
    elif data_type == "SWORD":
        dt, cplx = np.dtype(">i2"), False
    elif product.startswith("ATS_TOA_1"):
        dt, cplx = np.dtype(">i2"), False
        width = (dsr_size - 20) // 2
    elif width == 0:
        dt, cplx = np.dtype("u1"), False
        width = dsr_size
    else:
        dt = np.dtype(">u2") if dsr_size >= 2 * width else np.dtype("u1")
        cplx = False
    if width < 1 or height < 1:
        raise ValueError("ENVISAT: unable to determine dataset shape")

    ncomp = 2 if cplx else 1
    prefix = dsr_size - dt.itemsize * ncomp * width

    bands, names = [], []
    for d in prod.dsds:
        # envisatdataset.cpp only collects measurement datasets whose
        # record size matches the reference dataset's (dsr_size2 ==
        # dsr_size); heterogeneous products would otherwise gain
        # misaligned bands built with the wrong prefix/width.
        if (d["type"] != "M" or d["num_dsr"] != height
                or d["dsr_size"] != dsr_size):
            continue
        rows = np.frombuffer(
            data, np.uint8, count=height * d["dsr_size"],
            offset=d["offset"]).reshape(height, d["dsr_size"])
        samp = rows[:, prefix:prefix + dt.itemsize * ncomp * width]
        arr = np.frombuffer(samp.tobytes(), dt).reshape(height,
                                                        width * ncomp)
        if cplx:
            arr = (arr[:, 0::2].astype(np.float32) +
                   1j * arr[:, 1::2].astype(np.float32))
        else:
            arr = arr.astype(dt.newbyteorder("="))
        bands.append(arr)
        names.append(d["name"])

    md = {f"MPH_{k}": v for k, v in prod.mph.items()}
    md.update({f"SPH_{k}": v for k, v in prod.sph.items()})

    gcps = _meris_tiepoint_gcps(prod, data, width, height)
    px = bands[0] if len(bands) == 1 else np.stack(bands, axis=2)
    return {"pixels": px, "gt": None, "epsg": None, "driver": "ESAT",
            "band_names": names, "metadata": md, "gcps": gcps,
            "gcp_epsg": 4326 if gcps else None}


def _meris_tiepoint_gcps(prod: EnvisatProduct, data: bytes,
                         width: int, height: int) -> list[dict]:
    tp = prod.dataset("Tie points ADS")
    if tp is None or tp["num_dsr"] == 0:
        return []
    lines_per = _as_int(prod.sph.get("LINES_PER_TIE_PT", "0"))
    samples_per = _as_int(prod.sph.get("SAMPLES_PER_TIE_PT", "0"))
    if not lines_per or not samples_per:
        return []
    n_line = -(-width // samples_per)
    dsr_size = tp["dsr_size"]
    if dsr_size == 50 * n_line + 13:
        browse = False
    elif dsr_size == 8 * n_line + 13:
        browse = True
    else:
        return []
    gcps = []
    for ir in range(tp["num_dsr"]):
        rec = data[tp["offset"] + ir * dsr_size + 13:
                   tp["offset"] + (ir + 1) * dsr_size]
        arr = np.frombuffer(rec[:4 * 6 * n_line] if not browse
                            else rec[:4 * 2 * n_line], ">i4")
        lat = arr[0 * n_line:1 * n_line].astype(np.float64) * 1e-6
        lon = arr[1 * n_line:2 * n_line].astype(np.float64) * 1e-6
        if not browse:
            lat = lat + arr[4 * n_line:5 * n_line] * 1e-6
            lon = lon + arr[5 * n_line:6 * n_line] * 1e-6
        line = 0.5 + ir * lines_per
        for i in range(n_line):
            gcps.append({"id": str(len(gcps) + 1),
                         "pixel": i * samples_per + 0.5, "line": line,
                         "x": float(lon[i]), "y": float(lat[i]),
                         "z": 0.0})
    return gcps


# ------------------------------------------------------------------ writer
def write_envisat(bands: list[np.ndarray], product: str = "MER_RR__2P",
                  data_type: str = "UWORD",
                  tiepoints: dict | None = None,
                  extra_m_dsr_size: int | None = None) -> bytes:
    """Synthesize a minimal-but-conformant ENVISAT product (tests).

    extra_m_dsr_size appends a type-M dataset with the same num_dsr
    but a different record size — a heterogeneous product that the
    reference's dsr_size2==dsr_size gate must exclude from bands."""
    h, w = bands[0].shape
    dt = {"UWORD": np.dtype(">u2"), "SWORD": np.dtype(">i2"),
          "FLT32": np.dtype(">f4")}[data_type]
    prefix = 13
    dsr_size = prefix + dt.itemsize * w
    dsd_size = 280
    dsds = []
    n_tp_line = 0
    tp_dsr = 0
    if tiepoints:
        n_tp_line = -(-w // tiepoints["samples_per"])
        tp_dsr = 50 * n_tp_line + 13
        dsds.append(("Tie points ADS", "A", tiepoints["num_dsr"], tp_dsr))
    for i in range(len(bands)):
        dsds.append((f"Radiance MDS({i + 1})", "M", h, dsr_size))
    if extra_m_dsr_size is not None:
        dsds.append(("Odd-size MDS", "M", h, extra_m_dsr_size))
    num_dsd = len(dsds)

    sph_head = (f'SPH_DESCRIPTOR="{product} SPH                   "\n'
                f"LINE_LENGTH=+{w:010d}<samples>\n"
                f"DATA_TYPE={data_type}\n"
                f'SAMPLE_TYPE=DETECTED\n')
    if tiepoints:
        sph_head += (f"LINES_PER_TIE_PT=+{tiepoints['lines_per']:04d}\n"
                     f"SAMPLES_PER_TIE_PT=+{tiepoints['samples_per']:04d}\n")
    sph_size = len(sph_head) + num_dsd * dsd_size
    total_header = MPH_SIZE + sph_size
    offset = total_header
    dsd_text = ""
    offsets = []
    for name, typ, num, size in dsds:
        offsets.append(offset)
        ent = (f'DS_NAME="{name:<28s}"\n'
               f"DS_TYPE={typ}\n"
               f'FILENAME=""\n'
               f"DS_OFFSET=+{offset:020d}<bytes>\n"
               f"DS_SIZE=+{num * size:020d}<bytes>\n"
               f"NUM_DSR=+{num:010d}\n"
               f"DSR_SIZE=+{size:010d}<bytes>\n")
        dsd_text += ent.ljust(dsd_size, " ")
        offset += num * size
    sph = (sph_head + dsd_text).encode("latin-1")
    assert len(sph) == sph_size

    mph = (f'PRODUCT="{product:<62s}"\n'
           f"SPH_SIZE=+{sph_size:010d}<bytes>\n"
           f"NUM_DSD=+{num_dsd:010d}\n"
           f"DSD_SIZE=+{dsd_size:010d}<bytes>\n")
    mph = mph.ljust(MPH_SIZE, " ").encode("latin-1")

    body = b""
    if tiepoints:
        for ir in range(tiepoints["num_dsr"]):
            rec = bytearray(tp_dsr)
            arr = np.zeros(6 * n_tp_line, ">i4")
            arr[0:n_tp_line] = (np.asarray(
                tiepoints["lat"][ir]) * 1e6).round()
            arr[n_tp_line:2 * n_tp_line] = (np.asarray(
                tiepoints["lon"][ir]) * 1e6).round()
            rec[13:13 + 24 * n_tp_line] = arr.tobytes()
            body += bytes(rec)
    for b in bands:
        rows = b""
        for y in range(h):
            rows += b"\x00" * prefix + b[y].astype(dt).tobytes()
        body += rows
    if extra_m_dsr_size is not None:
        body += b"\x00" * (h * extra_m_dsr_size)
    return mph + sph + body
