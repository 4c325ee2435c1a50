"""GDALOpen-style unified raster open: magic-probe the payload, then
assemble georeferencing from in-file tags or sidecar files.

Mirrors the reference's open path for the formats this engine codecs:

- GeoTIFF: geotransform from ModelTransformation / PixelScale+Tiepoint
  tags, EPSG from the GeoKey directory (sources/tiff.py).
- PNG / JPEG: pixels from the pure-python codecs, geotransform from an
  ESRI world file, CRS from a sidecar ``.prj``. World-file lookup
  follows GDALReadWorldFile (gcore/gdal_misc.cpp): first the
  "first+last letter of the extension + w" form (.pgw/.jgw), then
  ``.wld``; the six lines are (A, D, B, E, C, F) with C/F at the
  CENTER of the top-left pixel, shifted half a pixel to GDAL's
  corner-origin convention.
- ``.prj`` WKT: EPSG from the outermost AUTHORITY["EPSG", n] node
  (last in WKT1 text); bare "EPSG:n" accepted.

All paths go through VSI (vsi_open_bytes), so /vsimem/ and /vsizip/
sources work like plain files.
"""

from __future__ import annotations

import os
import re

import numpy as np

from ..functions.codecs import decode_image
from .tiff import decode_tiff, tiff_epsg
from .vsi import vsi_open_bytes


def worldfile_to_gt(text: str) -> tuple:
    """Six world-file lines (A, D, B, E, C, F) -> GDAL geotransform
    (corner-origin; C/F name the top-left pixel CENTER)."""
    # CPLAtof tolerance: trailing commas/semicolons on the six lines
    a, d, b, e, c, f = (float(v.rstrip(",;")) for v in text.split()[:6])
    return (c - a * 0.5 - b * 0.5, a, b, f - d * 0.5 - e * 0.5, d, e)


def gt_to_worldfile(gt) -> str:
    """Inverse of worldfile_to_gt (GDALWriteWorldFile layout)."""
    c = gt[0] + gt[1] * 0.5 + gt[2] * 0.5
    f = gt[3] + gt[4] * 0.5 + gt[5] * 0.5
    return "\n".join(repr(float(v)) for v in
                     (gt[1], gt[4], gt[2], gt[5], c, f)) + "\n"


def epsg_from_wkt(wkt: str) -> int | None:
    """Outermost AUTHORITY["EPSG", n] (the last one in WKT1 text), or
    a bare EPSG:n string."""
    m = re.match(r"\s*EPSG:(\d+)\s*$", wkt, re.I)
    if m:
        return int(m.group(1))
    hits = re.findall(r'AUTHORITY\s*\[\s*"EPSG"\s*,\s*"?(\d+)"?\s*\]',
                      wkt, re.I)
    hits += re.findall(r'ID\s*\[\s*"EPSG"\s*,\s*(\d+)\s*\]', wkt, re.I)
    return int(hits[-1]) if hits else None


def _sidecar(path: str, ext: str) -> str | None:
    for cand in (os.path.splitext(path)[0] + ext, path + ext):
        try:
            return vsi_open_bytes(cand).decode("ascii", "replace")
        except (FileNotFoundError, KeyError, IsADirectoryError):
            continue
    return None


def _worldfile(path: str) -> str | None:
    root, ext = os.path.splitext(path)
    cands = []
    if len(ext) >= 3:  # .png -> .pgw (first + last letter + 'w')
        cands.append(root + "." + ext[1] + ext[-1] + "w")
    cands.append(root + ".wld")
    for cand in cands:
        try:
            return vsi_open_bytes(cand).decode("ascii", "replace")
        except (FileNotFoundError, KeyError, IsADirectoryError):
            continue
    return None


def _hdf5_signature(data: bytes) -> bool:
    sig = b"\x89HDF\r\n\x1a\n"
    off = 0
    while off + 8 <= len(data) and off <= 65536:
        if data[off:off + 8] == sig:
            return True
        off = 512 if off == 0 else off * 2
    return False


def open_raster(path: str) -> dict:
    """-> {"pixels": ndarray, "gt": tuple | None, "epsg": int | None,
    "driver": str}. The GDALOpen analog for the engine's codecs."""
    from .asciigrid import read_aaigrid, read_xyz, sniff_aaigrid

    if path.startswith("FITS:"):
        # FITS:"filename":hdu subdataset syntax (fitsdataset.cpp:2480)
        from .fits import read_fits_image

        m = re.match(r'^FITS:"?([^"]+)"?:(\d+)$', path)
        if not m:
            raise ValueError(f"bad FITS subdataset name: {path}")
        return read_fits_image(vsi_open_bytes(m.group(1)),
                               int(m.group(2)))
    if path.startswith("HDF5:"):
        from .hdf5 import open_hdf5_raster

        return open_hdf5_raster(path)
    if path.startswith(("S102:", "S104:", "S111:")):
        from .s100 import read_s100

        return read_s100(path)
    if path.startswith("STACIT:"):
        from .stac import read_stacit

        return read_stacit(path)
    if path.startswith("RADARSAT_2_CALIB:"):
        from .radarsat import read_rs2

        return read_rs2(path)
    if path.startswith("RCM_CALIB:"):
        from .radarsat import read_rcm

        return read_rcm(path)
    if os.path.isdir(path) and (
            os.path.exists(os.path.join(path, "product.xml")) or
            os.path.exists(os.path.join(path, "metadata", "product.xml"))):
        from .radarsat import read_rcm

        return read_rcm(path)
    if path.lower().endswith(".cos"):
        from .cosar import read_cosar

        return read_cosar(vsi_open_bytes(path))
    if path.lower().endswith(".gff"):
        from .sar_formats import read_gff

        return read_gff(vsi_open_bytes(path))
    base_up = os.path.basename(path).upper()
    if base_up.startswith("VOL-ALPSR"):
        from .sar_formats import read_palsar

        return read_palsar(path)
    if os.path.isfile(path):
        with open(path, "rb") as _f:
            _magic = _f.read(22)
        if _magic == b"RECORD LENGTH IN BYTES":
            from .sar_formats import read_airsar

            return read_airsar(vsi_open_bytes(path))
        if _magic.startswith(b'PRODUCT="') or \
                path.lower().endswith(".n1"):
            from .envisat import read_envisat

            return read_envisat(vsi_open_bytes(path))
        if path.lower().endswith(".rik") or _magic[:4] == b"RIK3":
            from .rik import read_rik

            return read_rik(vsi_open_bytes(path))
        if len(_magic) >= 12 and tuple(_magic[4:8]) in (
                (63, 192, 18, 18), (50, 192, 18, 18)):
            from .sar_ceos import read_sar_ceos

            return read_sar_ceos(path)
        if _magic.startswith(b"FormatName"):
            from .msgn import read_msgn

            return read_msgn(vsi_open_bytes(path))
    if path.lower().endswith(".hdr") and os.path.exists(path) and \
            open(path, "rb").read(18) == b"time_first_datarec":
        from .sar_formats import read_coasp

        return read_coasp(path)
    from .cosar import is_tsx

    if is_tsx(path) and (os.path.isdir(path) or
                         path.lower().endswith(".xml")):
        from .cosar import read_tsx

        return read_tsx(path)
    if path.lower().endswith(".kmz") or (
            path.lower().endswith(".kml") and os.path.exists(path) and
            b"hideChildrenStyle" in open(path, "rb").read(4096)):
        from .kmlsuperoverlay import read_superoverlay

        rd = read_superoverlay(path)
        north, south, east, west = rd["geo"]
        h, w = rd["pixels"].shape[1:]
        gt = (west, (east - west) / w, 0.0, north, 0.0, (south - north) / h)
        return {"pixels": rd["pixels"], "gt": gt, "epsg": 4326,
                "driver": "KMLSUPEROVERLAY",
                "overviews": rd["overviews"]}
    if path.startswith("RASTERLITE2:"):
        # RASTERLITE2:path:coverage[:section_id:section_name]
        # (rasterlite2.cpp subdataset naming, rl2.py test_rl2_3/5)
        from .rasterlite2 import read_rl2

        parts = path.split(":")
        cov = parts[2] if len(parts) > 2 else None
        sid = int(parts[3]) if len(parts) > 4 else None
        return read_rl2(parts[1], coverage=cov, section_id=sid)
    if path.startswith("SNAP_TIFF:"):
        # SNAP_TIFF:"file":{MAIN|GEOLOCATION} (snaptiffdriver.cpp:17)
        from .snap_tiff import read_snap_tiff, snap_geoloc_arrays

        m = re.match(r'^SNAP_TIFF:"?([^"]+)"?:(\w+)$', path)
        if not m:
            raise ValueError(f"bad SNAP_TIFF subdataset name: {path}")
        if m.group(2) == "GEOLOCATION":
            lon, lat = snap_geoloc_arrays(m.group(1))
            return {"pixels": np.stack([lon, lat]), "gt": None,
                    "epsg": None, "driver": "SNAP_TIFF"}
        info = read_snap_tiff(m.group(1))
        info["driver"] = "SNAP_TIFF"
        return info
    data = vsi_open_bytes(path)
    if path.startswith("SENTINEL2_L1C:"):
        from .sentinel2 import read_sentinel2_subdataset

        return read_sentinel2_subdataset(path)
    if path.endswith(".xml") and b"Level-1C_User_Product" in data[:2048]:
        from .sentinel2 import sentinel2_subdatasets

        subs = sentinel2_subdatasets(path)
        raise ValueError(
            f"{path}: SENTINEL2 L1C product — open one of the "
            f"{len(subs)} subdatasets: {[s[0] for s in subs]}")
    if path.endswith("product.xml") and data[:6] == b"<?xml ":
        if b"rcmGsProductSchema" in data[:2048]:
            from .radarsat import read_rcm

            return read_rcm(path)
        if b"fullResolutionImageData" in data:
            from .radarsat import read_rs2

            return read_rs2(path)
    if data[:1] in (b"{", b" ", b"\n") and b'"stac_version"' in data[:4096]:
        head = data[:4096]
        if b"tiles:tile_matrix" in data or b"asset_templates" in data:
            from .stac import read_stacta

            return read_stacta(path)
        if b'"FeatureCollection"' in head:
            from .stac import read_stacit

            return read_stacit(path)
    if _hdf5_signature(data):
        from .s100 import s100_product

        if s100_product(path):  # S-102/S-104/S-111 take precedence
            from .s100 import read_s100

            return read_s100(path)
        from .hdf5 import open_hdf5_raster

        return open_hdf5_raster(path, data=data)
    if data[:4] == b"\x0e\x03\x13\x01":
        from .hdf4 import read_hdf4

        return read_hdf4(data)
    if data[:3] == b"CDF" and data[3:4] in (b"\x01", b"\x02", b"\x05"):
        from .netcdf import raster_from_nc

        px, gt = raster_from_nc(data)
        prj = _sidecar(path, ".prj")
        return {"pixels": np.asarray(px), "gt": gt,
                "epsg": epsg_from_wkt(prj) if prj else None,
                "driver": "netCDF"}
    if data[:1] == b"P" and data[1:2] in b"23456" and data[2:3].isspace():
        from .pnm import decode_pnm

        px = decode_pnm(data)
        wf = _worldfile(path)
        return {"pixels": px, "gt": worldfile_to_gt(wf) if wf else None,
                "epsg": None, "driver": "PNM"}
    if data[:5] == b"%PDF-":
        from .pdf import read_pdf

        return read_pdf(data)
    if data[:4] == b"\x76\x2f\x31\x01":
        from .exr import read_exr

        return read_exr(data)
    if data[:4] in (b"NITF", b"NSIF"):
        from .nitf import decode_nitf

        px, gt, meta = decode_nitf(data)
        if gt is None:
            wf = _worldfile(path)
            gt = worldfile_to_gt(wf) if wf else None
        prj = _sidecar(path, ".prj")
        epsg = epsg_from_wkt(prj) if prj else (
            4326 if meta.get("icords") == "G" else None)
        return {"pixels": px, "gt": gt, "epsg": epsg,
                "driver": "NITF", "nitf_meta": meta}
    if data[:15] == b"EHFA_HEADER_TAG":
        from .hfa import decode_hfa

        ige_path = os.path.splitext(path)[0] + ".ige"
        ige = None
        if os.path.exists(ige_path):
            with open(ige_path, "rb") as fh:
                ige = fh.read()
        px, gt, meta = decode_hfa(data, ige=ige)
        if gt is None:
            wf = _worldfile(path)
            gt = worldfile_to_gt(wf) if wf else None
        prj = _sidecar(path, ".prj")
        out = {"pixels": px, "gt": gt,
               "epsg": epsg_from_wkt(prj) if prj else None,
               "driver": "HFA", "hfa_meta": meta}
        from .hfa import read_hfa_rat

        rat = read_hfa_rat(data)
        if rat is not None:
            out["rat"] = rat.to_arrow()
        return out
    if (data[:12] == b"\x00\x00\x00\x0cjP  \r\n\x87\n"
            or data[:2] == b"\xff\x4f"):
        import struct as _struct

        from ..functions.jp2k import decode_jp2

        px, _info = decode_jp2(data)
        gt = None
        epsg = None
        # GeoJP2: the uuid box payload is a degenerate GeoTIFF whose
        # tags georeference the codestream (gt_wkt_srs.cpp semantics)
        pos = 0
        while pos + 8 <= len(data):
            ln, typ = _struct.unpack_from(">I4s", data, pos)
            # ISO 15444-1 box framing: LBox==1 -> a 64-bit XLBox
            # length follows the type; LBox==0 -> box runs to EOF
            hdr = 8
            if ln == 1:
                if pos + 16 > len(data):
                    break
                ln = _struct.unpack_from(">Q", data, pos + 8)[0]
                hdr = 16
            elif ln == 0:
                ln = len(data) - pos
            if typ == b"uuid" and data[pos + hdr:pos + hdr + 16].startswith(
                    b"\xb1\x4b\xf8\xbd\x08\x3d\x4b\x43"):
                payload = data[pos + hdr + 16:pos + ln]
                try:
                    gt = decode_tiff(payload)[1]
                    epsg = tiff_epsg(payload)
                except (ValueError, KeyError, NotImplementedError):
                    pass
                break
            if ln < hdr:
                break
            pos += ln
        if gt is None:
            for ext in (".j2w", ".wld"):
                wf = _sidecar(path, ext)
                if wf:
                    gt = worldfile_to_gt(wf)
                    break
        prj = _sidecar(path, ".prj")
        if epsg is None and prj:
            epsg = epsg_from_wkt(prj)
        return {"pixels": px, "gt": gt, "epsg": epsg,
                "driver": "JP2OpenJPEG"}
    if data[:4] == b"GRIB":
        if len(data) > 7 and data[7] == 2:
            from .grib2 import read_grib2

            fields = [f for f in read_grib2(data)
                      if f["values"] is not None]
            if not fields:
                raise ValueError(f"{path}: no decodable GRIB2 field")
            bands = [f["values"] for f in fields]
            px = bands[0] if len(bands) == 1 else \
                np.stack(bands, axis=2)
            f0 = fields[0]
            epsg = 4326 if (f0["proj"] or {}).get("kind") == "latlon" \
                else None
            out = {"pixels": px, "gt": f0["gt"], "epsg": epsg,
                   "driver": "GRIB",
                   "band_meta": [f["meta"] for f in fields]}
            if f0["proj"]:
                out["grib_proj"] = f0["proj"]
            if "nodata" in f0["meta"]:
                out["nodata"] = f0["meta"]["nodata"]
            return out
        from .grib1 import read_grib1

        bands, gt, metas = read_grib1(data)
        px = bands[0] if len(bands) == 1 else np.stack(bands, axis=2)
        return {"pixels": px, "gt": gt, "epsg": 4326, "driver": "GRIB",
                "band_meta": metas}
    if data[:3] == b"UHL":
        from .terrain import read_dted

        px, gt = read_dted(data)
        return {"pixels": px, "gt": gt, "epsg": 4326, "driver": "DTED"}
    if path.lower().endswith(".hgt"):
        from .terrain import read_srtmhgt

        px, gt = read_srtmhgt(data, os.path.basename(path))
        return {"pixels": px, "gt": gt, "epsg": 4326, "driver": "SRTMHGT"}
    if path.lower().endswith(".sdat"):
        from .terrain import read_saga

        sgrd = _sidecar(path, ".sgrd")
        if sgrd is None:
            raise FileNotFoundError(f"{path}: no .sgrd header")
        px, gt, _nodata = read_saga(sgrd, data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "SAGA"}
    if data[:1] == b"#":
        from .heightfield import read_gxf, sniff_gxf

        if sniff_gxf(data):
            px, gt, nodata = read_gxf(data)
            prj = _sidecar(path, ".prj")
            return {"pixels": px, "gt": gt,
                    "epsg": epsg_from_wkt(prj) if prj else None,
                    "driver": "GXF", "nodata": nodata}
    from .heightfield import sniff_jdem

    if sniff_jdem(data):
        from .heightfield import read_jdem

        px, gt = read_jdem(data)
        return {"pixels": px, "gt": gt, "epsg": 4301, "driver": "JDEM"}
    from .usgsdem import sniff_usgsdem

    if (path.lower().endswith(".dem") or sniff_usgsdem(data)) \
            and not os.path.exists(path + ".rsc"):
        from .usgsdem import read_usgsdem

        try:
            px, gt, info = read_usgsdem(data)
            return {"pixels": px, "gt": gt,
                    "epsg": None, "driver": "USGSDEM",
                    "usgsdem_info": info}
        except ValueError:
            if path.lower().endswith(".dem"):
                raise
    if sniff_aaigrid(data):
        px, gt, _nodata = read_aaigrid(data)
        epsg = None
        prj = _sidecar(path, ".prj")
        if prj:
            epsg = epsg_from_wkt(prj)
        return {"pixels": np.asarray(px), "gt": gt, "epsg": epsg,
                "driver": "AAIGrid"}
    if path.lower().endswith(".xyz"):
        px, gt = read_xyz(data)
        prj = _sidecar(path, ".prj")
        return {"pixels": np.asarray(px), "gt": gt,
                "epsg": epsg_from_wkt(prj) if prj else None,
                "driver": "XYZ"}
    if data[:6] == b"SIMPLE":
        from .fits import read_fits_image

        return read_fits_image(data)
    if data[:4] == b"HGPC":
        if data[4:5] == b"1":
            from .northwood import read_grd

            r = read_grd(data)
            px = np.stack([r["r"], r["g"], r["b"]], axis=2)
            return {"pixels": px, "gt": r["gt"], "epsg": None,
                    "driver": "NWT_GRD", "z": r["z"],
                    "nodata": r["nodata"]}
        from .northwood import read_grc

        return {**read_grc(data), "epsg": None}
    if path.upper().endswith(".GEN") and b"GENERAL_INFORMATION" in \
            data[:256]:
        from .srp import read_srp

        return read_srp(path)
    if path.upper().endswith(".THF") and data[:5].isdigit():
        from .srp import read_srp, srp_thf_info

        info = srp_thf_info(path)
        if len(info["subdatasets"]) == 1:
            gen, img = info["subdatasets"][0][4:].split(",")
            out = read_srp(gen, img)
            out["metadata"].update(info["metadata"])
            return out
        raise ValueError(f"{path}: {len(info['subdatasets'])} SRP "
                         f"subdatasets: {info['subdatasets']}")
    if data[:6] == b"HF2\x00\x00\x00" or (
            data[:2] == b"\x1f\x8b" and path.lower().endswith(
                (".hfz", ".hf2.gz"))):
        from .simpleformats import read_hf2

        px, gt = read_hf2(data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "HF2"}
    if data[:6] == b"SIGDEM":
        from .simpleformats import read_sigdem

        return read_sigdem(data)
    if data[:1] in (b"!", b"@") and b"@GRID" in data[:4096]:
        from .simpleformats import read_zmap

        px, gt, nodata = read_zmap(data.decode("ascii", "replace"))
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "ZMap",
                "nodata": nodata}
    if path.lower().endswith(".tga"):
        from .simpleformats import read_tga

        out = read_tga(data)
        out.setdefault("gt", None)
        out.setdefault("epsg", None)
        return out
    if path.lower().endswith(".til") and b"numTiles" in data[:1024]:
        from .simpleformats import read_til

        px, gt = read_til(data.decode("ascii", "replace"),
                          os.path.dirname(path) or ".")
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "TIL"}
    if path.lower().endswith(".bin") and len(data) > 44:
        import struct as _struct

        from .simpleformats import read_ngsgeoid

        if _struct.unpack("<i", data[40:44])[0] == 1 or \
                _struct.unpack(">i", data[40:44])[0] == 1:
            px, gt = read_ngsgeoid(data)
            return {"pixels": px, "gt": gt, "epsg": 4326,
                    "driver": "NGSGEOID"}
    if b"rtype: 1" in data[:2048] and b"rpelcnt:" in data[:2048]:
        from .cals import read_cals

        r = read_cals(data)
        out = {"pixels": r["pixels"], "gt": None, "epsg": None,
               "driver": "CALS", "palette": r["color_table"]}
        for k in ("pixel_path", "line_progression", "density"):
            if k in r:
                out[k] = r[k]
        return out
    if data[:27] == b"RUU CROSS SYSTEM MAP FORMAT":
        from .rawmisc import read_pcraster

        px, gt, info = read_pcraster(data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "PCRaster",
                **info}
    if data[:4] in (b"RSW\x00", b"MTW\x00", b"\x00WSR", b"\x00WTM"):
        from .rmf import read_rmf

        px, gt, info, palette = read_rmf(data)
        out = {"pixels": px, "gt": gt, "epsg": info.get("epsg"),
               "driver": "RMF", "rmf_info": info}
        if palette is not None:
            out["palette"] = palette
        return out
    if data[:4] == b"KRO\x01":
        from .rawmisc import read_kro

        px, gt, info = read_kro(data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "KRO"}
    if data.lstrip()[:16] == b"IMAGINE_RAW_FILE":
        from .rawmisc import read_eir

        px, gt, kv = read_eir(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "EIR"}
    if path.lower().endswith(".mpr") and data[:7] == b"[BaseMa" or \
            (path.lower().endswith(".mpr") and b"[Ilwis]" in data[:4096]):
        from .rawmisc import read_ilwis

        px, gt, ini = read_ilwis(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "ILWIS"}
    if path.upper().endswith(".ACE2"):
        from .rawmisc import read_ace2

        px, gt, info = read_ace2(path)
        return {"pixels": px, "gt": gt, "epsg": 4326, "driver": "ACE2"}
    from .bsb import sniff_bsb

    if sniff_bsb(data):
        from .bsb import read_bsb

        px, palette, info = read_bsb(data)
        return {"pixels": px, "gt": None, "epsg": None, "driver": "BSB",
                "palette": palette, "bsb_info": info}
    from .rawmisc import sniff_fast, sniff_noaab

    if path.lower().endswith(".b") and sniff_noaab(data):
        from .rawmisc import read_noaab

        px, gt, info = read_noaab(data)
        return {"pixels": px, "gt": gt, "epsg": 4326, "driver": "NOAA_B",
                **info}
    if sniff_fast(data) and b"PIXELS PER LINE" in data[:4096]:
        from .rawmisc import read_fast

        px, gt, info = read_fast(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "FAST",
                **info}
    if data[:8] == b"NUM_OREC":
        from .rawmore import read_ntv2

        px, gt, names = read_ntv2(data)
        return {"pixels": px, "gt": gt, "epsg": 4326, "driver": "NTv2",
                "subgrids": names}
    if data[:15] == b"Format version:" and b"NOHRSC" in data[:60]:
        from .rawmore import read_snodas

        px, gt, info = read_snodas(path)
        return {"pixels": px, "gt": gt, "epsg": 4326, "driver": "SNODAS",
                **info}
    if b"IMAGE_FILE_FORMAT" in data[:256] and b"MFF" in data[:256] \
            and path.lower().endswith(".hdr"):
        from .rawmore import read_mff

        px, gt, kv = read_mff(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "MFF",
                "mff_header": kv}
    if path.lower().endswith(".gtx"):
        from .rawmore import read_gtx

        px, gt, info = read_gtx(data)
        return {"pixels": px, "gt": gt, "epsg": 4326, "driver": "GTX",
                **info}
    if path.lower().endswith(".grd") and (b"[georeference]" in data[:512]
                                          or b"[general]" in data[:512]):
        from .rawmore import read_rraster

        px, gt, info = read_rraster(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "RRASTER",
                **info}
    from .rawmore import sniff_gsc, sniff_lcp

    if sniff_lcp(path, data):
        from .rawmore import read_lcp

        px, gt, info = read_lcp(data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "LCP",
                **info}
    if sniff_gsc(data):
        from .rawmore import read_gsc

        px, gt, info = read_gsc(data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "GSC",
                **info}
    if os.path.exists(path + ".rsc"):
        from .rawmore import read_roipac

        px, gt, info = read_roipac(path)
        return {"pixels": px, "gt": gt, "epsg": 4326, "driver": "ROI_PAC",
                **info}
    if os.path.exists(path + ".xml") and \
            b"<imageFile>" in open(path + ".xml", "rb").read(256):
        from .rawmore import read_isce

        px, gt, props = read_isce(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "ISCE",
                "isce_props": props}
    _aux = _sidecar(path, ".aux")
    if _aux and _aux.lstrip().startswith("AuxilaryTarget:"):
        from .rawmore import read_paux

        px, gt, kv = read_paux(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "PAux",
                "paux_header": kv}
    if data[:4] in (b"DSAA", b"DSBB", b"DSRB"):
        from .surfer import read_surfer

        px, gt, nodata = read_surfer(data)
        prj = _sidecar(path, ".prj")
        return {"pixels": px, "gt": gt,
                "epsg": epsg_from_wkt(prj) if prj else None,
                "driver": {b"DSAA": "GSAG", b"DSBB": "GSBG",
                           b"DSRB": "GS7BG"}[data[:4]], "nodata": nodata}
    if data[:8] == b"PCIDSK  ":
        from .pcidsk import read_pcidsk

        px, gt, info = read_pcidsk(data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "PCIDSK",
                "pcidsk_info": info}
    if data[:8].replace(b" ", b"").startswith(b"LBLSIZE="):
        from .vicar import read_vicar

        px, gt, lbl = read_vicar(data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "VICAR",
                "vicar_label": lbl}
    if data[:256].lstrip().startswith(b"Object") and \
            b"IsisCube" in data[:256]:
        from .isis3 import read_isis3

        px, gt, info = read_isis3(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "ISIS3",
                **{k: v for k, v in info.items()
                   if k in ("scale", "offset", "nodata")}}
    if path.lower().endswith(".rst"):
        from .rawlegacy import read_rst

        px, gt, rdc = read_rst(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "RST",
                "rdc": rdc}
    if path.lower().endswith(".byn"):
        from .rawlegacy import read_byn

        px, gt, info = read_byn(data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "BYN",
                **info}
    from .rawlegacy import sniff_ctg

    if sniff_ctg(data):
        from .rawlegacy import read_ctg

        px, gt, zone = read_ctg(data)
        return {"pixels": px, "gt": gt, "epsg": 32600 + zone,
                "driver": "CTG"}
    if data[:16] == b"TERRAGENTERRAIN ":
        from .heightfield import read_terragen

        px, gt, scale, offset = read_terragen(data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "Terragen",
                "scale": scale, "offset": offset}
    if data[:4] == b"trrn":
        from .heightfield import read_leveller

        px, scale, offset = read_leveller(data)
        return {"pixels": px, "gt": None, "epsg": None, "driver": "Leveller",
                "scale": scale, "offset": offset}
    if data[:6] in (b"HEADER", b"HEAD74") and data[16:24] != b"S LAT   ":
        from .rawlegacy import read_lan

        px, gt, coordsys = read_lan(data)
        prj = _sidecar(path, ".prj")
        return {"pixels": px, "gt": gt,
                "epsg": epsg_from_wkt(prj) if prj else None,
                "driver": "LAN", "lan_coordsys": coordsys}
    if data.lstrip()[:21] == b"BEGIN_USGS_DOQ_HEADER":
        from .rawlegacy import read_doq2

        px, gt, meta = read_doq2(data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "DOQ2",
                "doq_meta": meta}
    if data[:9] == b"SIMPLE  =":
        from .fits import read_fits

        px, gt, cards = read_fits(data)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "FITS",
                "fits_cards": cards}
    if path.lower().endswith(".ers"):
        from .ers import read_ers

        px, gt, meta = read_ers(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "ERS",
                "ers_meta": meta}
    if b"PDS_VERSION_ID" in data[:512]:
        from .pdslabel import read_pds

        px, gt, info = read_pds(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "PDS",
                **{k: v for k, v in info.items()
                   if k in ("scale", "offset", "nodata")}}
    if b"^QUBE" in data[:1024]:
        from .pdslabel import read_isis2

        px, gt, info = read_isis2(path)
        return {"pixels": px, "gt": gt, "epsg": None, "driver": "ISIS2",
                **{k: v for k, v in info.items()
                   if k in ("scale", "offset", "nodata")}}
    if data[:16] == b"SQLite format 3\x00":
        # raster pyramids in SQLite: MBTiles or GeoPackage tiles
        # (sqlite3 wants a real file path, so this branch dispatches
        # on the path rather than the buffered bytes)
        from .mbtiles import gpkg_tile_tables, is_mbtiles, \
            read_gpkg_tiles, read_mbtiles

        if is_mbtiles(path):
            return read_mbtiles(path)
        if gpkg_tile_tables(path):
            return read_gpkg_tiles(path)
        import sqlite3 as _sq

        con = _sq.connect(path)
        has_rl2 = con.execute(
            "SELECT count(*) FROM sqlite_master WHERE type='table'"
            " AND name='raster_coverages'").fetchone()[0]
        con.close()
        if has_rl2:
            from .rasterlite2 import read_rl2

            return read_rl2(path)
        raise ValueError(
            f"{path}: SQLite file without a tile pyramid — open vector "
            "layers via sources.gpkg / sources.spatialite instead")
    if data[:2] in (b"II", b"MM"):
        from .tiff import tiff_nodata

        px, gt = decode_tiff(data)
        epsg = tiff_epsg(data)
        driver = "GTiff"
        if gt is None:
            wf = _worldfile(path)
            if wf:
                gt = worldfile_to_gt(wf)
        nodata = tiff_nodata(data)
        if nodata is not None:
            if epsg is None:
                prj = _sidecar(path, ".prj")
                if prj:
                    epsg = epsg_from_wkt(prj)
            return {"pixels": np.asarray(px), "gt": gt, "epsg": epsg,
                    "driver": driver, "nodata": nodata}
    elif data[:8] == b"\x89PNG\r\n\x1a\n" or data[:2] == b"\xff\xd8":
        px = decode_image(data)
        driver = "PNG" if data[:8] == b"\x89PNG\r\n\x1a\n" else "JPEG"
        wf = _worldfile(path)
        gt = worldfile_to_gt(wf) if wf else None
        epsg = None
    elif data[:2] == b"BM":
        from .bmp import decode_bmp

        px, palette = decode_bmp(data)
        driver = "BMP"
        wf = _worldfile(path)
        gt = worldfile_to_gt(wf) if wf else None
        epsg = None
        if palette is not None:
            out = {"pixels": np.asarray(px), "gt": gt, "epsg": None,
                   "driver": driver, "palette": palette}
            prj = _sidecar(path, ".prj")
            if prj:
                out["epsg"] = epsg_from_wkt(prj)
            return out
    elif data[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        px, palette, meta = decode_gif(data)
        wf = _worldfile(path)
        gt = worldfile_to_gt(wf) if wf else None
        out = {"pixels": np.asarray(px), "gt": gt, "epsg": None,
               "driver": "GIF", "palette": palette, "gif_meta": meta}
        prj = _sidecar(path, ".prj")
        if prj:
            out["epsg"] = epsg_from_wkt(prj)
        return out
    else:
        # raw-binary payloads identified by the .hdr sidecar
        # (frmts/raw envidataset.cpp / ehdrdataset.cpp)
        from .envihdr import read_ehdr, read_envi

        hdr = _sidecar(path, ".hdr")
        if hdr is None:
            raise ValueError(f"unrecognized raster format: {path}")
        if "BANDS:" in hdr[:512] and "COLS:" in hdr[:512] \
                and "ROWS:" in hdr[:512]:
            from .rawmore import read_genbin

            base = os.path.splitext(path)[0]
            hdr_path = base + (".hdr" if os.path.exists(base + ".hdr")
                               else ".HDR")
            px, gt, kv = read_genbin(hdr_path)
            return {"pixels": np.asarray(px), "gt": gt, "epsg": None,
                    "driver": "GenBin", "genbin_header": kv}
        if hdr.lstrip().upper().startswith("ENVI"):
            px, gt, _meta = read_envi(hdr, data)
            driver = "ENVI"
        else:
            px, gt, _nodata = read_ehdr(hdr, data,
                                        os.path.splitext(path)[1])
            driver = "EHdr"
        epsg = None
    if epsg is None:
        prj = _sidecar(path, ".prj")
        if prj:
            epsg = epsg_from_wkt(prj)
    return {"pixels": np.asarray(px), "gt": gt, "epsg": epsg,
            "driver": driver}
