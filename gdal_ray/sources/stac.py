"""STACTA (STAC tiled-assets) and STACIT (STAC items) drivers.

Pure-Python re-derivation of the reference drivers' semantics:

- STACTA (frmts/stacta/stactadataset.cpp): a STAC item with the
  ``tiled-assets`` extension describes a tile pyramid; the dataset is
  the mosaic of the deepest tile matrix, with the shallower matrices
  as overviews.  Resolution comes from the OGC TMS scaleDenominator:
  ``res = scaleDenominator * 0.28e-3 / metersPerUnit`` where
  metersPerUnit is 1 for projected CRS and a*pi/180 for geographic
  (stactadataset.cpp GetTileMatrix res math; pinned by the autotest's
  expected_gt 0.17578125 for WorldCRS84Quad zoom 2).  Raster extent
  is the tile-limits window: ``(max_col-min_col+1)*tileWidth`` etc.,
  origin ``topLeftCorner + min_col*tileWidth*res``.
- STACIT (frmts/stacit/stacitdataset.cpp): a STAC API search result
  (FeatureCollection, paginated via links rel=next) whose assets
  carry proj:transform/proj:bbox/proj:epsg; assets group by
  (collection, asset, crs) — one raster per group, sources sorted by
  ascending datetime (stacitdataset.cpp:575-582) and painted in that
  order (most recent on top, the VRT source-order semantics).  The
  subdataset naming ``STACIT:"file":collection=c,asset=a,crs=EPSG_n``
  follows SetSubdatasets (stacitdataset.cpp:680-740).

Tiles/items decode through the engine's own codecs (open_raster), so
the supported payloads are the engine's raster formats (GeoTIFF, PNG,
...).  Missing tiles fill with the nodata value (or 0).
"""

from __future__ import annotations

import json
import math
import os
import re

import numpy as np

from .vsi import vsi_open_bytes

_A_WGS84 = 6378137.0


def _loads(data) -> dict:
    """json.loads tolerating trailing commas (CPLJSON accepts them;
    several reference fixtures use them)."""
    if isinstance(data, bytes):
        data = data.decode("utf-8")
    try:
        return json.loads(data)
    except json.JSONDecodeError:
        # drop a comma whose next non-space char (outside strings)
        # closes the container
        out, in_str, esc = [], False, False
        n = len(data)
        for i, ch in enumerate(data):
            if in_str:
                out.append(ch)
                if esc:
                    esc = False
                elif ch == "\\":
                    esc = True
                elif ch == '"':
                    in_str = False
                continue
            if ch == '"':
                in_str = True
            elif ch == ",":
                j = i + 1
                while j < n and data[j].isspace():
                    j += 1
                if j < n and data[j] in "}]":
                    continue
            out.append(ch)
        return json.loads("".join(out))


def _meters_per_unit(crs: str) -> float:
    """OGC TMS unit scale: degrees for geographic CRS, meters else."""
    s = str(crs)
    if "CRS84" in s or s.endswith("4326") or "EPSG:4326" in s:
        return _A_WGS84 * math.pi / 180.0
    return 1.0


def _crs_epsg(crs: str) -> int | None:
    s = str(crs)
    if "CRS84" in s:
        return 4326
    m = re.search(r"EPSG[:/](?:[\d.]+/)?(\d+)$", s)
    return int(m.group(1)) if m else None


def _resolve(href: str, base_dir: str) -> str:
    if href.startswith("file://"):              # test_page2.json uses it
        href = href[7:]
    if re.match(r"^[a-z][a-z0-9+]*://", href) or os.path.isabs(href):
        return href
    cand = os.path.join(base_dir, href)
    if os.path.exists(cand):
        return cand
    return href


# --------------------------------------------------------------- STACTA

def _stacta_levels(doc: dict):
    """-> (tms_id, [level dicts sorted coarse->fine], asset_template)."""
    props = doc.get("properties", {})
    links = props.get("tiles:tile_matrix_links", {})
    sets = props.get("tiles:tile_matrix_sets", {})
    templates = doc.get("asset_templates", {})
    if not templates:
        raise ValueError("STACTA: no asset_templates")
    tmpl = next(iter(templates.values()))["href"]
    if len(sets) != 1 and not links:
        raise ValueError(
            f"STACTA: {len(sets)} tile matrix sets and no links — open a "
            f"specific one of {sorted(sets)}")
    tms_id = next(iter(links)) if links else next(iter(sets))
    tms = sets[tms_id]
    limits = (links.get(tms_id, {}) or {}).get("limits", {})
    mpu = _meters_per_unit(tms.get("supportedCRS", ""))
    levels = []
    for tm in tms["tileMatrix"]:
        ident = str(tm["identifier"])
        if limits and ident not in limits:
            continue
        res = float(tm["scaleDenominator"]) * 0.28e-3 / mpu
        lim = limits.get(ident, {
            "min_tile_col": 0, "max_tile_col": tm["matrixWidth"] - 1,
            "min_tile_row": 0, "max_tile_row": tm["matrixHeight"] - 1,
        })
        levels.append({
            "id": ident, "res": res,
            "tile_w": int(tm["tileWidth"]), "tile_h": int(tm["tileHeight"]),
            "top_left": tm["topLeftCorner"], "limits": lim,
        })
    levels.sort(key=lambda lv: -lv["res"])      # coarse -> fine
    if not levels:
        raise ValueError("STACTA: no usable tile matrix level")
    return tms_id, levels, tmpl, _crs_epsg(tms.get("supportedCRS", ""))


def _stacta_mosaic(level: dict, tms_id: str, tmpl: str, base_dir: str):
    """Decode every tile of one level into a mosaic array (+nodata)."""
    from .raster_open import open_raster

    lim = level["limits"]
    tw, th = level["tile_w"], level["tile_h"]
    ncols = lim["max_tile_col"] - lim["min_tile_col"] + 1
    nrows = lim["max_tile_row"] - lim["min_tile_row"] + 1
    mosaic = None
    nodata = None
    for r in range(nrows):
        for c in range(ncols):
            href = (tmpl.replace("{TileMatrixSet}", tms_id)
                    .replace("{TileMatrix}", level["id"])
                    .replace("{TileRow}", str(r + lim["min_tile_row"]))
                    .replace("{TileCol}", str(c + lim["min_tile_col"])))
            path = _resolve(href, base_dir)
            try:
                tile = open_raster(path)
            except (FileNotFoundError, OSError):
                continue
            px = tile["pixels"]
            if mosaic is None:
                shape = (nrows * th, ncols * tw) + px.shape[2:]
                from .tiff import tiff_nodata

                try:
                    nodata = tiff_nodata(vsi_open_bytes(path))
                except Exception:
                    nodata = None
                mosaic = np.full(shape, nodata or 0, dtype=px.dtype)
            mosaic[r * th:r * th + px.shape[0],
                   c * tw:c * tw + px.shape[1]] = px
    if mosaic is None:
        raise ValueError("STACTA: no tile of the deepest level decodable")
    return mosaic, nodata


def read_stacta(path: str, base_dir: str | None = None) -> dict:
    """Open a STAC tiled-asset item: full-res mosaic of the deepest
    tile matrix, overviews from the shallower matrices."""
    doc = _loads(vsi_open_bytes(path))
    base = base_dir or (os.path.dirname(path) or ".")
    tms_id, levels, tmpl, epsg = _stacta_levels(doc)
    full = levels[-1]
    px, nodata = _stacta_mosaic(full, tms_id, tmpl, base)
    lim, res = full["limits"], full["res"]
    gt = (full["top_left"][0] + lim["min_tile_col"] * full["tile_w"] * res,
          res, 0.0,
          full["top_left"][1] - lim["min_tile_row"] * full["tile_h"] * res,
          0.0, -res)
    overviews = []
    for lv in reversed(levels[:-1]):            # fine -> coarse
        try:
            ov, _ = _stacta_mosaic(lv, tms_id, tmpl, base)
            overviews.append(ov)
        except ValueError:
            break
    out = {"pixels": px, "gt": gt, "epsg": epsg, "driver": "STACTA",
           "overviews": overviews, "tms": tms_id}
    if nodata is not None:
        out["nodata"] = nodata
    return out


# --------------------------------------------------------------- STACIT

_SUBDS = re.compile(
    r'^STACIT:"(?P<path>[^"]+)":(?P<args>.*)$')


def _stacit_items(path: str, base_dir: str, max_items: int):
    """Follow rel=next pagination, yield feature dicts (<= max_items)."""
    feats, seen = [], set()
    cur = path
    while cur and len(feats) < max_items:
        if cur in seen:
            break
        seen.add(cur)
        doc = _loads(vsi_open_bytes(cur))
        feats.extend(doc.get("features", []))
        nxt = None
        for ln in doc.get("links", []):
            if ln.get("rel") == "next" and ln.get("href"):
                nxt = _resolve(ln["href"], base_dir)
                break
        cur = nxt
    return feats[:max_items]


def _collect_assets(feats: list[dict]):
    """-> {(collection, asset, epsg): [item dict]} in feature order."""
    groups: dict[tuple, list] = {}
    for f in feats:
        props = f.get("properties", {})
        coll = f.get("collection", "")
        epsg_item = props.get("proj:epsg")
        for name, a in f.get("assets", {}).items():
            if "proj:transform" not in a and "proj:bbox" not in a:
                continue
            tr = a.get("proj:transform") or props.get("proj:transform")
            if tr is None:
                continue
            if len(tr) == 9:                    # 3x3 row-major
                resx, _, x0, _, resy, y0 = tr[:6]
            else:
                resx, _, x0, _, resy, y0 = tr
            bbox = a.get("proj:bbox") or props.get("proj:bbox")
            shape = a.get("proj:shape") or props.get("proj:shape")
            if bbox is not None:
                xmin, ymin, xmax, ymax = bbox
            elif shape is not None:
                h, w = shape
                xmin, ymax = x0, y0
                xmax, ymin = x0 + resx * w, y0 + resy * h
            else:
                continue
            epsg = a.get("proj:epsg", epsg_item)
            groups.setdefault((coll, name, epsg), []).append({
                "href": a["href"], "datetime": props.get("datetime", ""),
                "xmin": xmin, "ymin": ymin, "xmax": xmax, "ymax": ymax,
                "resx": float(resx), "resy": abs(float(resy)),
            })
    return groups


def stacit_subdatasets(path: str, base_dir: str | None = None,
                       max_items: int = 1000) -> list[tuple[str, str]]:
    """(name, desc) pairs per stacitdataset.cpp SetSubdatasets."""
    base = base_dir or (os.path.dirname(path) or ".")
    groups = _collect_assets(_stacit_items(path, base, max_items))
    colls = sorted({k[0] for k in groups})
    by_ca: dict[tuple, list] = {}
    for (coll, asset, epsg) in groups:
        by_ca.setdefault((coll, asset), []).append(epsg)
    subs = []
    for (coll, asset) in sorted(by_ca):
        arg = (f"collection={coll}," if len(colls) > 1 else "") + \
            f"asset={asset}"
        txt = (f"Collection {coll}, " if len(colls) > 1 else "") + \
            f"Asset {asset}"
        epsgs = by_ca[(coll, asset)]
        if len(epsgs) == 1:
            subs.append((f'STACIT:"{path}":{arg}', f"{txt} of {path}"))
        else:
            for e in sorted(epsgs):
                subs.append((f'STACIT:"{path}":{arg},crs=EPSG_{e}',
                             f"{txt} of {path} in CRS EPSG:{e}"))
    return subs


def read_stacit(path: str, collection: str | None = None,
                asset: str | None = None, crs_epsg: int | None = None,
                max_items: int = 1000,
                base_dir: str | None = None) -> dict:
    """Open a STAC items mosaic. ``path`` may be the bare JSON or a
    ``STACIT:"file":collection=c,asset=a,crs=EPSG_n`` subdataset."""
    from .raster_open import open_raster

    m = _SUBDS.match(path)
    if m:
        path = m.group("path")
        for part in m.group("args").split(","):
            if not part:
                continue
            k, _, v = part.partition("=")
            if k == "collection":
                collection = v
            elif k == "asset":
                asset = v
            elif k == "crs":
                crs_epsg = int(v.replace("EPSG_", ""))
    base = base_dir or (os.path.dirname(path) or ".")
    groups = _collect_assets(_stacit_items(path, base, max_items))
    if not groups:
        raise ValueError(f"STACIT: no asset with proj metadata in {path}")
    sel = {k: v for k, v in groups.items()
           if (collection is None or k[0] == collection)
           and (asset is None or k[1] == asset)
           and (crs_epsg is None or k[2] == crs_epsg)}
    if not sel:
        raise ValueError(
            f"STACIT: no asset matches collection={collection!r} "
            f"asset={asset!r} crs={crs_epsg!r}")
    if len(sel) > 1:
        names = [s[0] for s in
                 stacit_subdatasets(path, base_dir=base,
                                    max_items=max_items)]
        raise ValueError(f"STACIT: several assets — open one of {names}")
    (coll, aname, epsg), items = next(iter(sel.items()))
    resx = items[0]["resx"]
    resy = items[0]["resy"]
    xmin = min(i["xmin"] for i in items)
    xmax = max(i["xmax"] for i in items)
    ymin = min(i["ymin"] for i in items)
    ymax = max(i["ymax"] for i in items)
    w = int(round((xmax - xmin) / resx))
    h = int(round((ymax - ymin) / resy))
    # band characteristics from the FIRST-listed item
    # (stacitdataset.cpp:564 "items.front()"), then ascending datetime
    first = open_raster(_resolve(items[0]["href"], base))
    nodata = first.get("nodata")
    dt = first["pixels"].dtype
    shape = (h, w) + first["pixels"].shape[2:]
    mosaic = np.full(shape, nodata if nodata is not None else 0, dtype=dt)

    def window(it):
        x0 = int(round((it["xmin"] - xmin) / resx))
        y0 = int(round((ymax - it["ymax"]) / resy))
        tw = int(round((it["xmax"] - it["xmin"]) / resx))
        th = int(round((it["ymax"] - it["ymin"]) / resy))
        return y0, x0, th, tw

    def cast(px):
        return np.clip(px, np.iinfo(dt).min, np.iinfo(dt).max).astype(dt) \
            if dt.kind in "iu" and px.dtype != dt else px.astype(dt)

    if nodata is None:
        # REMOVE_IF_NO_NODATA: a source fully covered by more recent
        # ones is never opened (stacitdataset.cpp RemoveCoveredSources)
        uncovered = np.ones((h, w), bool)
        for it in sorted(items, key=lambda i: i["datetime"], reverse=True):
            y0, x0, th, tw = window(it)
            hole = uncovered[y0:y0 + th, x0:x0 + tw]
            if not hole.any():
                continue
            r = open_raster(_resolve(it["href"], base))
            src = cast(np.asarray(r["pixels"]))
            np.copyto(mosaic[y0:y0 + th, x0:x0 + tw], src,
                      where=hole if src.ndim == 2 else hole[..., None])
            hole[...] = False
    else:
        for it in sorted(items, key=lambda i: i["datetime"]):
            r = open_raster(_resolve(it["href"], base))
            src = cast(np.asarray(r["pixels"]))
            y0, x0, th, tw = window(it)
            np.copyto(mosaic[y0:y0 + th, x0:x0 + tw], src,
                      where=(src != nodata))
    gt = (xmin, resx, 0.0, ymax, 0.0, -resy)
    out = {"pixels": mosaic, "gt": gt, "epsg": epsg, "driver": "STACIT",
           "collection": coll, "asset": aname}
    if nodata is not None:
        out["nodata"] = nodata
    return out
