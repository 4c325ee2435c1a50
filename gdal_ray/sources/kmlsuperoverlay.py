"""KMLSuperOverlay driver: tile-pyramid write (KML dir / KMZ) + mosaic
read-back (reference frmts/kmlsuperoverlay/kmlsuperoverlaydataset.cpp;
conformance autotest/gdrivers/kmlsuperoverlay.py).

Write algorithm per CreateCopy (kmlsuperoverlaydataset.cpp:653-990):
the longer side is halved until <= 400 to fix (tilexsize, tileysize)
and maxzoom; each zoom z covers the source with
max(1, size // (tile * 2^(maxzoom-z))) tiles per axis, y counted from
the BOTTOM (ry = ysize - (iy+1)*rmaxysize); tile pixels are the
GDAL-RasterIO nearest decimation floor((i+0.5)*ratio + eps)
(gcore/rasterio.cpp:784-799). PNG tiles gain an alpha band (255, or 0
where any band hits its nodata — GenerateTiles :121-140); JPEG tiles
drop band 4. Child KMLs carry Region/Lod + GroundOverlay LatLonBox
(projected corners transformed to WGS84) + NetworkLinks to children
(GenerateChildKml :237-460).

Read-back walks doc.kml -> 0/0/0.kml NetworkLink chains, decodes every
GroundOverlay tile, and composes the max-zoom mosaic plus one overview
per lower zoom — matching the reference's overview checksums.
"""
from __future__ import annotations

import os
import re
import zipfile

import numpy as np

from ..functions.jpeg import decode_jpeg, encode_jpeg
from ..functions.png import decode_png, encode_png

_EPS = 1e-10


def _decimate(plane: np.ndarray, rx: int, ry: int, rxsize: int, rysize: int,
              dxsize: int, dysize: int) -> np.ndarray:
    """GDAL RasterIO nearest decimation of a source window."""
    xi = rx + np.floor((np.arange(dxsize) + 0.5) * (rxsize / dxsize)
                       + _EPS).astype(np.int64)
    yi = ry + np.floor((np.arange(dysize) + 0.5) * (rysize / dysize)
                       + _EPS).astype(np.int64)
    xi = np.clip(xi, 0, plane.shape[1] - 1)
    yi = np.clip(yi, 0, plane.shape[0] - 1)
    return plane[np.ix_(yi, xi)]


def _fmt(v: float) -> str:
    return f"{v:f}"


def _root_kml(kml_name: str, north, south, east, west, tilesize: int,
              name: str | None, description: str | None) -> str:
    minlod = tilesize // 2
    nm = name if name is not None else os.path.splitext(
        os.path.basename(kml_name))[0]
    desc = description or ""
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<kml xmlns="http://www.opengis.net/kml/2.2">\n'
        "\t<Document>\n"
        f"\t\t<name>{nm}</name>\n"
        f"\t\t<description>{desc}</description>\n"
        "\t\t<styleUrl>#hideChildrenStyle</styleUrl>\n"
        '\t\t<Style id="hideChildrenStyle">\n'
        '\t\t\t<ListStyle id="hideChildren">\n'
        "\t\t\t\t<listItemType>checkHideChildren</listItemType>\n"
        "\t\t\t</ListStyle>\n"
        "\t\t</Style>\n"
        "\t\t<NetworkLink>\n"
        "\t\t\t<open>1</open>\n"
        "\t\t\t<Region>\n"
        "\t\t\t\t<LatLonAltBox>\n"
        f"\t\t\t\t\t<north>{_fmt(north)}</north>\n"
        f"\t\t\t\t\t<south>{_fmt(south)}</south>\n"
        f"\t\t\t\t\t<east>{_fmt(east)}</east>\n"
        f"\t\t\t\t\t<west>{_fmt(west)}</west>\n"
        "\t\t\t\t</LatLonAltBox>\n"
        "\t\t\t\t<Lod>\n"
        f"\t\t\t\t\t<minLodPixels>{minlod}</minLodPixels>\n"
        "\t\t\t\t\t<maxLodPixels>-1</maxLodPixels>\n"
        "\t\t\t\t</Lod>\n"
        "\t\t\t</Region>\n"
        "\t\t\t<Link>\n"
        "\t\t\t\t<href>0/0/0.kml</href>\n"
        "\t\t\t\t<viewRefreshMode>onRegion</viewRefreshMode>\n"
        "\t\t\t</Link>\n"
        "\t\t</NetworkLink>\n"
        "\t</Document>\n"
        "</kml>\n")


def _child_kml(zoom, ix, iy, zoomxpix, zoomypix, dxsize, dysize, south, west,
               xsize, ysize, maxzoom, transform, file_ext, altitude,
               altitude_mode, child_tiles) -> str:
    tnorth = south + zoomypix * ((iy + 1) * dysize)
    tsouth = south + zoomypix * (iy * dysize)
    teast = west + zoomxpix * ((ix + 1) * dxsize)
    twest = west + zoomxpix * ix * dxsize

    corners = {"ult": twest, "llt": twest, "rbt": tsouth, "lbt": tsouth,
               "ltt": tnorth, "rtt": tnorth, "lrt": teast, "urt": teast}
    if transform is not None:
        twest, tsouth = (float(v) for v in transform(twest, tsouth))
        teast, tnorth = (float(v) for v in transform(teast, tnorth))
        corners["ult"], corners["ltt"] = (float(v) for v in
                                          transform(corners["ult"],
                                                    corners["ltt"]))
        corners["urt"], corners["rtt"] = (float(v) for v in
                                          transform(corners["urt"],
                                                    corners["rtt"]))
        corners["lrt"], corners["rbt"] = (float(v) for v in
                                          transform(corners["lrt"],
                                                    corners["rbt"]))
        corners["llt"], corners["lbt"] = (float(v) for v in
                                          transform(corners["llt"],
                                                    corners["lbt"]))

    min_lod = 1 if zoom == 0 else 128
    max_lod = -1
    if zoom < maxzoom:
        max_lod = 2048
        if not any(has_child for _, has_child in child_tiles):
            max_lod = -1

    out = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        '<kml xmlns="http://www.opengis.net/kml/2.2" '
        'xmlns:gx="http://www.google.com/kml/ext/2.2">',
        "\t<Document>",
        f"\t\t<name>{zoom}/{ix}/{iy}.kml</name>",
        "\t\t<styleUrl>#hideChildrenStyle</styleUrl>",
        '\t\t<Style id="hideChildrenStyle">',
        '\t\t\t<ListStyle id="hideChildren">',
        "\t\t\t\t<listItemType>checkHideChildren</listItemType>",
        "\t\t\t</ListStyle>",
        "\t\t</Style>",
        "\t\t<Region>",
        "\t\t\t<LatLonAltBox>",
        f"\t\t\t\t<north>{_fmt(tnorth)}</north>",
        f"\t\t\t\t<south>{_fmt(tsouth)}</south>",
        f"\t\t\t\t<east>{_fmt(teast)}</east>",
        f"\t\t\t\t<west>{_fmt(twest)}</west>",
        "\t\t\t</LatLonAltBox>",
        "\t\t\t<Lod>",
        f"\t\t\t\t<minLodPixels>{min_lod}</minLodPixels>",
        f"\t\t\t\t<maxLodPixels>{max_lod}</maxLodPixels>",
        "\t\t\t</Lod>",
        "\t\t</Region>",
        "\t\t<GroundOverlay>",
        f"\t\t\t<drawOrder>{zoom}</drawOrder>",
        "\t\t\t<Icon>",
        f"\t\t\t\t<href>{iy}{file_ext}</href>",
        "\t\t\t</Icon>",
    ]
    if altitude is not None:
        out.append(f"\t\t\t<altitude>{altitude}</altitude>")
    if altitude_mode in ("clampToGround", "absolute"):
        out.append(f"\t\t\t<altitudeMode>{altitude_mode}</altitudeMode>")
    elif altitude_mode in ("relativeToSeaFloor", "clampToSeaFloor"):
        out.append(f"\t\t\t<gx:altitudeMode>{altitude_mode}</gx:altitudeMode>")

    rectilinear = (corners["llt"] == corners["ult"] and
                   corners["lrt"] == corners["urt"] and
                   corners["lbt"] == corners["rbt"] and
                   corners["rtt"] == corners["ltt"])
    if rectilinear:
        out += ["\t\t\t<LatLonBox>",
                f"\t\t\t\t<north>{_fmt(tnorth)}</north>",
                f"\t\t\t\t<south>{_fmt(tsouth)}</south>",
                f"\t\t\t\t<east>{_fmt(teast)}</east>",
                f"\t\t\t\t<west>{_fmt(twest)}</west>",
                "\t\t\t</LatLonBox>"]
    else:
        out += ["\t\t\t<gx:LatLonQuad>",
                "\t\t\t\t<coordinates>",
                f"\t\t\t\t\t{_fmt(corners['llt'])},{_fmt(corners['lbt'])},0",
                f"\t\t\t\t\t{_fmt(corners['lrt'])},{_fmt(corners['rbt'])},0",
                f"\t\t\t\t\t{_fmt(corners['urt'])},{_fmt(corners['rtt'])},0",
                f"\t\t\t\t\t{_fmt(corners['ult'])},{_fmt(corners['ltt'])},0",
                "\t\t\t\t</coordinates>",
                "\t\t\t</gx:LatLonQuad>"]
    out.append("\t\t</GroundOverlay>")

    for (cx, cy), _has in child_tiles:
        cnorth = south + zoomypix / 2 * ((cy + 1) * dysize)
        csouth = south + zoomypix / 2 * (cy * dysize)
        ceast = west + zoomxpix / 2 * ((cx + 1) * dxsize)
        cwest = west + zoomxpix / 2 * cx * dxsize
        if transform is not None:
            cwest, csouth = (float(v) for v in transform(cwest, csouth))
            ceast, cnorth = (float(v) for v in transform(ceast, cnorth))
        out += [
            "\t\t<NetworkLink>",
            f"\t\t\t<name>{zoom + 1}/{cx}/{cy}{file_ext}</name>",
            "\t\t\t<Region>",
            "\t\t\t\t<Lod>",
            "\t\t\t\t\t<minLodPixels>128</minLodPixels>",
            "\t\t\t\t\t<maxLodPixels>-1</maxLodPixels>",
            "\t\t\t\t</Lod>",
            "\t\t\t\t<LatLonAltBox>",
            f"\t\t\t\t\t<north>{_fmt(cnorth)}</north>",
            f"\t\t\t\t\t<south>{_fmt(csouth)}</south>",
            f"\t\t\t\t\t<east>{_fmt(ceast)}</east>",
            f"\t\t\t\t\t<west>{_fmt(cwest)}</west>",
            "\t\t\t\t</LatLonAltBox>",
            "\t\t\t</Region>",
            "\t\t\t<Link>",
            f"\t\t\t\t<href>../../{zoom + 1}/{cx}/{cy}.kml</href>",
            "\t\t\t\t<viewRefreshMode>onRegion</viewRefreshMode>",
            "\t\t\t\t<viewFormat/>",
            "\t\t\t</Link>",
            "\t\t</NetworkLink>"]
    out += ["\t</Document>", "</kml>", ""]
    return "\n".join(out)


def write_superoverlay(pixels: np.ndarray, gt, crs, path: str,
                       fmt: str = "JPEG", name: str | None = None,
                       description: str | None = None,
                       altitude=None, altitude_mode: str | None = None,
                       nodata=None, quality: int = 75) -> list[str]:
    """Write a KML SuperOverlay pyramid. ``pixels`` is (bands, y, x)
    uint8; ``gt`` the 6-coeff geotransform; ``crs`` an EPSG (projected
    sources are transformed to WGS84 for the KML boxes, 4326/None pass
    through). ``fmt``: JPEG | PNG | AUTO. Returns the file list
    (relative names for .kmz, real paths otherwise)."""
    pixels = np.asarray(pixels)
    if pixels.ndim == 2:
        pixels = pixels[None]
    bands, ysize, xsize = pixels.shape

    north = gt[3]
    south = gt[3] + gt[5] * ysize
    east = gt[0] + gt[1] * xsize
    west = gt[0]

    transform = None
    if crs is not None:
        from ..functions.crs import Transformer, _parse_epsg

        if _parse_epsg(crs) not in (4326,):
            tr = Transformer(crs, 4326)
            transform = tr.transform
            west, south = (float(v) for v in transform(west, south))
            east, north = (float(v) for v in transform(east, north))

    # pyramid shape (kmlsuperoverlaydataset.cpp:696-723)
    maxzoom = 0
    if xsize >= ysize:
        d = float(xsize)
        while d > 400:
            d /= 2
            maxzoom += 1
        tilexsize = int(d)
        tileysize = int(d * ysize / xsize)
    else:
        d = float(ysize)
        while d > 400:
            d /= 2
            maxzoom += 1
        tileysize = int(d)
        tilexsize = int(d * xsize / ysize)

    zoomxpixels = [gt[1] * 2.0 ** (maxzoom - z) for z in range(maxzoom + 1)]
    zoomypixels = [abs(gt[5]) * 2.0 ** (maxzoom - z)
                   for z in range(maxzoom + 1)]

    is_kmz = path.lower().endswith(".kmz")
    zf = zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) if is_kmz else None
    out_dir = os.path.dirname(path) or "."
    files: list[str] = []

    def emit(relname: str, payload: bytes):
        if zf is not None:
            zf.writestr(relname, payload)
            files.append(relname)
        else:
            full = os.path.join(out_dir, relname)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            with open(full, "wb") as f:
                f.write(payload)
            files.append(full)

    root = _root_kml(path, north, south, east, west, tilexsize, name,
                     description)
    if is_kmz:
        emit("doc.kml", root.encode())
    else:
        with open(path, "wb") as f:
            f.write(root.encode())
        files.append(path)

    fmt = fmt.upper()
    tmp_south = gt[3] + gt[5] * ysize
    child_tiles: dict[tuple[int, int], list] = {}
    for zoom in range(maxzoom, -1, -1):
        current_tiles: dict[tuple[int, int], list] = {}
        rmaxx = tilexsize * (1 << (maxzoom - zoom))
        rmaxy = tileysize * (1 << (maxzoom - zoom))
        xloop = max(1, xsize // rmaxx)
        yloop = max(1, ysize // rmaxy)
        for ix in range(xloop):
            rx = ix * rmaxx
            dxsize = tilexsize
            for iy in range(yloop):
                ry = ysize - iy * rmaxy - rmaxy
                dysize = tileysize

                tile = np.stack([
                    _decimate(pixels[b], rx, ry, rmaxx, rmaxy,
                              dxsize, dysize)
                    for b in range(bands)])

                use_jpeg = fmt == "JPEG"
                if fmt == "AUTO":
                    # transparency detection: nodata or alpha<255
                    transparent = False
                    if bands == 4:
                        transparent = bool((tile[3] < 255).any())
                    elif nodata is not None:
                        transparent = bool((tile == nodata).any())
                    use_jpeg = not transparent
                ext = ".jpg" if use_jpeg else ".png"

                if use_jpeg:
                    t = tile[:3] if bands >= 3 else tile[:1]
                    payload = encode_jpeg(np.moveaxis(t, 0, 2) if len(t) == 3
                                          else t[0], quality=quality)
                else:
                    if bands < 4:
                        alpha = np.full((dysize, dxsize), 255, np.uint8)
                        if nodata is not None:
                            mask = np.zeros((dysize, dxsize), bool)
                            for b in range(bands):
                                mask |= tile[b] == nodata
                            alpha[mask] = 0
                        t = np.concatenate([tile, alpha[None]])
                    else:
                        t = tile
                    payload = encode_png(np.moveaxis(t, 0, 2))
                emit(f"{zoom}/{ix}/{iy}{ext}", payload)

                key = (ix, iy)
                pkey = (ix // 2, iy // 2)
                has_child_kml = bool(child_tiles.get(key))
                current_tiles.setdefault(pkey, []).append(
                    (key, has_child_kml))
                kml = _child_kml(zoom, ix, iy, zoomxpixels[zoom],
                                 zoomypixels[zoom], dxsize, dysize,
                                 tmp_south, gt[0], xsize, ysize, maxzoom,
                                 transform, ext, altitude, altitude_mode,
                                 child_tiles.get(key, []))
                emit(f"{zoom}/{ix}/{iy}.kml", kml.encode())
        child_tiles = current_tiles

    if zf is not None:
        zf.close()
    return files


_HREF = re.compile(r"<href>([^<]+)</href>")
_BOX = re.compile(
    r"<LatLonBox>.*?<north>([^<]+)</north>.*?<south>([^<]+)</south>"
    r".*?<east>([^<]+)</east>.*?<west>([^<]+)</west>.*?</LatLonBox>",
    re.S)


def read_superoverlay(path: str) -> dict:
    """Reassemble a SuperOverlay written by write_superoverlay (or the
    reference): max-zoom mosaic + one overview per lower zoom."""
    zf = None
    if path.lower().endswith(".kmz"):
        zf = zipfile.ZipFile(path)
        names = zf.namelist()
        rootname = "doc.kml" if "doc.kml" in names else next(
            n for n in names if n.endswith(".kml") and "/" not in n)
        read = lambda n: zf.read(n)  # noqa: E731
        base = ""
        listing = names
    else:
        out_dir = os.path.dirname(path) or "."
        rootname = os.path.basename(path)
        read = lambda n: open(os.path.join(out_dir, n), "rb").read()  # noqa: E731
        base = out_dir
        listing = []
        for dp, _dn, fn in os.walk(out_dir):
            rel = os.path.relpath(dp, out_dir)
            for f in fn:
                listing.append(f if rel == "." else f"{rel}/{f}")

    root = read(rootname).decode()
    m = _HREF.search(root)
    if m is None:
        raise ValueError("superoverlay root KML has no NetworkLink href")

    # tiles grouped by zoom from the file listing (z/x/y.ext)
    tiles: dict[int, dict[tuple[int, int], str]] = {}
    for n in listing:
        mm = re.match(r"(\d+)/(\d+)/(\d+)\.(png|jpg|jpeg)$", n)
        if mm:
            z, x, y = int(mm.group(1)), int(mm.group(2)), int(mm.group(3))
            tiles.setdefault(z, {})[(x, y)] = n

    def decode(n: str) -> np.ndarray:
        data = read(n)
        if n.endswith(".png"):
            px = decode_png(data)
        else:
            px = decode_jpeg(data)
        if px.ndim == 2:
            px = px[:, :, None]
        return np.moveaxis(px, 2, 0)  # (bands, y, x)

    levels = {}
    geo = None
    for z in sorted(tiles):
        grid = tiles[z]
        xs = max(x for x, _ in grid) + 1
        ys = max(y for _, y in grid) + 1
        sample = decode(next(iter(grid.values())))
        nb, th, tw = sample.shape
        mosaic = np.zeros((max(nb, 1), ys * th, xs * tw), np.uint8)
        for (x, y), n in grid.items():
            px = decode(n)
            row = ys - 1 - y  # iy counts from the bottom
            mosaic[:px.shape[0], row * th:(row + 1) * th,
                   x * tw:(x + 1) * tw] = px
        levels[z] = mosaic
        # georeference from this zoom's corner tiles' LatLonBoxes
        if geo is None or z == max(tiles):
            boxes = []
            for (x, y), n in grid.items():
                kml = read(n.rsplit(".", 1)[0] + ".kml").decode()
                bm = _BOX.search(kml)
                if bm:
                    boxes.append(tuple(float(v) for v in bm.groups()))
            if boxes:
                geo = (max(b[0] for b in boxes), min(b[1] for b in boxes),
                       max(b[2] for b in boxes), min(b[3] for b in boxes))

    if zf is not None:
        zf.close()
    maxz = max(levels)
    name_m = re.search(r"<name>([^<]*)</name>", root)
    desc_m = re.search(r"<description>([^<]*)</description>", root)
    return {
        "pixels": levels[maxz],
        "overviews": [levels[z] for z in sorted(levels) if z != maxz][::-1],
        "geo": geo,  # (north, south, east, west)
        "name": name_m.group(1) if name_m else None,
        "description": desc_m.group(1) if desc_m else None,
        "base": base,
    }
