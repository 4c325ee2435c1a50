"""Geospatial PDF raster driver (reference frmts/pdf).

Write path mirrors pdfcreatecopy.cpp's CreateCopy layout: one page
whose MediaBox is the raster footprint at the requested DPI (PDF user
units are 1/72 inch; dfUserUnit = DPI/72 like the reference), the
pixels as a single image XObject (FlateDecode / DCTDecode / raw), and
ISO 32000 geo-encoding — /VP viewport + /Measure GEO dictionary with
GPTS (corner coordinates in the SRS's own geographic CS, lat,lon
order), LPTS unit square, Bounds, and a /GCS dict carrying WKT + EPSG
(pdfcreatecopy.cpp:661-940 WriteSRS_ISO32000).

Read path is a self-contained classic-PDF parser (xref table +
object graph; object streams are out of scope) for the image-mosaic
subset the writer produces: page -> image XObject -> pixels, georef
re-derived from GPTS/LPTS/BBox by transforming the geographic corner
points back into the projected CS (the reference delegates page
rasterization to poppler/pdfium; this engine reads the raster PDFs it
writes plus any single-image ISO 32000 PDF).
"""

from __future__ import annotations

import re
import zlib

import numpy as np

# projected EPSG -> its geographic CS (OSRCloneGeogCS analog) for the
# codes the CRS engine supports
_GEOG_OF = {3857: 4326, 3395: 4326, 27700: 4277, 2193: 4167, 2180: 4258,
            3034: 4258, 3035: 4258, 32661: 4326, 32761: 4326}


def _geogcs_of(epsg: int) -> int:
    if epsg in _GEOG_OF:
        return _GEOG_OF[epsg]
    if 32601 <= epsg <= 32660 or 32701 <= epsg <= 32760:
        return 4326
    if 26703 <= epsg <= 26722:
        return 4267
    if 26901 <= epsg <= 26923:
        return 4269
    if 25828 <= epsg <= 25838:
        return 4258
    if 31466 <= epsg <= 31469:
        return 4314
    if 28348 <= epsg <= 28358:
        return 4283
    if epsg in (4326, 4267, 4269, 4258, 4277, 4314, 4167, 4283):
        return epsg                      # already geographic
    raise NotImplementedError(f"PDF georef: no geographic CS for {epsg}")


def _fmt(v: float) -> str:
    s = f"{v:.10f}".rstrip("0").rstrip(".")
    return s if s else "0"


class _Writer:
    def __init__(self):
        self.buf = bytearray(b"%PDF-1.6\n")
        self.offsets: dict[int, int] = {}
        self.next_id = 1

    def alloc(self) -> int:
        n = self.next_id
        self.next_id += 1
        return n

    def obj(self, num: int, body: bytes) -> None:
        self.offsets[num] = len(self.buf)
        self.buf += f"{num} 0 obj\n".encode()
        self.buf += body
        self.buf += b"\nendobj\n"

    def finish(self, root: int, info: int | None = None) -> bytes:
        start = len(self.buf)
        n = self.next_id
        self.buf += f"xref\n0 {n}\n".encode()
        self.buf += b"0000000000 65535 f \n"
        for i in range(1, n):
            self.buf += f"{self.offsets[i]:010d} 00000 n \n".encode()
        trailer = f"trailer\n<< /Size {n} /Root {root} 0 R"
        if info:
            trailer += f" /Info {info} 0 R"
        trailer += f" >>\nstartxref\n{start}\n%%EOF\n"
        self.buf += trailer.encode()
        return bytes(self.buf)


def encode_pdf(px: np.ndarray, gt=None, epsg: int | None = None,
               dpi: float = 72.0, compression: str = "deflate",
               jpeg_quality: int = 75,
               palette: np.ndarray | None = None) -> bytes:
    """uint8 raster (h,w) gray/indexed or (h,w,3) RGB -> geospatial
    PDF; ``palette`` (n,3) makes the single band an /Indexed image."""
    if px.dtype != np.uint8:
        raise NotImplementedError("PDF write needs uint8 bands")
    if px.ndim == 2:
        h, w = px.shape
        nch = 1
    else:
        h, w, nch = px.shape
        if nch not in (1, 3):
            raise NotImplementedError("PDF write needs gray or RGB")
    user_unit = dpi / 72.0               # dfUserUnit (USER_UNIT_IN_INCH)
    pw, ph = w / user_unit, h / user_unit

    raw = np.ascontiguousarray(px).tobytes()
    if compression == "deflate":
        data, filt = zlib.compress(raw, 6), "/Filter /FlateDecode"
    elif compression == "jpeg":
        from ..functions.jpeg import encode_jpeg

        data, filt = (encode_jpeg(px, quality=jpeg_quality),
                      "/Filter /DCTDecode")
    elif compression == "none":
        data, filt = raw, ""
    else:
        raise NotImplementedError(f"PDF compression {compression}")
    if palette is not None:
        if nch != 1:
            raise ValueError("palette needs a single indexed band")
        hexlut = np.asarray(palette, np.uint8)[:, :3].tobytes().hex()
        cspace = (f"[/Indexed /DeviceRGB {len(palette) - 1} "
                  f"<{hexlut}>]")
    else:
        cspace = "/DeviceGray" if nch == 1 else "/DeviceRGB"

    wr = _Writer()
    n_cat = wr.alloc()
    n_pages = wr.alloc()
    n_page = wr.alloc()
    n_content = wr.alloc()
    n_img = wr.alloc()
    n_vp = n_meas = n_gcs = None
    if gt is not None and epsg is not None:
        n_vp, n_meas, n_gcs = wr.alloc(), wr.alloc(), wr.alloc()

    wr.obj(n_cat, f"<< /Type /Catalog /Pages {n_pages} 0 R >>".encode())
    wr.obj(n_pages,
           f"<< /Type /Pages /Kids [{n_page} 0 R] /Count 1 >>".encode())
    page = (f"<< /Type /Page /Parent {n_pages} 0 R "
            f"/MediaBox [0 0 {_fmt(pw)} {_fmt(ph)}] "
            f"/Contents {n_content} 0 R "
            f"/Resources << /XObject << /Image1 {n_img} 0 R >> >>")
    if n_vp:
        page += f" /VP [{n_vp} 0 R]"
    page += " >>"
    wr.obj(n_page, page.encode())
    content = (f"q\n{_fmt(pw)} 0 0 {_fmt(ph)} 0 0 cm\n"
               f"/Image1 Do\nQ\n").encode()
    wr.obj(n_content,
           f"<< /Length {len(content)} >>\nstream\n".encode()
           + content + b"\nendstream")
    wr.obj(n_img,
           (f"<< /Type /XObject /Subtype /Image /Width {w} "
            f"/Height {h} /ColorSpace {cspace} /BitsPerComponent 8 "
            f"{filt} /Length {len(data)} >>\nstream\n").encode()
           + data + b"\nendstream")

    if n_vp:
        # corner pixels -> projected -> the SRS's own geographic CS
        from ..functions.crs import Transformer

        g_epsg = _geogcs_of(epsg)
        cols = np.array([0.0, 0.0, w, w])
        rows = np.array([0.0, h, h, 0.0])   # UL, LL, LR, UR
        xs = gt[0] + cols * gt[1] + rows * gt[2]
        ys = gt[3] + cols * gt[4] + rows * gt[5]
        if g_epsg != epsg:
            lon, lat = Transformer(epsg, g_epsg).transform(xs, ys)
        else:
            lon, lat = xs, ys
        wr.obj(n_vp,
               (f"<< /Type /Viewport /Name (Layer) "
                f"/BBox [0 0 {_fmt(pw)} {_fmt(ph)}] "
                f"/Measure {n_meas} 0 R >>").encode())
        gpts = " ".join(f"{lat[i]:.16g} {lon[i]:.16g}" for i in range(4))
        wr.obj(n_meas,
               (f"<< /Type /Measure /Subtype /GEO "
                f"/Bounds [0 1 0 0 1 0 1 1] "
                f"/GPTS [{gpts}] "
                f"/LPTS [0 1 0 0 1 0 1 1] "
                f"/GCS {n_gcs} 0 R >>").encode())
        kind = "GEOGCS" if g_epsg == epsg else "PROJCS"
        wr.obj(n_gcs,
               (f"<< /Type /{kind} /EPSG {epsg} "
                f"/WKT (EPSG:{epsg}) >>").encode())
    return wr.finish(n_cat)


# ---------------------------------------------------------------- read


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj")


def _index_objects(data: bytes) -> dict[int, int]:
    """Object number -> byte offset (scan; resilient to stale xref)."""
    return {int(m.group(1)): m.start() for m in _OBJ_RE.finditer(data)}


def _parse_value(s: bytes, pos: int):
    """Parse one PDF object value at pos -> (value, new_pos).

    Dicts -> dict[str, value]; arrays -> list; name -> '/xxx';
    ref -> ('ref', num); numbers/strings native."""
    while pos < len(s) and s[pos] in b" \r\n\t":
        pos += 1
    if s.startswith(b"<<", pos):
        pos += 2
        d = {}
        while True:
            while pos < len(s) and s[pos] in b" \r\n\t":
                pos += 1
            if s.startswith(b">>", pos):
                return d, pos + 2
            if s[pos:pos + 1] != b"/":
                raise ValueError("bad dict key")
            m = re.match(rb"/([A-Za-z0-9_.#+-]+)", s[pos:])
            key = m.group(1).decode()
            pos += m.end()
            d[key], pos = _parse_value(s, pos)
    if s.startswith(b"<", pos):          # hex string
        j = s.index(b">", pos)
        hexs = re.sub(rb"\s", b"", s[pos + 1:j])
        if len(hexs) & 1:
            hexs += b"0"
        return bytes.fromhex(hexs.decode()), j + 1
    if s.startswith(b"[", pos):
        pos += 1
        arr = []
        while True:
            while pos < len(s) and s[pos] in b" \r\n\t":
                pos += 1
            if s.startswith(b"]", pos):
                return arr, pos + 1
            v, pos = _parse_value(s, pos)
            arr.append(v)
    if s[pos:pos + 1] == b"/":
        m = re.match(rb"/([A-Za-z0-9_.#+-]*)", s[pos:])
        return "/" + m.group(1).decode(), pos + m.end()
    if s[pos:pos + 1] == b"(":
        depth = 1
        j = pos + 1
        out = bytearray()
        while depth:
            c = s[j:j + 1]
            if c == b"\\":
                out += s[j + 1:j + 2]
                j += 2
                continue
            if c == b"(":
                depth += 1
            elif c == b")":
                depth -= 1
                if not depth:
                    break
            out += c
            j += 1
        return out.decode("latin-1"), j + 1
    m = re.match(rb"(\d+)\s+(\d+)\s+R", s[pos:])
    if m:
        return ("ref", int(m.group(1))), pos + m.end()
    m = re.match(rb"[+-]?(?:\d+\.\d*|\.\d+|\d+)", s[pos:])
    if m:
        t = m.group(0)
        v = float(t) if b"." in t else int(t)
        return v, pos + m.end()
    m = re.match(rb"(true|false|null)", s[pos:])
    if m:
        return {b"true": True, b"false": False,
                b"null": None}[m.group(1)], pos + m.end()
    raise ValueError(f"unparseable PDF value at {pos}: {s[pos:pos+20]!r}")


class _Pdf:
    def __init__(self, data: bytes):
        self.data = data
        self.index = _index_objects(data)
        self.cache: dict[int, object] = {}

    def obj(self, num: int):
        if num not in self.cache:
            off = self.index[num]
            m = _OBJ_RE.match(self.data, off)
            self.cache[num] = _parse_value(self.data, m.end())[0]
        return self.cache[num]

    def deref(self, v):
        while isinstance(v, tuple) and v and v[0] == "ref":
            v = self.obj(v[1])
        return v

    def stream(self, num: int) -> bytes:
        off = self.index[num]
        m = _OBJ_RE.match(self.data, off)
        d, pos = _parse_value(self.data, m.end())
        s = self.data.index(b"stream", pos) + len(b"stream")
        if self.data[s:s + 2] == b"\r\n":
            s += 2
        elif self.data[s:s + 1] == b"\n":
            s += 1
        length = self.deref(d["Length"])
        raw = self.data[s:s + length]
        filt = d.get("Filter")
        if filt == "/FlateDecode" or (isinstance(filt, list)
                                      and "/FlateDecode" in filt):
            return zlib.decompress(raw)
        return raw


def read_pdf(path_or_bytes) -> dict:
    """Geospatial raster PDF -> {"pixels", "gt", "epsg", "driver"}."""
    data = (path_or_bytes if isinstance(path_or_bytes, bytes)
            else open(path_or_bytes, "rb").read())
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF")
    pdf = _Pdf(data)

    page = img_num = None
    for num in pdf.index:
        v = pdf.obj(num)
        if isinstance(v, dict) and v.get("Type") == "/Page":
            page = v
            break
    if page is None:
        raise ValueError("PDF has no /Page object")
    res = pdf.deref(page.get("Resources", {}))
    xobjs = pdf.deref(res.get("XObject", {}))
    for name, ref in xobjs.items():
        v = pdf.deref(ref)
        if isinstance(v, dict) and v.get("Subtype") == "/Image":
            img_num = ref[1] if isinstance(ref, tuple) else None
            img = v
            break
    else:
        raise NotImplementedError("PDF page has no image XObject "
                                  "(vector-only pages need a renderer)")
    w = int(pdf.deref(img["Width"]))
    h = int(pdf.deref(img["Height"]))
    cs = pdf.deref(img.get("ColorSpace", "/DeviceGray"))
    filt = img.get("Filter")
    raw = pdf.stream(img_num)
    if filt == "/DCTDecode" or (isinstance(filt, list)
                                and "/DCTDecode" in filt):
        from ..functions.jpeg import decode_jpeg

        px = decode_jpeg(raw)
    else:
        palette = None
        if isinstance(cs, list) and cs and cs[0] == "/Indexed":
            n = int(pdf.deref(cs[2])) + 1
            lut = pdf.deref(cs[3])
            if isinstance(lut, str):
                lut = lut.encode("latin-1")
            palette = np.frombuffer(lut, np.uint8,
                                    count=n * 3).reshape(n, 3)
            nch = 1
        else:
            nch = 3 if cs == "/DeviceRGB" else 1
        px = np.frombuffer(raw, np.uint8,
                           count=h * w * nch).reshape(h, w, nch)
        px = px[:, :, 0] if nch == 1 else px
        if palette is not None:
            px = palette[px]

    gt = epsg = None
    vp = pdf.deref(page.get("VP"))
    if isinstance(vp, list) and vp:
        vp = pdf.deref(vp[0])
    if isinstance(vp, dict):
        meas = pdf.deref(vp.get("Measure"))
        if isinstance(meas, dict) and meas.get("Subtype") == "/GEO":
            gpts = [float(x) for x in pdf.deref(meas["GPTS"])]
            gcs = pdf.deref(meas.get("GCS", {}))
            epsg = int(pdf.deref(gcs.get("EPSG", 0))) or None
            lats = np.array(gpts[0::2])
            lons = np.array(gpts[1::2])
            if epsg:
                from ..functions.crs import Transformer

                g_epsg = _geogcs_of(epsg)
                if g_epsg != epsg:
                    xs, ys = Transformer(g_epsg, epsg).transform(lons,
                                                                 lats)
                else:
                    xs, ys = lons, lats
                # corners UL, LL, LR, UR over the image extent
                gt = (float(xs[0]), float((xs[3] - xs[0]) / w),
                      float((xs[1] - xs[0]) / h),
                      float(ys[0]), float((ys[3] - ys[0]) / w),
                      float((ys[1] - ys[0]) / h))
    return {"pixels": px, "gt": gt, "epsg": epsg, "driver": "PDF"}
