"""OGR CSV driver (reference ogr/ogrsf_frmts/csv/ogrcsvlayer.cpp):
comma/semicolon/tab/pipe-separated tables with

- ``.csvt`` sidecar declaring column types (ogrcsvlayer.cpp:415-533:
  String, Integer, Integer(Boolean), Integer64, Real, Date, Time,
  DateTime, WKT, CoordX, CoordY) — else OGR-style type autodetection
  (Integer -> Integer64 -> Real -> String, ogrcsvlayer.cpp:1024-1122);
- geometry from a WKT/_WKT-prefixed column (ogrcsvlayer.cpp:555-577)
  or from X/Y possible-name coordinate columns (lon/lat/x/y, the
  driver's X_POSSIBLE_NAMES defaults), emitted as a ``geometry`` WKB
  column; raw columns are kept (KEEP_GEOM_COLUMNS default true,
  ogrcsvdatasource.cpp:112);
- writer with AS_WKT / AS_XY geometry modes and optional CREATE_CSVT.

Parsing is pyarrow.csv (vectorized C++), so a sharded Dataset read
(`csv_dataset`, byte-range ownership identical to the GeoJSONSeq
reader) parses and WKB-encodes task-side at Arrow speed.
"""

from __future__ import annotations

import io
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv

from ..functions.wkb import (Geom, geom_to_wkb, geom_to_wkt, points_to_wkb,
                             wkb_to_geom, wkt_to_geom)
from .geojson import _read_shard

X_POSSIBLE = ("x", "lon", "long", "longitude", "easting")
Y_POSSIBLE = ("y", "lat", "latitude", "northing")

_CSVT_TO_ARROW = {
    "string": pa.string(),
    "integer": pa.int32(),
    "integer(boolean)": pa.bool_(),
    "integer64": pa.int64(),
    "real": pa.float64(),
    "date": pa.string(),      # kept textual (OGR Date), cast by callers
    "time": pa.string(),
    "datetime": pa.timestamp("us"),
    "wkt": pa.string(),
    "coordx": pa.float64(),
    "coordy": pa.float64(),
}


def _detect_sep(header_line: str) -> str:
    counts = {s: header_line.count(s) for s in (",", ";", "\t", "|")}
    return max(counts, key=counts.get) if max(counts.values()) else ","


def _read_csvt(path: str) -> list[str] | None:
    csvt = os.path.splitext(path)[0] + ".csvt"
    if not os.path.exists(csvt):
        return None
    with open(csvt, encoding="utf-8") as f:
        line = f.readline().strip()
    out = []
    for t in line.split(","):
        t = t.strip().strip('"').lower()
        # strip width/precision qualifiers: Integer(6), Real(10.2) —
        # but keep the Integer(Boolean) subtype (ogrcsvlayer.cpp:475)
        if "(" in t and t != "integer(boolean)":
            t = t[:t.index("(")]
        out.append(t)
    return out


def _header_and_sep(path: str, sep: str | None):
    with open(path, "rb") as f:
        head = f.read(65536)
    # quote-aware scan for the end of the header RECORD (a quoted
    # header field may contain line breaks — header_with_line_break)
    in_q = False
    end = len(head)
    for i, b in enumerate(head):
        if b == 0x22:
            in_q = not in_q
        elif b in (0x0A,) and not in_q:
            end = i + 1
            break
    hdr_len = end
    first = head[:end].decode("utf-8-sig").rstrip("\r\n")
    sep = sep or _detect_sep(first.splitlines()[0] if first else first)
    # quote-aware field split of the header record
    names, cur, in_q = [], [], False
    for ch in first:
        if ch == '"':
            in_q = not in_q
        elif ch == sep and not in_q:
            names.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    names.append("".join(cur))
    names = [n.strip().strip('"') for n in names]
    # Arrow needs unique column names; the reference warns and keeps
    # duplicates positionally — suffix later occurrences
    seen: dict[str, int] = {}
    for i, n in enumerate(names):
        k = seen.get(n, 0)
        seen[n] = k + 1
        if k:
            names[i] = f"{n}_{k}"
    return names, sep, hdr_len


def _parse_shard(raw: bytes, names: list[str], sep: str,
                 types: list[str] | None) -> pa.Table:
    if not raw.strip():
        cols = {n: pa.array([], _CSVT_TO_ARROW.get((types or [])[i].lower(),
                                                   pa.string())
                            if types else pa.string())
                for i, n in enumerate(names)}
        return pa.table(cols)
    col_types = None
    if types:
        col_types = {n: _CSVT_TO_ARROW.get(t, pa.string())
                     for n, t in zip(names, types)}
    try:
        return pacsv.read_csv(
            io.BytesIO(raw),
            read_options=pacsv.ReadOptions(column_names=names),
            parse_options=pacsv.ParseOptions(delimiter=sep),
            convert_options=pacsv.ConvertOptions(column_types=col_types))
    except pa.ArrowInvalid as e:
        if "conversion error" in str(e):
            # mixed-type column: the reference's default is all-string
            # fields (autodetect is opt-in) — fall back to strings
            return pacsv.read_csv(
                io.BytesIO(raw),
                read_options=pacsv.ReadOptions(column_names=names),
                parse_options=pacsv.ParseOptions(delimiter=sep),
                convert_options=pacsv.ConvertOptions(
                    column_types={n: pa.string() for n in names}))
        # ragged rows: the reference ignores extra fields and
        # null-pads short rows (ogrcsvlayer.cpp tuple handling)
        import csv as _csv

        rd = _csv.reader(io.StringIO(raw.decode("utf-8", "replace")),
                         delimiter=sep)
        rows = [(r + [None] * len(names))[:len(names)]
                for r in rd if r]
        cols = {}
        for i, n in enumerate(names):
            arr = pa.array([r[i] for r in rows], pa.string())
            # keep .csvt-declared types: only the ragged fields are
            # padded/ignored, declared columns cast back (empty
            # strings are null under the declared type)
            want = col_types.get(n) if col_types else None
            if want is not None and want != pa.string():
                try:
                    clean = pc.replace_substring_regex(arr, r"^\s*$", "")
                    clean = pc.if_else(pc.equal(clean, ""),
                                       pa.nulls(len(arr), pa.string()),
                                       clean)
                    arr = clean.cast(want)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                    pass
            cols[n] = arr
        return pa.table(cols)


def _attach_geometry(tab: pa.Table, names: list[str],
                     types: list[str] | None) -> pa.Table:
    """Add a `geometry` WKB column per the driver's resolution order:
    .csvt WKT / CoordX/CoordY first, then WKT-named columns, then
    X/Y possible names."""
    lower = [n.lower() for n in names]
    wkt_col = cx = cy = None
    if types:
        for n, t in zip(names, (t.lower() for t in types)):
            if t == "wkt" and wkt_col is None:
                wkt_col = n
            elif t == "coordx":
                cx = n
            elif t == "coordy":
                cy = n
    if wkt_col is None and (cx is None or cy is None):
        for n, ln in zip(names, lower):
            if ln == "wkt" or ln.startswith("_wkt"):
                wkt_col = n
                break
        if wkt_col is None:
            cx = next((n for n, ln in zip(names, lower)
                       if ln in X_POSSIBLE), None)
            cy = next((n for n, ln in zip(names, lower)
                       if ln in Y_POSSIBLE), None)
    if wkt_col is not None:
        def _wkb_or_null(v):
            if not v:
                return None
            try:
                return geom_to_wkb(wkt_to_geom(v))
            except ValueError:
                return None     # unparsable WKT -> null geometry
        wkb = [_wkb_or_null(v) for v in tab[wkt_col].to_pylist()]
        return tab.append_column("geometry", pa.array(wkb, pa.binary()))
    if cx is not None and cy is not None:
        x = np.asarray(tab[cx].to_pandas(), np.float64)
        y = np.asarray(tab[cy].to_pandas(), np.float64)
        return tab.append_column("geometry",
                                 pa.array(points_to_wkb(x, y), pa.binary()))
    return tab


def read_csv_layer(path: str, sep: str | None = None,
                   columns: list[str] | None = None) -> pa.Table:
    """Whole-file read (driver-side, small layers)."""
    names, sep, hdr_len = _header_and_sep(path, sep)
    types = _read_csvt(path)
    with open(path, "rb") as f:
        f.seek(hdr_len)
        raw = f.read()
    tab = _attach_geometry(_parse_shard(raw, names, sep, types), names, types)
    return tab.select(columns) if columns else tab


def csv_dataset(path: str, sep: str | None = None,
                columns: list[str] | None = None, num_shards: int = 8):
    """CSV file -> Ray Dataset, byte-range sharded (header excluded);
    parse + WKB geometry encode run task-side."""
    import ray.data

    names, sep, hdr_len = _header_and_sep(path, sep)
    types = _read_csvt(path)
    size = os.path.getsize(path)
    num_shards = max(1, min(num_shards, max(1, (size - hdr_len) // (1 << 14))))
    bounds = np.linspace(hdr_len, size, num_shards + 1).astype(np.int64)
    shards = [{"path": path, "start": int(bounds[i]),
               "end": int(bounds[i + 1])} for i in range(num_shards)]

    def load(batch: pa.Table) -> pa.Table:
        tabs = []
        for row in batch.to_pylist():
            # ownership contract: the first shard starts exactly at the
            # header end (owns its first line); later shards skip into
            # the next line — reuse the geojson shard reader by
            # offsetting starts by one so shard 0's "start > 0" skip
            # never fires on a line boundary it owns
            start, end = row["start"], row["end"]
            raw = (_read_shard(row["path"], start - 1, end, size)
                   if start == hdr_len else
                   _read_shard(row["path"], start, end, size))
            t = _parse_shard(raw, names, sep, types)
            if t.num_rows:
                tabs.append(_attach_geometry(t, names, types))
        if not tabs:
            return _attach_geometry(
                _parse_shard(b"", names, sep, types), names, types)
        out = pa.concat_tables(tabs, promote_options="default")
        return out.select(columns) if columns else out

    return (ray.data.from_items(shards, override_num_blocks=num_shards)
            .map_batches(load, batch_format="pyarrow", batch_size=1))


def _csvt_type(field: pa.Field) -> str:
    t = field.type
    if pa.types.is_boolean(t):
        return "Integer(Boolean)"
    if pa.types.is_int32(t) or pa.types.is_int16(t) or pa.types.is_int8(t):
        return "Integer"
    if pa.types.is_integer(t):
        return "Integer64"
    if pa.types.is_floating(t):
        return "Real"
    if pa.types.is_timestamp(t):
        return "DateTime"
    return "String"


def write_csv_layer(path: str, table: pa.Table, *,
                    geometry: str | None = "AS_WKT", sep: str = ",",
                    create_csvt: bool = False, precision: int = 15) -> None:
    """Write an Arrow layer (geometry as WKB binary column) to CSV.

    geometry: "AS_WKT" emits a WKT column; "AS_XY" emits X,Y point
    columns (points only); None drops geometry.
    """
    import csv as _stdcsv

    cols = [n for n in table.column_names if n != "geometry"]
    geoms: list[Geom | None] | None = None
    if "geometry" in table.column_names and geometry:
        geoms = [wkb_to_geom(b) if b is not None else None
                 for b in table["geometry"].to_pylist()]
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = _stdcsv.writer(f, delimiter=sep)
        hdr = list(cols)
        if geoms is not None and geometry == "AS_WKT":
            hdr = ["WKT"] + hdr
        elif geoms is not None and geometry == "AS_XY":
            hdr = ["X", "Y"] + hdr
        w.writerow(hdr)
        data = [table[c].to_pylist() for c in cols]
        for i in range(table.num_rows):
            row = [data[j][i] for j in range(len(cols))]
            if geoms is not None and geometry == "AS_WKT":
                g = geoms[i]
                row = [geom_to_wkt(g, precision) if g else ""] + row
            elif geoms is not None and geometry == "AS_XY":
                g = geoms[i]
                if g is not None and g.kind != 1:  # wkbPoint
                    raise ValueError("AS_XY requires point geometries")
                row = ([f"{g.rings[0][0, 0]:.{precision}g}",
                        f"{g.rings[0][0, 1]:.{precision}g}"] if g
                       else ["", ""]) + row
            w.writerow(row)
    if create_csvt:
        types = []
        if geoms is not None and geometry == "AS_WKT":
            types.append("WKT")
        elif geoms is not None and geometry == "AS_XY":
            types += ["CoordX", "CoordY"]
        types += [_csvt_type(table.schema.field(c)) for c in cols]
        with open(os.path.splitext(path)[0] + ".csvt", "w") as f:
            f.write(",".join(f'"{t}"' for t in types) + "\n")
