"""GTFS transit-feed vector driver (reference
ogr/ogrsf_frmts/gtfs/ogrgtfsdriver.cpp).

A GTFS feed is a zip (or directory) of ``.txt`` CSVs.  Every
parsable .txt becomes a layer (files whose first line is not a
header — like error_warning.txt in the autotest extract — are
skipped, matching the reference's ``field_1`` probe).  Field typing
per the reference (``:125-162``): stop/shape lat+lon and
shape_dist_traveled -> Real, date/start_date/end_date -> Date
(YYYY/MM/DD), arrival_time/departure_time -> Time, ``*_type`` and
stop_sequence and shape_pt_sequence -> Integer, weekday flags ->
Boolean.  Geometry:

- ``stops`` / ``shapes``: POINT from (stop|shape_pt)_lon/lat;
- ``trips``: LINESTRING joining stop_times (ordered by
  stop_sequence) to stop coordinates per trip_id
  (PrepareTripsData, ``:190-260``);
- ``shapes_geom``: one LINESTRING per shape_id from shapes.txt
  ordered by shape_pt_sequence (``:373-470``).
"""

from __future__ import annotations

import io
import zipfile

import numpy as np
import pyarrow as pa
import pyarrow.csv as pacsv


def _read_member(data: bytes) -> pa.Table | None:
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError:
        text = data.decode("latin-1")
    first = text.splitlines()[0] if text else ""
    if "," not in first:
        return None  # not a header line -> skipped like 'field_1'
    try:
        tab = pacsv.read_csv(
            io.BytesIO(text.encode("utf-8")),
            convert_options=pacsv.ConvertOptions(
                column_types={}, strings_can_be_null=True),
            parse_options=pacsv.ParseOptions(newlines_in_values=True))
    except Exception:
        return None
    return tab


_WEEKDAYS = {"monday", "tuesday", "wednesday", "thursday", "friday",
             "saturday", "sunday"}


def _retype(tab: pa.Table, name: str) -> pa.Table:
    import pyarrow.compute as pc

    out = {}
    for col in tab.column_names:
        arr = tab[col]
        c = col.lower()
        def as_str():
            return pc.cast(arr, pa.string()) if arr.type != pa.string() \
                else arr
        if c in ("stop_lat", "stop_lon", "shape_pt_lat", "shape_pt_lon",
                 "shape_dist_traveled"):
            out[col] = pc.cast(arr, pa.float64())
        elif c in ("shape_pt_sequence", "stop_sequence") or "_type" in c:
            try:
                out[col] = pc.cast(arr, pa.int32())
            except Exception:
                out[col] = arr
        elif c in ("date", "start_date", "end_date"):
            s = as_str()
            out[col] = pc.replace_substring_regex(
                s, r"^(\d{4})(\d{2})(\d{2})$", r"\1/\2/\3")
        elif c in ("arrival_time", "departure_time"):
            out[col] = as_str()
        elif c in _WEEKDAYS:
            try:
                out[col] = pc.cast(arr, pa.int32())
            except Exception:
                out[col] = arr
        else:
            out[col] = as_str()
    return pa.table(out)


def read_gtfs(path: str) -> dict[str, pa.Table]:
    """-> {layer: Arrow table} with a ``wkt`` column on the
    geometric layers."""
    members: dict[str, bytes] = {}
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            for n in z.namelist():
                if n.endswith(".txt"):
                    members[n[:-4]] = z.read(n)
    else:
        import os

        for n in os.listdir(path):
            if n.endswith(".txt"):
                with open(os.path.join(path, n), "rb") as f:
                    members[n[:-4]] = f.read()

    layers: dict[str, pa.Table] = {}
    for name in sorted(members):
        tab = _read_member(members[name])
        if tab is None:
            continue
        tab = _retype(tab, name)
        if name == "stops" and {"stop_lat", "stop_lon"} <= set(
                tab.column_names):
            wkt = ["POINT (%.6f %.6f)" % (lo, la) for lo, la in
                   zip(tab["stop_lon"].to_pylist(),
                       tab["stop_lat"].to_pylist())]
            tab = tab.append_column("wkt", pa.array(wkt, pa.string()))
        elif name == "shapes" and {"shape_pt_lat", "shape_pt_lon"} <= set(
                tab.column_names):
            wkt = ["POINT (%.6f %.6f)" % (lo, la) for lo, la in
                   zip(tab["shape_pt_lon"].to_pylist(),
                       tab["shape_pt_lat"].to_pylist())]
            tab = tab.append_column("wkt", pa.array(wkt, pa.string()))
        layers[name] = tab

    # trips -> LINESTRING via stop_times ⋈ stops
    if "trips" in layers and "stop_times" in layers and "stops" in layers:
        stops = layers["stops"]
        coord = {sid: (lo, la) for sid, lo, la in zip(
            stops["stop_id"].to_pylist(), stops["stop_lon"].to_pylist(),
            stops["stop_lat"].to_pylist())}
        st = layers["stop_times"]
        per_trip: dict[str, list] = {}
        for tid, sid, seq in zip(st["trip_id"].to_pylist(),
                                 st["stop_id"].to_pylist(),
                                 st["stop_sequence"].to_pylist()):
            if sid in coord:
                per_trip.setdefault(tid, []).append((seq, coord[sid]))
        wkts = []
        for tid in layers["trips"]["trip_id"].to_pylist():
            pts = sorted(per_trip.get(tid, []))
            if len(pts) >= 2:
                wkts.append("LINESTRING (%s)" % ",".join(
                    "%.6f %.6f" % p[1] for p in pts))
            else:
                wkts.append(None)
        layers["trips"] = layers["trips"].append_column(
            "wkt", pa.array(wkts, pa.string()))

    # shapes_geom: one LINESTRING per shape_id
    if "shapes" in layers:
        sh = layers["shapes"]
        per_shape: dict[str, list] = {}
        for sid, seq, lo, la in zip(sh["shape_id"].to_pylist(),
                                    sh["shape_pt_sequence"].to_pylist(),
                                    sh["shape_pt_lon"].to_pylist(),
                                    sh["shape_pt_lat"].to_pylist()):
            per_shape.setdefault(str(sid), []).append((seq, lo, la))
        ids, wkts = [], []
        for sid in sorted(per_shape):
            pts = sorted(per_shape[sid])
            ids.append(sid)
            wkts.append("LINESTRING (%s)" % ",".join(
                "%.10g %.10g" % (lo, la) for _s, lo, la in pts))
        layers["shapes_geom"] = pa.table(
            {"shape_id": pa.array(ids, pa.string()),
             "wkt": pa.array(wkts, pa.string())})
    return layers
