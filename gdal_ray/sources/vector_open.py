"""GDALOpenEx-style unified vector open: probe a path by extension /
magic bytes and return every layer as an engine-shaped Arrow table
(``fid:int64`` + ``geometry:binary(WKB)`` + typed attribute columns).

The vector counterpart of sources/raster_open.py — the dispatch the
reference does through its driver registry (gcore/gdaldataset.cpp:3621
GDALOpenEx probing, here over the engine's pure-Python OGR drivers).
Used directly and as the SrcDataSource resolver of the OGR VRT driver
(sources/ogrvrt.py).
"""
from __future__ import annotations

import os

import pyarrow as pa


def _table_with_fid(t: pa.Table) -> pa.Table:
    if "fid" not in t.column_names:
        t = t.add_column(0, "fid",
                         pa.array(range(t.num_rows), pa.int64()))
    return t


def _read_dbf_only(path: str) -> pa.Table:
    """Attribute-only dBase table (the shapefile driver's behavior for
    a bare .dbf — ogrshapelayer.cpp with hSHP == NULL)."""
    from .shapefile import _read_dbf_meta, _read_dbf_rows

    nrec, _, _, fields = _read_dbf_meta(path)
    cols = _read_dbf_rows(path, 0, nrec)
    out = {"fid": pa.array(range(nrec), pa.int64())}
    for name, vals in cols.items():
        out[name] = pa.array(vals)
    return pa.table(out)


def vector_layers(path: str) -> list[str]:
    return list(open_vector(path).keys())


def open_vector(path: str) -> dict[str, pa.Table]:
    """Open any supported vector source; returns {layer_name: table}."""
    stem = os.path.splitext(os.path.basename(path))[0]
    lower = path.lower()

    if lower.endswith((".vrt",)) or (
            not os.path.exists(path)
            and path.lstrip().startswith("<OGRVRTDataSource")):
        from .ogrvrt import read_ogrvrt

        return read_ogrvrt(path)
    if lower.endswith(".shp"):
        from .shapefile import read_shapefile

        return {stem: read_shapefile(path)}
    if lower.endswith(".dbf"):
        shp = path[:-4] + ".shp"
        if os.path.exists(shp):
            from .shapefile import read_shapefile

            return {stem: read_shapefile(shp)}
        return {stem: _read_dbf_only(path)}
    if lower.endswith(".gpkg"):
        from .gpkg import list_layers, read_gpkg_layer

        return {name: _table_with_fid(read_gpkg_layer(path, name))
                for name in list_layers(path)}
    if lower.endswith(".duckdb"):
        from .adbc import read_duckdb

        return read_duckdb(path)
    if lower.endswith((".sqlite", ".db")):
        from .spatialite import list_layers, read_sqlite_layer

        return {name: _table_with_fid(read_sqlite_layer(path, name))
                for name, _, _ in list_layers(path)}
    if lower.endswith((".json", ".geojson")):
        from .geojson import read_geojson

        return {stem: _table_with_fid(read_geojson(path))}
    if lower.endswith((".geojsonl", ".geojsons", ".ndjson")):
        from .geojson import read_geojsonseq

        return {stem: _table_with_fid(read_geojsonseq(path))}
    if lower.endswith(".fgb"):
        from .fgb import read_fgb

        return {stem: _table_with_fid(read_fgb(path))}
    if lower.endswith(".csv"):
        from .ogrcsv import read_csv_layer

        return {stem: _table_with_fid(read_csv_layer(path))}
    if lower.endswith(".gpx"):
        from .gpx import read_gpx

        return {k: _table_with_fid(v)
                for k, v in read_gpx(path).items()}
    if lower.endswith(".kml"):
        from .kml import read_kml

        return {k: _table_with_fid(v)
                for k, v in read_kml(path).items()}
    if lower.endswith((".gml", ".xml")):
        from .gml import read_gml

        return {k: _table_with_fid(v)
                for k, v in read_gml(path).items()}
    if lower.endswith((".mif", ".mid")):
        from .mif import read_mif

        base = os.path.splitext(path)[0]
        mid = None
        for ext in (".mid", ".MID"):
            if os.path.exists(base + ext):
                mid = open(base + ext, encoding="latin-1").read()
        return {stem: _table_with_fid(
            read_mif(open(base + ".mif", encoding="latin-1").read(),
                     mid))}
    if lower.endswith(".tab"):
        from .mitab import read_tab

        return {stem: _table_with_fid(read_tab(path))}
    if lower.endswith(".gmt"):
        from .gmtvec import read_gmt

        return {stem: _table_with_fid(read_gmt(path))}
    if lower.endswith(".sxf"):
        from .sxf import read_sxf

        base = os.path.splitext(path)[0]
        rsc = next((base + ext for ext in (".rsc", ".RSC")
                    if os.path.exists(base + ext)), None)
        return read_sxf(path, rsc_path=rsc)
    if lower.endswith((".sos", ".sosi")):
        from .sosi import read_sosi

        lay = read_sosi(path)
        lay.pop("__epsg__", None)
        return lay
    if lower.endswith(".map"):
        from .wasp import read_wasp

        return {stem: read_wasp(path)}
    if lower.endswith(".slf"):
        from .selafin import selafin_layers

        return selafin_layers(path)
    if lower.endswith(".nc"):
        from .netcdf_sg import read_nc_sg

        return {k: v["table"] for k, v in read_nc_sg(path).items()}
    if lower.endswith(".dwg"):
        from .cad import read_cad

        return read_cad(path)
    if lower.endswith(".mapml"):
        from .mapml import read_mapml

        return read_mapml(path)
    if lower.endswith(".thf"):
        from .edigeo import read_edigeo

        lay = read_edigeo(path)
        lay.pop("__epsg__", None)
        return lay
    if lower.endswith(".xodr"):
        from .xodr import read_xodr

        lay = read_xodr(path)
        lay.pop("__proj4__", None)
        return lay
    if lower.endswith(".vct"):
        from .idrisi_vct import read_vct

        return {stem: _table_with_fid(read_vct(path)["table"])}
    raise ValueError(f"open_vector: unrecognized vector source {path}")
