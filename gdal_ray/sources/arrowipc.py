"""Arrow IPC / Feather V2 vector driver (reference
ogr/ogrsf_frmts/arrow/: OGR reads/writes .arrow/.feather files with a
``geo`` schema-metadata JSON describing the geometry column — the
same convention as GeoParquet; WKB is the portable encoding,
ogrfeatherwriterlayer.cpp GEOMETRY_ENCODING=WKB option).

The Feather V2 file format IS the Arrow IPC file format: a footer
indexes every record batch, so shards address batches directly
(`pa.ipc.open_file(...).get_batch(i)`) — the Dataset reader fans
batches out one task each, no full-file scan per shard.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.ipc as paipc


def _geo_meta(geometry_col: str, crs_epsg: int | None) -> bytes:
    meta = {
        "version": "1.0.0",
        "primary_column": geometry_col,
        "columns": {geometry_col: {
            "encoding": "WKB",
            "geometry_types": [],
        }},
    }
    if crs_epsg is not None:
        meta["columns"][geometry_col]["crs"] = f"EPSG:{crs_epsg}"
    return json.dumps(meta).encode()


def write_feather(path: str, table: pa.Table, *,
                  geometry_col: str = "geometry",
                  crs_epsg: int | None = None,
                  batch_rows: int = 65536) -> None:
    """Write an Arrow layer as a Feather V2 / Arrow IPC file with OGR's
    ``geo`` metadata. 65536 rows per batch is the reference's Arrow
    batch size (ogrlayerarrow.cpp:1947)."""
    md = dict(table.schema.metadata or {})
    if geometry_col in table.column_names:
        md[b"geo"] = _geo_meta(geometry_col, crs_epsg)
    schema = table.schema.with_metadata(md)
    with paipc.new_file(path, schema) as w:
        for b in table.replace_schema_metadata(md).to_batches(
                max_chunksize=batch_rows):
            w.write_batch(b)


def feather_geo_info(path: str) -> dict | None:
    """The parsed ``geo`` metadata (or None for plain Arrow files)."""
    with paipc.open_file(path) as r:
        md = r.schema.metadata or {}
    raw = md.get(b"geo")
    return json.loads(raw) if raw else None


def read_feather(path: str, columns: list[str] | None = None) -> pa.Table:
    with paipc.open_file(path) as r:
        t = r.read_all()
    return t.select(columns) if columns else t


def feather_dataset(path: str, columns: list[str] | None = None,
                    num_shards: int = 8):
    """Feather file -> Ray Dataset: the IPC footer gives random batch
    access, so each task reads only its record batches."""
    import ray.data

    with paipc.open_file(path) as r:
        n_batches = r.num_record_batches
        schema = r.schema
    num_shards = max(1, min(num_shards, n_batches))
    bounds = np.linspace(0, n_batches, num_shards + 1).astype(int)
    shards = [{"path": path, "b0": int(bounds[i]), "b1": int(bounds[i + 1])}
              for i in range(num_shards)]

    def load(b: pa.Table) -> pa.Table:
        tabs = []
        for row in b.to_pylist():
            with paipc.open_file(row["path"]) as r:
                for i in range(row["b0"], row["b1"]):
                    tabs.append(pa.Table.from_batches([r.get_batch(i)]))
        if not tabs:
            return pa.table({f.name: pa.array([], f.type)
                             for f in schema}).select(
                columns) if columns else pa.table(
                {f.name: pa.array([], f.type) for f in schema})
        out = pa.concat_tables(tabs)
        out = out.replace_schema_metadata(None)
        return out.select(columns) if columns else out

    return (ray.data.from_items(shards, override_num_blocks=num_shards)
            .map_batches(load, batch_format="pyarrow", batch_size=1))
