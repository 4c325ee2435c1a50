"""VSI virtual-filesystem analog (reference port/cpl_vsi.h: /vsimem/,
/vsizip/, /vsicurl/ ... virtual file handlers layered under every
driver).

Ray-Data-native mapping: the engine's readers accept VSI-style paths
and dispatch to the right Arrow/ray.data source:

- ``/vsimem/<name>``       — in-memory buffer registry (vsimem);
  reads go through ``pa.BufferReader`` (zero-copy).
- ``/vsizip/<zip>/<member>`` — member-of-zip (vsizip); the zip is
  read once, the member decompressed in-process.
- anything else            — local/remote path handed to
  ``ray.data.read_parquet`` with an explicit pyarrow FileSystem
  (LocalFileSystem / SubTreeFileSystem — the SubTree indirection is
  the hook where S3FileSystem/GcsFileSystem drop in unchanged on a
  real cluster; no network exists in this sandbox).

vsimem/vsizip sources are driver-local by nature (in-memory bytes);
they return `ray.data.from_arrow` datasets. File-backed paths stream
through the normal distributed parquet reader.
"""

from __future__ import annotations

import io
import zipfile

import pyarrow as pa
import pyarrow.parquet as pq

_MEM: dict[str, bytes] = {}


def vsimem_write(name: str, data: bytes) -> str:
    """Register an in-memory file; returns its /vsimem/ path."""
    _MEM[name] = bytes(data)
    return f"/vsimem/{name}"


def vsimem_unlink(name: str) -> None:
    _MEM.pop(name, None)


def vsi_open_bytes(path: str) -> bytes:
    """VSIFOpen analog: raw bytes of any VSI path."""
    if path.startswith("/vsimem/"):
        name = path[len("/vsimem/"):]
        if name not in _MEM:
            raise FileNotFoundError(path)
        return _MEM[name]
    if path.startswith("/vsizip/"):
        rest = path[len("/vsizip/"):]
        # split at the first member that exists inside the archive
        parts = rest.split("/")
        for cut in range(len(parts) - 1, 0, -1):
            zpath = "/" + "/".join(parts[:cut]) if not parts[0].startswith(
                "vsimem") else None
            zpath = "/".join(parts[:cut])
            if not zpath.startswith("/"):
                zpath = "/" + zpath
            member = "/".join(parts[cut:])
            try:
                zbytes = vsi_open_bytes(zpath) if zpath.startswith(
                    ("/vsimem/", "/vsizip/")) else open(zpath, "rb").read()
            except (FileNotFoundError, IsADirectoryError, NotADirectoryError):
                continue
            with zipfile.ZipFile(io.BytesIO(zbytes)) as zf:
                return zf.read(member)
        raise FileNotFoundError(path)
    with open(path, "rb") as f:
        return f.read()


def vsi_read_parquet(path: str, columns: list[str] | None = None):
    """Open a parquet source through the VSI dispatch; returns a Ray
    Dataset."""
    import ray.data

    if path.startswith(("/vsimem/", "/vsizip/")):
        buf = vsi_open_bytes(path)
        t = pq.read_table(pa.BufferReader(buf), columns=columns)
        return ray.data.from_arrow(t)
    from pyarrow import fs

    return ray.data.read_parquet(path, columns=columns,
                                 filesystem=fs.LocalFileSystem())
