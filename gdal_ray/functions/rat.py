"""Raster attribute tables (VERDICT r3 directive #6).

Re-derives gcore/gdal_rat.cpp GDALDefaultRasterAttributeTable as an
Arrow-native side table: columns carry (name, type, usage) like
GDALRATFieldType/GDALRATFieldUsage, rows live in a pyarrow Table so a
RAT rides Dataset pipelines as ordinary relational data.

GetRowOfValue follows gdal_rat.cpp:GetRowOfValue: linear binning
(row0min/binsize) when set, else the MinMax (or Min+Max pair) column
lookup.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa

# GDALRATFieldType (gdal.h)
GFT_Integer, GFT_Real, GFT_String = 0, 1, 2
# GDALRATFieldUsage
(GFU_Generic, GFU_PixelCount, GFU_Name, GFU_Min, GFU_Max, GFU_MinMax,
 GFU_Red, GFU_Green, GFU_Blue, GFU_Alpha) = range(10)

_PA_TYPES = {GFT_Integer: pa.int64(), GFT_Real: pa.float64(),
             GFT_String: pa.string()}


@dataclass
class RATColumn:
    name: str
    type: int
    usage: int
    values: list = field(default_factory=list)


class RasterAttributeTable:
    """gdal_rat.cpp GDALDefaultRasterAttributeTable semantics."""

    def __init__(self):
        self.columns: list[RATColumn] = []
        self.row_count = 0
        self.linear_binning: tuple[float, float] | None = None

    # --- construction -------------------------------------------------
    def create_column(self, name: str, ftype: int, usage: int) -> int:
        default = 0 if ftype == GFT_Integer else (
            0.0 if ftype == GFT_Real else "")
        self.columns.append(RATColumn(
            name, ftype, usage, [default] * self.row_count))
        return len(self.columns) - 1

    def set_row_count(self, n: int) -> None:
        for c in self.columns:
            default = 0 if c.type == GFT_Integer else (
                0.0 if c.type == GFT_Real else "")
            if n > len(c.values):
                c.values.extend([default] * (n - len(c.values)))
            else:
                del c.values[n:]
        self.row_count = n

    def set_value(self, row: int, col: int, v) -> None:
        self.columns[col].values[row] = v

    def set_linear_binning(self, row0_min: float, bin_size: float) -> None:
        self.linear_binning = (row0_min, bin_size)

    # --- queries ------------------------------------------------------
    def get_value(self, row: int, col: int):
        return self.columns[col].values[row]

    def col_by_usage(self, usage: int) -> int:
        for i, c in enumerate(self.columns):
            if c.usage == usage:
                return i
        return -1

    def get_row_of_value(self, v: float) -> int:
        """gdal_rat.cpp GetRowOfValue: linear binning first, then the
        MinMax column, then a Min/Max column pair."""
        if self.linear_binning is not None:
            row0, size = self.linear_binning
            row = int(np.floor((v - row0) / size))
            return row if 0 <= row < self.row_count else -1
        imm = self.col_by_usage(GFU_MinMax)
        if imm >= 0:
            vals = self.columns[imm].values
            for i in range(self.row_count):
                if vals[i] == v:
                    return i
            # real-valued MinMax columns bin [v_i, v_{i+1})
            for i in range(self.row_count - 1):
                if vals[i] <= v < vals[i + 1]:
                    return i
            return -1
        imin = self.col_by_usage(GFU_Min)
        imax = self.col_by_usage(GFU_Max)
        if imin >= 0 and imax >= 0:
            lo = self.columns[imin].values
            hi = self.columns[imax].values
            for i in range(self.row_count):
                if lo[i] <= v <= hi[i]:
                    return i
        return -1

    def clone(self) -> "RasterAttributeTable":
        out = RasterAttributeTable()
        out.row_count = self.row_count
        out.linear_binning = self.linear_binning
        for c in self.columns:
            out.columns.append(RATColumn(c.name, c.type, c.usage,
                                         list(c.values)))
        return out

    # --- Arrow bridge -------------------------------------------------
    def to_arrow(self) -> pa.Table:
        """The RAT as an Arrow side table (column metadata under
        b'rat_usage'/b'rat_type' field metadata)."""
        fields, arrays = [], []
        for c in self.columns:
            fields.append(pa.field(
                c.name, _PA_TYPES[c.type],
                metadata={b"rat_usage": str(c.usage).encode(),
                          b"rat_type": str(c.type).encode()}))
            arrays.append(pa.array(c.values, _PA_TYPES[c.type]))
        return pa.table(dict(zip([f.name for f in fields], arrays))
                        ).cast(pa.schema(fields))

    @classmethod
    def from_arrow(cls, tab: pa.Table) -> "RasterAttributeTable":
        out = cls()
        out.row_count = tab.num_rows
        for f in tab.schema:
            usage = int((f.metadata or {}).get(b"rat_usage", b"0"))
            ftype = int((f.metadata or {}).get(
                b"rat_type",
                b"2" if pa.types.is_string(f.type)
                else (b"1" if pa.types.is_floating(f.type) else b"0")))
            out.columns.append(RATColumn(
                f.name, ftype, usage, tab[f.name].to_pylist()))
        return out
