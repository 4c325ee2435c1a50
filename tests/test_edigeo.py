"""EDIGEO driver over a synthesized French-cadastre-style lot
(reference autotest data is download-only; format parity per
ogr/ogrsf_frmts/edigeo/ogredigeodatasource.cpp)."""
import struct

import numpy as np
import pytest

from gdal_ray.sources.edigeo import is_edigeo, read_edigeo


def _write_lot(tmp_path):
    from gdal_ray.sources.edigeo import synth_edigeo_lot

    return synth_edigeo_lot(tmp_path)


def test_identify(tmp_path):
    thf = _write_lot(tmp_path)
    assert is_edigeo(thf)
    p = tmp_path / "x.thf"
    p.write_text("BOMT 12:X\n")
    assert not is_edigeo(str(p))


def test_layers_and_order(tmp_path):
    lay = read_edigeo(_write_lot(tmp_path))
    assert lay.pop("__epsg__") == 2154
    # OGREDIGEOSortForQGIS: polygons first (nTypeB - nTypeA), then
    # lines, then points
    assert list(lay.keys()) == ["PARCELLE_id", "ZONCOMMUNI_id", "BORNE_id"]


def test_parcel_polygon_and_attrs(tmp_path):
    lay = read_edigeo(_write_lot(tmp_path))
    t = lay["PARCELLE_id"]
    assert t.num_rows == 1
    assert t.column_names == ["fid", "OBJECT_RID", "IDU", "SUPF",
                              "CREAT_DATE", "UPDATE_DATE", "geometry"]
    assert t["OBJECT_RID"][0].as_py() == "Fea_01"
    assert t["IDU"][0].as_py() == "AB0123456789"
    assert t["SUPF"][0].as_py() == 123.5
    assert t["CREAT_DATE"][0].as_py() == 20200115
    assert t["UPDATE_DATE"][0].as_py() == 20230601
    wkb = t["geometry"][0].as_py()
    kind = struct.unpack("<I", wkb[1:5])[0]
    assert kind == 3
    n = struct.unpack("<I", wkb[9:13])[0]
    pts = np.frombuffer(wkb[13:13 + 16 * n]).reshape(n, 2)
    # closed square ring chaining Arc_01 + reversed Arc_02
    assert pts[0].tolist() == [0.0, 0.0]
    assert pts[-1].tolist() == [0.0, 0.0]
    assert {tuple(p) for p in pts} == {(0, 0), (10, 0), (10, 10), (0, 10)}


def test_point_and_line(tmp_path):
    lay = read_edigeo(_write_lot(tmp_path))
    p = lay["BORNE_id"]
    wkb = p["geometry"][0].as_py()
    assert struct.unpack("<I", wkb[1:5])[0] == 1
    assert struct.unpack("<dd", wkb[5:21]) == (2.5, 3.5)
    # BORNE has QAL dates too
    assert p["CREAT_DATE"][0].as_py() == 20200115
    line = lay["ZONCOMMUNI_id"]
    wkb = line["geometry"][0].as_py()
    assert struct.unpack("<I", wkb[1:5])[0] == 2
    n = struct.unpack("<I", wkb[5:9])[0]
    assert n == 2
    pts = np.frombuffer(wkb[9:9 + 16 * n]).reshape(n, 2)
    assert pts.tolist() == [[5.0, 5.0], [6.0, 7.0]]


def test_unified_vector_open(tmp_path):
    from gdal_ray.sources.vector_open import open_vector

    thf = _write_lot(tmp_path)
    lay = open_vector(thf)
    assert "PARCELLE_id" in lay


def test_rejects_non_edigeo(tmp_path):
    p = tmp_path / "bad.thf"
    p.write_text("HELLO\n")
    with pytest.raises(ValueError):
        read_edigeo(str(p))
