"""XLSX / ODS spreadsheet drivers vs the reference's own autotest
expectations (autotest/ogr/ogr_xlsx.py, ogr_ods.py)."""

import pyarrow as pa
import pytest

from gdal_ray.sources.spreadsheet import (read_ods, read_xlsx, write_ods,
                                          write_xlsx)

XFX = "/root/reference/autotest/ogr/data/xlsx/"
OFX = "/root/reference/autotest/ogr/data/ods/"

EXPECTED_TYPES = ["String", "Integer", "Real", "Real", "Date", "DateTime",
                  "Real", "Time", "Real", "Integer", "Real", "DateTime"]


def _types(tab):
    return [f.metadata[b"ogr_type"].decode()
            for f in tab.schema if f.name != "fid"]


def test_xlsx_reference_check():
    """ogr_xlsx_check: 8 layers, Feuille1 26 features, Feuille7 field
    types + first-row values, FID=2 for first headered feature."""
    layers = read_xlsx(XFX + "test.xlsx")
    assert len(layers) == 8
    assert list(layers)[0] == "Feuille1"
    assert layers["Feuille1"].num_rows == 26
    t7 = layers["Feuille7"]
    assert _types(t7) == EXPECTED_TYPES
    r0 = t7.to_pylist()[0]
    vals = [v for k, v in r0.items() if k != "fid"]
    assert r0["fid"] == 2
    assert vals[0] == "val" and vals[1] == 23
    assert vals[2] == 3.45 and vals[3] == 0.52
    assert vals[4] == "2012/01/22"
    assert vals[5] == "2012/01/22 18:49:00"
    # second feature: field 2 unset
    r1 = t7.to_pylist()[1]
    assert list(r1.values())[3] is None


def test_xlsx_headers_disable_and_string_types():
    layers = read_xlsx(XFX + "test.xlsx", headers="DISABLE")
    assert layers["Feuille7"].num_rows == 3
    layers = read_xlsx(XFX + "test.xlsx", field_types="STRING")
    t7 = layers["Feuille7"]
    assert all(t == "String" for t in _types(t7))


def test_xlsx_inline_str_force_headers():
    layers = read_xlsx(XFX + "inlineStr.xlsx", headers="FORCE")
    t = layers["inlineStr"]
    assert t.num_rows == 1
    r = t.to_pylist()[0]
    assert r["Bl_District_t"] == "text6"
    assert float(r["Lat"]) == pytest.approx(23.6247122, abs=1e-5)


def test_xlsx_edge_fixtures():
    # not_all_columns_present (sparse r refs)
    t = list(read_xlsx(XFX + "not_all_columns_present.xlsx").values())[0]
    r = t.to_pylist()[0]
    for i in (0, 27, 28, 29):
        assert r["Field%d" % (i + 1)] == "val%d" % (i + 1)
    # absolute target path in rels
    t = list(read_xlsx(XFX + "absolute_sheet_filename.xlsx").values())[0]
    assert t.num_rows >= 1
    # types picked up when row 1 lacks data; 18 fields
    t = read_xlsx(XFX + "test_missing_row1_data.xlsx")["Sheet1"]
    names = [f.name for f in t.schema if f.name != "fid"]
    assert names[0] == "Asset Reference" and len(names) == 18
    t = read_xlsx(XFX + "test_empty_last_field.xlsx")["Sheet1"]
    assert len([f for f in t.schema if f.name != "fid"]) == 18
    # row without r attribute
    t = list(read_xlsx(XFX + "row_without_r_attribute.xlsx").values())[0]
    assert t.to_pylist() == [{"fid": 2, "ID": 1, "NAME": "TEST123"}]
    # xml namespace prefix on spreadsheetml elements
    t = list(read_xlsx(XFX + "with_xml_prefix.xlsx").values())[0]
    assert t.num_rows == 1


def test_xlsx_datetime_rendering():
    t = list(read_xlsx(XFX + "datetime.xlsx").values())[0]
    col0 = [f.name for f in t.schema if f.name != "fid"][0]
    assert t.column(col0).to_pylist() == [
        "2020/04/07 09:58:00", "2020/04/07 09:58:01", "2020/04/07 09:58:02",
        "2020/04/07 09:58:03", "2020/04/07 09:58:04", "2020/04/07 09:58:05",
        "2020/04/07 10:03:00", "2020/04/07 10:10:00", "2020/04/07 10:29:00",
        "2020/04/07 10:42:00"]


def test_xlsx_inline_formatting_cells():
    t = list(read_xlsx(XFX + "cells_with_inline_formatting.xlsx").values())[0]
    cols = [f.name for f in t.schema if f.name != "fid"]
    got = [(r[cols[0]], r[cols[1]], r[cols[2]]) for r in t.to_pylist()]
    assert got == [(1, "text 2", "text 3"), (2, "text 4", "text5")]


def test_ods_reference_check():
    layers = read_ods(OFX + "test.ods")
    assert len(layers) == 8
    assert layers["Feuille1"].num_rows == 26
    t7 = layers["Feuille7"]
    assert _types(t7) == EXPECTED_TYPES
    r0 = t7.to_pylist()[0]
    vals = [v for k, v in r0.items() if k != "fid"]
    assert vals[0] == "val" and vals[1] == 23
    assert vals[4] == "2012/01/22" and vals[5] == "2012/01/22 18:49:00"


def test_ods_kspread_and_text_p():
    layers = read_ods(OFX + "test_kspread.ods")
    t7 = layers["Feuille7"]
    r0 = t7.to_pylist()[0]
    vals = [v for k, v in r0.items() if k != "fid"]
    # kspread stores the datetime column as text (ogr_ods.py:142)
    assert vals[5] == "22/01/2012 18:49:00"
    assert vals[7] == "12:34:56"
    t = list(read_ods(OFX + "multiple_text_p_elements.ods").values())[0]
    assert t.to_pylist()[1]["value"] == "First line\nSecond line"
    t = list(read_ods(OFX + "testrepeatedcolatendofrow.ods").values())[0]
    assert t.num_rows == 2 and t.num_columns == 9


def _sample_table():
    return pa.table({
        "fid": pa.array([1, 2], pa.int64()),
        "name": pa.array(["a", "bé"], pa.string()),
        "n": pa.array([3, None], pa.int32()),
        "x": pa.array([1.5, -2.25], pa.float64()),
        "d": pa.array(["2021/03/04", "1999/12/31"], pa.string()),
        "ts": pa.array(["2021/03/04 05:06:07", None], pa.string()),
        "tm": pa.array(["23:59:58", "00:00:01"], pa.string()),
    }, schema=pa.schema([
        pa.field("fid", pa.int64()),
        pa.field("name", pa.string(), metadata={"ogr_type": "String"}),
        pa.field("n", pa.int32(), metadata={"ogr_type": "Integer"}),
        pa.field("x", pa.float64(), metadata={"ogr_type": "Real"}),
        pa.field("d", pa.string(), metadata={"ogr_type": "Date"}),
        pa.field("ts", pa.string(), metadata={"ogr_type": "DateTime"}),
        pa.field("tm", pa.string(), metadata={"ogr_type": "Time"}),
    ]))


@pytest.mark.parametrize("writer,reader", [(write_xlsx, read_xlsx),
                                           (write_ods, read_ods)])
def test_roundtrip(writer, reader):
    src = _sample_table()
    data = writer({"layer1": src})
    back = reader(data)["layer1"]
    assert _types(back) == ["String", "Integer", "Real", "Date",
                            "DateTime", "Time"]
    rows = back.to_pylist()
    assert rows[0]["name"] == "a" and rows[1]["name"] == "bé"
    assert rows[0]["n"] == 3 and rows[1]["n"] is None
    assert rows[0]["x"] == 1.5 and rows[1]["x"] == -2.25
    assert rows[0]["d"] == "2021/03/04" and rows[1]["d"] == "1999/12/31"
    assert rows[0]["ts"] == "2021/03/04 05:06:07"
    assert rows[0]["tm"] == "23:59:58" and rows[1]["tm"] == "00:00:01"


def test_spreadsheet_dataset_sharded(ray_session):
    from gdal_ray.sources.spreadsheet import spreadsheet_dataset

    ds = spreadsheet_dataset(XFX + "test.xlsx", "Feuille1")
    assert ds.count() == 26
    fids = sorted(r["fid"] for r in ds.take_all())
    assert fids == read_xlsx(XFX + "test.xlsx")["Feuille1"]["fid"].to_pylist()


def test_xls_biff8():
    """ogr_xls.py test_ogr_xls_1: one layer, 5 typed fields, value
    goldens (BIFF8 in OLE2, incl. mini-stream and SST paths)."""
    from gdal_ray.sources.xls import read_xls

    L = read_xls("/root/reference/autotest/ogr/data/xls/test972000xp.xls")
    assert list(L) == ["Feuille1"]
    t = L["Feuille1"]
    assert t.num_rows == 3
    assert _types(t) == ["Integer", "Real", "String", "Date", "DateTime"]
    r0, r1, r2 = t.to_pylist()
    assert r0["FirstCol"] == 1 and r0["SecondCol"] == 1.0
    assert r0["ThirdCol"] is None
    assert r0["FourthCol"] == "1980/01/01"
    assert r0["FifthCol"] == "1980/01/01 00:00:00"
    assert r1["SecondCol"] == 2.5 and r1["ThirdCol"] == "Val2"
    assert r2["ThirdCol"] == "Val_avec_é"
