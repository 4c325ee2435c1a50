"""LVBAG (Dutch BAG 2.0) driver vs reference autotest (ogr_lvbag.py)."""

from gdal_ray.sources.lvbag import read_lvbag

D = "/root/reference/autotest/ogr/data/lvbag/"


def test_lvbag_lig():
    """test_ogr_lvbag_dataset_lig: 17 fields + full first feature."""
    t = read_lvbag(D + "lig.xml")["Ligplaats"]
    assert t.num_rows == 3
    assert t.num_columns == 18  # 17 fields + wkt
    assert t.column_names[:4] == [
        "hoofdadresNummeraanduidingRef", "nevenadresNummeraanduidingRef",
        "identificatie", "status"]
    r = t.to_pylist()[0]
    assert r["hoofdadresNummeraanduidingRef"] == \
        "NL.IMBAG.Nummeraanduiding.0106200000005333"
    assert r["nevenadresNummeraanduidingRef"] is None
    assert r["identificatie"] == "NL.IMBAG.Ligplaats.0106020000000003"
    assert r["status"] == "Plaats aangewezen"
    assert r["geconstateerd"] == 0
    assert r["documentDatum"] == "2009/05/26"
    assert r["documentNummer"] == "2009-01000"
    assert r["voorkomenIdentificatie"] == 1
    assert r["beginGeldigheid"] == "2009/05/26"
    assert r["eindGeldigheid"] is None
    assert r["tijdstipRegistratie"] == "2009/11/06 13:37:22"
    assert r["tijdstipRegistratieLV"] == "2009/11/06 14:07:51.498"
    assert r["wkt"].startswith("POLYGON ((231948.413 557767.07")


def test_lvbag_num():
    """test_ogr_lvbag_dataset_num incl. woonplaatsRef on feature 2."""
    t = read_lvbag(D + "num.xml")["Nummeraanduiding"]
    assert t.num_rows == 3 and t.num_columns == 22
    r0, r1 = t.to_pylist()[:2]
    assert r0["identificatie"] == \
        "NL.IMBAG.Nummeraanduiding.0106200000002798"
    assert r0["huisnummer"] == 23 and r0["postcode"] == "9403KB"
    assert r0["typeAdresseerbaarObject"] == "Verblijfsobject"
    assert r0["openbareruimteRef"] == \
        "NL.IMBAG.Openbareruimte.0106300000002560"
    assert r0["status"] == "Naamgeving uitgegeven"
    assert r0["documentdatum" if "documentdatum" in t.column_names
              else "documentDatum"] == "2009/09/14"
    assert r0["woonplaatsRef"] is None
    assert r0["tijdstipRegistratieLV"] == "2009/11/06 12:38:46.603"
    assert r1["huisnummer"] == 24 and r1["postcode"] == "9403KD"
    assert r1["woonplaatsRef"] == "NL.IMBAG.Woonplaats.1050"
    assert r1["tijdstipRegistratieLV"] == "2009/11/06 12:38:46.748"


def test_lvbag_opr_pnd_sta_vbo_wpl():
    t = read_lvbag(D + "opr.xml")["Openbareruimte"]
    assert t.num_rows == 4 and t.num_columns == 19
    rows = t.to_pylist()
    assert rows[0]["naam"] == "Twaalfsuurlaan"
    assert rows[0]["verkorteNaam"] is None
    assert rows[3]["naam"] == "Schout bij Nacht Doormansingel"
    assert rows[3]["verkorteNaam"] == "Sbn Doormansingel"

    t = read_lvbag(D + "pnd.xml")["Pand"]
    assert t.num_rows == 6
    years = [r["oorspronkelijkBouwjaar"] for r in t.to_pylist()]
    assert years[0] == 2009 and years[3] == 2007
    assert years[4] == 1975 and years[5] == 2001

    t = read_lvbag(D + "sta.xml")["Standplaats"]
    assert t.num_rows == 2 and t.num_columns == 18

    t = read_lvbag(D + "vbo.xml")["Verblijfsobject"]
    assert t.num_rows == 3
    assert t.to_pylist()[0]["wkt"].startswith("POINT (")

    t = read_lvbag(D + "wpl.xml")["Woonplaats"]
    assert t.num_rows == 2
    rows = t.to_pylist()
    assert rows[0]["naam"] == "Assen"
    assert rows[0]["identificatie"] == "NL.IMBAG.Woonplaats.2391"
    assert rows[1]["naam"] == "Loon"
    assert rows[1]["identificatie"] == "NL.IMBAG.Woonplaats.2392"
    assert rows[0]["wkt"].startswith("MULTIPOLYGON")


def test_lvbag_edge_cases():
    """identificatie zero-padding, old schema, string lists, zips."""
    assert read_lvbag(D + "pnd2.xml")["Pand"].to_pylist()[0][
        "identificatie"] == "NL.IMBAG.Pand.0571100000003518"
    assert read_lvbag(D + "lig_old.xml") == {}
    assert read_lvbag(D + "vbo2.xml")["Verblijfsobject"].to_pylist()[0][
        "gebruiksdoel"] == ["woonfunctie", "gezondheidszorgfunctie"]
    r = read_lvbag(D + "vbo3.xml")["Verblijfsobject"].to_pylist()[0]
    assert r["hoofdadresNummeraanduidingRef"] == \
        "NL.IMBAG.Nummeraanduiding.0518200000692257"
    assert r["nevenadresNummeraanduidingRef"] == [
        "NL.IMBAG.Nummeraanduiding.0518200000692258",
        "NL.IMBAG.Nummeraanduiding.0518200000692259",
        "NL.IMBAG.Nummeraanduiding.0518200000692260"]
    assert r["identificatie"] == \
        "NL.IMBAG.Verblijfsobject.0518010000692261"
    assert read_lvbag(D + "vbo4.xml")["Verblijfsobject"].to_pylist()[0][
        "pandRef"] == ["NL.IMBAG.Pand.0048100000002999",
                       "NL.IMBAG.Pand.1950100000100293"]
    assert read_lvbag(D + "file4.vbo")["Verblijfsobject"].to_pylist()[0][
        "pandRef"] == ["NL.IMBAG.Pand.0048100000002999",
                       "NL.IMBAG.Pand.1950100000100293"]
    # zip handling: 2 files x 2 pnd feats; mixed = 2 layers
    assert read_lvbag(D + "archive_pnd.zip")["Pand"].num_rows == 4
    assert set(read_lvbag(D + "archive_mixed.zip")) == {
        "Pand", "Standplaats"}
    assert list(read_lvbag(D + "archive_single.zip")) == ["Woonplaats"]
