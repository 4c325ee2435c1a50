"""Reference-corpus robustness sweeps: every autotest fixture of a
family must either parse or fail for a documented reason (the
corpora include intentionally-corrupt/malicious files — XML bombs,
truncations — which MUST keep failing)."""
import glob
import os

import pytest

A = "/root/reference/autotest"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(A), reason="reference fixtures unavailable")

# files that are SUPPOSED to fail (corrupt / malicious / env-blocked)
GML_EXPECTED_FAIL = {"billionlaugh.gml", "huge_attribute_end.gml",
                     "huge_attribute_start.gml", "huge_geom_end.gml",
                     "huge_geom_start.gml"}
KML_EXPECTED_FAIL = {"truncated.kml"}


def test_gml_corpus():
    from gdal_ray.sources.gml import read_gml

    files = sorted(glob.glob(f"{A}/ogr/data/gml/*.gml"))
    assert len(files) >= 50
    for p in files:
        name = os.path.basename(p)
        if name in GML_EXPECTED_FAIL:
            with pytest.raises(Exception):
                read_gml(p)     # XML bomb / truncation must not parse
        else:
            read_gml(p)


def test_kml_corpus():
    from gdal_ray.sources.kml import read_kml

    for p in sorted(glob.glob(f"{A}/ogr/data/kml/*.kml")):
        name = os.path.basename(p)
        if name in KML_EXPECTED_FAIL:
            with pytest.raises(Exception):
                read_kml(p)
        else:
            read_kml(p)


def test_kml_degenerate_geometry_matrix():
    from gdal_ray.sources.kml import read_kml

    lay = read_kml(f"{A}/ogr/data/kml/geometries.kml")
    (t,) = lay.values()
    assert t.num_rows == 25     # every degenerate placemark opens


def test_kml_junk_after_document():
    from gdal_ray.sources.kml import read_kml

    # the fixture is an empty <kml/> followed by junk: it must OPEN
    # (expat junk tolerated like the reference) with zero features
    lay = read_kml(f"{A}/ogr/data/kml/junk_content_after_valid_doc.kml")
    assert isinstance(lay, dict)
    assert sum(t.num_rows for t in lay.values()) == 0


def test_gml_space_in_tuple_coordinates():
    from gdal_ray.sources.gml import read_gml

    lay = read_gml(f"{A}/ogr/data/gml/ogr_gml_55.gml")
    t = next(iter(lay.values())) if isinstance(lay, dict) else lay
    assert t.num_rows == 1


def test_netcdf_corpus_incl_nc4():
    from gdal_ray.sources.netcdf import nc_list_variables

    files = sorted(glob.glob(f"{A}/gdrivers/data/netcdf/*.nc"))
    ok = 0
    for p in files:
        try:
            nc_list_variables(open(p, "rb").read())
            ok += 1
        except Exception:
            pass
    # classic CDF + netCDF-4-via-HDF5; >= 107 of the 109 fixtures
    assert ok >= 107


def test_hdf5_corpus():
    from gdal_ray.sources.hdf5 import open_hdf5

    files = sorted(glob.glob(f"{A}/gdrivers/data/hdf5/*.h5") +
                   glob.glob(f"{A}/gdrivers/data/hdf5/*.hdf5"))
    ok = sum(1 for p in files if _try(open_hdf5, p))
    assert ok >= 23


def test_shp_corpus():
    from gdal_ray.functions.wkb import wkb_to_geom
    from gdal_ray.sources.shapefile import read_shapefile

    files = sorted(glob.glob(f"{A}/ogr/data/shp/*.shp") +
                   glob.glob(f"{A}/ogr/data/*.shp"))
    assert len(files) >= 45
    for p in files:
        read_shapefile(p)   # every fixture opens (corrupt records
        #                     degrade to null geometry, missing .dbf
        #                     / .shx tolerated like the reference)
    t = read_shapefile(f"{A}/ogr/data/shp/pointz_without_m.shp")
    g = wkb_to_geom(t["geometry"][0].as_py())
    assert g.kind == 1 and list(g.rings[0][0]) == [1.0, 2.0]
    assert g.zs[0][0] == 3.0
    t = read_shapefile(f"{A}/ogr/data/shp/emptymultipoint.shp")
    assert t["geometry"][0].as_py() is None


def test_gpkg_corpus():
    from gdal_ray.sources.gpkg import list_layers, read_gpkg_layer

    for p in sorted(glob.glob(f"{A}/ogr/data/gpkg/*.gpkg")):
        for layer in list_layers(p):
            read_gpkg_layer(p, layer)


def _try(fn, p):
    try:
        fn(p)
        return True
    except Exception:
        return False
