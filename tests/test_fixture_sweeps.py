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


def test_gif_corpus():
    from gdal_ray.sources.gif import decode_gif, gif_info

    for p in sorted(glob.glob(f"{A}/gdrivers/data/gif/*.gif")):
        info = gif_info(open(p, "rb").read())
        if info["driver"] == "GIF":     # BIGGIF opens lazily only
            decode_gif(open(p, "rb").read())
    big = gif_info(open(f"{A}/gdrivers/data/gif/fakebig.gif", "rb").read())
    assert big == {"width": 32767, "height": 32767, "driver": "BIGGIF"}


def test_bmp_corpus():
    from gdal_ray.sources.bmp import decode_bmp

    files = sorted(glob.glob(f"{A}/gcore/data/**/*.bmp", recursive=True))
    assert len(files) >= 5
    for p in files:
        decode_bmp(open(p, "rb").read())


def test_hfa_corpus_incl_spill():
    from gdal_ray.sources.hfa import decode_hfa

    for p in sorted(glob.glob(f"{A}/gdrivers/data/hfa/*.img")):
        ige = p[:-4] + ".ige"
        decode_hfa(open(p, "rb").read(),
                   ige=open(ige, "rb").read() if os.path.exists(ige)
                   else None)


def test_grib_corpus():
    from gdal_ray.sources.grib1 import read_grib1
    from gdal_ray.sources.grib2 import read_grib2

    files = sorted(glob.glob(f"{A}/gdrivers/data/grib/*.grb") +
                   glob.glob(f"{A}/gdrivers/data/grib/*.grb2") +
                   glob.glob(f"{A}/gdrivers/data/grib/*.grib2"))
    ok = 0
    for p in files:
        d = open(p, "rb").read()
        i = d.find(b"GRIB")
        try:
            (read_grib2 if d[i + 7] == 2 else read_grib1)(d)
            ok += 1
        except Exception:
            pass
    assert len(files) >= 41 and ok == len(files)


def test_grib1_polar_stereographic():
    # autotest grib.py test_grib_grib1_south_polar_stereographic
    # (the fixture ships as a vsisparse .begin prefix + zero region)
    from gdal_ray.sources.grib1 import read_grib1

    d = open(f"{A}/gdrivers/data/grib/south_polar_stereo_grib1.grb.begin",
             "rb").read()
    i = d.find(b"GRIB")
    total = int.from_bytes(d[i + 4:i + 7], "big")
    msg = d[i:] + b"\0" * (total - len(d[i:]))
    bands, gt, metas = read_grib1(msg)
    exp = (-3243994.6063763676, 7673.0, 0.0,
           3286668.2989108698, 0.0, -7673.0)
    assert all(abs(a - b) < 1e-6 * max(1.0, abs(b))
               for a, b in zip(gt, exp))
    assert metas[0]["proj"]["proj"] == "stere"
    assert metas[0]["proj"]["lat_ts"] == -60.0
    assert bands[0].shape == (786, 834)


ZARR_ENV_BLOCKED = ("blosc", "lz4.", "zstd", "imagecodecs_tiff")


def test_zarr_corpus_and_goldens():
    import numpy as np

    from gdal_ray.sources.zarr import open_zarr, read_zarr_array

    Z = f"{A}/gdrivers/data/zarr"
    for p in sorted(glob.glob(f"{Z}/*.zarr")):
        name = os.path.basename(p)
        if any(s in name for s in ZARR_ENV_BLOCKED):
            with pytest.raises(NotImplementedError):
                for a in open_zarr(p).values():
                    a.read()
            continue
        for a in open_zarr(p).values():
            a.read()
    # golden values straight from autotest zarr_driver.py
    assert read_zarr_array(
        f"{Z}/delta_filter_i4.zarr").read().tolist() == list(range(10))
    assert read_zarr_array(f"{Z}/shuffle.zarr").read().tolist() == [1, 2]
    q = read_zarr_array(f"{Z}/quantize.zarr").read().ravel()
    assert q[:5].tolist() == [0.0, 0.125, 0.1875, 0.3125, 0.375]
    f = read_zarr_array(
        f"{Z}/fixedscaleoffset_dtype_f8_astype_u2.zarr").read()
    assert np.round(f, 6).tolist() == [
        1000.0, 1000.1, 1000.2, 1000.3, 1000.4,
        1000.6, 1000.7, 1000.8, 1000.9, 1001.0]
    c = read_zarr_array(f"{Z}/compound_well_aligned.zarr").read()
    assert c.tolist() == [(1000, 3000), (4000, 5000), (0, 0)]
    s = read_zarr_array(f"{Z}/order_f_s3.zarr").read().ravel()
    assert [v.decode() for v in s[:4]] == ["000", "111", "222", "333"]
    assert read_zarr_array(
        f"{Z}/unicode_le.zarr").read().tolist() == ["é"]
    assert read_zarr_array(f"{Z}/lzma.zarr").read().tolist() == [1, 2]


def test_csv_corpus():
    from gdal_ray.sources.ogrcsv import read_csv_layer

    files = sorted(glob.glob(f"{A}/ogr/data/csv/*.csv") +
                   glob.glob(f"{A}/ogr/data/csv/*.tsv") +
                   glob.glob(f"{A}/ogr/data/csv/*.psv"))
    assert len(files) >= 21
    for p in files:
        read_csv_layer(p)
    # field 0 named 'id' despite the UTF-8 BOM (ogr_csv.py test 22)
    t = read_csv_layer(f"{A}/ogr/data/csv/csv_with_utf8_bom.csv")
    assert t.column_names[0] == "id"
    # quoted header fields may contain line breaks
    t = read_csv_layer(f"{A}/ogr/data/csv/header_with_line_break.csv")
    assert len(t.column_names) == 7 and t.num_rows == 3


def test_sqlite_corpus():
    from gdal_ray.sources.spatialite import list_layers, read_sqlite_layer

    files = sorted(glob.glob(f"{A}/ogr/data/sqlite/*.sqlite") +
                   glob.glob(f"{A}/ogr/data/sqlite/*.db"))
    assert len(files) >= 3
    for p in files:
        for lay in list_layers(p):
            read_sqlite_layer(p, lay[0])


def test_dxf_corpus_incl_recursive_insert():
    from gdal_ray.sources.dxf import read_dxf

    for p in sorted(glob.glob(f"{A}/ogr/data/dxf/*.dxf")):
        read_dxf(p)
    # ogr_dxf.py test_ogr_dxf_43: recursive pair expands to ONE feature
    feats = read_dxf(f"{A}/ogr/data/dxf/insert-recursive-pair.dxf")
    assert len(feats) == 1


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
