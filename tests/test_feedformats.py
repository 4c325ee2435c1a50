"""GTFS, DIMAP, PDS4, JML drivers vs the reference's autotest
expectations."""

import os
import shutil

import pyarrow.compute as pc
import pytest

from gdal_ray.functions.checksum import checksum_image

OGR = "/root/reference/autotest/ogr/data/"
GDR = "/root/reference/autotest/gdrivers/data/"


@pytest.fixture(scope="module")
def gtfs_layers():
    from gdal_ray.sources.gtfs import read_gtfs

    return read_gtfs(OGR + "gtfs/gtfs_extract.zip")


def test_gtfs_layer_set(gtfs_layers):
    """9 layers; error_warning.txt skipped (no header)."""
    assert len(gtfs_layers) == 9
    assert "shapes_geom" in gtfs_layers
    assert "error_warning" not in gtfs_layers


def test_gtfs_values(gtfs_layers):
    assert gtfs_layers["agency"].num_rows == 1
    assert gtfs_layers["agency"].to_pylist()[0]["agency_name"] == "SOLEA"
    assert gtfs_layers["calendar"].to_pylist()[0]["start_date"] == \
        "2023/01/02"
    routes = gtfs_layers["routes"]
    assert len(routes.filter(pc.equal(routes["route_type"], 3))) == 30
    r = gtfs_layers["stops"].to_pylist()[0]
    assert r["arrival_time"] == "05:37:00"
    assert r["wkt"] == "POINT (7.280823 47.763704)"


def test_gtfs_trips_and_shapes_geometry(gtfs_layers):
    t = gtfs_layers["trips"].to_pylist()[0]
    assert t["wkt"].startswith(
        "LINESTRING (7.280823 47.763704,7.278051 47.762217,"
        "7.278683 47.760148,7.284615 47.761364")
    sg = gtfs_layers["shapes_geom"]
    assert sg.num_rows == 1
    g = sg.to_pylist()[0]
    assert g["shape_id"] == "80013"
    assert g["wkt"].startswith("LINESTRING (7.28084 47.763684,"
                               "7.28073 47.76364,")


@pytest.fixture(scope="module")
def dimap_dir():
    d = "/tmp/gdal_ray_fixtures/dimap"
    os.makedirs(d, exist_ok=True)
    for f in ("METADATA.DIM", "IMAGERY.TIF"):
        shutil.copy(GDR + "dimap/" + f, d)
    shutil.copy("/root/reference/autotest/gcore/data/rgbsmall.tif", d)
    return d


def test_dimap(dimap_dir):
    """gdrivers/dimap.py test_dimap_1 goldens."""
    from gdal_ray.sources.dimap import read_dimap

    px, gcps, meta = read_dimap(dimap_dir + "/METADATA.DIM")
    assert px.shape == (6000, 6000)
    assert checksum_image(px[:100, :100]) == 21586
    assert meta["PROCESSING_LEVEL"] == "1A"
    assert meta["SPECTRAL_PHYSICAL_BIAS"] == "0.000000"
    assert len(gcps) == 4
    assert gcps[0]["pixel"] == 0.5 and gcps[0]["line"] == 0.5
    assert gcps[0]["x"] == pytest.approx(4.3641728, abs=2e-7)
    assert gcps[0]["y"] == pytest.approx(44.2082255, abs=2e-7)
    assert gcps[0]["z"] == pytest.approx(0, abs=2e-7)


@pytest.mark.parametrize("name", ["byte_pds4_cart_1700",
                                  "byte_pds4_cart_1b00",
                                  "byte_pds4_cart_1d00_1933",
                                  "byte_pds4_cart_1g00_1950"])
def test_pds4_cart_versions(name):
    """gdrivers/pds4.py test_pds4_read_cart_versions: cs 4672 + gt."""
    from gdal_ray.sources.pds4 import read_pds4

    px, gt, meta = read_pds4(GDR + "pds4/" + name + ".xml")
    assert checksum_image(px) == 4672
    assert gt == (-59280.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    assert meta["projection"] == "Transverse Mercator"
    assert meta["central_meridian"] == -117.0


def test_jml():
    """ogr_jml.py test_ogr_jml_1 field/value/style/geometry goldens."""
    from gdal_ray.sources.jml import read_jml

    t = read_jml(OGR + "jml/test.jml")
    names = [c for c in t.column_names if c not in ("style", "wkt")]
    assert names == ["first_property", "another_property", "objectAttr",
                     "attr2", "attr3", "int", "double", "date", "datetime",
                     "R_G_B", "not_ignored"]
    assert t.num_rows == 3
    r0, r1, r2 = t.to_pylist()
    assert r0["first_property"] == "even"
    assert r0["another_property"] == "rouault"
    assert r0["objectAttr"] == "foo" and r0["attr2"] == "bar"
    assert r0["attr3"] == "baz" and r0["int"] == 123
    assert r0["double"] == 1.23
    assert r0["date"] == "2014/10/18 00:00:00"
    assert r0["datetime"] == "2014/10/18 21:36:45"
    assert r0["R_G_B"] == "0000FF"
    assert r0["style"] == "BRUSH(fc:#0000FF)"
    assert r0["wkt"].replace(", ", ",") == \
        "POLYGON ((0 0,0 10,10 10,10 0,0 0))"
    assert r1["datetime"] == "2014/10/18 21:36:45+02"
    assert r1["style"] == "PEN(c:#FF00FF)"
    assert r1["wkt"] == "POINT (-1 -1)"
    assert r2["wkt"] is None


def test_jml_srid_point():
    from gdal_ray.sources.jml import read_jml

    t = read_jml(OGR + "jml/one_point_srid_4326.jml")
    assert t.num_rows == 1
    assert t.to_pylist()[0]["wkt"].startswith("POINT (26.4696785714")


def test_safe_sentinel1():
    """gdrivers/safe.py: band checksums 65372 (IW_VH) / 3732 (IW_VV)
    + manifest footprint."""
    from gdal_ray.sources.safe import read_safe

    bands, names, fp = read_safe(
        GDR + "SAFE_FAKE/test.SAFE/manifest.safe")
    assert names == ["IW_VH", "IW_VV"]
    assert checksum_image(bands[0]) == 65372
    assert checksum_image(bands[1]) == 3732
    assert fp.replace(", ", ",") == (
        "POLYGON((-8.407759 38.130520,-11.335915 38.535374,"
        "-11.026125 40.036644,-8.035001 39.633217,"
        "-8.407759 38.130520))").replace(", ", ",")


def test_dimap2_single_component():
    """gdrivers/dimap.py test_dimap_2_single_component: 4 bands
    20x30 from the two-tile mosaic, metadata keys."""
    from gdal_ray.sources.dimap import read_dimap2

    for p in (GDR + "dimap2/single_component",
              GDR + "dimap2/single_component/VOL_PHR.XML",
              GDR + "dimap2/single_component/DIM_foo.XML"):
        px, meta = read_dimap2(p)
        assert px.shape == (30, 20, 4)
        assert meta["MISSION"] == "PHR"
        assert meta["IMAGING_DATE"] == "2016-06-17"
        assert meta["PROCESSING_LEVEL"] == "SENSOR"
        assert meta["SPECTRAL_PROCESSING"] == "PMS"
        assert checksum_image(px[:, :, 0]) == 7024


def test_safe_wv_subdatasets():
    """gdrivers/safe.py test_safe_WV: 10 subdatasets with the
    SENTINEL1_CALIB naming, per-vignette GCP counts 1 and 2."""
    from gdal_ray.sources.safe import read_safe_calib, safe_subdatasets

    wv = GDR + "SAFE_FAKE_WV"
    subs = safe_subdatasets(wv)
    assert len(subs) == 10
    names = [s for s, _ in subs]
    man = wv + "/manifest.safe"
    assert f"SENTINEL1_CALIB:SIGMA0:{man}:WV1_VV_001:INTENSITY" in names
    assert f"SENTINEL1_CALIB:SIGMA0:{man}:WV2_VV_002:INTENSITY" in names

    rd = read_safe_calib(
        f"SENTINEL1_CALIB:SIGMA0:{man}:WV1_VV_001:INTENSITY")
    assert len(rd["gcps"]) == 1
    rd = read_safe_calib(
        f"SENTINEL1_CALIB:SIGMA0:{man}:WV2_VV_002:INTENSITY")
    assert len(rd["gcps"]) == 2
    # the WV fixture's calibration XML is fake: structural open only,
    # like the reference whose LUT parse fails at block-read time
    assert rd["pixels"] is None
    assert rd["size"] == (4500, 4774)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        read_safe_calib(names[0] + "xxxx")


def test_safe_calib_uncalib_amplitude():
    """gdrivers/safe.py tests 3/4: UNCALIB AMPLITUDE subdatasets match
    the plain band checksums (65372 VH / 3732 VV)."""
    from gdal_ray.sources.safe import read_safe_calib, safe_subdatasets

    man = GDR + "SAFE_FAKE/test.SAFE/manifest.safe"
    subs = safe_subdatasets(man)
    names = [s for s, _ in subs]
    assert f"SENTINEL1_CALIB:UNCALIB:{man}:IW_VH:AMPLITUDE" in names
    rd = read_safe_calib(f"SENTINEL1_CALIB:UNCALIB:{man}:IW_VH:AMPLITUDE")
    assert checksum_image(rd["pixels"]) == 65372
    rd = read_safe_calib(f"SENTINEL1_CALIB:UNCALIB:{man}:IW_VV:AMPLITUDE")
    assert checksum_image(rd["pixels"]) == 3732


def test_safe_calibrated_lut_math():
    """Synthesized calibration LUT: sigma0 = DN^2 / A^2 with bilinear
    line/pixel interpolation."""
    import numpy as np

    from gdal_ray.sources.safe import read_safe_calib

    import os
    import shutil
    import tempfile

    src = GDR + "SAFE_FAKE/test.SAFE"
    with tempfile.TemporaryDirectory() as d:
        dst = os.path.join(d, "test.SAFE")
        shutil.copytree(src, dst)
        ann = [f for f in os.listdir(os.path.join(dst, "annotation"))
               if f.endswith(".xml") and "vv" in f][0]
        cal_path = os.path.join(dst, "annotation", "calibration",
                                "calibration-" + ann)
        with open(cal_path, "w") as f:
            f.write("""<calibration><calibrationVectorList count="2">
<calibrationVector><azimuthTime>t0</azimuthTime><line>0</line>
<pixel count="2">0 9999</pixel>
<sigmaNought>2.0 2.0</sigmaNought></calibrationVector>
<calibrationVector><azimuthTime>t1</azimuthTime><line>9999</line>
<pixel count="2">0 9999</pixel>
<sigmaNought>2.0 2.0</sigmaNought></calibrationVector>
</calibrationVectorList></calibration>""")
        man = os.path.join(dst, "manifest.safe")
        rd_cal = read_safe_calib(
            f"SENTINEL1_CALIB:SIGMA0:{man}:IW_VV:INTENSITY")
        rd_raw = read_safe_calib(
            f"SENTINEL1_CALIB:UNCALIB:{man}:IW_VV:INTENSITY")
        assert rd_cal["pixels"] is not None
        assert np.allclose(rd_cal["pixels"],
                           rd_raw["pixels"] / 4.0, rtol=1e-6)
