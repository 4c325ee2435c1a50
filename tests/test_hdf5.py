"""HDF5 reader vs the reference's own autotest goldens.

Expectations transcribed from autotest/gdrivers/hdf5.py and
autotest/gdrivers/bag.py (checksums, subdataset lists, metadata
flattening, CSK georeferencing).
"""
import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.hdf5 import (
    HDF5File, csk_georef, hdf5_band_metadata, hdf5_flat_metadata,
    hdf5_subdatasets, open_hdf5, open_hdf5_raster, parse_hdf5_path,
    read_hdf5_array,
)

D = "/root/reference/autotest/gdrivers/data/hdf5/"
NC = "/root/reference/autotest/gdrivers/data/netcdf/"


def test_groups_subdatasets():
    """test_hdf5_2: 2 subdatasets, alphabetical DFS order."""
    sds = hdf5_subdatasets(D + "groups.h5")
    assert sds == [
        'HDF5:"%sgroups.h5"://MyGroup/Group_A/dset2' % D,
        'HDF5:"%sgroups.h5"://MyGroup/dset1' % D,
    ]


def test_u8be_checksum():
    """test_hdf5_3/4: big-endian uint8 array, cs 135."""
    a = read_hdf5_array(D + "u8be.h5", "/TestArray")
    assert a.shape == (6, 5)
    assert checksum_image(a) == 135


def test_groups_dset1_checksum():
    """test_hdf5_5: >i4 dataset inside nested group, cs 18."""
    a = read_hdf5_array(D + "groups.h5", "/MyGroup/dset1")
    assert a.dtype == np.dtype(">i4")
    assert checksum_image(a) == 18


def test_metadata_flattening():
    """test_hdf5_8: attribute names are path parts + attr name joined
    with '_', spaces -> '_'; f32 values render with %.8g."""
    m = hdf5_flat_metadata(D + "metadata.h5")
    groups = ["G1", "Group with spaces", "Group_with_underscores",
              "Group with spaces_and_underscores"]
    dsets = ["D1", "Dataset with spaces", "Dataset_with_underscores",
             "Dataset with spaces_and_underscores"]
    attrs = {"attribute": "value", "attribute with spaces": 0,
             "attribute_with underscores": 0,
             "attribute with spaces_and_underscores": 0.1}

    def scan(parts):
        for attr, want in attrs.items():
            name = "_".join(parts + [attr]).replace(" ", "_")
            assert name in m, name
            got = type(want)(m.pop(name).strip(" d"))
            assert got == want, (name, got, want)

    scan([])
    for d in dsets:
        scan([d])
    for g in groups:
        scan([g])
        for d in dsets:
            scan([g, d])


def test_vlstr_metadata():
    """test_hdf5_9: variable-length string attributes via the global
    heap."""
    m = hdf5_flat_metadata(D + "vlstr_metadata.h5")
    assert m["TEST_BANDNAMES"] == "SAA"
    assert m["TEST_NOVALUE"] == "255"
    assert m["TEST_CODING"].startswith("0.6666666667")


def test_csk_dgm_gcps():
    """test_hdf5_10: L1B product exposes corner GCPs (X=lon, Y=lat)."""
    geo = csk_georef(D + "CSK_DGM.h5", "/S01/SBI")
    gcps = geo["gcps"]
    assert len(gcps) == 4
    assert gcps[0]["pixel"] == 0 and gcps[0]["line"] == 0
    assert gcps[0]["x"] == pytest.approx(12.2395902509238, abs=1e-5)
    assert gcps[0]["y"] == pytest.approx(44.7280047434954, abs=1e-5)


def test_csk_gec_geotransform():
    """test_hdf5_11: L1C product exposes the UTM geotransform."""
    geo = csk_georef(D + "CSK_GEC.h5", "/S01/SBI")
    gt = geo["geotransform"]
    want = (275592.5, 2.5, 0.0, 4998152.5, 0.0, -2.5)
    assert max(abs(gt[i] - want[i]) for i in range(6)) <= 1e-5


def test_complex_subdatasets_and_checksums():
    """test_hdf5_14..17: compound {r,i} datasets; the checksum runs
    over interleaved real/imag doubles (gdalchecksum.cpp
    nValsPerIter=2)."""
    sds = hdf5_subdatasets(D + "complex.h5")
    assert [s.split("//")[-1] for s in sds] == ["f16", "f32", "f64"]
    for name, want in (("f16", 412), ("f32", 523), ("f64", 511)):
        a = read_hdf5_array(D + "complex.h5", "/" + name)
        inter = np.empty((a.shape[0], a.shape[1] * 2), np.float64)
        inter[:, 0::2] = a["r"].astype(np.float64)
        inter[:, 1::2] = a["i"].astype(np.float64)
        assert checksum_image(inter) == want, name


def test_attr_all_datatypes():
    """test_hdf5_attr_all_datatypes: every numeric class renders 125."""
    m = hdf5_flat_metadata(D + "attr_all_datatypes.h5")
    assert m == {k: "125" for k in
                 ("attr_float16", "attr_float32", "attr_float64",
                  "attr_int16", "attr_int32", "attr_int8",
                  "attr_uint16", "attr_uint32", "attr_uint8")}


def test_single_char_varname_and_dim_labels():
    assert read_hdf5_array(
        D + "single_char_varname.h5", "/e").shape == (1, 1)
    # vlen dimension labels containing NULL entries must not crash
    assert isinstance(
        hdf5_subdatasets(D + "dimension_labels_with_null.h5"), list)


def test_recursive_groups():
    """test_hdf5_recursive_groups: self/parent links terminate."""
    root = open_hdf5(D + "recursive_groups.h5")
    assert "subgroup" in root.children


def test_family_driver():
    """test_hdf5_family_driver: 0.h5 + numbered siblings concatenate."""
    sds = hdf5_subdatasets(D + "test_family_0.h5")
    assert sds and sds[0].endswith("://chunked")


def test_deflate_chunked():
    """deflate.h5: chunked + gzip dataset (netCDF-4 layout)."""
    a = read_hdf5_array(D + "deflate.h5", "/Band1")
    assert a.shape == (20, 20)
    assert checksum_image(a) == 4855


def test_single_dim_and_signature_offset():
    """test_hdf5_single_dim + test_hdf5_signature_not_at_beginning."""
    a = read_hdf5_array(NC + "byte_chunked_multiple.nc", "/x")
    assert a.shape == (20,)
    assert checksum_image(a.reshape(1, -1)) == 231
    sds = hdf5_subdatasets(NC + "byte_hdf5_starting_at_offset_1024.nc")
    assert any(s.endswith("://Band1") for s in sds)


def test_hdfeos_swath_data():
    """test_hdf5_rasterio_optims: MyDataField is bytes 0..23, and the
    underscored path alias resolves the 'Data Fields' group."""
    a = read_hdf5_array(
        D + "dummy_HDFEOS_swath.h5",
        "/HDFEOS/SWATHS/MySwath/Data_Fields/MyDataField")
    assert a.shape == (2, 3, 4)
    assert a.ravel().tolist() == list(range(24))
    b = read_hdf5_array(
        D + "dummy_HDFEOS_swath_chunked.h5",
        "/HDFEOS/SWATHS/MySwath/Data_Fields/MyDataField")
    assert b.shape == (20, 30, 40)


def test_netcdf_nodata_scale_offset():
    """test_hdf5_read_netcdf_nodata_scale_offset."""
    f = HDF5File(D + "scale_offset.h5")
    meta = hdf5_band_metadata(f.root["z"])
    assert meta["nodata"] == pytest.approx(9.96921e36, rel=1e-7)
    assert meta["offset"] == 1.5
    assert meta["scale"] == 0.01


def test_bag_checksums():
    """autotest bag.py test_bag_2: south-up rows flip to cs
    1072/150/1315."""
    p = "/root/reference/autotest/gdrivers/data/bag/true_n_nominal.bag"
    root = open_hdf5(p)
    for name, want in (("elevation", 1072), ("uncertainty", 150),
                       ("nominal_elevation", 1315)):
        a = root["BAG_root/" + name].read()
        assert checksum_image(np.flipud(a)) == want, name
    # GetMinimum/GetMaximum come from the dataset's min/max attributes
    el = root["BAG_root/elevation"]
    assert float(el.attrs["Minimum Elevation Value"]) == pytest.approx(
        10, abs=0.01)
    assert float(el.attrs["Maximum Elevation Value"]) == pytest.approx(
        19.8, abs=0.01)


def test_s100_family_opens():
    """S-102/S-104/S-111 fixtures are HDF5; every one must parse."""
    import glob
    n = 0
    for pat in ("s102/*.h5", "s104/*.h5", "s111/*.h5"):
        for p in glob.glob("/root/reference/autotest/gdrivers/data/"
                           + pat):
            root = open_hdf5(p)
            n += 1
            assert isinstance(root.attrs, dict)
    assert n >= 7


def test_open_raster_hdf5_syntax():
    """open_raster integration: HDF5:"f"://dset plus plain-file probe."""
    from gdal_ray.sources.raster_open import open_raster

    r = open_raster('HDF5:"%su8be.h5"://TestArray' % D)
    assert r["driver"] == "HDF5"
    assert checksum_image(r["pixels"]) == 135
    # single-dataset file opens directly
    fname, ds = parse_hdf5_path('HDF5:"%su8be.h5"://TestArray' % D)
    assert fname.endswith("u8be.h5") and ds == "/TestArray"
    with pytest.raises(ValueError, match="subdatasets"):
        open_raster(D + "groups.h5")
    r = open_raster('HDF5:"%sCSK_GEC.h5"://S01/SBI' % D)
    assert r["gt"] == pytest.approx(
        (275592.5, 2.5, 0.0, 4998152.5, 0.0, -2.5))


def test_bottomup_netcdf_raw_hdf5_view_unflipped():
    """The HDF5-driver view of a bottom-up netCDF byte raster keeps
    storage order (only GDAL's netCDF driver flips): checksum equals
    flipud(byte.tif) = 4855, derived here independently."""
    from gdal_ray.sources.tiff import decode_tiff

    a = read_hdf5_array(NC + "byte_hdf5_starting_at_offset_1024.nc",
                        "/Band1")
    px = decode_tiff(open(
        "/root/reference/autotest/gcore/data/byte.tif", "rb").read())[0]
    assert checksum_image(a) == checksum_image(px[::-1]) == 4855
