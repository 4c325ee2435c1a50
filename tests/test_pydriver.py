"""OGR Python-driver plugin mechanism vs the reference's own
autotest fixtures (autotest/ogr/data/pydrivers/* +
ogr_pythondrivers.py expectations)."""
import os

import pyarrow as pa
import pytest

from gdal_ray.sources.pydriver import PyDriverRegistry

DIR = "/root/reference/autotest/ogr/data/pydrivers"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DIR), reason="reference fixtures unavailable")


@pytest.fixture(scope="module")
def registry():
    return PyDriverRegistry(DIR)


def test_registry_scan(registry):
    assert registry.by_name("DUMMY") is not None
    md = registry.by_name("DUMMY").metadata
    assert md["DRIVER_DCAP_VECTOR"] == "YES"
    assert md["DRIVER_SUPPORTED_API_VERSION"] == [1]


@pytest.mark.parametrize("geomformat", ["WKT", "WKB", "WKB/bytearray"])
def test_dummy_driver(registry, geomformat):
    # unknown prefix is not identified
    assert registry.open("UNRELATED:") is None

    ds = registry.open("DUMMY:", {"GEOMFORMAT": geomformat})
    assert ds is not None
    assert ds.layer_count() == 1
    assert ds.layer(-1) is None and ds.layer(1) is None
    lyr = ds.layer(0)
    assert lyr.name == "my_layer"
    assert lyr.fid_name == "my_fid"
    assert len(lyr.fields) == 13
    assert len(lyr.geometry_fields) == 1
    assert lyr.feature_count() == 5
    assert lyr.extent() == [2.1, 49, 3, 50]
    assert lyr.test_capability("FastFeatureCount")
    assert lyr.metadata == {"foo": "bar"}
    assert ds.metadata == {"foo": "bar"}

    t = lyr.to_arrow()
    assert t.num_rows == 5
    assert t["my_fid"].to_pylist() == [1, 2, 3, 4, 5]
    assert t.schema.field("boolField").type == pa.bool_()
    assert t.schema.field("int64Field").type == pa.int64()
    assert t.schema.field("floatField").type == pa.float32()
    assert t["int16Field"].to_pylist() == [32767] * 5
    assert t["int32Field"].to_pylist() == [2, 3, 4, 5, 6]
    assert t["int64Field"].to_pylist() == [1234567890123] * 5
    assert t["realField"].to_pylist() == [1.23] * 5
    assert t["strField"].to_pylist() == ["foo"] * 5
    assert t["strNullField"].to_pylist() == [None] * 5
    assert t["binaryField"].to_pylist() == [b"\x01\x00\x02"] * 5
    # OGR-normalized temporal strings (ogr_pythondrivers.py goldens)
    assert t["dateField"].to_pylist() == ["2017/04/26"] * 5
    assert t["datetimeField"].to_pylist() == \
        ["2017/04/26 12:34:56.789+00"] * 5
    assert t["timeField"].to_pylist() == ["12:34:56.789"] * 5
    # geometry POINT (2 49) regardless of GEOMFORMAT
    import struct

    wkb = t["geometry"][0].as_py()
    assert struct.unpack("<BI", wkb[:5]) == (1, 1)
    assert struct.unpack("<dd", wkb[5:21]) == (2.0, 49.0)


def test_missing_metadata():
    with pytest.raises(ValueError, match="DRIVER_NAME"):
        PyDriverRegistry(os.path.join(DIR, "missingmetadata"))


def test_unsupported_api_version_skipped():
    reg = PyDriverRegistry(os.path.join(DIR, "unsupportedapiversion"))
    assert reg.drivers == []


def test_no_driver_class():
    reg = PyDriverRegistry(os.path.join(DIR, "nodriverclass"))
    drv = reg.by_name("NO_DRIVER_CLASS")
    assert drv is not None   # registered from metadata alone
    with pytest.raises(ValueError, match="BaseDriver"):
        drv.identify("FOO:")


def test_missing_identify():
    reg = PyDriverRegistry(os.path.join(DIR, "missingidentify"))
    drv = reg.by_name("MISSING_IDENTIFY")
    assert drv is not None
    with pytest.raises(ValueError, match="identify"):
        drv.identify("FOO:")
