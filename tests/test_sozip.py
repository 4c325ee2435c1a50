"""SOZip create/validate/ranged-read conformance.

Reference: port/cpl_minizip_zip.cpp (SOZip writer),
port/cpl_vsil_gzip.cpp (index parse), autotest/utilities/
test_sozip.py published facts on the reference's own
zero_5GB_sozip_of_sozip.zip fixture.
"""

import os
import zipfile

import numpy as np
import pytest

from gdal_ray.sources.sozip import (AUTO_MIN_SIZE, sozip_create,
                                    sozip_info, sozip_read,
                                    sozip_read_range)

REF_FIX = ("/root/reference/autotest/gcore/data/"
           "zero_5GB_sozip_of_sozip.zip")


def _payloads():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 255, AUTO_MIN_SIZE + 1, np.uint8).tobytes()
    return [("a", a), ("b", b"x" * 40000), ("subdir/c", b"x")]


def test_create_auto_matches_reference_thresholds(tmp_path):
    """gdal vsi sozip create --enable-sozip=auto: only members over
    1 MiB (and over one chunk) get the index
    (test_gdalalg_vsi_sozip.py semantics)."""
    zp = str(tmp_path / "out.zip")
    on = sozip_create(zp, _payloads(), chunk_size=16384, enable="auto")
    assert on == {"a": True, "b": False, "subdir/c": False}
    info = {r["name"]: r for r in sozip_info(zp)}
    assert info["a"]["sozip"] and info["a"]["index_valid"]
    assert info["a"]["chunk_size"] == 16384
    assert info["a"]["n_chunks"] == -(-(AUTO_MIN_SIZE + 1) // 16384)
    assert not info["b"]["sozip"]


def test_plain_zipfile_reads_our_output(tmp_path):
    """A SOZip archive is a perfectly normal zip: python's zipfile
    (an independent reader) sees the members, not the hidden index,
    and round-trips the payloads byte-for-byte."""
    zp = str(tmp_path / "out.zip")
    pays = _payloads()
    sozip_create(zp, pays, chunk_size=16384, enable="auto")
    z = zipfile.ZipFile(zp)
    assert z.namelist() == [n for n, _ in pays]
    for n, data in pays:
        assert z.read(n) == data
    assert z.testzip() is None


def test_ranged_reads_only_touch_covering_chunks(tmp_path):
    zp = str(tmp_path / "out.zip")
    pays = _payloads()
    sozip_create(zp, pays, chunk_size=16384, enable="yes")
    a = pays[0][1]
    for off, sz in ((0, 100), (16384 * 3 + 5, 40000),
                    (len(a) - 10, 10), (12345, 1)):
        assert sozip_read_range(zp, "a", off, sz) == a[off:off + sz]
    b = pays[1][1]
    assert sozip_read_range(zp, "b", 20000, 100) == b[20000:20100]
    with pytest.raises(ValueError, match="not SOZip-enabled"):
        sozip_read_range(zp, "subdir/c", 0, 1)


def test_bad_extension():
    with pytest.raises(ValueError, match="should be .zip"):
        sozip_create("/tmp/foo", [("a", b"x")])


@pytest.mark.skipif(not os.path.exists(REF_FIX),
                    reason="reference absent")
def test_reads_the_references_own_sozip_fixture(tmp_path):
    """Cross-compatibility with the REFERENCE'S writer: the published
    facts of zero_5GB_sozip_of_sozip.zip (test_sozip.py:41-45 —
    member zero_5GB.bin.zip, 5 232 873 bytes, SOZip yes, 32768-byte
    chunks) reproduce, and the nested zip64 member parses to exactly
    5 GiB with a valid index."""
    info = sozip_info(REF_FIX)
    assert len(info) == 1
    r = info[0]
    assert r["name"] == "zero_5GB.bin.zip"
    assert r["size"] == 5232873
    assert r["sozip"] and r["index_valid"]
    assert r["chunk_size"] == 32768
    # ranged read of the member starts with the inner zip's magic
    assert sozip_read_range(REF_FIX, "zero_5GB.bin.zip",
                            0, 4) == b"PK\x03\x04"
    inner = sozip_read(REF_FIX, "zero_5GB.bin.zip")
    ip = str(tmp_path / "inner.zip")
    open(ip, "wb").write(inner)
    ir = sozip_info(ip)[0]
    assert ir["name"] == "zero_5GB.bin"
    assert ir["size"] == 5 * 1024 * 1024 * 1024
    assert ir["sozip"] and ir["index_valid"]


def test_parallel_chunk_dataset(ray_session, tmp_path):
    from gdal_ray.sources.sozip import sozip_chunk_dataset

    zp = str(tmp_path / "out.zip")
    pays = _payloads()
    sozip_create(zp, pays, chunk_size=65536, enable="yes")
    ds = sozip_chunk_dataset(zp, "a")
    parts = sorted(ds.take_all(), key=lambda r: r["chunk"])
    joined = b"".join(p["data"] for p in parts)
    assert joined == pays[0][1]


def test_read_range_on_adjacent_plain_members(tmp_path):
    """A non-SOZip member followed by another member must raise, not
    parse the neighbor's local header as an index (round-5 review
    finding)."""
    zp = str(tmp_path / "two.zip")
    sozip_create(zp, [("a", b"y" * 500), ("b", b"z" * 500)],
                 enable="no")
    with pytest.raises(ValueError, match="not SOZip-enabled"):
        sozip_read_range(zp, "a", 0, 10)
