"""ENVISAT product reader over synthesized conformant products
(the reference autotest downloads its data; format parity is against
frmts/envisat/EnvisatFile.c + envisatdataset.cpp)."""
import numpy as np
import pytest

from gdal_ray.sources.envisat import (EnvisatProduct, read_envisat,
                                      write_envisat)


def _rng():
    return np.random.default_rng(3)


def test_mph_sph_dsd_parse():
    b = _rng().integers(0, 60000, (4, 6)).astype(np.uint16)
    data = write_envisat([b])
    prod = EnvisatProduct(data)
    assert prod.mph["PRODUCT"].startswith("MER_RR__2P")
    from gdal_ray.sources.envisat import _as_int

    assert _as_int(prod.sph["LINE_LENGTH"]) == 6
    assert len(prod.dsds) == 1
    d = prod.dsds[0]
    assert d["type"] == "M" and d["num_dsr"] == 4
    # the autotest's _get_mds_num logic: count DS_TYPE=M with size>0
    assert sum(1 for x in prod.dsds
               if x["type"] == "M" and x["size"] > 0) == 1


def test_uword_band_roundtrip():
    b = _rng().integers(0, 60000, (5, 7)).astype(np.uint16)
    rd = read_envisat(write_envisat([b]))
    assert rd["driver"] == "ESAT"
    assert np.array_equal(rd["pixels"], b)
    assert rd["metadata"]["SPH_DATA_TYPE"] == "UWORD"


def test_multiband():
    rng = _rng()
    bands = [rng.integers(0, 60000, (3, 5)).astype(np.uint16)
             for _ in range(3)]
    rd = read_envisat(write_envisat(bands))
    assert rd["pixels"].shape == (3, 5, 3)
    for i in range(3):
        assert np.array_equal(rd["pixels"][:, :, i], bands[i])
    assert rd["band_names"] == [f"Radiance MDS({i + 1})"
                                for i in range(3)]


def test_flt32():
    b = _rng().normal(size=(4, 4)).astype(np.float32)
    rd = read_envisat(write_envisat([b], data_type="FLT32"))
    assert np.allclose(rd["pixels"], b)


def test_tiepoint_gcps():
    rng = _rng()
    w, h = 8, 6
    b = rng.integers(0, 60000, (h, w)).astype(np.uint16)
    # 2 tie columns (samples_per=4 -> ceil(8/4)=2), 3 tie rows
    tp = {"lines_per": 3, "samples_per": 4, "num_dsr": 3,
          "lat": [[50.0, 50.1], [50.2, 50.3], [50.4, 50.5]],
          "lon": [[8.0, 8.1], [8.2, 8.3], [8.4, 8.5]]}
    rd = read_envisat(write_envisat([b], tiepoints=tp))
    gcps = rd["gcps"]
    assert len(gcps) == 6
    assert gcps[0]["pixel"] == 0.5 and gcps[0]["line"] == 0.5
    assert gcps[1]["pixel"] == 4.5
    assert gcps[2]["line"] == 3.5       # record 1 -> 0.5 + 1*3
    assert np.isclose(gcps[3]["x"], 8.3) and np.isclose(gcps[3]["y"], 50.3)
    assert rd["gcp_epsg"] == 4326


def test_heterogeneous_dsr_size_excluded():
    # envisatdataset.cpp only adds bands whose dsr_size matches the
    # reference dataset's; a same-num_dsr type-M dataset with a
    # different record size must not become a (misaligned) band.
    b = _rng().integers(0, 60000, (4, 6)).astype(np.uint16)
    rd = read_envisat(write_envisat([b], extra_m_dsr_size=99))
    assert rd["pixels"].ndim == 2
    assert np.array_equal(rd["pixels"], b)
    assert rd["band_names"] == ["Radiance MDS(1)"]


def test_rejects_non_envisat():
    with pytest.raises(ValueError):
        read_envisat(b"NOPE" + b" " * 2000)
    with pytest.raises(ValueError, match="SPH_SIZE"):
        read_envisat(b"PRODUCT=\"X\"\n".ljust(1247).ljust(1300))
