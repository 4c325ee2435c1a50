"""Conformance for the third classic-format batch — RRASTER, GTX,
NTv2, SNODAS, MFF, PAux, GSC, GenBin, ISCE, ROI_PAC, LCP. Every
expectation is the reference's OWN published value
(autotest/gdrivers/{rraster,gtx,ntv2,snodas,mff,paux,gsc,genbin,isce,
roipac,lcp}.py)."""

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.raster_open import open_raster

D = "/root/reference/autotest/gdrivers/data"


def _b1(px):
    return px if px.ndim == 2 else px[:, :, 0]


def test_rraster_golden():
    r = open_raster(f"{D}/rraster/byte_rraster.grd")
    assert r["driver"] == "RRASTER"
    assert checksum_image(_b1(r["pixels"])) == 4672
    assert r["gt"] == (440720.0, 60.0, 0.0, 3751320.0, 0.0, -60.0)
    rgba = open_raster(f"{D}/rraster/rgba_rraster.grd")
    assert rgba["pixels"].shape[2] == 4


def test_gtx_golden():
    r = open_raster(f"{D}/gtx/hydroc1.gtx")
    assert r["driver"] == "GTX"
    assert checksum_image(_b1(r["pixels"])) == 64183
    assert r["pixels"].shape == (11, 21)


def test_ntv2_goldens():
    for f in ("test_ntv2_le.gsb", "test_ntv2_be.gsb"):
        r = open_raster(f"{D}/ntv2/{f}")
        assert r["driver"] == "NTv2"
        assert r["pixels"].shape == (2, 2, 4)
        assert checksum_image(r["pixels"][:, :, 1]) == 10
        assert r["subgrids"] == ["TEST"]


def test_snodas_golden():
    r = open_raster(f"{D}/snodas/fake_snodas.hdr")
    assert r["driver"] == "SNODAS"
    assert checksum_image(_b1(r["pixels"])) == 0
    assert r["pixels"].shape == (3351, 6935)


def test_mff_goldens():
    assert checksum_image(_b1(
        open_raster(f"{D}/mff/bytemff.hdr")["pixels"])) == 4672
    assert checksum_image(_b1(
        open_raster(f"{D}/mff/fakemff.hdr")["pixels"])) == 1
    # tiled layout (tile_size_rows/columns)
    assert checksum_image(_b1(
        open_raster(f"{D}/mff/fakemfftiled.hdr")["pixels"])) == 1


def test_paux_golden():
    r = open_raster(f"{D}/paux/small16.raw")
    assert r["driver"] == "PAux"
    assert checksum_image(r["pixels"][:, :, 1]) == 12816
    assert r["pixels"].shape == (35, 31, 2)


def test_gsc_golden():
    r = open_raster(f"{D}/gsc/fakegsc.gsc")
    assert r["driver"] == "GSC"
    assert checksum_image(_b1(r["pixels"])) == 0


def test_genbin_golden():
    r = open_raster(f"{D}/genbin/tm4628_96.bil")
    assert r["driver"] == "GenBin"
    # reference checksums the 500x1 window at (0, 0)
    assert checksum_image(r["pixels"][:1, :500, 0]) == 5738


def test_isce_golden():
    r = open_raster(f"{D}/isce/isce.slc")
    assert r["driver"] == "ISCE"
    assert checksum_image(_b1(r["pixels"])) == 350
    assert r["pixels"].shape == (10, 24)  # CFLOAT interleaved


def test_roipac_golden():
    r = open_raster(f"{D}/roipac/srtm.dem")
    assert r["driver"] == "ROI_PAC"
    assert checksum_image(_b1(r["pixels"])) == 64074
    assert r["scale"] == 2.0 and r["offset"] == 1.0
    assert r["gt"] == pytest.approx(
        (-180.0083333, 8.3333333e-03, 0, -59.9916667, 0, -8.3333333e-03))


def test_lcp_golden():
    r = open_raster(f"{D}/lcp/test_FARSITE_UTM12.LCP")
    assert r["driver"] == "LCP"
    assert r["bands"] == 8
    want = [18645, 16431, 18851, 26182, 30038, 22077, 30388, 23249]
    got = [checksum_image(r["pixels"][:, :, i]) for i in range(8)]
    assert got == want
    assert r["pixels"].dtype == np.int16
