"""SRP (ASRP/USRP), Northwood GRD/GRC, CPG, DOQ1 vs reference goldens
(autotest srp.py, nwt_grd.py, nwt_grc.py, cpg.py, doq1.py)."""
import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.northwood import read_grc, read_grd
from gdal_ray.sources.simpleformats import read_cpg_sirc, read_doq1
from gdal_ray.sources.srp import read_srp, srp_thf_info

D = "/root/reference/autotest/gdrivers/data/"


@pytest.mark.parametrize("pcb", [0, 4, 8])
def test_srp_usrp(pcb):
    """test_srp_1: cs 24576, UTM-17 georef, QAL color table + GEN/QAL
    metadata for raw and both RLE pixel-count widths."""
    r = read_srp(D + f"srp/USRP_PCB{pcb}/FKUSRP01.GEN")
    assert checksum_image(r["pixels"]) == 24576
    assert r["gt"] == pytest.approx(
        (500000.0, 5.0, 0.0, 5000000.0, 0.0, -5.0))
    assert r["epsg"] == 32617
    assert tuple(r["palette"][0]) == (0, 0, 0)
    assert tuple(r["palette"][1]) == (255, 0, 0)
    assert len(r["palette"]) == 4
    md = r["metadata"]
    assert md["SRP_CLASSIFICATION"] == "U"
    assert md["SRP_CREATIONDATE"] == "20120505"
    assert md["SRP_EDN"] == "0"
    assert md["SRP_NAM"] == "FKUSRP"
    assert md["SRP_PRODUCT"] == "USRP"
    assert md["SRP_REVISIONDATE"] == "20120505"
    assert md["SRP_SCA"] == "50000"
    assert md["SRP_ZNA"] == "17"
    assert md["SRP_PSP"] == "100.0"


def test_srp_thf():
    """test_srp_4/5: THF transmittal header resolves the GEN/IMG pair
    and carries VDR metadata."""
    info = srp_thf_info(D + "srp/USRP_PCB0/TRANSH01.THF")
    assert len(info["subdatasets"]) == 1
    assert info["subdatasets"][0].startswith("SRP:")
    assert info["subdatasets"][0].endswith("FKUSRP01.IMG")
    md = info["metadata"]
    assert md["SRP_CLASSIFICATION"] == "U"
    assert md["SRP_EDN"] == "1"
    assert md["SRP_VOO"] == "           "
    # the referenced IMG decodes to the same checksum
    gen, img = info["subdatasets"][0][4:].split(",")
    r = read_srp(gen, img)
    assert checksum_image(r["pixels"]) == 24576


def test_nwt_grd_four_bands():
    """nwt_grd.py test 1: RGB ramp bands 28093/33690/20365 + Z band
    25856."""
    r = read_grd(open(D + "nwt_grd/nwt_grd.grd", "rb").read())
    assert checksum_image(r["r"]) == 28093
    assert checksum_image(r["g"]) == 33690
    assert checksum_image(r["b"]) == 20365
    assert checksum_image(r["z"]) == 25856
    assert r["nodata"] == -1.0e37


def test_nwt_grc():
    """nwt_grc.py: classified band cs 46760 + class dictionary."""
    r = read_grc(open(D + "nwt_grc/nwt_grc.grc", "rb").read())
    assert checksum_image(r["pixels"]) == 46760
    assert r["class_names"][1] == "one"
    assert r["class_names"][2] == "two"


def test_cpg_sirc():
    """cpg.py: fake SIRC opens with 4 complex bands, cs 0."""
    r = read_cpg_sirc(open(D + "cpg/fakecpgSIRC.hdr").read(),
                      open(D + "cpg/fakecpgSIRC.img", "rb").read())
    assert r["shape"] == (1, 1)
    assert set(r["bands"]) == {"SHH", "SHV", "SVH", "SVV"}
    shh = r["bands"]["SHH"]
    inter = np.empty((1, 2), np.float64)
    inter[:, 0] = shh.real[0]
    inter[:, 1] = shh.imag[0]
    assert checksum_image(inter) == 0


def test_doq1_fake():
    """doq1.py: fakedoq1.doq opens (500x500, checksum unchecked like
    the autotest's -1)."""
    d = read_doq1(open(D + "doq1/fakedoq1.doq", "rb").read())
    assert d["pixels"].shape == (500, 500)
    assert d["driver"] == "DOQ1"
