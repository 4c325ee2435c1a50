"""VRT XML reader: the reference's own warped-VRT fixtures render
bit-close to their golden tiffs; plain SimpleSource/ComplexSource and
derived-band VRTs roundtrip against hand-computed outputs."""

import os

import numpy as np
import pytest

from gdal_ray.functions.checksum import checksum_image
from gdal_ray.sources.tiff import decode_tiff, encode_tiff
from gdal_ray.sources.vrt import open_vrt

ALG = "/root/reference/autotest/alg/data"
GCORE = "/root/reference/autotest/gcore/data"


def _golden(path):
    with open(path, "rb") as f:
        return decode_tiff(f.read())


@pytest.mark.skipif(not os.path.exists(ALG), reason="reference not present")
@pytest.mark.parametrize("vrt,golden", [
    ("utmsmall_near.vrt", "utmsmall_near.tiff"),
    ("utmsmall_blinear.vrt", "utmsmall_blinear.tiff"),
    ("utmsmall_cubic.vrt", "utmsmall_cubic.tiff"),
    ("utmsmall_cubicspline.vrt", "utmsmall_cubicspline.tiff"),
])
def test_reference_warped_vrts_render_to_goldens(vrt, golden):
    """The reference's own .vrt files drive our warp and match the
    goldens sitting next to them (compare_ds maxdiff <= 1 rule)."""
    r = open_vrt(os.path.join(ALG, vrt))
    ref, ref_gt = _golden(os.path.join(ALG, golden))
    assert r["pixels"].shape == ref.shape
    assert r["gt"] == tuple(ref_gt)
    diff = np.abs(r["pixels"].astype(np.int64) - ref.astype(np.int64))
    assert diff.max() <= 1, f"{vrt}: maxdiff {diff.max()}"


def test_simple_source_window(tmp_path):
    with open(os.path.join(GCORE, "byte.tif"), "rb") as f:
        byte_px, _ = decode_tiff(f.read())
    src = tmp_path / "src.tif"
    src.write_bytes(encode_tiff(byte_px))
    vrt = tmp_path / "win.vrt"
    vrt.write_text(f"""<VRTDataset rasterXSize="30" rasterYSize="30">
  <VRTRasterBand dataType="Byte" band="1">
    <NoDataValue>7</NoDataValue>
    <SimpleSource>
      <SourceFilename relativeToVRT="1">src.tif</SourceFilename>
      <SourceBand>1</SourceBand>
      <SrcRect xOff="5" yOff="5" xSize="10" ySize="10"/>
      <DstRect xOff="2" yOff="3" xSize="10" ySize="10"/>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>""")
    r = open_vrt(str(vrt))
    px = r["pixels"]
    assert px.shape == (30, 30) and px.dtype == np.uint8
    np.testing.assert_array_equal(px[3:13, 2:12], byte_px[5:15, 5:15])
    assert (px[0] == 7).all()  # NoDataValue fill


def test_complex_source_scale_and_upsample(tmp_path):
    src_px = np.arange(25, dtype=np.uint8).reshape(5, 5)
    (tmp_path / "s.tif").write_bytes(encode_tiff(src_px))
    vrt = tmp_path / "c.vrt"
    vrt.write_text("""<VRTDataset rasterXSize="10" rasterYSize="10">
  <VRTRasterBand dataType="Float32" band="1">
    <ComplexSource>
      <SourceFilename relativeToVRT="1">s.tif</SourceFilename>
      <SrcRect xOff="0" yOff="0" xSize="5" ySize="5"/>
      <DstRect xOff="0" yOff="0" xSize="10" ySize="10"/>
      <ScaleRatio>2</ScaleRatio>
      <ScaleOffset>100</ScaleOffset>
    </ComplexSource>
  </VRTRasterBand>
</VRTDataset>""")
    px = open_vrt(str(vrt))["pixels"]
    assert px.dtype == np.float32
    # nearest 2x upsample then v*2+100
    assert px[0, 0] == 100.0 and px[9, 9] == 24 * 2 + 100


def test_derived_band_pixel_function(tmp_path):
    a = np.full((4, 4), 9, np.uint8)
    b = np.full((4, 4), 16, np.uint8)
    (tmp_path / "a.tif").write_bytes(encode_tiff(a))
    (tmp_path / "b.tif").write_bytes(encode_tiff(b))
    vrt = tmp_path / "d.vrt"
    vrt.write_text("""<VRTDataset rasterXSize="4" rasterYSize="4">
  <VRTRasterBand dataType="Float64" band="1" subClass="VRTDerivedRasterBand">
    <PixelFunctionType>sum</PixelFunctionType>
    <SimpleSource>
      <SourceFilename relativeToVRT="1">a.tif</SourceFilename>
    </SimpleSource>
    <SimpleSource>
      <SourceFilename relativeToVRT="1">b.tif</SourceFilename>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>""")
    px = open_vrt(str(vrt))["pixels"]
    assert (px == 25.0).all()


def test_unknown_pixel_function_raises(tmp_path):
    (tmp_path / "a.tif").write_bytes(
        encode_tiff(np.zeros((2, 2), np.uint8)))
    vrt = tmp_path / "u.vrt"
    vrt.write_text("""<VRTDataset rasterXSize="2" rasterYSize="2">
  <VRTRasterBand dataType="Byte" band="1" subClass="VRTDerivedRasterBand">
    <PixelFunctionType>no_such_fn</PixelFunctionType>
    <SimpleSource>
      <SourceFilename relativeToVRT="1">a.tif</SourceFilename>
    </SimpleSource>
  </VRTRasterBand>
</VRTDataset>""")
    with pytest.raises(NotImplementedError):
        open_vrt(str(vrt))
