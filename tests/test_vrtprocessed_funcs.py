"""VRTProcessedDataset Trimming + BandAffineCombination kernels
(functions/pixelfuncs.py) vs the reference's own autotest
expectations (autotest/gdrivers/vrtprocesseddataset.py:138-320,
970-1065; frmts/vrt/vrtprocesseddatasetfunctions.cpp)."""

import numpy as np

from gdal_ray.functions.pixelfuncs import (band_affine_combination,
                                           nodata_replacement_value,
                                           trimming)


def to_byte(a):
    return np.clip(np.floor(np.asarray(a) + 0.5), 0, 255).astype(np.uint8)


def test_affine_combination_nominal():
    # test_vrtprocesseddataset_affine_combination_nominal
    b = np.zeros((1, 2, 3))
    b[0, :, 0] = [1, 3]
    b[0, :, 1] = [2, 6]
    b[0, :, 2] = [3, 3]
    coef = [[10, 0, 1, 0], [20, 0, 0, 1], [30, 1, 0, 0]]
    out = to_byte(band_affine_combination(b, coef, clamp_min=15,
                                          clamp_max=32))
    np.testing.assert_equal(out[0, :, 0], [15, 16])
    np.testing.assert_equal(out[0, :, 1], [23, 23])
    np.testing.assert_equal(out[0, :, 2], [31, 32])


def test_affine_combination_chained_rotation():
    # test_vrtprocesseddataset_several_steps: rotating bands 3 times
    # returns the original order
    b = np.zeros((5, 10, 3))
    b[:, :, 0] = 1
    b[:, :, 1] = 2
    b[:, :, 2] = 3
    coef = [[0, 0, 1, 0], [0, 0, 0, 1], [0, 1, 0, 0]]
    out = b
    for _ in range(3):
        out = band_affine_combination(out, coef)
    np.testing.assert_equal(to_byte(out), b.astype(np.uint8))


def test_affine_combination_nodata_from_bands():
    # test_vrtprocesseddataset_affine_combination_nodata: src nodata 1
    # on both bands -> dst nodata 1; computed -1 clamps to 0 in Byte
    b = np.zeros((1, 2, 2))
    b[0, :, 0] = [1, 2]
    b[0, :, 1] = [3, 3]
    out = band_affine_combination(b, [[0, 1, 1], [0, 1, -1]],
                                  src_nodata=1.0, dst_nodata=1.0)
    np.testing.assert_equal(to_byte(out)[0, :, 0], [1, 5])
    np.testing.assert_equal(to_byte(out)[0, :, 1], [1, 0])


def test_affine_combination_nodata_as_parameter():
    # test_vrtprocesseddataset_affine_combination_nodata_as_parameter:
    # valid value colliding with dst_nodata 255 (intended Byte) is
    # substituted by the replacement 254
    b = np.zeros((1, 2, 2))
    b[0, :, 0] = [1, 2]
    b[0, :, 1] = [3, 3]
    out = band_affine_combination(b, [[0, 1, 1], [256, 1, -1]],
                                  src_nodata=1.0, dst_nodata=255.0,
                                  dst_intended_datatype="Byte")
    np.testing.assert_equal(to_byte(out)[0, :, 0], [255, 5])
    np.testing.assert_equal(to_byte(out)[0, :, 1], [255, 254])


def test_affine_combination_explicit_replacement():
    b = np.zeros((1, 2, 2))
    b[0, :, 0] = [1, 2]
    b[0, :, 1] = [3, 3]
    out = band_affine_combination(b, [[256, 1, -1]], src_nodata=1.0,
                                  dst_nodata=255.0,
                                  replacement_nodata=100.0,
                                  dst_intended_datatype="Byte")
    np.testing.assert_equal(to_byte(out)[0, :, 0], [255, 100])


def test_replacement_value_rule():
    # gcore/gdal_misc.cpp GDALGetNoDataReplacementValue
    assert nodata_replacement_value("Byte", 255) == 254
    assert nodata_replacement_value("Byte", 1) == 2
    assert nodata_replacement_value("Byte", 300) == 0
    assert nodata_replacement_value("Int16", 32767) == 32766
    assert nodata_replacement_value("Float64", 1.0) == np.nextafter(
        1.0, np.inf)


def test_trimming_nominal():
    # test_vrtprocesseddataset_trimming_nominal: 6x1x4 source, local
    # max-RGB trimming raster, published outputs [92,135,164,...]
    src = np.zeros((1, 6, 4))
    src[0, :, 0] = [100, 150, 200, 0, 0, 0]
    src[0, :, 1] = [150, 200, 100, 0, 0, 0]
    src[0, :, 2] = [200, 100, 150, 0, 0, 0]
    src[0, :, 3] = [100, 150, 200, 0, 0, 0]
    trim = np.array([[205.0, 210, 220, 0, 0, 0]])
    with np.errstate(divide="ignore"):
        out = trimming(src, trim, top_rgb=200.0, tone_ceil=190.0,
                       top_margin=0.1)
    got = to_byte(out)
    np.testing.assert_equal(got[0, :3, 0], [92, 135, 164])
    # per-pixel analytic re-derivation for all columns (the test file
    # computes the same formulas inline)
    for j in range(3):
        R, G, B, NIR = (src[0, j, 0], src[0, j, 1], src[0, j, 2],
                        src[0, j, 3])
        local = trim[0, j]
        reduced = min(0.9 * 200.0 / local, 1.0)
        mx = max(R, G, B)
        toneMax = min(190.0 / mx, 1.0)
        exp = [min(reduced * v * min(190.0 / v, 1.0) / toneMax, 200.0)
               for v in (R, G, B)]
        assert got[0, j, 0] == round(exp[0])
        assert got[0, j, 1] == round(exp[1])
        assert got[0, j, 2] == round(exp[2])
        assert got[0, j, 3] == round(reduced * NIR)


def test_trimming_nodata_pixel():
    src = np.zeros((1, 2, 4))
    src[0, :, 0] = [100, 7]
    src[0, :, 1] = [150, 20]
    src[0, :, 2] = [200, 30]
    src[0, :, 3] = [100, 40]
    trim = np.array([[205.0, 205.0]])
    out = trimming(src, trim, top_rgb=200.0, tone_ceil=190.0,
                   top_margin=0.1, in_nodata=[7, 7, 7, 7],
                   out_nodata=[255, 255, 255, 255])
    # pixel 2's red band is nodata -> whole pixel nodata
    np.testing.assert_equal(out[0, 1], [255, 255, 255, 255])
    assert (out[0, 0] != 255).all()


def test_vrtprocessed_xml_end_to_end(tmp_path):
    """The reference's affine-nominal + trimming-nominal VRT XMLs
    (autotest/gdrivers/vrtprocesseddataset.py:142-180, 970-1065)
    render through sources/vrt.py open_vrt to the published arrays."""
    from gdal_ray.sources.tiff import encode_tiff
    from gdal_ray.sources.vrt import open_vrt

    gt = (0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    src = np.zeros((1, 2, 3), np.uint8)
    src[0, :, 0] = [1, 3]
    src[0, :, 1] = [2, 6]
    src[0, :, 2] = [3, 3]
    src_p = str(tmp_path / "src.tif")
    open(src_p, "wb").write(encode_tiff(src, gt=gt))
    vrt_p = str(tmp_path / "a.vrt")
    open(vrt_p, "w").write(f"""<VRTDataset subclass='VRTProcessedDataset'>
    <Input><SourceFilename>{src_p}</SourceFilename></Input>
    <ProcessingSteps>
        <Step name="Affine combination of band values">
            <Algorithm>BandAffineCombination</Algorithm>
            <Argument name="coefficients_1">10,0,1,0</Argument>
            <Argument name="coefficients_2">20,0,0,1</Argument>
            <Argument name="coefficients_3">30,1,0,0</Argument>
            <Argument name="min">15</Argument>
            <Argument name="max">32</Argument>
        </Step>
    </ProcessingSteps>
    </VRTDataset>""")
    out = open_vrt(vrt_p)["pixels"]
    np.testing.assert_equal(out[0, :, 0], [15, 16])
    np.testing.assert_equal(out[0, :, 1], [23, 23])
    np.testing.assert_equal(out[0, :, 2], [31, 32])

    # trimming: published first-three-column outputs
    src2 = np.zeros((1, 6, 4), np.uint8)
    src2[0, :, 0] = [100, 150, 200, 0, 0, 0]
    src2[0, :, 1] = [150, 200, 100, 0, 0, 0]
    src2[0, :, 2] = [200, 100, 150, 0, 0, 0]
    src2[0, :, 3] = [100, 150, 200, 0, 0, 0]
    src2_p = str(tmp_path / "src2.tif")
    open(src2_p, "wb").write(encode_tiff(src2, gt=gt))
    trim = np.array([[205, 210, 220, 0, 0, 0]], np.uint8)
    trim_p = str(tmp_path / "trim.tif")
    open(trim_p, "wb").write(encode_tiff(trim, gt=gt))
    vrt2_p = str(tmp_path / "b.vrt")
    open(vrt2_p, "w").write(f"""<VRTDataset subclass='VRTProcessedDataset'>
    <Input><SourceFilename>{src2_p}</SourceFilename></Input>
    <ProcessingSteps>
        <Step>
            <Algorithm>Trimming</Algorithm>
            <Argument name="trimming_dataset_filename">{trim_p}</Argument>
            <Argument name="top_rgb">200</Argument>
            <Argument name="tone_ceil">190</Argument>
            <Argument name="top_margin">0.1</Argument>
        </Step>
    </ProcessingSteps>
    </VRTDataset>""")
    out2 = open_vrt(vrt2_p)["pixels"]
    np.testing.assert_equal(out2[0, :3, 0], [92, 135, 164])
    # chained steps through the XML (several_steps): triple band
    # rotation is identity
    vrt3_p = str(tmp_path / "c.vrt")
    step = """<Step><Algorithm>BandAffineCombination</Algorithm>
            <Argument name="coefficients_1">0,0,1,0</Argument>
            <Argument name="coefficients_2">0,0,0,1</Argument>
            <Argument name="coefficients_3">0,1,0,0</Argument></Step>"""
    open(vrt3_p, "w").write(
        f"""<VRTDataset subclass='VRTProcessedDataset'>
    <Input><SourceFilename>{src_p}</SourceFilename></Input>
    <ProcessingSteps>{step}{step}{step}</ProcessingSteps>
    </VRTDataset>""")
    np.testing.assert_equal(open_vrt(vrt3_p)["pixels"], src)
