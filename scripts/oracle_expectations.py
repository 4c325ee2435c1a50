"""Expected-result builders for the pinned-oracle queries (VERDICT
round-3 directive #1).

Each builder returns its query's expected result as a pandas
DataFrame WITHOUT running the engine.  Allowed sources, in order of
strength:

1. Reference-autotest expectation constants — the (case, expected)
   tables hoisted to module level in the query/test modules, each a
   transcription of the reference's own published assertions
   (autotest/**.py file:line cited at the constant).
2. The corpus synthesis manifest (`sources/images.py`
   `corpus_manifest`) — per-image ground truth recorded from the raw
   synthesized pixels BEFORE any codec touches them, so decoder
   roundtrip pins are independent of every decode path.
3. Independent recomputation — DuckDB SQL or plain numpy/pandas
   written against the documented semantics, sharing no code with the
   engine kernels.

`scripts/gen_literal_oracles.py` builds each literal-VALUES oracle
from the builder's frame and runs the engine query once only to
ASSERT agreement — the engine output is never the source of the
pinned values for queries listed here.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

BUILDERS: dict[str, Callable[[str], pd.DataFrame]] = {}


def builder(name: str):
    def deco(fn):
        BUILDERS[name] = fn
        return fn

    return deco


def cev(pairs) -> pd.DataFrame:
    """(case, expected) pairs -> the (case, expected, value) frame the
    conformance sweeps emit (value must equal expected by query
    construction; both columns come from the reference constant)."""
    return pd.DataFrame(
        {"case": [c for c, _ in pairs],
         "expected": [int(e) for _, e in pairs],
         "value": [int(e) for _, e in pairs]})


def cv(pairs) -> pd.DataFrame:
    """(case, expected) pairs -> a (case, value) frame."""
    return pd.DataFrame({"case": [c for c, _ in pairs],
                         "value": [int(e) for _, e in pairs]})


def cce(pairs) -> pd.DataFrame:
    """(case, expected) pairs -> a (case, checksum, expected) frame."""
    return pd.DataFrame(
        {"case": [c for c, _ in pairs],
         "checksum": [int(e) for _, e in pairs],
         "expected": [int(e) for _, e in pairs]})


# ------------------------------------------------------------------
# mechanical extraction of reference-transcribed literals from query
# sources: add("case", <computed>, EXPECTED_LITERAL) calls and
# literal [(path, expected), ...] fixture tables.  This reads SOURCE
# TEXT — the engine never runs — so the extracted pairs are exactly
# the constants the query author transcribed from the reference's
# autotest assertions (cited in each query's docstring).

def _literal(node):
    import ast

    try:
        return ast.literal_eval(node)
    except (ValueError, TypeError):
        return None


def extract_add_pairs(fn, case_arg: int = 0, expected_arg: int = -1):
    """All add(<case>, ..., <expected>) calls inside fn's source whose
    case and expected args are literals -> [(case, expected)]."""
    import ast
    import inspect
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    pairs = []
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == "add"):
            args = node.args
            c = _literal(args[case_arg])
            e = _literal(args[expected_arg])
            if c is not None and e is not None:
                pairs.append((str(c), int(e)))
    return pairs


def extract_case_table(fn, name: str = "cases"):
    """The literal list assigned to `<name> = [...]` inside fn."""
    import ast
    import inspect
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == name):
            val = _literal(node.value)
            if val is not None:
                return val
            # allow f-string paths: evaluate each tuple element that
            # is a plain literal, join f-strings textually
            if isinstance(node.value, (ast.List, ast.Tuple)):
                out = []
                for elt in node.value.elts:
                    item = _literal(elt)
                    out.append(item)
                return out
    return None


def extract_tuple_pairs(fn, var: str, case_idx: int = 0,
                        exp_idx: int = -1):
    """(case, expected) pairs from a literal `var = [(...), ...]`
    table inside fn, tolerating f-string path elements (only the
    case and expected elements must be literals)."""
    import ast
    import inspect
    import textwrap

    tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and len(node.targets) == 1
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == var
                and isinstance(node.value, (ast.List, ast.Tuple))):
            pairs = []
            for elt in node.value.elts:
                if not isinstance(elt, (ast.Tuple, ast.List)):
                    continue
                c = _literal(elt.elts[case_idx])
                e = _literal(elt.elts[exp_idx])
                if c is None or e is None:
                    raise ValueError(
                        f"non-literal case/expected in {var}")
                pairs.append((str(c), int(e)))
            return pairs
    raise ValueError(f"no literal table {var} in {fn.__name__}")


def ref_check(pairs, ref_files, derived=()):
    """Cross-check extracted (case, expected) literals against the
    cited reference autotest sources (ADVICE round-4): every expected
    value must appear verbatim in at least one of `ref_files`
    (relative to /root/reference), EXCEPT cases listed in `derived`
    (values computed from reference constants — e.g. scaled
    geotransform digits — whose derivation is cited at the query).
    A literal that is in neither aborts oracle generation, so a
    mistranscribed constant can no longer self-validate."""
    import os

    blob = []
    for f in ref_files:
        p = os.path.join("/root/reference", f)
        if not os.path.exists(p):
            raise FileNotFoundError(f"ref_check: missing {p}")
        with open(p, errors="replace") as fh:
            blob.append(fh.read())
    blob = "\n".join(blob)
    missing = [(c, e) for c, e in pairs
               if c not in derived and str(e) not in blob]
    if missing:
        raise AssertionError(
            f"expected literals not found in {ref_files}: {missing}")
    return pairs


# ------------------------------------------------------------------
# wave 1: conformance sweeps whose expected literals sit inline in
# the query source (each a transcription of the reference autotest
# assertion cited in the query docstring).

def _raster():
    from gdal_ray.pipelines import raster

    return raster


@builder("q_fits")
def _q_fits(sf):
    # derived cases: scaled geotransform/BSCALE digits computed from
    # fits.py constants (cited at the query's add() sites)
    return cev(ref_check(
        extract_add_pairs(_raster().q_fits),
        ["autotest/gdrivers/fits.py"],
        derived={"merc:gt1_x1e6", "merc:cs", "offscale:scale_x1e9",
                 "table:I_scaled_x10"}))


@builder("q_s100")
def _q_s100(sf):
    return cev(ref_check(
        extract_add_pairs(_raster().q_s100),
        ["autotest/gdrivers/s102.py", "autotest/gdrivers/s104.py",
         "autotest/gdrivers/s111.py", "autotest/gdrivers/bag.py"],
        derived={"s102:gt3_x100", "s102:flip_gt3_x100", "s102q:sum",
                 "s104:trend_vals"}))


@builder("q_grib2")
def _q_grib2(sf):
    r = _raster()
    pairs = (extract_tuple_pairs(r.q_grib2, "cs_cases")
             + extract_tuple_pairs(r.q_grib2, "gt_cases"))
    # gtx_* rows are round(gt[0]*1000) digits derived from grib.py's
    # published geotransforms, not verbatim literals
    return cev(ref_check(
        pairs, ["autotest/gdrivers/grib.py"],
        derived={c for c, _ in pairs if c.startswith("gtx_")}))


@builder("q_hdf5")
def _q_hdf5(sf):
    return cce(ref_check(
        extract_tuple_pairs(_raster().q_hdf5, "cases"),
        ["autotest/gdrivers/hdf5.py", "autotest/gdrivers/bag.py",
         "autotest/gdrivers/netcdf.py"],
        derived={"eos_chunked"}))


@builder("q_hfa")
def _q_hfa(sf):
    # autotest/gcore/hfa_read.py init_list + gdrivers/hfa.py
    pairs = [("byte.img", 4672), ("int16.img", 4672),
             ("uint16.img", 4672), ("int32.img", 4672),
             ("uint32.img", 4672), ("float32.img", 4672),
             ("float64.img", 4672), ("utmsmall.img", 50054),
             ("2bit_compressed.img", 11918),
             ("int.img", 6691), ("float.img", 23529)]
    return cce(pairs)


@builder("q_srp_nwt")
def _q_srp_nwt(sf):
    pairs = ref_check(
        extract_add_pairs(_raster().q_srp_nwt),
        ["autotest/gdrivers/srp.py", "autotest/gdrivers/nwt_grd.py",
         "autotest/gdrivers/nwt_grc.py"])
    # dynamic loops in the query (same literals, loop-generated cases):
    # USRP PCB variants (gdrivers/srp.py) and Northwood GRD bands
    # (gdrivers/northwood.py)
    for pcb in (0, 4, 8):
        pairs += [(f"srp:pcb{pcb}", 24576), (f"srp:pcb{pcb}:gt0", 500000)]
    pairs += [("grd:r", 28093), ("grd:g", 33690), ("grd:b", 20365),
              ("grd:z", 25856)]
    return cev(pairs)


@builder("q_simple_formats")
def _q_simple_formats(sf):
    pairs = ref_check(
        extract_add_pairs(_raster().q_simple_formats),
        ["autotest/gdrivers/tga.py", "autotest/gdrivers/zmap.py",
         "autotest/gdrivers/hf2.py", "autotest/gdrivers/sigdem.py",
         "autotest/gdrivers/ngsgeoid.py",
         "autotest/gdrivers/nsidcbin.py", "autotest/gdrivers/til.py",
         "autotest/gdrivers/cals.py", "autotest/gcore/tiff_read.py"],
        derived={"ngsgeoid:gt0"})
    # tga loop literals (gdrivers/tga.py ref_test_suite goldens)
    for name, ics in [("cbw8.tga", [43089]), ("ccm8.tga", [38151]),
                      ("utc16.tga", [64747, 64839, 64796]),
                      ("utc32.tga", [9797, 9952, 9848, 0]),
                      ("stefan_full_rgba.tga",
                       [12603, 58561, 36064, 10807]),
                      ("TEST24rle.tga", [39607, 6458, 44534])]:
        for b, e in enumerate(ics):
            pairs.append((f"tga:{name}:{b + 1}", e))
    return cev(pairs)


# independent GDALChecksumImage transcription (alg/gdalchecksum.cpp:
# per-pixel value % prime[i % 11], C truncated modulo, &0xffff) —
# used ONLY for builder-side recomputation over deterministic
# synthetic arrays; shares no code with the engine kernel.

def ref_checksum(band) -> int:
    import numpy as np

    primes = np.array([7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43],
                      np.int64)
    flat = np.ascontiguousarray(band).reshape(-1)
    if flat.dtype.kind == "f":
        v = flat.astype(np.float64)
        out = np.clip(np.floor(np.where(np.isfinite(v), v, 0.0) + 0.5),
                      -2147483647.0, 2147483647.0).astype(np.int64)
        out[~np.isfinite(v)] = -2147483648
        flat = out
    else:
        flat = flat.astype(np.int64)
    pr = primes[np.arange(flat.size) % 11]
    contrib = np.where(flat >= 0, flat % pr, -((-flat) % pr))
    return int(contrib.sum()) & 0xFFFF


def _gt_dot(gt) -> int:
    import numpy as np

    return int(np.round(np.dot(gt, [1, 3, 5, 7, 11, 13])))


@builder("q_classic_formats")
def _q_classic_formats(sf):
    # tests/test_legacy_formats.py (reference autotest/gdrivers/
    # {jdem,terragen,leveller,gxf,lan,doq2,ers,fits,usgsdem,pds,
    # isis2}.py published values)
    doq2_gt = (377054, 1, 0, 4082205, 0, -1)
    fits_gt = (-13095897.481058259, 72.23522015778646, 0.0,
               3991653.2130816197, 0.0, -72.23522015778646)
    pairs = [
        ("jdem", 15), ("terragen", 1128), ("leveller", 33441),
        ("gxf_small", 90), ("gxf_small2", 65042),
        ("lan", 10), ("lan4bit", 10),
        ("doq2_b1", 4201), ("doq2_b2", 4010), ("doq2_b3", 5820),
        ("doq2_gt_dot", _gt_dot(doq2_gt)),
        ("ers_srtm", 64074), ("ers_dem", 56588),
        ("fits_merc_cs", 4855), ("fits_merc_gt_dot", _gt_dot(fits_gt)),
        ("usgsdem_022gdeme", 1583), ("usgsdem_114p01", 53864),
        ("usgsdem_39079G6", 61424), ("usgsdem_39109h1", 39443),
        ("usgsdem_4619old", 10659),
        ("pds_mc02", 47151), ("pds_fl73", 34962), ("pds_en", 1367),
        ("pds_3177", 3418), ("pds_3355", 2748),
        ("pds_fits_wrapped", 14019), ("pds_compressed_delegate", 4672),
        ("pds_ldem4_window", 50938), ("isis2", 382),
    ]
    return cv(pairs)


@builder("q_planetary_grids")
def _q_planetary_grids(sf):
    # tests/test_planetary2.py (autotest/gdrivers/{gsg,rst,ctg,byn,
    # pcidsk,isis3,vicar}.py published checksums); VICAR table is the
    # test module's own parametrize list
    from tests.test_planetary2 import VICAR_CASES

    pairs = [("gsbg", 4672), ("gs7bg", 4672), ("rst_byte", 5044),
             ("rst_real", 5275), ("ctg", 21), ("byn", 64764),
             ("pcidsk", 39576), ("isis3_detached", 9978),
             ("isis3_tiled", 42403)] + list(VICAR_CASES)
    return cv(pairs)


@builder("q_raw_formats")
def _q_raw_formats(sf):
    # tests/test_rawmore.py (autotest/gdrivers/{rraster,gtx,ntv2,
    # snodas,mff,paux,gsc,genbin,isce,roipac,lcp}.py)
    pairs = [("rraster", 4672), ("gtx", 64183),
             ("ntv2_le_b2", 10), ("ntv2_be_b2", 10), ("snodas", 0),
             ("mff", 4672), ("mff_tiled", 1), ("paux_b2", 12816),
             ("gsc", 0), ("genbin_w", 5738), ("isce", 350),
             ("roipac", 64074)]
    for i, e in enumerate([18645, 16431, 18851, 26182, 30038, 22077,
                           30388, 23249]):
        pairs.append((f"lcp_b{i + 1}", e))
    return cv(pairs)


@builder("q_grid_formats")
def _q_grid_formats(sf):
    # tests/test_grid_extras.py (autotest/gdrivers/{aigrid,
    # grassasciigrid,isg,iris,loslas,prf,ndf}.py published values);
    # scaled-gt cases recompute round(gt*10^k) from the gt constants
    # those tests transcribe
    pairs = [
        ("aig_abc3x1_cs", 3), ("aig_abc3x1_nodata", 255),
        ("aig_ABC3X1UC_cs", 3), ("aig_ABC3X1UC_nodata", 255),
        ("aig_sta24_min", 0), ("aig_sta24_max", 2),
        ("grassascii_cs", 212),
        ("grassascii_gt1_x1e6", round(62.5 * 1e6)),
        ("isg_cs", 159),
        ("isg_autocorr_gt0_x1e6", round(-76.0098535 * 1e6)),
        ("isg_autocorr_gt5_x1e9", round(-0.016667 * 1e9)),
        ("isg_dms_gt0_x1e6", round(119.9875 * 1e6)),
        ("isg_dms_gt5_x1e9", round(-0.01666666666 * 1e9)),
        ("iris_fake_cs", 65532), ("iris_cs", 52872),
        ("iris_gt0_ok", 1), ("iris_gt5_ok", 1),
        ("loslas_cs", 0),
        ("loslas_mean_x1e9", round(0.009716129862575248 * 1e9)),
        ("prf_cs", 43190), ("prf_gt3", -7),
        ("prf_dem_w", 4330), ("prf_dem_nodata", -1111111),
        ("ndf_row0_cs", 6510),
        ("ndf_gt0_x100", round(320325.75 * 100)),
    ]
    return cv(pairs)


@builder("q_esric")
def _q_esric(sf):
    # tests/test_esric.py (autotest/gdrivers/esric.py published
    # checksums: conf.xml level 0 empty = 0, L2 band2 46857; Usa.tpkx
    # overview band2 53503); tpkx b4 alpha for the same overview
    return cv([("esric_base_cs", 0), ("esric_512_b2_cs", 46857),
               ("tpkx_ov1_b2_cs", 53503), ("tpkx_ov1_size", 2048)])


@builder("q_military_formats")
def _q_military_formats(sf):
    # tests/test_adrg_ceos.py (autotest/gdrivers/{adrg,ceos,l1b,
    # dds}.py); dds bands equal the reference's stefan_full_rgba.tif
    # published band checksums (gcore fixtures)
    pairs = [
        ("adrg_geo_cs", 62833),
        ("adrg_geo_gt0_x1e9", round(-0.000138888888 * 1e9)),
        ("adrg_zna9_cs", 62833),
        ("adrg_zna9_gt3_x100", round(-179477.5051066006 * 100)),
        ("adrg_zna18_cs", 62833),
        ("adrg_zna18_gt3_x100", round(179477.5051066006 * 100)),
        ("ceos_b4_cs", 9956), ("ceos_bands", 4), ("ceos_pixels", 5932),
        ("dds_b1_cs", 12603), ("dds_b2_cs", 58561),
        ("dds_b3_cs", 36064), ("dds_b4_cs", 10807),
        ("l1b_b1_cs", 14145), ("l1b_mask_cs", 25115),
    ]
    return cv(pairs)


@builder("q_mrf")
def _q_mrf(sf):
    # tests/test_mrf.py: every lossless byte fixture decodes to the
    # reference's canonical 4672 with the NAD27/UTM origin 440720
    # (gdrivers/mrf.py); the jpeg page is the libjpeg-6b-exact decode
    # pinned at 4668 (codec exactness proven on the reference's JPEG
    # fixtures elsewhere)
    pairs = []
    for sub in ("none", "deflate", "png", "jpeg", "tif", "lerc",
                "lerc_v1"):
        pairs.append((f"mrf_{sub}_cs", 4668 if sub == "jpeg" else 4672))
        pairs.append((f"mrf_{sub}_gt0", 440720))
    return cv(pairs)


@builder("q_snap_tiff")
def _q_snap_tiff(sf):
    # tests/test_snap_tiff.py / autotest/gdrivers/snap_tiff.py
    # published values (corner GCPs TL+BR, geoloc min/max, steps)
    pairs = [
        ("width", 25548), ("height", 16716), ("epsg", 4326),
        ("geoloc_w", 1595), ("geoloc_h", 1044),
        ("pixel_step_u", round(16.02697616060226 * 1e6)),
        ("line_step_u", round(16.025886864813039 * 1e6)),
        ("gcp_TL_xu", round(-121.18662152623274 * 1e6)),
        ("gcp_TL_yu", round(39.655540466308594 * 1e6)),
        ("gcp_BR_xu", round(-124.43485147116212 * 1e6)),
        ("gcp_BR_yu", round(38.550738598352105 * 1e6)),
        ("nodata", 0), ("band_intensity_vv", 1), ("unit_intensity", 1),
        ("lon_min_u", round(-124.43485147116212 * 1e6)),
        ("lat_max_u", round(40.05228536834884 * 1e6)),
    ]
    return cv(pairs)


@builder("q_regional_formats")
def _q_regional_formats(sf):
    # tests/test_rawmisc.py (autotest/gdrivers/{pcraster,ilwis,noaa_b,
    # eir,mff2,fast,bsb,rmf}.py published checksums)
    pairs = [
        ("pcraster", 4528), ("ilwis", 2351),
        ("noaab_be", 3), ("noaab_little_endian", 3),
        ("eir", 1), ("mff2", 4672),
        ("fast_hpn", 60323), ("fast_htm_b2", 19110),
        ("bsb_rgbsmall", 30321), ("bsb_rgbsmall_index", 30321),
        ("bsb_rgbsmall_with_line_break", 30321),
        ("rmf_byte", 4672), ("rmf_byte_lzw", 40503),
        ("rmf_float64", 4672), ("rmf_dem", 6388),
    ]
    for name, cks in (("rmf_rgb", [21212, 21053, 21349]),
                      ("rmf_rgb_lzw", [40503, 41429, 40238]),
                      ("rmf_be", [7782, 8480, 4195])):
        for i, e in enumerate(cks):
            pairs.append((f"{name}_b{i + 1}", e))
    return cv(pairs)


@builder("q_exr_codec")
def _q_exr_codec(sf):
    # tests/test_exr.py / autotest/gdrivers/exr.py: lossless
    # roundtrips of the gcore 4672-checksum fixtures; AUTO_RESCALE
    # RGB = 12852/12226/10731 (exr.py:176-178); raw RGB = the
    # published small_world band checksums 30111/32302/40026
    pairs = []
    for comp in ("zip", "zips", "rle", "none"):
        for ptype in ("half", "float", "uint"):
            pairs.append((f"byte_{comp}_{ptype}", 4672))
    pairs += [(n, 4672) for n in ("uint16", "uint32", "float32",
                                  "float64")]
    for b, e in enumerate([12852, 12226, 10731]):
        pairs.append((f"rgb_rescaled_b{b + 1}", e))
    for b, e in enumerate([30111, 32302, 40026]):
        pairs.append((f"rgb_raw_b{b + 1}", e))
    return cv(pairs)


@builder("q_rasterlite2")
def _q_rasterlite2(sf):
    # tests/test_rasterlite2.py (reference RasterLite2 coverages;
    # multi_type table + section/overview checksums; write roundtrips
    # land on the gcore 4672 / small_world 30111 published values)
    pairs = [
        ("byte_cs", 4672), ("byte_novr", 0), ("byte_ovr0", 1087),
        ("sw_b1", 25550), ("sw_b2", 28146), ("sw_novr", 2),
        ("sw_ovr1", 51412), ("sw_sections", 2),
        ("sec1_cs", 3721), ("sec1_ovr0", 35686),
        ("pct_cs", 14890), ("pct_pal1", 176184176),
        ("pct_ovr0", 35614),
        ("mt_subdatasets", 11),
        ("mt_uint8", 4672), ("mt_int8", 4575), ("mt_uint16", 4457),
        ("mt_int16", 4457), ("mt_uint32", 4457), ("mt_int32", 4457),
        ("mt_float", 4457), ("mt_double", 4457), ("mt_1bit", 4873),
        ("wr_byte", 4672), ("wr_float64", 4672),
        ("wr_rgb_png", 30111),
    ]
    return cv(pairs)


@builder("q_pdf_raster")
def _q_pdf_raster(sf):
    # tests/test_pdf.py: byte.tif PDF roundtrips land on the gcore
    # 4672 published checksum with exact georef; MediaBox = 20px at
    # 300 dpi = 4.8pt (ISO 32000 UserUnit math, not engine output)
    pairs = []
    for comp in ("deflate", "none", "dpi300"):
        pairs += [(f"{comp}_cs", 4672), (f"{comp}_epsg", 26711),
                  (f"{comp}_gt_ok", 1)]
    pairs.append(("dpi300_mediabox", 1))
    return cv(pairs)


@builder("q_webp_codec")
def _q_webp_codec(sf):
    # tiff_write.py:8401 WEBP_LOSSLESS rgbsmall checksums; transform
    # roundtrip flags are lossless-by-construction (14 predictor
    # modes, colour transform, 5 palette widths); container RGBA
    # checksum recomputed from the seeded synthetic with the
    # independent ref_checksum transcription
    import numpy as np

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (64, 48, 4), np.uint8)
    pairs = [("rgbsmall_webp_b1", 21212), ("rgbsmall_webp_b2", 21053),
             ("rgbsmall_webp_b3", 21349),
             ("predictor_modes_ok", 14), ("color_transform_ok", 1),
             ("palette_widths_ok", 5),
             ("container_rgba_cs",
              ref_checksum(img.astype(np.int64).sum(axis=2)))]
    return cv(pairs)


@builder("q_dem_goldens")
def _q_dem_goldens(sf):
    # (case, expected) table inside the query = the reference's
    # test_gdaldem_lib.py published checksums
    import pandas as pd

    pairs = ref_check(
        extract_tuple_pairs(_raster().q_dem_goldens, "cases"),
        ["autotest/utilities/test_gdaldem_lib.py",
         "autotest/utilities/test_gdalalg_raster_color_map.py",
         "autotest/utilities/test_gdalalg_raster_nodata_to_alpha.py",
         "autotest/gcore/tiff_read.py"])
    return pd.DataFrame({"case": [c for c, _ in pairs],
                         "cksum": [e for _, e in pairs],
                         "expected": [e for _, e in pairs]})


@builder("q_alg_goldens")
def _q_alg_goldens(sf):
    # sieve/proximity/polygonize/grid published expectations embedded
    # in the query's cases table (autotest alg suites)
    import ast
    import inspect
    import textwrap

    import pandas as pd

    src = textwrap.dedent(inspect.getsource(_raster().q_alg_goldens))
    tree = ast.parse(src)
    rows = None
    for node in ast.walk(tree):
        if (isinstance(node, ast.Assign)
                and isinstance(node.targets[0], ast.Name)
                and node.targets[0].id == "cases"):
            # cases = [comprehensions over literal pair tables]; eval
            # the whole expression in an empty namespace (pure literals)
            rows = eval(compile(ast.Expression(node.value),
                                "<cases>", "eval"), {}, {})
            break
    return pd.DataFrame({"suite": [s for s, _, _ in rows],
                         "case": [c for _, c, _ in rows],
                         "ours": [e for _, _, e in rows],
                         "expected": [e for _, _, e in rows]})


@builder("q_vrt")
def _q_vrt(sf):
    import pandas as pd

    vrts = ["utmsmall_near.vrt", "utmsmall_blinear.vrt",
            "utmsmall_cubic.vrt", "utmsmall_cubicspline.vrt"]
    return pd.DataFrame({"case": vrts, "within_bar": [1] * 4})


@builder("q_product_formats")
def _q_product_formats(sf):
    # inline literal expected args (autotest hdf4/sentinel2/rs2/rcm/
    # stacta/stacit published values) + the hdf4 fixture loop table
    pairs = ref_check(
        extract_add_pairs(_raster().q_product_formats),
        ["autotest/gcore/hdf4_read.py", "autotest/gdrivers/sentinel2.py",
         "autotest/gdrivers/rs2.py", "autotest/gdrivers/rcm.py",
         "autotest/gdrivers/stacta.py", "autotest/gdrivers/stacit.py"],
        derived={"hdf4:palette_rows"})
    pairs += [("hdf4:byte_3.hdf", 4672), ("hdf4:float64_3.hdf", 4672),
              ("hdf4:utmsmall_3.hdf", 50054), ("hdf4:byte_2.hdf", 4672),
              ("hdf4:float32_2.hdf", 4672),
              ("hdf4:utmsmall_2.hdf", 50054)]
    return cev(pairs)


@builder("q_raster_open")
def _q_raster_open(sf):
    # lossless rows recomputed from the corpus generator's raw pixels
    # (pre-codec) with the independent checksum transcription; the
    # lossy jpeg row pins the input_hint PSNR>=40dB gate
    import pandas as pd

    from gdal_ray.sources.images import image_pixels

    def gtsum(idx):
        gt = (10.0 + idx, 0.5, 0.0, 20.0 - idx, 0.0, -0.5)
        return round(sum(abs(g) for g in gt) * 1000)

    rows = [
        ("gtiff", "GTiff", 32633, gtsum(0),
         ref_checksum(image_pixels(0)[:64, :64, 0])),
        ("png_wf", "PNG", 3857, gtsum(1),
         ref_checksum(image_pixels(1)[:64, :64, 0])),
        ("jpeg_wld", "JPEG", 0, gtsum(2), 1),
    ]
    return pd.DataFrame(rows, columns=["case", "driver", "epsg",
                                       "gt_cksum", "px_cksum"])


@builder("q_zarr")
def _q_zarr(sf):
    # recompute the analytic synthetic field (sources/multidim.py
    # synthetic_mdarray formula, re-derived here) per 64px tile —
    # independent of the zarr codec path under test
    import numpy as np
    import pandas as pd

    def field(oy, ox, sy, sx, t=1, seed=77):
        yy, xx = np.meshgrid(np.arange(oy, oy + sy),
                             np.arange(ox, ox + sx), indexing="ij")
        return (np.sin(xx / 37.0) * np.cos(yy / 23.0) * 100.0
                + t * 10.0 + (xx * 31 + yy * 17 + t * 7 + seed) % 13)

    rows = []
    for oy in range(0, 160, 64):
        for ox in range(0, 160, 64):
            ty, tx = oy, ox          # tile keys are pixel origins
            sy = min(64, 160 - oy)
            sx = min(64, 160 - ox)
            px = field(oy, ox, sy, sx)
            m = float(px.mean())
            m6 = float(np.copysign(
                np.floor(np.abs(m) * 1e6 + 0.5), m) / 1e6)
            rows.append((ty, tx, m6,
                         ref_checksum(np.floor(px).astype(np.int32))))
    df = pd.DataFrame(rows, columns=["ty", "tx", "mean", "checksum"])
    df["ty"] = df["ty"].astype("int32")
    df["tx"] = df["tx"].astype("int32")
    return df


@builder("q_multidim")
def _q_multidim(sf):
    # analytic recomputation of the synthetic (time,y,x) field's
    # slice(0:2) -> unscale (v*0.5-20) -> 128px-tile means
    import numpy as np
    import pandas as pd

    def field(t, oy, ox, sy, sx, seed=77):
        yy, xx = np.meshgrid(np.arange(oy, oy + sy),
                             np.arange(ox, ox + sx), indexing="ij")
        return (np.sin(xx / 37.0) * np.cos(yy / 23.0) * 100.0
                + t * 10.0 + (xx * 31 + yy * 17 + t * 7 + seed) % 13)

    rows = []
    for oy in range(0, 300, 128):
        for ox in range(0, 400, 128):
            sy = min(128, 300 - oy)
            sx = min(128, 400 - ox)
            vals = np.stack([field(t, oy, ox, sy, sx)
                             for t in (0, 1)])
            un = vals * 0.5 - 20.0
            rows.append((oy, ox, float(np.round(un.mean(), 6))))
    df = pd.DataFrame(rows, columns=["ty", "tx", "mean"])
    return df


@builder("q_gpx_layer")
def _q_gpx_layer(sf):
    # synthetic-fixture rows derived from the generation parameters
    # (40 waypoints ele=i%17, 8 tracks x 2 segs x 5 pts); test.gpx
    # rows derived by parsing the reference's own fixture with
    # ElementTree (no engine code)
    import xml.etree.ElementTree as ET

    import pandas as pd

    rows = [("fixture:waypoints",
             sum(i % 17 for i in range(40)) * 100, 40, 40),
            ("fixture:tracks", 0, 8, 8 * 2 * 5),
            ("fixture:track_points", 0, 8 * 2 * 5, 8 * 2 * 5)]

    ns = {"g": "http://www.topografix.com/GPX/1/1"}
    root = ET.parse(
        "/root/reference/autotest/ogr/data/gpx/test.gpx").getroot()

    def elesum(elems):
        return round(sum(float(e.findtext("g:ele", "0", ns) or 0)
                         for e in elems) * 100)

    wpts = root.findall("g:wpt", ns)
    rtes = root.findall("g:rte", ns)
    rtepts = [p for r in rtes for p in r.findall("g:rtept", ns)]
    trks = root.findall("g:trk", ns)
    trkpts = [p for t in trks for s in t.findall("g:trkseg", ns)
              for p in s.findall("g:trkpt", ns)]
    rows += [
        ("test.gpx:waypoints", elesum(wpts), len(wpts), len(wpts)),
        ("test.gpx:routes", 0, len(rtes), len(rtepts)),
        ("test.gpx:route_points", elesum(rtepts), len(rtepts),
         len(rtepts)),
        ("test.gpx:tracks", 0, len(trks), len(trkpts)),
        ("test.gpx:track_points", elesum(trkpts), len(trkpts),
         len(trkpts)),
    ]
    return pd.DataFrame(rows, columns=["case", "ele_x100", "n",
                                       "verts"])


def _round_away(v, nd=6):
    import numpy as np

    v = np.asarray(v, np.float64)
    f = 10.0 ** nd
    return np.copysign(np.floor(np.abs(v) * f + 0.5), v) / f


def _points_expected(xcol="gx_sum", ycol="gy_sum"):
    # recompute the altitude-bucket aggregate straight from the data
    # generator's columns (sources/vector.py points_table is the
    # INPUT, not the format codec under test) in pandas
    import numpy as np
    import pandas as pd

    from gdal_ray.sources.vector import points_table

    t = points_table(256).to_pandas()
    t["zband"] = np.floor(t["z"] / 200.0)
    g = t.groupby("zband").agg(n=("fid", "count"), xs=("x", "sum"),
                               ys=("y", "sum")).reset_index()
    return pd.DataFrame({
        "zband": g["zband"].astype("int64"),
        "n": g["n"].astype("int64"),
        xcol: _round_away(g["xs"]),
        ycol: _round_away(g["ys"]),
    })


@builder("q_csv_layer")
def _q_csv_layer(sf):
    return _points_expected()


@builder("q_arrow_layer")
def _q_arrow_layer(sf):
    return _points_expected()


@builder("q_geojson_layer")
def _q_geojson_layer(sf):
    return _points_expected("x_sum", "y_sum")


def _wkb_ring0_npoints(wkb: bytes) -> int:
    # minimal independent WKB polygon parse (little-endian, type 3)
    import struct

    bo = "<" if wkb[0] == 1 else ">"
    gtype = struct.unpack_from(bo + "I", wkb, 1)[0] & 0xFF
    if gtype != 3:
        raise ValueError("not a polygon")
    return struct.unpack_from(bo + "I", wkb, 9)[0]


def _zones_expected():
    from gdal_ray.sources.vector import polygons_table

    return polygons_table(64).to_pandas()


@builder("q_shp_layer")
def _q_shp_layer(sf):
    import pandas as pd

    t = _zones_expected()
    g = t.groupby("category").agg(
        n=("fid", "count"), pop_sum=("pop", "sum")).reset_index()
    g["n"] = g["n"].astype("int64")
    g["pop_sum"] = g["pop_sum"].astype("int64")
    return g[["category", "n", "pop_sum"]]


@builder("q_fgb_layer")
def _q_fgb_layer(sf):
    t = _zones_expected()
    bx = (2.25, 48.8, 2.35, 48.92)
    keep = ~((t["bbox_xmax"] < bx[0]) | (t["bbox_xmin"] > bx[2])
             | (t["bbox_ymax"] < bx[1]) | (t["bbox_ymin"] > bx[3]))
    g = t[keep].groupby("category").agg(
        n=("fid", "count"), pop_sum=("pop", "sum")).reset_index()
    g["n"] = g["n"].astype("int64")
    g["pop_sum"] = g["pop_sum"].astype("int64")
    return g[["category", "n", "pop_sum"]]


@builder("q_gpkg_layer")
def _q_gpkg_layer(sf):
    t = _zones_expected()
    g = t.groupby("category").agg(
        n=("fid", "count"), pop_sum=("pop", "sum"),
        area_sum=("area_expected", "sum")).reset_index()
    g["n"] = g["n"].astype("int64")
    g["pop_sum"] = g["pop_sum"].astype("int64")
    g["area_sum"] = _round_away(g["area_sum"])
    return g[["category", "n", "pop_sum", "area_sum"]]


@builder("q_sqlite_layer")
def _q_sqlite_layer(sf):
    # fixture groupby from the generator table + the reference's own
    # poly_spatialite.sqlite golden read with STDLIB sqlite3 (the
    # compressed-geometry decode under test never runs here)
    import sqlite3

    import pandas as pd

    g = _q_shp_layer(sf)
    con = sqlite3.connect(
        "/root/reference/autotest/ogr/data/sqlite/poly_spatialite.sqlite")
    n, s = con.execute(
        "SELECT COUNT(*), SUM(eas_id) FROM poly").fetchone()
    con.close()
    gold = pd.DataFrame({"category": ["__golden_poly__"],
                         "n": [int(n)], "pop_sum": [int(s)]})
    return pd.concat([g, gold], ignore_index=True)


@builder("q_kml_gml_layer")
def _q_kml_gml_layer(sf):
    import pandas as pd

    t = _zones_expected()
    t["verts"] = [_wkb_ring0_npoints(w) for w in t["geometry"]]
    g = t.groupby("category").agg(
        n=("fid", "count"), pop_sum=("pop", "sum"),
        verts_sum=("verts", "sum")).reset_index()
    rows = []
    for fmt in ("kml", "gml"):
        for _, r in g.iterrows():
            rows.append((r["category"], fmt, int(r["n"]),
                         int(r["pop_sum"]), int(r["verts_sum"])))
    return pd.DataFrame(rows, columns=["category", "fmt", "n",
                                       "pop_sum", "verts_sum"])


# fresh implementations of the deterministic text sketches (stdlib
# hashlib/re + numpy written against functions/text.py's documented
# spec — no engine import), recomputed straight from the parquet

def _read_docs(sf):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


@builder("q_simhash")
def _q_simhash(sf):
    import hashlib
    import re

    import numpy as np
    import pandas as pd

    word = re.compile(r"[A-Za-z0-9]+(?:'[A-Za-z]+)?")
    person = (0).to_bytes(8, "little")

    def sh(text):
        toks = word.findall(text.lower())
        if not toks:
            return 0
        votes = [0] * 64
        for w in toks:
            h = int.from_bytes(
                hashlib.blake2b(w.encode(), digest_size=8,
                                person=person).digest(), "little")
            for k in range(64):
                votes[k] += 1 if (h >> k) & 1 else -1
        v = 0
        for k in range(64):
            if votes[k] > 0:
                v |= 1 << k
        return v - (1 << 64) if v >= (1 << 63) else v

    ids, texts = _read_docs(sf)
    return pd.DataFrame({"doc_id": ids,
                         "simhash": np.array([sh(t) for t in texts],
                                             np.int64)})


@builder("q_fingerprint")
def _q_fingerprint(sf):
    import hashlib

    import numpy as np
    import pandas as pd

    def fp(text, window=16, base=257, mod=(1 << 61) - 1):
        data = text.encode()
        if len(data) <= window:
            return int.from_bytes(
                hashlib.blake2b(data, digest_size=8,
                                person=(0).to_bytes(8, "little")
                                ).digest(), "little", signed=True)
        p = pow(base, window - 1, mod)
        h = 0
        best = None
        for i, b in enumerate(data):
            h = (h * base + b) % mod
            if i >= window:
                h = (h - data[i - window] * p * base) % mod
            if i >= window - 1:
                best = h if best is None else min(best, h)
        return best

    ids, texts = _read_docs(sf)
    return pd.DataFrame({"doc_id": ids,
                         "fingerprint": np.array(
                             [fp(t) for t in texts], np.int64)})


@builder("q_ann_multi_query")
def _q_ann_multi_query(sf):
    # exact top-5 cosine recomputed directly from the embeddings
    # parquet with fresh numpy (one matmul, no partial-merge pipeline)
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    rng = np.random.default_rng(777)
    q = rng.normal(0, 1, (4, 64))
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    emb = np.array(t["embedding"].to_pylist(), np.float64)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    sims = emb @ q.T
    rows = []
    for qi in range(4):
        s = sims[:, qi]
        order = np.lexsort((ids, -s))[:5]
        for rank, j in enumerate(order, 1):
            v = s[j]
            rows.append((qi, int(ids[j]), rank,
                         float(np.copysign(np.floor(abs(v) * 1e4 + 0.5),
                                           v) / 1e4)))
    return pd.DataFrame(rows, columns=["query_id", "vec_id", "rank",
                                       "sim"])


@builder("q_audio_features")
def _q_audio_features(sf):
    # regenerate the sine-mix corpus + the 3-line pcm16 quantization
    # with fresh numpy, recompute rms/zcr directly
    import numpy as np
    import pandas as pd

    rows = []
    for i in range(64):
        rng = np.random.default_rng(31337 + i)
        sr = 8000
        dur = int(sr * rng.uniform(0.2, 1.0))
        tt = np.arange(dur) / sr
        f0, f1 = rng.uniform(100, 2000, 2)
        x = (0.5 * np.sin(2 * np.pi * f0 * tt)
             + 0.3 * np.sin(2 * np.pi * f1 * tt))
        q = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
        y = q.astype(np.float64) / 32767.0
        rms = float(np.sqrt(np.mean(y * y))) if len(y) else 0.0
        zcr = (float(np.mean(np.signbit(y[1:]) != np.signbit(y[:-1])))
               if len(y) > 1 else 0.0)
        rows.append((f"aud{i:06d}", len(y), np.round(rms, 4),
                     np.round(zcr, 4)))
    return pd.DataFrame(rows, columns=["media_id", "n_samples", "rms",
                                       "zcr"])


@builder("q_video_frames")
def _q_video_frames(sf):
    # regenerate the hash-seeded fake frames and re-derive the 8x8
    # average-hash with fresh numpy (no engine import)
    import hashlib

    import numpy as np
    import pandas as pd

    def ahash(gray):
        g = gray.astype(np.float64)
        g8 = g[:32, :32].reshape(8, 4, 8, 4).mean(axis=(1, 3))
        bits = (g8 > g8.mean()).astype(np.uint64).reshape(-1)
        v = int((bits << np.arange(64, dtype=np.uint64)).sum()
                .astype(np.uint64))
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = []
    for i in range(48):
        nf = 8 + (i % 5) * 4
        mid = f"vid{i:06d}"
        idxs = np.unique(np.linspace(0, nf - 1, 4).astype(int))
        for fi in idxs.tolist():
            seed = int.from_bytes(hashlib.blake2b(
                f"{mid}:{fi}".encode(), digest_size=8).digest(), "big")
            fr = np.random.default_rng(seed).integers(
                0, 256, (32, 32), np.uint8)
            rows.append((mid, fi, ahash(fr), float(fr.mean())))
    df = pd.DataFrame(rows, columns=["media_id", "frame_idx", "phash",
                                     "mean_lum"])
    df["frame_idx"] = df["frame_idx"].astype("int32")
    return df


@builder("q_warp_goldens")
def _q_warp_goldens(sf):
    import os

    import pandas as pd

    from gdal_ray.pipelines.raster import _GOLDENS

    rows = [(os.path.basename(g), a, 1) for _, g, a in _GOLDENS
            if os.path.exists(f"/root/reference/autotest/{g}")]
    return pd.DataFrame(rows, columns=["golden", "algo", "within_bar"])


@builder("q_lineref")
def _q_lineref(sf):
    # autotest/utilities/test_ogrlineref.py printed goldens
    import pandas as pd

    rows = [("n_parts", 9.0, 0.0),
            ("get_pos", 15977.724709, 0.0),
            ("get_coord", -1.435097, 51.950080),
            ("get_subline", 1.0, 0.0)]
    return pd.DataFrame(rows, columns=["case", "value_a", "value_b"])


@builder("q_rat")
def _q_rat(sf):
    # autotest/gdrivers/hfa.py:1191-1219 published RAT facts +
    # gcore/rat.py synthetic-table expectations
    return cv([
        ("hfa_n_cols", 6), ("hfa_col0_real", 1), ("hfa_col0_minmax", 1),
        ("hfa_binvalue_2", 4), ("hfa_hist_4", 656),
        ("hfa_arrow_roundtrip", 1),
        ("synth_clone_cols", 2), ("synth_clone_rows", 3),
        ("synth_usage_count", 1), ("synth_row_of_11", 1),
        ("synth_value_1_1", 200),
    ])


@builder("q_jp2")
def _q_jp2(sf):
    # jp2openjpeg.py:76,233,3059,3688 + jp2kak.py:53 published
    # checksums; the lossless pair equals the canonical byte 4672
    pairs = [("byte.jp2:1", 50054), ("int16.jp2:1", 4587),
             ("byte_tile_2048.jp2:1", 4610),
             ("tile_size_16.jp2:1", 44216),
             ("3_13bit_and_1bit.jp2:1", 64570),
             ("3_13bit_and_1bit.jp2:2", 57277),
             ("3_13bit_and_1bit.jp2:3", 56048),
             ("3_13bit_and_1bit.jp2:4", 61292),
             ("byte_lossless_openjp2_golden.jp2:1", 4672),
             ("int16_lossless.jp2:1", 4672),
             ("513x513.jp2@1:1", 29642),
             ("tile_size_16.jp2@1:1", 61711),
             ("WRITE:byte.tif:1", 4672),
             ("WRITE:small_world.tif:2", 32302),
             # lossy 9/7 roundtrips: the input_hint PSNR>=40dB gate
             ("LOSSY:byte.tif:1", 1), ("LOSSY:rgbsmall.tif:2", 1)]
    return cce(pairs)


@builder("q_tile_geodetic")
def _q_tile_geodetic(sf):
    # the reference's small_world geodetic z0 expectations
    # (test_gdalalg_raster_tile_small_world_geodetic), abs=1 bar
    import pandas as pd

    exp = {(0, 0): [1315, 63955, 5106], (1, 0): [24456, 25846, 15674]}
    rows = []
    for (tx, ty), cks in exp.items():
        for b, e in enumerate(cks):
            rows.append((f"0/{tx}/{ty}:b{b + 1}", e, 1))
    return pd.DataFrame(rows, columns=["case", "expected",
                                       "within_ref_tolerance"])


@builder("q_gdaltindex")
def _q_gdaltindex(sf):
    # footprints derive purely from the synthetic gt/size metadata
    # (no decode): per image k, gt=(1000+40k, 2, 0, 900-10k, 0, -2),
    # raster dims = generator image size (k%3==0: full; else the
    # ::4 subsample) -> footprint area = (w*2)*(h*2); grouped by
    # extension exactly like the query
    import pandas as pd

    from gdal_ray.sources.images import image_size

    rows = []
    for k in range(18):
        n = image_size(k)
        if k % 3 == 0:
            w = h = n
            ext = ".tif"
        else:
            w = h = len(range(0, n, 4))
            ext = ".asc" if k % 3 == 1 else ".xyz"
        rows.append((ext, (w * 2.0) * (h * 2.0), w * h))
    df = pd.DataFrame(rows, columns=["ext", "area", "cells"])
    g = df.groupby("ext").agg(n=("cells", "count"),
                              area_sum=("area", "sum"),
                              cells_sum=("cells", "sum")).reset_index()
    g["n"] = g["n"].astype("int64")
    g["cells_sum"] = g["cells_sum"].astype("int64")
    g["area_sum"] = _round_away(g["area_sum"], 3)
    return g[["ext", "n", "area_sum", "cells_sum"]]


@builder("q_crs_transform")
def _q_crs_transform(sf):
    # the independent claim: every CRS round-trips its in-domain
    # points under 1 cm on the full sf0.01 events table (n = 10000);
    # exact projection pins live in tests/test_crs_projections.py
    import pandas as pd
    import pyarrow.parquet as pq

    n = pq.read_metadata(f"{sf}/events.parquet").num_rows
    epsgs = [2154, 2193, 3035, 3395, 3413, 5070, 25832, 27700,
             31467, 32633, 32661, 3857]
    df = pd.DataFrame({"epsg": sorted(epsgs), "n": n,
                       "roundtrip_under_cm": 1})
    df["epsg"] = df["epsg"].astype("int32")
    df["n"] = df["n"].astype("int64")
    return df


@builder("q_cell_index")
def _q_cell_index(sf):
    # scalar per-point re-derivation of the documented S2-style cell
    # id (functions/s2cell.py module doc: face formulas, quadratic
    # u->s, classic xy2d Hilbert, 3+2L+1 bit layout) — no engine
    # import, plain math
    import math

    import pandas as pd
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf}/events.parquet",
                      columns=["event_id", "value"])
    level = 10

    def cell(lon, lat):
        lam = math.radians(lon)
        phi = math.radians(lat)
        x = math.cos(phi) * math.cos(lam)
        y = math.cos(phi) * math.sin(lam)
        z = math.sin(phi)
        ax, ay, az = abs(x), abs(y), abs(z)
        if ax >= ay and ax >= az:
            face = 0 if x >= 0 else 3
        elif ay >= az:
            face = 1 if y >= 0 else 4
        else:
            face = 2 if z >= 0 else 5
        u, v = [
            (y / x, z / x), (-x / y, z / y), (-x / z, -y / z),
            (z / x, y / x), (z / y, -x / y), (-y / z, -x / z),
        ][face]

        def st(w):
            return (0.5 * math.sqrt(1 + 3 * w) if w >= 0
                    else 1.0 - 0.5 * math.sqrt(1 - 3 * w))

        s, tt = st(u), st(v)
        n = 1 << level
        i = min(max(int(math.floor(s * n)), 0), n - 1)
        j = min(max(int(math.floor(tt * n)), 0), n - 1)
        d = 0
        sbit = n >> 1
        xx, yy = i, j
        while sbit > 0:
            rx = 1 if (xx & sbit) else 0
            ry = 1 if (yy & sbit) else 0
            d += sbit * sbit * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    xx = sbit - 1 - xx
                    yy = sbit - 1 - yy
                xx, yy = yy, xx
            sbit >>= 1
        shift = 2 * (30 - level) + 1
        val = ((face << 61) | (d << shift) | (1 << (shift - 1))) \
            & ((1 << 64) - 1)
        # two's-complement int64 wrap (the id rides int64 columns)
        return val - (1 << 64) if val >= (1 << 63) else val

    ids = t["event_id"].to_pylist()
    vals = t["value"].to_pylist()
    cells = []
    for v in vals:
        lon = math.fmod(v * 7.0, 360.0) - 180.0
        lat = math.fmod(v * 3.0, 170.0) - 85.0
        cells.append(cell(lon, lat))
    return pd.DataFrame({"cell": pd.array(cells, dtype="int64"),
                         "event_id": ids})


@builder("q_polygonize")
def _q_polygonize(sf):
    # independent local recomputation: rebuild the 64x64 quantized
    # events grid straight from the parquet and label 4-connected
    # regions with a plain BFS — the distributed tile-merge under
    # test must reproduce these regions exactly
    import collections

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    n = 64
    v = pq.read_table(f"{sf}/events.parquet",
                      columns=["value"])["value"].to_numpy()
    lon = np.fmod(v * 7.0, 360.0) - 180.0
    lat = np.fmod(v * 3.0, 170.0) - 85.0
    cx = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(int)
    cy = np.clip(np.floor((lat + 85.0) / 170.0 * n), 0, n - 1).astype(int)
    grid = np.zeros((n, n), np.int64)
    np.add.at(grid, (cy, cx), 1)
    grid //= 4

    seen = np.zeros((n, n), bool)
    rows = []
    for y0 in range(n):
        for x0 in range(n):
            if seen[y0, x0]:
                continue
            val = grid[y0, x0]
            q = collections.deque([(y0, x0)])
            seen[y0, x0] = True
            npx = 0
            xmin = xmax = x0
            ymin = ymax = y0
            while q:
                y, x = q.popleft()
                npx += 1
                xmin = min(xmin, x); xmax = max(xmax, x)
                ymin = min(ymin, y); ymax = max(ymax, y)
                for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    yy, xx = y + dy, x + dx
                    if (0 <= yy < n and 0 <= xx < n and not seen[yy, xx]
                            and grid[yy, xx] == val):
                        seen[yy, xx] = True
                        q.append((yy, xx))
            rows.append((int(val), npx, xmin, xmax, ymin, ymax))
    df = pd.DataFrame(rows, columns=["value", "n_pixels", "xmin",
                                     "xmax", "ymin", "ymax"])
    return df


def _events_grid_indep(sf, n=64):
    import numpy as np
    import pyarrow.parquet as pq

    v = pq.read_table(f"{sf}/events.parquet",
                      columns=["value"])["value"].to_numpy()
    lon = np.fmod(v * 7.0, 360.0) - 180.0
    lat = np.fmod(v * 3.0, 170.0) - 85.0
    cx = np.clip(np.floor((lon + 180.0) / 360.0 * n), 0, n - 1).astype(int)
    cy = np.clip(np.floor((lat + 85.0) / 170.0 * n), 0, n - 1).astype(int)
    grid = np.zeros((n, n), np.int64)
    np.add.at(grid, (cy, cx), 1)
    return grid // 4


@builder("q_contour")
def _q_contour(sf):
    # independent marching-squares segment count straight from the
    # parquet-derived grid: the reference's case table (0/15 -> 0,
    # saddles 5/10 -> 2, else 1) applied scalar per cell
    import numpy as np
    import pandas as pd

    z = _events_grid_indep(sf).astype(float)
    zmin, zmax = z.min(), z.max()
    interval = max(1.0, (zmax - zmin) / 8.0)
    k0 = int(np.ceil(zmin / interval))
    k1 = int(np.floor(zmax / interval))
    levels = [k * interval for k in range(k0, k1 + 1)]
    rows = []
    h, w = z.shape
    for lv in levels:
        segs = 0
        for y in range(h - 1):
            for x in range(w - 1):
                code = ((z[y, x] >= lv) | ((z[y, x + 1] >= lv) << 1)
                        | ((z[y + 1, x + 1] >= lv) << 2)
                        | ((z[y + 1, x] >= lv) << 3))
                if code in (0, 15):
                    continue
                segs += 2 if code in (5, 10) else 1
        rows.append((float(lv), segs))
    return pd.DataFrame(rows, columns=["level", "n_segments"])


@builder("q_multimodal_real")
def _q_multimodal_real(sf):
    # wav rows: fresh quantization recompute (3-line PCM16 path);
    # avi rows: crc32 of the blake2-seeded payloads (container
    # extraction must be byte-exact) — no container/codec import
    import hashlib
    import zlib

    import numpy as np
    import pandas as pd

    rows = []
    for i in range(8):
        rng = np.random.default_rng(5150 + i)
        sr = 8000
        dur = int(sr * rng.uniform(0.25, 0.75))
        tt = np.arange(dur) / sr
        f0 = rng.uniform(200, 1500)
        x = 0.6 * np.sin(2 * np.pi * f0 * tt)
        q = np.clip(x * 32767.0, -32768, 32767).astype("<i2")
        y = q.astype(np.float64) / 32767.0
        rms = float(np.sqrt(np.mean(y * y)))
        zcr = float(np.mean(np.signbit(y[1:]) != np.signbit(y[:-1])))
        rows += [(f"wav{i:03d}:n", len(y)),
                 (f"wav{i:03d}:rms4", round(rms * 1e4)),
                 (f"wav{i:03d}:zcr4", round(zcr * 1e4))]
    for i in range(4):
        for k in range(4):
            payload = hashlib.blake2b(
                f"avi{i}:{k}".encode(), digest_size=32).digest() * 8
            rows.append((f"avi{i:03d}:{k}", zlib.crc32(payload)))
    return pd.DataFrame(rows, columns=["case", "value"])


@builder("q_sentinel2")
def _q_sentinel2(sf):
    # geometry facts from the synthesized SAFE constants; per-band
    # mosaic checksums = the reference's published byte.jp2 50054
    # (jp2openjpeg.py:76 — the granule payload IS that file)
    return cv([("w", 100), ("h", 100), ("epsg", 32632),
               ("gt0", 699960), ("nbits", 12), ("has_pixels", 1),
               ("cs_B2", 50054), ("cs_B3", 50054), ("cs_B4", 50054),
               ("cs_B8", 50054)])


@builder("q_netcdf")
def _q_netcdf(sf):
    # fixture rows: the reference's published values (netcdf.py byte
    # 4672 / tas 31621 / trmm 14, trmm-2x2 exact gt, CDF-2 == CDF-1);
    # corpus rows: identity-roundtrip flags + the synthetic gt
    pairs = [
        ("byte.nc:cs", 4672),
        ("byte.nc:gt_dot", _gt_dot((440720.0, 60.0, 0.0, 3751320.0,
                                    0.0, -60.0))),
        ("bug636.nc:tas:cs", 31621),
        ("trmm-2x2.nc:gt_dot", _gt_dot((-80.0, 0.25, 0.0, -19.5, 0.0,
                                        -0.25))),
        ("trmm.nc:cs", 14), ("trmm-nc2.nc:cs", 14),
    ]
    corpus_gt = _gt_dot((500.0, 10.0, 0.0, 8000.0, 0.0, -10.0))
    for i in range(16):
        pairs += [(f"img{i:08d}.nc:roundtrip_ok", 1),
                  (f"img{i:08d}.nc:gt_dot", corpus_gt)]
    return cv(pairs)


@builder("q_nitf")
def _q_nitf(sf):
    # autotest/gdrivers/nitf.py published fixture checksums + corpus
    # identity-roundtrip flags
    pairs = [("rgb.ntf", 21349), ("i_3034c.ntf", 170),
             ("i_3034f.ntf", 170), ("ns3034d.nsf", 170)]
    pairs += [(f"img{i:08d}:roundtrip_ok", 1) for i in range(16)]
    return cce(pairs)


@builder("q_ascii_raster")
def _q_ascii_raster(sf):
    # identity-roundtrip flags + the synthetic gt constant, per
    # (image, format); drivers are the probe's documented names
    import pandas as pd

    gtd = _gt_dot((1000.0, 30.0, 0.0, 5000.0, 0.0, -30.0))
    rows = []
    for i in range(24):
        for ext, drv in ((".asc", "AAIGrid"), (".xyz", "XYZ"),
                         (".pgm", "PNM")):
            rows.append((f"img{i:08d}{ext}", drv, 1, gtd))
    return pd.DataFrame(rows, columns=["case", "driver",
                                       "roundtrip_ok", "gt_dot"])


@builder("q_binary_raster")
def _q_binary_raster(sf):
    import pandas as pd

    gtd = _gt_dot((1000.0, 30.0, 0.0, 5000.0, 0.0, -30.0))
    rows = []
    for i in range(24):
        for suffix, drv in ((".bmp", "BMP"), ("_rgb.bmp", "BMP"),
                            (".gif", "GIF")):
            rows.append((f"img{i:08d}{suffix}", drv, 1, gtd))
    return pd.DataFrame(rows, columns=["case", "driver",
                                       "roundtrip_ok", "gt_dot"])


@builder("q_terrain")
def _q_terrain(sf):
    # identity-roundtrip flags; the SAGA gt replicates the query's
    # synthetic constant per image (lat = 40 + i%5, lon = -100 + i%7,
    # step = 1/(n-1) with n = the square crop of the generator size);
    # the n43 golden rows derive from dted.py's published values
    import pandas as pd

    from gdal_ray.sources.images import image_size

    rows = []
    for i in range(12):
        n = len(range(0, image_size(i), 2))
        n = min(n, n)
        lat, lon = 40 + (i % 5), -100 + (i % 7)
        step = 1.0 / (n - 1)
        gt = (lon - step / 2, step, 0.0, lat + 1 + step / 2, 0.0,
              -step)
        gtd = int(round(sum(g * w for g, w in
                            zip(gt, [1, 3, 5, 7, 11, 13])) * 64))
        rows.append((f"img{i:08d}:dted", "DTED", 1, 0))
        rows.append((f"img{i:08d}:hgt", "SRTMHGT", 1, 0))
        rows.append((f"img{i:08d}:saga", "SAGA", 1, gtd))
    n43gt = (-80.004166666666663, 0.0083333333333333, 0,
             44.00416666666667, 0, -0.0083333333333333)
    rows.append(("n43.dt0", "DTED", 1,
                 int(round(sum(g * w for g, w in
                               zip(n43gt, [1, 3, 5, 7, 11, 13])) * 64))))
    return pd.DataFrame(rows, columns=["case", "driver",
                                       "roundtrip_ok", "gt_dot"])


@builder("q_envi_ehdr")
def _q_envi_ehdr(sf):
    import pandas as pd

    rows = []
    for i in range(12):
        il = ("bsq", "bil", "bip")[i % 3]
        rows.append((f"img{i:08d}:{il}", "ENVI", 1))
        rows.append((f"img{i:08d}:bil16", "EHdr", 1))
    for case, kind in (("aea", "ENVI"), ("rgbsmall_bil", "ENVI"),
                       ("float32", "EHDR"), ("ehdr10", "EHDR"),
                       ("ehdr11", "EHDR")):
        rows.append((case, kind, 1))
    return pd.DataFrame(rows, columns=["case", "driver",
                                       "roundtrip_ok"])


@builder("q_tile_db")
def _q_tile_db(sf):
    # world_l1/byte values are the reference's published checksums
    # (mbtiles.py:63,82,275; gpkg byte 4672/26711); the bounds rows
    # recompute analytically from the file's own bounds metadata
    # (stdlib sqlite3 + spherical-mercator forward, no pixel snap);
    # rt rows are the 6-tile roundtrip invariant
    import math
    import sqlite3

    R = 20037508.342789244
    res = 2 * R / 512.0            # z1 world in 512 px
    con = sqlite3.connect(
        "/root/reference/autotest/gdrivers/data/mbtiles/"
        "world_l1.mbtiles")
    bounds = dict(con.execute(
        "SELECT name, value FROM metadata").fetchall())["bounds"]
    con.close()
    lonmin, latmin, lonmax, latmax = (float(v)
                                      for v in bounds.split(","))

    def mx(lon):
        return R * math.radians(lon) / math.pi

    def my(lat):
        return (6378137.0
                * math.log(math.tan(math.pi / 4
                                    + math.radians(lat) / 2)))

    w = int((mx(lonmax) - mx(lonmin)) / res + 1e-9)
    h = int((my(latmax) - my(latmin)) / res + 1e-9)
    full_gt = (-R, res, 0.0, R, 0.0, -res)
    pairs = [
        ("world_l1_b1", 6324), ("world_l1_b2", 19386),
        ("world_l1_b3", 45258),
        ("world_l1_gt_dot", _gt_dot(full_gt)),
        ("world_l1_ov_b1", 16642), ("world_l1_ov_b2", 15772),
        ("world_l1_ov_b3", 10029),
        ("world_l1_bounds_w", w), ("world_l1_bounds_h", h),
        ("world_l1_bounds_ymax", round(my(latmax))),
        ("byte_mbtiles_cs", 4118),
        ("byte_gpkg_cs", 4672), ("byte_gpkg_epsg", 26711),
        ("byte_gpkg_gt_dot", _gt_dot((440720.0, 60.0, 0.0,
                                      3751320.0, 0.0, -60.0))),
        ("rt_mbtiles_tiles", 6), ("rt_mbtiles_cs_match", 6),
        ("rt_gpkg_tiles", 6), ("rt_gpkg_cs_match", 6),
    ]
    return cv(pairs)


def _lsh_pairs_indep(sf):
    """Fresh single-machine reimplementation of the MinHash-LSH
    candidate set (functions/text.py constants: 5-byte FNV-power
    rolling shingles, 64 perms a*x+b mod 2^61-1 seeded 12345, 16
    blake2b band hashes, sim >= 0.5) — no engine import; the
    distributed banding/shuffle under test must reproduce it."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    M = np.uint64((1 << 61) - 1)
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    ids = t["doc_id"].to_pylist()
    texts = t["text"].to_pylist()
    rng = np.random.default_rng(12345)
    A = rng.integers(1, (1 << 61) - 1, 64, dtype=np.uint64)
    B = rng.integers(0, (1 << 61) - 1, 64, dtype=np.uint64)
    coeff = np.power(np.uint64(1099511628211),
                     np.arange(5, dtype=np.uint64))
    sigs = {}
    for did, txt in zip(ids, texts):
        s = " ".join(txt.split()).lower()
        if len(s) < 5:
            s = s.ljust(5)
        view = np.frombuffer(s.encode("utf-8", "ignore"), np.uint8)
        if len(view) < 5:
            view = np.pad(view, (0, 5 - len(view)))
        win = np.lib.stride_tricks.sliding_window_view(view, 5) \
            .astype(np.uint64)
        sh = (win * coeff).sum(axis=1, dtype=np.uint64)
        x = (sh % M)[None, :]
        hv = (A[:, None] * x + B[:, None]) % M
        sigs[did] = hv.min(axis=1)
    buckets = {}
    for did in ids:
        sig = sigs[did]
        for b in range(16):
            blob = sig[b * 4:(b + 1) * 4].tobytes()
            h = int.from_bytes(hashlib.blake2b(
                blob, digest_size=8,
                person=b.to_bytes(8, "little")).digest(), "little",
                signed=True)
            buckets.setdefault((b, h), []).append(did)
    best = {}
    for members in buckets.values():
        members = sorted(set(members))
        if len(members) < 2:
            continue
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                a, c = members[i], members[j]
                sim = float((sigs[a] == sigs[c]).mean())
                if sim >= 0.5:
                    k = (a, c)
                    if sim > best.get(k, -1.0):
                        best[k] = sim
    return best


@builder("q_minhash_lsh")
def _q_minhash_lsh(sf):
    import pandas as pd

    best = _lsh_pairs_indep(sf)
    rows = sorted(best.items())
    return pd.DataFrame(
        {"doc_a": [k[0] for k, _ in rows],
         "doc_b": [k[1] for k, _ in rows],
         "sig_sim": [v for _, v in rows]})


@builder("q_jaccard_verify")
def _q_jaccard_verify(sf):
    # the independent LSH pair set + exact 3-gram Jaccard straight
    # from the parquet texts
    import pandas as pd
    import pyarrow.parquet as pq

    best = _lsh_pairs_indep(sf)
    t = pq.read_table(f"{sf}/documents.parquet",
                      columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))

    def grams(s):
        return {s[i:i + 3] for i in range(max(len(s) - 2, 1))}

    rows = []
    for (a, b), sim in sorted(best.items()):
        ga, gb = grams(texts[a]), grams(texts[b])
        j = len(ga & gb) / max(len(ga | gb), 1)
        rows.append((a, b, float(_round_away(j, 4)), sim))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard",
                                       "sig_sim"])


# q_contour_lines stays a determinism-pin: polyline counts at
# 4-valent saddle junctions depend on the assembler's traversal
# order, so an "independent" reimplementation would just transcribe
# the ordering rules (ground truth: the reference-analytic contour
# tests + tiled-vs-single-tile identity in pytest).


@builder("q_phash_neardup")
def _q_phash_neardup(sf):
    """Engine-free single-machine banded-hamming reimplementation
    (VERDICT r4 directive #7): phashes come from the synthesis
    manifest (sources/images.py phash64 over the raw synthesized
    pixels — source class 2), candidates from 8x8-bit band
    collisions, verification by exact popcount <= 6.  Shares no code
    with the distributed pipeline."""
    import numpy as np

    from gdal_ray.pipelines.flagship import PHASH_BANDS, PHASH_N, PHASH_T
    from gdal_ray.sources.images import image_pixels, phash64

    ph = np.array([phash64(image_pixels(i)) for i in range(PHASH_N)],
                  np.int64).view(np.uint64)
    cand = set()
    for b in range(PHASH_BANDS):
        byte = (ph >> np.uint64(8 * b)) & np.uint64(0xFF)
        order = np.argsort(byte, kind="stable")
        for v in np.unique(byte):
            members = np.nonzero(byte == v)[0]
            for i in range(len(members)):
                for j in range(i + 1, len(members)):
                    cand.add((int(members[i]), int(members[j])))
    rows = []
    for a, b in sorted(cand):
        ham = int(bin(int(ph[a] ^ ph[b])).count("1"))
        if ham <= PHASH_T:
            rows.append((f"img{a:08d}", f"img{b:08d}", ham))
    return pd.DataFrame(rows, columns=["id_a", "id_b", "hamming"])


@builder("q_simplify_coverage")
def _q_simplify_coverage(sf):
    """Independent columns: fid / pts_before come from the coverage
    synthesis arithmetic (4 jagged arcs of 24 unit steps per cell ->
    97 ring points incl. closure), topo_ok pins the coverage contract
    (any topology break in the engine flips the flag to 0 and fails
    the gate).  pts_after / area_q are engine determinism pins
    (partial-builder mixed provenance)."""
    from gdal_ray.stages.coverage import COV_G

    n = COV_G * COV_G
    pb = 4 * 24 + 1
    return pd.DataFrame({
        "fid": list(range(n)) + [-1],
        "pts_before": [pb] * n + [pb * n],
        "topo_ok": [1] * (n + 1),
    })


def check_pairs(rows, cols, check_cols, ref_files, derived=()):
    """ref_check for row-tuples: every value in `check_cols` must
    appear verbatim in one of the cited reference autotest sources,
    except cells listed in `derived` as (row_label, col) — counts the
    reference exercises without printing (cited at the query).  The
    first column is the row label."""
    import os

    blob = []
    for f in ref_files:
        p = os.path.join("/root/reference/autotest", f)
        if os.path.exists(p):
            with open(p, errors="replace") as fh:
                blob.append(fh.read())
    blob = "\n".join(blob)
    derived = set(tuple(d) for d in derived)
    missing = []
    for r in rows:
        label = r[0]
        for c in check_cols:
            if any((r[k], c) in derived
                   for k in range(min(2, len(r)))):
                continue
            v = r[cols.index(c)]
            if str(v) not in blob:
                missing.append((label, c, v))
    if missing:
        raise AssertionError(
            f"claims not found in {ref_files}: {missing}")
    return rows
# (appended by round-5 oracle-independence conversion)


@builder('q_avc_layer')
def _q_avc_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_avc.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('test.e00', 'LAB', 2),
        ('testpoly.e00', 'LAB', 2),
        ('test.e00', 'ARC', 7),
        ('testpoly.e00', 'ARC', 7),
        ('testpoint.e00', 'LAB', 80),
        ('testpoly.e00', 'CNT', 4),
        ('testpoly.e00', 'PAL', 3),
    ]
    cols = ['file', 'layer', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['ogr/ogr_avc.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_cad_layer')
def _q_cad_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_cad.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('line_r2000:0', 1),
        ('triple_circles_r2000:0', 1),
        ('triple_circles_r2000:2', 1),
        ('triple_circles_r2000:1', 1),
        ('point2d_r2000:0', 1),
        ('ellipse_r2000:0', 1),
        ('text_mtext_attdef_r2000:0', 3),
    ]
    cols = ['layer', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['ogr/ogr_cad.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_dxf_layer')
def _q_dxf_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_dxf.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('3dface', 2),
        ('LWPOLYLINE-OCS', 13),
        ('assorted', 22),
        ('circle', 2),
        ('closed_polyline_with_bulge', 1),
        ('entities_only', 2),
        ('insert_only', 1),
        ('polyline_smooth', 1),
        ('solid', 1),
    ]
    cols = ['layer', 'n_feats']
    check_pairs(rows, cols, ['n_feats'], ['ogr/ogr_dxf.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_duckdb_layer')
def _q_duckdb_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_adbc.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('spatial_index', 10),
        ('sql', 5),
        ('table', 10),
    ]
    cols = ['case', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['ogr/ogr_adbc.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_fgdb_layer')
def _q_fgdb_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_openfilegdb.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('polygon_golden.gdb', 'OGRGeoJSON', 1),
        ('testopenfilegdb.gdb', 'linestring', 5),
        ('testopenfilegdb.gdb', 'multilinestring_multipart', 5),
        ('testopenfilegdb.gdb', 'multipoint', 5),
        ('testopenfilegdb.gdb', 'multipolygon', 5),
        ('testopenfilegdb.gdb', 'point', 5),
        ('testopenfilegdb.gdb', 'point25D', 5),
        ('testopenfilegdb.gdb', 'polygon', 5),
        ('testopenfilegdb.gdb', 'polygon25D', 5),
        ('testopenfilegdb.gdb', 'linestringzm', 1),
        ('testopenfilegdb.gdb', 'multipointzm', 1),
        ('testopenfilegdb.gdb', 'pointzm', 1),
        ('testopenfilegdb.gdb', 'polygonzm', 1),
        ('testopenfilegdb.gdb', 'big_layer', 341),
        ('arcgis_pro_32_types.gdb', 'big_int', 2),
        ('testopenfilegdb.gdb', 'hole', 12),
        ('arcgis_pro_32_types.gdb', 'date_types', 3),
        ('testopenfilegdb.gdb', 'several_polygons', 9),
    ]
    cols = ['gdb', 'layer', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['ogr/ogr_openfilegdb.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_json_layer')
def _q_json_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_geojson.py', 'ogr/ogr_jsonfg.py', 'ogr/ogr_esrijson.py', 'ogr/ogr_topojson.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('crs_32631_fc_only.json', 'features', 1),
        ('topojson2.topojson', 'a_layer', 1),
        ('topojson2.topojson', 'TopoJSON', 1),
        ('topojson3.topojson', 'TopoJSON', 1),
        ('two_feature_types.json', 'type2', 1),
        ('esrizmmultipoint.json', 'layer', 1),
        ('two_feature_types.json', 'type1', 2),
        ('topojson1.topojson', 'TopoJSON', 35),
        ('esrilinestring.json', 'layer', 1),
        ('esripolygon.json', 'layer', 1),
        ('esripoint.json', 'layer', 1),
        ('topojson1.topojson', 'a_layer', 1),
        ('topojson3.topojson', 'a_layer', 1),
    ]
    cols = ['file', 'layer', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['ogr/ogr_geojson.py', 'ogr/ogr_jsonfg.py', 'ogr/ogr_esrijson.py', 'ogr/ogr_topojson.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_mif_layer')
def _q_mif_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_mitab.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('all_geoms', 1, 16),
        ('all_possible_fields', 11, 2),
        ('empty_first_field_with_tab_delimiter', 3, 1),
        ('multilinemid', 4, 2),
        ('nomid', 1, 2),
        ('single_field', 2, 3),
        ('small', 8, 2),
    ]
    cols = ['layer', 'n_cols', 'n_rows']
    check_pairs(rows, cols, ['n_cols', 'n_rows'], ['ogr/ogr_mitab.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_mitab_tab')
def _q_mitab_tab_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_mitab.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('poly_indexed', 4, 10),
        ('aspatial', 2, 3),
        ('all_geoms', 2, 16),
        ('polygon_without_index', 17, 4),
        ('all_possible_fields', 10, 2),
        ('aspatial-table', 4, 2),
        ('first_table', 3, 1),
    ]
    cols = ['layer', 'n_cols', 'n_rows']
    check_pairs(rows, cols, ['n_cols', 'n_rows'], ['ogr/ogr_mitab.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_mvt_layer')
def _q_mvt_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_mvt.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('datatypes/0/0/0.pbf', 'datatypes', 1),
        ('mixed/0/0/0.pbf', 'mixed', 2),
        ('point_polygon/0', 'polygon2', 1),
        ('linestring/0/0/0.pbf', 'linestring', 1),
        ('multilinestring/0/0/0.pbf', 'multilinestring', 1),
        ('point_polygon/0', 'point', 1),
        ('polygon/0/0/0.pbf', 'polygon', 1),
    ]
    cols = ['file', 'layer', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['ogr/ogr_mvt.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_osm_layer')
def _q_osm_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_osm.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('base-64.osm.pbf', 'lines', 166),
        ('base-64.osm.pbf', 'multilinestrings', 0),
        ('base-64.osm.pbf', 'multipolygons', 60),
        ('base-64.osm.pbf', 'other_relations', 0),
        ('base-64.osm.pbf', 'points', 14),
        ('test.osm', 'lines', 2),
        ('test.osm', 'multilinestrings', 1),
        ('test.osm', 'multipolygons', 3),
        ('test.osm', 'other_relations', 1),
        ('test.osm', 'points', 1),
        ('test.pbf', 'lines', 2),
        ('test.pbf', 'multilinestrings', 1),
        ('test.pbf', 'multipolygons', 3),
        ('test.pbf', 'other_relations', 1),
        ('test.pbf', 'points', 1),
        ('test_uncompressed_dense_false.pbf', 'lines', 2),
        ('test_uncompressed_dense_false.pbf', 'multilinestrings', 1),
        ('test_uncompressed_dense_false.pbf', 'multipolygons', 3),
        ('test_uncompressed_dense_false.pbf', 'other_relations', 1),
        ('test_uncompressed_dense_false.pbf', 'points', 1),
    ]
    cols = ['file', 'layer', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['ogr/ogr_osm.py'],
                derived=[('lines', 'n_rows')])
    return pd.DataFrame(rows, columns=cols)


@builder('q_s57_layer')
def _q_s57_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_s57.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('1B5X02NE.000', 'COALNE', 1),
        ('1B5X02NE.000', 'DEPARE', 4),
        ('1B5X02NE.000', 'DEPCNT', 4),
        ('1B5X02NE.000', 'DSID', 1),
        ('1B5X02NE.000', 'LNDARE', 1),
        ('1B5X02NE.000', 'LNDELV', 2),
        ('1B5X02NE.000', 'M_COVR', 1),
        ('1B5X02NE.000', 'M_NSYS', 1),
        ('1B5X02NE.000', 'M_QUAL', 1),
        ('1B5X02NE.000', 'SBDARE', 2),
        ('1B5X02NE.000', 'SLCONS', 1),
        ('1B5X02NE.000', 'SLOTOP', 1),
        ('1B5X02NE.000', 'SOUNDG', 2),
        ('bug1526.000', 'BOYCAR', 5),
        ('bug1526.000', 'DRGARE', 7),
        ('bug1526.000', 'DSID', 1),
        ('bug1526.000', 'FAIRWY', 2),
        ('bug1526.000', 'FOGSIG', 1),
        ('bug1526.000', 'LIGHTS', 7),
        ('bug1526.000', 'RIVERS', 1),
        ('bug1526.000', 'SOUNDG', 4),
        ('bug1526.000', 'TOPMAR', 5),
        ('bug1526.000', 'UWTROC', 35),
        ('bug2147_3R7D0889.000', 'BUAARE', 5),
        ('bug2147_3R7D0889.000', 'DEPARE', 3),
        ('bug2147_3R7D0889.000', 'DSID', 1),
        ('bug2147_3R7D0889.000', 'FAIRWY', 1),
        ('bug2147_3R7D0889.000', 'LAKARE', 1),
        ('bug2147_3R7D0889.000', 'LIGHTS', 6),
        ('bug2147_3R7D0889.000', 'LNDARE', 12),
        ('bug2147_3R7D0889.000', 'M_COVR', 1),
        ('bug2147_3R7D0889.000', 'ROADWY', 1),
        ('bug2147_3R7D0889.000', 'SEAARE', 1),
        ('bug2147_3R7D0889.000', 'bcnwtw', 3),
        ('bug2147_3R7D0889.000', 'boywtw', 4),
        ('bug2147_3R7D0889.000', 'dismar', 22),
        ('bug2147_3R7D0889.000', 'notmrk', 2),
        ('bug2147_3R7D0889.000', 'rivbnk', 14),
        ('bug2147_3R7D0889.000', 'topmar', 3),
        ('bug2147_3R7D0889.000', 'wtwaxs', 1),
    ]
    cols = ['file', 'layer', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['ogr/ogr_s57.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_sg_vct_layers')
def _q_sg_vct_layers_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['gdrivers/netcdf_cf.py', 'gdrivers/netcdf.py', 'ogr/ogr_idrisi.py', 'gdrivers/idrisi.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('points.vct', 'points', 2),
        ('lines.vct', 'lines', 2),
        ('multipolygon3D_test.nc', 'names_geometry', 2),
        ('cf1.8_states.nc', 'geometry_container', 49),
        ('multiple_containers.nc', 'serpenski_outline', 1),
        ('Yahara_alb.nc', 'geometry_container', 71),
        ('polygons.vct', 'polygons', 2),
        ('multiple_containers.nc', 'serpenski', 1),
    ]
    cols = ['file', 'layer', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['gdrivers/netcdf_cf.py', 'gdrivers/netcdf.py', 'ogr/ogr_idrisi.py', 'gdrivers/idrisi.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_spreadsheet')
def _q_spreadsheet_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_xlsx.py', 'ogr/ogr_ods.py', 'ogr/ogr_csv.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('ods', 'Feuille1', 6, 26),
        ('ods', 'Feuille7', 12, 2),
        ('ods_roundtrip', 'rt', 12, 2),
        ('xls', 'Feuille1', 5, 3),
        ('xlsx', 'Feuille1', 6, 26),
        ('xlsx', 'Feuille7', 12, 2),
        ('xlsx_roundtrip', 'rt', 12, 2),
    ]
    cols = ['fmt', 'layer', 'n_cols', 'n_rows']
    check_pairs(rows, cols, ['n_cols', 'n_rows'], ['ogr/ogr_xlsx.py', 'ogr/ogr_ods.py', 'ogr/ogr_csv.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_sxf_layer')
def _q_sxf_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_sxf.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('full:ЗЕМЛЕПОЛЬЗОВАНИЕ', 1),
        ('short:landuses', 1),
        ('norsc:SYSTEM', 1),
        ('full:Not_Classified', 28),
        ('short:Not_Classified', 28),
        ('full:НАСЕЛЕННЫЕ ПУНКТЫ', 1),
        ('short:city', 1),
        ('full:ВОДНЫЕ ОБЪЕКТЫ', 6),
        ('short:water', 6),
        ('full:РЕЛЬЕФ СУШИ', 6),
        ('short:Relief', 6),
        ('full:ИНФРАСТРУКТУРА', 15),
        ('short:poi', 15),
        ('norsc:Not_Classified', 77),
        ('full:ГИДРОГРАФИЯ (РЕЛЬЕФ)', 1),
        ('short:LAYER16', 1),
        ('full:СИСТЕМНЫЙ', 1),
        ('short:SYSTEM', 1),
        ('full:МАТЕМАТИЧЕСКАЯ ОСНОВА', 19),
        ('short:LAYER17', 19),
    ]
    cols = ['layer', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['ogr/ogr_sxf.py'],
                derived=[('full:Not_Classified', 'n_rows'), ('full:ИНФРАСТРУКТУРА', 'n_rows'), ('full:МАТЕМАТИЧЕСКАЯ ОСНОВА', 'n_rows'), ('norsc:Not_Classified', 'n_rows'), ('short:LAYER17', 'n_rows'), ('short:Not_Classified', 'n_rows'), ('short:poi', 'n_rows')])
    return pd.DataFrame(rows, columns=cols)


@builder('q_xodr_layers')
def _q_xodr_layers_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_xodr.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('LaneBorder', 230),
        ('ReferenceLine', 41),
        ('Lane', 174),
        ('RoadMark', 424),
        ('RoadSignal', 50),
        ('RoadObject', 273),
    ]
    cols = ['layer', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['ogr/ogr_xodr.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_sar_ceos')
def _q_sar_ceos_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['gdrivers/ehdr.py', 'gdrivers/sar_ceos.py', 'gdrivers/esric.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('ottawa_patch.img', 1827, 1790, 4, 3),
        ('R1_26161_FN1_F164.D', 8192, 8192, 3, 0),
    ]
    cols = ['file', 'h', 'w', 'lines_avail', 'n_gcps']
    check_pairs(rows, cols, ['h', 'w', 'lines_avail', 'n_gcps'], ['gdrivers/ehdr.py', 'gdrivers/sar_ceos.py', 'gdrivers/esric.py'],
                derived=[('ottawa_patch.img', 'h'), ('ottawa_patch.img', 'w')])
    return pd.DataFrame(rows, columns=cols)


@builder('q_sosi_layer')
def _q_sosi_layer_partial(sf):
    """Partial builder (round-5 independence conversion): the layer
    identity and feature/field COUNTS below are the reference's own
    autotest assertions (ref_check against ['ogr/ogr_sosi.py']); the crc/render
    columns stay engine determinism pins via the mixed-provenance
    mechanism."""
    rows = [
        ('comma', 'lines', 17),
        ('default', 'lines', 17),
        ('semicolon', 'lines', 17),
        ('default', 'polygons', 1),
        ('comma', 'polygons', 1),
        ('semicolon', 'polygons', 1),
    ]
    cols = ['variant', 'layer', 'n_rows']
    check_pairs(rows, cols, ['n_rows'], ['ogr/ogr_sosi.py'],
                derived=[])
    return pd.DataFrame(rows, columns=cols)


@builder('q_vfk_layer')
def _q_vfk_layer_rows(sf):
    """Row-subset builder (round-5 independence conversion,
    3/6 rows): every value below appears verbatim in
    ['ogr/ogr_vfk.py'] — the remaining rows of the query (engine-rendered
    crcs) ride along as determinism pins via the row-subset
    mixed-provenance mechanism."""
    rows = [
        ('n_layers', 61),
        ('par_fields', 28),
        ('par_rows', 1),
    ]
    cols = ['case', 'value']
    check_pairs(rows, cols, ['value'], ['ogr/ogr_vfk.py'])
    return pd.DataFrame(rows, columns=cols)


@builder('q_pds_table')
def _q_pds_table_rows(sf):
    """Row-subset builder (round-5 independence conversion,
    3/8 rows): every value below appears verbatim in
    ['ogr/ogr_pds.py', 'gdrivers/pds.py', 'gdrivers/pds4.py'] — the remaining rows of the query (engine-rendered
    crcs) ride along as determinism pins via the row-subset
    mixed-provenance mechanism."""
    rows = [
        ('ascii_cols', 26),
        ('ascii_rows', 74786),
        ('noise_counts_1', 96),
    ]
    cols = ['case', 'value']
    check_pairs(rows, cols, ['value'], ['ogr/ogr_pds.py', 'gdrivers/pds.py', 'gdrivers/pds4.py'])
    return pd.DataFrame(rows, columns=cols)


@builder('q_pmtiles_layer')
def _q_pmtiles_layer_rows(sf):
    """Row-subset builder (round-5 independence conversion,
    10/12 rows): every value below appears verbatim in
    ['ogr/ogr_pmtiles.py', 'alg/los.py'] — the remaining rows of the query (engine-rendered
    crcs) ride along as determinism pins via the row-subset
    mixed-provenance mechanism."""
    rows = [
        ('los_below_a', 0),
        ('los_block_x', 1),
        ('los_blocked', 0),
        ('los_diag_x', 4),
        ('los_diag_y', 4),
        ('los_flat', 1),
        ('pm_france_rows', 19),
        ('pm_leaf_rows', 8),
        ('pm_maxzoom', 5),
        ('pm_rows', 8),
    ]
    cols = ['case', 'value']
    check_pairs(rows, cols, ['value'], ['ogr/ogr_pmtiles.py', 'alg/los.py'])
    return pd.DataFrame(rows, columns=cols)


@builder('q_slf_wasp_kmz')
def _q_slf_wasp_kmz_rows(sf):
    """Row-subset builder (round-5 independence conversion,
    7/8 rows): every value below appears verbatim in
    ['ogr/ogr_selafin.py', 'ogr/ogr_wasp.py', 'gdrivers/kmlsuperoverlay.py'] — the remaining rows of the query (engine-rendered
    crcs) ride along as determinism pins via the row-subset
    mixed-provenance mechanism."""
    rows = [
        ('kmz_cs_band1', 30111),
        ('kmz_h', 200),
        ('kmz_w', 400),
        ('slf_elem5_mean_x100', 900),
        ('slf_elements', 16),
        ('slf_points', 25),
        ('wasp_boundaries', 6),
    ]
    cols = ['case', 'value']
    check_pairs(rows, cols, ['value'], ['ogr/ogr_selafin.py', 'ogr/ogr_wasp.py', 'gdrivers/kmlsuperoverlay.py'])
    return pd.DataFrame(rows, columns=cols)


@builder('q_lvbag_layer')
def _q_lvbag_layer_rows(sf):
    """Row-subset builder (round-5 independence conversion,
    16/24 rows): every value below appears verbatim in
    ['ogr/ogr_lvbag.py'] — the remaining rows of the query (engine-rendered
    crcs) ride along as determinism pins via the row-subset
    mixed-provenance mechanism."""
    rows = [
        ('lig.xml_cols', 18),
        ('lig.xml_rows', 3),
        ('num.xml_cols', 22),
        ('num.xml_rows', 3),
        ('opr.xml_cols', 19),
        ('opr.xml_rows', 4),
        ('pnd.xml_cols', 17),
        ('pnd.xml_rows', 6),
        ('sta.xml_cols', 18),
        ('sta.xml_rows', 2),
        ('vbo.xml_cols', 21),
        ('vbo.xml_rows', 3),
        ('wpl.xml_cols', 17),
        ('wpl.xml_rows', 2),
        ('zip_mixed_layers', 2),
        ('zip_pnd_rows', 4),
    ]
    cols = ['case', 'value']
    check_pairs(rows, cols, ['value'], ['ogr/ogr_lvbag.py'])
    return pd.DataFrame(rows, columns=cols)


@builder('q_feed_vector')
def _q_feed_vector_rows(sf):
    """Row-subset builder (round-5 independence conversion,
    9/18 rows): every value below appears verbatim in
    ['ogr/ogr_gml_fgd_read.py', 'ogr/ogr_gmt.py', 'ogr/ogr_vdv.py', 'ogr/ogr_georss.py', 'ogr/ogr_jml.py'] — the remaining rows of the query (engine-rendered
    crcs) ride along as determinism pins via the row-subset
    mixed-provenance mechanism."""
    rows = [
        ('fgd_BldA_rows', 1),
        ('fgd_ElevPt_rows', 1),
        ('gmt_rows', 2),
        ('idf_LinkCoordinate_rows', 3),
        ('idf_Link_rows', 4),
        ('idf_Node_rows', 2),
        ('idf_Other_rows', 1),
        ('test_georss_gml.xml_rows', 4),
        ('test_georss_simple.xml_rows', 4),
    ]
    cols = ['case', 'value']
    check_pairs(rows, cols, ['value'], ['ogr/ogr_gml_fgd_read.py', 'ogr/ogr_gmt.py', 'ogr/ogr_vdv.py', 'ogr/ogr_georss.py', 'ogr/ogr_jml.py'])
    return pd.DataFrame(rows, columns=cols)


@builder('q_feed_formats')
def _q_feed_formats_rows(sf):
    """Row-subset builder (round-5 independence conversion,
    17/24 rows): every value below appears verbatim in
    ['gdrivers/pds4.py', 'gdrivers/dimap.py', 'ogr/ogr_gtfs.py', 'ogr/ogr_jml.py'] — the remaining rows of the query (engine-rendered
    crcs) ride along as determinism pins via the row-subset
    mixed-provenance mechanism."""
    rows = [
        ('byte_pds4_cart_1700_cs', 4672),
        ('byte_pds4_cart_1700_gt0', -59280),
        ('byte_pds4_cart_1b00_cs', 4672),
        ('byte_pds4_cart_1b00_gt0', -59280),
        ('byte_pds4_cart_1d00_1933_cs', 4672),
        ('byte_pds4_cart_1d00_1933_gt0', -59280),
        ('byte_pds4_cart_1g00_1950_cs', 4672),
        ('byte_pds4_cart_1g00_1950_gt0', -59280),
        ('dimap2_b1_cs', 7024),
        ('dimap2_nbands', 4),
        ('dimap_cs100', 21586),
        ('dimap_ngcps', 4),
        ('gtfs_layers', 9),
        ('gtfs_routes', 34),
        ('gtfs_stops', 35),
        ('jml_cols', 13),
        ('jml_rows', 3),
    ]
    cols = ['case', 'value']
    check_pairs(rows, cols, ['value'], ['gdrivers/pds4.py', 'gdrivers/dimap.py', 'ogr/ogr_gtfs.py', 'ogr/ogr_jml.py'])
    return pd.DataFrame(rows, columns=cols)


@builder('q_mapml_pgdump')
def _q_mapml_pgdump_rows(sf):
    """Row-subset builder (round-5 independence conversion,
    2/8 rows): every value below appears verbatim in
    ['ogr/ogr_mapml.py', 'ogr/ogr_pgdump.py'] — the remaining rows of the query (engine-rendered
    crcs) ride along as determinism pins via the row-subset
    mixed-provenance mechanism."""
    rows = [
        ('mapml:poly_rows', 10),
        ('mapml:roundtrip_wkt_same', 1),
    ]
    cols = ['case', 'value']
    check_pairs(rows, cols, ['value'], ['ogr/ogr_mapml.py', 'ogr/ogr_pgdump.py'])
    return pd.DataFrame(rows, columns=cols)


@builder("q_gcp_warp")
def _q_gcp_warp(sf):
    """Independent columns: case labels, the exactness claim
    (polynomial/TPS warps of GCPs sampled from an affine reproduce
    the affine render exactly -> maxdiff 0; the *_dist cases have no
    affine ground truth -> sentinel -1 by query contract,
    alg/gdal_crs.c semantics), and the fragment count (query
    partitioning config).  n_valid pixel counts are engine
    determinism pins."""
    return pd.DataFrame({
        "case": ["order1", "order2", "order2_dist", "order3", "tps",
                 "tps_dist"],
        "maxdiff": [0, 0, -1, 0, 0, -1],
        "n_frags": [4] * 6,
    })


@builder("q_geoloc_warp")
def _q_geoloc_warp(sf):
    """Same contract as q_gcp_warp for the geolocation-array warp
    (alg/gdalgeoloc.cpp): affine geoloc arrays reproduce the affine
    render exactly; distorted arrays have no closed-form ground
    truth (sentinel -1)."""
    return pd.DataFrame({
        "case": ["affine", "affine_coarse", "distorted",
                 "distorted_coarse"],
        "maxdiff": [0, 0, -1, -1],
        "n_frags": [4] * 4,
    })


@builder("q_color_merge")
def _q_color_merge(sf):
    """Independent columns: the corpus slice identity (img0..img23,
    synthesis manifest) and the HSV merge round-trip invariant
    (merging a grayscale of V back into HSV must reproduce V exactly
    -> flag 1, apps/gdal_color_merge semantics).  Band checksums are
    engine determinism pins."""
    return pd.DataFrame({
        "image_id": [f"img{i:08d}" for i in range(24)],
        "round_trip": [1] * 24,
    })


@builder("q_viewshed")
def _q_viewshed(sf):
    """Independent columns: the observer grid (every 24 cells of the
    VS_N=96 synthetic DEM — query config arithmetic).  Visibility
    counts and checksums are engine determinism pins (the per-kernel
    ground truth is the transcribed reference fixtures in
    tests/test_viewshed.py)."""
    obs = [(x, y) for x in (0, 24, 48, 72) for y in (0, 24, 48, 72)]
    return pd.DataFrame({"obs_x": [o[0] for o in obs],
                         "obs_y": [o[1] for o in obs]})


@builder("q_grib")
def _q_grib(sf):
    """Independent columns: case identity + the nodata declarations
    published in autotest/gdrivers/grib.py ('none' = the band
    declares no nodata — an absence claim the file does not print).
    Band checksums are engine determinism pins."""
    rows = [("Sample_QuikSCAT.grb:1", "9999"),
            ("Sample_QuikSCAT.grb:2", "9999"),
            ("Sample_QuikSCAT.grb:3", "9999"),
            ("Sample_QuikSCAT.grb:4", "undef"),
            ("bug3246.grb:1", "9999"), ("bug3246.grb:2", "9999"),
            ("bug3246.grb:3", "none"), ("bug3246.grb:4", "none"),
            ("bug3246.grb:5", "none"), ("bug3246.grb:6", "9999"),
            ("bug3246.grb:7", "9999"), ("bug3246.grb:8", "9999"),
            ("bug3246.grb:9", "9999"), ("bug3246.grb:10", "9999"),
            ("bug3246.grb:11", "9999"), ("bug3246.grb:12", "9999")]
    check_pairs(rows, ["case", "nodata"], ["nodata"],
                ["gdrivers/grib.py"],
                derived=[("bug3246.grb:3", "nodata"),
                         ("bug3246.grb:4", "nodata"),
                         ("bug3246.grb:5", "nodata")])
    return pd.DataFrame(rows, columns=["case", "nodata"])


@builder("q_ogrvrt_layer")
def _q_ogrvrt_layer(sf):
    """Independent columns: case identity + expected values from
    autotest/ogr/ogr_vrt.py (poly_eas / warped_x / warped_y are sums
    and reprojected coordinates derived from poly.shp constants the
    file asserts piecewise — cited at the query).  The engine value
    column rides along as the determinism pin."""
    rows = [("vrt:clip_wkt", 1), ("vrt:poly_eas", 1686),
            ("vrt:poly_rows", 10), ("vrt:test2_fids", 1),
            ("vrt:test2_wkt", 1), ("vrt:test3_fids", 3),
            ("vrt:test4_rows", 2), ("vrt:test6_cols", 2),
            ("vrt:union_id2_nulls", 25), ("vrt:union_rows", 50),
            ("vrt:union_xmax_x10", 48), ("vrt:warped_x", 426858),
            ("vrt:warped_y", 5427938)]
    check_pairs(rows, ["case", "expected"], ["expected"],
                ["ogr/ogr_vrt.py"],
                derived=[("vrt:poly_eas", "expected"),
                         ("vrt:warped_x", "expected"),
                         ("vrt:warped_y", "expected")])
    return pd.DataFrame(rows, columns=["case", "expected"])


@builder("q_sar_product_formats")
def _q_sar_product_formats(sf):
    """Independent columns: driver identity + item counts published
    in the driver autotests (gff.py / ers.py / rik.py /
    ogr_edigeo.py; COASP/RIK counts are fixture-derived — cited at
    the query).  Checksums are engine determinism pins."""
    rows = [("AIRSAR", 432), ("COASP", 408), ("COSAR", 204),
            ("EDIGEO", 3), ("ESAT", 143), ("GFF", 204),
            ("PALSAR", 204), ("RIK", 1024), ("TSX", 108)]
    check_pairs(rows, ["driver", "n_items"], ["n_items"],
                ["gdrivers/gff.py", "gdrivers/ers.py",
                 "gdrivers/rik.py", "ogr/ogr_edigeo.py"],
                derived=[("COASP", "n_items"), ("RIK", "n_items")])
    return pd.DataFrame(rows, columns=["driver", "n_items"])


@builder("q_dgn_layer")
def _q_dgn_layer(sf):
    """Row-subset builder: the feature count is the ogr_dgn.py
    assertion; the style/type/wkt crcs ride along as engine
    determinism pins."""
    rows = [("n_rows", 4)]
    check_pairs(rows, ["case", "value"], ["value"], ["ogr/ogr_dgn.py"])
    return pd.DataFrame(rows, columns=["case", "value"])


@builder("q_gmlas_layer")
def _q_gmlas_layer(sf):
    """Fully independent: the choice_* list values and field
    expectations are ogr_gmlas.py assertions (ref_check); the
    composition ids/values are the fixture file's own content
    (gmlas_composition_compositionPart.xml), junction row count = the
    two <composition> property instances."""
    rows = [
        ("choice_str", "val1|val2"),
        ("choice_int", "1|2"),
        ("choice_int64", "123456789123|2"),
        ("choice_double", "1.5|2.5"),
        ("no_namespace_foo", "bar"),
        ("link_second_my_id", "second_id"),
        ("comp_junction_rows", "2"),
        ("comp_part_rows", "2"),
        ("comp_part_ids", "id1|id2"),
        ("comp_part_a", "a1|a2"),
        ("comp_links_set", "1"),
    ]
    blob_vals = {"val1", "val2", "1", "2", "123456789123", "1.5",
                 "2.5", "bar", "second_id", "id1", "id2", "a1", "a2"}
    import os
    ref = "/root/reference/autotest/ogr"
    blob = open(f"{ref}/ogr_gmlas.py", errors="replace").read()
    for f in ("gmlas_composition_compositionPart.xml",
              "gmlas_no_namespace.xml",
              "gmlas_link_nested_independant_child.xml"):
        blob += open(f"{ref}/data/gmlas/{f}", errors="replace").read()
    missing = [v for v in blob_vals if v not in blob]
    assert not missing, missing
    return pd.DataFrame(rows, columns=["case", "value"])


@builder("q_cog")
def _q_cog(sf):
    """Row-subset builder: level-0 COG reads of the PNG-coded
    (lossless) corpus images equal the raw synthesized pixels, so
    their band-0 checksums recompute engine-free from the synthesis
    manifest via the independent checksum transcription.  JPEG rows
    (codec-dependent) and the overview levels (engine 2x2 average
    renders) stay determinism pins."""
    from gdal_ray.sources.images import image_fmt, image_pixels

    rows = []
    for i in range(24):
        if image_fmt(i) != "png":
            continue
        rows.append((ref_checksum(image_pixels(i)[:, :, 0]),
                     f"img{i:08d}", 0))
    return pd.DataFrame(rows, columns=["checksum", "image_id", "level"])


def _stats_rows(n, step):
    """Engine-free band-0 statistics of the PNG-coded (lossless)
    corpus rows: plain numpy over the synthesis manifest pixels with
    the documented round-half-away-from-zero at 4 decimals.  JPEG
    rows are codec-dependent and stay determinism pins."""
    import numpy as np

    from gdal_ray.sources.images import image_fmt, image_pixels

    def round_away(x):
        s = 10.0 ** 4
        return float(np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s)

    rows = []
    for i in range(n):
        if image_fmt(i) != "png":
            continue
        px = image_pixels(i)[::step, ::step, 0].astype(np.float64)
        rows.append((f"img{i:08d}", round_away(px.mean()),
                     float(px.max()), float(px.min()),
                     round_away(px.std())))
    return pd.DataFrame(rows, columns=["image_id", "mean", "px_max",
                                       "px_min", "std"])


@builder("q_raster_stats")
def _q_raster_stats(sf):
    return _stats_rows(96, 1)


@builder("q_raster_stats_approx")
def _q_raster_stats_approx(sf):
    return _stats_rows(96, 4)


@builder("q_pixel_functions")
def _q_pixel_functions(sf):
    """Row-subset builder: the three VRT pixel-function chains are
    one-line documented formulas (frmts/vrt/pixelfunctions.cpp:
    norm_diff=(a-b)/(a+b) zero-safe, intensity=mean, dB=20*log10,
    sqrt, mul) — recomputed here with plain numpy over the PNG rows'
    manifest pixels and the independent checksum transcription.
    JPEG rows stay determinism pins."""
    import numpy as np

    from gdal_ray.sources.images import image_fmt, image_pixels

    rows = []
    for i in range(64):
        if image_fmt(i) != "png":
            continue
        px = image_pixels(i).astype(np.float64)
        b0, b1, b2 = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        den = b0 + b1
        with np.errstate(divide="ignore", invalid="ignore"):
            ndv = np.where(den == 0, 0.0, (b0 - b1) / den)
        intensity = (b0 + b1 + b2) / 3.0
        with np.errstate(divide="ignore", invalid="ignore"):
            db = 20.0 * np.log10(intensity + 1.0)
        rows.append((ref_checksum(np.round(db)),
                     ref_checksum(np.round(ndv * 1000)),
                     ref_checksum(np.round(np.sqrt(b0 * b1))),
                     f"img{i:08d}"))
    return pd.DataFrame(rows, columns=["cksum_db", "cksum_norm_diff",
                                       "cksum_sqrt_mul", "image_id"])


def _bilinear_resize_u8(src, out_h, out_w):
    """gdal_translate -outsize bilinear semantics, re-derived for the
    builders: destination pixel centers through the scale transform,
    center-offset bilinear with edge clamp, round-half-up cast
    (apps/gdal_translate_lib.cpp + alg/gdalwarpkernel.cpp
    GWKBilinear documented behavior; shares no code with
    functions/resample.py)."""
    import numpy as np

    h, w = src.shape[:2]
    px = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    py = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    x0 = np.clip(np.floor(px), 0, w - 1).astype(np.int64)
    y0 = np.clip(np.floor(py), 0, h - 1).astype(np.int64)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = np.clip(px - x0, 0.0, 1.0)[None, :, None]
    wy = np.clip(py - y0, 0.0, 1.0)[:, None, None]
    s = src.astype(np.float64)
    v = (s[y0][:, x0] * (1 - wx) * (1 - wy)
         + s[y0][:, x1] * wx * (1 - wy)
         + s[y1][:, x0] * (1 - wx) * wy
         + s[y1][:, x1] * wx * wy)
    return np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)


@builder("q_translate")
def _q_translate_rows(sf):
    """Row-subset builder (supersedes the dims-only partial): the
    PNG rows' full translate chain recomputed engine-free from the
    manifest — BGR reorder, min/max linear scale with round-half-up,
    50%% bilinear downsample (destination centers land mid-2x2 at
    even sizes -> exact quad mean), independent per-band checksums.
    JPEG rows stay determinism pins."""
    import numpy as np

    from gdal_ray.sources.images import image_fmt, image_pixels

    rows = []
    for i in range(96):
        if image_fmt(i) != "png":
            continue
        px = image_pixels(i)[:, :, ::-1]
        h, w = px.shape[:2]
        lo, hi = float(px.min()), float(px.max())
        scaled = (px.astype(np.float64) - lo) * (255.0 / max(hi - lo,
                                                             1e-9))
        u8 = np.clip(np.floor(scaled + 0.5), 0, 255).astype(np.uint8)
        m = u8.reshape(h // 2, 2, w // 2, 2, 3).astype(np.float64) \
            .mean(axis=(1, 3))
        out = np.clip(np.floor(m + 0.5), 0, 255).astype(np.uint8)
        rows.append((ref_checksum(out[:, :, 0]),
                     ref_checksum(out[:, :, 1]),
                     ref_checksum(out[:, :, 2]),
                     h // 2, f"img{i:08d}", w // 2))
    return pd.DataFrame(rows, columns=["b0", "b1", "b2", "h",
                                       "image_id", "w"])


@builder("q_pansharpen")
def _q_pansharpen(sf):
    """Row-subset builder: the weighted-Brovey chain
    (alg/gdalpansharpen.cpp:90-100 published formula: pseudo_pan =
    sum(w_i ms_i), out_i = ms_i * pan / pseudo_pan) recomputed
    engine-free over the PNG rows — pan from the manifest pixels,
    MS 2x down (quad mean) and back up through the re-derived
    bilinear, round-half-up byte cast."""
    import numpy as np

    from gdal_ray.sources.images import image_fmt, image_pixels

    w3 = np.array([0.25, 0.5, 0.25])
    rows = []
    for i in range(32):
        if image_fmt(i) != "png":
            continue
        px = image_pixels(i).astype(np.float64)
        h, w = px.shape[:2]
        pan = (px * w3[None, None, :]).sum(axis=2)
        lo = px.astype(np.uint8)
        ms_lo = np.clip(np.floor(
            lo.reshape(h // 2, 2, w // 2, 2, 3).astype(np.float64)
            .mean(axis=(1, 3)) + 0.5), 0, 255).astype(np.uint8)
        ms_up = _bilinear_resize_u8(ms_lo, h, w).astype(np.float64)
        pseudo = (ms_up * w3[None, None, :]).sum(axis=2)
        with np.errstate(divide="ignore", invalid="ignore"):
            ratio = pan / pseudo
        ratio = np.where(pseudo == 0, 0.0, ratio)
        sharp = ms_up * ratio[:, :, None]
        out = np.clip(np.floor(sharp + 0.5), 0, 255).astype(np.uint8)
        rows.append((ref_checksum(out[:, :, 0]),
                     ref_checksum(out[:, :, 1]),
                     ref_checksum(out[:, :, 2]), f"img{i:08d}"))
    return pd.DataFrame(rows, columns=["b0", "b1", "b2", "image_id"])


@builder("q_hillshade")
def _q_hillshade(sf):
    """Row-subset builder: Horn hillshade re-derived from the
    reference's published formula (apps/gdaldem_lib.cpp
    GDALHillshadeAlg, the sin_altRadians_mul_254 optimized form with
    afWin[0]+afWin[3]+afWin[3]+afWin[6] gradient sums) with plain
    numpy over the PNG rows' manifest pixels; border (no
    compute_edges) is nodata 0.  JPEG rows stay determinism pins."""
    import numpy as np

    from gdal_ray.sources.images import image_fmt, image_pixels

    ewres, nsres, zfactor, az_deg, alt_deg = 5.0, -5.0, 2.0, 315.0, 45.0
    zf = zfactor / 8.0
    alt = np.radians(alt_deg)
    az = np.radians(az_deg)
    sin_alt_254 = 254.0 * np.sin(alt)
    cos_az_cos_alt_z_254 = 254.0 * np.cos(az) * np.cos(alt) * zf
    sin_az_cos_alt_z_254 = 254.0 * np.sin(az) * np.cos(alt) * zf
    rows = []
    for i in range(96):
        if image_fmt(i) != "png":
            continue
        z = image_pixels(i)[:, :, 0].astype(np.float64)
        w = [z[:-2, :-2], z[:-2, 1:-1], z[:-2, 2:],
             z[1:-1, :-2], z[1:-1, 1:-1], z[1:-1, 2:],
             z[2:, :-2], z[2:, 1:-1], z[2:, 2:]]
        x = ((w[0] + w[3] + w[3] + w[6])
             - (w[2] + w[5] + w[5] + w[8])) * (1.0 / ewres)
        y = ((w[6] + w[7] + w[7] + w[8])
             - (w[0] + w[1] + w[1] + w[2])) * (1.0 / nsres)
        cang_254 = (sin_alt_254
                    - (y * cos_az_cos_alt_z_254
                       - x * sin_az_cos_alt_z_254)) \
            / np.sqrt(1.0 + zf * zf * (x * x + y * y))
        cang = np.where(cang_254 <= 0.0, 1.0, 1.0 + cang_254)
        hs = np.full(z.shape, 0.0)
        hs[1:-1, 1:-1] = np.clip(np.floor(cang + 0.5), 1, 255)
        rows.append((f"img{i:08d}",
                     ref_checksum(hs.astype(np.uint8))))
    return pd.DataFrame(rows, columns=["image_id", "shade_checksum"])


@builder("q_reclassify_lut")
def _q_reclassify_lut(sf):
    """Row-subset builder: interval reclassify (value in
    [bounds[i], bounds[i+1]) -> class, vrtreclassifier.h), VRT LUT
    piecewise-linear interpolation, and the center sample through
    the published GDALInvGeoTransform + bilinear pixel-center
    conventions — all recomputed with plain numpy over the PNG
    rows' manifest pixels.  JPEG rows stay determinism pins."""
    import numpy as np

    from gdal_ray.sources.images import georef, image_fmt, image_pixels

    bounds = np.array([0.0, 64.0, 128.0, 192.0, 256.0])
    classes = np.array([0.0, 1.0, 2.0, 3.0])
    lut_src = np.array([0.0, 128.0, 255.0])
    lut_dst = np.array([0.0, 200.0, 255.0])
    rows = []
    for i in range(48):
        if image_fmt(i) != "png":
            continue
        px = image_pixels(i)[:, :, 0]
        h, w = px.shape
        idx = np.searchsorted(bounds, px.astype(np.float64),
                              side="right") - 1
        rc = classes[np.clip(idx, 0, 3)].astype(np.int32)
        lu = np.floor(np.interp(px.astype(np.float64), lut_src,
                                lut_dst) + 0.5).astype(np.int32)
        gt, _ = georef(i)
        cx = gt[0] + (w / 2.0) * gt[1] + (h / 2.0) * gt[2]
        cy = gt[3] + (w / 2.0) * gt[4] + (h / 2.0) * gt[5]
        # GDALInvGeoTransform (alg/gdaltransformer.cpp published form)
        det = gt[1] * gt[5] - gt[2] * gt[4]
        inv = (( gt[2] * gt[3] - gt[0] * gt[5]) / det,
               gt[5] / det, -gt[2] / det,
               (gt[0] * gt[4] - gt[1] * gt[3]) / det,
               -gt[4] / det, gt[1] / det)
        sx = inv[0] + cx * inv[1] + cy * inv[2]
        sy = inv[3] + cx * inv[4] + cy * inv[5]
        fx, fy = sx - 0.5, sy - 0.5
        x0 = int(np.clip(np.floor(fx), 0, w - 1))
        y0 = int(np.clip(np.floor(fy), 0, h - 1))
        x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
        wx = float(np.clip(fx - x0, 0.0, 1.0))
        wy = float(np.clip(fy - y0, 0.0, 1.0))
        v = (px[y0, x0] * (1 - wx) * (1 - wy)
             + px[y0, x1] * wx * (1 - wy)
             + px[y1, x0] * (1 - wx) * wy
             + px[y1, x1] * wx * wy)
        center = float(np.clip(np.floor(v + 0.5), 0, 255))
        rows.append((center, ref_checksum(lu), ref_checksum(rc),
                     f"img{i:08d}"))
    return pd.DataFrame(rows, columns=["center_value", "cksum_lut",
                                       "cksum_reclass", "image_id"])


@builder("q_miramon_layer")
def _q_miramon_layer(sf):
    """Partial builder: the fixture identities and feature counts are
    ogr_miramon_vector.py assertions (GetFeatureCount() == 3 for the
    simple point/polygon files, == 4 for the arc file); the attribute
    and wkt crcs stay engine determinism pins."""
    rows = [("SimpleArcFile.arc", 4), ("SimplePointsFile.pnt", 3),
            ("SimplePolFile.pol", 3)]
    check_pairs(rows, ["file", "n_rows"], ["n_rows"],
                ["ogr/ogr_miramon_vector.py"])
    return pd.DataFrame(rows, columns=["file", "n_rows"])


# ------------------------------------------------------------------
# Remaining determinism-pins (round 5 close) and why each resists an
# engine-free builder — every one is a sequential / traversal-order
# algorithm whose ground truth lives in the pytest reference-fixture
# goldens, or a render whose exactness is proven by construction:
#
#   q_contour_lines       polyline counts depend on junction traversal
#                         order (documented above); per-level segment
#                         counts ARE independent via q_contour
#   q_convolve_sieve      sieve merges small regions in scan order
#   q_dither_palette      Floyd-Steinberg error diffusion is inherently
#   q_rgb_to_palette      sequential (+ median-cut split order)
#   q_fillnodata          8-ray nearest-valid search with IDW weights
#   q_footprint           boundary ring tracing (run/arc assembly)
#   q_gnm                 Dijkstra path over the reference GNM fixture
#                         (graph built by the engine's own readers)
#   q_grid_linear         TIN render — exactness proven by the forced
#                         1x1/2x2/4x4/3x2 bit-identity tests instead
#   q_nearblack           two-pass collar flood scan
#   q_pyramid             per-zoom tile counts depend on the warped
#                         footprints (engine warp semantics)
#   q_viewshed_cumulative viewshed line-sweep accumulation


# Builders that intentionally pin a ROW SUBSET (the generator refuses
# the row-subset mixed-provenance path for any other builder, so an
# engine query that starts emitting spurious extra rows FAILS
# generation instead of silently passing as "mixed").
ROW_SUBSET_BUILDERS = {
    "q_vfk_layer", "q_pds_table", "q_pmtiles_layer", "q_slf_wasp_kmz",
    "q_lvbag_layer", "q_feed_vector", "q_feed_formats",
    "q_mapml_pgdump", "q_dgn_layer", "q_cog", "q_raster_stats",
    "q_raster_stats_approx", "q_pixel_functions", "q_hillshade",
    "q_translate", "q_pansharpen", "q_reclassify_lut",
}


@builder("q_sozip")
def _q_sozip(sf):
    """Fully independent: the reference-fixture rows are the
    published facts of zero_5GB_sozip_of_sozip.zip
    (test_sozip.py:41-44 — 5232873 bytes, sozip yes, 32768-byte
    chunks; the nested member is the 5 GiB zero file); the synthetic
    rows are analytic (ceil((1MiB+1)/16384) = 65 chunks, auto
    threshold 1 MiB, payload length 1MiB+1) plus conformance flags
    that fail the gate if the zip container or index breaks."""
    rows = [
        ("a_chunks", 65),
        ("a_index_valid", 1),
        ("auto_a_enabled", 1),
        ("auto_b_enabled", 0),
        ("parallel_chunk_bytes", 1024 * 1024 + 1),
        ("range_probe_ok", 1),
        ("ref_chunk_size", 32768),
        ("ref_inner_size", 5 * 1024 * 1024 * 1024),
        ("ref_inner_sozip", 1),
        ("ref_member_size", 5232873),
        ("ref_sozip_valid", 1),
        ("yes_b_enabled", 1),
        ("zipfile_roundtrip", 1),
    ]
    check_pairs([("ref_member_size", 5232873),
                 ("ref_chunk_size", 32768)],
                ["case", "value"], ["value"],
                ["utilities/test_sozip.py"])
    return pd.DataFrame(rows, columns=["case", "value"])
