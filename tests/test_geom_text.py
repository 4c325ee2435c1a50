"""Unit tests: WKB codec, geometry kernels (vs brute-force oracles),
resampling kernels, text kernels."""

import numpy as np
import pytest

from gdal_ray.functions.geom import (
    PackedPolygonIndex,
    PreparedPolygon,
    clip_ring_to_rect,
    geom_area,
    geom_centroid,
    geom_length,
    ring_area,
    segmentize_ring,
    simplify_ring,
)
from gdal_ray.functions.resample import reduce2x2, resize, sample, sample_bilinear, sample_cubic, sample_nearest
from gdal_ray.functions.text import (
    content_hash,
    hamming64,
    jaccard,
    langid,
    minhash_bands,
    minhash_signature,
    quality_scores,
    shingles,
    simhash64,
    stable_hash64,
    token_count_ws,
)
from gdal_ray.functions.wkb import (
    Geom,
    MULTIPOLYGON,
    POLYGON,
    geom_to_wkb,
    points_to_wkb,
    rect_polygon,
    wkb_to_geom,
    wkb_to_points,
)

RNG = np.random.default_rng(7)

SHELL = np.array([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], float)
HOLE = np.array([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], float)


def test_wkb_point_roundtrip_vectorized():
    x = RNG.uniform(-180, 180, 100)
    y = RNG.uniform(-90, 90, 100)
    col = points_to_wkb(x, y)
    x2, y2 = wkb_to_points(col)
    np.testing.assert_array_equal(x, x2)
    np.testing.assert_array_equal(y, y2)
    g = wkb_to_geom(col[0])  # generic parser agrees
    assert g.rings[0][0, 0] == x[0]


def test_wkb_polygon_roundtrip():
    g = Geom(POLYGON, [SHELL, HOLE], [2])
    g2 = wkb_to_geom(geom_to_wkb(g))
    assert g2.kind == POLYGON and len(g2.rings) == 2
    np.testing.assert_array_equal(g2.rings[1], HOLE)


def test_wkb_multipolygon_roundtrip():
    g = Geom(MULTIPOLYGON, [SHELL, HOLE, SHELL + 20], [2, 1])
    g2 = wkb_to_geom(geom_to_wkb(g))
    assert g2.kind == MULTIPOLYGON and g2.poly_ring_counts == [2, 1]
    assert abs(geom_area(g2) - (96 + 100)) < 1e-9


def test_wkb_big_endian_decode():
    import struct

    be = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.5, -4.5)
    g = wkb_to_geom(be)
    assert g.rings[0][0, 0] == 3.5 and g.rings[0][0, 1] == -4.5


def test_area_centroid_length():
    g = Geom(POLYGON, [SHELL, HOLE], [2])
    assert abs(geom_area(g) - 96) < 1e-12
    cx, cy = geom_centroid(g)
    assert abs(cx - 5) < 1e-12 and abs(cy - 5) < 1e-12
    assert abs(geom_length(g) - 48) < 1e-12
    assert ring_area(SHELL) == 100.0  # CCW positive


def test_pip_with_hole():
    pp = PreparedPolygon(Geom(POLYGON, [SHELL, HOLE], [2]))
    hits = pp.contains_points(np.array([5.0, 5.0, -1.0, 1.0]), np.array([5.0, 1.0, 5.0, 1.0]))
    assert hits.tolist() == [False, True, False, True]


def test_distance():
    pp = PreparedPolygon(Geom(POLYGON, [SHELL], [1]))
    d = pp.distance_to_points(np.array([15.0, 5.0, 13.0]), np.array([5.0, 5.0, 14.0]))
    assert abs(d[0] - 5) < 1e-12 and d[1] == 0 and abs(d[2] - 5) < 1e-12


def test_clip_simplify_segmentize():
    c = clip_ring_to_rect(SHELL, 5, 5, 20, 20)
    assert abs(abs(ring_area(c)) - 25) < 1e-12
    assert clip_ring_to_rect(SHELL, 20, 20, 30, 30).size == 0
    r = np.array([[0, 0], [5, 0.001], [10, 0], [10, 10], [0, 10], [0, 0]], float)
    assert len(simplify_ring(r, 0.01)) == 5
    sg = segmentize_ring(SHELL, 3.0)
    assert np.hypot(*np.diff(sg, axis=0).T).max() <= 3.0 + 1e-12


def test_packed_index_matches_bruteforce():
    polys, fids = [], []
    for i in range(40):
        cx0, cy0 = RNG.uniform(0, 100, 2)
        w, h = RNG.uniform(2, 15, 2)
        polys.append(geom_to_wkb(rect_polygon(cx0, cy0, cx0 + w, cy0 + h)))
        fids.append(i * 10)
    idx = PackedPolygonIndex(np.array(fids), polys)
    qx = RNG.uniform(-10, 110, 2000)
    qy = RNG.uniform(-10, 110, 2000)
    pi, pf = idx.query_points(qx, qy)
    exp = set()
    for i, w in enumerate(polys):
        hit = PreparedPolygon(wkb_to_geom(w)).contains_points(qx, qy)
        exp |= {(int(j), fids[i]) for j in np.nonzero(hit)[0]}
    assert set(zip(pi.tolist(), pf.tolist())) == exp


def test_packed_index_knn_sorted():
    polys = [geom_to_wkb(rect_polygon(i * 10, 0, i * 10 + 5, 5)) for i in range(10)]
    idx = PackedPolygonIndex(np.arange(10), polys)
    d, f = idx.nearest(np.array([2.0]), np.array([20.0]), k=3)
    assert f[0, 0] == 0 and (np.diff(d[0]) >= 0).all()


# ------------------------------------------------------------------ resample
def test_nearest_identity():
    src = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize(src, 4, 4, "nearest")
    np.testing.assert_array_equal(out, src)


def test_nearest_upsample_replicates():
    src = np.array([[1, 2], [3, 4]], np.uint8)
    out = resize(src, 4, 4, "nearest")
    np.testing.assert_array_equal(out, np.repeat(np.repeat(src, 2, 0), 2, 1))


def test_bilinear_center_average():
    src = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out, valid = sample_bilinear(src, np.array([2.0]), np.array([2.0]))
    assert out[0] == 8 and valid[0]  # (5+6+9+10)/4 = 7.5 -> rounds to 8


def test_cubic_exact_at_centers():
    src = np.arange(100, dtype=np.float64).reshape(10, 10)
    out, _ = sample_cubic(src, np.array([3.5]), np.array([4.5]))
    assert abs(out[0] - 43.0) < 1e-9


def test_cubic_linear_preservation():
    # Catmull-Rom reproduces linear ramps exactly in the interior
    src = np.tile(np.arange(10, dtype=np.float64), (10, 1))
    out, _ = sample_cubic(src, np.array([4.25, 5.75]), np.array([5.0, 5.0]))
    np.testing.assert_allclose(out, [3.75, 5.25], atol=1e-9)


def test_sample_outside_invalid():
    src = np.full((4, 4), 9, np.uint8)
    out, valid = sample_nearest(src, np.array([-1.0, 2.0]), np.array([2.0, 2.0]), nodata=255)
    assert out[0] == 255 and not valid[0] and out[1] == 9


def test_reduce2x2_methods():
    a = np.array([[1, 3, 10, 10], [5, 7, 10, 10]], np.uint8)
    assert reduce2x2(a, "average").tolist() == [[4, 10]]
    assert reduce2x2(a, "max").tolist() == [[7, 10]]
    assert reduce2x2(a, "min").tolist() == [[1, 10]]
    assert reduce2x2(a, "mode").tolist() == [[1, 10]]
    odd = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], np.uint8)
    assert reduce2x2(odd, "nearest").shape == (2, 2)


def test_unsupported_resampler():
    with pytest.raises(NotImplementedError):
        sample(np.zeros((2, 2)), np.array([1.0]), np.array([1.0]), "lanczos9")


# ------------------------------------------------------------------ text
def test_token_count_matches_sql_semantics():
    texts = ["a b c", "one", ""]
    assert token_count_ws(texts).tolist() == [3, 1, 0]


def test_quality_scores():
    q = quality_scores(["the cat sat", ""])
    assert q["n_tokens"].tolist() == [3, 0]
    assert 0 < q["stopword_ratio"][0] < 1


def test_stable_hash_deterministic():
    assert stable_hash64(b"abc") == stable_hash64(b"abc")
    assert stable_hash64(b"abc") != stable_hash64(b"abd")
    assert content_hash(["x", "x"])[0] == content_hash(["x"])[0]


def test_minhash_similarity_tracks_jaccard():
    a = "the quick brown fox jumps over the lazy dog " * 3
    b = a.replace("lazy", "sleepy")
    c = "completely different content about raster tiles and cells " * 3
    sa, sb, sc = (minhash_signature(shingles(t)) for t in (a, b, c))
    sim_ab = (sa == sb).mean()
    sim_ac = (sa == sc).mean()
    assert sim_ab > 0.5 > sim_ac
    assert jaccard(shingles(a), shingles(b)) > jaccard(shingles(a), shingles(c))
    assert len(minhash_bands(sa)) == 16


def test_simhash_hamming():
    s = simhash64(["aaa bbb ccc ddd", "aaa bbb ccc dde", "zzz yyy xxx www"])
    d_near = hamming64(s[:1], s[1:2])[0]
    d_far = hamming64(s[:1], s[2:3])[0]
    assert d_near < d_far


def test_langid():
    assert langid(["the cat and the dog went to the park"])[0] == "en"
    assert langid([""])[0] == "und"


def test_wkb_z_roundtrip_and_precision():
    """2.5-D WKB (ISO 1000+k and EWKB 0x80000000), -zfield promotion,
    and OGRGeomCoordinatePrecision snapping (std::round semantics)."""
    import struct

    import numpy as np

    from gdal_ray.functions.wkb import (Geom, LINESTRING, MULTIPOLYGON,
                                        POINT, POLYGON, geom_to_wkb,
                                        geom_to_wkt, points_to_wkb_z,
                                        round_coordinates, set_z,
                                        snap_resolution, wkb_to_geom,
                                        wkb_to_points_z)

    g = Geom(POLYGON, [np.array([[0., 0.], [4., 0.], [4., 3.], [0., 0.]])],
             [1])
    gz = set_z(g, 7.25)
    b = geom_to_wkb(gz)
    assert struct.unpack("<I", b[1:5])[0] == 1003  # ISO PolygonZ
    g2 = wkb_to_geom(b)
    assert g2.zs is not None and np.allclose(g2.zs[0], 7.25)
    assert geom_to_wkt(g2, 6).startswith("POLYGON Z ((0 0 7.25")
    # EWKB Z flag read
    ew = b"\x01" + struct.pack("<I", 0x80000001) + struct.pack(
        "<3d", 1.0, 2.0, 9.0)
    ge = wkb_to_geom(ew)
    assert ge.kind == POINT and ge.zs[0][0] == 9.0
    # multipolygon Z round-trip
    mp = set_z(Geom(MULTIPOLYGON,
                    [np.array([[0., 0.], [1., 0.], [1., 1.], [0., 0.]]),
                     np.array([[5., 5.], [6., 5.], [6., 6.], [5., 5.]])],
                    [1, 1]), 2.0)
    m2 = wkb_to_geom(geom_to_wkb(mp))
    assert m2.zs is not None and all(np.allclose(z, 2.0) for z in m2.zs)
    # precision snapping: half away from zero, negatives included
    rr = round_coordinates(
        Geom(LINESTRING, [np.array([[1.234, -5.678], [0.005, -0.005]])]),
        0.01)
    assert np.allclose(rr.rings[0], [[1.23, -5.68], [0.01, -0.01]])
    # exactly-representable half: snaps away from zero (std::round);
    # -0.15/0.1 would be -1.4999…98 in float64 and snaps to -0.1,
    # identically to the reference's C++ double arithmetic
    assert snap_resolution(np.array([-1.5]), 1.0)[0] == -2.0
    assert snap_resolution(np.array([1.5]), 1.0)[0] == 2.0
    # vectorized POINT Z column round-trip
    x = np.array([1.5, -3.25])
    y = np.array([2.5, 4.0])
    z = np.array([10.0, -1.5])
    col = points_to_wkb_z(x, y, z)
    x2, y2, z2 = wkb_to_points_z(col)
    assert np.array_equal(x, x2) and np.array_equal(y, y2) \
        and np.array_equal(z, z2)
    # the generic parser agrees with the fast column codec
    gg = wkb_to_geom(col[1])
    assert gg.zs[0][0] == -1.5 and gg.rings[0][0, 0] == -3.25
