

def test_phash_neardup_recall_guarantee(ray_session):
    """8 bands x 8 bits with threshold 6 guarantees 100% recall by
    pigeonhole: every pair at hamming <= 6 must appear, verified
    against a brute-force all-pairs scan of the same corpus slice."""
    import numpy as np

    from gdal_ray.pipelines.flagship import PHASH_N, PHASH_T, q_phash_neardup
    from gdal_ray.sources.images import image_pixels, phash64

    got = q_phash_neardup("/root/testdata/sf0.001").to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    ph = np.array([phash64(image_pixels(i)) for i in range(PHASH_N)],
                  np.int64).view(np.uint64)
    brute = set()
    for a in range(PHASH_N):
        x = ph[a] ^ ph[a + 1:]
        ham = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(1)
        for off in np.nonzero(ham <= PHASH_T)[0]:
            brute.add((f"img{a:08d}", f"img{a + 1 + off:08d}"))
    assert pairs == brute
    assert (got["hamming"] <= PHASH_T).all()
