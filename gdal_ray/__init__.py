"""gdal_ray — a from-scratch Ray-Data-native spatial-join + tiling engine.

Reimplements the query / data-processing capabilities of GDAL
(reference: OSGeo GDAL 3.12, surveyed in SURVEY.md) as idiomatic Ray
Data pipelines: ``ray.data.Dataset`` -> ``map_batches`` over zero-copy
Arrow batches, actor pools for stateful stages (decoders, warpers,
spatial indexes), explicit cell-key partitioning for the wide steps.

Layout
------
functions/  pure, vectorized numpy/pyarrow kernels (no Ray imports):
            PNG codec, GDAL checksum, geotransform/affine, CRS math
            (WebMercator, Transverse Mercator/UTM), XYZ tile math,
            S2-style Hilbert cells, WKB codec, geometry predicates,
            resampling kernels, text/minhash utilities.
sources/    dataset constructors: deterministic image-corpus synthesis
            (Lance-shaped schema; parquet fallback since pylance is not
            in this environment), vector layer synthesis.
stages/     Ray Data stages: decode/translate/warp actor pools, tile
            assignment + compose, spatial join, rasterize/polygonize,
            dedup, similarity search, statistics.
pipelines/  end-to-end pipelines (flagship tiling+join) and the
            relational (OGR-SQL-surface) query implementations used by
            __ray_entry__.queries().
state/      checkpoint/resume manifests with per-partition lineage.

None of this package calls ``ray.init()`` — the caller owns the Ray
session (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
