"""Ray Data stages: decode/translate/warp actor pools, tiling,
spatial join, rasterize/polygonize, joins, dedup, similarity."""
