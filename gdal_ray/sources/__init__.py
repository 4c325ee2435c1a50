"""Dataset constructors: deterministic synthetic corpora (seeded) and
parquet readers. The image corpus follows BASELINE.json's input_hint
schema exactly: (image_id, bytes, w, h, fmt, caption, phash)."""
