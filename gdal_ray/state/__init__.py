"""Shared mutable state: lineage manifests and per-stage metrics."""
