"""End-to-end pipelines: the flagship tiling+join pipeline and the
relational / spatial / text query surface exposed through
__ray_entry__.queries()."""
