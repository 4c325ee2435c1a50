"""Pure vectorized kernels. No Ray imports here — these run inside
``map_batches`` bodies and in unit tests without a cluster."""
