"""TPU compute kernels: grid maps, ray casting, pyramids, scan matching."""
