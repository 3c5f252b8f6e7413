"""Pallas TPU kernels for the scan-matching hot loops."""
