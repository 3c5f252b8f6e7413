"""Pallas TPU kernels for the hot correlative-matching path."""
