"""Pallas TPU kernels for hot operations beyond XLA's reach."""
