"""Pallas TPU kernels for measured hot spots (flag-gated, XLA fallback)."""
