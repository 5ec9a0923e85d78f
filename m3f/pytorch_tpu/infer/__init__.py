"""Inference-time postprocessing and submission output."""
