"""Utility subsystems: metric logging, profiling."""
