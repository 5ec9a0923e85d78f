"""Persistent XLA compilation cache setup.

First compiles of the full fusion model take minutes; every entry point
(bench.py, main.py, __graft_entry__.py, tests) enables the on-disk cache so
recompiles across processes are near-instant.  Call before the first jax
operation; safe to call repeatedly.
"""

from __future__ import annotations

import os


def enable_persistent_cache(directory: str | None = None) -> None:
    import jax

    directory = directory or os.environ.get("M3F_JAX_CACHE", "/tmp/m3f_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # backend already initialized with a cache, or unsupported
