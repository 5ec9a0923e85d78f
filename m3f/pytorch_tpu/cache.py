"""Persistent XLA compilation cache + TPU compiler tuning.

First compiles of the full fusion model take minutes; every entry point
(bench.py, main.py, __graft_entry__.py, tests) enables the on-disk cache so
recompiles across processes are near-instant.  Call before the first jax
operation; safe to call repeatedly.
"""

from __future__ import annotations

import os

# Measured on v5e (fusion train step, B=8x4 windows): raising the compiler's
# per-fusion scoped-VMEM budget from the default to 32 MiB lets the big
# stage-1 conv+BN fusions tile wider — 265 -> 275 clips/s/chip (+3.8%),
# stable across runs; 48/64 MiB are no better.  Only applied when the user
# has not set their own LIBTPU_INIT_ARGS.
_TUNED_LIBTPU_ARGS = "--xla_tpu_scoped_vmem_limit_kib=32768"


def tune_tpu_flags() -> None:
    """Apply measured-good libtpu defaults (no-op if user already set them).

    Must run before the first jax backend initialization to take effect;
    harmless (ignored) on non-TPU backends.
    """
    os.environ.setdefault("LIBTPU_INIT_ARGS", _TUNED_LIBTPU_ARGS)


def enable_persistent_cache(directory: str | None = None) -> None:
    tune_tpu_flags()
    import jax

    directory = directory or os.environ.get("M3F_JAX_CACHE", "/tmp/m3f_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # backend already initialized with a cache, or unsupported
