"""Test harness: run everything on a fake 8-device CPU backend.

SURVEY.md §4 "Distributed without a cluster": real TPU hardware is a single
chip behind a tunnel, so tests force `JAX_PLATFORMS=cpu` with
`--xla_force_host_platform_device_count=8` to exercise the full mesh/sharding
path, and use fp32 (CPU default) so torch-CPU golden-parity assertions hold.

Must run before the first `import jax` anywhere in the test process.
"""

import os

# torch-CPU (OpenMP) and XLA's thread pools deadlock intermittently when both
# spin up worker teams in one process; single-threaded torch avoids it and the
# golden models are tiny.
os.environ.setdefault("OMP_NUM_THREADS", "1")
# FORCE (not setdefault): the container exports JAX_PLATFORMS=axon globally,
# which would silently route every test through the flaky TPU tunnel.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin in EVERY python
# process and hard-sets jax.config jax_platforms="axon,cpu", overriding the
# env var. Re-override here (config update wins over both) or the whole suite
# silently runs through the flaky single-chip TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)  # jax>=0.5 way; XLA_FLAGS kept as fallback

jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: XLA compiles dominate suite time on this
# single-core VM; cache them across pytest invocations.
_cache_dir = os.environ.get("M3F_TEST_JAX_CACHE", "/tmp/m3f_jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def pytest_report_header(config):
    return f"jax backend={jax.default_backend()} devices={jax.device_count()}"
