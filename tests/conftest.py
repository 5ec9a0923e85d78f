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
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)


def pytest_report_header(config):
    return f"jax backend={jax.default_backend()} devices={jax.device_count()}"
