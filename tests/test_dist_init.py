"""Multi-host initialization decision (SURVEY §2.4 C-P1, VERDICT r2 missing #2).

The reference "just works" under Lightning's ddp launcher; here the
equivalent is: every process of a Cloud TPU pod runs the same `m3f train`
command and joins ONE jax.distributed job. The failure mode this guards:
standard pod processes set NO JAX_* coordinator env vars, so an env-var-only
gate silently skips initialization and each worker trains a private copy of
the run. The decision is a pure function of the environment — every shape
below is the real env a given launcher produces.
"""

import os

import pytest

from m3f.pytorch_tpu.parallel.mesh import (DistInitPlan,
                                           distributed_init_plan,
                                           maybe_initialize_distributed)


def test_single_host_no_signal():
    plan = distributed_init_plan({})
    assert not plan.initialize
    # real single-host TPU VMs list themselves as the only worker
    plan = distributed_init_plan({"TPU_WORKER_HOSTNAMES": "t1v-n-abc-w-0",
                                  "TPU_WORKER_ID": "0"})
    assert not plan.initialize


def test_cloud_tpu_pod_metadata_fires():
    """THE case round 2 got wrong: pod workers set only TPU_* metadata."""
    env = {"TPU_WORKER_HOSTNAMES": "w0,w1,w2,w3", "TPU_WORKER_ID": "2"}
    plan = distributed_init_plan(env)
    assert plan.initialize
    assert plan.expect_processes == 4
    assert plan.kwargs == {}  # jax autodetects the coordinator from metadata


def test_pod_metadata_trailing_comma_and_spacing():
    plan = distributed_init_plan({"TPU_WORKER_HOSTNAMES": "w0,w1,"})
    assert plan.initialize and plan.expect_processes == 2


def test_inconsistent_pod_metadata_raises():
    with pytest.raises(ValueError, match="TPU_WORKER_ID"):
        distributed_init_plan({"TPU_WORKER_HOSTNAMES": "w0,w1",
                               "TPU_WORKER_ID": "5"})


def test_jax_coordinator_env():
    plan = distributed_init_plan({"JAX_COORDINATOR_ADDRESS": "h:1234"})
    assert plan.initialize and plan.kwargs == {}
    assert plan.expect_processes is None  # unknown without JAX_NUM_PROCESSES
    plan = distributed_init_plan({"JAX_COORDINATOR_ADDRESS": "h:1234",
                                  "JAX_NUM_PROCESSES": "16"})
    assert plan.expect_processes == 16


def test_megascale_multislice_env():
    plan = distributed_init_plan({"MEGASCALE_COORDINATOR_ADDRESS": "h:8080"})
    assert plan.initialize


def test_explicit_coordinator_override():
    plan = distributed_init_plan({"M3F_COORDINATOR": "10.0.0.1:9999,8,3"})
    assert plan.initialize
    assert plan.kwargs == {"coordinator_address": "10.0.0.1:9999",
                           "num_processes": 8, "process_id": 3}
    assert plan.expect_processes == 8
    # address-only form: jax infers process topology
    plan = distributed_init_plan({"M3F_COORDINATOR": "10.0.0.1:9999"})
    assert plan.initialize
    assert plan.kwargs == {"coordinator_address": "10.0.0.1:9999"}


def test_explicit_override_beats_pod_metadata():
    plan = distributed_init_plan({"M3F_COORDINATOR": "h:1,2,0",
                                  "TPU_WORKER_HOSTNAMES": "w0,w1,w2,w3"})
    assert plan.kwargs["coordinator_address"] == "h:1"
    assert plan.expect_processes == 2


def test_malformed_coordinator_rejected():
    with pytest.raises(ValueError, match="M3F_COORDINATOR"):
        distributed_init_plan({"M3F_COORDINATOR": "h:1,2"})


def test_maybe_initialize_single_host_is_noop():
    plan = maybe_initialize_distributed({})
    assert isinstance(plan, DistInitPlan) and not plan.initialize


def test_maybe_initialize_failure_is_loud(monkeypatch):
    """If the runtime says multi-process but initialize() fails, the run
    must die — NOT fall back to N independent single-process jobs."""
    import m3f.pytorch_tpu.parallel.mesh as mesh_mod

    def boom(**kw):
        raise OSError("coordinator unreachable")

    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize", boom)
    monkeypatch.setattr(mesh_mod, "_dist_initialized", False)
    with pytest.raises(RuntimeError, match="Refusing"):
        maybe_initialize_distributed({"TPU_WORKER_HOSTNAMES": "w0,w1"})


def test_maybe_initialize_process_count_disagreement(monkeypatch):
    import m3f.pytorch_tpu.parallel.mesh as mesh_mod

    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize",
                        lambda **kw: None)
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 1)
    monkeypatch.setattr(mesh_mod, "_dist_initialized", False)
    with pytest.raises(RuntimeError, match="disagree"):
        maybe_initialize_distributed({"TPU_WORKER_HOSTNAMES": "w0,w1"})


def test_maybe_initialize_idempotent(monkeypatch):
    import m3f.pytorch_tpu.parallel.mesh as mesh_mod

    calls = []
    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setattr(mesh_mod.jax, "process_count", lambda: 2)
    monkeypatch.setattr(mesh_mod, "_dist_initialized", False)
    env = {"TPU_WORKER_HOSTNAMES": "w0,w1"}
    maybe_initialize_distributed(env)
    maybe_initialize_distributed(env)  # second call must not re-initialize
    assert len(calls) == 1


@pytest.mark.slow  # ~60 s: two full python+jax subprocess boots
def test_real_two_process_rendezvous(tmp_path):
    """A REAL two-process ``jax.distributed`` job, end to end through the
    product path (tests/dist_worker.py): M3F_COORDINATOR rendezvous, one
    local CPU device per rank (2 global), disjoint per-rank input shards
    assembled by shard_batch's make_array_from_process_local_data, and the
    jitted train step's psum over the cross-process Gloo backend. The
    replicated state means the printed loss must be BITWISE identical on
    both ranks — the strongest multi-host evidence this single-host
    environment can produce (everything else pins the pure decision
    function or a faked process_count)."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:     # free port, race-tolerant enough here
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    env_base = {k: v for k, v in os.environ.items()
                if k != "XLA_FLAGS"}   # 1 local device per rank, not 8
    procs, logs = [], []
    for pid in range(2):
        log = open(str(tmp_path / f"rank{pid}.log"), "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [_sys.executable, worker],
            env={**env_base,
                 "M3F_COORDINATOR": f"localhost:{port},2,{pid}"},
            stdout=log, stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=300) for p in procs]
    for log in logs:
        log.close()
    outs = [open(str(tmp_path / f"rank{i}.log")).read() for i in range(2)]
    assert rcs == [0, 0], f"rcs={rcs}\nrank0:\n{outs[0][-2000:]}\n" \
                          f"rank1:\n{outs[1][-2000:]}"
    losses = {}
    for i, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")]
        assert line, f"rank {i} printed no RESULT:\n{out[-2000:]}"
        losses[i] = line[-1].split("loss=")[1]
    assert losses[0] == losses[1], f"ranks disagree: {losses}"
