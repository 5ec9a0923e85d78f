"""The asserting perf gate's pure logic (scripts/tpu_smoke.py apply_gate):
floors attach thresholds+pass per row and scale for the self-test. The
measurements themselves run on the chip; this pins the gate semantics."""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from tpu_smoke import FLOORS, apply_gate  # noqa: E402


def test_gate_passes_at_and_above_floor():
    row = apply_gate({"preset": "fusion", "clips_per_sec": 160.0,
                      "compile_s": 10.0})
    assert row["pass"] is True
    assert row["thresholds"]["clips_per_sec_min"] == 160.0


def test_gate_fails_below_floor_and_on_slow_compile():
    assert apply_gate({"preset": "fusion", "clips_per_sec": 159.9,
                       "compile_s": 10.0})["pass"] is False
    assert apply_gate({"preset": "fusion", "clips_per_sec": 300.0,
                       "compile_s": 151.0})["pass"] is False


def test_gate_scale_floors_self_test_trips():
    row = apply_gate({"preset": "bench:default", "clips_per_sec": 274.0},
                     scale=10.0)
    assert row["pass"] is False
    assert row["thresholds"]["clips_per_sec_min"] == 2450.0


def test_gate_device_compute_rule_and_unknown_preset():
    ok = apply_gate({"preset": "longseq_eval (eval)",
                     "device_compute_ms": 80.0, "compile_s": 5.0})
    assert ok["pass"] is True
    bad = apply_gate({"preset": "longseq_eval (eval)",
                      "device_compute_ms": 120.0})
    assert bad["pass"] is False
    # a missing trace (None) never fails the row — wall is tunnel-bound
    none = apply_gate({"preset": "longseq_eval (eval)",
                       "device_compute_ms": None})
    assert none["pass"] is True
    # unknown presets pass through ungated
    assert "pass" not in apply_gate({"preset": "mystery"})


def test_floor_keys_cover_the_default_preset_list():
    defaults = {"audio_only", "visual_only", "fusion", "fusion+lane",
                "distributed_train", "longseq_eval (eval)",
                "bench:default", "bench:lane"}
    assert defaults <= set(FLOORS)
