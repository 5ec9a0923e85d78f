"""The asserting perf gate's pure logic (scripts/tpu_smoke.py): floors are
DERIVED from the checked-in scripts/baselines.json artifact (measured value
x headroom — VERDICT r4 weak #3), apply_gate attaches thresholds+pass per
row and scales for the self-test, and --rebaseline rewrites measured values
from a passing run. The measurements themselves run on the chip; this pins
the gate semantics."""

import copy
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from tpu_smoke import (FLOORS, apply_gate, derive_floors,  # noqa: E402
                       load_baselines, rebaseline)


# ---- floor derivation (baselines.json -> FLOORS) ----

def test_floors_are_measured_times_headroom():
    base = load_baselines()
    fusion = base["rows"]["fusion"]["clips_per_sec"]
    assert FLOORS["fusion"]["clips_per_sec_min"] == round(
        fusion["measured"] * fusion["headroom"], 1)
    eval_rule = base["rows"]["longseq_eval (eval)"]["device_compute_ms"]
    assert eval_rule["headroom"] > 1  # ceilings widen, floors shrink
    assert FLOORS["longseq_eval (eval)"]["device_compute_ms_max"] == round(
        eval_rule["measured"] * eval_rule["headroom"], 1)


def test_absolute_ceilings_pass_through_underived():
    # compile_s is a pathology detector (250-540 s program-load class), not
    # a regression band: its ceiling is absolute, never measured*headroom
    base = load_baselines()
    assert "measured" not in base["rows"]["fusion"]["compile_s"]
    assert FLOORS["fusion"]["compile_s_max"] == \
        base["rows"]["fusion"]["compile_s"]["ceiling"]


def test_derive_floors_is_pure_math():
    floors = derive_floors({"rows": {
        "x": {"clips_per_sec": {"measured": 100.0, "headroom": 0.8},
              "compile_s": {"ceiling": 9.0}},
        "y": {"host_pipeline_ms": {"measured": 10.0, "headroom": 2.0}},
    }})
    assert floors == {"x": {"clips_per_sec_min": 80.0, "compile_s_max": 9.0},
                      "y": {"host_pipeline_ms_max": 20.0}}


# ---- gate semantics ----

def test_gate_passes_at_and_above_floor():
    floor = FLOORS["fusion"]["clips_per_sec_min"]
    row = apply_gate({"preset": "fusion", "clips_per_sec": floor,
                      "compile_s": 10.0})
    assert row["pass"] is True
    assert row["thresholds"]["clips_per_sec_min"] == floor


def test_gate_fails_below_floor_and_on_slow_compile():
    floor = FLOORS["fusion"]["clips_per_sec_min"]
    assert apply_gate({"preset": "fusion", "clips_per_sec": floor - 0.1,
                       "compile_s": 10.0})["pass"] is False
    assert apply_gate({"preset": "fusion", "clips_per_sec": floor + 100,
                       "compile_s": 151.0})["pass"] is False


def test_compile_ceiling_waived_only_for_unchanged_program():
    # BASELINE.md round 5: cold-load wall time swings 4-7x with rig weather
    # for a byte-identical program, so the pathology ceiling applies only
    # when the lowered-HLO fingerprint CHANGED since the baselined run.
    floors = derive_floors({"rows": {"x": {
        "clips_per_sec": {"measured": 100.0, "headroom": 0.8},
        "compile_s": {"ceiling": 150.0, "program_sha": "abc123"}}}})
    assert floors["x"]["program_sha"] == "abc123"
    import tpu_smoke
    old = tpu_smoke.FLOORS
    tpu_smoke.FLOORS = floors
    try:
        # same program, slow day -> waived with an explanation, still passes
        ok = apply_gate({"preset": "x", "clips_per_sec": 100.0,
                         "compile_s": 400.0, "program_sha": "abc123"})
        assert ok["pass"] is True and "weather" in ok["compile_s_waived"]
        # changed program over the ceiling -> fails (must prove itself)
        assert apply_gate({"preset": "x", "clips_per_sec": 100.0,
                           "compile_s": 400.0, "program_sha": "zzz999"
                           })["pass"] is False
        # no recorded fingerprint -> conservative, ceiling applies
        assert apply_gate({"preset": "x", "clips_per_sec": 100.0,
                           "compile_s": 400.0})["pass"] is False
        # under the ceiling nothing is waived regardless of sha
        under = apply_gate({"preset": "x", "clips_per_sec": 100.0,
                            "compile_s": 10.0, "program_sha": "zzz999"})
        assert under["pass"] is True and "compile_s_waived" not in under
    finally:
        tpu_smoke.FLOORS = old


def test_rebaseline_records_program_sha():
    base = {"rows": {"fusion": {"compile_s": {"ceiling": 150.0}}},
            "provenance": {}}
    out = rebaseline(base, [{"preset": "fusion", "compile_s": 12.0,
                             "program_sha": "deadbeef"}], date="2099-01-01")
    assert out["rows"]["fusion"]["compile_s"] == {
        "ceiling": 150.0, "program_sha": "deadbeef"}


def test_gate_scale_floors_self_test_trips():
    floor = FLOORS["bench:default"]["clips_per_sec_min"]
    row = apply_gate({"preset": "bench:default", "clips_per_sec": floor},
                     scale=10.0)
    assert row["pass"] is False
    assert row["thresholds"]["clips_per_sec_min"] == floor * 10.0
    # max rules divide by scale so the self-test trips every rule kind
    ceil = FLOORS["feed:fusion"]["host_pipeline_ms_max"]
    bad = apply_gate({"preset": "feed:fusion",
                      "host_pipeline_ms_per_batch": ceil * 0.9}, scale=10.0)
    assert bad["pass"] is False
    assert bad["thresholds"]["host_pipeline_ms_max"] == round(ceil / 10.0, 4)


def test_gate_device_compute_rule_and_unknown_preset():
    ceil = FLOORS["longseq_eval (eval)"]["device_compute_ms_max"]
    ok = apply_gate({"preset": "longseq_eval (eval)",
                     "device_compute_ms": ceil - 1.0, "compile_s": 5.0})
    assert ok["pass"] is True
    bad = apply_gate({"preset": "longseq_eval (eval)",
                      "device_compute_ms": ceil + 1.0})
    assert bad["pass"] is False
    # a missing trace (None) never fails the row — wall is tunnel-bound
    none = apply_gate({"preset": "longseq_eval (eval)",
                       "device_compute_ms": None})
    assert none["pass"] is True
    # unknown presets pass through ungated
    assert "pass" not in apply_gate({"preset": "mystery"})


def test_gate_feed_path_rule():
    # VERDICT r4 weak #2: the integrated feed path is now gated on its
    # tunnel-independent component (host pipeline ms/batch)
    ceil = FLOORS["feed:fusion"]["host_pipeline_ms_max"]
    ok = apply_gate({"preset": "feed:fusion",
                     "host_pipeline_ms_per_batch": ceil - 0.1})
    assert ok["pass"] is True
    assert apply_gate({"preset": "feed:fusion",
                       "host_pipeline_ms_per_batch": ceil + 0.1,
                       })["pass"] is False


def test_floor_keys_cover_the_default_preset_list():
    defaults = {"audio_only", "visual_only", "fusion", "fusion+lane",
                "distributed_train", "longseq_eval (eval)", "feed:fusion",
                "bench:default", "bench:lane"}
    assert defaults <= set(FLOORS)


# ---- rebaseline flow ----

def test_rebaseline_rewrites_measured_keeps_headrooms_and_ceilings():
    base = copy.deepcopy(load_baselines())
    old_headroom = base["rows"]["fusion"]["clips_per_sec"]["headroom"]
    run = [{"preset": "fusion", "clips_per_sec": 999.0, "compile_s": 12.0},
           {"preset": "feed:fusion", "host_pipeline_ms_per_batch": 7.0},
           {"preset": "longseq_eval (eval)", "device_compute_ms": 55.0}]
    out = rebaseline(base, run, date="2099-01-01")
    assert out["rows"]["fusion"]["clips_per_sec"]["measured"] == 999.0
    assert out["rows"]["fusion"]["clips_per_sec"]["headroom"] == old_headroom
    # absolute ceilings are pathology detectors — never rebaselined (the
    # run above carries no program_sha, so the recorded one is kept too)
    assert out["rows"]["fusion"]["compile_s"]["ceiling"] == 150.0
    assert out["rows"]["fusion"]["compile_s"]["program_sha"] == \
        base["rows"]["fusion"]["compile_s"]["program_sha"]
    assert out["rows"]["feed:fusion"]["host_pipeline_ms"]["measured"] == 7.0
    assert out["rows"]["longseq_eval (eval)"]["device_compute_ms"][
        "measured"] == 55.0
    assert out["provenance"]["date"] == "2099-01-01"


def test_rebaseline_skips_presets_absent_from_the_run():
    base = copy.deepcopy(load_baselines())
    before = copy.deepcopy(base["rows"]["bench:lane"])
    out = rebaseline(base, [{"preset": "fusion", "clips_per_sec": 1.0}],
                     date="2099-01-01")
    assert out["rows"]["bench:lane"] == before
    # the fusion floor would now be 0.8 — derivation still mechanical
    assert derive_floors(out)["fusion"]["clips_per_sec_min"] == 0.8
