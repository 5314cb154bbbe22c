"""The bench's accuracy/scaling gates must FAIL the run (VERDICT r3 item 3):
a deliberately mis-gated result produces failures (-> bench exits nonzero and
nulls the headline), a clean result produces none."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _good_result():
    return {
        "trace_ok": True,
        "trace_err": 2e-4,
        "pt_ok": True,
        "pt": {"build_residual": 8e-7},
        "vs_baseline": 62.0,
        "mesh": {
            "weak_scaling": [
                {"n_devices": 1, "per_device_steps_per_sec": 1000.0,
                 "hlo_collectives": []},
                {"n_devices": 8, "per_device_steps_per_sec": 950.0,
                 "hlo_collectives": []},
            ],
            "total_ratio_8dev": 0.98,
            "collective_free": True,
        },
    }


def _gates():
    import bench
    return bench.evaluate_gates


def test_clean_result_passes():
    assert _gates()(_good_result()) == []


def test_trace_gate_fails():
    r = _good_result()
    r["trace_ok"] = False
    r["trace_err"] = 5e-2
    fails = _gates()(r)
    assert any("trace" in f for f in fails)


def test_pt_gate_fails():
    r = _good_result()
    r["pt_ok"] = False
    fails = _gates()(r)
    assert any("pt gate" in f for f in fails)


def test_speed_gate_fails():
    # BASELINE.md speed target: >=50x the measured single-core baseline
    r = _good_result()
    r["vs_baseline"] = 21.6
    fails = _gates()(r)
    assert any("speed gate" in f and "21.6" in f for f in fails)


def test_speed_gate_missing_fails():
    r = _good_result()
    del r["vs_baseline"]
    fails = _gates()(r)
    assert any("vs_baseline missing" in f for f in fails)


def test_mesh_collective_gate_fails():
    r = _good_result()
    r["mesh"]["collective_free"] = False
    r["mesh"]["weak_scaling"][1]["hlo_collectives"] = ["all-reduce"]
    fails = _gates()(r)
    assert any("collectives" in f for f in fails)


def test_mesh_overhead_gate_fails():
    # total sharded throughput below the unsharded run = sharding overhead
    r = _good_result()
    r["mesh"]["total_ratio_8dev"] = 0.4
    fails = _gates()(r)
    assert any("sharding overhead" in f for f in fails)


def test_mesh_child_error_fails():
    r = _good_result()
    r["mesh"] = {"weak_scaling": [{"n_devices": 1, "error": "timeout"},
                                  {"n_devices": 8, "error": "timeout"}]}
    fails = _gates()(r)
    assert any("child failed" in f for f in fails)


def test_flops_model_positive():
    import bench
    f = bench.flops_per_lane_step(25, 4)
    assert f == 16 * 25 * 256 + 16 * 25 * 64 + 8 * 625 * 16
