"""Gates for the round-2 batching/sharding machinery:

- per-lane MTO superoperators (one program serving different operator sets)
- batched dynamical-map collection (batched_dynmap_runs vs calc_dynmap)
- mesh-sharded lane fan-out vs single-device (8 virtual CPU devices)
"""

import numpy as np

from pyaceqd_tpu.engine import branched
from pyaceqd_tpu.engine.simulate import mto_superop
from pyaceqd_tpu.models.tls import tls
from pyaceqd_tpu.parallel.mesh import default_mesh
from pyaceqd_tpu.pulses import Pulse

DT = 0.1


def _task(t_end=8.0):
    p = Pulse(tau=1.5, e_start=0, w_gain=0, t0=3.0, e0=1.2)
    return tls(0, t_end, p, dt=DT, gamma_e=0.1, lindblad=True,
               phonons=False, return_task=True, output_ops=[])


def _mtos():
    return [{"operator": "|0><1|_2", "applyFrom": "_left",
             "applyBefore": "false"},
            {"operator": "|1><0|_2", "applyFrom": "_right",
             "applyBefore": "false"}]


def test_per_lane_sops_equals_shared():
    task = _task()
    mtos = _mtos()
    t1 = np.round(np.arange(1.0, 5.0, 0.5), 6)
    times = np.stack([t1, t1], axis=1)
    gather = times + 1.0
    outs_shared = branched.batched_mto_runs(task, mtos, times, gather,
                                            ["|1><1|_2", "|0><0|_2"])
    d2 = task.dim**2
    sops = np.stack([mto_superop(m) for m in mtos])
    sops_b = np.broadcast_to(sops, (len(t1),) + sops.shape).copy()
    outs_lane = branched.batched_mto_runs(task, mtos, times, gather,
                                          ["|1><1|_2", "|0><0|_2"],
                                          mto_sops_batch=sops_b)
    assert np.allclose(outs_shared, outs_lane, atol=1e-13)


def test_per_lane_sops_mixed_sets():
    """Lanes with different operator sets in one program equal two separate
    shared-ops programs."""
    task = _task()
    mtos_a = _mtos()
    mtos_b = [{"operator": "|1><1|_2", "applyFrom": "_left",
               "applyBefore": "false"},
              {"operator": "|1><1|_2", "applyFrom": "_right",
               "applyBefore": "false"}]
    t1 = np.round(np.arange(1.0, 4.0, 0.5), 6)
    times = np.stack([t1, t1], axis=1)
    gather = times + 1.0
    ref_a = branched.batched_mto_runs(task, mtos_a, times, gather, ["|1><1|_2"])
    ref_b = branched.batched_mto_runs(task, mtos_b, times, gather, ["|1><1|_2"])
    sa = np.stack([mto_superop(m) for m in mtos_a])
    sb = np.stack([mto_superop(m) for m in mtos_b])
    sops_b = np.concatenate([np.broadcast_to(sa, (len(t1),) + sa.shape),
                             np.broadcast_to(sb, (len(t1),) + sb.shape)])
    outs = branched.batched_mto_runs(
        task, mtos_a, np.concatenate([times, times]),
        np.concatenate([gather, gather]), ["|1><1|_2"],
        mto_sops_batch=sops_b)
    assert np.allclose(outs[:len(t1)], ref_a, atol=1e-13)
    assert np.allclose(outs[len(t1):], ref_b, atol=1e-13)


def test_batched_dynmap_runs_vs_calc_dynmap():
    p = Pulse(tau=1.5, e_start=0, w_gain=0, t0=3.0, e0=1.2)
    t_end = 8.0
    task = _task(t_end)
    mtos = _mtos()
    t_ins = np.array([2.0, 3.5])
    times = np.stack([t_ins, t_ins], axis=1)
    dms = branched.batched_dynmap_runs(task, mtos, times)
    for row, ti in enumerate(t_ins):
        for m in mtos:
            m["time"] = ti
        _, dm_ref = tls(0, t_end, p, dt=DT, gamma_e=0.1, lindblad=True,
                        phonons=False, multitime_op=list(mtos),
                        calc_dynmap=True, output_ops=["|1><1|_2"])
        assert np.max(np.abs(dms[row] - np.asarray(dm_ref))) < 1e-12


def test_mesh_sharded_lanes_match_single_device():
    import jax
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs the virtual multi-device CPU mesh")
    task = _task()
    mtos = _mtos()
    t1 = np.round(np.arange(1.0, 5.0, 0.5), 6)   # 8 lanes, not a multiple pad
    times = np.stack([t1, t1], axis=1)
    gather = times + 1.0
    ref = branched.batched_mto_runs(task, mtos, times, gather, ["|1><1|_2"])
    mesh = default_mesh(min(8, len(jax.devices())))
    got = branched.batched_mto_runs(task, mtos, times, gather, ["|1><1|_2"],
                                    mesh=mesh)
    assert got.shape == ref.shape
    assert np.allclose(got, ref, atol=0)         # bitwise
