"""Phonon-aware time-local three-operator two-time correlations.

Re-implements /root/reference/pyaceqd/two_time/correlations.py:866-1010
(tl_three_op_two_time_phonons) and :1013-1190 (tl_threeoptwotime_phonons_dm)
with batched device kernels: the reference propagates every (t, tau) lane in
a Python loop over extracted dynamical maps; here the branch lanes run as one
vmapped lax.scan (engine.dynmap.block_branches) and the trunk is a single
map-chain scan.

Method (same as the reference): with phonons, the dynamical map within one
memory time of an operator insertion is history-dependent; beyond it the map
is time-local (stationary).  So:

- one reference run with the sandwich insertion C . rho . A placed at
  t_ref = 1.2 t_mem yields the initial transient block, the stationary
  background map, the post-insertion transient block, and the stationary
  post-insertion map;
- insertions at t < t_mem interact with the initial transient, so their
  post-insertion blocks are computed per t;
- G(t, tau) then needs only map-chain algebra.
"""

import numpy as np

from pyaceqd_tpu.engine import dynmap
from pyaceqd_tpu.ops.superop import trace_vector
from pyaceqd_tpu.tools import calc_tl_dynmap_pseudo, extract_dms, op_to_matrix


def _sandwich_mtos(opA, opC, t):
    return [{"operator": opC, "applyFrom": "_left", "applyBefore": "false",
             "time": t},
            {"operator": opA, "applyFrom": "_right", "applyBefore": "false",
             "time": t}]


def _reference_blocks(system, pulses, t_mem, dt, rho0, options, opA, opC):
    """One run with the insertion at t_ref = 1.2 t_mem: returns the initial
    transient maps, stationary map, post-insertion block, stationary
    post-insertion map."""
    t_ref = np.round(round(1.2 * t_mem / dt) * dt, 6)  # grid-aligned
    result, dm = system(0, 4 * t_mem, *pulses, dt=dt, rho0=rho0,
                        multitime_op=_sandwich_mtos(opA, opC, t_ref),
                        calc_dynmap=True, **options)
    _t = np.round(np.asarray(result[0]).real, 6)
    dm_tl = calc_tl_dynmap_pseudo(dm, _t)
    tl_map, dms_separated = extract_dms(dm_tl, _t, t_mem, [t_ref])
    tl_map2 = dm_tl[-1]
    return np.asarray(dms_separated[0]), tl_map, \
        np.asarray(dms_separated[1]), tl_map2


def _pad_block(block, fill, n):
    """Pad a (k, d2, d2) map block to n maps with the stationary map."""
    block = np.asarray(block)
    if len(block) >= n:
        return block[:n]
    pad = np.broadcast_to(fill, (n - len(block),) + fill.shape)
    return np.concatenate([block, pad], axis=0)


def tl_three_op_two_time_phonons(system, t_axis, *pulses, t_mem=10,
                                 opA="|1><0|_2", opB="|1><1|_2",
                                 opC="|0><1|_2", tau_max=500, dt=0.1,
                                 rho0=np.array([[1, 0], [0, 0]], dtype=complex),
                                 options={"lindblad": True, "phonons": True},
                                 debug=False):
    """G(t, tau) = <A(t) B(t+tau) C(t)> with phonons via time-local map blocks
    (reference two_time/correlations.py:866-1010)."""
    t_axis = np.round(np.asarray(t_axis, dtype=float), 6)
    if t_axis[0] != 0:
        raise ValueError("t_axis must start at 0.")
    opts = dict(options)
    opts.pop("verbose", None)
    opA_mat, opB_mat, opC_mat = (op_to_matrix(o) for o in (opA, opB, opC))
    dim = len(np.asarray(rho0)[0])
    d2 = dim * dim

    trans0, tl_map, trans1, tl_map2 = _reference_blocks(
        system, pulses, t_mem, dt, rho0, opts, opA, opC)
    n_tauc = len(trans0)

    # per-t post-insertion blocks for insertions inside the initial
    # transient: ONE batched dynamical-map program over all insertion times
    # (the reference dispatches one ACE run per t here; a per-t
    # calc_dynmap loop costs one compile+dispatch each — NOTES_round1 §5)
    from pyaceqd_tpu.engine import branched
    t_mem_indices = np.where(t_axis < t_mem)[0]
    blocks_tauc = {}
    if len(t_mem_indices):
        t_end_common = float(t_axis[t_mem_indices[-1]] + t_mem + 10 * dt)
        task = system(0, t_end_common, *pulses, dt=dt, rho0=rho0,
                      return_task=True, output_ops=[], **opts)
        times = np.stack([t_axis[t_mem_indices]] * 2, axis=1)
        dms = branched.batched_dynmap_runs(
            task, _sandwich_mtos(opA, opC, 0.0), times)
        _t = np.round(np.asarray(task.t).real, 6)
        for row, i in enumerate(t_mem_indices):
            dm_tl = calc_tl_dynmap_pseudo(dms[row], _t)
            _, _dms = extract_dms(dm_tl, _t, t_mem, [t_axis[i]])
            blocks_tauc[i] = _pad_block(_dms[1], tl_map2, n_tauc)

    # trunk: rho(t) for every t on t_axis via one map chain
    k1s = np.round(t_axis / dt).astype(np.int32)
    n_trunk = int(k1s[-1])
    maps_trunk = np.empty((max(n_trunk, 1), d2, d2), dtype=complex)
    for j in range(max(n_trunk, 1)):
        maps_trunk[j] = trans0[j] if j < n_tauc - 1 else tl_map
    traj = np.asarray(dynmap.propagate_maps(maps_trunk, rho0.reshape(-1)))
    rho_t1s = traj[k1s]                                     # (B, d2)

    # G(t, 0) = tr(A B C rho(t))
    ABC = opA_mat @ opB_mat @ opC_mat
    w_abc = trace_vector(ABC)
    n_tau = int(tau_max / dt)
    tau = np.linspace(0, tau_max, n_tau + 1)
    G = np.zeros((len(t_axis), n_tau + 1), dtype=complex)
    G[:, 0] = rho_t1s @ w_abc

    # branches: per-t block then the stationary post-insertion map
    blocks = np.stack([blocks_tauc[i] if i in blocks_tauc else trans1
                       for i in range(len(t_axis))])        # (B, n_tauc, d2, d2)
    states = np.asarray(dynmap.block_branches(
        blocks, tl_map2, rho_t1s, n_tau, n_tauc))           # (B, n_tau, d2)
    G[:, 1:] = states @ trace_vector(opB_mat)
    return t_axis, tau, G


def tl_threeoptwotime_phonons_dm(system, t_axis, *pulses, t_mem=10,
                                 opA="|1><0|_2", opB="|1><1|_2",
                                 opC="|0><1|_2", tau_max=500, dt=0.1,
                                 rho0=np.array([[1, 0], [0, 0]], dtype=complex),
                                 options={"lindblad": True, "phonons": True},
                                 debug=False):
    """Variant using the raw (non-time-local) dynamical maps of the per-t runs
    for the within-memory rows t <= t_mem (reference
    two_time/correlations.py:1013-1190; rows with t > t_mem are zero there
    too — use tl_three_op_two_time_phonons for the full grid)."""
    t_axis = np.round(np.asarray(t_axis, dtype=float), 6)
    if t_axis[0] != 0:
        raise ValueError("t_axis must start at 0.")
    opts = dict(options)
    opA_mat, opB_mat, opC_mat = (op_to_matrix(o) for o in (opA, opB, opC))
    dim = len(np.asarray(rho0)[0])

    _, _, _, tl_map2 = _reference_blocks(system, pulses, t_mem, dt, rho0,
                                         opts, opA, opC)
    n_tau = int(tau_max / dt)
    tau = np.linspace(0, tau_max, n_tau + 1)
    G = np.zeros((len(t_axis), n_tau + 1), dtype=complex)
    w_abc = trace_vector(opA_mat @ opB_mat @ opC_mat)
    w_b = trace_vector(opB_mat)
    rho0_vec = np.asarray(rho0).reshape(-1)

    from pyaceqd_tpu.engine import branched
    t_mem_indices = np.where(t_axis <= t_mem)[0]
    rho_t1s, blocks = [], []
    n_tail = int(np.round(t_mem / dt))
    if len(t_mem_indices):
        # one batched dynamical-map program over all insertion times (was a
        # per-t calc_dynmap dispatch loop — NOTES_round1 §5); raw maps act
        # on rho0, so tr(B . dm[j] rho0) is read directly per lane
        t_end_common = float(t_axis[t_mem_indices[-1]] + t_mem)
        task = system(0, t_end_common, *pulses, dt=dt, rho0=rho0,
                      return_task=True, output_ops=[], **opts)
        times = np.stack([t_axis[t_mem_indices]] * 2, axis=1)
        dms = branched.batched_dynmap_runs(
            task, _sandwich_mtos(opA, opC, 0.0), times)
        for row, i in enumerate(t_mem_indices):
            dm = np.asarray(dms[row])
            n_steps = int(np.round(t_axis[i] / dt, 6))
            rho_t1s.append(dm[n_steps - 1] @ rho0_vec if n_steps > 0
                           else rho0_vec)
            blocks.append(dm[n_steps:n_steps + n_tail])

    for row, i in enumerate(t_mem_indices):
        rho_t = rho_t1s[row]
        G[i, 0] = w_abc @ rho_t
        dm_tail = blocks[row]
        n_map = len(dm_tail)
        vals = (dm_tail @ rho0_vec) @ w_b
        m = min(n_map, n_tau)
        G[i, 1:m + 1] = vals[:m]
        rho_last = dm_tail[-1] @ rho0_vec if n_map else rho_t
        for j in range(n_map, n_tau):
            rho_last = tl_map2 @ rho_last
            G[i, j + 1] = w_b @ rho_last
    return t_axis, tau, G
