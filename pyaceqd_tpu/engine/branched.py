"""Batched multi-time branch propagation: trunk + vmapped branches.

This module replaces the reference's correlation fan-out
(ThreadPoolExecutor over t1 grid points, one full ACE subprocess per point,
/root/reference/pyaceqd/two_time/correlations.py:135-184) with the
quantum-regression-theorem structure made explicit on device:

  1. ``trunk``: one scan propagates rho(t) over the full grid, storing the
     trajectory (and, with phonons, the PT bond state).
  2. ``branches``: for every insertion time t1 (a *traced* grid index), apply
     the multi-time operators to rho(t1) and propagate n_tau further steps.
     All branches run as ONE vmapped scan — the step unitaries U are shared
     and each branch reads its window U[k1:k1+n_tau] by dynamic slice.

Total work is n + B*n_tau steps (the same as the reference's optimized
Fortran path, propagate_tau.f90:110-187) but executed as a single batched
device program: the B-axis is the vectorization axis that maps onto the
VPU/MXU lanes, and — for sweeps — onto the device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pyaceqd_tpu import config
from pyaceqd_tpu.engine.simulate import Task, mto_superop
from pyaceqd_tpu.utils.cplx import hostsafe
from pyaceqd_tpu.ops import superop
from pyaceqd_tpu.ops.dsl import parse_operator


def _sys_step(rho, Uk, E_half, d, has_diss):
    if has_diss:
        rho = E_half @ rho
    rho = superop.vpu_sandwich(rho.reshape(d, d), Uk).reshape(d * d)
    if has_diss:
        rho = E_half @ rho
    return rho


@hostsafe(static_argnames=("has_diss",))
def trunk_trajectory(U, E_half, rho0_vec, has_diss=True):
    """Propagate the full grid once, returning rho at every grid point.

    Returns (n+1, d^2): row k is vec(rho(t_k))."""
    d = U.shape[1]

    def body(rho, Uk):
        rho_next = _sys_step(rho, Uk, E_half, d, has_diss)
        return rho_next, rho_next

    _, traj = jax.lax.scan(body, rho0_vec, U)
    return jnp.concatenate([rho0_vec[None], traj], axis=0)


@hostsafe(static_argnames=("n_tau", "has_diss"))
def branch_outputs(U, E_half, rho_traj, t1_ks, S_branch, W_tau, W_zero,
                   n_tau, has_diss=True):
    """Vmapped branch propagation.

    Args:
      U: (n, d, d) step unitaries covering max(t1) + n_tau steps.
      rho_traj: (n+1, d^2) trunk trajectory.
      t1_ks: (B,) int32 grid indices of the insertion times.
      S_branch: (d^2, d^2) composed branch-MTO superoperator (applied at t1,
        AFTER the t1 output, matching ACE applyBefore=false).
      W_tau: (m, d^2) output weights read at t1+dt ... t1+n_tau*dt.
      W_zero: (m0, d^2) weights for the tau=0 column, read at t1 (pre-MTO) —
        the reference's extra product output operator
        (correlations.py:87,130: "tau=0 has to be extracted separately").

    Returns:
      G0: (B, m0) tau=0 values; Gtau: (B, n_tau, m) branch outputs.
    """
    d = U.shape[1]

    def one_branch(k):
        zero = jnp.zeros((), dtype=k.dtype)
        rho_b = S_branch @ rho_traj[k]
        U_win = jax.lax.dynamic_slice(U, (k, zero, zero), (n_tau, d, d))

        def body(rho, Uk):
            rho = _sys_step(rho, Uk, E_half, d, has_diss)
            return rho, W_tau @ rho

        _, ys = jax.lax.scan(body, rho_b, U_win)
        return ys

    Gtau = jax.vmap(one_branch)(t1_ks)
    G0 = rho_traj[t1_ks] @ W_zero.T
    return G0, Gtau


@hostsafe(static_argnames=("mto_before", "has_diss", "per_lane_sops"))
def _vmapped_runs_pt_core(stack, caps, g_of_s, U, E_half, rho0_vec, W,
                          mto_sops, mto_ks_batch, gather_ks, mto_before=(),
                          has_diss=True, per_lane_sops=False):
    """Phonon twin of _vmapped_runs_core: every lane carries the PT bond
    state A (chi, d^2) through the full chain, with its own MTO indices.
    With per_lane_sops, mto_sops is (B, n_mto, d2, d2) and each lane applies
    its own operator set (one program serves runs with different operators —
    the reference re-runs ACE per operator set, pol_entanglement/G2.py:439)."""
    d = U.shape[1]
    d2 = d * d
    n = U.shape[0]
    chi = stack.shape[1]
    n_mto = len(mto_before)

    def one_run(mks, gks, sops):
        def apply_mtos(A, k, before_phase):
            for i in range(n_mto):
                if mto_before[i] == before_phase:
                    A = jnp.where(k == mks[i], A @ sops[i].T, A)
            return A

        def body(A, xs):
            Uk, Qk, cap_k, k = xs
            A = apply_mtos(A, k, True)
            y = W @ (cap_k @ A)
            A = apply_mtos(A, k, False)
            if has_diss:
                A = A @ E_half.T
            Am = superop.vpu_sandwich(A.reshape(chi, d, d), Uk)
            A = Am.reshape(chi, d2)
            if has_diss:
                A = A @ E_half.T
            Qs = Qk[:, g_of_s, :]
            return jnp.einsum('asb,as->bs', Qs, A), y

        A0 = jnp.zeros((chi, d2), dtype=rho0_vec.dtype).at[0].set(rho0_vec)
        ks = jnp.arange(n, dtype=jnp.int32)
        A_f, ys = jax.lax.scan(body, A0, (U, stack, caps[:-1], ks))
        A_f = apply_mtos(A_f, jnp.int32(n), True)
        outputs = jnp.concatenate([ys, (W @ (caps[-1] @ A_f))[None]], axis=0)
        return outputs[gks]

    return jax.vmap(one_run, in_axes=(0, 0, 0 if per_lane_sops else None))(
        mto_ks_batch, gather_ks, mto_sops)


@hostsafe(static_argnames=("mto_before", "has_diss", "per_lane_sops"))
def _vmapped_runs_core(U, E_half, rho0_vec, W, mto_sops, mto_ks_batch,
                       gather_ks, mto_before=(), has_diss=True,
                       per_lane_sops=False):
    d = U.shape[1]
    d2 = d * d
    n = U.shape[0]
    n_mto = len(mto_before)

    def one_run(mks, gks, sops):
        def apply_mtos(rho, k, before_phase):
            for i in range(n_mto):
                if mto_before[i] == before_phase:
                    rho = jnp.where(k == mks[i], sops[i] @ rho, rho)
            return rho

        def body(rho, xs):
            Uk, k = xs
            rho = apply_mtos(rho, k, True)
            y = W @ rho
            rho = apply_mtos(rho, k, False)
            rho = _sys_step(rho, Uk, E_half, d, has_diss)
            return rho, y

        ks = jnp.arange(n, dtype=jnp.int32)
        rho_f, ys = jax.lax.scan(body, rho0_vec, (U, ks))
        rho_f = apply_mtos(rho_f, jnp.int32(n), True)
        outputs = jnp.concatenate([ys, (W @ rho_f)[None]], axis=0)
        return outputs[gks]

    return jax.vmap(one_run, in_axes=(0, 0, 0 if per_lane_sops else None))(
        mto_ks_batch, gather_ks, mto_sops)


def batched_mto_runs(task: Task, mtos, mto_times, gather_times, output_ops,
                     chunk=512, mesh=None, mto_sops_batch=None):
    """Fully general multi-time-operator fan-out: B independent runs that
    share the trunk setup but differ in their MTO insertion times, vmapped.

    This is the engine behind the reference's nested-loop correlators with
    several movable insertion times (e.g. the timebin three-MTO four-time
    functions, four_level_system/dark_model.py:260-361, timebin/twophoton.py):
    every (t1, t2, t3) combination is one vmapped lane instead of one ACE
    subprocess.

    Args:
      mtos: list of MTO dicts (applyFrom/applyBefore; "time" ignored).
      mto_times: (B, n_mto) absolute times per run.
      gather_times: (B, m) absolute times at which outputs are collected.
      output_ops: operator strings/matrices for the output rows.
      mesh: optional jax.sharding.Mesh — lanes are sharded over its 'batch'
        axis (the multi-chip twin of the reference's ``workers=N`` ThreadPool
        at two_time/correlations.py:152-170); results are identical to the
        single-device path.
      mto_sops_batch: optional (B, n_mto, d2, d2) per-lane event
        superoperators overriding the shared ones parsed from ``mtos``
        (one program serves runs with different operator sets).
    Returns (B, m, n_out) complex.
    """
    from pyaceqd_tpu.ops.dsl import parse_operator
    cdt = config.cdtype()
    d = task.dim
    per_lane = mto_sops_batch is not None
    if per_lane:
        sops_all = np.asarray(mto_sops_batch).astype(cdt)
    else:
        sops_all = np.stack([mto_superop(m) for m in mtos]).astype(cdt)
    before = tuple(str(m.get("applyBefore", "false")).lower() == "true" for m in mtos)
    W = np.stack([superop.trace_vector(parse_operator(o) if isinstance(o, str) else o)
                  for o in output_ops]).astype(cdt)
    T = task.basis_sop
    if T is not None:
        # non-diagonal boson coupling: task.U/E_half/rho0_vec live in the
        # coupling eigenbasis (simulate.py); conjugate the lab-basis event
        # superops and output weights to match
        sops_all = np.einsum('ij,...jk,kl->...il', T, sops_all,
                             T.conj().T).astype(cdt)
        W = (W @ T.conj().T).astype(cdt)
    mto_ks = np.asarray(task.k_of(mto_times), dtype=np.int32).reshape(len(mto_times), len(mtos))
    gather_ks = np.asarray(task.k_of(gather_times), dtype=np.int32)
    B = mto_ks.shape[0]
    n_valid_total = B
    if mesh is not None:
        from pyaceqd_tpu.parallel import mesh as mesh_util
        M = int(mesh.devices.size)
        chunk = max(M, (chunk // M) * M)
        mto_ks, _ = mesh_util.pad_to_multiple(mto_ks, chunk)
        gather_ks, _ = mesh_util.pad_to_multiple(gather_ks, chunk)
        if per_lane:
            sops_all, _ = mesh_util.pad_to_multiple(sops_all, chunk)
        B = mto_ks.shape[0]

        def _place(x):
            return mesh_util.shard_batch(x, mesh)
    else:
        def _place(x):
            return x
    out = []
    for lo in range(0, B, chunk):
        hi = min(B, lo + chunk)
        mk_c, gk_c = _place(mto_ks[lo:hi]), _place(gather_ks[lo:hi])
        sops = _place(sops_all[lo:hi]) if per_lane else sops_all
        if task.pt is not None:
            pt = task.pt.prefix(task.U.shape[0] if hasattr(task.U, "shape")
                                else len(task.t) - 1)
            if hasattr(pt, "bulk"):   # StationaryPT lanes
                from pyaceqd_tpu.engine import ptinf
                out.append(np.asarray(ptinf.vmapped_runs(
                    pt, task.U, task.E_half, task.rho0_vec, W, sops,
                    mk_c, gk_c, mto_before=before,
                    has_diss=task.has_diss, per_lane_sops=per_lane)))
                continue
            out.append(np.asarray(_vmapped_runs_pt_core(
                pt.stack.astype(cdt), pt.caps.astype(cdt),
                np.asarray(pt.g_of_s, dtype=np.int32), task.U, task.E_half,
                task.rho0_vec, W, sops, mk_c, gk_c,
                mto_before=before, has_diss=task.has_diss,
                per_lane_sops=per_lane)))
        else:
            out.append(np.asarray(_vmapped_runs_core(
                task.U, task.E_half, task.rho0_vec, W, sops, mk_c,
                gk_c, mto_before=before, has_diss=task.has_diss,
                per_lane_sops=per_lane)))
    return np.concatenate(out, axis=0)[:n_valid_total]


def compose_branch_superop(mtos, dim):
    """Compose branch multi-time operators in parameter-file order: the first
    listed is applied first (ACE equal-time semantics, see
    /root/reference/pyaceqd/timebin/twophoton.py:346-363 discussion)."""
    S = np.eye(dim * dim, dtype=np.complex128)
    for m in mtos:
        S = mto_superop(m) @ S
    return S


def correlation_2d(task: Task, t_axis, branch_mtos, output_op, zero_op,
                   tau_max, trunk_mtos=(), mesh=None):
    """G(t1, tau) for generic operator insertions at t1 (QRT fan-out).

    Drop-in engine for the reference's _ops_two_time
    (correlations.py:135-184): branch_mtos are applied at each t1 (times in
    the dicts are ignored), output_op is read along tau, zero_op gives the
    tau=0 column.  trunk_mtos (fixed absolute times) are applied on the trunk,
    enabling five_op_two_time-style correlators.

    Returns (t1, tau, G) with G complex (len(t1), n_tau+1).
    """
    dt = task.dt
    d = task.dim
    cdt = config.cdtype()
    n_tau = int(round(tau_max / dt))
    tau = np.linspace(0, tau_max, n_tau + 1)
    t1_ks = task.k_of(t_axis)
    if np.max(t1_ks) + n_tau > len(task.t) - 1:
        raise ValueError(
            "Task grid too short: needs t_end >= max(t_axis) + tau_max "
            f"({task.t[-1]} < {np.max(np.asarray(t_axis)) + tau_max})")

    if task.pt is not None:
        # phonons: the branch cannot be windowed out of the PT chain (the
        # environment is history-correlated), so every t1 is one full-chain
        # lane with the insertions at t1 — the exact structure of the
        # reference's ACE fan-out, vmapped.
        B = len(t1_ks)
        all_mtos = list(branch_mtos) + list(trunk_mtos)
        times = np.empty((B, len(all_mtos)))
        times[:, :len(branch_mtos)] = np.asarray(t_axis)[:, None]
        for j, m in enumerate(trunk_mtos):
            times[:, len(branch_mtos) + j] = m["time"]
        gather = (np.asarray(t1_ks)[:, None] + np.arange(n_tau + 1)[None]) * dt \
            + task.t[0]
        outs = batched_mto_runs(task, all_mtos, times, gather,
                                [zero_op, output_op], mesh=mesh)
        G = np.empty((B, n_tau + 1), dtype=complex)
        G[:, 0] = outs[:, 0, 0]      # zero_op at t1 (pre-insertion readout)
        G[:, 1:] = outs[:, 1:, 1]    # output_op along tau
        return np.asarray(t_axis), tau, G

    # trunk with fixed-time MTOs folded in
    if trunk_mtos:
        from pyaceqd_tpu.engine import propagator
        sops = np.stack([mto_superop(m) for m in trunk_mtos]).astype(cdt)
        ks = task.k_of([m["time"] for m in trunk_mtos])
        before = tuple(str(m.get("applyBefore", "false")).lower() == "true" for m in trunk_mtos)
        # reuse propagate with identity outputs to collect the trajectory
        eye_W = np.eye(d * d, dtype=cdt)
        outputs, _ = propagator.propagate(
            task.U, task.E_half, task.rho0_vec, eye_W, sops, ks,
            mto_before=before, mto_mode=tuple(m["applyFrom"] for m in trunk_mtos),
            collect_E=False, has_diss=task.has_diss)
        rho_traj = outputs  # (n+1, d^2); W=identity so outputs == rho, but the
        # k-th row is PRE-mto at step k; branch start must be post-trunk-mto.
        # propagate() outputs pre-(applyBefore=false)-MTO values; rebuild the
        # post-MTO trajectory by reapplying at the fixed indices:
        rho_traj = np.array(rho_traj)
        for m in trunk_mtos:
            if str(m.get("applyBefore", "false")).lower() == "true":
                continue
            k = int(task.k_of(m["time"]))
            S = mto_superop(m)
            rho_traj[k] = S @ rho_traj[k]
        rho_traj = rho_traj.astype(cdt)
    else:
        rho_traj = trunk_trajectory(task.U, task.E_half, task.rho0_vec,
                                    has_diss=task.has_diss)

    S_branch = compose_branch_superop(branch_mtos, d).astype(cdt)
    O_tau = output_op if not isinstance(output_op, str) else parse_operator(output_op)
    O_zero = zero_op if not isinstance(zero_op, str) else parse_operator(zero_op)
    W_tau = superop.trace_vector(O_tau)[None].astype(cdt)
    W_zero = superop.trace_vector(O_zero)[None].astype(cdt)

    G0, Gtau = branch_outputs(task.U, task.E_half, rho_traj,
                              np.asarray(t1_ks, dtype=np.int32), S_branch, W_tau,
                              W_zero, n_tau, has_diss=task.has_diss)
    G = np.empty((len(t1_ks), n_tau + 1), dtype=complex)
    G[:, 0] = np.asarray(G0)[:, 0]
    G[:, 1:] = np.asarray(Gtau)[:, :, 0]
    return np.asarray(t_axis), tau, G


# ---------------------------------------------------------------------------
# batched dynamical-map collection (kills the per-t calc_dynmap dispatch loop
# of the reference's phonon tl paths, two_time/correlations.py:1013-1190)
# ---------------------------------------------------------------------------

@hostsafe(static_argnames=("mto_before", "has_diss"))
def _vmapped_dynmaps_core(U, E_half, W_eye, mto_sops, mto_ks_batch,
                          mto_before=(), has_diss=True):
    # plain (no-phonon) path: accumulate the map directly per lane, matching
    # propagator.propagate's collect_E semantics (both event phases fire)
    n = U.shape[0]
    d = U.shape[1]
    d2 = d * d
    n_mto = len(mto_before)

    def one_lane(mks):
        def apply_mtos_E(E, k, before_phase):
            for i in range(n_mto):
                if mto_before[i] == before_phase:
                    E = jnp.where(k == mks[i], mto_sops[i] @ E, E)
            return E

        def sys_step_E(E, Uk):  # noqa: E306
            if has_diss:
                E = E_half @ E
            E3 = E.reshape(d, d, d2)
            E3 = jnp.einsum('ik,jl,klm->ijm', Uk, jnp.conj(Uk), E3)
            E = E3.reshape(d2, d2)
            if has_diss:
                E = E_half @ E
            return E

        def body(E, xs):
            Uk, k = xs
            E = apply_mtos_E(E, k, True)
            E = apply_mtos_E(E, k, False)
            E = sys_step_E(E, Uk)
            return E, E

        ks = jnp.arange(n, dtype=jnp.int32)
        E0 = jnp.eye(d2, dtype=U.dtype)
        _, Es = jax.lax.scan(body, E0, (U, ks))
        return Es

    return jax.vmap(one_lane)(mto_ks_batch)


@hostsafe(static_argnames=("mto_before", "has_diss"))
def _vmapped_dynmaps_pt_core(stack, caps, g_of_s, U, E_half, W_eye, mto_sops,
                             mto_ks_batch, mto_before=(), has_diss=True):
    from pyaceqd_tpu.engine.ptmpo import _pt_dynmaps_core

    def one(mks):
        maps = _pt_dynmaps_core.__wrapped__(
            stack, caps, g_of_s, U, E_half, W_eye, mto_sops, mks,
            mto_before=mto_before, mto_mode=(), has_diss=has_diss)
        return maps[1:]

    return jax.vmap(one)(mto_ks_batch)


@hostsafe(static_argnames=("mto_before", "has_diss"))
def _vmapped_dynmaps_ptinf_core(init_stack, init_caps, bulk, cap_bulk,
                                g_of_s, U, E_half, W_eye, mto_sops,
                                mto_ks_batch, mto_before=(), has_diss=True):
    from pyaceqd_tpu.engine.ptinf import _ptinf_dynmaps_core

    def one(mks):
        maps = _ptinf_dynmaps_core.__wrapped__(
            init_stack, init_caps, bulk, cap_bulk, g_of_s, U, E_half, W_eye,
            mto_sops, mks, mto_before=mto_before, mto_mode=(),
            has_diss=has_diss)
        return maps[1:]

    return jax.vmap(one)(mto_ks_batch)


def batched_dynmap_runs(task: Task, mtos, mto_times, chunk=32):
    """Accumulated dynamical maps E(t_m, t_0), m=1..n, for B lanes that
    differ only in their MTO insertion times — ONE compiled program instead
    of B sequential simulate(calc_dynmap=True) dispatches (the reference
    fans these out as ACE subprocesses, two_time/purity.py:475-511).

    Returns (B, n, d^2, d^2), each row matching what
    simulate(..., calc_dynmap=True) returns as its dm."""
    cdt = config.cdtype()
    sops = np.stack([mto_superop(m) for m in mtos]).astype(cdt)
    before = tuple(str(m.get("applyBefore", "false")).lower() == "true"
                   for m in mtos)
    mto_ks = np.asarray(task.k_of(mto_times), dtype=np.int32).reshape(
        len(mto_times), len(mtos))
    d2 = task.dim * task.dim
    W_eye = np.eye(d2, dtype=cdt)
    T = task.basis_sop
    if T is not None:
        sops = np.einsum('ij,njk,kl->nil', T, sops, T.conj().T).astype(cdt)
    B = mto_ks.shape[0]
    out = []
    for lo in range(0, B, chunk):
        hi = min(B, lo + chunk)
        mk = mto_ks[lo:hi]
        if task.pt is not None:
            n_run = (task.U.shape[0] if hasattr(task.U, "shape")
                     else len(task.t) - 1)
            pt = task.pt.prefix(n_run)
            if hasattr(pt, "bulk") and n_run < pt.n_init:
                # run shorter than the initial segment: use the stacked core
                # on the materialized prefix
                pt = pt.materialize(n_run)
            if hasattr(pt, "bulk"):
                out.append(np.asarray(_vmapped_dynmaps_ptinf_core(
                    pt.init_stack.astype(cdt), pt.init_caps.astype(cdt),
                    pt.bulk.astype(cdt), pt.cap_bulk.astype(cdt),
                    np.asarray(pt.g_of_s, dtype=np.int32), task.U,
                    task.E_half, W_eye, sops, mk, mto_before=before,
                    has_diss=task.has_diss)))
            else:
                out.append(np.asarray(_vmapped_dynmaps_pt_core(
                    pt.stack.astype(cdt), pt.caps.astype(cdt),
                    np.asarray(pt.g_of_s, dtype=np.int32), task.U,
                    task.E_half, W_eye, sops, mk, mto_before=before,
                    has_diss=task.has_diss)))
        else:
            out.append(np.asarray(_vmapped_dynmaps_core(
                task.U, task.E_half, W_eye, sops, mk, mto_before=before,
                has_diss=task.has_diss)))
    maps = np.concatenate(out, axis=0)
    if T is not None:
        # dynamical maps back to the lab basis: E_lab = T^dagger E_rot T
        maps = np.einsum('ij,bnjk,kl->bnil', T.conj().T, maps, T)
    return maps


# ---------------------------------------------------------------------------
# windowed PT segments (phonon-correct time-bin tl fast path)
# ---------------------------------------------------------------------------

@hostsafe(static_argnames=("mto_before", "has_diss", "L"))
def _vmapped_window_pt_core(stack, caps, g_of_s, U_full, E_half, rho0_batch,
                            s0_batch, W, mto_sops, mto_ks_batch, gather_ks,
                            mto_before=(), has_diss=True, L=0):
    """Per-lane WINDOWED PT propagation.

    Every lane slices its own L-step window of the full background unitary
    sequence at offset ``s0``, starts from a FACTORIZED bath at its own
    system state ``rho0`` and runs the PT chain from the PT's OWN step 0 —
    a factorized-bath restart whose initial slip is the PT's own dressing
    transient, decayed within t_mem.  Placing every restart and environment
    closure at least one memory time away from any operator insertion is
    what makes the time-bin tl fast path phonon-correct (the reference's tl
    path extracts time-local maps and warns it "will give wrong results"
    with phonons, /root/reference/pyaceqd/timebin/twophoton_new.py:568-577;
    see timebin/twophoton_new.py::eightops_phonon).

    mto_ks_batch / gather_ks are WINDOW-RELATIVE step indices; outputs row g
    is W @ (caps-closed state) gathered pre-event at index gather_ks[g]
    (index L = after the full window).  Returns (B, g, n_out)."""
    d = U_full.shape[1]
    d2 = d * d
    chi = stack.shape[1]
    n_mto = len(mto_before)

    def one_run(rho0_vec, s0, mks, gks):
        zero = jnp.zeros((), dtype=s0.dtype)
        Uw = jax.lax.dynamic_slice(U_full, (s0, zero, zero), (L, d, d))

        def apply_mtos(A, k, before_phase):
            for i in range(n_mto):
                if mto_before[i] == before_phase:
                    A = jnp.where(k == mks[i], A @ mto_sops[i].T, A)
            return A

        def body(A, xs):
            Uk, Qk, cap_k, k = xs
            A = apply_mtos(A, k, True)
            y = W @ (cap_k @ A)
            A = apply_mtos(A, k, False)
            if has_diss:
                A = A @ E_half.T
            Am = superop.vpu_sandwich(A.reshape(chi, d, d), Uk)
            A = Am.reshape(chi, d2)
            if has_diss:
                A = A @ E_half.T
            Qs = Qk[:, g_of_s, :]
            return jnp.einsum('asb,as->bs', Qs, A), y

        A0 = jnp.zeros((chi, d2), dtype=rho0_vec.dtype).at[0].set(rho0_vec)
        ks = jnp.arange(L, dtype=jnp.int32)
        A_f, ys = jax.lax.scan(body, A0, (Uw, stack, caps[:-1], ks))
        A_f = apply_mtos(A_f, jnp.int32(L), True)
        outputs = jnp.concatenate([ys, (W @ (caps[-1] @ A_f))[None]], axis=0)
        return outputs[gks]

    return jax.vmap(one_run)(rho0_batch, s0_batch, mto_ks_batch, gather_ks)


def windowed_pt_runs(task: Task, sops, before, rho0_batch, s0_batch,
                     mto_ks_rel, gather_rel, L, chunk=1024):
    """Host wrapper for _vmapped_window_pt_core: clamps window offsets into
    the task horizon (beyond the computed pulse region the background is
    time-invariant, so a clamped window is exactly equivalent), materializes
    the PT prefix of length L, rotates through a coupling eigenbasis when
    present, and returns the caps-closed rho vectors (B, g, d2) in the LAB
    basis."""
    cdt = config.cdtype()
    d2 = task.dim * task.dim
    n_full = task.U.shape[0] if hasattr(task.U, "shape") else len(task.t) - 1
    if L > n_full:
        raise ValueError(f"window L={L} exceeds the task horizon {n_full}")
    pt = task.pt
    if pt is None:
        raise ValueError("windowed_pt_runs requires a phonon task")
    fin = pt.materialize(L) if hasattr(pt, "bulk") else pt.prefix(L)
    sops = np.asarray(sops, dtype=cdt)
    rho0_batch = np.asarray(rho0_batch, dtype=cdt)
    W = np.eye(d2, dtype=cdt)
    T = task.basis_sop
    if T is not None:
        sops = np.einsum('ij,njk,kl->nil', T, sops, T.conj().T).astype(cdt)
        rho0_batch = rho0_batch @ np.asarray(T, dtype=cdt).T
        W = np.asarray(T, dtype=cdt).conj().T
    s0_req = np.asarray(s0_batch, dtype=np.int32)
    s0 = np.minimum(s0_req, n_full - L)
    if np.any(s0 != s0_req):
        # The clamp shifts the window left while the callers' window-relative
        # mto_ks / gather indices stay fixed, so it is ONLY exact when the
        # background step unitaries are time-invariant over the union of the
        # requested and clamped spans [min(s0), n_full).  Verify instead of
        # assuming (ADVICE r4): a clamp landing on a pulse region must fail
        # loudly, not produce silently wrong correlators.
        lo = int(np.min(s0[s0 != s0_req]))
        Uh = np.asarray(task.U[lo:])
        drift = float(np.max(np.abs(Uh - Uh[-1]))) if len(Uh) else 0.0
        if drift > 1e-12:
            raise ValueError(
                f"windowed_pt_runs: window offset clamp ({int(np.max(s0_req))}"
                f" -> {n_full - L}) lands on a time-DEPENDENT background "
                f"(max|U_k - U_end| = {drift:.2e} over steps [{lo}, {n_full}))"
                f"; the clamped window is not equivalent.  Extend the task "
                f"horizon or move the insertion times.")
    mk = np.asarray(mto_ks_rel, dtype=np.int32)
    gk = np.asarray(gather_rel, dtype=np.int32)
    B = mk.shape[0]
    # pad the batch to a chunk multiple so every device call compiles at ONE
    # static shape per window length (callers issue many ragged batches)
    chunk = min(chunk, 1 << (B - 1).bit_length())
    pad = (-B) % chunk
    if pad:
        reps = np.concatenate([np.arange(B), np.zeros(pad, dtype=int)])
        rho0_batch, s0, mk, gk = (a[reps] for a in (rho0_batch, s0, mk, gk))
    out = []
    for lo in range(0, B + pad, chunk):
        hi = lo + chunk
        out.append(np.asarray(_vmapped_window_pt_core(
            fin.stack.astype(cdt), fin.caps.astype(cdt),
            np.asarray(fin.g_of_s, dtype=np.int32), task.U, task.E_half,
            rho0_batch[lo:hi], s0[lo:hi], W, sops, mk[lo:hi], gk[lo:hi],
            mto_before=tuple(before), has_diss=task.has_diss, L=int(L))))
    return np.concatenate(out, axis=0)[:B]
