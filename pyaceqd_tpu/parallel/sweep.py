"""Batched pulse-parameter sweeps: the SPMD replacement for the reference's
ThreadPool-of-subprocess sweeps (rabi_rotations.py:172-198,
tpe_rotations.py:196-205, G1.py mollow loops).

One compiled program propagates ALL sweep points: the drive field of each
branch is ``scale * F_unit`` (pulse envelopes are linear in the area), the
per-branch step unitaries come from one batched eigh, and the branch axis
vmaps across VPU lanes on a chip and shards across the mesh over ICI.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pyaceqd_tpu import config
from pyaceqd_tpu.constants import hbar
from pyaceqd_tpu.engine import hamiltonian as ham
from pyaceqd_tpu.engine import propagator
from pyaceqd_tpu.ops import superop
from pyaceqd_tpu.parallel import mesh as mesh_util
from pyaceqd_tpu.utils.cplx import hostsafe


def _mm_small(A, B_):
    """Batched (..., d, d) @ (..., d, d) as broadcast-multiply-reduce (VPU) —
    dot_general on d<=6 matrices wastes the 128-wide MXU tiles."""
    return (A[..., :, :, None] * B_[..., None, :, :]).sum(axis=-2)


def _batched_unitaries(H0, C, F_unit, scales, dt, n_sq):
    """U[n, B, d, d] = expm(-i dt/hbar H) by scaling-and-squaring Taylor.

    Replaces the batched eigh (the TPU sort-based eigh took 1/3 of the sweep
    wall time for 1.2M 4x4 matrices); a Taylor-9 series after n_sq halvings
    is exact to below f32 eps for ||dt H/hbar|| / 2^n_sq <= 0.5 — n_sq is
    chosen host-side from a norm bound in area_sweep."""
    f = scales[:, None, None].astype(F_unit.dtype) * F_unit[None]   # (B, n, c)
    Hk = H0[None, None] + jnp.einsum('Bnc,cij->Bnij', f, C) \
        + jnp.einsum('Bnc,cij->Bnij', jnp.conj(f),
                     jnp.conj(jnp.swapaxes(C, 1, 2)))
    d = H0.shape[0]
    A = jax.lax.complex(jnp.zeros_like(jnp.real(Hk)),
                        -(dt / hbar) * jnp.ones(())).astype(Hk.dtype) * Hk
    A = A / (2.0 ** n_sq)
    eye = jnp.eye(d, dtype=A.dtype)
    U = eye + A / 9.0
    for k in range(8, 0, -1):
        U = eye + _mm_small(A, U) / k
    for _ in range(n_sq):
        U = _mm_small(U, U)
    return jnp.swapaxes(U, 0, 1)                                    # (n, B, d, d)


def _vpu_sandwich(A, Uk):
    """rho' = U rho U^H per (lane, bond-row), as broadcast-multiply-reduce.

    A: (B, r, d, d), Uk: (B, d, d).  dot_general on 4x4 matrices pads the MXU
    32x (measured 2.6x slower than this VPU form on v5e); the elementwise
    broadcast keeps the op on the vector unit."""
    t1 = (Uk[:, None, :, :, None] * A[:, :, None, :, :]).sum(axis=3)
    return (t1[:, :, :, None, :] * jnp.conj(Uk)[:, None, None, :, :]).sum(axis=4)


@hostsafe(static_argnames=("has_diss", "n_sq"))
def _area_sweep_core(H0, C, F_unit, scales, E_half, rho0_vec, W, dt, has_diss,
                     n_sq):
    """outputs[b, k, m] = <W_m>(t_k) for drive field scales[b] * F_unit.

    Batch-explicit layout: the lane axis rides inside every op (one merged
    (B, d2) @ (d2, d2) dissipator matmul, VPU sandwich) instead of vmapping
    tiny per-lane ops — 2.7x on v5e at 4096 lanes."""
    d = H0.shape[0]
    d2 = d * d
    B = scales.shape[0]
    U = _batched_unitaries(H0, C, F_unit, scales, dt, n_sq)

    def body(rho, Uk):
        if has_diss:
            rho = rho @ E_half.T
        rm = _vpu_sandwich(rho.reshape(B, 1, d, d), Uk)
        rho = rm.reshape(B, d2)
        if has_diss:
            rho = rho @ E_half.T
        return rho, rho @ W.T

    rho0_b = jnp.broadcast_to(rho0_vec[None], (B, d2))
    rho_f, ys = jax.lax.scan(body, rho0_b, U)
    y0 = (rho0_b @ W.T)[:, None]
    return jnp.concatenate([y0, jnp.swapaxes(ys, 0, 1)], axis=1)


@hostsafe(static_argnames=("has_diss", "n_sq"))
def _area_sweep_pt_core(stack, caps, g_of_s, H0, C, F_unit, scales, E_half,
                        rho0_vec, W, dt, has_diss, n_sq):
    """Phonon-dressed sweep: every lane runs the PT contraction.

    Batch-explicit like _area_sweep_core; the PT bond contraction is one
    dot_general with the Liouville index batched and K = M = chi (good MXU
    shapes), the U rho U^H sandwich stays on the VPU."""
    d = H0.shape[0]
    d2 = d * d
    chi = stack.shape[1]
    B = scales.shape[0]
    U = _batched_unitaries(H0, C, F_unit, scales, dt, n_sq)
    A0 = jnp.zeros((B, chi, d2), dtype=rho0_vec.dtype).at[:, 0].set(rho0_vec[None])

    def body(A, xs):
        Uk, Qk, cap_k = xs
        y = jnp.einsum('a,Bas,ms->Bm', cap_k, A, W)
        if has_diss:
            A = (A.reshape(B * chi, d2) @ E_half.T).reshape(B, chi, d2)
        Am = _vpu_sandwich(A.reshape(B, chi, d, d), Uk)
        A = Am.reshape(B, chi, d2)
        if has_diss:
            A = (A.reshape(B * chi, d2) @ E_half.T).reshape(B, chi, d2)
        Qs = Qk[:, g_of_s, :]
        return jnp.einsum('asb,Bas->Bbs', Qs, A), y

    A_f, ys = jax.lax.scan(body, A0, (U, stack, caps[:-1]))
    y_last = jnp.einsum('a,Bas,ms->Bm', caps[-1], A_f, W)
    return jnp.concatenate([jnp.swapaxes(ys, 0, 1), y_last[:, None]], axis=1)


@hostsafe(static_argnames=("has_diss", "n_sq"))
def _area_sweep_pt_mxu_core(stack_u, step_idx, caps, g_of_s, H0, C, F_unit,
                            scales, E_half, rho0_vec, W, dt, has_diss, n_sq):
    """MXU-folded phonon sweep: per step, ONE (B, chi*d2) @ (chi*d2, chi*d2)
    matmul applies dissipator-half + PT bond contraction together.

    The shipped PT core's contractions are all K,N <= max(d2, chi) — 16 and
    25 at the bench shapes, a ~4% fill of the 128x128 MXU tile, which caps
    the whole kernel near 1 TFLOP/s (measured, scripts/sweep_layout_exp.py).
    Folding E_half and the s-batched bond contraction into one block-
    structured (chi*d2)^2 matrix trades ~6x redundant FLOPs (the zero blocks)
    for full MXU tiles: K = N = chi*d2 = 400 at the bench shapes.  The folds
    are built ON DEVICE from the same (n, chi, G, chi) stack (no extra host
    transfer), and repeated stationary steps are deduplicated host-side
    (stack_u (u, chi, G, chi) + step_idx (n,)), so fold memory scales with
    the number of DISTINCT steps (init segment + period), not the horizon.

    The lane-dependent U rho U^H sandwich stays on the VPU (folding it would
    need a per-lane, per-step (d2, d2) superoperator — B x n x d2^2 memory).
    Readout folds caps_k and W into one (chi*d2, n_out) matrix per step.
    Semantics identical to _area_sweep_pt_core (parity-tested); selected by
    _prep_sweep for chi*d2 <= _MXU_FOLD_MAX_K."""
    d = H0.shape[0]
    d2 = d * d
    chi = stack_u.shape[1]
    K = chi * d2
    B = scales.shape[0]
    n = step_idx.shape[0]
    U = _batched_unitaries(H0, C, F_unit, scales, dt, n_sq)
    Qs_u = stack_u[:, :, g_of_s, :]                    # (u, chi, d2, chi)
    E = E_half if has_diss else jnp.eye(d2, dtype=stack_u.dtype)
    # M2_u[(a,t),(b,s)] = E[s,t] * Q[a,s,b]: post-sandwich dissipator half
    # then the bond contraction, as one dense matmul
    M2_u = jnp.einsum('st,uasb->uatbs', E, Qs_u).reshape(-1, K, K)
    # R[k] = caps[k] (x) W^T: readout y = A @ R
    R = (caps[:n, :, None, None]
         * jnp.swapaxes(W, 0, 1)[None, None, :, :]).reshape(n, K, -1)
    R_last = (caps[n][:, None, None]
              * jnp.swapaxes(W, 0, 1)[None, :, :]).reshape(K, -1)
    if has_diss:
        M1 = jnp.kron(jnp.eye(chi, dtype=E_half.dtype), jnp.swapaxes(E_half, 0, 1))

    def body(A, xs):
        Uk, ik, Rk = xs
        y = A @ Rk
        if has_diss:
            A = A @ M1
        Am = _vpu_sandwich(A.reshape(B, chi, d, d), Uk)
        A = Am.reshape(B, K) @ M2_u[ik]
        return A, y

    A0 = jnp.zeros((B, chi, d2), dtype=rho0_vec.dtype).at[:, 0].set(
        rho0_vec[None]).reshape(B, K)
    A_f, ys = jax.lax.scan(body, A0, (U, step_idx, R))
    y_last = A_f @ R_last
    return jnp.concatenate([jnp.swapaxes(ys, 0, 1), y_last[:, None]], axis=1)


# fold-size ceiling for the MXU core: u distinct steps cost u * (chi*d2)^2
# complex64 each for M2 (e.g. 1.28 MB at the bench's chi=25, d=4); beyond
# K=1024 the folds' HBM footprint and the 6x block-sparsity waste outgrow
# the tile-fill win and the base core is used instead.
_MXU_FOLD_MAX_K = 1024


def _dedupe_stack(stack):
    """(n, chi, G, chi) -> (stack_u (u, chi, G, chi), idx (n,) int32): unique
    step tensors + per-step indices (stationary PTs repeat one bulk tensor)."""
    n = stack.shape[0]
    flat = np.ascontiguousarray(stack).reshape(n, -1)
    _, first, idx = np.unique(flat.view(np.uint8).reshape(n, -1), axis=0,
                              return_index=True, return_inverse=True)
    # keep first-occurrence order so the init segment stays contiguous
    order = np.argsort(first, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))
    return stack[first[order]], rank[idx].astype(np.int32)


def area_sweep(spec, pulses_unit, scales, t_start, t_end, dt, pt=None,
               mesh=None, chunk=4096):
    """Propagate all sweep points of a linear drive-amplitude family at once.

    spec: SystemSpec from engine.hamiltonian.build_system; pulses_unit: the
    pulse list at unit amplitude; scales: (B,) drive multipliers.  With a mesh
    the batch axis is sharded over it.  Batches beyond ``chunk`` lanes loop on
    the host (one compiled program per chunk shape) — the per-step eigh temps
    of very large single calls exceed HBM (measured OOM at 8192 lanes x 300
    steps on v5e, 32x tile-padding on (B, n, d, d) f32).  Returns (t (n+1,),
    outputs (B, n+1, n_out) complex)."""
    scales = np.asarray(scales)
    if len(scales) > chunk:
        parts = [area_sweep(spec, pulses_unit, scales[i:i + chunk], t_start,
                            t_end, dt, pt=pt, mesh=mesh, chunk=chunk)
                 for i in range(0, len(scales), chunk)]
        return parts[0][0], np.concatenate([p[1] for p in parts], axis=0)
    t, n_valid, fn, args, statics = _prep_sweep(
        spec, pulses_unit, scales, t_start, t_end, dt, pt, mesh)
    outs = fn(*args, **statics)
    return t, np.asarray(outs)[:n_valid]


def area_sweep_hlo(spec, pulses_unit, scales, t_start, t_end, dt, pt=None,
                   mesh=None):
    """Compiled HLO text of the sweep program, for sharding/collective audits
    on CPU or a virtual mesh (the bench's weak-scaling mode asserts the PT
    stack is replicated — no all-gather/all-reduce in the compiled program)."""
    _, _, fn, args, statics = _prep_sweep(
        spec, pulses_unit, scales, t_start, t_end, dt, pt, mesh)
    return fn._jitted.lower(*args, **statics).compile().as_text()


def _prep_sweep(spec, pulses_unit, scales, t_start, t_end, dt, pt, mesh):
    """Host-side argument prep shared by area_sweep and area_sweep_hlo.

    Returns (t, n_valid, jitted_fn, args, static_kwargs)."""
    cdt = config.cdtype()
    rdt = config.rdtype()
    n = int(round((t_end - t_start) / dt))
    t = t_start + dt * np.arange(n + 1)
    t_mid = t[:-1] + 0.5 * dt
    F_unit = np.zeros((n, max(1, len(spec.couplings))), dtype=complex)
    f_x, f_y, _ = ham.sample_fields(pulses_unit, t_mid)
    for i, pol in enumerate(spec.pol_index):
        F_unit[:, i] = {0: f_x, 1: f_y}.get(pol, 0)
    C = (np.stack(spec.couplings) if spec.couplings
         else np.zeros((1, spec.dim, spec.dim))).astype(cdt)
    has_diss = spec.diss_sop is not None
    E_half = (propagator.dissipator_half_step(spec.diss_sop, dt).astype(cdt)
              if has_diss else np.eye(spec.dim**2, dtype=cdt))
    rho0_vec = spec.rho0.reshape(-1).astype(cdt)
    W = np.stack([superop.trace_vector(O) for O in spec.output_mats]).astype(cdt)
    scales = np.asarray(scales, dtype=rdt)

    if mesh is not None:
        scales_p, n_valid = mesh_util.pad_to_multiple(scales, mesh.devices.size)
        scales_dev = mesh_util.shard_batch(scales_p, mesh)
    else:
        scales_dev, n_valid = scales, len(scales)

    # squaring count for the Taylor expm: host-side 1-norm bound on dt H/hbar
    h_bound = np.abs(spec.H0).sum(axis=1).max()
    if len(scales):
        h_bound += 2 * np.max(np.abs(scales)) * np.max(
            np.abs(F_unit)) * sum(np.abs(Cc).sum(axis=1).max() for Cc in C)
    n_sq = max(0, int(np.ceil(np.log2(max(dt / hbar * h_bound, 0.25) / 0.5))))

    statics = dict(has_diss=has_diss, n_sq=n_sq)
    if pt is not None:
        if hasattr(pt, "bulk"):
            # StationaryPT: sweeps run at Rabi-map horizons (a few hundred
            # steps), so materializing the prefix is cheap and reuses the
            # stacked sweep core unchanged
            pt = pt.materialize(n)
        else:
            pt = pt.prefix(n)
        kernel = os.environ.get("PYACEQD_TPU_SWEEP_KERNEL", "auto")
        use_mxu = (kernel == "mxu" or
                   (kernel == "auto"
                    and pt.chi * spec.dim**2 <= _MXU_FOLD_MAX_K))
        if use_mxu:
            stack_u, step_idx = _dedupe_stack(np.asarray(pt.stack))
            args = (stack_u.astype(cdt), step_idx, pt.caps.astype(cdt),
                    np.asarray(pt.g_of_s, dtype=np.int32), spec.H0.astype(cdt),
                    C, F_unit.astype(cdt), scales_dev, E_half, rho0_vec, W,
                    rdt(dt))
            return t, n_valid, _area_sweep_pt_mxu_core, args, statics
        args = (pt.stack.astype(cdt), pt.caps.astype(cdt),
                np.asarray(pt.g_of_s, dtype=np.int32), spec.H0.astype(cdt), C,
                F_unit.astype(cdt), scales_dev, E_half, rho0_vec, W, rdt(dt))
        return t, n_valid, _area_sweep_pt_core, args, statics
    args = (spec.H0.astype(cdt), C, F_unit.astype(cdt), scales_dev, E_half,
            rho0_vec, W, rdt(dt))
    return t, n_valid, _area_sweep_core, args, statics
