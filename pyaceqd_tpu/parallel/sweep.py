"""Batched pulse-parameter sweeps: the SPMD replacement for the reference's
ThreadPool-of-subprocess sweeps (rabi_rotations.py:172-198,
tpe_rotations.py:196-205, G1.py mollow loops).

One compiled program propagates ALL sweep points: the drive field of each
branch is ``scale * F_unit`` (pulse envelopes are linear in the area), the
per-branch step unitaries come from one batched eigh, and the branch axis
vmaps across VPU lanes on a chip and shards across the mesh over ICI.
"""

from functools import partial

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


@hostsafe(static_argnames=("has_diss",))
def _area_sweep_core(H0, C, F_unit, scales, E_half, rho0_vec, W, dt, has_diss):
    """outputs[b, k, m] = <W_m>(t_k) for drive field scales[b] * F_unit."""
    d = H0.shape[0]
    d2 = d * d

    def one(scale):
        f = scale.astype(F_unit.dtype) * F_unit
        Hk = H0[None] + jnp.einsum('nc,cij->nij', f, C) \
            + jnp.einsum('nc,cij->nij', jnp.conj(f), jnp.conj(jnp.swapaxes(C, 1, 2)))
        w, V = jnp.linalg.eigh(Hk)
        phase = jnp.exp(jax.lax.complex(jnp.zeros_like(w), -(dt / hbar) * w)).astype(V.dtype)
        U = jnp.einsum('nik,nk,njk->nij', V, phase, jnp.conj(V))

        def body(rho, Uk):
            if has_diss:
                rho = E_half @ rho
            rho = (Uk @ rho.reshape(d, d) @ jnp.conj(Uk).T).reshape(d2)
            if has_diss:
                rho = E_half @ rho
            return rho, W @ rho

        rho_f, ys = jax.lax.scan(body, rho0_vec, U)
        return jnp.concatenate([(W @ rho0_vec)[None], ys], axis=0)

    return jax.vmap(one)(scales)


@hostsafe(static_argnames=("has_diss",))
def _area_sweep_pt_core(stack, caps, g_of_s, H0, C, F_unit, scales, E_half,
                        rho0_vec, W, dt, has_diss):
    """Phonon-dressed sweep: each branch runs the PT contraction."""
    d = H0.shape[0]
    d2 = d * d
    chi = stack.shape[1]

    def one(scale):
        f = scale.astype(F_unit.dtype) * F_unit
        Hk = H0[None] + jnp.einsum('nc,cij->nij', f, C) \
            + jnp.einsum('nc,cij->nij', jnp.conj(f), jnp.conj(jnp.swapaxes(C, 1, 2)))
        w, V = jnp.linalg.eigh(Hk)
        phase = jnp.exp(jax.lax.complex(jnp.zeros_like(w), -(dt / hbar) * w)).astype(V.dtype)
        U = jnp.einsum('nik,nk,njk->nij', V, phase, jnp.conj(V))
        A0 = jnp.zeros((chi, d2), dtype=rho0_vec.dtype).at[0].set(rho0_vec)

        def body(A, xs):
            Uk, Qk, cap_k = xs
            y = W @ (cap_k @ A)
            if has_diss:
                A = A @ E_half.T
            Am = A.reshape(chi, d, d)
            Am = jnp.einsum('ik,akl,jl->aij', Uk, Am, jnp.conj(Uk))
            A = Am.reshape(chi, d2)
            if has_diss:
                A = A @ E_half.T
            Qs = Qk[:, g_of_s, :]
            return jnp.einsum('asb,as->bs', Qs, A), y

        A_f, ys = jax.lax.scan(body, A0, (U, stack, caps[:-1]))
        y_last = W @ (caps[-1] @ A_f)
        return jnp.concatenate([ys, y_last[None]], axis=0)

    return jax.vmap(one)(scales)


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

    if pt is not None:
        pt = pt.prefix(n)
        outs = _area_sweep_pt_core(
            pt.stack.astype(cdt), pt.caps.astype(cdt),
            np.asarray(pt.g_of_s, dtype=np.int32), spec.H0.astype(cdt), C,
            F_unit.astype(cdt), scales_dev, E_half, rho0_vec, W, rdt(dt),
            has_diss=has_diss)
    else:
        outs = _area_sweep_core(spec.H0.astype(cdt), C, F_unit.astype(cdt),
                                scales_dev, E_half, rho0_vec, W, rdt(dt),
                                has_diss=has_diss)
    return t, np.asarray(outs)[:n_valid]
