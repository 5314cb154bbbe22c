"""Lindblad / closed-system propagation core as a compiled lax.scan.

This is the TPU-native replacement for the reference's per-run ACE subprocess
(general_system.py:339-341) in the phonon-free case: one symmetric-Trotter
step per dt,

    rho_{k+1} = E_half . (U_k rho U_k^dagger) . E_half,
    U_k = exp(-i dt H(t_k + dt/2) / hbar),

with E_half = expm(dt/2 * D) the half-step dissipator map (exact, precomputed
once) and U_k from a batched Hermitian eigendecomposition of all step
Hamiltonians at once — one big MXU-friendly batch instead of a Python loop.

Multi-time operators (ACE apply_Operator[_left|_right], general_system.py:286)
are superoperators selected by step index inside the scan, so insertion times
are *traced* values: a vmap over them turns the reference's
ThreadPoolExecutor-of-subprocesses fan-out (two_time/correlations.py:152-170)
into a single batched device computation.

Step-k ordering matches ACE semantics (general_system.py:283-285):
  [apply MTOs with applyBefore] -> output at t_k -> [apply MTOs] -> propagate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from pyaceqd_tpu import config
from pyaceqd_tpu.ops import superop
from pyaceqd_tpu.constants import hbar
from pyaceqd_tpu.utils.cplx import hostsafe


def dissipator_half_step(diss_sop: np.ndarray, dt: float) -> np.ndarray:
    """Exact half-step map expm(dt/2 * D) (host, once per simulation)."""
    return scipy.linalg.expm(0.5 * dt * diss_sop)


@hostsafe
def _step_unitaries_core(H0, C, f, dt):
    Hk = H0[None] + jnp.einsum('nc,cij->nij', f, C) \
        + jnp.einsum('nc,cij->nij', jnp.conj(f), jnp.conj(jnp.swapaxes(C, 1, 2)))
    w, V = jnp.linalg.eigh(Hk)
    phase = jnp.exp(jax.lax.complex(jnp.zeros_like(w), -(dt / hbar) * w)).astype(V.dtype)
    return jnp.einsum('nik,nk,njk->nij', V, phase, jnp.conj(V))


def step_unitaries(H0, couplings, fields_mid, dt):
    """Batched U_k = expm(-i dt H(t_mid,k)/hbar) for all steps.

    H0: (d,d); couplings: (n_c,d,d); fields_mid: (n,n_c) complex.
    Returns (n,d,d) complex (host NumPy on TPU backends, device array on CPU)."""
    cdt = config.cdtype()
    rdt = config.rdtype()
    d = H0.shape[0]
    n = np.asarray(fields_mid).shape[0]
    if len(couplings):
        C = np.stack(couplings).astype(cdt)
        f = np.asarray(fields_mid, dtype=cdt)
    else:
        C = np.zeros((1, d, d), dtype=cdt)
        f = np.zeros((n, 1), dtype=cdt)
    return _step_unitaries_core(np.asarray(H0, dtype=cdt), C, f, rdt(dt))


@hostsafe(static_argnames=("mto_before", "mto_mode", "collect_E", "has_diss"))
def propagate(U, E_half, rho0_vec, W, mto_sops, mto_ks,
              mto_before=(), mto_mode=(), collect_E=False, has_diss=True):
    """Scan the full propagation; return per-grid-point outputs (and maps).

    Args:
      U: (n,d,d) step unitaries.
      E_half: (d^2,d^2) dissipator half-step (ignored if has_diss=False).
      rho0_vec: (d^2,) initial state, row-major vec.
      W: (n_out, d^2) output weights; outputs are W @ vec(rho).
      mto_sops: (n_mto, d^2, d^2) multi-time-operator superoperators.
      mto_ks: (n_mto,) int32 grid indices at which each MTO fires (traced!).
      mto_before: static tuple of bools (ACE applyBefore per MTO).
      mto_mode: static tuple of strings, kept for cache keying/debug.
      collect_E: also accumulate dynamical maps E(t_{k+1}, t_0), k=0..n-1.

    Returns:
      outputs: (n+1, n_out) complex, one row per grid point t_0..t_n.
      E: (n, d^2, d^2) accumulated maps if collect_E else None.
    """
    n = U.shape[0]
    d = U.shape[1]
    d2 = d * d
    n_mto = len(mto_before)

    def apply_mtos(rho, k, before_phase):
        for i in range(n_mto):
            if mto_before[i] == before_phase:
                fired = (k == mto_ks[i])
                rho = jnp.where(fired, mto_sops[i] @ rho, rho)
        return rho

    def apply_mtos_E(E, k, before_phase):
        for i in range(n_mto):
            if mto_before[i] == before_phase:
                fired = (k == mto_ks[i])
                E = jnp.where(fired, mto_sops[i] @ E, E)
        return E

    def sys_step(rho, Uk):
        if has_diss:
            rho = E_half @ rho
        rho = superop.vpu_sandwich(rho.reshape(d, d), Uk).reshape(d2)
        if has_diss:
            rho = E_half @ rho
        return rho

    def sys_step_E(E, Uk):
        if has_diss:
            E = E_half @ E
        E3 = E.reshape(d, d, d2)
        E3 = jnp.einsum('ik,jl,klm->ijm', Uk, jnp.conj(Uk), E3)
        E = E3.reshape(d2, d2)
        if has_diss:
            E = E_half @ E
        return E

    ks = jnp.arange(n, dtype=jnp.int32)

    if collect_E:
        E0 = jnp.eye(d2, dtype=rho0_vec.dtype)

        def body(carry, xs):
            rho, E = carry
            Uk, k = xs
            rho = apply_mtos(rho, k, True)
            E = apply_mtos_E(E, k, True)
            y = W @ rho
            rho = apply_mtos(rho, k, False)
            E = apply_mtos_E(E, k, False)
            rho = sys_step(rho, Uk)
            E = sys_step_E(E, Uk)
            return (rho, E), (y, E)

        (rho_f, _), (ys, Es) = jax.lax.scan(body, (rho0_vec, E0), (U, ks))
        rho_f = apply_mtos(rho_f, jnp.int32(n), True)
        y_last = W @ rho_f
        outputs = jnp.concatenate([ys, y_last[None]], axis=0)
        return outputs, Es

    def body(rho, xs):
        Uk, k = xs
        rho = apply_mtos(rho, k, True)
        y = W @ rho
        rho = apply_mtos(rho, k, False)
        rho = sys_step(rho, Uk)
        return rho, y

    rho_f, ys = jax.lax.scan(body, rho0_vec, (U, ks))
    rho_f = apply_mtos(rho_f, jnp.int32(n), True)
    y_last = W @ rho_f
    outputs = jnp.concatenate([ys, y_last[None]], axis=0)
    return outputs, None


@hostsafe
def _dressed_eigh_core(H0, C, f):
    Hk = H0[None] + jnp.einsum('nc,cij->nij', f, C) \
        + jnp.einsum('nc,cij->nij', jnp.conj(f), jnp.conj(jnp.swapaxes(C, 1, 2)))
    return jnp.linalg.eigh(Hk)


def dressed_eigh(H0, couplings, fields, dt=None):
    """Instantaneous eigen-decomposition of H(t) on the grid, batched.

    TPU-native replacement for the ``timedep_eigenstates`` binary
    (reference general_system.py:297-304).  Returns (energies (n,d),
    eigenvectors (n,d,d)) with columns as eigenvectors, ascending order."""
    cdt = config.cdtype()
    d = H0.shape[0]
    n = np.asarray(fields).shape[0]
    if len(couplings):
        C = np.stack(couplings).astype(cdt)
        f = np.asarray(fields, dtype=cdt)
    else:
        C = np.zeros((1, d, d), dtype=cdt)
        f = np.zeros((n, 1), dtype=cdt)
    return _dressed_eigh_core(np.asarray(H0, dtype=cdt), C, f)
