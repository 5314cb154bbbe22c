"""Stationary (repeated/infinite) process tensor.

TPU-native counterpart of ACE's ``use_Gaussian_repeat`` / ``use_Gaussian_infinite``
modes (reference: /root/reference/pyaceqd/general_system/general_system.py:165-174,
including the ``infinite_normalize_iter 200`` normalization iteration): for a
stationary bath the PT becomes translation invariant after a short transient,
so instead of building and storing one MPO tensor per time step
(O(n_steps) build/storage, engine/ptmpo.py), we extract

    {initial tensors Q_1..Q_K, one repeated bulk tensor A, stationary cap c*}

with O(n_mem) build cost and O(1) storage per step, enabling the reference's
default tb = 800-2000 ps phonon workloads (40k+ steps).

Algorithm (fixed point of the windowed zip-up, gauge-anchored):

  The streaming builder's per-step map (apply influence layer, truncate, emit
  oldest site) becomes exactly translation invariant once the window is full.
  Its fixed point is reached up to *gauge*: the emitted tensors wander under
  unitary rotations of the truncated bond bases (near-degenerate singular
  values cross and permute between steps), so they never converge elementwise
  — but the gauge-invariant data do, exactly (measured to ~1e-14): the
  per-step norm growth s, the bond Schmidt spectrum, and the window subspace
  (consecutive right-canonicalized windows overlap through an exactly unitary
  matrix O).  Writing the wander as C_hat_m = G_m C*, one finds that anchoring
  every window to one fixed reference window R cancels G_m exactly:

      O_m      := <C_hat_m, C_hat_R>     (contract over relative positions)
      Lambda_m := L_m O_m                (window left factor, reference basis)
      A        := Lambda_{m-1}^{-1} Q_m Lambda_m     -> constant in m.

  The readout closure for an infinite future tail is the dominant eigenvector
  of the diagonal-group transfer matrix A[:, g_diag, :] (power iteration — the
  ACE ``infinite_normalize_iter`` analogue); A is rescaled so that eigenvalue
  is exactly 1, making caps constant and the device state O(1) (float32-safe).

Device consumption: one lax.scan whose body closes over the single bulk
tensor (no per-step xs for the PT), after a short scan over the initial
segment.  See propagate_pt_uniform below.
"""

from dataclasses import dataclass

import numpy as np

from pyaceqd_tpu.engine.ptmpo import (
    _apply_layer, _qr_sweep_lr, _emit, influence_factors, ProcessTensor)


# ---------------------------------------------------------------------------
# pinned decompositions (deterministic gauges)
# ---------------------------------------------------------------------------

def _svd_pinned(M):
    U, S, Vh = np.linalg.svd(M, full_matrices=False)
    idx = np.argmax(np.abs(Vh), axis=1)
    ph = Vh[np.arange(len(idx)), idx]
    ph = np.where(np.abs(ph) > 0, ph / np.abs(ph), 1.0)
    return U * ph[None, :], S, Vh / ph[:, None]


def _svd_sweep_rl(chain, thr, chi_max, chi_lock=None):
    """Right-to-left zip-up truncation (SVD gauge pinned).  chi_lock freezes
    the rank of the EMISSION bond only (between sites 0 and 1) so the
    steady-state extraction sees a fixed left-bond dimension; interior bonds
    stay threshold-ruled (their +-1 rank wobble at the cut is harmless —
    locking them to the emission rank would over-truncate the chain and
    collapse it to a degraded self-consistent fixed point, measured chi
    57 -> 12 on the TLS bath)."""
    for i in range(len(chain) - 1, 0, -1):
        a, g, b = chain[i].shape
        U, S, Vh = _svd_pinned(chain[i].reshape(a, g * b))
        if chi_lock is not None and i == 1:
            keep = min(chi_lock, len(S))
        else:
            keep = int(np.sum(S > S[0] * thr)) if S[0] > 0 else 1
            keep = max(1, min(chi_max, keep))
        chain[i] = Vh[:keep].reshape(keep, g, b)
        chain[i - 1] = np.einsum('agb,bc->agc', chain[i - 1],
                                 U[:, :keep] * S[:keep])
    return chain


def _right_canonicalize(chain):
    """(L, hatted chain): hatted sites row-orthonormal, chain == L @ hatted."""
    ch = [c.copy() for c in chain]
    for i in range(len(ch) - 1, -1, -1):
        a, g, b = ch[i].shape
        U, S, Vh = _svd_pinned(ch[i].reshape(a, g * b))
        ch[i] = Vh.reshape(len(S), g, b)
        if i > 0:
            ch[i - 1] = np.einsum('agb,bc->agc', ch[i - 1], U * S[None, :])
        else:
            L = U * S[None, :]
    return L, ch


def _window_overlap(cnew, cref):
    """O[a,a'] = sum_paths cnew[a,paths] conj(cref[a',paths]) (relative
    slot-position identification)."""
    M = np.ones((1, 1), dtype=complex)
    for j in range(len(cnew) - 1, -1, -1):
        M = np.einsum('agb,bc,egc->ae', cnew[j], M, np.conj(cref[j]))
    return M


# ---------------------------------------------------------------------------
# stationary PT container
# ---------------------------------------------------------------------------

@dataclass
class StationaryPT:
    """Initial segment + repeated bulk + stationary cap.

    Scale convention: bulk is normalized so its diagonal-group transfer has
    dominant eigenvalue exactly 1 with eigenvector cap_bulk; init_stack /
    init_caps are mutually consistent per the same pairing rule as
    ptmpo.ProcessTensor (each caps row pairs with the forward state carrying
    the same prefix of per-step scales) and anchored so caps[0] ~ e_0."""
    init_stack: np.ndarray    # (K, chi, G, chi)
    init_caps: np.ndarray     # (K, chi) rows 0..K-1 (row K == cap_bulk)
    bulk: np.ndarray          # (chi, G, chi)
    cap_bulk: np.ndarray      # (chi,)
    g_of_s: np.ndarray        # (d^2,) int32
    counter_term: np.ndarray  # polaron-shift counter Hamiltonian [meV]
    chi: int
    n_mem: int
    build_residual: float = 0.0   # ||A_{R+1} - A_{R+2}|| / ||A|| diagnostic

    @property
    def n_init(self):
        return self.init_stack.shape[0]

    def prefix(self, n):
        """Horizon-free: any n is served."""
        return self

    def materialize(self, n_steps):
        """Expand to a finite per-step ProcessTensor (for validation and for
        reuse of the stacked device paths on short runs)."""
        K = min(self.n_init, n_steps)
        chi = self.chi
        stack = np.empty((n_steps, chi, self.init_stack.shape[2], chi),
                         dtype=complex)
        stack[:K] = self.init_stack[:K]
        stack[K:] = self.bulk[None]
        caps = np.empty((n_steps + 1, chi), dtype=complex)
        caps[:K] = self.init_caps[:K]
        caps[K:] = self.cap_bulk[None]
        return ProcessTensor(stack=stack, caps=caps, g_of_s=self.g_of_s,
                             counter_term=self.counter_term, chi=chi,
                             n_mem=self.n_mem)


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

def build_stationary_pt(eta, g_of_s, nu, mu, counter_term, threshold=1e-8,
                        chi_max=64, eta_cut=1e-10, steady_tol=None,
                        steady_runs=5, max_iter_factor=16, lock_margin=None,
                        n_extract=4, verbose=False, builder=None):
    """Find the stationary PT {init, bulk, cap} for the bath described by the
    QUAPI coefficients eta (len n_mem) and coupling groups (nu, mu).

    steady_tol: convergence tolerance for the gauge-invariant steady-state
    detector; the floor is set by the SVD threshold (rank at the cut wobbles
    by one between iterations, perturbing everything at ~threshold), so the
    default is 30*threshold.

    builder: optional callable(chain, b0, bD, d_of_g, w_eff, thr, chi_max,
    chi_lock) performing one (layer + truncate) iteration — hook for the
    native backend; default = numpy sweeps.
    """
    n_mem = len(eta)
    if steady_tol is None:
        steady_tol = 30 * threshold
    b0, bD, d_of_g = influence_factors(eta, nu, mu)
    mags = np.abs(eta)
    big = np.where(mags[1:] > eta_cut * mags[0])[0]
    w_eff = min(int(big[-1] + 1) if len(big) else 1, n_mem - 1)
    w_eff = max(w_eff, 1)

    def default_iter(chain, chi_lock):
        chain = _apply_layer(chain, b0, bD, d_of_g, w_eff)
        chain = _svd_sweep_rl(chain, threshold * 0.1, chi_max, chi_lock=None)
        chain = _qr_sweep_lr(chain, start=0)
        chain = _svd_sweep_rl(chain, threshold, chi_max, chi_lock=chi_lock)
        chain = _qr_sweep_lr(chain, start=0)
        return chain

    one_iter = builder if builder is not None else default_iter

    chain = []
    emitted = []          # raw emitted tensors (window-scale normalized out)
    scales = []           # per-step window norms s_m (emitted step pairing)
    prev_sig = None
    prev_s = None
    steady = 0
    drift_hist = []       # per-emission gauge-invariant drift (plateau check)
    chi_lock = None
    R_emit = None         # emission index at which steady state was declared
    max_iter = max(max_iter_factor * w_eff, w_eff + 30)
    it = 0
    phase = "grow"
    ref = None
    extract = []          # (Q, L, O) for emissions after reference fixed
    while it < max_iter:
        chain = one_iter(chain, chi_lock)
        it += 1
        if len(chain) <= w_eff:
            continue
        Q, chain = _emit(chain)
        s = np.linalg.norm(chain[0])
        chain[0] = chain[0] / s
        emitted.append(Q)
        scales.append(s)
        if phase == "grow":
            # steady-state detection on gauge-invariant data: per-step norm
            # growth and window Schmidt spectrum.  Two criteria, either
            # suffices: (a) absolute — drift below steady_tol (30*thr) for
            # steady_runs consecutive emissions; (b) plateau — the drift has
            # stopped improving against its own history (its floor is set by
            # the truncation-rank wobble, which for tight thresholds never
            # reaches 30*thr; the transient decays like the slow kernel
            # tail, so an absolute tolerance alone can hang forever).
            L, _hat = _right_canonicalize(chain)
            sig = np.linalg.svd(L, compute_uv=False)
            nrm = np.linalg.norm(sig)
            sig = sig / (nrm if nrm > 0 else 1.0)
            if prev_sig is not None:
                k = max(len(sig), len(prev_sig))
                a = np.pad(sig, (0, k - len(sig)))
                b = np.pad(prev_sig, (0, k - len(prev_sig)))
                d = max(abs(s - prev_s) / abs(s), float(np.max(np.abs(a - b))))
                drift_hist.append(d)
                if d <= steady_tol:
                    steady += 1
                else:
                    steady = 0
                if (steady < steady_runs and len(drift_hist) >= 20
                        and len(emitted) >= w_eff):
                    older = np.median(drift_hist[-20:-10])
                    recent = np.median(drift_hist[-10:])
                    if recent > 0.5 * older and recent < 1e-4:
                        steady = steady_runs      # plateau reached
            prev_sig, prev_s = sig, s
            if steady >= steady_runs and len(emitted) >= w_eff:
                # settled — run an unlocked wash so the emission rank can
                # still drift to its final value, THEN lock its max
                phase = "wash"
                rank_seen = []
                lock_left = (lock_margin if lock_margin is not None
                             else max(10, w_eff // 2))
                if verbose:
                    print(f"[ptinf] steady at emission {len(emitted)} "
                          f"(iter {it}), washing {lock_left} iterations")
        elif phase == "wash":
            rank_seen.append(Q.shape[2])
            lock_left -= 1
            if lock_left <= 0:
                # lock the emission bond at the largest recently-used rank so
                # locking never cuts a direction the threshold was keeping
                chi_lock = min(chi_max, max(rank_seen[-8:]))
                phase = "locked"
                lock_left = 5
                if verbose:
                    print(f"[ptinf] chi locked at {chi_lock} "
                          f"(emission {len(emitted)})")
        elif phase == "locked":
            lock_left -= 1
            if lock_left <= 0 and Q.shape[2] == chi_lock:
                L, hat = _right_canonicalize(chain)
                ref = hat
                Lambda_prev = L        # O_R^R = identity
                Lambda_R = L
                R_emit = len(emitted)  # emission count at reference
                phase = "extract"
        elif phase == "extract":
            L, hat = _right_canonicalize(chain)
            O = _window_overlap(hat, ref)
            Lambda = L @ O
            QL = np.einsum('agb,bc->agc', Q, Lambda)
            chi_l = Q.shape[0]
            # pinv rather than solve: Lambda's condition is the Schmidt
            # ratio (~1/threshold); directions below rcond carry no
            # physical weight and would otherwise amplify truncation noise
            A = (np.linalg.pinv(Lambda_prev, rcond=1e-13)
                 @ QL.reshape(chi_l, -1)).reshape(QL.shape)
            extract.append((A, s, Lambda_prev))
            Lambda_prev = Lambda
            if len(extract) >= n_extract:
                break
    if phase != "extract" or len(extract) < 2:
        raise RuntimeError(
            f"stationary PT build did not reach steady state in {max_iter} "
            f"iterations (phase={phase}); bath may be non-stationary at this "
            f"threshold — fall back to the finite-horizon builder")

    (A1, s1, Lam1), (A2, s2, Lam2) = extract[-2], extract[-1]
    # physically-weighted residual: || Lambda (A_prev - A) || compares the
    # two extractions through the left environment's Schmidt weights, so
    # ill-conditioned (weightless) directions do not dominate the metric
    num = np.linalg.norm(np.einsum('ab,bgc->agc', Lam2, A1 * s1 - A2 * s2))
    den = np.linalg.norm(np.einsum('ab,bgc->agc', Lam2, A2 * s2))
    resid = num / den
    A = A2 * s2   # restore the true per-step scale (normalized out above)
    if verbose:
        print(f"[ptinf] bulk extracted at emission {len(emitted)}: "
              f"chi={chi_lock}, residual={resid:.2e}")

    # --- stationary cap: dominant eigenvector of the diagonal transfer ----
    g_diag = int(np.where(np.isclose(nu, mu))[0][0])
    # device pad: transient emitted ranks can exceed the locked steady rank
    chi = max([chi_lock] + [max(Q.shape[0], Q.shape[2])
                            for Q in emitted[:R_emit]])
    T = np.ascontiguousarray(A[:, g_diag, :])
    # power iteration (the ACE infinite_normalize_iter analogue); T is small
    # (chi x chi) so a dense eig is affordable and exact
    evals, evecs = np.linalg.eig(T)
    k = int(np.argmax(np.abs(evals)))
    lam = evals[k]
    cstar = evecs[:, k]
    cstar = cstar / cstar[np.argmax(np.abs(cstar))]
    A = A / lam                       # bulk transfer eigenvalue exactly 1
    if chi > chi_lock:
        A = _pad_to(A, chi)
        cstar = np.pad(cstar, (0, chi - chi_lock))

    # --- initial segment --------------------------------------------------
    # true chain = Q_1 s_1 Q_2 s_2 ... Q_R s_R Lambda_R C_ref...; the bulk
    # replaces emissions > R.  Absorb Lambda_R and the scales into the init
    # tensors; pad ragged transient shapes to chi.
    K = R_emit
    init = []
    for m in range(K):
        Qm = emitted[m] * scales[m]
        if m == K - 1:
            Qm = np.einsum('agb,bc->agc', Qm, Lambda_R)
        init.append(_pad_to(Qm, chi))
    G = init[0].shape[1]
    init_stack = np.stack(init)       # (K, chi, G, chi)

    # --- caps over the init segment (backward from c*), balanced ----------
    caps = np.empty((K + 1, chi), dtype=complex)
    caps[K] = cstar
    for m in range(K - 1, -1, -1):
        v = init_stack[m][:, g_diag, :] @ caps[m + 1]
        s = np.max(np.abs(v))
        s = s if s > 0 else 1.0
        init_stack[m] = init_stack[m] / s
        caps[m] = v / s
    # global anchor: Tr rho(0) = 1 -> caps[0][0] = 1 (global scalar on all
    # caps rows including the bulk cap — consistent for every readout row)
    z = caps[0][0]
    caps = caps / z
    cap_bulk = cstar / z

    return StationaryPT(init_stack=init_stack, init_caps=caps[:K],
                        bulk=A, cap_bulk=cap_bulk,
                        g_of_s=np.asarray(g_of_s, dtype=np.int32),
                        counter_term=np.asarray(counter_term), chi=chi,
                        n_mem=n_mem, build_residual=float(resid))


def _pad_to(T, chi):
    a, g, b = T.shape
    out = np.zeros((chi, g, chi), dtype=complex)
    out[:a, :, :b] = T
    return out


# ---------------------------------------------------------------------------
# device propagation (uniform bulk: scan body closes over ONE tensor)
# ---------------------------------------------------------------------------

import jax
import jax.numpy as jnp

from pyaceqd_tpu import config
from pyaceqd_tpu.ops import superop
from pyaceqd_tpu.utils.cplx import hostsafe


@hostsafe(static_argnames=("mto_before", "mto_mode", "has_diss"))
def _propagate_ptinf_core(init_stack, init_caps, bulk, cap_bulk, g_of_s, U,
                          E_half, rho0_vec, W, mto_sops, mto_ks,
                          mto_before=(), mto_mode=(), has_diss=True):
    """Uniform-PT propagation: short scan over the initial segment, then a
    scan whose body closes over the single bulk tensor — no per-step PT xs,
    so the horizon is unbounded at O(1) PT memory (the device twin of ACE's
    use_Gaussian_repeat/use_Gaussian_infinite propagation)."""
    n = U.shape[0]
    d = U.shape[1]
    d2 = d * d
    chi = bulk.shape[0]
    K = init_stack.shape[0]          # host guarantees K <= n
    n_mto = len(mto_before)

    def apply_mtos(A, k, before_phase):
        for i in range(n_mto):
            if mto_before[i] == before_phase:
                A = jnp.where(k == mto_ks[i], A @ mto_sops[i].T, A)
        return A

    def sys_step(A, Uk):
        if has_diss:
            A = A @ E_half.T
        Am = superop.vpu_sandwich(A.reshape(chi, d, d), Uk)
        A = Am.reshape(chi, d2)
        if has_diss:
            A = A @ E_half.T
        return A

    A0 = jnp.zeros((chi, d2), dtype=rho0_vec.dtype).at[0].set(rho0_vec)
    ks = jnp.arange(n, dtype=jnp.int32)

    def body_init(A, xs):
        Uk, Qk, cap_k, k = xs
        A = apply_mtos(A, k, True)
        y = W @ (cap_k @ A)
        A = apply_mtos(A, k, False)
        A = sys_step(A, Uk)
        A = jnp.einsum('asb,as->bs', Qk[:, g_of_s, :], A)
        return A, y

    A1, ys1 = jax.lax.scan(body_init, A0,
                           (U[:K], init_stack, init_caps, ks[:K]))

    Qs_bulk = bulk[:, g_of_s, :]     # (chi, d2, chi), closed over

    def body_bulk(A, xs):
        Uk, k = xs
        A = apply_mtos(A, k, True)
        y = W @ (cap_bulk @ A)
        A = apply_mtos(A, k, False)
        A = sys_step(A, Uk)
        A = jnp.einsum('asb,as->bs', Qs_bulk, A)
        return A, y

    A_f, ys2 = jax.lax.scan(body_bulk, A1, (U[K:], ks[K:]))
    A_f = apply_mtos(A_f, jnp.int32(n), True)
    y_last = W @ (cap_bulk @ A_f)
    return jnp.concatenate([ys1, ys2, y_last[None]], axis=0)


@hostsafe(static_argnames=("mto_before", "mto_mode", "has_diss"))
def _ptinf_dynmaps_core(init_stack, init_caps, bulk, cap_bulk, g_of_s, U,
                        E_half, W_eye, mto_sops, mto_ks, mto_before=(),
                        mto_mode=(), has_diss=True):
    """Accumulated dynamical maps E(t_m, t_0) from the uniform PT (vmap the
    propagation over the d^2 Liouville basis initial states)."""
    def one_basis(rho0):
        return _propagate_ptinf_core.__wrapped__(
            init_stack, init_caps, bulk, cap_bulk, g_of_s, U, E_half, rho0,
            W_eye, mto_sops, mto_ks, mto_before=mto_before,
            mto_mode=mto_mode, has_diss=has_diss)

    d2 = W_eye.shape[0]
    basis = jnp.eye(d2, dtype=E_half.dtype)
    outs = jax.vmap(one_basis)(basis)
    return jnp.transpose(outs, (1, 2, 0))


@hostsafe(static_argnames=("mto_before", "has_diss", "per_lane_sops"))
def _vmapped_runs_ptinf_core(init_stack, init_caps, bulk, cap_bulk, g_of_s,
                             U, E_half, rho0_vec, W, mto_sops, mto_ks_batch,
                             gather_ks, mto_before=(), has_diss=True,
                             per_lane_sops=False):
    """Uniform-PT twin of branched._vmapped_runs_pt_core: B lanes sharing
    the trunk setup, each with its own MTO insertion indices (and, with
    per_lane_sops, its own operator superoperators)."""
    n = U.shape[0]
    d = U.shape[1]
    d2 = d * d
    chi = bulk.shape[0]
    K = init_stack.shape[0]
    n_mto = len(mto_before)
    Qs_bulk = bulk[:, g_of_s, :]

    def one_run(mks, gks, sops):
        def apply_mtos(A, k, before_phase):
            for i in range(n_mto):
                if mto_before[i] == before_phase:
                    A = jnp.where(k == mks[i], A @ sops[i].T, A)
            return A

        def sys_step(A, Uk):
            if has_diss:
                A = A @ E_half.T
            Am = superop.vpu_sandwich(A.reshape(chi, d, d), Uk)
            A = Am.reshape(chi, d2)
            if has_diss:
                A = A @ E_half.T
            return A

        def body_init(A, xs):
            Uk, Qk, cap_k, k = xs
            A = apply_mtos(A, k, True)
            y = W @ (cap_k @ A)
            A = apply_mtos(A, k, False)
            A = sys_step(A, Uk)
            return jnp.einsum('asb,as->bs', Qk[:, g_of_s, :], A), y

        def body_bulk(A, xs):
            Uk, k = xs
            A = apply_mtos(A, k, True)
            y = W @ (cap_bulk @ A)
            A = apply_mtos(A, k, False)
            A = sys_step(A, Uk)
            return jnp.einsum('asb,as->bs', Qs_bulk, A), y

        A0 = jnp.zeros((chi, d2), dtype=rho0_vec.dtype).at[0].set(rho0_vec)
        ks = jnp.arange(n, dtype=jnp.int32)
        A1, ys1 = jax.lax.scan(body_init, A0,
                               (U[:K], init_stack, init_caps, ks[:K]))
        A_f, ys2 = jax.lax.scan(body_bulk, A1, (U[K:], ks[K:]))
        A_f = apply_mtos(A_f, jnp.int32(n), True)
        outputs = jnp.concatenate(
            [ys1, ys2, (W @ (cap_bulk @ A_f))[None]], axis=0)
        return outputs[gks]

    return jax.vmap(one_run, in_axes=(0, 0, 0 if per_lane_sops else None))(
        mto_ks_batch, gather_ks, mto_sops)


def propagate_ptinf(pt: StationaryPT, U, E_half, rho0_vec, W, mto_sops,
                    mto_ks, mto_before=(), mto_mode=(), collect_E=False):
    """propagate_pt-compatible entry for a StationaryPT."""
    cdt = config.cdtype()
    n = np.asarray(U).shape[0]
    if n < pt.n_init:
        # short run: the stacked path on the materialized prefix is simplest
        from pyaceqd_tpu.engine import ptmpo
        return ptmpo.propagate_pt(pt.materialize(n), U, E_half, rho0_vec, W,
                                  mto_sops, mto_ks, mto_before=mto_before,
                                  mto_mode=mto_mode, collect_E=collect_E)
    has_diss = E_half is not None
    g_of_s = np.asarray(pt.g_of_s, dtype=np.int32)
    E = (np.asarray(E_half, dtype=cdt) if has_diss
         else np.eye(len(g_of_s), dtype=cdt))
    args = (pt.init_stack.astype(cdt), pt.init_caps.astype(cdt),
            pt.bulk.astype(cdt), pt.cap_bulk.astype(cdt), g_of_s,
            np.asarray(U, dtype=cdt), E, np.asarray(rho0_vec, dtype=cdt),
            np.asarray(W, dtype=cdt), np.asarray(mto_sops, dtype=cdt),
            np.asarray(mto_ks, dtype=np.int32))
    outputs = _propagate_ptinf_core(*args, mto_before=mto_before,
                                    mto_mode=mto_mode, has_diss=has_diss)
    Es = None
    if collect_E:
        d2 = len(g_of_s)
        W_eye = np.eye(d2, dtype=cdt)
        maps = _ptinf_dynmaps_core(args[0], args[1], args[2], args[3],
                                   g_of_s, args[5], E, W_eye, args[9],
                                   args[10], mto_before=mto_before,
                                   mto_mode=mto_mode, has_diss=has_diss)
        Es = np.asarray(maps)[1:]
    return outputs, Es


# ---------------------------------------------------------------------------
# cache + entry point (the use_Gaussian_infinite-keyed twin of
# ptmpo.get_process_tensor's cache; distinct filename suffix so finite and
# stationary caches never collide)
# ---------------------------------------------------------------------------

def load_or_build(path, eta, g_of_s, nu, mu, counter_term, threshold,
                  chi_max, fingerprint, verbose=False):
    import os
    g_arr = np.asarray(g_of_s, dtype=np.int32)
    if os.path.exists(path):
        z = np.load(path, allow_pickle=False)
        if (str(z["fingerprint"]) == fingerprint
                and z["g_of_s"].shape == g_arr.shape
                and np.all(z["g_of_s"] == g_arr)):
            if verbose:
                print("using stationary pt cache " + path)
            return StationaryPT(
                init_stack=z["init_stack"], init_caps=z["init_caps"],
                bulk=z["bulk"], cap_bulk=z["cap_bulk"], g_of_s=z["g_of_s"],
                counter_term=z["counter"], chi=int(z["chi"]),
                n_mem=int(z["n_mem"]),
                build_residual=float(z["residual"]))
    if verbose:
        print("{} not found. Calculating stationary PT...".format(path))
    pt = build_stationary_pt(eta, g_of_s, nu, mu, counter_term,
                             threshold=threshold, chi_max=chi_max,
                             verbose=verbose)
    try:
        np.savez(path, init_stack=pt.init_stack, init_caps=pt.init_caps,
                 bulk=pt.bulk, cap_bulk=pt.cap_bulk, g_of_s=pt.g_of_s,
                 counter=pt.counter_term, chi=pt.chi, n_mem=pt.n_mem,
                 residual=pt.build_residual, fingerprint=fingerprint)
    except OSError:
        pass
    return pt


def vmapped_runs(pt: StationaryPT, U, E_half, rho0_vec, W, mto_sops,
                 mto_ks_batch, gather_ks, mto_before=(), has_diss=True,
                 per_lane_sops=False):
    """branched._vmapped_runs_pt_core-compatible lane fan-out for a
    StationaryPT (dispatch helper)."""
    cdt = config.cdtype()
    n = np.asarray(U).shape[0]
    if n < pt.n_init:
        from pyaceqd_tpu.engine.branched import _vmapped_runs_pt_core
        fin = pt.materialize(n)
        return _vmapped_runs_pt_core(
            fin.stack.astype(cdt), fin.caps.astype(cdt),
            np.asarray(fin.g_of_s, dtype=np.int32), U, E_half, rho0_vec, W,
            mto_sops, mto_ks_batch, gather_ks, mto_before=mto_before,
            has_diss=has_diss, per_lane_sops=per_lane_sops)
    return _vmapped_runs_ptinf_core(
        pt.init_stack.astype(cdt), pt.init_caps.astype(cdt),
        pt.bulk.astype(cdt), pt.cap_bulk.astype(cdt),
        np.asarray(pt.g_of_s, dtype=np.int32), U, E_half, rho0_vec, W,
        mto_sops, mto_ks_batch, gather_ks, mto_before=mto_before,
        has_diss=has_diss, per_lane_sops=per_lane_sops)
