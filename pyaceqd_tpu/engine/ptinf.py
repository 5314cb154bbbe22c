"""Stationary (repeated/infinite) process tensor.

TPU-native counterpart of ACE's ``use_Gaussian_repeat`` / ``use_Gaussian_infinite``
modes (reference: /root/reference/pyaceqd/general_system/general_system.py:165-174,
including the ``infinite_normalize_iter 200`` normalization iteration): for a
stationary bath the PT becomes translation invariant after a short transient,
so instead of building and storing one MPO tensor per time step
(O(n_steps) build/storage, engine/ptmpo.py), we extract

    {initial tensors Q_1..Q_K, a repeated bulk cycle B_0..B_{P-1}, caps}

with O(n_mem) build cost and O(1) storage per step, enabling the reference's
default tb = 800-2000 ps phonon workloads (40k+ steps).

Algorithm (v3; every quoted number measured, see NOTES_round2.md):

  The streaming builder's per-step map (apply influence layer via the fused
  zip-up _zip_layer_sweep, truncate, emit oldest site) settles into a
  PERIODIC cycle.  Three ingredients make extraction robust across baths:

  1. Stationarity is DETECTED on the window's Schmidt spectrum (weights at
     the emission bond) — the physical gauge-invariant signal.  The raw
     emission-frame spectrum can stay chaotic forever (n_mem=32: an ~8-mode
     cluster with unweighted singular values 0.3-0.4 but Schmidt weight
     ~1e-6 rearranges every iteration while the Schmidt spectrum is lag-1
     stationary at 1e-7).  A lag-8P flatness check rejects slow transients
     of long-memory baths that look steady at lag P.
  2. Once steady, per-bond truncation RANKS ARE LOCKED to the detected
     pattern: singular values sitting exactly at the relative threshold
     otherwise flicker in/out and every flip reshuffles downstream bases
     enough to corrupt the cycle junction (weighted drift pinned at 2e-2,
     observable error 0.15); with locks the iteration is a smooth map and
     every tested bath converges, mostly at period 1.
  3. Truncation bases are ALIGNED to those used P iterations earlier (per
     bond, the unitary polar factor of the overlap — a rotation inside the
     kept subspace, pure gauge), and convergence is judged by the WEIGHTED
     emission drift ||(Q_m - Q_{m-P}) L|| / ||Q_m L|| (L = window Schmidt
     factor), the error propagation actually sees.  If the drift stalls
     above the floor the period is doubled (gauge two-cycles exist:
     measured spectrum period 4 / elementwise period 8 on one bath).

  The last P emissions ARE the bulk cycle, verbatim: no gauge matching, no
  pseudo-inverses, and the junction to the initial segment is exact because
  emissions chain by construction.

  The readout closure for the infinite tail is the physical eigenvector of
  the cycle's diagonal-group transfer product (dense eig — the ACE
  ``infinite_normalize_iter`` analogue), selected by Schmidt-weighted
  magnitude (spectrally-dominant modes can live in near-weightless truncation
  directions); the cycle is rescaled so that eigenvalue is exactly 1, making
  caps constant per phase and the device state O(1) (float32-safe).

Kernel semantics: the stationary build supports the SHARP t_mem cut
(``absorb_tail=False``, exactly ACE's ``t_mem``) and the ONSITE tail
absorption (``absorb_tail="onsite"``, the production default wired in
ptmpo.get_process_tensor).  The "last"-cell absorption (the finite engine's
default, see spectral.eta_coefficients) puts a bump at the window edge that
destabilizes the zip-up fixed point into a quasi-periodic orbit (measured:
spectrum drift pinned at ~2e-2 at every lag); the onsite variant touches only
the on-site influence factor, keeping the period-2 attractor intact
(measured: residual 1.8e-10, same as sharp) while killing the sharp cut's
spurious linear coherence growth at small t_mem (IBM |mag| error at 40 ps:
onsite 1.8e-2 / 3.5e-4 / 4.7e-8 at t_mem=1.6 / 3.2 / 6.4 vs sharp
0.5 / 3.8e-3 / 1.2e-7).

Validation (tests/test_ptinf.py): at tight threshold (1e-12) on a small bath
the stationary PT reproduces the EXACT discrete truncated-kernel dephasing to
<1e-7 (absolute-correctness anchor).  At the working threshold (1e-8) driven
TLS observables match the independent finite-horizon chain to ~2e-5 mid-chain
— the two truncated constructions each carry ~1e-5 truncation error vs the
exact kernel there (insensitive to align_budget, i.e. NOT bulk-residual
accumulation) — and to ~1.3e-4 over the last ~n_mem steps, where the finite
chain's flushed frontier and the infinite tail legitimately differ.  The
4000-step trace deviation plateaus at ~3e-5 (junction transient, does not
grow with horizon).

Device consumption: one lax.scan whose body closes over the P bulk tensors
(no per-step xs for the PT), after a short scan over the initial segment.
See propagate_ptinf below.
"""

from dataclasses import dataclass

import numpy as np

from pyaceqd_tpu.engine.ptmpo import (
    _apply_layer, _emit, influence_factors, sector_scales,
    ProcessTensor)


# ---------------------------------------------------------------------------
# pinned / aligned decompositions
# ---------------------------------------------------------------------------

def _polar_unitary(M):
    """Unitary polar factor of M, robust to LAPACK zgesdd flakiness.

    numpy's default SVD driver (gesdd) occasionally fails to converge on
    small ill-conditioned alignment overlaps (seen on the smoke battery);
    fall back to the slower-but-robust gesvd, and on total failure return
    None (the caller skips alignment for that bond this iteration — gauge
    alignment is an optimization, never a correctness requirement)."""
    try:
        uu, _, vv = np.linalg.svd(M)
        return uu @ vv
    except np.linalg.LinAlgError:
        try:
            from scipy.linalg import svd as _ssvd
            uu, _, vv = _ssvd(M, lapack_driver="gesvd")
            return uu @ vv
        except Exception:
            return None


def _svd_pinned(M):
    U, S, Vh = np.linalg.svd(M, full_matrices=False)
    idx = np.argmax(np.abs(Vh), axis=1)
    ph = Vh[np.arange(len(idx)), idx]
    ph = np.where(np.abs(ph) > 0, ph / np.abs(ph), 1.0)
    return U * ph[None, :], S, Vh / ph[:, None]


# Set whenever an UNLOCKED truncation wanted more rank than chi_max allowed
# (the cap, not the threshold, decided a cut).  Reset by build_stationary_pt;
# host builds are single-threaded, so a module-level flag is safe.  The native
# stepper tracks the same flag in C++ (native.NativePtinfStepper.capped).
_CAP_TRACK = {"capped": False}


def _keep_rank(S, thr, chi_max, lock, i):
    """Truncation rank: threshold rule, or the locked per-bond rank.

    Rank locking (lock = {site: rank}) freezes the cut once the window is
    steady: singular values sitting exactly AT the relative threshold
    otherwise flicker in/out between iterations, and every flip reshuffles
    the downstream bases enough to corrupt the bulk-cycle junction
    (measured at n_mem=32: top-weight lag drift pinned at ~2e-2, observable
    error 0.15 — locking is what makes the aligned iteration a smooth map
    with a convergent cycle).  The locked value freezes the flickering
    direction at weight ~threshold, below the observable gates."""
    if lock is not None and i in lock:
        return max(1, min(lock[i], len(S)))
    keep = int(np.sum(S > S[0] * thr)) if S[0] > 0 else 1
    if keep > chi_max:
        _CAP_TRACK["capped"] = True
    return max(1, min(chi_max, keep))


def _svd_sweep_lr(chain, thr, chi_max, prev=None, rec=None, lock=None):
    """Left-to-right exact truncation sweep (SVD gauge pinned on U columns).

    Runs directly on the zip sweep's output: the zip leaves the chain
    right-canonical with the weight at the leftmost site, which is exactly
    the gauge an L->R truncation needs for globally exact Schmidt values at
    every bond; it ends left-canonical with the weight at the right end (the
    gauge _emit and the next iteration's zip expect), so no QR
    re-canonicalization sweeps are needed between the two truncation sweeps
    (they were 31% of the darkmodel n_mem=102 build, measured).

    prev/rec: optional per-bond dicts of kept LEFT bases (stored as U^H,
    rows (keep, a*g)) for gauge alignment across iterations; lock: per-bond
    rank locks (see _keep_rank)."""
    for i in range(len(chain) - 1):
        a, g, b = chain[i].shape
        U, S, Vh = np.linalg.svd(chain[i].reshape(a * g, b),
                                 full_matrices=False)
        # pin U columns: max-|.| element real-positive (Vh rows co-rotated)
        idx = np.argmax(np.abs(U), axis=0)
        ph = U[idx, np.arange(len(idx))]
        ph = np.where(np.abs(ph) > 0, ph / np.abs(ph), 1.0)
        U = U * np.conj(ph)[None, :]
        Vh = Vh * ph[:, None]
        keep = _keep_rank(S, thr, chi_max, lock, i)
        Uk = U[:, :keep]
        C = S[:keep, None] * Vh[:keep]
        if prev is not None and i in prev and prev[i].shape == (keep, a * g):
            P = _polar_unitary(prev[i] @ Uk)
            if P is not None:
                Uk = Uk @ P.conj().T
                C = P @ C
        if rec is not None:
            rec[i] = Uk.conj().T
        chain[i] = Uk.reshape(a, g, keep)
        chain[i + 1] = np.einsum('kb,bgc->kgc', C, chain[i + 1])
    return chain


def _zip_layer_sweep(chain, b0, bD, d_of_g, w_eff, thr, chi_max,
                     prev=None, rec=None, lock=None):
    """Fused ptmpo._apply_layer + right-to-left zip-up truncation.

    Mathematically identical to
    a right-to-left truncation sweep of ``_apply_layer(chain, ...)`` but
    never materializes the block-diagonal bond-expanded site tensors
    ((chi D, G, chi D) zero-padded arrays): the expanded site is contracted
    with the already-truncated carry C from the right on the fly, so the
    fold costs chi*G*chi*D*keep instead of (chi D)*G*(chi D)*keep and the
    peak memory stays O(chi G chi).  Same SVD inputs -> same truncation
    decisions -> same fixed point as the unfused pair."""
    W = len(chain)
    G = len(b0)
    D = bD.shape[1] if len(bD) else 1
    out = list(chain) + [None]
    N = np.zeros((D, G, 1), dtype=complex)
    N[d_of_g, np.arange(G), 0] = b0
    if W == 0 or w_eff == 0:
        N = N.sum(axis=0, keepdims=True)
    start = max(0, W - w_eff)
    cur = N
    for j in range(W, start, -1):
        a, g, b = cur.shape
        U, S, Vh = _svd_pinned(cur.reshape(a, g * b))
        keep = _keep_rank(S, thr, chi_max, lock, j)
        V = Vh[:keep]
        C = U[:, :keep] * S[:keep]
        if prev is not None and j in prev and prev[j].shape == V.shape:
            R = _polar_unitary(prev[j] @ V.conj().T)
            if R is not None:
                V = R @ V
                C = C @ R.conj().T
        if rec is not None:
            rec[j] = V
        out[j] = V.reshape(keep, g, b)
        P = chain[j - 1]
        delta = W - (j - 1)
        B = bD[delta - 1]                       # (D, G)
        Crs = C.reshape(P.shape[2], D, keep)    # right composite is (r, c)
        if j - 1 == start:
            # oldest in-window site: left bond not expanded
            cur = np.einsum('lgr,cg,rck->lgk', P, B, Crs, optimize=True)
        else:
            tmp = np.einsum('lgr,rck->lcgk', P, Crs, optimize=True)
            cur = (tmp * B[None, :, :, None]).reshape(
                P.shape[0] * D, G, keep)
    out[start] = cur
    # plain zip-up over the untouched older sites (below the kernel range)
    for i in range(start, 0, -1):
        a, g, b = out[i].shape
        U, S, Vh = _svd_pinned(out[i].reshape(a, g * b))
        keep = _keep_rank(S, thr, chi_max, lock, i)
        V = Vh[:keep]
        C = U[:, :keep] * S[:keep]
        if prev is not None and i in prev and prev[i].shape == V.shape:
            R = _polar_unitary(prev[i] @ V.conj().T)
            if R is not None:
                V = R @ V
                C = C @ R.conj().T
        if rec is not None:
            rec[i] = V
        out[i] = V.reshape(keep, g, b)
        out[i - 1] = np.einsum('agb,bc->agc', out[i - 1], C)
    return out


def _right_canonicalize(chain):
    """(L, hatted chain): hatted sites row-orthonormal, chain == L @ hatted."""
    ch = [c.copy() for c in chain]
    L = None
    for i in range(len(ch) - 1, -1, -1):
        a, g, b = ch[i].shape
        U, S, Vh = _svd_pinned(ch[i].reshape(a, g * b))
        ch[i] = Vh.reshape(len(S), g, b)
        if i > 0:
            ch[i - 1] = np.einsum('agb,bc->agc', ch[i - 1], U * S[None, :])
        else:
            L = U * S[None, :]
    return L, ch


# ---------------------------------------------------------------------------
# stationary PT container
# ---------------------------------------------------------------------------

@dataclass
class StationaryPT:
    """Initial segment + repeated bulk cycle + stationary caps.

    Scale convention: the bulk cycle is normalized so its diagonal-group
    transfer product has dominant eigenvalue exactly 1 with per-phase
    eigenvector rows cap_bulk[j] (the cap entering bulk phase j); init_stack /
    init_caps are mutually consistent per the same pairing rule as
    ptmpo.ProcessTensor (each caps row pairs with the forward state carrying
    the same prefix of per-step scales) and anchored so caps[0] ~ e_0."""
    init_stack: np.ndarray    # (K, chi, G, chi)
    init_caps: np.ndarray     # (K, chi) rows 0..K-1 (row K == cap_bulk[0])
    bulk: np.ndarray          # (P, chi, G, chi): step K+j uses bulk[j % P]
    cap_bulk: np.ndarray      # (P, chi): cap entering step K+j is [j % P]
    g_of_s: np.ndarray        # (d^2,) int32
    counter_term: np.ndarray  # polaron-shift counter Hamiltonian [meV]
    chi: int
    n_mem: int                # BUILD window (after auto reduction)
    build_residual: float = 0.0   # final elementwise lag-P emission drift
    basis: np.ndarray = None      # V (d, d) when the coupling was diagonalized
    n_mem_req: int = 0            # requested window before auto reduction
    capped: bool = False          # chi_max bound some truncation (ptmpo
    #                               ProcessTensor.capped semantics)

    @property
    def n_init(self):
        return self.init_stack.shape[0]

    @property
    def period(self):
        return self.bulk.shape[0]

    def prefix(self, n):
        """Horizon-free: any n is served."""
        return self

    def materialize(self, n_steps):
        """Expand to a finite per-step ProcessTensor (for validation and for
        reuse of the stacked device paths on short runs)."""
        K = min(self.n_init, n_steps)
        P = self.period
        chi = self.chi
        stack = np.empty((n_steps, chi, self.init_stack.shape[2], chi),
                         dtype=complex)
        stack[:K] = self.init_stack[:K]
        for j in range(K, n_steps):
            stack[j] = self.bulk[(j - K) % P]
        caps = np.empty((n_steps + 1, chi), dtype=complex)
        caps[:K] = self.init_caps[:K]
        if n_steps < self.n_init:
            # truncated inside the init segment: the per-step rescaling makes
            # the bulk caps consistent only AFTER the full segment — the
            # readout cap here is the stored backward-recursion row
            caps[n_steps] = self.init_caps[n_steps]
        else:
            for j in range(K, n_steps + 1):
                caps[j] = self.cap_bulk[(j - K) % P]
        return ProcessTensor(stack=stack, caps=caps, g_of_s=self.g_of_s,
                             counter_term=self.counter_term, chi=chi,
                             n_mem=self.n_mem, basis=self.basis,
                             capped=self.capped)


# ---------------------------------------------------------------------------
# per-iteration steppers (numpy and native C++ backends, same contract)
# ---------------------------------------------------------------------------

class _PyStepper:
    """One build iteration of the stationary zip-up in pure numpy.

    Contract (shared with native.NativePtinfStepper): ``step(thr)`` applies a
    new influence layer with right-to-left zip-up truncation (thr*0.1,
    leaving the chain right-canonical, weight at the left edge), then an
    exact left-to-right SVD truncation at thr (leaving it left-canonical,
    weight at the right end — the gauges chain, so no QR re-canonicalization
    sweeps are needed); returns None while the window is still filling, else
    ``(Q, schmidt_spectrum, L_win)`` for the emitted tensor.  ``seed(period)`` locks per-bond ranks and seeds gauge-alignment
    targets from the last ``period`` pre-detection emissions; ``double()``
    doubles the elementwise period (re-keying the phase tables)."""

    def __init__(self, b0, bD, d_of_g, w_eff, chi_max, max_period):
        self.b0, self.bD, self.d_of_g = b0, bD, d_of_g
        self.w_eff, self.chi_max, self.max_period = w_eff, chi_max, max_period
        self.chain = []
        self.period = None
        self.emitted = 0
        self.hist1 = self.hist2 = None
        self.lock1 = self.lock2 = None
        self.recent = []

    def step(self, thr):
        use_prev = self.period is not None
        ph = self.emitted % self.period if use_prev else 0
        rec1, rec2 = {}, {}
        ch = _zip_layer_sweep(self.chain, self.b0, self.bD, self.d_of_g,
                              self.w_eff, thr * 0.1, self.chi_max,
                              prev=self.hist1[ph] if use_prev else None,
                              rec=rec1,
                              lock=self.lock1[ph] if use_prev else None)
        self.chain = _svd_sweep_lr(ch, thr, self.chi_max,
                                   prev=self.hist2[ph] if use_prev else None,
                                   rec=rec2,
                                   lock=self.lock2[ph] if use_prev else None)
        if len(self.chain) <= self.w_eff:
            return None
        Q, self.chain = _emit(self.chain)
        # strip the accumulated window norm (a pure global scale — emissions
        # are QR frames and never carry it; prevents float overflow over long
        # transients, cf. the finite builder's end-of-build rescale)
        s = np.linalg.norm(self.chain[-1])
        if s > 0:
            self.chain[-1] = self.chain[-1] / s
        if use_prev:
            self.hist1[ph], self.hist2[ph] = rec1, rec2
        else:
            self.recent.append((rec1, rec2))
            if len(self.recent) > self.max_period:
                self.recent.pop(0)
        self.emitted += 1
        # window Schmidt weights at the emission bond: the physical,
        # gauge-invariant stationarity signal (and the error weighting for
        # the aligned drift)
        L_win, _ = _right_canonicalize(self.chain)
        sv = np.linalg.svd(L_win, compute_uv=False)
        return Q, sv / (sv[0] if sv[0] > 0 else 1.0), L_win

    def seed(self, period):
        self.period = P = period
        self.hist1 = [None] * P
        self.hist2 = [None] * P
        self.lock1 = [None] * P
        self.lock2 = [None] * P
        m = self.emitted
        for j in range(min(P, len(self.recent))):
            r1, r2 = self.recent[-1 - j]
            phj = (m - 1 - j) % P
            self.hist1[phj], self.hist2[phj] = r1, r2
            self.lock1[phj] = {i: v.shape[0] for i, v in r1.items()}
            self.lock2[phj] = {i: v.shape[0] for i, v in r2.items()}

    def double(self):
        old = self.period
        self.period = 2 * old
        self.hist1 = [self.hist1[p % old] for p in range(self.period)]
        self.hist2 = [self.hist2[p % old] for p in range(self.period)]
        self.lock1 = [self.lock1[p % old] for p in range(self.period)]
        self.lock2 = [self.lock2[p % old] for p in range(self.period)]


def _make_stepper(b0, bD, d_of_g, w_eff, chi_max, max_period, backend=None):
    """Native (C++/LAPACK) stepper when available, else numpy.  backend in
    {None (auto), "native", "numpy"}; "native" raises if unavailable."""
    if backend in (None, "native"):
        try:
            from pyaceqd_tpu.native import NativePtinfStepper
            return NativePtinfStepper(b0, bD, d_of_g, w_eff, chi_max,
                                      max_period)
        except Exception:
            if backend == "native":
                raise
    return _PyStepper(b0, bD, d_of_g, w_eff, chi_max, max_period)


# ---------------------------------------------------------------------------
# automatic window reduction
# ---------------------------------------------------------------------------

def _window_error(eta, nu, mu, m, horizon=None):
    """Exact worst-case constant-path error of replacing the kernel eta
    (length n_mem) by eta[:m] with the dropped tail folded onsite
    (eta'_0 = eta_0 + sum_{d>=m} eta_d).

    For a path constant in Liouville group g the influence functional is
    exactly exp(-G_n) with G_n = n A(eta_0) + sum_d (n-d) A(eta_d),
    A(e) = (nu-mu)(e nu - e* mu).  Because A is linear and the tail sum is
    moved into eta_0, the exponent difference settles to the CONSTANT
    Delta G = sum_{d=m}^{n_mem-1} d A(eta_d) for n >= n_mem — the reduction
    never accumulates with horizon, so a horizon of n_mem + a few steps
    captures the maximum.  Returns max over groups and steps of
    |exp(-G_n) - exp(-G'_n)|."""
    n_mem = len(eta)
    if horizon is None:
        horizon = n_mem + 8
    T = np.sum(eta[m:])
    ns = np.arange(1, horizon + 1)[:, None]                    # (n, 1)
    ds = np.arange(1, n_mem)[None, :]                          # (1, d)
    wt_full = np.clip(ns - ds, 0, None) * (ds < np.minimum(ns, n_mem))
    worst = 0.0
    for g in range(len(nu)):
        dnu = nu[g] - mu[g]
        if dnu == 0:
            continue
        A = lambda e: dnu * (e * nu[g] - np.conj(e) * mu[g])
        G_full = ns[:, 0] * A(eta[0]) + wt_full @ A(eta[1:])
        G_red = (ns[:, 0] * A(eta[0] + T)
                 + wt_full[:, :m - 1] @ A(eta[1:m]))
        worst = max(worst, float(np.max(np.abs(np.exp(-G_full)
                                               - np.exp(-G_red)))))
    return worst


def _reduce_window(eta, nu, mu, tol, floor=4):
    """Smallest m (>= floor) whose onsite-reabsorbed kernel reproduces the
    exact constant-path sector decay of the full kernel to < tol (see
    _window_error).  Returns (eta_reduced, m); (eta, n_mem) if no reduction
    passes.  The scan is from small m up; the error is not monotonic in m
    (the dropped tail oscillates and partially cancels), which is fine —
    the chosen m is verified directly.

    Rationale (measured, QD superohmic bath ae=3 dt=0.2): the physical
    kernel decays in ~6.5 ps but |eta_d| plateaus at ~3e-7 |eta_0| (the
    algebraic finite-T tail), so an |eta|-based window cut (eta_cut) cannot
    shrink the window below the requested t_mem — while the EXACT metric
    shows m=32 reproduces the n_mem=102 kernel to 4.2e-7.  Build cost is
    ~quadratic in the window (darkmodel n_mem=102 chi=128: 1156 s -> ~2 min
    at m=32), which is what makes reference-scale t_mem=20.48 ps baths
    affordable (VERDICT r2 item 4)."""
    n_mem = len(eta)
    for m in range(floor, n_mem):
        if _window_error(eta, nu, mu, m) < tol:
            eta_red = eta[:m].copy()
            eta_red[0] += np.sum(eta[m:])
            return eta_red, m
    return eta, n_mem


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

def build_stationary_pt(eta, g_of_s, nu, mu, counter_term, threshold=1e-8,
                        chi_max=64, eta_cut=1e-10, steady_tol=None,
                        steady_runs=3, max_period=4, max_iter_factor=24,
                        align_budget=100, verbose=False, backend=None,
                        sector_norm=False, window_tol="auto",
                        warm_start=True):
    """Find the stationary PT {init, bulk cycle, caps} for the bath described
    by the QUAPI coefficients eta (len n_mem) and coupling groups (nu, mu).

    Phases:
      detect — adaptive build; watch the gauge-invariant WINDOW SCHMIDT
        spectrum (weights at the emission bond, from right-canonicalizing
        the window) for lag-P convergence (P = 1..max_period, smallest
        wins; drift < steady_tol for steady_runs consecutive emissions).
        The Schmidt weights are the physical signal: the unweighted
        emission-frame spectrum can stay chaotic forever at larger windows
        (measured at n_mem=32: an ~8-mode cluster with unweighted singular
        values 0.3-0.4 but Schmidt weights ~1e-6 rearranges every
        iteration while the Schmidt spectrum converges at lag 1 to ~1e-7).
      align — keep building with per-bond gauge alignment to the bases used
        P iterations earlier and watch the WEIGHTED emission drift
        ||(Q_m - Q_{m-P}) L|| / ||Q_m L||, with L the window's Schmidt
        left-factor (the right-environment weighting that propagation
        errors actually see: emissions are orthonormal frames, so the
        state's weight at every emitted bond is carried by the window).
        Stop when it falls below 0.01*threshold (floor 1e-10) or stalls at
        the noise floor; the final value is recorded as build_residual.
        The weighted attractor period can be a multiple of the spectral
        one (measured: ae=5 nm QD bath has a period-doubled gauge
        two-cycle); when the lag-P drift stalls above the floor, the
        period is doubled (hist re-keyed) up to 8x the spectral period.
    The last P emissions are the bulk cycle; everything before is the init
    segment.  Raises RuntimeError if no period converges within the budget
    (e.g. for the 'last'-cell tail-absorbed kernel — see module docstring).

    window_tol: tolerance for the automatic exact-metric window reduction
    (_reduce_window) — "auto" ties it to the truncation threshold
    (100*threshold, the same constant as the steady-detection floor), a
    float sets it directly, and 0/None disables the reduction (full
    requested window, bit-compatible with the pre-reduction builder).

    warm_start: fill the window and pass the initial transient at 10x the
    threshold before converging at the real one (threshold continuation) —
    a pure initial-condition change; all detection/acceptance gates run
    fresh at the final threshold.  Disable to reproduce the single-stage
    build exactly.
    """
    n_mem_req = len(eta)
    if window_tol == "auto":
        window_tol = 100 * threshold
    if window_tol and n_mem_req > 8:
        eta, _m = _reduce_window(eta, nu, mu, window_tol)
        if verbose and _m < n_mem_req:
            print(f"[ptinf] window reduced {n_mem_req} -> {_m} sites "
                  f"(exact constant-path metric < {window_tol:.1e})")
    n_mem = len(eta)
    if steady_tol is None:
        # the Schmidt spectrum's noise floor is the larger of the
        # truncation wobble at the cut (~100x threshold) and the FP-level
        # wobble the chaotic weightless subspace leaks into the weighted
        # drift even with locked ranks (measured ~1.5e-6 at n_mem=32,
        # thr=1e-8; doubling the period buys nothing below this floor)
        steady_tol = max(100 * threshold, 3e-6)
    elem_tol = max(0.01 * threshold, 1e-10)
    b0, bD, d_of_g = influence_factors(eta, nu, mu)
    m_g = None
    if sector_norm:
        # sector-aware truncation (ptmpo.sector_scales): the stepper iterates
        # on the group-boosted functional so strongly-dephasing sectors keep
        # their Schmidt weight; the emitted tensors are rescaled back below,
        # BEFORE the transfer-eigenvector caps (m_g = 1 on the diagonal
        # group, so the trace closure itself is unchanged)
        m_g = sector_scales(eta, nu, mu)
        b0 = b0 / m_g
    mags = np.abs(eta)
    big = np.where(mags[1:] > eta_cut * mags[0])[0]
    w_eff = min(int(big[-1] + 1) if len(big) else 1, n_mem - 1)
    w_eff = max(w_eff, 1)

    _CAP_TRACK["capped"] = False
    stepper = _make_stepper(b0, bD, d_of_g, w_eff, chi_max, max_period,
                            backend=backend)
    if warm_start and w_eff >= 16 and threshold < 1e-6:
        # Threshold-continuation warm start: the window FILL (w_eff
        # iterations before the first emission) and the initial transient
        # carry no information the attractor keeps, yet at the final
        # threshold they dominate the build (interior construction bonds
        # reach the cap while the converged emission bond is far smaller —
        # measured chi 104-122 interior vs 25 emitted on the bench bath).
        # Run them at 10x the threshold, where the interior ranks — and the
        # per-site SVD cost, which scales with their cube — are much lower,
        # then converge the attractor at the REAL threshold below with
        # detection, locks, and the residual acceptance running fresh from
        # a cleared PYTHON-side history (emitted/spectra/locks start empty;
        # the native stepper keeps its internal emission counter and lag-1
        # truncation records, which only seed the adaptive rsvd RANK TARGET
        # of the first final-threshold iteration — a performance hint, not
        # an accuracy input, since every rsvd rank is residual-checked and
        # escalates to exact on miss).  Every accuracy gate below is
        # unaffected.  MEASURED on
        # the bench bath (biexciton, n_mem 64->56, thr 1e-8, cap 128, 1-core
        # host): cold build 611 s -> 417 s at the same attractor (chi=25,
        # period 1, residual 1.1e-6 -> 1.2e-6).
        warm_thr = threshold * 10
        warm_emits = 0
        warm_budget = 4 * w_eff + 64
        while warm_emits < 8 and warm_budget > 0:
            warm_budget -= 1
            if stepper.step(warm_thr) is not None:
                warm_emits += 1
        if verbose:
            print(f"[ptinf] warm start: window filled + {warm_emits} "
                  f"emissions at {warm_thr:.0e}")
    emitted = []
    spectra = []
    L_win = None
    period = None
    steady = {P: 0 for P in range(1, max_period + 1)}
    drift = float("inf")
    aligned_done = 0
    since_check = 0
    floor_runs = 0
    stall_ref = None
    prev_stall = None
    spec_period = None
    max_iter = max(max_iter_factor * w_eff, w_eff + 60) + align_budget
    it = 0
    while it < max_iter:
        res = stepper.step(threshold)
        it += 1
        if res is None:
            continue
        Q, spec, L_win = res
        emitted.append(Q)
        spectra.append(spec)
        m = len(emitted)
        if period is None:
            # detect the attractor period on the Schmidt spectrum
            def _sdrift(lag):
                a, b = spectra[-1], spectra[-1 - lag]
                k = min(len(a), len(b))
                d = float(np.max(np.abs(a[:k] - b[:k])))
                # rank growth = weight appearing beyond the shared rank.  Use
                # the MAX of the two tails: a new mode above steady_tol in
                # either spectrum is drift (min() was blind to rank growth —
                # the shorter spectrum's tail is 0, masking the new mode)
                tail_a = a[k:].max(initial=0)
                tail_b = b[k:].max(initial=0)
                return d, max(tail_a, tail_b)
            for P in range(1, max_period + 1):
                # slow-transient guard: a long-memory bath's window drifts
                # SLOWLY after the window fills (measured at n_mem=102: lag-1
                # drift passes tol at emission ~10 while the state is still
                # mid-transient — locking there froze chi at 13 and the
                # observables were off by 0.1).  A true attractor is also
                # flat over a LONG lag; require the lag-8P spectrum drift
                # within 3x tol before accepting lag-P steadiness.
                long_lag = 8 * P
                if m <= long_lag:
                    continue
                d, tail = _sdrift(P)
                d_long, tail_long = _sdrift(long_lag)
                if (d <= steady_tol and tail <= steady_tol
                        and d_long <= 3 * steady_tol
                        and tail_long <= 3 * steady_tol):
                    steady[P] += 1
                else:
                    steady[P] = 0
                if steady[P] >= steady_runs:
                    period = P
                    spec_period = P
                    # seed the alignment targets AND the rank locks from
                    # the last P emissions: locking freezes threshold-edge
                    # flicker, making the aligned iteration a smooth map
                    stepper.seed(P)
                    if verbose:
                        print(f"[ptinf] period {P} detected at emission {m} "
                              f"(iter {it}); aligning")
                    break
        else:
            aligned_done += 1
            since_check += 1
            if aligned_done <= 2 * period:
                continue                     # alignment needs a warm-up cycle
            a, b = emitted[-1], emitted[-1 - period]
            # weighted drift: right bonds contracted through the window
            # Schmidt factor (errors in near-weightless directions do not
            # propagate into observables).  Rank flicker between lag-P
            # emissions lives in those weightless directions (measured:
            # n_mem=32 rank wobbles 26..28 forever at Schmidt weight
            # ~1e-6), so differing shapes are zero-padded, with zero
            # weight rows for directions absent from the current window.
            ca = max(a.shape[0], b.shape[0])
            cb = max(a.shape[2], b.shape[2])
            ap = _pad_ab(a, ca, cb)
            bp = _pad_ab(b, ca, cb)
            Lp = np.zeros((cb, L_win.shape[1]), dtype=complex)
            Lp[:L_win.shape[0]] = L_win
            dL = np.einsum('agb,br->agr', ap - bp, Lp)
            aL = np.einsum('agb,br->agr', ap, Lp)
            na = np.linalg.norm(aL)
            drift = float(np.linalg.norm(dL) / (na if na > 0 else 1.0))
            # consecutive checks at/below the noise floor: accept without
            # waiting for the stall heuristics (the stall path accepted the
            # same tolerance, just ~2 stall windows = ~24 iterations later —
            # measured 36 aligned iters -> ~12 on the biexciton bench bath
            # at identical residual class)
            floor_runs = floor_runs + 1 if drift <= steady_tol else 0
            if (drift <= elem_tol
                    or floor_runs >= max(period + 2, 3)
                    or (aligned_done >= align_budget
                        and drift <= steady_tol)):
                break
            # stall -> the elementwise attractor period is a multiple of the
            # spectral one (period-doubled gauge cycle); double and re-key
            if since_check >= max(3 * period, 12):
                stalled = (not np.isfinite(drift)
                           or (stall_ref is not None
                               and drift > 0.5 * stall_ref
                               and drift > 100 * elem_tol))
                if stalled and drift <= steady_tol:
                    break                    # stalled at the noise floor: done
                if (stalled and prev_stall is not None
                        and drift > 0.5 * prev_stall and drift <= 1e-4):
                    break    # doubling didn't move the floor: accept (the
                    #          post-loop ladder warns about the residual)
                if stalled and period < min(8 * spec_period, 32):
                    old = period
                    prev_stall = drift
                    period *= 2
                    stepper.double()
                    align_budget += 4 * period
                    max_iter += 4 * period
                    stall_ref = None
                    if verbose:
                        print(f"[ptinf] lag-{old} drift stalled at "
                              f"{drift:.1e}; elementwise period -> {period}")
                else:
                    stall_ref = drift
                since_check = 0
    import os as _os
    if (_os.environ.get("PYACEQD_TPU_NATIVE_PROF") == "1"
            and hasattr(stepper, "prof")):
        print("[ptinf prof]", {k: (round(v, 2) if isinstance(v, float) else v)
                               for k, v in stepper.prof().items()})
    # acceptance ladder: clean convergence at steady_tol; a stall in
    # (steady_tol, 1e-4] is accepted with a warning — the cycle-junction
    # observable error tracks ~10x the residual (measured: force-accepted
    # resid 2.4e-2 -> error 0.145), so 1e-4 keeps it at ~1e-3, below the
    # documented bond-truncation level of the baths that stall here
    if period is not None and np.isfinite(drift) and steady_tol < drift <= 1e-4:
        import warnings
        warnings.warn(
            f"stationary PT cycle accepted at stalled residual {drift:.1e} "
            f"(period {period}); cycle-junction error ~10x that — fine for "
            f"this bath's documented accuracy envelope, but raise threshold "
            f"or use use_infinite=False for tighter work")
    elif period is None or not np.isfinite(drift) or drift > steady_tol:
        raise RuntimeError(
            f"stationary PT build did not converge in {max_iter} iterations "
            f"(period={period}, drift={drift:.2e}); the bath kernel has no "
            f"stable periodic zip-up fixed point at this threshold — use the "
            f"finite-horizon builder (note: the 'last'-cell tail-absorbed "
            f"kernel is always in this class; the stationary engine requires "
            f"the sharp t_mem cut or the 'onsite' absorption)")
    if m_g is not None:
        # restore the exact influence functional (per-(step, group) constant
        # commutes through the sites); all caps/eigenvector math below then
        # operates on the true tensors
        emitted = [Q * m_g[None, :, None] for Q in emitted]
    # shape guard: adjacent cycle emissions chain by construction; the wrap
    # junction (last -> first repetition) may differ by weightless rank
    # flicker and is closed by the global chi padding below
    cycle = emitted[-period:]
    for j in range(period - 1):
        if cycle[j].shape[2] != cycle[j + 1].shape[0]:
            raise RuntimeError("stationary PT cycle bonds do not chain "
                               f"({[c.shape for c in cycle]})")
    P = period
    R_emit = len(emitted) - P
    if verbose:
        print(f"[ptinf] bulk cycle = emissions {R_emit + 1}..{len(emitted)}: "
              f"period={P}, residual={drift:.2e}")

    # --- stationary caps: physical eigenvector of the cycle transfer -------
    g_diag = int(np.where(np.isclose(nu, mu))[0][0])
    chi = max([max(Q.shape[0], Q.shape[2]) for Q in emitted])
    bulk = np.stack([_pad_to(c, chi) for c in cycle])     # (P, chi, G, chi)
    T = [np.ascontiguousarray(bulk[j][:, g_diag, :]) for j in range(P)]
    Tprod = T[0]
    for j in range(1, P):
        Tprod = Tprod @ T[j]
    # dense eig (the ACE infinite_normalize_iter analogue).  The PHYSICAL
    # trace mode is not always the magnitude-dominant one: spectrally-large
    # modes can live in near-weightless truncation directions.  Select by
    # Schmidt-weighted magnitude |lam| * ||L^T v|| / ||v||, embedding each
    # candidate through the window's left-factor Schmidt weights.
    evals, evecs = np.linalg.eig(Tprod)
    L_bond = L_win        # window Schmidt factor from the final iteration
    L_emb = np.zeros((chi, L_bond.shape[1]), dtype=complex)
    L_emb[:L_bond.shape[0]] = L_bond
    w = (np.linalg.norm(L_emb.T @ evecs, axis=0)
         / np.maximum(np.linalg.norm(evecs, axis=0), 1e-300))
    k = int(np.argmax(np.abs(evals) * w))
    lam = evals[k]
    c0 = evecs[:, k]
    c0 = c0 / c0[np.argmax(np.abs(c0))]
    bulk = bulk / lam ** (1.0 / P)        # cycle transfer eigenvalue exactly 1
    # caps entering each phase: c_j = T_j c_{j+1}, c_P = c_0 (eigenvalue 1)
    cap_bulk = np.empty((P, chi), dtype=complex)
    cap_bulk[0] = c0
    for j in range(P - 1, 0, -1):
        nxt = cap_bulk[(j + 1) % P]
        cap_bulk[j] = (bulk[j][:, g_diag, :] @ nxt)

    # --- initial segment ----------------------------------------------------
    # true chain = Q_1 .. Q_R, then the cycle repeats (emissions chain
    # exactly by construction).  Pad ragged transient shapes to chi.
    K = R_emit
    init = [_pad_to(emitted[m], chi) for m in range(K)]
    G = bulk.shape[2]
    init_stack = (np.stack(init) if init
                  else np.zeros((0, chi, G, chi), dtype=complex))

    # --- caps over the init segment (backward from cap_bulk[0]), balanced --
    caps = np.empty((K + 1, chi), dtype=complex)
    caps[K] = cap_bulk[0]
    for m in range(K - 1, -1, -1):
        v = init_stack[m][:, g_diag, :] @ caps[m + 1]
        s = np.max(np.abs(v))
        s = s if s > 0 else 1.0
        init_stack[m] = init_stack[m] / s
        caps[m] = v / s
    # global anchor: Tr rho(0) = 1 -> caps[0][0] = 1 (a global scalar on all
    # caps rows including the bulk caps — consistent for every readout row)
    z = caps[0][0]
    caps = caps / z
    cap_bulk = cap_bulk / z

    if chi >= chi_max:
        import warnings
        warnings.warn(
            f"stationary PT build saturated chi_max={chi_max}: bond "
            f"truncation, not the SVD threshold, now limits accuracy "
            f"(see docs/accuracy.md).  Raise chi_max.")
    capped = stepper.capped() if hasattr(stepper, "capped") else None
    if capped is None:
        capped = bool(_CAP_TRACK["capped"])
    return StationaryPT(init_stack=init_stack, init_caps=caps[:K],
                        bulk=bulk, cap_bulk=cap_bulk,
                        g_of_s=np.asarray(g_of_s, dtype=np.int32),
                        counter_term=np.asarray(counter_term), chi=chi,
                        n_mem=n_mem, build_residual=float(drift),
                        n_mem_req=n_mem_req, capped=capped)


def _pad_to(T, chi):
    a, g, b = T.shape
    out = np.zeros((chi, g, chi), dtype=complex)
    out[:a, :, :b] = T
    return out


def _pad_ab(T, ca, cb):
    a, g, b = T.shape
    out = np.zeros((ca, g, cb), dtype=complex)
    out[:a, :, :b] = T
    return out


# ---------------------------------------------------------------------------
# device propagation (uniform bulk: scan body closes over the P-cycle)
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
    scan whose body closes over the P bulk tensors (no per-step xs for the
    PT), so the horizon is unbounded at O(1) PT memory (the device twin of
    ACE's use_Gaussian_repeat/use_Gaussian_infinite propagation)."""
    n = U.shape[0]
    d = U.shape[1]
    d2 = d * d
    chi = bulk.shape[1]
    P = bulk.shape[0]
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

    Qs_bulk = bulk[:, :, g_of_s, :]     # (P, chi, d2, chi), closed over

    def body_bulk(A, xs):
        Uk, k = xs
        ph = (k - K) % P
        A = apply_mtos(A, k, True)
        y = W @ (cap_bulk[ph] @ A)
        A = apply_mtos(A, k, False)
        A = sys_step(A, Uk)
        A = jnp.einsum('asb,as->bs', Qs_bulk[ph], A)
        return A, y

    A_f, ys2 = jax.lax.scan(body_bulk, A1, (U[K:], ks[K:]))
    A_f = apply_mtos(A_f, jnp.int32(n), True)
    y_last = W @ (cap_bulk[(n - K) % P] @ A_f)
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
    chi = bulk.shape[1]
    P = bulk.shape[0]
    K = init_stack.shape[0]
    n_mto = len(mto_before)
    Qs_bulk = bulk[:, :, g_of_s, :]

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
            ph = (k - K) % P
            A = apply_mtos(A, k, True)
            y = W @ (cap_bulk[ph] @ A)
            A = apply_mtos(A, k, False)
            A = sys_step(A, Uk)
            return jnp.einsum('asb,as->bs', Qs_bulk[ph], A), y

        A0 = jnp.zeros((chi, d2), dtype=rho0_vec.dtype).at[0].set(rho0_vec)
        ks = jnp.arange(n, dtype=jnp.int32)
        A1, ys1 = jax.lax.scan(body_init, A0,
                               (U[:K], init_stack, init_caps, ks[:K]))
        A_f, ys2 = jax.lax.scan(body_bulk, A1, (U[K:], ks[K:]))
        A_f = apply_mtos(A_f, jnp.int32(n), True)
        outputs = jnp.concatenate(
            [ys1, ys2, (W @ (cap_bulk[(n - K) % P] @ A_f))[None]], axis=0)
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
                  chi_max, fingerprint, verbose=False, sector_norm=False,
                  window_tol="auto"):
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
                build_residual=float(z["residual"]),
                n_mem_req=int(z["n_mem_req"]) if "n_mem_req" in z.files
                else int(z["n_mem"]),
                capped=bool(z["capped"]) if "capped" in z.files else False)
    if verbose:
        print("{} not found. Calculating stationary PT...".format(path))
    if chi_max == 0:
        # ACE threshold-only semantics (no cap in the vocabulary): escalate
        # the cap until it stops binding (ptmpo._unbounded_build)
        from pyaceqd_tpu.engine.ptmpo import _unbounded_build
        pt = _unbounded_build(lambda cap: build_stationary_pt(
            eta, g_of_s, nu, mu, counter_term, threshold=threshold,
            chi_max=cap, verbose=verbose, sector_norm=sector_norm,
            window_tol=window_tol))
    else:
        pt = build_stationary_pt(eta, g_of_s, nu, mu, counter_term,
                                 threshold=threshold, chi_max=chi_max,
                                 verbose=verbose, sector_norm=sector_norm,
                                 window_tol=window_tol)
    try:
        np.savez(path, init_stack=pt.init_stack, init_caps=pt.init_caps,
                 bulk=pt.bulk, cap_bulk=pt.cap_bulk, g_of_s=pt.g_of_s,
                 counter=pt.counter_term, chi=pt.chi, n_mem=pt.n_mem,
                 residual=pt.build_residual, fingerprint=fingerprint,
                 n_mem_req=pt.n_mem_req, capped=pt.capped)
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
