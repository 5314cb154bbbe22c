"""Stationary (repeated/infinite) PT engine gates (engine/ptinf.py).

The stationary builder requires the SHARP t_mem kernel cut (ACE's exact
``t_mem`` semantics): the tail-absorbed kernel (the finite engine's accuracy
default) has no stable periodic zip-up fixed point — see the engine/ptinf.py
module docstring.  Anchors:
- the finite-horizon chain on the same sharp kernel (independent construction
  path): agreement to truncation accuracy mid-chain; the last ~n_mem steps
  legitimately differ (finite chain's flushed frontier vs infinite tail),
- the EXACT discrete truncated-kernel pure-dephasing solution
  rho_10(n) = rho_10(0) * exp(-[n eta_0 + sum_d (n-d) eta_d]), tight on a
  small bath at tight threshold (absolute-correctness anchor), loose at the
  working threshold (truncation error accumulates ~5e-5/step at thr=1e-8
  for this slowly-decaying kernel — measured, see NOTES_round2.md),
- internal consistency: uniform two-scan device core vs materialized stack.
"""

import numpy as np
import pytest

from pyaceqd_tpu.engine import ptinf, ptmpo, spectral

DT = 0.1
TMEM = 1.6
TEMP = 4.0
AE = 3.0
N = 200
N_MEM = max(2, int(round(TMEM / DT)))

d = 2
hbar = 0.6582119569


def discrete_dephasing(eta, n_mem, n):
    """Exact rho_10(t_n)/rho_10(0) for the DISCRETE truncated QUAPI kernel:
    path integral with s=1/s'=0 fixed gives exp(-G_n) with
    G_n = n eta_0 + sum_{d=1}^{min(n-1, n_mem-1)} (n-d) eta_d."""
    G = np.zeros(n, dtype=complex)
    for nn in range(1, n + 1):
        s = nn * eta[0]
        for dd in range(1, min(nn - 1, n_mem - 1) + 1):
            s += (nn - dd) * eta[dd]
        G[nn - 1] = s
    return np.exp(-G)


@pytest.fixture(scope="module")
def bath():
    B = np.diag([0.0, 1.0])
    g_of_s, nu, mu = ptmpo.liouville_groups(B)
    J = spectral.QDPhononJ(ae=AE)
    eta = spectral.eta_coefficients(J, DT, N_MEM, TEMP, absorb_tail=False)
    return J, eta, g_of_s, nu, mu


@pytest.fixture(scope="module")
def pt_pair(bath):
    J, eta, g_of_s, nu, mu = bath
    counter = np.zeros((2, 2))
    pt_fin = ptmpo.assemble_process_tensor(eta, g_of_s, nu, mu, counter, N,
                                           threshold=1e-8, chi_max=64)
    pt_sta = ptinf.build_stationary_pt(eta, g_of_s, nu, mu, counter,
                                       threshold=1e-8, chi_max=64,
                                       align_budget=40)
    return pt_fin, pt_sta


def _setup(n=N):
    from scipy.linalg import expm
    H = np.array([[0.0, 0.25], [0.25, 0.5]]) / hbar
    U = np.broadcast_to(expm(-1j * H * DT), (n, d, d)).copy()
    rho0 = np.zeros((d, d), dtype=complex)
    rho0[0, 0] = 1.0
    W = np.zeros((4, 4), dtype=complex)
    W[0] = np.eye(d).reshape(-1)
    W[1, 3] = 1.0
    W[2, 1] = 1.0
    W[3, 0] = 1.0
    mto = np.zeros((0, 4, 4))
    mks = np.zeros((0,), np.int32)
    return U, rho0, W, mto, mks


def test_stationary_build_shape(pt_pair):
    _, pt_sta = pt_pair
    assert pt_sta.build_residual < 3e-7          # 30 * threshold
    assert pt_sta.period >= 1
    assert pt_sta.bulk.shape == (pt_sta.period, pt_sta.chi,
                                 pt_sta.bulk.shape[2], pt_sta.chi)


def test_stationary_matches_finite_chain(pt_pair):
    """Driven TLS observables from the stationary PT agree with the
    independent finite-horizon chain to the truncation accuracy mid-chain;
    the final ~n_mem steps carry the boundary-semantics difference."""
    pt_fin, pt_sta = pt_pair
    U, rho0, W, mto, mks = _setup()
    of, _ = ptmpo.propagate_pt(pt_fin, U, None, rho0.reshape(-1), W, mto, mks)
    oi, _ = ptmpo.propagate_pt(pt_sta, U, None, rho0.reshape(-1), W, mto, mks)
    diff = np.max(np.abs(np.asarray(of) - np.asarray(oi)), axis=1)
    # 1.5e-5 measured: the two truncated constructions each carry ~1e-5
    # truncation error vs the exact kernel at thr=1e-8 (insensitive to
    # align_budget, so NOT bulk-residual accumulation)
    assert diff[:-N_MEM].max() < 5e-5
    assert diff.max() < 5e-4
    # trace preserved
    assert np.max(np.abs(np.asarray(oi)[:, 0] - 1)) < 1e-4


def test_stationary_exact_small_bath():
    """Absolute-correctness anchor: tiny bath (n_mem=4) at tight threshold
    reproduces the exact discrete-kernel dephasing to near machine level."""
    n_mem, n = 4, 60
    B = np.diag([0.0, 1.0])
    g_of_s, nu, mu = ptmpo.liouville_groups(B)
    J = spectral.QDPhononJ(ae=AE)
    eta = spectral.eta_coefficients(J, DT, n_mem, TEMP, absorb_tail=False)
    pt = ptinf.build_stationary_pt(eta, g_of_s, nu, mu, np.zeros((2, 2)),
                                   threshold=1e-12, chi_max=128,
                                   align_budget=40)
    _, _, W, mto, mks = _setup(n)
    U_id = np.broadcast_to(np.eye(d), (n, d, d)).copy()
    rho_plus = 0.5 * np.ones((d, d), dtype=complex)
    out, _ = ptmpo.propagate_pt(pt, U_id, None, rho_plus.reshape(-1), W,
                                mto, mks)
    exact = np.conj(0.5 * discrete_dephasing(eta, n_mem, n))
    got = np.asarray(out)[1:, 2]            # rho_10 readout
    assert np.max(np.abs(got - exact)) < 1e-7


def test_stationary_discrete_kernel(bath, pt_pair):
    """Working-threshold bath vs the exact discrete-kernel solution: the
    deviation is the documented truncation accumulation (~5e-5/step at
    thr=1e-8), not a construction error."""
    _, eta, *_ = bath
    _, pt_sta = pt_pair
    _, _, W, mto, mks = _setup()
    U_id = np.broadcast_to(np.eye(d), (N, d, d)).copy()
    rho_plus = 0.5 * np.ones((d, d), dtype=complex)
    out, _ = ptmpo.propagate_pt(pt_sta, U_id, None, rho_plus.reshape(-1), W,
                                mto, mks)
    exact = np.conj(0.5 * discrete_dephasing(eta, N_MEM, N))
    got = np.asarray(out)[1:, 2]
    assert np.max(np.abs(got - exact)) < 5e-2
    assert np.max(np.abs(got[:30] - exact[:30])) < 2e-3


def test_uniform_core_equals_materialized(pt_pair):
    """The two-scan uniform device core and the stacked core on the
    materialized PT are the same program mathematically."""
    _, pt_sta = pt_pair
    U, rho0, W, mto, mks = _setup()
    o_uni, _ = ptinf.propagate_ptinf(pt_sta, U, None, rho0.reshape(-1), W,
                                     mto, mks)
    o_mat, _ = ptmpo.propagate_pt(pt_sta.materialize(N), U, None,
                                  rho0.reshape(-1), W, mto, mks)
    assert np.max(np.abs(np.asarray(o_uni) - np.asarray(o_mat))) < 1e-12


def test_long_horizon_stable(pt_pair):
    """A 4000-step undriven run stays normalized and bounded (f64): the bulk
    transfer is normalized to unit dominant eigenvalue, so neither the caps
    nor the forward state grow with the horizon."""
    _, pt_sta = pt_pair
    n_long = 4000
    U_id = np.broadcast_to(np.eye(d), (n_long, d, d)).copy()
    rho0 = np.diag([0.3, 0.7]).astype(complex)
    W = np.zeros((2, 4), dtype=complex)
    W[0] = np.eye(d).reshape(-1)
    W[1, 3] = 1.0
    out, _ = ptinf.propagate_ptinf(
        pt_sta, U_id, None, rho0.reshape(-1), W,
        np.zeros((0, 4, 4)), np.zeros((0,), np.int32))
    out = np.asarray(out)
    # plateau ~3e-5 (junction transient; does NOT grow with horizon)
    assert np.max(np.abs(out[:, 0] - 1)) < 1e-4
    assert np.all(np.isfinite(np.abs(out)))


def test_window_reduction_metric():
    """Automatic window reduction (ptinf._reduce_window): the QD superohmic
    kernel at darkmodel scale (t_mem=20.48, dt=0.2 -> n_mem=102) physically
    decays in ~6.5 ps; the exact constant-path metric certifies a ~30-site
    window at 1e-6 while a tight tolerance refuses to reduce."""
    B = np.diag([0.0, 1.0, 1.0, 2.0])
    g_of_s, nu, mu = ptmpo.liouville_groups(B)
    J = spectral.QDPhononJ(ae=AE)
    eta = spectral.eta_coefficients(J, 0.2, 102, TEMP, absorb_tail="onsite")
    red, m = ptinf._reduce_window(eta, nu, mu, 1e-6)
    assert m <= 40
    assert len(red) == m
    # the dropped tail is folded onsite: total kernel mass is preserved
    assert np.isclose(red.sum(), eta.sum(), rtol=0, atol=1e-14 * abs(eta[0]))
    # the chosen window verifies directly against the exact metric
    assert ptinf._window_error(eta, nu, mu, m) < 1e-6
    # tight tolerance: no reduction (bit-compatibility with tight-threshold
    # builds is governed by window_tol = 100 * threshold)
    _, m_tight = ptinf._reduce_window(eta, nu, mu, 1e-8)
    assert m_tight == 102


def test_window_reduction_exact_driven():
    """End-to-end: a kernel with a fast decay plus a negligible tail must
    auto-reduce AND still reproduce the FULL kernel's exact discrete
    dephasing (the reduction is an onsite re-absorption, whose constant-path
    error is exactly what _window_error certifies)."""
    n_mem = 24
    d_idx = np.arange(n_mem)
    eta = 0.04 * np.exp(-d_idx / 1.5) * (1 + 0.3j)
    eta[8:] = 1e-10 * (1 + 1j)      # plateau: physically negligible tail
    B = np.diag([0.0, 1.0])
    g_of_s, nu, mu = ptmpo.liouville_groups(B)
    pt = ptinf.build_stationary_pt(eta, g_of_s, nu, mu, np.zeros((2, 2)),
                                   threshold=1e-12, chi_max=64,
                                   window_tol=1e-7, align_budget=40)
    assert pt.n_mem < n_mem
    assert pt.n_mem_req == n_mem
    n = 80
    _, _, W, mto, mks = _setup(n)
    U_id = np.broadcast_to(np.eye(d), (n, d, d)).copy()
    rho_plus = 0.5 * np.ones((d, d), dtype=complex)
    out, _ = ptmpo.propagate_pt(pt, U_id, None, rho_plus.reshape(-1), W,
                                mto, mks)
    exact = np.conj(0.5 * discrete_dephasing(eta, n_mem, n))
    got = np.asarray(out)[1:, 2]
    assert np.max(np.abs(got - exact)) < 1e-6


def test_tls_default_routes_stationary(tmp_path):
    """End-to-end wiring: tls() with phonons defaults to use_infinite=True,
    which must build/cache a StationaryPT (own _ptinf_*.npz file), route
    through the uniform device core, and stay close to the finite engine
    (the onsite-vs-last tail-absorption offset dominates at t_mem=1.6)."""
    import glob
    from pyaceqd_tpu.models.tls import tls
    kw = dict(dt=DT, phonons=True, t_mem=TMEM, ae=AE, temperature=TEMP,
              temp_dir=str(tmp_path), threshold=8, lindblad=False,
              rho0=np.array([[0.5, 0.5], [0.5, 0.5]], dtype=complex))
    r_inf = tls(0, 8.0, **kw)                        # default use_infinite
    assert glob.glob(str(tmp_path) + "/*_ptinf_*.npz")
    r_fin = tls(0, 8.0, use_infinite=False, **kw)
    # trace
    assert np.max(np.abs((r_inf[1] + r_inf[2]).real - 1)) < 1e-4
    # same dephasing physics to the documented kernel-offset level
    assert np.max(np.abs(np.abs(r_inf[3]) - np.abs(r_fin[3]))) < 5e-2
    # cache hit on rerun: identical
    r_inf2 = tls(0, 8.0, **kw)
    assert np.allclose(np.asarray(r_inf, dtype=complex),
                       np.asarray(r_inf2, dtype=complex))


def test_mto_insertion_matches_finite(pt_pair):
    """Branch insertion (G1-style sigma at t1) through the stationary PT
    agrees with the finite chain."""
    pt_fin, pt_sta = pt_pair
    U, rho0, W, _, _ = _setup()
    sm = np.array([[0, 1], [0, 0]], dtype=complex)    # |0><1|
    sop = np.kron(sm, np.eye(d))                      # apply from left
    mto = np.stack([sop])
    mks = np.array([60], dtype=np.int32)
    of, _ = ptmpo.propagate_pt(pt_fin, U, None, rho0.reshape(-1), W, mto, mks,
                               mto_before=(False,), mto_mode=("_left",))
    oi, _ = ptmpo.propagate_pt(pt_sta, U, None, rho0.reshape(-1), W, mto, mks,
                               mto_before=(False,), mto_mode=("_left",))
    diff = np.max(np.abs(np.asarray(of) - np.asarray(oi)), axis=1)
    assert diff[:-N_MEM].max() < 5e-5
    assert diff.max() < 5e-4
