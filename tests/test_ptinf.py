"""Stationary (repeated/infinite) PT engine gates (engine/ptinf.py).

Small bath for speed: t_mem = 1.6, dt = 0.1 -> n_mem = 16.  Anchors:
- the finite-horizon chain (independent construction path),
- the exact IBM pure-dephasing solution,
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

d = 2
hbar = 0.6582119569


@pytest.fixture(scope="module")
def bath():
    B = np.diag([0.0, 1.0])
    g_of_s, nu, mu = ptmpo.liouville_groups(B)
    J = spectral.QDPhononJ(ae=AE)
    n_mem = max(2, int(round(TMEM / DT)))
    eta = spectral.eta_coefficients(J, DT, n_mem, TEMP)
    return J, eta, g_of_s, nu, mu


@pytest.fixture(scope="module")
def pt_pair(bath):
    J, eta, g_of_s, nu, mu = bath
    counter = np.zeros((2, 2))
    pt_fin = ptmpo.assemble_process_tensor(eta, g_of_s, nu, mu, counter, N,
                                           threshold=1e-8, chi_max=64)
    pt_sta = ptinf.build_stationary_pt(eta, g_of_s, nu, mu, counter,
                                       threshold=1e-8, chi_max=64)
    return pt_fin, pt_sta


def _setup():
    from scipy.linalg import expm
    H = np.array([[0.0, 0.25], [0.25, 0.5]]) / hbar
    U = np.broadcast_to(expm(-1j * H * DT), (N, d, d)).copy()
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


def test_stationary_matches_finite_chain(pt_pair):
    """Driven TLS observables from the stationary PT agree with the
    independent finite-horizon chain to the truncation accuracy."""
    pt_fin, pt_sta = pt_pair
    U, rho0, W, mto, mks = _setup()
    of, _ = ptmpo.propagate_pt(pt_fin, U, None, rho0.reshape(-1), W, mto, mks)
    oi, _ = ptmpo.propagate_pt(pt_sta, U, None, rho0.reshape(-1), W, mto, mks)
    assert np.max(np.abs(np.asarray(of) - np.asarray(oi))) < 5e-5
    # trace preserved on both
    assert np.max(np.abs(np.asarray(oi)[:, 0] - 1)) < 1e-5


def test_stationary_ibm_exact(bath, pt_pair):
    """Undriven pure dephasing reproduces the exact IBM solution."""
    J, *_ = bath
    _, pt_sta = pt_pair
    _, _, W, mto, mks = _setup()
    U_id = np.broadcast_to(np.eye(d), (N, d, d)).copy()
    rho_plus = 0.5 * np.ones((d, d), dtype=complex)
    out, _ = ptmpo.propagate_pt(pt_sta, U_id, None, rho_plus.reshape(-1), W,
                                mto, mks)
    t = DT * np.arange(1, N + 1)
    exact = 0.5 * spectral.ibm_dephasing(J, t, TEMP, subtract_polaron=False)
    # t_mem=1.6 truncates the (slow power-law) kernel tail, which shows up
    # mostly as a linear-in-t polaron-phase drift; gate the dephasing
    # MAGNITUDE (the physical decay), which truncation affects only mildly
    got = np.asarray(out)[1:, 2]
    assert np.max(np.abs(np.abs(got) - np.abs(exact))) < 5e-3
    # long-time coherence magnitude is flat (pure dephasing plateau)
    mag = np.abs(np.asarray(out)[1:, 2])
    assert np.max(np.abs(mag[100:] - mag[-1])) < 1e-3


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
    assert np.max(np.abs(out[:, 0] - 1)) < 1e-6
    assert np.all(np.isfinite(np.abs(out)))


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
    assert np.max(np.abs(np.asarray(of) - np.asarray(oi))) < 5e-5
