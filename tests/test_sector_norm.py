"""Sector-aware truncation (ptmpo.sector_scales, VERDICT r2 item 5).

The build runs on a group-boosted influence functional (onsite factor
scaled by exp(+dnu^2 * window-averaged kernel)) and the emitted tensors are
rescaled back, so the result must be EXACTLY the same influence functional —
gated here against the closed-form discrete-kernel dephasing for every
Liouville sector of the darkmodel coupling diag(0,1,1,2).
"""

import numpy as np
import pytest

from pyaceqd_tpu.engine import ptinf, ptmpo, spectral

DT = 0.2
TEMP = 4.0
AE = 3.0
D = 4


def exact_sector_dephasing(eta, n_mem, n, nu_g, mu_g):
    """exp(-G_n) for a path constant in Liouville group (nu_g, mu_g):
    G_n = dnu [n (eta_0 nu - eta_0* mu) + sum_d (n-d)(eta_d nu - eta_d* mu)]."""
    dnu = nu_g - mu_g
    A = lambda e: dnu * (e * nu_g - np.conj(e) * mu_g)
    G = np.zeros(n, dtype=complex)
    for nn in range(1, n + 1):
        s = nn * A(eta[0])
        for dd in range(1, min(nn - 1, n_mem - 1) + 1):
            s += (nn - dd) * A(eta[dd])
        G[nn - 1] = s
    return np.exp(-G)


@pytest.fixture(scope="module")
def bath():
    B = np.diag([0.0, 1.0, 1.0, 2.0])
    g_of_s, nu, mu = ptmpo.liouville_groups(B)
    J = spectral.QDPhononJ(ae=AE)
    n_mem = 4
    eta = spectral.eta_coefficients(J, DT, n_mem, TEMP, absorb_tail=False)
    return eta, g_of_s, nu, mu, n_mem


def _static_run(pt, n):
    U = np.broadcast_to(np.eye(D), (n, D, D)).copy()
    rho0 = np.full((D, D), 1.0 / D, dtype=complex)
    W = np.eye(D * D, dtype=complex)
    out, _ = ptmpo.propagate_pt(pt, U, None, rho0.reshape(-1), W,
                                np.zeros((0, D * D, D * D)),
                                np.zeros((0,), np.int32))
    return np.asarray(out)


def _worst_err(out, eta, g_of_s, nu, mu, n_mem, n):
    errs = []
    for s in range(D * D):
        g = g_of_s[s]
        exact = (1.0 / D) * exact_sector_dephasing(eta, n_mem, n, nu[g], mu[g])
        errs.append(np.max(np.abs(out[1:, s] - exact)))
    return max(errs)


def test_sector_scales_bounds(bath):
    eta, g_of_s, nu, mu, n_mem = bath
    m = ptmpo.sector_scales(eta, nu, mu)
    assert np.all(m <= 1.0 + 1e-15) and np.all(m > 0)
    # diagonal groups are untouched (trace closure invariant)
    diag = np.isclose(nu, mu)
    assert np.allclose(m[diag], 1.0)
    # higher |nu - mu| gets the stronger boost
    dnu = np.abs(nu - mu)
    assert m[np.argmax(dnu)] == m.min()


def test_finite_sector_norm_exact(bath):
    """Tight threshold: sector_norm must reproduce the exact discrete-kernel
    dephasing (the boost/compensation is an identity on the functional)."""
    eta, g_of_s, nu, mu, n_mem = bath
    n = 12
    pt = ptmpo.assemble_process_tensor(eta, g_of_s, nu, mu, np.zeros((D, D)),
                                       n, threshold=1e-13, chi_max=256,
                                       sector_norm=True)
    out = _static_run(pt, n)
    assert _worst_err(out, eta, g_of_s, nu, mu, n_mem, n) < 1e-10


def test_stationary_sector_norm_exact(bath):
    eta, g_of_s, nu, mu, n_mem = bath
    n = 12
    pt = ptinf.build_stationary_pt(eta, g_of_s, nu, mu, np.zeros((D, D)),
                                   threshold=1e-12, chi_max=256,
                                   align_budget=40, sector_norm=True)
    out = _static_run(pt, n)
    assert _worst_err(out, eta, g_of_s, nu, mu, n_mem, n) < 1e-9
