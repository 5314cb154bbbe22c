"""Native (C++/LAPACK) PT-MPO builder vs the pure-numpy implementation.

The two backends produce gauge-different but physically identical process
tensors; equality is checked on propagated observables (gauge-invariant).
Skipped when the shared library cannot be built/loaded."""

import numpy as np
import pytest
from scipy.linalg import expm

from pyaceqd_tpu import native
from pyaceqd_tpu.constants import hbar
from pyaceqd_tpu.engine import ptmpo, spectral

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native ptmpo library unavailable")


def _assemble(tensors, nu, mu, n_mem):
    g_diag = int(np.where(np.isclose(nu, mu))[0][0])
    chi = max(max(t.shape[0], t.shape[2]) for t in tensors)
    stack = np.stack([ptmpo._pad(t, chi) for t in tensors])
    caps = np.zeros((len(tensors) + 1, chi), dtype=complex)
    caps[len(tensors), 0] = 1.0
    for m in range(len(tensors) - 1, -1, -1):
        caps[m] = stack[m][:, g_diag, :] @ caps[m + 1]
    caps = caps / caps[0][0]
    return ptmpo.ProcessTensor(stack=stack, caps=caps,
                               g_of_s=np.arange(len(nu)),
                               counter_term=np.zeros((2, 2)), chi=chi,
                               n_mem=n_mem)


@pytest.fixture(scope="module")
def eta():
    J = spectral.QDPhononJ(ae=3.0)
    return spectral.eta_coefficients(J, 0.1, 16, 4.0)


def test_native_matches_numpy_dynamics(eta):
    ev = np.array([0.0, 1.0])
    nu, mu = np.repeat(ev, 2), np.tile(ev, 2)
    n = 30
    ref = ptmpo.build_pt_tensors(eta, nu, mu, n, threshold=1e-8, chi_max=64)
    nat = native.build_pt_tensors_native(eta, nu, mu, n, threshold=1e-8,
                                         chi_max=64)
    assert nat is not None and len(nat) == n
    ref_pt = _assemble(ref, nu, mu, len(eta))
    nat_pt = _assemble(nat, nu, mu, len(eta))

    dt = 0.1
    om = np.pi / (n * dt) / 2
    H = np.array([[0, 1], [1, 0]], dtype=complex)
    U = np.stack([expm(-1j * dt / hbar * (0.5 * hbar * om * H))] * n)
    rho0 = np.array([1, 0, 0, 0], dtype=complex)
    W = np.zeros((2, 4), dtype=complex)
    W[0, 0] = 1
    W[1, 3] = 1
    outs = []
    for pt in (ref_pt, nat_pt):
        ys, _ = ptmpo.propagate_pt(pt, U, None, rho0, W,
                                   np.zeros((0, 4, 4)), np.zeros(0, np.int32))
        outs.append(np.real(np.asarray(ys)))
    assert np.max(np.abs(outs[0] - outs[1])) < 1e-8
    # trace preserved on both
    assert np.allclose(outs[1].sum(axis=1), 1.0, atol=1e-6)


def test_native_bond_dims_bounded(eta):
    ev = np.array([0.0, 1.0])
    nu, mu = np.repeat(ev, 2), np.tile(ev, 2)
    nat = native.build_pt_tensors_native(eta, nu, mu, 25, threshold=1e-7,
                                         chi_max=16)
    assert all(t.shape[0] <= 16 and t.shape[2] <= 16 for t in nat)
    assert nat[0].shape[0] == 1 and nat[-1].shape[2] == 1


def test_env_var_disables_native(eta, monkeypatch):
    monkeypatch.setenv("PYACEQD_TPU_NATIVE", "0")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    assert native.get_lib() is None
    monkeypatch.setattr(native, "_TRIED", False)


def test_native_rsvd_path_matches_numpy(monkeypatch):
    """Parity at shapes that actually TRIGGER the finite builder's m-gated
    randomized-SVD path (ADVICE r4: the default chi_max=64 small-bath case
    never reaches the m > 2*(chi_max+32) gate, leaving the rsvd zip path
    untested against the all-exact numpy twin).  A weight-2 (biexciton-like)
    coupling at chi_max=24 fires the gate hundreds of times (stats.rsvd_n,
    counted in native pt_build2); observables must still match the numpy
    builder to the truncation level.

    Since the r5 adjudication the finite path is ALL-EXACT by default (the
    golden artifacts pin the exact path); the randomized zip is the
    PYACEQD_TPU_NATIVE_RSVD=1 opt-in exercised here."""
    monkeypatch.setenv("PYACEQD_TPU_NATIVE_RSVD", "1")
    J = spectral.QDPhononJ(ae=3.0)
    eta = spectral.eta_coefficients(J, 0.1, 24, 4.0)
    ev = np.array([0.0, 1.0, 1.0, 2.0])
    nu, mu = np.repeat(ev, 4), np.tile(ev, 4)
    n = 30
    stats = {}
    nat = native.build_pt_tensors_native(eta, nu, mu, n, threshold=1e-8,
                                         chi_max=24, stats=stats)
    assert nat is not None
    assert stats["rsvd_n"] > 0, (
        "rsvd gate did not fire at these shapes — the test no longer covers "
        "the randomized path; shrink chi_max or grow the coupling weights")
    ref = ptmpo.build_pt_tensors(eta, nu, mu, n, threshold=1e-8, chi_max=24)
    ref_pt = _assemble(ref, nu, mu, len(eta))
    nat_pt = _assemble(nat, nu, mu, len(eta))

    dt = 0.1
    d = 4
    om = np.pi / (n * dt) / 2
    H = np.zeros((d, d), dtype=complex)
    H[0, 1] = H[1, 0] = H[1, 3] = H[3, 1] = 1.0
    U = np.stack([expm(-1j * dt / hbar * (0.5 * hbar * om * H))] * n)
    rho0 = np.eye(d, dtype=complex).reshape(-1) / d
    W = np.zeros((2, d * d), dtype=complex)
    W[0, 0] = 1
    W[1, 5] = 1
    outs = []
    for pt in (ref_pt, nat_pt):
        ys, _ = ptmpo.propagate_pt(pt, U, None, rho0, W,
                                   np.zeros((0, d * d, d * d)),
                                   np.zeros(0, np.int32))
        outs.append(np.real(np.asarray(ys)))
    # both builds are capped at chi_max=24 (truncation-limited); the two
    # backends' truncation bases differ, so parity holds at the truncation
    # level, not machine precision
    assert np.max(np.abs(outs[0] - outs[1])) < 5e-4


def test_native_stationary_matches_numpy():
    """Stationary (ptinf) build: the native stepper and the numpy stepper
    converge to the same attractor — same chi / period / init length, same
    Schmidt structure, and the propagated dephasing observable agrees (the
    two backends differ only by truncation-basis gauge)."""
    from pyaceqd_tpu.engine import ptinf

    J = spectral.QDPhononJ(ae=3.0)
    eta = spectral.eta_coefficients(J, 0.1, 12, 4.0, absorb_tail="onsite")
    ev = np.array([0.0, 1.0])
    nu, mu = np.repeat(ev, 2), np.tile(ev, 2)
    g_of_s = np.arange(4, dtype=np.int32)
    counter = np.zeros((2, 2))
    pts = {}
    for bk in ("numpy", "native"):
        pts[bk] = ptinf.build_stationary_pt(eta, g_of_s, nu, mu, counter,
                                            threshold=1e-8, chi_max=64,
                                            backend=bk)
    a, b = pts["numpy"], pts["native"]
    # same attractor capacity; the detected gauge period may differ by a
    # power of two between backends (distinct-but-valid builds: measured
    # numpy P=4 @ resid 6.5e-6 vs native P=2 @ 9.4e-11 on this bath)
    assert a.chi == b.chi
    assert {a.period, b.period} <= {1, 2, 4, 8, 16, 32}
    assert a.build_residual <= 1e-4 and b.build_residual <= 1e-4
    # gauge-invariant: propagated pure-dephasing observable (free evolution)
    n = 60
    U = np.stack([np.eye(2, dtype=complex)] * n)
    rho0 = np.array([0.5, 0.5, 0.5, 0.5], dtype=complex)
    W = np.zeros((1, 4), dtype=complex)
    W[0, 1] = 1.0  # rho_01 coherence
    outs = []
    for pt in (a, b):
        ys, _ = ptinf.propagate_ptinf(pt, U, None, rho0, W,
                                      np.zeros((0, 4, 4)),
                                      np.zeros(0, np.int32))
        outs.append(np.asarray(ys)[:, 0])
    # bounded by the worse build's cycle-junction error (~10x its residual)
    tol = 20 * max(a.build_residual, b.build_residual, 1e-7)
    assert np.max(np.abs(outs[0] - outs[1])) < tol


def test_long_horizon_build_stays_finite(eta):
    """>=1000-step finite builds must not overflow float64: the chain norm
    grows ~3x/step, and before the power-of-two norm strip a tb=100 referee
    fallback build went inf -> zgesdd info=4 -> NaN tensors (r5).  tile_tol=0
    forces the full horizon so the strip path is actually exercised."""
    ev = np.array([0.0, 1.0])
    nu, mu = np.repeat(ev, 2), np.tile(ev, 2)
    n = 1100
    for build in (ptmpo.build_pt_tensors,
                  lambda *a, **k: native.build_pt_tensors_native(*a, **k)):
        out = build(eta, nu, mu, n, threshold=1e-7, chi_max=12, tile_tol=0)
        if out is None:   # native lib unavailable -> numpy already covered
            continue
        assert len(out) == n
        assert all(np.all(np.isfinite(t)) for t in out)
