"""ACE threshold-only (unbounded chi) semantics via cap escalation.

ACE has no chi cap in its vocabulary — ``threshold`` alone governs the bond
dimension (reference general_system.py:161-174).  chi_max=0 emulates that by
doubling the cap until it stops binding (ptmpo._unbounded_build); "binding"
is the honest per-truncation flag (ProcessTensor.capped), not the emitted
bond dims — interior window bonds can hit the cap while the emitted bond
stays below it (measured: cap=64 and cap=128 builds both emitting chi=40 at
thr 1e-6 differ by 3.4e-4 in observables).
"""

import numpy as np
import pytest
from scipy.linalg import expm

from pyaceqd_tpu import last_pt_info
from pyaceqd_tpu.constants import hbar
from pyaceqd_tpu.engine import ptmpo, spectral


@pytest.fixture(scope="module")
def bath():
    # tiny window: interior bond ranks are bounded by G^2 = 16, so the
    # escalation provably terminates fast
    J = spectral.QDPhononJ(ae=3.0)
    eta = spectral.eta_coefficients(J, 0.1, 4, 4.0)
    ev = np.array([0.0, 1.0])
    nu, mu = np.repeat(ev, 2), np.tile(ev, 2)
    return eta, nu, mu


def _propagate(pt, n, dt=0.1):
    om = np.pi / (n * dt) / 2
    H = np.array([[0, 1], [1, 0]], dtype=complex)
    U = np.stack([expm(-1j * dt / hbar * (0.5 * hbar * om * H))] * n)
    rho0 = np.array([1, 0, 0, 0], dtype=complex)
    W = np.eye(4, dtype=complex)
    ys, _ = ptmpo.propagate_pt(pt, U, None, rho0, W,
                               np.zeros((0, 4, 4)), np.zeros(0, np.int32))
    return np.asarray(ys)


def test_capped_flag_reported(bath):
    eta, nu, mu = bath
    g_of_s = np.arange(4)
    tight = ptmpo.assemble_process_tensor(
        eta, g_of_s, nu, mu, np.zeros((2, 2)), 20, threshold=1e-8, chi_max=2)
    roomy = ptmpo.assemble_process_tensor(
        eta, g_of_s, nu, mu, np.zeros((2, 2)), 20, threshold=1e-8, chi_max=64)
    assert tight.capped is True
    assert roomy.capped is False


def test_escalation_stops_when_cap_unbinds(bath, monkeypatch):
    eta, nu, mu = bath
    g_of_s = np.arange(4)
    calls = []

    def build(cap):
        calls.append(cap)
        return ptmpo.assemble_process_tensor(
            eta, g_of_s, nu, mu, np.zeros((2, 2)), 20,
            threshold=1e-8, chi_max=cap)

    # start far below the threshold-governed rank so escalation is exercised
    monkeypatch.setattr(ptmpo, "UNBOUNDED_START", 2)
    pt = ptmpo._unbounded_build(build)
    assert len(calls) >= 2 and calls == sorted(calls)       # escalated
    assert pt.capped is False                               # cap never bound
    # physics identical to a directly over-provisioned build (gauge-invariant
    # observable check, same pattern as tests/test_native.py): with the cap
    # unbinding in both builds, the truncation decisions coincide
    ref = ptmpo.assemble_process_tensor(
        eta, g_of_s, nu, mu, np.zeros((2, 2)), 20,
        threshold=1e-8, chi_max=64)
    assert np.max(np.abs(_propagate(pt, 20) - _propagate(ref, 20))) < 1e-8


def test_escalation_warns_at_ceiling(bath, monkeypatch):
    eta, nu, mu = bath
    g_of_s = np.arange(4)
    monkeypatch.setattr(ptmpo, "UNBOUNDED_START", 2)
    monkeypatch.setattr(ptmpo, "UNBOUNDED_CEIL", 4)

    def build(cap):
        return ptmpo.assemble_process_tensor(
            eta, g_of_s, nu, mu, np.zeros((2, 2)), 20,
            threshold=1e-10, chi_max=cap)

    with pytest.warns(UserWarning, match="cap-bound at the escalation"):
        pt = ptmpo._unbounded_build(build)
    assert pt.chi == 4 and pt.capped  # ceiling-bound build returned (+warned)


def test_get_process_tensor_unbounded(tmp_path):
    kw = dict(boson_op=np.diag([0.0, 1.0]), dt=0.1, t_mem=0.4, ae=3.0,
              temperature=4, n_steps=20, threshold="7", chi_max=0,
              system_prefix="unb_test", temp_dir=str(tmp_path))
    pt = ptmpo.get_process_tensor(**kw)
    info = last_pt_info()
    assert info["chi_max"] == 0
    assert info["saturated"] is False
    assert info["capped"] is False
    assert 1 < pt.chi < ptmpo.UNBOUNDED_CEIL
    # cached reload hits the same fingerprint (keyed by chi_max=0)
    pt2 = ptmpo.get_process_tensor(**kw)
    assert last_pt_info()["cached"] is True
    assert np.allclose(pt.stack, pt2.stack)
