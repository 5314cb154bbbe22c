"""Engine validation against closed-form two-level-system physics."""

import numpy as np
import pytest

from pyaceqd_tpu.constants import hbar
from pyaceqd_tpu.models.tls import tls, tls_dressed_states
from pyaceqd_tpu.pulses import ChirpedPulse, Pulse


def test_grid_shape():
    p = Pulse(tau=3, e_start=0, e0=1, t0=12)
    res = tls(0, 40, p, dt=0.1)
    assert res.shape == (5, 401)
    assert np.isclose(res[0][0].real, 0) and np.isclose(res[0][-1].real, 40)


def test_pi_pulse_inversion():
    # resonant pi pulse inverts the population completely
    p = Pulse(tau=3, e_start=0, e0=1, t0=12)
    res = tls(0, 40, p, dt=0.02)
    occ_f = res[2][-1].real
    assert np.isclose(occ_f, 1.0, atol=1e-6)
    # trace preserved
    assert np.allclose((res[1] + res[2]).real, 1.0, atol=1e-9)


def test_rabi_area_law():
    # final occupation = sin^2(area*pi/2) for resonant pulses without decay
    for e0 in [0.25, 0.5, 1.5]:
        p = Pulse(tau=2, e_start=0, e0=e0, t0=10)
        res = tls(0, 25, p, dt=0.01)
        assert np.isclose(res[2][-1].real, np.sin(e0 * np.pi / 2) ** 2, atol=1e-6), e0


def test_lindblad_decay():
    # prepare excited state with a pi pulse, then watch exponential decay
    gamma = 1 / 50
    res = tls(0, 200, dt=0.1, gamma_e=gamma, lindblad=True, initial="|1><1|_2")
    t = res[0].real
    assert np.allclose(res[2].real, np.exp(-gamma * t), atol=1e-9)


def test_coherence_decay_rate():
    # coherence |0><1| decays at gamma/2
    gamma = 1 / 25
    rho0 = np.array([[0.5, 0.5], [0.5, 0.5]], dtype=complex)
    res = tls(0, 100, dt=0.1, gamma_e=gamma, lindblad=True, rho0=rho0)
    t = res[0].real
    assert np.allclose(np.abs(res[3]), 0.5 * np.exp(-gamma / 2 * t), atol=1e-9)


def test_pure_dephasing():
    # dephasing lindblad L = |0><0|-|1><1| with rate gd: since L^dag L = Id and
    # L rho_01 L^dag = -rho_01, coherences decay at 2*gd
    gd = 0.01
    rho0 = np.array([[0.5, 0.5], [0.5, 0.5]], dtype=complex)
    res = tls(0, 50, dt=0.05, dephasing=gd, rho0=rho0)
    t = res[0].real
    assert np.allclose(np.abs(res[3]), 0.5 * np.exp(-2 * gd * t), atol=1e-8)
    # populations untouched
    assert np.allclose(res[2].real, 0.5, atol=1e-9)


def test_detuned_rabi():
    # CW drive with detuning: generalized Rabi oscillation amplitude
    # Omega^2/(Omega^2+Delta^2). Use a long flat pulse via CW approximation.
    from pyaceqd_tpu.pulses import CWLaser
    delta_mev = 0.05
    e0 = 0.02  # per-ps area -> Rabi freq pi*e0
    p = CWLaser(e0=e0, e_start=delta_mev)
    res = tls(0, 400, p, dt=0.02)
    omega = np.pi * e0
    delta = delta_mev / hbar
    amp = omega**2 / (omega**2 + delta**2)
    occ = res[2].real
    assert np.isclose(np.max(occ), amp, atol=2e-3)


def test_rap_chirped_inversion():
    # rapid adiabatic passage: strongly chirped strong pulse robustly inverts
    p = ChirpedPulse(tau_0=1.5, e_start=0, alpha=15, e0=4 * np.pi, t0=50)
    res = tls(0, 100, p, dt=0.02)
    assert res[2][-1].real > 0.98


def test_multitime_operator_semantics():
    # invert with a pi pulse, then apply sigma = |0><1| as sandwich at t=30:
    # population jumps to ground; effect visible at t+dt (applyBefore false)
    p = Pulse(tau=3, e_start=0, e0=1, t0=12)
    mto = {"operator": "|0><1|_2", "time": 30.0, "applyFrom": "", "applyBefore": "false"}
    res = tls(0, 40, p, dt=0.1, multitime_op=mto)
    t = res[0].real
    i = np.argmin(np.abs(t - 30.0))
    assert res[2][i].real > 0.99          # still excited AT t_mto
    assert res[2][i + 1].real < 1e-6      # ground right after
    # applyBefore=true -> visible at t_mto
    mto2 = {"operator": "|0><1|_2", "time": 30.0, "applyFrom": "", "applyBefore": "true"}
    res2 = tls(0, 40, p, dt=0.1, multitime_op=mto2)
    assert res2[2][i].real < 1e-6


def test_multitime_left_right():
    # <sigma^+(t) sigma^-(t)> via left/right application reproduces occupation
    p = Pulse(tau=2, e_start=0, e0=0.7, t0=8)
    t_mto = 20.0
    mtos = [
        {"operator": "|1><0|_2", "applyFrom": "_right", "applyBefore": "false", "time": t_mto},
        {"operator": "|0><1|_2", "applyFrom": "_left", "applyBefore": "false", "time": t_mto},
    ]
    res = tls(0, 30, p, dt=0.1, multitime_op=mtos, output_ops=["|1><1|_2", "Id_2"])
    t = res[0].real
    i = np.argmin(np.abs(t - t_mto))
    occ_at_mto = tls(0, 30, p, dt=0.1)[2][i].real
    # after sigma rho sigma^dagger, trace = <sigma^+ sigma^->(t_mto) = occupation
    assert np.isclose(res[2][i + 1].real, occ_at_mto, atol=1e-8)


def test_calc_dynmap_consistency():
    # dynamical maps applied to rho0 must reproduce the direct outputs
    p = Pulse(tau=2, e_start=0, e0=0.8, t0=6)
    res, dm = tls(0, 15, p, dt=0.1, lindblad=True, gamma_e=0.05, calc_dynmap=True)
    assert dm.shape == (150, 4, 4)
    rho0 = np.array([1, 0, 0, 0], dtype=complex)
    occ = [0.0]
    for i in range(dm.shape[0]):
        occ.append((dm[i] @ rho0)[3].real)
    assert np.allclose(occ, res[2].real, atol=1e-10)


def test_get_M_t():
    # one-step propagator at a drive-free time equals the pure decay map
    import scipy.linalg
    from pyaceqd_tpu.ops import superop
    gamma, dt = 0.02, 0.1
    M = tls(0, 10, dt=dt, gamma_e=gamma, lindblad=True, get_M_t=5.0)
    L = superop.dissipator(np.array([[0, 1], [0, 0]], dtype=complex), gamma)
    assert np.allclose(M, scipy.linalg.expm(L * dt), atol=1e-12)


def test_dressed_states_rabi_splitting():
    # at the peak of a resonant pulse the dressed states split by hbar*Omega
    p = Pulse(tau=5, e_start=0, e0=2, t0=25)
    data = tls(0, 50, p, dt=0.5, dressedstates=True)
    t = data[0].real
    i = np.argmin(np.abs(t - 25.0))
    splitting = (data[2] - data[1]).real[i]
    omega_peak = np.pi * p.get_envelope(25.0)
    assert np.isclose(splitting, hbar * omega_peak, rtol=1e-6)


def test_dressed_states_wrapper(tmp_path):
    p = Pulse(tau=5, e_start=0, e0=2, t0=25)
    t, pops, e_values, ds_occ, s_colors, n_colors = tls_dressed_states(
        0, 50, p, plot=False, filename=str(tmp_path / "ds"), dt=0.5)
    assert e_values.shape == (len(t), 2)
    # dressed occupations sum to 1
    assert np.allclose(np.sum(ds_occ, axis=1), 1.0, atol=1e-8)


def test_rotating_frame():
    # detuned pulse in rf frame gives same populations as lab frame
    p = Pulse(tau=3, e_start=0.5, e0=1, t0=12)
    res_lab = tls(0, 30, p, dt=0.01)
    res_rf = tls(0, 30, p, dt=0.01, rf=True)
    assert np.allclose(res_lab[2].real, res_rf[2].real, atol=1e-4)


def test_print_H():
    from pyaceqd_tpu.engine.simulate import simulate
    H = simulate(0, 10, dt=0.1, system_op=["0.3*|1><1|_2"], initial="|0><0|_2",
                 print_H=True)
    assert np.allclose(H, np.diag([0, 0.3]))
