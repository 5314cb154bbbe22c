"""Correlation-layer tests: closed forms + cross-method validation
(batched branch fan-out vs dynamical-map paths), mirroring the reference's
dominant compare-two-ways pattern (SURVEY.md §4)."""

import numpy as np
import pytest

from pyaceqd_tpu.correlations import (five_op_two_time, get_spectrum,
                                      three_op_one_time, three_op_two_time,
                                      tl_three_op_two_time, tl_two_op_two_time,
                                      two_op_one_time, two_op_two_time)
from pyaceqd_tpu.models.tls import tls
from pyaceqd_tpu.pulses import Pulse

GAMMA = 1 / 20


def test_g1_decay_closed_form():
    # start excited, no drive: G1(t,tau) = exp(-g t) exp(-g tau / 2)
    t_axis = np.arange(0, 30.0, 2.0)
    t1, tau, G1 = two_op_two_time(
        tls, t_axis, opA="|1><0|_2", opB="|0><1|_2", tau_max=30, dt=0.1,
        options={"gamma_e": GAMMA, "lindblad": True, "phonons": False,
                 "initial": "|1><1|_2"})
    expected = np.exp(-GAMMA * t1)[:, None] * np.exp(-GAMMA * tau / 2)[None, :]
    assert np.allclose(G1.real, expected, atol=1e-8)
    assert np.allclose(G1.imag, 0, atol=1e-10)


def test_g2_decay_is_zero():
    # single TLS photon: after detecting once, no second photon
    t_axis = np.arange(0, 20.0, 2.0)
    _, _, G2 = three_op_two_time(
        tls, t_axis, opA="|1><0|_2", opB="|1><1|_2", opC="|0><1|_2", tau_max=20,
        dt=0.1, options={"gamma_e": GAMMA, "lindblad": True, "phonons": False,
                         "initial": "|1><1|_2"})
    assert np.allclose(np.abs(G2), 0, atol=1e-10)


def test_one_time_matches_two_time_row():
    # a single-branch one_time run equals the corresponding two_time row
    p = Pulse(tau=2, e_start=0, e0=0.7, t0=6)
    opts = {"gamma_e": GAMMA, "lindblad": True, "phonons": False}
    tau1, G1_1d = two_op_one_time(tls, p, opA="|1><0|_2", opB="|0><1|_2",
                                  t0=0, t_MTO=10, tend=40, dt=0.1, options=dict(opts))
    t1, tau, G1_2d = two_op_two_time(tls, np.array([10.0]), p, opA="|1><0|_2",
                                     opB="|0><1|_2", tau_max=30, dt=0.1,
                                     options=dict(opts))
    assert np.allclose(G1_1d, G1_2d[0], atol=1e-9)


def test_driven_g1_cross_method():
    # branched engine vs dynamical-map engine on a driven, damped TLS
    p = Pulse(tau=2, e_start=0, e0=1.0, t0=5)
    opts = {"gamma_e": GAMMA, "lindblad": True, "phonons": False}
    t_axis = np.arange(0, 15.0, 1.0)
    _, tau, G_a = two_op_two_time(tls, t_axis, p, opA="|1><0|_2", opB="|0><1|_2",
                                  tau_max=15, dt=0.1, options=dict(opts))
    _, tau2, G_b = tl_two_op_two_time(tls, t_axis, p, t_mem=5, opA="|1><0|_2",
                                      opB="|0><1|_2", tau_max=15, dt=0.1,
                                      options=dict(opts), use_dm=True)
    assert np.allclose(tau, tau2)
    assert np.allclose(G_a, G_b, atol=1e-7)


def test_driven_g2_cross_method():
    p = Pulse(tau=2, e_start=0, e0=1.0, t0=5)
    opts = {"gamma_e": GAMMA, "lindblad": True, "phonons": False}
    t_axis = np.arange(0, 15.0, 1.0)
    _, _, G_a = three_op_two_time(tls, t_axis, p, opA="|1><0|_2", opB="|1><1|_2",
                                  opC="|0><1|_2", tau_max=15, dt=0.1,
                                  options=dict(opts))
    _, _, G_b = tl_three_op_two_time(tls, t_axis, p, t_mem=5, opA="|1><0|_2",
                                     opB="|1><1|_2", opC="|0><1|_2", tau_max=15,
                                     dt=0.1, options=dict(opts), use_dm=True)
    assert np.allclose(G_a, G_b, atol=1e-7)


def test_tl_qrt_stationary_matches_direct():
    # undriven decay: the stationary-map QRT path equals the closed form
    t_axis = np.arange(0, 20.0, 2.0)
    _, tau, G = tl_two_op_two_time(
        tls, t_axis, t_mem=5, opA="|1><0|_2", opB="|0><1|_2", tau_max=20, dt=0.1,
        rho0=np.array([[0, 0], [0, 1]], dtype=complex),
        options={"gamma_e": GAMMA, "lindblad": True, "phonons": False})
    expected = np.exp(-GAMMA * t_axis)[:, None] * np.exp(-GAMMA * tau / 2)[None, :]
    assert np.allclose(G.real, expected, atol=1e-8)


def test_spectrum_lorentzian():
    # G1(tau) = exp(-g tau/2): spectrum is a Lorentzian with HWHM g/2 * hbar
    from pyaceqd_tpu.constants import hbar
    tau = np.linspace(0, 1600, 32001)
    g1 = np.exp(-GAMMA * tau / 2).astype(complex)
    s, w = get_spectrum(g1, tau)
    s = s / np.max(s)
    # half maximum at w = +- hbar*gamma/2
    hwhm_expected = hbar * GAMMA / 2
    above = w[s > 0.5]
    # bin-resolution measurement floor-biases by up to one bin width
    hwhm = (above[-1] - above[0]) / 2 + (w[1] - w[0]) / 2
    assert np.isclose(hwhm, hwhm_expected, rtol=0.05)


def test_five_op_shapes():
    p = Pulse(tau=2, e_start=0, e0=0.6, t0=5)
    t_axis = np.arange(0, 10.0, 2.0)
    t1, tau, G = five_op_two_time(
        tls, t_axis, p, tau_max=10, dt=0.1, t_start=-10,
        options={"gamma_e": GAMMA, "lindblad": True, "phonons": False})
    assert G.shape == (len(t_axis), 101)
    assert np.all(np.isfinite(G))
