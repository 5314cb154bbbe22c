"""Pulse-class tests: normalization, areas, chirp transforms, trains."""

import numpy as np

from pyaceqd_tpu.constants import hbar
from pyaceqd_tpu.pulses import (AsymmetricPulse, ChirpedPulse, CWLaser, Pulse,
                                PulseTrain, SmoothRectangle)


def test_pulse_area_normalization():
    p = Pulse(tau=3.0, e_start=0, e0=2.5, t0=10)
    t = np.linspace(-40, 60, 20001)
    area = np.trapezoid(p.get_envelope(t), t)
    assert np.isclose(area, 2.5, rtol=1e-6)
    # get_integral is the CDF of the envelope
    assert np.isclose(p.get_integral(60.0), 2.5, rtol=1e-6)
    assert np.isclose(p.get_integral(10.0), 1.25, rtol=1e-6)


def test_pulse_total_phase():
    p = Pulse(tau=2.0, e_start=1.0, t0=0, phase=0.3)
    t = np.array([0.0, 1.0])
    w0 = 1.0 / hbar
    expected_phase = w0 * t + 0.3
    total = p.get_total(t)
    assert np.allclose(np.angle(total), -expected_phase % (2 * np.pi) - 2 * np.pi * (
        (-expected_phase % (2 * np.pi)) > np.pi), atol=1e-9) or np.allclose(
        total, p.get_envelope(t) * np.exp(-1j * expected_phase))


def test_chirped_pulse_transform():
    tau0, alpha = 2.0, 20.0
    p = ChirpedPulse(tau_0=tau0, e_start=0, alpha=alpha)
    assert np.isclose(p.tau, np.sqrt(alpha**2 / tau0**2 + tau0**2))
    assert np.isclose(p.w_gain, alpha / (alpha**2 + tau0**4))
    # chirped pulse area ratio
    t = np.linspace(-200, 200, 400001)
    area = np.trapezoid(p.get_envelope(t), t)
    assert np.isclose(area, p.e0 * p.get_ratio(), rtol=1e-5)


def test_polarization():
    p = Pulse(tau=1, e_start=0, polars=(1, 1j))
    assert np.isclose(abs(p.polar_x) ** 2 + abs(p.polar_y) ** 2, 1.0)
    p2 = Pulse(tau=1, e_start=0, polar_x=0.6)
    assert np.isclose(p2.polar_y, 0.8)


def test_pulse_train():
    p = Pulse(tau=1.0, e_start=0, t0=0)
    train = PulseTrain(100.0, 3, p)
    t = np.linspace(-20, 320, 3401)
    field = train.get_total(t)
    single = np.trapezoid(np.abs(p.get_total(t)), t)
    assert np.isclose(np.trapezoid(np.abs(field), t), 3 * single, rtol=1e-3)
    fx, fy = train.get_total_xy(t)
    assert np.allclose(fx, field) and np.allclose(fy, 0)


def test_cw_laser():
    p = CWLaser(e0=0.3)
    t = np.linspace(-5, 5, 11)
    assert np.allclose(p.get_envelope(t), 0.3)


def test_smooth_rectangle():
    p = SmoothRectangle(tau=10, e_start=0, e0=1.0, alpha_onoff=0.01)
    # flat top near center, ~0 outside
    assert np.isclose(p.get_envelope(np.array([0.0]))[0], 1.0, atol=1e-3)
    assert p.get_envelope(np.array([20.0]))[0] < 1e-6


def test_asymmetric_pulse():
    p = AsymmetricPulse(tau1=1.0, tau2=3.0, e_start=0, t0=0)
    t = np.array([-1.0, 1.0])
    env = p.get_envelope(t)
    assert env[1] > env[0]  # slower decay on the tau2 side
    # continuous at t0
    eps = np.asarray([-1e-9, 1e-9])
    env2 = p.get_envelope(eps)
    assert np.isclose(env2[0], env2[1], rtol=1e-6)
