"""Purity / Indistinguishability tests: an ideal two-level single-photon
source driven by a pi-pulse train must give purity ~ 1 and
indistinguishability ~ 1; the direct fan-out and time-local map paths must
agree."""

import numpy as np
import pytest

from pyaceqd_tpu.correlations.purity import Indistinguishability, Purity
from pyaceqd_tpu.models.tls import tls
from pyaceqd_tpu.pulses import Pulse

GAMMA = 1 / 8
TB = 60.0
OPTS = {"gamma_e": GAMMA, "lindblad": True, "phonons": False, "verbose": False}


def _source():
    # short pulse: re-excitation during the pulse (~gamma*tau) stays small
    return Pulse(tau=0.4, e_start=0, e0=1, t0=5)


def test_purity_ideal_source():
    p = _source()
    pur = Purity(tls, "|0><1|_2", "|1><0|_2", p, dt=0.1, tb=TB, gaussian_t=10,
                 options=dict(OPTS))
    val = pur.calc_purity()
    # one photon per pulse up to re-excitation during the finite pulse
    # (error ~ gamma*tau_pulse = 0.05): purity slightly below 1
    assert 0.9 < val < 1.0


def test_indistinguishability_ideal_source():
    p = _source()
    ind = Indistinguishability(tls, "|0><1|_2", "|1><0|_2", p, dt=0.1, tb=TB,
                               gaussian_t=10, options=dict(OPTS))
    I, P = ind.calc_indistinguishability()
    assert 0.9 < P < 1.0
    # no pure dephasing: near-unity indistinguishability
    assert 0.85 < I <= 1.02


def test_indistinguishability_tl_path():
    p = _source()
    ind = Indistinguishability(tls, "|0><1|_2", "|1><0|_2", p, dt=0.1, tb=TB,
                               gaussian_t=10, options=dict(OPTS), dm=True)
    I_tl, P_tl = ind.calc_indistinguishability()
    ind2 = Indistinguishability(tls, "|0><1|_2", "|1><0|_2", p, dt=0.1, tb=TB,
                                gaussian_t=10, options=dict(OPTS))
    I_d, P_d = ind2.calc_indistinguishability()
    assert np.isclose(P_tl, P_d, atol=0.03)
    assert np.isclose(I_tl, I_d, atol=0.03)


def test_dephasing_reduces_indistinguishability():
    p = _source()
    opts = dict(OPTS)
    opts["dephasing"] = 0.05
    ind = Indistinguishability(tls, "|0><1|_2", "|1><0|_2", p, dt=0.1, tb=TB,
                               gaussian_t=10, options=opts, dm=True)
    I_deph, P_deph = ind.calc_indistinguishability()
    assert P_deph > 0.9            # purity unaffected by pure dephasing
    assert I_deph < 0.75           # indistinguishability strongly reduced


def test_g2_tl_phonons_smoke(tmp_path):
    # phonon-block path on tiny parameters: runs, finite, plausible shape
    p = _source()
    opts = dict(OPTS)
    opts.update({"phonons": True, "ae": 5.0, "temperature": 4, "t_mem": 1.6,
                 "threshold": 7, "temp_dir": str(tmp_path), "use_infinite": False})
    ind = Indistinguishability(tls, "|0><1|_2", "|1><0|_2", p, dt=0.2, tb=20.0,
                               dt_small=0.2, gaussian_t=8, options=opts, dm=True,
                               t_mem=1.6)
    tau, g2 = ind.G2_tl_phonons()
    assert np.all(np.isfinite(g2))
    # antibunching dip at tau=0 relative to the tau=tb peak
    n_tb = int(20.0 / 0.2)
    assert g2[0] < np.max(g2[n_tb - 10:n_tb + 10])
