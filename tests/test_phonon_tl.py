"""Phonon time-local three-op correlations against exact closed forms.

With a diagonal boson coupling, phonons dephase coherences only — populations
follow the bare Lindblad decay exactly.  So for the undriven decaying TLS
(initial |1><1|, rate gamma):

  G(t, tau) = <sigma+(t) n(t+tau) sigma-(t)> = rho_00(t) * exp(-gamma tau)

with rho_00(t) = 1 - exp(-gamma t): the sandwich projects the ground
population onto the excited state, which then decays freely."""

import numpy as np
import pytest

from pyaceqd_tpu.correlations import (tl_three_op_two_time,
                                      tl_three_op_two_time_phonons)
from pyaceqd_tpu.models.tls import tls

DT = 0.1
TMEM = 1.6
GAMMA = 0.05


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ptcache_tl"))


def _options(cache_dir):
    return {"gamma_e": GAMMA, "lindblad": True, "phonons": True,
            "t_mem": TMEM, "ae": 3.0, "temperature": 4, "threshold": 8,
            "temp_dir": cache_dir, "use_infinite": False, "initial": "|1><1|_2"}


def test_tl_three_op_phonons_exact_decay(cache_dir):
    t_axis = np.round(np.arange(0, 4.0 + 1e-9, 0.8), 6)
    t, tau, G = tl_three_op_two_time_phonons(
        tls, t_axis, t_mem=TMEM, opA="|0><1|_2", opB="|1><1|_2",
        opC="|1><0|_2", tau_max=4.0, dt=DT,
        rho0=np.array([[0, 0], [0, 1]], dtype=complex),
        options=_options(cache_dir))
    expected = (1 - np.exp(-GAMMA * t))[:, None] * np.exp(-GAMMA * tau)[None, :]
    # G(t, 0) = tr(A B C rho) = rho_00(t) exactly
    assert np.allclose(np.real(G[:, 0]), 1 - np.exp(-GAMMA * t), atol=2e-3)
    assert np.max(np.abs(np.real(G) - expected)) < 5e-3
    assert np.max(np.abs(np.imag(G))) < 1e-6


def test_tl_three_op_dispatch_with_phonons(cache_dir):
    # the generic tl_three_op_two_time entry point must route to the phonon
    # implementation when options request phonons
    t_axis = np.round(np.arange(0, 2.4 + 1e-9, 0.8), 6)
    t, tau, G = tl_three_op_two_time(
        tls, t_axis, t_mem=TMEM, opA="|0><1|_2", opB="|1><1|_2",
        opC="|1><0|_2", tau_max=2.0, dt=DT,
        rho0=np.array([[0, 0], [0, 1]], dtype=complex),
        options=_options(cache_dir))
    expected = (1 - np.exp(-GAMMA * t))[:, None] * np.exp(-GAMMA * tau)[None, :]
    assert np.max(np.abs(np.real(G) - expected)) < 5e-3


def test_direct_vs_tl_phonon_g2(cache_dir):
    """The direct PT fan-out (every t1 a full-chain lane through the process
    tensor) and the time-local-map method are INDEPENDENT algorithms; both
    must reproduce the closed form G(t,tau) = rho_00(t) exp(-gamma tau)."""
    from pyaceqd_tpu.correlations import three_op_two_time
    t_axis = np.round(np.arange(0, 3.2 + 1e-9, 0.8), 6)
    opts = _options(cache_dir)
    t, tau, G_direct = three_op_two_time(
        tls, t_axis, opA="|0><1|_2", opB="|1><1|_2", opC="|1><0|_2",
        tau_max=3.0, dt=DT, options=opts)
    t2, tau2, G_tl = tl_three_op_two_time_phonons(
        tls, t_axis, t_mem=TMEM, opA="|0><1|_2", opB="|1><1|_2",
        opC="|1><0|_2", tau_max=3.0, dt=DT,
        rho0=np.array([[0, 0], [0, 1]], dtype=complex), options=opts)
    expected = (1 - np.exp(-GAMMA * t))[:, None] * np.exp(-GAMMA * tau)[None, :]
    assert np.max(np.abs(np.real(G_direct) - expected)) < 5e-3
    assert np.max(np.abs(np.real(G_direct) - np.real(G_tl))) < 5e-3


def test_direct_fanout_carries_phonon_dephasing(cache_dir):
    """Coherence-sensitive gate: a Markovian fan-out would keep |G1(0, tau)|
    constant (gamma = 0); the PT lanes must reproduce the exact IBM
    decoherence envelope."""
    from pyaceqd_tpu.correlations import two_op_two_time
    from pyaceqd_tpu.engine import spectral
    opts = {"gamma_e": 0.0, "lindblad": False, "phonons": True,
            "t_mem": TMEM, "ae": 3.0, "temperature": 4, "threshold": 8, "use_infinite": False,
            "temp_dir": cache_dir,
            "initial": "0.5*(|0><0|_2+|0><1|_2+|1><0|_2+|1><1|_2)"}
    t, tau, G = two_op_two_time(
        tls, np.array([0.0]), opA="|1><0|_2", opB="|0><1|_2", tau_max=3.0,
        dt=DT, options=opts)
    g = np.abs(G[0]) / np.abs(G[0, 0])
    J = spectral.QDPhononJ(ae=3.0)
    phi = np.abs(spectral.ibm_dephasing(J, tau, 4.0))
    # must follow the IBM envelope, not stay at 1
    assert phi[-1] < 0.9           # the envelope genuinely decays here
    assert np.max(np.abs(g - phi)) < 2e-2
