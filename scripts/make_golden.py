"""Generate the committed golden regression data (SURVEY.md §4 item 4).

Runs the five BASELINE configs at CPU float64 and writes tests/golden/*.npz.
Run ONCE, commit the artifacts, and never regenerate silently: the goldens
exist to catch refactors that shift both sides of a cross-method test
together (VERDICT r1 "What's missing" item 2).

    JAX_PLATFORMS=cpu PYACEQD_TPU_PRECISION=double python scripts/make_golden.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PYACEQD_TPU_PRECISION", "double")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

GOLD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tests", "golden")
CACHE = os.path.join(GOLD, ".ptcache")


def _opts_phonon(**kw):
    # chi_max pinned: the goldens were generated at 64, before chi_max
    # gained its weight-aware default (128 for weight-2 couplings).  Pinning
    # keeps the committed artifacts valid under default changes.
    base = {"lindblad": True, "phonons": True, "ae": 3.0, "temperature": 4,
            "threshold": 8, "temp_dir": CACHE, "chi_max": 64}
    base.update(kw)
    return base


def rabi_map():
    """Config 1: TLS Rabi rotations vs pulse area (no phonons)."""
    from pyaceqd_tpu.models.tls import tls
    from pyaceqd_tpu.pulses import Pulse
    areas = np.linspace(0.1, 10, 12)
    finals = []
    for a in areas:
        p = Pulse(tau=3, e_start=0, w_gain=0, t0=10, e0=a)
        r = tls(0, 30, p, dt=0.05, gamma_e=0.02, lindblad=True)
        finals.append(r[2][-1].real)   # x population at t_end
    return {"areas": areas, "x_final": np.array(finals)}


def phonon_tls():
    """Config 2: TLS + phonons, pi pulse, finite AND stationary PT."""
    from pyaceqd_tpu.models.tls import tls
    from pyaceqd_tpu.pulses import Pulse
    p = Pulse(tau=3, e_start=0, w_gain=0, t0=10, e0=1)
    out = {}
    for tag, inf in (("fin", False), ("inf", True)):
        r = tls(0, 24, p, dt=0.1, t_mem=3.2, use_infinite=inf,
                **_opts_phonon(gamma_e=0.0))
        out["t_" + tag] = np.real(r[0])
        out["x_" + tag] = np.real(r[2])
        out["coh_" + tag] = np.asarray(r[3], dtype=complex)
    return out


def biexciton_g2():
    """Config 3: biexciton G2(t,tau) map with phonons at 4 K."""
    from pyaceqd_tpu.models.biexciton import biexciton
    from pyaceqd_tpu.correlations.correlations import three_op_two_time
    from pyaceqd_tpu.pulses import ChirpedPulse
    p = ChirpedPulse(tau_0=3.0, e_start=-2.0, alpha=0, e0=4, t0=9)
    t_axis = np.round(np.arange(0.0, 16.0 + 1e-9, 2.0), 6)
    t1, tau, G = three_op_two_time(
        biexciton, t_axis, p, opA="|1><0|_4", opB="|1><1|_4", opC="|0><1|_4",
        tau_max=8.0, dt=0.1,
        options=_opts_phonon(gamma_e=0.05, gamma_b=0.1, t_mem=3.2,
                             delta_b=4.0))
    return {"t1": t1, "tau": tau, "G_re": np.real(G), "G_im": np.imag(G)}


def timebin_dm():
    """Config 4: time-bin two-photon density matrix + concurrence (4-level
    dark model, two-photon-resonant pulses in both bins)."""
    from pyaceqd_tpu.models.dark_model import darkmodel
    from pyaceqd_tpu.timebin.twophoton_new import TwoPhotonTimebinNew
    from pyaceqd_tpu.pulses import Pulse
    tb = 24.0
    p1 = Pulse(tau=1.5, e_start=-2, e0=2 * np.pi, t0=6, polar_x=0)
    p2 = Pulse(tau=1.5, e_start=-2, e0=2 * np.pi, t0=6 + tb, polar_x=0)
    tpt = TwoPhotonTimebinNew(
        darkmodel, "|0><1|_4", "|1><0|_4", "|1><3|_4", "|3><1|_4", p1, p2,
        dt=0.2, dim=4, tb=tb, gaussian_t=12,
        options={"verbose": False, "delta_xd": 4, "delta_b": 4,
                 "gamma_e": 0.1, "gamma_b": 0.1, "lindblad": True,
                 "phonons": False})
    conc, rho = tpt.calc_densitymatrix(reduced=True, use_second_zero=True)
    return {"concurrence": np.array([conc]), "rho_re": np.real(rho),
            "rho_im": np.imag(rho)}


def sixls_bfield():
    """Config 5: six-level system with Bx field dynamics."""
    from pyaceqd_tpu.models.sixls import sixls_linear
    from pyaceqd_tpu.pulses import ChirpedPulse
    p = ChirpedPulse(tau_0=3.0, e_start=0.0, alpha=0, e0=2, t0=9)
    r = sixls_linear(0, 30, p, dt=0.05, bx=1.0, bz=0.1,
                     lindblad=True)
    return {"t": np.real(r[0]),
            "pops_re": np.stack([np.real(r[i]) for i in range(1, 7)])}


def main():
    os.makedirs(GOLD, exist_ok=True)
    os.makedirs(CACHE, exist_ok=True)
    jobs = [("rabi_map", rabi_map), ("phonon_tls", phonon_tls),
            ("biexciton_g2", biexciton_g2), ("timebin_dm", timebin_dm),
            ("sixls_bfield", sixls_bfield)]
    for name, fn in jobs:
        path = os.path.join(GOLD, name + ".npz")
        print("generating", name, "...", flush=True)
        data = fn()
        np.savez(path, **data)
        print("  wrote", path, {k: np.shape(v) for k, v in data.items()},
              flush=True)


if __name__ == "__main__":
    main()
