"""Baseline config 4: time-bin protocol — one-photon time-bin density matrix
from multi-time correlators (G1 between the early and late bins runs as one
vmapped batch of operator-insertion lanes)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyaceqd_tpu.models.tls import tls
from pyaceqd_tpu.pulses import ChirpedPulse
from pyaceqd_tpu.timebin import OnePhotonTimebin

tmp = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
os.makedirs(tmp, exist_ok=True)

# pi/2-pulse in the early bin only: superposition of early emission and no
# emission; the late bin stays dark
p_early = ChirpedPulse(tau_0=2, e_start=0, alpha=0, e0=0.5, t0=8)
tb = OnePhotonTimebin(tls, "|0><1|_2", p_early, tb=60, dt=0.1,
                      simple_exp=True, gaussian_t=None,
                      options={"gamma_e": 1 / 10, "lindblad": True,
                               "phonons": False, "temp_dir": tmp})
rho_ee, rho_ll, rho_el, norm = tb.calc_densitymatrix()
print("time-bin density matrix (unnormalized weights):")
print("  EE = %.4f  LL = %.4f  |EL| = %.4f" % (rho_ee, rho_ll, rho_el))
print("  normalized: EE = %.4f, LL = %.4f"
      % (rho_ee / norm, rho_ll / norm))
