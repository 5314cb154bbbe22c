"""Baseline config 5: six-level system (bright + dark excitons + biexciton)
in a Voigt-geometry magnetic field, with phonons — the largest Hilbert space
of the model zoo."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyaceqd_tpu.models.sixls import sixls_linear
from pyaceqd_tpu.pulses import ChirpedPulse

tmp = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
os.makedirs(tmp, exist_ok=True)

p = ChirpedPulse(tau_0=3, e_start=0, alpha=0, e0=1, t0=10, polar_x=1)
labels = ["G", "X", "Y", "Dx", "Dy", "B"]

res = sixls_linear(0, 40, p, dt=0.1, phonons=True, t_mem=3.2, ae=3.0,
                   temperature=4, threshold=8, temp_dir=tmp,
                   gamma_e=1 / 100, lindblad=True, bx=1.0, bz=0.0)
occ = np.stack([np.real(res[i]) for i in range(1, 7)])
print("occupations at t = 40 ps (Bx = 1 T couples bright and dark states):")
for lab, o in zip(labels, occ[:, -1]):
    print("  %-2s %.4f" % (lab, o))
print("dark-state population (phonon-assisted + B-mixing): %.4f"
      % (occ[3, -1] + occ[4, -1]))
