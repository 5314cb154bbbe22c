"""Baseline config 2: two-level QD + superohmic phonon bath at 4 K.

Builds (and caches) the PT-MPO for the GaAs deformation-potential spectral
density, then shows phonon-induced damping of Rabi rotations — the hallmark
of the QD-phonon problem."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyaceqd_tpu.models.tls import tls
from pyaceqd_tpu.pulses import ChirpedPulse

tmp = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
os.makedirs(tmp, exist_ok=True)

pulse = ChirpedPulse(tau_0=3.0, e_start=0, alpha=0, e0=4, t0=12.0)  # 4pi area
common = dict(dt=0.1, gamma_e=0, lindblad=False, temp_dir=tmp, threshold=8)

res_free = tls(0, 24, pulse, phonons=False, **common)
res_phon = tls(0, 24, pulse, phonons=True, t_mem=3.2, ae=5.0, temperature=4,
               **common)
print("final excited-state occupation after a 4pi pulse:")
print("  no phonons:   %.4f (returns to ~0)" % np.real(res_free[2][-1]))
print("  with phonons: %.4f (phonon-damped Rabi rotation)"
      % np.real(res_phon[2][-1]))
