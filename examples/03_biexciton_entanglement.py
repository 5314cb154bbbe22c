"""Baseline config 3/4 hybrid: four-level biexciton cascade —
polarization-resolved two-photon density matrix and concurrence.

The ideal cascade (start in |B>, zero fine-structure splitting) emits the
maximally entangled (|XX> + |YY>)/sqrt(2) photon pair: concurrence 1."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyaceqd_tpu.models.biexciton import biexciton
from pyaceqd_tpu.pol_entanglement import PolarizatzionEntanglement

tmp = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
os.makedirs(tmp, exist_ok=True)

for fss in (0.0, 0.05):
    opts = {"gamma_e": 1 / 20, "lindblad": True, "phonons": False,
            "delta_b": 4, "delta_xy": fss, "initial": "|3><3|_4",
            "temp_dir": tmp}
    pol = PolarizatzionEntanglement(
        biexciton, "|0><1|_4 + |1><3|_4", "|0><2|_4 + |2><3|_4",
        "|1><0|_4 + |3><1|_4", "|2><0|_4 + |3><2|_4", dt=0.2, tend=250,
        dt_small=1.0, regular_grid=True, options=opts)
    conc, dm = pol.calc_densitymatrix_reuse(return_rho=True)
    dm = dm / np.trace(dm)
    print("FSS = %.2f meV:  concurrence = %.4f   |rho_XXYY| = %.4f"
          % (fss, conc, abs(dm[0, 3])))
