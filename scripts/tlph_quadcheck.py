"""No-phonon control for the tl-vs-direct dm comparison: without phonons the
time-local maps are exact, so any calc_densitymatrix vs calc_densitymatrix_tl
gap at this config is QUADRATURE/structure (rho_ee_ee's uniform-t2 grid vs
the 8-op kernels' triu gaussian grid), not physics.  Separates what the
phonon-correct hybrid can be expected to close.

Usage: python scripts/tlph_quadcheck.py [tb] [dt]
"""
import os
import sys

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyaceqd_tpu.models.dark_model import darkmodel
from pyaceqd_tpu.pulses import Pulse
from pyaceqd_tpu.timebin import TwoPhotonTimebinNew

tb = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
dt = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4

p1 = Pulse(tau=1.5, e_start=0, e0=0.5, t0=4, polar_x=1)
p2 = Pulse(tau=1.5, e_start=0, e0=1.0, t0=4 + tb, polar_x=1)
opts = {"verbose": False, "delta_xd": 4, "delta_b": 4, "gamma_e": 1 / 10,
        "gamma_b": 1 / 10, "lindblad": True, "phonons": False,
        "initial": "|2><2|_4"}

tpb = TwoPhotonTimebinNew(darkmodel, "|0><1|_4", "|1><0|_4", "|1><3|_4",
                          "|3><1|_4", p1, p2, dt=dt, dim=4, tb=tb,
                          gaussian_t=7, options=opts)

c_dir, dm_dir = tpb.calc_densitymatrix(reduced=True, use_second_zero=True)
c_tl, dm_tl, _ = tpb.calc_densitymatrix_tl(reduced=True)
nd = dm_dir / np.trace(dm_dir)
nt = dm_tl / np.trace(dm_tl)
print(f"direct : C={c_dir:.5f}")
print(f"tl     : C={c_tl:.5f}   |dC|={abs(c_tl - c_dir):.2e}")
print("max|dm| tl vs direct:", f"{np.max(np.abs(nt - nd)):.2e}")
print("dm diag direct:", np.real(np.diag(nd)).round(4))
print("dm diag tl    :", np.real(np.diag(nt)).round(4))
print("dm[0,3] direct:", np.round(nd[0, 3], 5), " tl:", np.round(nt[0, 3], 5))
