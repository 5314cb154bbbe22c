"""Reduced-tb referee for the phonon-correct tl hybrid (VERDICT r3 item 4).

Runs the darkmodel dark-storage time-bin protocol with phonons (the
test_timebin.py finite-vs-stationary config) through three methods:
  direct   — full PT propagation per (t1,t2) lane (exact, the anchor)
  tl       — time-local 8-op kernel (reference fast path; known phonon error)
  hybrid   — eightops_phonon: exact PT windows + tl transport

Usage: python scripts/tlph_referee.py [tb] [dt] [pad_factor]
"""
import os
import sys

# honor JAX_PLATFORMS=cpu: sitecustomize forces the axon TPU backend via
# jax.config, which overrides the env var (cf. bench.py)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax
    jax.config.update("jax_platforms", "cpu")

import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyaceqd_tpu.models.dark_model import darkmodel
from pyaceqd_tpu.pulses import Pulse
from pyaceqd_tpu.timebin import TwoPhotonTimebinNew

tb = float(sys.argv[1]) if len(sys.argv) > 1 else 24.0
dt = float(sys.argv[2]) if len(sys.argv) > 2 else 0.2
pad = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0

p1 = Pulse(tau=1.5, e_start=0, e0=0.5, t0=4, polar_x=1)
p2 = Pulse(tau=1.5, e_start=0, e0=1.0, t0=4 + tb, polar_x=1)
opts = {"verbose": False, "delta_xd": 4, "delta_b": 4, "gamma_e": 1 / 10,
        "gamma_b": 1 / 10, "lindblad": True, "phonons": True, "ae": 3.0,
        "temperature": 4.0, "t_mem": 3.2, "threshold": 8,
        "use_infinite": True, "chi_max": 32, "initial": "|2><2|_4"}

tpb = TwoPhotonTimebinNew(darkmodel, "|0><1|_4", "|1><0|_4", "|1><3|_4",
                          "|3><1|_4", p1, p2, dt=dt, dim=4, tb=tb,
                          gaussian_t=7, options=opts)

t0 = time.time()
c_dir, dm_dir = tpb.calc_densitymatrix(reduced=True, use_second_zero=True)
t_dir = time.time() - t0
print(f"direct : C={c_dir:.5f}  {t_dir:.1f}s")

t0 = time.time()
c_tl, dm_tl, _ = tpb.calc_densitymatrix_tl(reduced=True)
t_tl = time.time() - t0
print(f"tl     : C={c_tl:.5f}  {t_tl:.1f}s   |dC|={abs(c_tl - c_dir):.2e}")

t0 = time.time()
c_hy, dm_hy, _ = tpb.calc_densitymatrix_tl_phonon(reduced=True, pad_factor=pad)
t_hy = time.time() - t0
print(f"hybrid : C={c_hy:.5f}  {t_hy:.1f}s   |dC|={abs(c_hy - c_dir):.2e}")

nd = dm_dir / np.trace(dm_dir)
nt = dm_tl / np.trace(dm_tl)
nh = dm_hy / np.trace(dm_hy)
print("max|dm| tl vs direct    :", f"{np.max(np.abs(nt - nd)):.2e}")
print("max|dm| hybrid vs direct:", f"{np.max(np.abs(nh - nd)):.2e}")
print("|dm_hybrid - dm_direct| per element:")
print(np.array2string(np.abs(nh - nd), precision=2))
print("diag direct:", np.real(np.diag(nd)).round(4))
print("diag hybrid:", np.real(np.diag(nh)).round(4))
print("[0,3] direct:", np.round(nd[0, 3], 5), " hybrid:", np.round(nh[0, 3], 5))
