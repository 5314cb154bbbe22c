"""Quadrature-matched anchor for eightops_phonon: the direct ``four_time``
path evaluates the EELL first-ordering correlator on the SAME (t1,t2) triu
grid the 8-op kernels integrate, so its G12 matrix is the exact-on-this-grid
reference.  eightops_phonon in the all-merged limit (huge pad_factor: every
lane one window from step 0) must reproduce it to PT/quadrature exactness.

Usage: python scripts/tlph_anchor.py [tb] [dt] [pad...]
"""
import os
import sys

# honor JAX_PLATFORMS=cpu: sitecustomize forces the axon TPU backend via
# jax.config, which overrides the env var (cf. bench.py)
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax
    jax.config.update("jax_platforms", "cpu")


import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyaceqd_tpu.models.dark_model import darkmodel
from pyaceqd_tpu.ops.dsl import parse_operator
from pyaceqd_tpu.pulses import Pulse
from pyaceqd_tpu.timebin import TwoPhotonTimebinNew

tb = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
dt = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
pads = [float(a) for a in sys.argv[3:]] or [50.0, 1.0]

p1 = Pulse(tau=1.5, e_start=0, e0=0.5, t0=4, polar_x=1)
p2 = Pulse(tau=1.5, e_start=0, e0=1.0, t0=4 + tb, polar_x=1)
opts = {"verbose": False, "delta_xd": 4, "delta_b": 4, "gamma_e": 1 / 10,
        "gamma_b": 1 / 10, "lindblad": True, "phonons": True, "ae": 3.0,
        "temperature": 4.0, "t_mem": 3.2, "threshold": 8,
        "use_infinite": True, "chi_max": 32, "initial": "|2><2|_4"}

tpb = TwoPhotonTimebinNew(darkmodel, "|0><1|_4", "|1><0|_4", "|1><3|_4",
                          "|3><1|_4", p1, p2, dt=dt, dim=4, tb=tb,
                          gaussian_t=7, options=opts)

# direct EELL (first ordering): exact on the triu grid
t1, _G2d, eell_d, G12_d = tpb.four_time(
    [tpb.sigma_x, tpb.sigma_x + "*" + tpb.sigma_b],
    {"operator": tpb.sigma_bdag, "applyFrom": "_right", "applyBefore": "false"},
    {"operator": tpb.sigma_xdag, "applyFrom": "_right", "applyBefore": "false"},
    {"operator": tpb.sigma_b, "applyFrom": "_left", "applyBefore": "false"})
print(f"direct four_time EELL: {eell_d:.6f}")

rho0 = tpb.get_initial_state()
dim = rho0.shape[0]
Id = np.eye(dim)
sx = parse_operator(tpb.sigma_x)
sxd = parse_operator(tpb.sigma_xdag)
sb = parse_operator(tpb.sigma_b)
sbd = parse_operator(tpb.sigma_bdag)
ops_eell = [Id, sbd, Id, sxd, sb, Id, sx, Id]

task, maps = tpb._tlph_prepare(pad_factor=max(pads))

# tl kernel on the same grid (known phonon error)
_, _, eell_tl, G12_tl = tpb.eightops(rho0, ops_eell, maps)
print(f"tl eightops EELL     : {eell_tl:.6f}  max|G12 err| "
      f"{np.max(np.abs(G12_tl - G12_d)):.3e}")
for pad in pads:
    _, _, eell_h, G12_h = tpb.eightops_phonon(rho0, ops_eell, task, maps,
                                              pad_factor=pad)
    err = np.abs(G12_h - G12_d)
    i, j = np.unravel_index(err.argmax(), err.shape)
    print(f"hybrid pad={pad:<5}: EELL {eell_h:.6f}  max|G12 err| "
          f"{err.max():.3e} at (i={i}, j={j}, t1={t1[i]}, t2={t1[j]})")
