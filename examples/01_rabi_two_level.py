"""Baseline config 1: two-level QD, Gaussian pulses, no phonons.

Rabi oscillations vs pulse area — the full sweep runs as ONE compiled
program with every area in a separate SPMD lane (the reference spawns one
ACE subprocess per area via a thread pool)."""

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyaceqd_tpu.engine import hamiltonian as ham
from pyaceqd_tpu.parallel.sweep import area_sweep
from pyaceqd_tpu.pulses import ChirpedPulse

spec, _ = ham.build_system(
    system_op=None, lindblad_ops=None,
    interaction_ops=[["|1><0|_2", "x"]], initial="|0><0|_2",
    output_ops=["|1><1|_2"])

pulse = ChirpedPulse(tau_0=3.0, e_start=0, alpha=0, e0=1, t0=12.0)
areas = np.linspace(0, 6, 121)
t, outs = area_sweep(spec, [pulse], areas, 0, 24, 0.05)
occ = np.real(outs[:, -1, 0])

print("area  occupation  sin^2(area*pi/2)")
for a, o in zip(areas[::20], occ[::20]):
    print("%4.1f   %8.5f     %8.5f" % (a, o, np.sin(a * np.pi / 2) ** 2))
print("max deviation from the area law: %.2e"
      % np.max(np.abs(occ - np.sin(areas * np.pi / 2) ** 2)))
