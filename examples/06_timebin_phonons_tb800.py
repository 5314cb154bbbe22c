"""Flagship reference-scale workload (SURVEY config 4 at full scale): time-bin
two-photon density matrix WITH phonons at tb = 800 ps — the reference's
default protocol scale (twophoton_new.py:100-181, defaults tb=800), which is
only feasible with the stationary PT (use_Gaussian_infinite equivalent,
engine/ptinf.py): a finite-horizon PT for 2.1*tb/dt = 16,800 steps would need
days of build time and ~10 GB of storage; the stationary PT builds in O(t_mem)
once and is cached.

The protocol: two-photon-resonant pulses in the early and late bins drive the
4-level dark model; the EE diagonal and the EE-LL coherence of the two-photon
time-bin density matrix give the concurrence.  Every matrix element is a
batched fan-out of full-chain PT lanes over the (t1, t2) grid — the exact
structure of the reference's ACE fan-out (workers=N), vmapped on one chip.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyaceqd_tpu.models.dark_model import darkmodel
from pyaceqd_tpu.pulses import Pulse
from pyaceqd_tpu.timebin import TwoPhotonTimebinNew

tmp = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
os.makedirs(tmp, exist_ok=True)

TB = 800.0      # reference default time-bin length [ps]
DT = 0.2
T_MEM = 20.48   # darkmodel fixed memory (reference dark_model.py:29)
GAMMA = 1 / 100

# Dark-exciton storage protocol (the point of the dark model,
# reference dark_model.py:13-32): the system STARTS in the dark exciton
# |2> (prepared beforehand); x-polarized pulses drive the RESONANT
# single-photon |2> -> |XX> transition (at delta_xd == delta_b the 2-3
# gap is zero, while 0-2 is 4 meV detuned).  A pi/2 pulse in the early
# bin makes (|D> + |XX>)/sqrt(2); the XX amplitude cascades through the
# bright X emitting the EE photon pair and ENDS IN |0>, which the 2-3
# drive does not address — so the late pi pulse converts only the stored
# dark amplitude to |XX> (-> LL pair), with no re-excitation of the
# already-decayed branch.  The EE-LL coherence rides on the dark-XX
# coherence stored for tb = 800 ps.
p1 = Pulse(tau=3.0, e_start=0, e0=0.5, t0=12, polar_x=1)     # pi/2 on 2-3
p2 = Pulse(tau=3.0, e_start=0, e0=1.0, t0=12 + TB, polar_x=1)  # pi on 2-3

# threshold=9 with the 29-site certified window is the CONVERGED corner of
# the measured convergence table (see footer): thr-9 rows agree to 2e-3
# regardless of window while building as fast as the thr-8 default
opts = {"verbose": True, "delta_xd": 4, "delta_b": 4, "gamma_e": GAMMA,
        "gamma_b": GAMMA, "lindblad": True, "phonons": True, "ae": 3.0,
        "temperature": 4.0, "use_infinite": True, "initial": "|2><2|_4",
        "threshold": 9, "window_tol": 1e-6, "temp_dir": tmp}

t0 = time.time()
tpb = TwoPhotonTimebinNew(darkmodel, "|0><1|_4", "|1><0|_4", "|1><3|_4",
                          "|3><1|_4", p1, p2, dt=DT, dim=4, tb=TB,
                          gaussian_t=24, options=opts)
conc, dm = tpb.calc_densitymatrix(reduced=True, use_second_zero=True)
elapsed = time.time() - t0
norm = np.trace(dm).real
print("tb = %g ps, dt = %g, t_mem = %g (stationary PT), phonons at 4 K"
      % (TB, DT, T_MEM))
print("two-photon time-bin density matrix (normalized):")
print(np.array2string(dm / norm, precision=4, suppress_small=True))
print("concurrence = %.4f   (wall clock %.1f s)" % (conc, elapsed))
import pyaceqd_tpu  # noqa: E402
print("PT diagnostics:", pyaceqd_tpu.format_pt_info())
# CONVERGENCE TABLE (measured on one v5e chip, 2026-08-18,
# scripts/flagship06_convergence.py; chi=25-27 unsaturated at cap 128,
# build residual 1.3-2.3e-6 in every row):
#
#   threshold  window [sites]   concurrence   wall (cold PT)
#   1e-8       29 (auto)        0.6040        1028 s
#   1e-8       102 (full)       0.5953        1533 s
#   1e-9       29 (forced)      0.5893         342 s
#   1e-9       96 (auto)        0.5912        2053 s
#
# The thr-1e-9 rows agree to 1.9e-3 regardless of window; the threshold
# step 8->9 at fixed window moves 4.1e-3 (full) / 1.5e-2 (reduced); the
# thr-8/29-site corner is the outlier and is therefore NOT the headline
# config.  Headline (this file): threshold=9, window_tol=1e-6 ->
# concurrence = 0.5893, converged to well under 1e-2 per knob.
#
# CROSS-METHOD row (measured 2026-08-19, same thr-9 PT): the INDEPENDENT
# v2 time-local 8-op fast path (calc_densitymatrix_tl, the reference's
# timebin_tl.f90 engine; run via `flagship06_convergence.py tl9::1e-6`)
# gives concurrence 0.5458 — a 4.4e-2 gap that is the KNOWN approximation
# of time-local maps with phonons (operator insertions ignore bath
# correlations within t_mem = 20.48 ps of each (t1, t2) point; the
# reference warns "will give wrong results" for exactly this path,
# twophoton_new.py:568-577).  It confirms the direct-PT number at the
# accuracy the tl method supports; the direct (t1, t2) PT fan-out above
# remains the quantitative engine with phonons.
#
# TLPH row (measured 2026-08-21, same thr-9 PT; `flagship06_convergence.py
# tlph9::1e-6`): the phonon-correct hybrid (calc_densitymatrix_tl_phonon —
# exact PT windows around every insertion + slip correction) gives
# concurrence 0.5496 in 1679 s — only 3.8e-3 above tl, closing a tenth of
# the 4.4e-2 gap, and SLOWER than this file's direct fan-out (342 s warm
# PT): at tb=800 with gamma = 1/100 the per-cluster host-synced
# map-transport calls dominate and the slowly-relaxing (100 ps) system
# keeps the restart slip large, so the residual — the tl-transport error
# of the slip correction itself, measured ~27% of the correction at the
# tb=20 anchor — stays at the few-1e-2 level.  Where the hybrid DOES
# discriminate: the tb=100 referee (gamma = 1/10, scripts/tlph_referee.py)
# measures hybrid |dC| = 5.4e-4 vs direct where tl errs 7.0e-3, and the
# quadrature-matched tb=20 G12 anchor 4.8e-3 vs tl's 2.9e-1.  For this
# flagship (long storage, slow relaxation) the direct fan-out above is
# BOTH the quantitative and the faster engine; the hybrid's regime is
# mid-tb protocols with ordinary relaxation rates.
# HISTORY: round 2 reported concurrence 0.1972 from a chi=13 stationary
# build — an ARTIFACT of premature steady-state detection (the slow
# n_mem=102 transient passed the lag-1 drift tolerance mid-transient and
# the per-bond rank locks froze the undersized pattern; ADVICE r2 finding
# 1).  The rank-growth-aware detector (max-tail drift + lag-8P flatness
# guard, commit 4219791) converges at chi=25 and the EE-LL coherence
# triples.  Anchors: the convergence table above and the reduced-tb
# finite-vs-stationary protocol gate
# (tests/test_timebin.py::test_twophoton_dark_storage_finite_vs_stationary
# _phonons).
# The dark storage suppresses the EL/LE error channels by ~350x relative
# to the naive ground-state TPE protocol; the remaining concurrence
# reduction is the phonon + radiative dephasing of the dark-XX coherence
# over the 800 ps bin and the unbalanced pi/2 (EE != LL).
