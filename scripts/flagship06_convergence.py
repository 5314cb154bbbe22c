"""Threshold-convergence anchor for flagship example 06 (VERDICT r2 item 1b).

Runs the exact tb=800 dark-exciton-storage time-bin protocol of
examples/06_timebin_phonons_tb800.py at a sweep of stationary-PT build
thresholds (and chi caps) and reports the concurrence / density-matrix
deltas.  The flagship number is anchored when the concurrence moves < 1e-2
between adjacent rows.

Usage:  python scripts/flagship06_convergence.py [row ...]
        (default rows: 8 9).  Each row is "thr[:chi_max][:window_tol]" on the
        stationary build, e.g. "8", "8:256", "8::0" (0 = full window).
        Prefix a row with "tl" (e.g. "tl9::1e-6") to compute the density
        matrix through the INDEPENDENT v2 time-local 8-op fast path
        (calc_densitymatrix_tl — the reference's timebin_tl.f90 contract,
        twophoton_new.py:100-181) instead of the direct (t1, t2) PT fan-out:
        a cross-METHOD anchor sharing only the PT build with the direct rows.

Each row builds its own stationary PT (cached per threshold under
examples/.cache) and runs the full (t1, t2) fan-out on the attached chip,
so expect ~10 min/row warm, ~40 min/row cold.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pyaceqd_tpu.models.dark_model import darkmodel
from pyaceqd_tpu.pulses import Pulse
from pyaceqd_tpu.timebin import TwoPhotonTimebinNew

tmp = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "examples", ".cache")
os.makedirs(tmp, exist_ok=True)

TB = float(os.environ.get("FLAG06_TB", "800.0"))
DT = 0.2
GAMMA = 1 / 100


def run_row(threshold, chi_max=None, window_tol=None, tl=False, tlph=False):
    p1 = Pulse(tau=3.0, e_start=0, e0=0.5, t0=12, polar_x=1)
    p2 = Pulse(tau=3.0, e_start=0, e0=1.0, t0=12 + TB, polar_x=1)
    opts = {"verbose": True, "delta_xd": 4, "delta_b": 4, "gamma_e": GAMMA,
            "gamma_b": GAMMA, "lindblad": True, "phonons": True, "ae": 3.0,
            "temperature": 4.0, "use_infinite": True, "initial": "|2><2|_4",
            "threshold": threshold, "temp_dir": tmp}
    if chi_max is not None:
        opts["chi_max"] = chi_max
    if window_tol is not None:
        opts["window_tol"] = window_tol
    t0 = time.time()
    tpb = TwoPhotonTimebinNew(darkmodel, "|0><1|_4", "|1><0|_4", "|1><3|_4",
                              "|3><1|_4", p1, p2, dt=DT, dim=4, tb=TB,
                              gaussian_t=24, options=opts)
    if tlph:
        conc, dm, _ = tpb.calc_densitymatrix_tl_phonon(reduced=True)
    elif tl:
        conc, dm, _ = tpb.calc_densitymatrix_tl(reduced=True)
    else:
        conc, dm = tpb.calc_densitymatrix(reduced=True, use_second_zero=True)
    dm = dm / np.trace(dm).real
    import pyaceqd_tpu
    info = pyaceqd_tpu.last_pt_info()
    print("[row %sthr=%s chi_max=%s wtol=%s] concurrence=%.4f  wall=%.0fs  %s"
          % ("tlph " if tlph else ("tl " if tl else ""), threshold, chi_max,
             window_tol, conc, time.time() - t0,
             pyaceqd_tpu.format_pt_info(info)), flush=True)
    return conc, dm, info


def _parse_row(spec):
    """'thr[:chi_max][:window_tol]' -> kwargs for run_row."""
    spec = str(spec)
    kw = {}
    if spec.startswith("tlph"):
        kw["tlph"] = True
        spec = spec[4:]
    elif spec.startswith("tl"):
        kw["tl"] = True
        spec = spec[2:]
    parts = spec.split(":")
    kw["threshold"] = float(parts[0])
    if len(parts) > 1 and parts[1]:
        kw["chi_max"] = int(parts[1])
    if len(parts) > 2 and parts[2] != "":
        kw["window_tol"] = float(parts[2])
    return kw


def main():
    rows = sys.argv[1:] or ["8", "9"]
    res = {}
    for spec in rows:
        res[spec] = run_row(**_parse_row(spec))
    base = rows[0]
    conc0, dm0, _ = res[base]
    print("\n=== convergence table (base row=%s) ===" % base)
    for spec in rows[1:]:
        conc, dm, _ = res[spec]
        print("row %s -> %s: d_concurrence = %.2e, max|d_dm| = %.2e"
              % (base, spec, abs(conc - conc0), np.max(np.abs(dm - dm0))),
              flush=True)


if __name__ == "__main__":
    main()
