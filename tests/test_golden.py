"""Golden regression gates (SURVEY.md §4 item 4).

Every test recomputes one BASELINE config and compares against the committed
artifact in tests/golden/*.npz at 1e-6 (CPU f64).  The goldens were generated
once by scripts/make_golden.py; cross-method tests elsewhere validate physics,
THESE catch refactors that shift both methods together (VERDICT r1 item 2).

If a legitimate physics fix changes the numbers, regenerate deliberately with
scripts/make_golden.py and explain the drift in the commit message.
"""

import os
import runpy

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")
TOL = 1e-6


def _load(name):
    path = os.path.join(GOLD, name + ".npz")
    if not os.path.exists(path):
        pytest.skip(f"golden file {name}.npz not generated yet "
                    "(run scripts/make_golden.py)")
    return np.load(path)


def _gen(name):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    mod = runpy.run_path(os.path.join(repo, "scripts", "make_golden.py"))
    os.makedirs(mod["CACHE"], exist_ok=True)
    return mod[name]()


def _compare(name, tol=TOL):
    # report EVERY failing key, not just the first: in round 4 the x_fin
    # failure masked an independent x_inf drift for a whole round
    ref = _load(name)
    got = _gen(name)
    failures = []
    for key in ref.files:
        a, b = np.asarray(ref[key]), np.asarray(got[key])
        if a.shape != b.shape:
            failures.append(f"{name}/{key}: shape {b.shape} != {a.shape}")
            continue
        err = float(np.max(np.abs(a - b))) if a.size else 0.0
        if not err < tol:
            failures.append(f"{name}/{key}: drift {err:.3e} >= {tol}")
    assert not failures, "; ".join(failures)


def test_golden_rabi_map():
    _compare("rabi_map")


def test_golden_phonon_tls():
    _compare("phonon_tls")


def test_golden_biexciton_g2():
    _compare("biexciton_g2")


def test_golden_timebin_dm():
    _compare("timebin_dm")


def test_golden_sixls_bfield():
    _compare("sixls_bfield")
