"""PT diagnostics surfaced to callers (VERDICT r2 item 6 / ADVICE r2 #4).

Accuracy-relevant build facts must be visible programmatically, not just as
warnings users filter: chi_max saturation, stationary build residual, and the
weight-aware chi_max default.
"""

import numpy as np
import pytest

import pyaceqd_tpu
from pyaceqd_tpu.engine import ptmpo
from pyaceqd_tpu.models.tls import tls
from pyaceqd_tpu.pulses import Pulse


def test_default_chi_max_by_weight_span():
    # TLS-class coupling diag(0,1): span 1 -> 64
    assert ptmpo.default_chi_max(np.diag([0.0, 1.0])) == 64
    # biexciton/darkmodel diag(0,1,1,2): span 2 -> 128 (ACE's threshold-only
    # semantics would grow chi~127 at threshold 1e-8; docs/accuracy.md)
    assert ptmpo.default_chi_max(np.diag([0.0, 1.0, 1.0, 2.0])) == 128
    assert ptmpo.default_chi_max(np.diag([0.0, 1.0, 2.0])) == 128


def test_finite_build_records_info(tmp_path):
    tls(0, 4, dt=0.1, phonons=True, t_mem=1.6, ae=3.0, temperature=4.0,
        temp_dir=str(tmp_path), threshold=8, use_infinite=False)
    info = pyaceqd_tpu.last_pt_info()
    assert info is not None
    assert info["engine"] == "finite"
    assert info["chi_max"] == 64          # weight-span-1 default
    assert info["chi"] >= 1
    assert info["saturated"] == (info["chi"] >= info["chi_max"])
    assert info["cached"] is False
    # second run serves from cache and says so
    tls(0, 4, dt=0.1, phonons=True, t_mem=1.6, ae=3.0, temperature=4.0,
        temp_dir=str(tmp_path), threshold=8, use_infinite=False)
    info2 = pyaceqd_tpu.last_pt_info()
    assert info2["cached"] is True
    assert info2["chi"] == info["chi"]
    assert "chi=" in pyaceqd_tpu.format_pt_info(info2)


def test_saturation_is_visible_not_just_warned(tmp_path):
    # Force saturation with a tiny cap: the caller must be able to ASSERT on
    # it (warning-only accuracy paths get ignored in sweeps)
    with pytest.warns(UserWarning, match="saturated chi_max"):
        tls(0, 4, dt=0.1, phonons=True, t_mem=1.6, ae=3.0, temperature=4.0,
            temp_dir=str(tmp_path), threshold=8, use_infinite=False,
            chi_max=2)
    info = pyaceqd_tpu.last_pt_info()
    assert info["saturated"] is True
    assert info["chi_max"] == 2
    assert "SATURATED" in pyaceqd_tpu.format_pt_info(info)


def test_stationary_build_exposes_residual(tmp_path):
    p = Pulse(tau=2, e_start=0, e0=1, t0=3)
    tls(0, 8, p, dt=0.1, phonons=True, t_mem=1.6, ae=3.0, temperature=4.0,
        temp_dir=str(tmp_path), threshold=8, use_infinite=True)
    info = pyaceqd_tpu.last_pt_info()
    assert info["engine"] == "stationary"
    assert info["period"] >= 1
    assert info["build_residual"] is not None
    assert np.isfinite(info["build_residual"])
    # the accepted residual must sit below the warning-ladder cap
    assert info["build_residual"] <= 1e-4
    assert "residual=" in pyaceqd_tpu.format_pt_info(info)
