"""Parity of the MXU-folded phonon sweep kernel vs the reference core.

_area_sweep_pt_mxu_core folds the dissipator half-steps and the PT bond
contraction into one (chi*d2)^2 matmul per step (full MXU tiles at the bench
shapes, where the base core's K,N <= 25 contractions fill ~4% of a tile —
scripts/sweep_layout_exp.py).  Folding must be EXACTLY the same linear map:
these tests pin base-vs-mxu parity at f64 on CPU, the stationary-stack
dedupe, and the kernel selector.
"""

import os

import numpy as np
import pytest

from pyaceqd_tpu.engine import hamiltonian as ham
from pyaceqd_tpu.engine import ptmpo, spectral
from pyaceqd_tpu.parallel import sweep
from pyaceqd_tpu.pulses import Pulse


@pytest.fixture(scope="module")
def tls_phonon_setup(tmp_path_factory):
    spec, _ = ham.build_system(
        system_op=None,
        lindblad_ops=[["|0><1|_2", 0.02]],
        interaction_ops=[["|1><0|_2", "x"]],
        initial="|0><0|_2",
        output_ops=["|0><0|_2", "|1><1|_2"],
        boson_op="1*|1><1|_2")
    J = spectral.QDPhononJ(ae=3.0)
    eta = spectral.eta_coefficients(J, 0.1, 12, 4.0)
    g_of_s, nu, mu = ptmpo.liouville_groups(np.diag([0.0, 1.0]))
    pt = ptmpo.assemble_process_tensor(eta, g_of_s, nu, mu,
                                       np.zeros((2, 2)), 80,
                                       threshold=1e-8, chi_max=32)
    return spec, pt


def _run(spec, pt, kernel, n_lanes=6, t_end=8.0):
    p = Pulse(tau=1.5, e_start=0, w_gain=0, t0=3, e0=1)
    areas = np.linspace(0.2, 6, n_lanes)
    old = os.environ.get("PYACEQD_TPU_SWEEP_KERNEL")
    os.environ["PYACEQD_TPU_SWEEP_KERNEL"] = kernel
    try:
        t, outs = sweep.area_sweep(spec, [p], areas, 0, t_end, 0.1, pt=pt)
    finally:
        if old is None:
            os.environ.pop("PYACEQD_TPU_SWEEP_KERNEL", None)
        else:
            os.environ["PYACEQD_TPU_SWEEP_KERNEL"] = old
    return outs


def test_mxu_kernel_matches_base(tls_phonon_setup):
    spec, pt = tls_phonon_setup
    o_base = _run(spec, pt, "base")
    o_mxu = _run(spec, pt, "mxu")
    assert np.max(np.abs(o_base - o_mxu)) < 1e-12


def test_mxu_kernel_matches_base_no_diss(tls_phonon_setup):
    spec, pt = tls_phonon_setup
    import copy
    spec2 = copy.copy(spec)   # keeps post-init attrs (pol_index) that
    spec2.diss_sop = None     # dataclasses.replace would drop
    o_base = _run(spec2, pt, "base")
    o_mxu = _run(spec2, pt, "mxu")
    assert np.max(np.abs(o_base - o_mxu)) < 1e-12


def test_dedupe_stack_roundtrip():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 2, 4, 2)) + 1j * rng.standard_normal((3, 2, 4, 2))
    # horizon of 10 steps: 3 init + bulk tiling a[2]
    stack = np.concatenate([a, np.broadcast_to(a[2], (7, 2, 4, 2))])
    stack_u, idx = sweep._dedupe_stack(stack)
    assert stack_u.shape[0] == 3
    assert np.array_equal(stack_u[idx], stack)
    # first-occurrence order preserved (init segment contiguous)
    assert np.array_equal(idx[:3], [0, 1, 2])
    assert np.all(idx[3:] == 2)


def test_selector_picks_mxu_for_small_folds(tls_phonon_setup, monkeypatch):
    spec, pt = tls_phonon_setup
    monkeypatch.delenv("PYACEQD_TPU_SWEEP_KERNEL", raising=False)
    p = Pulse(tau=1.5, e_start=0, w_gain=0, t0=3, e0=1)
    _, _, fn, _, _ = sweep._prep_sweep(spec, [p], np.ones(2), 0, 4.0, 0.1,
                                       pt, None)
    assert fn is sweep._area_sweep_pt_mxu_core
    monkeypatch.setattr(sweep, "_MXU_FOLD_MAX_K", 1)
    _, _, fn, _, _ = sweep._prep_sweep(spec, [p], np.ones(2), 0, 4.0, 0.1,
                                       pt, None)
    assert fn is sweep._area_sweep_pt_core
