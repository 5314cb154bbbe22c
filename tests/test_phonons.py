"""PT-MPO phonon engine validation against exactly solvable physics.

The independent-boson model (TLS with diagonal phonon coupling, no drive) has
a closed-form dephasing function — the engine's primary accuracy gate
(SURVEY.md §4: "independent-boson-model exact dephasing").
"""

import numpy as np
import pytest

from pyaceqd_tpu.engine import spectral
from pyaceqd_tpu.models.tls import tls
from pyaceqd_tpu.pulses import Pulse

AE = 5.0
TEMP = 4.0
DT = 0.1
TMEM = 6.4


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    # one PT cache shared by all tests in this module (mirrors the
    # reference's on-disk PT reuse, general_system.py:146-157); pre-warm with
    # the longest horizon so every test reuses its prefix
    d = tmp_path_factory.mktemp("ptcache")
    tls(0, 20, dt=DT, phonons=True, t_mem=TMEM, ae=AE, temperature=TEMP,
        temp_dir=str(d), threshold=8, use_infinite=False)
    return d


def _ibm_run(tmp_path, t_end=8.0, temperature=TEMP):
    rho0 = np.array([[0.5, 0.5], [0.5, 0.5]], dtype=complex)
    res = tls(0, t_end, dt=DT, phonons=True, t_mem=TMEM, ae=AE,
              temperature=temperature, rho0=rho0, lindblad=False,
              temp_dir=str(tmp_path), threshold=8, use_infinite=False)
    return res


def test_ibm_exact_dephasing(cache_dir):
    res = _ibm_run(cache_dir)
    t = res[0].real
    rho10 = res[4]  # output |1><0| -> Tr(|1><0| rho) = rho_01
    J = spectral.QDPhononJ(ae=AE)
    exact = 0.5 * spectral.ibm_dephasing(J, t, TEMP)
    # amplitude: exact superohmic dephasing curve
    assert np.allclose(np.abs(rho10), np.abs(exact), atol=2e-4)
    # phase (polaron-subtracted: bounded, small)
    mask = t > 0.1
    ph_engine = np.unwrap(np.angle(rho10[mask]))
    ph_exact = np.unwrap(np.angle(exact[mask]))
    assert np.allclose(np.abs(ph_engine), np.abs(ph_exact), atol=2e-3)


def test_ibm_trace_and_populations(cache_dir):
    res = _ibm_run(cache_dir)
    # diagonal coupling: populations are exactly conserved
    assert np.allclose(res[1].real, 0.5, atol=1e-6)
    assert np.allclose(res[2].real, 0.5, atol=1e-6)
    assert np.allclose((res[1] + res[2]).real, 1.0, atol=1e-6)


def test_ibm_temperature_dependence(cache_dir):
    # higher temperature -> stronger dephasing
    r4 = _ibm_run(cache_dir, temperature=4)
    r77 = _ibm_run(cache_dir, temperature=77)
    assert np.abs(r77[4][-1]) < np.abs(r4[4][-1]) * 0.8


def test_phonon_damped_rabi(cache_dir):
    # pi pulse with phonons: inversion below 1 but high (4K, ae=5nm), and
    # trace preserved under drive
    p = Pulse(tau=2, e_start=0, e0=1, t0=8)
    res = tls(0, 20, p, dt=DT, phonons=True, t_mem=TMEM, ae=AE, temperature=TEMP,
              temp_dir=str(cache_dir), threshold=8, use_infinite=False)
    occ = res[2][-1].real
    assert 0.8 < occ < 0.999
    assert np.allclose((res[1] + res[2]).real, 1.0, atol=1e-5)
    # reference point: without phonons the same pulse gives ~1
    res0 = tls(0, 20, p, dt=DT, phonons=False)
    assert res0[2][-1].real > 0.9999


def test_pt_cache_roundtrip(cache_dir):
    res1 = _ibm_run(cache_dir, t_end=4.0)
    # second run must hit the cache (same key) and give identical results
    res2 = _ibm_run(cache_dir, t_end=4.0)
    assert np.allclose(res1, res2)
    import glob
    assert glob.glob(str(cache_dir) + "/*_ptmpo*.npz")


def test_phonon_mto(cache_dir):
    # MTO application works inside the PT scan: sandwich sigma at t flips the
    # (phonon-dressed) excited population to ground
    p = Pulse(tau=2, e_start=0, e0=1, t0=8)
    mto = {"operator": "|0><1|_2", "time": 14.0, "applyFrom": ""}
    res = tls(0, 20, p, dt=DT, phonons=True, t_mem=TMEM, ae=AE, temperature=TEMP,
              temp_dir=str(cache_dir), threshold=8, use_infinite=False, multitime_op=mto)
    t = res[0].real
    i = np.argmin(np.abs(t - 14.0))
    assert res[2][i].real > 0.5
    assert res[2][i + 1].real < 1e-5


def test_phonon_dynmap(cache_dir):
    # dynamical maps with phonons reproduce direct outputs
    p = Pulse(tau=2, e_start=0, e0=0.8, t0=6)
    res, dm = tls(0, 12, p, dt=DT, phonons=True, t_mem=TMEM, ae=AE,
                  temperature=TEMP, temp_dir=str(cache_dir), threshold=8, use_infinite=False,
                  calc_dynmap=True)
    rho0 = np.array([1, 0, 0, 0], dtype=complex)
    occ = [0.0]
    for i in range(dm.shape[0]):
        occ.append((dm[i] @ rho0)[3].real)
    assert np.allclose(occ, res[2].real, atol=1e-7)


def test_rebalance_invariance_and_f32_safety():
    """rebalance() must leave observables exactly invariant while making an
    exponentially-scaled PT float32-castable (old caches stored caps growing
    ~3x/step, overflowing complex64 over long horizons)."""
    import numpy as np
    from pyaceqd_tpu.engine import ptmpo

    rng = np.random.default_rng(7)
    n, chi, G, d = 40, 6, 4, 2
    d2 = d * d
    # scale so the diagonal-slice products DECAY backward: the anchored
    # caps then grow exponentially toward m = n, like the real caches did
    stack = (rng.normal(size=(n, chi, G, chi))
             + 1j * rng.normal(size=(n, chi, G, chi))) / (3 * np.sqrt(chi))
    # force exponential cap growth like the unbalanced caches had
    g_diag = 0
    caps = np.zeros((n + 1, chi), dtype=complex)
    caps[n, 0] = 1.0
    for m in range(n - 1, -1, -1):
        caps[m] = stack[m][:, g_diag, :] @ caps[m + 1]
    caps = caps / caps[0][0]
    pt = ptmpo.ProcessTensor(stack=stack, caps=caps,
                             g_of_s=np.arange(d2) % G,
                             counter_term=np.zeros((d, d)), chi=chi, n_mem=8)
    assert np.abs(pt.caps).max() > 1e6  # genuinely unbalanced input

    new = ptmpo.rebalance(pt)
    assert np.abs(new.caps).max() < 1e3
    assert np.abs(new.stack).max() < 1e6
    # observable invariance: propagate both in f64
    U = np.broadcast_to(np.eye(d), (n, d, d)).astype(complex)
    rho0 = np.zeros(d2, dtype=complex)
    rho0[0] = 1.0
    W = np.eye(d2, dtype=complex)[:2]
    outs = []
    for p in (pt, new):
        ys, _ = ptmpo.propagate_pt(p, U, None, rho0, W,
                                   np.zeros((0, d2, d2)), np.zeros(0, np.int32))
        outs.append(np.asarray(ys))
    scale = np.max(np.abs(outs[0]))
    assert np.max(np.abs(outs[0] - outs[1])) / scale < 1e-10
    # re-balancing again must also leave observables invariant
    ys2, _ = ptmpo.propagate_pt(ptmpo.rebalance(new), U, None, rho0, W,
                                np.zeros((0, d2, d2)), np.zeros(0, np.int32))
    assert np.max(np.abs(np.asarray(ys2) - outs[1])) / scale < 1e-10


def test_finite_window_reduction(tmp_path):
    """The finite builder applies the exact-metric window reduction
    (get_process_tensor window_tol, default 100*threshold): a t_mem=10.2
    TLS bath (n_mem=51, certified window 33) must build reduced, report
    n_mem_req in the diagnostics, and reproduce the full-window driven
    observables to ~10x the certified constant-path tolerance."""
    import pyaceqd_tpu
    p = Pulse(tau=3, e_start=0, w_gain=0, t0=10, e0=1)
    kw = dict(dt=0.2, phonons=True, t_mem=10.2, ae=AE, temperature=TEMP,
              threshold=8, use_infinite=False, lindblad=False)
    r_red = tls(0, 24, p, temp_dir=str(tmp_path / "red"), **kw)
    info = pyaceqd_tpu.last_pt_info()
    assert info["engine"] == "finite"
    assert info["n_mem_req"] == 51
    assert info["n_mem"] < 40
    r_full = tls(0, 24, p, temp_dir=str(tmp_path / "full"), window_tol=0,
                 **kw)
    info_full = pyaceqd_tpu.last_pt_info()
    assert info_full["n_mem"] == 51
    for i in (1, 2, 3):
        assert np.max(np.abs(np.asarray(r_red[i]) - np.asarray(r_full[i]))) \
            < 1e-5
