"""Time-bin layer tests: one-photon dm, two-photon dm (v1 + v2 + tl fast
path), cross-method agreement on small grids.

Uses the reduced dark model driven by y-polarized pulses in both bins, the
reference's standard time-bin protocol shape (early + late excitation)."""

import numpy as np
import pytest

from pyaceqd_tpu.models.dark_model import darkmodel
from pyaceqd_tpu.models.reduced_dark import darkmodel as darkmodel3
from pyaceqd_tpu.ops.dsl import parse_operator
from pyaceqd_tpu.pulses import Pulse
from pyaceqd_tpu.timebin import (OnePhotonTimebin, TwoPhotonTimebin,
                                 TwoPhotonTimebinNew)

TB = 24.0
DT = 0.2
GAMMA = 1 / 10


def _pulses():
    # early and late excitation pulses (y-polarized drives G-X in darkmodel3)
    p1 = Pulse(tau=1.5, e_start=0, e0=1, t0=6, polar_x=0)
    p2 = Pulse(tau=1.5, e_start=0, e0=1, t0=6 + TB, polar_x=0)
    return p1, p2


OPTS = {"verbose": False, "delta_xd": 4, "gamma_e": GAMMA, "lindblad": True,
        "phonons": False}


def test_onephoton_densitymatrix():
    p1, p2 = _pulses()
    opt = dict(OPTS)
    tpb = OnePhotonTimebin(darkmodel3, "|0><1|_3", p1, p2, dt=DT, tb=TB,
                           gaussian_t=12, options=opt)
    rho_ee, rho_ll, rho_el, norm = tpb.calc_densitymatrix()
    # both bins get similar single-photon probability
    assert rho_ee > 0
    assert np.isclose(rho_ee, rho_ll, rtol=0.15)
    # coherence bounded by sqrt(ee*ll)
    assert rho_el <= np.sqrt(rho_ee * rho_ll) * 1.05


def _tpe_pulses():
    # two-photon-resonant pulses on the 4-level dark model (delta_b=4)
    p1 = Pulse(tau=1.5, e_start=-2, e0=2 * np.pi, t0=6, polar_x=0)
    p2 = Pulse(tau=1.5, e_start=-2, e0=2 * np.pi, t0=6 + TB, polar_x=0)
    return p1, p2


OPTS4 = {"verbose": False, "delta_xd": 4, "delta_b": 4, "gamma_e": GAMMA,
         "gamma_b": GAMMA, "lindblad": True, "phonons": False}


def test_twophoton_v1_diagonals():
    p1, p2 = _tpe_pulses()
    tpb = TwoPhotonTimebin(darkmodel, "|0><1|_4", "|1><3|_4", p1, p2, dt=DT,
                           tb=TB, gaussian_t=12, options=dict(OPTS4))
    t1, g2, ee = tpb.rho_ee_ee()
    _, _, ll = tpb.rho_ll_ll()
    assert ee > 0 and ll > 0
    # symmetric protocol: EE ~ LL
    assert np.isclose(ee, ll, rtol=0.2)


def test_twophoton_v2_tl_crossvalidation():
    # the pure-python tl kernel and the batched device kernel must agree
    p1, p2 = _tpe_pulses()
    tpb = TwoPhotonTimebinNew(darkmodel, "|0><1|_4", "|1><0|_4", "|1><3|_4",
                              "|3><1|_4", p1, p2, dt=DT, dim=4, tb=TB,
                              gaussian_t=12, options=dict(OPTS4))
    t1a, g2a, eell_a, _, _, G12a = tpb.eell_tl()
    t1b, g2b, eell_b, G12b = tpb.eell_tl_f()
    assert np.allclose(G12a, G12b, atol=1e-8)
    assert np.isclose(eell_a, eell_b, atol=1e-10)


def test_twophoton_v2_direct_vs_tl():
    # the EE diagonal from the direct fan-out must match the tl fast path
    p1, p2 = _tpe_pulses()
    tpb = TwoPhotonTimebinNew(darkmodel, "|0><1|_4", "|1><0|_4", "|1><3|_4",
                              "|3><1|_4", p1, p2, dt=DT, dim=4, tb=TB,
                              gaussian_t=12, options=dict(OPTS4))
    _, _, _, ee_direct, *_ = tpb.rho_ee_ee(use_second_zero=True)
    conc, dm, dm_norm = tpb.calc_densitymatrix_tl(reduced=True)
    assert np.isclose(dm[0, 0].real, ee_direct, rtol=0.02)
    # density matrix sanity
    assert 0 <= conc <= 1
    assert np.isclose(np.trace(dm_norm), 1.0, atol=1e-10)


def test_twophoton_v2_densitymatrix():
    p1, p2 = _tpe_pulses()
    tpb = TwoPhotonTimebinNew(darkmodel, "|0><1|_4", "|1><0|_4", "|1><3|_4",
                              "|3><1|_4", p1, p2, dt=DT, dim=4, tb=TB,
                              gaussian_t=12, options=dict(OPTS4))
    conc, dm = tpb.calc_densitymatrix(reduced=True, use_second_zero=True)
    assert 0 <= conc <= 1
    # EE and LL populated, diagonal real positive
    assert dm[0, 0].real > 0 and dm[3, 3].real > 0
    # timebin protocol: |EE>+|LL> entanglement -> coherence comparable to pops
    assert abs(dm[0, 3]) > 0.1 * np.sqrt(dm[0, 0].real * dm[3, 3].real)


def test_tl_dynmaps_phonon_horizon(tmp_path):
    """With phonons the tl fast path must extract its per-bin maps over a
    horizon covering the bath settling time 2.1*(gaussian_t + t_mem), capped
    at tb; without phonons the reference horizon gaussian_t+10 stands
    (reference twophoton_new.py:568-577 extracts at gaussian_t+10
    unconditionally and warns about phonons).  The guard protects against the
    stationary map being extracted mid-transient and its residual-rate error
    compounding over ~tb/dt applications; the tl engine's separate
    insertion-time phonon approximation is measured at the tb=800 flagship
    (examples/06 footer: tl 0.5458 vs direct 0.5893)."""
    horizons = []

    def fake_system(t_start, t_end, calc_dynmap=True, **opts):
        horizons.append(t_end)
        n = int(round((t_end - t_start) / 0.2)) + 1
        dm = np.broadcast_to(np.eye(16, dtype=complex), (n, 16, 16)).copy()
        return None, dm

    tb = 96.0
    p1 = Pulse(tau=1.5, e_start=0, e0=0.5, t0=4, polar_x=1)
    p2 = Pulse(tau=1.5, e_start=0, e0=1.0, t0=4 + tb, polar_x=1)
    for phonons, expected in ((False, 24 + 10), (True, 2.1 * (24 + 20.0))):
        horizons.clear()
        opts = {"gamma_e": 0.01, "phonons": phonons, "t_mem": 20.0,
                "temp_dir": str(tmp_path)}
        tpb = TwoPhotonTimebinNew(fake_system, "|0><1|_4", "|1><0|_4",
                                  "|1><3|_4", "|3><1|_4", p1, p2, dt=0.2,
                                  dim=4, tb=tb, gaussian_t=24, options=opts)
        tpb._calc_dynmaps()
        assert np.isclose(horizons[0], expected), (phonons, horizons)
    # capped at tb when the settling horizon exceeds the bin
    horizons.clear()
    p2s = Pulse(tau=1.5, e_start=0, e0=1.0, t0=4 + 48.0, polar_x=1)
    opts_short = {"gamma_e": 0.01, "phonons": True, "t_mem": 20.0,
                  "temp_dir": str(tmp_path)}
    tpb2 = TwoPhotonTimebinNew(fake_system, "|0><1|_4", "|1><0|_4",
                               "|1><3|_4", "|3><1|_4", p1, p2s, dt=0.2,
                               dim=4, tb=48.0, gaussian_t=24,
                               options=opts_short)
    tpb2._calc_dynmaps()
    assert np.isclose(horizons[0], 48.0)


@pytest.mark.slow
def test_twophoton_tl_phonon_hybrid_vs_direct():
    """The phonon-correct tl hybrid (eightops_phonon: exact PT windows
    around every insertion + exact-map transport across the memoryless gaps
    + first-order restart-slip correction) must reproduce the DIRECT
    four_time correlator ON THE SAME (t1, t2) GRID — the capability the
    reference's tl fast path lacks (it warns "will give wrong results" with
    phonons, reference twophoton_new.py:568-577).  VERDICT r3 item 4.

    The gate is kernel-level (quadrature-matched) on the EELL element — the
    most demanding: four insertions spanning both bins, carrying the stored
    dark-XX coherence.  A dm-level comparison at this reduced tb would be
    meaningless: tb=20 with gaussian_t=7 is a degenerate protocol where the
    DIRECT elements' own quadratures (rho_ee_ee's uniform-t2 grid vs the
    triu gaussian grid) disagree at the 1e-1 level even WITHOUT phonons
    (measured, scripts/tlph_quadcheck.py; at tb=100 the same control agrees
    to 2.9e-3).  Measured here: plain tl 2.7e-1, hybrid merged-limit
    2.4e-6, hybrid split-window 4.8e-3."""
    tb = 20.0
    dt = 0.4
    p1 = Pulse(tau=1.5, e_start=0, e0=0.5, t0=4, polar_x=1)
    p2 = Pulse(tau=1.5, e_start=0, e0=1.0, t0=4 + tb, polar_x=1)
    opts = {"verbose": False, "delta_xd": 4, "delta_b": 4,
            "gamma_e": GAMMA, "gamma_b": GAMMA, "lindblad": True,
            "phonons": True, "ae": 3.0, "temperature": 4.0,
            "t_mem": 3.2, "threshold": 8, "use_infinite": True,
            "chi_max": 32, "initial": "|2><2|_4"}
    tpb = TwoPhotonTimebinNew(darkmodel, "|0><1|_4", "|1><0|_4",
                              "|1><3|_4", "|3><1|_4", p1, p2, dt=dt,
                              dim=4, tb=tb, gaussian_t=7, options=opts)
    # direct EELL (first ordering) on the triu grid: exact anchor
    _, _, eell_d, G12_d = tpb.four_time(
        [tpb.sigma_x, tpb.sigma_x + "*" + tpb.sigma_b],
        {"operator": tpb.sigma_bdag, "applyFrom": "_right",
         "applyBefore": "false"},
        {"operator": tpb.sigma_xdag, "applyFrom": "_right",
         "applyBefore": "false"},
        {"operator": tpb.sigma_b, "applyFrom": "_left",
         "applyBefore": "false"})
    rho0 = tpb.get_initial_state()
    Id = np.eye(rho0.shape[0])
    sx, sxd = parse_operator(tpb.sigma_x), parse_operator(tpb.sigma_xdag)
    sb, sbd = parse_operator(tpb.sigma_b), parse_operator(tpb.sigma_bdag)
    ops_eell = [Id, sbd, Id, sxd, sb, Id, sx, Id]
    task, maps = tpb._tlph_prepare(pad_factor=1.0, bucket=16)
    # split-window regime: exact PT windows + slip correction
    _, _, eell_h, G12_h = tpb.eightops_phonon(rho0, ops_eell, task, maps,
                                              pad_factor=1.0, bucket=16)
    assert tpb._tlph_stats["n_windows_max"] >= 2  # really split, not merged
    # measured 4.78e-3 / 1.09e-3 (r5, per-event slip correction); the r4
    # bound was 1e-2 — tightened per VERDICT r4 item 6.  tb=100 referee
    # (scripts/tlph_referee.py 100 0.2): hybrid |dC| = 5.35e-4 vs tl 7.0e-3
    assert np.max(np.abs(G12_h - G12_d)) < 6e-3
    assert abs(eell_h - eell_d) < 1.5e-3
    # merged limit (every lane one window from step 0) must be PT-exact
    _, _, eell_m, G12_m = tpb.eightops_phonon(rho0, ops_eell, task, maps,
                                              pad_factor=50.0, bucket=16)
    assert tpb._tlph_stats["n_windows_max"] == 1
    assert np.max(np.abs(G12_m - G12_d)) < 1e-4
    # and the plain tl kernel really is phonon-wrong at this config (the
    # gap the hybrid closes)
    _, _, _, G12_tl = tpb.eightops(rho0, ops_eell, maps)
    assert np.max(np.abs(G12_tl - G12_d)) > 5e-2


@pytest.mark.slow
def test_twophoton_dark_storage_finite_vs_stationary_phonons():
    """Reduced-tb referee for the flagship dark-storage protocol (VERDICT r2
    item 1c, scaled for CI): the SAME darkmodel time-bin protocol as
    examples/06 (dark-exciton storage, x-polarized resonant 2-3 drive,
    initial |2><2|) with phonons at 4 K, computed through the FINITE-horizon
    PT and the STATIONARY PT — two independent constructions of the bath.
    Gates the stationary engine at protocol level, not just on static
    dephasing."""
    tb = 12.0
    dt = 0.4  # n_mem = 8: several bulk cycles inside each bin, CI-affordable
    p1 = Pulse(tau=1.5, e_start=0, e0=0.5, t0=4, polar_x=1)
    p2 = Pulse(tau=1.5, e_start=0, e0=1.0, t0=4 + tb, polar_x=1)
    res = {}
    for tag, inf in (("fin", False), ("sta", True)):
        opts = {"verbose": False, "delta_xd": 4, "delta_b": 4,
                "gamma_e": GAMMA, "gamma_b": GAMMA, "lindblad": True,
                "phonons": True, "ae": 3.0, "temperature": 4.0,
                "t_mem": 3.2, "threshold": 8, "use_infinite": inf,
                # same cap for both engines: the gate is cross-engine
                # agreement at equal capacity, not absolute accuracy
                "chi_max": 32,
                "initial": "|2><2|_4"}
        tpb = TwoPhotonTimebinNew(darkmodel, "|0><1|_4", "|1><0|_4",
                                  "|1><3|_4", "|3><1|_4", p1, p2, dt=dt,
                                  dim=4, tb=tb, gaussian_t=7,
                                  options=opts)
        res[tag] = tpb.calc_densitymatrix(reduced=True, use_second_zero=True)
    c_fin, dm_fin = res["fin"]
    c_sta, dm_sta = res["sta"]
    norm_f = np.trace(dm_fin).real
    norm_s = np.trace(dm_sta).real
    assert abs(c_fin - c_sta) < 1e-2
    assert np.max(np.abs(dm_fin / norm_f - dm_sta / norm_s)) < 1e-2
