"""On-chip smoke battery: drives every major subsystem on the REAL TPU with
tiny configurations and closed-form (or CPU-anchored) expectations.

The CPU test suite cannot catch TPU-only failures (different jit boundary
rules, matmul precision, backend quirks), so this script is the chip-side
gate.  Run: python scripts/tpu_smoke.py   (~5 min, needs the chip idle).
"""

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        RESULTS.append((name, "PASS", time.time() - t0, ""))
        print("PASS  %-38s %5.1fs" % (name, time.time() - t0), flush=True)
    except Exception as e:
        RESULTS.append((name, "FAIL", time.time() - t0, str(e)))
        print("FAIL  %-38s %s" % (name, e), flush=True)
        traceback.print_exc()


def main():
    import jax
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    import tempfile
    tmp = tempfile.mkdtemp(prefix="tpu_smoke_")
    ptdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         ".bench_cache")
    os.makedirs(ptdir, exist_ok=True)

    from pyaceqd_tpu.models.tls import tls
    from pyaceqd_tpu.pulses import ChirpedPulse

    def t_decay():
        res = tls(0, 100, dt=0.1, gamma_e=0.01, lindblad=True, phonons=False,
                  initial="|1><1|_2", temp_dir=tmp)
        assert abs(np.real(res[2][-1]) - np.exp(-1)) < 3e-4
    check("lindblad decay", t_decay)

    def t_rabi():
        p = ChirpedPulse(tau_0=3.0, e_start=0, alpha=0, e0=1, t0=12.0)
        res = tls(0, 24, p, dt=0.05, gamma_e=0, lindblad=False, phonons=False,
                  temp_dir=tmp)
        assert abs(np.real(res[2][-1]) - 1.0) < 1e-3
    check("pi-pulse inversion", t_rabi)

    def t_phonon():
        res = tls(0, 10, dt=0.1, gamma_e=0.1, lindblad=True, phonons=True,
                  t_mem=1.6, ae=3.0, temperature=4, threshold=8,
                  initial="|1><1|_2", temp_dir=ptdir)
        assert abs(np.real(res[2][-1]) - np.exp(-1)) < 1e-3
    check("phonon PT scan (diag coupling)", t_phonon)

    def t_dressed():
        p = ChirpedPulse(tau_0=3.0, e_start=0, alpha=0, e0=2, t0=12.0)
        # dressed-state eigenvalues at pulse peak split by hbar*Omega
        from pyaceqd_tpu.engine.simulate import simulate
        r = simulate(0, 24, p, dt=0.1, lindblad=False, phonons=False,
                     dressedstates=True, temp_dir=tmp,
                     interaction_ops=[["|1><0|_2", "x"]], system_op=None,
                     output_ops=["|0><0|_2"], system_prefix="smds")
        t = np.real(r[0])
        k = np.argmin(np.abs(t - 12.0))
        splitting = np.real(r[2][k] - r[1][k])
        assert splitting > 0.1  # nonzero Rabi splitting at the peak
    check("dressed states (eigh mode)", t_dressed)

    def t_dynmap():
        from pyaceqd_tpu.engine.simulate import simulate
        res, dm = simulate(0, 5, dt=0.5, lindblad=True, phonons=False,
                           initial="|1><1|_2", system_op=None,
                           lindblad_ops=[["|0><1|_2", 0.1]],
                           interaction_ops=[["|1><0|_2", "x"]],
                           output_ops=["|1><1|_2"], calc_dynmap=True,
                           temp_dir=tmp, system_prefix="sm",
                           multitime_op=[])
        rho0 = np.array([0, 0, 0, 1], dtype=complex)
        occ = np.real(np.asarray(dm)[-1] @ rho0)[3]
        assert abs(occ - np.exp(-0.5)) < 1e-3
    check("dynamical maps", t_dynmap)

    def t_correlation():
        from pyaceqd_tpu.correlations import two_op_two_time
        t_axis = np.arange(0, 4.0 + 1e-9, 1.0)
        tt, tau, G = two_op_two_time(
            tls, t_axis, opA="|1><0|_2", opB="|0><1|_2", tau_max=4.0, dt=0.1,
            options={"gamma_e": 0.2, "lindblad": True, "phonons": False,
                     "initial": "|1><1|_2", "temp_dir": tmp})
        expect = np.exp(-0.2 * tt)[:, None] * np.exp(-0.1 * tau)[None, :]
        assert np.max(np.abs(np.real(G) - expect)) < 1e-4
    check("branched two-time G1", t_correlation)

    def t_sweep():
        from pyaceqd_tpu.engine import hamiltonian as ham
        from pyaceqd_tpu.parallel.sweep import area_sweep
        spec, _ = ham.build_system(
            system_op=None, lindblad_ops=None,
            interaction_ops=[["|1><0|_2", "x"]], initial="|0><0|_2",
            output_ops=["|1><1|_2"])
        p = ChirpedPulse(tau_0=2.0, e_start=0, alpha=0, e0=1, t0=8.0)
        areas = np.linspace(0, 4, 64)
        t, outs = area_sweep(spec, [p], areas, 0, 16, 0.05)
        occ = np.real(outs[:, -1, 0])
        assert np.max(np.abs(occ - np.sin(areas * np.pi / 2) ** 2)) < 2e-3
    check("batched area sweep", t_sweep)

    def t_polent():
        from pyaceqd_tpu.models.biexciton import biexciton
        from pyaceqd_tpu.pol_entanglement import PolarizatzionEntanglement
        opts = {"gamma_e": 1 / 20, "lindblad": True, "phonons": False,
                "delta_b": 4, "delta_xy": 0, "initial": "|3><3|_4",
                "temp_dir": tmp}
        pol = PolarizatzionEntanglement(
            biexciton, "|0><1|_4 + |1><3|_4", "|0><2|_4 + |2><3|_4",
            "|1><0|_4 + |3><1|_4", "|2><0|_4 + |3><2|_4", dt=0.4, tend=120,
            dt_small=2.0, regular_grid=True, options=opts)
        conc = pol.calc_densitymatrix_reuse()
        assert conc > 0.98
    check("polarization entanglement", t_polent)

    def t_timebin():
        from pyaceqd_tpu.timebin import OnePhotonTimebin
        p1 = ChirpedPulse(tau_0=2, e_start=0, alpha=0, e0=1, t0=6)
        tb = OnePhotonTimebin(tls, "|0><1|_2", p1, tb=40, dt=0.2,
                              simple_exp=True, gaussian_t=None,
                              options={"gamma_e": 1 / 10, "lindblad": True,
                                       "phonons": False, "temp_dir": tmp})
        rho_ee, rho_ll, rho_el, norm = tb.calc_densitymatrix()
        assert rho_ee / norm > 0.9      # early-bin emission dominates
        assert 0 <= rho_el / norm <= 0.5 + 1e-9
    check("one-photon timebin dm", t_timebin)

    def t_stationary_long():
        # stationary (use_Gaussian_infinite-style) PT: an 800 ps horizon
        # (8000 steps) propagated with the O(1)-storage uniform bulk; decay
        # and trace must stay exact at f32
        res = tls(0, 800, dt=0.1, gamma_e=1 / 400, lindblad=True,
                  phonons=True, t_mem=3.2, ae=3.0, temperature=4,
                  threshold=8, use_infinite=True, initial="|1><1|_2",
                  temp_dir=ptdir)
        x = np.real(res[2])
        trace = np.real(res[1] + res[2])
        assert np.max(np.abs(trace - 1.0)) < 2e-3
        assert abs(x[-1] - np.exp(-2)) < 5e-3
        # accuracy facts are asserted, not warned (ADVICE r2): a stationary
        # build that stalled above 1e-4 must fail the smoke, not just warn
        import pyaceqd_tpu
        info = pyaceqd_tpu.last_pt_info()
        assert info and info["engine"] == "stationary", info
        assert info["build_residual"] <= 1e-4, info
    check("stationary PT 800ps horizon", t_stationary_long)

    def t_timebin_phonons():
        # SURVEY config 4 with phonons (reduced scale of examples/06): EE
        # diagonal of the two-photon timebin dm through full-chain PT lanes
        from pyaceqd_tpu.models.dark_model import darkmodel
        from pyaceqd_tpu.pulses import Pulse
        from pyaceqd_tpu.timebin import TwoPhotonTimebinNew
        tb_len = 60.0
        p1 = Pulse(tau=1.5, e_start=-2, e0=2 * np.pi, t0=6, polar_x=0)
        p2 = Pulse(tau=1.5, e_start=-2, e0=2 * np.pi, t0=6 + tb_len,
                   polar_x=0)
        opts = {"verbose": False, "delta_xd": 4, "delta_b": 4,
                "gamma_e": 0.1, "gamma_b": 0.1, "lindblad": True,
                "phonons": True, "ae": 3.0, "temperature": 4.0,
                "use_infinite": True, "threshold": 7, "temp_dir": ptdir}
        tpb = TwoPhotonTimebinNew(darkmodel, "|0><1|_4", "|1><0|_4",
                                  "|1><3|_4", "|3><1|_4", p1, p2, dt=0.2,
                                  dim=4, tb=tb_len, gaussian_t=10,
                                  options=opts)
        _, _, _, ee, *_ = tpb.rho_ee_ee()
        _, _, _, ll, *_ = tpb.rho_ll_ll()
        assert ee > 0 and ll > 0 and np.isfinite(ee) and np.isfinite(ll)
        assert np.isclose(ee, ll, rtol=0.25)   # symmetric protocol
    check("two-photon timebin with phonons", t_timebin_phonons)

    n_fail = sum(1 for r in RESULTS if r[1] == "FAIL")
    print("\n%d/%d passed" % (len(RESULTS) - n_fail, len(RESULTS)))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
