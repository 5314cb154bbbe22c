"""One-photon time-bin density matrix (2x2 in the {E, L} basis).

Functional parity with /root/reference/pyaceqd/timebin/onephoton.py; the
per-t1 MTO fan-outs run as batched branch scans.
"""

import re

import numpy as np

from pyaceqd_tpu.engine import branched
from pyaceqd_tpu.timebin.timebin import TimeBin
from pyaceqd_tpu.tools import construct_t, simple_t_gaussian


class OnePhotonTimebin(TimeBin):
    """rho_EE / rho_LL from integrated populations, rho_EL from a G1 fan-out
    (reference onephoton.py:12-106)."""

    def __init__(self, system, sigma_x, *pulses, dt=0.02, tb=800, simple_exp=True,
                 gaussian_t=None, verbose=False, workers=15, options={}):
        super().__init__(system, *pulses, dt=dt, tb=tb, simple_exp=simple_exp,
                         gaussian_t=gaussian_t, verbose=verbose, workers=workers,
                         options=options)
        self.prepare_operators(sigma_x=sigma_x, verbose=verbose)
        if "gamma_e" not in self.options:
            raise ValueError("gamma_e not supplied in options.")
        self.gamma_e = self.options["gamma_e"]

    def prepare_operators(self, sigma_x, verbose=False):
        m = re.search(r"^\|([0-9]*)><([0-9]*)\|_([1-9][0-9]*)", sigma_x)
        lower, upper, dim = m.group(1), m.group(2), m.group(3)
        self.sigma_x = "|{}><{}|_{}".format(lower, upper, dim)
        self.sigma_xdag = "|{}><{}|_{}".format(upper, lower, dim)
        self.x_op = "|{}><{}|_{}".format(upper, upper, dim)
        if verbose:
            print("sigma_x: {}, sigma_xdag: {}, x_op: {}".format(
                self.sigma_x, self.sigma_xdag, self.x_op))

    def calc_densitymatrix(self, first_abs=False, verbose=False):
        """2x2 time-bin dm weighted by gamma_e (reference onephoton.py:23-41).

        first_abs=True integrates |G1| instead, killing phase effects."""
        rho_ee = self.rho_ee() * self.gamma_e
        rho_ll = self.rho_ll() * self.gamma_e
        norm = rho_ee + rho_ll
        t1, rho_el_g1 = self.rho_el()
        rho_el = np.abs(np.trapezoid(rho_el_g1, t1))
        if first_abs:
            rho_el = np.trapezoid(np.abs(rho_el_g1), t1)
        rho_el = rho_el * self.gamma_e
        if verbose:
            print("not normalized:")
            print("EE:{}, LL:{}, EL:{}".format(rho_ee, rho_ll, rho_el))
            print("normalized:")
            print("EE:{}, LL:{}, EL:{}".format(rho_ee / norm, rho_ll / norm, rho_el / norm))
        return rho_ee, rho_ll, rho_el, norm

    def rho_ee(self):
        res = self.system(0, self.tb, output_ops=[self.x_op], suffix="ee",
                          **self.options)
        t, x = np.real(res[0]), np.real(res[1])
        return np.trapezoid(x, t)

    def rho_ll(self):
        res = self.system(0, 2 * self.tb, output_ops=[self.x_op], suffix="ll",
                          **self.options)
        t, x = np.real(res[0]), np.real(res[1])
        n_t = int(self.tb / self.dt)
        return np.trapezoid(x[-n_t:], t[-n_t:])

    def rho_el(self, dt_small=0.1):
        """G1(t1) = <sigma^dag(t1) sigma(t1+tb)>: sigma^dag applied from the
        right at t1, sigma read at t1+tb (reference onephoton.py:77-106)."""
        if self.gaussian_t is not None:
            t1 = simple_t_gaussian(0, self.gaussian_t, self.tb, dt_small,
                                   10 * dt_small, *self.pulses)
        else:
            t1 = construct_t(0, self.tb, dt_small, 10 * dt_small, *self.pulses,
                             simple_exp=self.simple_exp)
        task = self.system(0, float(np.max(t1)) + self.tb, return_task=True,
                           output_ops=[], **self.options)
        mto = {"operator": self.sigma_xdag, "applyFrom": "_right",
               "applyBefore": "false"}
        times = np.asarray(t1)[:, None]
        gather = times + self.tb
        outs = branched.batched_mto_runs(task, [mto], times, gather,
                                         [self.sigma_x], mesh=self.mesh)
        return np.asarray(t1), outs[:, 0, 0]


class OnePhotonCavity(TimeBin):
    """Cavity-photon G1 maps with diagonal-slicing readout
    (reference onephoton.py:108-266): system is a 3-level dot ⊗ cavity."""

    def __init__(self, system, *pulses, dt=0.1, tb=20, simple_exp=True,
                 gaussian_t=None, verbose=False, workers=2, t_simul=150,
                 options={}):
        super().__init__(system, *pulses, dt=dt, tb=tb, simple_exp=simple_exp,
                         gaussian_t=gaussian_t, verbose=verbose, workers=workers,
                         t_simul=t_simul, options=options)
        self.sigma_x = "|0><0|_3 otimes |0><1|_3"
        self.sigma_xdag = "|0><0|_3 otimes |1><0|_3"

    def _task(self, t_end):
        return self.system(0, t_end, return_task=True, output_ops=[],
                           **self.options)

    def g1_t1t2(self, t0=30, tend=130, T_sep=0):
        """Symmetrized tau-integrated G1 per t1 (reference onephoton.py:115-150)."""
        n_t1 = int((tend - t0) / self.dt)
        t1 = np.linspace(t0, tend, n_t1 + 1)
        n_tau = int(self.tb / self.dt)
        t2 = np.linspace(-self.tb, self.tb, 2 * n_tau + 1)
        task = self._task(float(t1[-1]) - T_sep + self.tb)
        mto = {"operator": self.sigma_xdag, "applyFrom": "_right",
               "applyBefore": "false"}
        times = (np.asarray(t1) - T_sep)[:, None]
        # gather occupation at t1' (tau=0) and coherence along t1'+dt..t1'+tb
        gather = times + np.linspace(0, self.tb, n_tau + 1)[None, :]
        outs = branched.batched_mto_runs(
            task, [mto], times, gather,
            ["|0><0|_3 otimes |1><1|_3", self.sigma_x], mesh=self.mesh)
        _G1 = np.zeros(len(t1), dtype=complex)
        for i in range(len(t1)):
            g1_temp = np.zeros(2 * n_tau + 1, dtype=complex)
            g1_temp[:n_tau] = np.conjugate(np.flip(outs[i, 1:, 1]))
            g1_temp[n_tau] = outs[i, 0, 0]
            g1_temp[-n_tau:] = outs[i, 1:, 1]
            _G1[i] = np.trapezoid(g1_temp, t2)
        return t1, _G1

    def g1_t1t(self, t0=30, tend=130, T_sep=70):
        """tau-integrated G1 with the MTO a fixed separation before the
        readout window (reference onephoton.py:152-186)."""
        n_t1 = int((tend - t0) / self.dt)
        t1 = np.linspace(t0, tend, n_t1 + 1)
        n_tau = int(self.tb / self.dt)
        t2 = np.linspace(-self.tb, self.tb, 2 * n_tau + 1)
        task = self._task(float(t1[-1]) + self.tb)
        mto = {"operator": self.sigma_xdag, "applyFrom": "_right",
               "applyBefore": "false"}
        times = (np.asarray(t1) - T_sep)[:, None]
        gather = np.asarray(t1)[:, None] - self.tb + np.linspace(
            0, 2 * self.tb, 2 * n_tau + 1)[None, :]
        outs = branched.batched_mto_runs(
            task, [mto], times, np.clip(gather, 0, float(t1[-1]) + self.tb),
            ["|0><0|_3 otimes |1><1|_3", self.sigma_x], mesh=self.mesh)
        _G1 = np.trapezoid(outs[:, :, 1], t2, axis=1)
        return t1, _G1

    def g1_t1(self, t0=30, tend=130, T_sep=70):
        """Full G1(t1, t2) map via sigma applied from the left at
        t1+t2-T_sep, sigma^dag read at t1; tau-integrated
        (reference onephoton.py:188-266, where it is computed by diagonal
        slicing to reuse ACE runs — here every (t1,t2) pair is one lane)."""
        n_t1 = int((tend - t0) / self.dt)
        t1 = np.linspace(t0, tend, n_t1 + 1)
        n_tau = int(self.tb / self.dt)
        t2 = np.linspace(-self.tb, self.tb, 2 * n_tau + 1)
        task = self._task(float(t1[-1]))
        mto = {"operator": self.sigma_x, "applyFrom": "_left",
               "applyBefore": "false"}
        T1, T2 = np.meshgrid(t1, t2, indexing="ij")
        apply_t = np.round(T1 + T2 - T_sep, 3).reshape(-1, 1)
        gather = T1.reshape(-1, 1)
        outs = branched.batched_mto_runs(
            task, [mto], apply_t, gather,
            ["|0><0|_3 otimes |1><1|_3", self.sigma_xdag], mesh=self.mesh)
        _G1 = outs[:, 0, 1].reshape(len(t1), len(t2))
        _G1 = np.trapezoid(_G1, t2, axis=1)
        return t1, _G1
