"""Two-photon time-bin density matrix, v1 semantics (4x4 in {EE, EL, LE, LL}).

Functional parity with /root/reference/pyaceqd/timebin/twophoton.py: diagonal
elements from two-MTO G2 fan-outs, off-diagonals from three-MTO four-time
correlators.  The reference's O(n_t^2) double loops of ACE subprocesses
(twophoton.py:318-541) run here as flat batched lanes over all (t1, t2) pairs.
"""

import re

import numpy as np

from pyaceqd_tpu.engine import branched
from pyaceqd_tpu.timebin.timebin import TimeBin
from pyaceqd_tpu.tools import concurrence, construct_t, simple_t_gaussian


class TwoPhotonTimebin(TimeBin):
    def __init__(self, system, sigma_gx, sigma_xb, *pulses, dt=0.02, tb=800,
                 dt_small=0.1, simple_exp=True, gaussian_t=None, verbose=False,
                 workers=15, options={}):
        super().__init__(system, *pulses, dt=dt, tb=tb, simple_exp=simple_exp,
                         gaussian_t=gaussian_t, verbose=verbose, workers=workers,
                         options=options)
        self.gamma_e = options["gamma_e"]
        self.prepare_operators(sigma_gx=sigma_gx, sigma_xb=sigma_xb, verbose=verbose)
        if self.gaussian_t is not None:
            self.t1 = simple_t_gaussian(0, self.gaussian_t, self.tb, dt_small,
                                        10 * dt_small, *self.pulses, decimals=1)
        else:
            self.t1 = construct_t(0, self.tb, dt_small, 10 * dt_small,
                                  *self.pulses, simple_exp=self.simple_exp)

    def prepare_operators(self, sigma_gx, sigma_xb, verbose=False):
        """Derive all transition operators from the two lowering operators
        (reference twophoton.py:63-94; single-transition strings only)."""
        pattern = r"^\|([0-9]*)><([0-9]*)\|_([1-9][0-9]*)"
        m = re.search(pattern, sigma_gx)
        g, x, dim = m.group(1), m.group(2), m.group(3)
        self.sigma_x = "|{}><{}|_{}".format(g, x, dim)
        self.sigma_xdag = "|{}><{}|_{}".format(x, g, dim)
        self.x_op = "|{}><{}|_{}".format(x, x, dim)
        m = re.search(pattern, sigma_xb)
        x2, b, dim = m.group(1), m.group(2), m.group(3)
        self.sigma_b = "|{}><{}|_{}".format(x2, b, dim)
        self.sigma_bdag = "|{}><{}|_{}".format(b, x2, dim)
        self.b_op = "|{}><{}|_{}".format(b, b, dim)
        self.gb_op = "|{}><{}|_{}".format(g, b, dim)
        self.gbdag_op = "|{}><{}|_{}".format(x, x2, dim)
        if verbose:
            print("sigma_x: {}, sigma_xdag: {}, x_op: {}".format(
                self.sigma_x, self.sigma_xdag, self.x_op))
            print("sigma_b: {}, sigma_bdag: {}, b_op: {}".format(
                self.sigma_b, self.sigma_bdag, self.b_op))
            print("gb: {}, gbdag: {}".format(self.gb_op, self.gbdag_op))

    def calc_densitymatrix(self, save_all=False, filename="densitymatrix_old"):
        """Assemble the 4x4 time-bin two-photon density matrix and its
        concurrence (reference twophoton.py:28-61).  rho_EL,LE and rho_LE,LL
        vanish by photon-number selection rules."""
        density_matrix = np.zeros([4, 4], dtype=complex)
        t, G2_EEEE, density_matrix[0, 0] = self.rho_ee_ee()
        _, G2_ELEL, density_matrix[1, 1] = self.rho_el_el()
        _, G2_LELE, density_matrix[2, 2] = self.rho_le_le()
        _, G2_LLLL, density_matrix[3, 3] = self.rho_ll_ll()
        _, G2_EEEL, density_matrix[0, 1] = self.rho_ee_el()
        density_matrix[1, 0] = np.conj(density_matrix[0, 1])
        density_matrix[0, 2] = 0
        density_matrix[2, 0] = 0
        _, G2_EELL, density_matrix[0, 3] = self.rho_ee_ll()
        density_matrix[3, 0] = np.conj(density_matrix[0, 3])
        density_matrix[1, 2] = 0
        density_matrix[2, 1] = 0
        _, G2_ELLL, density_matrix[1, 3] = self.rho_el_ll()
        density_matrix[3, 1] = np.conj(density_matrix[1, 3])
        density_matrix[2, 3] = 0
        density_matrix[3, 2] = 0
        norm = np.trace(density_matrix)
        if save_all:
            np.save(filename + "_dm.npy", density_matrix)
            np.save(filename + "_t.npy", t)
            components = [G2_EEEE, G2_ELEL, G2_LELE, G2_LLLL, G2_EEEL, G2_EELL, G2_ELLL]
            np.save(filename + "_components.npy", np.stack(components, axis=0))
        return concurrence(density_matrix / norm), density_matrix

    # -- helpers -------------------------------------------------------------

    def _task(self, t_end):
        return self.system(0, t_end, return_task=True, output_ops=[],
                           **self.options)

    def _diag_element(self, t_shift, window_start, tend):
        """Shared structure of the EE/LL/EL diagonals: sandwich sigma_b at
        t1(+shift), read the x population along the window, tau=0 from b_op."""
        t1 = np.asarray(self.t1)
        n_tau = int(self.tb / self.dt)
        t2 = np.linspace(0, self.tb, n_tau + 1)
        task = self._task(tend)
        mtos = [{"operator": self.sigma_b, "applyFrom": "_left", "applyBefore": "false"},
                {"operator": self.sigma_bdag, "applyFrom": "_right", "applyBefore": "false"}]
        times = np.stack([t1 + t_shift, t1 + t_shift], axis=1)
        # gather x along the absolute window and b at the tau=0 point
        win = window_start(t1)[:, None] + t2[None, :]
        outs = branched.batched_mto_runs(task, mtos, times,
                                         np.clip(win, 0, tend),
                                         [self.x_op, self.b_op], mesh=self.mesh)
        return t1, t2, outs

    def rho_ee_ee(self, dt_small=0.1):
        """Both photons early: t1<=t2<=tb (reference twophoton.py:97-151)."""
        t1, t2, outs = self._diag_element(0.0, lambda t: t, self.tb)
        n_tau = int(self.tb / self.dt)
        _G2 = np.zeros(len(t1))
        for i in range(len(t1)):
            n_t2 = n_tau - int(t1[i] / self.dt)
            temp = np.zeros(n_t2 + 1)
            temp[0] = np.abs(outs[i, 0, 1])
            if n_t2 > 0:
                temp[1:] = np.abs(outs[i, 1:n_t2 + 1, 0])
            _G2[i] = np.trapezoid(temp, t2[:len(temp)])
        return t1, _G2, np.trapezoid(_G2, t1) * self.gamma_e**2

    def rho_ll_ll(self, dt_small=0.1):
        """Both photons late: tb<t1<=t2<=2tb (reference twophoton.py:153-205)."""
        t1, t2, outs = self._diag_element(self.tb, lambda t: t + self.tb,
                                          2 * self.tb)
        n_tau = int(self.tb / self.dt)
        _G2 = np.zeros(len(t1))
        for i in range(len(t1)):
            n_t2 = n_tau - int(t1[i] / self.dt)
            temp = np.zeros(n_t2 + 1)
            temp[0] = np.abs(outs[i, 0, 1])
            if n_t2 > 0:
                temp[1:] = np.abs(outs[i, 1:n_t2 + 1, 0])
            _G2[i] = np.trapezoid(temp, t2[:len(temp)])
        return t1, _G2, np.trapezoid(_G2, t1) * self.gamma_e**2

    def rho_el_el(self, dt_small=0.1):
        """XX early, X late: t1<=tb<t2<=2tb (reference twophoton.py:207-258)."""
        t1, t2, outs = self._diag_element(0.0, lambda t: np.full_like(t, self.tb),
                                          2 * self.tb)
        _G2 = np.zeros(len(t1))
        for i in range(len(t1)):
            temp = np.abs(outs[i, :, 0]).copy()
            temp[0] = np.abs(outs[i, 0, 1])
            _G2[i] = np.trapezoid(temp, t2)
        return t1, _G2, np.trapezoid(_G2, t1) * self.gamma_e**2

    def rho_le_le(self, dt_small=0.1):
        """X early, XX late (reference twophoton.py:261-315)."""
        t1 = np.asarray(self.t1)
        n_tau = int(self.tb / self.dt)
        t2 = np.linspace(0, self.tb, n_tau + 1)
        task = self._task(2 * self.tb)
        mtos = [{"operator": self.sigma_xdag, "applyFrom": "_right", "applyBefore": "false"},
                {"operator": self.sigma_x, "applyFrom": "_left", "applyBefore": "false"}]
        times = np.stack([t1, t1], axis=1)
        win = self.tb + t2
        outs = branched.batched_mto_runs(
            task, mtos, times, np.broadcast_to(win, (len(t1), len(win))),
            [self.b_op], mesh=self.mesh)
        _G2 = np.zeros(len(t1))
        for i in range(len(t1)):
            temp = np.abs(outs[i, :, 0]).copy()
            temp[0] = 0.0  # sigma_x sigma_xx... at equal times vanishes
            _G2[i] = np.trapezoid(temp, t2)
        return t1, _G2, np.trapezoid(_G2, t1) * self.gamma_e**2

    def _offdiag_pairs(self):
        """All (i, j>=i) pairs of the t1 grid, flattened."""
        t1 = np.asarray(self.t1)
        ii, jj = np.triu_indices(len(t1))
        return t1, ii, jj

    def rho_ee_ll(self, plot_g2=False):
        """EE-LL coherence: three MTOs (b^dag at t1, x^dag at t2, b at t1+tb),
        final coherence read at t2+tb (reference twophoton.py:318-392)."""
        t1, ii, jj = self._offdiag_pairs()
        task = self._task(2 * self.tb)
        mtos = [{"operator": self.sigma_bdag, "applyFrom": "_right", "applyBefore": "false"},
                {"operator": self.sigma_xdag, "applyFrom": "_right", "applyBefore": "false"},
                {"operator": self.sigma_b, "applyFrom": "_left", "applyBefore": "false"}]
        times = np.stack([t1[ii], t1[jj], t1[ii] + self.tb], axis=1)
        gather = (t1[jj] + self.tb)[:, None]
        outs = branched.batched_mto_runs(task, mtos, times, gather,
                                         [self.sigma_x, self.gb_op], mesh=self.mesh)
        vals = np.where(ii == jj, outs[:, 0, 1], outs[:, 0, 0])
        _G2 = np.zeros(len(t1), dtype=complex)
        g2plot = np.zeros([len(t1), len(t1)], dtype=complex)
        for idx in range(len(ii)):
            g2plot[ii[idx], jj[idx] - ii[idx]] = vals[idx]
        if plot_g2:
            return t1, g2plot
        for i in range(len(t1)):
            row = np.abs(g2plot[i, :len(t1) - i])
            _G2[i] = np.trapezoid(row, t1[i:])
        return t1, _G2, np.abs(np.trapezoid(_G2, t1)) * self.gamma_e**2

    def rho_ee_el(self):
        """EE-EL coherence: b/b^dag sandwich at t1 plus x^dag at t2, coherence
        at t2+tb (reference twophoton.py:439-489)."""
        t1, ii, jj = self._offdiag_pairs()
        task = self._task(2 * self.tb)
        mtos = [{"operator": self.sigma_b, "applyFrom": "_left", "applyBefore": "false"},
                {"operator": self.sigma_bdag, "applyFrom": "_right", "applyBefore": "false"},
                {"operator": self.sigma_xdag, "applyFrom": "_right", "applyBefore": "false"}]
        times = np.stack([t1[ii], t1[ii], t1[jj]], axis=1)
        gather = (t1[jj] + self.tb)[:, None]
        outs = branched.batched_mto_runs(task, mtos, times, gather, [self.sigma_x], mesh=self.mesh)
        vals = np.abs(outs[:, 0, 0])
        _G2 = np.zeros(len(t1), dtype=complex)
        mat = np.zeros([len(t1), len(t1)])
        for idx in range(len(ii)):
            mat[ii[idx], jj[idx] - ii[idx]] = vals[idx]
        for i in range(len(t1)):
            _G2[i] = np.trapezoid(mat[i, :len(t1) - i], t1[i:])
        return t1, _G2, np.trapezoid(np.real(_G2), t1) * self.gamma_e**2

    def rho_ee_le(self):
        """EE-LE coherence (reference twophoton.py:491-541)."""
        t1, ii, jj = self._offdiag_pairs()
        task = self._task(2 * self.tb)
        mtos = [{"operator": self.sigma_x, "applyFrom": "_left", "applyBefore": "false"},
                {"operator": self.sigma_bdag, "applyFrom": "_right", "applyBefore": "false"},
                {"operator": self.sigma_xdag, "applyFrom": "_right", "applyBefore": "false"}]
        times = np.stack([t1[ii], t1[ii], t1[jj]], axis=1)
        gather = (t1[jj] + self.tb)[:, None]
        outs = branched.batched_mto_runs(task, mtos, times, gather, [self.sigma_b], mesh=self.mesh)
        vals = np.abs(outs[:, 0, 0])
        _G2 = np.zeros(len(t1), dtype=complex)
        mat = np.zeros([len(t1), len(t1)])
        for idx in range(len(ii)):
            mat[ii[idx], jj[idx] - ii[idx]] = vals[idx]
        for i in range(len(t1)):
            _G2[i] = np.trapezoid(mat[i, :len(t1) - i], t1[i:])
        return t1, _G2, np.trapezoid(np.real(_G2), t1) * self.gamma_e**2

    def rho_el_le(self):
        """Zero by selection rules (reference twophoton.py:544-546)."""
        return 0, 0, 0

    def rho_el_ll(self):
        """EL-LL coherence: b^dag at t1, b at t1+tb, x at t2+tb
        (reference twophoton.py:548-592)."""
        t1, ii, jj = self._offdiag_pairs()
        task = self._task(2 * self.tb)
        mtos = [{"operator": self.sigma_bdag, "applyFrom": "_right", "applyBefore": "false"},
                {"operator": self.sigma_b, "applyFrom": "_left", "applyBefore": "false"}]
        times = np.stack([t1[ii], t1[ii] + self.tb], axis=1)
        gather = (t1[jj] + self.tb)[:, None]
        outs = branched.batched_mto_runs(task, mtos, times, gather,
                                         [self.x_op, self.sigma_b], mesh=self.mesh)
        vals = np.where(ii == jj, np.abs(outs[:, 0, 1]), np.abs(outs[:, 0, 0]))
        _G2 = np.zeros(len(t1), dtype=complex)
        mat = np.zeros([len(t1), len(t1)])
        for idx in range(len(ii)):
            mat[ii[idx], jj[idx] - ii[idx]] = vals[idx]
        for i in range(len(t1)):
            _G2[i] = np.trapezoid(mat[i, :len(t1) - i], t1[i:])
        return t1, _G2, np.trapezoid(np.real(_G2), t1) * self.gamma_e**2

    def rho_le_ll(self):
        """Zero by selection rules (reference twophoton.py:636-638)."""
        return 0, 0, 0
