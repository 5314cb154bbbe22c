"""Two-photon time-bin density matrix, v2: generalized operators with BOTH
time orderings per matrix element, plus the time-local dynamical-map fast
path.

Functional parity with /root/reference/pyaceqd/timebin/twophoton_new.py:

- direct path: every matrix element is a sum over the t1<=t2 and t2<=t1
  operator orderings (twophoton_new.py:201-557, 1015-1148), evaluated here as
  flat batched lanes over all (t1, t2) pairs instead of nested ThreadPool
  loops of ACE subprocesses;
- time-local fast path: per-bin dynamical maps + stationary-map padding feed
  an 8-operator four-time kernel (the batched twin of
  timebin_tl.f90::four_time_8op), giving the full 4x4 density matrix from 10
  (or 4, ``reduced``) batched map fan-outs (twophoton_new.py:100-181).
"""

import numpy as np

from pyaceqd_tpu.engine import branched, dynmap
from pyaceqd_tpu.ops import superop
from pyaceqd_tpu.ops.dsl import parse_operator
from pyaceqd_tpu.timebin.timebin import TimeBin
from pyaceqd_tpu.tools import concurrence, construct_t, simple_t_gaussian


class TwoPhotonTimebinNew(TimeBin):
    def __init__(self, system, sigma_x, sigma_xdag, sigma_b, sigma_bdag, *pulses,
                 dt=0.02, dim=5, tb=800, dt_small=0.1, n_tbig=10, dt_exp=None,
                 simple_exp=True, gaussian_t=None, verbose=False, workers=15,
                 simple_t=False, options={}):
        super().__init__(system, *pulses, dt=dt, tb=tb, simple_exp=simple_exp,
                         gaussian_t=gaussian_t, verbose=verbose, workers=workers,
                         options=options)
        self.gamma_e = options["gamma_e"]
        self.dim = dim
        self.prepare_operators(sigma_x=sigma_x, sigma_xdag=sigma_xdag,
                               sigma_b=sigma_b, sigma_bdag=sigma_bdag,
                               verbose=verbose)
        if self.gaussian_t is not None:
            self.t1 = simple_t_gaussian(0, self.gaussian_t, self.tb, dt_small,
                                        n_tbig * dt_small, *self.pulses,
                                        decimals=1, exp_part=self.simple_exp)
        if self.gaussian_t is None or simple_t:
            self.t1 = construct_t(0, self.tb, dt_small, n_tbig * dt_small,
                                  dt_exp, *self.pulses, simple_exp=self.simple_exp)

    def prepare_operators(self, sigma_x, sigma_xdag, sigma_b, sigma_bdag,
                          verbose=False):
        """All operators may be arbitrary expressions, incl. multi-transition
        sums (reference twophoton_new.py:184-198)."""
        self.sigma_x = sigma_x
        self.sigma_xdag = sigma_xdag
        self.x_op = "(" + sigma_xdag + " * " + sigma_x + ")"
        self.sigma_b = sigma_b
        self.sigma_bdag = sigma_bdag
        self.b_op = "(" + sigma_bdag + " * " + sigma_b + ")"
        if verbose:
            print("sigma_x: {}, sigma_xdag: {}, x_op: {}".format(
                self.sigma_x, self.sigma_xdag, self.x_op))
            print("sigma_b: {}, sigma_bdag: {}, b_op: {}".format(
                self.sigma_b, self.sigma_bdag, self.b_op))

    def get_initial_state(self):
        init_rho = self.options.get("initial", "|0><0|_{}".format(self.dim))
        return parse_operator(init_rho)

    def calc_timedynamics(self, output_ops=None):
        opts_new = self.options.copy()
        if output_ops is not None:
            opts_new["output_ops"] = output_ops
        return self.system(0, 2 * self.tb, *self.pulses, **opts_new)

    def _task(self, t_end=None):
        return self.system(0, t_end if t_end is not None else 2 * self.tb,
                           return_task=True, output_ops=[], **self.options)

    # ------------------------------------------------------------------
    # direct (non-time-local) matrix elements
    # ------------------------------------------------------------------

    def rho_ee_ee(self, add_time=0, use_second_zero=False):
        """Diagonal EE element with both orderings: XX then X (t1<=t2) and —
        via re-excitation — X then XX (t2<=t1) (reference twophoton_new.py:201-278)."""
        t1 = np.asarray(self.t1)
        n_tau = int(self.tb / self.dt)
        t2 = np.linspace(0, self.tb, n_tau + 1)
        tend = self.tb + add_time
        task = self._task(tend)

        def _one_ordering(out_op1, out_op_tau0, op_left, op_right):
            mtos = [{"operator": op_left, "applyFrom": "_left", "applyBefore": "false"},
                    {"operator": op_right, "applyFrom": "_right", "applyBefore": "false"}]
            times = np.stack([t1 + add_time, t1 + add_time], axis=1)
            win = (t1 + add_time)[:, None] + t2[None, :]
            outs = branched.batched_mto_runs(task, mtos, times,
                                             np.clip(win, 0, tend),
                                             [out_op1, out_op_tau0], mesh=self.mesh)
            _G2 = np.zeros(len(t1))
            _G2_t1t2 = np.zeros([len(t1), len(t2)])
            for i in range(len(t1)):
                n_t2 = n_tau - int(np.round(t1[i] / self.dt))
                temp = np.zeros(n_t2 + 1)
                temp[0] = np.abs(outs[i, 0, 1])
                if n_t2 > 0:
                    temp[1:] = np.abs(outs[i, 1:n_t2 + 1, 0])
                _G2[i] = np.trapezoid(temp, t2[:len(temp)])
                _G2_t1t2[i, -len(temp):] = temp
            return _G2, _G2_t1t2

        out1 = self.sigma_xdag + "*" + self.sigma_x
        tau0 = self.sigma_bdag + "*" + self.sigma_xdag + "*" + self.sigma_x + "*" + self.sigma_b
        _G2_1, _G21_t = _one_ordering(out1, tau0, self.sigma_b, self.sigma_bdag)
        if use_second_zero:
            return (t1, t2, _G2_1, np.trapezoid(_G2_1, t1) * self.gamma_e**2,
                    _G2_1, _G2_1 * 0, _G21_t)
        out1 = self.sigma_bdag + "*" + self.sigma_b
        tau0 = "0*" + self.sigma_xdag  # vanishes for a diamond system
        _G2_2, _G22_t = _one_ordering(out1, tau0, self.sigma_x, self.sigma_xdag)
        _G2 = _G2_1 + _G2_2
        return (t1, t2, _G2, np.trapezoid(_G2, t1) * self.gamma_e**2, _G2_1,
                _G2_2, _G21_t + _G22_t)

    def rho_ll_ll(self, use_second_zero=False):
        """Same as EE,EE in the late bin (reference twophoton_new.py:280-284)."""
        return self.rho_ee_ee(add_time=self.tb, use_second_zero=use_second_zero)

    def rho_el_el(self, output_ops=None, sigma_X=None, sigma_Xdag=None):
        """XX early, X late (reference twophoton_new.py:286-347)."""
        out_op1 = self.sigma_xdag + "*" + self.sigma_x
        out_op_tau0 = (self.sigma_bdag + "*" + self.sigma_xdag + "*"
                       + self.sigma_x + "*" + self.sigma_b)
        if output_ops is None:
            output_ops = [out_op1, out_op_tau0]
        if sigma_X is None:
            sigma_X = {"operator": self.sigma_b, "applyFrom": "_left", "applyBefore": "false"}
        if sigma_Xdag is None:
            sigma_Xdag = {"operator": self.sigma_bdag, "applyFrom": "_right", "applyBefore": "false"}
        t1 = np.asarray(self.t1)
        n_tau = int(self.tb / self.dt)
        t2 = np.linspace(0, self.tb, n_tau + 1)
        task = self._task(2 * self.tb)
        times = np.stack([t1, t1], axis=1)
        win = self.tb + t2
        outs = branched.batched_mto_runs(
            task, [sigma_X, sigma_Xdag], times,
            np.broadcast_to(win, (len(t1), len(win))), output_ops, mesh=self.mesh)
        _G2 = np.zeros(len(t1))
        for i in range(len(t1)):
            temp = np.abs(outs[i, :, 0]).copy()
            if i == len(t1) - 1:
                # bins only overlap at t1=tb, t2=0 (reference :339-343)
                temp[0] = np.abs(outs[i, 0, 1])
            _G2[i] = np.trapezoid(temp, t2)
        return t1, _G2, np.trapezoid(_G2, t1) * self.gamma_e**2

    def rho_le_le(self):
        """X early, XX late: EL,EL with x<->b exchanged (reference :350-365)."""
        out_op1 = self.sigma_bdag + "*" + self.sigma_b
        out_op_tau0 = (self.sigma_xdag + "*" + self.sigma_bdag + "*"
                       + self.sigma_b + "*" + self.sigma_x)
        sigma_X = {"operator": self.sigma_x, "applyFrom": "_left", "applyBefore": "false"}
        sigma_Xdag = {"operator": self.sigma_xdag, "applyFrom": "_right", "applyBefore": "false"}
        return self.rho_el_el(output_ops=[out_op1, out_op_tau0], sigma_X=sigma_X,
                              sigma_Xdag=sigma_Xdag)

    def four_time(self, output_ops, sigma_1, sigma_2, sigma_3):
        """Generic three-insertion four-time correlator over all (t1, t2)
        pairs with insertions at t1, t2 and t1+tb, read at t2+tb
        (reference twophoton_new.py:515-557)."""
        t1 = np.asarray(self.t1)
        ii, jj = np.triu_indices(len(t1))
        task = self._task(2 * self.tb)
        mtos = [dict(sigma_1), dict(sigma_2), dict(sigma_3)]
        times = np.stack([t1[ii], t1[jj], t1[ii] + self.tb], axis=1)
        gather = (t1[jj] + self.tb)[:, None]
        outs = branched.batched_mto_runs(task, mtos, times, gather, output_ops, mesh=self.mesh)
        vals = np.where(ii == jj, outs[:, 0, 1], outs[:, 0, 0])
        _G2 = np.zeros(len(t1), dtype=complex)
        _G2_t1t2 = np.zeros([len(t1), len(t1)], dtype=complex)
        mat = np.zeros([len(t1), len(t1)], dtype=complex)
        mat[ii, jj] = vals
        for i in range(len(t1)):
            _G2[i] = np.trapezoid(mat[i, i:], t1[i:])
            _G2_t1t2[i, -len(t1[i:]):] = mat[i, i:]
        return t1, _G2, np.trapezoid(_G2, t1) * self.gamma_e**2, _G2_t1t2

    def rho_ee_ll(self, use_second_zero=False):
        """EE-LL coherence, both orderings (reference twophoton_new.py:368-393)."""
        output_ops = [self.sigma_x, self.sigma_x + "*" + self.sigma_b]
        s1 = {"operator": self.sigma_bdag, "applyFrom": "_right", "applyBefore": "false"}
        s2 = {"operator": self.sigma_xdag, "applyFrom": "_right", "applyBefore": "false"}
        s3 = {"operator": self.sigma_b, "applyFrom": "_left", "applyBefore": "false"}
        t1, _G2_1, eell_1, G21_t = self.four_time(output_ops, s1, s2, s3)
        if use_second_zero:
            return t1, _G2_1, eell_1, _G2_1, _G2_1 * 0, G21_t
        output_ops = [self.sigma_bdag, self.sigma_b + "*" + self.sigma_x]
        s1 = {"operator": self.sigma_xdag, "applyFrom": "_right", "applyBefore": "false"}
        s2 = {"operator": self.sigma_bdag, "applyFrom": "_right", "applyBefore": "false"}
        s3 = {"operator": self.sigma_x, "applyFrom": "_left", "applyBefore": "false"}
        t1, _G2_2, eell_2, G22_t = self.four_time(output_ops, s1, s2, s3)
        return t1, _G2_1 + _G2_2, eell_1 + eell_2, _G2_1, _G2_2, G21_t + G22_t

    def rho_ee_el(self, operators=None):
        """EE-EL coherence, both orderings (reference twophoton_new.py:395-505)."""
        output_op = self.sigma_x
        op_b, op_bdag, op_xdag = self.sigma_b, self.sigma_bdag, self.sigma_xdag
        if operators is not None:
            if len(operators) != 4:
                raise ValueError("operators must be a list of length 4")
            output_op, op_b, op_bdag, op_xdag = operators
        t1 = np.asarray(self.t1)
        ii, jj = np.triu_indices(len(t1))
        task = self._task(2 * self.tb)

        # part 1: t1 <= t2; read at t2 + tb
        mtos = [{"operator": op_b, "applyFrom": "_left", "applyBefore": "false"},
                {"operator": op_bdag, "applyFrom": "_right", "applyBefore": "false"},
                {"operator": op_xdag, "applyFrom": "_right", "applyBefore": "false"}]
        times = np.stack([t1[ii], t1[ii], t1[jj]], axis=1)
        gather = (t1[jj] + self.tb)[:, None]
        outs = branched.batched_mto_runs(task, mtos, times, gather, [output_op], mesh=self.mesh)
        mat = np.zeros([len(t1), len(t1)], dtype=complex)
        mat[ii, jj] = outs[:, 0, 0]
        _G21 = np.array([np.trapezoid(mat[i, i:], t1[i:]) for i in range(len(t1))])
        eeel_1 = np.trapezoid(_G21, t1) * self.gamma_e**2

        # part 2: t2 <= t1; ops at t2 (b sandwich) and t1 (xdag), read at t1+tb
        mtos = [{"operator": op_xdag, "applyFrom": "_right", "applyBefore": "false"},
                {"operator": op_b, "applyFrom": "_left", "applyBefore": "false"},
                {"operator": op_bdag, "applyFrom": "_right", "applyBefore": "false"}]
        times = np.stack([t1[ii], t1[jj], t1[jj]], axis=1)
        gather = (t1[ii] + self.tb)[:, None]
        outs = branched.batched_mto_runs(task, mtos, times, gather, [output_op], mesh=self.mesh)
        mat = np.zeros([len(t1), len(t1)], dtype=complex)
        mat[ii, jj] = outs[:, 0, 0]
        _G22 = np.array([np.trapezoid(mat[i, i:], t1[i:]) for i in range(len(t1))])
        eeel_2 = np.trapezoid(_G22, t1) * self.gamma_e**2
        return t1, _G21 + _G22, eeel_1 + eeel_2, _G21, _G22

    def rho_ee_le(self):
        """EE-LE: like EE-EL with X<->B exchanged (reference :508-512)."""
        operators = [self.sigma_b, self.sigma_x, self.sigma_xdag, self.sigma_bdag]
        return self.rho_ee_el(operators=operators)

    def rho_el_le(self):
        """EL-LE coherence, both orderings (reference twophoton_new.py:1015-1029)."""
        output_ops = [self.sigma_xdag, self.sigma_xdag + "*" + self.sigma_b]
        s1 = {"operator": self.sigma_bdag, "applyFrom": "_right", "applyBefore": "false"}
        s2 = {"operator": self.sigma_x, "applyFrom": "_left", "applyBefore": "false"}
        s3 = {"operator": self.sigma_b, "applyFrom": "_left", "applyBefore": "false"}
        t1, _G21, elle_1, _ = self.four_time(output_ops, s1, s2, s3)
        output_ops = [self.sigma_b, self.sigma_xdag + "*" + self.sigma_b]
        s1 = {"operator": self.sigma_x, "applyFrom": "_left", "applyBefore": "false"}
        s2 = {"operator": self.sigma_bdag, "applyFrom": "_right", "applyBefore": "false"}
        s3 = {"operator": self.sigma_xdag, "applyFrom": "_right", "applyBefore": "false"}
        t1, _G22, elle_2, _ = self.four_time(output_ops, s1, s2, s3)
        return t1, _G21 + _G22, elle_1 + elle_2, _G21, _G22

    def rho_el_ll(self, calc_lell=False):
        """EL-LL coherence, both orderings (reference twophoton_new.py:1031-1143)."""
        t1 = np.asarray(self.t1)
        n_tau = int(self.tb / self.dt)
        t2 = np.linspace(0, self.tb, n_tau + 1)
        task = self._task(2 * self.tb)

        # part 1: t1<=t2: bdag at t1, b at t1+tb, x-population read along t2+tb
        output_ops = [self.sigma_xdag + "*" + self.sigma_x,
                      self.sigma_xdag + "*" + self.sigma_x + "*" + self.sigma_b]
        op_r, op_l = self.sigma_bdag, self.sigma_b
        if calc_lell:
            output_ops = [self.sigma_bdag + "*" + self.sigma_b,
                          self.sigma_bdag + "*" + self.sigma_b + "*" + self.sigma_x]
            op_r, op_l = self.sigma_xdag, self.sigma_x
        mtos = [{"operator": op_r, "applyFrom": "_right", "applyBefore": "false"},
                {"operator": op_l, "applyFrom": "_left", "applyBefore": "false"}]
        times = np.stack([t1, t1 + self.tb], axis=1)
        win = self.tb + t2
        outs = branched.batched_mto_runs(
            task, mtos, times, np.broadcast_to(win, (len(t1), len(win))),
            output_ops, mesh=self.mesh)
        _G21 = np.zeros(len(t1), dtype=complex)
        for i in range(len(t1)):
            # round before int: the gather columns index absolute (tb + t2)
            # grid points while the MTO fires at round((t1+tb)/dt), so float
            # truncation (e.g. 4.3/0.1 -> 42) would shift the tau axis
            k0 = int(np.round(t1[i] / self.dt))
            n_t2 = n_tau - k0
            temp = np.zeros(n_t2 + 1, dtype=complex)
            temp[0] = outs[i, k0, 1]
            if n_t2 > 0:
                temp[1:] = outs[i, k0 + 1:, 0]
            _G21[i] = np.trapezoid(temp, t2[:len(temp)])
        elll_1 = np.trapezoid(_G21, t1) * self.gamma_e**2

        # part 2: t2<=t1: bdag at t2, x sandwich at t1+tb, read at t2+tb
        output_ops2 = [self.sigma_b,
                       self.sigma_xdag + "*" + self.sigma_b + "*" + self.sigma_x]
        op_r2, op_l2, op_r3 = self.sigma_bdag, self.sigma_x, self.sigma_xdag
        if calc_lell:
            output_ops2 = [self.sigma_x,
                           self.sigma_bdag + "*" + self.sigma_x + "*" + self.sigma_b]
            op_r2, op_l2, op_r3 = self.sigma_xdag, self.sigma_b, self.sigma_bdag
        ii, jj = np.triu_indices(len(t1))
        mtos = [{"operator": op_r2, "applyFrom": "_right", "applyBefore": "false"},
                {"operator": op_l2, "applyFrom": "_left", "applyBefore": "false"},
                {"operator": op_r3, "applyFrom": "_right", "applyBefore": "false"}]
        times = np.stack([t1[jj], t1[ii] + self.tb, t1[ii] + self.tb], axis=1)
        gather = (t1[jj] + self.tb)[:, None]
        outs = branched.batched_mto_runs(task, mtos, times, gather,
                                         output_ops2, mesh=self.mesh)
        vals = np.where(ii == jj, outs[:, 0, 1], outs[:, 0, 0])
        mat = np.zeros([len(t1), len(t1)], dtype=complex)
        mat[ii, jj] = vals
        _G22 = np.array([np.trapezoid(mat[i, i:], t1[i:]) for i in range(len(t1))])
        elll_2 = np.trapezoid(_G22, t1) * self.gamma_e**2
        return t1, _G21 + _G22, elll_1 + elll_2, _G21, _G22

    def rho_le_ll(self):
        """LE-LL: EL-LL with operators exchanged (reference :1146-1148)."""
        return self.rho_el_ll(calc_lell=True)

    def calc_densitymatrix(self, save_dm=False, save_all=False,
                           filename="densitymatrix", verbose=False,
                           reduced=False, use_second_zero=False):
        """Full 4x4 dm via the direct correlators (reference twophoton_new.py:38-98)."""
        density_matrix = np.zeros([4, 4], dtype=complex)
        t, _, G2_EEEE, density_matrix[0, 0], G2_EEEE_1, G2_EEEE_2, _ = \
            self.rho_ee_ee(use_second_zero=use_second_zero)
        _, G2_ELEL, density_matrix[1, 1] = self.rho_el_el()
        _, G2_LELE, density_matrix[2, 2] = self.rho_le_le()
        _, _, G2_LLLL, density_matrix[3, 3], G2_LLLL_1, G2_LLLL_2, _ = \
            self.rho_ll_ll(use_second_zero=use_second_zero)
        _, G2_EELL, density_matrix[0, 3], G2_EELL_1, G2_EELL_2, _ = \
            self.rho_ee_ll(use_second_zero=use_second_zero)
        density_matrix[3, 0] = np.conj(density_matrix[0, 3])
        if reduced:
            zeros = 0 * G2_EEEE
            G2_EEEL = G2_EELE = G2_ELLE = G2_ELLL = G2_LELL = zeros
        else:
            _, G2_EEEL, density_matrix[0, 1], *_ = self.rho_ee_el()
            density_matrix[1, 0] = np.conj(density_matrix[0, 1])
            _, G2_EELE, density_matrix[0, 2], *_ = self.rho_ee_le()
            density_matrix[2, 0] = np.conj(density_matrix[0, 2])
            _, G2_ELLE, density_matrix[1, 2], *_ = self.rho_el_le()
            density_matrix[2, 1] = np.conj(density_matrix[1, 2])
            _, G2_ELLL, density_matrix[1, 3], *_ = self.rho_el_ll()
            density_matrix[3, 1] = np.conj(density_matrix[1, 3])
            _, G2_LELL, density_matrix[2, 3], *_ = self.rho_le_ll()
            density_matrix[3, 2] = np.conj(density_matrix[2, 3])
        norm = np.trace(density_matrix)
        if save_dm or save_all:
            np.save(filename + "_dm.npy", density_matrix)
        if save_all:
            np.save(filename + "_t.npy", t)
        if verbose:
            print("density matrix:")
            print(np.array2string(density_matrix))
        return concurrence(density_matrix / norm), density_matrix

    # ------------------------------------------------------------------
    # time-local (dynamical-map) fast path
    # ------------------------------------------------------------------

    def _calc_dynmaps(self):
        """Per-bin time-local maps: one calc_dynmap run per bin over the pulse
        region, stationary map beyond (reference twophoton_new.py:559-597).
        The phonon-correct hybrid path does NOT use these: it extracts exact
        per-step maps over the whole two-bin background instead
        (_tlph_prepare docstring)."""
        options_new = self.options.copy()
        self.prepare_puslefile_tls()
        options_new["pulse_file_x"] = self.pulse_file_x1
        options_new["pulse_file_y"] = self.pulse_file_y1
        t_dm = (self.gaussian_t if self.gaussian_t is not None else self.tb / 4) + 10
        if self.options.get("phonons"):
            # The reference extracts the stationary map at gaussian_t+10 and
            # warns "Phonons are enabled ... will give wrong results"
            # (reference twophoton_new.py:568-577): at that horizon the bath
            # transient may not have decayed (t_mem ~ 20 ps), so the
            # extracted stationary map would carry a residual-rate error
            # compounding over the ~tb/dt map applications.  Extend the
            # horizon past the bath settling time, like the purity tl path
            # (purity.py:221).  MEASURED at the tb=800 darkmodel flagship
            # (thr 1e-9 stationary PT): tl concurrence 0.5458 vs 0.5893
            # direct-PT, with or without the extension — there the default
            # horizon already sits past settling, and the remaining 4.4e-2
            # is the tl method's intrinsic insertion-time approximation
            # (operator insertions on time-local maps ignore bath
            # correlations within t_mem of each insertion; exactly the
            # reference's warning).  The extension guards configs whose
            # pulse window ends closer to the gaussian_t+10 horizon.
            t_mem = float(self.options.get("t_mem", 20.48))
            # cap the extension at tb, but never BELOW the non-phonon
            # baseline t_dm: when tb < gaussian_t + 10 (pulse window
            # comparable to the bin — a degenerate time-bin protocol) the
            # cap must not truncate the maps inside the pulse region
            # (ADVICE r3)
            t_dm_ext = min(2.1 * ((self.gaussian_t or 0.0) + t_mem),
                           float(self.tb))
            if t_dm > float(self.tb):
                import warnings
                warnings.warn(
                    "time-bin tl path: pulse window gaussian_t+10 = "
                    f"{t_dm:.1f} exceeds the bin length tb = {self.tb:.1f}; "
                    "this configuration is likely invalid for the time-bin "
                    "protocol (pulses overlap the bin boundary)")
            t_dm = max(t_dm, t_dm_ext)
        result1, dm1 = self.system(0, t_dm, calc_dynmap=True, **options_new)
        options_new["pulse_file_x"] = self.pulse_file_x2
        options_new["pulse_file_y"] = self.pulse_file_y2
        result2, dm2 = self.system(0, t_dm, calc_dynmap=True, **options_new)
        dm_tl1 = np.asarray(dynmap.calc_tl_dynmap(np.asarray(dm1)))
        dm_tl2 = np.asarray(dynmap.calc_tl_dynmap(np.asarray(dm2)))
        tl_map = dm_tl1[-1]
        self.precalc_tls = self._calc_binary_steps(tl_map)
        self.dm_tl1 = dm_tl1
        self.dm_tl2 = dm_tl2
        return tl_map, dm_tl1, dm_tl2

    def _calc_binary_steps(self, tl_map):
        """log2(n_tb) squared powers of the stationary map for skip-ahead
        (reference twophoton_new.py:599-613)."""
        n_tb = int(self.tb / self.dt)
        n_bin = int(np.log2(n_tb)) + 1
        precalc_tls = np.zeros([n_bin, tl_map.shape[0], tl_map.shape[1]],
                               dtype=complex)
        precalc_tls[0] = tl_map
        for i in range(1, n_bin):
            precalc_tls[i] = precalc_tls[i - 1] @ precalc_tls[i - 1]
        return precalc_tls

    def fast_propagate(self, rho, n):
        """Apply tl_map^n via the binary powers (reference :730-735)."""
        for i, bit in enumerate(reversed(np.binary_repr(int(n)))):
            if bit == '1':
                rho = self.precalc_tls[i] @ rho
        return rho

    def _full_window_maps(self, tl_map, dm_tl1, dm_tl2):
        """Per-step maps covering both bins: computed maps where pulses act,
        stationary map elsewhere."""
        n_tb = int(round(self.tb / self.dt))
        d2 = tl_map.shape[0]

        def fill(dm_tl):
            maps = np.empty((n_tb, d2, d2), dtype=complex)
            m = min(len(dm_tl), n_tb)
            maps[:m] = dm_tl[:m]
            maps[m:] = tl_map
            return maps

        return np.concatenate([fill(dm_tl1), fill(dm_tl2)], axis=0)

    def eightops(self, rho0, operators, maps, early_only=False,
                 late_t1_only=False):
        """Batched 8-operator four-time kernel: for every pair t1<=t2 apply
        (L, R) operator pairs at the early t1, early t2, late t1, late t2 grid
        points of the two-bin map chain and read the trace.

        The batched twin of timebin_tl.f90::four_time_8op via
        eightops_fortran (reference twophoton_new.py:706-717)."""
        dim = rho0.shape[0]
        t1 = np.round(np.asarray(self.t1), 6)
        n_tb = int(round(self.tb / self.dt))
        (op_et1l, op_et1r, op_et2l, op_et2r,
         op_lt1l, op_lt1r, op_lt2l, op_lt2r) = [
            np.asarray(o, dtype=complex) for o in operators]
        sops = np.stack([
            superop.left_mult(op_et1l) @ superop.right_mult(op_et1r),
            superop.left_mult(op_et2l) @ superop.right_mult(op_et2r),
            superop.left_mult(op_lt1l) @ superop.right_mult(op_lt1r),
            superop.left_mult(op_lt2l) @ superop.right_mult(op_lt2r)])
        before = (False, False, False, False)
        ii, jj = np.triu_indices(len(t1))
        k1 = np.round(t1[ii] / self.dt).astype(np.int32)
        k2 = np.round(t1[jj] / self.dt).astype(np.int32)
        ks = np.stack([k1, k2, k1 + n_tb, k2 + n_tb], axis=1)
        if early_only:
            read = k2 + 1
        elif late_t1_only:
            read = k1 + n_tb + 1
        else:
            read = k2 + n_tb + 1
        # reading the trace one step later equals reading it right after the
        # final operator pair: the maps are trace preserving; at the boundary
        # k = n the kernel's extra slot n+1 carries the post-event state
        read = np.minimum(read, maps.shape[0] + 1)
        W = superop.trace_vector(np.eye(dim))[None]
        outs = dynmap.batched_mto_map_runs(maps, rho0.reshape(-1), sops, before,
                                           ks, read[:, None], W)
        G12 = np.zeros([len(t1), len(t1)], dtype=complex)
        G12[ii, jj] = outs[:, 0, 0]
        _G2 = np.array([np.trapezoid(G12[i, i:], t1[i:]) for i in range(len(t1))])
        element = np.trapezoid(_G2, t1) * self.gamma_e**2
        return t1, _G2, element, G12

    def eightops_fortran(self, rho0, operators, precalc_tls=None, dm_1=None,
                         dm_2=None, early_only=False, late_t1_only=False):
        """Signature-compatible wrapper (the reference passes transposed
        Fortran-layout maps; here the stored per-bin maps are used directly)."""
        maps = self._window_maps
        return self.eightops(rho0, operators, maps, early_only=early_only,
                             late_t1_only=late_t1_only)

    def calc_densitymatrix_tl(self, save_dm=False, filename="densitymatrix_tl",
                              verbose=False, reduced=True):
        """Fast 4x4 dm via the time-local map kernel; omits the (usually
        negligible) second time-ordering terms (reference twophoton_new.py:100-181)."""
        density_matrix = np.zeros([4, 4], dtype=complex)
        tl_map, dm_1, dm_2 = self._calc_dynmaps()
        self._window_maps = self._full_window_maps(tl_map, dm_1, dm_2)
        rho0 = self.get_initial_state()
        dim = rho0.shape[0]
        sigma_x = parse_operator(self.sigma_x)
        sigma_xdag = parse_operator(self.sigma_xdag)
        sigma_b = parse_operator(self.sigma_b)
        sigma_bdag = parse_operator(self.sigma_bdag)
        Id = np.eye(dim)

        # op_et1l, op_et1r, op_et2l, op_et2r, op_lt1l, op_lt1r, op_lt2l, op_lt2r
        ops_eeee = [sigma_b, sigma_bdag, sigma_x, sigma_xdag, Id, Id, Id, Id]
        ops_elel = [sigma_b, sigma_bdag, Id, Id, Id, Id, sigma_x, sigma_xdag]
        ops_lele = [sigma_x, sigma_xdag, Id, Id, Id, Id, sigma_b, sigma_bdag]
        ops_llll = [Id, Id, Id, Id, sigma_b, sigma_bdag, sigma_x, sigma_xdag]
        ops_eeel = [sigma_b, sigma_bdag, Id, sigma_xdag, Id, Id, Id, sigma_x]
        ops_eele = [Id, sigma_bdag, sigma_x, sigma_xdag, Id, sigma_b, Id, Id]
        ops_elle = [Id, sigma_bdag, sigma_x, Id, sigma_xdag, Id, Id, sigma_b]
        ops_elll = [Id, sigma_bdag, Id, Id, sigma_b, Id, sigma_x, sigma_xdag]
        ops_lell = [Id, Id, Id, sigma_xdag, sigma_b, sigma_bdag, Id, sigma_x]
        ops_eell = [Id, sigma_bdag, Id, sigma_xdag, sigma_b, Id, sigma_x, Id]

        t1, G2_EEEE, density_matrix[0, 0], _ = self.eightops_fortran(
            rho0, ops_eeee, early_only=True)
        density_matrix[0, 0] = density_matrix[0, 0].real
        t1, G2_ELEL, density_matrix[1, 1], _ = self.eightops_fortran(rho0, ops_elel)
        density_matrix[1, 1] = density_matrix[1, 1].real
        t1, G2_LELE, density_matrix[2, 2], _ = self.eightops_fortran(rho0, ops_lele)
        density_matrix[2, 2] = density_matrix[2, 2].real
        t1, G2_LLLL, density_matrix[3, 3], _ = self.eightops_fortran(rho0, ops_llll)
        density_matrix[3, 3] = density_matrix[3, 3].real
        t1, G2_EELL, density_matrix[0, 3], _ = self.eightops_fortran(rho0, ops_eell)
        density_matrix[3, 0] = density_matrix[0, 3].conjugate()
        if not reduced:
            t1, _, density_matrix[0, 1], _ = self.eightops_fortran(rho0, ops_eeel)
            density_matrix[1, 0] = density_matrix[0, 1].conjugate()
            t1, _, density_matrix[0, 2], _ = self.eightops_fortran(
                rho0, ops_eele, late_t1_only=True)
            density_matrix[2, 0] = density_matrix[0, 2].conjugate()
            t1, _, density_matrix[1, 2], _ = self.eightops_fortran(rho0, ops_elle)
            density_matrix[2, 1] = density_matrix[1, 2].conjugate()
            t1, _, density_matrix[1, 3], _ = self.eightops_fortran(rho0, ops_elll)
            density_matrix[3, 1] = density_matrix[1, 3].conjugate()
            t1, _, density_matrix[2, 3], _ = self.eightops_fortran(rho0, ops_lell)
            density_matrix[3, 2] = density_matrix[2, 3].conjugate()
        norm = np.trace(density_matrix)
        if save_dm:
            np.save(filename + "_dm.npy", density_matrix)
        if verbose:
            print(np.array2string(density_matrix))
        return concurrence(density_matrix / norm), density_matrix, density_matrix / norm

    # ------------------------------------------------------------------
    # phonon-correct hybrid fast path: exact PT windows + tl transport
    # ------------------------------------------------------------------

    def eightops_phonon(self, rho0, operators, task, maps, early_only=False,
                        late_t1_only=False, pad_factor=1.0, bucket=256,
                        hot_zones=None, slip_events=4):
        """Phonon-correct 8-operator four-time kernel: exact windowed-PT
        segments around every operator insertion, time-local map transport
        across the (memoryless) gaps.

        The plain tl kernel (``eightops``) inserts operators on time-local
        maps, discarding system-bath correlations within t_mem of each
        insertion — the approximation the reference warns "will give wrong
        results" with phonons (/root/reference/pyaceqd/timebin/
        twophoton_new.py:568-577), measured 4.4e-2 at the tb=800 flagship.
        Here each lane instead runs the EXACT process tensor inside windows
        that cover every insertion with at least one memory time of padding
        on both sides (branched.windowed_pt_runs): the factorized-bath
        restart dresses within the leading pad, the insertion then acts on
        the fully correlated state, and the bath is closed (caps) only once
        its memory of the insertion has decayed.  Between windows — and only
        there, where the dynamics is memoryless — the state rides the cheap
        per-step tl map chain (dynmap.masked_segment_runs).

        The factorized restart leaves a per-window "slip": the marginal
        propagated from a product state deviates from the true (dressed-bath)
        marginal while the bath re-dresses, and that deviation does NOT heal
        with longer padding — it is an accrued state offset, only damped by
        the system's own relaxation (measured: 8.4e-2 peak G12 error at the
        reduced-tb referee, pad-independent).  The kernel therefore uses the
        window PT only for the EVENT-INDUCED DEVIATION and keeps the
        baseline transport exact:

            rho_out = TL(rho_in) + PT_events(rho_in) - PT_no_events(rho_in)

        The slip is common to both PT runs and cancels identically; the tl
        maps are extracted from the exact no-insertion dynamics, so TL is the
        exact marginal for the baseline part.  What remains is second order:
        the reference's tl approximation applied only to the (small)
        insertion-induced deviation, and slip x deviation cross terms.
        MEASURED at the reduced-tb referee (tb=20, dt=0.4, 4 K): peak G12
        error vs the quadrature-matched direct anchor 2.7e-1 (plain tl) ->
        8.4e-2 (naive restart) -> see tests for the corrected number; the
        all-merged limit (huge pad_factor) is exact to 2.4e-6.

        Host-side, each lane's (t1, t2, t1+tb, t2+tb) events are greedily
        clustered: events closer than n_pad+n_post share one window (the
        degenerate limit — all four merged — reproduces the direct path).
        Window lengths are bucketed to multiples of ``bucket`` steps so the
        device kernel compiles at a handful of static shapes.

        ``task`` must extend past 2*tb by at least bucket+n_post steps (see
        calc_densitymatrix_tl_phonon) so no window clips the horizon.
        Cost: ~4 windows of O(t_mem/dt) steps per lane instead of the direct
        path's full 2*tb/dt-step propagation per lane."""
        t1 = np.round(np.asarray(self.t1), 6)
        n_tb = int(round(self.tb / self.dt))
        dim = rho0.shape[0]
        (op_et1l, op_et1r, op_et2l, op_et2r,
         op_lt1l, op_lt1r, op_lt2l, op_lt2r) = [
            np.asarray(o, dtype=complex) for o in operators]
        sops = np.stack([
            superop.left_mult(op_et1l) @ superop.right_mult(op_et1r),
            superop.left_mult(op_et2l) @ superop.right_mult(op_et2r),
            superop.left_mult(op_lt1l) @ superop.right_mult(op_lt1r),
            superop.left_mult(op_lt2l) @ superop.right_mult(op_lt2r)])
        ii, jj = np.triu_indices(len(t1))
        # index through task.k_of, NOT round(t/dt): grid points sitting on a
        # half-step boundary (e.g. t1=9.4 at dt=0.4) must round exactly like
        # the direct engine's lanes or whole lanes shift by one step
        # (measured: 18/529 pairs off by O(0.2) against the four_time anchor
        # before this, bit-exact after)
        k1 = task.k_of(t1[ii])
        k2 = task.k_of(t1[jj])
        k1l = task.k_of(t1[ii] + self.tb)
        k2l = task.k_of(t1[jj] + self.tb)
        ks_all = np.stack([k1, k2, k1l, k2l], axis=1)  # sorted
        if early_only:
            read = k2 + 1
        elif late_t1_only:
            read = k1l + 1
        else:
            read = k2l + 1
        B = len(k1)

        maps = np.asarray(maps)
        n_over = int(read.max()) - maps.shape[0]
        if n_over > 0:
            # lanes with t2 = tb read one step past the two-bin chain; beyond
            # the computed region the chain is the stationary fill map
            maps = np.concatenate(
                [maps, np.broadcast_to(maps[-1], (n_over,) + maps.shape[1:])])

        t_mem = float(self.options.get("t_mem", 20.48))
        n_mem = int(np.ceil(t_mem / self.dt))
        n_pad = n_post = int(np.ceil(pad_factor * n_mem)) + 2

        # hot zones: step ranges where a factorized-bath restart is forbidden
        # because the system is driven (pulse support) or still re-dressing
        # after it.  A window START inside a zone would generate its slip
        # while the state changes fast — and the insertion then reads a
        # first-order-wrong state the difference method cannot cancel
        # (measured at the tb=20 referee: pad-independent 8.3e-2 G12 error
        # from mid-pulse restarts).  Starts snap BACK to n_pad before the
        # zone (so the bath is fully re-dressed when the pulse rises), or to
        # 0 — where the true state IS factorized and the restart is exact.
        if hot_zones is None:
            pulse_end = (self.gaussian_t if self.gaussian_t is not None
                         else self.tb / 4 + 10)
            hot_zones = [
                (0, int(task.k_of(np.asarray([pulse_end]))[0]) + n_mem),
                (n_tb, int(task.k_of(np.asarray([self.tb + pulse_end]))[0])
                 + n_mem)]

        def snap(cand):
            cand = np.asarray(cand)
            for a, b in sorted(hot_zones, key=lambda z: -z[0]):
                hit = (cand > a - n_pad) & (cand < b)
                cand = np.where(hit, max(a - n_pad, 0), cand)
            return np.maximum(cand, 0)

        # greedy clustering on snapped window-start candidates: slot j starts
        # a new window only when its (snapped) start clears the previous
        # window's close last+n_post (ks_all rows are sorted)
        used = ks_all < read[:, None]
        S = snap(ks_all - n_pad)
        newc = np.concatenate(
            [np.ones((B, 1), dtype=bool),
             S[:, 1:] >= ks_all[:, :-1] + n_post], axis=1) & used
        cid = np.where(used, np.cumsum(newc, axis=1) - 1, -1)
        ncl = cid.max(axis=1) + 1  # >= 1: slot 0 (t1 early) is always used

        rho0_vec = np.asarray(rho0, dtype=complex).reshape(-1)
        states = np.broadcast_to(rho0_vec, (B, dim * dim)).copy()
        pos = np.zeros(B, dtype=np.int32)
        pt_lane_steps = 0
        BIG = np.int32(1 << 30)
        for p in range(int(ncl.max())):
            has = ncl > p
            sel = cid == p
            first = np.where(sel, ks_all, BIG).min(axis=1)
            last = np.where(sel, ks_all, -1).max(axis=1)
            # the cluster's start is the snapped candidate of its FIRST slot
            s0 = np.where(sel & newc, S, BIG).min(axis=1).astype(np.int32)
            s0 = np.where(has, s0, 0).astype(np.int32)
            final = ncl == p + 1
            L = np.where(final, read - s0, last + n_post - s0)
            stop = np.where(has, (s0 + L).astype(np.int32), 0)
            # tl transport up to each lane's window start (no-op lanes frozen)
            states = np.array(dynmap.masked_segment_runs(
                maps, states, np.where(has, pos, 0), np.where(has, s0, 0)))
            states_pre = states.copy()   # state at s0: TL baselines below
            # exact-marginal baseline across the window span
            base = dynmap.masked_segment_runs(
                maps, states, np.where(has, s0, 0), stop)
            mks = np.where(sel, ks_all - s0[:, None], -1).astype(np.int32)
            n_slot = ks_all.shape[1]
            pt_marg = np.zeros((n_slot,) + states.shape, dtype=states.dtype)
            Lb = np.ceil(L / bucket).astype(int) * bucket
            for Lval in np.unique(Lb[has]):
                m = has & (Lb == Lval)
                # one stacked call: [with events | without events]; the
                # difference is the insertion-induced deviation, with the
                # factorized-restart slip cancelled (docstring).  The
                # no-event lanes also gather the marginal at EVERY event
                # slot for the per-event slip correction below.
                n_m = int(m.sum())
                g_ev = np.broadcast_to(L[m][:, None], (n_m, n_slot + 1))
                g_noev = np.concatenate(
                    [np.where(mks[m] >= 0, mks[m], 0), L[m][:, None]], axis=1)
                out = branched.windowed_pt_runs(
                    task, sops, (False,) * 4,
                    np.concatenate([states[m], states[m]]),
                    np.concatenate([s0[m], s0[m]]),
                    np.concatenate([mks[m], np.full_like(mks[m], -1)]),
                    np.concatenate([g_ev, g_noev], axis=0).astype(np.int32),
                    int(Lval))
                states[m] = (base[m] + out[:n_m, n_slot, :]
                             - out[n_m:, n_slot, :])
                for j in range(n_slot):
                    pt_marg[j][m] = out[n_m:, j, :]
                pt_lane_steps += 2 * n_m * int(Lval)
            # Per-event slip correction: the factorized restart's dressing
            # slip s(k) = PT_noev(k) - TL(k) enters every event; the leading
            # term of D_ev - D_noev the pairwise difference cannot cancel is
            # sum_j [T_ev(k_j -> stop) - T_plain(k_j -> stop)] Delta_j with
            # Delta_1 = s(k_1) (the full slip at the cluster's first event)
            # and Delta_j = s(k_j) - T_plain(s(k_{j-1}), k_{j-1} -> k_j) for
            # later events in the SAME cluster (the slip REGENERATED between
            # consecutive events, which transporting only s(k_1) — the r4
            # first-order correction, slip_events=1 — misses).  Every s(k_j)
            # is measured exactly from the no-event window marginal; the tl
            # maps approximate only the event-difference transport, which is
            # second order.  Measured at the tb=20 EELL anchor: plain tl
            # 2.7e-1, difference form 3.4e-2, slip_events=1 4.8e-3,
            # slip_events=4 -> see tests/test_timebin.py.
            ks_ev = np.where(sel, ks_all, -(1 << 20)).astype(np.int32)
            zeros32 = np.zeros_like(pos)
            prev_sig = None
            prev_k = None
            corr = np.zeros_like(states)
            for j in range(min(slip_events, n_slot)):
                used_j = sel[:, j] & has
                if not np.any(used_j):
                    continue
                k_j = np.where(used_j, ks_all[:, j], 0).astype(np.int32)
                tl_j = dynmap.masked_segment_runs(
                    maps, states_pre, np.where(used_j, s0, zeros32),
                    np.where(used_j, k_j, zeros32))
                sig_j = np.where(used_j[:, None], pt_marg[j] - tl_j, 0.0)
                if prev_sig is None:
                    delta = sig_j
                else:
                    # same-cluster continuation: subtract the plainly
                    # transported previous slip; cluster-first slots (newc)
                    # keep the full slip
                    carried = dynmap.masked_segment_runs(
                        maps, prev_sig, np.where(used_j, prev_k, zeros32),
                        np.where(used_j, k_j, zeros32))
                    delta = np.where((used_j & ~newc[:, j])[:, None],
                                     sig_j - carried, sig_j)
                corr_j = (dynmap.masked_segment_runs(
                              maps, delta, np.where(used_j, k_j, zeros32),
                              np.where(used_j, stop, zeros32),
                              sops=sops, mto_ks=ks_ev)
                          - dynmap.masked_segment_runs(
                              maps, delta, np.where(used_j, k_j, zeros32),
                              np.where(used_j, stop, zeros32)))
                corr = corr + np.where(used_j[:, None], corr_j, 0.0)
                prev_sig = np.where(used_j[:, None], sig_j,
                                    prev_sig if prev_sig is not None else 0.0)
                prev_k = (k_j if prev_k is None
                          else np.where(used_j, k_j, prev_k))
            states = states - np.where(has[:, None], corr, 0.0)
            pos = np.where(has, (s0 + L).astype(np.int32), pos)

        # diagnostics: window-split statistics (tests assert the non-
        # degenerate regime actually splits; flagship logs them)
        self._tlph_stats = {"n_windows_max": int(ncl.max()),
                            "n_windows_mean": float(ncl.mean()),
                            "pt_lane_steps": pt_lane_steps,
                            "direct_lane_steps": int(read.sum())}
        # every lane's LAST window extends to its read index and returns the
        # caps-closed (exact-marginal) state there; the element is its trace
        W_tr = superop.trace_vector(np.eye(dim))
        vals = states @ W_tr
        G12 = np.zeros([len(t1), len(t1)], dtype=complex)
        G12[ii, jj] = vals
        _G2 = np.array([np.trapezoid(G12[i, i:], t1[i:]) for i in range(len(t1))])
        element = np.trapezoid(_G2, t1) * self.gamma_e**2
        return t1, _G2, element, G12

    def _tlph_prepare(self, pad_factor=1.0, bucket=256):
        """Shared setup for the phonon-correct hybrid: exact per-step maps
        over the full two-bin chain and a system task whose horizon leaves
        room for the last window's bucket padding.

        Unlike the plain tl path (_calc_dynmaps: one extraction run PER BIN
        with the bin's pulse shifted to 0, stationary fill beyond the pulse
        region), the maps here come from ONE calc_dynmap run over the whole
        two-bin background.  The per-bin extraction restarts bin 2 from a
        factorized bath, so its first ~t_mem of per-step maps carry a
        re-dressing transient the true two-bin evolution does not have
        (measured: 2.1e-3 G12 floor at the tb=20 referee, gone with the
        single-run maps); the single run also makes every step's map the
        exact marginal transport, including the post-pulse relaxation the
        stationary fill truncates.  Cost: one d^2-lane PT run over 2*tb,
        amortized across all (t1, t2) lanes."""
        t_mem = float(self.options.get("t_mem", 20.48))
        n_post = int(np.ceil(pad_factor * t_mem / self.dt)) + 2
        t_end = 2 * self.tb + (bucket + n_post + 2) * self.dt
        _, dm_full = self.system(0, 2 * self.tb + 2 * self.dt,
                                 calc_dynmap=True, **self.options)
        maps = np.asarray(dynmap.calc_tl_dynmap(np.asarray(dm_full)))
        self._window_maps = maps
        task = self._task(t_end)
        if task.pt is None:
            raise ValueError("the system task carries no process tensor")
        return task, maps

    def calc_densitymatrix_tl_phonon(self, save_dm=False,
                                     filename="densitymatrix_tlph",
                                     verbose=False, reduced=True,
                                     pad_factor=1.0, bucket=256):
        """Fast 4x4 dm with phonons: the tl kernel's map transport plus exact
        windowed-PT segments around every insertion (eightops_phonon).  Same
        element structure as calc_densitymatrix_tl; requires phonons on.

        This capability has no reference counterpart: the reference's tl fast
        path carries an uncontrolled phonon error (its own warning at
        twophoton_new.py:568-577) and its only phonon-correct route is the
        full direct path."""
        if not self.options.get("phonons"):
            raise ValueError("calc_densitymatrix_tl_phonon requires phonons; "
                             "use calc_densitymatrix_tl")
        density_matrix = np.zeros([4, 4], dtype=complex)
        task, maps = self._tlph_prepare(pad_factor, bucket)
        rho0 = self.get_initial_state()
        dim = rho0.shape[0]
        sigma_x = parse_operator(self.sigma_x)
        sigma_xdag = parse_operator(self.sigma_xdag)
        sigma_b = parse_operator(self.sigma_b)
        sigma_bdag = parse_operator(self.sigma_bdag)
        Id = np.eye(dim)

        ops_eeee = [sigma_b, sigma_bdag, sigma_x, sigma_xdag, Id, Id, Id, Id]
        ops_elel = [sigma_b, sigma_bdag, Id, Id, Id, Id, sigma_x, sigma_xdag]
        ops_lele = [sigma_x, sigma_xdag, Id, Id, Id, Id, sigma_b, sigma_bdag]
        ops_llll = [Id, Id, Id, Id, sigma_b, sigma_bdag, sigma_x, sigma_xdag]
        ops_eeel = [sigma_b, sigma_bdag, Id, sigma_xdag, Id, Id, Id, sigma_x]
        ops_eele = [Id, sigma_bdag, sigma_x, sigma_xdag, Id, sigma_b, Id, Id]
        ops_elle = [Id, sigma_bdag, sigma_x, Id, sigma_xdag, Id, Id, sigma_b]
        ops_elll = [Id, sigma_bdag, Id, Id, sigma_b, Id, sigma_x, sigma_xdag]
        ops_lell = [Id, Id, Id, sigma_xdag, sigma_b, sigma_bdag, Id, sigma_x]
        ops_eell = [Id, sigma_bdag, Id, sigma_xdag, sigma_b, Id, sigma_x, Id]

        def elem(ops, **kw):
            return self.eightops_phonon(rho0, ops, task, maps,
                                        pad_factor=pad_factor, bucket=bucket,
                                        **kw)[2]

        density_matrix[0, 0] = elem(ops_eeee, early_only=True).real
        density_matrix[1, 1] = elem(ops_elel).real
        density_matrix[2, 2] = elem(ops_lele).real
        density_matrix[3, 3] = elem(ops_llll).real
        density_matrix[0, 3] = elem(ops_eell)
        density_matrix[3, 0] = density_matrix[0, 3].conjugate()
        if not reduced:
            density_matrix[0, 1] = elem(ops_eeel)
            density_matrix[1, 0] = density_matrix[0, 1].conjugate()
            density_matrix[0, 2] = elem(ops_eele, late_t1_only=True)
            density_matrix[2, 0] = density_matrix[0, 2].conjugate()
            density_matrix[1, 2] = elem(ops_elle)
            density_matrix[2, 1] = density_matrix[1, 2].conjugate()
            density_matrix[1, 3] = elem(ops_elll)
            density_matrix[3, 1] = density_matrix[1, 3].conjugate()
            density_matrix[2, 3] = elem(ops_lell)
            density_matrix[3, 2] = density_matrix[2, 3].conjugate()
        norm = np.trace(density_matrix)
        if save_dm:
            np.save(filename + "_dm.npy", density_matrix)
        if verbose:
            print(np.array2string(density_matrix))
        return (concurrence(density_matrix / norm), density_matrix,
                density_matrix / norm)

    # ------------------------------------------------------------------
    # pure-python reference + debug dynamics (cross-method validation)
    # ------------------------------------------------------------------

    def propagate_tb_new(self, t_start, t_stop, rho, dm_tl, verbose=False):
        """Host map-chain propagation with binary skip-ahead
        (reference twophoton_new.py:737-759)."""
        n_start = int(np.round(np.round(t_start, 6) / self.dt))
        n_stop = int(np.round(np.round(t_stop, 6) / self.dt))
        n_steps = n_stop - n_start
        steps_dm = max(0, min(len(dm_tl) - n_start, n_steps))
        while steps_dm > 0:
            rho = dm_tl[n_start] @ rho
            steps_dm -= 1
            n_start += 1
            n_steps -= 1
        return self.fast_propagate(rho, int(np.round(n_steps)))

    def four_time_tl(self, op1, op2, op3, op4, supply_mats=False):
        """Pure-python (host) reference of the four-time tl kernel for
        cross-validation (reference twophoton_new.py:925-1013): ops at t1, t2
        (right), t1+tb, t2+tb (left); trace read after the last op."""
        tl_map, dm_tl1, dm_tl2 = self._calc_dynmaps()
        rho0 = self.get_initial_state()
        dim = rho0.shape[0]
        if not supply_mats:
            op1, op2, op3, op4 = [parse_operator(o) if isinstance(o, str) else o
                                  for o in (op1, op2, op3, op4)]
        t1 = np.round(np.asarray(self.t1), 6)
        G12 = np.zeros([len(t1), len(t1)], dtype=complex)
        for i in range(len(t1)):
            rho_t1 = rho0.reshape(dim, dim)
            rho_t1 = self.propagate_tb_new(0, t1[i], rho_t1.reshape(-1), dm_tl1).reshape(dim, dim)
            rho_t1 = rho_t1 @ op1
            for j in range(i, len(t1)):
                rho_t2 = self.propagate_tb_new(t1[i], t1[j], rho_t1.reshape(-1), dm_tl1).reshape(dim, dim)
                rho_t2 = rho_t2 @ op2
                rho_t2 = self.propagate_tb_new(t1[j], self.tb, rho_t2.reshape(-1), dm_tl1)
                rho_t2 = self.propagate_tb_new(0, t1[i], rho_t2, dm_tl2).reshape(dim, dim)
                rho_t2 = op3 @ rho_t2
                rho_t2 = self.propagate_tb_new(t1[i], t1[j], rho_t2.reshape(-1), dm_tl2).reshape(dim, dim)
                rho_t2 = op4 @ rho_t2
                G12[i, j] = np.trace(rho_t2)
        _G2 = np.array([np.trapezoid(G12[i, i:], t1[i:]) for i in range(len(t1))])
        eell = np.trapezoid(_G2, t1) * self.gamma_e**2
        return t1, _G2, eell, G12

    def eell_tl(self):
        """EE-LL coherence via the pure-python tl path (reference :615-627)."""
        t1, _G2_1, eell_1, G21 = self.four_time_tl(
            self.sigma_bdag, self.sigma_xdag, self.sigma_b, self.sigma_x)
        return t1, _G2_1, eell_1, _G2_1, _G2_1 * 0, G21

    def eell_tl_f(self):
        """EE-LL coherence via the batched map kernel (reference :629-670)."""
        tl_map, dm_1, dm_2 = self._calc_dynmaps()
        self._window_maps = self._full_window_maps(tl_map, dm_1, dm_2)
        rho0 = self.get_initial_state()
        dim = rho0.shape[0]
        Id = np.eye(dim)
        ops = [Id, parse_operator(self.sigma_bdag), Id, parse_operator(self.sigma_xdag),
               parse_operator(self.sigma_b), Id, parse_operator(self.sigma_x), Id]
        t1, _G2, eell, G12 = self.eightops(rho0, ops, self._window_maps)
        return t1, _G2, eell, G12

    def dynamics_tl(self):
        """rho(t) over both bins from the per-bin maps, for cross-checking
        against the direct propagation (reference twophoton_new.py:761-789)."""
        tl_map, dm_tl1, dm_tl2 = self._calc_dynmaps()
        rho0 = self.get_initial_state()
        dim = rho0.shape[0]
        t = np.arange(0, 2 * self.tb, self.dt)
        rho_t = np.zeros([len(t), dim, dim], dtype=complex)
        rho_t[0] = rho0
        n_tb = int(self.tb / self.dt)
        for i in range(n_tb):
            rho_t[i + 1] = self.propagate_tb_new(
                i * self.dt, (i + 1) * self.dt, rho_t[i].reshape(-1), dm_tl1).reshape(dim, dim)
        for i in range(n_tb, len(t) - 1):
            rho_t[i + 1] = self.propagate_tb_new(
                (i - n_tb) * self.dt, (i - n_tb + 1) * self.dt,
                rho_t[i].reshape(-1), dm_tl2).reshape(dim, dim)
        return t, rho_t
