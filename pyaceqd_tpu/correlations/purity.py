"""Single-photon purity and indistinguishability of a pulse-train-driven
emitter.

Functional parity with /root/reference/pyaceqd/two_time/purity.py: the system
is driven by a 5-pulse train with bin width tb; purity compares the tau=0 and
tau=tb G2 peaks, indistinguishability combines G0/G1/G2 time-bin integrals.
The MTO fan-outs run as batched branch scans; the time-local map paths
(direct, and the phonon per-t1-block variant that replaces
propagate_tau.f90::calc_twotime_phonon_block) run as the map kernels in
engine.dynmap.
"""

import numpy as np

from pyaceqd_tpu.engine import branched, dynmap
from pyaceqd_tpu.ops import superop
from pyaceqd_tpu.ops.dsl import parse_operator
from pyaceqd_tpu.pulses import PulseTrain
from pyaceqd_tpu.timebin.timebin import TimeBin
from pyaceqd_tpu.tools import (calc_tl_dynmap_pseudo, construct_t, extract_dms,
                               simple_t_gaussian)


class Purity(TimeBin):
    """Single-photon purity from the pulse-train G2 (reference purity.py:26-198)."""

    def __init__(self, system, sigma_x, sigma_xdag, *pulses, dt=0.1, tb=800,
                 dt_small=0.1, simple_exp=True, gaussian_t=None, verbose=False,
                 workers=15, t_simul=None, options={}, factor_t=1, factor_tau=2,
                 dt_big=None, add_tend=True):
        pulse = PulseTrain(tb, 5, *pulses)
        self.factor_t = factor_t
        self.factor_tau = factor_tau
        super().__init__(system, pulse, dt=dt, tb=tb, simple_exp=simple_exp,
                         gaussian_t=gaussian_t, verbose=verbose, workers=workers,
                         t_simul=t_simul, options=options)
        self.sigma_x = "(" + sigma_x + ")"
        self.sigma_xdag = "(" + sigma_xdag + ")"
        if "gamma_e" not in self.options:
            print("gamma_e not included in options, setting to 100")
            self.options["gamma_e"] = 100
        self.gamma_e = self.options["gamma_e"]
        if dt_big is None:
            dt_big = 10 * dt_small
        if self.gaussian_t is not None:
            self.t1 = simple_t_gaussian(0, self.gaussian_t, self.tb, dt_small,
                                        dt_big, *pulses, decimals=1,
                                        exp_part=self.simple_exp, add_tend=add_tend)
        else:
            self.t1 = construct_t(0, self.tb, dt_small, dt_big, *pulses,
                                  simple_exp=self.simple_exp, add_tend=add_tend)
        t_axis_complete = np.array([])
        for i in range(factor_t):
            t_axis_complete = np.concatenate((t_axis_complete, self.t1 + i * self.tb))
        self.t_axis_complete = t_axis_complete
        self.options["pulse_file_x"] = self.pulse_file_x
        self.options["pulse_file_y"] = self.pulse_file_y

    def prepare_pulsefile(self, verbose=False, t_simul=None, plot=False):
        """Sample the 5-pulse train over (factor_t+factor_tau+1) bins
        (reference purity.py:69-91)."""
        t_end = (self.factor_t + self.factor_tau + 1) * self.tb
        if t_simul is not None:
            t_end = t_simul
        _n_t = int(t_end / self.dt) + 1
        _t_pulse = np.linspace(0, t_end, _n_t)
        pulse_x, pulse_y = self.pulses[0].get_total_xy(_t_pulse)
        self.pulse_file_x = (_t_pulse, pulse_x)
        self.pulse_file_y = (_t_pulse, pulse_y)

    def calc_timedynamics(self, output_ops=None, t_end=None):
        new_options = dict(self.options)
        if output_ops is not None:
            new_options["output_ops"] = output_ops
        if t_end is None:
            t_end = (self.factor_t + self.factor_tau + 1) * self.tb
        return self.system(0, t_end, *self.pulses, **new_options)

    def _g2_fanout(self, out_op1, return_whole, tqdm_options=None):
        out_op_tau0 = self.sigma_xdag + "*" + out_op1 + "*" + self.sigma_x
        t1 = np.asarray(self.t1)
        factor_t = self.factor_t
        factor_tau = self.factor_tau
        n_tau = factor_tau * int(self.tb / self.dt)
        t2 = np.linspace(0, factor_tau * self.tb, n_tau + 1)
        tend = (factor_t - 1) * self.tb + float(t1[-1]) + factor_tau * self.tb
        task = self.system(0, tend, return_task=True, output_ops=[], **self.options)
        mtos = [{"operator": self.sigma_x, "applyFrom": "_left", "applyBefore": "false"},
                {"operator": self.sigma_xdag, "applyFrom": "_right", "applyBefore": "false"}]
        _G2 = np.zeros([factor_t * len(t1), len(t2)])
        for i in range(factor_t):
            t_apply = t1 + i * self.tb
            times = np.stack([t_apply, t_apply], axis=1)
            gather = t_apply[:, None] + t2[None, :]
            outs = branched.batched_mto_runs(task, mtos, times,
                                             np.clip(gather, 0, tend),
                                             [out_op1, out_op_tau0],
                                             mesh=self.mesh)
            _G2[i * len(t1):(i + 1) * len(t1), 1:] = np.abs(outs[:, 1:, 0])
            _G2[i * len(t1):(i + 1) * len(t1), 0] = np.abs(outs[:, 0, 1])
        if return_whole:
            return t1, t2, _G2
        G2 = np.trapezoid(_G2, self.t_axis_complete, axis=0)
        return t2, G2

    def G2(self, return_whole=False, tqdm_options={}):
        """G2(tau) integrated over t: sigma sandwich at each t1 of each bin,
        x-population read along tau (reference purity.py:101-140)."""
        return self._g2_fanout(self.sigma_xdag + "*" + self.sigma_x, return_whole)

    def G2_modified(self, out_op1, return_whole=False, tqdm_options={}):
        """G2 with a custom central operator B in <A(t) B(t+tau) C(t)>
        (reference purity.py:142-189)."""
        return self._g2_fanout(out_op1, return_whole)

    def calc_purity(self):
        """purity = 1 - 2*int_0^{tb/2} g2 / int_{tb/2}^{3tb/2} g2
        (reference purity.py:191-198)."""
        t, g2 = self.G2()
        n_1 = int(0.5 * self.tb / self.dt)
        G21 = 2 * np.trapezoid(g2[:n_1], t[:n_1])
        G22 = np.trapezoid(g2[n_1:3 * n_1], t[n_1:3 * n_1])
        return 1 - G21 / G22


class Indistinguishability(Purity):
    """HOM indistinguishability via G0/G1/G2 time-bin integrals
    (reference purity.py:200-822)."""

    def __init__(self, system, sigma_x, sigma_xdag, *pulses, dt=0.1, tb=800,
                 dt_small=0.1, simple_exp=True, gaussian_t=None, verbose=False,
                 workers=15, t_simul=None, options={}, dm=False, sigma_x_mat=None,
                 sigma_xdag_mat=None, t_mem=10, dt_big=None, add_tend=True):
        self.pulses = pulses
        self.dm = dm
        self.tl_map = None
        self.tl_dms = None
        self.t_mem = t_mem
        self.sigma_x_mat = sigma_x_mat
        self.sigma_xdag_mat = sigma_xdag_mat
        if sigma_x_mat is None or sigma_xdag_mat is None:
            self.sigma_x_mat = parse_operator(sigma_x)
            self.sigma_xdag_mat = parse_operator(sigma_xdag)
        self.dim = self.sigma_x_mat.shape[0]
        super().__init__(system, sigma_x, sigma_xdag, *pulses, dt=dt, tb=tb,
                         dt_small=dt_small, simple_exp=simple_exp,
                         gaussian_t=gaussian_t, verbose=verbose, workers=workers,
                         t_simul=t_simul, options=options, dt_big=dt_big,
                         add_tend=add_tend)

    # -- direct fan-out paths ------------------------------------------------

    def G1(self):
        """int dt |<sigma^dag(t+tau) sigma(t)>|^2 (reference purity.py:216-258)."""
        t1 = np.asarray(self.t1)
        factor_t, factor_tau = self.factor_t, self.factor_tau
        n_tau = factor_tau * int(self.tb / self.dt)
        t2 = np.linspace(0, factor_tau * self.tb, n_tau + 1)
        tend = (factor_t - 1) * self.tb + float(t1[-1]) + factor_tau * self.tb
        task = self.system(0, tend, return_task=True, output_ops=[], **self.options)
        mto = {"operator": self.sigma_x, "applyFrom": "_left", "applyBefore": "false"}
        out_op1 = self.sigma_xdag
        out_op_tau0 = self.sigma_xdag + "*" + self.sigma_x
        _G1 = np.zeros([factor_t * len(t1), len(t2)], dtype=complex)
        for i in range(factor_t):
            t_apply = t1 + i * self.tb
            times = t_apply[:, None]
            gather = t_apply[:, None] + t2[None, :]
            outs = branched.batched_mto_runs(task, [mto], times,
                                             np.clip(gather, 0, tend),
                                             [out_op1, out_op_tau0],
                                             mesh=self.mesh)
            _G1[i * len(t1):(i + 1) * len(t1), 1:] = outs[:, 1:, 0]
            _G1[i * len(t1):(i + 1) * len(t1), 0] = outs[:, 0, 1]
        G1 = np.trapezoid(np.abs(_G1) ** 2, self.t_axis_complete, axis=0)
        return t2, G1

    def _autocorrelate(self, val):
        """Sliding-window product integral <x(t)><x(t+tau)>
        (reference purity.py:273-294)."""
        factor_tau = self.factor_tau
        n_tau = factor_tau * int(self.tb / self.dt)
        t2 = np.linspace(0, factor_tau * self.tb, n_tau + 1)
        t1 = np.linspace(0, self.factor_t * self.tb,
                         int((self.factor_t * self.tb) / self.dt) + 1)
        G0_tau = np.zeros(len(t2))
        for j in range(len(t2)):
            val_shifted = val[j:j + len(t1)]
            product = val[:len(val_shifted)] * val_shifted
            G0_tau[j] = np.trapezoid(product, t1[:len(val_shifted)])
        return t2, G0_tau

    def simple_propagation(self, return_whole=False):
        """<x(t)><x(t+tau)> from one direct propagation (reference purity.py:260-294)."""
        output_ops = [self.sigma_xdag + "*" + self.sigma_x]
        tend = (self.factor_t + self.factor_tau) * self.tb
        res = self.system(0, tend, suffix=-1, output_ops=output_ops, **self.options)
        return self._autocorrelate(np.abs(res[1]))

    # -- time-local map machinery ---------------------------------------------

    def get_tl(self, t_mem=None):
        """Time-local maps from one calc_dynmap run (reference purity.py:395-413)."""
        if t_mem is None:
            t_mem = self.gaussian_t
        if t_mem is None:
            t_mem = self.tb / 2
        tend = 2 * t_mem
        result, dm = self.system(0, tend, multitime_op=[], calc_dynmap=True,
                                 **self.options)
        _t = np.round(result[0].real, 6)
        dm_tl = calc_tl_dynmap_pseudo(np.asarray(dm), _t)
        memory_time = self.gaussian_t if self.gaussian_t is not None else self.tb
        tl_map, dms = extract_dms(dm_tl, _t, memory_time, t_MTOs=[])
        self.tl_map = tl_map
        self.tl_dms = dms[0]

    def get_tl_phonons(self, mtos=[], t_mtos=[]):
        """MTO-bearing time-local maps with phonons (reference purity.py:415-424)."""
        tmem = self.gaussian_t + self.t_mem
        tend = 2.1 * tmem
        result, dm = self.system(0, tend, multitime_op=mtos, calc_dynmap=True,
                                 **self.options)
        _t = np.round(result[0].real, 6)
        dm_tl = calc_tl_dynmap_pseudo(np.asarray(dm), _t)
        tl_map, dms = extract_dms(dm_tl, _t, tmem, t_MTOs=t_mtos)
        # pad blocks cut short by the horizon with the stationary map so the
        # block stack is rectangular
        n_block = len(dms[0])
        padded = np.empty((len(dms), n_block, *tl_map.shape), dtype=complex)
        for i, b in enumerate(dms):
            padded[i] = tl_map
            padded[i, :len(b)] = b
        return tl_map, padded

    def _periodic_maps(self, block, tl_map, n_bins):
        """Background maps: pulse block then stationary map, repeated per bin."""
        n_tb = int(self.tb / self.dt)
        d2 = tl_map.shape[0]
        one = np.empty((n_tb, d2, d2), dtype=complex)
        m = min(len(block), n_tb)
        one[:m] = block[:m]
        one[m:] = tl_map
        return np.tile(one, (n_bins, 1, 1))

    def _rho0_vec(self):
        rho0 = np.zeros((self.dim, self.dim), dtype=complex)
        rho0[0, 0] = 1.0
        return rho0.reshape(-1)

    def calc_timedynamics_tl(self):
        """rho(t) from the periodic tl maps (reference purity.py:449-473)."""
        if self.tl_map is None:
            self.get_tl()
        factors = self.factor_t + self.factor_tau
        maps = self._periodic_maps(self.tl_dms, self.tl_map, factors)
        traj = np.asarray(dynmap.propagate_maps(maps, self._rho0_vec()))
        t_total = np.linspace(0, factors * self.tb, len(traj))
        return t_total, traj.reshape(len(traj), self.dim, self.dim)

    def calc_timedynamics_tl_phonons(self):
        """Same with the phonon maps (reference purity.py:426-447)."""
        tl_map, dms = self.get_tl_phonons(mtos=[], t_mtos=[])
        factors = self.factor_t + self.factor_tau
        maps = self._periodic_maps(dms[0], tl_map, factors)
        traj = np.asarray(dynmap.propagate_maps(maps, self._rho0_vec()))
        t_total = np.linspace(0, factors * self.tb, len(traj))
        return t_total, traj.reshape(len(traj), self.dim, self.dim)

    def simple_propagation_tl(self, return_whole=False):
        t_total, rho_t = self.calc_timedynamics_tl()
        op = self.sigma_xdag_mat @ self.sigma_x_mat
        val = np.real(np.einsum('ij,tji->t', op, rho_t))
        return self._autocorrelate(val)

    def simple_propagation_tl_phonons(self, return_whole=False):
        t_total, rho_t = self.calc_timedynamics_tl_phonons()
        op = self.sigma_xdag_mat @ self.sigma_x_mat
        val = np.real(np.einsum('ij,tji->t', op, rho_t))
        return self._autocorrelate(val)

    def _tl_correlation(self, opA, opB, opC, tl_dms, tl_map):
        """<A(t) B(t+tau) C(t)> over the periodic map background: the batched
        twin of propagate_tau.f90::calc_onetime_parallel_block
        (reference purity.py:715-774)."""
        n_tau = self.factor_tau * int(self.tb / self.dt)
        tau = np.linspace(0, self.factor_tau * self.tb, n_tau + 1)
        n_bins = self.factor_t + self.factor_tau + 1
        maps = self._periodic_maps(tl_dms, tl_map, n_bins)
        ks = np.round(self.t_axis_complete / self.dt).astype(np.int32)
        S = superop.left_mult(opC) @ superop.right_mult(opA)
        W_tau = superop.trace_vector(opB)[None]
        W_zero = superop.trace_vector(opA @ opB @ opC)[None]
        G0, Gtau = dynmap.map_trunk_and_branches(
            maps, self._rho0_vec(), ks, S, W_tau, W_zero, n_tau)
        G = np.empty((len(ks), n_tau + 1), dtype=complex)
        G[:, 0] = np.asarray(G0)[:, 0]
        G[:, 1:] = np.asarray(Gtau)[:, :, 0]
        return tau, G

    def G2_tl(self):
        """G2 via the time-local maps (reference purity.py:715-745)."""
        if self.tl_map is None:
            self.get_tl()
        opA = self.sigma_xdag_mat
        opC = self.sigma_x_mat
        opB = opA @ opC
        tau, G2 = self._tl_correlation(opA, opB, opC, self.tl_dms, self.tl_map)
        g2 = np.trapezoid(np.abs(G2), self.t_axis_complete, axis=0)
        return tau, g2

    def G1_tl(self):
        """G1 via the time-local maps (reference purity.py:747-774)."""
        if self.tl_map is None:
            self.get_tl()
        opA = np.identity(self.dim)
        opB = self.sigma_xdag_mat
        opC = self.sigma_x_mat
        tau, G1 = self._tl_correlation(opA, opB, opC, self.tl_dms, self.tl_map)
        g1 = np.trapezoid(np.abs(G1) ** 2, self.t_axis_complete, axis=0)
        return tau, g1

    def get_dm2_phonons(self, mtos, t_mto, suffix=1):
        """MTO-time-dependent within-memory map block (reference purity.py:475-486)."""
        mtos_new = [dict(m, time=t_mto) for m in mtos]
        result, dm = self.system(0, t_mto + self.gaussian_t + self.t_mem + 2 * self.dt,
                                 multitime_op=mtos_new, calc_dynmap=True,
                                 suffix=suffix, **self.options)
        _t = np.round(result[0].real, 6)
        dm_tl = calc_tl_dynmap_pseudo(np.asarray(dm), _t)
        _, dms = extract_dms(dm_tl, _t, self.gaussian_t + self.t_mem,
                             t_MTOs=[t_mto])
        return dms[1]

    def get_dm2_phonons_advanced(self, mtos, t_mto, suffix=1):
        """Shorter-horizon variant (reference purity.py:488-511)."""
        mtos_new = [dict(m, time=t_mto) for m in mtos]
        t_end = self.gaussian_t + 2 * self.t_mem + 2 * self.dt
        result, dm = self.system(0, t_end, multitime_op=mtos_new, calc_dynmap=True,
                                 suffix=suffix, **self.options)
        _t = np.round(result[0].real, 6)
        dm_tl = calc_tl_dynmap_pseudo(np.asarray(dm), _t)
        memory_time = max(self.gaussian_t + self.t_mem - t_mto, self.t_mem)
        _, dms = extract_dms(dm_tl, _t, memory_time, t_MTOs=[t_mto])
        return dms[1]

    def _tl_phonon_correlation(self, mtos, opA, opB, opC):
        """Phonon-case two-time map with per-t1 MTO-dependent blocks
        (reference purity.py:513-713)."""
        t_apply = self.gaussian_t + self.t_mem + 5 * self.dt
        mtos_t = [dict(m, time=t_apply) for m in mtos]
        tl_map, dms_sep = self.get_tl_phonons(mtos=mtos_t, t_mtos=[t_apply])

        tau_max = self.tb * self.factor_tau
        n_tau = int(tau_max / self.dt)
        tau = np.linspace(0, tau_max, n_tau + 1)
        t1 = np.asarray(self.t1)
        t_mem_indices = np.where(t1 <= (self.gaussian_t + self.t_mem))[0]

        n_map = dms_sep[0].shape[0]
        d2 = self.dim ** 2
        # per-branch blocks: MTO-dependent within memory, generic beyond.
        # All within-memory insertion times run as ONE batched dynamical-map
        # program (the reference fans these out as ACE subprocesses over a
        # ThreadPool, purity.py:669-681; a per-t calc_dynmap loop costs one
        # compile+dispatch each)
        blocks = np.empty((len(t1), n_map, d2, d2), dtype=complex)
        blocks[:] = dms_sep[1]
        if len(t_mem_indices):
            from pyaceqd_tpu.engine import branched
            t_end = self.gaussian_t + 2 * self.t_mem + 2 * self.dt
            task = self.system(0, t_end, return_task=True, output_ops=[],
                               **self.options)
            t_ins = np.round(t1[t_mem_indices], 6)
            times = np.stack([t_ins] * len(mtos), axis=1)
            dms_b = branched.batched_dynmap_runs(task, mtos, times)
            _t = np.round(np.asarray(task.t).real, 6)
            for row, i in enumerate(t_mem_indices):
                dm_tl = calc_tl_dynmap_pseudo(dms_b[row], _t)
                memory_time = max(self.gaussian_t + self.t_mem - t_ins[row],
                                  self.t_mem)
                _, dms_i = extract_dms(dm_tl, _t, memory_time,
                                       t_MTOs=[float(t_ins[row])])
                part = dms_i[1]
                blocks[i] = tl_map
                blocks[i, :len(part)] = part

        # trunk + background: pulse block then stationary map, periodic
        n_bins = self.factor_t + self.factor_tau + 1
        maps_full = self._periodic_maps(dms_sep[0], tl_map, n_bins)
        trunk = np.asarray(dynmap.propagate_maps(maps_full, self._rho0_vec()))
        ks = np.round(self.t_axis_complete / self.dt).astype(np.int32)
        rho_t1s = trunk[ks]

        W_tau = superop.trace_vector(opB)[None]
        G = np.empty((len(ks), n_tau + 1), dtype=complex)
        G[:, 0] = (superop.trace_vector(opA @ opB @ opC)[None] @ rho_t1s.T)[0]
        Gtau = dynmap.block_periodic_branches(
            maps_full, tl_map, blocks, rho_t1s, ks, W_tau,
            n_tau, int(self.tb / self.dt), n_map)
        G[:, 1:] = np.asarray(Gtau)
        return tau, G

    def G1_tl_phonons(self):
        """(reference purity.py:513-644)"""
        mto = {"operator": self.sigma_x, "applyFrom": "_left", "applyBefore": "false"}
        tau, G1 = self._tl_phonon_correlation(
            [mto], np.identity(self.dim), self.sigma_xdag_mat, self.sigma_x_mat)
        g1 = np.trapezoid(np.abs(G1) ** 2, self.t_axis_complete, axis=0)
        return tau, g1

    def G2_tl_phonons(self):
        """(reference purity.py:646-713)"""
        mto = {"operator": self.sigma_x, "applyFrom": "_left", "applyBefore": "false"}
        mto2 = {"operator": self.sigma_xdag, "applyFrom": "_right", "applyBefore": "false"}
        tau, G2 = self._tl_phonon_correlation(
            [mto, mto2], self.sigma_xdag_mat,
            self.sigma_xdag_mat @ self.sigma_x_mat, self.sigma_x_mat)
        g2 = np.trapezoid(np.abs(G2), self.t_axis_complete, axis=0)
        return tau, g2

    def calc_indistinguishability(self):
        """Returns (indistinguishability, purity) from the G0/G1/G2 bin
        integrals (reference purity.py:776-822)."""
        if self.dm:
            if self.options.get("phonons"):
                t, g1 = self.G1_tl_phonons()
            else:
                t, g1 = self.G1_tl()
        else:
            t, g1 = self.G1()
        n_1 = int(0.5 * self.tb / self.dt)
        G11 = 2 * np.trapezoid(g1[:n_1], t[:n_1])
        G12 = np.trapezoid(g1[n_1:3 * n_1], t[n_1:3 * n_1])

        if self.dm:
            if self.options.get("phonons"):
                t2, g2 = self.G2_tl_phonons()
            else:
                t2, g2 = self.G2_tl()
        else:
            t2, g2 = self.G2()
        G21 = 2 * np.trapezoid(g2[:n_1], t2[:n_1])
        G22 = np.trapezoid(g2[n_1:3 * n_1], t2[n_1:3 * n_1])

        if self.dm:
            if self.options.get("phonons"):
                t0, g0 = self.simple_propagation_tl_phonons()
            else:
                t0, g0 = self.simple_propagation_tl()
        else:
            t0, g0 = self.simple_propagation()
        G01 = 2 * np.trapezoid(g0[:n_1], t0[:n_1])
        G02 = np.trapezoid(g0[n_1:3 * n_1], t0[n_1:3 * n_1])

        result = (G01 - G11 + G21) / (G02 - G12 + G22)
        return 1 - result, 1 - G21 / G22
