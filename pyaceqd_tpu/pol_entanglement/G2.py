"""Polarization entanglement of the biexciton cascade: XX/X
polarization-resolved 4x4 two-photon density matrix in {XX, XY, YX, YY} and
its concurrence.

Functional parity with /root/reference/pyaceqd/pol_entanglement/G2.py
(class name kept verbatim, including the reference's spelling).  The per-t1
fan-outs run as batched branch lanes; ``G2_reuse`` — the reference's trick of
serving several matrix elements from one ACE run via extra output operators
(G2.py:439-533) — becomes extra output rows in one batched run.
"""

import os

import numpy as np

from pyaceqd_tpu import constants
from pyaceqd_tpu.constants import hbar
from pyaceqd_tpu.engine import branched
from pyaceqd_tpu.tools import concurrence, construct_t, simple_t_gaussian


class PolarizatzionEntanglement():
    def __init__(self, system, sigma_x, sigma_y, sigma_xdag, sigma_ydag, *pulses,
                 dt=0.1, tend=400, time_intervals=None, simple_exp=True,
                 dt_small=0.1, gaussian_t=None, regular_grid=False, verbose=False,
                 workers=2, remove_files=True, factor_tau=4, options={}):
        """system, four polarization transition operators, pulses; time grid
        options as in the reference (G2.py:12-103)."""
        self.system = system
        self.dt = dt
        self.options = dict(options)
        # optional jax.sharding.Mesh for the lane fan-outs (multi-chip)
        self.mesh = self.options.pop("mesh", None)
        self.options["dt"] = dt
        self.tend = tend
        self.remove_files = remove_files
        self.simple_exp = simple_exp
        self.gaussian_t = gaussian_t
        self.pulses = pulses
        self.workers = workers
        self.ax = "(" + sigma_x + ")"
        self.ay = "(" + sigma_y + ")"
        self.axdag = "(" + sigma_xdag + ")"
        self.aydag = "(" + sigma_ydag + ")"
        self.temp_dir = self.options.setdefault("temp_dir", constants.temp_dir)
        if not (self.options.get("pulse_file_x") is not None
                and self.options.get("pulse_file_y") is not None):
            self.prepare_pulsefile(verbose=verbose)
            self.options["pulse_file_x"] = self.pulse_file_x
            self.options["pulse_file_y"] = self.pulse_file_y
        self.gamma_e = options["gamma_e"]

        if regular_grid:
            self.t1 = np.arange(0, self.tend + dt_small, dt_small)
        elif time_intervals is not None:
            if len(time_intervals) != 2:
                raise ValueError("time_intervals must be a list of length 2")
            ts = [np.arange(0, time_intervals[0], dt_small),
                  np.arange(time_intervals[0], time_intervals[1], 10 * dt_small),
                  np.round(np.exp(np.arange(np.log(time_intervals[1]),
                                            np.log(tend), dt_small))),
                  np.array([tend])]
            self.t1 = np.concatenate(ts, axis=0)
        elif self.gaussian_t is not None:
            self.t1 = simple_t_gaussian(0, self.gaussian_t, self.tend, dt_small,
                                        10 * dt_small, *self.pulses, decimals=1,
                                        exp_part=self.simple_exp)
        else:
            self.t1 = construct_t(0, self.tend, dt_small, 1 * dt_small, dt_small,
                                  *self.pulses, simple_exp=self.simple_exp,
                                  factor_tau=factor_tau)

    def prepare_pulsefile(self, verbose=False):
        _t_pulse = np.arange(0, self.tend, step=self.dt / 5)
        pulse_x = np.zeros_like(_t_pulse, dtype=complex)
        pulse_y = np.zeros_like(_t_pulse, dtype=complex)
        for _p in self.pulses:
            pulse_x = pulse_x + _p.polar_x * _p.get_total(_t_pulse)
            pulse_y = pulse_y + _p.polar_y * _p.get_total(_t_pulse)
        self.pulse_file_x = (_t_pulse, pulse_x)
        self.pulse_file_y = (_t_pulse, pulse_y)

    def calc_timedynamics(self, output_ops=None):
        new_options = dict(self.options)
        if output_ops is not None:
            new_options["output_ops"] = output_ops
        return self.system(0, self.tend, **new_options)

    def _task(self, t_end):
        return self.system(0, t_end, return_task=True, output_ops=[],
                           **self.options)

    # ------------------------------------------------------------------

    def G1(self, op1_t, op2_ttau):
        """G1(t1, tau) = <op2(t1+tau) op1(t1)> with a per-t1 constant-length
        tau window (for FFT spectra; reference G2.py:161-205)."""
        if op1_t[0] != "(":
            op1_t = "(" + op1_t + ")"
        if op2_ttau[0] != "(":
            op2_ttau = "(" + op2_ttau + ")"
        tau0_op = op2_ttau + " * " + op1_t
        t1 = np.asarray(self.t1)
        n_tau = int(self.tend / self.dt)
        t2 = np.linspace(0, self.tend, n_tau + 1)
        task = self._task(float(t1[-1]) + self.tend)
        mto = {"operator": op1_t, "applyFrom": "_left", "applyBefore": "false"}
        times = t1[:, None]
        gather = t1[:, None] + t2[None, :]
        outs = branched.batched_mto_runs(task, [mto], times, gather,
                                         [op2_ttau, tau0_op], mesh=self.mesh)
        _G1 = np.zeros([len(t1), len(t2)], dtype=complex)
        _G1[:, 0] = outs[:, 0, 1]
        _G1[:, 1:] = outs[:, 1:, 0]
        return t1, t2, _G1

    def get_spectrum(self, op1_t, op2_ttau, save_g1_dir=None, load=None):
        """Time-integrated polarization-resolved emission spectrum from G1
        (reference G2.py:213-241); supports .npy result caching."""
        if load is not None and os.path.exists(load + "g1.npy"):
            t_axis = np.load(load + "t_axis.npy")
            tau_axis = np.load(load + "tau_axis.npy")
            g1 = np.load(load + "g1.npy")
        else:
            t_axis, tau_axis, g1 = self.G1(op1_t, op2_ttau)
        if save_g1_dir is not None and load is None:
            np.save(save_g1_dir + "g1.npy", g1)
            np.save(save_g1_dir + "t_axis.npy", t_axis)
            np.save(save_g1_dir + "tau_axis.npy", tau_axis)
        dtau = np.abs(tau_axis[1] - tau_axis[0])
        fft_freqs = -2 * np.pi * hbar * np.fft.fftfreq(2 * len(tau_axis) - 1, d=dtau)
        g1_symm = np.empty([len(t_axis), 2 * len(tau_axis) - 1], dtype=complex)
        g1_symm[:, :len(tau_axis)] = g1[:, ::-1]
        g1_symm[:, -(len(tau_axis) - 1):] = np.conj(g1[:, 1:])
        spectra = np.fft.fftshift(np.fft.fft(g1_symm, axis=1), axes=1)
        spectrum = np.real(np.trapezoid(spectra.T, t_axis))
        return np.fft.fftshift(fft_freqs), spectrum, spectra

    def G2(self, op1_t, op2_ttau, op3_ttau, op4_t):
        """<op1(t1) op2(t1+tau) op3(t1+tau) op4(t1)>, tau- then t-integrated
        (reference G2.py:243-299)."""
        t1, _G2s, vals = self.G2_reuse(op1_t, [op2_ttau + " * " + op3_ttau], op4_t)
        return t1, _G2s[0], vals[0]

    def G2_reuse(self, op1_t, op23s_ttau, op4_t, return_full_G2=False):
        """One batched fan-out serving several tau-operators at once
        (reference G2.py:439-533): each entry of op23s_ttau adds one output
        row; on this engine extra outputs are free."""
        return self.G2_reuse_multi([(op1_t, list(op23s_ttau), op4_t)],
                                   return_full_G2=return_full_G2)[0]

    def G2_reuse_multi(self, specs, return_full_G2=False):
        """Several G2_reuse calls fused into ONE compiled batched program.

        specs: list of (op1_t, [op23_ttau...], op4_t).  Lanes for all specs
        share the trunk and step unitaries; each lane carries its own MTO
        superoperators (per_lane_sops), so runs with different insertion
        operators no longer dispatch separate programs (reference re-runs
        ACE per operator pair, pol_entanglement/G2.py:301-356).  Returns one
        G2_reuse-style result tuple per spec."""
        from pyaceqd_tpu.engine.simulate import mto_superop
        t1 = np.asarray(self.t1)
        n_tau = int(self.tend / self.dt)
        t2 = np.linspace(0, self.tend, n_tau + 1)
        task = self._task(self.tend)
        B1 = len(t1)
        # union of output rows over all specs (duplicate ops share a row)
        out_rows, row_idx, spec_rows = [], {}, []
        for op1_t, op23s, op4_t in specs:
            rows = []
            for op in (list(op23s)
                       + [op1_t + " * " + o + " * " + op4_t for o in op23s]):
                if op not in row_idx:
                    row_idx[op] = len(out_rows)
                    out_rows.append(op)
                rows.append(row_idx[op])
            spec_rows.append(rows)
        mtos = [{"operator": specs[0][0], "applyFrom": "_right",
                 "applyBefore": "false"},
                {"operator": specs[0][2], "applyFrom": "_left",
                 "applyBefore": "false"}]
        times = np.concatenate([np.stack([t1, t1], axis=1)] * len(specs))
        gather = np.broadcast_to(t2[None, :], (B1 * len(specs), len(t2)))
        sops_batch = np.concatenate([
            np.broadcast_to(
                np.stack([
                    mto_superop({"operator": op1_t, "applyFrom": "_right"}),
                    mto_superop({"operator": op4_t, "applyFrom": "_left"})]),
                (B1, 2, task.dim**2, task.dim**2))
            for op1_t, _, op4_t in specs])
        outs = branched.batched_mto_runs(task, mtos, times, gather, out_rows,
                                         mto_sops_batch=sops_batch,
                                         mesh=self.mesh)
        results = []
        for si, (op1_t, op23s, op4_t) in enumerate(specs):
            n_ops = len(op23s)
            rows = spec_rows[si]
            block = outs[si * B1:(si + 1) * B1]
            _G2 = np.zeros([n_ops, B1], dtype=complex)
            if return_full_G2:
                G2_full = np.zeros([n_ops, B1, n_tau + 1], dtype=complex)
            for i in range(B1):
                # grid index by rounding (matches Task.k_of): float
                # truncation shifts the tau axis one step for ~8% of exact
                # dt-multiples
                k0 = int(np.round(t1[i] / self.dt))
                n_t2 = n_tau - k0
                for j in range(n_ops):
                    temp = np.zeros(n_t2 + 1, dtype=complex)
                    temp[0] = block[i, k0, rows[n_ops + j]]
                    if n_t2 > 0:
                        temp[1:] = block[i, k0 + 1:, rows[j]]
                    if return_full_G2:
                        G2_full[j, i, :n_t2 + 1] = temp
                    _G2[j, i] = np.trapezoid(temp, t2[:n_t2 + 1])
            if return_full_G2:
                results.append((t1, t2, _G2, np.trapezoid(_G2, t1, axis=1),
                                G2_full))
            else:
                results.append((t1, _G2, np.trapezoid(_G2, t1, axis=1)))
        return results

    # ------------------------------------------------------------------

    def calc_densitymatrix(self):
        """4x4 dm from 10 G2 elements (reference G2.py:124-159)."""
        density_matrix = np.zeros([4, 4], dtype=complex)
        _, _, density_matrix[0, 0] = self.G2(self.axdag, self.axdag, self.ax, self.ax)
        _, _, density_matrix[3, 3] = self.G2(self.aydag, self.aydag, self.ay, self.ay)
        _, _, density_matrix[1, 1] = self.G2(self.axdag, self.aydag, self.ay, self.ax)
        _, _, density_matrix[2, 2] = self.G2(self.aydag, self.axdag, self.ax, self.ay)
        _, _, density_matrix[0, 1] = self.G2(self.axdag, self.axdag, self.ay, self.ax)
        density_matrix[1, 0] = np.conj(density_matrix[0, 1])
        _, _, density_matrix[0, 2] = self.G2(self.axdag, self.axdag, self.ax, self.ay)
        density_matrix[2, 0] = np.conj(density_matrix[0, 2])
        _, _, density_matrix[0, 3] = self.G2(self.axdag, self.axdag, self.ay, self.ay)
        density_matrix[3, 0] = np.conj(density_matrix[0, 3])
        _, _, density_matrix[1, 2] = self.G2(self.axdag, self.aydag, self.ax, self.ay)
        density_matrix[2, 1] = np.conj(density_matrix[1, 2])
        _, _, density_matrix[1, 3] = self.G2(self.axdag, self.aydag, self.ay, self.ay)
        density_matrix[3, 1] = np.conj(density_matrix[1, 3])
        _, _, density_matrix[2, 3] = self.G2(self.aydag, self.axdag, self.ay, self.ay)
        density_matrix[3, 2] = np.conj(density_matrix[2, 3])
        norm = np.trace(density_matrix)
        density_matrix = density_matrix / norm
        return concurrence(density_matrix)

    def calc_densitymatrix_reuse(self, plot_G2=None, return_counts=False,
                                 return_rho=False):
        """4x4 dm from only 3 batched runs via multi-output reuse
        (reference G2.py:301-356)."""
        density_matrix = np.zeros([4, 4], dtype=complex)
        op23s_a = [self.axdag + " * " + self.ax, self.axdag + " * " + self.ay,
                   self.aydag + " * " + self.ay]
        op23s_b = [self.axdag + " * " + self.ax, self.axdag + " * " + self.ay,
                   self.aydag + " * " + self.ax, self.aydag + " * " + self.ay]
        # all three reference runs (G2.py:301-356) fused into one program
        (t1, G2_1_t, G2_1), (t2, G2_2_t, G2_2), (t3, G2_3_t, G2_3) = \
            self.G2_reuse_multi([(self.axdag, op23s_a, self.ax),
                                 (self.axdag, op23s_b, self.ay),
                                 (self.aydag, op23s_a, self.ay)])

        density_matrix[0, 0] = np.abs(G2_1[0])
        density_matrix[3, 3] = np.abs(G2_3[2])
        density_matrix[1, 1] = np.abs(G2_1[2])
        density_matrix[2, 2] = np.abs(G2_3[0])
        density_matrix[0, 1] = G2_1[1]
        density_matrix[1, 0] = np.conj(density_matrix[0, 1])
        density_matrix[0, 2] = G2_2[0]
        density_matrix[2, 0] = np.conj(density_matrix[0, 2])
        density_matrix[0, 3] = G2_2[1]
        density_matrix[3, 0] = np.conj(density_matrix[0, 3])
        density_matrix[1, 2] = G2_2[2]
        density_matrix[2, 1] = np.conj(density_matrix[1, 2])
        density_matrix[1, 3] = G2_2[3]
        density_matrix[3, 1] = np.conj(density_matrix[1, 3])
        density_matrix[2, 3] = G2_3[1]
        density_matrix[3, 2] = np.conj(density_matrix[2, 3])
        norm = np.trace(density_matrix)

        if plot_G2 is not None:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.clf()
            plt.plot(t1, np.abs(G2_1_t[0]), label="xx,xx")
            plt.plot(t1, np.abs(G2_1_t[2]), label="xy,xy")
            plt.plot(t2, np.abs(G2_2_t[1]), label="xx,yy")
            plt.plot(t3, np.abs(G2_3_t[0]), dashes=[4, 4], label="yx,yx")
            plt.plot(t3, np.abs(G2_3_t[2]), dashes=[4, 4], label="yy,yy")
            plt.xlabel("t (ps)"); plt.ylabel("G2(t)"); plt.legend()
            plt.savefig("{}.png".format(plot_G2))
            np.save("{}.npy".format(plot_G2),
                    np.array([t1, G2_1_t[0], G2_1_t[1], G2_1_t[2], G2_2_t[0],
                              G2_2_t[1], G2_2_t[2], G2_2_t[3], G2_3_t[0],
                              G2_3_t[1], G2_3_t[2]]))
        if return_rho:
            return concurrence(density_matrix / norm), density_matrix
        if return_counts:
            return (concurrence(density_matrix / norm), density_matrix[0, 0],
                    density_matrix[1, 1], density_matrix[2, 2],
                    density_matrix[3, 3], density_matrix[0, 3])
        return concurrence(density_matrix / norm)

    # ------------------------------------------------------------------

    def calc_timedep_data(self):
        """Full G2(t, tau) for all 10 matrix elements (reference G2.py:359-373),
        one fused program for the three operator sets."""
        op23s_a = [self.axdag + " * " + self.ax, self.axdag + " * " + self.ay,
                   self.aydag + " * " + self.ay]
        op23s_b = [self.axdag + " * " + self.ax, self.axdag + " * " + self.ay,
                   self.aydag + " * " + self.ax, self.aydag + " * " + self.ay]
        res = self.G2_reuse_multi([(self.axdag, op23s_a, self.ax),
                                   (self.axdag, op23s_b, self.ay),
                                   (self.aydag, op23s_a, self.ay)],
                                  return_full_G2=True)
        (t1, t2, _, _, G2_1_full) = res[0]
        G2_2_full, G2_3_full = res[1][4], res[2][4]
        return t1, t2, np.append(G2_1_full, np.append(G2_2_full, G2_3_full, axis=0), axis=0)

    def integrate_g2_tau(self, t1, t2, G2_full):
        """G2(tau) = int dt G2(t, tau) (reference G2.py:535-549)."""
        G2_tau = np.trapezoid(G2_full, t1, axis=1)
        return t2, G2_tau

    def integrate_timedep_G2(self, t1, t2, G2_full):
        """G2(t) = int_0^t dt' int_0^{t-t'} dtau G2(t', tau)
        (reference G2.py:552-606)."""
        G2_t = np.zeros((G2_full.shape[0], len(t1)), dtype=complex)
        for i in range(len(t1)):
            t_prime = t1[:i + 1]
            G2_tprime = np.zeros([G2_full.shape[0], len(t_prime)], dtype=complex)
            for j, tp in enumerate(t_prime):
                tau_idx = t2 <= (t1[i] - tp)
                tau = t2[tau_idx]
                if len(tau) == 0:
                    continue
                G2_tprime[:, j] = np.trapezoid(G2_full[:, j, tau_idx], tau)
            G2_t[:, i] = np.trapezoid(G2_tprime, t_prime)
        return t1, G2_t

    def calc_timedependent_rho(self, plot_G2=None, t1=None, t2=None, G2_full=None,
                               t=None, G2_t=None, add_norm=0, mode="t", skip=0,
                               return_G2=False):
        """Time-dependent two-photon dm and concurrence c(t)
        (reference G2.py:375-437)."""
        if t is None or G2_t is None:
            if t1 is None or t2 is None or G2_full is None:
                t1, t2, G2_full = self.calc_timedep_data()
            if mode == "t":
                t, G2_t = self.integrate_timedep_G2(t1, t2, G2_full)
            if mode == "tau":
                t, G2_t = self.integrate_g2_tau(t1, t2, G2_full)
        t = t[skip:]
        G2_t = G2_t[:, skip:]
        density_matrix = np.zeros([len(t), 4, 4], dtype=complex)
        density_matrix[:, 0, 0] = np.abs(G2_t[0])
        density_matrix[:, 3, 3] = np.abs(G2_t[9])
        density_matrix[:, 1, 1] = np.abs(G2_t[2])
        density_matrix[:, 2, 2] = np.abs(G2_t[7])
        density_matrix[:, 0, 1] = G2_t[1]
        density_matrix[:, 1, 0] = np.conj(density_matrix[:, 0, 1])
        density_matrix[:, 0, 2] = G2_t[3]
        density_matrix[:, 2, 0] = np.conj(density_matrix[:, 0, 2])
        density_matrix[:, 0, 3] = G2_t[4]
        density_matrix[:, 3, 0] = np.conj(density_matrix[:, 0, 3])
        density_matrix[:, 1, 2] = G2_t[5]
        density_matrix[:, 2, 1] = np.conj(density_matrix[:, 1, 2])
        density_matrix[:, 1, 3] = G2_t[6]
        density_matrix[:, 3, 1] = np.conj(density_matrix[:, 1, 3])
        density_matrix[:, 2, 3] = G2_t[8]
        density_matrix[:, 3, 2] = np.conj(density_matrix[:, 2, 3])

        _integrated_dm = np.trapezoid(density_matrix, t, axis=0)
        _integrated_norm = np.trace(_integrated_dm).real
        integrated_concurrence = concurrence(_integrated_dm / _integrated_norm)

        density_matrix[:, 0, 0] += add_norm
        density_matrix[:, 3, 3] += add_norm
        density_matrix[:, 1, 1] += add_norm
        density_matrix[:, 2, 2] += add_norm
        norm = np.trace(density_matrix, axis1=1, axis2=2).real
        c_t = np.zeros_like(t)
        for i in range(len(t)):
            c_t[i] = concurrence(density_matrix[i] / norm[i])
        if plot_G2 is not None:
            np.savez("{}.npz".format(plot_G2), t1=t1, t2=t2, G2_full=G2_full)
        if return_G2:
            return t, c_t, density_matrix, norm, _integrated_dm, integrated_concurrence, G2_t
        return t, c_t, density_matrix, norm, _integrated_dm, integrated_concurrence
