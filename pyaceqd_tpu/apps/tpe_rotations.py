"""Two-photon-excitation Rabi maps of the biexciton.

Functional parity with /root/reference/pyaceqd/four_level_system/tpe_rotations.py,
which mirrors RabiRotations for the four-level biexciton cascade: the TPE
pulse (detuned to -delta_b/2) area sweep returns the time-integrated X, Y and
B emission counts.  The sweep runs as one batched program.
"""

import os

import numpy as np

from pyaceqd_tpu import constants
from pyaceqd_tpu.engine import hamiltonian as ham
from pyaceqd_tpu.engine import ptmpo
from pyaceqd_tpu.models.biexciton import biexciton
from pyaceqd_tpu.parallel.sweep import area_sweep
from pyaceqd_tpu.pulses import ChirpedPulse
from pyaceqd_tpu.tools import export_csv

hbar = constants.hbar


class TPERotations():
    def __init__(self, dt=0.1, tau=5, delta_xy=0, delta_b=4, area_max=30,
                 n_area=150, gamma_e=1 / 100, phonons=False, temperature=4, ae=5,
                 ah_ratio=1.15, J_from_file=None, phonon_factor=1, t_mem=6.1,
                 temp_dir=None):
        self.dt = dt
        self.tau = tau
        self.areas = np.linspace(0, area_max, n_area)
        self.gamma_e = gamma_e
        self.phonons = phonons
        self.temperature = temperature
        self.ae = ae
        self.ah_ratio = ah_ratio
        self.J_from_file = J_from_file
        self.phonon_factor = phonon_factor
        self.t_mem = t_mem
        self.delta_xy = delta_xy
        self.delta_b = delta_b
        self.temp_dir = temp_dir if temp_dir is not None else constants.temp_dir
        if J_from_file is not None:
            self.pt_name = J_from_file.split(".")[0] + ".ptr"
        else:
            self.pt_name = ("pt_T{:.1f}K_AE{:.1f}_AHratio{:.2f}_coupl{:.1f}"
                            "_dt{:.2f}_tmem{:.1f}.ptr").format(
                self.temperature, self.ae, self.ah_ratio, self.phonon_factor,
                self.dt, self.t_mem)
        self.options = dict({"gamma_e": self.gamma_e, "dt": self.dt,
                             "phonons": self.phonons, "temp_dir": self.temp_dir,
                             "pt_file": self.pt_name, "delta_xy": self.delta_xy,
                             "delta_b": self.delta_b, "ae": self.ae,
                             "temperature": self.temperature,
                             "t_mem": self.t_mem})

    def delete_pt_files(self):
        path = ptmpo._cache_path("b_linear", self.ae, self.temperature, "8",
                                 self.t_mem, self.dt, self.J_from_file,
                                 self.temp_dir, self.pt_name)
        if os.path.exists(path):
            os.remove(path)

    def generate_pt(self):
        """(reference tpe_rotations.py:72-84)"""
        p1 = ChirpedPulse(tau_0=self.tau, e_start=0, alpha=0, e0=1, polar_x=1.0,
                          t0=4 * self.tau)
        biexciton(0, np.round(10 / self.gamma_e) + 100, p1,
                  delta_xy=self.delta_xy, delta_b=self.delta_b, dt=self.dt,
                  t_mem=self.t_mem, lindblad=False, phonons=True, ae=self.ae,
                  temperature=self.temperature, pt_file=self.pt_name,
                  temp_dir=self.temp_dir)

    def calc_timedynamics(self, tau, area, path="", save=False, detuning=None,
                          tend=None, plot=False, plotlims=None, lindblad=True,
                          **_):
        """Single-point TPE time dynamics (reference tpe_rotations.py:86-125)."""
        if detuning is None:
            detuning = -self.delta_b / 2
        p1 = ChirpedPulse(tau_0=tau, e_start=detuning, alpha=0, e0=area,
                          polar_x=1.0, t0=4 * tau)
        if tend is None:
            tend = np.round(10 / self.gamma_e) + 100
        res = biexciton(0, tend, p1, lindblad=lindblad, **self.options)
        t, g, x, y, b = res[0], res[1], res[2], res[3], res[4]
        if plot:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.clf()
            plt.plot(t.real, np.real(x), label="x")
            plt.plot(t.real, np.real(b), label="b")
            if plotlims is not None:
                plt.xlim(*plotlims)
            plt.xlabel("time (ps)"); plt.ylabel("population"); plt.legend()
            plt.savefig(path + "tpe_timedynamics_{:.2f}ps_{:.2f}pi.png".format(tau, area))
        if save:
            export_csv(path + "tpe_timedynamics_{:.2f}ps_{:.2f}pi.csv".format(tau, area),
                       t.real, np.real(x), np.real(b))
        return t.real, g, x, y, b

    def get_rabi_rotations(self, detuning=None, integrate=True, plot=False,
                           delete_pt=False, path="", workers=15, exp_data=None,
                           mesh=None, **_):
        """TPE rotation curves: integrated X/Y/B counts vs pulse area, one
        batched sweep, CSV-cached (reference tpe_rotations.py:127-243)."""
        if detuning is None:
            detuning = -self.delta_b / 2
        filename = path + "tpe_rabi_"
        if self.phonons:
            filename += "{:.1f}K_tau_{:.1f}ps_ae_{:.1f}_ah_{:.2f}_coupl_{:.1f}".format(
                self.temperature, self.tau, self.ae, self.ah_ratio,
                self.phonon_factor)
        if os.path.exists(filename + ".csv"):
            data = np.loadtxt(filename + ".csv", delimiter=",")
            return data[:, 0], data[:, 1:].T

        tend = (np.round(10 / self.gamma_e) + 100 if integrate else 8 * self.tau)
        p_unit = ChirpedPulse(tau_0=self.tau, e_start=detuning, alpha=0, e0=1,
                              polar_x=1.0, t0=4 * self.tau)
        lind = ([["|0><1|_4", self.gamma_e], ["|0><2|_4", self.gamma_e],
                 ["|1><3|_4", self.gamma_e], ["|2><3|_4", self.gamma_e]]
                if integrate else [])
        system_op = ["{}*|3><3|_4".format(-self.delta_b),
                     "{}*|1><1|_4".format(-self.delta_xy / 2),
                     "{}*|2><2|_4".format(self.delta_xy / 2)]
        spec, _ = ham.build_system(
            system_op=system_op, lindblad_ops=lind,
            interaction_ops=[["|1><0|_4+|3><1|_4", "x"],
                             ["|2><0|_4+|3><2|_4", "y"]],
            initial="|0><0|_4",
            output_ops=["|1><1|_4", "|2><2|_4", "|3><3|_4"],
            boson_op="1*(|1><1|_4 + |2><2|_4) + 2*|3><3|_4")
        pt = None
        if self.phonons:
            n = int(round(tend / self.dt))
            pt = ptmpo.get_process_tensor(
                boson_op=spec.boson_coupling, dt=self.dt, t_mem=self.t_mem,
                ae=self.ae, temperature=self.temperature, n_steps=n,
                threshold="8", J_file=self.J_from_file, factor_ah=self.ah_ratio,
                system_prefix="b_linear", pt_file=self.pt_name,
                temp_dir=self.temp_dir)
            spec.H0 = spec.H0 + pt.counter_term
        t, outs = area_sweep(spec, [p_unit], self.areas, 0, tend, self.dt,
                             pt=pt, mesh=mesh)
        x = np.real(outs[:, :, 0])
        y = np.real(outs[:, :, 1])
        b = np.real(outs[:, :, 2])
        results = np.zeros([3, len(self.areas)])
        if integrate:
            results[0] = self.gamma_e * np.trapezoid(x, t, axis=1)
            results[1] = self.gamma_e * np.trapezoid(y, t, axis=1)
            results[2] = 2 * self.gamma_e * np.trapezoid(b, t, axis=1)
        else:
            results[0], results[1], results[2] = x[:, -1], y[:, -1], b[:, -1]
        export_csv(filename + ".csv", self.areas, results[0], results[1], results[2])
        if plot:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.clf()
            plt.plot(self.areas, results[0], label="X")
            plt.plot(self.areas, results[1], label="Y")
            plt.plot(self.areas, results[2], label="B")
            plt.xlabel("pulse area / pi"); plt.ylabel("Counts"); plt.legend()
            plt.savefig(filename + ".png")
        if delete_pt:
            self.delete_pt_files()
        return self.areas, results
