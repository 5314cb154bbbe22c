"""Rabi-rotation maps of the driven two-level quantum dot.

Functional parity with /root/reference/pyaceqd/two_level_system/rabi_rotations.py:
PT generation/caching keyed by a parameter-mangled name, pulse-area sweep with
time-integrated emission counts, CSV result caching, optional spectral pulse
carving via the PulseGenerator.  The area sweep runs as ONE vmapped (and
optionally mesh-sharded) program instead of a thread pool
(rabi_rotations.py:172-198).
"""

import os

import numpy as np

from pyaceqd_tpu import constants
from pyaceqd_tpu.engine import hamiltonian as ham
from pyaceqd_tpu.engine import ptmpo
from pyaceqd_tpu.models.tls import tls
from pyaceqd_tpu.parallel.sweep import area_sweep
from pyaceqd_tpu.pulses import ChirpedPulse
from pyaceqd_tpu.tools import export_csv

hbar = constants.hbar


class RabiRotations():
    def __init__(self, dt=0.1, tau=5, area_max=30, n_area=150, gamma_e=1 / 100,
                 phonons=False, temperature=4, ae=5, ah_ratio=1.15,
                 J_from_file=None, phonon_factor=1, t_mem=10, temp_dir=None):
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
                             "pt_file": self.pt_name, "ae": self.ae,
                             "temperature": self.temperature,
                             "factor_ah": self.ah_ratio, "t_mem": self.t_mem,
                             "phonon_factor": self.phonon_factor,
                             "J_file": self.J_from_file})

    def delete_pt_files(self):
        path = ptmpo._cache_path("tls", self.ae, self.temperature, "8",
                                 self.t_mem, self.dt, self.J_from_file,
                                 self.temp_dir, self.pt_name)
        if os.path.exists(path):
            os.remove(path)

    def get_J_omega(self, plot=False):
        """Dump + return the phonon spectral density (reference
        rabi_rotations.py:43-65)."""
        from pyaceqd_tpu.engine import spectral
        J = (spectral.TabulatedJ(self.J_from_file) if self.J_from_file
             else spectral.QDPhononJ(ae=self.ae, factor_ah=self.ah_ratio))
        e = np.linspace(0, 15, 2000)
        Jvals = J(e / hbar)
        np.savetxt("J_omega.dat", np.c_[e, Jvals])
        if plot:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.clf()
            plt.plot(e, Jvals)
            plt.xlabel("energy (meV)")
            plt.ylabel("J")
            plt.savefig("J_omega.png")
        return e, Jvals

    def generate_pt(self):
        """Build + cache the process tensor for the sweep horizon
        (reference rabi_rotations.py:67-78)."""
        p1 = ChirpedPulse(tau_0=self.tau, e_start=0, alpha=0, e0=1, polar_x=1.0,
                          t0=4 * self.tau)
        tend = np.round(11 / self.gamma_e)
        tls(0, tend, p1, dt=self.dt, t_mem=self.t_mem, lindblad=False,
            phonons=True, factor_ah=self.ah_ratio, ae=self.ae,
            temperature=self.temperature, phonon_factor=self.phonon_factor,
            pt_file=self.pt_name, J_file=self.J_from_file,
            temp_dir=self.temp_dir)

    def calc_timedynamics(self, tau, area, path="", save=False, plot_pulse=False,
                          detuning=0, tend=None, plot=False, plotlims=None,
                          lindblad=True, carve_pulse=False,
                          pulse_args={"width_t": 4, "central_f": 0},
                          filter_width=0.14):
        """Single-point time dynamics, optionally with a spectrally carved
        pulse (reference rabi_rotations.py:80-118)."""
        p1 = ChirpedPulse(tau_0=tau, e_start=detuning, alpha=0, e0=area,
                          polar_x=1.0, t0=4 * tau)
        if tend is None:
            tend = np.round(10 / self.gamma_e) + 100
        pulse_file = None
        if carve_pulse:
            import pyaceqd_tpu.pulsegenerator as pg
            pulse = pg.PulseGenerator(0, np.round(10 / self.gamma_e), 0.02)
            pulse.add_gaussian_time(t0=100, sig_or_fwhm='fwhm',
                                    field_or_intesity='int', area_time=area,
                                    **pulse_args)
            pulse.add_filter_double_erf(central_f=0, width_f=filter_width,
                                        rise_f=0.01)
            pulse.apply_frequency_filter()
            pulse_file, _ = pulse.generate_pulsefiles(suffix="timedynamics",
                                                      temp_dir=self.temp_dir)
        res = tls(0, tend, p1, lindblad=lindblad, pulse_file=pulse_file,
                  **self.options)
        t, g, x, pgx, pxg = res[0], res[1], res[2], res[3], res[4]
        if plot:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.clf()
            plt.plot(t.real, np.real(x), label="x")
            plt.plot(t.real, np.abs(pgx), label="|p_gx|")
            if plotlims is not None:
                plt.xlim(*plotlims)
            plt.xlabel("time (ps)"); plt.ylabel("population"); plt.legend()
            plt.savefig(path + "timedynamics_{:.2f}ps_{:.2f}pi.png".format(tau, area))
            plt.clf()
        if save:
            export_csv(path + "timedynamics_{:.2f}ps_{:.2f}pi.csv".format(tau, area),
                       t.real, x.real)
        return t.real, g, x, pgx, pxg

    def get_rabi_rotations(self, detuning=0, integrate=True, plot=False,
                           delete_pt=False, path="", workers=15,
                           carve_pulse=False,
                           pulse_args={"width_t": 4, "central_f": 0},
                           filter_width=0.14, rise_f=0.01, exp_data=None,
                           plot_dynamic=False, mesh=None):
        """Rabi-rotation curve: one batched sweep over all areas, with the
        reference's CSV result cache (rabi_rotations.py:120-228)."""
        filename = path + "rabi_"
        if carve_pulse:
            filename += "carve_{:.2f}ps_{:.3f}nm_".format(pulse_args["width_t"],
                                                          filter_width)
        if self.phonons:
            filename += "{:.1f}K_tau_{:.1f}ps_ae_{:.1f}_ah_{:.2f}_coupl_{:.1f}".format(
                self.temperature, self.tau, self.ae, self.ah_ratio,
                self.phonon_factor)

        if os.path.exists(filename + ".csv"):
            data = np.loadtxt(filename + ".csv", delimiter=",")
            return data[:, 0], data[:, 1]

        tend = (np.round(11 / self.gamma_e) if integrate else 8 * self.tau)
        p_unit = ChirpedPulse(tau_0=self.tau, e_start=detuning, alpha=0, e0=1,
                              polar_x=1.0, t0=4 * self.tau)
        lind = [["|0><1|_2", self.gamma_e]] if integrate else []
        spec, _ = ham.build_system(
            system_op=None, lindblad_ops=lind,
            interaction_ops=[["|1><0|_2", "x"]], initial="|0><0|_2",
            output_ops=["|1><1|_2"],
            boson_op="{:.3f}*|1><1|_2".format(self.phonon_factor))
        pt = None
        if self.phonons:
            n = int(round(tend / self.dt))
            pt = ptmpo.get_process_tensor(
                boson_op=spec.boson_coupling, dt=self.dt, t_mem=self.t_mem,
                ae=self.ae, temperature=self.temperature, n_steps=n,
                threshold="8", J_file=self.J_from_file, factor_ah=self.ah_ratio,
                system_prefix="tls", pt_file=self.pt_name,
                temp_dir=self.temp_dir)
            spec.H0 = spec.H0 + pt.counter_term
        if carve_pulse:
            # carving changes the pulse shape per area: fall back to per-area
            # dynamics through the PulseGenerator path
            results = np.zeros_like(self.areas)
            for i, area in enumerate(self.areas):
                t, g, x, pgx, pxg = self.calc_timedynamics(
                    self.tau, area, detuning=detuning, tend=tend,
                    lindblad=integrate, carve_pulse=True,
                    pulse_args=pulse_args, filter_width=filter_width)
                results[i] = (self.gamma_e * np.trapezoid(np.real(x), np.real(t))
                              if integrate else np.real(x[-1]))
        else:
            t, outs = area_sweep(spec, [p_unit], self.areas, 0, tend, self.dt,
                                 pt=pt, mesh=mesh)
            x = np.real(outs[:, :, 0])
            if integrate:
                results = self.gamma_e * np.trapezoid(x, t, axis=1)
            else:
                results = x[:, -1]
        export_csv(filename + ".csv", self.areas, results)
        if plot:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            plt.clf()
            plt.plot(self.areas, results)
            if exp_data is not None:
                exp_x, exp_y, exp_offset = exp_data
                exp_y = np.max(results) * exp_y / np.max(exp_y) + exp_offset
                plt.plot(exp_x, exp_y, label="Experiment")
                plt.legend()
            plt.xlabel("pulse area / pi")
            plt.ylabel("Counts")
            plt.savefig((filename if self.phonons else path + "rabi") + ".png")
        if delete_pt:
            self.delete_pt_files()
        return self.areas, results
