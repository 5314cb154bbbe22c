"""Time-bin base class: shared pulse sampling over both bins.

Functional parity with /root/reference/pyaceqd/timebin/timebin.py.  The
reference writes shared CSV pulse files with the object id in the name (to
dodge a destructor-ordering race, timebin.py:39-40) and removes them in
__del__; here the "files" are in-memory (t, values) tuples passed straight to
the engine — no files, no races, no cleanup.
"""

import numpy as np

from pyaceqd_tpu import constants


class TimeBin:
    def __init__(self, system, *pulses, dt=0.02, tb=800, simple_exp=True,
                 gaussian_t=None, verbose=False, workers=15, t_simul=None,
                 options={}):
        self.system = system
        self.dt = dt
        self.options = dict(options)
        # optional jax.sharding.Mesh: shards every MTO-lane fan-out of this
        # protocol over the mesh 'batch' axis (multi-chip twin of workers=N)
        self.mesh = self.options.pop("mesh", None)
        self.options["dt"] = dt
        self.tb = tb
        self.simple_exp = simple_exp
        self.gaussian_t = gaussian_t
        self.pulses = pulses
        self.workers = workers
        self.temp_dir = self.options.setdefault("temp_dir", constants.temp_dir)
        if (not self.options.get("pulse_file_x")
                or not self.options.get("pulse_file_y")):
            self.prepare_pulsefile(verbose=verbose, t_simul=t_simul)
            self.options["pulse_file_x"] = self.pulse_file_x
            self.options["pulse_file_y"] = self.pulse_file_y
        else:
            self.pulse_file_x = self.options["pulse_file_x"]
            self.pulse_file_y = self.options["pulse_file_y"]

    def prepare_pulsefile(self, verbose=False, t_simul=None):
        """Sample both polarizations over the full two-bin window at dt/5
        (reference timebin.py:32-47)."""
        t_end = 2.1 * self.tb
        if t_simul is not None:
            t_end = t_simul
        _t_pulse = np.arange(0, t_end, step=self.dt / 5)
        pulse_x = np.zeros_like(_t_pulse, dtype=complex)
        pulse_y = np.zeros_like(_t_pulse, dtype=complex)
        for _p in self.pulses:
            pulse_x = pulse_x + _p.polar_x * _p.get_total(_t_pulse)
            pulse_y = pulse_y + _p.polar_y * _p.get_total(_t_pulse)
        self.pulse_file_x = (_t_pulse, pulse_x)
        self.pulse_file_y = (_t_pulse, pulse_y)

    def prepare_puslefile_tls(self, verbose=False):
        """Split pulses per bin; bin-2 pulses are shifted by -tb with the
        carrier phase preserved, for the time-local dynamical-map path
        (reference timebin.py:49-86; name kept verbatim for API parity)."""
        _t_pulse1 = np.arange(0, self.tb, step=self.dt / 5)
        _t_pulse2 = np.arange(self.tb, 2 * self.tb, step=self.dt / 5)
        pulses_tb1 = [p for p in self.pulses if p.t0 < self.tb]
        pulses_tb2 = [p for p in self.pulses if p.t0 >= self.tb]
        px1 = np.zeros_like(_t_pulse1, dtype=complex)
        py1 = np.zeros_like(_t_pulse1, dtype=complex)
        px2 = np.zeros_like(_t_pulse2, dtype=complex)
        py2 = np.zeros_like(_t_pulse2, dtype=complex)
        for _p in pulses_tb1:
            px1 = px1 + _p.polar_x * _p.get_total(_t_pulse1)
            py1 = py1 + _p.polar_y * _p.get_total(_t_pulse1)
        for _p in pulses_tb2:
            px2 = px2 + _p.polar_x * _p.get_total(_t_pulse2)
            py2 = py2 + _p.polar_y * _p.get_total(_t_pulse2)
        self.pulse_file_x1 = (_t_pulse1, px1)
        self.pulse_file_y1 = (_t_pulse1, py1)
        # shifted to start at t=0, evaluated at absolute times => phase kept
        self.pulse_file_x2 = (_t_pulse2 - self.tb, px2)
        self.pulse_file_y2 = (_t_pulse2 - self.tb, py2)
