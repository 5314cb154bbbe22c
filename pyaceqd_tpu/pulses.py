"""Analytic pulse classes.

API-parity layer with the reference's ``pyaceqd/pulses.py`` (Pulse,
AsymmetricPulse, ChirpedPulse, PulseTrain, CWLaser, SmoothRectangle), built for
this framework: all envelope/phase evaluations are vectorized ufunc-style so
they work on NumPy arrays (host-side grid construction) and on JAX arrays
(inside jit, e.g. differentiable pulse-parameter sweeps).

Conventions (identical to reference, pyaceqd/pulses.py:7-86):
- times in ps, energies in meV, hbar = 0.6582119569 meV*ps
- ``get_envelope`` is normalized so that ``integral(envelope) = e0``; the
  engine couples pulses with a factor ``-pi/2`` so that ``e0 = 1`` drives a
  pi-rotation of a resonant two-level system.
- ``get_total(t) = envelope(t) * exp(-1j * full_phase(t))`` with
  ``full_phase = w0*(t-t0) + 0.5*w_gain*(t-t0)^2 + phase``.
"""

import numpy as np
from scipy.special import erf

from pyaceqd_tpu import constants

hbar = constants.hbar  # meV*ps


class Pulse:
    """Gaussian pulse with optional linear chirp ``w_gain`` (reference pyaceqd/pulses.py:7)."""

    def __init__(self, tau, e_start, w_gain=0, t0=0, e0=1, phase=0, polar_x=1, polars=None):
        self.tau = tau  # ps
        self.e_start = e_start  # meV
        self.w_gain = float(w_gain)  # 1/ps^2
        self.t0 = t0
        self.e0 = e0
        self.phase = phase
        self.freq = None
        self.phase_ = None
        self.polar_x = polar_x
        self.polar_y = np.sqrt(1 - polar_x**2)
        if polars is not None:
            norm = np.sqrt(np.abs(polars[0]) ** 2 + np.abs(polars[1]) ** 2)
            self.polar_x = polars[0] / norm
            self.polar_y = polars[1] / norm

    def __repr__(self):
        return "%s(tau=%r, e_start=%r, w_gain=%r, t0=%r, e0=%r)" % (
            self.__class__.__name__, self.tau, self.e_start, self.w_gain, self.t0, self.e0,
        )

    def get_energy(self):
        return self.e_start, self.w_gain

    def set_energy(self, e_start, w_gain):
        self.e_start = e_start
        self.w_gain = w_gain

    def get_envelope(self, t):
        return self.e0 * np.exp(-0.5 * ((t - self.t0) / self.tau) ** 2) / (np.sqrt(2 * np.pi) * self.tau)

    def get_integral(self, t):
        """Cumulative pulse area up to time t (erf CDF)."""
        return self.e0 * 0.5 * (1 - erf((self.t0 - t) / (np.sqrt(2) * self.tau)))

    def set_frequency(self, f):
        """Set time-dependent frequency via a callable f(t) -> omega."""
        self.freq = f

    def get_frequency(self, t):
        """Instantaneous frequency omega(t) = d(phase)/dt, in 1/ps."""
        if self.freq is not None:
            return self.freq(t)
        w_start = self.e_start / hbar
        return w_start + self.w_gain * (t - self.t0)

    def set_phase(self, f):
        self.phase_ = f

    def get_full_phase(self, t):
        if self.phase_ is not None:
            return self.phase_(t)
        w_start = self.e_start / hbar
        return w_start * (t - self.t0) + 0.5 * self.w_gain * ((t - self.t0) ** 2) + self.phase

    def get_energies(self):
        """Energy span (meV) covered within +-tau, relevant for chirped pulses."""
        low = self.get_frequency(-self.tau)
        high = self.get_frequency(self.tau)
        return np.abs(high - low) * hbar

    def get_total(self, t):
        return self.get_envelope(t) * np.exp(-1j * self.get_full_phase(t))

    def copy(self):
        return Pulse(self.tau, self.e_start, self.w_gain, self.t0, self.e0, self.phase, self.polar_x)


class AsymmetricPulse(Pulse):
    """Gaussian with different rise (tau1) / fall (tau2) widths (reference pyaceqd/pulses.py:88)."""

    def __init__(self, tau1, tau2, e_start, t0=0, e0=1, phase=0, polar_x=1, polars=None):
        self.tau1 = tau1
        self.tau2 = tau2
        super().__init__(tau1, e_start, w_gain=0, t0=t0, e0=e0, phase=phase, polar_x=polar_x, polars=polars)

    def get_envelope(self, t):
        # branchless (works for scalars, numpy and jax arrays); both lobes
        # normalized by tau1 for a smooth transition, as in the reference.
        t = np.asarray(t)
        tau = np.where(t <= self.t0, self.tau1, self.tau2)
        return self.e0 * np.exp(-0.5 * ((t - self.t0) / tau) ** 2) / (np.sqrt(2 * np.pi) * self.tau1)

    def copy(self):
        return AsymmetricPulse(self.tau1, self.tau2, self.e_start, self.t0, self.e0, self.phase, self.polar_x)


class ChirpedPulse(Pulse):
    """Pulse from a chirp filter alpha applied to a tau_0 transform-limited pulse (reference pyaceqd/pulses.py:105)."""

    def __init__(self, tau_0, e_start, alpha=0, t0=0, e0=1 * np.pi, polar_x=1, phase=0, polars=None):
        self.tau_0 = tau_0
        self.alpha = alpha
        super().__init__(
            tau=np.sqrt(alpha**2 / tau_0**2 + tau_0**2),
            e_start=e_start,
            w_gain=alpha / (alpha**2 + tau_0**4),
            t0=t0, e0=e0, polar_x=polar_x, phase=phase, polars=polars,
        )

    def get_parameters(self):
        return "tau: {:.4f} ps , a: {:.4f} ps^-2".format(self.tau, self.w_gain)

    def get_envelope(self, t):
        return self.e0 * np.exp(-0.5 * ((t - self.t0) / self.tau) ** 2) / (np.sqrt(2 * np.pi * self.tau * self.tau_0))

    def get_integral(self, t):
        return self.e0 * 0.5 * np.sqrt(self.tau / self.tau_0) * (1 - erf((self.t0 - t) / (np.sqrt(2) * self.tau)))

    def get_ratio(self):
        """Pulse-area ratio chirped/unchirped = sqrt(tau/tau_0)."""
        return np.sqrt(self.tau / self.tau_0)

    def copy(self):
        return ChirpedPulse(self.tau_0, self.e_start, self.alpha, self.t0, self.e0, self.polar_x, self.phase)


class PulseTrain:
    """n_pulses occurrences separated by delta_t; each occurrence may hold several pulses
    (reference pyaceqd/pulses.py:133)."""

    def __init__(self, delta_t, n_pulses, *pulses, t_shift=0):
        self.delta_t = delta_t
        self.n_pulses = n_pulses
        self.pulses = list(pulses)
        self.t_shift = t_shift

    def get_total(self, t):
        field = np.zeros_like(np.asarray(t), dtype=complex)
        for i in range(self.n_pulses):
            for p in self.pulses:
                field = field + p.get_total(t - self.delta_t * i - self.t_shift)
        return field

    def get_total_xy(self, t):
        field_x = np.zeros_like(np.asarray(t), dtype=complex)
        field_y = np.zeros_like(field_x)
        for i in range(self.n_pulses):
            for p in self.pulses:
                field_x = field_x + p.polar_x * p.get_total(t - self.delta_t * i - self.t_shift)
                field_y = field_y + p.polar_y * p.get_total(t - self.delta_t * i - self.t_shift)
        return field_x, field_y


class CWLaser(Pulse):
    """Continuous-wave drive: constant envelope e0, no switch-on (reference pyaceqd/pulses.py:161)."""

    def __init__(self, e0, e_start=0, polar_x=1, phase=0, polars=None):
        super().__init__(tau=5, e_start=e_start, e0=e0, polar_x=polar_x, polars=polars, phase=phase)

    def get_envelope(self, t):
        return self.e0 * np.ones_like(np.asarray(t, dtype=float))

    def get_integral(self, t):
        # linear-in-time accumulated "area"; only used by adaptive grids
        return self.e0 * np.asarray(t, dtype=float)

    def copy(self):
        return CWLaser(self.e0, self.e_start, self.polar_x, self.phase)


class SmoothRectangle(Pulse):
    """Rectangle with sigmoid switch-on/off of rate 1/alpha_onoff (reference pyaceqd/pulses.py:175)."""

    def __init__(self, tau, e_start, w_gain=0, t0=0, e0=1, phase=0, alpha_onoff=0.1, polar_x=1, polars=None):
        self.alpha_onoff = alpha_onoff
        self.alpha = 1 / alpha_onoff
        super().__init__(tau, e_start, w_gain=w_gain, t0=t0, e0=e0, phase=phase, polar_x=polar_x, polars=polars)

    def get_envelope_f(self):
        return lambda t: self.get_envelope(t)

    def get_envelope(self, t):
        # expit is the overflow-safe sigmoid: 1/((1+e^-a)(1+e^-b)) would
        # overflow in exp for t far outside the rectangle (benign but noisy)
        from scipy.special import expit
        return (self.e0
                * expit(self.alpha * (t + self.tau / 2 - self.t0))
                * expit(self.alpha * (-t + self.tau / 2 + self.t0)))

    def copy(self):
        return SmoothRectangle(self.tau, self.e_start, self.w_gain, self.t0, self.e0, self.phase, self.alpha_onoff, self.polar_x)
