"""Pulse shaping on an FFT grid: dual time/frequency representation with a
rotating-frame central wavelength, builder functions, a spectral/temporal
filter stack, and lab-device emulations (pulse shaper slit, 128-pixel SLM).

API parity with /root/reference/pyaceqd/pulsegenerator.py; implementations are
original and vectorized (e.g. the Wigner map is one outer-product + FFT-grid
integral instead of an O(n^2) quadrature loop, SLM pixel averaging is a
segment reduction).  Times in ps, frequencies in THz (negative sign
convention for the rotating frame), energies in meV, wavelengths in nm.
"""

import copy
import math
import pickle

import numpy as np
from scipy import integrate, interpolate
from scipy.signal import savgol_filter
from scipy.special import erf

import pyaceqd_tpu.pulses as pulses
from pyaceqd_tpu.tools import export_csv

hbar = 0.6582173  # meV*ps (value used by the reference shaping module)
C_NM_PS = 299792.458


class PulseGenerator:
    def __init__(self, t0, tend=100, dt=0.5, central_wavelength=800,
                 calibration_file=None, f0=None, fend=None, fN=1024, unit='nm'):
        """Grid setup (reference pulsegenerator.py:18-64): either a time grid
        (t0, tend, dt) or a frequency window (f0, fend, fN)."""
        self.calibration_file = calibration_file
        if calibration_file is None:
            self.central_wavelength = central_wavelength
        else:
            self._read_calibration_file(calibration_file)

        self.t0 = t0
        if f0 is not None and fend is not None:
            f0 = self._Units(f0, unit)
            fend = self._Units(fend, unit)
            self.dt = np.abs(1 / (fend - f0))
            self.tend = fN * self.dt + self.t0
        else:
            self.tend = tend
            self.dt = dt

        self.time = np.arange(self.t0, self.tend + self.dt, self.dt)
        # negative sign: rotating-frame convention
        self.frequencies = -np.fft.fftshift(np.fft.fftfreq(len(self.time), d=self.dt))
        self.df = np.abs(self.frequencies[0] - self.frequencies[1])
        self.angular_frequencies = 2 * np.pi * self.frequencies
        self.energies = 2 * np.pi * hbar * self.frequencies
        self.central_frequency = C_NM_PS / self.central_wavelength
        self.central_energy = C_NM_PS / self.central_wavelength * hbar * 2 * np.pi
        self.wavelengths = C_NM_PS / (self.central_frequency + self.frequencies)

        self.temporal_representation_x = np.zeros_like(self.time, dtype=complex)
        self.temporal_representation_y = np.zeros_like(self.time, dtype=complex)
        self.frequency_representation_x = np.zeros_like(self.time, dtype=complex)
        self.frequency_representation_y = np.zeros_like(self.time, dtype=complex)

        self.frequency_filter_x = np.zeros_like(self.time, dtype=complex)
        self.frequency_filter_y = np.zeros_like(self.time, dtype=complex)
        self.temporal_filter_x = np.ones_like(self.time, dtype=complex)
        self.temporal_filter_y = np.ones_like(self.time, dtype=complex)

        self.pulse_power = 0
        self.action_counter = 0

    # ------------------------------------------------------------------
    # calibration
    # ------------------------------------------------------------------

    def _read_calibration_file(self, calibration_file):
        import configparser
        config = configparser.ConfigParser()
        config.read(calibration_file)
        self.central_wavelength = float(config['EMISSION']['exciton_wavelength'])
        self.biexciton_wavelength = float(config['EMISSION']['biexciton_wavelength'])
        self.dark_wavelength = float(config['EMISSION']['dark_wavelength'])
        self.fss_bright = float(config['SPLITTING']['fss_bright'])
        self.fss_dark = float(config['SPLITTING']['fss_dark'])
        self.lifetime_exciton = float(config['LIFETIMES']['exciton'])
        self.lifetime_biexciton = float(config['LIFETIMES']['biexciton'])
        self.exciton_x_emission = self._Units(self.central_wavelength, 'nm') + self._Units(self.fss_bright * 1e-3 / 2, 'mev')
        self.exciton_y_emission = self._Units(self.central_wavelength, 'nm') - self._Units(self.fss_bright * 1e-3 / 2, 'mev')
        self.biexciton_x_emission = self._Units(self.biexciton_wavelength, 'nm') - self._Units(self.fss_bright * 1e-3 / 2, 'mev')
        self.biexciton_y_emission = self._Units(self.biexciton_wavelength, 'nm') + self._Units(self.fss_bright * 1e-3 / 2, 'mev')
        self.dark_x_emission = self._Units(self.dark_wavelength, 'nm') + self._Units(self.fss_dark * 1e-3 / 2, 'mev')
        self.dark_y_emission = self._Units(self.dark_wavelength, 'nm') - self._Units(self.fss_dark * 1e-3 / 2, 'mev')
        self.tpe_resonance = (self._Units(self.central_wavelength, 'nm')
                              + self._Units(self.biexciton_wavelength, 'nm')) / 2

    def _set_action_counter(self, action_counter):
        self.action_counter = action_counter

    def _add_action_counter(self, n=1):
        self.action_counter += n

    def set_pulse_power(self, power):
        """Rescale the pulse to the given time-integrated power
        (reference pulsegenerator.py:97-104)."""
        if self.pulse_power == 0:
            print('Initial pulse power is 0.')
            return
        self.clear_filter()
        self.add_filter_rectangle(transmission=np.sqrt(power / self.pulse_power),
                                  cap_transmission=False)
        self.apply_frequency_filter()
        self.clear_filter()

    # ------------------------------------------------------------------
    # pulse builders
    # ------------------------------------------------------------------

    def add_gaussian_time(self, width_t, central_f=0, alpha=0, t0=0, area_time=1,
                          polarisation=[1, 0], phase=0, field_or_intesity='field',
                          sig_or_fwhm='sig', unit='Hz'):
        """Gaussian (optionally chirped) pulse defined in time
        (reference pulsegenerator.py:108-125)."""
        central_f = self._Units(central_f, unit)
        width_t = np.abs(self._sig_fwhm(field_or_intesity, sig_or_fwhm, width_t))
        central_e = central_f * hbar * 2 * np.pi
        polar_x, polar_y = self._normalise_polarisation(polarisation)
        pulse = pulses.ChirpedPulse(width_t, central_e, alpha, t0, area_time,
                                    polar_x, phase)
        tot = pulse.get_total(self.time)
        self._add_time(tot * polar_x, tot * polar_y)

    def add_sigmoid_time(self, width_t, central_f, rise_t, start_t, height=1,
                         unit='Hz', polarisation=[1, 0]):
        """Double-sigmoid flat-top pulse in time (reference :127-142)."""
        central_f = self._Units(central_f, unit)
        central_t = start_t + width_t / 2
        sigm = self._sigmoid(self.time, central_t, width_t, rise_t)
        sigm = sigm / np.max(sigm) * height
        sigm = sigm * np.exp(-1j * 2 * np.pi * central_f * (self.time - central_t))
        polar_x, polar_y = self._normalise_polarisation(polarisation)
        self._add_time(sigm * polar_x, sigm * polar_y)

    def add_gaussian_freq(self, width_f, central_f=0, area_time=1,
                          polarisation=[1, 0], field_or_intesity='field',
                          sig_or_fwhm='sig', phase_taylor=[], shift_time=0,
                          unit='Hz'):
        """Gaussian pulse defined in Fourier space with Taylor phases
        (reference :144-161)."""
        central_f = self._Units(central_f, unit)
        width_f = np.abs(self._Units(width_f, unit))
        width_f = self._sig_fwhm(field_or_intesity, sig_or_fwhm, width_f)
        polar_x, polar_y = self._normalise_polarisation(polarisation)
        pulse = (1 / self.dt * area_time
                 * np.exp(-(self.frequencies - central_f) ** 2 / (2 * width_f ** 2))
                 * np.exp(1j * self._Taylor(self.frequencies * 2 * np.pi,
                                            central_f * 2 * np.pi,
                                            coefficients=phase_taylor)))
        pulse = pulse * np.exp(1j * 2 * np.pi * self.frequencies
                               * (shift_time - np.min(self.time)))
        self._add_spectral(pulse * polar_x, pulse * polar_y)

    def add_rectangle_frequ(self, central_f, width_f, hight, phase_taylor=[],
                            polarisation=[1, 0], shift_time=0, unit='Hz'):
        """Rectangular pulse in Fourier space (reference :163-176)."""
        central_f = self._Units(central_f, unit)
        width_f = np.abs(self._Units(width_f, unit))
        polar_x, polar_y = self._normalise_polarisation(polarisation)
        pulse = np.zeros_like(self.frequencies, dtype=complex)
        pulse[np.abs(self.frequencies - central_f) <= width_f / 2] = hight
        pulse *= np.exp(1j * self._Taylor(self.frequencies * 2 * np.pi,
                                          central_f * 2 * np.pi,
                                          coefficients=phase_taylor))
        pulse *= np.exp(1j * 2 * np.pi * self.frequencies
                        * (shift_time - np.min(self.time)))
        self._add_spectral(pulse * polar_x, pulse * polar_y)

    def add_polynom_frequ(self, central_f, poly_f=[], phase_taylor=[],
                          shift_time=0, polarisation=[1, 0], unit='Hz'):
        """Polynomial spectral amplitude (reference :178-196)."""
        poly_f = np.flip(np.array(poly_f))
        if unit.lower()[0] == 'h':
            pulse = np.polyval(poly_f, self.frequencies - central_f).astype(complex)
        elif unit.lower()[0] == 'm':
            pulse = np.polyval(poly_f, self.energies - central_f).astype(complex)
        elif unit.lower()[0] == 'n':
            pulse = np.polyval(poly_f, self.wavelengths - central_f).astype(complex)
        central_f = self._Units(central_f, unit)
        polar_x, polar_y = self._normalise_polarisation(polarisation)
        pulse *= np.exp(1j * self._Taylor(self.frequencies * 2 * np.pi,
                                          central_f * 2 * np.pi,
                                          coefficients=phase_taylor))
        pulse *= np.exp(1j * 2 * np.pi * self.frequencies * shift_time)
        self._add_spectral(pulse * polar_x, pulse * polar_y)

    def add_spectrum_frequ(self, sample_frequ, sample_spectrum, smoothing_level=0,
                           central_f=0, phase_taylor=[], shift_time=None,
                           polarisation=[1, 0], unit='nm', signal_threshhold=0,
                           power=1, plot=False, intensity=True, add_filter=False,
                           merging='+'):
        """Measured spectrum -> pulse (or filter): threshold, optional
        Savitzky-Golay smoothing, cubic interpolation onto the grid
        (reference :198-246)."""
        if unit.lower()[0] != 'n':
            print('currently only nm supported')
            return
        if shift_time is None:
            shift_time = self.tend / 2
        central_f = self._Units(central_f, unit)
        sample_filter1 = np.array(sample_spectrum, dtype=float)
        sample_filter1[sample_filter1 < signal_threshhold] = signal_threshhold
        sample_filter1 = sample_filter1 - signal_threshhold
        if smoothing_level > 0:
            smooth_window = int(len(sample_frequ) * smoothing_level * 0.2)
            sample_filter1 = savgol_filter(sample_filter1, smooth_window, 3)
        sample_filter1[sample_filter1 < 0] = 0
        interpolate_fkt = interpolate.interp1d(
            sample_frequ, sample_filter1, kind='cubic',
            fill_value=(sample_filter1[0], sample_filter1[-1]), bounds_error=False)
        interpolate_spectrum = interpolate_fkt(self.wavelengths)
        if intensity:
            pulse = np.sqrt(np.array(interpolate_spectrum).astype(complex))
        else:
            pulse = np.array(interpolate_spectrum).astype(complex)
        pulse *= np.exp(1j * self._Taylor(self.frequencies * 2 * np.pi,
                                          central_f * 2 * np.pi,
                                          coefficients=phase_taylor))
        pulse *= np.exp(1j * 2 * np.pi * self.frequencies * shift_time)
        polar_x, polar_y = self._normalise_polarisation(polarisation)
        if not add_filter:
            self._add_spectral(pulse * polar_x, pulse * polar_y)
            if power is not None:
                self.set_pulse_power(power)
        else:
            self._add_filter(np.abs(pulse), 'b', merging=merging,
                             cap_transmission=False)

    def convolute_psf(self, width_f, gauss_power=1, sig_or_fwhm='sig',
                      field_or_intesity='field', polarisation='b', unit='Hz'):
        """Convolve the spectral amplitude with a Gaussian point-spread
        function (reference :249-265)."""
        width_f = np.abs(self._Units(width_f, unit))
        width_f = self._sig_fwhm(field_or_intesity, sig_or_fwhm, width_f)
        gauss_power = np.array(gauss_power)
        psf = (np.exp(-0.5 * (self.frequencies / width_f) ** 2)
               * 1 / np.sqrt(2 * np.pi * width_f ** 2) ** gauss_power.astype(complex))
        psf /= np.trapezoid(psf, self.frequencies)
        if polarisation.lower()[0] in 'bx':
            old_angle = np.unwrap(np.angle(self.frequency_representation_x)).real
            self.frequency_representation_x = self._convolve_normalise(
                np.abs(self.frequency_representation_x), np.abs(psf)).astype(complex) / np.abs(self.tend - self.t0)
            self.frequency_representation_x *= np.exp(1j * old_angle)
        if polarisation.lower()[0] in 'by':
            old_angle = np.angle(self.frequency_representation_y).real
            self.frequency_representation_y = self._convolve_normalise(
                np.abs(self.frequency_representation_y), np.abs(psf)).astype(complex) / np.abs(self.tend - self.t0)
            self.frequency_representation_y *= np.exp(1j * old_angle)
        self.temporal_representation_x = np.fft.ifft(np.fft.ifftshift(self.frequency_representation_x))
        self.temporal_representation_y = np.fft.ifft(np.fft.ifftshift(self.frequency_representation_y))

    def convolute_psf_filter(self, width_f, gauss_power=1, sig_or_fwhm='sig',
                             field_or_intesity='field', polarisation='b',
                             unit='Hz'):
        """Convolve the FILTER with a Gaussian PSF (reference :267-281)."""
        width_f = np.abs(self._Units(width_f, unit))
        width_f = self._sig_fwhm(field_or_intesity, sig_or_fwhm, width_f)
        gauss_power = np.array(gauss_power)
        psf = (np.exp(-0.5 * (self.frequencies / width_f) ** 2)
               * 1 / np.sqrt(2 * np.pi * width_f ** 2) ** gauss_power.astype(complex))
        psf /= np.trapezoid(psf, self.frequencies)
        if polarisation.lower()[0] in 'bx':
            old_angle = np.unwrap(np.angle(self.frequency_filter_x)).real
            self.frequency_filter_x = self._convolve_normalise(
                np.abs(self.frequency_filter_x), np.abs(psf)).astype(complex)
            self.frequency_filter_x *= np.exp(1j * old_angle)
        if polarisation.lower()[0] in 'by':
            old_angle = np.angle(self.frequency_filter_y).real
            self.frequency_filter_y = self._convolve_normalise(
                np.abs(self.frequency_filter_y), np.abs(psf)).astype(complex)
            self.frequency_filter_y *= np.exp(1j * old_angle)

    def _add_time(self, pulse_x_time, pulse_y_time):
        self.temporal_representation_x += pulse_x_time
        self.temporal_representation_y += pulse_y_time
        self.frequency_representation_x += np.fft.fftshift(np.fft.fft(pulse_x_time))
        self.frequency_representation_y += np.fft.fftshift(np.fft.fft(pulse_y_time))
        self._update_pulse_power()
        self._add_action_counter()

    def _add_spectral(self, pulse_x_freq, pulse_y_freq):
        self.frequency_representation_x += pulse_x_freq
        self.frequency_representation_y += pulse_y_freq
        self.temporal_representation_x += np.fft.ifft(np.fft.ifftshift(pulse_x_freq))
        self.temporal_representation_y += np.fft.ifft(np.fft.ifftshift(pulse_y_freq))
        self._update_pulse_power()
        self._add_action_counter()

    def _update_pulse_power(self):
        self.pulse_power = np.trapezoid(
            np.abs(self.temporal_representation_x) ** 2
            + np.abs(self.temporal_representation_y) ** 2, np.real(self.time))

    # ------------------------------------------------------------------
    # filters
    # ------------------------------------------------------------------

    def add_filter_rectangle(self, central_f=None, width_f=None, transmission=1,
                             cap_transmission=True, polarisation='b',
                             invert=False, merging='+', unit='Hz'):
        """(reference :316-332)"""
        if central_f is None:
            filt = np.ones_like(self.frequencies, dtype=complex) * transmission
        else:
            central_f = self._Units(central_f, unit)
            width_f = np.abs(self._Units(width_f, unit))
            filt = np.zeros_like(self.frequencies, dtype=complex)
            filt[np.abs(self.frequencies - central_f) <= width_f / 2] = transmission
            if invert:
                filt = 1 - filt
        self._add_filter(filt, polarisation, merging=merging,
                         cap_transmission=cap_transmission)

    def add_filter_gaussian(self, central_f, width_f, transmission=1,
                            super_gauss=1, polarisation='b', field_int='field',
                            sig_fwhm='sig', invert=False, merging='+', unit='Hz',
                            phase=False):
        """(Super-)Gaussian filter, optionally as a phase mask (reference :334-351)."""
        central_f = self._Units(central_f, unit)
        width_f = np.abs(self._Units(width_f, unit))
        tau = self._sig_fwhm(field_int, sig_fwhm, width_f)
        gauss = np.exp(-((self.frequencies - central_f) ** 2
                         / (2 * tau ** 2)) ** super_gauss) * transmission
        if invert:
            gauss = 1 - gauss
        if phase:
            apply_phase = np.exp(1j * gauss * np.pi * 2. * transmission)
            self._add_filter(apply_phase, polarisation, merging='*')
        else:
            self._add_filter(gauss, polarisation, merging=merging)

    def add_filter_make_square(self, T=1, pol='x'):
        """Phase mask flattening the instantaneous spectrum into a square
        (reference :353-373)."""
        frequ = self.frequencies * 2 * np.pi
        for p, spec in (('x', self.frequency_representation_x),
                        ('y', self.frequency_representation_y)):
            if pol.lower()[0] not in ('b', p):
                continue
            s = np.abs(spec ** 2)
            s_norm = s / integrate.trapezoid(np.abs(s), frequ)
            s_cum = T * integrate.cumulative_trapezoid(s_norm, frequ, initial=0)
            s_cc = integrate.cumulative_trapezoid(s_cum - T / 2, frequ, initial=0)
            self._add_filter(np.exp(1j * s_cc), pol=p, merging='*')

    def add_filter_sigmoid(self, central_f, width_f, rise_f, transmission=1,
                           polarisation='b', invert=False, merging='+',
                           unit='Hz'):
        """Double-sigmoid bandpass (reference :375-385)."""
        central_f = self._Units(central_f, unit)
        width_f = np.abs(self._Units(width_f, unit))
        rise_f = np.abs(self._Units(rise_f, unit))
        sigm = self._sigmoid(self.frequencies, central_f, width_f, rise_f)
        sigm = sigm / np.max(sigm) * transmission
        if invert:
            sigm = 1 - sigm
        self._add_filter(sigm, polarisation, merging)

    def add_filter_double_erf(self, central_f, width_f, rise_f, transmission=None,
                              polarisation='b', invert=False, merging='+',
                              unit='Hz', cap_transmission=True, field_int='int',
                              sig_fwhm='fwhm'):
        """Double-error-function bandpass (step convolved with a Gaussian;
        reference :387-405)."""
        central_f = self._Units(central_f, unit)
        width_f = np.abs(self._Units(width_f, unit))
        rise_f = np.abs(self._Units(rise_f, unit))
        rise_f = self._sig_fwhm(field_int, sig_fwhm, rise_f)
        filt = 0.5 * (1 + erf((self.frequencies - central_f + width_f / 2)
                              / (rise_f * np.sqrt(2))))
        filt -= 0.5 * (1 + erf((self.frequencies - central_f - width_f / 2)
                               / (rise_f * np.sqrt(2))))
        if transmission is not None:
            filt = filt / np.max(filt) * transmission
        if invert:
            filt = 1 - filt
        self._add_filter(filt, polarisation, merging,
                         cap_transmission=cap_transmission)

    def add_phase_filter(self, central_f=0, phase_taylor=[], polarisation='b',
                         unit='Hz', f_start=None, f_end=None):
        """Taylor-expanded spectral phase (reference :407-430)."""
        f_start = np.min(self.frequencies) if f_start is None else self._Units(f_start, unit)
        f_end = np.max(self.frequencies) if f_end is None else self._Units(f_end, unit)
        central_f = self._Units(central_f, unit)
        phase = self._Taylor(self.frequencies * 2 * np.pi, central_f * 2 * np.pi,
                             coefficients=phase_taylor)
        phase[self.frequencies < f_start] = 0
        phase[self.frequencies > f_end] = 0
        self._add_filter(np.exp(1j * phase), pol=polarisation, merging='*')

    def add_phase_wedge(self, time_shift, central_f=0, shift_time=True,
                        polarisation='b', unit='Hz', kind='double'):
        """Linear spectral phase (time shift), one- or two-sided
        (reference :434-457)."""
        central_f = self._Units(central_f, unit)
        if shift_time:
            time_shift = 2 * np.pi * time_shift
        else:
            time_shift = self._Units(time_shift, unit)
        if unit == 'nm':
            time_shift *= -1
        if kind.lower()[0] == 'd':
            wedge = np.exp(1j * time_shift * np.abs(self.frequencies - central_f))
        elif kind.lower()[0] == 'r':
            pv = np.where(self.frequencies >= central_f,
                          np.abs(self.frequencies - central_f), 0.0)
            wedge = np.exp(1j * time_shift * pv)
        else:
            pv = np.where(self.frequencies <= central_f,
                          np.abs(self.frequencies - central_f), 0.0)
            wedge = np.exp(1j * time_shift * pv)
        self._add_filter(wedge, pol=polarisation, merging='*')

    def add_phase_taylor_time(self, central_t=0, phase_taylor=[],
                              polarisation='b', t_start=None, t_end=None):
        """Temporal Taylor phase (reference :460-473)."""
        t_start = np.min(self.time) if t_start is None else t_start
        t_end = np.max(self.time) if t_end is None else t_end
        phase = self._Taylor(self.time, central_t, coefficients=phase_taylor)
        phase[self.time < t_start] = 0
        phase[self.time > t_end] = 0
        self._add_filter_time(np.exp(1j * phase), pol=polarisation, merging='*')

    def add_phase_cos_time(self, frequency, amplitude, central_t=0,
                           phase_offset=0, unit='THz', t_start=None, t_end=None):
        """Sinusoidal temporal phase (reference :475-496)."""
        t_start = np.min(self.time) if t_start is None else t_start
        t_end = np.max(self.time) if t_end is None else t_end
        if unit.lower()[0] == 'm':
            frequency = frequency * 1e-6
        elif unit.lower()[0] == 'g':
            frequency = frequency * 1e-3
        phase = np.cos(2 * np.pi * frequency * (self.time - central_t)
                       + phase_offset) * amplitude
        phase[self.time < t_start] = 0
        phase[self.time > t_end] = 0
        self._add_filter_time(np.exp(1j * phase), pol='b', merging='*')

    def set_rotating_frame(self, new_rf=None, unit='nm'):
        """Re-reference the grid to a new central wavelength (reference :498-515)."""
        if isinstance(new_rf, str):
            self._read_calibration_file(new_rf)
        else:
            new_rf = self._Units(new_rf, unit)
            self.central_wavelength = self._Units_inverse(new_rf, 'nm')
        new_central_frequency = C_NM_PS / self.central_wavelength
        self.central_energy = C_NM_PS / self.central_wavelength * hbar * 2 * np.pi
        shift = np.exp(-1j * 2 * np.pi
                       * (self.central_frequency - new_central_frequency) * self.time)
        self.temporal_representation_x *= shift
        self.temporal_representation_y *= shift
        self.frequency_representation_x = np.fft.fftshift(np.fft.fft(self.temporal_representation_x))
        self.frequency_representation_y = np.fft.fftshift(np.fft.fft(self.temporal_representation_y))
        self.central_frequency = new_central_frequency
        self.wavelengths = C_NM_PS / (self.central_frequency + self.frequencies)

    def apply_frequency_filter(self, pol='b'):
        """Multiply the filter into the pulse spectrum (reference :518-528)."""
        if pol.lower()[0] in 'bx' and np.any(self.frequency_representation_x != 0):
            self.frequency_representation_x *= self.frequency_filter_x
            self.temporal_representation_x = np.fft.ifft(np.fft.ifftshift(self.frequency_representation_x))
        if pol.lower()[0] in 'by' and np.any(self.frequency_representation_y != 0):
            self.frequency_representation_y *= self.frequency_filter_y
            self.temporal_representation_y = np.fft.ifft(np.fft.ifftshift(self.frequency_representation_y))
        self._update_pulse_power()
        self._add_action_counter()

    def apply_temporal_filter(self, pol='b'):
        """(reference :530-539)"""
        if pol.lower()[0] in 'bx' and np.any(self.temporal_representation_x != 0):
            self.temporal_representation_x *= self.temporal_filter_x
            self.frequency_representation_x = np.fft.fftshift(np.fft.fft(self.temporal_representation_x))
        if pol.lower()[0] in 'by' and np.any(self.temporal_representation_y != 0):
            self.temporal_representation_y *= self.temporal_filter_y
            self.frequency_representation_y = np.fft.fftshift(np.fft.fft(self.temporal_representation_y))
        self._update_pulse_power()
        self._add_action_counter()

    def _merge(self, current, filt, merging):
        if merging == '+':
            return current + filt
        if merging == '*':
            return current * filt
        if merging.lower()[0] == 'm':
            return np.maximum(np.real(current), np.real(filt)).astype(complex)
        raise ValueError("merging must be '+', '*' or 'm'")

    def _add_filter(self, filt, pol='both', merging='+', cap_transmission=True):
        if pol.lower()[0] in 'bx':
            self.frequency_filter_x = self._merge(self.frequency_filter_x, filt, merging)
        if pol.lower()[0] in 'by':
            self.frequency_filter_y = self._merge(self.frequency_filter_y, filt, merging)
        if cap_transmission:
            self.frequency_filter_x[np.abs(self.frequency_filter_x) > 1] = 1
            self.frequency_filter_y[np.abs(self.frequency_filter_y) > 1] = 1

    def _add_filter_time(self, filt, pol='both', merging='+', cap_transmission=True):
        if pol.lower()[0] in 'bx':
            self.temporal_filter_x = self._merge(self.temporal_filter_x, filt, merging)
        if pol.lower()[0] in 'by':
            self.temporal_filter_y = self._merge(self.temporal_filter_y, filt, merging)
        if cap_transmission:
            self.temporal_filter_x[np.abs(self.temporal_filter_x) > 1] = 1
            self.temporal_filter_y[np.abs(self.temporal_filter_y) > 1] = 1

    # ------------------------------------------------------------------
    # lab devices
    # ------------------------------------------------------------------

    def apply_pulse_shaper(self, slit_position_f, transmission=1,
                           slit_width_f=None, slit_rise_f=None, min_f=None,
                           max_f=None, calibration_file=None, pol='b', unit='Hz'):
        """Slit pulse shaper = sigmoid bandpass applied immediately
        (reference :593-614)."""
        slit_width_f = self._Units(slit_width_f, unit)
        slit_rise_f = self._Units(slit_rise_f, unit)
        slit_position_f = self._Units(slit_position_f, unit)
        for p in 'xy':
            if pol.lower()[0] in ('b', p):
                self.add_filter_sigmoid(central_f=slit_position_f,
                                        width_f=slit_width_f, rise_f=slit_rise_f,
                                        polarisation=p, transmission=transmission,
                                        unit='Hz')
                self.apply_frequency_filter(pol=p)

    def apply_SLM(self, pixelwidth=None, pixel_center=0, N_pixel=128, unit='Hz',
                  kind='rectangle', polarisation='both', SLM='amp',
                  generate_mask=False, save_dir='', mask_name='mask_output',
                  suffix=0, psf_width=None, psf_sig_fwhm='fwhm',
                  calibration_file=None, orientation='rising',
                  pixel_transmission_mask=None, pixel_binning=1):
        """Discretize the spectral filter into SLM pixels: amplitude ('amp'),
        phase ('phase') or both ('ap') averaging per pixel, optional PSF
        smoothing and driving-mask export (reference :617-775)."""
        if np.mod(N_pixel, pixel_binning) != 0:
            print('N_pixel / pixel_binning is no integer! No binning applied.')
            pixel_binning = 1
        else:
            N_pixel = int(N_pixel / pixel_binning)
        if calibration_file is not None:
            pixel_center, pixelwidth = self._calibrate_SLM(calibration_file)
            pixel_center = self._Units(pixel_center, 'nm')
            pixelwidth = abs(self._Units(pixelwidth, 'nm')) * pixel_binning
        else:
            pixel_center = self._Units(pixel_center, unit)
            pixelwidth = abs(self._Units(pixelwidth, unit)) * pixel_binning
        if pixel_transmission_mask is not None and len(pixel_transmission_mask) != N_pixel:
            print('Mask file does not agree with pixel number!')
            return

        start_f = pixel_center - N_pixel / 2 * pixelwidth
        end_f = pixel_center + N_pixel / 2 * pixelwidth
        pol0 = polarisation.lower()[0]

        trans = {'x': [], 'y': []}
        phases = {'x': [], 'y': []}
        filters = {'x': self.frequency_filter_x, 'y': self.frequency_filter_y}
        for p in 'xy':
            if pol0 in ('b', p):
                filters[p][self.frequencies < start_f] = 0
                filters[p][self.frequencies >= end_f] = 0
        for i in range(N_pixel):
            sel = ((self.frequencies >= start_f + i * pixelwidth)
                   & (self.frequencies < start_f + (i + 1) * pixelwidth))
            for p in 'xy':
                if pol0 not in ('b', p):
                    continue
                cur = (filters[p][sel] if pixel_transmission_mask is None
                       else np.asarray(pixel_transmission_mask)[N_pixel - 1 - i])
                if np.size(cur) == 0:
                    trans[p].append(0.0)
                    phases[p].append(0.0)
                    continue
                mean_amp = np.mean(np.abs(cur))
                mean_ph = np.mean(np.angle(cur))
                if SLM.lower() == 'ap':
                    filters[p][sel] = mean_amp * np.exp(1j * mean_ph)
                    trans[p].append(mean_amp)
                    phases[p].append(mean_ph)
                elif SLM.lower()[0] == 'p':
                    filters[p][sel] = np.abs(cur) * np.exp(1j * mean_ph)
                    trans[p].append(1)
                    phases[p].append(mean_ph)
                else:  # amplitude SLM
                    filters[p][sel] = mean_amp * np.exp(1j * np.angle(cur))
                    trans[p].append(mean_amp)
                    phases[p].append(0)
        if orientation.lower()[0] == 'r':
            for p in 'xy':
                trans[p] = np.flipud(np.array(trans[p]))
                phases[p] = np.flipud(np.array(phases[p]))
        else:
            for p in 'xy':
                trans[p] = np.array(trans[p])
                phases[p] = np.array(phases[p])

        if kind.lower()[0] == 'p':  # pixel PSF smoothing
            if psf_width is None:
                psf_width = pixelwidth * 0.25
            else:
                psf_width = self._sig_fwhm(field_int='field', sig_fwhm=psf_sig_fwhm,
                                           width=psf_width)
                psf_width = self._Units(psf_width, unit=unit)
            psf = (np.exp(-0.5 * (self.frequencies / psf_width) ** 2)
                   / np.sqrt(2 * np.pi * psf_width ** 2))
            for p in 'xy':
                if pol0 not in ('b', p):
                    continue
                F = filters[p]
                if SLM.lower() == 'ap':
                    filters[p] = (self._convolve_normalise(np.abs(F), np.abs(psf))
                                  * np.exp(1j * self._convolve_normalise(np.angle(F), np.abs(psf))))
                elif SLM.lower()[0] == 'p':
                    filters[p] = np.abs(F) * np.exp(
                        1j * self._convolve_normalise(np.angle(F), np.abs(psf)))
                else:
                    filters[p] = (self._convolve_normalise(np.abs(F), np.abs(psf))
                                  * np.exp(1j * np.angle(F)))
        self.frequency_filter_x = filters['x']
        self.frequency_filter_y = filters['y']

        if generate_mask:
            names = []
            for label, data in [('_trans_x', trans['x']), ('_trans_y', trans['y']),
                                ('_phase_x', phases['x']), ('_phase_y', phases['y'])]:
                fname = save_dir + mask_name + str(suffix) + label + '.txt'
                with open(fname, 'w') as fh:
                    for line in list(np.atleast_1d(data)):
                        fh.write(str(line) + '\n')
                names.append(fname)
            return tuple(names)

    def _calibrate_SLM(self, calib_file):
        from scipy.io import loadmat
        container = loadmat(calib_file)
        center_pixel = float(container['slm_calibration']['center_pixel'][0, 0])
        pixel_width = float(container['slm_calibration']['pixel_width'][0, 0])
        return center_pixel, pixel_width

    # ------------------------------------------------------------------
    # unit helpers
    # ------------------------------------------------------------------

    def _Units(self, input, unit='Hz'):
        """nm / meV -> THz (reference :787-802)."""
        if input is None:
            return None
        if unit.lower()[0] == 'm':
            return input / (2 * np.pi * hbar)
        if unit.lower()[0] == 'n':
            central_f = C_NM_PS / self.central_wavelength
            if np.abs(input - self.central_wavelength) < np.abs(input):
                input = input - self.central_wavelength
            input_f = C_NM_PS / (self.central_wavelength + input)
            return -(central_f - input_f)
        return input

    def _Units_inverse(self, input, unit='Hz'):
        """THz -> nm / meV (reference :804-814)."""
        if unit.lower()[0] == 'm':
            return input * (2 * np.pi * hbar)
        if unit.lower()[0] == 'n':
            central_f = C_NM_PS / self.central_wavelength
            return C_NM_PS / (central_f + input)
        return input

    def _Taylor(self, frequency, frequency_0=0, coefficients=[]):
        phase = np.zeros_like(frequency)
        for n, coeff in enumerate(coefficients):
            phase = phase + coeff / math.factorial(n) * (frequency - frequency_0) ** n
        return phase

    def _sig_fwhm(self, field_int, sig_fwhm, width):
        if field_int.lower()[0] == 'f':
            return width if sig_fwhm.lower()[0] == 's' else width / (2 * np.sqrt(np.log(2) * 2))
        return np.sqrt(2) * width if sig_fwhm.lower()[0] == 's' else width / (2 * np.sqrt(np.log(2)))

    def _sigmoid(self, x, center, width, rise):
        c1 = center - width / 2
        c2 = center + width / 2
        return 1 / (1 + np.exp(-(x - c1) / rise)) / (1 + np.exp(-(c2 - x) / rise))

    def _fft_convolve(self, a, b):
        return np.fft.ifft(np.fft.fft(a) * np.fft.fft(b))

    def _convolve_normalise(self, orig, psf):
        orig_height = np.max(orig)
        conv = np.convolve(orig, psf, mode='same')
        m = np.max(conv)
        if m == 0:
            return conv
        return conv / m * orig_height

    def _normalise_polarisation(self, pol):
        pol = np.array(pol, dtype=complex)
        norm = np.sqrt(np.abs(pol[0] ** 2) + np.abs(pol[1] ** 2))
        return pol[0] / norm, pol[1] / norm

    # ------------------------------------------------------------------
    # plotting / analysis
    # ------------------------------------------------------------------

    def _plot_domain_for(self, domain):
        if domain == 'meV':
            return self.energies, 'meV'
        if domain == 'nm':
            return self.wavelengths, 'nm'
        return self.frequencies, 'THz'

    def plot_filter(self, t_0=None, t_end=None, frequ_0=None, frequ_end=None,
                    plot_pol='both', domain='Hz', save=False, save_name='fig',
                    save_dir='', plot_phase=True):
        """(reference :871-925)"""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        x, label = self._plot_domain_for(domain)
        fig, ax = plt.subplots()
        ax2 = ax.twinx()
        for p, F, c in (('x', self.frequency_filter_x, 'b-'),
                        ('y', self.frequency_filter_y, 'r-')):
            if plot_pol.lower()[0] in ('b', p):
                ax.plot(x, np.abs(F), c, label="T_" + p)
                if plot_phase:
                    ph = np.where(np.abs(F) > 1e-3, np.angle(F), np.nan)
                    ax2.plot(x, ph / np.pi)
        if frequ_0 is not None or frequ_end is not None:
            ax.set_xlim([frequ_0, frequ_end])
        ax.set_xlabel(label); ax.grid(); ax.legend()
        ax.set_ylabel('Transmission'); ax2.set_ylabel('Phase / pi')
        ax.set_title('Filter frequency')
        if save:
            fig.savefig(save_dir + save_name + '_frequ_filter.png')
        plt.close(fig)

    def plot_filter_time(self, t_0=None, t_end=None, plot_pol='both', save=False,
                         save_name='temp_filter', save_dir=''):
        """(reference :927-951)"""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        ax2 = ax.twinx()
        for p, F, c in (('x', self.temporal_filter_x, 'b-'),
                        ('y', self.temporal_filter_y, 'r-')):
            if plot_pol.lower()[0] in ('b', p):
                ax.plot(self.time, np.abs(F), c, label="T_" + p)
                ax2.plot(self.time, np.angle(F) / np.pi)
        ax.set_xlabel('time / ps'); ax.grid(); ax.legend()
        ax.set_ylabel('Transmission'); ax2.set_ylabel('Phase / pi')
        if save:
            fig.savefig(save_dir + save_name + '_time_filter.png')
        plt.close(fig)

    def plot_pulses(self, t_0=None, t_end=None, frequ_0=None, frequ_end=None,
                    plot_pol='both', plot_phase=False, phase_time_shift=0,
                    domain='Hz', save=False, save_name='fig_', save_dir='',
                    sim_input=None, sim_label=[], plot_frequ_intensity=False,
                    plot_emission=False):
        """(reference :954-1066)"""
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        x, label = self._plot_domain_for(domain)
        fig_t, ax_t = plt.subplots()
        for p, T, c in (('x', self.temporal_representation_x, 'b'),
                        ('y', self.temporal_representation_y, 'r')):
            if plot_pol.lower()[0] in ('b', p):
                ax_t.plot(self.time, np.abs(T), c + '-', label=p + "_envel")
                ax_t.plot(self.time, np.real(T), c + ':', label=p + "_field")
        if t_0 is not None or t_end is not None:
            ax_t.set_xlim([t_0, t_end])
        ax_t.set_xlabel('time / ps'); ax_t.set_ylabel('Pulse'); ax_t.legend()
        if save:
            fig_t.savefig(save_dir + save_name + "_time.png")
        plt.close(fig_t)
        fig, ax = plt.subplots()
        for p, F, c in (('x', self.frequency_representation_x, 'b-'),
                        ('y', self.frequency_representation_y, 'r-')):
            if plot_pol.lower()[0] in ('b', p):
                v = np.abs(F) ** 2 if plot_frequ_intensity else np.abs(F)
                ax.plot(x, v, c, label=p + "_envel")
        if frequ_0 is not None or frequ_end is not None:
            ax.set_xlim([frequ_0, frequ_end])
        ax.set_xlabel(label); ax.grid(); ax.legend()
        if save:
            fig.savefig(save_dir + save_name + '_frequ.png')
        plt.close(fig)

    def wigner_plot(self, time_0=None, time_end=None, frequ_0=None,
                    frequ_end=None, plot=False):
        """Wigner maps W(t, f) of both polarizations, computed as a vectorized
        outer-lag product + trapezoid over the lag axis (the reference's
        O(n^2) double quadrature loop, pulsegenerator.py:1068-1112, done in
        one shot).  Returns (wigner_x, wigner_y) and stores them."""
        t = self.time
        n = len(t)
        lags = t - t[len(t) // 2]

        def wigner(field_vals):
            f = interpolate.interp1d(t, field_vals, kind='linear', fill_value=0,
                                     bounds_error=False)
            # W[i, j] = int dtau f(t_i + tau/2) f*(t_i - tau/2) e^{i 2 pi f_j tau}
            tp = t[:, None] + lags[None, :] / 2
            tm = t[:, None] - lags[None, :] / 2
            prod = f(tp) * np.conj(f(tm))  # (n_t, n_lag)
            phase = np.exp(1j * 2 * np.pi * np.outer(lags, self.frequencies))
            return np.trapezoid(prod[:, :, None] * phase[None, :, :], lags, axis=1)

        self.wigner_x = wigner(self.temporal_representation_x)
        self.wigner_y = wigner(self.temporal_representation_y)
        if plot:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            for name, W in (('x', self.wigner_x), ('y', self.wigner_y)):
                plt.figure()
                plt.pcolormesh(self.frequencies, self.time, np.real(W))
                plt.colorbar()
                plt.title('Wigner function ' + name)
                plt.xlabel('frequency / THz'); plt.ylabel('time / ps')
                plt.savefig('wigner_' + name + '.png')
                plt.close()
        return self.wigner_x, self.wigner_y

    # ------------------------------------------------------------------
    # export / interop
    # ------------------------------------------------------------------

    def generate_pulsefiles(self, temp_dir='', file_name='pulse_time', suffix='',
                            abs_only=False, precision=8):
        """Write ACE-format pulse files (t re im) for the engine
        (reference :1126-1137)."""
        pulse_file_x = temp_dir + file_name + str(suffix) + '_x.dat'
        pulse_file_y = temp_dir + file_name + str(suffix) + '_y.dat'
        if abs_only:
            export_csv(pulse_file_x, self.time, np.abs(self.temporal_representation_x),
                       np.zeros_like(self.time, dtype=float), precision=precision, delimit=' ')
            export_csv(pulse_file_y, self.time, np.abs(self.temporal_representation_y),
                       np.zeros_like(self.time, dtype=float), precision=precision, delimit=' ')
            return pulse_file_x, pulse_file_y
        export_csv(pulse_file_x, self.time, np.real(self.temporal_representation_x),
                   np.imag(self.temporal_representation_x), precision=precision, delimit=' ')
        export_csv(pulse_file_y, self.time, np.real(self.temporal_representation_y),
                   np.imag(self.temporal_representation_y), precision=precision, delimit=' ')
        return pulse_file_x, pulse_file_y

    def get_pulse_tuples(self):
        """In-memory pulse sources for the engine (no files): pass as
        pulse_file_x / pulse_file_y to simulate()."""
        return ((self.time, self.temporal_representation_x),
                (self.time, self.temporal_representation_y))

    def get_temporal_representation(self, abs_only=False):
        if abs_only:
            return self.time, np.abs(self.temporal_representation_x), np.abs(self.temporal_representation_y)
        return self.time, self.temporal_representation_x, self.temporal_representation_y

    def generate_phase_difference(self, temp_dir='', file_name='phase_diff',
                                  suffix=''):
        """Instantaneous-frequency files (reference :1144-1155)."""
        phase_file_x = temp_dir + file_name + str(suffix) + '_x.dat'
        phase_file_y = temp_dir + file_name + str(suffix) + '_y.dat'
        gx = -np.gradient(np.unwrap(np.angle(self.temporal_representation_x)), self.time)
        gy = -np.gradient(np.unwrap(np.angle(self.temporal_representation_y)), self.time)
        export_csv(phase_file_x, self.time, np.real(gx), np.imag(gx), precision=8, delimit=' ')
        export_csv(phase_file_y, self.time, np.real(gy), np.imag(gy), precision=8, delimit=' ')
        return phase_file_x, phase_file_y

    def generate_field_functions(self, interpolation='linear'):
        """(reference :1157-1166)"""
        field_x = interpolate.interp1d(self.time, self.temporal_representation_x,
                                       kind=interpolation, fill_value=0, bounds_error=False)
        field_y = interpolate.interp1d(self.time, self.temporal_representation_y,
                                       kind=interpolation, fill_value=0, bounds_error=False)
        return field_x, field_y

    def generate_field_functions_lab_frame(self):
        """(reference :1168-1177)"""
        field_rf_x, field_rf_y = self.generate_field_functions()

        def field_function_x(t):
            return field_rf_x(t) * np.exp(-1j * 2 * np.pi * self.central_frequency * t)

        def field_function_y(t):
            return field_rf_y(t) * np.exp(-1j * 2 * np.pi * self.central_frequency * t)

        return field_function_x, field_function_y

    def merge_pulses(self, input_pulse):
        """Add another PulseGenerator's pulse onto this grid (reference :1179-1199)."""
        other_pulse = input_pulse.copy_pulse()
        if other_pulse.central_wavelength != self.central_wavelength:
            print('Caution MERGING: Central wavelength of pulses do not agree!')
            other_pulse.set_rotating_frame(self.central_wavelength)
        if other_pulse.dt != self.dt:
            print('CAUTION MERGING: Time steps of pulses do not agree!')

        def interp(vals):
            re = interpolate.interp1d(other_pulse.time, np.real(vals), kind='cubic',
                                      fill_value=0, bounds_error=False)
            im = interpolate.interp1d(other_pulse.time, np.imag(vals), kind='cubic',
                                      fill_value=0, bounds_error=False)
            return re(self.time) + 1j * im(self.time)

        self._add_time(interp(other_pulse.temporal_representation_x),
                       interp(other_pulse.temporal_representation_y))

    # ------------------------------------------------------------------
    # clear / save
    # ------------------------------------------------------------------

    def clear_all(self):
        self.clear_filter()
        self.clear_pulses()
        self._set_action_counter(0)

    def clear_filter(self):
        self.frequency_filter_x = np.zeros_like(self.time, dtype=complex)
        self.frequency_filter_y = np.zeros_like(self.time, dtype=complex)
        self.temporal_filter_x = np.ones_like(self.time, dtype=complex)
        self.temporal_filter_y = np.ones_like(self.time, dtype=complex)

    def clear_pulses(self):
        self.temporal_representation_x = np.zeros_like(self.time, dtype=complex)
        self.temporal_representation_y = np.zeros_like(self.time, dtype=complex)
        self.frequency_representation_x = np.zeros_like(self.time, dtype=complex)
        self.frequency_representation_y = np.zeros_like(self.time, dtype=complex)

    def save_pulse(self, save_name='pulse', save_dir='', suffix=''):
        save_str = save_dir + save_name + str(suffix) + '.pulse'
        with open(save_str, "wb") as f:
            pickle.dump(self, f)
        return save_str

    def copy_pulse(self):
        return copy.deepcopy(self)


def load_pulse(file_name):
    """Unpickle a saved PulseGenerator (reference :1231-1237)."""
    if file_name[-6:] != '.pulse':
        print('ERROR: File is not supported!')
        return
    with open(file_name, "rb") as f:
        return pickle.load(f)
