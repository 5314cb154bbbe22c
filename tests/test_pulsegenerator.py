"""PulseGenerator: grid conventions, builders, filters, SLM, units, interop
with the engine (reference pulsegenerator.py behavior)."""

import numpy as np
import pytest

from pyaceqd_tpu.pulsegenerator import PulseGenerator, load_pulse, hbar


def make_pg(**kw):
    kw.setdefault("t0", 0)
    kw.setdefault("tend", 100)
    kw.setdefault("dt", 0.05)
    kw.setdefault("central_wavelength", 800)
    return PulseGenerator(**kw)


def test_grid_conventions():
    pg = make_pg()
    assert pg.time[0] == 0 and pg.time[-1] >= 100
    # rotating-frame sign: frequencies = -fftshift(fftfreq)
    assert pg.frequencies[0] > 0  # descending after the minus sign? check monotonic
    assert np.all(np.diff(pg.frequencies) < 0)
    assert np.isclose(pg.df, abs(pg.frequencies[1] - pg.frequencies[0]))
    # energies consistent
    assert np.allclose(pg.energies, 2 * np.pi * hbar * pg.frequencies)


def test_gaussian_time_power_and_norm():
    pg = make_pg()
    pg.add_gaussian_time(width_t=2, t0=50, area_time=1, unit='Hz')
    # power = integral |E|^2 dt of a normalized pi-ish pulse
    assert pg.pulse_power > 0
    peak = np.argmax(np.abs(pg.temporal_representation_x))
    assert abs(pg.time[peak] - 50) < pg.dt
    # round trip t <-> f
    back = np.fft.ifft(np.fft.ifftshift(pg.frequency_representation_x))
    assert np.allclose(back, pg.temporal_representation_x, atol=1e-10)


def test_gaussian_freq_shift_time():
    pg = make_pg()
    pg.add_gaussian_freq(width_f=0.5, shift_time=30, area_time=1, unit='Hz')
    peak = np.argmax(np.abs(pg.temporal_representation_x))
    assert abs(pg.time[peak] - 30) < 2 * pg.dt


def test_set_pulse_power():
    pg = make_pg()
    pg.add_gaussian_time(width_t=3, t0=40, area_time=2)
    pg.set_pulse_power(5.0)
    assert np.isclose(pg.pulse_power, 5.0, rtol=1e-6)


def test_double_erf_filter_carves_spectrum():
    pg = make_pg()
    pg.add_gaussian_time(width_t=0.2, t0=50)  # short pulse = broad spectrum
    full_bw = np.trapezoid(np.abs(pg.frequency_representation_x) ** 2,
                           -pg.frequencies)
    pg.add_filter_double_erf(central_f=0, width_f=0.5, rise_f=0.05, unit='Hz')
    pg.apply_frequency_filter()
    cut_bw = np.trapezoid(np.abs(pg.frequency_representation_x) ** 2,
                          -pg.frequencies)
    assert cut_bw < 0.5 * full_bw
    # spectrally narrower -> temporally longer
    it = np.abs(pg.temporal_representation_x) ** 2
    fwhm_t = pg.dt * np.sum(it > np.max(it) / 2)
    assert fwhm_t > 1.0


def test_phase_wedge_shifts_pulse_in_time():
    pg = make_pg()
    pg.add_gaussian_time(width_t=2, t0=40)
    pg.add_phase_wedge(time_shift=10, central_f=0, kind='right')
    pg.apply_frequency_filter()
    peak = pg.time[np.argmax(np.abs(pg.temporal_representation_x))]
    # one-sided wedge moves (half) the pulse
    assert peak != 40


def test_phase_filter_gdd_stretches_pulse():
    pg = make_pg()
    pg.add_gaussian_time(width_t=1, t0=50)

    def rms_width(it):
        it = it / np.trapezoid(it, pg.time)
        m = np.trapezoid(pg.time * it, pg.time)
        return np.sqrt(np.trapezoid((pg.time - m) ** 2 * it, pg.time))

    it0 = np.abs(pg.temporal_representation_x) ** 2
    pg.add_filter_rectangle(transmission=1)  # unity transmission baseline
    pg.add_phase_filter(phase_taylor=[0, 0, 20])  # GDD in ps^2
    pg.apply_frequency_filter()
    it1 = np.abs(pg.temporal_representation_x) ** 2
    assert rms_width(it1) > 2 * rms_width(it0)
    assert np.max(it1) < 0.5 * np.max(it0)  # peak intensity drops


def test_merging_modes():
    pg = make_pg()
    pg.add_filter_rectangle(central_f=0, width_f=1, transmission=0.5)
    pg.add_filter_rectangle(central_f=0.25, width_f=1, transmission=0.7,
                            merging='m')
    center = np.argmin(np.abs(pg.frequencies - 0.25))
    assert np.isclose(np.real(pg.frequency_filter_x[center]), 0.7)
    # cap at 1 with '+'
    pg.add_filter_rectangle(central_f=0, width_f=1, transmission=0.9,
                            merging='+')
    assert np.max(np.abs(pg.frequency_filter_x)) <= 1.0 + 1e-12


def test_units_nm_mev_consistency():
    pg = make_pg()
    # 1 meV in THz
    f = pg._Units(1.0, 'mev')
    assert np.isclose(f, 1.0 / (2 * np.pi * hbar))
    # nm relative to the central wavelength: +delta nm = red shift
    f_nm = pg._Units(801, 'nm')
    assert f_nm < 0  # lower frequency than the rotating frame
    back = pg._Units_inverse(f_nm, 'nm')
    assert np.isclose(back, 801, atol=1e-9)


def test_rotating_frame_shift():
    pg = make_pg()
    pg.add_gaussian_time(width_t=5, central_f=0, t0=50)
    pg.set_rotating_frame(801, unit='nm')
    # pulse now oscillates at the difference frequency
    peak_f = pg.frequencies[np.argmax(np.abs(pg.frequency_representation_x))]
    expect = pg._Units(800, 'nm')  # old carrier in the new frame
    assert np.isclose(peak_f, expect, atol=3 * pg.df)


def test_slm_pixelation():
    pg = make_pg()
    pg.add_filter_gaussian(central_f=0, width_f=2, transmission=1, unit='Hz')
    pg.apply_SLM(pixelwidth=0.2, pixel_center=0, N_pixel=16, SLM='amp')
    # filter is now piecewise constant: count distinct levels in the window
    sel = np.abs(pg.frequencies) < 1.4
    vals = np.abs(pg.frequency_filter_x[sel])
    assert len(np.unique(np.round(vals, 10))) <= 17
    # outside the SLM window the filter is zeroed
    assert np.all(np.abs(pg.frequency_filter_x[pg.frequencies > 1.7]) == 0)


def test_slm_generate_mask(tmp_path):
    pg = make_pg()
    pg.add_filter_gaussian(central_f=0, width_f=1, transmission=1, unit='Hz')
    names = pg.apply_SLM(pixelwidth=0.1, N_pixel=8, SLM='ap',
                         generate_mask=True, save_dir=str(tmp_path) + "/",
                         mask_name='m')
    assert len(names) == 4
    data = np.loadtxt(names[0])
    assert data.shape == (8,)


def test_sigmoid_time_flat_top():
    pg = make_pg()
    pg.add_sigmoid_time(width_t=20, central_f=0.0, rise_t=1, start_t=30,
                        height=0.8)
    mid = np.abs(pg.temporal_representation_x[
        (pg.time > 35) & (pg.time < 45)])
    assert np.allclose(mid, 0.8, atol=0.02)


def test_pulse_tuples_into_engine(tmp_path):
    """A shaped pulse drives the TLS engine through the in-memory tuple path:
    a pi-area resonant gaussian inverts the TLS."""
    from pyaceqd_tpu.models.tls import tls
    pg = make_pg(dt=0.02, tend=20)
    # area pi: |E| integrates to pi/ (pi/2 scaling in coupling) -> use
    # area_time = pi in the field normalization of ChirpedPulse
    pg.add_gaussian_time(width_t=1, t0=10, area_time=1)
    tup_x, tup_y = pg.get_pulse_tuples()
    res = tls(0, 20, dt=0.02, pulse_file_x=tup_x, pulse_file_y=tup_y,
              gamma_e=0, lindblad=False, phonons=False,
              temp_dir=str(tmp_path))
    occ = np.real(res[2][-1])
    assert occ > 0.99  # area-1 ChirpedPulse = pi rotation


def test_save_load_copy(tmp_path):
    pg = make_pg()
    pg.add_gaussian_time(width_t=2, t0=50)
    path = pg.save_pulse(save_name='p', save_dir=str(tmp_path) + "/")
    pg2 = load_pulse(path)
    assert np.allclose(pg2.temporal_representation_x,
                       pg.temporal_representation_x)
    pg3 = pg.copy_pulse()
    pg3.clear_pulses()
    assert np.any(pg.temporal_representation_x != 0)
    assert np.all(pg3.temporal_representation_x == 0)


def test_merge_pulses():
    a = make_pg()
    a.add_gaussian_time(width_t=2, t0=30)
    b = make_pg()
    b.add_gaussian_time(width_t=2, t0=70)
    a.merge_pulses(b)
    it = np.abs(a.temporal_representation_x)
    peaks = [a.time[np.argmax(it[a.time < 50])],
             a.time[len(a.time[a.time < 50]) + np.argmax(it[a.time >= 50])]]
    assert abs(peaks[0] - 30) < 0.2 and abs(peaks[1] - 70) < 0.2


def test_generate_pulsefiles(tmp_path):
    pg = make_pg()
    pg.add_gaussian_time(width_t=2, t0=50)
    fx, fy = pg.generate_pulsefiles(temp_dir=str(tmp_path) + "/")
    data = np.loadtxt(fx)
    assert data.shape[1] == 3
    assert np.isclose(data[np.argmax(np.abs(data[:, 1] + 1j * data[:, 2])), 0],
                      50, atol=pg.dt)


def test_field_functions_lab_frame():
    pg = make_pg()
    pg.add_gaussian_time(width_t=2, t0=50)
    fx, fy = pg.generate_field_functions_lab_frame()
    v = fx(50.0)
    assert np.abs(v) > 0
    # lab-frame carrier oscillates at the central frequency
    v2 = fx(50.0 + 0.5 / pg.central_frequency)
    assert np.sign(np.real(v)) != np.sign(np.real(v2))


def test_wigner_vectorized():
    pg = make_pg(tend=40, dt=0.2)
    pg.add_gaussian_time(width_t=2, t0=20)
    wx, wy = pg.wigner_plot()
    assert wx.shape == (len(pg.time), len(pg.frequencies))
    # Wigner of an unchirped gaussian is centered at (t0, 0)
    i, j = np.unravel_index(np.argmax(np.real(wx)), wx.shape)
    assert abs(pg.time[i] - 20) < 0.5
    assert abs(pg.frequencies[j]) < 3 * pg.df
