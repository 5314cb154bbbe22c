"""G1(t, tau) maps and pulsed Mollow-triplet spectra.

API parity with /root/reference/pyaceqd/two_time/G1.py; the per-t1 fan-out
runs as one batched branch scan (engine.branched) instead of a thread pool of
ACE subprocesses, and the area/detuning sweeps save partial results each
iteration exactly like the reference (G1.py:111-116) so interrupted scans
resume from .npy files.
"""

import numpy as np

from pyaceqd_tpu import constants
from pyaceqd_tpu.engine import branched
from pyaceqd_tpu.models.tls import tls
from pyaceqd_tpu.pulses import ChirpedPulse
from pyaceqd_tpu.tools import construct_t

HBAR = constants.hbar


def G1_general(t0=0, tend=600, tau0=0, tauend=600, dt=0.1, dtau=0.02, *pulses,
               system=tls, multitime_op={"operator": "|0><1|_2", "applyFrom": "_left"},
               coarse_t=False, workers=10, prepare_only=False, simple_exp=False,
               gaussian_t=False, factor_tau=4, **options):
    """G1(t1, tau) for a generic system: the MTO is applied at each t1, the
    second output op is read along tau, the first gives the tau=0 column
    (reference G1.py:36-89).  The t1 grid may be adaptively coarse while the
    propagation runs at dtau."""
    t = np.linspace(t0, tend, int((tend - t0) / dt) + 1)
    n_tau = int((tauend - tau0) / dtau)
    tau = np.linspace(tau0, tauend, n_tau + 1)
    if coarse_t:
        if gaussian_t:
            t = construct_t(t0, tend, dt, 3 * dt, *pulses, factor_tau=factor_tau,
                            simple_exp=simple_exp, gaussian_t=True)
        else:
            t = construct_t(t0, tend, dt, 10 * dt, *pulses, simple_exp=simple_exp,
                            gaussian_t=False, factor_tau=factor_tau)
    if prepare_only:
        return 0, 0, 0
    output_ops = options.pop("output_ops")
    opts = dict(options)
    opts.pop("multitime_op", None)
    task = system(t0, float(np.max(t)) + tauend, *pulses, dt=dtau,
                  return_task=True, output_ops=[], **opts)
    mto = dict(multitime_op)
    t1, tau, G1 = branched.correlation_2d(task, t, [mto], output_ops[1],
                                          output_ops[0], tauend)
    return t1, tau, G1


def G1_twols(t0=0, tend=600, tau0=0, tauend=600, dt=0.1, dtau=0.5, *pulses,
             ae=3.0, temperature=4, gamma_e=1 / 100, phonons=False, pt_file=None,
             workers=10, temp_dir=None, coarse_t=False, prepare_only=False,
             simple_exp=False, gaussian_t=False, factor_tau=4, **ops):
    """G1(t, tau) = <sigma^dag(t+tau) sigma(t)> of the driven TLS
    (reference G1.py:15-34): sigma applied from the left at t, |1><0| read
    along tau, occupation gives tau=0."""
    output_ops = ["|1><1|_2", "|1><0|_2"]
    options = {"gamma_e": gamma_e, "phonons": phonons, "ae": ae,
               "temperature": temperature, "lindblad": True, "pt_file": pt_file,
               "temp_dir": temp_dir, "output_ops": output_ops}
    options.update(ops)
    multitime_op = {"operator": "|0><1|_2", "applyFrom": "_left", "applyBefore": "false"}
    return G1_general(t0, tend, tau0, tauend, dt, dtau, *pulses, system=tls,
                      multitime_op=multitime_op, coarse_t=coarse_t, workers=workers,
                      prepare_only=prepare_only, simple_exp=simple_exp,
                      gaussian_t=gaussian_t, factor_tau=factor_tau, **options)


def _time_integrated_spectrum(t_axis, tau_axis, g1, dtau):
    """Symmetrize G1 to negative tau per t, FFT along tau, integrate over t
    (reference G1.py:101-110)."""
    n = len(tau_axis)
    g1_symm = np.empty([len(t_axis), 2 * n - 1], dtype=complex)
    g1_symm[:, :n] = g1[:, ::-1]
    g1_symm[:, -(n - 1):] = np.conj(g1[:, 1:])
    spectra = np.fft.fftshift(np.fft.fft(g1_symm, axis=1), axes=1)
    return np.real(np.trapezoid(spectra.T, t_axis))


def pulsed_mollow_tls(pulse_tau, areas, detuning=0, tend=500, tauend=500, dt=0.2,
                      dtau=0.02, gamma_e=1 / 100, ae=3.0, temperature=4,
                      phonons=False, pt_file=None, workers=7, temp_dir=None,
                      save_dir=None, prepare_only=False, simple_exp=False,
                      gaussian_t=False, **ops):
    """Time-integrated emission spectra vs pulse area: the pulsed Mollow
    triplet (reference G1.py:119-160)."""
    n_tau = int(tauend / dtau)
    tau_axis = np.linspace(0, tauend, n_tau + 1)
    spectrums = np.zeros([len(areas), 2 * len(tau_axis) - 1])
    fft_freqs = -2 * np.pi * HBAR * np.fft.fftfreq(2 * len(tau_axis) - 1, d=dtau)
    for i in range(len(areas)):
        p1 = ChirpedPulse(tau_0=pulse_tau, e_start=detuning, alpha=0, e0=areas[i],
                          t0=pulse_tau * 4)
        t_axis, tau_axis, g1 = G1_twols(
            0, tend, 0, tauend, dt, dtau, p1, ae=ae, gamma_e=gamma_e, coarse_t=True,
            phonons=phonons, workers=workers, temperature=temperature,
            pt_file=pt_file, temp_dir=temp_dir, prepare_only=prepare_only,
            simple_exp=simple_exp, gaussian_t=gaussian_t, **ops)
        spectrums[i] = _time_integrated_spectrum(t_axis, tau_axis, g1, dtau)
        if save_dir is not None:
            _name = "_tau{:.2f}_lifet{:.1f}_det{:.1f}.npy".format(
                pulse_tau, 1 / gamma_e, detuning)
            np.save(save_dir + "x" + _name, np.fft.fftshift(fft_freqs))
            np.save(save_dir + "y" + _name, areas)
            np.save(save_dir + "z" + _name, spectrums)
    return np.fft.fftshift(fft_freqs), areas, spectrums


def pulsed_mollow_tls_pulses(pulse, areas, tend=500, tauend=500, dt=0.2, dtau=0.02,
                             gamma_e=1 / 100, ae=3.0, temperature=4, phonons=False,
                             pt_file=None, workers=7, temp_dir=None, save_dir=None,
                             prepare_only=False, simple_exp=False, gaussian_t=False,
                             factor_tau=4):
    """Same as pulsed_mollow_tls but sweeping the area of a caller-supplied
    pulse object (reference G1.py:91-117)."""
    n_tau = int(tauend / dtau)
    tau_axis = np.linspace(0, tauend, n_tau + 1)
    spectrums = np.zeros([len(areas), 2 * len(tau_axis) - 1])
    fft_freqs = -2 * np.pi * HBAR * np.fft.fftfreq(2 * len(tau_axis) - 1, d=dtau)
    pulse_tau = pulse.tau
    detuning = pulse.e_start
    for i in range(len(areas)):
        pulse.e0 = areas[i]
        t_axis, tau_axis, g1 = G1_twols(
            0, tend, 0, tauend, dt, dtau, pulse, ae=ae, gamma_e=gamma_e,
            coarse_t=True, phonons=phonons, workers=workers,
            temperature=temperature, pt_file=pt_file, temp_dir=temp_dir,
            prepare_only=prepare_only, simple_exp=simple_exp,
            gaussian_t=gaussian_t, factor_tau=factor_tau)
        spectrums[i] = _time_integrated_spectrum(t_axis, tau_axis, g1, dtau)
        if save_dir is not None:
            _name = "_tau{:.2f}_lifet{:.1f}_det{:.1f}.npy".format(
                pulse_tau, 1 / gamma_e, detuning)
            np.save(save_dir + "x" + _name, np.fft.fftshift(fft_freqs))
            np.save(save_dir + "y" + _name, areas)
            np.save(save_dir + "z" + _name, spectrums)
    return np.fft.fftshift(fft_freqs), areas, spectrums


def pulsed_mollow_energy(pulse_tau, detunings, area=3, tend=500, tauend=500,
                         dt=0.2, dtau=0.02, gamma_e=1 / 100, ae=3.0, temperature=4,
                         phonons=False, pt_file=None, workers=7, temp_dir=None,
                         save_dir=None, prepare_only=False, simple_exp=False,
                         gaussian_t=False):
    """Time-integrated spectra vs laser detuning (reference G1.py:162-186)."""
    n_tau = int(tauend / dtau)
    tau_axis = np.linspace(0, tauend, n_tau + 1)
    spectrums = np.zeros([len(detunings), 2 * len(tau_axis) - 1])
    fft_freqs = -2 * np.pi * HBAR * np.fft.fftfreq(2 * len(tau_axis) - 1, d=dtau)
    for i in range(len(detunings)):
        p1 = ChirpedPulse(tau_0=pulse_tau, e_start=detunings[i], alpha=0, e0=area,
                          t0=pulse_tau * 4)
        t_axis, tau_axis, g1 = G1_twols(
            0, tend, 0, tauend, dt, dtau, p1, ae=ae, gamma_e=gamma_e, coarse_t=True,
            phonons=phonons, workers=workers, temperature=temperature,
            pt_file=pt_file, temp_dir=temp_dir, prepare_only=prepare_only,
            simple_exp=simple_exp, gaussian_t=gaussian_t)
        spectrums[i] = _time_integrated_spectrum(t_axis, tau_axis, g1, dtau)
        if save_dir is not None:
            _name = "_tau{:.2f}_lifet{:.1f}_area{:.1f}.npy".format(
                pulse_tau, 1 / gamma_e, area)
            np.save(save_dir + "x" + _name, np.fft.fftshift(fft_freqs))
            np.save(save_dir + "y" + _name, detunings)
            np.save(save_dir + "z" + _name, spectrums)
    return np.fft.fftshift(fft_freqs), detunings, spectrums


def simple_vhom(tend=600, tauend=600, dt=0.1, dtau=0.02, *pulses, ae=3.0,
                temperature=4, gamma_e=1 / 100, phonons=False, pt_file=None,
                workers=10, temp_dir=None, coarse_t=False, prepare_only=False):
    """Hong-Ou-Mandel visibility sketch: 2 int |G1|^2 / brightness
    (reference G1.py:188-199)."""
    options = {"gamma_e": gamma_e, "phonons": phonons, "ae": ae,
               "temperature": temperature, "lindblad": True, "pt_file": pt_file,
               "temp_dir": temp_dir, "output_ops": ["|1><1|_2"]}
    res = tls(0, tend, *pulses, dt=dtau, **options)
    t, x = res[0].real, res[1].real
    brightness = np.trapezoid(x, t)
    t, tau, g1_t_tau = G1_twols(0, tend, 0, tauend, dt, dtau, *pulses, ae=ae,
                                temperature=temperature, gamma_e=gamma_e,
                                phonons=phonons, pt_file=pt_file, workers=workers,
                                temp_dir=temp_dir, coarse_t=coarse_t,
                                prepare_only=prepare_only)
    g1_tau = np.trapezoid(np.abs(g1_t_tau) ** 2, t, axis=0)
    return 2 * np.trapezoid(g1_tau, tau) / brightness
