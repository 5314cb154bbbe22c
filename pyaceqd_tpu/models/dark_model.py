"""Four-level dark-exciton models (G/X/D/B and 5-level G/X/Y/D/B) and their
time-bin G2 correlators.

Functional parity with /root/reference/pyaceqd/four_level_system/dark_model.py;
the ThreadPool fan-outs over (multiple) insertion times run as batched branch
scans on device (engine.branched).
"""

import numpy as np

from pyaceqd_tpu import constants
from pyaceqd_tpu.engine import branched
from pyaceqd_tpu.engine.simulate import simulate
from pyaceqd_tpu.tools import construct_t, simple_t_gaussian

hbar = constants.hbar


def darkmodel(t_start, t_end, *pulses, dt=0.5, delta_xd=0, delta_b=4,
              gamma_e=1 / 100, gamma_b=None, phonons=False, t_mem=20.48, ae=3.0, temperature=4,
              verbose=False, lindblad=False, temp_dir=None, pt_file=None, suffix="",
              multitime_op=None, pulse_file_x=None, pulse_file_y=None,
              prepare_only=False,
              output_ops=("|0><0|_4", "|1><1|_4", "|2><2|_4", "|3><3|_4"),
              initial="|0><0|_4", **options):
    """|0>=G, |1>=X, |2>=D (dark), |3>=B; x-polarization drives G-D and D-B,
    y-polarization G-X and X-B (reference dark_model.py:13-32)."""
    system_op = ["{}*|3><3|_4".format(-delta_b), "{}*|2><2|_4".format(-delta_xd)]
    boson_op = "1*(|1><1|_4 + |2><2|_4) + 2*|3><3|_4"
    lindblad_ops = []
    if lindblad:
        if gamma_b is None:
            gamma_b = gamma_e
        lindblad_ops = [["|0><1|_4", gamma_e], ["|1><3|_4", gamma_b]]
    interaction_ops = [["|2><0|_4", "x"], ["|3><2|_4", "x"],
                       ["|1><0|_4", "y"], ["|3><1|_4", "y"]]
    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, system_prefix="darkmodel_",
        system_op=system_op, pulse_file_x=pulse_file_x, pulse_file_y=pulse_file_y,
        boson_op=boson_op, initial=initial, lindblad_ops=lindblad_ops,
        interaction_ops=interaction_ops, output_ops=list(output_ops),
        prepare_only=prepare_only, **options)


def darkmodel_new(t_start, t_end, *pulses, dt=0.5, delta_xd=0, delta_b=4,
                  gamma_e=1 / 100, gamma_b=None, phonons=False, t_mem=20.48,
                  ae=5.0,
                  temperature=4, verbose=False, lindblad=False, temp_dir=None,
                  pt_file=None, suffix="", multitime_op=None, pulse_file_x=None,
                  pulse_file_y=None, prepare_only=False, threshold=8,
                  output_ops=("|0><0|_5", "|1><1|_5", "|2><2|_5", "|3><3|_5", "|4><4|_5"),
                  initial="|0><0|_5", use_infinite=True, calc_dynmap=False,
                  **options):
    """5-level |0>=G,|1>=X,|2>=Y,|3>=D,|4>=B; Y only reachable by decay from B
    (reference dark_model.py:34-55)."""
    system_op = ["{}*|4><4|_5".format(-delta_b), "{}*|3><3|_5".format(-delta_xd)]
    boson_op = "1*(|1><1|_5 + |2><2|_5 + |3><3|_5) + 2*|4><4|_5"
    lindblad_ops = []
    if lindblad:
        if gamma_b is None:
            gamma_b = gamma_e
        lindblad_ops = [["|0><1|_5", gamma_e], ["|0><2|_5", gamma_e],
                        ["|1><4|_5", gamma_b], ["|2><4|_5", gamma_b]]
    interaction_ops = [["|1><0|_5", "x"], ["|4><1|_5", "x"],
                       ["|3><0|_5", "y"], ["|4><3|_5", "y"]]
    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, system_prefix="darkmodel_new_",
        threshold=str(int(threshold)), system_op=system_op,
        pulse_file_x=pulse_file_x, pulse_file_y=pulse_file_y, boson_op=boson_op,
        initial=initial, lindblad_ops=lindblad_ops, interaction_ops=interaction_ops,
        output_ops=list(output_ops), prepare_only=prepare_only,
        use_infinite=use_infinite, calc_dynmap=calc_dynmap, **options)


def darkmodel_photons(t_start, t_end, *pulses, dt=0.5, delta_xd=0, delta_b=4,
                      delta_cx=-2, rad_loss=1 / 100, cav_loss=1 / 20,
                      cav_coupl=1 / 30, phonons=False, t_mem=20.48, ae=3.0, temperature=4,
                      verbose=False, lindblad=False, temp_dir=None, pt_file=None,
                      suffix="", multitime_op=None, pulse_file_x=None,
                      pulse_file_y=None, prepare_only=False,
                      output_ops=("|0><0|_4 otimes |0><0|_3",
                                  "|1><1|_4 otimes |0><0|_3",
                                  "|2><2|_4 otimes |0><0|_3",
                                  "|3><3|_4 otimes |0><0|_3"),
                      initial="|0><0|_4 otimes |0><0|_3", **options):
    """Dark model ⊗ cavity mode on the X transitions (reference dark_model.py:57-78)."""
    system_op = ["{}*|3><3|_4 otimes Id_3".format(-delta_b),
                 "{}*|2><2|_4 otimes Id_3".format(-delta_xd)]
    boson_op = "|1><1|_4 otimes Id_3 + |2><2|_4 otimes Id_3 + 2*|3><3|_4 otimes Id_3"
    lindblad_ops = []
    if lindblad:
        lindblad_ops = [["|0><1|_4 otimes Id_3", rad_loss],
                        ["|1><3|_4 otimes Id_3", rad_loss]]
    interaction_ops = [["|2><0|_4 otimes Id_3", "x"], ["|3><2|_4 otimes Id_3", "x"],
                       ["|1><0|_4 otimes Id_3", "y"], ["|3><1|_4 otimes Id_3", "y"]]
    lindblad_ops.append(["Id_4 otimes b_3", cav_loss])
    system_op.append(" {} * (Id_4 otimes n_3)".format(delta_cx))
    system_op.append("{}*(|1><0|_4 otimes b_3 + |3><1|_4 otimes b_3 + |0><1|_4 otimes bdagger_3 + |1><3|_4 otimes bdagger_3)".format(hbar * cav_coupl))
    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, system_prefix="darkmodel_photons",
        system_op=system_op, pulse_file_x=pulse_file_x, pulse_file_y=pulse_file_y,
        boson_op=boson_op, initial=initial, lindblad_ops=lindblad_ops,
        interaction_ops=interaction_ops, output_ops=list(output_ops),
        prepare_only=prepare_only, **options)


# ---------------------------------------------------------------------------
# time-bin integration + G2 correlators
# ---------------------------------------------------------------------------

def timebin_integrate(t, tau, f, timebin_width, n_t=1, n_tau=1, debug=False,
                      normalize=False):
    """Integrate a 2D map over (t, tau) restricted so t lies in bin n_t and
    t+tau lies in bin n_tau (reference dark_model.py:81-110)."""
    t = np.asarray(t)
    tau = np.asarray(tau)
    t_start, t_end = timebin_width * (n_t - 1), timebin_width * n_t
    tau_start, tau_end = timebin_width * (n_tau - 1), timebin_width * n_tau
    f_t = np.zeros_like(t, dtype=float)
    for i in range(len(t)):
        if not (t_start <= t[i] < t_end):
            continue
        sel = (t[i] + tau >= tau_start) & (t[i] + tau < tau_end)
        tau_axis = tau[sel]
        tau_values = np.asarray(f[i])[sel]
        if debug:
            f[i, sel] = 1
        if len(tau_axis):
            f_t[i] = np.trapezoid(tau_values, tau_axis)
            if normalize and len(tau_axis) > 1:
                f_t[i] /= np.abs(tau_axis[-1] - tau_axis[0])
    f_complete = np.trapezoid(f_t, t)
    if normalize:
        f_complete /= np.abs(t[-1] - t[0])
    return t, tau, f, f_t, f_complete


def _dark_task(pulses, t0, tend, dtau, delta_xd, delta_b, gamma_e, **extra):
    return darkmodel(t0, tend, *pulses, dt=dtau, delta_xd=delta_xd,
                     delta_b=delta_b, gamma_e=gamma_e, lindblad=True,
                     return_task=True, output_ops=[], **extra)


def G2_ee(*pulses, t0=0, tend=600, tau0=0, tauend=600, dt=0.1, dtau=0.1,
          delta_xd=4, delta_b=4, gamma_e=1 / 65, workers=15, temp_dir=None,
          coarse_t=True):
    """<sigma_XX^dag(t) sigma_X^dag sigma_X(t+tau) sigma_XX(t)>: XX emission
    triggers at t, X emission follows at t+tau (reference dark_model.py:122-183):
    the |1><3| sandwich MTO fans out over t, X occupation is read along tau."""
    t = np.linspace(t0, tend, int((tend - t0) / dt) + 1)
    if coarse_t:
        t = construct_t(t0, tend, dt, 10 * dt, *pulses)
    task = _dark_task(pulses, t0, float(np.max(t)) + tauend, dtau, delta_xd,
                      delta_b, gamma_e, temp_dir=temp_dir)
    mto = {"operator": "|1><3|_4", "applyFrom": "", "applyBefore": "false"}
    t1, tau, G = branched.correlation_2d(task, t, [mto], "|1><1|_4",
                                         "|3><3|_4", tauend)
    return t1, tau, np.real(G)


def G2_eeee(*pulses, t0=0, dt=0.1, dtau=0.1, delta_xd=4, delta_b=4,
            gamma_e=1 / 65, workers=15, temp_dir=None, simple_exp=False, tb=800,
            gaussian_t=None, normalize=False):
    """Early-early coincidence: G2_ee restricted to the first time bin and
    tau-integrated per t1 (reference dark_model.py:185-258)."""
    if gaussian_t is not None:
        t1 = simple_t_gaussian(t0, gaussian_t, tb, dt, 10 * dt, *pulses)
    else:
        t1 = construct_t(t0, tb, dt, 10 * dt, *pulses, simple_exp=simple_exp)
    n_tau = int(tb / dtau)
    t2 = np.linspace(0, tb, n_tau + 1)
    task = _dark_task(pulses, t0, tb, dtau, delta_xd, delta_b, gamma_e,
                      temp_dir=temp_dir)
    mto = {"operator": "|1><3|_4", "applyFrom": "", "applyBefore": "false"}
    _G2 = np.zeros(len(t1))
    # branches run to the end of the bin; per t1 integrate tau in [0, tb-t1]
    outs = branched.batched_mto_runs(
        task, [mto], np.asarray(t1)[:, None],
        np.clip(np.asarray(t1)[:, None] + t2[None, :], t0, tb),
        ["|1><1|_4", "|3><3|_4"])
    for i in range(len(t1)):
        n_t2 = n_tau - int(round((t1[i] - t0) / dtau))
        temp = np.zeros(n_t2 + 1)
        temp[0] = np.abs(outs[i, 0, 1])      # <|3><3|> at t1 (pre-MTO = XX occ)
        if n_t2 > 0:
            temp[1:] = np.abs(outs[i, 1:n_t2 + 1, 0])
        t_new = t2[:len(temp)]
        _G2[i] = np.trapezoid(temp, t_new)
        if normalize and len(t_new) > 1:
            _G2[i] /= np.abs(t_new[-1] - t_new[0])
    return t1, _G2


def G2_eell(*pulses, t0=0, dt=0.1, dtau=0.1, delta_xd=4, delta_b=4,
            gamma_e=1 / 65, workers=15, temp_dir=None, simple_exp=False, tb=800,
            gaussian_t=None, normalize=False):
    """Early-XX/late-X coherence: three movable insertions (XX^dag at t1,
    X^dag at t2>=t1 in the early bin, XX at t3 in the late bin), |0><1| read
    along t4 and tau-integrated (reference dark_model.py:260-361)."""
    if gaussian_t is not None:
        t1 = simple_t_gaussian(t0, gaussian_t, tb, dt, 10 * dt, *pulses)
        t3 = simple_t_gaussian(tb, tb + gaussian_t, 2 * tb, dt, 10 * dt, *pulses)
    else:
        t1 = construct_t(t0, tb, dt, 10 * dt, *pulses, simple_exp=simple_exp)
        t3 = construct_t(tb, 2 * tb, dt, 10 * dt, *pulses, simple_exp=simple_exp)
    n_tau = int(tb / dtau)
    t4 = np.linspace(0, tb, n_tau + 1)
    task = _dark_task(pulses, t0, 2 * tb, dtau, delta_xd, delta_b, gamma_e,
                      temp_dir=temp_dir)
    # param-file order matters at equal times: X^dag before XX^dag
    mtos = [{"operator": "|1><0|_4", "applyFrom": "_right", "applyBefore": "false"},
            {"operator": "|3><1|_4", "applyFrom": "_right", "applyBefore": "false"},
            {"operator": "|1><3|_4", "applyFrom": "_left", "applyBefore": "false"}]
    _G2 = np.zeros([len(t1), len(t1), len(t3)], dtype=complex)
    for i in range(len(t1)):
        _t1 = t1[i]
        for j in range(len(t1) - i):
            _t2 = t1[j + i]
            times = np.stack([np.full(len(t3), _t2), np.full(len(t3), _t1),
                              np.asarray(t3)], axis=1)
            gather = np.clip(np.asarray(t3)[:, None] + t4[None, :], t0, 2 * tb)
            outs = branched.batched_mto_runs(task, mtos, times, gather,
                                             ["|0><1|_4", "|0><3|_4"])
            for k in range(len(t3)):
                n_t4 = n_tau - int((t3[k] - tb) / dtau)
                temp = np.zeros(n_t4 + 1)
                temp[0] = np.abs(outs[k, 0, 1])
                if n_t4 > 0:
                    temp[1:] = np.abs(outs[k, 1:n_t4 + 1, 0])
                t_new = t4[:len(temp)]
                _G2[i, j, k] = np.trapezoid(temp, t_new)
                if normalize and len(t_new) > 1:
                    _G2[i, j, k] *= 1 / np.abs(t_new[-1] - t_new[0])
    return t1, t3, _G2


def G2_eell_easy(*pulses, t0=0, dt=0.1, dtau=0.1, delta_xd=4, delta_b=4,
                 gamma_e=1 / 65, workers=15, temp_dir=None, simple_exp=False,
                 t_sep=800, tb=800, gaussian_t=None):
    """Simplified eell: t3 = t1 + t_sep, t4_end = t2 + t_sep; reads the final
    coherence value only (reference dark_model.py:364-448)."""
    if gaussian_t is not None:
        t1 = simple_t_gaussian(t0, gaussian_t, tb, dt, 10 * dt, *pulses)
    else:
        t1 = construct_t(t0, tb, dt, 10 * dt, *pulses, simple_exp=simple_exp)
    task = _dark_task(pulses, t0, 2 * tb, dtau, delta_xd, delta_b, gamma_e,
                      temp_dir=temp_dir)
    mtos = [{"operator": "|1><0|_4", "applyFrom": "_right", "applyBefore": "false"},
            {"operator": "|3><1|_4", "applyFrom": "_right", "applyBefore": "false"},
            {"operator": "|1><3|_4", "applyFrom": "_left", "applyBefore": "false"}]
    _G2 = np.zeros([len(t1), len(t1)], dtype=complex)
    for i in range(len(t1)):
        _t1 = t1[i]
        js = np.arange(i, len(t1))
        t2s = np.asarray(t1)[js]
        t3 = _t1 + t_sep
        t4_end = t2s + t_sep
        valid = (t3 >= tb) & (t4_end <= 2 * tb)
        times = np.stack([t2s, np.full(len(js), _t1), np.full(len(js), t3)], axis=1)
        gather = t4_end[:, None]
        outs = branched.batched_mto_runs(task, mtos, times, gather,
                                         ["|0><1|_4", "|0><3|_4"])
        vals = np.where(valid, outs[:, 0, 0], 0)
        if len(js):
            # j=0 (t2=t1): all four ops coincide -> read the B-G coherence
            vals0 = outs[0, 0, 1] if valid[0] else 0
            _G2[i, 0] = vals0
            _G2[i, 1:len(js)] = vals[1:]
    return t1, _G2


def G2_lele(*pulses, t0=0, dt=0.1, dtau=0.1, delta_xd=4, delta_b=4,
            gamma_e=1 / 65, workers=15, temp_dir=None, simple_exp=False, tb=800,
            gaussian_t=None):
    """Late-early correlation: sigma_X^dag/sigma_X sandwich at t1 in the early
    bin, XX occupation read across the late bin (reference dark_model.py:450-511)."""
    if gaussian_t is not None:
        t1 = simple_t_gaussian(t0, gaussian_t, tb, dt, 10 * dt, *pulses)
    else:
        t1 = construct_t(t0, tb, dt, 10 * dt, *pulses, simple_exp=simple_exp)
    n_tau = int(tb / dtau)
    t2 = np.linspace(tb, 2 * tb, n_tau + 1)
    task = _dark_task(pulses, t0, 2 * tb, dtau, delta_xd, delta_b, gamma_e,
                      temp_dir=temp_dir)
    mtos = [{"operator": "|1><0|_4", "applyFrom": "_right", "applyBefore": "false"},
            {"operator": "|0><1|_4", "applyFrom": "_left", "applyBefore": "false"}]
    times = np.stack([np.asarray(t1), np.asarray(t1)], axis=1)
    gather = np.broadcast_to(t2[None, :], (len(t1), len(t2)))
    outs = branched.batched_mto_runs(task, mtos, times, gather, ["|3><3|_4"])
    return np.asarray(t1), t2, np.real(outs[:, :, 0]).astype(complex)


def G2_b(t0=0, tend=600, tau0=0, tauend=600, dt=0.1, dtau=0.1, *pulses,
         delta_xd=0, delta_b=4, gamma_e=1 / 100, workers=15, temp_dir=None,
         coarse_t=True):
    """Two-photon XX->G emission proxy: cascade operator |0><1|+|1><3| applied
    as a sandwich at t, XX+X occupations read along tau
    (reference dark_model.py:514-578)."""
    t = np.linspace(t0, tend, int((tend - t0) / dt) + 1)
    if coarse_t:
        t = construct_t(t0, tend, dt, 10 * dt, *pulses)
    n_tau = int((tauend - tau0) / dtau)
    tau = np.linspace(tau0, tauend, n_tau + 1)
    task = _dark_task(pulses, t0, float(np.max(t)) + tauend, dtau, delta_xd,
                      delta_b, gamma_e, temp_dir=temp_dir)
    mto = {"operator": "|0><1|_4+|1><3|_4", "applyFrom": "", "applyBefore": "false"}
    times = np.asarray(t)[:, None]
    gather = np.asarray(t)[:, None] + tau[None, :]
    outs = branched.batched_mto_runs(task, [mto], times, gather,
                                     ["|1><1|_4", "|3><3|_4"])
    _G2 = np.zeros([len(t), len(tau)])
    _G2[:, 0] = np.real(outs[:, 0, 1])
    _G2[:, 1:] = np.real(outs[:, 1:, 1] + outs[:, 1:, 0])
    return np.asarray(t), tau, _G2


def two_photon_density(t0=0, tend=1600, tau0=0, tauend=1600, dt=0.1, dtau=0.1,
                       *pulses, delta_xd=4, delta_b=4, gamma_e=1 / 65,
                       timebin=800, workers=15, temp_dir=None, coarse_t=True):
    """Diagonal two-photon density-matrix elements from bin-restricted
    integrals of G2_ee (reference dark_model.py:113-120)."""
    options = {"delta_xd": delta_xd, "delta_b": delta_b, "gamma_e": gamma_e,
               "workers": workers, "temp_dir": temp_dir, "coarse_t": coarse_t,
               "t0": t0, "tend": tend, "tau0": tau0, "tauend": tauend,
               "dt": dt, "dtau": dtau}
    t1, tau1, g2_ee = G2_ee(*pulses, **options)
    _, _, _, _, rho_ee_ee = timebin_integrate(t1, tau1, g2_ee, timebin_width=timebin, n_t=1, n_tau=1)
    _, _, _, _, rho_ll_ll = timebin_integrate(t1, tau1, g2_ee, timebin_width=timebin, n_t=2, n_tau=2)
    _, _, _, _, rho_el_el = timebin_integrate(t1, tau1, g2_ee, timebin_width=timebin, n_t=1, n_tau=2)
    return rho_ee_ee, rho_ll_ll, rho_el_el
