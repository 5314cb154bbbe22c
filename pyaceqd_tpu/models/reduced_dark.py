"""Reduced 3-level dark model (G, X, D) and its time-bin G1 components.

Functional parity with /root/reference/pyaceqd/two_level_system/reduced_dark.py.
"""

import numpy as np

from pyaceqd_tpu import constants
from pyaceqd_tpu.engine import branched
from pyaceqd_tpu.engine.simulate import simulate
from pyaceqd_tpu.tools import construct_t, simple_t_gaussian

hbar = constants.hbar


def darkmodel(t_start, t_end, *pulses, dt=0.5, delta_xd=0, gamma_e=1 / 65,
              phonons=False, t_mem=20.48, ae=3.0, temperature=4, verbose=False, lindblad=False,
              temp_dir=None, pt_file=None, suffix="", multitime_op=None,
              pulse_file_x=None, pulse_file_y=None, prepare_only=False,
              output_ops=("|0><0|_3", "|1><1|_3", "|2><2|_3"),
              initial="|0><0|_3", **options):
    """|0>=G, |1>=X, |2>=D; x-polarization couples G-D and D-X, y couples G-X
    (reference reduced_dark.py:13-30)."""
    system_op = ["{}*|2><2|_3".format(-delta_xd)]
    boson_op = "|1><1|_3 + |2><2|_3"
    lindblad_ops = []
    if lindblad:
        lindblad_ops = [["|0><1|_3", gamma_e]]  # D is dark: no decay
    interaction_ops = [["|2><0|_3", "x"], ["|1><2|_3", "x"], ["|1><0|_3", "y"]]
    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, system_prefix="tls_dark",
        system_op=system_op, pulse_file_x=pulse_file_x, pulse_file_y=pulse_file_y,
        boson_op=boson_op, initial=initial, lindblad_ops=lindblad_ops,
        interaction_ops=interaction_ops, output_ops=list(output_ops),
        prepare_only=prepare_only, **options)


def darkmodel_photons(t_start, t_end, *pulses, dt=0.1, delta_xd=0, delta_cx=-2,
                      rad_loss=1 / 100, cav_loss=1 / 20, cav_coupl=1 / 30,
                      phonons=False, t_mem=20.48, ae=3.0, temperature=4, verbose=False,
                      lindblad=False, temp_dir=None, pt_file=None, suffix="",
                      multitime_op=None, pulse_file_x=None, pulse_file_y=None,
                      prepare_only=False,
                      output_ops=("|0><0|_3 otimes |0><0|_3",
                                  "|1><1|_3 otimes |0><0|_3",
                                  "|2><2|_3 otimes |0><0|_3"),
                      initial="|0><0|_3 otimes |0><0|_3", **options):
    """Reduced dark model ⊗ cavity on the G-X transition (reference
    reduced_dark.py:32-53)."""
    system_op = ["{}*|2><2|_3 otimes Id_3".format(-delta_xd)]
    boson_op = "|1><1|_3 otimes Id_3 + |2><2|_3 otimes Id_3"
    lindblad_ops = []
    if lindblad:
        lindblad_ops = [["|0><1|_3 otimes Id_3", rad_loss]]
    interaction_ops = [["|2><0|_3 otimes Id_3", "x"], ["|1><2|_3 otimes Id_3", "x"],
                       ["|1><0|_3 otimes Id_3", "y"]]
    lindblad_ops.append(["Id_3 otimes b_3", cav_loss])
    system_op.append(" {} * (Id_3 otimes n_3)".format(delta_cx))
    system_op.append("{}*(|1><0|_3 otimes b_3 + |0><1|_3 otimes bdagger_3 )".format(hbar * cav_coupl))
    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op,
        system_prefix="darkmodel_tls_photons", system_op=system_op,
        pulse_file_x=pulse_file_x, pulse_file_y=pulse_file_y, boson_op=boson_op,
        initial=initial, lindblad_ops=lindblad_ops, interaction_ops=interaction_ops,
        output_ops=list(output_ops), prepare_only=prepare_only, **options)


def G1_ee(*pulses, t0=0, dt=0.05, delta_xd=4, gamma_e=1 / 65, temp_dir=None,
          tb=800, normalize=False, phonons=False, pt_file=None, prepare_only=False):
    """Integrated early-bin X population (reference reduced_dark.py:55-62)."""
    res = darkmodel(t0, tb, *pulses, dt=dt, delta_xd=delta_xd, gamma_e=gamma_e,
                    lindblad=True, temp_dir=temp_dir, phonons=phonons,
                    pt_file=pt_file, prepare_only=prepare_only)
    if prepare_only:
        return 0.0
    t, x = np.real(res[0]), np.real(res[2])
    rho_ee = np.trapezoid(x, t)
    return rho_ee / gamma_e if normalize else rho_ee


def G1_ll(*pulses, t0=0, dt=0.05, delta_xd=4, gamma_e=1 / 65, temp_dir=None,
          tb=800, normalize=False, phonons=False, pt_file=None):
    """Integrated late-bin X population (reference reduced_dark.py:64-74)."""
    res = darkmodel(t0, 2 * tb, *pulses, dt=dt, delta_xd=delta_xd, gamma_e=gamma_e,
                    lindblad=True, temp_dir=temp_dir, phonons=phonons, pt_file=pt_file)
    t, x = np.real(res[0]), np.real(res[2])
    n_t = int(tb / dt)
    rho_ee = np.trapezoid(x[-n_t:], t[-n_t:])
    return rho_ee / gamma_e if normalize else rho_ee


def G1_el(*pulses, t0=0, dt=0.1, dtau=0.05, delta_xd=4, gamma_e=1 / 65,
          temp_dir=None, tb=800, workers=15, normalize=False, simple_exp=False,
          gaussian_t=None, phonons=False, pt_file=None):
    """Early-late coherence G1(t1, t2): sigma_X^dag applied from the right at
    each t1, |0><1| read along the late bin (reference reduced_dark.py:76-129)."""
    if gaussian_t is not None:
        t1 = simple_t_gaussian(t0, gaussian_t, tb, dt, 10 * dt, *pulses)
    else:
        t1 = construct_t(t0, tb, dt, 10 * dt, *pulses, simple_exp=simple_exp)
    n_tau = int(tb / dtau)
    t2 = np.linspace(0, tb, n_tau + 1)
    task = darkmodel(t0, 2 * tb, *pulses, dt=dtau, delta_xd=delta_xd,
                     gamma_e=gamma_e, lindblad=True, phonons=phonons,
                     pt_file=pt_file, temp_dir=temp_dir, return_task=True,
                     output_ops=[])
    mto = {"operator": "|1><0|_3", "applyFrom": "_right", "applyBefore": "false"}
    t1_, tau, G = branched.correlation_2d(task, t1, [mto], "|0><1|_3",
                                          "|1><1|_3", tb)
    return t1_, t2, G


def G1_easy_el(*pulses, t0=0, dt=0.1, dtau=0.05, delta_xd=4, gamma_e=1 / 65,
               temp_dir=None, tb=800, t_offset=0, workers=15, normalize=False,
               simple_exp=False, gaussian_t=None, phonons=False, pt_file=None):
    """Diagonal-only early-late coherence: one value per t1, read at
    t1 + tb + t_offset (reference reduced_dark.py:131-182)."""
    if gaussian_t is not None:
        t1 = simple_t_gaussian(t0, gaussian_t, tb, dt, 10 * dt, *pulses)
    else:
        t1 = construct_t(t0, tb, dt, 10 * dt, *pulses, simple_exp=simple_exp)
    task = darkmodel(t0, float(np.max(t1)) + tb + t_offset, *pulses, dt=dtau,
                     delta_xd=delta_xd, gamma_e=gamma_e, lindblad=True,
                     phonons=phonons, pt_file=pt_file, temp_dir=temp_dir,
                     return_task=True, output_ops=[])
    mto = {"operator": "|1><0|_3", "applyFrom": "_right", "applyBefore": "false"}
    times = np.asarray(t1)[:, None]
    gather = times + tb + t_offset
    outs = branched.batched_mto_runs(task, [mto], times, gather, ["|0><1|_3"])
    return np.asarray(t1), outs[:, 0, 0]
