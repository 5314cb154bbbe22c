"""Two-level-system builders.

Functional parity with /root/reference/pyaceqd/two_level_system/tls.py: each
builder translates physics parameters into operator strings and calls the
in-process engine (:func:`pyaceqd_tpu.engine.simulate`).  The callable-system
convention is preserved: every correlation/timebin/application layer takes one
of these functions as its ``system`` argument.
"""


from pyaceqd_tpu import constants
from pyaceqd_tpu.engine.simulate import simulate
from pyaceqd_tpu.models.dressed import dressed_states

hbar = constants.hbar


def tls(t_start, t_end, *pulses, dt=0.1, gamma_e=1 / 100, phonons=False, t_mem=6.4,
        ae=5.0, temperature=4, verbose=False, lindblad=False, temp_dir=None,
        pt_file=None, suffix="", multitime_op=None, pulse_file=None, pulse_file_x=None,
        prepare_only=False,
        output_ops=("|0><0|_2", "|1><1|_2", "|0><1|_2", "|1><0|_2"),
        phonon_factor=1.0, LO_params=None, dressedstates=False, rf=False, rf_file=None,
        firstonly=False, dephasing=None, J_to_file=None, J_file=None, factor_ah=None,
        use_infinite=True, threshold=8, calc_dynmap=False, rho0=None, e_x=0,
        get_M_t=None, initial="|0><0|_2", **options):
    """Driven two-level quantum dot, x-polarized coupling, optional phonons.

    Mirrors reference tls() (two_level_system/tls.py:16-77): boson coupling
    ``phonon_factor*|1><1|_2``, radiative decay gamma_e when lindblad=True,
    optional pure dephasing, optional rotating frame.
    """
    system_prefix = "tls"
    system_op = None
    if e_x != 0:
        system_op = ["({}*|1><1|_2)".format(e_x)]
    boson_op = "{:.3f}*|1><1|_2".format(phonon_factor)
    lindblad_ops = []
    if lindblad:
        lindblad_ops = [["|0><1|_2", gamma_e]]
    if dephasing is not None:
        lindblad_ops.append(["|0><0|_2-|1><1|_2", dephasing])
    interaction_ops = [["|1><0|_2", "x"]]
    rf_op = "|1><1|_2" if rf else None
    if pulse_file is None and pulse_file_x is not None:
        pulse_file = pulse_file_x

    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, pulse_file_x=pulse_file,
        system_prefix=system_prefix, threshold=str(int(threshold)),
        system_op=system_op, boson_op=boson_op, initial=initial,
        lindblad_ops=lindblad_ops, interaction_ops=interaction_ops,
        output_ops=list(output_ops), prepare_only=prepare_only, LO_params=LO_params,
        dressedstates=dressedstates, rf_op=rf_op, rf_file=rf_file,
        firstonly=firstonly, J_to_file=J_to_file, J_file=J_file, factor_ah=factor_ah,
        use_infinite=use_infinite, calc_dynmap=calc_dynmap, rho0=rho0, get_M_t=get_M_t, **options)


def tls_dressed_states(t_start, t_end, *pulses, plot=True, t_lim=None, e_lim=None,
                       filename="tls_dressed", firstonly=False,
                       colors=("#0000FF", "#FF0000"), visible_states=None,
                       return_eigenvectors=False, **options):
    return dressed_states(tls, 2, t_start, t_end, *pulses, filename=filename,
                          plot=plot, t_lim=t_lim, e_lim=e_lim, firstonly=firstonly,
                          colors=list(colors), visible_states=visible_states,
                          return_eigenvectors=return_eigenvectors, **options)


def tls_two_sensor(t_start, t_end, *pulses, dt=0.1, gamma_e=1 / 100, phonons=False,
                   t_mem=10, ae=3.0, delta_s1=0, delta_s2=0, epsilon=0.0001,
                   linewidth1=0.01, linewidth2=None, temperature=1, verbose=False,
                   lindblad=False, temp_dir=None, pt_file=None, suffix="",
                   multitime_op=None, pulse_file=None, prepare_only=False,
                   output_ops=("|0><0|_2 otimes Id_2 otimes Id_2",
                               "|1><1|_2 otimes Id_2 otimes Id_2"),
                   initial=None, dressedstates=False, rf=False, rf_file=None,
                   firstonly=False, calc_dynmap=False, use_infinite=False, get_M_t=None, **options):
    """TLS ⊗ two 2-level sensors with coupling epsilon (reference tls.py:89-124)."""
    system_op = []
    boson_op = "|1><1|_2 otimes Id_2 otimes Id_2"
    if initial is None:
        initial = "|0><0|_2 otimes |0><0|_2 otimes |0><0|_2"
    lindblad_ops = []
    if lindblad:
        lindblad_ops = [["|0><1|_2 otimes Id_2 otimes Id_2", gamma_e]]
    interaction_ops = [["|1><0|_2 otimes Id_2 otimes Id_2", "x"]]
    rf_op = "|1><1|_2 otimes Id_2 otimes Id_2" if rf else None
    system_op.append("{} * (Id_2 otimes |1><1|_2 otimes Id_2)".format(delta_s1))
    system_op.append("{} * (Id_2 otimes Id_2 otimes |1><1|_2)".format(delta_s2))
    system_op.append("{} * (|1><0|_2 otimes |0><1|_2 otimes Id_2 + |0><1|_2 otimes |1><0|_2 otimes Id_2)".format(epsilon))
    system_op.append("{} * (|1><0|_2 otimes Id_2 otimes |0><1|_2 + |0><1|_2 otimes Id_2 otimes |1><0|_2)".format(epsilon))
    if linewidth2 is None:
        linewidth2 = linewidth1
    lindblad_ops.append(["Id_2 otimes |0><1|_2 otimes Id_2", linewidth1])
    lindblad_ops.append(["Id_2 otimes Id_2 otimes |0><1|_2", linewidth2])

    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, pulse_file_x=pulse_file,
        system_prefix="tls_two_sensor", system_op=system_op, boson_op=boson_op,
        initial=initial, lindblad_ops=lindblad_ops, interaction_ops=interaction_ops,
        output_ops=list(output_ops), prepare_only=prepare_only,
        dressedstates=dressedstates, rf_op=rf_op, rf_file=rf_file,
        firstonly=firstonly, use_infinite=use_infinite, calc_dynmap=calc_dynmap,
        get_M_t=get_M_t, **options)


def tls_one_sensor(t_start, t_end, *pulses, dt=0.1, gamma_e=1 / 100, phonons=False,
                   t_mem=10, ae=3.0, delta_s1=0, epsilon=0.0001, linewidth1=0.01,
                   temperature=1, verbose=False, lindblad=False, temp_dir=None,
                   pt_file=None, suffix="", multitime_op=None, pulse_file=None,
                   prepare_only=False,
                   output_ops=("|0><0|_2 otimes Id_2", "|1><1|_2 otimes Id_2"),
                   initial=None, dressedstates=False, rf=False, rf_file=None,
                   firstonly=False, calc_dynmap=False, use_infinite=False, get_M_t=None, **options):
    """TLS ⊗ one 2-level sensor (reference tls.py:126-157)."""
    system_op = []
    boson_op = "|1><1|_2 otimes Id_2"
    if initial is None:
        initial = "|0><0|_2 otimes |0><0|_2"
    lindblad_ops = []
    if lindblad:
        lindblad_ops = [["|0><1|_2 otimes Id_2", gamma_e]]
    interaction_ops = [["|1><0|_2 otimes Id_2", "x"]]
    rf_op = "|1><1|_2 otimes Id_2" if rf else None
    system_op.append("{} * (Id_2 otimes |1><1|_2)".format(delta_s1))
    system_op.append("{} * (|1><0|_2 otimes |0><1|_2 + |0><1|_2 otimes |1><0|_2)".format(epsilon))
    lindblad_ops.append(["Id_2 otimes |0><1|_2", linewidth1])

    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, pulse_file_x=pulse_file,
        system_prefix="tls_one_sensor", system_op=system_op, boson_op=boson_op,
        initial=initial, lindblad_ops=lindblad_ops, interaction_ops=interaction_ops,
        output_ops=list(output_ops), prepare_only=prepare_only,
        dressedstates=dressedstates, rf_op=rf_op, rf_file=rf_file,
        firstonly=firstonly, use_infinite=use_infinite, calc_dynmap=calc_dynmap,
        get_M_t=get_M_t, **options)


def tls_photons(t_start, t_end, *pulses, dt=0.1, gamma_e=1 / 100, cav_coupl1=0.06,
                cav_loss1=0.12 / hbar, delta_cx1=-2, cav_coupl2=None, cav_loss2=None,
                delta_cx2=-2, phonons=False, t_mem=10, ae=5.0, temperature=4,
                verbose=False, lindblad=False, temp_dir=None, pt_file=None, suffix="",
                multitime_op=None, n_phot1=2, n_phot2=2, laser_cav_coupl=None,
                pulse_file=None, prepare_only=False, output_ops=None,
                dressedstates=False, rf=False, rf_file=None, firstonly=False,
                initial=None, **options):
    """TLS ⊗ two cavities (Jaynes-Cummings, Fock truncation n_phot; reference tls.py:159-205)."""
    n1, n2 = n_phot1 + 1, n_phot2 + 1
    system_op = []
    boson_op = "|1><1|_2 otimes Id_{} otimes Id_{}".format(n1, n2)
    if initial is None:
        initial = "|0><0|_2 otimes |0><0|_{} otimes |0><0|_{}".format(n1, n2)
    if output_ops is None:
        output_ops = ["|0><0|_2 otimes Id_{} otimes Id_{}".format(n1, n2),
                      "|1><1|_2 otimes Id_{} otimes Id_{}".format(n1, n2)]
    lindblad_ops = []
    if lindblad:
        lindblad_ops = [["|0><1|_2 otimes Id_{} otimes Id_{}".format(n1, n2), gamma_e]]
    interaction_ops = [["|1><0|_2 otimes Id_{} otimes Id_{}".format(n1, n2), "x"]]
    if laser_cav_coupl is not None:
        interaction_ops.append(["{}*(Id_2 otimes bdagger_{} otimes Id_{})".format(laser_cav_coupl, n1, n2), "x"])
    rf_op = None
    if rf:
        rf_op = ("|1><1|_2 otimes Id_{} otimes Id_{}".format(n1, n2)
                 + " + Id_2 otimes n_{} otimes Id_{}".format(n1, n2)
                 + " + Id_2 otimes Id_{} otimes n_{}".format(n1, n2))
    if cav_coupl2 is None:
        cav_coupl2 = cav_coupl1
    if cav_loss2 is None:
        cav_loss2 = cav_loss1
    system_op.append(" {} * (Id_2 otimes n_{} otimes Id_{})".format(delta_cx1, n1, n2))
    system_op.append(" {} * (Id_2 otimes Id_{} otimes n_{})".format(delta_cx2, n1, n2))
    system_op.append(" {} * (|1><0|_2 otimes b_{} otimes Id_{} + |0><1|_2 otimes bdagger_{} otimes Id_{})".format(cav_coupl1, n1, n2, n1, n2))
    system_op.append(" {} * (|1><0|_2 otimes Id_{} otimes b_{} + |0><1|_2 otimes Id_{} otimes bdagger_{})".format(cav_coupl2, n1, n2, n1, n2))
    lindblad_ops.append(["Id_2 otimes b_{} otimes Id_{}".format(n1, n2), cav_loss1])
    lindblad_ops.append(["Id_2 otimes Id_{} otimes b_{}".format(n1, n2), cav_loss2])

    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, pulse_file_x=pulse_file,
        system_prefix="tls_cavity", system_op=system_op, boson_op=boson_op,
        initial=initial, lindblad_ops=lindblad_ops, interaction_ops=interaction_ops,
        output_ops=list(output_ops), prepare_only=prepare_only,
        dressedstates=dressedstates, rf_op=rf_op, rf_file=rf_file, firstonly=firstonly, **options)


def tls_photons_dressed_states(t_start, t_end, *pulses, plot=True, t_lim=None,
                               e_lim=None, filename="tls_photons_dressed",
                               firstonly=False, visible_states=None,
                               print_states=None, **options):
    n1 = options["n_phot1"] + 1
    n2 = options["n_phot2"] + 1
    dim = [2, n1, n2]
    return dressed_states(tls_photons, dim, t_start, t_end, *pulses,
                          filename=filename, plot=plot, t_lim=t_lim, e_lim=e_lim,
                          firstonly=firstonly, colors=None,
                          visible_states=visible_states, print_states=print_states,
                          **options)


def tls_photon(t_start, t_end, *pulses, dt=0.1, gamma_e=1 / 100, cav_coupl1=0.06,
               cav_loss1=0.12 / hbar, delta_cx1=-2, phonons=False, t_mem=10, ae=5.0,
               temperature=4, verbose=False, lindblad=False, temp_dir=None,
               pt_file=None, suffix="", multitime_op=None, n_phot1=2,
               laser_cav_coupl=None, pulse_file_x=None, prepare_only=False,
               output_ops=None, dressedstates=False, rf=False, rf_file=None,
               firstonly=False, initial=None, use_infinite=True, calc_dynmap=False,
               rho0=None, **options):
    """TLS ⊗ one cavity (reference tls.py:214-250)."""
    n1 = n_phot1 + 1
    system_op = []
    boson_op = "|1><1|_2 otimes Id_{}".format(n1)
    if initial is None:
        initial = "|0><0|_2 otimes |0><0|_{}".format(n1)
    if output_ops is None:
        output_ops = ["|0><0|_2 otimes Id_{}".format(n1), "|1><1|_2 otimes Id_{}".format(n1)]
    lindblad_ops = []
    if lindblad:
        lindblad_ops = [["|0><1|_2 otimes Id_{}".format(n1), gamma_e]]
    interaction_ops = [["|1><0|_2 otimes Id_{}".format(n1), "x"]]
    if laser_cav_coupl is not None:
        interaction_ops.append(["{}*(Id_2 otimes bdagger_{})".format(laser_cav_coupl, n1), "x"])
    rf_op = None
    if rf:
        rf_op = "|1><1|_2 otimes Id_{} + Id_2 otimes n_{}".format(n1, n1)
    system_op.append(" {} * (Id_2 otimes n_{})".format(delta_cx1, n1))
    system_op.append(" {} * (|1><0|_2 otimes b_{} + |0><1|_2 otimes bdagger_{})".format(cav_coupl1, n1, n1))
    lindblad_ops.append(["Id_2 otimes b_{}".format(n1), cav_loss1])

    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, pulse_file_x=pulse_file_x,
        system_prefix="tls_cavity", system_op=system_op, boson_op=boson_op,
        initial=initial, lindblad_ops=lindblad_ops, interaction_ops=interaction_ops,
        output_ops=list(output_ops), prepare_only=prepare_only,
        dressedstates=dressedstates, rf_op=rf_op, rf_file=rf_file,
        firstonly=firstonly, use_infinite=use_infinite, calc_dynmap=calc_dynmap,
        rho0=rho0, **options)


def tls_photon_sensor(t_start, t_end, *pulses, dt=0.1, gamma_e=1 / 100, cav_coupl1=0.06,
                      cav_loss1=0.12 / hbar, delta_cx1=-2, phonons=False, delta_s1=0,
                      epsilon=0.0001, linewidth1=0.01, t_mem=10, ae=5.0, temperature=4,
                      verbose=False, lindblad=False, temp_dir=None, pt_file=None,
                      suffix="", multitime_op=None, n_phot1=2, laser_cav_coupl=None,
                      pulse_file_x=None, prepare_only=False, output_ops=None,
                      dressedstates=False, rf=False, rf_file=None, firstonly=False,
                      initial=None, use_infinite=True, calc_dynmap=False, **options):
    """TLS ⊗ cavity ⊗ sensor (reference tls.py:252-296)."""
    n1 = n_phot1 + 1
    system_op = []
    boson_op = "|1><1|_2 otimes Id_{} otimes Id_2".format(n1)
    if initial is None:
        initial = "|0><0|_2 otimes |0><0|_{} otimes |0><0|_2".format(n1)
    if output_ops is None:
        output_ops = ["|0><0|_2 otimes Id_{} otimes Id_2".format(n1),
                      "|1><1|_2 otimes Id_{} otimes Id_2".format(n1)]
    lindblad_ops = []
    if lindblad:
        lindblad_ops = [["|0><1|_2 otimes Id_{} otimes Id_2".format(n1), gamma_e]]
    interaction_ops = [["|1><0|_2 otimes Id_{} otimes Id_2".format(n1), "x"]]
    if laser_cav_coupl is not None:
        interaction_ops.append(["{}*(Id_2 otimes bdagger_{} otimes Id_2)".format(laser_cav_coupl, n1), "x"])
    rf_op = None
    if rf:
        rf_op = "|1><1|_2 otimes Id_{} otimes Id_2 + Id_2 otimes n_{} otimes Id_2".format(n1, n1)
    system_op.append(" {} * (Id_2 otimes n_{} otimes Id_2)".format(delta_cx1, n1))
    system_op.append(" {} * (|1><0|_2 otimes b_{} otimes Id_2 + |0><1|_2 otimes bdagger_{} otimes Id_2)".format(cav_coupl1, n1, n1))
    lindblad_ops.append(["Id_2 otimes b_{} otimes Id_2".format(n1), cav_loss1])
    system_op.append("{} * (Id_2 otimes Id_{} otimes |1><1|_2)".format(delta_s1, n1))
    system_op.append("{} * (Id_2 otimes bdagger_{} otimes |0><1|_2 + Id_2 otimes b_{} otimes |1><0|_2)".format(epsilon, n1, n1))
    lindblad_ops.append(["Id_2 otimes Id_{} otimes |0><1|_2".format(n1), linewidth1])

    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, pulse_file_x=pulse_file_x,
        system_prefix="tls_cavity_sensor", system_op=system_op, boson_op=boson_op,
        initial=initial, lindblad_ops=lindblad_ops, interaction_ops=interaction_ops,
        output_ops=list(output_ops), prepare_only=prepare_only,
        dressedstates=dressedstates, rf_op=rf_op, rf_file=rf_file,
        firstonly=firstonly, use_infinite=use_infinite, calc_dynmap=calc_dynmap, **options)


def tls_photon_two_sensor(t_start, t_end, *pulses, dt=0.1, gamma_e=1 / 100,
                          cav_coupl1=0.06, cav_loss1=0.12 / hbar, delta_cx1=-2,
                          phonons=False, delta_s1=0, delta_s2=None, epsilon=0.0001,
                          linewidth1=0.01, linewidth2=None, t_mem=10, ae=5.0,
                          temperature=4, verbose=False, lindblad=False, temp_dir=None,
                          pt_file=None, suffix="", multitime_op=None, n_phot1=2,
                          laser_cav_coupl=None, pulse_file_x=None, prepare_only=False,
                          output_ops=None, dressedstates=False, rf=False, rf_file=None,
                          firstonly=False, initial=None, use_infinite=True, **options):
    """TLS ⊗ cavity ⊗ two sensors (reference tls.py:298-349)."""
    n1 = n_phot1 + 1
    if delta_s2 is None:
        delta_s2 = delta_s1
    if linewidth2 is None:
        linewidth2 = linewidth1
    system_op = []
    boson_op = "|1><1|_2 otimes Id_{} otimes Id_2 otimes Id_2".format(n1)
    if initial is None:
        initial = "|0><0|_2 otimes |0><0|_{} otimes |0><0|_2 otimes |0><0|_2".format(n1)
    if output_ops is None:
        output_ops = ["|0><0|_2 otimes Id_{} otimes Id_2 otimes Id_2".format(n1),
                      "|1><1|_2 otimes Id_{} otimes Id_2 otimes Id_2".format(n1)]
    lindblad_ops = []
    if lindblad:
        lindblad_ops = [["|0><1|_2 otimes Id_{} otimes Id_2 otimes Id_2".format(n1), gamma_e]]
    interaction_ops = [["|1><0|_2 otimes Id_{} otimes Id_2 otimes Id_2".format(n1), "x"]]
    if laser_cav_coupl is not None:
        interaction_ops.append(["{}*(Id_2 otimes bdagger_{} otimes Id_2 otimes Id_2)".format(laser_cav_coupl, n1), "x"])
    rf_op = None
    if rf:
        rf_op = ("|1><1|_2 otimes Id_{} otimes Id_2 otimes Id_2".format(n1)
                 + " + Id_2 otimes n_{} otimes Id_2 otimes Id_2".format(n1))
    system_op.append(" {} * (Id_2 otimes n_{} otimes Id_2 otimes Id_2)".format(delta_cx1, n1))
    system_op.append(" {} * (|1><0|_2 otimes b_{} otimes Id_2 otimes Id_2 + |0><1|_2 otimes bdagger_{} otimes Id_2 otimes Id_2)".format(cav_coupl1, n1, n1))
    lindblad_ops.append(["Id_2 otimes b_{} otimes Id_2 otimes Id_2".format(n1), cav_loss1])
    system_op.append("{} * (Id_2 otimes Id_{} otimes |1><1|_2 otimes Id_2)".format(delta_s1, n1))
    system_op.append("{} * (Id_2 otimes Id_{} otimes Id_2 otimes |1><1|_2)".format(delta_s2, n1))
    system_op.append("{} * (Id_2 otimes bdagger_{} otimes |0><1|_2 otimes Id_2 + Id_2 otimes b_{} otimes |1><0|_2 otimes Id_2)".format(epsilon, n1, n1))
    system_op.append("{} * (Id_2 otimes bdagger_{} otimes Id_2 otimes |0><1|_2 + Id_2 otimes b_{} otimes Id_2 otimes |1><0|_2)".format(epsilon, n1, n1))
    lindblad_ops.append(["Id_2 otimes Id_{} otimes |0><1|_2 otimes Id_2".format(n1), linewidth1])
    lindblad_ops.append(["Id_2 otimes Id_{} otimes Id_2 otimes |0><1|_2".format(n1), linewidth2])

    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, pulse_file_x=pulse_file_x,
        system_prefix="tls_cavity_two_sensor", system_op=system_op, boson_op=boson_op,
        initial=initial, lindblad_ops=lindblad_ops, interaction_ops=interaction_ops,
        output_ops=list(output_ops), prepare_only=prepare_only,
        dressedstates=dressedstates, rf_op=rf_op, rf_file=rf_file,
        firstonly=firstonly, use_infinite=use_infinite, **options)
