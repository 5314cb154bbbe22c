"""Biexciton (four-level diamond G/X/Y/B) system builders.

Functional parity with /root/reference/pyaceqd/four_level_system/linear.py:
fine-structure splitting delta_xy, binding energy delta_b, x/y-polarized
couplings, exciton-number-weighted phonon coupling, plus cavity / extended
18-level / sensor variants.
"""


from pyaceqd_tpu import constants
from pyaceqd_tpu.engine.simulate import simulate
from pyaceqd_tpu.models.dressed import dressed_states

hbar = constants.hbar


def biexciton(t_start, t_end, *pulses, dt=0.5, delta_xy=0, shift_x=True, coupl_xy=0,
              delta_b=4, gamma_e=1 / 100, gamma_b=None, phonons=False, ae=3.0,
              temperature=4, verbose=False, lindblad=False, temp_dir=None,
              pt_file=None, suffix="", multitime_op=None, pulse_file_x=None,
              pulse_file_y=None, prepare_only=False,
              output_ops=("|0><0|_4", "|1><1|_4", "|2><2|_4", "|3><3|_4"),
              initial="|0><0|_4", t_mem=20.48, dressedstates=False, rf=False,
              rf_file=None, firstonly=False, use_infinite=False, calc_dynmap=False,
              **options):
    """G/X/Y/B diamond: |0>=G, |1>=X, |2>=Y, |3>=B (reference linear.py:8-39).

    Energies: -delta_b on B; FSS +-delta_xy/2 on X/Y (shift_x) or delta_xy on Y.
    Phonon coupling weighted by exciton number: 1 (X,Y), 2 (B)."""
    if shift_x:
        system_op = ["{}*|3><3|_4".format(-delta_b),
                     "{}*|1><1|_4".format(-delta_xy / 2),
                     "{}*|2><2|_4".format(delta_xy / 2)]
    else:
        system_op = ["{}*|3><3|_4".format(-delta_b), "{}*|2><2|_4".format(delta_xy)]
    boson_op = "1*(|1><1|_4 + |2><2|_4) + 2*|3><3|_4"
    lindblad_ops = []
    if lindblad:
        if gamma_b is None:
            gamma_b = gamma_e
        lindblad_ops = [["|0><1|_4", gamma_e], ["|0><2|_4", gamma_e],
                        ["|1><3|_4", gamma_b], ["|2><3|_4", gamma_b]]
    interaction_ops = [["|1><0|_4+|3><1|_4", "x"], ["|2><0|_4+|3><2|_4", "y"]]
    if coupl_xy != 0:
        system_op.append("{}*|1><2|_4".format(coupl_xy))
        system_op.append("{}*|2><1|_4".format(coupl_xy))
    rf_op = "|1><1|_4 + |2><2|_4 + 2*|3><3|_4" if rf else None

    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, system_prefix="b_linear",
        system_op=system_op, pulse_file_x=pulse_file_x, pulse_file_y=pulse_file_y,
        boson_op=boson_op, initial=initial, lindblad_ops=lindblad_ops,
        interaction_ops=interaction_ops, output_ops=list(output_ops),
        prepare_only=prepare_only, dressedstates=dressedstates, rf_op=rf_op,
        rf_file=rf_file, firstonly=firstonly, use_infinite=use_infinite,
        calc_dynmap=calc_dynmap, **options)


def biexciton_dressed_states(t_start, t_end, *pulses, plot=True, t_lim=None,
                             e_lim=None, colors=("#0000FF", "#00CC33", "#F9A627", "#FF0000"),
                             filename="biexciton_dressed", firstonly=False,
                             visible_states=None, return_eigenvectors=False, **options):
    return dressed_states(biexciton, 4, t_start, t_end, *pulses, filename=filename,
                          t_lim=t_lim, e_lim=e_lim, plot=plot, firstonly=firstonly,
                          colors=list(colors), visible_states=visible_states,
                          return_eigenvectors=return_eigenvectors, **options)


def biexciton_photons(t_start, t_end, *pulses, dt=0.5, delta_xy=0, delta_b=4,
                      gamma_e=1 / 100, cav_coupl=0.06, cav_loss=0.12 / hbar,
                      delta_cx=-2, gamma_b=None, phonons=False, ae=3.0, temperature=4,
                      verbose=False, lindblad=False, temp_dir=None, pt_file=None,
                      suffix="", multitime_op=None, pulse_file_x=None,
                      pulse_file_y=None, prepare_only=False, output_ops=None,
                      initial=None, t_mem=20.48, dressedstates=False, rf=False,
                      rf_file=None, firstonly=False, n_phot1=1, n_phot2=1, **options):
    """Biexciton ⊗ X-cavity ⊗ Y-cavity (reference linear.py:45-103)."""
    n1, n2 = n_phot1 + 1, n_phot2 + 1
    if initial is None:
        initial = "|0><0|_4 otimes |0><0|_{} otimes |0><0|_{}".format(n1, n2)
    if output_ops is None:
        output_ops = ["|0><0|_4 otimes Id_{} otimes Id_{}".format(n1, n2),
                      "|1><1|_4 otimes Id_{} otimes Id_{}".format(n1, n2),
                      "|2><2|_4 otimes Id_{} otimes Id_{}".format(n1, n2),
                      "|3><3|_4 otimes Id_{} otimes Id_{}".format(n1, n2)]
    system_op = ["-{}*|3><3|_4 otimes Id_{} otimes Id_{}".format(delta_b, n1, n2),
                 "-{}*|1><1|_4 otimes Id_{} otimes Id_{}".format(delta_xy / 2, n1, n2),
                 "{}*|2><2|_4 otimes Id_{} otimes Id_{}".format(delta_xy / 2, n1, n2)]
    boson_op = ("|1><1|_4 otimes Id_{} otimes Id_{} + |2><2|_4 otimes Id_{} otimes Id_{}"
                " + 2*|3><3|_4 otimes Id_{} otimes Id_{}").format(n1, n2, n1, n2, n1, n2)
    lindblad_ops = []
    if lindblad:
        if gamma_b is None:
            gamma_b = gamma_e
        lindblad_ops = [["|0><1|_4 otimes Id_{} otimes Id_{}".format(n1, n2), gamma_e],
                        ["|0><2|_4 otimes Id_{} otimes Id_{}".format(n1, n2), gamma_e],
                        ["|1><3|_4 otimes Id_{} otimes Id_{}".format(n1, n2), gamma_b],
                        ["|2><3|_4 otimes Id_{} otimes Id_{}".format(n1, n2), gamma_b]]
    interaction_ops = [
        ["|1><0|_4 otimes Id_{} otimes Id_{} +|3><1|_4 otimes Id_{} otimes Id_{}".format(n1, n2, n1, n2), "x"],
        ["|2><0|_4 otimes Id_{} otimes Id_{} +|3><2|_4 otimes Id_{} otimes Id_{}".format(n1, n2, n1, n2), "y"]]
    lindblad_ops.append(["Id_4 otimes b_{} otimes Id_{}".format(n1, n2), cav_loss])
    lindblad_ops.append(["Id_4 otimes Id_{} otimes b_{}".format(n1, n2), cav_loss])
    system_op.append(" {} * (Id_4 otimes n_{} otimes Id_{})".format(delta_cx, n1, n2))
    system_op.append(" {} * (Id_4 otimes Id_{} otimes n_{})".format(delta_cx, n1, n2))
    system_op.append("{} * (|1><0|_4 otimes b_{} otimes Id_{} + |0><1|_4 otimes bdagger_{} otimes Id_{})".format(cav_coupl, n1, n2, n1, n2))
    system_op.append("{} * (|3><1|_4 otimes b_{} otimes Id_{} + |1><3|_4 otimes bdagger_{} otimes Id_{})".format(cav_coupl, n1, n2, n1, n2))
    system_op.append("{} * (|2><0|_4 otimes Id_{} otimes b_{} + |0><2|_4 otimes Id_{} otimes bdagger_{})".format(cav_coupl, n1, n2, n1, n2))
    system_op.append("{} * (|3><2|_4 otimes Id_{} otimes b_{} + |2><3|_4 otimes Id_{} otimes bdagger_{})".format(cav_coupl, n1, n2, n1, n2))
    rf_op = None
    if rf:
        rf_op = ("|1><1|_4 otimes Id_{} otimes Id_{}".format(n1, n2)
                 + " + Id_4 otimes n_{} otimes Id_{}".format(n1, n2)
                 + " + Id_4 otimes Id_{} otimes n_{}".format(n1, n2))

    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, system_prefix="b_linear_cavity",
        system_op=system_op, pulse_file_x=pulse_file_x, pulse_file_y=pulse_file_y,
        boson_op=boson_op, initial=initial, lindblad_ops=lindblad_ops,
        interaction_ops=interaction_ops, output_ops=list(output_ops),
        prepare_only=prepare_only, dressedstates=dressedstates, rf_op=rf_op,
        rf_file=rf_file, firstonly=firstonly, **options)


def biexciton_photons_dressed_states(t_start, t_end, *pulses, plot=True, t_lim=None,
                                     e_lim=None, filename="biexciton_photons_dressed",
                                     firstonly=False, visible_states=None, **options):
    n1 = options["n_phot1"] + 1
    n2 = options["n_phot2"] + 1
    return dressed_states(biexciton_photons, [4, n1, n2], t_start, t_end, *pulses,
                          filename=filename, plot=plot, t_lim=t_lim, e_lim=e_lim,
                          firstonly=firstonly, colors=None,
                          visible_states=visible_states, **options)


def _extended_levels(delta_cx, delta_xy, delta_b):
    """Diagonal energies of the 18-level two-excitation-truncated biexciton ⊗
    two-cavity space.  State order (reference linear.py:115):
    |G,0,0>,|G,1,0>,|G,0,1>,|G,1,1>,|G,2,0>,|G,0,2>,
    |X,0,0>,|X,1,0>,|X,0,1>,|X,1,1>, |Y,...> x4, |B,...> x4."""
    d_C, d_0, d_B = delta_cx, delta_xy, delta_b
    return [0, d_C, d_C, 2 * d_C, 2 * d_C, 2 * d_C,
            -d_0 / 2, -d_0 / 2 + d_C, -d_0 / 2 + d_C, -d_0 / 2 + 2 * d_C,
            d_0 / 2, d_0 / 2 + d_C, d_0 / 2 + d_C, d_0 / 2 + 2 * d_C,
            -d_B, -d_B + d_C, -d_B + d_C, -d_B + 2 * d_C]


def biexciton_photons_extended(t_start, t_end, *pulses, dt=0.5, delta_xy=0, delta_b=4,
                               gamma_e=1 / 100, cav_coupl=0.06, cav_loss=0.12 / hbar,
                               delta_cx=-2, gamma_b=None, phonons=False, ae=3.0,
                               temperature=4, verbose=False, lindblad=False,
                               temp_dir=None, pt_file=None, suffix="",
                               multitime_op=None, pulse_file_x=None, pulse_file_y=None,
                               prepare_only=False,
                               output_ops=("|0><0|_18 + |1><1|_18 + |2><2|_18 + |3><3|_18 + |4><4|_18 + |5><5|_18",
                                           "|6><6|_18 + |7><7|_18 + |8><8|_18 + |9><9|_18",
                                           "|10><10|_18 + |11><11|_18 + |12><12|_18 + |13><13|_18",
                                           "|14><14|_18 + |15><15|_18 + |16><16|_18 + |17><17|_18"),
                               initial="|0><0|_18", t_mem=20.48, dressedstates=False,
                               rf=False, rf_file=None, firstonly=False, **options):
    """Hand-truncated 18-level biexciton+two-cavity space keeping at most two
    total excitations, incl. |G,2,0> and |G,0,2> (reference linear.py:111-155)."""
    energies = _extended_levels(delta_cx, delta_xy, delta_b)
    system_op = ["{}*|{}><{}|_18".format(e, i, i) for i, e in enumerate(energies) if e != 0]
    boson_op = ("|6><6|_18 + |7><7|_18 + |8><8|_18 + |9><9|_18 + |10><10|_18 + |11><11|_18"
                " + |12><12|_18 + |13><13|_18 + 2 * ( |14><14|_18 + |15><15|_18 + |16><16|_18 + |17><17|_18)")
    lindblad_ops = []
    if lindblad:
        if gamma_b is None:
            gamma_b = gamma_e
        lindblad_ops = [
            ["|0><6|_18 + |1><7|_18 + |2><8|_18 + |3><9|_18", gamma_e],
            ["|0><10|_18 + |1><11|_18 + |2><12|_18 + |3><13|_18", gamma_e],
            ["|6><14|_18 + |7><15|_18 + |8><16|_18 + |9><17|_18", gamma_b],
            ["|10><14|_18 + |11><15|_18 + |12><16|_18 + |13><17|_18", gamma_b]]
    interaction_ops = [
        ["|6><0|_18 + |7><1|_18 + |8><2|_18 + |9><3|_18 + |14><6|_18 + |15><7|_18 + |16><8|_18 + |17><9|_18", "x"],
        ["|10><0|_18 + |11><1|_18 + |12><2|_18 + |13><3|_18 + |14><10|_18 + |15><11|_18 + |16><12|_18 + |17><13|_18", "y"]]
    # cavity photon annihilation in the truncated basis (sqrt(2) for the
    # two-photon states |G,2,0> / |G,0,2>)
    lindblad_ops.append(["|0><1|_18 + sqrt(2)*|1><4|_18 + |2><3|_18 + |6><7|_18 + |8><9|_18 + |10><11|_18 + |12><13|_18 + |14><15|_18 + |16><17|_18", cav_loss])
    lindblad_ops.append(["|0><2|_18 + |1><3|_18 + sqrt(2)*|2><5|_18 + |6><8|_18 + |7><9|_18 + |10><12|_18 + |11><13|_18 + |14><16|_18 + |15><17|_18", cav_loss])
    system_op.append("{} * ( |1><6|_18 + |3><8|_18 + sqrt(2)*|4><7|_18 + |6><1|_18 + sqrt(2)*|7><4|_18 + |7><14|_18 + |8><3|_18 + |9><16|_18 + |14><7|_18 + |16><9|_18)".format(cav_coupl))
    system_op.append("{} * ( |2><10|_18 + |3><11|_18 + sqrt(2)*|5><12|_18 + |10><2|_18 + |11><3|_18 + sqrt(2)*|12><5|_18 + |12><14|_18 + |13><15|_18 + |14><12|_18 + |15><13|_18)".format(cav_coupl))
    rf_op = None
    if rf:
        excitations = [0, 1, 1, 2, 2, 2, 1, 2, 2, 3, 1, 2, 2, 3, 2, 3, 3, 4]
        rf_op = " + ".join("{}*|{}><{}|_18".format(exc, i, i)
                           for i, exc in enumerate(excitations) if exc != 0)

    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op,
        system_prefix="b_linear_cavity_extended", system_op=system_op,
        pulse_file_x=pulse_file_x, pulse_file_y=pulse_file_y, boson_op=boson_op,
        initial=initial, lindblad_ops=lindblad_ops, interaction_ops=interaction_ops,
        output_ops=list(output_ops), prepare_only=prepare_only,
        dressedstates=dressedstates, rf_op=rf_op, rf_file=rf_file,
        firstonly=firstonly, **options)


def biexciton_photons_extended_dressed_states(t_start, t_end, *pulses, plot=True,
                                              t_lim=None, e_lim=None,
                                              filename="biexciton_photons_extended_dressed",
                                              firstonly=False, visible_states=None,
                                              **options):
    return dressed_states(biexciton_photons_extended, 18, t_start, t_end, *pulses,
                          filename=filename, t_lim=t_lim, e_lim=e_lim, plot=plot,
                          firstonly=firstonly, colors=None,
                          visible_states=visible_states, **options)


def biexciton_sensors(t_start, t_end, *pulses, dt=0.1, delta_xy=0, shift_x=True,
                      delta_s1=0, delta_s2=0, epsilon=0.0001, linewidth1=0.01,
                      linewidth2=None, delta_b=4, gamma_e=1 / 100, gamma_b=None,
                      phonons=False, ae=3.0, temperature=4, verbose=False,
                      lindblad=False, temp_dir=None, pt_file=None, suffix="",
                      multitime_op=None, pulse_file_x=None, pulse_file_y=None,
                      prepare_only=False,
                      output_ops=("|0><0|_4 otimes Id_2 otimes Id_2",
                                  "|1><1|_4 otimes Id_2 otimes Id_2",
                                  "|2><2|_4 otimes Id_2 otimes Id_2",
                                  "|3><3|_4 otimes Id_2 otimes Id_2"),
                      initial="|0><0|_4 otimes |0><0|_2 otimes |0><0|_2", t_mem=12.8,
                      dressedstates=False, rf=False, rf_file=None, firstonly=False,
                      **options):
    """Biexciton ⊗ two spectral sensors: sensor1 on G-Y/Y-B, sensor2 on G-X/X-B
    (reference linear.py:161-207)."""
    if shift_x:
        system_op = ["{}*|3><3|_4 otimes Id_2 otimes Id_2".format(-delta_b),
                     "{}*|1><1|_4 otimes Id_2 otimes Id_2".format(-delta_xy / 2),
                     "{}*|2><2|_4 otimes Id_2 otimes Id_2".format(delta_xy / 2)]
    else:
        system_op = ["{}*|3><3|_4 otimes Id_2 otimes Id_2".format(-delta_b),
                     "{}*|2><2|_4 otimes Id_2 otimes Id_2".format(delta_xy)]
    boson_op = ("1*(|1><1|_4 otimes Id_2 otimes Id_2 + |2><2|_4 otimes Id_2 otimes Id_2)"
                " + 2*(|3><3|_4 otimes Id_2 otimes Id_2)")
    lindblad_ops = []
    if lindblad:
        if gamma_b is None:
            gamma_b = gamma_e
        lindblad_ops = [["|0><1|_4 otimes Id_2 otimes Id_2", gamma_e],
                        ["|0><2|_4 otimes Id_2 otimes Id_2", gamma_e],
                        ["|1><3|_4 otimes Id_2 otimes Id_2", gamma_b],
                        ["|2><3|_4 otimes Id_2 otimes Id_2", gamma_b]]
    interaction_ops = [["|1><0|_4 otimes Id_2 otimes Id_2 +|3><1|_4 otimes Id_2 otimes Id_2", "x"],
                       ["|2><0|_4 otimes Id_2 otimes Id_2 +|3><2|_4 otimes Id_2 otimes Id_2", "y"]]
    rf_op = None
    if rf:
        rf_op = ("|1><1|_4 otimes Id_2 otimes Id_2 + |2><2|_4 otimes Id_2 otimes Id_2"
                 " + 2*(|3><3|_4 otimes Id_2 otimes Id_2)")
    system_op.append("{} * (Id_4 otimes |1><1|_2 otimes Id_2)".format(delta_s1))
    system_op.append("{} * (Id_4 otimes Id_2 otimes |1><1|_2)".format(delta_s2))
    system_op.append("{} * (|2><0|_4 otimes |0><1|_2 otimes Id_2 + |0><2|_4 otimes |1><0|_2 otimes Id_2)".format(epsilon))
    system_op.append("{} * (|3><2|_4 otimes |0><1|_2 otimes Id_2 + |2><3|_4 otimes |1><0|_2 otimes Id_2)".format(epsilon))
    system_op.append("{} * (|1><0|_4 otimes Id_2 otimes |0><1|_2 + |0><1|_4 otimes Id_2 otimes |1><0|_2)".format(epsilon))
    system_op.append("{} * (|3><1|_4 otimes Id_2 otimes |0><1|_2 + |1><3|_4 otimes Id_2 otimes |1><0|_2)".format(epsilon))
    if linewidth2 is None:
        linewidth2 = linewidth1
    lindblad_ops.append(["Id_4 otimes |0><1|_2 otimes Id_2", linewidth1])
    lindblad_ops.append(["Id_4 otimes Id_2 otimes |0><1|_2", linewidth2])

    return simulate(
        t_start, t_end, *pulses, dt=dt, phonons=phonons, t_mem=t_mem, ae=ae,
        temperature=temperature, verbose=verbose, temp_dir=temp_dir, pt_file=pt_file,
        suffix=suffix, multitime_op=multitime_op, system_prefix="b_linear_sensor",
        system_op=system_op, pulse_file_x=pulse_file_x, pulse_file_y=pulse_file_y,
        boson_op=boson_op, initial=initial, lindblad_ops=lindblad_ops,
        interaction_ops=interaction_ops, output_ops=list(output_ops),
        prepare_only=prepare_only, dressedstates=dressedstates, rf_op=rf_op,
        rf_file=rf_file, firstonly=firstonly, **options)
