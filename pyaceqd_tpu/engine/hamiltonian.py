"""Assembly of the time-dependent system Hamiltonian and Lindblad generator.

Replaces the reference's parameter-file vocabulary
(/root/reference/pyaceqd/general_system/general_system.py:227-290) with
in-process arrays:

- ``add_Hamiltonian { expr }``      -> H0 += parse(expr)           [meV]
- ``add_Pulse file f { -0.5*pi*hbar*(V) }``
                                    -> H(t) += f(t) C + f*(t) C^dagger with
                                       C = -(pi/2) hbar V           [meV]
- rotating frame ``add_Pulse file rf { -0.5*hbar*(R) }``
                                    -> H(t) += -hbar w(t) R  (R hermitian)
- ``add_Lindblad g { L }``          -> generator += g D[L]          [1/ps]
- ``add_single_mode { H_LO } { init }`` -> extra tensor-product mode folded
                                       into the system space.

The engine works on a uniform grid t_k = t_start + k dt and uses midpoint
sampling of the drive fields for second-order accuracy, consistent with the
symmetric-Trotter stepping ACE advertises (``use_symmetric_Trotter true``,
general_system.py:234).
"""

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from pyaceqd_tpu import constants
from pyaceqd_tpu.ops import superop
from pyaceqd_tpu.ops.dsl import parse_operator

hbar = constants.hbar


def _as_matrix(op) -> np.ndarray:
    if isinstance(op, str):
        return parse_operator(op)
    return np.asarray(op, dtype=np.complex128)


@dataclass
class SystemSpec:
    """Host-side description of one simulation, ready to compile.

    All matrices are dense complex128 NumPy in the full product space.
    """
    dim: int
    H0: np.ndarray                       # static Hamiltonian [meV]
    couplings: List[np.ndarray]          # C_k: H(t) += f_k(t) C_k + h.c. [meV]
    diss_sop: Optional[np.ndarray]       # sum_j g_j D[L_j], superoperator [1/ps]
    rho0: np.ndarray                     # initial density matrix
    output_mats: List[np.ndarray]        # observables O_i -> Tr(O_i rho)
    boson_coupling: Optional[np.ndarray] = None  # diagonal coupling op for phonons


def build_system(system_op=None, lindblad_ops=None, interaction_ops=None,
                 initial=None, rho0=None, output_ops=(), rf_op=None,
                 LO_params=None, boson_op=None, dim_hint=None) -> Tuple[SystemSpec, Optional[np.ndarray]]:
    """Translate operator strings into a :class:`SystemSpec`.

    interaction_ops: list of (operator_string, polarization) with polarization
    in {"x", "y"}; each contributes a coupling driven by the x- or y-pulse
    field with prefactor -(pi/2) hbar (reference general_system.py:279).

    rf_op: operator string for the rotating-frame energy shift; contributes a
    coupling driven by the (real) instantaneous laser frequency with prefactor
    -hbar/2 applied twice (op + h.c. of a hermitian op -> -hbar w(t) R;
    reference general_system.py:255).

    Returns (spec, rf_matrix) where rf_matrix is None when no rotating frame.
    """
    # determine dimension from whichever operator is available
    probe = None
    for cand in ([initial] if isinstance(initial, str) else []) + \
            (list(system_op) if system_op else []) + \
            ([op for op, _ in interaction_ops] if interaction_ops else []) + \
            (list(output_ops) if output_ops else []):
        probe = _as_matrix(cand)
        break
    if probe is None and rho0 is not None:
        probe = np.asarray(rho0)
    if probe is None and dim_hint is not None:
        probe = np.eye(dim_hint)
    if probe is None:
        raise ValueError("Cannot infer Hilbert-space dimension: supply system_op, initial, or rho0")
    dim = probe.shape[0]

    H0 = np.zeros((dim, dim), dtype=np.complex128)
    if system_op is not None:
        for s in system_op:
            H0 = H0 + _as_matrix(s)

    # LO single modes: extend the space by extra bosonic modes with their own
    # hamiltonian terms (reference general_system.py:262-266 writes
    # add_single_mode { E*(Id otimes n_3) + g*(boson coupling) } {|0><0|_3})
    lo_init = []
    if LO_params is not None:
        for _E, _g in LO_params:
            n_lo = 3
            Id_sys = np.eye(dim, dtype=np.complex128)
            n_op = np.diag(np.arange(n_lo)).astype(np.complex128)
            b = np.diag(np.sqrt(np.arange(1, n_lo)).astype(np.complex128), k=1)
            proj_sys = parse_operator("|1><1|_2") if dim == 2 else None
            if proj_sys is None:
                raise NotImplementedError("LO_params currently supported for the TLS only")
            H_lo = _E * np.kron(Id_sys, n_op) + _g * (np.kron(proj_sys, b + b.conj().T))
            H0 = np.kron(H0, np.eye(n_lo)) + H_lo
            dim = dim * n_lo
            lo0 = np.zeros((n_lo, n_lo), dtype=np.complex128)
            lo0[0, 0] = 1.0
            lo_init.append(lo0)

    couplings = []
    pol_index = []  # which field drives each coupling: 0=x, 1=y, 2=rf
    if interaction_ops is not None:
        for op, pol in interaction_ops:
            C = -(np.pi / 2.0) * hbar * _as_matrix(op)
            for lo0 in lo_init:
                C = np.kron(C, np.eye(lo0.shape[0]))
            couplings.append(C)
            pol_index.append({"x": 0, "y": 1}[pol])

    rf_matrix = None
    if rf_op is not None:
        R = _as_matrix(rf_op)
        for lo0 in lo_init:
            R = np.kron(R, np.eye(lo0.shape[0]))
        # H += -0.5 hbar w(t) R + h.c. = -hbar w(t) R  (R hermitian, w real)
        couplings.append(-(hbar / 2.0) * R)
        pol_index.append(2)
        rf_matrix = R

    diss = None
    if lindblad_ops:
        diss = np.zeros((dim * dim, dim * dim), dtype=np.complex128)
        for op, rate in lindblad_ops:
            L = _as_matrix(op)
            for lo0 in lo_init:
                L = np.kron(L, np.eye(lo0.shape[0]))
            diss = diss + superop.dissipator(L, rate)

    if rho0 is not None:
        rho_init = np.asarray(rho0, dtype=np.complex128).reshape(
            int(np.sqrt(np.asarray(rho0).size)), -1)
    elif initial is not None:
        rho_init = _as_matrix(initial)
    else:
        rho_init = np.zeros((dim, dim), dtype=np.complex128)
        rho_init[0, 0] = 1.0
    for lo0 in lo_init:
        rho_init = np.kron(rho_init, lo0)

    out_mats = []
    for op in output_ops:
        O = _as_matrix(op)
        for lo0 in lo_init:
            O = np.kron(O, np.eye(lo0.shape[0]))
        out_mats.append(O)

    boson_coupling = _as_matrix(boson_op) if boson_op is not None else None

    spec = SystemSpec(dim=dim, H0=H0, couplings=couplings, diss_sop=diss,
                      rho0=rho_init, output_mats=out_mats,
                      boson_coupling=boson_coupling)
    spec.pol_index = pol_index
    return spec, rf_matrix


def sample_fields(pulses, t, rf_matrix=None, rf_freq_fn=None, abs_only=False,
                  firstonly=False):
    """Sample the complex drive fields on times ``t``.

    Returns (f_x, f_y, f_rf) complex arrays; f_rf is None without a rotating
    frame.  With a rotating frame the pulse energies are shifted by the first
    pulse's e_start and chirps removed, mirroring generate_rf_file
    (reference general_system.py:73-102)."""
    t = np.asarray(t, dtype=float)
    use_pulses = [pulses[0]] if (firstonly and len(pulses) > 0) else list(pulses)
    f_rf = None
    if rf_matrix is not None:
        if rf_freq_fn is not None:
            f_rf = np.asarray(rf_freq_fn(t), dtype=complex)
        else:
            f_rf = np.asarray(pulses[0].get_frequency(t), dtype=complex) * np.ones_like(t)
        new_pulses = [p.copy() for p in use_pulses]
        e0_start, _ = new_pulses[0].get_energy()
        for p in new_pulses:
            e_start, _ = p.get_energy()
            p.set_energy(e_start - e0_start, 0)
        use_pulses = new_pulses
    f_x = np.zeros(len(t), dtype=complex)
    f_y = np.zeros(len(t), dtype=complex)
    for p in use_pulses:
        tot = np.abs(p.get_total(t)) if abs_only else p.get_total(t)
        f_x = f_x + p.polar_x * tot
        f_y = f_y + p.polar_y * tot
    return f_x, f_y, f_rf
