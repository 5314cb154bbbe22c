"""Generic N-operator one-/two-time correlation functions.

API parity with /root/reference/pyaceqd/two_time/correlations.py; the
implementation replaces the ThreadPoolExecutor-of-ACE-subprocesses fan-out
(reference correlations.py:135-184) with one trunk propagation plus a vmapped
branch scan on device (engine.branched), and the "time-local" dynamical-map
fast paths (reference correlations.py:450-863 + propagate_tau.f90) with
batched map-chain kernels (engine.dynmap).

Conventions preserved exactly:
- two_op:   <A(t+tau) B(t)>           (B applied from the left at t)
- three_op: <A(t) B(t+tau) C(t)>      (A from the right, C from the left)
- five_op:  <A(0) B(t) C(t+tau) D(t) E(0)>
- tau=0 column from an extra product output operator, because an ACE-style
  MTO only becomes visible at t+dt (reference correlations.py:87,130).
"""

import numpy as np

from pyaceqd_tpu import config
from pyaceqd_tpu.constants import hbar
from pyaceqd_tpu.engine import branched, dynmap
from pyaceqd_tpu.ops import superop
from pyaceqd_tpu.ops.dsl import parse_operator


def _product_str(*ops):
    """Operator product for the tau=0 output row; accepts operator strings
    (joined for the DSL) or matrices (multiplied directly)."""
    if any(not isinstance(o, str) for o in ops):
        from pyaceqd_tpu.ops.dsl import parse_operator
        mats = [parse_operator(o) if isinstance(o, str) else np.asarray(o)
                for o in ops]
        P = mats[0]
        for M in mats[1:]:
            P = P @ M
        return P
    return "(" + "*".join(ops) + ")"


def _get_task(system, t_start, t_end, pulses, dt, options):
    opts = dict(options)
    opts.pop("output_ops", None)
    opts.pop("multitime_op", None)
    return system(t_start, t_end, *pulses, dt=dt, return_task=True,
                  output_ops=[], **opts)


# ---------------------------------------------------------------------------
# one-time correlators (single branch at fixed t_MTO)
# ---------------------------------------------------------------------------

def _ops_one_time(system, *pulses, t0, t_MTO, tend, dt, mtos, output_ops, options,
                  debug=False):
    opts = dict(options)
    opts["output_ops"] = output_ops
    opts["multitime_op"] = mtos
    res = system(t0, tend, *pulses, dt=dt, **opts)
    t = np.round(res[0].real, 6)
    out_b, out_0 = res[1], res[2]
    n_tau = int((tend - t_MTO) / dt) + 1
    tau = np.linspace(t_MTO, tend, n_tau)
    i_MTO = np.where(t == np.round(t_MTO, 6))[0][0]
    G = np.empty(n_tau, dtype=complex)
    G[0] = out_0[i_MTO]
    G[1:] = out_b[i_MTO + 1:]
    return tau, G


def two_op_one_time(system, *pulses, opA="|1><0|_2", opB="|0><1|_2", t0=-500,
                    t_MTO=0, tend=500, dt=0.1,
                    options={"lindblad": True, "phonons": False}, debug=False):
    """<A(t_MTO+tau) B(t_MTO)>: B applied from the left at t_MTO, then A read
    along tau (reference correlations.py:54-91)."""
    mto = {"operator": opB, "applyFrom": "_left", "applyBefore": "false", "time": t_MTO}
    return _ops_one_time(system, *pulses, t0=t0, t_MTO=t_MTO, tend=tend, dt=dt,
                         mtos=[mto], output_ops=[opA, _product_str(opA, opB)],
                         options=options, debug=debug)


def three_op_one_time(system, *pulses, opA="|1><0|_2", opB="|1><1|_2",
                      opC="|0><1|_2", t0=-500, t_MTO=0, tend=500, dt=0.1,
                      options={"lindblad": True, "phonons": False}, debug=False):
    """<A(t_MTO) B(t_MTO+tau) C(t_MTO)>, e.g. G2(tau) with A=sigma^dag,
    B=sigma^dag sigma, C=sigma (reference correlations.py:93-133)."""
    mto1 = {"operator": opA, "applyFrom": "_right", "applyBefore": "false", "time": t_MTO}
    mto2 = {"operator": opC, "applyFrom": "_left", "applyBefore": "false", "time": t_MTO}
    return _ops_one_time(system, *pulses, t0=t0, t_MTO=t_MTO, tend=tend, dt=dt,
                         mtos=[mto1, mto2],
                         output_ops=[opB, _product_str(opA, opB, opC)],
                         options=options, debug=debug)


# ---------------------------------------------------------------------------
# two-time correlators (batched branch fan-out)
# ---------------------------------------------------------------------------

def two_op_two_time(system, t_axis, *pulses, opA="|1><0|_2", opB="|0><1|_2",
                    tau_max=500, dt=0.1, t_start=0,
                    options={"lindblad": True, "phonons": False}, debug=False,
                    workers=15, mesh=None):
    """G(t1, tau) = <A(t1+tau) B(t1)> over all t1 in t_axis at once
    (reference correlations.py:186-225; `workers` kept for signature parity —
    parallelism is the vmapped branch axis, sharded over `mesh` when given)."""
    task = _get_task(system, t_start, float(np.max(t_axis)) + tau_max, pulses, dt, options)
    mto = {"operator": opB, "applyFrom": "_left", "applyBefore": "false"}
    return branched.correlation_2d(task, t_axis, [mto], opA,
                                   _product_str(opA, opB), tau_max, mesh=mesh)


def three_op_two_time(system, t_axis, *pulses, opA="|1><0|_2", opB="|1><1|_2",
                      opC="|0><1|_2", tau_max=500, dt=0.1, t_start=0,
                      options={"lindblad": True, "phonons": False}, debug=False,
                      workers=15, mesh=None):
    """G2(t1, tau) = <A(t1) B(t1+tau) C(t1)> (reference correlations.py:227-270).

    t_start > 0 is accepted (reference parity): the grid simply starts there
    and t_axis entries must lie within [t_start, t_end]."""
    if np.min(np.asarray(t_axis)) < t_start:
        raise ValueError("t_axis must lie within [t_start, t_end]")
    task = _get_task(system, t_start, float(np.max(t_axis)) + tau_max, pulses, dt, options)
    mtos = [{"operator": opA, "applyFrom": "_right", "applyBefore": "false"},
            {"operator": opC, "applyFrom": "_left", "applyBefore": "false"}]
    return branched.correlation_2d(task, t_axis, mtos, opB,
                                   _product_str(opA, opB, opC), tau_max,
                                   mesh=mesh)


def five_op_two_time(system, t_axis, *pulses, opA="|1><0|_2", opB="|1><0|_2",
                     opC="|1><1|_2", opD="|0><1|_2", opE="|0><1|_2", tau_max=500,
                     dt=0.1, t_start=-500,
                     options={"lindblad": True, "phonons": False}, debug=False,
                     workers=15, mesh=None):
    """<A(0) B(t) C(t+tau) D(t) E(0)> with t_start<=0 settling time
    (reference correlations.py:272-320; same caveat: the t=0, tau=0 value uses
    <B C D> only)."""
    task = _get_task(system, t_start, float(np.max(t_axis)) + tau_max, pulses, dt, options)
    trunk = [{"operator": opA, "applyFrom": "_right", "applyBefore": "false", "time": 0.0},
             {"operator": opE, "applyFrom": "_left", "applyBefore": "false", "time": 0.0}]
    mtos = [{"operator": opB, "applyFrom": "_right", "applyBefore": "false"},
            {"operator": opD, "applyFrom": "_left", "applyBefore": "false"}]
    return branched.correlation_2d(task, t_axis, mtos, opC,
                                   _product_str(opA, opB, opC, opD, opE), tau_max,
                                   trunk_mtos=trunk, mesh=mesh)


def get_spectrum(g1, tau, dir="", plot=False):
    """Emission spectrum from G1(tau): offset-subtract, hermitian-symmetrize
    to negative tau, FFT; returns (S(omega), omega[meV]) fft-shifted
    (reference correlations.py:322-382)."""
    g1 = np.asarray(g1).copy()
    dtau = np.abs(tau[1] - tau[0])
    g1 = g1 - g1[-1]
    g1 = np.concatenate((np.conj(np.flip(g1[1:])), g1))
    tau_sym = np.concatenate((-np.flip(tau[1:]), tau))
    # align tau=0 with the first FFT sample (ifftshift) so the real part is
    # the true symmetric transform rather than an alternating-phase artifact
    s_omega = np.real(np.fft.fft(np.fft.ifftshift(g1)))
    s_omega = np.fft.fftshift(s_omega)
    fft_freqs = 2 * np.pi * hbar * np.fft.fftfreq(len(g1), d=dtau)
    fft_freqs = np.fft.fftshift(fft_freqs)
    if plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.clf()
        plt.plot(tau_sym, np.abs(g1))
        plt.xlabel("Time (ps)"); plt.ylabel("|G1|")
        plt.savefig(dir + "g1_symm.png"); plt.clf()
        plt.plot(fft_freqs, np.abs(s_omega))
        plt.xlim(-3, 3); plt.xlabel("Energy (meV)"); plt.ylabel("S")
        plt.savefig(dir + "spectrum.png"); plt.clf()
    return s_omega, fft_freqs


# ---------------------------------------------------------------------------
# time-local (dynamical-map) fast paths
# ---------------------------------------------------------------------------

def _tl_setup(system, pulses, t_mem, dt, rho0, mto_ops, options):
    """Get time-local maps via one calc_dynmap run with the MTOs applied at
    2*t_mem (outside memory), as the reference does (correlations.py:497-502)."""
    mtos = [dict(m, time=2 * t_mem, applyBefore="false") for m in mto_ops]
    opts = dict(options)
    result, dm = system(0, 4 * t_mem, *pulses, dt=dt, rho0=rho0,
                        multitime_op=mtos, calc_dynmap=True, **opts)
    _t = np.round(result[0].real, 6)
    dm_tl = np.asarray(dynmap.calc_tl_dynmap(np.asarray(dm)))
    tl_map, blocks = dynmap.extract_dms_device(dm_tl, _t, t_mem, [2 * t_mem])
    return tl_map, blocks


def _tl_two_time(system, t_axis, pulses, t_mem, ops_branch, op_out, op_zero,
                 tau_max, dt, rho0, options, use_dm, debug=False):
    t_axis = np.asarray(t_axis, dtype=float)
    if not t_axis[0] == 0:
        raise ValueError("t_axis must start at 0.")
    cdt = config.cdtype()
    dim = rho0.shape[0]
    n_tau = int(round(tau_max / dt))
    tau = np.linspace(0, tau_max, n_tau + 1)
    S = branched.compose_branch_superop(
        [{"operator": o, "applyFrom": f, "applyBefore": "false"} for o, f in ops_branch], dim)
    W_tau = superop.trace_vector(parse_operator(op_out))[None]
    W_zero = superop.trace_vector(parse_operator(op_zero))[None]

    if use_dm:
        # full per-step maps over the whole window, no time-locality assumed
        tend = float(t_axis[-1]) + tau_max
        opts = dict(options)
        result, dm = system(0, tend, *pulses, dt=dt, rho0=rho0, multitime_op=[],
                            calc_dynmap=True, **opts)
        maps = np.asarray(dynmap.calc_tl_dynmap(np.asarray(dm)))
        ks = np.round(t_axis / dt).astype(np.int32)
        G0, Gtau = dynmap.map_trunk_and_branches(
            maps.astype(cdt), rho0.reshape(-1).astype(cdt), ks, S.astype(cdt),
            W_tau.astype(cdt), W_zero.astype(cdt), n_tau)
        G = np.empty((len(t_axis), n_tau + 1), dtype=complex)
        G[:, 0] = np.asarray(G0)[:, 0]
        G[:, 1:] = np.asarray(Gtau)[:, :, 0]
        return t_axis, tau, G

    if options.get("phonons", False):
        # phonon path exists for the sandwich form <A(t) B(t+tau) C(t)> only
        # (reference correlations.py:866: tl_three_op_two_time_phonons)
        right = [o for o, f in ops_branch if f == "_right"]
        left = [o for o, f in ops_branch if f == "_left"]
        if not (right and left):
            raise NotImplementedError(
                "phonon time-local correlations need the A . rho . C sandwich")
        from pyaceqd_tpu.correlations.phonon_tl import \
            tl_three_op_two_time_phonons
        return tl_three_op_two_time_phonons(
            system, t_axis, *pulses, t_mem=t_mem, opA=right[0], opB=op_out,
            opC=left[0], tau_max=tau_max, dt=dt, rho0=rho0, options=options)

    # QRT with the stationary time-local map everywhere
    tl_map, _ = _tl_setup(system, pulses, t_mem, dt,
                          rho0, [{"operator": o, "applyFrom": f} for o, f in ops_branch],
                          options)
    tl_map = tl_map.astype(cdt)
    # trunk states at t_axis via traced powers
    ks = np.round(t_axis / dt).astype(int)
    rho_t1s = np.empty((len(ks), dim * dim), dtype=complex)
    rho = rho0.reshape(-1).astype(complex)
    prev_k = 0
    Ms = np.asarray(tl_map)
    for i, k in enumerate(ks):
        steps = k - prev_k
        if steps > 0:
            rho = np.linalg.matrix_power(Ms, steps) @ rho
        prev_k = k
        rho_t1s[i] = rho
    Gtau = dynmap.stationary_branches(tl_map, rho_t1s.astype(cdt), S.astype(cdt),
                                      W_tau.astype(cdt), n_tau)
    G = np.empty((len(t_axis), n_tau + 1), dtype=complex)
    G[:, 0] = rho_t1s @ W_zero[0]
    G[:, 1:] = np.asarray(Gtau)[:, :, 0]
    return t_axis, tau, G


def tl_two_op_two_time(system, t_axis, *pulses, t_mem=10, opA="|1><0|_2",
                       opB="|0><1|_2", tau_max=500, dt=0.1,
                       rho0=np.array([[1, 0], [0, 0]], dtype=complex),
                       options={"lindblad": True, "phonons": False}, debug=False,
                       workers=15, use_dm=False, fortran_only=False):
    """<A(t+tau)B(t)> via dynamical maps (reference correlations.py:450-615).
    `fortran_only` is accepted for parity; the batched device path is always
    the fast path here."""
    return _tl_two_time(system, t_axis, pulses, t_mem, [(opB, "_left")], opA,
                        _product_str(opA, opB), tau_max, dt, np.asarray(rho0),
                        options, use_dm, debug)


def tl_three_op_two_time(system, t_axis, *pulses, t_mem=10, opA="|1><0|_2",
                         opB="|1><1|_2", opC="|0><1|_2", tau_max=500, dt=0.1,
                         rho0=np.array([[1, 0], [0, 0]], dtype=complex),
                         options={"lindblad": True, "phonons": False}, debug=False,
                         workers=15, use_dm=False, fortran_only=False):
    """<A(t)B(t+tau)C(t)> via dynamical maps (reference correlations.py:696-863)."""
    return _tl_two_time(system, t_axis, pulses, t_mem,
                        [(opA, "_right"), (opC, "_left")], opB,
                        _product_str(opA, opB, opC), tau_max, dt, np.asarray(rho0),
                        options, use_dm, debug)
